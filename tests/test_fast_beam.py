"""KV-cached beam search must reproduce the fixed-buffer beam search
exactly (same sequences; scores to fp tolerance)."""

import numpy as np
import jax
import jax.numpy as jnp

from pytorch_kaldi_asr_tpu.decode.beam import beam_search
from pytorch_kaldi_asr_tpu.decode.fast_beam import fast_beam_search
from pytorch_kaldi_asr_tpu.decode.runner import nbest_from_result
from pytorch_kaldi_asr_tpu.models.transformer import init_transformer
from tests.test_models import small_cfg


def _setup(seed=0, b=3, s=12):
    cfg = small_cfg(decoder_sub_sequence=(-3, 0))
    params = init_transformer(jax.random.PRNGKey(seed), cfg)
    rng = np.random.default_rng(seed)
    src = rng.normal(size=(b, s, cfg.src_dim)).astype(np.float32)
    src_mask = np.ones((b, s), np.uint8)
    src_mask[b - 1, s // 2:] = 0
    return cfg, params, jnp.asarray(src), jnp.asarray(src_mask)


def test_fast_beam_matches_buffer_beam():
    cfg, params, src, src_mask = _setup()
    kw = dict(beam_size=4, max_len=10)
    slow = beam_search(params, cfg, src, src_mask, **kw)
    fast = fast_beam_search(params, cfg, src, src_mask, **kw)
    s_nbest = nbest_from_result(slow, 4)
    f_nbest = nbest_from_result(fast, 4)
    for b in range(len(s_nbest)):
        for lane, ((s_seq, s_score), (f_seq, f_score)) in enumerate(
            zip(s_nbest[b], f_nbest[b])
        ):
            assert s_seq == f_seq, (b, lane, s_seq, f_seq)
            np.testing.assert_allclose(f_score, s_score, atol=1e-3)


def test_fast_beam_multiple_seeds():
    for seed in (1, 2, 3):
        cfg, params, src, src_mask = _setup(seed=seed)
        slow = beam_search(params, cfg, src, src_mask, beam_size=3,
                           max_len=8)
        fast = fast_beam_search(params, cfg, src, src_mask, beam_size=3,
                                max_len=8)
        np.testing.assert_array_equal(
            np.asarray(slow.tokens), np.asarray(fast.tokens)
        )
        np.testing.assert_allclose(
            np.asarray(slow.scores), np.asarray(fast.scores), atol=1e-3
        )


def test_fast_beam_window_longer_than_sequence():
    cfg, params, src, src_mask = _setup()
    cfg = cfg.replace(decoder_sub_sequence=(-20, 0))  # window > max_len
    params = init_transformer(jax.random.PRNGKey(9), cfg)
    slow = beam_search(params, cfg, src, src_mask, beam_size=3, max_len=8)
    fast = fast_beam_search(params, cfg, src, src_mask, beam_size=3,
                            max_len=8)
    np.testing.assert_array_equal(
        np.asarray(slow.tokens), np.asarray(fast.tokens)
    )


def test_memory_search_matches_full():
    """fast_beam_search_memory with an empty prefix over the offline
    encoder output IS fast_beam_search (the incremental-partial base
    case)."""
    import jax.numpy as jnp

    from pytorch_kaldi_asr_tpu.decode.fast_beam import (
        fast_beam_search,
        fast_beam_search_memory,
    )
    from pytorch_kaldi_asr_tpu.models.transformer import encode

    cfg, params, src, mask = _setup(seed=3, b=2)
    full = fast_beam_search(params, cfg, src, mask, beam_size=3, max_len=10)
    enc, mask_f = encode(params, cfg, src, mask, train=False)
    mem = fast_beam_search_memory(
        params, cfg, enc, mask_f, jnp.zeros((2, 0), jnp.int32),
        beam_size=3, max_len=10)
    np.testing.assert_array_equal(np.asarray(full.tokens),
                                  np.asarray(mem.tokens))
    np.testing.assert_allclose(np.asarray(full.scores),
                               np.asarray(mem.scores), atol=1e-5)


def test_memory_search_prefix_continuation():
    """Greedy (beam 1) continuation from the full greedy search's own
    prefix reproduces its suffix exactly — any corruption in the forced
    KV caches would change the next-token logits and the pin would break.
    (With beam > 1 the continuation may legitimately find a BETTER
    suffix: all lanes restart from one prefix, a wider search than the
    full pass gave that node.)"""
    import jax.numpy as jnp

    from pytorch_kaldi_asr_tpu.decode.fast_beam import (
        fast_beam_search,
        fast_beam_search_memory,
    )
    from pytorch_kaldi_asr_tpu.models.transformer import encode
    from pytorch_kaldi_asr_tpu.utils import constants

    cfg, params, src, mask = _setup(seed=5, b=1)
    max_len = 10
    full = fast_beam_search(params, cfg, src, mask, beam_size=1,
                            max_len=max_len)
    best = np.asarray(full.tokens)[0, 0]
    best_len = int(np.asarray(full.lengths)[0, 0])
    # continue from a 3-token forced prefix of the best path (no BOS)
    p = min(3, max(best_len - 2, 1))
    prefix = jnp.asarray(best[1:1 + p][None])
    enc, mask_f = encode(params, cfg, src, mask, train=False)
    cont = fast_beam_search_memory(params, cfg, enc, mask_f, prefix,
                                   beam_size=1, max_len=max_len)
    got = np.asarray(cont.tokens)[0, 0]
    got_len = int(np.asarray(cont.lengths)[0, 0])
    eff = min(best_len, max_len + 1)
    assert got_len == best_len
    np.testing.assert_array_equal(got[:eff], best[:eff])
    assert int(got[0]) == constants.BOS
