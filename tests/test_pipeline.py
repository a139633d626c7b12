"""Pipeline parallelism (parallel/pipeline.py): GPipe relay over the
``pipe`` mesh axis, pinned numerically equal to the single-device banded
encoder stack (forward AND gradients), composed with a data axis, and
exercised with dropout on."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_kaldi_asr_tpu.models.am import frame_ce_loss, init_am
from pytorch_kaldi_asr_tpu.models.encoders import banded_encode
from pytorch_kaldi_asr_tpu.models.transformer import (
    TransformerConfig,
    init_transformer,
)
from pytorch_kaldi_asr_tpu.parallel.pipeline import (
    make_pipe_mesh,
    pp_banded_encode,
    pp_frame_ce_loss,
    stack_stage_params,
)

CFG = TransformerConfig(
    src_dim=8, vocab_size=16, encoder_type="banded",
    encoder_sub_sequence=(-4, 0), encoder_max_len=32,
    en_layers=4, n_head=2, en_d_model=16, d_k=8, d_v=8,
    en_dropout=0.3, src_fold=1,
)


def _data(batch=8, s=16, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.normal(size=(batch, s, CFG.src_dim)).astype(np.float32)
    mask = np.ones((batch, s), np.uint8)
    mask[-1, s // 2:] = 0  # one padded utterance
    return src, mask


def _enc_params(seed=0):
    return init_transformer(jax.random.PRNGKey(seed), CFG)["encoder"]


def test_stack_stage_params_layout():
    params = _enc_params()
    stacked = stack_stage_params(params["layers"], 2)
    w = stacked["slf"]["w_qs"]
    assert w.shape[:2] == (2, 2)
    # stage 1's first resident layer is global layer 2, in order
    np.testing.assert_array_equal(
        np.asarray(w[1, 0]), np.asarray(params["layers"][2]["slf"]["w_qs"]))


def test_pp_forward_matches_single_device():
    params = _enc_params()
    src, mask = _data()
    ref, _ = banded_encode(params, CFG, src, mask)
    mesh = make_pipe_mesh(pipe=4)
    out = pp_banded_encode(params, CFG, src, mask, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pp_forward_more_microbatches_than_stages():
    params = _enc_params(1)
    src, mask = _data(seed=1)
    ref, _ = banded_encode(params, CFG, src, mask)
    mesh = make_pipe_mesh(pipe=2)
    out = pp_banded_encode(params, CFG, src, mask, mesh, n_microbatches=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pp_with_data_axis_matches_single_device():
    params = _enc_params(2)
    src, mask = _data(seed=2)
    mesh = make_pipe_mesh(pipe=4, data=2)
    ref, _ = banded_encode(params, CFG, src, mask)
    out = pp_banded_encode(params, CFG, src, mask, mesh, n_microbatches=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pp_grads_match_single_device():
    am = init_am(jax.random.PRNGKey(3), CFG, 10)
    src, mask = _data(seed=3)
    tgt = np.random.default_rng(3).integers(0, 10, size=mask.shape)
    tgt = tgt.astype(np.int32)
    mesh = make_pipe_mesh(pipe=4)

    def ref_loss(p):
        loss, _, n = frame_ce_loss(p, CFG, src, mask, tgt)
        return loss / n

    def pp_loss(p):
        loss, _, n = pp_frame_ce_loss(p, CFG, src, mask, tgt, mesh)
        return loss / n

    lr, gr = jax.value_and_grad(ref_loss)(am)
    lp, gp = jax.value_and_grad(pp_loss)(am)
    assert abs(float(lr) - float(lp)) < 1e-6 * max(1.0, abs(float(lr)))
    for a, b in zip(jax.tree_util.tree_leaves(gr),
                    jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5, rtol=2e-4)


def test_pp_utt_valid_matches_single_device():
    """utt_valid (loader 'all'-mode duplicated-tail exclusion) must drop
    the same rows as models/am.py frame_ce_loss (round-4 ADVICE)."""
    am = init_am(jax.random.PRNGKey(5), CFG, 10)
    src, mask = _data(seed=5)
    tgt = np.random.default_rng(5).integers(0, 10, size=mask.shape)
    tgt = tgt.astype(np.int32)
    utt_valid = np.ones(mask.shape[0], np.uint8)
    utt_valid[-2:] = 0  # loader-duplicated tail rows
    mesh = make_pipe_mesh(pipe=4)
    ref = frame_ce_loss(am, CFG, src, mask, tgt, utt_valid=utt_valid)
    out = pp_frame_ce_loss(am, CFG, src, mask, tgt, mesh,
                           utt_valid=utt_valid)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-5)
    # and the excluded rows genuinely change the totals
    full = pp_frame_ce_loss(am, CFG, src, mask, tgt, mesh)
    assert float(full[2]) > float(out[2])


def test_pp_train_dropout_finite_and_stage_independent():
    am = init_am(jax.random.PRNGKey(4), CFG, 10)
    src, mask = _data(seed=4)
    tgt = np.zeros(mask.shape, np.int32)
    mesh = make_pipe_mesh(pipe=4)

    def loss_fn(p, key):
        loss, _, n = pp_frame_ce_loss(p, CFG, src, mask, tgt, mesh,
                                      train=True, rng=key)
        return loss / n

    l1, g = jax.value_and_grad(loss_fn)(am, jax.random.PRNGKey(0))
    assert np.isfinite(float(l1))
    gn = sum(float(jnp.sum(jnp.square(x)))
             for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0.0
    # different keys draw different dropout masks
    l2 = loss_fn(am, jax.random.PRNGKey(1))
    assert float(l1) != float(l2)


def test_pp_shape_validation():
    params = _enc_params()
    src, mask = _data()
    with pytest.raises(ValueError, match="stages"):
        pp_banded_encode(params, CFG, src, mask, make_pipe_mesh(pipe=3))
    with pytest.raises(ValueError, match="microbatch"):
        pp_banded_encode(params, CFG, src, mask, make_pipe_mesh(pipe=4),
                         n_microbatches=3)
