"""Weight-only int8 serving quantization (ops/quant.py + recipes/serve.py
-quantize_weights)."""

import jax
import numpy as np
import pytest

from pytorch_kaldi_asr_tpu.models import init_transformer
from pytorch_kaldi_asr_tpu.ops.quant import (
    dequantize_array,
    dequantize_tree,
    quantize_array,
    quantize_tree,
    tree_bytes,
)
from tests.test_models import small_cfg


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = rng.normal(scale=0.3, size=(64, 48)).astype(np.float32)
    q = quantize_array(w)
    assert q["q8"].dtype == np.int8
    assert q["scale"].shape == (48,)
    deq = np.asarray(dequantize_array(q))
    # symmetric rounding: per-element error <= scale/2 of that column
    assert np.all(np.abs(deq - w) <= q["scale"][None, :] * 0.5 + 1e-7)


def test_quantize_zero_channel_no_nan():
    w = np.zeros((32, 4), np.float32)
    w[:, 1] = 1.0
    q = quantize_array(w)
    deq = np.asarray(dequantize_array(q))
    assert np.isfinite(deq).all()
    np.testing.assert_allclose(deq[:, 0], 0.0)
    np.testing.assert_allclose(deq[:, 1], 1.0)


def test_quantize_tree_selects_matmul_weights():
    cfg = small_cfg()
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    before = tree_bytes(params)
    qtree, n = quantize_tree(params, min_size=256)
    assert n > 5  # projections/FFN/attention weights got picked up
    after = tree_bytes(qtree)
    assert after < 0.5 * before  # big leaves dominate -> near-4x shrink
    # biases stayed float
    flat = jax.tree_util.tree_leaves(qtree)
    assert any(np.asarray(leaf).dtype == np.float32 for leaf in flat)
    # dequantized tree has the original structure and close values
    deq = dequantize_tree(qtree)
    jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: a.shape == b.shape, params, deq))


def test_quantized_posteriors_agree():
    """int8-weight AM posteriors pick the same argmax as float on nearly
    every frame (weight-only quantization is almost lossless here)."""
    from pytorch_kaldi_asr_tpu.models import am

    cfg = small_cfg()
    n_targets = 9
    params = am.init_am(jax.random.PRNGKey(1), cfg, n_targets)
    qtree, n = quantize_tree(params, min_size=256)
    assert n >= 3
    rng = np.random.default_rng(2)
    src = rng.normal(size=(2, 24, cfg.src_dim)).astype(np.float32)
    mask = np.ones((2, 24), np.uint8)

    logp_f, _ = am.am_log_posteriors(params, cfg, src, mask)
    logp_q, _ = am.am_log_posteriors(dequantize_tree(qtree), cfg, src, mask)
    agree = np.mean(
        np.asarray(logp_f).argmax(-1) == np.asarray(logp_q).argmax(-1))
    assert agree > 0.95, agree
    assert np.max(np.abs(np.asarray(logp_f) - np.asarray(logp_q))) < 0.2


def test_quantized_decode_dataset(tmp_path):
    """decode_dataset(quantize_weights=True): batch decoding through the
    int8 tree writes a well-formed n-best file."""
    from pytorch_kaldi_asr_tpu.data.loader import BatchLoader
    from pytorch_kaldi_asr_tpu.decode.runner import decode_dataset

    cfg = small_cfg()
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    triples = [(f"u{i}", rng.normal(size=(10 + i, cfg.src_dim))
                .astype(np.float32), [2, 4, 3]) for i in range(3)]
    loader = BatchLoader(triples, 2, mode="all", shuffle=False)
    vocab = {"<blank>": 0, "<unk>": 1, "<s>": 2, "</s>": 3, "aa": 4}
    out = tmp_path / "decode.txt"
    lines = decode_dataset(params, cfg, loader, vocab, beam_size=2,
                           nbest=2, max_token_seq_len=6,
                           save_result_file=str(out),
                           quantize_weights=True)
    text = out.read_text().strip().splitlines()
    assert lines == len(text) == 3 * 2
    for line in text:
        key, score, _hyp = line.split("\t")
        assert key.startswith("u") and np.isfinite(float(score))


def test_quantized_decode_with_fusion(tmp_path):
    """decode_dataset composes int8 weights with shallow fusion: both
    trees quantized, dequantized inside the jitted fused search."""
    from pytorch_kaldi_asr_tpu.data.loader import BatchLoader
    from pytorch_kaldi_asr_tpu.decode.runner import decode_dataset
    from pytorch_kaldi_asr_tpu.models.nlm import init_nlm
    from pytorch_kaldi_asr_tpu.models.transformer import TransformerConfig

    cfg = small_cfg()
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    lm_cfg = TransformerConfig(
        src_dim=1, vocab_size=cfg.vocab_size, de_d_model=16, de_layers=1,
        n_head=2, d_k=8, d_v=8, decoder_max_len=16,
        decoder_sub_sequence=(-16, 0), de_dropout=0.0, encoder_max_len=8,
        ln_skip_len1=False,
    )
    lm_params = init_nlm(jax.random.PRNGKey(1), lm_cfg)
    rng = np.random.default_rng(0)
    triples = [("u0", rng.normal(size=(9, cfg.src_dim))
                .astype(np.float32), [2, 4, 3])]
    loader = BatchLoader(triples, 1, mode="all", shuffle=False)
    vocab = {"<blank>": 0, "<unk>": 1, "<s>": 2, "</s>": 3, "aa": 4}
    out = tmp_path / "decode.txt"
    lines = decode_dataset(params, cfg, loader, vocab, beam_size=2,
                           nbest=1, max_token_seq_len=5,
                           save_result_file=str(out),
                           quantize_weights=True,
                           fusion=(lm_params, lm_cfg, 0.4))
    assert lines == 1
    key, score, _hyp = out.read_text().rstrip("\n").split("\t", 2)
    assert key == "u0" and np.isfinite(float(score))


def test_quantized_recognizer_serves(tmp_path):
    """Recognizer(quantize_weights=True): search compiles with the int8
    tree (dequant inside jit), produces well-formed hypotheses, and the
    hot-reload path re-quantizes."""
    from pytorch_kaldi_asr_tpu.recipes import serve as serve_mod
    from pytorch_kaldi_asr_tpu.train import save_checkpoint

    cfg = small_cfg()
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    save_checkpoint(str(tmp_path / "model"), params, cfg, epoch=0)
    vocab = {"<blank>": 0, "<unk>": 1, "<s>": 2, "</s>": 3, "aa": 4,
             "bb": 5}
    with open(tmp_path / "vocab.txt", "w") as f:
        for w, i in vocab.items():
            f.write(f"{w} {i}\n")

    rec = serve_mod.Recognizer(str(tmp_path / "model"),
                               str(tmp_path / "vocab.txt"),
                               beam_size=2, buckets=(8,),
                               quantize_weights=True)
    # params really are stored quantized (the toy model keeps many
    # below-min_size leaves float, so the shrink is well under 4x here)
    assert tree_bytes(rec.params) < 0.6 * tree_bytes(params)
    rng = np.random.default_rng(0)
    hyps, decoded = rec.recognize(
        rng.normal(size=(6, cfg.src_dim)).astype(np.float32), nbest=2)
    assert decoded == 6 and hyps
    for text, score in hyps:
        assert isinstance(text, str) and np.isfinite(score)

    meta = rec.reload()  # same file; must re-quantize, not crash
    assert isinstance(meta, dict)
    assert tree_bytes(rec.params) < 0.6 * tree_bytes(params)
    hyps2, _ = rec.recognize(
        rng.normal(size=(6, cfg.src_dim)).astype(np.float32))
    assert hyps2
