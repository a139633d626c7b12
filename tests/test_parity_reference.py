"""Golden parity vs the ACTUAL reference code.

Round 1 pinned the JAX model against tests/torch_ref.py — an in-repo
torch oracle that could share a misreading with the implementation
(VERDICT.md "What's missing" #2).  These tests instead load activations,
gradients, and beam-search traces recorded directly from
/root/reference's Models.py / Lattice.py (see
tests/record_reference_goldens.py) and assert this framework reproduces
them: forward logits on a padded batch, the len-1 LayerNorm-identity
quirk (reference Modules.py:43-44), fold=2 frame stacking
(Models.py:51-65), parameter gradients, and the Lattice
finished-vs-extension competition (Lattice.py:35-81).
"""

import json
import os

import jax
import numpy as np
import pytest

from pytorch_kaldi_asr_tpu.decode.lattice import Lattice
from pytorch_kaldi_asr_tpu.models.torch_import import state_dict_to_params
from pytorch_kaldi_asr_tpu.models.transformer import (
    TransformerConfig,
    encode,
    transformer_forward,
)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.fixture(scope="module")
def golden():
    path = os.path.join(GOLDEN_DIR, "reference_transformer.npz")
    if not os.path.exists(path):
        pytest.skip("reference goldens not recorded")
    return np.load(path)


def _cfg(src_fold=1):
    return TransformerConfig(
        src_dim=20,
        vocab_size=37,
        encoder_max_len=96,
        decoder_max_len=24,
        src_fold=src_fold,
        encoder_sub_sequence=(-100, 0),
        decoder_sub_sequence=(-10, 0),
        en_layers=2,
        de_layers=2,
        n_head=2,
        en_d_model=48,
        de_d_model=32,
        d_k=16,
        d_v=16,
        en_dropout=0.0,
        de_dropout=0.0,
        tdnn_contexts=((-1, 0, 1), (-1, 0, 1), (-3, 0, 3)),
    )


def _params(golden, prefix="sd/"):
    sd = {k[len(prefix):]: golden[k] for k in golden.files if k.startswith(prefix)}
    fold = 2 if prefix == "sd2/" else 1
    return state_dict_to_params(sd, _cfg(src_fold=fold))


def _inputs(golden, prefix="in/"):
    return (
        golden[prefix + "src"],
        golden[prefix + "src_mask"].astype(np.int32),
        golden[prefix + "tgt"].astype(np.int32),
        golden[prefix + "tgt_mask"].astype(np.int32),
    )


def test_forward_matches_reference_code(golden):
    cfg = _cfg()
    params = _params(golden)
    src, src_mask, tgt, tgt_mask = _inputs(golden)
    logits = transformer_forward(params, cfg, src, src_mask, tgt, tgt_mask)
    np.testing.assert_allclose(
        np.asarray(logits), golden["out/logits"], rtol=2e-4, atol=2e-4
    )


def test_encoder_matches_reference_code(golden):
    cfg = _cfg()
    params = _params(golden)
    src, src_mask, _, _ = _inputs(golden)
    enc, _ = encode(params, cfg, src, src_mask)
    np.testing.assert_allclose(
        np.asarray(enc), golden["out/enc_output"], rtol=2e-4, atol=2e-4
    )


def test_len1_decode_matches_reference_code(golden):
    """First autoregressive step: reference LayerNormalization is the
    identity when the target axis has length 1 (Modules.py:43-44)."""
    cfg = _cfg()
    params = _params(golden)
    src, src_mask, tgt, tgt_mask = _inputs(golden)
    logits = transformer_forward(
        params, cfg, src, src_mask, tgt[:, :1], tgt_mask[:, :1]
    )
    np.testing.assert_allclose(
        np.asarray(logits), golden["out/logits_len1"], rtol=2e-4, atol=2e-4
    )


def test_fold2_matches_reference_code(golden):
    """fold=2 frame stacking (reference Models.py:51-65, run.sh:79)."""
    cfg = _cfg(src_fold=2)
    params = _params(golden, "sd2/")
    src, src_mask, tgt, tgt_mask = _inputs(golden, "in2/")
    logits = transformer_forward(params, cfg, src, src_mask, tgt, tgt_mask)
    np.testing.assert_allclose(
        np.asarray(logits), golden["out2/logits"], rtol=2e-4, atol=2e-4
    )


# mapping: reference parameter name -> (pytree path extractor, transpose?)
def _grad_pairs(grads):
    dec = grads["decoder"]
    enc = grads["encoder"]
    pairs = {
        "encoder_test.src_projection.linear.weight": (enc["src_proj"]["w"], True),
        "decoder.tgt_word_emb.weight": (dec["embed"], False),
        "decoder.tgt_word_proj.linear.weight": (dec["word_proj"]["w"], True),
        "decoder.enc_dec_projection.linear.weight": (dec["enc_dec_proj"]["w"], True),
    }
    for i in range(3):
        pairs[f"encoder_test.tdnn_stack.{i}.proj.weight"] = (enc["tdnn"][i]["w"], True)
        pairs[f"encoder_test.tdnn_stack.{i}.proj.bias"] = (enc["tdnn"][i]["b"], False)
    for i in range(2):
        for ref_block, ours in (("slf_attn", "slf"), ("enc_attn", "enc")):
            blk = dec["layers"][i][ours]
            p = f"decoder.layer_stack.{i}.{ref_block}"
            pairs[p + ".w_qs"] = (blk["w_qs"], False)
            pairs[p + ".w_ks"] = (blk["w_ks"], False)
            pairs[p + ".w_vs"] = (blk["w_vs"], False)
            pairs[p + ".proj.linear.weight"] = (blk["proj"]["w"], True)
            pairs[p + ".proj.linear.bias"] = (blk["proj"]["b"], False)
            pairs[p + ".layer_norm.a_2"] = (blk["ln"]["gamma"], False)
            pairs[p + ".layer_norm.b_2"] = (blk["ln"]["beta"], False)
        ffn = dec["layers"][i]["ffn"]
        p = f"decoder.layer_stack.{i}.pos_ffn"
        for wname, ours_w in (("w_1", "w1"), ("w_2", "w2")):
            pairs[p + f".{wname}.weight"] = (ffn[ours_w]["w"], "conv")
            pairs[p + f".{wname}.bias"] = (ffn[ours_w]["b"], False)
        pairs[p + ".layer_norm.a_2"] = (ffn["ln"]["gamma"], False)
        pairs[p + ".layer_norm.b_2"] = (ffn["ln"]["beta"], False)
    return pairs


def test_grads_match_reference_code(golden):
    """d(loss)/d(params) of a fixed linear functional of the logits matches
    the reference code's autograd for every trainable parameter."""
    cfg = _cfg()
    params = _params(golden)
    src, src_mask, tgt, tgt_mask = _inputs(golden)
    loss_w = golden["in/loss_w"]

    def loss_fn(p):
        logits = transformer_forward(p, cfg, src, src_mask, tgt, tgt_mask)
        return (logits * loss_w).sum()

    loss, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss), float(golden["out/loss"]), rtol=1e-4)

    checked = 0
    for ref_name, (ours, trans) in _grad_pairs(grads).items():
        ref_g = golden["grad/" + ref_name]
        ours = np.asarray(ours)
        if trans == "conv":
            ref_g = ref_g[:, :, 0].T
        elif trans:
            ref_g = ref_g.T
        if ref_name == "decoder.tgt_word_emb.weight":
            # torch zeroes the padding_idx row's gradient (nn.Embedding
            # padding_idx=0); this framework masks PAD out of the loss
            # instead, so row 0 is not compared.
            ref_g, ours = ref_g[1:], ours[1:]
        np.testing.assert_allclose(
            ours, ref_g, rtol=5e-4, atol=5e-4,
            err_msg=f"gradient mismatch for {ref_name}",
        )
        checked += 1
    assert checked >= 40


def test_lattice_matches_reference_trace():
    path = os.path.join(GOLDEN_DIR, "reference_lattice.json")
    if not os.path.exists(path):
        pytest.skip("reference goldens not recorded")
    with open(path) as f:
        trace = json.load(f)

    lat = Lattice(max_length=trace["max_length"], beam_size=trace["beam"])
    for step in trace["steps"]:
        weights = np.array(step["weights"])
        done = lat.advance(weights)
        assert done == step["done"]
        res_all, w_all = lat.get_results("all")
        assert res_all == step["results_all"]
        np.testing.assert_allclose(w_all, step["weights_all"], rtol=1e-9, atol=1e-9)
        res_end, w_end = lat.get_results("end")
        assert res_end == step["results_end"]
        np.testing.assert_allclose(w_end, step["weights_end"], rtol=1e-9, atol=1e-9)
