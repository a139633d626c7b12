"""Record golden activations from the ACTUAL reference code.

Runs /root/reference's Transformer (Models.py) and Lattice (Lattice.py)
on fixed seeds/inputs and writes:

- tests/goldens/reference_transformer.npz — state dict, inputs, forward
  logits (padded batch, len-1 decode step, fold=2 variant), encoder
  output, and parameter gradients for a fixed linear loss;
- tests/goldens/reference_lattice.json — the advance()/get_results()
  trace for a fixed 3-step beam-search input.

tests/test_parity_reference.py pins the JAX framework against these
artifacts, replacing the round-1 self-referential torch oracle
(VERDICT.md "What's missing" #2).  Re-run this script only to regenerate
the goldens; it requires /root/reference to be mounted.

Usage: python tests/record_reference_goldens.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from ref_compat import import_reference  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

# Small but fully heterogeneous config: distinct src_dim / d_model /
# de_d_model / d_k so any transposition bug breaks shapes or values.
CFG = dict(
    n_src_dim=20,
    n_tgt_vocab=37,
    encoder_max_len=96,
    decoder_max_len=24,
    src_fold=1,
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
    tdnn_contexts=[[-1, 0, 1], [-1, 0, 1], [-3, 0, 3]],
)


def build_model(Models, torch, cfg, seed=0, lda_seed=7):
    torch.manual_seed(seed)
    spliced = cfg["n_src_dim"] * cfg["src_fold"] * 5
    lda = np.random.RandomState(lda_seed).randn(spliced, spliced + 1).astype(np.float32) * 0.3
    m = Models.Transformer(
        n_src_dim=cfg["n_src_dim"],
        n_tgt_vocab=cfg["n_tgt_vocab"],
        lda_mat=lda,
        encoder_max_len=cfg["encoder_max_len"],
        decoder_max_len=cfg["decoder_max_len"],
        src_fold=cfg["src_fold"],
        encoder_sub_sequence=tuple(cfg["encoder_sub_sequence"]),
        decoder_sub_sequence=tuple(cfg["decoder_sub_sequence"]),
        en_layers=cfg["en_layers"],
        de_layers=cfg["de_layers"],
        n_head=cfg["n_head"],
        en_d_model=cfg["en_d_model"],
        de_d_model=cfg["de_d_model"],
        d_k=cfg["d_k"],
        d_v=cfg["d_v"],
        en_dropout=cfg["en_dropout"],
        de_dropout=cfg["de_dropout"],
        tdnn_contexts=cfg["tdnn_contexts"],
    )
    m.eval()
    return m, lda


def make_inputs(torch, cfg, batch=3, src_len=40, tgt_len=9, seed=1):
    rs = np.random.RandomState(seed)
    src = rs.randn(batch, src_len, cfg["n_src_dim"]).astype(np.float32)
    src_mask = np.ones((batch, src_len), dtype=np.uint8)
    src_mask[1, 30:] = 0
    src_mask[2, 18:] = 0
    tgt = rs.randint(4, cfg["n_tgt_vocab"], size=(batch, tgt_len)).astype(np.int64)
    tgt[:, 0] = 2  # BOS
    tgt_mask = np.ones((batch, tgt_len), dtype=np.uint8)
    tgt_mask[1, 7:] = 0
    tgt[1, 7:] = 0  # PAD ids where masked, as pad_to_longest produces
    tgt_mask[2, 5:] = 0
    tgt[2, 5:] = 0
    return (
        torch.from_numpy(src),
        torch.from_numpy(src_mask),
        torch.from_numpy(tgt),
        torch.from_numpy(tgt_mask),
    )


def record_transformer(Models, torch):
    out = {}
    m, lda = build_model(Models, torch, CFG)
    for k, v in m.state_dict().items():
        out["sd/" + k] = v.detach().numpy()
    out["lda_mat"] = lda

    src, src_mask, tgt, tgt_mask = make_inputs(torch, CFG)
    out["in/src"] = src.numpy()
    out["in/src_mask"] = src_mask.numpy()
    out["in/tgt"] = tgt.numpy()
    out["in/tgt_mask"] = tgt_mask.numpy()

    with torch.no_grad():
        logits = m(src, src_mask, tgt, tgt_mask)
        folded_src, folded_mask = Models.fold_seq_and_mask(src, src_mask, CFG["src_fold"])
        enc = m.encoder_test(folded_src, folded_mask)
    out["out/logits"] = logits.detach().numpy()
    out["out/enc_output"] = enc.detach().numpy()

    # len-1 decode step: exercises the LayerNormalization seq-len-1 identity
    # quirk (reference Modules.py:43-44).
    with torch.no_grad():
        t1 = tgt[:, :1]
        t1_mask = tgt_mask[:, :1]
        logits1 = m(src, src_mask, t1, t1_mask)
    out["out/logits_len1"] = logits1.detach().numpy()

    # Gradients of a fixed linear functional of the logits wrt every
    # trainable parameter (LDA + positional tables are frozen upstream).
    loss_w = np.random.RandomState(5).randn(*out["out/logits"].shape).astype(np.float32)
    out["in/loss_w"] = loss_w
    m.zero_grad()
    logits = m(src, src_mask, tgt, tgt_mask)
    loss = (logits * torch.from_numpy(loss_w)).sum()
    loss.backward()
    out["out/loss"] = np.array(float(loss.detach()), dtype=np.float64)
    for name, p in m.named_parameters():
        if p.grad is not None:
            out["grad/" + name] = p.grad.detach().numpy()

    # fold=2 variant: exercises fold_seq_and_mask (reference Models.py:51-65).
    cfg2 = dict(CFG, src_fold=2)
    m2, lda2 = build_model(Models, torch, cfg2, seed=3, lda_seed=11)
    for k, v in m2.state_dict().items():
        out["sd2/" + k] = v.detach().numpy()
    out["lda_mat2"] = lda2
    src2, src_mask2, tgt2, tgt_mask2 = make_inputs(torch, cfg2, src_len=38, seed=9)
    with torch.no_grad():
        logits2 = m2(src2, src_mask2, tgt2, tgt_mask2)
    out["in2/src"] = src2.numpy()
    out["in2/src_mask"] = src_mask2.numpy()
    out["in2/tgt"] = tgt2.numpy()
    out["in2/tgt_mask"] = tgt_mask2.numpy()
    out["out2/logits"] = logits2.detach().numpy()
    return out


def record_lattice(Lattice):
    """Drive the reference Lattice through a fixed 4-step trace, recording
    edges + results after every advance (reference Lattice.py:35-107)."""
    rs = np.random.RandomState(3)
    vocab, beam = 12, 5
    lat = Lattice.Lattice(max_length=6, beam_size=beam)
    trace = {"vocab": vocab, "beam": beam, "max_length": 6, "steps": []}
    for step in range(4):
        n_active = lat.num_curr_active
        weights = np.round(rs.randn(max(n_active, 1), vocab) * 2.0, 3)
        # push some mass onto EOS so finished-vs-extension competition
        # (Lattice.py:50-56) actually triggers mid-trace
        if step >= 1:
            weights[:, 3] += 2.0
        done = lat.advance(weights)
        results_all, w_all = lat.get_results("all")
        results_end, w_end = lat.get_results("end")
        trace["steps"].append(
            {
                "weights": weights.tolist(),
                "done": bool(done),
                "edges": [[int(e[0]), int(e[1]), float(e[2])] for e in lat.edges],
                "curr_edge_index": [int(i) for i in lat.curr_edge_index],
                "results_all": [[int(w) for w in r] for r in results_all],
                "weights_all": [float(w) for w in w_all],
                "results_end": [[int(w) for w in r] for r in results_end],
                "weights_end": [float(w) for w in w_end],
            }
        )
        if done:
            break
    return trace


def main():
    Models, Modules, Lattice, constants, instances_handler = import_reference()
    import torch

    os.makedirs(GOLDEN_DIR, exist_ok=True)

    arrays = record_transformer(Models, torch)
    np.savez_compressed(os.path.join(GOLDEN_DIR, "reference_transformer.npz"), **arrays)
    print(f"wrote reference_transformer.npz ({len(arrays)} arrays)")

    trace = record_lattice(Lattice)
    with open(os.path.join(GOLDEN_DIR, "reference_lattice.json"), "w") as f:
        json.dump(trace, f, indent=1)
    print(f"wrote reference_lattice.json ({len(trace['steps'])} steps)")


if __name__ == "__main__":
    main()
