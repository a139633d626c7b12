"""Shallow-fusion weight sweep: decode a dataset at several LM weights
and report WER per weight (the fusion analogue of the recipe's 16-way
inverse-weight rescoring sweep, reference run.sh:186-203).

``lm_weight`` is a TRACED argument of fused_beam_search, so the whole
sweep reuses ONE compiled search — each extra weight costs only the
decode itself.

Usage::

    python3 -m pytorch_kaldi_asr_tpu.tools.sweep_fusion \
        -read_data_dir data/dev_filtered -read_vocab_file lang/vocab.txt \
        -load_model_file exp/model/combined.accuXX \
        -nlm_model_dir lang/nlm -weights 0,0.3,0.5,1.0 \
        -save_dir exp/fusion_sweep
"""

from __future__ import annotations

import argparse
import os

from pytorch_kaldi_asr_tpu.data.instances import read_vocab
from pytorch_kaldi_asr_tpu.data.loader import make_batch_loader
from pytorch_kaldi_asr_tpu.decode.runner import decode_dataset
from pytorch_kaldi_asr_tpu.io import kaldi_io
from pytorch_kaldi_asr_tpu.models.nlm import load_nlm
from pytorch_kaldi_asr_tpu.score.wer import compute_wer
from pytorch_kaldi_asr_tpu.train.checkpoint import load_checkpoint
from pytorch_kaldi_asr_tpu.utils.logging import info


def one_best_table(nbest_path):
    """First hypothesis per key from a ``key\\tscore\\ttext`` n-best file
    (score/rescore.py read_nbest owns the format parsing)."""
    from pytorch_kaldi_asr_tpu.score.rescore import read_nbest

    table = read_nbest(nbest_path)
    return {key: texts[0].split() for key, (_am, _lm, texts)
            in table.items()}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-read_data_dir", required=True)
    parser.add_argument("-read_vocab_file", required=True)
    parser.add_argument("-load_model_file", required=True)
    parser.add_argument("-nlm_model_dir", required=True)
    parser.add_argument("-weights", default="0,0.2,0.4,0.6,0.8,1.0",
                        help="comma-separated fusion weights to sweep")
    parser.add_argument("-ref_text", default=None,
                        help="reference transcripts (default: "
                             "<data_dir>/text)")
    parser.add_argument("-max_token_seq_len", type=int, default=100)
    parser.add_argument("-batch_size", type=int, default=8)
    parser.add_argument("-beam_size", type=int, default=8)
    parser.add_argument("-num_buckets", type=int, default=1)
    parser.add_argument("-save_dir", required=True)
    opt = parser.parse_args(argv)

    weights = [float(w) for w in opt.weights.split(",") if w.strip()]
    vocab = read_vocab(opt.read_vocab_file)
    ckpt = load_checkpoint(opt.load_model_file)
    lm_params, lm_cfg, _ = load_nlm(opt.nlm_model_dir)
    ref_path = opt.ref_text or os.path.join(opt.read_data_dir, "text")
    ref = kaldi_io.read_key_value_text(ref_path)
    ref = {k: v.split() for k, v in ref.items()}
    os.makedirs(opt.save_dir, exist_ok=True)

    results = []
    for w in weights:
        out = os.path.join(opt.save_dir, f"decode_w{w:g}.txt")
        loader = make_batch_loader(opt.read_data_dir, vocab,
                                   opt.batch_size, mode="all",
                                   shuffle=False,
                                   num_buckets=opt.num_buckets)
        decode_dataset(
            ckpt["params"], ckpt["cfg"], loader, vocab,
            beam_size=opt.beam_size, nbest=1,
            max_token_seq_len=opt.max_token_seq_len,
            save_result_file=out,
            fusion=(lm_params, lm_cfg, w),
        )
        stats = compute_wer(ref, one_best_table(out), mode="present")
        wer = stats["wer"]
        results.append((w, wer, stats))
        info("fusion weight %g: %%WER %.2f [ %d / %d ]", w, wer,
             stats["errors"], stats["words"])

    best_w, best_wer, _ = min(results, key=lambda r: r[1])
    summary = os.path.join(opt.save_dir, "sweep.txt")
    with open(summary, "w", encoding="utf-8") as f:
        for w, wer, stats in results:
            f.write(f"weight {w:g}\t%WER {wer:.2f} "
                    f"[ {stats['errors']} / {stats['words']} ]\n")
        f.write(f"best\tweight {best_w:g}\t%WER {best_wer:.2f}\n")
    info("sweep summary -> %s (best: weight %g at %%WER %.2f)", summary,
         best_w, best_wer)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
