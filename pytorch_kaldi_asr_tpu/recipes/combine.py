"""Standalone checkpoint-combining entry point (reference local/combine.py):
progressively average an explicit list of checkpoints, evaluate each prefix
average on a data dir, and save the best as combined.accuXX.

(The in-training combine, train.py driver, evaluates on dev; this standalone
tool evaluates on whatever dir you point it at — the reference's standalone
combine.py used test, combine.py:63.)"""

import argparse
import os

from pytorch_kaldi_asr_tpu.data import read_vocab
from pytorch_kaldi_asr_tpu.data.loader import make_batch_loader
from pytorch_kaldi_asr_tpu.train import (
    average_params,
    load_checkpoint,
    save_checkpoint,
)
from pytorch_kaldi_asr_tpu.train.loop import run_eval
from pytorch_kaldi_asr_tpu.train.state import make_eval_step
from pytorch_kaldi_asr_tpu.utils.logging import info, procedure


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-model_list", required=True,
                        help="comma-separated checkpoint dirs, best first")
    parser.add_argument("-read_data_dir", required=True)
    parser.add_argument("-read_vocab_file", required=True)
    parser.add_argument("-save_model_dir", required=True)
    parser.add_argument("-batch_size", type=int, default=64)
    opt = parser.parse_args(argv)

    paths = [p for p in opt.model_list.split(",") if p]
    procedure("combining %d models with model averaging..." % len(paths))
    first = load_checkpoint(paths[0])
    cfg = first["cfg"]
    vocab = read_vocab(opt.read_vocab_file)
    loader = make_batch_loader(opt.read_data_dir, vocab, opt.batch_size,
                               mode="all")
    eval_step = make_eval_step(cfg)

    running = first["params"]
    best_accu, best_params = -1.0, None
    for i, path in enumerate(paths):
        if i > 0:
            ckpt = load_checkpoint(path)
            running = average_params(running=running, new=ckpt["params"],
                                     count=i)
        info("averaging %d models", i + 1)
        _, accu = run_eval(running, eval_step, loader)
        info("-----(evaluating combining set)----- accuracy: %3.2f %%",
             100 * accu)
        if accu > best_accu:
            best_accu, best_params = accu, running

    out = os.path.join(opt.save_model_dir,
                       f"combined.accu{100 * best_accu:3.2f}")
    save_checkpoint(out, best_params, cfg, extra={"combined_accu": best_accu})
    info("best combined model (accuracy %3.2f %%) saved to %s",
         100 * best_accu, out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
