"""Standalone checkpoint-combining entry point (reference local/combine.py):
progressively average an explicit list of checkpoints, evaluate each prefix
average on a data dir, and save the best as combined.accuXX.

Thin CLI over train.loop.combine_checkpoints (the same machinery the
training driver uses) with an explicit path list instead of an epoch scan.
The reference's standalone combine evaluated on test where the in-training
one used dev (combine.py:63) — here the eval set is whatever dir you pass."""

import argparse

from pytorch_kaldi_asr_tpu.data import read_vocab
from pytorch_kaldi_asr_tpu.data.loader import make_batch_loader
from pytorch_kaldi_asr_tpu.train import combine_checkpoints, load_checkpoint


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
    cfg = load_checkpoint(paths[0])["cfg"]
    vocab = read_vocab(opt.read_vocab_file)
    loader = make_batch_loader(opt.read_data_dir, vocab, opt.batch_size,
                               mode="all")
    combine_checkpoints(opt.save_model_dir, cfg=cfg, eval_loader=loader,
                        paths=paths)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
