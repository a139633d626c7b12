"""Archive-packing entry point (reference pytorch/utils/generate_archive.py
role): pre-pack a data dir into fixed-shape .npz batch archives for corpora
too large to preload."""

import argparse

from pytorch_kaldi_asr_tpu.data import read_vocab
from pytorch_kaldi_asr_tpu.data.archive import generate_archives
from pytorch_kaldi_asr_tpu.data.loader import build_triples


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-read_data_dir", required=True)
    parser.add_argument("-read_vocab_file", required=True)
    parser.add_argument("-save_archive_dir", required=True)
    parser.add_argument("-size_archive", type=int, default=512)
    parser.add_argument("-prefix", default="data")
    opt = parser.parse_args(argv)

    vocab = read_vocab(opt.read_vocab_file)
    triples = build_triples(
        f"{opt.read_data_dir}/feats.scp", f"{opt.read_data_dir}/text", vocab
    )
    generate_archives(triples, opt.save_archive_dir,
                      size_archive=opt.size_archive, prefix=opt.prefix)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
