"""lattice-copy clone: convert lattice tables between Kaldi's binary
CompactLattice ark format and the text archive format.

The reference pipeline hands lattices between Kaldi binaries in both forms
(its convert_slf.pl consumes ``lattice-copy ark,t:`` output); this tool
closes the loop so lattices from recipes/latgen.py interchange with
external Kaldi toolchains byte-for-byte (fst/openfst_io.py formats).

Usage::

    python3 -m pytorch_kaldi_asr_tpu.tools.lattice_copy \
        -words graph/words.txt ark:lat.ark ark,t:lat.txt
    python3 -m pytorch_kaldi_asr_tpu.tools.lattice_copy \
        -words graph/words.txt ark,t:lat.txt ark,scp:lat.ark,lat.scp
"""

from __future__ import annotations

import argparse
import sys

from pytorch_kaldi_asr_tpu.decode.lattice_io import WordLattice
from pytorch_kaldi_asr_tpu.fst.openfst_io import (
    read_lattice_ark,
    write_lattice_ark,
)


def _read_words(path):
    word2id = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                word2id[parts[0]] = int(parts[1])
    return word2id


def _read_text_archive(path):
    block, utt = [], None
    with open(path, encoding="utf-8") as f:
        for line in list(f) + [""]:
            stripped = line.strip()
            if utt is None:
                if stripped:
                    utt = stripped.split()[0]
                continue
            if stripped:
                block.append(stripped)
            else:
                yield utt, WordLattice.read_kaldi_text(block, utt=utt)
                block, utt = [], None


def read_lattices(rspecifier, word2id):
    head, _, path = rspecifier.partition(":")
    parts = head.split(",")
    if parts[0] != "ark":
        raise ValueError(f"unsupported rspecifier {rspecifier!r}")
    if "t" in parts[1:]:
        yield from _read_text_archive(path)
    else:
        id2word = {v: k for k, v in word2id.items()}
        yield from read_lattice_ark(path, id2word)


def write_lattices(lattices, wspecifier, word2id):
    head, _, rest = wspecifier.partition(":")
    parts = head.split(",")
    if parts[0] != "ark":
        raise ValueError(f"unsupported wspecifier {wspecifier!r}")
    lattices = list(lattices)
    if "t" in parts[1:]:
        with open(rest, "w", encoding="utf-8") as f:
            for lat in lattices:
                f.write(f"{lat.utt}\n")
                lat.write_kaldi_text(f)
                f.write("\n")
    elif "scp" in parts[1:]:
        ark_path, _, scp_path = rest.partition(",")
        if not scp_path:
            raise ValueError(f"ark,scp wspecifier needs two paths: "
                             f"{wspecifier!r}")
        write_lattice_ark(lattices, ark_path, word2id, scp_path=scp_path)
    else:
        write_lattice_ark(lattices, rest, word2id)
    return len(lattices)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-words", required=True,
                        help="word symbol table (words.txt)")
    parser.add_argument("rspecifier")
    parser.add_argument("wspecifier")
    opt = parser.parse_args(argv)
    word2id = _read_words(opt.words)
    n = write_lattices(
        (lat for _, lat in read_lattices(opt.rspecifier, word2id)),
        opt.wspecifier, word2id,
    )
    print(f"[INFO] copied {n} lattices", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
