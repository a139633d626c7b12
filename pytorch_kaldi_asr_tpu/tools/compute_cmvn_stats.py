"""compute-cmvn-stats CLI clone: accumulate per-speaker (or per-utterance)
CMVN statistics.

Usage::

    python3 -m pytorch_kaldi_asr_tpu.tools.compute_cmvn_stats \
        [--spk2utt=ark:data/x/spk2utt | --utt2spk=ark:data/x/utt2spk] \
        scp:data/x/feats.scp ark,scp:data/x/cmvn.ark,data/x/cmvn.scp

(The upstream pipeline runs this during feature extraction; our recipe's
stage 0 invokes it on demand so data dirs need no pre-existing cmvn.scp.)"""

import sys

from pytorch_kaldi_asr_tpu.tools.cmvn import compute_cmvn_stats


def main(argv=None):
    argv = list(argv or sys.argv[1:])
    utt2spk = None
    tmp_to_delete = None
    rest = []
    for a in argv:
        if a.startswith("--utt2spk="):
            spec = a.split("=", 1)[1]
            utt2spk = spec.split(":", 1)[1] if ":" in spec else spec
        elif a.startswith("--spk2utt="):
            # accept spk2utt for CLI parity; convert to utt->spk mapping
            spec = a.split("=", 1)[1]
            path = spec.split(":", 1)[1] if ":" in spec else spec
            mapping = {}
            with open(path, encoding="utf-8") as f:
                for line in f:
                    parts = line.split()
                    for utt in parts[1:]:
                        mapping[utt] = parts[0]
            import tempfile

            tmp = tempfile.NamedTemporaryFile(
                "w", suffix=".utt2spk", delete=False
            )
            for utt, spk in mapping.items():
                tmp.write(f"{utt} {spk}\n")
            tmp.close()
            utt2spk = tmp.name
            tmp_to_delete = tmp.name
        else:
            rest.append(a)
    if len(rest) != 2:
        print(
            "usage: compute_cmvn_stats [--utt2spk=ark:f|--spk2utt=ark:f] "
            "<feats-rspecifier> <stats-wspecifier>",
            file=sys.stderr,
        )
        return 1
    try:
        compute_cmvn_stats(rest[0], rest[1], utt2spk=utt2spk)
    finally:
        if tmp_to_delete is not None:
            import os

            os.unlink(tmp_to_delete)
    return 0


if __name__ == "__main__":
    sys.exit(main())
