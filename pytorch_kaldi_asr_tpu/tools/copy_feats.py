"""copy-feats clone: copy/convert feature tables between representations
(binary ark, text ark, ark+scp pairs) — the everyday Kaldi plumbing verb for
re-materializing archives.

Usage::

    python3 -m pytorch_kaldi_asr_tpu.tools.copy_feats \
        scp:feats.scp ark,scp:copy.ark,copy.scp
    python3 -m pytorch_kaldi_asr_tpu.tools.copy_feats ark:in.ark ark,t:out.ark
"""

import sys

from pytorch_kaldi_asr_tpu.io import kaldi_io


def copy_feats(rspecifier, wspecifier):
    n = 0
    with kaldi_io.open_writer(wspecifier) as w:
        for key, mat in kaldi_io.read_table(rspecifier):
            w.write(key, mat)
            n += 1
    return n


def main(argv=None):
    argv = list(argv or sys.argv[1:])
    if len(argv) != 2:
        print("usage: copy_feats <rspecifier> <wspecifier>", file=sys.stderr)
        return 1
    n = copy_feats(argv[0], argv[1])
    print(f"[INFO] copied {n} feature matrices", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
