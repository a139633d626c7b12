"""best_wer CLI (reference kaldi/best_wer.sh): print the line with the
lowest %WER.  Two modes, matching the reference's filter contract:

- no arguments: filter stdin (``grep WER */wer | best_wer`` — how the
  recipe invokes it, reference run.sh:198-203);
- arguments: WER report files or a glob.
"""

import re
import sys

from pytorch_kaldi_asr_tpu.score.best_wer import best_wer

_WER_RE = re.compile(r"%WER\s+(\d+(?:\.\d+)?)")


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        best_line, best_value = None, float("inf")
        for line in sys.stdin:
            m = _WER_RE.search(line)
            if m and float(m.group(1)) < best_value:
                best_line, best_value = line.strip(), float(m.group(1))
        if best_line is None:
            print("no WER lines found", file=sys.stderr)
            return 1
        print(best_line)
        return 0
    target = argv[0] if len(argv) == 1 else argv
    line, path, value = best_wer(target)
    if line is None:
        print("no WER lines found", file=sys.stderr)
        return 1
    print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
