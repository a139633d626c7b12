"""best_wer CLI (reference kaldi/best_wer.sh): read WER report files (or a
glob) and print the line with the lowest %WER."""

import sys

from pytorch_kaldi_asr_tpu.score.best_wer import best_wer


def main(argv=None):
    argv = list(argv or sys.argv[1:])
    if not argv:
        print("usage: best_wer <wer-file-or-glob> [...]", file=sys.stderr)
        return 1
    target = argv[0] if len(argv) == 1 else argv
    line, path, value = best_wer(target)
    if line is None:
        print("no WER lines found", file=sys.stderr)
        return 1
    print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
