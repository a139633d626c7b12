"""Stage-5 LM scoring entry point: per-hypothesis LM log-probabilities for
an n-best file, line-aligned with the input (replaces the reference's
``ngram -ppl -debug 1 | grep logprob | cut`` pipeline, run.sh:180-182).

NOTE on a reference quirk we deliberately do NOT reproduce: the recipe pipes
decode.txt through ``cut -d' ' -f2-`` (run.sh:180), but decode.txt is
TAB-separated — so for multi-word hypotheses the first word is glued to
``key\\tscore`` in field 1 and silently dropped from LM scoring.  Here the
LM scores the full hypothesis text."""

import argparse

from pytorch_kaldi_asr_tpu.lm import read_arpa
from pytorch_kaldi_asr_tpu.utils.logging import info


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-decode_file", required=True,
                        help="n-best file: key\\tscore\\ttext per line")
    parser.add_argument("-lm", required=True, help="ARPA LM (.gz ok)")
    parser.add_argument("-save_score_file", required=True,
                        help="output: one log10-prob per input line")
    opt = parser.parse_args(argv)

    lm = read_arpa(opt.lm)
    n = 0
    with open(opt.decode_file, encoding="utf-8") as fin, \
            open(opt.save_score_file, "w", encoding="utf-8") as fout:
        for line in fin:
            if not line.strip():
                continue
            _key, _am, text = line.rstrip("\n").split("\t")
            lp, _scored, _oov = lm.sentence_logprob(text.split())
            fout.write(f"{lp:.4f}\n")
            n += 1
    info("scored %d hypotheses -> %s", n, opt.save_score_file)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
