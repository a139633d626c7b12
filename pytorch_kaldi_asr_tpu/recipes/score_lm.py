"""Stage-5 LM scoring entry point: per-hypothesis LM log-probabilities for
an n-best file, line-aligned with the input (replaces the reference's
``ngram -ppl -debug 1 | grep logprob | cut`` pipeline, run.sh:180-182).
With ``-nlm_model_dir`` the scores come from a trained neural LM instead
(models/nlm.py — the kaldi/utils/rnnlm_compute_scores.sh role): same
line-aligned log10 contract, so recipes/rescore.py consumes either.

NOTE on a reference quirk we deliberately do NOT reproduce: the recipe pipes
decode.txt through ``cut -d' ' -f2-`` (run.sh:180), but decode.txt is
TAB-separated — so for multi-word hypotheses the first word is glued to
``key\\tscore`` in field 1 and silently dropped from LM scoring.  Here the
LM scores the full hypothesis text."""

import argparse

from pytorch_kaldi_asr_tpu.utils.logging import info


def _read_hypotheses(path):
    """(word_lists) from a ``key\\tscore\\ttext`` n-best file, skipping
    blank lines (same filter the ARPA path applies)."""
    out = []
    with open(path, encoding="utf-8") as fin:
        for line in fin:
            if not line.strip():
                continue
            _key, _am, text = line.rstrip("\n").split("\t")
            out.append(text.split())
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-decode_file", required=True,
                        help="n-best file: key\\tscore\\ttext per line")
    parser.add_argument("-lm", default=None, help="ARPA LM (.gz ok)")
    parser.add_argument("-nlm_model_dir", default=None,
                        help="neural LM checkpoint (recipes/train_nlm.py) "
                             "to score with instead of an ARPA model")
    parser.add_argument("-read_vocab_file", default=None,
                        help="vocab for -nlm_model_dir (must be the one "
                             "the neural LM was trained with)")
    parser.add_argument("-batch_size", type=int, default=64,
                        help="neural scoring batch (one compiled shape)")
    parser.add_argument("-save_score_file", required=True,
                        help="output: one log10-prob per input line")
    opt = parser.parse_args(argv)
    if bool(opt.lm) == bool(opt.nlm_model_dir):
        parser.error("pass exactly one of -lm / -nlm_model_dir")

    if opt.nlm_model_dir:
        if not opt.read_vocab_file:
            parser.error("-nlm_model_dir needs -read_vocab_file")
        from pytorch_kaldi_asr_tpu.data.instances import read_vocab
        from pytorch_kaldi_asr_tpu.models.nlm import (
            load_nlm,
            score_sentences,
        )

        params, cfg, _meta = load_nlm(opt.nlm_model_dir)
        word2idx = read_vocab(opt.read_vocab_file)
        hyps = _read_hypotheses(opt.decode_file)
        scores = score_sentences(params, cfg, hyps, word2idx,
                                 batch_size=opt.batch_size)
        with open(opt.save_score_file, "w", encoding="utf-8") as fout:
            for lp in scores:
                fout.write(f"{lp:.4f}\n")
        info("scored %d hypotheses with the neural LM -> %s", len(scores),
             opt.save_score_file)
        return 0

    from pytorch_kaldi_asr_tpu.lm import read_arpa

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
