"""Tests for WER scoring, rescoring, best-WER selection, and the ARPA n-gram
LM (training, backoff normalization, file round-trip, sentence scoring)."""

import math

import numpy as np
import pytest

from pytorch_kaldi_asr_tpu.score import (
    levenshtein_alignment,
    compute_wer,
    format_wer_report,
    rescore_nbest,
    best_wer,
)
from pytorch_kaldi_asr_tpu.lm import (
    count_ngrams,
    train_ngram_lm,
    read_arpa,
    write_arpa,
)


# ---------------------------------------------------------------- WER


def test_levenshtein_counts():
    ref = "the cat sat on the mat".split()
    hyp = "the cat sat on mat".split()  # 1 deletion
    assert levenshtein_alignment(ref, hyp) == (1, 0, 1, 0)
    hyp = "the cat sat down on the mat".split()  # 1 insertion
    assert levenshtein_alignment(ref, hyp) == (1, 1, 0, 0)
    hyp = "the dog sat on the mat".split()  # 1 substitution
    assert levenshtein_alignment(ref, hyp) == (1, 0, 0, 1)
    assert levenshtein_alignment(ref, ref) == (0, 0, 0, 0)
    assert levenshtein_alignment(ref, []) == (6, 0, 6, 0)


def test_compute_wer_modes():
    ref = {"u1": "a b c", "u2": "d e", "u3": "f"}
    hyp = {"u1": "a b c", "u2": "d x"}
    present = compute_wer(ref, hyp, mode="present")
    assert present["sentences"] == 2 and present["absent"] == 1
    assert present["errors"] == 1 and present["words"] == 5
    allm = compute_wer(ref, hyp, mode="all")
    assert allm["sentences"] == 3 and allm["errors"] == 2
    with pytest.raises(KeyError):
        compute_wer(ref, hyp, mode="strict")


def test_wer_report_format_and_best_wer(tmp_path):
    ref = {"u1": "a b c d"}
    for i, hyp_text in enumerate(["a b c d", "a b x d", "x y z w"]):
        stats = compute_wer(ref, {"u1": hyp_text})
        (tmp_path / f"rescore_{i}_wer").write_text(format_wer_report(stats))
    line, path, value = best_wer(str(tmp_path / "*_wer"))
    assert value == 0.0 and "rescore_0" in path
    assert "%WER 0.00" in line


def test_rescore_picks_by_combined_score(tmp_path):
    decode = tmp_path / "decode.txt"
    decode.write_text(
        "u1\t-1.0\thyp one\n"      # best AM
        "u1\t-2.0\thyp two\n"      # best LM
        "u2\t-5.0\tsolo\n"
    )
    lm = tmp_path / "lm.score"
    lm.write_text("-30.0\n-1.0\n-10.0\n")
    paths = rescore_nbest(str(decode), str(lm), [1000, 2], str(tmp_path / "s"))
    # inv_weight 1000 ≈ AM only → hyp one; inv_weight 2 → -1-15 vs -2-0.5 → hyp two
    out_1000 = dict(
        line.split(" ", 1) for line in
        (tmp_path / "s" / "rescore_1000").read_text().strip().split("\n")
    )
    out_2 = dict(
        line.split(" ", 1) for line in
        (tmp_path / "s" / "rescore_2").read_text().strip().split("\n")
    )
    assert out_1000["u1"] == "hyp one"
    assert out_2["u1"] == "hyp two"
    assert out_2["u2"] == "solo"


# ---------------------------------------------------------------- LM

CORPUS = [s.split() for s in [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog",
    "the cat ate the food",
    "a dog ate a bone",
    "the mat was on the floor",
    "cats and dogs play",
    "the dog and the cat play on the mat",
]]


def test_count_ngrams_includes_sentence_markers():
    counts = count_ngrams([["a", "b"]], 2)
    assert counts[0][("a",)] == 1
    assert counts[1][("<s>", "a")] == 1
    assert counts[1][("b", "</s>")] == 1


def test_lm_probabilities_normalize():
    """For every observed context, sum_w P(w|context) over the FULL vocab
    (via backoff) must be ~1."""
    lm = train_ngram_lm(CORPUS, order=3)
    vocab = [g[0] for g in lm.logprob if len(g) == 1 and g[0] != "<s>"]
    for context in [(), ("the",), ("on", "the"), ("<s>",)]:
        total = sum(10 ** lm.word_logprob(w, context) for w in vocab)
        assert total == pytest.approx(1.0, abs=2e-2), (context, total)


def test_lm_backoff_weights_bounded_on_closed_vocab():
    """Tiny closed vocab where every word follows every context: the
    lower-order model keeps no mass for unseen continuations, so the bow
    denominator hits zero.  The SRILM-style fallback must emit bow=1 —
    the 1e-12 floor previously yielded bow ~ 1e12 (log10 ≈ +15), whose
    negative-cost backoff arcs made mkgraph's weighted determinization
    diverge (20 GB on the long-form recipe's LM)."""
    rng = __import__("random").Random(0)
    vocab = ["a", "b", "c"]
    corpus = [[rng.choice(vocab) for _ in range(30)] for _ in range(12)]
    lm = train_ngram_lm(corpus, order=3)
    assert lm.backoff, "expected backoff weights"
    worst = max(lm.backoff.values())
    assert worst <= 1.0, f"exploded backoff weight: 10^{worst}"


def test_lm_sentence_logprob_and_oov():
    lm = train_ngram_lm(CORPUS, order=3)
    lp, scored, oov = lm.sentence_logprob("the cat sat on the mat".split())
    assert lp < 0 and oov == 0 and scored == 7  # 6 words + </s>
    lp2, scored2, oov2 = lm.sentence_logprob("the zebra sat".split())
    assert oov2 == 1 and scored2 == 3
    # seen sentence should outscore word salad of same length
    lp3, *_ = lm.sentence_logprob("mat the on sat cat the".split())
    assert lp > lp3


def test_arpa_roundtrip(tmp_path):
    lm = train_ngram_lm(CORPUS, order=3)
    path = write_arpa(lm, str(tmp_path / "lm.gz"))
    lm2 = read_arpa(path)
    assert lm2.order == 3
    assert set(lm2.logprob) == set(lm.logprob)
    for g, lp in lm.logprob.items():
        assert lm2.logprob[g] == pytest.approx(lp, abs=1e-6)
    s = "the cat sat on the mat".split()
    np.testing.assert_allclose(
        lm.sentence_logprob(s)[0], lm2.sentence_logprob(s)[0], atol=1e-5
    )


def test_bos_unigram_is_minus_99(tmp_path):
    lm = train_ngram_lm(CORPUS, order=2)
    assert lm.logprob[("<s>",)] == -99.0
