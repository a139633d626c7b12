"""Tests for the LM-directory tool group (lm/tools.py + tools/lm_tools.py):
ARPA mapping, reversal, OOV detection, const-ARPA, format_lm."""

import math
import os

import numpy as np
import pytest

from pytorch_kaldi_asr_tpu.lm.arpa import read_arpa, write_arpa
from pytorch_kaldi_asr_tpu.lm.ngram import train_ngram_lm
from pytorch_kaldi_asr_tpu.lm.tools import (
    ConstArpaLm,
    find_arpa_oovs,
    format_lm,
    map_arpa,
    reverse_arpa,
    _parse_arpa,
)

SENTS = [s.split() for s in [
    "the cat sat", "the dog sat", "a cat ran", "the cat ran fast",
    "a dog sat down", "the dog ran", "a cat sat", "the cat sat down",
]]


@pytest.fixture(scope="module")
def arpa_path(tmp_path_factory):
    lm = train_ngram_lm(SENTS, order=3)
    path = str(tmp_path_factory.mktemp("lm") / "lm.arpa")
    write_arpa(lm, path)
    return path


def _sentence_logprob_arpa(path, sent):
    """Score via the NgramLM scorer for cross-checks."""
    lm = read_arpa(path)
    return lm.sentence_logprob(sent)


def test_parse_arpa_round(arpa_path):
    grams = list(_parse_arpa(arpa_path))
    orders = {o for o, _, _, _ in grams}
    assert orders == {1, 2, 3}
    assert all(isinstance(w, tuple) for _, _, w, _ in grams)


def test_map_arpa_round_trip(tmp_path, arpa_path):
    words = sorted({w for s in SENTS for w in s}) + ["<s>", "</s>", "<unk>"]
    syms = {w: i + 1 for i, w in enumerate(words)}
    mapped = str(tmp_path / "lm.int")
    map_arpa(arpa_path, mapped, syms, sym2int=True)
    with open(mapped) as f:
        body = f.read()
    assert "cat" not in body
    back = str(tmp_path / "lm.sym")
    map_arpa(mapped, back, syms, sym2int=False)
    # round trip preserves every n-gram and its scores
    a = sorted(_parse_arpa(arpa_path))
    b = sorted(_parse_arpa(back))
    assert len(a) == len(b)
    for (o1, lp1, w1, b1), (o2, lp2, w2, b2) in zip(a, b):
        assert (o1, w1) == (o2, w2)
        assert math.isclose(lp1, lp2, abs_tol=1e-6)


def test_map_arpa_drops_oov_ngrams(tmp_path, arpa_path):
    syms = {w: i + 1 for i, w in enumerate(
        ["the", "cat", "sat", "<s>", "</s>"])}
    mapped = str(tmp_path / "lm.int")
    map_arpa(arpa_path, mapped, syms)
    for _, _, words, _ in _parse_arpa(mapped):
        assert all(int(w) in syms.values() for w in words)


def test_find_arpa_oovs(arpa_path):
    syms = {w: i for i, w in enumerate(["the", "cat", "sat"])}
    oovs = find_arpa_oovs(arpa_path, syms)
    assert "dog" in oovs and "ran" in oovs
    assert "<s>" not in oovs and "</s>" not in oovs
    assert "the" not in oovs


def test_reverse_arpa_scores_reversed_sentences(tmp_path, arpa_path):
    """The defining property: the reversed LM scores a reversed sentence as
    the forward LM scores the original."""
    rev = str(tmp_path / "rev.arpa")
    reverse_arpa(arpa_path, rev)
    fwd_lm = read_arpa(arpa_path)
    rev_lm = read_arpa(rev)
    for sent in (["the", "cat", "sat"], ["a", "dog", "sat", "down"],
                 ["the", "dog", "ran"]):
        f = fwd_lm.sentence_logprob(sent)[0]
        r = rev_lm.sentence_logprob(sent[::-1])[0]
        assert math.isclose(f, r, abs_tol=0.05), (sent, f, r)


def test_const_arpa_matches_ngram_scorer(tmp_path, arpa_path):
    const = ConstArpaLm.from_arpa(arpa_path)
    lm = read_arpa(arpa_path)
    for sent in SENTS:
        assert math.isclose(
            const.sentence_logprob(sent), lm.sentence_logprob(sent)[0],
            abs_tol=1e-6,
        )
    # save/load round trip
    p = str(tmp_path / "lm.const")
    const.save(p)
    loaded = ConstArpaLm.load(p)
    assert math.isclose(
        loaded.sentence_logprob(SENTS[0]),
        const.sentence_logprob(SENTS[0]),
        abs_tol=1e-12,
    )


def test_const_arpa_oov_is_neg_inf(arpa_path):
    const = ConstArpaLm.from_arpa(arpa_path)
    assert const.logprob("zebra") == -math.inf


def test_format_lm(tmp_path, arpa_path):
    lang = tmp_path / "lang"
    lang.mkdir()
    words = sorted({w for s in SENTS for w in s})
    with open(lang / "words.txt", "w") as f:
        f.write("<eps> 0\n")
        for i, w in enumerate(words):
            f.write(f"{w} {i + 1}\n")
    out = format_lm(str(lang), arpa_path, str(tmp_path / "lang_test"))
    assert os.path.exists(os.path.join(out, "G.fst"))
    from pytorch_kaldi_asr_tpu.fst.core import Fst

    g = Fst.read_binary(os.path.join(out, "G.fst"))
    assert g.num_states > 0 and g.start >= 0
    # words.txt gained #0
    with open(os.path.join(out, "words.txt")) as f:
        assert "#0" in f.read()


def test_format_lm_rejects_oov_lm(tmp_path, arpa_path):
    lang = tmp_path / "lang2"
    lang.mkdir()
    with open(lang / "words.txt", "w") as f:
        f.write("<eps> 0\nthe 1\ncat 2\n")
    with pytest.raises(ValueError):
        format_lm(str(lang), arpa_path, str(tmp_path / "lang2_test"))


def test_cli_smoke(tmp_path, arpa_path, capsys):
    from pytorch_kaldi_asr_tpu.tools.lm_tools import main

    words_txt = str(tmp_path / "words.txt")
    words = sorted({w for s in SENTS for w in s})
    with open(words_txt, "w") as f:
        for i, w in enumerate(words):
            f.write(f"{w} {i + 1}\n")
    out = str(tmp_path / "o.arpa")
    assert main(["reverse-arpa", arpa_path, out]) == 0
    assert main(["find-arpa-oovs", words_txt, arpa_path]) == 0
    assert main(["build-const-arpa", arpa_path,
                 str(tmp_path / "lm.const")]) == 0
