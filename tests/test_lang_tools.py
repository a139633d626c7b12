"""Tests for lang-dir depth (tools/lang.py): gen_topo/parse_topo round
trip, topology-driven HMM expansion, validate_lang, pron probs, and the
phone-bigram lang builder (reference kaldi/utils/ gen_topo.pl,
validate_lang.pl, dict_dir_add_pronprobs.sh, make_phone_bigram_lang.sh)."""

import math
import os

import numpy as np
import pytest

from pytorch_kaldi_asr_tpu.decode.latgen import latgen
from pytorch_kaldi_asr_tpu.fst.graph import mkgraph
from pytorch_kaldi_asr_tpu.lm.ngram import train_ngram_lm
from pytorch_kaldi_asr_tpu.tools.lang import (
    dict_dir_add_pronprobs,
    gen_topo,
    make_phone_bigram_lang,
    parse_topo,
    validate_lang,
)
from pytorch_kaldi_asr_tpu.tools.prepare_lang import prepare_lang

PHONES = {p: i + 1 for i, p in enumerate(["a", "b", "k", "t", "sil"])}
LEXICON = {"bat": ["b", "a", "t"], "back": ["b", "a", "k"],
           "at": ["a", "t"], "tab": ["t", "a", "b"]}
SENTS = [s.split() for s in [
    "bat at tab", "back at bat", "tab tab at", "bat back", "at tab back",
]]


def test_gen_topo_parse_round_trip():
    text = gen_topo([4, 5, 6], [1, 2], num_nonsil_states=3,
                    num_sil_states=5)
    topo = parse_topo(text)
    assert set(topo) == {1, 2, 4, 5, 6}
    # nonsilence: 3 Bakis states with 0.75/0.25 transitions
    states = topo[4]
    assert len(states) == 3
    st0, pdf0, trans0 = states[0]
    assert st0 == 0 and pdf0 == 0
    assert dict(trans0) == {0: 0.75, 1: 0.25}
    # silence: 5 emitting states, middle fully connected
    sil = topo[1]
    assert len(sil) == 5
    _, _, t_mid = sil[2]
    assert len(t_mid) == 4  # transitions to states 1..4... per gen_topo.pl
    # 1-state silence variant
    topo1 = parse_topo(gen_topo([2], [1], num_nonsil_states=1,
                                num_sil_states=1))
    assert len(topo1[1]) == 1


def test_gen_topo_rejects_bad_sil_states():
    with pytest.raises(ValueError):
        gen_topo([1], [2], num_sil_states=2)


def test_mkgraph_with_topology_decodes():
    """A 2-state Bakis topology doubles the minimum frames per phone; the
    decoder must still recover the sentence when durations allow."""
    lm = train_ngram_lm(SENTS, order=2)
    word_syms = {w: i + 1 for i, w in
                 enumerate(sorted({w for s in SENTS for w in s}))}
    topo = parse_topo(gen_topo(sorted(PHONES.values()), [],
                               num_nonsil_states=2))
    graph, _ = mkgraph(LEXICON, lm, word_syms, PHONES, topo=topo)
    sent = ["bat", "at"]
    pids = [PHONES[p] for w in sent for p in LEXICON[w]]
    rows = []
    for p in pids:
        for _ in range(4):  # >= 2 frames per phone required by the topo
            row = np.full(len(PHONES), -8.0)
            row[p - 1] = -0.02
            rows.append(row)
    res = latgen(graph, np.array(rows), beam=40.0)
    assert res is not None
    id2w = {v: k for k, v in word_syms.items()}
    assert [id2w[w] for w in res[0]] == sent
    # and it must NOT accept 1-frame phones: fewer frames than states
    res1 = latgen(graph, np.array(rows[:5]), beam=40.0)
    assert res1 is None or len(res1[0]) <= 1


@pytest.fixture()
def lang_dir(tmp_path):
    dict_dir = tmp_path / "dict"
    dict_dir.mkdir()
    with open(dict_dir / "lexicon.txt", "w") as f:
        for w, ph in LEXICON.items():
            f.write(f"{w} {' '.join(ph)}\n")
        f.write("<unk> sil\n")
    with open(dict_dir / "silence_phones.txt", "w") as f:
        f.write("sil\n")
    with open(dict_dir / "optional_silence.txt", "w") as f:
        f.write("sil\n")
    out = str(tmp_path / "lang")
    prepare_lang(str(dict_dir), out)
    return out


def test_prepare_lang_writes_real_consumable_topo(lang_dir):
    with open(os.path.join(lang_dir, "topo")) as f:
        topo = parse_topo(f.read())
    phones = {}
    with open(os.path.join(lang_dir, "phones.txt")) as f:
        for line in f:
            k, v = line.split()
            phones[k] = int(v)
    real = {v for k, v in phones.items()
            if k != "<eps>" and not k.startswith("#")}
    assert real <= set(topo)


def test_validate_lang_passes_on_good_dir(lang_dir):
    assert validate_lang(lang_dir) == []


def test_validate_lang_catches_problems(lang_dir, tmp_path):
    # break words.txt: duplicate id
    words = os.path.join(lang_dir, "words.txt")
    with open(words, "a") as f:
        f.write("zzz 1\n")
    problems = validate_lang(lang_dir)
    assert any("duplicate" in p for p in problems)


def test_validate_lang_missing_topo(lang_dir):
    os.remove(os.path.join(lang_dir, "topo"))
    assert any("topo" in p for p in validate_lang(lang_dir))


def test_dict_dir_add_pronprobs(tmp_path):
    dict_dir = tmp_path / "dict"
    dict_dir.mkdir()
    with open(dict_dir / "lexicon.txt", "w") as f:
        f.write("read r iy d\nread r eh d\nbook b uh k\n")
    counts = tmp_path / "pron_counts.txt"
    with open(counts, "w") as f:
        f.write("30 read r iy d\n10 read r eh d\n5 book b uh k\n")
    out = dict_dir_add_pronprobs(str(dict_dir), str(counts),
                                 str(tmp_path / "dict_p"))
    probs = {}
    with open(os.path.join(out, "lexiconp.txt")) as f:
        for line in f:
            w, p, *ph = line.split()
            probs[(w, tuple(ph))] = float(p)
    # max-normalize: best pron of each word = 1.0
    assert probs[("read", ("r", "iy", "d"))] == 1.0
    assert 0.0 < probs[("read", ("r", "eh", "d"))] < 1.0
    assert probs[("book", ("b", "uh", "k"))] == 1.0


def test_make_phone_bigram_lang(tmp_path, lang_dir):
    ali = tmp_path / "ali.txt"
    # frame alignments: runs of phone ids
    with open(ali, "w") as f:
        f.write("utt1 " + " ".join(["1"] * 3 + ["2"] * 4 + ["3"] * 2) + "\n")
        f.write("utt2 " + " ".join(["1"] * 2 + ["3"] * 3) + "\n")
    out = make_phone_bigram_lang(lang_dir, str(ali),
                                 str(tmp_path / "lang_bg"))
    from pytorch_kaldi_asr_tpu.fst.core import Fst

    g = Fst.read_binary(os.path.join(out, "G.fst"))
    assert g.num_states >= 3
    # accepts 1 2 3 (seen) — walk greedily
    from pytorch_kaldi_asr_tpu.fst import ops

    ilabs, olabs, w = ops.shortest_path(g)
    assert ilabs  # some path exists
    assert os.path.exists(os.path.join(out, "topo"))
    assert os.path.exists(os.path.join(out, "words.txt"))
