"""Tests for confusion networks, consensus/MBR decoding, CTM output, and
ROVER system combination (decode/confusion.py — the lattice-mbr-decode /
lattice-to-ctm-conf / SCTK rover roles the reference's vendored Kaldi
layer delegates to external binaries)."""

import math

import pytest

from pytorch_kaldi_asr_tpu.decode.confusion import (
    confusion_network,
    consensus,
    ctm_lines,
    mbr_decode,
    read_ctm,
    rover,
    rover_ctms,
)
from pytorch_kaldi_asr_tpu.decode.lattice_io import WordLattice

from tests.test_lattice_tools import (  # noqa: F401  (fixtures)
    LEXICON,
    PHONES,
    _posts_for,
    graph_and_syms,
    lattice,
)


def _nlp(p):
    return -math.log(p)


def _diamond():
    """0 --a(0.8)|b(0.2)--> 1 --x--> 2"""
    lat = WordLattice(utt="u")
    lat.add_node(0)
    lat.add_node(3)
    lat.add_node(6)
    lat.add_link(0, 1, "a", _nlp(0.8), 0.0)
    lat.add_link(0, 1, "b", _nlp(0.2), 0.0)
    lat.add_link(1, 2, "x", 0.0, 0.0)
    lat.finals = {2: 0.0}
    return lat


def test_confusion_network_bins_and_posteriors():
    bins = confusion_network(_diamond())
    assert len(bins) == 2
    assert set(bins[0].words) == {"a", "b"}
    assert bins[0].words["a"] == pytest.approx(0.8, abs=1e-6)
    assert bins[0].words["b"] == pytest.approx(0.2, abs=1e-6)
    assert bins[0].start == 0 and bins[0].end == 3
    assert bins[1].words["x"] == pytest.approx(1.0, abs=1e-6)


def test_consensus_picks_argmax_per_bin():
    entries = consensus(confusion_network(_diamond()))
    assert [w for w, _, _, _ in entries] == ["a", "x"]
    confs = [c for _, c, _, _ in entries]
    assert confs[0] == pytest.approx(0.8, abs=1e-6)
    assert confs[1] == pytest.approx(1.0, abs=1e-6)


def test_consensus_drops_low_posterior_optional_word():
    """A word only 30% of paths carry loses to the skip (epsilon) mass."""
    lat = WordLattice(utt="u")
    for t in (0, 3, 5, 8):
        lat.add_node(t)
    lat.add_link(0, 1, "a", 0.0, 0.0)
    lat.add_link(1, 3, "<eps>", _nlp(0.7), 0.0)  # skip path
    lat.add_link(1, 2, "b", _nlp(0.3), 0.0)
    lat.add_link(2, 3, "<eps>", 0.0, 0.0)
    lat.finals = {3: 0.0}
    bins = confusion_network(lat)
    bbin = [b for b in bins if "b" in b.words]
    assert len(bbin) == 1
    assert bbin[0].eps_mass == pytest.approx(0.7, abs=1e-6)
    words, _ = mbr_decode(lat)
    assert words == ["a"]


def test_mbr_matches_best_path_on_real_lattice(lattice):  # noqa: F811
    """On a sharply-peaked real latgen lattice, consensus must agree with
    Viterbi and carry high confidences."""
    words, confs = mbr_decode(lattice)
    best_words, _ = lattice.best_path()
    assert words == best_words
    assert min(confs) > 0.5


def test_mbr_can_beat_viterbi_word_for_word():
    """The classic MBR win: the Viterbi path takes a jointly-likely but
    per-word weak pair; per-slot argmax recovers the majority word in
    each slot.  Paths: (a,x)=0.4 best single path, (b,x)=0.3, (b,y)=0.3
    -> slot1 b=0.6 beats a=0.4 while Viterbi says a."""
    lat = WordLattice(utt="u")
    for t in (0, 3, 6):
        lat.add_node(t)
    # encode joint path probabilities through split links
    lat.add_link(0, 1, "a", _nlp(0.4), 0.0)
    lat.add_link(0, 1, "b", _nlp(0.6), 0.0)
    lat.add_link(1, 2, "x", 0.0, 0.0)
    lat.finals = {2: 0.0}
    vit, _ = lat.best_path()
    assert vit == ["b", "x"]  # here Viterbi agrees; flip the weights
    lat2 = WordLattice(utt="u2")
    for t in (0, 3, 6):
        lat2.add_node(t)
    lat2.add_link(0, 1, "a", _nlp(0.4), 0.0)
    lat2.add_link(0, 1, "b", _nlp(0.35), 0.0)
    lat2.add_link(0, 1, "b", _nlp(0.25), 0.0)  # two distinct b-paths
    lat2.add_link(1, 2, "x", 0.0, 0.0)
    lat2.finals = {2: 0.0}
    vit2, _ = lat2.best_path()
    assert vit2 == ["a", "x"]
    words, confs = mbr_decode(lat2)
    assert words == ["b", "x"]
    assert confs[0] == pytest.approx(0.6, abs=1e-6)


def test_repeated_word_stays_two_bins():
    """'tab tab' back-to-back: the two tokens touch in time but lie on
    one path, so the ordering constraint must keep them in separate
    bins (a time-only clusterer would merge them)."""
    lat = WordLattice(utt="u")
    for t in (0, 3, 6):
        lat.add_node(t)
    lat.add_link(0, 1, "tab", 0.0, 0.0)
    lat.add_link(1, 2, "tab", 0.0, 0.0)
    lat.finals = {2: 0.0}
    words, confs = mbr_decode(lat)
    assert words == ["tab", "tab"]
    assert all(c == pytest.approx(1.0, abs=1e-6) for c in confs)


def test_parallel_smeared_word_merges_to_one_bin():
    """The same word on two parallel paths at staggered frames is ONE
    token: intra-word clustering must pool its posterior."""
    lat = WordLattice(utt="u")
    for t in (0, 2, 1, 3):
        lat.add_node(t)
    lat.add_link(0, 1, "cat", _nlp(0.5), 0.0)   # span [0, 2)
    lat.add_link(1, 3, "<eps>", 0.0, 0.0)
    lat.add_link(0, 2, "<eps>", _nlp(0.5), 0.0)
    lat.add_link(2, 3, "cat", 0.0, 0.0)         # span [1, 3), parallel
    lat.finals = {3: 0.0}
    bins = confusion_network(lat)
    assert len(bins) == 1
    assert bins[0].words["cat"] == pytest.approx(1.0, abs=1e-6)


def test_ctm_lines_format_and_round_trip(tmp_path):
    entries = consensus(confusion_network(_diamond()))
    lines = ctm_lines("utt7", entries, frame_rate=0.01)
    assert lines[0].split() == ["utt7", "1", "0.00", "0.03", "a", "0.800"]
    p = tmp_path / "out.ctm"
    p.write_text("\n".join(lines) + "\n")
    back = read_ctm(str(p))
    assert list(back) == ["utt7"]
    words = [w for w, _, _, _ in back["utt7"]]
    assert words == ["a", "x"]
    assert back["utt7"][0][1] == pytest.approx(0.8, abs=1e-3)


def test_rover_majority_vote():
    sys1 = [("a", 0.9), ("b", 0.9)]
    sys2 = [("a", 0.8), ("c", 0.8)]
    sys3 = [("a", 0.7), ("b", 0.6)]
    out = rover([sys1, sys2, sys3])
    assert [w for w, _ in out] == ["a", "b"]


def test_rover_insertion_loses_to_null_by_default():
    sys1 = [("a", 0.9), ("b", 0.9)]
    sys2 = [("a", 0.9), ("x", 0.9), ("b", 0.9)]
    sys3 = [("a", 0.9), ("b", 0.9)]
    out = rover([sys1, sys2, sys3])
    assert [w for w, _ in out] == ["a", "b"]


def test_rover_confidence_can_rescue_insertion():
    sys1 = [("a", 0.9), ("b", 0.9)]
    sys2 = [("a", 0.9), ("x", 1.0), ("b", 0.9)]
    out = rover([sys1, sys2], alpha=0.0, null_conf=0.0)
    assert [w for w, _ in out] == ["a", "x", "b"]


def test_rover_single_system_is_identity():
    sys1 = [("hello", 0.5), ("world", 0.5)]
    assert [w for w, _ in rover([sys1])] == ["hello", "world"]


def test_lattice_to_ctm_and_rover_cli(graph_and_syms, lattice,  # noqa: F811
                                      tmp_path):
    """End to end: real lattice ark -> CTM + consensus transcript via the
    lattice_to_ctm CLI, then ROVER the CTM with itself (identity)."""
    from pytorch_kaldi_asr_tpu.fst.openfst_io import write_lattice_ark
    from pytorch_kaldi_asr_tpu.tools import lattice_to_ctm, rover as rover_cli

    _, word_syms = graph_and_syms
    ark = str(tmp_path / "in.ark")
    write_lattice_ark([lattice], ark, word_syms)
    words_txt = tmp_path / "words.txt"
    words_txt.write_text("".join(f"{w} {i}\n" for w, i in word_syms.items()))
    ctm = str(tmp_path / "out.ctm")
    tra = str(tmp_path / "out.tra")
    assert lattice_to_ctm.main([
        "-words", str(words_txt), f"ark:{ark}", ctm, "-text", tra]) == 0
    tra_lines = open(tra).read().splitlines()
    assert tra_lines == [f"{lattice.utt} bat at tab"]
    parsed = read_ctm(ctm)
    assert [w for w, _, _, _ in parsed[lattice.utt]] == ["bat", "at", "tab"]
    assert all(c > 0.5 for _, c, _, _ in parsed[lattice.utt])
    # start times must be nondecreasing and durations positive
    starts = [s for _, _, s, _ in parsed[lattice.utt]]
    assert starts == sorted(starts)
    combined = str(tmp_path / "rover.tra")
    assert rover_cli.main(["-o", combined, ctm, ctm]) == 0
    assert open(combined).read().splitlines() == \
        [f"{lattice.utt} bat at tab"]


def test_rover_ctms_by_utt(tmp_path):
    a = tmp_path / "a.ctm"
    b = tmp_path / "b.ctm"
    a.write_text("u1 1 0.00 0.10 cat 0.9\nu1 1 0.10 0.10 sat 0.9\n"
                 "u2 1 0.00 0.10 dog 0.9\n")
    b.write_text("u1 1 0.00 0.10 cat 0.8\nu1 1 0.10 0.10 mat 0.4\n")
    out = rover_ctms([read_ctm(str(a)), read_ctm(str(b))])
    assert [w for w, _ in out["u1"]] == ["cat", "sat"]
    assert [w for w, _ in out["u2"]] == ["dog"]
