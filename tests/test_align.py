"""Forced alignment (decode/align.py + tools/align_ctm.py): word time
boundaries from per-frame alignments — the refinement over
lattice-node-frame CTM times (ROADMAP item 6; the reference delegates
this to Kaldi's ali-to-phones/get_train_ctm chain)."""

import subprocess
import sys

import numpy as np
import pytest

from pytorch_kaldi_asr_tpu.decode.align import (
    Alignment,
    WordSegment,
    align_graph,
    ctm_from_alignment,
    forced_align,
    frame_log_posts_for_phones,
    linear_grammar,
    refine_ctm_times,
    word_syms_from_lexicon,
)

PHONES = {"a": 1, "b": 2, "c": 3, "sil": 4}
LEXICON = {"one": [(1.0, ["a", "b"])], "two": [(1.0, ["c"])]}


def _posts(phone_ids):
    return frame_log_posts_for_phones(phone_ids, n_phones=4)


def test_linear_grammar_accepts_exactly_the_sequence():
    g = linear_grammar([5, 7, 5])
    assert g.num_states == 4
    arcs = [a for s in range(g.num_states) for a in g.arcs[s]]
    assert [a.ilabel for a in arcs] == [5, 7, 5]
    assert g.is_final(3) and not g.is_final(0)


def test_forced_align_recovers_boundaries_with_silence():
    """one = a(2 frames) b(2), sil(2), two = c(4): the word segments must
    be [0,3] and [6,9] — trailing silence excluded from 'one'."""
    words = word_syms_from_lexicon(LEXICON)
    graph, _ = align_graph(["one", "two"], LEXICON, words, PHONES,
                           sil_phone="sil")
    posts = _posts([1, 1, 2, 2, 4, 4, 3, 3, 3, 3])
    ali = forced_align(graph, posts, sil_ids={PHONES["sil"]})
    assert ali is not None
    assert ali.phone_frames == [1, 1, 2, 2, 4, 4, 3, 3, 3, 3]
    assert ali.words == [WordSegment(words["one"], 0, 3),
                         WordSegment(words["two"], 6, 9)]


def test_forced_align_without_silence_splits_at_word_starts():
    words = word_syms_from_lexicon(LEXICON)
    graph, _ = align_graph(["one", "two"], LEXICON, words, PHONES)
    posts = _posts([1, 2, 2, 3, 3])
    ali = forced_align(graph, posts)
    assert ali.words == [WordSegment(words["one"], 0, 2),
                         WordSegment(words["two"], 3, 4)]


def test_forced_align_homophones_resolved_by_transcript():
    """Two words share a pronunciation; the transcript constraint (not
    the acoustics) decides which one the alignment reports."""
    lex = {"won": [(1.0, ["a", "b"])], "one": [(1.0, ["a", "b"])]}
    words = word_syms_from_lexicon(lex)
    posts = _posts([1, 1, 2])
    for w in ("won", "one"):
        graph, _ = align_graph([w], lex, words, PHONES)
        ali = forced_align(graph, posts)
        assert [s.word for s in ali.words] == [words[w]]
        assert ali.words[0] == WordSegment(words[w], 0, 2)


def test_forced_align_oov_raises_and_impossible_returns_none():
    words = word_syms_from_lexicon(LEXICON)
    with pytest.raises(ValueError, match="not in the lexicon"):
        align_graph(["one", "zebra"], LEXICON, words, PHONES)
    # more phones than frames: no path
    graph, _ = align_graph(["one", "two"], LEXICON, words, PHONES)
    assert forced_align(graph, _posts([1, 2])) is None


def test_forced_align_repeated_words():
    words = word_syms_from_lexicon(LEXICON)
    graph, _ = align_graph(["two", "two"], LEXICON, words, PHONES)
    posts = _posts([3, 3, 3, 3])
    ali = forced_align(graph, posts)
    assert len(ali.words) == 2
    assert [s.word for s in ali.words] == [words["two"]] * 2
    assert ali.words[0].end + 1 == ali.words[1].start
    assert (ali.words[0].start, ali.words[1].end) == (0, 3)


def test_ctm_from_alignment_format():
    ali = Alignment([WordSegment(1, 0, 3), WordSegment(2, 6, 9)],
                    [0] * 10, 0.0)
    lines = ctm_from_alignment("utt1", ali, {1: "one", 2: "two"})
    assert lines == ["utt1 1 0.00 0.04 one 1.00",
                     "utt1 1 0.06 0.04 two 1.00"]


def test_refine_ctm_times_patches_matching_sequences_only():
    id2word = {1: "one", 2: "two"}
    good = (Alignment([WordSegment(1, 0, 3), WordSegment(2, 6, 9)],
                      [0] * 10, 0.0), id2word)
    ctm = [
        "utt1 1 0.00 0.10 one 0.90",   # times to be refined
        "utt1 1 0.10 0.10 two 0.80",
        "utt2 1 0.00 0.10 one 0.70",   # consensus disagrees with ali
    ]
    bad = (Alignment([WordSegment(2, 0, 3)], [0] * 4, 0.0), id2word)
    out, refined = refine_ctm_times(ctm, {"utt1": good, "utt2": bad})
    assert refined == 1
    assert out[0] == "utt1 1 0.00 0.04 one 0.90"  # conf preserved
    assert out[1] == "utt1 1 0.06 0.04 two 0.80"
    assert out[2] == ctm[2]  # mismatched sequence left untouched


def test_align_ctm_cli_end_to_end(tmp_path):
    from pytorch_kaldi_asr_tpu.io import kaldi_io

    (tmp_path / "lexicon.txt").write_text("one a b\ntwo c\n")
    (tmp_path / "phones.txt").write_text(
        "<eps> 0\na 1\nb 2\nc 3\nsil 4\n")
    (tmp_path / "text").write_text("utt1 one two\n")
    with kaldi_io.ArkWriter(str(tmp_path / "post.ark")) as w:
        w.write("utt1", _posts([1, 1, 2, 2, 4, 4, 3, 3, 3, 3]).astype(
            np.float32))
    proc = subprocess.run(
        [sys.executable, "-m", "pytorch_kaldi_asr_tpu.tools.align_ctm",
         "-lexicon", str(tmp_path / "lexicon.txt"),
         "-phones", str(tmp_path / "phones.txt"),
         "-text", str(tmp_path / "text"), "-sil_phone", "sil",
         f"ark:{tmp_path / 'post.ark'}", str(tmp_path / "out.ctm")],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stderr
    got = (tmp_path / "out.ctm").read_text().splitlines()
    assert got == ["utt1 1 0.00 0.04 one 1.00",
                   "utt1 1 0.06 0.04 two 1.00"]

    # refine mode: patch a consensus CTM, keeping its confidences
    (tmp_path / "cons.ctm").write_text(
        "utt1 1 0.00 0.10 one 0.90\nutt1 1 0.10 0.10 two 0.80\n")
    proc = subprocess.run(
        [sys.executable, "-m", "pytorch_kaldi_asr_tpu.tools.align_ctm",
         "-lexicon", str(tmp_path / "lexicon.txt"),
         "-phones", str(tmp_path / "phones.txt"),
         "-text", str(tmp_path / "text"), "-sil_phone", "sil",
         "-refine_ctm", str(tmp_path / "cons.ctm"),
         f"ark:{tmp_path / 'post.ark'}", str(tmp_path / "ref.ctm")],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stderr
    got = (tmp_path / "ref.ctm").read_text().splitlines()
    assert got == ["utt1 1 0.00 0.04 one 0.90",
                   "utt1 1 0.06 0.04 two 0.80"]


def test_align_ctm_cli_rejects_unknown_sil_phone(tmp_path):
    """A -sil_phone absent from the phone table must fail loudly up front
    (previously: silent empty sil_ids, then a raw KeyError mid-corpus)."""
    from pytorch_kaldi_asr_tpu.io import kaldi_io

    (tmp_path / "lexicon.txt").write_text("one a b\n")
    (tmp_path / "phones.txt").write_text("<eps> 0\na 1\nb 2\nsil 3\n")
    (tmp_path / "text").write_text("utt1 one\n")
    with kaldi_io.ArkWriter(str(tmp_path / "post.ark")) as w:
        w.write("utt1", _posts([1, 2]).astype(np.float32))
    proc = subprocess.run(
        [sys.executable, "-m", "pytorch_kaldi_asr_tpu.tools.align_ctm",
         "-lexicon", str(tmp_path / "lexicon.txt"),
         "-phones", str(tmp_path / "phones.txt"),
         "-text", str(tmp_path / "text"), "-sil_phone", "SIL",
         f"ark:{tmp_path / 'post.ark'}", str(tmp_path / "out.ctm")],
        capture_output=True, text=True,
    )
    assert proc.returncode != 0
    assert "not in the phone table" in proc.stderr
