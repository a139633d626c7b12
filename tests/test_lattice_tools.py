"""Tests for lattice generation (latgen lattice mode), SLF/dot/kaldi-text
interchange, keyword search, and segmentation — the lattice/KWS tool group
(reference kaldi/utils/ convert_slf.pl, write_kwslist.pl,
kwslist_post_process.pl, segmentation.pl, show_lattice.sh)."""

import io
import math

import numpy as np
import pytest

from pytorch_kaldi_asr_tpu.decode.latgen import latgen, latgen_lattice
from pytorch_kaldi_asr_tpu.decode.lattice_io import WordLattice, write_slf_file
from pytorch_kaldi_asr_tpu.fst.graph import mkgraph
from pytorch_kaldi_asr_tpu.lm.ngram import train_ngram_lm
from pytorch_kaldi_asr_tpu.tools.kws import (
    Hit,
    post_process_kwslist,
    search_lattice,
    write_kwslist,
)
from pytorch_kaldi_asr_tpu.tools.segmentation import (
    segment_frames,
    write_segments,
)

PHONES = {p: i + 1 for i, p in enumerate(["a", "b", "k", "t"])}
LEXICON = {"bat": ["b", "a", "t"], "back": ["b", "a", "k"],
           "at": ["a", "t"], "tab": ["t", "a", "b"]}
SENTS = [s.split() for s in [
    "bat at tab", "back at bat", "tab tab at", "bat back", "at tab back",
]]


@pytest.fixture(scope="module")
def graph_and_syms():
    lm = train_ngram_lm(SENTS, order=2)
    word_syms = {w: i + 1 for i, w in
                 enumerate(sorted({w for s in SENTS for w in s}))}
    graph, _ = mkgraph(LEXICON, lm, word_syms, PHONES, hmm_loops=True)
    return graph, word_syms


def _posts_for(phone_ids, n_phones, frames_per_phone=3, sharp=6.0, noise=0.5,
               seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    for p in phone_ids:
        for _ in range(frames_per_phone):
            row = np.full(n_phones, -sharp) + rng.normal(scale=noise,
                                                         size=n_phones)
            row[p - 1] = -0.05
            rows.append(row)
    return np.array(rows)


@pytest.fixture(scope="module")
def lattice(graph_and_syms):
    graph, word_syms = graph_and_syms
    sent = ["bat", "at", "tab"]
    pids = [PHONES[p] for w in sent for p in LEXICON[w]]
    posts = _posts_for(pids, len(PHONES))
    id2word = {v: k for k, v in word_syms.items()}
    lat = latgen_lattice(graph, posts, beam=30.0, lattice_beam=12.0,
                         id2word=id2word, utt="utt1")
    assert lat is not None
    return lat


def test_lattice_best_path_matches_viterbi(graph_and_syms, lattice):
    graph, word_syms = graph_and_syms
    sent = ["bat", "at", "tab"]
    pids = [PHONES[p] for w in sent for p in LEXICON[w]]
    posts = _posts_for(pids, len(PHONES))
    vit = latgen(graph, posts, beam=30.0)
    words, cost = lattice.best_path()
    id2w = {v: k for k, v in word_syms.items()}
    assert words == [id2w[w] for w in vit[0]]
    assert math.isclose(cost, vit[2], rel_tol=1e-6)


def test_lattice_contains_alternatives(lattice):
    """A lattice with a sane beam should hold more than the 1-best path."""
    assert len(lattice.links) > lattice.num_nodes - 1 or len(
        lattice.links) >= 9


def test_lattice_posteriors_sum_near_one_per_frame(lattice):
    posts = lattice.forward_backward()
    assert all(0.0 <= p <= 1.0 + 1e-9 for _, p in posts)
    # best-path links should carry high posterior
    words, _ = lattice.best_path()
    strong = [p for l, p in posts if l.word in words]
    assert max(strong) > 0.5


def test_slf_output(lattice, tmp_path):
    buf = io.StringIO()
    lattice.write_slf(buf)
    slf = buf.getvalue()
    assert slf.startswith("VERSION=1.1")
    assert "UTTERANCE=utt1" in slf
    n_line = [l for l in slf.splitlines() if l.startswith("N=")][0]
    n_nodes = int(n_line.split("\t")[0][2:])
    n_links = int(n_line.split("\t")[1][2:])
    assert slf.count("\nI=") == n_nodes
    assert slf.count("\nJ=") == n_links
    # word-to-node variant
    buf2 = io.StringIO()
    lattice.write_slf(buf2, word_to_node=True)
    assert "W=" in buf2.getvalue()
    # directory mode writes per-utt .lat.gz
    write_slf_file([lattice], str(tmp_path))
    assert (tmp_path / "utt1.lat.gz").exists()


def test_kaldi_text_round_trip(lattice):
    buf = io.StringIO()
    lattice.write_kaldi_text(buf)
    lat2 = WordLattice.read_kaldi_text(buf.getvalue().splitlines(),
                                       utt="utt1")
    w1, c1 = lattice.best_path()
    w2, c2 = lat2.best_path()
    assert w1 == w2
    assert math.isclose(c1, c2, rel_tol=1e-5)


def test_dot_output(lattice):
    dot = lattice.to_dot()
    assert dot.startswith("digraph lattice")
    assert "->" in dot


def test_kws_search_finds_spoken_keyword(lattice):
    hits = search_lattice(lattice, {"KW1": ["at"], "KW2": ["bat"],
                                    "KW3": ["back"]})
    kws = {h.kwid for h in hits}
    assert "KW1" in kws and "KW2" in kws
    at_hit = max((h for h in hits if h.kwid == "KW1"),
                 key=lambda h: h.score)
    assert at_hit.score > 0.3
    # multi-word keyword: the product over link posteriors (incl. the eps
    # glue) underestimates, but the best hit must still stand out
    hits2 = search_lattice(lattice, {"KWX": ["bat", "at"]})
    assert hits2 and max(h.score for h in hits2) > 0.05


def test_write_kwslist_and_post_process(tmp_path, lattice):
    hits = search_lattice(lattice, {"KW1": ["at"], "KW2": ["bat"]})
    xml = tmp_path / "kwslist.xml"
    with open(xml, "w") as f:
        write_kwslist(hits, f, threshold=0.2)
    body = xml.read_text()
    assert body.startswith("<kwslist")
    assert 'decision="YES"' in body
    out = tmp_path / "post.xml"
    post_process_kwslist(str(xml), str(out), threshold=0.99,
                         remove_no=True, normalize="kst")
    post = out.read_text()
    assert "<kwslist" in post


def test_kwslist_dedup():
    hits = [Hit("K", "u", 10, 5, 0.9), Hit("K", "u", 12, 5, 0.5),
            Hit("K", "u", 400, 5, 0.7)]
    buf = io.StringIO()
    kept = write_kwslist(hits, buf, duptime=50)
    assert len(kept) == 2
    assert {h.tbeg for h in kept} == {10, 400}


def test_segmentation_basic():
    # sil(5) speech(10) sil(8) speech(6) sil(4)
    classes = [0] * 5 + [2] * 10 + [0] * 8 + [2] * 6 + [0] * 4
    segs = segment_frames(classes, silence_proportion=0.1,
                          max_segment_length=100)
    assert len(segs) >= 1
    covered = set()
    for s, e in segs:
        covered.update(range(s, e))
    assert all(t in covered for t, c in enumerate(classes) if c == 2)


def test_segmentation_drops_nonspeech_and_splits_long():
    classes = [1] * 20  # noise only -> dropped in phase 5
    assert segment_frames(classes) == []
    long = [2] * 3000
    segs = segment_frames(long, hard_max_segment_length=1000)
    assert len(segs) == 3
    assert all(e - s <= 1000 for s, e in segs)


def test_write_segments_format():
    lines = ["rec1 " + " ".join(["0"] * 4 + ["2"] * 10 + ["0"] * 4)]
    buf = io.StringIO()
    n = write_segments(lines, buf, silence_proportion=0.0)
    assert n == 1
    parts = buf.getvalue().split()
    assert parts[1] == "rec1"
    assert float(parts[3]) > float(parts[2])
    assert parts[0].startswith("rec1-")


def test_binary_lattice_ark_interchange(graph_and_syms, lattice, tmp_path):
    """A real latgen lattice roundtrips through the Kaldi binary
    CompactLattice ark and the lattice-copy CLI (binary -> text -> binary)
    preserving structure, scores, and the best path."""
    from pytorch_kaldi_asr_tpu.fst.openfst_io import (
        read_lattice_ark,
        write_lattice_ark,
    )
    from pytorch_kaldi_asr_tpu.tools import lattice_copy

    _, word_syms = graph_and_syms
    id2word = {v: k for k, v in word_syms.items()}
    ark = str(tmp_path / "lat.ark")
    write_lattice_ark([lattice], ark, word_syms,
                      scp_path=str(tmp_path / "lat.scp"))
    (utt, got), = list(read_lattice_ark(ark, id2word))
    assert utt == lattice.utt
    assert got.num_nodes == lattice.num_nodes
    assert len(got.links) == len(lattice.links)
    assert got.best_path()[0] == lattice.best_path()[0]
    assert math.isclose(got.best_path()[1], lattice.best_path()[1],
                        rel_tol=1e-5)

    # CLI: binary -> text -> binary
    words_txt = tmp_path / "words.txt"
    words_txt.write_text("".join(f"{w} {i}\n" for w, i in word_syms.items()))
    assert lattice_copy.main([
        "-words", str(words_txt), f"ark:{ark}",
        f"ark,t:{tmp_path}/lat.txt"]) == 0
    assert lattice_copy.main([
        "-words", str(words_txt), f"ark,t:{tmp_path}/lat.txt",
        f"ark,scp:{tmp_path}/lat2.ark,{tmp_path}/lat2.scp"]) == 0
    (utt2, got2), = list(read_lattice_ark(str(tmp_path / "lat2.ark"),
                                          id2word))
    assert utt2 == lattice.utt
    assert got2.best_path()[0] == lattice.best_path()[0]


def test_mkgraph_latgen_cli_const_fst_and_binary_ark(tmp_path):
    """End-to-end CLI path: mkgraph -fst_type const -> latgen reads the
    ConstFst graph, decodes a posterior ark, and emits a binary
    CompactLattice ark alongside the text outputs."""
    from pytorch_kaldi_asr_tpu.fst.openfst_io import read_lattice_ark
    from pytorch_kaldi_asr_tpu.io.kaldi_io import ArkWriter
    from pytorch_kaldi_asr_tpu.lm.arpa import write_arpa
    from pytorch_kaldi_asr_tpu.lm.ngram import train_ngram_lm
    from pytorch_kaldi_asr_tpu.recipes import latgen as latgen_cli
    from pytorch_kaldi_asr_tpu.recipes import mkgraph as mkgraph_cli

    phones_txt = tmp_path / "phones.txt"
    phones_txt.write_text("".join(f"{p} {i}\n" for p, i in PHONES.items()))
    lex_txt = tmp_path / "lexicon.txt"
    lex_txt.write_text("".join(
        f"{w} {' '.join(ph)}\n" for w, ph in LEXICON.items()))
    lm_path = str(tmp_path / "lm.arpa")
    write_arpa(train_ngram_lm(SENTS, order=2), lm_path)

    gdir = str(tmp_path / "graph")
    assert mkgraph_cli.main([
        "-phones", str(phones_txt), "-lexicon", str(lex_txt),
        "-lm", lm_path, "-fst_type", "const", "-graph_dir", gdir,
    ]) == 0
    # the graph really is a ConstFst on disk
    blob = open(f"{gdir}/HLG.fst", "rb").read()
    assert b"const" in blob[:16]

    sent = ["bat", "at", "tab"]
    phone_ids = [PHONES[p] for w in sent for p in LEXICON[w]]
    posts = _posts_for(phone_ids, len(PHONES), seed=3)
    ark = str(tmp_path / "post.ark")
    with ArkWriter(ark) as w:
        w.write("u1", posts.astype("float32"))

    out = str(tmp_path / "hyp.txt")
    lat_ark = str(tmp_path / "lat.ark")
    assert latgen_cli.main([
        "-graph_dir", gdir, "-rspecifier", f"ark:{ark}",
        "-save_result_file", out, "-beam", "30.0",
        "-save_lattice_ark", lat_ark,
    ]) == 0
    assert open(out).read().split()[1:] == sent
    word_syms = mkgraph_cli.read_symbol_table(f"{gdir}/words.txt")
    id2word = {v: k for k, v in word_syms.items()}
    (utt, lat), = list(read_lattice_ark(lat_ark, id2word))
    assert utt == "u1"
    assert lat.best_path()[0] == sent


# ---------------------------------------------------------------------------
# lattice algebra (decode/lattice_ops.py — the lattice-tool-chain verbs)
# ---------------------------------------------------------------------------


def _diamond_lattice():
    """Two-path lattice: 'bat at' (cost 1.0) vs 'back at' (cost 2.5)."""
    lat = WordLattice(utt="u")
    n0 = lat.add_node(0)
    n1 = lat.add_node(5)
    n2 = lat.add_node(10)
    lat.add_link(n0, n1, "bat", acoustic=0.5, graph=0.25)
    lat.add_link(n0, n1, "back", acoustic=1.5, graph=0.75)
    lat.add_link(n1, n2, "at", acoustic=0.25, graph=0.0)
    lat.finals[n2] = 0.0
    return lat


def test_scale_lattice_components():
    from pytorch_kaldi_asr_tpu.decode.lattice_ops import scale_lattice

    lat = _diamond_lattice()
    s = scale_lattice(lat, acoustic_scale=2.0, lm_scale=4.0)
    assert s.links[0].acoustic == 1.0 and s.links[0].graph == 1.0
    # original untouched
    assert lat.links[0].acoustic == 0.5
    # best path order can flip under scaling
    words, _ = s.best_path()
    assert words == ["bat", "at"]


def test_prune_lattice_drops_expensive_path():
    from pytorch_kaldi_asr_tpu.decode.lattice_ops import prune_lattice

    lat = _diamond_lattice()
    # best = 1.0; 'back' path = 2.5; beam 1.0 prunes it
    p = prune_lattice(lat, 1.0)
    assert sorted(l.word for l in p.links) == ["at", "bat"]
    assert p.best_path()[0] == ["bat", "at"]
    # wide beam keeps both
    p2 = prune_lattice(lat, 10.0)
    assert sorted(l.word for l in p2.links) == ["at", "back", "bat"]


def test_nbest_distinct_ordered():
    from pytorch_kaldi_asr_tpu.decode.lattice_ops import nbest

    lat = _diamond_lattice()
    res = nbest(lat, 5)
    assert [w for w, _ in res] == [["bat", "at"], ["back", "at"]]
    assert res[0][1] < res[1][1]
    assert math.isclose(res[0][1], 1.0)
    assert math.isclose(res[1][1], 2.5)


def test_nbest_matches_real_lattice_best_path(lattice):
    from pytorch_kaldi_asr_tpu.decode.lattice_ops import nbest

    res = nbest(lattice, 3)
    assert res, "no hypotheses from a real latgen lattice"
    words, cost = lattice.best_path()
    assert res[0][0] == words
    assert math.isclose(res[0][1], cost, rel_tol=1e-6)
    # costs are non-decreasing and sequences distinct
    costs = [c for _, c in res]
    assert costs == sorted(costs)
    seqs = [tuple(w) for w, _ in res]
    assert len(set(seqs)) == len(seqs)


def test_oracle_wer_exact():
    from pytorch_kaldi_asr_tpu.decode.lattice_ops import oracle_wer

    lat = _diamond_lattice()
    # exact match through the lattice
    assert oracle_wer(lat, ["back", "at"]) == (0, ["back", "at"])
    # one substitution minimum
    err, words = oracle_wer(lat, ["bat", "cat"])
    assert err == 1 and words == ["bat", "at"]
    # reference longer: deletion counted
    err, _ = oracle_wer(lat, ["bat", "at", "extra"])
    assert err == 1
    # empty reference: best path is all insertions (2)
    err, _ = oracle_wer(lat, [])
    assert err == 2


def test_lattice_copy_cli_scale_prune_nbest_oracle(graph_and_syms, lattice,
                                                  tmp_path):
    from pytorch_kaldi_asr_tpu.fst.openfst_io import (
        read_lattice_ark,
        write_lattice_ark,
    )
    from pytorch_kaldi_asr_tpu.tools import lattice_copy

    _, word_syms = graph_and_syms
    id2word = {v: k for k, v in word_syms.items()}
    ark = str(tmp_path / "in.ark")
    write_lattice_ark([lattice], ark, word_syms)
    words_txt = tmp_path / "words.txt"
    words_txt.write_text("".join(f"{w} {i}\n" for w, i in word_syms.items()))
    ref_txt = tmp_path / "ref.txt"
    ref_txt.write_text(f"{lattice.utt} bat at tab\n")
    out_ark = str(tmp_path / "out.ark")
    assert lattice_copy.main([
        "-words", str(words_txt), "-acoustic_scale", "0.5",
        "-prune_beam", "20.0", "-nbest", "5",
        "-oracle_ref", str(ref_txt),
        f"ark:{ark}", f"ark:{out_ark}"]) == 0
    (utt, got), = list(read_lattice_ark(out_ark, id2word))
    assert utt == lattice.utt
    assert len(got.links) <= len(lattice.links)
    nb = open(out_ark + ".nbest").read().splitlines()
    assert 1 <= len(nb) <= 5
    assert nb[0].split("\t")[0] == lattice.utt
    oracle = open(out_ark + ".oracle").read().splitlines()
    assert oracle[-1].startswith("OVERALL")
    # the true sentence is in the lattice, so oracle errors are 0
    assert oracle[0].split()[1] == "0"
