"""Native C++ latgen core (native/src/latgen.cc) pinned against the
pure-Python StreamingLatgen oracle (decode/latgen.py).

The Python decoder is the semantic definition; the native one must
reproduce its words/phones/cost bit-identically (float64 arithmetic is
mirrored).  Epsilon-entry PLACEMENT inside finish_entries may differ only
on exact-cost ties (two equal-cost tracebacks through epsilon arcs), so
entries are compared on their emitting subsequence + cost.
"""

import numpy as np
import pytest

from pytorch_kaldi_asr_tpu import native
from pytorch_kaldi_asr_tpu.decode.latgen import (
    NativeStreamingLatgen,
    StreamingLatgen,
    latgen,
    make_streaming_latgen,
)
from pytorch_kaldi_asr_tpu.fst.graph import mkgraph
from pytorch_kaldi_asr_tpu.lm.ngram import train_ngram_lm

if not native.available():
    try:
        native.build()
    except Exception:
        pass

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason="native library not built (g++/make unavailable)")

PHONES = {p: i + 1 for i, p in enumerate(["a", "b", "k", "t", "sil"])}
LEXICON = {
    "bat": ["b", "a", "t"],
    "back": ["b", "a", "k"],
    "at": ["a", "t"],
    "tab": ["t", "a", "b"],
}
SENTS = ["bat at tab", "back at bat", "tab tab at", "bat back",
         "at tab back bat"]


@pytest.fixture(scope="module")
def graph():
    words = sorted(LEXICON)
    word_syms = {w: i + 1 for i, w in enumerate(words)}
    lm = train_ngram_lm([s.split() for s in SENTS], order=2)
    g, _ = mkgraph(LEXICON, lm, word_syms, PHONES)
    return g


def _posts(T=60, seed=0, peak=5.0):
    rng = np.random.default_rng(seed)
    path = rng.integers(1, len(PHONES) + 1, size=T)
    logits = rng.normal(size=(T, len(PHONES)))
    logits[np.arange(T), path - 1] += peak
    return logits - np.log(np.exp(logits).sum(1, keepdims=True))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_oneshot_matches_python(graph, seed):
    posts = _posts(seed=seed)
    py = StreamingLatgen(graph, beam=12.0, max_active=64)
    nat = NativeStreamingLatgen(graph, beam=12.0, max_active=64)
    ok_py = py.push(posts)
    ok_nat = nat.push(posts)
    assert ok_py == ok_nat
    if not ok_py:
        return
    r_py, r_nat = py.finish(), nat.finish()
    assert (r_py is None) == (r_nat is None)
    if r_py is not None:
        assert r_py[0] == r_nat[0]  # words
        assert r_py[1] == r_nat[1]  # phone frames
        assert r_py[2] == r_nat[2]  # cost, bit-identical


def test_streaming_chunked_partials_match(graph):
    posts = _posts(T=80, seed=3)
    py = StreamingLatgen(graph, beam=14.0, max_active=128)
    nat = NativeStreamingLatgen(graph, beam=14.0, max_active=128)
    for lo in range(0, 80, 16):
        assert py.push(posts[lo:lo + 16]) == nat.push(posts[lo:lo + 16])
        assert py.partial() == nat.partial()
        assert py.frames == nat.frames
    e_py, e_nat = py.finish_entries(), nat.finish_entries()
    assert (e_py is None) == (e_nat is None)
    if e_py is not None:
        assert e_py[1] == e_nat[1]  # cost, bit-identical
        # word-label PLACEMENT may shift between an emitting arc and an
        # equal-cost epsilon arc (traceback tie); the decoded sequences
        # and the frame alignment length must still match exactly
        assert ([o for o, _ in e_py[0] if o] ==
                [o for o, _ in e_nat[0] if o])  # words
        assert ([i for _, i in e_py[0] if i] ==
                [i for _, i in e_nat[0] if i])  # phone frames


def test_priors_and_acoustic_scale_match(graph):
    posts = _posts(T=40, seed=4)
    priors = np.log(np.full(len(PHONES), 1.0 / len(PHONES)))
    kw = dict(beam=10.0, max_active=32, acoustic_scale=0.7,
              log_priors=priors)
    py = StreamingLatgen(graph, **kw)
    nat = NativeStreamingLatgen(graph, **kw)
    py.push(posts)
    nat.push(posts)
    r_py, r_nat = py.finish(), nat.finish()
    assert r_py == r_nat


def test_compaction_preserves_results(graph):
    posts = _posts(T=120, seed=5)
    base = NativeStreamingLatgen(graph, beam=14.0, max_active=64)
    tiny = NativeStreamingLatgen(graph, beam=14.0, max_active=64,
                                 compact_threshold=256)
    base.push(posts)
    tiny.push(posts)
    assert base.finish() == tiny.finish()


def test_dead_beam_behaves_like_python(graph):
    posts = _posts(T=10, seed=6)
    # an impossibly tight beam with a tiny active set can kill the search;
    # whatever happens, both decoders must agree at every step
    py = StreamingLatgen(graph, beam=1e-9, max_active=1)
    nat = NativeStreamingLatgen(graph, beam=1e-9, max_active=1)
    for t in range(10):
        ok_py = py.push(posts[t:t + 1])
        ok_nat = nat.push(posts[t:t + 1])
        assert ok_py == ok_nat
        assert py.dead == nat.dead
        if not ok_py:
            assert py.partial() is None and nat.partial() is None
            assert py.finish() is None and nat.finish() is None
            return


def test_reset_and_reuse(graph):
    posts = _posts(T=30, seed=7)
    nat = NativeStreamingLatgen(graph, beam=12.0, max_active=64)
    nat.push(posts)
    first = nat.finish()
    nat.reset()
    assert nat.frames == 0
    nat.push(posts)
    assert nat.finish() == first


def test_factory_and_env_override(graph, monkeypatch):
    assert isinstance(make_streaming_latgen(graph), NativeStreamingLatgen)
    monkeypatch.setenv("PKA_NATIVE_LATGEN", "0")
    assert isinstance(make_streaming_latgen(graph), StreamingLatgen)


def test_latgen_wrapper_uses_native(graph):
    posts = _posts(T=50, seed=8)
    got = latgen(graph, posts, beam=12.0, max_active=64)
    py = StreamingLatgen(graph, beam=12.0, max_active=64)
    py.push(posts)
    assert got == py.finish()


def _lat_posts(T=60, seed=9):
    return _posts(T=T, seed=seed)


def test_native_lattice_wide_beam_equivalence(graph, monkeypatch):
    """With wide beams every surviving transition is recorded by both
    decoders, so the pruned lattices are equivalent automata: exact nbest
    equality."""
    from pytorch_kaldi_asr_tpu.decode.latgen import latgen_lattice
    from pytorch_kaldi_asr_tpu.decode.lattice_ops import nbest as nb_op

    posts = _lat_posts()
    kw = dict(beam=14.0, lattice_beam=14.0, max_active=100000)
    monkeypatch.setenv("PKA_NATIVE_LATGEN", "0")
    lat_py = latgen_lattice(graph, posts, **kw)
    monkeypatch.setenv("PKA_NATIVE_LATGEN", "1")
    lat_nat = latgen_lattice(graph, posts, **kw)
    assert (lat_py is None) == (lat_nat is None)
    if lat_py is not None:
        # semantic pin: the hypotheses and their exact costs agree
        # (structural node/link counts can differ by a few MARGINAL links:
        # recording is relaxation-order dependent at the lattice_beam edge)
        assert nb_op(lat_py, 8) == nb_op(lat_nat, 8)


def test_native_lattice_narrow_beam_best_path(graph, monkeypatch):
    """At narrow beams link RECORDING is relaxation-order dependent, but
    the 1-best path must equal the Viterbi decode exactly."""
    from pytorch_kaldi_asr_tpu.decode.latgen import latgen, latgen_lattice
    from pytorch_kaldi_asr_tpu.decode.lattice_ops import nbest as nb_op

    posts = _lat_posts(T=80, seed=10)
    monkeypatch.setenv("PKA_NATIVE_LATGEN", "1")
    lat = latgen_lattice(graph, posts, beam=10.0, lattice_beam=5.0,
                         max_active=64)
    one = latgen(graph, posts, beam=10.0, max_active=64)
    assert (lat is None) == (one is None)
    if lat is not None:
        (words, cost), = nb_op(lat, 1)
        assert cost == pytest.approx(one[2], abs=1e-9)


def test_native_lattice_id2word_and_priors(graph, monkeypatch):
    from pytorch_kaldi_asr_tpu.decode.latgen import latgen_lattice

    posts = _lat_posts(T=40, seed=11)
    priors = np.log(np.full(len(PHONES), 1.0 / len(PHONES)))
    id2word = {i + 1: w for i, w in enumerate(sorted(LEXICON))}
    kw = dict(beam=14.0, lattice_beam=14.0, max_active=100000,
              log_priors=priors, id2word=id2word, utt="u1")
    monkeypatch.setenv("PKA_NATIVE_LATGEN", "0")
    lat_py = latgen_lattice(graph, posts, **kw)
    monkeypatch.setenv("PKA_NATIVE_LATGEN", "1")
    lat_nat = latgen_lattice(graph, posts, **kw)
    assert lat_nat.utt == "u1"
    words_of = lambda lat: {l.word for l in lat.links}  # noqa: E731
    assert words_of(lat_py) == words_of(lat_nat)
    assert set(words_of(lat_nat)) <= set(id2word.values()) | {"<eps>"}


def test_native_priors_length_mismatch_raises(graph):
    """The Python decoder's broadcast raises on a priors/posterior width
    mismatch; the native wrapper must too (the C++ core would otherwise
    read past the end of the priors vector)."""
    posts = _posts(T=10, seed=12)
    bad_priors = np.zeros(len(PHONES) - 2)
    dec = NativeStreamingLatgen(graph, log_priors=bad_priors)
    with pytest.raises(ValueError, match="priors"):
        dec.push(posts)
    from pytorch_kaldi_asr_tpu.decode.latgen import latgen_lattice
    with pytest.raises(ValueError, match="priors"):
        latgen_lattice(graph, posts, log_priors=bad_priors)


def test_native_no_start_state_raises():
    from pytorch_kaldi_asr_tpu.fst.core import Fst

    g = Fst()
    g.add_state()
    with pytest.raises(ValueError, match="start"):
        NativeStreamingLatgen(g)
    with pytest.raises(ValueError, match="start"):
        StreamingLatgen(g)


def test_native_graph_cache_invalidated_on_mutation(graph, monkeypatch):
    """Mutating the Fst after a native decode must rebuild the native arc
    copy — stale caches would silently decode against the old graph.  The
    deepcopy also pins that a decoded graph STAYS copyable (the native
    handle lives in a weak side table, not on the Fst)."""
    import copy

    g = copy.deepcopy(graph)
    posts = _posts(T=30, seed=13)
    monkeypatch.setenv("PKA_NATIVE_LATGEN", "1")
    before = latgen(g, posts)
    assert before is not None
    # route every final state through a high-cost penalty: best cost moves
    penalty = 7.25
    for s in list(g.final):
        g.final[s] = g.final[s] + penalty
    after = latgen(g, posts)
    assert after is not None
    assert after[2] == pytest.approx(before[2] + penalty, abs=1e-9)
