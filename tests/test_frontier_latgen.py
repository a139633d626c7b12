"""Top-K frontier device decoder (decode/frontier_latgen.py) pinned
against the pure-Python StreamingLatgen oracle (decode/latgen.py), the
same contract the dense device decoder is held to
(tests/test_device_latgen.py), plus fat-state splitting coverage.
"""

import os

import numpy as np
import pytest

from pytorch_kaldi_asr_tpu.decode.frontier_latgen import (
    FrontierLatgen,
    _FrontierGraph,
    frontier_latgen,
)
from pytorch_kaldi_asr_tpu.decode.latgen import latgen
from pytorch_kaldi_asr_tpu.fst.core import EPS, Fst
from pytorch_kaldi_asr_tpu.fst.graph import mkgraph
from pytorch_kaldi_asr_tpu.lm.ngram import train_ngram_lm

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


def _oracle(graph, posts, **kw):
    old = os.environ.get("PKA_NATIVE_LATGEN")
    os.environ["PKA_NATIVE_LATGEN"] = "0"
    try:
        return latgen(graph, posts.astype(np.float64), **kw)
    finally:
        if old is None:
            del os.environ["PKA_NATIVE_LATGEN"]
        else:
            os.environ["PKA_NATIVE_LATGEN"] = old


def _assert_matches(dev, ref, tol=5e-3):
    assert (dev is None) == (ref is None)
    if ref is None:
        return
    dw, dp, dc = dev
    rw, rp, rc = ref
    assert dw == rw
    assert dp == rp
    assert abs(dc - rc) < tol


def test_batched_matches_oracle(graph):
    lens = [60, 45, 30, 60]
    B, T = len(lens), max(lens)
    batch = np.zeros((B, T, len(PHONES)), np.float32)
    for b, L in enumerate(lens):
        batch[b, :L] = _posts(L, seed=b)
    res = frontier_latgen(graph, batch, np.array(lens), beam=16.0,
                          max_active=2000)
    for b, L in enumerate(lens):
        _assert_matches(res[b],
                        _oracle(graph, _posts(L, seed=b), beam=16.0,
                                max_active=2000))


def test_small_arc_budget_splits_states(graph):
    """de=2/dz=2 forces virtual-state splitting on every fat state; the
    split graph must decode identically to the oracle on the original."""
    posts = _posts(50, seed=4)
    dec = FrontierLatgen(graph, beam=16.0, max_active=2000, de=2, dz=2)
    assert dec.packed.n_virtual > 0
    res = dec.decode_batch(posts.astype(np.float32)[None])
    _assert_matches(res[0], _oracle(graph, posts, beam=16.0,
                                    max_active=2000))


def test_priors_and_acoustic_scale(graph):
    posts = _posts(50, seed=3)
    rng = np.random.default_rng(11)
    pri = rng.normal(scale=0.3, size=len(PHONES))
    pri = pri - np.log(np.exp(pri).sum())
    res = frontier_latgen(graph, posts.astype(np.float32)[None],
                          acoustic_scale=0.7, beam=16.0, log_priors=pri)
    _assert_matches(res[0],
                    _oracle(graph, posts, acoustic_scale=0.7, beam=16.0,
                            log_priors=pri))


def test_tight_pruning_matches_oracle(graph):
    posts = _posts(50, seed=5)
    for beam, max_active in [(4.0, 2000), (16.0, 8), (3.0, 5)]:
        res = frontier_latgen(graph, posts.astype(np.float32)[None],
                              beam=beam, max_active=max_active)
        _assert_matches(
            res[0], _oracle(graph, posts, beam=beam,
                            max_active=max_active),
            tol=2e-2)


def test_dead_beam_returns_none():
    g = Fst()
    s0, s1 = g.add_state(), g.add_state()
    g.start = s0
    g.add_arc(s0, 99, 1, 0.0, s1)  # column 98 >> posterior width
    g.set_final(s1)
    posts = np.log(np.full((5, 3), 1 / 3.0, np.float32))
    assert frontier_latgen(g, posts) is None
    assert _oracle(g, posts.astype(np.float64)) is None


def test_no_epsilon_graph():
    # covers the has_eps=False specialization
    g = Fst()
    states = [g.add_state() for _ in range(4)]
    g.start = states[0]
    for i in range(3):
        g.add_arc(states[i], i + 1, i + 1, 0.1 * i, states[i + 1])
        g.add_arc(states[i], 3 - i if 3 - i > 0 else 1, 0, 0.5,
                  states[i])
    g.set_final(states[3], 0.25)
    rng = np.random.default_rng(0)
    posts = rng.normal(size=(6, 4))
    posts = posts - np.log(np.exp(posts).sum(1, keepdims=True))
    res = frontier_latgen(g, posts.astype(np.float32))
    _assert_matches(res, _oracle(g, posts))


def test_words_cap_overflow_falls_back(graph):
    posts = _posts(60, seed=2)
    ref = _oracle(graph, posts, beam=16.0, max_active=2000)
    assert ref is not None and len(ref[0]) > 1
    dec = FrontierLatgen(graph, beam=16.0, max_active=2000, words_cap=1)
    res = dec.decode_batch(posts.astype(np.float32)[None])
    _assert_matches(res[0], ref, tol=1e-5)


def test_fat_state_split_structure():
    """A 100-arc star state with de=dz=4 becomes leaves behind a 4-ary
    epsilon tree; every real arc survives with its labels and weight."""
    g = Fst()
    hub = g.add_state()
    g.start = hub
    for i in range(100):
        leaf = g.add_state()
        g.add_arc(hub, (i % 5) + 1, i + 1, 0.01 * i, leaf)
        g.set_final(leaf)
    p = _FrontierGraph(g, sym_offset=1, de=4, dz=4)
    assert p.n_virtual >= 25  # 25 emit leaves + tree internals
    # all 100 arcs present in the emitting table with intact payloads
    got = sorted(
        (int(p.e_ol[s, d]), float(p.e_w[s, d]))
        for s in range(p.num_states)
        for d in range(p.de)
        if np.isfinite(p.e_w[s, d]))
    assert got == [(i + 1, pytest.approx(0.01 * i)) for i in range(100)]
    # the hub keeps only epsilon links
    assert not np.isfinite(p.e_w[hub]).any()


def test_auto_dispatch_picks_by_graph_size(graph):
    from pytorch_kaldi_asr_tpu.decode.device_latgen import (
        DeviceLatgen,
        make_device_latgen,
    )

    assert isinstance(make_device_latgen(graph), DeviceLatgen)
    assert isinstance(make_device_latgen(graph, mode="frontier"),
                      FrontierLatgen)
    big = Fst()
    states = [big.add_state() for _ in range(9000)]
    big.start = states[0]
    for i in range(8999):
        big.add_arc(states[i], 1, 0, 0.0, states[i + 1])
    big.set_final(states[-1])
    assert isinstance(make_device_latgen(big), FrontierLatgen)


def test_latgen_cli_frontier_search(graph, tmp_path):
    """recipes/latgen.py -device_search -device_mode frontier writes the
    same hypotheses as the host decoder path."""
    from pytorch_kaldi_asr_tpu.io.kaldi_io import ArkWriter
    from pytorch_kaldi_asr_tpu.lm.arpa import write_arpa
    from pytorch_kaldi_asr_tpu.recipes import latgen as latgen_cli
    from pytorch_kaldi_asr_tpu.recipes import mkgraph as mkgraph_cli

    phones_txt = tmp_path / "phones.txt"
    phones_txt.write_text("".join(f"{p} {i}\n" for p, i in PHONES.items()))
    lex_txt = tmp_path / "lexicon.txt"
    lex_txt.write_text("".join(
        f"{w} {' '.join(ph)}\n" for w, ph in LEXICON.items()))
    lm_path = str(tmp_path / "lm.arpa")
    write_arpa(train_ngram_lm([s.split() for s in SENTS], order=2),
               lm_path)
    gdir = str(tmp_path / "graph")
    assert mkgraph_cli.main([
        "-phones", str(phones_txt), "-lexicon", str(lex_txt),
        "-lm", lm_path, "-graph_dir", gdir,
    ]) == 0

    ark = str(tmp_path / "post.ark")
    with ArkWriter(ark) as w:
        for i, T in enumerate([42, 30, 57]):
            w.write(f"u{i}", _posts(T, seed=i).astype("float32"))

    host_out = str(tmp_path / "hyp_host.txt")
    dev_out = str(tmp_path / "hyp_frontier.txt")
    base = ["-graph_dir", gdir, "-rspecifier", f"ark:{ark}",
            "-beam", "16.0"]
    assert latgen_cli.main(base + ["-save_result_file", host_out]) == 0
    assert latgen_cli.main(base + ["-save_result_file", dev_out,
                                   "-device_search", "-device_batch", "2",
                                   "-device_mode", "frontier"]) == 0
    assert open(dev_out).read().splitlines() == \
        open(host_out).read().splitlines()


def test_large_synthetic_graph_matches_native():
    """A ~20k-state layered graph (fat fan-outs included) decoded by the
    frontier path against the host decoder under realistic pruning."""
    rng = np.random.default_rng(42)
    g = Fst()
    n_layers, width, P = 40, 500, 20
    layers = [[g.add_state() for _ in range(width)]
              for _ in range(n_layers)]
    g.start = layers[0][0]
    for li in range(n_layers - 1):
        for si, s in enumerate(layers[li]):
            fan = 3 if si else 64  # state 0 of each layer is fat
            tgts = rng.integers(0, width, size=fan)
            for t in tgts:
                il = int(rng.integers(1, P + 1))
                g.add_arc(s, il, il, float(rng.uniform(0, 2)),
                          layers[li + 1][int(t)])
        # a few epsilons per layer
        for _ in range(8):
            a, b = rng.integers(0, width, size=2)
            g.add_arc(layers[li][int(a)], EPS, EPS,
                      float(rng.uniform(0, 0.5)), layers[li][int(b)])
    for s in layers[-1]:
        g.set_final(s, 0.0)
    assert g.num_states >= 20000

    T = n_layers - 1
    posts = rng.normal(size=(T, P))
    posts = posts - np.log(np.exp(posts).sum(1, keepdims=True))
    ref = _oracle(g, posts, beam=8.0, max_active=512)
    res = frontier_latgen(g, posts.astype(np.float32)[None],
                          beam=8.0, max_active=512)
    _assert_matches(res[0], ref, tol=2e-2)


def test_post_closure_cap_divergence_from_host():
    """Pin the DOCUMENTED semantic difference (frontier_latgen.py:38-44):
    the frontier width also caps the post-closure state set, where the
    host keeps every within-beam state.  On an epsilon-heavy graph whose
    closure fan-out exceeds the frontier width K = max(2*max_active, 64),
    the tighter prune must CHANGE the output (no silent agreement, no
    overflow/fallback masking it) — and widening max_active past the
    live-state count must restore exact agreement."""
    M = 100  # closure fan-out; > default K floor of 64 at max_active 16
    g = Fst()
    s0 = g.add_state()
    g.start = s0
    hub = g.add_state()
    g.add_arc(s0, 1, 0, 0.0, hub)  # frame-1 emit: phone 'a'
    fin = g.add_state()
    g.set_final(fin, 0.0)
    for i in range(1, M + 1):
        si = g.add_state()
        # closure rank: eps weight grows with i, so branch M sorts LAST
        g.add_arc(hub, EPS, 0, 0.01 * i, si)
        # ...but branch M's frame-2 emit is 5.0 cheaper: the true best
        # path runs through the worst-ranked closure state
        w2 = 0.0 if i == M else 5.0
        g.add_arc(si, 2, i, w2, fin)  # frame-2 emit: phone 'b', word i
    posts = np.log(np.array([[0.9, 0.1], [0.1, 0.9]]))  # a then b

    host = _oracle(g, posts, beam=1e5, max_active=16)
    dev = frontier_latgen(g, posts.astype(np.float32),
                          beam=1e5, max_active=16)
    assert host is not None and dev is not None
    assert host[0] == [M]  # host keeps all M+1 closure states: best path
    # the frontier capped closure at K=64 and LOST branch M: different
    # words, strictly worse cost — the documented tighter search
    assert dev[0] != host[0]
    assert dev[0] == [1]  # best branch that survives the top-64 cut
    assert dev[2] > host[2] + 3.0
    # sanity: the divergence is the cap, nothing else — uncapped widths
    # agree exactly
    wide = frontier_latgen(g, posts.astype(np.float32),
                           beam=1e5, max_active=2000)
    _assert_matches(wide, host)
