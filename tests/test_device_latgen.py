"""On-device batched Viterbi (decode/device_latgen.py) pinned against the
pure-Python StreamingLatgen oracle (decode/latgen.py).

The device decoder runs float32; the oracle float64.  Costs are compared
to 5e-3 absolute over these test lengths; word/phone sequences must match
exactly (the fixture weights are continuous, so the best path has no
numerical ties for f32 to flip).
"""

import numpy as np
import pytest

from pytorch_kaldi_asr_tpu.decode.device_latgen import (
    DeviceLatgen,
    device_latgen,
)
from pytorch_kaldi_asr_tpu.decode.latgen import StreamingLatgen, latgen
from pytorch_kaldi_asr_tpu.fst.core import Fst
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
    import os

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
    res = device_latgen(graph, batch, np.array(lens), beam=16.0,
                        max_active=2000)
    for b, L in enumerate(lens):
        _assert_matches(res[b],
                        _oracle(graph, _posts(L, seed=b), beam=16.0,
                                max_active=2000))


def test_single_utterance_2d_input(graph):
    posts = _posts(40, seed=7)
    res = device_latgen(graph, posts.astype(np.float32), beam=16.0)
    _assert_matches(res, _oracle(graph, posts, beam=16.0))


def test_priors_and_acoustic_scale(graph):
    posts = _posts(50, seed=3)
    rng = np.random.default_rng(11)
    pri = rng.normal(scale=0.3, size=len(PHONES))
    pri = pri - np.log(np.exp(pri).sum())
    res = device_latgen(graph, posts.astype(np.float32)[None],
                        acoustic_scale=0.7, beam=16.0, log_priors=pri)
    _assert_matches(res[0],
                    _oracle(graph, posts, acoustic_scale=0.7, beam=16.0,
                            log_priors=pri))


def test_tight_pruning_matches_oracle(graph):
    posts = _posts(50, seed=5)
    for beam, max_active in [(4.0, 2000), (16.0, 8), (3.0, 5)]:
        res = device_latgen(graph, posts.astype(np.float32)[None],
                            beam=beam, max_active=max_active)
        _assert_matches(
            res[0], _oracle(graph, posts, beam=beam,
                            max_active=max_active),
            tol=2e-2)


def test_dead_beam_returns_none():
    # a graph whose only emitting label has no posterior column: the host
    # decoder's beam dies on frame 0, the device decoder must agree
    g = Fst()
    s0, s1 = g.add_state(), g.add_state()
    g.start = s0
    g.add_arc(s0, 99, 1, 0.0, s1)  # column 98 >> posterior width
    g.set_final(s1)
    posts = np.log(np.full((5, 3), 1 / 3.0, np.float32))
    assert device_latgen(g, posts) is None
    assert _oracle(g, posts.astype(np.float64)) is None


def test_no_epsilon_graph(graph):
    # covers the Az == 0 specialization of the compiled decoder
    g = Fst()
    states = [g.add_state() for _ in range(4)]
    g.start = states[0]
    for i in range(3):
        g.add_arc(states[i], i + 1, i + 1, 0.1 * i, states[i + 1])
        g.add_arc(states[i], 3 - i if 3 - i > 0 else 1, 0, 0.5,
                  states[i])  # emitting self-loop, no output
    g.set_final(states[3], 0.25)
    rng = np.random.default_rng(0)
    posts = rng.normal(size=(6, 4))
    posts = posts - np.log(np.exp(posts).sum(1, keepdims=True))
    res = device_latgen(g, posts.astype(np.float32))
    _assert_matches(res, _oracle(g, posts))


def test_words_cap_overflow_falls_back(graph):
    # words_cap=1 forces the traceback-overflow path; the wrapper must
    # fall back to the host decoder and still return the full hypothesis
    posts = _posts(60, seed=2)
    ref = _oracle(graph, posts, beam=16.0, max_active=2000)
    assert ref is not None and len(ref[0]) > 1
    dec = DeviceLatgen(graph, beam=16.0, max_active=2000, words_cap=1)
    res = dec.decode_batch(posts.astype(np.float32)[None])
    # fallback IS the oracle (modulo the float32 cast of its input)
    _assert_matches(res[0], ref, tol=1e-5)


def test_latgen_cli_device_search(graph, tmp_path):
    """recipes/latgen.py -device_search decodes a multi-utterance
    posterior ark through the batched device decoder and writes the same
    hypotheses as the host decoder path."""
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
        for i, T in enumerate([42, 30, 57]):  # uneven lengths: padding
            w.write(f"u{i}", _posts(T, seed=i).astype("float32"))

    host_out = str(tmp_path / "hyp_host.txt")
    dev_out = str(tmp_path / "hyp_dev.txt")
    base = ["-graph_dir", gdir, "-rspecifier", f"ark:{ark}",
            "-beam", "16.0"]
    assert latgen_cli.main(base + ["-save_result_file", host_out]) == 0
    assert latgen_cli.main(base + ["-save_result_file", dev_out,
                                   "-device_search",
                                   "-device_batch", "2"]) == 0
    host_lines = open(host_out).read().splitlines()
    dev_lines = open(dev_out).read().splitlines()
    assert len(dev_lines) == 3
    assert dev_lines == host_lines


def test_streaming_oracle_agrees_with_batch(graph):
    # belt-and-braces: the one-shot oracle used above is itself pinned to
    # the streaming decoder fed in chunks
    posts = _posts(48, seed=9)
    dec = StreamingLatgen(graph, beam=16.0, max_active=2000)
    assert dec.push(posts[:20].astype(np.float64))
    assert dec.push(posts[20:].astype(np.float64))
    words, phones, cost = dec.finish()
    res = device_latgen(graph, posts.astype(np.float32)[None])
    _assert_matches(res[0], (words, phones, cost))
