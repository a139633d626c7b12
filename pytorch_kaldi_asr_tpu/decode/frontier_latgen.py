"""Top-K active-frontier WFST Viterbi search on the accelerator.

The dense device decoder (decode/device_latgen.py) sweeps the FULL arc
table with a segment-min scatter every frame and stores a [T, S, B]
traceback, so both its per-frame compute and its memory grow with the
graph: fine at recipe-scale graphs, hopeless at the multi-million-state
HCLG graphs Kaldi's C++ decoders handle for the reference
(reference kaldi/utils/mkgraph.sh builds them; decoding happens in
external Kaldi C++).  This module keeps only the ACTIVE search frontier
on the device — the top ``max_active`` states, exactly the set the host
decoder's histogram pruning keeps (decode/latgen.py:113-120) — so the
per-frame cost is independent of graph size:

- at pack time every state's out-arcs are bounded to ``de`` emitting +
  ``dz`` epsilon arcs by splitting fat states into balanced trees of
  zero-weight-epsilon-linked virtual states (a unigram backoff state
  with 2000 word arcs becomes ~130 virtual leaves behind a 2-level
  epsilon tree, resolved by the normal closure loop);
- the per-frame emit step is one GATHER of the frontier states' padded
  arc rows ([K, de] candidates), not a sweep of all arcs;
- candidate dedup + pruning is a multi-key ``lax.sort`` by (dst, score,
  age, arc) followed by ``lax.top_k`` — no scatter anywhere, only
  gather/sort/top_k, the primitives XLA maps well onto the TPU's
  sort/compare units (scatters serialize on TPU and were the dense
  path's bottleneck);
- epsilon closure is the same gather+sort+top_k round iterated to
  fixpoint (strict improvement only, old entries win ties, so it
  terminates like the host's relaxation loop);
- the traceback stores [T, K] (state, winning-arc) pairs per utterance
  — frontier-sized, not graph-sized — and is walked backwards on the
  device by a vmapped while_loop that finds each state in its frame's
  stored frontier.  Any state on the best path is at least as good as
  every state after it on that path, so if the path's end survived the
  top-K cut each ancestor did too; broken walks (top-K boundary ties)
  raise the overflow flag and fall back to the host decoder for that
  utterance, never returning a truncated hypothesis.

Semantics are pinned to decode/latgen.py StreamingLatgen (same emit ->
beam prune -> histogram prune -> epsilon closure order per frame), with
one documented difference: the ``max_active`` cap applies to the stored
frontier AFTER closure as well (the host keeps every within-beam state
post-closure), i.e. the frontier decoder searches with an effectively
tighter histogram prune.  With ``max_active`` at least the number of
live states the outputs match the oracle exactly (tests); when closure
fan-out exceeds the frontier width the outputs genuinely diverge — the
frontier returns a well-formed but worse-scoring hypothesis, with no
overflow flag (tests/test_frontier_latgen.py::
test_post_closure_cap_divergence_from_host pins a binding case), so
production configs with tight ``max_active`` on epsilon-heavy graphs
should either raise ``frontier_width`` or route through the host path.

Scores are float32 on-device (the host oracle is float64), like the
dense decoder.
"""

from __future__ import annotations

import weakref

import numpy as np

from pytorch_kaldi_asr_tpu.fst.core import EPS, Fst

INF32 = np.float32(np.inf)

# epsilon-closure safety cap: real HLG epsilon chains are a handful of
# hops (plus log_dz(fan-out) virtual-tree levels); a frame that fails to
# converge within this many rounds sets the overflow flag and falls back
# to the host decoder
MAX_EPS_ROUNDS = 128


class _FrontierGraph:
    """Degree-bounded padded arc-table view of an Fst.

    States keep at most ``de`` emitting and ``dz`` epsilon out-arcs;
    fatter states are split into virtual states joined by zero-weight
    epsilon arcs (a ``dz``-ary tree over chunked leaves).  Tables are
    padded to ``S + 1`` rows so the frontier's invalid-slot sentinel
    (state id S) gathers an all-dead row.

    Global arc-id convention (what the traceback stores): emitting arc
    ``(s, d)`` has id ``s * de + d``; epsilon arc ``(s, d)`` has id
    ``Ae + s * dz + d`` with ``Ae = (S + 1) * de`` — so an arc id alone
    recovers its source state and labels with integer arithmetic, no
    separate src table.
    """

    def __init__(self, graph: Fst, sym_offset: int, de: int = 16,
                 dz: int = 16):
        if graph.start < 0:
            raise ValueError("decode graph has no start state")
        if de < 1 or dz < 2:
            raise ValueError("need de >= 1 and dz >= 2 to split states")
        S0 = graph.num_states
        emit_rows: list[list] = [None] * S0  # type: ignore[list-item]
        eps_rows: list[list] = [None] * S0  # type: ignore[list-item]

        def new_state():
            emit_rows.append([])
            eps_rows.append([])
            return len(emit_rows) - 1

        for s in range(S0):
            emit = [a for a in graph.arcs[s] if a.ilabel != EPS]
            eps = [a for a in graph.arcs[s] if a.ilabel == EPS]
            if len(emit) <= de and len(eps) <= dz:
                emit_rows[s] = [(a.ilabel - sym_offset, a.ilabel, a.olabel,
                                 a.weight, a.nextstate) for a in emit]
                eps_rows[s] = [(a.olabel, a.weight, a.nextstate)
                               for a in eps]
                continue
            # fat state: all real arcs move to virtual leaves; the state
            # keeps only epsilon links to a dz-ary tree over the leaves
            emit_rows[s] = []
            children = []
            for i in range(0, len(emit), de):
                v = new_state()
                emit_rows[v] = [(a.ilabel - sym_offset, a.ilabel, a.olabel,
                                 a.weight, a.nextstate)
                                for a in emit[i:i + de]]
                children.append(v)
            for i in range(0, len(eps), dz):
                v = new_state()
                eps_rows[v] = [(a.olabel, a.weight, a.nextstate)
                               for a in eps[i:i + dz]]
                children.append(v)
            while len(children) > dz:
                nxt = []
                for i in range(0, len(children), dz):
                    v = new_state()
                    eps_rows[v] = [(EPS, 0.0, c)
                                   for c in children[i:i + dz]]
                    nxt.append(v)
                children = nxt
            eps_rows[s] = [(EPS, 0.0, c) for c in children]

        S = len(emit_rows)
        self.num_states = S
        self.n_virtual = S - S0
        self.start = graph.start
        self.sym_offset = sym_offset
        self.de = de
        self.dz = dz
        self.ae = (S + 1) * de  # epsilon arc-id offset

        # padded [S + 1, de/dz] tables; pad row/slots: dst = S (sentinel),
        # weight = +inf, col = -1
        e_col = np.full((S + 1, de), -1, np.int32)
        e_il = np.zeros((S + 1, de), np.int32)
        e_ol = np.zeros((S + 1, de), np.int32)
        e_dst = np.full((S + 1, de), S, np.int32)
        e_w = np.full((S + 1, de), np.inf, np.float32)
        z_ol = np.zeros((S + 1, dz), np.int32)
        z_dst = np.full((S + 1, dz), S, np.int32)
        z_w = np.full((S + 1, dz), np.inf, np.float32)
        n_eps = 0
        for s in range(S):
            for d, (col, il, ol, w, dst) in enumerate(emit_rows[s]):
                e_col[s, d] = col
                e_il[s, d] = il
                e_ol[s, d] = ol
                e_dst[s, d] = dst
                e_w[s, d] = w
            for d, (ol, w, dst) in enumerate(eps_rows[s]):
                z_ol[s, d] = ol
                z_dst[s, d] = dst
                z_w[s, d] = w
                n_eps += 1
        self.has_eps = n_eps > 0
        self.e_col, self.e_il, self.e_ol = e_col, e_il, e_ol
        self.e_dst, self.e_w = e_dst, e_w
        self.z_ol, self.z_dst, self.z_w = z_ol, z_dst, z_w

        finals = np.full(S + 1, np.inf, np.float32)
        for s, fw in graph.final.items():
            finals[s] = fw
        self.finals = finals

        # start-state epsilon closure over the SPLIT graph (so back
        # pointers are valid split-table arc ids), float64 like the host
        scores0 = np.full(S + 1, np.inf)
        back0 = np.full(S + 1, -1, np.int32)
        scores0[graph.start] = 0.0
        stack = [graph.start]
        while stack:
            s = stack.pop()
            base = scores0[s]
            for d in range(dz):
                if not np.isfinite(z_w[s, d]):
                    continue
                nc = base + z_w[s, d]
                dst = int(z_dst[s, d])
                if nc < scores0[dst]:
                    scores0[dst] = nc
                    back0[dst] = self.ae + s * dz + d
                    stack.append(dst)
        self.scores0 = scores0.astype(np.float32)
        self.back_init = back0


def _graph_fingerprint(graph: Fst):
    return (graph.start, graph.num_states, graph.num_arcs,
            tuple(sorted(graph.final.items())))


_PACKED: "weakref.WeakKeyDictionary[Fst, tuple]" = weakref.WeakKeyDictionary()


def _packed(graph: Fst, sym_offset: int, de: int, dz: int):
    key = (_graph_fingerprint(graph), sym_offset, de, dz)
    ent = _PACKED.get(graph)
    if ent is None or ent[0] != key:
        ent = (key, _FrontierGraph(graph, sym_offset, de, dz))
        _PACKED[graph] = ent
    return ent[1]


def _build_decode_fn(shapes, n_words_cap, has_eps):
    """Compiled frontier Viterbi over fixed (B, T, P, K, ma, de, dz, S)
    shapes; graph tables ride as traced operands so one compilation
    serves every graph of identical padded shape.

    ``K`` is the structural frontier width; ``ma`` is the host
    decoder's histogram-prune cap, applied to the emit candidates only
    (keeping score ties at the cut, latgen.py:116-119) — closure results
    then fill the remaining K - ma slack like the host's uncapped
    post-closure token set."""
    import jax
    import jax.numpy as jnp

    B, T, P, K, ma, de, dz, S = shapes
    Lw = n_words_cap
    Ae = (S + 1) * de
    NEG_SENT = jnp.int32(-2)  # stored-frontier id for dead slots

    def dedup_topk(dst, sc, age, arc):
        """Keep the best (lowest-score) entry per destination state and
        return the K best surviving entries.  ``age`` breaks score ties
        in favour of older entries (0 = carried over, 1 = new candidate)
        so epsilon relaxation only counts STRICT improvements; ``arc``
        breaks remaining ties by lowest arc id like the host oracle."""
        d, s, g, a = jax.lax.sort((dst, sc, age, arc), num_keys=4)
        dup = jnp.concatenate([jnp.zeros(1, bool), d[1:] == d[:-1]])
        s = jnp.where(dup | (d == S), INF32, s)
        top_sc, idx = jax.lax.top_k(-s, K)
        fr_sc = -top_sc
        ok = jnp.isfinite(fr_sc)
        fr_s = jnp.where(ok, d[idx], S)
        fr_arc = jnp.where(ok, a[idx], -1)
        fr_age = jnp.where(ok, g[idx], 0)
        return fr_s, fr_sc, fr_arc, fr_age

    def decode_one(e_col, e_il, e_ol, e_dst, e_w, z_ol, z_dst, z_w,
                   finals, init_states, init_scores, back_init,
                   posts, length, acoustic_scale, beam):
        # posts: [T, P]; frontier: states [K] (S = dead), scores [K]
        slot_e = jnp.arange(de, dtype=jnp.int32)[None, :]
        slot_z = jnp.arange(dz, dtype=jnp.int32)[None, :]
        zeros_k = jnp.zeros(K, jnp.int32)
        ones_kz = jnp.ones(K * dz, jnp.int32)

        def eps_close(fr_s, fr_sc, fr_arc, overflow):
            if not has_eps:
                return fr_s, fr_sc, fr_arc, overflow

            def cond(c):
                return c[3] & (c[4] < MAX_EPS_ROUNDS)

            def body(c):
                s_, sc_, arc_, _, it = c
                c_sc = (sc_[:, None] + z_w[s_]).reshape(-1)
                c_dst = z_dst[s_].reshape(-1)
                c_arc = (Ae + s_[:, None] * dz + slot_z).reshape(-1)
                all_dst = jnp.concatenate([s_, c_dst])
                all_sc = jnp.concatenate([sc_, c_sc])
                all_age = jnp.concatenate([zeros_k, ones_kz])
                all_arc = jnp.concatenate([arc_, c_arc])
                n_s, n_sc, n_arc, n_age = dedup_topk(
                    all_dst, all_sc, all_age, all_arc)
                return n_s, n_sc, n_arc, jnp.any(n_age > 0), it + 1

            fr_s, fr_sc, fr_arc, improved, it = jax.lax.while_loop(
                cond, body,
                (fr_s, fr_sc, fr_arc, jnp.bool_(True), jnp.int32(0)))
            return fr_s, fr_sc, fr_arc, overflow | (it >= MAX_EPS_ROUNDS)

        def step(carry, inputs):
            fr_s, fr_sc, ovf = carry
            post_t, t = inputs  # [P], scalar
            cols = e_col[fr_s]  # [K, de]
            ok = (cols >= 0) & (cols < P)
            ac = jnp.where(
                ok,
                -acoustic_scale * post_t[jnp.clip(cols, 0, P - 1)],
                INF32)
            cand_sc = (fr_sc[:, None] + e_w[fr_s] + ac).reshape(-1)
            cand_dst = e_dst[fr_s].reshape(-1)
            cand_arc = (fr_s[:, None] * de + slot_e).reshape(-1)
            best = jnp.min(cand_sc)
            cand_sc = jnp.where(cand_sc <= best + beam, cand_sc, INF32)
            n_s, n_sc, n_arc, _ = dedup_topk(
                cand_dst, cand_sc, jnp.zeros(K * de, jnp.int32), cand_arc)
            if ma < K:
                # histogram prune at the kth-best DISTINCT state's score,
                # keeping ties (n_sc is ascending after top_k)
                cut = n_sc[ma - 1]
                dead = n_sc > cut
                n_sc = jnp.where(dead, INF32, n_sc)
                n_s = jnp.where(dead, S, n_s)
                n_arc = jnp.where(dead, -1, n_arc)
            n_s, n_sc, n_arc, n_ovf = eps_close(n_s, n_sc, n_arc, ovf)
            live = t < length
            out_s = jnp.where(live, n_s, S)
            out_sc = jnp.where(live, n_sc, INF32)
            out_arc = jnp.where(live, n_arc, -1)
            carry_s = jnp.where(live, n_s, fr_s)
            carry_sc = jnp.where(live, n_sc, fr_sc)
            store_s = jnp.where(out_arc >= 0, out_s, NEG_SENT)
            return ((carry_s, carry_sc, jnp.where(live, n_ovf, ovf)),
                    (store_s, out_arc, out_s, out_sc))

        posts_seq = (posts, jnp.arange(T, dtype=jnp.int32))
        (fr_s, fr_sc, ovf), (tb_s, tb_arc, _, _) = jax.lax.scan(
            step, (init_states, init_scores, jnp.bool_(False)), posts_seq)

        total = fr_sc + finals[fr_s]
        k_best = jnp.argmin(total)
        best_cost = total[k_best]
        end_state = fr_s[k_best]

        cap = jnp.int32((T + 2) * (MAX_EPS_ROUNDS + de + dz + K))

        def backtrace(t0, s0):
            words = jnp.zeros(Lw, jnp.int32)
            phones = jnp.zeros(max(T, 1), jnp.int32)

            def cond(c):
                return (~c[5]) & (c[6] < cap) & (~c[7])

            def body(c):
                t, s, wi, wd, ph, done, it, bad = c
                tc = jnp.maximum(t, 0)
                in_frame = t >= 0
                hit = tb_s[tc] == s
                k = jnp.argmax(hit)
                found = jnp.any(hit)
                a = jnp.where(in_frame,
                              jnp.where(found, tb_arc[tc, k], -1),
                              back_init[s])
                bad = bad | (in_frame & ~found)
                done_now = a < 0
                act = ~done_now & ~bad
                emit = act & (a < Ae)
                ids = jnp.maximum(a, 0)
                e_s, e_d = ids // de, ids % de
                z_ids = jnp.maximum(a - Ae, 0)
                z_s, z_d = z_ids // dz, z_ids % dz
                ol = jnp.where(emit, e_ol[e_s, e_d], z_ol[z_s, z_d])
                src = jnp.where(emit, e_s, z_s)
                rec_w = act & (ol != EPS)
                bad = bad | (rec_w & (wi >= Lw))
                widx = jnp.clip(Lw - 1 - wi, 0, Lw - 1)
                wd = wd.at[widx].set(jnp.where(rec_w, ol, wd[widx]))
                wi = wi + rec_w.astype(jnp.int32)
                rec_p = emit & in_frame
                ph = ph.at[tc].set(
                    jnp.where(rec_p, e_il[e_s, e_d], ph[tc]))
                s2 = jnp.where(act, src, s)
                t2 = jnp.where(emit, t - 1, t)
                return (t2, s2, wi, wd, ph, done | done_now, it + 1, bad)

            c = (jnp.asarray(t0, jnp.int32), s0, jnp.int32(0), words,
                 phones, jnp.bool_(False), jnp.int32(0), jnp.bool_(False))
            t, s, wi, wd, ph, done, it, bad = jax.lax.while_loop(
                cond, body, c)
            return wd, wi, ph, bad | (~done)

        wd, wi, ph, bad = backtrace(length - 1, end_state)
        return best_cost, wd, wi, ph, ovf | bad

    def decode(e_col, e_il, e_ol, e_dst, e_w, z_ol, z_dst, z_w, finals,
               init_states, init_scores, back_init, log_posts, lengths,
               acoustic_scale, beam):
        return jax.vmap(
            decode_one,
            in_axes=(None,) * 12 + (0, 0, None, None))(
                e_col, e_il, e_ol, e_dst, e_w, z_ol, z_dst, z_w, finals,
                init_states, init_scores, back_init, log_posts, lengths,
                acoustic_scale, beam)

    return jax.jit(decode)


_DECODE_FNS: dict = {}


class FrontierLatgen:
    """Batched on-device top-K frontier Viterbi decoder.

    Same knobs and output contract as :class:`DeviceLatgen`
    (decode/device_latgen.py): ``decode_batch`` consumes a PADDED
    [B, T, P] log-posterior batch plus per-utterance frame counts and
    returns a list of (word_ids, phone_frames, total_cost) or None per
    utterance.  ``max_active`` doubles as the frontier width K.
    ``de``/``dz`` bound per-state out-degree (fatter states are split;
    see :class:`_FrontierGraph`).
    """

    def __init__(self, graph: Fst, *, acoustic_scale=1.0, beam=16.0,
                 max_active=2000, log_priors=None, sym_offset=1,
                 words_cap=None, de=16, dz=16, frontier_width=None):
        self.graph = graph
        self.packed = _packed(graph, sym_offset, de, dz)
        self.frontier_width = frontier_width
        self.acoustic_scale = float(acoustic_scale)
        self.beam = float(beam)
        self.max_active = int(max_active)
        self.log_priors = (None if log_priors is None
                           else np.asarray(log_priors, np.float32))
        self.sym_offset = sym_offset
        self.words_cap = words_cap

    def decode_batch(self, log_posts, lengths=None):
        import jax.numpy as jnp

        g = self.packed
        posts = np.asarray(log_posts, np.float32)
        single = posts.ndim == 2
        if single:
            posts = posts[None]
        B, T, P = posts.shape
        if lengths is None:
            lengths = np.full(B, T, np.int32)
        lengths = np.asarray(lengths, np.int32)
        posts_raw = posts
        if self.log_priors is not None:
            if posts.shape[2] != len(self.log_priors):
                raise ValueError(
                    f"posterior width {posts.shape[2]} != priors length "
                    f"{len(self.log_priors)}")
            posts = posts - self.log_priors[None, None, :]

        S = g.num_states
        ma = self.max_active if 0 < self.max_active < S else S
        # frontier slack past max_active holds histogram-prune score
        # ties and epsilon-closure results (the host keeps both
        # uncapped); 2x matches the host on every pinned fixture
        K = self.frontier_width or min(S, max(2 * ma, 64))
        ma = min(ma, K)
        Lw = self.words_cap or (2 * T + 16)
        shapes = (B, T, P, K, ma, g.de, g.dz, S)
        key = (shapes, Lw, g.has_eps)
        fn = _DECODE_FNS.get(key)
        if fn is None:
            fn = _DECODE_FNS[key] = _build_decode_fn(shapes, Lw, g.has_eps)

        # initial frontier: K best start-closure states (host, once per
        # graph — cached on the packed graph keyed by K)
        init = getattr(g, "_init_frontier", None)
        if init is None or init[0] != K:
            order = np.argsort(g.scores0[:S], kind="stable")[:K]
            is_ = np.full(K, S, np.int32)
            isc = np.full(K, np.inf, np.float32)
            fin = np.isfinite(g.scores0[order])
            is_[:order.size] = np.where(fin, order, S).astype(np.int32)
            isc[:order.size] = np.where(fin, g.scores0[order], np.inf)
            init = (K, is_, isc)
            g._init_frontier = init
        _, init_states, init_scores = init

        cost, words, n_words, phones, overflow = fn(
            g.e_col, g.e_il, g.e_ol, g.e_dst, g.e_w,
            g.z_ol, g.z_dst, g.z_w, g.finals,
            init_states, init_scores, g.back_init,
            jnp.asarray(posts), jnp.asarray(lengths),
            np.float32(self.acoustic_scale), np.float32(self.beam))
        cost = np.asarray(cost)
        words = np.asarray(words)
        n_words = np.asarray(n_words)
        phones = np.asarray(phones)
        overflow = np.asarray(overflow)
        out = []
        for b in range(B):
            # overflow first: an overflowed search's dead beam is not
            # trustworthy — the host fallback may still find a path
            if overflow[b]:
                # traceback overflow / broken frontier walk: host
                # fallback for this utterance, never a truncated result
                from pytorch_kaldi_asr_tpu.decode.latgen import latgen

                out.append(latgen(
                    self.graph,
                    posts_raw[b, :lengths[b]].astype(np.float64),
                    acoustic_scale=self.acoustic_scale, beam=self.beam,
                    max_active=self.max_active,
                    log_priors=self.log_priors,
                    sym_offset=self.sym_offset))
                continue
            if not np.isfinite(cost[b]):
                out.append(None)
                continue
            n = int(n_words[b])
            w = words[b, len(words[b]) - n:].tolist() if n else []
            ph = phones[b, :lengths[b]].tolist()
            out.append((w, ph, float(cost[b])))
        return out[0] if single else out


def frontier_latgen(graph: Fst, log_posts, lengths=None, **kw):
    """One-shot batched frontier decode; see :class:`FrontierLatgen`."""
    return FrontierLatgen(graph, **kw).decode_batch(log_posts, lengths)
