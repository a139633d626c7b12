"""Batched ON-DEVICE WFST Viterbi search (XLA/TPU graph decoding).

The host decoders (decode/latgen.py Python oracle, native/src/latgen.cc)
walk the graph one token at a time on the CPU; this module runs the same
frame-synchronous Viterbi recursion as dense XLA ops so a whole BATCH of
utterances is decoded on the accelerator, next to the acoustic model that
produced the posteriors — no per-utterance device->host posterior
transfer, no host search loop.  This is the TPU-native realization of the
GPU WFST decoders of Chen et al. (arXiv:1804.03243) and NVIDIA's batched
Viterbi decoder (arXiv:1910.10032), which play exactly the role Kaldi's
C++ decoder binaries play for the reference (reference kaldi/utils/
mkgraph.sh builds the graph; decoding happens in external Kaldi C++).

Algorithm (semantics pinned to decode/latgen.py StreamingLatgen):

- the graph's arcs are packed into dense arrays, split into EMITTING
  (ilabel != eps) and EPSILON arc tables;
- per frame, the emit step is one gather + segment-min over the emitting
  arc table: ``cand[a] = scores[src[a]] + w[a] + acoustic(t, il[a])``,
  reduced to per-state minima with ``jax.ops.segment_min`` (argmin
  recovered by an equality + segment-min-over-arc-ids second pass);
- beam pruning masks states above ``best + beam`` to +inf; histogram
  (max_active) pruning masks states above the k-th smallest cost — both
  identical in effect to the host decoder's dict pruning;
- epsilon closure is a Bellman-Ford relaxation ``lax.while_loop`` over
  the epsilon arc table, run to fixpoint (strict improvement only, so it
  terminates for any graph without negative epsilon cycles);
- per-frame winning-arc ids are stacked by ``lax.scan`` and a vmapped
  ``lax.while_loop`` walks them BACKWARDS on the device, so only the
  [B, O(T)] label buffers ever reach the host.

Scores are float32 on-device (the host oracle is float64): total costs
agree to ~1e-3 over 500 frames and word outputs match wherever the
best path is not a numerical tie.  The argmin tie-break (lowest arc id)
is deterministic.

Memory: the traceback tensor is [T, S, B] int32 — cap ``graph states x
frames x batch`` to the chip's HBM (4k states x 500 frames x batch 8 =
64 MB).
"""

from __future__ import annotations

import weakref

import numpy as np

from pytorch_kaldi_asr_tpu.fst.core import EPS, Fst

INF32 = np.float32(np.inf)


class _PackedGraph:
    """Dense arc-table view of an Fst plus the start state's host-side
    epsilon closure (computed once, in float64)."""

    def __init__(self, graph: Fst, sym_offset: int):
        if graph.start < 0:
            raise ValueError("decode graph has no start state")
        S = graph.num_states
        e_src, e_dst, e_col, e_il, e_ol, e_w = [], [], [], [], [], []
        z_src, z_dst, z_ol, z_w = [], [], [], []
        for s in range(S):
            for a in graph.arcs[s]:
                if a.ilabel == EPS:
                    z_src.append(s)
                    z_dst.append(a.nextstate)
                    z_ol.append(a.olabel)
                    z_w.append(a.weight)
                else:
                    e_src.append(s)
                    e_dst.append(a.nextstate)
                    e_col.append(a.ilabel - sym_offset)
                    e_il.append(a.ilabel)
                    e_ol.append(a.olabel)
                    e_w.append(a.weight)
        self.num_states = S
        self.start = graph.start
        self.sym_offset = sym_offset
        self.e_src = np.asarray(e_src, np.int32)
        self.e_dst = np.asarray(e_dst, np.int32)
        self.e_col = np.asarray(e_col, np.int32)
        self.e_il = np.asarray(e_il, np.int32)
        self.e_ol = np.asarray(e_ol, np.int32)
        self.e_w = np.asarray(e_w, np.float32)
        self.z_src = np.asarray(z_src, np.int32)
        self.z_dst = np.asarray(z_dst, np.int32)
        self.z_ol = np.asarray(z_ol, np.int32)
        self.z_w = np.asarray(z_w, np.float32)
        finals = np.full(S, np.inf, np.float32)
        for s, fw in graph.final.items():
            finals[s] = fw
        self.finals = finals
        # start-state epsilon closure with back pointers (global arc ids
        # offset past the emitting table), float64 like the host oracle
        scores0 = np.full(S, np.inf)
        back0 = np.full(S, -1, np.int32)
        scores0[graph.start] = 0.0
        n_e = len(self.e_src)
        stack = [graph.start]
        while stack:
            s = stack.pop()
            base = scores0[s]
            for zi in np.nonzero(self.z_src == s)[0]:
                nc = base + self.z_w[zi]
                d = int(self.z_dst[zi])
                if nc < scores0[d]:
                    scores0[d] = nc
                    back0[d] = n_e + zi
                    stack.append(d)
        self.scores0 = scores0.astype(np.float32)
        self.back_init = back0


def _graph_fingerprint(graph: Fst):
    return (graph.start, graph.num_states, graph.num_arcs,
            tuple(sorted(graph.final.items())))


_PACKED: "weakref.WeakKeyDictionary[Fst, tuple]" = weakref.WeakKeyDictionary()


def _packed(graph: Fst, sym_offset: int):
    key = (_graph_fingerprint(graph), sym_offset)
    ent = _PACKED.get(graph)
    if ent is None or ent[0] != key:
        ent = (key, _PackedGraph(graph, sym_offset))
        _PACKED[graph] = ent
    return ent[1]


def _build_decode_fn(shapes, max_active, n_words_cap):
    """Compiled Viterbi over fixed (B, T, P, Ae, Az, S) shapes; graph
    arrays ride as traced args so one compilation serves every graph of
    identical arc-table shape."""
    import jax
    import jax.numpy as jnp

    B, T, P, Ae, Az, S = shapes
    Lw = n_words_cap

    def decode(e_src, e_dst, e_col, e_il, e_ol, e_w,
               z_src, z_dst, z_ol, z_w, finals, scores0, back_init,
               log_posts, lengths, acoustic_scale, beam):
        # scores laid out [S, B]: segment reductions run over the leading
        # (arc -> state) axis with the batch riding along
        postsT = jnp.transpose(log_posts, (1, 2, 0))  # [T, P, B]
        col_ok = (e_col >= 0) & (e_col < P)
        e_colc = jnp.clip(e_col, 0, P - 1)
        arc_ids_e = jnp.arange(Ae, dtype=jnp.int32)
        arc_ids_z = jnp.arange(Az, dtype=jnp.int32)
        BIG = jnp.int32(Ae + Az + 1)

        def seg_min_arg(cand, dst, ids, n):
            m = jax.ops.segment_min(cand, dst, num_segments=n)
            is_min = cand == m[dst]
            arg = jax.ops.segment_min(
                jnp.where(is_min, ids[:, None], BIG), dst, num_segments=n)
            return m, jnp.where(jnp.isfinite(m), arg, -1)

        def eps_relax(scores, back):
            if Az == 0:
                return scores, back

            def cond(c):
                return c[2]

            def body(c):
                sc, bk, _ = c
                cand = sc[z_src] + z_w[:, None]
                m, arg = seg_min_arg(cand, z_dst, arc_ids_z, S)
                better = m < sc
                sc2 = jnp.where(better, m, sc)
                bk2 = jnp.where(better & (arg >= 0), arg + Ae, bk)
                return sc2, bk2, jnp.any(better)

            scores, back, _ = jax.lax.while_loop(
                cond, body, (scores, back, jnp.bool_(True)))
            return scores, back

        def step(scores, inputs):
            post_t, t = inputs  # [P, B], scalar
            ac = -acoustic_scale * post_t[e_colc]          # [Ae, B]
            cand = (scores[e_src] + e_w[:, None]
                    + jnp.where(col_ok[:, None], ac, INF32))
            new_sc, back = seg_min_arg(cand, e_dst, arc_ids_e, S)
            # beam prune (host prunes after the emit step, before closure)
            best = jnp.min(new_sc, axis=0)
            new_sc = jnp.where(new_sc <= best[None, :] + beam, new_sc,
                               INF32)
            if 0 < max_active < S:
                kth = -jax.lax.top_k(-new_sc.T, max_active)[0][:, -1]
                new_sc = jnp.where(new_sc <= kth[None, :], new_sc, INF32)
            new_sc, back = eps_relax(new_sc, back)
            live = t < lengths  # [B]
            new_sc = jnp.where(live[None, :], new_sc, scores)
            back = jnp.where(live[None, :], back, -1)
            return new_sc, back

        init = jnp.broadcast_to(scores0[:, None], (S, B))
        posts_seq = (postsT, jnp.arange(T, dtype=jnp.int32))
        scores, back_arcs = jax.lax.scan(step, init, posts_seq)  # [T,S,B]

        total = scores + finals[:, None]
        best_cost = jnp.min(total, axis=0)                    # [B]
        end_state = jnp.argmin(total, axis=0).astype(jnp.int32)

        cap = (T + 2) * (S + 1)

        def backtrace(ba, t0, s0):
            # ba: [T, S] this utterance's per-frame winning arc ids
            words = jnp.zeros(Lw, jnp.int32)
            phones = jnp.zeros(T, jnp.int32)

            def cond(c):
                return (~c[5]) & (c[6] < cap)

            def body(c):
                t, s, wi, wd, ph, done, it, ovf = c
                tc = jnp.maximum(t, 0)
                a = jnp.where(t >= 0, ba[tc, s], back_init[s])
                done_now = a < 0
                act = ~done_now
                emit = act & (a < Ae)
                ae = jnp.clip(a, 0, max(Ae - 1, 0))
                az = jnp.clip(a - Ae, 0, max(Az - 1, 0))
                if Ae > 0 and Az > 0:
                    ol = jnp.where(emit, e_ol[ae], z_ol[az])
                    src = jnp.where(emit, e_src[ae], z_src[az])
                elif Ae > 0:
                    ol, src = e_ol[ae], e_src[ae]
                else:
                    ol, src = z_ol[az], z_src[az]
                rec_w = act & (ol != EPS)
                ovf = ovf | (rec_w & (wi >= Lw))
                widx = jnp.clip(Lw - 1 - wi, 0, Lw - 1)
                wd = wd.at[widx].set(jnp.where(rec_w, ol, wd[widx]))
                wi = wi + rec_w.astype(jnp.int32)
                if Ae > 0:
                    il = e_il[ae]
                    rec_p = emit & (t >= 0)
                    ph = ph.at[tc].set(jnp.where(rec_p, il, ph[tc]))
                s2 = jnp.where(act, src, s)
                t2 = jnp.where(emit, t - 1, t)
                return (t2, s2, wi, wd, ph, done | done_now, it + 1, ovf)

            t0 = jnp.asarray(t0, jnp.int32)
            c = (t0, s0, jnp.int32(0), words, phones,
                 jnp.bool_(False), jnp.int32(0), jnp.bool_(False))
            t, s, wi, wd, ph, done, _, ovf = jax.lax.while_loop(
                cond, body, c)
            return wd, wi, ph, ovf | (~done)

        ba_b = jnp.transpose(back_arcs, (2, 0, 1))  # [B, T, S]
        words, n_words, phones, overflow = jax.vmap(backtrace)(
            ba_b, lengths - 1, end_state)
        return best_cost, words, n_words, phones, overflow

    return jax.jit(decode, static_argnames=())


_DECODE_FNS: dict = {}


class DeviceLatgen:
    """Batched on-device Viterbi decoder over a compiled (H)LG graph.

    Same knobs and conventions as :func:`decode.latgen.latgen`
    (acoustic_scale / beam / max_active / log_priors / sym_offset; input
    label i reads posterior column i - sym_offset).  ``decode_batch``
    consumes a PADDED [B, T, P] posterior batch plus per-utterance frame
    counts and returns a list of (word_ids, phone_frames, total_cost) or
    None per utterance — the host decoders' exact output contract.
    """

    def __init__(self, graph: Fst, *, acoustic_scale=1.0, beam=16.0,
                 max_active=2000, log_priors=None, sym_offset=1,
                 words_cap=None):
        self.graph = graph
        self.packed = _packed(graph, sym_offset)
        self.acoustic_scale = float(acoustic_scale)
        self.beam = float(beam)
        self.max_active = int(max_active)
        self.log_priors = (None if log_priors is None
                           else np.asarray(log_priors, np.float32))
        self.sym_offset = sym_offset
        self.words_cap = words_cap

    def decode_batch(self, log_posts, lengths=None):
        """log_posts: [B, T, P] (or [T, P] for a single utterance) log
        p(phone | frame), zero-padded past each utterance's length."""
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
        Lw = self.words_cap or (2 * T + 16)
        shapes = (B, T, P, len(g.e_src), len(g.z_src), g.num_states)
        key = (shapes, self.max_active, Lw)
        fn = _DECODE_FNS.get(key)
        if fn is None:
            fn = _DECODE_FNS[key] = _build_decode_fn(
                shapes, self.max_active, Lw)
        cost, words, n_words, phones, overflow = fn(
            g.e_src, g.e_dst, g.e_col, g.e_il, g.e_ol, g.e_w,
            g.z_src, g.z_dst, g.z_ol, g.z_w, g.finals, g.scores0,
            g.back_init, jnp.asarray(posts), jnp.asarray(lengths),
            np.float32(self.acoustic_scale), np.float32(self.beam))
        cost = np.asarray(cost)
        words = np.asarray(words)
        n_words = np.asarray(n_words)
        phones = np.asarray(phones)
        overflow = np.asarray(overflow)
        out = []
        for b in range(B):
            if not np.isfinite(cost[b]):
                out.append(None)
                continue
            if overflow[b]:
                # traceback buffer overflow (words_cap too small) or a
                # non-converged walk: fall back to the host decoder for
                # this utterance — never return a truncated hypothesis
                from pytorch_kaldi_asr_tpu.decode.latgen import latgen

                out.append(latgen(
                    self.graph,
                    posts_raw[b, :lengths[b]].astype(np.float64),
                    acoustic_scale=self.acoustic_scale, beam=self.beam,
                    max_active=self.max_active,
                    log_priors=self.log_priors,
                    sym_offset=self.sym_offset))
                continue
            n = int(n_words[b])
            w = words[b, len(words[b]) - n:].tolist() if n else []
            ph = phones[b, :lengths[b]].tolist()
            out.append((w, ph, float(cost[b])))
        return out[0] if single else out


def device_latgen(graph: Fst, log_posts, lengths=None, **kw):
    """One-shot batched decode; see :class:`DeviceLatgen`."""
    return DeviceLatgen(graph, **kw).decode_batch(log_posts, lengths)


# dense-path comfort zone: past either bound the [T, S, B] traceback and
# the per-frame full-arc-table scatter stop paying for themselves and the
# top-K frontier decoder (decode/frontier_latgen.py) takes over
DENSE_MAX_STATES = 8192
DENSE_MAX_ARCS = 65536


def make_device_latgen(graph: Fst, *, mode="auto", **kw):
    """Build the right on-device decoder for ``graph``.

    ``mode``: ``"dense"`` (this module's full-state-table decoder),
    ``"frontier"`` (decode/frontier_latgen.py top-K decoder), or
    ``"auto"`` — dense inside its comfort zone (its per-frame cost is
    graph-sized but it avoids the frontier's per-frame sorts), frontier
    beyond it.  Env ``PKA_DEVICE_SEARCH_MODE`` overrides ``"auto"``.
    Both classes share the decode_batch contract.
    """
    import os

    if mode == "auto":
        mode = os.environ.get("PKA_DEVICE_SEARCH_MODE", "auto")
    if mode == "auto":
        mode = ("frontier"
                if (graph.num_states > DENSE_MAX_STATES
                    or graph.num_arcs > DENSE_MAX_ARCS)
                else "dense")
    if mode == "frontier":
        from pytorch_kaldi_asr_tpu.decode.frontier_latgen import (
            FrontierLatgen,
        )

        return FrontierLatgen(graph, **kw)
    if mode != "dense":
        raise ValueError(f"unknown device-search mode {mode!r}")
    kw.pop("frontier_width", None)
    return DeviceLatgen(graph, **kw)


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def decode_posterior_stream(graph: Fst, post_iter, word_syms, *,
                            batch_size=8, pad_multiple=64,
                            acoustic_scale=1.0, beam=16.0, max_active=2000,
                            log_priors=None, sym_offset=1, mode="auto"):
    """Batched on-device twin of decode.latgen.decode_posterior_ark:
    consume a (key, log_posterior_matrix) stream, decode ``batch_size``
    utterances per device dispatch, and yield (key, word_string, cost) in
    input order.  Frame counts are padded to ``pad_multiple`` (and the
    last ragged batch to the full ``batch_size``) so the number of
    compiled shapes stays bounded.  ``mode`` picks the dense or frontier
    device decoder (see :func:`make_device_latgen`)."""
    id2word = {v: k for k, v in word_syms.items()}
    dec = make_device_latgen(graph, mode=mode, acoustic_scale=acoustic_scale,
                             beam=beam, max_active=max_active,
                             log_priors=log_priors, sym_offset=sym_offset)

    def flush(buf):
        P = buf[0][1].shape[1]
        lens = [m.shape[0] for _, m in buf]
        T = _round_up(max(lens), pad_multiple)
        n_pad = batch_size - len(buf)
        batch = np.zeros((batch_size, T, P), np.float32)
        for b, (_, mat) in enumerate(buf):
            batch[b, :lens[b]] = mat
        res = dec.decode_batch(batch, np.asarray(lens + [0] * n_pad,
                                                 np.int32))
        for (key, _), r in zip(buf, res):
            if r is None:
                yield key, "", float("inf")
            else:
                word_ids, _, cost = r
                yield key, " ".join(id2word.get(w, "<unk>")
                                    for w in word_ids), cost

    buf = []
    for key, mat in post_iter:
        buf.append((key, np.asarray(mat, np.float32)))
        if len(buf) == batch_size:
            yield from flush(buf)
            buf = []
    if buf:
        yield from flush(buf)
