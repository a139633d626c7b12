"""Sequence (context) parallelism for long-form audio.

The reference manages sequence length algorithmically — banded attention
windows, frame folding, hard length caps (reference Models.py:38-65,
trim_instance_length.py:37-59) — because a single GPU holds the whole
utterance.  On a TPU mesh the banded window (-100, 0) invites the
TPU-native upgrade: shard the TIME axis across chips.  Every op in the
banded encoder is position-local except the attention window, whose reach
is bounded by the band, so each shard only needs a HALO of neighbor
frames: ``-start`` frames from the left shard (and ``end`` from the right
for non-causal bands), moved with one ``jax.lax.ppermute`` per direction
per layer — collectives ride ICI, activations never gather.

Provided:

- :func:`halo_exchange` — pull the halo frames of the left/right
  neighbor shards (zeros at the boundary shards);
- :func:`sp_banded_attention` — windowed self-attention on a time-shard
  with halos, reusing ops.banded_attention_blocked on the concatenated
  [halo_l | local | halo_r] keys (queries left-padded so the band indices
  line up globally);
- :func:`sp_banded_encode` / :func:`sp_conformer_encode` — full encoder
  forwards (models/encoders.py semantics, inference mode) under
  ``shard_map`` with the sequence axis sharded; numerically equal to the
  single-device forward (pinned by tests/test_sequence_parallel.py on an
  8-device CPU mesh).  The Conformer additionally exchanges a
  (kernel-1)//2 halo for its depthwise conv.  The whole construction is
  DIFFERENTIABLE (ppermute has a transpose rule), gradient-pinned equal
  to single-device — SP training works on the dropout-free path.
- :func:`sp_encode` — dispatch by ``cfg.encoder_type``.

TRAINING with dropout: pass ``train=True, rng=key``.  Each shard folds
the mesh position into the key (:func:`per_shard_rng`) and draws an
independent dropout stream at the same sites as the single-device
encoders (models/encoders.py banded_encode / conformer_encode) — input,
attention-prob, post-proj, FFN, and conv-module dropout.  Masks are
applied to a shard's OWN frames before halos are exchanged, so neighbor
shards read post-dropout activations exactly as a single device would;
with ``rng=None`` (or ``train=False``) the path is bit-identical to the
dropout-free forward.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pytorch_kaldi_asr_tpu.models.common import (
    dropout,
    layer_norm,
    position_encoding_table,
)
from pytorch_kaldi_asr_tpu.models.transformer import _Rngs, feed_forward


def per_shard_rng(rng, axis_name):
    """Fold the shard's mesh position into ``rng`` so every time shard
    draws an INDEPENDENT dropout stream (identical keys would apply the
    same mask to every shard's frames — correlated dropout the
    single-device model never sees).  None passes through (no dropout)."""
    if rng is None:
        return None
    return jax.random.fold_in(rng, jax.lax.axis_index(axis_name))


def make_seq_mesh(seq=None, devices=None):
    """1-axis mesh over the time dimension."""
    devices = list(devices if devices is not None else jax.devices())
    seq = seq or len(devices)
    import numpy as np

    return Mesh(np.array(devices[:seq]), axis_names=("seq",))


def halo_exchange(x, halo_l, halo_r, axis_name):
    """Return (left_halo, right_halo) for a [B, S_local, ...] shard:
    the last ``halo_l`` frames of the LEFT neighbor and the first
    ``halo_r`` frames of the RIGHT neighbor (zero-filled at the mesh
    boundary, exactly like the zero-padding a single-device banded mask
    applies past the sequence edge)."""
    n = jax.lax.psum(1, axis_name)
    left = right = None
    if halo_l:
        tail = jax.lax.slice_in_dim(x, x.shape[1] - halo_l, x.shape[1],
                                    axis=1)
        # shard i sends its tail to shard i+1; shard 0 receives zeros
        left = jax.lax.ppermute(tail, axis_name,
                                [(i, i + 1) for i in range(n - 1)])
    if halo_r:
        head = jax.lax.slice_in_dim(x, 0, halo_r, axis=1)
        right = jax.lax.ppermute(head, axis_name,
                                 [(i + 1, i) for i in range(n - 1)])
    return left, right


def _cat_with_halos(x, left, right):
    parts = [p for p in (left, x, right) if p is not None]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


def sp_banded_attention(p, x, valid, cfg, axis_name, *, conformer=False,
                        rate=0.0, rngs=None, train=False):
    """One banded self-attention block on a time shard (post-LN residual).
    ``valid`` is the local [B, S_local] frame mask.  ``conformer=True``
    mirrors _conformer_mhsa's dtype contract: q/k/v/proj computed in
    cfg.compute_dtype, the residual stream kept in
    cfg.conformer_stream_dtype.  ``rngs`` (an ``_Rngs`` built from a
    per-shard key) enables attention-prob + post-proj dropout at the same
    sites as the single-device blocked path (encoders._conformer_mhsa /
    transformer.multi_head_attention)."""
    from pytorch_kaldi_asr_tpu.ops.banded_attention import (
        banded_attention_blocked,
    )

    if rngs is None:
        rngs = _Rngs(None)

    start, end = cfg.encoder_sub_sequence
    halo_l, halo_r = max(0, -start), max(0, end)
    b, sl, d_model = x.shape
    h = p["w_qs"].shape[0]
    if halo_l > sl or halo_r > sl:
        raise ValueError(
            f"band reach ({halo_l}/{halo_r}) exceeds the local shard "
            f"length {sl}: the halo pulls only the immediate neighbor — "
            "use fewer sequence shards (or a narrower band)")

    lx, rx = halo_exchange(x, halo_l, halo_r, axis_name)
    lv, rv = halo_exchange(valid, halo_l, halo_r, axis_name)
    xk = _cat_with_halos(x, lx, rx)                     # [B, hl+Sl+hr, D]
    vk = _cat_with_halos(valid, lv, rv)

    # left-pad queries by halo_l so query row i of the padded sequence has
    # the same global offset as key row i — then the plain aligned band
    # (start, end) is exactly the global band.  Right-pad both to a block
    # multiple for the blocked op.
    block_q = 128 if (halo_l + sl + halo_r) % 128 == 0 else 32
    total = halo_l + sl + halo_r
    pad_to = -(-total // block_q) * block_q
    qp = jnp.pad(x, ((0, 0), (halo_l, pad_to - halo_l - sl), (0, 0)))
    kp = jnp.pad(xk, ((0, 0), (0, pad_to - total), (0, 0)))
    vkp = jnp.pad(vk, ((0, 0), (0, pad_to - total)))

    cdt = cfg.compute_dtype if conformer else qp.dtype
    qs = jnp.einsum("bld,hdk->bhlk", qp.astype(cdt),
                    p["w_qs"].astype(cdt)).reshape(b * h, pad_to, -1)
    ks = jnp.einsum("bld,hdk->bhlk", kp.astype(cdt),
                    p["w_ks"].astype(cdt)).reshape(b * h, pad_to, -1)
    vs = jnp.einsum("bld,hdv->bhlv", kp.astype(cdt),
                    p["w_vs"].astype(cdt)).reshape(b * h, pad_to, -1)
    key_valid = jnp.repeat(vkp.astype(jnp.int32), h, axis=0)
    out = banded_attention_blocked(
        qs, ks, vs, key_valid, start=start, end=end,
        scale=1.0 / float(d_model) ** 0.5, block_q=block_q,
        dropout_rate=rate if train else 0.0, rng=rngs.next(),
    )
    out = out.reshape(b, h, pad_to, -1)[:, :, halo_l:halo_l + sl]
    out = out.transpose(0, 2, 1, 3).reshape(b, sl, -1)
    out = out @ p["proj"]["w"].astype(cdt) + p["proj"]["b"].astype(cdt)
    out = dropout(out, rate, rngs.next(), train)
    out = out + x
    if conformer:
        out = out.astype(cfg.conformer_stream_dtype)
    return layer_norm(out, p["ln"]["gamma"], p["ln"]["beta"],
                      skip_len1=cfg.ln_skip_len1)


def _sp_encode_local(params, cfg, src, mask, *, axis_name, train=False,
                     rng=None):
    """Per-shard banded encoder forward (banded_encode semantics:
    src_proj → +pos (global index) → [attention, ffn] stack → +pos, with
    the same dropout sites when training)."""
    sl = src.shape[1]
    shard = jax.lax.axis_index(axis_name)
    n = jax.lax.psum(1, axis_name)  # static axis size
    # table spans the GLOBAL length so every shard indexes the same
    # closed-form sinusoids banded_encode extrapolates single-device
    table = position_encoding_table(max(cfg.encoder_max_len, sl * n),
                                    cfg.en_d_model)
    gidx = shard * sl + jnp.arange(sl)
    pos = table[gidx]

    x = src.astype(cfg.compute_dtype) @ params["src_proj"]["w"].astype(
        cfg.compute_dtype)
    x = x.astype(jnp.float32) + pos[None]

    rate = cfg.en_dropout if train else 0.0
    rngs = _Rngs(per_shard_rng(rng, axis_name))
    x = dropout(x, rate, rngs.next(), train)
    for layer in params["layers"]:
        x = sp_banded_attention(layer["slf"], x, mask, cfg, axis_name,
                                rate=rate, rngs=rngs, train=train)
        x = feed_forward(layer["ffn"], x, cfg, rate, rngs, train)
    x = x + pos[None]  # trans_pos_enc applied post-stack (Models.py:119)
    x = dropout(x, rate, rngs.next(), train)
    return x


def _shard_map_compat(body, **kw):
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
    try:  # jax >= 0.8 names the replication check differently
        return shard_map(body, check_vma=False, **kw)
    except TypeError:  # pragma: no cover - older jax
        return shard_map(body, check_rep=False, **kw)


@partial(jax.jit,
         static_argnames=("kind", "cfg", "mesh", "seq_axis", "train"))
def _sp_encode_jit(params, src, mask, rng, *, kind, cfg, mesh, seq_axis,
                   train):
    """Jitted shard_map encoder forward, cached per (kind, cfg, mesh,
    train, shapes).  Without the jit every call would dispatch the whole
    stack op-by-op through the multi-device executor and re-trace —
    hundreds of times slower on a CPU mesh, and a retrace per step in any
    caller's loop."""
    local = _LOCAL_BODIES[kind]

    def body(params, src, mask, rng):
        return local(params, cfg, src, mask, axis_name=seq_axis,
                     train=train, rng=rng)

    fn = _shard_map_compat(
        body,
        mesh=mesh,
        in_specs=(P(), P(None, seq_axis, None), P(None, seq_axis), P()),
        out_specs=P(None, seq_axis, None),
    )
    return fn(params, src, mask, rng)


def _sp_shard(kind, params, cfg, mesh, seq_axis, src, mask, train, rng):
    """Shared entry: divisibility check (eager, so it always raises) then
    the cached jitted shard_map forward."""
    n = mesh.shape[seq_axis]
    if src.shape[1] % n != 0:
        raise ValueError(
            f"sequence length {src.shape[1]} not divisible by the "
            f"'{seq_axis}' mesh axis ({n}); pad with mask=0 frames")
    return _sp_encode_jit(params, src, mask, rng, kind=kind, cfg=cfg,
                          mesh=mesh, seq_axis=seq_axis, train=train)


def sp_banded_encode(params, cfg, src, mask, mesh, *, seq_axis="seq",
                     train=False, rng=None):
    """Banded encoder forward with the TIME axis sharded over ``mesh``.

    ``src`` [B, S, D] and ``mask`` [B, S] with S divisible by the mesh's
    ``seq_axis`` size.  Returns the [B, S, d_model] encoder output (same
    sharding).  Differentiable end to end (gradients pinned equal to the
    single-device forward); ``train=True, rng=key`` adds dropout with an
    independent per-shard stream (:func:`per_shard_rng`).  The standard
    recipe training path still shards batch/model axes instead
    (parallel/mesh.py) since recipe utterances fit on one chip."""
    return _sp_shard("banded", params, cfg, mesh, seq_axis, src, mask,
                     train, rng)


# ---------------------------------------------------------------------------
# sequence-parallel Conformer (inference)
# ---------------------------------------------------------------------------


def _sp_conv_module(p, x, valid, cfg, axis_name, rate=0.0, rngs=None,
                    train=False):
    """Conformer conv module on a time shard: everything is position-local
    except the depthwise conv, whose reach is (kernel-1)//2 frames each
    way — exchanged as halos on the GLU output (models/encoders.py
    _conv_module semantics)."""
    if rngs is None:
        rngs = _Rngs(None)
    dtype = cfg.compute_dtype
    h = layer_norm(x, p["ln"]["gamma"], p["ln"]["beta"], skip_len1=False)
    h = h.astype(dtype) @ p["pw1"]["w"].astype(dtype) + p["pw1"]["b"].astype(
        dtype)
    a, bgate = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(bgate)  # GLU
    h = h * valid[..., None].astype(h.dtype)

    kernel = p["dw"]["w"].astype(dtype)  # [K, D]
    k = kernel.shape[0]
    pad_l = (k - 1) // 2
    pad_r = k - 1 - pad_l
    if pad_l > h.shape[1] or pad_r > h.shape[1]:
        raise ValueError(
            f"conv kernel reach ({pad_l}/{pad_r}) exceeds the local shard "
            f"length {h.shape[1]}: the halo pulls only the immediate "
            "neighbor — use fewer sequence shards (or a smaller kernel)")
    lh, rh = halo_exchange(h, pad_l, pad_r, axis_name)
    hk = _cat_with_halos(h, lh, rh)
    # VALID conv over [pad_l | local | pad_r]: output length == local
    # (boundary shards' zero halos reproduce offline SAME zero padding)
    out = jax.lax.conv_general_dilated(
        hk.transpose(0, 2, 1), kernel.T[:, None, :],
        window_strides=(1,), padding=[(0, 0)],
        dimension_numbers=("NCW", "OIW", "NCW"),
        feature_group_count=hk.shape[-1],
    ).transpose(0, 2, 1) + p["dw"]["b"].astype(dtype)
    out = out.astype(cfg.conformer_stream_dtype)
    out = layer_norm(out, p["norm"]["gamma"], p["norm"]["beta"],
                     skip_len1=False)
    out = jax.nn.swish(out)
    out = out.astype(dtype) @ p["pw2"]["w"].astype(dtype) + p["pw2"][
        "b"].astype(dtype)
    out = dropout(out.astype(cfg.conformer_stream_dtype), rate, rngs.next(),
                  train)
    return x + out


def _sp_half_ffn(p, x, cfg, rate=0.0, rngs=None, train=False):
    if rngs is None:
        rngs = _Rngs(None)
    h = layer_norm(x, p["ln"]["gamma"], p["ln"]["beta"], skip_len1=False)
    dtype = cfg.compute_dtype
    h = jax.nn.swish(h.astype(dtype) @ p["w1"]["w"].astype(dtype)
                     + p["w1"]["b"].astype(dtype))
    h = dropout(h, rate, rngs.next(), train)
    h = h @ p["w2"]["w"].astype(dtype) + p["w2"]["b"].astype(dtype)
    h = dropout(h.astype(cfg.conformer_stream_dtype), rate, rngs.next(),
                train)
    return x + 0.5 * h


def _sp_conformer_local(params, cfg, src, mask, *, axis_name, train=False,
                        rng=None):
    sl = src.shape[1]
    shard = jax.lax.axis_index(axis_name)
    n = jax.lax.psum(1, axis_name)  # static axis size
    table = position_encoding_table(max(cfg.encoder_max_len, sl * n),
                                    cfg.en_d_model)
    gidx = shard * sl + jnp.arange(sl)
    dtype = cfg.compute_dtype
    sd = cfg.conformer_stream_dtype

    x = src.astype(dtype) @ params["src_proj"]["w"].astype(dtype)
    x = x.astype(sd) + table[gidx][None].astype(sd)
    rate = cfg.en_dropout if train else 0.0
    rngs = _Rngs(per_shard_rng(rng, axis_name))
    x = dropout(x, rate, rngs.next(), train)
    for layer in params["layers"]:
        # fresh per-layer splitter, mirroring conformer_encode's layer_fwd
        lrngs = _Rngs(rngs.next())
        x = _sp_half_ffn(layer["ffn1"], x, cfg, rate, lrngs, train)
        x = sp_banded_attention(layer["mhsa"], x, mask, cfg, axis_name,
                                conformer=True, rate=rate, rngs=lrngs,
                                train=train)
        x = _sp_conv_module(layer["conv"], x, mask, cfg, axis_name, rate,
                            lrngs, train)
        x = _sp_half_ffn(layer["ffn2"], x, cfg, rate, lrngs, train)
    return x


def sp_conformer_encode(params, cfg, src, mask, mesh, *, seq_axis="seq",
                        train=False, rng=None):
    """Conformer encoder forward with the TIME axis sharded.  Halo reach
    per layer: the attention band plus (kernel-1)//2 for the depthwise
    conv — both bounded, so collectives stay neighbor-only.  ``train=True,
    rng=key`` adds dropout with independent per-shard streams."""
    return _sp_shard("conformer", params, cfg, mesh, seq_axis, src, mask,
                     train, rng)


_LOCAL_BODIES = {
    "banded": _sp_encode_local,
    "conformer": _sp_conformer_local,
}


SP_ENCODERS = {
    "banded": sp_banded_encode,
    "conformer": sp_conformer_encode,
}


def sp_encode(params, cfg, src, mask, mesh, *, seq_axis="seq", train=False,
              rng=None):
    """Sequence-parallel encoder forward dispatched by cfg.encoder_type
    (banded and conformer support time sharding; the FIR-style tdnn/tdnnf
    encoders stream instead — models/streaming.py)."""
    try:
        fn = SP_ENCODERS[cfg.encoder_type]
    except KeyError:
        raise ValueError(
            f"encoder_type {cfg.encoder_type!r} has no sequence-parallel "
            f"forward (available: {sorted(SP_ENCODERS)})") from None
    return fn(params, cfg, src, mask, mesh, seq_axis=seq_axis, train=train,
              rng=rng)


def sp_frame_ce_loss(params, cfg, src, src_mask, targets, mesh, *,
                     seq_axis="seq", train=False, rng=None, utt_valid=None):
    """Sequence-parallel frame-level CE (models/am.py frame_ce_loss
    semantics) for LONG-FORM hybrid AM training: the encoder forward runs
    time-sharded over ``mesh`` (:func:`sp_encode`); the posterior head,
    log-softmax, and per-frame CE are all position-local, so they stay
    sharded ordinary ops — GSPMD reduces the masked sums across shards
    without ever gathering [B, S, n_targets] posteriors to one device.

    ``src`` [B, S, D], ``src_mask``/``targets`` [B, S] with S divisible by
    the mesh's ``seq_axis`` size (pad with mask-0 frames).  Requires
    cfg.src_fold == 1 (time-sharded targets must stay frame-aligned).
    Returns (loss_sum, n_correct, n_frames) — the same contract as
    frame_ce_loss, so recipes/train_am.py swaps it in under -seq_shards."""
    if cfg.src_fold != 1:
        raise ValueError(
            "sp_frame_ce_loss requires src_fold == 1: folding re-times the "
            "encoder output, so per-frame targets would no longer align "
            "with the time shards")
    import pytorch_kaldi_asr_tpu.models.am as am

    enc = sp_encode(params["encoder"], cfg, src, src_mask, mesh,
                    seq_axis=seq_axis, train=train, rng=rng)
    logp = am.head_log_posteriors(params, cfg, enc)
    valid = src_mask.astype(jnp.float32)
    if utt_valid is not None:
        valid = valid * jnp.asarray(utt_valid).astype(jnp.float32)[:, None]
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1).squeeze(-1)
    loss = jnp.sum(nll * valid)
    pred = jnp.argmax(logp, axis=-1)
    n_correct = jnp.sum((pred == targets) * valid)
    return loss, n_correct, jnp.sum(valid)
