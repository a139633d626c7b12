"""Pipeline parallelism (GPipe schedule) over a ``pipe`` mesh axis.

The reference binds one process to one GPU and scales by running MORE
independent jobs (train.py:352-359; SURVEY.md §2d) — a model that does
not fit one device simply cannot be trained.  Here the layer stack
itself is sharded: stage ``i`` of a ``('data', 'pipe')`` mesh holds
``en_layers / n_stages`` encoder layers, microbatches flow through the
stages in the classic GPipe relay, and the inter-stage hop is ONE
``jax.lax.ppermute`` per tick — a nearest-neighbor ICI transfer, the
cheapest collective a TPU slice offers.  Combined with the existing
axes this completes the mesh story: dp (parallel/mesh.py), tp
(parallel/mesh.py head/ffn sharding), sp (parallel/sequence.py) and pp
(this module) all compose as named mesh axes on one ``jax.sharding.Mesh``.

Design notes:

- The schedule is a ``lax.scan`` over ``M + S - 1`` ticks (M
  microbatches, S stages).  Every stage applies ITS layers each tick;
  warm-up/drain bubbles process zeros and their outputs are masked out,
  so utilization is the standard GPipe ``M / (M + S - 1)`` — pick
  ``n_microbatches >= 4 * stages`` in production.
- Activations travel with their frame mask: ``(x, mask)`` pairs ride
  the same ``ppermute`` so attention on later stages sees the right
  padding mask without re-reading the batch.
- The whole construction is DIFFERENTIABLE: ``ppermute`` has a
  transpose rule (the reversed permutation), ``scan`` reverse-plays,
  and the bubble masking is ``where`` arithmetic — gradients are
  pinned equal to the single-device stack by tests/test_pipeline.py.
- Dropout (``train=True, rng=key``) folds ``(stage, layer,
  microbatch)`` into the key so every layer application draws an
  independent stream at the same sites as the single-device encoder
  (models/encoders.py banded_encode); with ``rng=None`` the forward is
  bit-identical to the dropout-free path.
- Outputs are collected on the last stage and replicated with one
  ``psum`` (zeros elsewhere).  At recipe activation sizes this is a
  single cheap all-reduce; a production serving path that wants
  last-stage-resident outputs can pass ``gather_outputs=False``-shaped
  specs instead — not needed for training, where the loss head runs
  replicated anyway.

No reference counterpart exists (cite: reference train.py:352-359 binds
exactly one CUDA device; the Kaldi layer scales by SGE job arrays, not
by model sharding).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from pytorch_kaldi_asr_tpu.models.common import dropout, position_encoding_table
from pytorch_kaldi_asr_tpu.models.transformer import _Rngs, feed_forward
from pytorch_kaldi_asr_tpu.parallel.sequence import _shard_map_compat


def make_pipe_mesh(pipe=None, data=1, devices=None):
    """A ``('data', 'pipe')`` mesh: batch over ``data``, layer stages
    over ``pipe``.  ``pipe`` defaults to n_devices / data."""
    devices = list(devices if devices is not None else jax.devices())
    pipe = pipe or (len(devices) // data)
    if data * pipe > len(devices):
        raise ValueError(
            f"mesh {data}x{pipe} needs {data * pipe} devices, "
            f"have {len(devices)}")
    arr = np.asarray(devices[: data * pipe]).reshape(data, pipe)
    return Mesh(arr, axis_names=("data", "pipe"))


def stack_stage_params(layers, n_stages):
    """Stack a list of L identically-structured layer pytrees into one
    pytree with leading axes ``[n_stages, L // n_stages, ...]`` — the
    layout the pipeline shards over ``pipe`` (stage i's slab is its
    resident layers, in order)."""
    n_layers = len(layers)
    if n_layers % n_stages != 0:
        raise ValueError(
            f"{n_layers} layers do not divide into {n_stages} stages")
    lps = n_layers // n_stages

    def stack(*leaves):
        return jnp.stack(leaves).reshape(n_stages, lps, *leaves[0].shape)

    return jax.tree_util.tree_map(stack, *layers)


def _banded_stage(stacked, x, mask, rng, stage, mb_idx, *, cfg, lps, train):
    """Apply one stage's resident banded layers (attention + FFN each) to a
    microbatch.  ``stacked`` leaves are [lps, ...]; ``rng`` is the base
    dropout key (or None) — (stage, layer, microbatch) are folded in so
    each application draws an independent stream."""
    from pytorch_kaldi_asr_tpu.models.encoders import _banded_self_attention

    rate = cfg.en_dropout if train else 0.0
    for j in range(lps):
        layer = jax.tree_util.tree_map(lambda a: a[j], stacked)
        key = None
        if rng is not None and train:
            key = jax.random.fold_in(
                jax.random.fold_in(rng, stage * lps + j), mb_idx)
        rngs = _Rngs(key)
        x = _banded_self_attention(
            layer["slf"], x, mask, cfg, rate, rngs, train)
        x = feed_forward(layer["ffn"], x, cfg, rate, rngs, train)
    return x


def _pipeline_body(stage_fn, n_stages, n_micro, axis="pipe"):
    """GPipe relay under shard_map: microbatch m enters stage 0 at tick m,
    reaches stage s at tick m + s, and exits the last stage at tick
    m + S - 1; ``ppermute`` shifts (activation, mask) one stage rightward
    per tick.  Bubble ticks compute on zeros and are masked out of the
    output buffer."""
    S, M = n_stages, n_micro
    perm = [(i, i + 1) for i in range(S - 1)]

    def body(stacked, xs, masks, rng):
        # stacked leaves: [1, lps, ...] (this stage's slab); xs: [M, mb,
        # T, D] (replicated over pipe; mb sharded over data); masks:
        # [M, mb, T]
        slab = jax.tree_util.tree_map(lambda a: a[0], stacked)
        stage = jax.lax.axis_index(axis)
        state = jnp.zeros_like(xs[0])
        state_m = jnp.zeros_like(masks[0])
        outputs = jnp.zeros_like(xs)

        def tick(carry, t):
            st, stm, out = carry
            i_in = jnp.clip(t, 0, M - 1)
            x0 = jnp.where(stage == 0, xs[i_in], st)
            m0 = jnp.where(stage == 0, masks[i_in], stm)
            mb_idx = jnp.clip(t - stage, 0, M - 1)
            y = stage_fn(slab, x0, m0, rng, stage, mb_idx)
            i_out = jnp.clip(t - (S - 1), 0, M - 1)
            write = (stage == S - 1) & (t >= S - 1)
            prev = jax.lax.dynamic_index_in_dim(out, i_out, 0,
                                                keepdims=False)
            out = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(write, y, prev), i_out, 0)
            if perm:
                y = jax.lax.ppermute(y, axis, perm)
                m0 = jax.lax.ppermute(m0, axis, perm)
            return (y, m0, out), None

        (_, _, outputs), _ = jax.lax.scan(
            tick, (state, state_m, outputs),
            jnp.arange(M + S - 1, dtype=jnp.int32))
        # only the last stage holds real outputs; replicate with one psum
        outputs = jnp.where(stage == S - 1, outputs, 0.0)
        return jax.lax.psum(outputs, axis)

    return body


@partial(jax.jit, static_argnames=("cfg", "mesh", "n_micro", "train"))
def _pp_encode_jit(params, src, mask, rng, *, cfg, mesh, n_micro, train):
    """Jitted pipeline encoder forward, cached per (cfg, mesh, M, train,
    shapes) — same rationale as parallel/sequence._sp_encode_jit."""
    S = mesh.shape["pipe"]
    has_data = "data" in mesh.shape and mesh.shape["data"] > 1
    stacked = stack_stage_params(params["layers"], S)

    b, s = src.shape[0], src.shape[1]
    pos = position_encoding_table(max(cfg.encoder_max_len, s),
                                  cfg.en_d_model)[:s]
    x = src.astype(cfg.compute_dtype) @ params["src_proj"]["w"].astype(
        cfg.compute_dtype)
    x = x.astype(jnp.float32) + pos[None]
    rate = cfg.en_dropout if train else 0.0
    # pre/post dropout stream: fold in n_layers — disjoint from the
    # per-layer folds, which use stage * lps + j in [0, n_layers)
    pre_rng = (jax.random.fold_in(rng, len(params["layers"]))
               if (rng is not None and train) else None)
    rngs = _Rngs(pre_rng)
    x = dropout(x, rate, rngs.next(), train)

    mb = b // n_micro
    xs = x.reshape(n_micro, mb, s, x.shape[-1])
    ms = mask.reshape(n_micro, mb, s)

    stage_fn = partial(_banded_stage, cfg=cfg,
                       lps=len(params["layers"]) // S, train=train)
    body = _pipeline_body(stage_fn, S, n_micro)
    data_spec = "data" if has_data else None
    fn = _shard_map_compat(
        body,
        mesh=mesh,
        in_specs=(P("pipe"), P(None, data_spec), P(None, data_spec), P()),
        out_specs=P(None, data_spec),
    )
    out = fn(stacked, xs, ms, rng)
    x = out.reshape(b, s, -1)

    x = x + pos[None]  # trans_pos_enc applied post-stack (Models.py:119)
    x = dropout(x, rate, rngs.next(), train)
    return x


def pp_banded_encode(params, cfg, src, mask, mesh, *, n_microbatches=None,
                     train=False, rng=None):
    """Banded encoder forward with the LAYER stack pipelined over the
    mesh's ``pipe`` axis (GPipe schedule; see module docstring).

    ``params`` is the banded-encoder subtree (init_banded_encoder);
    ``src`` [B, S, D_folded] / ``mask`` [B, S] follow banded_encode's
    post-fold contract.  ``n_microbatches`` (default: the stage count)
    must divide B; with a >1 ``data`` axis, B/M must divide over it too.
    Returns the [B, S, d_model] encoder output, numerically equal to
    models.encoders.banded_encode on the dropout-free path and
    differentiable end to end."""
    S = mesh.shape["pipe"]
    if len(params["layers"]) % S != 0:
        raise ValueError(
            f"{len(params['layers'])} layers do not divide into "
            f"{S} pipeline stages")
    M = n_microbatches or S
    b = src.shape[0]
    if b % M != 0:
        raise ValueError(f"batch {b} not divisible by {M} microbatches")
    data = mesh.shape.get("data", 1)
    if (b // M) % data != 0:
        raise ValueError(
            f"microbatch size {b // M} not divisible by the 'data' "
            f"axis ({data})")
    return _pp_encode_jit(params, src, mask, rng, cfg=cfg, mesh=mesh,
                          n_micro=M, train=train)


def pp_frame_ce_loss(params, cfg, src, src_mask, targets, mesh, *,
                     n_microbatches=None, train=False, rng=None,
                     utt_valid=None):
    """Frame-level CE with the encoder stack pipelined (models/am.py
    frame_ce_loss semantics: fold → encoder → head → masked CE; returns
    (loss_sum, n_correct, n_frames)).  ``params`` is an AM pytree
    (init_am with a banded encoder).  ``utt_valid`` [B] additionally
    excludes the loader's duplicated tail rows ('all' mode), matching
    frame_ce_loss."""
    from pytorch_kaldi_asr_tpu.models.am import head_log_posteriors
    from pytorch_kaldi_asr_tpu.models.transformer import fold_seq_and_mask

    src, mask = fold_seq_and_mask(src, src_mask, cfg.src_fold)
    enc = pp_banded_encode(params["encoder"], cfg, src, mask, mesh,
                           n_microbatches=n_microbatches, train=train,
                           rng=rng)
    logp = head_log_posteriors(params, cfg, enc)
    valid = mask.astype(jnp.float32)
    if utt_valid is not None:
        valid = valid * jnp.asarray(utt_valid).astype(jnp.float32)[:, None]
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1).squeeze(-1)
    loss = jnp.sum(nll * valid)
    pred = jnp.argmax(logp, axis=-1)
    n_correct = jnp.sum((pred == targets) * valid)
    return loss, n_correct, jnp.sum(valid)
