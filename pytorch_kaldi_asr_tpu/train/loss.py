"""Training objective: sum-reduced cross entropy ignoring PAD, with the
reference's (implemented but default-off) label smoothing.

Reference semantics (train.py:58-90, 326-330): loss is the SUM of per-token
CE over non-PAD goal positions; reported metrics are loss/n_words and
n_correct/n_words; label smoothing eps=0.1 exists but is force-disabled at
train.py:193 — we expose it as a real flag with the same default."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pytorch_kaldi_asr_tpu.utils import constants


def cross_entropy_loss(logits, goal, *, smoothing=False, eps=0.1,
                       extra_mask=None):
    """Sum CE over non-PAD positions.

    logits: [B, T, V]; goal: [B, T] int ids.
    extra_mask: optional [B] or [B, T] multiplier (e.g. the loader's per-row
    ``valid`` flag for padded tail batches).
    Returns (loss_sum, n_correct, n_words)."""
    v = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    non_pad = (goal != constants.PAD).astype(logp.dtype)
    if extra_mask is not None:
        extra = jnp.asarray(extra_mask).astype(logp.dtype)
        if extra.ndim == 1:
            extra = extra[:, None]
        non_pad = non_pad * extra

    if smoothing:
        one_hot = jax.nn.one_hot(goal, v, dtype=logp.dtype)
        smooth = one_hot * (1.0 - eps) + (1.0 - one_hot) * eps / (v - 1)
        nll = -jnp.sum(smooth * logp, axis=-1)
    else:
        nll = -jnp.take_along_axis(logp, goal[..., None], axis=-1).squeeze(-1)

    loss = jnp.sum(nll * non_pad)
    pred = jnp.argmax(logits, axis=-1)
    n_correct = jnp.sum((pred == goal) * non_pad)
    n_words = jnp.sum(non_pad)
    return loss, n_correct, n_words


def performance(logits, goal, *, smoothing=False, extra_mask=None):
    """Reference ``get_performance`` (train.py:58-68): (loss, n_correct)."""
    loss, n_correct, _ = cross_entropy_loss(
        logits, goal, smoothing=smoothing, extra_mask=extra_mask
    )
    return loss, n_correct
