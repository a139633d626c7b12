"""Optimizer and LR schedule.

The reference wraps Adam(β=(0.9, 0.999), eps=1e-8) in a per-step hyperbolic
decay ``lr(k) = start_lr · soft / (k + soft)`` — NOT the Noam schedule
(reference Optim.py:21-27, train.py:376-380).  Here that is an optax
schedule, composed with a mask that freezes the LDA affine (the reference
freezes it via ``requires_grad=False``, TDNN.py:51-52)."""

from __future__ import annotations

import jax
import optax


def hyperbolic_schedule(start_lr=0.001, soft_coefficient=25000.0):
    """lr(step) = start_lr * soft / (step + soft)."""

    def schedule(step):
        return start_lr * soft_coefficient / (step + soft_coefficient)

    return schedule


def param_labels(params):
    """'frozen' for the encoder's LDA affine, 'trainable' elsewhere."""

    def label(path, _leaf):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        return "frozen" if "lda" in keys else "trainable"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(params, start_lr=0.001, soft_coefficient=25000.0,
                   b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0,
                   grad_clip_norm=None):
    """Adam with hyperbolic decay; LDA frontend frozen.

    ``grad_clip_norm``/``weight_decay`` are extensions beyond the reference
    (off by default)."""
    chain = []
    if grad_clip_norm:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    chain.append(
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps)
    )
    if weight_decay:
        # decoupled (AdamW-style) decay: applied after Adam's moment
        # normalization, scaled by the learning-rate schedule below
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_schedule(
        hyperbolic_schedule(start_lr, soft_coefficient)))
    chain.append(optax.scale(-1.0))
    tx = optax.chain(*chain)
    # NOTE: optax.masked passes masked-out gradients through UNCHANGED (they
    # would be applied raw); multi_transform with set_to_zero actually
    # freezes the LDA affine.
    return optax.multi_transform(
        {"trainable": tx, "frozen": optax.set_to_zero()},
        param_labels(params),
    )
