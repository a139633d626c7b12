"""SpecAugment: on-chip time/frequency masking (the augmentation named by
the BASELINE Conformer config: "fused conv+attention Pallas kernels,
on-chip specaugment").

Pure jittable JAX — masks are drawn and applied on the accelerator inside
the train step, so augmented features never exist on the host.  Follows the
standard SpecAugment policy (Park et al. 2019): ``n_freq_masks`` bands of
width ≤ F on the feature axis and ``n_time_masks`` spans of length ≤ T on
the time axis (bounded additionally by p·frames), filled with zeros (the
mean after CMVN)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(
    jax.jit,
    static_argnames=("n_freq_masks", "freq_width", "n_time_masks",
                     "time_width", "max_time_frac"),
)
def spec_augment(rng, feats, feat_mask, *, n_freq_masks=2, freq_width=15,
                 n_time_masks=2, time_width=50, max_time_frac=0.2):
    """feats: [B, T, D]; feat_mask: [B, T] validity.  Returns masked feats.

    Time-mask lengths are clipped to ``max_time_frac`` of each utterance's
    real length, as in the adaptive SpecAugment variants."""
    b, t, d = feats.shape
    lengths = jnp.sum(feat_mask, axis=1).astype(jnp.int32)  # [B]
    keep = jnp.ones((b, t, d), bool)

    def apply_freq_mask(i, state):
        keep, rng = state
        rng, k1, k2 = jax.random.split(rng, 3)
        width = jax.random.randint(k1, (b,), 0, freq_width + 1)
        start = jax.random.randint(k2, (b,), 0,
                                   jnp.maximum(d - width, 1))
        idx = jnp.arange(d)[None, :]
        band = (idx >= start[:, None]) & (idx < (start + width)[:, None])
        keep = keep & ~band[:, None, :]
        return keep, rng

    def apply_time_mask(i, state):
        keep, rng = state
        rng, k1, k2 = jax.random.split(rng, 3)
        max_w = jnp.minimum(
            time_width,
            (lengths.astype(jnp.float32) * max_time_frac).astype(jnp.int32),
        )
        width = jax.random.randint(k1, (b,), 0, 10**6) % jnp.maximum(
            max_w + 1, 1
        )
        # start ∈ [0, length - width] inclusive, so the final frame can be
        # covered (span end == length)
        start = jax.random.randint(k2, (b,), 0, 10**6) % jnp.maximum(
            lengths - width + 1, 1
        )
        idx = jnp.arange(t)[None, :]
        span = (idx >= start[:, None]) & (idx < (start + width)[:, None])
        keep = keep & ~span[:, :, None]
        return keep, rng

    keep, rng = jax.lax.fori_loop(0, n_freq_masks, apply_freq_mask,
                                  (keep, rng))
    keep, rng = jax.lax.fori_loop(0, n_time_masks, apply_time_mask,
                                  (keep, rng))
    return jnp.where(keep, feats, 0.0)
