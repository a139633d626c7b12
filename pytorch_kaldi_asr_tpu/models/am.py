"""Frame-level acoustic model: encoder → per-frame log-posteriors.

The BASELINE north star keeps the reference's hybrid-AM contract: the model
emits per-utterance log-posterior matrices that Kaldi's host-side WFST
decoding (latgen) can consume unchanged.  Any encoder family from the zoo
(tdnn/banded/blstm/conformer/tdnnf) plugs in; the output head is a linear
projection to the target inventory with log-softmax, optionally minus log
priors (the standard hybrid "likelihood" scaling).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pytorch_kaldi_asr_tpu.io import kaldi_io
from pytorch_kaldi_asr_tpu.models.common import xavier_normal
from pytorch_kaldi_asr_tpu.models.transformer import (
    TransformerConfig,
    encode,
    init_transformer,
)


def init_am(rng, cfg: TransformerConfig, n_targets, lda_mat=None):
    """Encoder params + posterior head.  ``cfg.vocab_size`` is unused by the
    AM but kept so one config type serves both model kinds."""
    k1, k2 = jax.random.split(rng)
    base = init_transformer(k1, cfg, lda_mat)
    return {
        "encoder": base["encoder"],
        "head": {
            "w": xavier_normal(k2, (cfg.en_d_model, n_targets),
                               cfg.en_d_model, n_targets),
            "b": jnp.zeros((n_targets,)),
        },
    }


def head_log_posteriors(params, cfg, enc, *, log_priors=None):
    """Posterior head on encoder output ``enc`` [..., d_model]: linear to
    the target inventory + log-softmax (minus log-priors if given).  The
    head is position-local, so it serves the single-device path and the
    sequence-parallel one (parallel/sequence.py sp_frame_ce_loss)
    identically."""
    dtype = cfg.compute_dtype
    logits = enc.astype(dtype) @ params["head"]["w"].astype(dtype) \
        + params["head"]["b"].astype(dtype)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    if log_priors is not None:
        logp = logp - log_priors[None, None, :]
    return logp


def am_log_posteriors(params, cfg, src, src_mask, *, train=False, rng=None,
                      log_priors=None, pos_offset=0):
    """[B, S', n_targets] log-posteriors (minus log-priors if given).
    ``pos_offset`` shifts the positional table for chunked streaming
    (models/streaming.py passes the buffer's global frame index)."""
    enc, mask = encode(params, cfg, src, src_mask, train=train, rng=rng,
                       pos_offset=pos_offset)
    logp = head_log_posteriors(params, cfg, enc, log_priors=log_priors)
    return logp, mask


def frame_ce_loss(params, cfg, src, src_mask, targets, *, train=False,
                  rng=None, utt_valid=None):
    """Frame-level CE: targets [B, S'] int ids aligned with the (folded)
    encoder output; padded frames (mask 0) excluded.  ``utt_valid`` [B]
    additionally excludes the loader's duplicated tail rows ('all' mode).
    Returns (loss_sum, n_correct, n_frames)."""
    logp, mask = am_log_posteriors(params, cfg, src, src_mask, train=train,
                                   rng=rng)
    valid = mask.astype(jnp.float32)
    if utt_valid is not None:
        valid = valid * jnp.asarray(utt_valid).astype(jnp.float32)[:, None]
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1).squeeze(-1)
    loss = jnp.sum(nll * valid)
    pred = jnp.argmax(logp, axis=-1)
    n_correct = jnp.sum((pred == targets) * valid)
    return loss, n_correct, jnp.sum(valid)


def write_posteriors(params, cfg, loader, wspecifier, *, log_priors=None):
    """Decode a dataset to per-utterance log-posterior matrices in a Kaldi
    ark/scp pair — the artifact Kaldi latgen consumes.  Returns #utts."""
    fwd = jax.jit(
        lambda p, s, m: am_log_posteriors(p, cfg, s, m,
                                          log_priors=log_priors)
    )
    n = 0
    import numpy as np

    with kaldi_io.open_writer(wspecifier) as w:
        for batch in loader:
            logp, mask = fwd(params, batch.src, batch.src_mask)
            logp = np.asarray(logp)
            mask = np.asarray(mask)
            for i, key in enumerate(batch.keys):
                if not batch.valid[i]:
                    continue
                n_frames = int(mask[i].sum())
                w.write(key, logp[i, :n_frames])
                n += 1
    return n
