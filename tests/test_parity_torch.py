"""Numerical parity of the JAX model against an independent PyTorch oracle
implementing the reference semantics (SURVEY.md §7 'bit-faithful model
parity' hard part: post-LN eps=1e-3 quirks, 1/sqrt(d_model) attention scale,
banded masks, splice/LDA/TDNN frontend)."""

import numpy as np
import jax
import jax.numpy as jnp

from pytorch_kaldi_asr_tpu.models.transformer import (
    init_transformer,
    transformer_forward,
    encode,
)
from tests.test_models import small_cfg
from tests import torch_ref


def _np_params(params):
    return jax.tree_util.tree_map(np.asarray, params)


def _toy_batch(cfg, batch=3, src_len=12, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.normal(size=(batch, src_len, cfg.src_dim)).astype(np.float32)
    src_mask = np.ones((batch, src_len), np.uint8)
    src_mask[1, 8:] = 0
    tgt = np.array([[2, 4, 5, 6, 3], [2, 6, 7, 3, 0], [2, 5, 3, 0, 0]],
                   np.int32)[:batch]
    tgt_mask = (tgt != 0).astype(np.uint8)
    return src, src_mask, tgt, tgt_mask


def test_encoder_parity():
    cfg = small_cfg()
    lda_in = cfg.src_dim * len(cfg.lda_context)
    lda_mat = np.random.default_rng(7).normal(size=(20, lda_in + 1)) * 0.2
    params = init_transformer(jax.random.PRNGKey(3), cfg, lda_mat)
    src, src_mask, *_ = _toy_batch(cfg)

    ours, _ = encode(params, cfg, jnp.asarray(src), jnp.asarray(src_mask))
    import torch

    theirs = torch_ref.encode(
        _np_params(params), cfg, torch_ref._t(src),
        torch_ref._t(src_mask),
    ).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)


def test_full_forward_parity():
    cfg = small_cfg()
    lda_in = cfg.src_dim * len(cfg.lda_context)
    lda_mat = np.random.default_rng(7).normal(size=(20, lda_in + 1)) * 0.2
    params = init_transformer(jax.random.PRNGKey(3), cfg, lda_mat)
    src, src_mask, tgt, tgt_mask = _toy_batch(cfg)

    ours = np.asarray(
        transformer_forward(
            params, cfg, jnp.asarray(src), jnp.asarray(src_mask),
            jnp.asarray(tgt), jnp.asarray(tgt_mask),
        )
    )
    theirs = torch_ref.forward(_np_params(params), cfg, src, src_mask, tgt,
                               tgt_mask)
    np.testing.assert_allclose(ours, theirs, atol=5e-5)


def test_len1_decode_parity():
    """First beam-search step decodes a length-1 target — the layer-norm
    skip quirk must match."""
    cfg = small_cfg()
    params = init_transformer(jax.random.PRNGKey(5), cfg)
    src, src_mask, _, _ = _toy_batch(cfg)
    tgt = np.array([[2], [2], [2]], np.int32)
    tgt_mask = np.ones_like(tgt, np.uint8)
    ours = np.asarray(
        transformer_forward(
            params, cfg, jnp.asarray(src), jnp.asarray(src_mask),
            jnp.asarray(tgt), jnp.asarray(tgt_mask),
        )
    )
    theirs = torch_ref.forward(_np_params(params), cfg, src, src_mask, tgt,
                               tgt_mask)
    np.testing.assert_allclose(ours, theirs, atol=5e-5)


def test_grad_parity_loss():
    """Cross-entropy loss and a parameter gradient match torch autograd."""
    import torch

    cfg = small_cfg()
    params = init_transformer(jax.random.PRNGKey(9), cfg)
    src, src_mask, tgt, tgt_mask = _toy_batch(cfg)
    goal = tgt[:, 1:]
    tgt_in = tgt[:, :-1]
    tgt_in_mask = tgt_mask[:, :-1]

    def jax_loss(p):
        logits = transformer_forward(
            p, cfg, jnp.asarray(src), jnp.asarray(src_mask),
            jnp.asarray(tgt_in), jnp.asarray(tgt_in_mask),
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, jnp.asarray(goal)[..., None],
                                   axis=-1).squeeze(-1)
        return jnp.sum(nll * (jnp.asarray(goal) != 0))

    j_loss, j_grad = jax.value_and_grad(jax_loss)(params)

    # torch side: rebuild forward with requires_grad on the embedding
    np_params = _np_params(params)
    embed = torch.tensor(np.array(np_params["decoder"]["embed"], copy=True))
    embed.requires_grad_(True)
    np_params["decoder"]["embed"] = embed  # torch_ref._t handles tensors? no —

    # monkey-wrap: torch_ref._t passes tensors through if already torch
    orig_t = torch_ref._t

    def _t(x):
        if isinstance(x, torch.Tensor):
            return x
        return orig_t(x)

    torch_ref._t = _t
    try:
        src_t = torch.from_numpy(src)
        enc = torch_ref.encode(np_params, cfg, src_t,
                               torch.from_numpy(src_mask).long())
        logits = torch_ref.decode(
            np_params, cfg, torch.from_numpy(tgt_in).long(),
            torch.from_numpy(tgt_in_mask).long(),
            torch.from_numpy(src_mask).long(), enc,
        )
        goal_t = torch.from_numpy(goal).long()
        logp = torch.log_softmax(logits, dim=-1)
        nll = -logp.gather(-1, goal_t.unsqueeze(-1)).squeeze(-1)
        t_loss = (nll * (goal_t != 0)).sum()
        t_loss.backward()
    finally:
        torch_ref._t = orig_t

    np.testing.assert_allclose(float(j_loss), float(t_loss.detach()),
                           rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(j_grad["decoder"]["embed"]),
        embed.grad.numpy(),
        atol=1e-3,
    )


def test_encoder_weight_grad_parity():
    """Gradients w.r.t. a TDNN layer weight must match torch — exercises the
    conv-form splice backward against the explicit splice+matmul oracle."""
    import torch

    cfg = small_cfg()
    params = init_transformer(jax.random.PRNGKey(21), cfg)
    src, src_mask, tgt, tgt_mask = _toy_batch(cfg)
    goal, tgt_in, tgt_in_mask = tgt[:, 1:], tgt[:, :-1], tgt_mask[:, :-1]

    def jax_loss(p):
        logits = transformer_forward(
            p, cfg, jnp.asarray(src), jnp.asarray(src_mask),
            jnp.asarray(tgt_in), jnp.asarray(tgt_in_mask),
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, jnp.asarray(goal)[..., None],
                                   axis=-1).squeeze(-1)
        return jnp.sum(nll * (jnp.asarray(goal) != 0))

    j_grad = jax.grad(jax_loss)(params)

    np_params = _np_params(params)
    w0 = torch.tensor(np.array(np_params["encoder"]["tdnn"][0]["w"], copy=True))
    w0.requires_grad_(True)
    np_params["encoder"]["tdnn"][0]["w"] = w0

    orig_t = torch_ref._t
    torch_ref._t = lambda x: x if isinstance(x, torch.Tensor) else orig_t(x)
    try:
        enc = torch_ref.encode(np_params, cfg, torch.from_numpy(src),
                               torch.from_numpy(src_mask).long())
        logits = torch_ref.decode(
            np_params, cfg, torch.from_numpy(tgt_in).long(),
            torch.from_numpy(tgt_in_mask).long(),
            torch.from_numpy(src_mask).long(), enc,
        )
        goal_t = torch.from_numpy(goal).long()
        logp = torch.log_softmax(logits, dim=-1)
        nll = -logp.gather(-1, goal_t.unsqueeze(-1)).squeeze(-1)
        (nll * (goal_t != 0)).sum().backward()
    finally:
        torch_ref._t = orig_t

    np.testing.assert_allclose(
        np.asarray(j_grad["encoder"]["tdnn"][0]["w"]), w0.grad.numpy(),
        atol=2e-3,
    )
