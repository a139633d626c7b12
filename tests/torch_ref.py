"""Independent PyTorch implementation of the reference model *semantics*,
used as a numerical oracle for parity tests and as the CPU baseline in
benchmarks.

This follows the behavioral contract documented in SURVEY.md §2/§7 (attention
scaled by 1/sqrt(d_model), post-LN with eps=1e-3 on the unbiased std and the
length-1 skip, masked softmax re-zeroing, splice/LDA/TDNN frontend, banded
decoder self-attention) but is written against our functional parameter tree,
not the reference's module graph.
"""

import numpy as np
import torch
import torch.nn.functional as F


def _t(x):
    if isinstance(x, torch.Tensor):
        return x
    return torch.from_numpy(np.array(x, copy=True)).float()


def layer_norm(z, gamma, beta, eps=1e-3, skip_len1=True):
    if skip_len1 and z.size(1) == 1:
        return z
    mu = z.mean(dim=-1, keepdim=True)
    sigma = z.std(dim=-1, keepdim=True)  # unbiased (N-1), like torch.std
    return (z - mu) / (sigma + eps) * gamma + beta


def splice(x, context):
    pad_head = max(0, -context[0])
    pad_end = max(0, context[-1])
    frames = x.shape[1]
    padded = F.pad(x, (0, 0, pad_head, pad_end))
    return torch.cat(
        [padded[:, c + pad_head : c + pad_head + frames, :] for c in context],
        dim=2,
    )


def mha(p, q, k, v, blocked, scale_dim, skip_len1=True):
    qs = torch.einsum("bld,hdk->bhlk", q, _t(p["w_qs"]))
    ks = torch.einsum("bld,hdk->bhlk", k, _t(p["w_ks"]))
    vs = torch.einsum("bld,hdv->bhlv", v, _t(p["w_vs"]))
    logits = torch.einsum("bhqk,bhlk->bhql", qs, ks) / scale_dim**0.5
    blocked4 = blocked.unsqueeze(1).expand_as(logits)
    logits = logits.masked_fill(blocked4, float("-inf"))
    attn = torch.softmax(logits, dim=-1)
    attn = attn.masked_fill(blocked4, 0.0)  # also clears all-masked-row NaNs
    out = torch.einsum("bhql,bhlv->bhqv", attn, vs)
    b, h, lq, dv = out.shape
    out = out.permute(0, 2, 1, 3).reshape(b, lq, h * dv)
    out = out @ _t(p["proj"]["w"]) + _t(p["proj"]["b"])
    return layer_norm(out + q, _t(p["ln"]["gamma"]), _t(p["ln"]["beta"]),
                      skip_len1=skip_len1)


def ffn(p, x, skip_len1=True):
    h = torch.relu(x @ _t(p["w1"]["w"]) + _t(p["w1"]["b"]))
    out = h @ _t(p["w2"]["w"]) + _t(p["w2"]["b"])
    return layer_norm(out + x, _t(p["ln"]["gamma"]), _t(p["ln"]["beta"]),
                      skip_len1=skip_len1)


def pos_table(n, d):
    pos = np.arange(n, dtype=np.float64)[:, None]
    j = np.arange(d, dtype=np.float64)[None, :]
    angle = pos / np.power(10000.0, 2 * (j // 2) / d)
    table = np.zeros((n, d))
    table[1:, 0::2] = np.sin(angle[1:, 0::2])
    table[1:, 1::2] = np.cos(angle[1:, 1::2])
    return torch.from_numpy(table).float()


def banded(length, start, end):
    q = torch.arange(length)[:, None]
    k = torch.arange(length)[None, :]
    rel = k - q
    return ~((rel >= start) & (rel <= end))


def encode(params, cfg, src, src_mask):
    p = params["encoder"]
    x = splice(src, list(cfg.lda_context))
    x = x @ _t(p["lda"]["w"]) + _t(p["lda"]["b"])
    x = x @ _t(p["src_proj"]["w"])
    for ctx, layer in zip(cfg.tdnn_contexts, p["tdnn"]):
        x = torch.relu(splice(x, list(ctx)) @ _t(layer["w"]) + _t(layer["b"]))
    x = x + pos_table(cfg.encoder_max_len, cfg.en_d_model)[: x.shape[1]]
    return x


def decode(params, cfg, tgt, tgt_mask, src_mask, enc_output):
    p = params["decoder"]
    t = tgt.shape[1]
    enc = enc_output @ _t(p["enc_dec_proj"]["w"])
    x = _t(p["embed"])[tgt] + pos_table(cfg.decoder_max_len, cfg.de_d_model)[:t]

    pad_blocked = (tgt_mask == 0)[:, None, :].expand(-1, t, -1)
    slf_blocked = pad_blocked | banded(
        t, cfg.decoder_sub_sequence[0], cfg.decoder_sub_sequence[1]
    )
    cross_blocked = (src_mask == 0)[:, None, :].expand(-1, t, -1)

    for layer in p["layers"]:
        x = mha(layer["slf"], x, x, x, slf_blocked, cfg.de_d_model,
                cfg.ln_skip_len1)
        x = mha(layer["enc"], x, enc, enc, cross_blocked, cfg.de_d_model,
                cfg.ln_skip_len1)
        x = ffn(layer["ffn"], x, cfg.ln_skip_len1)
    return x @ _t(p["word_proj"]["w"])


def forward(params, cfg, src, src_mask, tgt, tgt_mask):
    """Teacher-forced forward. All inputs numpy; returns numpy logits.
    Assumes src_fold == 1 (the recipe's setting, run.sh:79)."""
    src = _t(src)
    tgt = torch.from_numpy(np.asarray(tgt)).long()
    src_mask = torch.from_numpy(np.asarray(src_mask)).long()
    tgt_mask = torch.from_numpy(np.asarray(tgt_mask)).long()
    with torch.no_grad():
        enc = encode(params, cfg, src, src_mask)
        logits = decode(params, cfg, tgt, tgt_mask, src_mask, enc)
    return logits.numpy()
