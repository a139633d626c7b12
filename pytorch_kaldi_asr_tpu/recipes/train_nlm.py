"""Neural-LM training entry point (the rnnlm-training role upstream of
the reference's rnnlm_compute_scores.sh): trains a causal transformer LM
(models/nlm.py) on transcript text with the recipe's own vocabulary, for
n-best rescoring via recipes/score_lm.py -nlm_model_dir.

Usage::

    python3 -m pytorch_kaldi_asr_tpu.recipes.train_nlm \\
        -text data/train/text -read_vocab_file data/language/vocab.txt \\
        -save_model_dir exp/nlm -epoch 20
"""

from __future__ import annotations

import argparse

import numpy as np
import jax
import optax

from pytorch_kaldi_asr_tpu.data.instances import read_vocab
from pytorch_kaldi_asr_tpu.models.nlm import (
    encode_sentences,
    init_nlm,
    nlm_loss,
)
from pytorch_kaldi_asr_tpu.models.transformer import TransformerConfig
from pytorch_kaldi_asr_tpu.train.checkpoint import save_checkpoint
from pytorch_kaldi_asr_tpu.train.optim import hyperbolic_schedule
from pytorch_kaldi_asr_tpu.utils.logging import info, procedure


def read_sentences(path):
    """``utt w1 w2 ...`` lines -> word lists (key dropped)."""
    out = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.split()
            if len(parts) > 1:
                out.append(parts[1:])
    return out


def train_nlm(text_path, vocab_file, save_dir, *, epochs=20, batch_size=32,
              d_model=128, layers=2, n_head=2, max_len=64, dropout=0.1,
              lr=0.001, soft_coefficient=2000.0, seed=0):
    word2idx = read_vocab(vocab_file)
    sentences = read_sentences(text_path)
    if not sentences:
        raise SystemExit(f"no sentences in {text_path}")
    cfg = TransformerConfig(
        src_dim=1,  # unused by the LM; kept for checkpoint compatibility
        vocab_size=max(word2idx.values()) + 1,
        de_d_model=d_model,
        de_layers=layers,
        n_head=n_head,
        d_k=d_model // n_head,
        d_v=d_model // n_head,
        decoder_max_len=max_len,
        de_dropout=dropout,
        decoder_sub_sequence=(-max_len, 0),  # full causal lookback
        encoder_max_len=8,
        # no length-1 LN skip: the NLM is a NEW model (no reference quirk
        # to honor), and shallow fusion (decode/fusion.py) evaluates it
        # one token at a time — the skip would make incremental scoring
        # diverge from batch scoring
        ln_skip_len1=False,
    )
    params = init_nlm(jax.random.PRNGKey(seed), cfg)
    tx = optax.chain(
        optax.scale_by_adam(),
        optax.scale_by_schedule(hyperbolic_schedule(lr, soft_coefficient)),
        optax.scale(-1.0),
    )
    opt_state = tx.init(params)
    toks, mask = encode_sentences(sentences, word2idx, max_len)

    @jax.jit
    def step(params, opt_state, t, m, rng):
        def loss_fn(p):
            loss, n_correct, n = nlm_loss(p, cfg, t, m, train=True, rng=rng)
            return loss / n, (loss, n_correct, n)

        (_, (loss, n_c, n)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return (optax.apply_updates(params, updates), opt_state, loss,
                n_c / n, n)

    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed + 1)
    n_full = len(sentences) // batch_size
    for epoch in range(1, epochs + 1):
        order = rng.permutation(len(sentences))
        tot_nll = tot_tok = 0.0
        accs = []
        for i in range(max(1, n_full)):
            idx = order[i * batch_size : (i + 1) * batch_size]
            if len(idx) < batch_size:  # tiny corpus: single ragged batch
                idx = np.resize(idx, batch_size)
            key, sub = jax.random.split(key)
            params, opt_state, loss, acc, n = step(
                params, opt_state, toks[idx], mask[idx], sub)
            tot_nll += float(loss)
            tot_tok += float(n)
            accs.append(float(acc))
        ppl = float(np.exp(tot_nll / max(tot_tok, 1.0)))
        info("nlm epoch %d: token-acc %.3f, train ppl %.2f", epoch,
             float(np.mean(accs)), ppl)

    save_checkpoint(save_dir, params, cfg, epoch=epochs,
                    extra={"model_kind": "nlm"})
    info("neural LM saved to %s", save_dir)
    return params, cfg, ppl


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-text", required=True)
    parser.add_argument("-read_vocab_file", required=True)
    parser.add_argument("-save_model_dir", required=True)
    parser.add_argument("-epoch", type=int, default=20)
    parser.add_argument("-batch_size", type=int, default=32)
    parser.add_argument("-d_model", type=int, default=128)
    parser.add_argument("-layers", type=int, default=2)
    parser.add_argument("-n_head", type=int, default=2)
    parser.add_argument("-max_len", type=int, default=64)
    parser.add_argument("-dropout", type=float, default=0.1)
    parser.add_argument("-optim_start_lr", type=float, default=0.001)
    opt = parser.parse_args(argv)

    procedure("neural LM training")
    train_nlm(
        opt.text, opt.read_vocab_file, opt.save_model_dir,
        epochs=opt.epoch, batch_size=opt.batch_size, d_model=opt.d_model,
        layers=opt.layers, n_head=opt.n_head, max_len=opt.max_len,
        dropout=opt.dropout, lr=opt.optim_start_lr,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
