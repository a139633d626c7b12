"""Hybrid AM training entry point: feats + frame alignments → posterior
model (the BASELINE north-star flow: TIMIT AM trained ark-to-posterior so
external WFST decoding consumes the outputs).

Alignments are a ``key id id ...`` text table (the shape of Kaldi
``ali-to-pdf | copy-int-vector ark,t:-`` output)."""

import argparse
import math
import os

import numpy as np
import jax
import jax.numpy as jnp
import optax

from pytorch_kaldi_asr_tpu.data.loader import BatchLoader
from pytorch_kaldi_asr_tpu.io import kaldi_io
from pytorch_kaldi_asr_tpu.models import am
from pytorch_kaldi_asr_tpu.models.transformer import TransformerConfig
from pytorch_kaldi_asr_tpu.models.encoders import semi_orthogonal_step
from pytorch_kaldi_asr_tpu.train.checkpoint import (
    save_checkpoint as _save_ckpt,
)
from pytorch_kaldi_asr_tpu.train.optim import hyperbolic_schedule
from pytorch_kaldi_asr_tpu.utils.logging import info, procedure


def am_batch_loader(data_dir, batch_size, mode="drop", **kw):
    """Loader whose targets are per-frame alignment ids (padded with 0).
    Alignment length must equal the utterance's frame count — a mismatch
    would silently score real frames against the PAD fill."""
    feats = dict(kaldi_io.scp_entries(os.path.join(data_dir, "feats.scp")))
    ali = kaldi_io.read_key_value_text(os.path.join(data_dir, "ali.txt"))
    triples = []
    for key, rx in feats.items():
        if key not in ali:
            continue
        ids = np.array([int(a) for a in ali[key].split()], np.int32)
        n_frames = kaldi_io.mat_num_rows(rx)
        if len(ids) != n_frames:
            raise ValueError(
                f"utterance {key!r}: {len(ids)} alignment ids vs "
                f"{n_frames} feature frames (subsampled alignments?)"
            )
        triples.append((key, rx, ids))
    info("matched %d utterances with alignments in %s", len(triples),
         data_dir)
    return BatchLoader(triples, batch_size, mode=mode, frame_targets=True,
                       **kw)


def train_am(data_dir, dev_dir, save_dir, *, encoder_type="tdnnf",
             n_targets=None, epochs=10, batch_size=16, lr=0.001,
             soft_coefficient=25000.0, en_d_model=256, en_layers=None,
             seed=0, semi_orth_interval=4, seq_shards=0,
             encoder_sub_sequence=None, en_dropout=0.1, specaugment=None):
    pad_multiple = 8
    if seq_shards > 1:
        pad_multiple = 8 * seq_shards // math.gcd(8, seq_shards)
    loader = am_batch_loader(data_dir, batch_size,
                             pad_multiple=pad_multiple)
    dev_loader = am_batch_loader(dev_dir, batch_size, mode="all",
                                 pad_multiple=pad_multiple)
    if n_targets is None:
        n_targets = 1 + max(
            int(l.max()) for l in loader.labels
        )
    # dev ids beyond the head would be silently clamped by the gather in
    # frame_ce_loss — validate both splits up front
    for name, ld in (("train", loader), ("dev", dev_loader)):
        top = max(int(l.max()) for l in ld.labels)
        if top >= n_targets:
            raise ValueError(
                f"{name} alignments contain id {top} >= n_targets "
                f"{n_targets}; pass the true inventory size via -n_targets"
            )
    cfg_kw = {}
    if encoder_sub_sequence is not None:
        cfg_kw["encoder_sub_sequence"] = tuple(encoder_sub_sequence)
    cfg = TransformerConfig(
        src_dim=loader.feat_dim,
        vocab_size=n_targets,  # unused by the AM head, kept coherent
        encoder_type=encoder_type,
        en_d_model=en_d_model,
        encoder_max_len=loader.src_pad,
        en_dropout=en_dropout,
        **cfg_kw,
    )
    params = am.init_am(jax.random.PRNGKey(seed), cfg, n_targets)

    mesh = None
    if seq_shards > 1:
        # LONG-FORM path: shard the TIME axis over the mesh so utterances
        # whose activations exceed one chip's HBM still train — halo
        # exchanges ride ICI per layer (parallel/sequence.py).
        from pytorch_kaldi_asr_tpu.parallel.sequence import (
            make_seq_mesh,
            sp_frame_ce_loss,
        )

        if len(jax.devices()) < seq_shards:
            raise ValueError(
                f"-seq_shards {seq_shards} exceeds the {len(jax.devices())} "
                "visible devices")
        mesh = make_seq_mesh(seq_shards)
        info("sequence-parallel training: time axis over %d shards "
             "(%d-frame pads, %d local frames)", seq_shards, loader.src_pad,
             loader.src_pad // seq_shards)

    tx = optax.chain(
        optax.scale_by_adam(),
        optax.scale_by_schedule(hyperbolic_schedule(lr, soft_coefficient)),
        optax.scale(-1.0),
    )
    opt_state = tx.init(params)

    def loss_parts(p, src, src_mask, tgt, *, train=False, rng=None,
                   utt_valid=None):
        if mesh is not None:
            return sp_frame_ce_loss(p, cfg, src, src_mask, tgt, mesh,
                                    train=train, rng=rng,
                                    utt_valid=utt_valid)
        return am.frame_ce_loss(p, cfg, src, src_mask, tgt, train=train,
                                rng=rng, utt_valid=utt_valid)

    @jax.jit
    def train_step(params, opt_state, src, src_mask, tgt, rng):
        if specaugment:
            # on-chip masking inside the jitted step (ops/specaugment.py);
            # same None/True/kwargs-dict contract as train.state.
            # make_train_step(specaugment=...)
            from pytorch_kaldi_asr_tpu.ops.specaugment import spec_augment

            sa_kw = specaugment if isinstance(specaugment, dict) else {}
            rng, aug = jax.random.split(rng)
            src = spec_augment(aug, src, src_mask, **sa_kw)

        def loss_fn(p):
            loss, n_correct, n = loss_parts(p, src, src_mask, tgt,
                                            train=True, rng=rng)
            return loss / n, (n_correct, n)

        (loss, (n_correct, n)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, \
            n_correct / n

    @jax.jit
    def eval_step(params, src, src_mask, tgt, valid):
        loss, n_correct, n = loss_parts(params, src, src_mask, tgt,
                                        utt_valid=valid)
        return n_correct, n

    rng = jax.random.PRNGKey(seed + 1)
    step = 0
    for epoch in range(1, epochs + 1):
        accs = []
        for batch in loader:
            rng, sub = jax.random.split(rng)
            tgt = jnp.asarray(batch.tgt)
            params, opt_state, loss, acc = train_step(
                params, opt_state, jnp.asarray(batch.src),
                jnp.asarray(batch.src_mask), tgt, sub,
            )
            accs.append(float(acc))
            step += 1
            if encoder_type == "tdnnf" and step % semi_orth_interval == 0:
                params = semi_orthogonal_step(params)
        n_c = n_t = 0.0
        for batch in dev_loader:
            c, n = eval_step(params, jnp.asarray(batch.src),
                             jnp.asarray(batch.src_mask),
                             jnp.asarray(batch.tgt),
                             jnp.asarray(batch.valid))
            n_c += float(c)
            n_t += float(n)
        info("epoch %d: train frame-acc %.3f, dev frame-acc %.3f",
             epoch, float(np.mean(accs)), n_c / max(n_t, 1))

    _save_ckpt(save_dir, params, cfg, epoch=epochs,
               extra={"n_targets": n_targets, "model_kind": "am"})
    info("AM saved to %s", save_dir)
    return params, cfg, n_c / max(n_t, 1)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-read_train_dir", required=True)
    parser.add_argument("-read_dev_dir", required=True)
    parser.add_argument("-save_model_dir", required=True)
    parser.add_argument("-encoder_type", default="tdnnf")
    parser.add_argument("-n_targets", type=int, default=None,
                        help="posterior inventory size (default: inferred "
                             "from the train alignments — pass the true pdf "
                             "count when rare classes may be absent)")
    parser.add_argument("-epoch", type=int, default=10)
    parser.add_argument("-batch_size", type=int, default=16)
    parser.add_argument("-en_d_model", type=int, default=256)
    parser.add_argument("-optim_start_lr", type=float, default=0.001)
    parser.add_argument("-en_dropout", type=float, default=0.1)
    parser.add_argument("-seq_shards", type=int, default=0,
                        help="shard the TIME axis over this many devices "
                             "(long-form utterances; banded/conformer "
                             "encoders only — see parallel/sequence.py)")
    parser.add_argument("-encoder_sub_sequence", default=None,
                        help="attention band '(start,end)', e.g. '(-100,0)'")
    parser.add_argument("-specaugment", action="store_true",
                        help="SpecAugment time/frequency masking inside the "
                             "jitted train step (ops/specaugment.py)")
    parser.add_argument("-specaug_freq_masks", type=int, default=2)
    parser.add_argument("-specaug_freq_width", type=int, default=15)
    parser.add_argument("-specaug_time_masks", type=int, default=2)
    parser.add_argument("-specaug_time_width", type=int, default=50)
    parser.add_argument("-specaug_max_time_frac", type=float, default=0.2)
    opt = parser.parse_args(argv)

    sub_seq = None
    if opt.encoder_sub_sequence:
        from pytorch_kaldi_asr_tpu.recipes.initialize_model import str2tuple

        sub_seq = str2tuple(opt.encoder_sub_sequence)

    specaug = None
    if opt.specaugment:
        specaug = {
            "n_freq_masks": opt.specaug_freq_masks,
            "freq_width": opt.specaug_freq_width,
            "n_time_masks": opt.specaug_time_masks,
            "time_width": opt.specaug_time_width,
            "max_time_frac": opt.specaug_max_time_frac,
        }

    procedure("hybrid AM training")
    train_am(
        opt.read_train_dir, opt.read_dev_dir, opt.save_model_dir,
        encoder_type=opt.encoder_type, n_targets=opt.n_targets,
        epochs=opt.epoch, batch_size=opt.batch_size, lr=opt.optim_start_lr,
        en_d_model=opt.en_d_model, en_dropout=opt.en_dropout,
        seq_shards=opt.seq_shards, encoder_sub_sequence=sub_seq,
        specaugment=specaug,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
