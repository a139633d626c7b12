"""Epoch driver: the reference's train()/train_epoch()/combine() control flow
(train.py:127-322) over jitted steps.

Cadence preserved: per epoch — full train pass, then eval on 10 train
batches, full dev, full test (train.py:229-249); best model tracked by dev
token accuracy (not WER, train.py:241-244); checkpoints written every
``save_interval`` epochs plus every epoch inside the final window
(train.py:252); final combine averages up to 30 checkpoints counting down
from the best epoch and keeps the prefix-average with the best dev accuracy
(train.py:287-322, 397-402)."""

from __future__ import annotations

import os
import time
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


def jnp_int32(x):
    return jnp.asarray(x, jnp.int32)

from pytorch_kaldi_asr_tpu.train.checkpoint import (
    average_params,
    load_checkpoint,
    save_checkpoint,
)
from pytorch_kaldi_asr_tpu.train.state import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from pytorch_kaldi_asr_tpu.utils.logging import info, procedure, warning


def _fast_forward_counts(opt_state, step):
    """Set every integer ``count`` leaf in a fresh optax state to ``step``.

    Used when resuming from a checkpoint that has no saved optimizer state:
    Adam moments are unrecoverable, but the LR schedule
    (scale_by_schedule's count) must continue from the global step — a
    fresh count would silently jump the LR back to start_lr mid-training."""
    step = jnp_int32(step)

    def fix(path, leaf):
        names = [getattr(p, "name", None) for p in path]
        if "count" in names:
            return jnp.broadcast_to(step, jnp.shape(leaf)).astype(leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(fix, opt_state)


def run_train_epoch(state, train_step, loader, prefetch=None,
                    stop_flag=None):
    """One full training pass; returns (state, loss/word, accuracy).

    Metrics stay on-device during the epoch (jnp accumulators, converted
    once at the end): a per-step ``float()`` would force a host sync after
    every step and stall the device while the host pads the next batch.
    ``stop_flag`` (a callable) ends the pass after the current batch —
    the preemption hook."""
    total_loss = total_correct = total_words = None
    batches = prefetch(loader) if prefetch else loader
    for batch in batches:
        if stop_flag is not None and stop_flag():
            break
        state, metrics = train_step(
            state, batch.src, batch.src_mask, batch.tgt, batch.tgt_mask
        )
        if total_loss is None:
            total_loss = metrics["loss"]
            total_correct = metrics["n_correct"]
            total_words = metrics["n_words"]
        else:
            total_loss = total_loss + metrics["loss"]
            total_correct = total_correct + metrics["n_correct"]
            total_words = total_words + metrics["n_words"]
    if total_loss is None:
        return state, 0.0, 0.0
    total_loss = float(total_loss)
    total_correct = float(total_correct)
    total_words = float(total_words)
    return state, total_loss / max(total_words, 1), total_correct / max(total_words, 1)


def run_eval(params, eval_step, loader, max_batches=None):
    """Evaluation pass; respects the loader's ``valid`` tail mask.
    ``max_batches`` implements the reference's 10-batch train-set eval."""
    total_loss = total_correct = total_words = 0.0
    for i, batch in enumerate(loader):
        metrics = eval_step(
            params, batch.src, batch.src_mask, batch.tgt, batch.tgt_mask,
            batch.valid,
        )
        total_loss += float(metrics["loss"])
        total_correct += float(metrics["n_correct"])
        total_words += float(metrics["n_words"])
        if max_batches is not None and i + 1 >= max_batches:
            break
    return total_loss / max(total_words, 1), total_correct / max(total_words, 1)


def latest_epoch_checkpoint(save_model_dir):
    """(path, epoch) of the newest epoch.N checkpoint dir, or (None, 0)."""
    best = (None, 0)
    if os.path.isdir(save_model_dir):
        for name in os.listdir(save_model_dir):
            if name.startswith("epoch.") and name[6:].isdigit():
                e = int(name[6:])
                if e > best[1]:
                    best = (os.path.join(save_model_dir, name), e)
    return best


class TrainResult(NamedTuple):
    """What train_model hands back.  ``preempted`` means the run stopped
    on the preemption signal after saving the ``preempt`` checkpoint —
    the caller should skip post-training work and exit with the
    launcher's resubmit code (parallel/launch.py PREEMPT_EXIT_CODE)."""

    best_params: Any
    best_epoch: int
    best_accu: float
    preempted: bool


def train_model(
    params,
    cfg,
    train_loader,
    dev_loader,
    test_loader,
    save_model_dir,
    *,
    epochs=500,
    start_lr=0.001,
    soft_coefficient=25000.0,
    save_interval=1,
    smoothing=False,
    seed=0,
    mesh=None,
    eval_train_batches=10,
    resume=False,
    save_opt_state=True,
    metrics_path=None,
    preempt_signal="SIGTERM",
    specaugment=None,
):
    """Full training driver; returns a ``TrainResult`` (best_params,
    best_epoch, best_accu, preempted).

    ``resume=True`` continues from the newest epoch.N checkpoint (params,
    optimizer state, and step all restored — unlike the reference, where
    resumption was manual and dropped optimizer state, train.py:341-342).

    ``preempt_signal`` (default SIGTERM; None disables) arms
    preemption-aware checkpointing: on the signal, training stops after
    the in-flight batch and saves a ``preempt`` checkpoint (params +
    optimizer state + true global step); ``resume=True`` prefers it and
    re-runs the interrupted epoch from the mid-epoch state."""
    os.makedirs(save_model_dir, exist_ok=True)
    preempted = {"flag": False}
    if preempt_signal:
        import signal as _signal

        signum = (getattr(_signal, preempt_signal)
                  if isinstance(preempt_signal, str) else preempt_signal)

        def _on_preempt(_sig, _frame):
            warning("preemption signal received: will checkpoint after "
                    "the current batch")
            preempted["flag"] = True

        try:
            _signal.signal(signum, _on_preempt)
        except ValueError:  # not the main thread (tests)
            pass
    state, tx = create_train_state(
        params, start_lr=start_lr, soft_coefficient=soft_coefficient,
        rng=jax.random.key(seed, impl="rbg"),
    )
    start_epoch = 1
    resumed_epoch = 0
    if resume:
        path, last_epoch = latest_epoch_checkpoint(save_model_dir)
        preempt_path = os.path.join(save_model_dir, "preempt")
        if os.path.isdir(preempt_path):
            from pytorch_kaldi_asr_tpu.train.checkpoint import (
                read_checkpoint_config,
            )

            _, pmeta = read_checkpoint_config(preempt_path)
            # the preempt snapshot is newer than any epoch.N at or below
            # its recorded epoch; prefer it so no mid-epoch work is lost
            if path is None or pmeta.get("epoch", -1) >= last_epoch:
                path, last_epoch = preempt_path, pmeta.get("epoch", 0)
                info("found preemption checkpoint (interrupted epoch %d)",
                     last_epoch + 1)
        if path is not None:
            ckpt = load_checkpoint(path, template_opt_state=state.opt_state)
            if ckpt["opt_state"] is not None:
                opt_state = ckpt["opt_state"]
            else:
                # no saved optimizer state: Adam moments restart, but the
                # LR schedule must continue from the global step
                warning(
                    "%s has no opt_state: Adam moments reset; LR schedule "
                    "fast-forwarded to step %d", path, ckpt["step"])
                opt_state = _fast_forward_counts(state.opt_state,
                                                 ckpt["step"])
            state = TrainState(
                ckpt["params"],
                opt_state,
                jnp_int32(ckpt["step"]),
                state.rng,
            )
            start_epoch = last_epoch + 1
            resumed_epoch = last_epoch
            info("resuming from %s (epoch %d, step %d)", path, last_epoch,
                 ckpt["step"])
    train_step = make_train_step(cfg, tx, smoothing=smoothing, mesh=mesh,
                                 specaugment=specaugment)
    eval_step = make_eval_step(cfg, mesh=mesh)

    metrics = None
    if metrics_path:
        from pytorch_kaldi_asr_tpu.utils.metrics import MetricsLogger

        metrics = MetricsLogger(metrics_path)

    # start below zero so the first epoch always becomes the initial best
    # (with exactly-zero dev accuracy the reference's `>` comparison leaves
    # best_epoch at 0 and the combine stage crashes on missing checkpoints).
    # When resuming past the final epoch (the loop runs zero times), the
    # resumed checkpoint — not the passed-in init params — is the best.
    best_accu, best_epoch = -1.0, resumed_epoch
    best_params = jax.device_get(state.params) if resumed_epoch else params
    if resumed_epoch:
        # re-establish the pre-crash best from the dev_accu each epoch
        # checkpoint records — otherwise the first post-resume epoch always
        # becomes "best" even when a better earlier epoch exists
        from pytorch_kaldi_asr_tpu.train.checkpoint import (
            read_checkpoint_config,
        )

        for name in os.listdir(save_model_dir):
            if not (name.startswith("epoch.") and name[6:].isdigit()):
                continue
            cpath = os.path.join(save_model_dir, name)
            try:
                _, meta = read_checkpoint_config(cpath)
            except (OSError, ValueError):
                continue
            accu = meta.get("dev_accu")
            if accu is not None and accu > best_accu:
                best_accu, best_epoch = accu, int(name[6:])
                best_params = None  # lazily loaded below if it stays best
        if best_params is None:
            best_params = load_checkpoint(
                os.path.join(save_model_dir, f"epoch.{best_epoch}")
            )["params"]
            info("restored best-so-far from epoch %d (dev accu %3.2f %%)",
                 best_epoch, 100 * best_accu)
    train_start = time.time()
    for epoch in range(start_epoch, epochs + 1):
        info("trainning epoch %d.", epoch)
        start = time.time()
        # single-device path: keep 2 batches in flight so host-side padding
        # overlaps device compute (with a mesh, pjit places shards itself)
        _prefetch = None
        if mesh is None:
            import functools

            import jax.numpy as jnp

            from pytorch_kaldi_asr_tpu.data.loader import prefetch_to_device

            # when the step computes in bf16 the features are cast to bf16
            # at its first op anyway — casting on the host instead halves
            # host->device bytes with bit-identical step numerics.  The
            # blstm encoder is the exception: it upcasts raw features to
            # f32 first (encoders.py blstm_encode), so it keeps f32
            # transfers.
            tdt = (jnp.bfloat16
                   if (cfg.compute_dtype == jnp.bfloat16
                       and cfg.encoder_type != "blstm")
                   else None)
            _prefetch = functools.partial(prefetch_to_device,
                                          transfer_dtype=tdt)
        state, loss, accu = run_train_epoch(
            state, train_step, train_loader, prefetch=_prefetch,
            stop_flag=lambda: preempted["flag"])
        if preempted["flag"]:
            ppath = os.path.join(save_model_dir, "preempt")
            save_checkpoint(
                ppath, jax.device_get(state.params), cfg, epoch=epoch - 1,
                step=int(state.step),
                opt_state=(jax.device_get(state.opt_state)
                           if save_opt_state else None),
                extra={"preempted_in_epoch": epoch},
            )
            info("preempted: saved %s at step %d (epoch %d interrupted); "
                 "rerun with -resume to continue", ppath, int(state.step),
                 epoch)
            if best_accu < 0:
                # no epoch completed yet: the initial ``params`` tree was
                # donated by the jitted step — snapshot the live state so
                # the final best-save below stays valid
                best_params = jax.device_get(state.params)
                best_epoch = max(epoch - 1, 0)
            break
        info(
            "-----(Training)----- accuracy: %3.2f %%, elapse: %3.2f min",
            100 * accu, (time.time() - start) / 60,
        )

        _, tr_accu = run_eval(state.params, eval_step, train_loader,
                              max_batches=eval_train_batches)
        info(
            "-----(evaluating train set for %d batch)----- accuracy: %3.2f %%",
            eval_train_batches, 100 * tr_accu,
        )
        _, dev_accu = run_eval(state.params, eval_step, dev_loader)
        info("-----(evaluating dev set)----- accuracy: %3.2f %%", 100 * dev_accu)
        if dev_accu > best_accu:
            # snapshot to host: the jitted step donates the state, so keeping
            # a device reference would be invalidated by the next epoch
            best_accu, best_epoch = dev_accu, epoch
            best_params = jax.device_get(state.params)
        _, test_accu = run_eval(state.params, eval_step, test_loader)
        info("-----(evaluating test set)----- accuracy: %3.2f %%", 100 * test_accu)

        if metrics is not None:
            metrics.log(
                epoch=epoch, step=int(state.step), train_loss=loss,
                train_accu=accu, dev_accu=dev_accu, test_accu=test_accu,
            )
        if epoch % save_interval == 0 or epochs - epoch < save_interval:
            path = os.path.join(save_model_dir, f"epoch.{epoch}")
            save_checkpoint(
                path, state.params, cfg, epoch=epoch, step=int(state.step),
                opt_state=state.opt_state if save_opt_state else None,
                extra={"dev_accu": float(dev_accu)},
            )
            info("checkpoint of epoch %d is saved to %s", epoch, path)

    info(
        "trainning finish. time consume: %3.2f minute; "
        "best valid accuracy: %3.2f %%, on epoch %d",
        (time.time() - train_start) / 60, 100 * best_accu, best_epoch,
    )
    best_path = os.path.join(
        save_model_dir, f"best.epoch{best_epoch}.accu{100 * best_accu:3.2f}"
    )
    save_checkpoint(best_path, best_params, cfg, epoch=best_epoch,
                    extra={"dev_accu": best_accu})
    info("best model is saved to %s", best_path)
    if metrics is not None:
        metrics.close()
    return TrainResult(best_params, best_epoch, best_accu,
                       preempted["flag"])


def combine_checkpoints(save_model_dir, best_epoch=None, cfg=None,
                        eval_loader=None, *, num_model=30, mesh=None,
                        paths=None):
    """Progressive checkpoint averaging ("combine", train.py:284-322):
    average epochs ``best_epoch, best_epoch-1, ...`` (or an explicit
    ``paths`` list, best first — the standalone combine.py contract),
    evaluating each prefix average on ``eval_loader`` and keeping the best.
    Saves ``combined.accuXX`` under ``save_model_dir`` and returns
    (params, accu, path)."""
    procedure("combining model with model averaging...")
    eval_step = make_eval_step(cfg, mesh=mesh)

    if paths is not None:
        candidates = list(paths)
    else:
        candidates = []
        for e in range(best_epoch, max(best_epoch - num_model, 0), -1):
            path = os.path.join(save_model_dir, f"epoch.{e}")
            if os.path.isdir(path):
                candidates.append(path)
        best_path = os.path.join(save_model_dir, f"epoch.{best_epoch}")
        if not os.path.isdir(best_path):
            # save_interval > 1 can leave the best epoch itself unsaved;
            # the best.epochN.* checkpoint (written at train end) carries
            # those exact params — lead the average with it rather than
            # silently averaging without the best model
            import glob as _glob

            best_saved = sorted(_glob.glob(
                os.path.join(save_model_dir, f"best.epoch{best_epoch}.*")))
            if best_saved:
                candidates.insert(0, best_saved[-1])
            else:
                warning(
                    "epoch.%d (the best epoch) has no checkpoint; "
                    "averaging the %d nearest saved epochs instead",
                    best_epoch, len(candidates))
    if not candidates:
        raise FileNotFoundError(
            f"no epoch.* checkpoints under {save_model_dir}"
        )
    info("model loaded (%d candidates)", len(candidates))

    template = None
    best_accu, best_params = -1.0, None
    running = None
    for i, path in enumerate(candidates):
        # reuse one parameter template across loads: load_checkpoint
        # otherwise re-runs init_transformer (a full random init) per
        # candidate just to learn the tree structure
        ckpt = load_checkpoint(path, template_params=template)
        template = ckpt["params"]
        if i == 0:
            running = ckpt["params"]
        else:
            running = average_params(running=running, new=ckpt["params"],
                                     count=i)
        info("averaging %d models", i + 1)
        _, accu = run_eval(running, eval_step, eval_loader)
        info("-----(evaluating combining set)----- accuracy: %3.2f %%",
             100 * accu)
        if accu > best_accu:
            best_accu, best_params = accu, running

    info("best combined model with accuracy: %3.2f %%", 100 * best_accu)
    out = os.path.join(save_model_dir, f"combined.accu{100 * best_accu:3.2f}")
    save_checkpoint(out, best_params, cfg, extra={"combined_accu": best_accu})
    return best_params, best_accu, out
