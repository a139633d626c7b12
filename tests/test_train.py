"""Tests for loss, schedule, train step, checkpointing, and combining."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pytorch_kaldi_asr_tpu.models.transformer import (
    init_transformer,
)
from pytorch_kaldi_asr_tpu.train import (
    cross_entropy_loss,
    hyperbolic_schedule,
    create_train_state,
    make_train_step,
    make_eval_step,
    save_checkpoint,
    load_checkpoint,
    average_params,
)
from tests.test_models import small_cfg


def _toy_data(cfg, batch=4, src_len=10, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.normal(size=(batch, src_len, cfg.src_dim)).astype(np.float32)
    src_mask = np.ones((batch, src_len), np.uint8)
    tgt = np.stack([
        np.array([2, 4, 5, 6, 3, 0], np.int32),
        np.array([2, 6, 7, 8, 3, 0], np.int32),
        np.array([2, 5, 4, 3, 0, 0], np.int32),
        np.array([2, 7, 3, 0, 0, 0], np.int32),
    ])[:batch]
    tgt_mask = (tgt != 0).astype(np.uint8)
    return (jnp.asarray(src), jnp.asarray(src_mask), jnp.asarray(tgt),
            jnp.asarray(tgt_mask))


def test_hyperbolic_schedule():
    sched = hyperbolic_schedule(0.001, 25000.0)
    assert sched(0) == pytest.approx(0.001)
    assert sched(25000) == pytest.approx(0.0005)
    assert sched(75000) == pytest.approx(0.00025)


def test_cross_entropy_ignores_pad_and_counts():
    logits = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 3, 5)).astype(np.float32)
    )
    goal = jnp.asarray(np.array([[4, 3, 0], [2, 0, 0]], np.int32))
    loss, n_correct, n_words = cross_entropy_loss(logits, goal)
    assert int(n_words) == 3  # PAD positions excluded
    # manual
    logp = np.asarray(jax.nn.log_softmax(logits, -1))
    expect = -(logp[0, 0, 4] + logp[0, 1, 3] + logp[1, 0, 2])
    np.testing.assert_allclose(float(loss), expect, rtol=1e-6)


def test_label_smoothing_matches_manual():
    logits = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 2, 4)).astype(np.float32)
    )
    goal = jnp.asarray(np.array([[3, 1]], np.int32))
    loss, *_ = cross_entropy_loss(logits, goal, smoothing=True, eps=0.1)
    logp = np.asarray(jax.nn.log_softmax(logits, -1))[0]
    one_hot = np.eye(4)[[3, 1]]
    smooth = one_hot * 0.9 + (1 - one_hot) * (0.1 / 3)
    expect = -(smooth * logp).sum()
    np.testing.assert_allclose(float(loss), expect, rtol=1e-5)


def test_train_step_overfits_and_freezes_lda():
    cfg = small_cfg()
    lda_in = cfg.src_dim * len(cfg.lda_context)
    lda_mat = np.random.default_rng(2).normal(size=(20, lda_in + 1)) * 0.2
    params = init_transformer(jax.random.PRNGKey(0), cfg, lda_mat)
    lda_before = np.asarray(params["encoder"]["lda"]["w"]).copy()

    state, tx = create_train_state(params, start_lr=0.003,
                                   soft_coefficient=1e9)
    train_step = make_train_step(cfg, tx, donate=False)
    data = _toy_data(cfg)

    losses = []
    for _ in range(200):
        state, m = train_step(state, *data)
        losses.append(float(m["loss"]) / float(m["n_words"]))
    assert losses[-1] < losses[0] * 0.5, losses[::40]
    np.testing.assert_array_equal(
        np.asarray(state.params["encoder"]["lda"]["w"]), lda_before
    )
    assert int(state.step) == 200


def test_eval_step_valid_mask_excludes_tail_rows():
    cfg = small_cfg()
    params = init_transformer(jax.random.PRNGKey(1), cfg)
    eval_step = make_eval_step(cfg)
    src, src_mask, tgt, tgt_mask = _toy_data(cfg)
    full = eval_step(params, src, src_mask, tgt, tgt_mask,
                     jnp.ones(4, jnp.uint8))
    half = eval_step(params, src, src_mask, tgt, tgt_mask,
                     jnp.asarray([1, 1, 0, 0], jnp.uint8))
    assert int(half["n_words"]) < int(full["n_words"])
    # masked rows contribute exactly zero
    manual = eval_step(params, src[:2], src_mask[:2], tgt[:2], tgt_mask[:2],
                       jnp.ones(2, jnp.uint8))
    np.testing.assert_allclose(float(half["loss"]), float(manual["loss"]),
                               rtol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    cfg = small_cfg()
    params = init_transformer(jax.random.PRNGKey(3), cfg)
    path = save_checkpoint(str(tmp_path / "epoch.7"), params, cfg, epoch=7,
                           step=123, extra={"note": "x"})
    ckpt = load_checkpoint(path)
    assert ckpt["epoch"] == 7 and ckpt["step"] == 123
    assert ckpt["cfg"] == cfg
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, ckpt["params"],
    )


def test_average_params_progressive_equals_mean():
    cfg = small_cfg()
    trees = [init_transformer(jax.random.PRNGKey(i), cfg) for i in range(3)]
    mean = average_params(trees)
    running = trees[0]
    for i, t in enumerate(trees[1:], start=1):
        running = average_params(running=running, new=t, count=i)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        mean, running,
    )


def test_preemption_checkpoint_and_resume(tmp_path):
    """SIGUSR1 mid-training stops after the in-flight batch, saves a
    'preempt' checkpoint (params+opt+step), and resume=True continues
    from it, re-running the interrupted epoch."""
    import os
    import signal
    import threading

    from pytorch_kaldi_asr_tpu.data.loader import BatchLoader
    from pytorch_kaldi_asr_tpu.models.transformer import init_transformer
    from pytorch_kaldi_asr_tpu.train.checkpoint import read_checkpoint_config
    from pytorch_kaldi_asr_tpu.train.loop import train_model
    from tests.test_models import small_cfg

    cfg = small_cfg()
    params = init_transformer(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(3)
    triples = [
        (f"u{i}", rng.normal(size=(8, cfg.src_dim)).astype(np.float32),
         np.array([2, 4, 5, 3]))
        for i in range(8)
    ]
    train_loader = BatchLoader(triples, batch_size=4, mode="drop")
    dev_loader = BatchLoader(triples, batch_size=4, mode="all")
    test_loader = dev_loader
    mdir = str(tmp_path / "exp")

    # fire the signal shortly after training starts; epochs is huge so
    # the run is guaranteed to still be inside the epoch loop
    timer = threading.Timer(3.0, os.kill, (os.getpid(), signal.SIGUSR1))
    timer.start()
    try:
        train_model(params, cfg, train_loader, dev_loader, test_loader,
                    mdir, epochs=100000, save_interval=100000,
                    preempt_signal="SIGUSR1", metrics_path=None)
    finally:
        timer.cancel()
    ppath = os.path.join(mdir, "preempt")
    assert os.path.isdir(ppath), "no preemption checkpoint written"
    _, meta = read_checkpoint_config(ppath)
    assert meta["step"] > 0
    interrupted = meta["preempted_in_epoch"]
    assert interrupted >= 1

    # resume: prefers the preempt snapshot and completes a short run
    # (fresh init tree — the first run's jitted step donated the old one)
    params2 = init_transformer(jax.random.PRNGKey(3), cfg)
    best_params, best_epoch, best_accu, _ = train_model(
        params2, cfg, train_loader, dev_loader, test_loader, mdir,
        epochs=interrupted + 1, save_interval=1, resume=True,
        preempt_signal=None)
    assert best_epoch >= interrupted
    assert best_accu >= 0


def test_train_result_preempted_flag(tmp_path):
    """train_model reports preempted=False on a normal run (the CLI keys
    its exit code and the combine stage off this flag)."""
    from pytorch_kaldi_asr_tpu.data.loader import BatchLoader
    from pytorch_kaldi_asr_tpu.models.transformer import init_transformer
    from pytorch_kaldi_asr_tpu.train.loop import train_model
    from tests.test_models import small_cfg

    cfg = small_cfg()
    params = init_transformer(jax.random.PRNGKey(5), cfg)
    rng = np.random.default_rng(5)
    triples = [
        (f"u{i}", rng.normal(size=(8, cfg.src_dim)).astype(np.float32),
         np.array([2, 4, 5, 3]))
        for i in range(4)
    ]
    loader = BatchLoader(triples, batch_size=4, mode="drop")
    ev = BatchLoader(triples, batch_size=4, mode="all")
    res = train_model(params, cfg, loader, ev, ev, str(tmp_path / "exp"),
                      epochs=1, save_interval=1, preempt_signal=None)
    assert res.preempted is False


def test_train_model_specaugment_plumbs_to_step(tmp_path):
    """train_model(specaugment=...) reaches make_train_step: the run
    trains and the augmented path produces finite metrics."""
    from pytorch_kaldi_asr_tpu.data.loader import BatchLoader
    from pytorch_kaldi_asr_tpu.models.transformer import init_transformer
    from pytorch_kaldi_asr_tpu.train.loop import train_model
    from tests.test_models import small_cfg

    cfg = small_cfg()
    params = init_transformer(jax.random.PRNGKey(5), cfg)
    rng = np.random.default_rng(5)
    triples = [
        (f"u{i}", rng.normal(size=(8, cfg.src_dim)).astype(np.float32),
         np.array([2, 4, 5, 3]))
        for i in range(4)
    ]
    loader = BatchLoader(triples, batch_size=4, mode="drop")
    ev = BatchLoader(triples, batch_size=4, mode="all")
    res = train_model(
        params, cfg, loader, ev, ev, str(tmp_path / "exp"),
        epochs=1, save_interval=1, preempt_signal=None,
        specaugment={"freq_width": 2, "time_width": 3})
    assert res.preempted is False
    assert np.isfinite(res.best_accu)


def test_train_cli_exits_preempt_code(monkeypatch, tmp_path):
    """recipes/train.py: a preempted training run exits with the
    launcher's PREEMPT_EXIT_CODE and skips the combine stage."""
    from pytorch_kaldi_asr_tpu.parallel.launch import PREEMPT_EXIT_CODE
    from pytorch_kaldi_asr_tpu.recipes import train as train_cli
    from pytorch_kaldi_asr_tpu.train.loop import TrainResult

    combined = {"called": False}
    monkeypatch.setattr(train_cli, "load_checkpoint",
                        lambda p: {"params": {}, "cfg": None})
    monkeypatch.setattr(train_cli, "read_vocab", lambda p: {})
    monkeypatch.setattr(train_cli, "make_batch_loader",
                        lambda *a, **k: None)
    monkeypatch.setattr(
        train_cli, "train_model",
        lambda *a, **k: TrainResult({}, 0, 0.0, True))
    monkeypatch.setattr(
        train_cli, "combine_checkpoints",
        lambda *a, **k: combined.__setitem__("called", True))
    rc = train_cli.main([
        "-read_train_dir", "x", "-read_dev_dir", "x", "-read_test_dir", "x",
        "-read_vocab_file", "x", "-load_model_file", "x",
        "-save_model_dir", str(tmp_path)])
    assert rc == PREEMPT_EXIT_CODE
    assert combined["called"] is False
