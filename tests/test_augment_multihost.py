"""Tests for SpecAugment, multihost helpers, and launcher retries."""

import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp

from pytorch_kaldi_asr_tpu.ops.specaugment import spec_augment
from pytorch_kaldi_asr_tpu.parallel.multihost import shard_for_process


def test_spec_augment_masks_bands_and_spans():
    rng = jax.random.key(0)
    b, t, d = 3, 40, 20
    feats = jnp.ones((b, t, d))
    mask = jnp.ones((b, t), jnp.uint8)
    out = np.asarray(spec_augment(rng, feats, mask, n_freq_masks=1,
                                  freq_width=5, n_time_masks=1,
                                  time_width=10))
    assert out.shape == (b, t, d)
    zero_fraction = (out == 0).mean()
    assert 0.0 < zero_fraction < 0.6
    # a freq mask zeroes whole feature columns for all frames of an utt
    col_zero = (out[0] == 0).all(axis=0)
    assert col_zero.sum() <= 5
    # different rng, different masks
    out2 = np.asarray(spec_augment(jax.random.key(1), feats, mask,
                                   n_freq_masks=1, freq_width=5,
                                   n_time_masks=1, time_width=10))
    assert (out != out2).any()


def test_spec_augment_respects_utterance_length():
    rng = jax.random.key(2)
    feats = jnp.ones((1, 50, 8))
    mask = jnp.zeros((1, 50), jnp.uint8).at[:, :10].set(1)  # 10 real frames
    out = np.asarray(spec_augment(rng, feats, mask, n_freq_masks=0,
                                  freq_width=0, n_time_masks=2,
                                  time_width=40, max_time_frac=0.2))
    # time masks bounded by 20% of 10 frames = 2: padding region untouched
    masked_frames = (out[0, :10] == 0).all(axis=1).sum()
    assert masked_frames <= 4  # two masks x <=2 frames
    assert (out[0, 10:] == 1).all()


def test_train_step_with_specaugment_runs():
    from pytorch_kaldi_asr_tpu.models.transformer import init_transformer
    from pytorch_kaldi_asr_tpu.train import create_train_state, \
        make_train_step
    from tests.test_models import small_cfg

    cfg = small_cfg()
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    state, tx = create_train_state(params)
    step = make_train_step(cfg, tx, donate=False,
                           specaugment={"freq_width": 3, "time_width": 4})
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(2, 10, cfg.src_dim))
                      .astype(np.float32))
    mask = jnp.ones((2, 10), jnp.uint8)
    tgt = jnp.asarray(np.array([[2, 4, 3], [2, 5, 3]], np.int32))
    tmask = jnp.ones_like(tgt, dtype=jnp.uint8)
    state, m = step(state, src, mask, tgt, tmask)
    assert np.isfinite(float(m["loss"]))


def test_shard_for_process():
    items = list(range(10))
    shards = [shard_for_process(items, i, 3) for i in range(3)]
    # equal lengths on every host (unequal step counts deadlock pjit);
    # the ragged remainder is dropped
    assert [len(s) for s in shards] == [3, 3, 3]
    assert sorted(sum(shards, [])) == items[:9]
    assert shards[0] == [0, 1, 2]


def test_launcher_retries(tmp_path):
    # a command that fails until a marker file exists, created on first run
    script = tmp_path / "flaky.sh"
    marker = tmp_path / "marker"
    script.write_text(
        f"#!/bin/bash\nif [ -f {marker} ]; then exit 0; fi\n"
        f"touch {marker}; exit 1\n"
    )
    script.chmod(0o755)
    log = tmp_path / "log.txt"
    proc = subprocess.run(
        [sys.executable, "-m", "pytorch_kaldi_asr_tpu.parallel.launch",
         "--retries", "2", str(log), "bash", str(script)],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0  # second attempt succeeded
    # without retries it fails
    marker.unlink()
    proc2 = subprocess.run(
        [sys.executable, "-m", "pytorch_kaldi_asr_tpu.parallel.launch",
         str(log), "bash", str(script)],
        capture_output=True, text=True,
    )
    assert proc2.returncode == 1
