"""SpecAugment: gradient behavior and the train_am -specaugment wiring
(ops/specaugment.py's mask semantics are pinned by
tests/test_augment_multihost.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from pytorch_kaldi_asr_tpu.ops.specaugment import spec_augment


def test_grads_flow_and_masked_cells_get_zero_grad():
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(2, 24, 8)).astype(np.float32) + 1.0)
    mask = jnp.ones((2, 24), jnp.uint8)
    key = jax.random.key(2)

    def loss(s):
        return (spec_augment(key, s, mask, n_freq_masks=1, freq_width=3,
                             n_time_masks=1, time_width=6) ** 2).sum()

    g = np.asarray(jax.grad(loss)(src))
    assert np.isfinite(g).all()
    out = np.asarray(spec_augment(key, src, mask, n_freq_masks=1,
                                  freq_width=3, n_time_masks=1,
                                  time_width=6))
    # masked (zeroed) cells contribute zero gradient; kept cells don't
    np.testing.assert_array_equal(g[out == 0.0], 0.0)
    assert (g[out != 0.0] != 0.0).any()


def test_same_key_reproduces_masks():
    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.normal(size=(3, 30, 10)).astype(np.float32) + 1.0)
    mask = jnp.ones((3, 30), jnp.uint8)
    a = np.asarray(spec_augment(jax.random.key(7), src, mask))
    b = np.asarray(spec_augment(jax.random.key(7), src, mask))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(spec_augment(jax.random.key(8), src, mask))
    assert not np.array_equal(a, c)


def test_train_am_wires_specaugment(tmp_path):
    """-specaugment trains end to end (tiny corpus) and saves a model."""
    from pytorch_kaldi_asr_tpu.io.kaldi_io import ArkWriter
    from pytorch_kaldi_asr_tpu.recipes.train_am import main

    rng = np.random.default_rng(0)
    for split in ("train", "dev"):
        d = tmp_path / split
        d.mkdir()
        with ArkWriter(str(d / "feats.ark"), str(d / "feats.scp")) as w:
            lines = []
            for i in range(6):
                t = 18 + 2 * i
                w.write(f"u{i}", rng.normal(size=(t, 8)).astype(np.float32))
                ids = " ".join(str(int(x)) for x in
                               rng.integers(0, 5, size=t))
                lines.append(f"u{i} {ids}\n")
        (d / "ali.txt").write_text("".join(lines))
    save = tmp_path / "am"
    rc = main([
        "-read_train_dir", str(tmp_path / "train"),
        "-read_dev_dir", str(tmp_path / "dev"),
        "-save_model_dir", str(save),
        "-encoder_type", "tdnnf", "-epoch", "2", "-batch_size", "3",
        "-n_targets", "5",
        "-specaugment", "-specaug_time_width", "4",
        "-specaug_freq_width", "2",
    ])
    assert rc == 0
    assert any(save.iterdir())
