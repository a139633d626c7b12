"""Long-form sequence-parallel AM training (recipes/longform-conformer).

The reference trims utterances to <500 frames because one GPU must hold
the whole sequence (reference trim_instance_length.py:37-59); the
long-form path instead shards the TIME axis over the mesh
(parallel/sequence.py) and trains the hybrid AM on it
(recipes/train_am.py -seq_shards).  Pinned here on the 8-device virtual
CPU mesh (tests/conftest.py)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_corpus(tmp_path, n_train=12, n_dev=4, seed=0):
    from pytorch_kaldi_asr_tpu.tools.make_synthetic_data import make_dataset

    shape = dict(min_words=20, max_words=30, frames_per_word=8)
    wm = make_dataset(os.path.join(tmp_path, "train"), n_train, seed=seed,
                      **shape)
    make_dataset(os.path.join(tmp_path, "dev"), n_dev, seed=seed + 1,
                 word_means=wm, **shape)


@pytest.mark.parametrize(
    "enc",
    ["banded",
     # the conformer variant re-pins the same CE plumbing over the sp
     # conformer encoder (41 s of compiles); the sp conformer itself is
     # equality-pinned in test_sequence_parallel.py — keep it nightly
     pytest.param("conformer", marks=pytest.mark.slow)])
def test_sp_frame_ce_loss_matches_single_device(enc):
    """Dropout-free SP frame CE == models/am.py frame_ce_loss exactly
    (same loss sum, same correct/total counts)."""
    import jax
    import jax.numpy as jnp

    from pytorch_kaldi_asr_tpu.models import am
    from pytorch_kaldi_asr_tpu.models.transformer import TransformerConfig
    from pytorch_kaldi_asr_tpu.parallel.sequence import (
        make_seq_mesh,
        sp_frame_ce_loss,
    )

    cfg = TransformerConfig(
        src_dim=8, vocab_size=11, en_layers=2, n_head=2, en_d_model=32,
        d_k=16, d_v=16, encoder_max_len=64, encoder_sub_sequence=(-6, 2),
        en_dropout=0.0, encoder_type=enc,
    )
    n_targets = 11
    params = am.init_am(jax.random.PRNGKey(0), cfg, n_targets)
    rng = np.random.default_rng(1)
    b, s = 2, 64
    src = jnp.asarray(rng.normal(size=(b, s, cfg.src_dim)),
                      dtype=jnp.float32)
    mask = jnp.asarray((np.arange(s)[None, :]
                        < np.array([60, 41])[:, None]).astype(np.uint8))
    tgt = jnp.asarray(rng.integers(0, n_targets, size=(b, s)),
                      dtype=jnp.int32)
    utt_valid = jnp.asarray([1, 1], jnp.uint8)

    mesh = make_seq_mesh(8)
    got = sp_frame_ce_loss(params, cfg, src, mask, tgt, mesh,
                           utt_valid=utt_valid)
    want = am.frame_ce_loss(params, cfg, src, mask, tgt,
                            utt_valid=utt_valid)
    np.testing.assert_allclose(float(got[0]), float(want[0]), rtol=2e-5)
    assert int(got[1]) == int(want[1])
    assert int(got[2]) == int(want[2])


def test_sp_frame_ce_loss_rejects_fold():
    import jax

    from pytorch_kaldi_asr_tpu.models import am
    from pytorch_kaldi_asr_tpu.models.transformer import TransformerConfig
    from pytorch_kaldi_asr_tpu.parallel.sequence import (
        make_seq_mesh,
        sp_frame_ce_loss,
    )

    cfg = TransformerConfig(src_dim=4, vocab_size=5, src_fold=2,
                            encoder_type="banded", encoder_max_len=16)
    params = am.init_am(jax.random.PRNGKey(0), cfg, 5)
    mesh = make_seq_mesh(2)
    with pytest.raises(ValueError, match="src_fold"):
        sp_frame_ce_loss(params, cfg, np.zeros((1, 16, 4), np.float32),
                         np.ones((1, 16), np.uint8),
                         np.zeros((1, 16), np.int32), mesh)


@pytest.mark.slow
def test_train_am_seq_shards_learns(tmp_path):
    """The -seq_shards path trains: 8-way time-sharded Conformer AM
    reaches high frame accuracy on the word-conditioned synthetic task.
    slow-marked (104 s in the round-3 fast-suite budget audit);
    test_train_am_seq_shards_smoke keeps the path in the fast suite."""
    from pytorch_kaldi_asr_tpu.recipes.train_am import train_am

    _make_corpus(str(tmp_path))
    params, cfg, acc = train_am(
        str(tmp_path / "train"), str(tmp_path / "dev"),
        str(tmp_path / "am"), encoder_type="conformer", epochs=3,
        batch_size=4, seq_shards=8, encoder_sub_sequence=(-16, 0),
        en_d_model=64, lr=0.001,
    )
    assert acc > 0.7
    # static pads divide evenly across the shards
    assert cfg.encoder_max_len % 8 == 0


def test_train_am_seq_shards_smoke(tmp_path):
    """Fast-suite cover for the -seq_shards training path: one epoch on a
    tiny corpus runs end-to-end and reports a finite dev accuracy (the
    learning claim itself is the slow-marked test above)."""
    from pytorch_kaldi_asr_tpu.recipes.train_am import train_am

    _make_corpus(str(tmp_path), n_train=4, n_dev=2)
    params, cfg, acc = train_am(
        str(tmp_path / "train"), str(tmp_path / "dev"),
        str(tmp_path / "am"), encoder_type="conformer", epochs=1,
        batch_size=2, seq_shards=8, encoder_sub_sequence=(-16, 0),
        en_d_model=32, lr=0.001,
    )
    assert 0.0 <= acc <= 1.0
    assert cfg.encoder_max_len % 8 == 0


def test_frame_targets_pad_together():
    """frame_targets=True keeps tgt the same static length as src for ANY
    pad_multiple (seq_shards like 3/5/6/12 give lcm(8, n) != 8, which used
    to pad src to 112 but tgt to 104 and crash the first AM train step)."""
    from pytorch_kaldi_asr_tpu.data.loader import BatchLoader

    rng = np.random.default_rng(0)
    triples = [
        (f"u{i}", rng.normal(size=(97 + i, 4)).astype(np.float32),
         np.zeros(97 + i, np.int32))
        for i in range(4)
    ]
    ld = BatchLoader(triples, 2, pad_multiple=48, frame_targets=True)
    assert ld.src_pad % 48 == 0
    for batch in ld:
        assert batch.src.shape[1] == batch.tgt.shape[1] == ld.src_pad
    # bucketed: per-bucket pads apply to targets too
    ld2 = BatchLoader(triples, 1, mode="all", num_buckets=2,
                      frame_targets=True)
    for batch in ld2:
        assert batch.src.shape[1] == batch.tgt.shape[1]


def test_train_am_seq_shards_over_devices_rejected(tmp_path):
    from pytorch_kaldi_asr_tpu.recipes.train_am import train_am

    _make_corpus(str(tmp_path), n_train=4, n_dev=2)
    with pytest.raises(ValueError, match="devices"):
        train_am(str(tmp_path / "train"), str(tmp_path / "dev"),
                 str(tmp_path / "am"), encoder_type="conformer",
                 epochs=1, batch_size=2, seq_shards=64)


@pytest.mark.slow
def test_longform_recipe_e2e(tmp_path):
    """recipes/longform-conformer stages 0-4 on the virtual mesh: corpus →
    LM → SP training → posterior dump → HLG decode → WER → aligned CTM."""
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8",
        PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
        seq_shards="8", n_train="16", n_dev="4", n_test="4",
        feat_dim="10", min_words="20", max_words="30", frames_per_word="8",
        epochs="4", batch_size="4", en_d_model="64",
        encoder_sub_sequence="(-16,0)", lr="0.003",
    )
    subprocess.run(
        ["bash", os.path.join(REPO, "recipes/longform-conformer/run.sh")],
        check=True, env=env, cwd=str(tmp_path), timeout=1800,
    )
    wer_text = (tmp_path / "exp" / "wer").read_text()
    assert "%WER" in wer_text
    # the task is learnable: insist on a sane error rate, not just smoke
    wer = float(wer_text.split("%WER")[1].split()[0])
    assert wer < 60.0, wer_text
    ctm = (tmp_path / "exp" / "test.ctm").read_text().strip().splitlines()
    assert len(ctm) >= 20 * 4 * 0.8  # ~min_words per utt, all utts aligned
    for line in ctm[:5]:
        parts = line.split()
        assert len(parts) == 6
        assert float(parts[3]) > 0  # durations are real
