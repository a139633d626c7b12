"""Tests for wav I/O, fbank/MFCC extraction, and LDA estimation."""

import numpy as np
import pytest

from pytorch_kaldi_asr_tpu.tools.wav import read_wav, write_wav
from pytorch_kaldi_asr_tpu.tools.fbank import (
    FbankConfig,
    compute_fbank,
    frame_signal,
    mel_banks,
    mel_scale,
)
from pytorch_kaldi_asr_tpu.tools.lda import estimate_lda


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    samples = (rng.normal(size=8000) * 1000).astype(np.float32)
    path = tmp_path / "x.wav"
    write_wav(str(path), samples, 16000)
    got, rate = read_wav(str(path))
    assert rate == 16000
    np.testing.assert_allclose(got, np.round(samples), atol=1.0)


def test_wav_pipe(tmp_path):
    samples = np.arange(100, dtype=np.float32)
    path = tmp_path / "p.wav"
    write_wav(str(path), samples, 8000)
    got, rate = read_wav(f"cat {path} |")
    assert rate == 8000 and got.shape == (100,)


def test_framing_snip_edges():
    cfg = FbankConfig(sample_rate=16000)  # 400 samples / 160 shift
    frames = frame_signal(np.arange(1000, dtype=np.float32), cfg)
    assert frames.shape == (4, 400)  # (1000-400)//160+1
    np.testing.assert_array_equal(frames[1, 0], 160)


def test_mel_banks_partition():
    cfg = FbankConfig()
    banks = np.asarray(mel_banks(cfg))
    assert banks.shape == (23, cfg.fft_size // 2 + 1)
    # interior fft bins are covered with total weight ~1 (triangles overlap)
    interior = banks.sum(0)[10:-10]
    assert (interior > 0.2).all()


def test_fbank_tone_peaks_at_right_bin():
    cfg = FbankConfig(dither=0.0)
    rate = cfg.sample_rate
    t = np.arange(rate, dtype=np.float32) / rate
    for freq in (300.0, 1000.0, 3000.0):
        tone = (np.sin(2 * np.pi * freq * t) * 10000).astype(np.float32)
        feats = compute_fbank(tone, cfg)
        assert feats.shape == (98, 23)
        peak_bin = int(np.bincount(feats.argmax(1)).argmax())
        # expected mel bin for this frequency
        nyq = rate / 2
        mel_points = np.linspace(mel_scale(cfg.low_freq), mel_scale(nyq), 25)
        expect = int(np.argmin(np.abs(
            (mel_points[1:-1]) - mel_scale(freq)
        )))
        assert abs(peak_bin - expect) <= 1, (freq, peak_bin, expect)


def test_mfcc_shape_and_determinism():
    cfg = FbankConfig()
    rng = np.random.default_rng(1)
    x = (rng.normal(size=4000) * 5000).astype(np.float32)
    a = compute_fbank(x, cfg, kind="mfcc")
    b = compute_fbank(x, cfg, kind="mfcc")
    assert a.shape == ((4000 - 400) // 160 + 1, 13)
    np.testing.assert_array_equal(a, b)


def test_fbank_cli_to_ark(tmp_path):
    from pytorch_kaldi_asr_tpu.tools import fbank as fbank_cli
    from pytorch_kaldi_asr_tpu.io import kaldi_io

    rng = np.random.default_rng(2)
    wavs = {}
    for i in range(2):
        path = tmp_path / f"u{i}.wav"
        write_wav(str(path), (rng.normal(size=3200) * 1000), 16000)
        wavs[f"u{i}"] = str(path)
    scp = tmp_path / "wav.scp"
    scp.write_text("".join(f"{k} {v}\n" for k, v in wavs.items()))
    rc = fbank_cli.main([
        f"scp:{scp}", f"ark,scp:{tmp_path}/f.ark,{tmp_path}/f.scp",
    ])
    assert rc == 0
    feats = dict(kaldi_io.read_mat_scp(f"{tmp_path}/f.scp"))
    assert feats["u0"].shape == ((3200 - 400) // 160 + 1, 23)


def test_lda_separates_classes():
    rng = np.random.default_rng(3)
    # 3 classes in 10-d with distinct means, shared small covariance
    means = rng.normal(scale=4.0, size=(3, 10))
    feats, labels = [], []
    for c in range(3):
        feats.append(means[c] + rng.normal(scale=0.5, size=(200, 10)))
        labels.append(np.full(200, c))
    feats = np.concatenate(feats).astype(np.float32)
    labels = np.concatenate(labels)
    lda = estimate_lda([(feats, labels)], out_dim=2)
    assert lda.shape == (2, 11)
    proj = feats @ lda[:, :-1].T + lda[:, -1]
    # class means well separated relative to within-class spread
    mus = np.stack([proj[labels == c].mean(0) for c in range(3)])
    within = np.mean([proj[labels == c].std(0).mean() for c in range(3)])
    dists = [np.linalg.norm(mus[a] - mus[b])
             for a in range(3) for b in range(a + 1, 3)]
    assert min(dists) > 3 * within
    # bias centers the projection
    np.testing.assert_allclose(proj.mean(0), 0.0, atol=0.2)
