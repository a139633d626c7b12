"""Log-mel filterbank / MFCC feature extraction, computed with JAX so the
whole front end runs on-chip (the BASELINE north star: fbank extraction,
CMVN, splicing fuse into the accelerator pipeline instead of shelling out to
Kaldi's compute-fbank-feats, SURVEY.md §2c).

Follows Kaldi's algorithm and defaults: 25 ms frames / 10 ms shift with
snip-edges framing, DC-offset removal, optional dither (off by default for
reproducibility; Kaldi defaults it on), pre-emphasis 0.97, the "povey"
window, power spectrum on a pow2 FFT, triangular mel banks (mel = 1127·
ln(1+f/700)) between low/high cutoffs, natural-log output with flooring.
MFCC applies an orthogonal DCT-II and cepstral liftering on top.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class FbankConfig:
    sample_rate: int = 16000
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    num_bins: int = 23
    low_freq: float = 20.0
    high_freq: float = 0.0  # <=0: offset from Nyquist
    preemphasis: float = 0.97
    remove_dc_offset: bool = True
    window_type: str = "povey"  # povey | hamming | hanning | rectangular
    dither: float = 0.0  # Kaldi defaults 1.0; off here for determinism
    use_power: bool = True
    # mfcc extras
    num_ceps: int = 13
    cepstral_lifter: float = 22.0

    @property
    def frame_length(self):
        return int(self.sample_rate * self.frame_length_ms / 1000)

    @property
    def frame_shift(self):
        return int(self.sample_rate * self.frame_shift_ms / 1000)

    @property
    def fft_size(self):
        n = 1
        while n < self.frame_length:
            n *= 2
        return n


def _window(cfg):
    n = cfg.frame_length
    a = 2 * math.pi / (n - 1)
    i = np.arange(n)
    if cfg.window_type == "povey":
        w = (0.5 - 0.5 * np.cos(a * i)) ** 0.85
    elif cfg.window_type == "hamming":
        w = 0.54 - 0.46 * np.cos(a * i)
    elif cfg.window_type == "hanning":
        w = 0.5 - 0.5 * np.cos(a * i)
    elif cfg.window_type == "rectangular":
        w = np.ones(n)
    else:
        raise ValueError(f"unknown window {cfg.window_type}")
    return jnp.asarray(w, dtype=jnp.float32)


def mel_scale(freq):
    return 1127.0 * np.log(1.0 + freq / 700.0)


def mel_banks(cfg):
    """[num_bins, fft_size//2 + 1] triangular filters (Kaldi mel-banks)."""
    nyquist = cfg.sample_rate / 2.0
    high = cfg.high_freq if cfg.high_freq > 0 else nyquist + cfg.high_freq
    n_fft_bins = cfg.fft_size // 2 + 1
    fft_freqs = np.arange(n_fft_bins) * cfg.sample_rate / cfg.fft_size
    mel_low, mel_high = mel_scale(cfg.low_freq), mel_scale(high)
    mel_points = np.linspace(mel_low, mel_high, cfg.num_bins + 2)
    mel_f = mel_scale(fft_freqs)
    banks = np.zeros((cfg.num_bins, n_fft_bins), np.float32)
    for b in range(cfg.num_bins):
        left, center, right = mel_points[b : b + 3]
        up = (mel_f - left) / max(center - left, 1e-9)
        down = (right - mel_f) / max(right - center, 1e-9)
        banks[b] = np.maximum(0.0, np.minimum(up, down))
    return jnp.asarray(banks)


def frame_signal(samples, cfg):
    """Snip-edges framing: [n] → [num_frames, frame_length]."""
    n = samples.shape[0]
    num_frames = max(0, (n - cfg.frame_length) // cfg.frame_shift + 1)
    idx = (
        np.arange(num_frames)[:, None] * cfg.frame_shift
        + np.arange(cfg.frame_length)[None, :]
    )
    return samples[idx]


@functools.partial(jax.jit, static_argnames=("cfg", "kind"))
def _frames_to_feats(frames, cfg: FbankConfig, kind="fbank", seed=0):
    """[F, frame_length] float32 → [F, num_bins or num_ceps]."""
    x = frames.astype(jnp.float32)
    if cfg.dither > 0:
        key = jax.random.PRNGKey(seed)
        x = x + cfg.dither * jax.random.normal(key, x.shape)
    if cfg.remove_dc_offset:
        x = x - jnp.mean(x, axis=1, keepdims=True)
    if cfg.preemphasis > 0:
        first = x[:, :1] - cfg.preemphasis * x[:, :1]
        rest = x[:, 1:] - cfg.preemphasis * x[:, :-1]
        x = jnp.concatenate([first, rest], axis=1)
    x = x * _window(cfg)[None, :]
    x = jnp.pad(x, ((0, 0), (0, cfg.fft_size - cfg.frame_length)))
    spec = jnp.fft.rfft(x, axis=1)
    power = jnp.abs(spec) ** 2 if cfg.use_power else jnp.abs(spec)
    mel = power @ mel_banks(cfg).T
    logmel = jnp.log(jnp.maximum(mel, 1.1920929e-07))  # FLT_EPSILON floor
    if kind == "fbank":
        return logmel
    # MFCC: orthogonal DCT-II + liftering
    k = jnp.arange(cfg.num_ceps)[:, None]
    nbins = cfg.num_bins
    basis = jnp.cos(
        math.pi / nbins * (jnp.arange(nbins)[None, :] + 0.5) * k
    ) * jnp.sqrt(2.0 / nbins)
    basis = basis.at[0].multiply(1.0 / jnp.sqrt(2.0))
    ceps = logmel @ basis.T
    if cfg.cepstral_lifter > 0:
        q = cfg.cepstral_lifter
        lift = 1.0 + 0.5 * q * jnp.sin(
            math.pi * jnp.arange(cfg.num_ceps) / q
        )
        ceps = ceps * lift[None, :]
    return ceps


def compute_fbank(samples, cfg=FbankConfig(), kind="fbank"):
    """Full pipeline for one utterance: samples [n] → [frames, bins]."""
    samples = np.asarray(samples, np.float32)
    if samples.ndim > 1:
        samples = samples[:, 0]  # first channel, like Kaldi's default
    frames = frame_signal(samples, cfg)
    if frames.shape[0] == 0:
        return np.zeros((0, cfg.num_bins if kind == "fbank"
                         else cfg.num_ceps), np.float32)
    return np.asarray(_frames_to_feats(jnp.asarray(frames), cfg, kind))


def main(argv=None):
    """CLI: compute fbank/mfcc features for a wav.scp →  feature ark/scp.

    usage: fbank [--mfcc] [--num-bins=N] [--sample-rate=R]
                 scp:wav.scp ark,scp:feats.ark,feats.scp
    """
    import sys

    from pytorch_kaldi_asr_tpu.io import kaldi_io
    from pytorch_kaldi_asr_tpu.tools.wav import read_wav

    argv = list(argv or sys.argv[1:])
    kind = "fbank"
    overrides = {}
    rest = []
    for a in argv:
        if a == "--mfcc":
            kind = "mfcc"
        elif a.startswith("--num-bins="):
            overrides["num_bins"] = int(a.split("=", 1)[1])
        elif a.startswith("--sample-rate="):
            overrides["sample_rate"] = int(a.split("=", 1)[1])
        elif a.startswith("--dither="):
            overrides["dither"] = float(a.split("=", 1)[1])
        else:
            rest.append(a)
    if len(rest) != 2:
        print(main.__doc__, file=sys.stderr)
        return 1
    cfg = FbankConfig(**overrides)
    n = 0
    _, _, wav_scp = kaldi_io.parse_specifier(rest[0])
    with kaldi_io.open_writer(rest[1]) as w:
        for key, rx in kaldi_io.scp_entries(wav_scp):
            samples, rate = read_wav(rx)
            if rate != cfg.sample_rate:
                # mixed-rate corpora would silently produce incompatible
                # front-end geometry; hard error, like compute-fbank-feats
                raise ValueError(
                    f"utterance {key!r} has sample rate {rate}, expected "
                    f"{cfg.sample_rate} (set --sample-rate)"
                )
            w.write(key, compute_fbank(samples, cfg, kind))
            n += 1
    print(f"[INFO] extracted {kind} features for {n} utterances")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
