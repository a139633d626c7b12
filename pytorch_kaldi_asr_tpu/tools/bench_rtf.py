"""Posterior-generation / decode RTF benchmarks (BASELINE.json metric #2:
streaming chunked-attention posterior emit; plus full-utterance beam decode).

Prints one JSON line per benchmark.  Real-time factor = compute seconds per
second of audio (frames × 10 ms); the axon-tunnel timing rules apply (chained
dependent calls, host-pull sync, RTT subtracted)."""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _rtt():
    import jax.numpy as jnp

    t0 = time.perf_counter()
    float(jnp.zeros(()))
    return time.perf_counter() - t0


def bench_offline_posteriors(batch=8, frames=500, feat_dim=40,
                             n_targets=512, steps=20):
    """Full-utterance AM posterior generation (TDNN encoder)."""
    import jax
    import jax.numpy as jnp

    from pytorch_kaldi_asr_tpu.models import TransformerConfig, am

    cfg = TransformerConfig(src_dim=feat_dim, vocab_size=52,
                            compute_dtype=jnp.bfloat16)
    params = am.init_am(jax.random.PRNGKey(0), cfg, n_targets)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(batch, frames, feat_dim))
                      .astype(np.float32))
    mask = jnp.ones((batch, frames), jnp.uint8)

    fwd = jax.jit(lambda p, s: am.am_log_posteriors(p, cfg, s, mask)[0])
    out = fwd(params, src)
    float(out[0, 0, 0])
    base = _rtt()
    t0 = time.perf_counter()
    x = src
    for _ in range(steps):
        out = fwd(params, x)
        x = src + out[0, 0, 0] * 0.0  # chain dependency for the tunnel
    float(out[0, 0, 0])
    dt = (time.perf_counter() - t0 - base) / steps
    audio_sec = batch * frames * 0.01
    return {"metric": "posterior_rtf_offline", "value": round(dt / audio_sec, 6),
            "unit": "rtf", "ms_per_batch": round(dt * 1e3, 3)}


def bench_decode(batch=8, frames=500, feat_dim=40, beam=25, max_len=100,
                 steps=5):
    """Beam-search decode RTF with the KV-cached search."""
    import jax
    import jax.numpy as jnp

    from pytorch_kaldi_asr_tpu.decode.fast_beam import fast_beam_search
    from pytorch_kaldi_asr_tpu.models import (
        TransformerConfig,
        init_transformer,
    )

    cfg = TransformerConfig(src_dim=feat_dim, vocab_size=52)
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(batch, frames, feat_dim))
                      .astype(np.float32))
    mask = jnp.ones((batch, frames), jnp.uint8)

    r = fast_beam_search(params, cfg, src, mask, beam_size=beam,
                         max_len=max_len)
    float(r.scores[0, 0])
    base = _rtt()
    t0 = time.perf_counter()
    x = src
    for _ in range(steps):
        r = fast_beam_search(params, cfg, x, mask, beam_size=beam,
                             max_len=max_len)
        x = src + r.scores[0, 0] * 0.0
    float(r.scores[0, 0])
    dt = (time.perf_counter() - t0 - base) / steps
    audio_sec = batch * frames * 0.01
    return {"metric": "decode_rtf_beam25", "value": round(dt / audio_sec, 6),
            "unit": "rtf", "ms_per_batch": round(dt * 1e3, 3)}


def bench_streaming_conformer(frames=400, chunk=40, feat_dim=40,
                              n_targets=512, steps=3):
    """True-streaming Conformer AM posterior RTF: chunked pushes through
    the carried-cache StreamingConformer frontend + AM head (BASELINE.md's
    declared RTF benchmark config, 'streaming chunked-attention').  Each
    push returns host-side posteriors, so the sync is inherent — wall
    clock per push IS the serving latency."""
    import jax

    from pytorch_kaldi_asr_tpu.models import TransformerConfig, am
    from pytorch_kaldi_asr_tpu.models.streaming import StreamingAM

    cfg = TransformerConfig(
        src_dim=feat_dim, vocab_size=52, encoder_type="conformer",
        encoder_sub_sequence=(-100, 0), conformer_causal_conv=True,
        en_dropout=0.0,
    )
    params = am.init_am(jax.random.PRNGKey(0), cfg, n_targets)
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(1, frames, feat_dim)).astype(np.float32)

    stream = StreamingAM(params, cfg)
    for lo in range(0, frames, chunk):  # warm all cache shapes
        stream.push(feats[:, lo:lo + chunk])
    lat = []
    t_total = 0.0
    for _ in range(steps):
        stream.reset()
        t0 = time.perf_counter()
        for lo in range(0, frames, chunk):
            t1 = time.perf_counter()
            stream.push(feats[:, lo:lo + chunk])
            lat.append(time.perf_counter() - t1)
        t_total += time.perf_counter() - t0
    audio_sec = steps * frames * 0.01
    lat.sort()
    return {
        "metric": "streaming_conformer_rtf",
        "value": round(t_total / audio_sec, 6),
        "unit": "rtf",
        "chunk_frames": chunk,
        "push_ms_p50": round(lat[len(lat) // 2] * 1e3, 3),
        "push_ms_p95": round(lat[int(len(lat) * 0.95)] * 1e3, 3),
    }


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--which",
                        choices=["posterior", "decode", "streaming", "all"],
                        default="all")
    opt = parser.parse_args(argv)
    if opt.which in ("posterior", "all"):
        print(json.dumps(bench_offline_posteriors()))
    if opt.which in ("decode", "all"):
        print(json.dumps(bench_decode()))
    if opt.which in ("streaming", "all"):
        print(json.dumps(bench_streaming_conformer()))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
