"""Smoke tests for the driver-facing benchmark entry points (bench.py +
tools/bench_rtf.py): every function must return its JSON-able record with
the expected keys on whatever backend is available.  Sizes are shrunk —
these pin the plumbing, not the numbers."""

import numpy as np
import pytest

import bench
from pytorch_kaldi_asr_tpu.tools import bench_rtf


@pytest.fixture(autouse=True)
def _tiny_scale(monkeypatch):
    monkeypatch.setattr(bench, "BATCH", 2)
    monkeypatch.setattr(bench, "SRC_LEN", 32)
    monkeypatch.setattr(bench, "TGT_LEN", 8)


def test_measure_jax_encoder_types(monkeypatch):
    # plumbing test, not a perf test: shrink the module-level bench shapes
    # AND the model itself — at recipe-default widths the two fwd+bwd
    # compiles alone took 107 s of the round-4 budget audit on the 1-core
    # box; the tiny model pins the same code path
    monkeypatch.setattr(bench, "BATCH", 4)
    monkeypatch.setattr(bench, "SRC_LEN", 64)
    monkeypatch.setattr(bench, "TGT_LEN", 12)
    monkeypatch.setattr(bench, "CFG_OVERRIDES", {
        "en_layers": 1, "de_layers": 1, "n_head": 2,
        "en_d_model": 32, "de_d_model": 32, "d_k": 16, "d_v": 16,
        "encoder_max_len": 64, "decoder_max_len": 16,
    })
    fps = bench.measure_jax(steps=1, warmup=1)
    assert fps > 0
    fps_c = bench.measure_jax(steps=1, warmup=1, encoder_type="conformer",
                              stream_bf16=True)
    assert fps_c > 0


def test_measure_decode_and_int8():
    r = bench.measure_decode_and_int8(batch=1, frames=32, beam=2, max_len=4,
                                      steps=1)
    assert set(r) == {"decode_rtf", "int8_decode_rtf", "int8_latency_delta"}
    assert r["decode_rtf"] > 0 and r["int8_decode_rtf"] > 0


def test_measure_hybrid_rtf_via_bench_rtf():
    r = bench_rtf.bench_hybrid(repeats=1)
    assert r["metric"] == "hybrid_rtf" and r["value"] > 0
    assert r["frames_per_sec"] > 0
    if r["native"]:
        assert r["native_speedup_vs_python"] > 1.0
        assert r["concurrency_scaling_x2"] > 0


def test_bench_streaming_conformer():
    r = bench_rtf.bench_streaming_conformer(frames=32, chunk=16, steps=1,
                                            n_targets=8)
    assert r["metric"] == "streaming_conformer_rtf" and r["value"] > 0
    assert r["push_ms_p50"] > 0


def test_measure_mfu_returns_roofline_fields():
    r = bench.measure_mfu(fps=1e6)
    # CPU cost analysis may be unavailable -> None is allowed; when it
    # answers, the record must carry the roofline fields
    if r is not None:
        assert {"step_flops", "step_bytes", "step_time_ms",
                "device_kind"} <= set(r)


def test_hybrid_bench_setup_decodable():
    graph, posts = bench_rtf.hybrid_bench_setup(n_words=30, n_phones=12,
                                                n_sents=60)
    from pytorch_kaldi_asr_tpu.decode.latgen import latgen

    res = latgen(graph, posts, beam=16.0, max_active=2000)
    assert res is not None
    assert np.isfinite(res[2])


def test_bench_partials_incremental_vs_redecode():
    r = bench_rtf.bench_partials(total_frames=96, chunk=16, partial_every=2,
                                 beam=2, max_len=6, en_layers=1, de_layers=1,
                                 en_d_model=32, de_d_model=32, d_k=8, d_v=8,
                                 n_head=1)
    assert r["metric"] == "partials_incremental_vs_redecode"
    assert r["partials_timed"] == 3
    for row in (r["first_ms"], r["mid_ms"], r["last_ms"]):
        assert row["incremental"] > 0 and row["redecode"] > 0


def test_watchdog_emits_headline_line_on_deadline():
    # the driver captures bench.py's LAST stdout line; a driver-side
    # timeout must never lose the whole record.  BENCH_DEADLINE=0 makes
    # the watchdog fire during the headline stage: the process must
    # still exit 0 with a well-formed JSON line tagged with the stage
    # that was in flight.
    import json
    import os
    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORMS="cpu", BENCH_DEADLINE="0")
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(bench.__file__),
                                      "bench.py")],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["metric"] == "am_train_throughput"
    assert rec["unit"] == "frames/sec/chip"
    assert rec["deadline_hit_during"] == "headline"
