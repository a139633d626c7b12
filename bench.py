"""Benchmark: AM training throughput (frames/sec/chip) of the flagship TIMIT
attention-transformer, measured on the available accelerator.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

vs_baseline compares against an empirical torch-CPU training step of the same
model semantics (the reference publishes no numbers, BASELINE.md; its own
CPU path is run.sh:113-127).  The baseline is measured once and cached in
BASELINE_empirical.json so driver runs don't pay for it.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_FILE = os.path.join(REPO, "BASELINE_empirical.json")


def _require_live_backend(timeout_s=120):
    """Fail LOUDLY (one JSON error line) if the accelerator never answers.

    The axon tunnel rides a relay process whose death makes
    ``jax.devices()`` block forever — a silent driver timeout with no
    record of why.  Probe device init on a watchdog thread and emit a
    diagnosable JSON line instead of hanging."""
    import threading

    result = {}

    def probe():
        import jax

        result["devices"] = [str(d) for d in jax.devices()]

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        record = {
            "metric": "am_train_throughput",
            "value": 0.0,
            "unit": "frames/sec/chip",
            "vs_baseline": 0.0,
            "error": f"accelerator init did not answer within {timeout_s}s "
                     "(axon tunnel relay dead? check "
                     "`ps aux | grep tpu_init`)",
        }
        # Salvage the HOST-side headline metrics so a dead tunnel still
        # yields driver-verified numbers (the hybrid graph search and the
        # data pipeline never touch the chip).  Fresh subprocess: this
        # process's jax backend init is wedged on the hung probe thread.
        record.update(_host_only_subprocess())
        print(json.dumps(record))
        sys.exit(2)
    return result["devices"]


def _host_only_subprocess(timeout_s=900):
    """Run ``bench.py --host-only`` in a clean CPU-jax process and return
    its record (empty on any failure — never mask the primary error)."""
    import subprocess

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--host-only"],
            env=env, capture_output=True, text=True, timeout=timeout_s,
        )
        line = out.stdout.strip().splitlines()[-1]
        return json.loads(line)
    except Exception as e:
        return {"host_only_error": repr(e)[:200]}


def host_only_record():
    """Host-side metrics that involve no accelerator: the hybrid-path
    graph-search RTF (native C++ latgen — the role the reference hands to
    Kaldi's C++ decoders) and the host data-pipeline rate that bounds any
    chip's feed."""
    record = {}
    try:
        record.update(measure_hybrid_rtf())
    except Exception as e:
        record["hybrid_error"] = repr(e)[:200]
    try:
        _, _, host_rate, _, extras = measure_pipeline_e2e(
            steps=10, warmup=1, host_only=True)
        record["host_pipeline_frames_per_sec"] = round(host_rate, 1)
        record.update(extras)
    except Exception as e:
        record["host_pipeline_error"] = repr(e)[:200]
    return record

# recipe scale (reference run.sh:105-112): batch 100; length cap 500 frames
BATCH = 100
SRC_LEN = 500  # the recipe's hard length cap (run.sh:30-35)
TGT_LEN = 48
CFG_OVERRIDES = {}  # extra TransformerConfig kwargs (test-size hook)
SRC_DIM = 40
VOCAB = 52


def _flagship_setup(encoder_type=None, stream_bf16=None, extra_cfg=None):
    import jax

    from pytorch_kaldi_asr_tpu.models import TransformerConfig, init_transformer

    import jax.numpy as jnp

    encoder_type = encoder_type or os.environ.get("BENCH_MODEL", "tdnn")
    if stream_bf16 is None:
        stream_bf16 = os.environ.get("BENCH_STREAM", "") == "bf16"
    extra = dict(CFG_OVERRIDES)  # test hook: shrink the MODEL, not just
    if stream_bf16:              # the batch (compile time dominates on CPU)
        extra["conformer_stream_dtype"] = jnp.bfloat16
    if extra_cfg:
        extra.update(extra_cfg)
    cfg = TransformerConfig(
        src_dim=SRC_DIM, vocab_size=VOCAB, compute_dtype=jnp.bfloat16,
        encoder_type=encoder_type, **extra,
    )
    rng = np.random.default_rng(0)
    lda_in = SRC_DIM * len(cfg.lda_context)
    lda_mat = (rng.normal(size=(lda_in, lda_in + 1)) * 0.05).astype(np.float32)
    params = init_transformer(jax.random.PRNGKey(0), cfg, lda_mat)
    src = rng.normal(size=(BATCH, SRC_LEN, SRC_DIM)).astype(np.float32)
    src_mask = np.ones((BATCH, SRC_LEN), np.uint8)
    tgt = rng.integers(4, VOCAB, size=(BATCH, TGT_LEN)).astype(np.int32)
    tgt[:, 0] = 2
    tgt[:, -1] = 3
    tgt_mask = np.ones((BATCH, TGT_LEN), np.uint8)
    return cfg, params, (src, src_mask, tgt, tgt_mask)


def measure_jax(steps=30, warmup=3, encoder_type=None, stream_bf16=None,
                extra_cfg=None):
    # NOTE on methodology: the axon TPU backend is a network tunnel where
    # block_until_ready does not actually block; synchronization must be a
    # host transfer.  Steps are data-dependent (the train state threads
    # through), so pulling the final loss bounds the whole chain; one tunnel
    # round-trip (~30 ms) is measured separately and subtracted.
    import jax
    import jax.numpy as jnp

    from pytorch_kaldi_asr_tpu.train import create_train_state, make_train_step

    cfg, params, (src, src_mask, tgt, tgt_mask) = _flagship_setup(
        encoder_type, stream_bf16, extra_cfg)
    state, tx = create_train_state(params)
    train_step = make_train_step(cfg, tx)
    src, src_mask, tgt, tgt_mask = jax.device_put(
        (src, src_mask, tgt, tgt_mask)
    )

    for _ in range(warmup):
        state, m = train_step(state, src, src_mask, tgt, tgt_mask)
    float(m["loss"])  # sync
    float(jnp.zeros((), jnp.float32))  # warm the zeros kernel (compile)

    t0 = time.perf_counter()
    rtt = float(jnp.zeros((), jnp.float32))  # noqa: F841 — round-trip only
    t_rtt = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = train_step(state, src, src_mask, tgt, tgt_mask)
    float(m["loss"])  # sync the dependent chain
    dt = max(time.perf_counter() - t0 - t_rtt, 1e-9)

    # BENCH_TRACE=<dir>: capture a jax.profiler trace of 3 steps (outside
    # the timed window) for tools/trace_summary.py / perfetto; see
    # utils/metrics.profile_trace (SURVEY §5.1 tracing subsystem)
    trace_dir = os.environ.get("BENCH_TRACE")
    if trace_dir:
        from pytorch_kaldi_asr_tpu.utils.metrics import profile_trace

        sub = os.path.join(trace_dir,
                           (encoder_type or os.environ.get("BENCH_MODEL",
                                                           "tdnn")))
        with profile_trace(sub):
            for _ in range(3):
                state, m = train_step(state, src, src_mask, tgt, tgt_mask)
            float(m["loss"])
        print(f"[bench] profiler trace -> {sub}", file=sys.stderr)

    frames_per_step = BATCH * SRC_LEN
    return frames_per_step * steps / dt


def measure_torch_baseline(steps=2, warmup=1, batch=10):
    """Torch-CPU training step with identical model semantics (the parity
    oracle in tests/torch_ref.py), as the empirical reference point.
    Measured at a smaller batch (CPU throughput per frame is roughly
    batch-independent at this scale) and reported as frames/sec."""
    import jax
    import torch

    sys.path.insert(0, REPO)
    from tests import torch_ref

    # the torch oracle implements the TDNN flagship only; the baseline is
    # always that model regardless of BENCH_MODEL (vs_baseline for other
    # encoders reads "x times the flagship torch-CPU step")
    cfg, params, (src, src_mask, tgt, tgt_mask) = _flagship_setup("tdnn")
    cfg = cfg.replace(compute_dtype=np.float32)
    src, src_mask = src[:batch], src_mask[:batch]
    tgt, tgt_mask = tgt[:batch], tgt_mask[:batch]

    def to_torch(path, leaf):
        keys = [str(getattr(p, "key", getattr(p, "idx", ""))) for p in path]
        t = torch.tensor(np.asarray(leaf), dtype=torch.float32)
        if "lda" not in keys:
            t.requires_grad_(True)
        return t

    tparams = jax.tree_util.tree_map_with_path(to_torch, params)
    leaves = [t for t in jax.tree_util.tree_leaves(tparams) if t.requires_grad]
    opt = torch.optim.Adam(leaves, lr=0.001, betas=(0.9, 0.999), eps=1e-8)

    src_t = torch.from_numpy(src)
    srcm_t = torch.from_numpy(src_mask).long()
    tgt_t = torch.from_numpy(tgt).long()
    tgtm_t = torch.from_numpy(tgt_mask).long()
    tgt_in, tgt_in_mask, goal = tgt_t[:, :-1], tgtm_t[:, :-1], tgt_t[:, 1:]

    def step():
        opt.zero_grad()
        enc = torch_ref.encode(tparams, cfg, src_t, srcm_t)
        logits = torch_ref.decode(tparams, cfg, tgt_in, tgt_in_mask, srcm_t,
                                  enc)
        logp = torch.log_softmax(logits, dim=-1)
        nll = -logp.gather(-1, goal.unsqueeze(-1)).squeeze(-1)
        loss = (nll * (goal != 0)).sum()
        loss.backward()
        opt.step()

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = time.perf_counter() - t0
    return batch * SRC_LEN * steps / dt


def measure_pipeline_e2e(steps=30, warmup=3, host_only=False):
    """End-to-end input-pipeline throughput: ark read -> bucketed batching
    -> host->device prefetch -> jitted train step, on a TIMIT-shaped length
    distribution (the reference's measured bottleneck was exactly this path:
    1.8 s/batch ark IO, reference train.py:167).  Returns
    (valid_frames_per_sec, padded_frames_per_sec)."""
    import shutil
    import tempfile

    import jax
    import jax.numpy as jnp

    from pytorch_kaldi_asr_tpu.data.instances import (
        build_vocab,
        read_instances,
    )
    from pytorch_kaldi_asr_tpu.data.loader import (
        make_batch_loader,
        prefetch_to_device,
    )
    from pytorch_kaldi_asr_tpu.tools.make_timit_shaped import (
        CorpusModel,
        write_split,
    )
    from pytorch_kaldi_asr_tpu.train import create_train_state, make_train_step
    from pytorch_kaldi_asr_tpu.models import TransformerConfig, init_transformer

    tmp = tempfile.mkdtemp(prefix="bench_e2e_")
    try:
        # 16 DP-optimal buckets over 2000 utts keep padded/valid <= 1.05
        # (measured 4.7% pad on this distribution; 4 equal-count buckets
        # over 800 utts paid 14.6% in BENCH_r03) while every bucket still
        # fills a full drop-mode batch
        n_utts = max(20 * BATCH, (steps + warmup) * BATCH // 4)
        write_split(tmp, CorpusModel(feat_dim=SRC_DIM, seed=0), n_utts,
                    spk_seed=1, utt_seed=2)
        instances = read_instances(os.path.join(tmp, "text"))
        vocab = build_vocab(instances)
        loader = make_batch_loader(tmp, vocab, BATCH, mode="drop",
                                   num_buckets=16)

        # host-side-only rate: ark (pre-loaded) -> bucket -> pad, no device.
        # This is the part the pipeline design controls; the device leg is
        # bounded by host->device bandwidth (PCIe on a real TPU host; the
        # axon tunnel here moves ~5 MB/s, measured below and reported).
        # Swept over loader worker counts (data/loader.py num_workers:
        # threaded assembly, GIL released in the ark/pad hot parts) — on
        # this 1-core box the curve is flat by construction; on a real
        # multi-core feeder host it is the scaling knob that closes the
        # host-vs-chip gap (round-4 VERDICT item 2).
        def _host_rate():
            host_frames = 0
            hit = iter(loader)
            t0 = time.perf_counter()
            for _ in range(steps):
                b = next(hit, None)
                if b is None:
                    hit = iter(loader)
                    b = next(hit)
                host_frames += b.src.shape[0] * b.src.shape[1]
            return host_frames / max(time.perf_counter() - t0, 1e-9)

        host_scaling = {}
        for w in (1, 2, 4):
            loader.num_workers = w
            host_scaling[str(w)] = round(_host_rate(), 1)
        loader.num_workers = 1
        best_w = max(host_scaling, key=host_scaling.get)
        host_rate = host_scaling[best_w]
        host_extras = {"host_pipeline_scaling": host_scaling,
                       "host_pipeline_best_workers": int(best_w),
                       "host_cores": os.cpu_count()}
        if host_only:
            return None, None, host_rate, None, host_extras

        cfg = TransformerConfig(src_dim=SRC_DIM, vocab_size=len(vocab),
                                compute_dtype=jnp.bfloat16)
        params = init_transformer(jax.random.PRNGKey(0), cfg)
        state, tx = create_train_state(params)
        train_step = make_train_step(cfg, tx)

        # transfer bandwidth, measured directly
        probe = np.zeros((4 << 20,), np.float32)  # 16 MB
        jax.device_put(probe[:8]).block_until_ready()  # warm the path
        t0 = time.perf_counter()
        y = jax.device_put(probe)
        float(jnp.sum(y[:2]))
        xfer_mbps = probe.nbytes / max(time.perf_counter() - t0, 1e-9) / 1e6

        def epoch_batches():
            while True:
                yield from prefetch_to_device(loader,
                                              transfer_dtype=jnp.bfloat16)

        # warm a FULL epoch so every bucket shape is compiled before the
        # timed window (a mid-timing compile would swallow the measurement)
        it = epoch_batches()
        for _ in range(max(warmup, loader.num_batch)):
            b = next(it)
            state, m = train_step(state, b.src, b.src_mask, b.tgt, b.tgt_mask)
        float(m["loss"])

        valid = padded = 0
        t0 = time.perf_counter()
        for _ in range(steps):
            b = next(it)
            state, m = train_step(state, b.src, b.src_mask, b.tgt, b.tgt_mask)
            padded += b.src.shape[0] * b.src.shape[1]
            valid += int(np.asarray(b.src_mask).sum())
        float(m["loss"])  # sync the dependent chain
        dt = max(time.perf_counter() - t0, 1e-9)
        return valid / dt, padded / dt, host_rate, xfer_mbps, host_extras
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _prod(xs):
    out = 1
    for x in xs:
        out *= int(x)
    return out


def _matmul_flops_of_jaxpr(jaxpr):
    """Analytic model FLOPs: walk the traced program and count ONLY
    matmul (dot_general) and convolution FLOPs at their exact shapes
    (2*M*N*K per dot), recursing into scan/pjit/custom-vjp sub-jaxprs
    (scan bodies multiplied by trip count).  The train step is already
    differentiated when traced, so this is fwd+bwd.  Unlike the compiled
    executable's cost_analysis() — which counts every emitted op
    including masking, padding and dropout RNG, and whose byte counters
    are logical (hbm_util > 1 in BENCH_r03.json) — this is the
    conventional 'model FLOPs' numerator for MFU."""
    total = 0.0
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "dot_general":
            (lc, rc), (lb, _rb) = eqn.params["dimension_numbers"]
            a = eqn.invars[0].aval.shape
            b = eqn.invars[1].aval.shape
            batch = _prod(a[i] for i in lb)
            k = _prod(a[i] for i in lc)
            m = _prod(a[i] for i in range(len(a))
                      if i not in lc and i not in lb)
            rb_set = set(_rb) | set(rc)
            n = _prod(b[i] for i in range(len(b)) if i not in rb_set)
            total += 2.0 * batch * m * n * k
        elif prim == "conv_general_dilated":
            out = eqn.outvars[0].aval.shape
            rhs = eqn.invars[1].aval.shape
            dn = eqn.params["dimension_numbers"]
            out_ch = out[dn.out_spec[1]]
            kernel_per_out = _prod(rhs) // max(out_ch, 1)
            total += 2.0 * _prod(out) * kernel_per_out
        else:
            mult = 1
            subs = []
            for name in ("jaxpr", "call_jaxpr", "body_jaxpr", "fun_jaxpr"):
                sub = eqn.params.get(name)
                if sub is not None:
                    subs.append(sub)
            if prim == "scan":
                mult = int(eqn.params.get("length", 1))
            if prim == "cond":
                subs = list(eqn.params.get("branches", ()))
            for sub in subs:
                inner = getattr(sub, "jaxpr", sub)
                total += mult * _matmul_flops_of_jaxpr(inner)
    return total


# peak spec sheet per device kind: (bf16 TFLOP/s, HBM GB/s)
_PEAKS = {
    "TPU v5e": (197.0, 819.0),
    "TPU v5 lite": (197.0, 819.0),
    "TPU v4": (275.0, 1228.0),
    "TPU v6e": (918.0, 1640.0),
}


def measure_mfu(encoder_type=None, fps=None, stream_bf16=None,
                extra_cfg=None):
    """Model-FLOPs utilization + HBM-bandwidth utilization of the jitted
    train step, from the compiled executable's cost analysis and the
    measured step time (the roofline numbers BASELINE.md's
    'speed-of-light' target is judged against).  ``encoder_type`` selects
    the model (tdnn flagship / conformer / banded / blstm); pass a
    pre-measured ``fps`` to reuse a throughput number instead of
    re-timing."""
    import jax

    from pytorch_kaldi_asr_tpu.train import create_train_state, make_train_step

    cfg, params, (src, src_mask, tgt, tgt_mask) = _flagship_setup(
        encoder_type, stream_bf16, extra_cfg)
    state, tx = create_train_state(params)
    step = make_train_step(cfg, tx)
    src, src_mask, tgt, tgt_mask = jax.device_put((src, src_mask, tgt,
                                                   tgt_mask))
    try:
        lowered = jax.jit(step.__wrapped__ if hasattr(step, "__wrapped__")
                          else step).lower(state, src, src_mask, tgt,
                                           tgt_mask)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        nbytes = float(cost.get("bytes accessed", 0.0))
    except Exception:
        return None
    try:
        fn = step.__wrapped__ if hasattr(step, "__wrapped__") else step
        traced = jax.make_jaxpr(fn)(state, src, src_mask, tgt, tgt_mask)
        flops_analytic = _matmul_flops_of_jaxpr(traced.jaxpr)
    except Exception:
        flops_analytic = None

    if fps is None:
        fps = measure_jax(steps=20, encoder_type=encoder_type,
                          stream_bf16=stream_bf16)
    step_time = BATCH * SRC_LEN / max(fps, 1e-9)
    kind = jax.devices()[0].device_kind
    peak_flops, peak_bw = None, None
    for k, v in _PEAKS.items():
        if k.lower() in kind.lower():
            peak_flops, peak_bw = v
            break
    out = {
        "step_flops": flops,
        "step_bytes": nbytes,
        "step_time_ms": round(step_time * 1e3, 3),
        "device_kind": kind,
    }
    if flops_analytic:
        out["step_flops_analytic"] = flops_analytic
    if peak_flops:
        out["mfu"] = round(flops / step_time / (peak_flops * 1e12), 4)
        out["hbm_util"] = round(nbytes / step_time / (peak_bw * 1e9), 4)
        if flops_analytic:
            out["mfu_analytic"] = round(
                flops_analytic / step_time / (peak_flops * 1e12), 4)
    return out


def measure_decode_and_int8(batch=8, frames=500, beam=25, max_len=100,
                            steps=3):
    """Beam-25 decode RTF (float) and the int8 weight-only latency delta:
    (int8_ms - float_ms) / float_ms on the identical KV-cached search.
    Negative delta = int8 is faster (it should be: 4x less weight traffic
    on a bandwidth-bound decode)."""
    import jax
    import jax.numpy as jnp

    from pytorch_kaldi_asr_tpu.decode.fast_beam import fast_beam_search
    from pytorch_kaldi_asr_tpu.models import TransformerConfig, init_transformer
    from pytorch_kaldi_asr_tpu.ops.quant import quantize_tree, quantized_search_fn

    cfg = TransformerConfig(src_dim=SRC_DIM, vocab_size=VOCAB)
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(batch, frames, SRC_DIM))
                      .astype(np.float32))
    mask = jnp.ones((batch, frames), jnp.uint8)
    audio_sec = batch * frames * 0.01

    def timed(search, p):
        r = search(p, cfg, src, mask, beam_size=beam, max_len=max_len)
        float(r.scores[0, 0])  # compile + sync
        float(jnp.zeros((), jnp.float32))  # warm the rtt-probe kernel
        t0 = time.perf_counter()
        rtt = float(jnp.zeros((), jnp.float32))  # noqa: F841
        t_rtt = time.perf_counter() - t0
        # per-call sync, rtt subtracted per call: chaining iterations with
        # eager glue ops measured unevenly on the tunnel transport (the
        # glue dispatches inflated one leg by several x)
        total = 0.0
        for _ in range(steps):
            t0 = time.perf_counter()
            r = search(p, cfg, src, mask, beam_size=beam, max_len=max_len)
            float(r.scores[0, 0])
            total += max(time.perf_counter() - t0 - t_rtt, 1e-9)
        return total / steps

    float_s = timed(fast_beam_search, params)
    q_params, _ = quantize_tree(params)
    q_params = jax.device_put(q_params)
    int8_s = timed(quantized_search_fn(fast_beam_search), q_params)
    return {
        "decode_rtf": round(float_s / audio_sec, 6),
        "int8_decode_rtf": round(int8_s / audio_sec, 6),
        "int8_latency_delta": round((int8_s - float_s) / float_s, 4),
    }


def measure_hybrid_rtf():
    """Hybrid-path graph-search RTF (host-side Viterbi over a compiled
    graph — the role Kaldi's C++ decoders play for the reference); see
    tools/bench_rtf.bench_hybrid."""
    from pytorch_kaldi_asr_tpu.tools.bench_rtf import bench_hybrid

    r = bench_hybrid()
    return {"hybrid_rtf": r["value"],
            "hybrid_frames_per_sec": r["frames_per_sec"],
            "hybrid_native_speedup": r.get("native_speedup_vs_python")}


def get_baseline():
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            return json.load(f)["train_frames_per_sec_torch_cpu"]
    value = measure_torch_baseline()
    with open(BASELINE_FILE, "w") as f:
        json.dump(
            {
                "train_frames_per_sec_torch_cpu": value,
                "note": "torch-CPU training step of the TDNN flagship, same "
                        "model semantics (tests/torch_ref.py), measured at "
                        "batch 10 x 500 frames, reported as frames/sec",
            },
            f, indent=1,
        )
    return value


_T0 = time.time()


def _start_watchdog(record, state):
    """Emit the JSON line even if the driver's timeout would otherwise
    kill us mid-stage (round 4 grew the bench: full-epoch e2e warm +
    frontier crossover push the full run past 20 min on the tunnel).

    A daemon thread sleeps until BENCH_DEADLINE seconds after process
    start (default 1500), then prints whatever ``record`` holds so far —
    headline first, extras as they land — tagged with the stage that was
    in flight, and hard-exits.  A thread (not SIGALRM) so it fires even
    if the main thread is wedged inside a tunnel RPC."""
    import threading

    deadline = float(os.environ.get("BENCH_DEADLINE", "1500"))

    def fire():
        rest = deadline - (time.time() - _T0)
        if rest > 0:
            time.sleep(rest)
        fired = False
        try:
            with state["lock"]:
                if state["done"]:
                    return
                state["done"] = True
                fired = True
                record["deadline_hit_during"] = state["stage"]
                # shallow-copy + dumps under the lock: main() mutates
                # record only while holding the same lock, so the dict
                # cannot change size mid-serialization here
                line = json.dumps(dict(record))
            print(line, flush=True)
        finally:
            # hard-exit even if serialization raised — a dead watchdog
            # with done=True would otherwise suppress main's final print
            if fired:
                os._exit(0)

    threading.Thread(target=fire, daemon=True).start()


def main():
    import threading

    state = {"lock": threading.Lock(), "done": False, "stage": "headline"}
    _require_live_backend()
    model = os.environ.get("BENCH_MODEL", "tdnn")
    metric = "am_train_throughput" if model == "tdnn" else \
        f"am_train_throughput_{model}"
    record = {
        "metric": metric,
        # null until measured: an early watchdog line must not be
        # parseable as a zero-frames/sec measurement (ADVICE round 4)
        "value": None,
        "unit": "frames/sec/chip",
        "vs_baseline": None,
    }

    def upd(*dicts, **kv):
        # all record mutations hold the watchdog's lock (see
        # _start_watchdog: fire() serializes under the same lock)
        with state["lock"]:
            for d in dicts:
                record.update(d)
            record.update(kv)

    _start_watchdog(record, state)
    value = measure_jax()
    baseline = get_baseline()
    upd(value=round(value, 1), vs_baseline=round(value / baseline, 2))
    if model == "tdnn" and os.environ.get("BENCH_SKIP_E2E") != "1":
        # end-to-end pipeline (ark -> bucketing -> prefetch -> step) and
        # roofline numbers ride along in the same JSON line
        try:
            state["stage"] = "e2e"
            e2e_valid, e2e_padded, host_rate, xfer, host_extras = \
                measure_pipeline_e2e()
            upd(
                host_extras,
                e2e_valid_frames_per_sec=round(e2e_valid, 1),
                e2e_padded_frames_per_sec=round(e2e_padded, 1),
                pipeline_efficiency=round(e2e_padded / value, 3),
                # the host-side pipeline's own rate, and the measured
                # host->device bandwidth that bounds the e2e number (the
                # axon tunnel is ~3 orders of magnitude below a real
                # PCIe host)
                host_pipeline_frames_per_sec=round(host_rate, 1),
                transfer_mb_per_sec=round(xfer, 1),
            )
        except Exception as e:  # never fail the headline number
            upd(e2e_error=repr(e)[:200])
        try:
            state["stage"] = "mfu"
            roofline = measure_mfu(fps=value)
            if roofline:
                upd(roofline)
        except Exception as e:
            upd(mfu_error=repr(e)[:200])
    # every headline claim rides in the SAME driver-captured JSON line
    # (BENCH_FULL=0 opts out if a driver timeout ever bites)
    if model == "tdnn" and os.environ.get("BENCH_FULL", "1") != "0":
        def _sub(name, fn):
            try:
                state["stage"] = name
                out = fn()
                if isinstance(out, dict):
                    upd(out)
                else:
                    upd(**{name: out})
            except Exception as e:
                upd(**{f"{name}_error": repr(e)[:200]})
            print(f"[bench] {name} done", file=sys.stderr)

        def _conformer():
            fps = measure_jax(steps=10, encoder_type="conformer",
                              stream_bf16=True)
            out = {"conformer_frames_per_sec": round(fps, 1)}
            roof = measure_mfu(encoder_type="conformer", fps=fps,
                               stream_bf16=True)
            if roof:
                out.update({
                    "conformer_mfu": roof.get("mfu"),
                    "conformer_mfu_analytic": roof.get("mfu_analytic"),
                    "conformer_hbm_util": roof.get("hbm_util"),
                    "conformer_step_time_ms": roof.get("step_time_ms"),
                    "conformer_step_flops": roof.get("step_flops"),
                    "conformer_step_flops_analytic":
                        roof.get("step_flops_analytic"),
                })
            return out

        def _streaming():
            import jax.numpy as jnp

            from pytorch_kaldi_asr_tpu.tools.bench_rtf import (
                bench_streaming_conformer,
            )

            r = bench_streaming_conformer(frames=200, steps=2)
            # each push returns host posteriors, so one tunnel round-trip
            # is inherent per push; report the bare RTT so the JSON line
            # carries the tunnel-floor vs on-chip-compute decomposition
            # (BASELINE.md round-3 streaming row)
            float(jnp.zeros((), jnp.float32))
            rtts = []
            for _ in range(5):
                t0 = time.perf_counter()
                float(jnp.zeros((), jnp.float32))
                rtts.append(time.perf_counter() - t0)
            rtt_ms = sorted(rtts)[len(rtts) // 2] * 1e3
            return {"streaming_conformer_rtf": r["value"],
                    "streaming_push_ms_p50": r["push_ms_p50"],
                    "tunnel_rtt_ms_p50": round(rtt_ms, 1)}

        def _hybrid_device():
            from pytorch_kaldi_asr_tpu.tools.bench_rtf import (
                bench_hybrid_device,
            )

            r = bench_hybrid_device()
            return {"hybrid_device_rtf": r["value"],
                    "hybrid_device_frames_per_sec": r["frames_per_sec"]}

        def _conformer_wide():
            # the TRACE_r4 analysis claims d=256 is MXU-starved and the
            # lever is WIDTH: one d=512 datapoint proves/refutes it
            # (round-4 VERDICT item 5) — MFU should climb with d_model
            wide = {"en_d_model": 512, "n_head": 4}
            fps = measure_jax(steps=8, encoder_type="conformer",
                              stream_bf16=True, extra_cfg=wide)
            out = {"conformer_d512_frames_per_sec": round(fps, 1)}
            roof = measure_mfu(encoder_type="conformer", fps=fps,
                               stream_bf16=True, extra_cfg=wide)
            if roof:
                out.update({
                    "conformer_d512_mfu": roof.get("mfu"),
                    "conformer_d512_mfu_analytic":
                        roof.get("mfu_analytic"),
                    "conformer_d512_step_time_ms":
                        roof.get("step_time_ms"),
                })
            return out

        _sub("conformer", _conformer)
        _sub("conformer_wide", _conformer_wide)
        _sub("decode_int8", measure_decode_and_int8)
        def _frontier():
            from pytorch_kaldi_asr_tpu.tools.bench_rtf import (
                bench_frontier_crossover,
            )

            return bench_frontier_crossover()

        _sub("hybrid", measure_hybrid_rtf)
        _sub("hybrid_device", _hybrid_device)
        _sub("streaming", _streaming)
        # last: the largest single stage (builds a 114k-state HLG and
        # times three decode regimes) — a deadline loses only this
        _sub("frontier_device", _frontier)
    with state["lock"]:
        if not state["done"]:
            state["done"] = True
            print(json.dumps(record), flush=True)


if __name__ == "__main__":
    if "--host-only" in sys.argv:
        print(json.dumps(host_only_record()))
    else:
        main()
