"""Two-PROCESS jax.distributed end-to-end test (VERDICT round-1 item #7:
dryrun_multichip covers multi-device but not host boundaries).  Spawns two
worker processes on localhost that join one distributed runtime via
parallel.multihost.initialize and run a real cross-process collective."""

import os
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_runtime():
    port = _free_port()
    n = 2
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py"),
             str(i), str(n), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for i in range(n)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"MULTIHOST_OK {i}/{n}" in out, out


@pytest.mark.slow
def test_launcher_driven_two_process_training(tmp_path):
    """ROADMAP item 3 end to end: the launcher's JOB=1:2 array drives two
    worker processes that join one jax.distributed runtime, train the
    recipe's jitted step data-parallel over a mesh spanning both, and
    coordinate checkpointing (process 0 writes, both barrier + reload)."""
    port = _free_port()
    n = 2
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2")
    log = tmp_path / "train.JOB.log"
    proc = subprocess.run(
        [sys.executable, "-m", "pytorch_kaldi_asr_tpu.parallel.launch",
         f"JOB=1:{n}", str(log),
         sys.executable, os.path.join(HERE, "multihost_train_worker.py"),
         "JOB", str(n), str(port), str(tmp_path)],
        capture_output=True, text=True, env=env, timeout=600,
        cwd=os.path.dirname(HERE),
    )
    assert proc.returncode == 0, proc.stderr + proc.stdout
    for i in range(n):
        out = (tmp_path / f"train.{i + 1}.log").read_text()
        assert f"MULTIHOST_TRAIN_OK {i}/{n}" in out, out
        assert "devices=4" in out  # 2 hosts x 2 local devices
    assert (tmp_path / "ckpt" / "params.msgpack").exists()


@pytest.mark.slow
def test_gang_restart_reforms_distributed_world(tmp_path):
    """Elastic multi-host training (ROADMAP item 7's remaining leg): rank
    2 dies mid-training on the first attempt; the --gang launcher kills
    the survivor (wedged in the next collective) and relaunches the whole
    array, which RE-FORMS the jax.distributed world on the same
    coordinator address and trains to completion."""
    port = _free_port()
    n = 2
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2")
    log = tmp_path / "train.JOB.log"
    die_flag = tmp_path / "rank2_died_once"
    proc = subprocess.run(
        [sys.executable, "-m", "pytorch_kaldi_asr_tpu.parallel.launch",
         "--gang", "--retries", "1", f"JOB=1:{n}", str(log),
         sys.executable, os.path.join(HERE, "multihost_train_worker.py"),
         "JOB", str(n), str(port), str(tmp_path), str(die_flag)],
        capture_output=True, text=True, env=env, timeout=900,
        cwd=os.path.dirname(HERE),
    )
    assert proc.returncode == 0, proc.stderr + proc.stdout
    assert die_flag.exists()  # the first attempt really died
    for i in range(n):
        out = (tmp_path / f"train.{i + 1}.log").read_text()
        assert f"MULTIHOST_TRAIN_OK {i}/{n}" in out, out
    assert (tmp_path / "ckpt" / "params.msgpack").exists()


@pytest.mark.slow
def test_gang_pipeline_across_processes(tmp_path):
    """Round-4 VERDICT item 7: PP's ppermute relay must cross a PROCESS
    boundary, not just a single-process virtual mesh.  The --gang
    launcher drives two workers that form one jax.distributed world and
    build a ('data', 'pipe') mesh TRANSPOSED so consecutive pipe stages
    live in different processes; forward and grads are pinned to the
    local single-device oracle on both ranks."""
    port = _free_port()
    n = 2
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2")
    log = tmp_path / "pp.JOB.log"
    proc = subprocess.run(
        [sys.executable, "-m", "pytorch_kaldi_asr_tpu.parallel.launch",
         "--gang", f"JOB=1:{n}", str(log),
         sys.executable, os.path.join(HERE, "multihost_pp_worker.py"),
         "JOB", str(n), str(port)],
        capture_output=True, text=True, env=env, timeout=600,
        cwd=os.path.dirname(HERE),
    )
    assert proc.returncode == 0, proc.stderr + proc.stdout
    for i in range(n):
        out = (tmp_path / f"pp.{i + 1}.log").read_text()
        assert f"MULTIHOST_PP_OK {i}/{n}" in out, out
        assert "stages_cross_process" in out
