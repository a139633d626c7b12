"""Tests for the batch-scheduler submission path (parallel/batch.py — the
queue.pl/slurm.pl/pbs.pl roles): wrapper-script contract, submit argv
shapes, and end-to-end array submission through fake qsub/sbatch binaries
that run the wrapper locally with the scheduler's task-id variable set."""

import os
import stat
import subprocess

import pytest

from pytorch_kaldi_asr_tpu.parallel import batch
from pytorch_kaldi_asr_tpu.parallel.launch import launch


# fake scheduler: parses the array range from its own submit flags, then
# runs the wrapper once per task with the task-id env var exported —
# exactly what SGE/Slurm/PBS do, minus the cluster.
FAKE_QSUB = """#!/usr/bin/env bash
# consume qsub-ish flags; find -t lo:hi and the script path
range=""
script=""
while [ $# -gt 0 ]; do
  case "$1" in
    -t) range=$2; shift 2;;
    -cwd) shift;;
    -j|-o|-q|-l) shift 2;;
    *) script=$1; shift;;
  esac
done
lo=${range%%:*}; hi=${range##*:}
for i in $(seq $lo $hi); do
  {VAR}=$i bash "$script" &
done
wait
exit 0
"""

FAKE_SBATCH = """#!/usr/bin/env bash
range=""
script=""
while [ $# -gt 0 ]; do
  case "$1" in
    --array=*) range=${1#--array=}; shift;;
    --output=*|--partition=*) shift;;
    *) script=$1; shift;;
  esac
done
lo=${range%%-*}; hi=${range##*-}
for i in $(seq $lo $hi); do
  SLURM_ARRAY_TASK_ID=$i bash "$script" &
done
wait
exit 0
"""


def _install(tmp_path, monkeypatch, backend):
    env_override, _, var = batch.BACKENDS[backend]
    p = tmp_path / f"fake_{backend}"
    if backend == "slurm":
        p.write_text(FAKE_SBATCH)
    else:
        p.write_text(FAKE_QSUB.replace("{VAR}", var))
    p.chmod(p.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv(env_override, str(p))
    return str(p)


def test_submit_argv_shapes():
    sge = batch.submit_argv("sge", "/q/job.sh", [1, 4], queue="all.q",
                            resources=["gpu=1", "ram_free=2G"])
    assert sge[0] == "qsub"
    assert ["-t", "1:4"] == sge[sge.index("-t"):sge.index("-t") + 2]
    assert ["-q", "all.q"] in [sge[i:i + 2] for i in range(len(sge))]
    assert ["-l", "gpu=1"] in [sge[i:i + 2] for i in range(len(sge))]
    assert sge[-1] == "/q/job.sh"

    sl = batch.submit_argv("slurm", "/q/job.sh", [2, 7], queue="gpu")
    assert sl[0] == "sbatch"
    assert "--array=2-7" in sl
    assert "--partition=gpu" in sl

    with pytest.raises(KeyError):
        batch.submit_argv("lsf", "/q/job.sh", [1, 1])


def test_wrapper_contract(tmp_path):
    """The wrapper binds JOB, substitutes it into log path and argv,
    remaps exit 137->100, and leaves status/done sync files."""
    qdir = str(tmp_path / "q")
    log = str(tmp_path / "log" / "task.JOB.log")
    script = batch.write_wrapper(qdir, "sge", log,
                                 ["bash", "-c", "echo out-JOB; exit 0"],
                                 cwd=str(tmp_path))
    env = dict(os.environ, SGE_TASK_ID="3")
    subprocess.run(["bash", script], env=env, check=True)
    text = open(str(tmp_path / "log" / "task.3.log")).read()
    assert "out-3" in text
    assert "# Ended (code 0)" in text
    assert open(f"{qdir}/status.3").read().strip() == "0"
    assert os.path.exists(f"{qdir}/done.3")

    # 137 -> 100 remap (queue.pl's re-runnable marker)
    script = batch.write_wrapper(qdir, "sge", log,
                                 ["bash", "-c", "exit 137"],
                                 cwd=str(tmp_path))
    env["SGE_TASK_ID"] = "5"
    proc = subprocess.run(["bash", script], env=env)
    assert proc.returncode == 100
    assert open(f"{qdir}/status.5").read().strip() == "100"


@pytest.mark.parametrize("backend", ["sge", "slurm", "pbs"])
def test_submit_and_wait_end_to_end(tmp_path, monkeypatch, backend):
    _install(tmp_path, monkeypatch, backend)
    monkeypatch.chdir(tmp_path)
    log = str(tmp_path / "log" / "arr.JOB.log")
    failed = batch.submit_and_wait(
        backend, log, ["bash", "-c", "echo task-JOB"], [1, 2, 3],
        poll=0.05, timeout=30)
    assert failed == 0
    for j in (1, 2, 3):
        assert f"task-{j}" in open(str(tmp_path / "log" / f"arr.{j}.log")).read()


def test_launch_cli_backend_failure_propagates(tmp_path, monkeypatch):
    _install(tmp_path, monkeypatch, "sge")
    monkeypatch.chdir(tmp_path)
    log = str(tmp_path / "log" / "f.JOB.log")
    code = launch(["--backend", "sge", "-q", "all.q", "JOB=1:2", log,
                   "bash", "-c", "exit JOB"])  # job 1 exits 1, job 2 exits 2
    assert code == 1
    # and a passing array returns 0 with resources forwarded
    code = launch(["--backend=sge", "-l", "gpu=1", "JOB=1:2", log,
                   "echo", "ok-JOB"])
    assert code == 0


def test_backend_rejects_incompatible_flags(tmp_path, monkeypatch):
    _install(tmp_path, monkeypatch, "sge")
    hosts = tmp_path / "machines"
    hosts.write_text("a\nb\n")
    log = str(tmp_path / "log" / "x.JOB.log")
    with pytest.raises(SystemExit, match="mutually exclusive"):
        launch(["--backend", "sge", "--hosts", str(hosts), "JOB=1:2", log,
                "echo", "x"])
    with pytest.raises(SystemExit, match="retries"):
        launch(["--backend", "sge", "--retries", "2", "JOB=1:2", log,
                "echo", "x"])


def test_max_jobs_forwarded_as_array_throttle():
    sge = batch.submit_argv("sge", "/q/job.sh", [1, 8], max_jobs=3)
    assert ["-tc", "3"] in [sge[i:i + 2] for i in range(len(sge))]
    sl = batch.submit_argv("slurm", "/q/job.sh", [1, 8], max_jobs=3)
    assert "--array=1-8%3" in sl


def test_wait_sync_timeout_marks_pending_failed(tmp_path, capsys):
    codes = batch.wait_sync(str(tmp_path), [1, 2], poll=0.01, timeout=0.1)
    assert codes == {1: -1, 2: -1}
    assert "timed out" in capsys.readouterr().err
