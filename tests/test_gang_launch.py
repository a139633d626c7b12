"""Gang scheduling in the launcher (parallel/launch.py --gang): the
multi-host SPMD failure model — one dead rank kills and relaunches the
whole array, because a jax.distributed world cannot survive a missing
rank inside its collectives."""

import os
import stat
import time

import pytest

from pytorch_kaldi_asr_tpu.parallel import launch as launch_mod


def _script(path, body):
    path.write_text("#!/bin/bash\n" + body)
    path.chmod(path.stat().st_mode | stat.S_IEXEC)
    return str(path)


def test_gang_kills_survivors_fast(tmp_path, monkeypatch):
    """Rank 2 fails instantly; rank 1 would sleep 60 s — gang mode must
    SIGTERM it and return promptly instead of waiting the hour out."""
    monkeypatch.setattr(launch_mod, "GANG_KILL_GRACE", 3.0)
    script = _script(
        tmp_path / "job.sh",
        'if [ "$1" = "2" ]; then exit 7; fi\nsleep 60\n')
    t0 = time.time()
    rc = launch_mod.launch(
        ["--gang", "JOB=1:2", str(tmp_path / "log.JOB.txt"),
         "bash", script, "JOB"])
    assert rc == 1
    assert time.time() - t0 < 30
    log1 = (tmp_path / "log.1.txt").read_text()
    assert "Gang: killed after job 2 exited 7" in log1
    log2 = (tmp_path / "log.2.txt").read_text()
    assert "Ended (code 7)" in log2


def test_gang_relaunches_whole_array_on_failure(tmp_path):
    """First attempt: rank 2 fails (flag file not yet present).  With
    --retries 1 BOTH ranks run again and succeed."""
    flag = tmp_path / "second_attempt"
    script = _script(
        tmp_path / "job.sh",
        f'echo attempt-marker-$1\n'
        f'if [ ! -f {flag} ]; then\n'
        f'  if [ "$1" = "2" ]; then touch {flag}; exit 1; fi\n'
        f'  exit 0\n'
        f'fi\nexit 0\n')
    rc = launch_mod.launch(
        ["--gang", "--retries", "1", "JOB=1:2",
         str(tmp_path / "log.JOB.txt"), "bash", script, "JOB"])
    assert rc == 0
    # the retry overwrote the logs: rank 1 ran twice (marker present in
    # the final log means the relaunch really included the healthy rank)
    assert "attempt-marker-1" in (tmp_path / "log.1.txt").read_text()
    assert "Ended (code 0)" in (tmp_path / "log.2.txt").read_text()


def test_gang_preemption_uses_resubmit_budget(tmp_path):
    """A rank exiting PREEMPT_EXIT_CODE consumes --resubmit, not
    --retries (same split as run_job_with_retries)."""
    flag = tmp_path / "resumed"
    code = launch_mod.PREEMPT_EXIT_CODE
    script = _script(
        tmp_path / "job.sh",
        f'if [ ! -f {flag} ]; then touch {flag}; exit {code}; fi\nexit 0\n')
    rc = launch_mod.launch(
        ["--gang", "--resubmit", "1", "JOB=1:2",
         str(tmp_path / "log.JOB.txt"), "bash", script, "JOB"])
    assert rc == 0

    # budget exhausted -> the preempt code surfaces as failure
    os.remove(flag)
    rc = launch_mod.launch(
        ["--gang", "JOB=1:2", str(tmp_path / "log.JOB.txt"),
         "bash", script, "JOB"])
    assert rc == 1


def test_gang_preempt_classified_by_initiating_rank(tmp_path, monkeypatch):
    """A preempted rank (exit 75) whose SURVIVOR gets gang-killed (-15)
    must still consume the resubmit budget, not retries: classification
    keys off the initiating failure, not the launcher's own kill codes."""
    monkeypatch.setattr(launch_mod, "GANG_KILL_GRACE", 3.0)
    flag = tmp_path / "resumed"
    code = launch_mod.PREEMPT_EXIT_CODE
    script = _script(
        tmp_path / "job.sh",
        f'if [ ! -f {flag} ]; then\n'
        f'  if [ "$1" = "1" ]; then touch {flag}; exit {code}; fi\n'
        f'  sleep 60\n'  # survivor: must be killed, and its -15 ignored
        f'fi\nexit 0\n')
    rc = launch_mod.launch(
        ["--gang", "--resubmit", "1", "JOB=1:2",
         str(tmp_path / "log.JOB.txt"), "bash", script, "JOB"])
    assert rc == 0  # retries budget was 0: only resubmit could save this


def test_gang_requires_array():
    with pytest.raises(SystemExit, match="JOB=1:N"):
        launch_mod.launch(["--gang", "/tmp/log.txt", "true"])


def test_gang_backend_mutually_exclusive():
    with pytest.raises(SystemExit, match="mutually exclusive"):
        launch_mod.launch(
            ["--gang", "--backend", "sge", "JOB=1:2", "/tmp/log.JOB.txt",
             "true"])


def test_gang_all_clean_is_zero(tmp_path):
    rc = launch_mod.launch(
        ["--gang", "JOB=1:3", str(tmp_path / "log.JOB.txt"), "true"])
    assert rc == 0
    for j in (1, 2, 3):
        assert "Ended (code 0)" in (tmp_path / f"log.{j}.txt").read_text()
