"""Tests for the launcher's remote (ssh.pl-role) execution path:
host-file round-robin, ssh argv construction, and end-to-end array-job
dispatch through a fake ssh that records the target host."""

import os
import stat
import subprocess
import sys

from pytorch_kaldi_asr_tpu.parallel.launch import (
    launch,
    read_hosts,
    remote_command,
)


FAKE_SSH = """#!/usr/bin/env bash
# fake ssh: consumes "-o BatchMode=yes <host> <remote-cmd>", records the
# host, and runs the remote command locally.
args=()
while [ "$1" = "-o" ]; do shift 2; done
host=$1; shift
echo "HOST=$host"
exec bash -c "$1"
"""


def _install_fake_ssh(tmp_path, monkeypatch):
    ssh = tmp_path / "fake_ssh"
    ssh.write_text(FAKE_SSH)
    ssh.chmod(ssh.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PKA_SSH", str(ssh))
    return str(ssh)


def test_read_hosts(tmp_path):
    p = tmp_path / "machines"
    p.write_text("hostA\n# comment\nhostB  # trailing\n\nhostA\n")
    assert read_hosts(str(p)) == ["hostA", "hostB", "hostA"]


def test_remote_command_shape(monkeypatch):
    monkeypatch.delenv("PKA_SSH", raising=False)
    argv = remote_command("node1", ["echo", "hello world"], cwd="/work dir")
    assert argv[0] == "ssh"
    assert argv[1:3] == ["-o", "BatchMode=yes"]
    assert argv[3] == "node1"
    assert argv[4] == "cd '/work dir' && echo 'hello world'"


def test_array_jobs_round_robin_over_hosts(tmp_path, monkeypatch):
    _install_fake_ssh(tmp_path, monkeypatch)
    hosts = tmp_path / "machines"
    hosts.write_text("alpha\nbeta\n")
    log = str(tmp_path / "log" / "job.JOB.log")
    code = launch(["--hosts", str(hosts), "JOB=1:4", log,
                   "echo", "job-JOB"])
    assert code == 0
    seen = {}
    for j in range(1, 5):
        body = open(str(tmp_path / "log" / f"job.{j}.log")).read()
        assert f"job-{j}" in body
        host = [l for l in body.splitlines() if l.startswith("HOST=")][0]
        seen[j] = host.split("=")[1]
    assert seen[1] != seen[2]          # round robin alternates
    assert seen[1] == seen[3]
    assert set(seen.values()) == {"alpha", "beta"}


def test_single_job_on_first_host(tmp_path, monkeypatch):
    _install_fake_ssh(tmp_path, monkeypatch)
    hosts = tmp_path / "machines"
    hosts.write_text("gamma\n")
    log = str(tmp_path / "single.log")
    assert launch(["--hosts", str(hosts), log, "echo", "solo"]) == 0
    body = open(log).read()
    assert "HOST=gamma" in body and "solo" in body
    assert "# Running on gamma" in body


def test_remote_failure_propagates(tmp_path, monkeypatch):
    _install_fake_ssh(tmp_path, monkeypatch)
    hosts = tmp_path / "machines"
    hosts.write_text("h1\n")
    log = str(tmp_path / "fail.JOB.log")
    code = launch(["--hosts", str(hosts), "JOB=1:2", log, "false"])
    assert code != 0
