"""Job launcher: the framework's replacement for the reference's file-based
grid schedulers (kaldi/queue.pl, utils/run.pl, slurm.pl, pbs.pl, ssh.pl —
SURVEY.md §2b/§5.8), preserving their uniform CLI contract::

    launch [--max-jobs N] [JOB=1:N] <log-file> <command> [args...]

- ``JOB=1:N`` expands into N jobs with ``JOB`` substituted in the log path
  and arguments (run.pl's array-job contract);
- stdout/stderr of each job is captured into its log file, book-ended by the
  ``# command / # Started / # Ended (code N) / # Accounting`` lines the Kaldi
  log-triage tooling greps for;
- failure of any array element fails the launcher with a run.pl-style
  message.

Single-host multi-process only: on TPU, in-process parallelism is the mesh
(parallel/mesh.py), and multi-host jobs use ``jax.distributed.initialize``
driven by the hosts' own launcher — there is deliberately no NFS-sync-file
machinery to replicate here."""

from __future__ import annotations

import os
import re
import subprocess
import sys
import time


def _expand(template, job):
    return template.replace("JOB", str(job))


def run_job(log_file, command, job=None):
    """Run one command, capturing output into log_file with Kaldi-style
    book-ends.  Returns the exit code."""
    if job is not None:
        log_file = _expand(log_file, job)
        command = [_expand(c, job) for c in command]
    os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
    start = time.time()
    with open(log_file, "w", encoding="utf-8") as log:
        log.write("# " + " ".join(command) + "\n")
        log.write("# Started at " + time.ctime(start) + "\n#\n")
        log.flush()
        proc = subprocess.run(
            command, stdout=log, stderr=subprocess.STDOUT
        )
        elapsed = time.time() - start
        log.write(f"# Accounting: time={int(elapsed)} threads=1\n")
        log.write(f"# Ended (code {proc.returncode}) at "
                  f"{time.ctime()}, elapsed time {elapsed:.0f} seconds\n")
    return proc.returncode


def run_job_with_retries(log_file, command, job=None, retries=0):
    """run_job plus requeue-on-failure (role of queue.pl's remap of
    OOM-killed jobs into the re-runnable state, reference kaldi/queue.pl
    exit-137 handling)."""
    code = run_job(log_file, command, job)
    attempt = 0
    while code != 0 and attempt < retries:
        attempt += 1
        code = run_job(log_file, command, job)
    return code


def launch(argv):
    argv = list(argv)
    max_jobs = 0
    retries = 0
    while argv and (argv[0].startswith("--") or argv[0] in ("-q", "-l")):
        opt = argv.pop(0)
        if opt.startswith("--max-jobs"):
            max_jobs = int(opt.split("=", 1)[1] if "=" in opt else argv.pop(0))
        elif opt.startswith("--retries"):
            retries = int(opt.split("=", 1)[1] if "=" in opt else argv.pop(0))
        elif opt in ("-q", "-l"):  # accepted+ignored queue.pl resource flags
            argv.pop(0)
        else:
            raise SystemExit(f"unknown option {opt}")

    job_range = None
    m = re.match(r"^(\w+)=(\d+):(\d+)$", argv[0]) if argv else None
    if m:
        if m.group(1) != "JOB":
            raise SystemExit("array variable must be named JOB")
        job_range = range(int(m.group(2)), int(m.group(3)) + 1)
        argv.pop(0)

    if len(argv) < 2:
        raise SystemExit(
            "usage: launch [--max-jobs N] [JOB=1:N] <log-file> <command...>"
        )
    log_file, command = argv[0], argv[1:]

    if job_range is None:
        code = run_job_with_retries(log_file, command, retries=retries)
        if code != 0:
            print(f"launch: job failed (code {code}), log is in {log_file}",
                  file=sys.stderr)
        return code

    failed = 0
    jobs = list(job_range)
    limit = max_jobs or len(jobs)
    import concurrent.futures

    with concurrent.futures.ThreadPoolExecutor(max_workers=limit) as pool:
        futures = {
            pool.submit(run_job_with_retries, log_file, command, job,
                        retries): job
            for job in jobs
        }
        for fut in concurrent.futures.as_completed(futures):
            if fut.result() != 0:
                failed += 1
    if failed:
        print(
            f"launch: {failed} / {len(jobs)} failed, log is in "
            f"{_expand(log_file, '*')}",
            file=sys.stderr,
        )
        return 1
    return 0


def main():
    return launch(sys.argv[1:])


if __name__ == "__main__":
    sys.exit(main())
