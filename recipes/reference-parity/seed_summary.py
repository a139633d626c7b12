#!/usr/bin/env python3
"""Seed-variance summary for the parity study (round-4 VERDICT item 1).

Usage:
    python3 seed_summary.py --leg ref=/path/to/ref_work \
        --leg ours=/path/to/tpu_seed1 [--leg ours=... ...] \
        [--escape-acc 60] [--json out.json]

Each ``--leg name=dir`` is a completed (or in-progress) leg work dir.
Per leg it reports:

- the per-epoch DEV token-accuracy curve parsed from train.log (both
  frameworks print the same ``[INFO]-----(evaluating dev set)-----
  accuracy: X %`` lines — ours mirrors the reference's logging contract);
- the plateau-escape epoch: first epoch whose dev accuracy exceeds
  ``--escape-acc`` (default 60% — the ~41% alignment plateau and the
  post-escape S-curve are separated by a wide band, so any threshold in
  50-80 gives the same ordering);
- final best dev accuracy;
- final dev/test WER (best rescoring weight, collect_results.best_wer)
  when the decode dirs exist.

The point of the study: with >=4 ours seeds and >=2 reference draws, do
the escape-epoch and final-WER distributions overlap (escape timing is a
high-variance event, not a framework property), or is ours
systematically later?
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from collect_results import best_wer  # noqa: E402

DEV_RE = re.compile(
    r"evaluating dev set\)-----\s*accuracy:\s*([\d.]+)\s*%")


def dev_curve(work):
    """Per-epoch dev token accuracy from train.log (1-based epochs)."""
    path = os.path.join(work, "train.log")
    if not os.path.exists(path):
        return []
    with open(path, errors="replace") as f:
        return [float(m.group(1)) for m in DEV_RE.finditer(f.read())]


def escape_epoch(curve, threshold):
    for i, acc in enumerate(curve, 1):
        if acc > threshold:
            return i
    return None


def leg_summary(work, threshold, probe_epochs=(1, 10, 20)):
    curve = dev_curve(work)
    out = {
        "work": work,
        "epochs_logged": len(curve),
        "escape_epoch": escape_epoch(curve, threshold),
        "best_dev_acc": max(curve) if curve else None,
        "final_dev_acc": curve[-1] if curve else None,
        # pre-escape probes: every draw should sit on the same ~41%
        # alignment plateau here if the two stacks learn identically
        "probe_acc": {e: curve[e - 1] for e in probe_epochs
                      if len(curve) >= e},
        # full per-epoch dev curve — the study's raw evidence
        "dev_curve": curve,
    }
    for split in ("dev", "test"):
        try:
            detail = best_wer(work, split)
            out[f"{split}_wer"] = detail["wer"]
            out[f"{split}_detail"] = detail
        except (Exception, SystemExit):  # leg not decoded yet
            out[f"{split}_wer"] = None
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--leg", action="append", required=True,
                        metavar="name=dir")
    parser.add_argument("--escape-acc", type=float, default=60.0)
    parser.add_argument("--json", default=None)
    parser.add_argument("--md", default=None,
                        help="also write a markdown table fragment")
    opt = parser.parse_args(argv)

    legs = []
    for spec in opt.leg:
        name, _, work = spec.partition("=")
        legs.append((name, leg_summary(work, opt.escape_acc)))

    by_name = {}
    for name, s in legs:
        by_name.setdefault(name, []).append(s)

    print(f"{'leg':<10} {'dir':<28} {'escape_ep':>9} {'best_acc':>8} "
          f"{'dev_wer':>8} {'test_wer':>9}")
    for name, s in legs:
        print(f"{name:<10} {os.path.basename(s['work']):<28} "
              f"{str(s['escape_epoch']):>9} "
              f"{s['best_dev_acc'] if s['best_dev_acc'] is not None else '-':>8} "
              f"{s['dev_wer'] if s['dev_wer'] is not None else '-':>8} "
              f"{s['test_wer'] if s['test_wer'] is not None else '-':>9}")

    report = {"escape_acc_threshold": opt.escape_acc, "legs": by_name}
    for name, ss in by_name.items():
        eps = [s["escape_epoch"] for s in ss if s["escape_epoch"]]
        if eps:
            report[f"{name}_escape_range"] = [min(eps), max(eps)]
    if opt.json:
        with open(opt.json, "w") as f:
            json.dump(report, f, indent=1)
        print(f"[seed_summary] wrote {opt.json}")
    if opt.md:
        with open(opt.md, "w") as f:
            f.write("| leg | escape epoch | best dev acc | dev WER | "
                    "test WER |\n|---|---|---|---|---|\n")
            for name, s in legs:
                f.write(
                    f"| {name} ({os.path.basename(s['work'])}) "
                    f"| {s['escape_epoch']} "
                    f"| {s['best_dev_acc']}% "
                    f"| {s['dev_wer'] if s['dev_wer'] is not None else '-'}% "
                    f"| {s['test_wer'] if s['test_wer'] is not None else '-'}"
                    f"% |\n")
        print(f"[seed_summary] wrote {opt.md}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
