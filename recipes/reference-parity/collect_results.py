#!/usr/bin/env python3
"""Collect the two parity legs into a side-by-side report.

Usage:
    python3 collect_results.py --ref WORK_REF --tpu WORK_TPU \
        [--json out.json] [--md out.md] [--meta k=v ...]

Each WORK dir is a completed leg (run_reference_leg.sh / run_tpu_leg.sh):
``decode_{dev,test}/scoring/rescore_*_wer`` files in compute-wer format.
Reports each leg's best rescoring weight per split (the reference's
best_wer.sh selection rule, kaldi/best_wer.sh:1-32) and the WER delta.
"""

import argparse
import glob
import json
import os
import re

WER_RE = re.compile(
    r"%WER\s+([\d.]+)\s+\[\s*(\d+)\s*/\s*(\d+),\s*(\d+)\s+ins,"
    r"\s*(\d+)\s+del,\s*(\d+)\s+sub\s*\]"
)


def best_wer(work, split, subdir=None):
    """(wer, detail dict) of the best rescoring weight for one split.
    ``subdir`` overrides the default decode_{split} directory (the
    matched-epoch protocol's decode_ep{N}_{split} outputs from
    decode_checkpoint.sh)."""
    best = None
    for path in sorted(
        glob.glob(os.path.join(work, subdir or f"decode_{split}",
                               "scoring", "*_wer"))
    ):
        with open(path) as f:
            m = WER_RE.search(f.read())
        if not m:
            continue
        wer = float(m.group(1))
        if best is None or wer < best["wer"]:
            best = {
                "wer": wer,
                "errors": int(m.group(2)),
                "words": int(m.group(3)),
                "ins": int(m.group(4)),
                "del": int(m.group(5)),
                "sub": int(m.group(6)),
                "file": os.path.basename(path),
            }
    if best is None:
        raise SystemExit(f"no parseable *_wer files under {work} for {split}")
    return best


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", required=True)
    ap.add_argument("--tpu", required=True)
    ap.add_argument("--json")
    ap.add_argument("--md")
    ap.add_argument("--meta", nargs="*", default=[],
                    help="extra k=v pairs recorded in the JSON")
    ap.add_argument("--epochs", nargs="*", type=int, default=[],
                    help="also collect matched-epoch decodes "
                         "(decode_ep{N}_{split} dirs from "
                         "decode_checkpoint.sh) for these epochs")
    opt = ap.parse_args(argv)

    report = {"splits": {}}
    for k_v in opt.meta:
        k, _, v = k_v.partition("=")
        report[k] = v
    lines = [
        "| split | reference (torch CPU) | this framework | delta (ours - ref) |",
        "|---|---|---|---|",
    ]
    for split in ("dev", "test"):
        ref = best_wer(opt.ref, split)
        tpu = best_wer(opt.tpu, split)
        delta = tpu["wer"] - ref["wer"]
        report["splits"][split] = {"reference": ref, "tpu": tpu,
                                   "delta": round(delta, 2)}
        lines.append(
            f"| {split} | {ref['wer']:.2f}% ({ref['errors']}/{ref['words']}) "
            f"| {tpu['wer']:.2f}% ({tpu['errors']}/{tpu['words']}) "
            f"| {delta:+.2f} |"
        )
    if opt.epochs:
        report["matched_epochs"] = {}
        lines += [
            "",
            "| epoch | split | reference | this framework | delta |",
            "|---|---|---|---|---|",
        ]
        for ep in opt.epochs:
            report["matched_epochs"][str(ep)] = {}
            for split in ("dev", "test"):
                sub = f"decode_ep{ep}_{split}"
                try:
                    ref = best_wer(opt.ref, split, subdir=sub)
                    tpu = best_wer(opt.tpu, split, subdir=sub)
                except SystemExit:
                    continue
                delta = tpu["wer"] - ref["wer"]
                report["matched_epochs"][str(ep)][split] = {
                    "reference": ref, "tpu": tpu, "delta": round(delta, 2),
                }
                lines.append(
                    f"| {ep} | {split} "
                    f"| {ref['wer']:.2f}% ({ref['errors']}/{ref['words']}) "
                    f"| {tpu['wer']:.2f}% ({tpu['errors']}/{tpu['words']}) "
                    f"| {delta:+.2f} |"
                )
    md = "\n".join(lines)
    print(md)
    if opt.json:
        with open(opt.json, "w") as f:
            json.dump(report, f, indent=1)
    if opt.md:
        with open(opt.md, "w") as f:
            f.write(md + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
