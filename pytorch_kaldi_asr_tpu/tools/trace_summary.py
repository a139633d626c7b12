"""Summarize a jax.profiler trace: top ops by total duration.

Reads the perfetto ``trace.json.gz`` that ``jax.profiler.start_trace``
writes under ``<logdir>/plugins/profile/<run>/`` (plain Chrome-trace
JSON — no tensorboard/tensorflow dependency) and aggregates complete
('X') events by name per device track.  This is the op-level
time/traffic attribution SURVEY §5.1 prescribes for steering kernel
work (the role nvprof/nsight play for the reference's CUDA path);
capture with ``BENCH_TRACE=<dir> python bench.py``.

Usage: python -m pytorch_kaldi_asr_tpu.tools.trace_summary <logdir>
           [-top N] [-md out.md]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
from collections import defaultdict


def find_trace_files(logdir):
    pats = [
        os.path.join(logdir, "**", "*.trace.json.gz"),
        os.path.join(logdir, "**", "trace.json.gz"),
        os.path.join(logdir, "**", "*.trace.json"),
    ]
    out = []
    for p in pats:
        out.extend(glob.glob(p, recursive=True))
    return sorted(set(out))


def load_events(path):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt", encoding="utf-8", errors="replace") as f:
        data = json.load(f)
    if isinstance(data, list):  # bare Chrome-trace event array
        return data
    return data.get("traceEvents", [])


def summarize_by_source(logdir, top=10):
    """Attribute device time/traffic to source lines.

    Device-track 'X' events carry XLA metadata in ``args``:
    ``source`` (file:line of the jaxpr op), ``hlo_category``,
    ``bytes_accessed`` and ``model_flops``.  Aggregating by source is
    the actionable view — it says WHICH model code owns the HBM bytes
    (the role ``nsys --stats`` source attribution plays for the
    reference's CUDA path).  -> {track: {"total_us", "rows":[(source,
    category, us, bytes, flops, calls, pct)]}}
    """
    files = find_trace_files(logdir)
    if not files:
        raise FileNotFoundError(f"no trace.json(.gz) under {logdir}")
    names = {}
    per_track = defaultdict(lambda: defaultdict(lambda: [0.0, 0, 0, 0]))
    cats = defaultdict(lambda: defaultdict(lambda: [0.0, 0, 0, 0]))
    for path in files:
        for ev in load_events(path):
            ph = ev.get("ph")
            if ph == "M" and ev.get("name") == "process_name":
                names[ev.get("pid")] = ev.get("args", {}).get("name", "")
            elif ph == "X":
                args = ev.get("args") or {}
                if "hlo_category" not in args:
                    continue  # host-side python frame, not an HLO op
                track = names.get(ev.get("pid"), f"pid{ev.get('pid')}")
                src = args.get("source") or "<no source>"
                src = src.replace("/root/repo/", "")
                dur = float(ev.get("dur", 0.0))
                nbytes = int(args.get("bytes_accessed", 0) or 0)
                flops = int(args.get("model_flops", 0) or 0)
                for table, key in ((per_track, src),
                                   (cats, args["hlo_category"])):
                    cell = table[track][key]
                    cell[0] += dur
                    cell[1] += nbytes
                    cell[2] += flops
                    cell[3] += 1
    out = {}
    for track, ops in per_track.items():
        total = sum(v[0] for v in ops.values())
        rows = sorted(((k,) + tuple(v) for k, v in ops.items()),
                      key=lambda r: -r[1])[:top]
        crows = sorted(((k,) + tuple(v) for k, v in cats[track].items()),
                       key=lambda r: -r[1])[:top]
        out[track] = {"total_us": total, "rows": rows, "category_rows": crows}
    return out


def format_source_md(summary, title="Source/HBM attribution"):
    lines = [f"# {title}", ""]
    for track in sorted(summary, key=lambda t: -summary[t]["total_us"]):
        s = summary[track]
        for head, rows in (("by source line", s["rows"]),
                           ("by HLO category", s["category_rows"])):
            lines += [f"## {track} — {head} "
                      f"(total {s['total_us'] / 1e3:.2f} ms)", "",
                      "| where | total ms | GB moved | GFLOPs | calls "
                      "| % time |",
                      "|---|---|---|---|---|---|"]
            for key, dur, nbytes, flops, cnt in rows:
                pct = 100.0 * dur / s["total_us"] if s["total_us"] else 0.0
                lines.append(
                    f"| `{key[:80]}` | {dur / 1e3:.3f} | "
                    f"{nbytes / 1e9:.3f} | {flops / 1e9:.2f} | {cnt} "
                    f"| {pct:.1f} |")
            lines.append("")
    return "\n".join(lines)


def summarize(logdir, top=10):
    """-> {track_name: [(op_name, total_us, count, pct), ...]} plus the
    per-track total duration."""
    files = find_trace_files(logdir)
    if not files:
        raise FileNotFoundError(f"no trace.json(.gz) under {logdir}")
    # pid/tid -> track name from metadata events
    names = {}
    per_track = defaultdict(lambda: defaultdict(lambda: [0.0, 0]))
    for path in files:
        for ev in load_events(path):
            ph = ev.get("ph")
            if ph == "M" and ev.get("name") == "process_name":
                names[ev.get("pid")] = ev.get("args", {}).get("name", "")
            elif ph == "X":
                track = names.get(ev.get("pid"), f"pid{ev.get('pid')}")
                cell = per_track[track][ev.get("name", "?")]
                cell[0] += float(ev.get("dur", 0.0))
                cell[1] += 1
    out = {}
    for track, ops in per_track.items():
        total = sum(v[0] for v in ops.values())
        rows = sorted(((n, v[0], v[1]) for n, v in ops.items()),
                      key=lambda r: -r[1])[:top]
        out[track] = {
            "total_us": total,
            "rows": [(n, d, c, (100.0 * d / total if total else 0.0))
                     for n, d, c in rows],
        }
    return out


def format_md(summary, title="Profiler trace summary"):
    lines = [f"# {title}", ""]
    for track in sorted(summary,
                        key=lambda t: -summary[t]["total_us"]):
        s = summary[track]
        lines += [f"## {track} (total {s['total_us'] / 1e3:.2f} ms)", "",
                  "| op | total ms | calls | % of track |",
                  "|---|---|---|---|"]
        for name, dur, cnt, pct in s["rows"]:
            lines.append(
                f"| `{name[:90]}` | {dur / 1e3:.3f} | {cnt} | {pct:.1f} |")
        lines.append("")
    return "\n".join(lines)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("logdir")
    parser.add_argument("-top", type=int, default=10)
    parser.add_argument("-md", default=None,
                        help="also write a markdown summary here")
    opt = parser.parse_args(argv)
    summary = summarize(opt.logdir, top=opt.top)
    text = format_md(summary)
    try:
        text += "\n" + format_source_md(
            summarize_by_source(opt.logdir, top=opt.top))
    except FileNotFoundError:
        pass
    print(text)
    if opt.md:
        with open(opt.md, "w", encoding="utf-8") as f:
            f.write(text + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
