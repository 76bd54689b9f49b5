#!/usr/bin/env python3
"""Diff two bench artifacts and print the swing faces.

Usage: swing.py PREV.json CURR.json [ratio]

Prints (stdout, one line) the comma-separated list of queries whose cold
time moved more than `ratio` (default 1.5) in EITHER direction between the
two artifacts — the list the next 100x run passes as SPARK_GRAFT_RERUN so
the committed artifact carries a steady (min-of-2) number for exactly the
faces a round-over-round reader would question (r13 verdict task 2; the
policy is recorded in BENCH_BUDGET.md). Details go to stderr.

Both artifacts may be either the raw bench JSON line or the driver wrapper
with a `tail` field; queries missing from either side, or erroring in
either, are skipped (they have no comparable cold number).
"""
import json
import sys


def load(path):
    with open(path) as f:
        text = f.read()
    try:
        doc = json.loads(text)
    except json.JSONDecodeError:
        # driver wrapper with a truncated tail: find the last full JSON line
        # that carries a per-query map (since r15 Bench also prints a COMPACT
        # summary line after the full artifact for the driver's tail window —
        # skip past it to the full line when both are present)
        doc = None
        for line in reversed(text.splitlines()):
            line = line.strip()
            if line.startswith("{") and line.endswith("}"):
                try:
                    cand = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if doc is None:
                    doc = cand
                if "queries" in cand:
                    doc = cand
                    break
        if doc is None:
            sys.exit(f"no parseable JSON in {path}")
    if "queries" not in doc and "tail" in doc and isinstance(doc["tail"], str):
        for line in reversed(doc["tail"].splitlines()):
            line = line.strip()
            if line.startswith("{") and line.endswith("}"):
                try:
                    inner = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "queries" in inner:
                    doc = inner
                    break
    if "queries" not in doc:
        sys.exit(f"no queries map found in {path}")
    return doc


def main():
    prev, curr = load(sys.argv[1]), load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    pq, cq = prev["queries"], curr["queries"]
    perr, cerr = prev.get("errors", {}), curr.get("errors", {})
    swings = []
    for name in sorted(set(pq) & set(cq)):
        if name in perr or name in cerr:
            continue
        a, b = pq[name], cq[name]
        if a <= 0 or b <= 0:
            continue
        r = b / a
        if r > ratio or r < 1.0 / ratio:
            swings.append((name, a, b, r))
            note = ""
            if (name.startswith("q_stream_") or name.startswith("q_jdbc_")) \
                    and curr.get("rerun_staging") != "cold-reset":
                # pre-r15 artifacts: staged-landing/checkpoint memos made an
                # in-JVM rerun of these faces a warm restart (settled stream
                # replays zero batches), so their min-of-2 steady was a LOWER
                # BOUND. Since r15, Bench resets all warm state before each
                # rerun ("rerun_staging":"cold-reset" in the artifact), so
                # the note applies only when diffing against an old record.
                note = "  [staged face: rerun steady = warm lower bound]"
            print(f"[swing] {name:32s} {a:8.1f}s -> {b:8.1f}s  x{r:.2f}{note}",
                  file=sys.stderr)
    print(",".join(n for n, *_ in swings))


if __name__ == "__main__":
    main()
