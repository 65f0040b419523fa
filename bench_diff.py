#!/usr/bin/env python
"""Per-query bench regression gate.

Usage: python bench_diff.py OLD.json NEW.json [--ratio 1.5] [--floor 0.5]

Compares two bench.py output files and fails (exit 1) if any query
regressed more than ``ratio``× — ignoring queries faster than
``floor`` seconds in BOTH files, where scheduling jitter dominates.
Prints a summary either way, slowest regressions first.

Host normalization: when BOTH files carry a ``calibration`` block
(bench.py's fixed pure-JVM probe), new timings are divided by the
probe ratio before comparison, so a uniformly slower host (round 8's
failure mode: 63 fake >1.5× "regressions") doesn't read as code
regressions.  The raw ratio is still printed.

Plan-shape check: when both files carry ``plan_fp`` (normalized
optimized-plan hashes), entries whose fingerprint changed are listed
— a changed plan with a slower time is a REAL regression even if the
host factor would excuse the wall clock.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--ratio", type=float, default=1.5)
    ap.add_argument("--floor", type=float, default=0.5)
    args = ap.parse_args()

    def _load(path):
        with open(path) as f:
            raw = f.read()
        try:
            d = json.loads(raw)
        except json.JSONDecodeError:
            # raw bench.py stdout with extra lines: take the last line
            d = json.loads(raw.strip().splitlines()[-1])
        if not isinstance(d, dict):
            return {"queries": {}}
        if isinstance(d.get("parsed"), dict):
            return d["parsed"]
        if "queries" in d:
            return d
        if "tail" in d:
            # the driver's BENCH_r{N}.json wrapper: the bench line is
            # embedded (possibly truncated at the front) in "tail" —
            # recover whatever per-query pairs survive
            import re

            pairs = {
                m.group(1): float(m.group(2))
                for m in re.finditer(r'"([A-Za-z0-9_@.]+)": ([0-9][0-9.]*)\b', str(d["tail"]))
            }
            total = pairs.pop("value", None)
            for meta in ("sf", "corpus_docs", "n", "rc", "cpus"):
                pairs.pop(meta, None)
            return {"queries": pairs, "value": total}
        return {"queries": {}}

    old, new = _load(args.old), _load(args.new)
    oq, nq = old.get("queries", {}), new.get("queries", {})

    # host factor from the fixed JVM probe: >1 means the new host is
    # slower; divide new timings by it before judging regressions.
    # Prefer the long probe (calibration2, ~1 s/shot) when both files
    # carry it — the short probe's scheduling floor makes its median
    # swing ±40% run-to-run; probes must match by name to compare.
    host = 1.0
    oc = ncal = None
    for key in ("calibration2", "calibration"):
        o, n = old.get(key) or {}, new.get(key) or {}
        if (
            o.get("median") and n.get("median")
            and o.get("probe") == n.get("probe")
        ):
            oc, ncal = o["median"], n["median"]
            break
    if oc and ncal:
        host = ncal / oc

    ofp, nfp = old.get("plan_fp", {}), new.get("plan_fp", {})
    plan_changed = sorted(
        n for n in set(ofp) & set(nfp) if ofp[n] != nfp[n]
    )
    plan_changed_set = set(plan_changed)

    regressions, improved, added, removed = [], [], [], []
    for name, nt in sorted(nq.items()):
        ot = oq.get(name)
        if ot is None:
            added.append(name)
            continue
        if max(ot, nt) < args.floor:
            continue
        adj = nt / host
        r = adj / ot if ot > 0 else float("inf")
        raw = nt / ot if ot > 0 else float("inf")
        if r > args.ratio:
            regressions.append((r, name, ot, nt))
        elif name in plan_changed_set and raw > args.ratio:
            # A changed optimized plan whose RAW wall clock regressed is
            # a real plan-shape regression even when a faster host would
            # excuse the adjusted ratio — gate on it.
            regressions.append((raw, name, ot, nt))
        elif r < 1 / args.ratio:
            improved.append((r, name, ot, nt))
    removed = sorted(set(oq) - set(nq))

    print(
        f"total: {old.get('value')}s -> {new.get('value')}s "
        f"({len(nq)} queries; {len(added)} added, {len(removed)} removed)"
    )
    if oc and ncal:
        print(
            f"  host factor (JVM probe): {oc:.3f}s -> {ncal:.3f}s = "
            f"{host:.3f}x — new timings divided by this before judging"
        )
    if plan_changed:
        print(f"  plan fingerprint changed ({len(plan_changed)}): "
              + ", ".join(plan_changed))
    for r, name, ot, nt in sorted(improved):
        print(f"  improved  {name}: {ot:.2f}s -> {nt:.2f}s ({r:.2f}x)")
    for r, name, ot, nt in sorted(regressions, reverse=True):
        print(f"  REGRESSED {name}: {ot:.2f}s -> {nt:.2f}s ({r:.2f}x)")
    if removed:
        print(f"  removed queries: {', '.join(removed)}")
    if new.get("errors"):
        print(f"  ERRORS in new run: {sorted(new['errors'])}")
        return 1
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
