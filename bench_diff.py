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

Host degradation is multi-regime (round 10's lesson): the arithmetic
probe (calibration2) was FLAT while task-scheduling/IPC overhead
doubled and every shuffle/Python-worker-heavy entry read 1.5-2×.  The
gate therefore takes the MAX over all available host estimators —
calibration2, the task-scheduling probe (calibration3, bench.py
``sched_calibration``), and, when the OLD file predates calibration3,
a surrogate: the median raw ratio over plan-UNCHANGED common entries
(identical optimized plans on identical code can only diverge via the
host; requires >=20 such entries to be trusted).  A real code
regression must survive whichever regime excuses it most; entries
whose PLAN changed are still gated on the raw ratio regardless.

Plan-shape check: when both files carry ``plan_fp`` (normalized
optimized-plan hashes), entries whose fingerprint changed are listed
— a changed plan with a slower time is a REAL regression even if the
host factor would excuse the wall clock.
"""

from __future__ import annotations

import argparse
import json
import sys

#: Entries whose optimized-plan TEXT is nondeterministic on identical
#: code, so fingerprint drift there is never a plan regression.
#: q_profile_orders: multiple exact countDistinct columns go through
#: Catalyst's RewriteDistinctAggregates, which groups the distinct
#: aggregates via a Scala HashMap keyed by expression trees — fresh
#: exprIds each construction → the Expand/Aggregate KEY ORDER in the
#: plan string varies per run (verified: three constructions in one
#: session yield three fingerprints; the diff is only the grouping
#: list order).  Semantically identical plans; excluded by name
#: rather than over-normalizing bracketed lists, which would mask
#: real key-set changes everywhere else.
FP_UNSTABLE = {"q_profile_orders"}


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

    # Host estimators, one per degradation regime; >1 means the new
    # host is slower.  Arithmetic: prefer the long probe
    # (calibration2, ~1 s/shot) — the short probe's scheduling floor
    # makes its median swing ±40% run-to-run; probes must match by
    # name to compare.  Scheduling: calibration3 (2000 trivial tasks
    # ≈ pure scheduler+launch+IPC overhead).
    estimators: dict[str, float] = {}
    for label, keys in (
        ("arith", ("calibration2", "calibration")),
        ("sched", ("calibration3",)),
    ):
        for key in keys:
            o, n = old.get(key) or {}, new.get(key) or {}
            if (
                o.get("median") and n.get("median")
                and o.get("probe") == n.get("probe")
            ):
                estimators[f"{label}({o['probe']})"] = (
                    n["median"] / o["median"]
                )
                break

    ofp, nfp = old.get("plan_fp", {}), new.get("plan_fp", {})
    # Fingerprints are only comparable under the SAME normalizer: a
    # round that edits bench.py's _EPHEMERAL rules re-fingerprints
    # plans that didn't change (round 10's hex-regex fix flagged ~10
    # phantom "plan changes").  bench.py stamps plan_fp_version; when
    # both files carry one and they differ, skip plan comparison.
    over, nver = old.get("plan_fp_version"), new.get("plan_fp_version")
    fp_comparable = not (over and nver and over != nver)
    plan_changed = sorted(
        n for n in set(ofp) & set(nfp)
        if ofp[n] != nfp[n] and n not in FP_UNSTABLE
    ) if fp_comparable else []
    plan_changed_set = set(plan_changed)

    # A real regression must survive whichever probe regime excuses
    # it most — divide new timings by the LARGEST estimator.
    host = max(estimators.values()) if estimators else 1.0

    # Plan-stable fleet diagnosis: entries whose optimized plan is
    # bit-identical across rounds can only diverge via the host (or
    # Python-internals changes, which are rare and reviewed) — a
    # BROAD raw regression across them while the arithmetic probe is
    # flat is the round-10 signature of regime-specific host
    # degradation (task-scheduling/IPC taxed, pure compute not).
    stable_ratios = sorted(
        nq[name] / oq[name]
        for name in set(ofp) & set(nfp)
        if fp_comparable and ofp[name] == nfp[name]
        and name in oq and name in nq
        and max(oq[name], nq[name]) >= args.floor
        and oq[name] > 0
    )
    regime_shift = False
    if len(stable_ratios) >= 20:
        frac_reg = sum(r > args.ratio for r in stable_ratios) / len(
            stable_ratios
        )
        # >=15% of plan-stable entries over the gate, on a host whose
        # sched regime is unprobed or reads slow -> regime shift
        sched = [v for k, v in estimators.items() if k.startswith("sched")]
        regime_shift = frac_reg >= 0.15 and (
            not sched or max(sched) > args.ratio
        )

    regressions, suspects, improved, added, removed = [], [], [], [], []
    excused = 0  # raw-regressed entries the host factor explains
    stable_set = {
        n for n in set(ofp) & set(nfp)
        if fp_comparable and ofp[n] == nfp[n]
    }
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
            if regime_shift and name in stable_set:
                # identical plan + regime-shifted host: report, don't
                # gate — it cannot be a plan regression, and the
                # probe-visible (or unprobed-legacy) sched regime
                # explains the fleet-wide raw shift
                suspects.append((raw, name, ot, nt))
            else:
                regressions.append((r, name, ot, nt))
        elif name in plan_changed_set and raw > args.ratio:
            # A changed optimized plan whose RAW wall clock regressed is
            # a real plan-shape regression even when a faster host would
            # excuse the adjusted ratio — gate on it.
            regressions.append((raw, name, ot, nt))
        else:
            if raw > args.ratio:
                excused += 1
            if r < 1 / args.ratio:
                improved.append((r, name, ot, nt))
    removed = sorted(set(oq) - set(nq))

    print(
        f"total: {old.get('value')}s -> {new.get('value')}s "
        f"({len(nq)} queries; {len(added)} added, {len(removed)} removed)"
    )
    if estimators:
        parts = ", ".join(
            f"{k}={v:.3f}x" for k, v in sorted(estimators.items())
        )
        print(
            f"  host estimators: {parts} -> using max {host:.3f}x — "
            f"new timings divided by this before judging"
        )
        if excused and not regressions:
            print(
                f"  classification: host-side degradation — "
                f"{excused} raw >={args.ratio}x entr"
                f"{'y' if excused == 1 else 'ies'} fully explained by "
                f"the host factor, none survive the adjusted gate"
            )
    if not fp_comparable:
        print(
            f"  plan fingerprints NOT comparable (normalizer "
            f"{over} vs {nver}) — plan-change checks skipped"
        )
    if regime_shift:
        print(
            f"  classification: regime-specific host degradation — "
            f"{sum(r > args.ratio for r in stable_ratios)}/"
            f"{len(stable_ratios)} plan-stable entries read raw "
            f">{args.ratio}x while the arithmetic probe is flat; "
            f"plan-stable entries demoted to suspect (host), "
            f"plan-changed entries still gated on raw ratio"
        )
    if plan_changed:
        print(f"  plan fingerprint changed ({len(plan_changed)}): "
              + ", ".join(plan_changed))
    for r, name, ot, nt in sorted(improved):
        print(f"  improved  {name}: {ot:.2f}s -> {nt:.2f}s ({r:.2f}x)")
    for r, name, ot, nt in sorted(suspects, reverse=True):
        print(f"  suspect(host) {name}: {ot:.2f}s -> {nt:.2f}s "
              f"({r:.2f}x raw, plan unchanged)")
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
