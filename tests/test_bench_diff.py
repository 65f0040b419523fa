"""bench_diff.py regression-gate logic — the host-estimator and
plan-fingerprint machinery, pinned on synthetic artifacts (no Spark).

Round-10 lesson encoded here: host degradation is multi-regime.  The
arithmetic probe can be flat while task-scheduling overhead doubles;
the gate must (a) take the max over the probe regimes it has, (b)
when the OLD file predates the sched probe, recognize the regime
shift from the plan-STABLE fleet (identical optimized plans cannot be
code regressions) and demote those entries to suspect(host), while
(c) still hard-gating plan-CHANGED entries on the raw ratio, and (d)
never comparing fingerprints made by different normalizer versions.
"""

from __future__ import annotations

import json
import sys

import pytest


def _run(tmp_path, old: dict, new: dict, argv=()):
    import bench_diff

    op, np_ = tmp_path / "old.json", tmp_path / "new.json"
    op.write_text(json.dumps(old))
    np_.write_text(json.dumps(new))
    old_argv = sys.argv
    sys.argv = ["bench_diff.py", str(op), str(np_), *argv]
    try:
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            code = bench_diff.main()
        return code, buf.getvalue()
    finally:
        sys.argv = old_argv


def _cal(median, probe="range_2e10_sum"):
    return {"probe": probe, "median": median, "shots": [median]}


def test_sched_probe_excuses_task_regime_slowdown(tmp_path):
    """cal2 flat, cal3 2x: a uniform 1.8x raw slowdown must be
    excused (max-over-regimes host factor) and classified."""
    qs_old = {f"q{i}": 2.0 for i in range(10)}
    qs_new = {f"q{i}": 3.6 for i in range(10)}
    old = {"queries": qs_old, "value": 20.0,
           "calibration2": _cal(1.0),
           "calibration3": _cal(1.0, "tasks_2000_sum")}
    new = {"queries": qs_new, "value": 36.0,
           "calibration2": _cal(1.02),
           "calibration3": _cal(2.0, "tasks_2000_sum")}
    code, out = _run(tmp_path, old, new)
    assert code == 0, out
    assert "using max 2.000x" in out
    assert "classification: host-side degradation" in out
    assert "REGRESSED" not in out


def test_plan_stable_fleet_demotes_to_suspect_without_old_sched_probe(
    tmp_path,
):
    """Old file predates calibration3; arith flat; >=15% of the
    plan-stable fleet reads raw >1.5x -> regime shift: plan-stable
    entries become suspect(host) (exit 0), but a plan-CHANGED entry
    over the raw gate still fails the run."""
    n = 30
    fp_old = {f"q{i}": f"fp{i}" for i in range(n)}
    fp_new = dict(fp_old)
    qs_old = {f"q{i}": 2.0 for i in range(n)}
    qs_new = {f"q{i}": (4.0 if i < 10 else 2.1) for i in range(n)}
    old = {"queries": qs_old, "value": 60.0, "calibration2": _cal(1.0),
           "plan_fp": fp_old}
    new = {"queries": qs_new, "value": 80.0, "calibration2": _cal(1.02),
           "calibration3": _cal(2.0, "tasks_2000_sum"), "plan_fp": fp_new}
    # old lacks cal3 -> estimators = arith only (no sched pairing)
    code, out = _run(tmp_path, old, new)
    assert code == 0, out
    assert "regime-specific host degradation" in out
    assert out.count("suspect(host)") == 10
    assert "REGRESSED" not in out

    # now flip one regressed entry's fingerprint: it must hard-gate
    fp_new2 = dict(fp_new, q0="DIFFERENT")
    new2 = dict(new, plan_fp=fp_new2)
    code, out = _run(tmp_path, old, new2)
    assert code == 1, out
    assert "REGRESSED q0" in out
    assert out.count("suspect(host)") == 9


def test_fp_version_mismatch_skips_plan_comparison(tmp_path):
    """Different normalizer versions re-fingerprint unchanged plans
    (the r10 phantom set) — the gate must not read those as plan
    changes."""
    old = {"queries": {"q0": 2.0, "q1": 2.0}, "value": 4.0,
           "calibration2": _cal(1.0),
           "plan_fp": {"q0": "aaa", "q1": "bbb"},
           "plan_fp_version": "v1"}
    new = {"queries": {"q0": 2.1, "q1": 2.0}, "value": 4.1,
           "calibration2": _cal(1.0),
           "plan_fp": {"q0": "zzz", "q1": "yyy"},
           "plan_fp_version": "v2"}
    code, out = _run(tmp_path, old, new)
    assert code == 0, out
    assert "NOT comparable" in out
    assert "plan fingerprint changed" not in out


def test_real_regression_still_gates_under_all_probes(tmp_path):
    """Host probes flat, one entry 2x: a real regression must exit 1
    whether or not its plan changed."""
    old = {"queries": {"q0": 2.0, "q1": 2.0}, "value": 4.0,
           "calibration2": _cal(1.0),
           "calibration3": _cal(1.0, "tasks_2000_sum")}
    new = {"queries": {"q0": 4.0, "q1": 2.0}, "value": 6.0,
           "calibration2": _cal(1.0),
           "calibration3": _cal(1.0, "tasks_2000_sum")}
    code, out = _run(tmp_path, old, new)
    assert code == 1
    assert "REGRESSED q0" in out


def test_plan_fp_version_stamp_changes_with_rules(monkeypatch):
    """bench.PLAN_FP_VERSION must be derived from the _EPHEMERAL
    rules so any edit re-stamps the artifacts."""
    import hashlib
    import re as _re

    import bench

    recomputed = hashlib.sha256(
        "\n".join(f"{p.pattern}->{r}" for p, r in bench._EPHEMERAL).encode()
    ).hexdigest()[:8]
    assert bench.PLAN_FP_VERSION == recomputed
    mutated = bench._EPHEMERAL + [(_re.compile("zz"), "Z")]
    stamped = hashlib.sha256(
        "\n".join(f"{p.pattern}->{r}" for p, r in mutated).encode()
    ).hexdigest()[:8]
    assert stamped != bench.PLAN_FP_VERSION


@pytest.mark.parametrize(
    "token,expected",
    [
        ("stream_lr_9c2d41ab", "stream_lr_H"),          # word-glued hex
        ("bench_fw_deadbeef12", "bench_fw_H"),
        ("12345678", "12345678"),                       # pure decimal kept
        ("a1b2c3d4-1111-2222-3333-444455556666", "UUID"),
        ("12345678-1234-1234-1234-123456789012", "UUID"),  # all-decimal uuid
    ],
)
def test_plan_fp_normalizer_tokens(token, expected):
    import bench

    s = token
    for pat, repl in bench._EPHEMERAL:
        s = pat.sub(repl, s)
    assert s == expected, (token, s)


def test_fp_unstable_entries_never_read_as_plan_changes(tmp_path):
    """q_profile_orders' optimized-plan TEXT is nondeterministic on
    identical code (RewriteDistinctAggregates orders its Expand keys
    through a HashMap over fresh exprIds), so a fingerprint flip
    there must not be reported as a plan change nor raw-ratio gated —
    while the same flip on any other entry still is."""
    base = {
        "queries": {"q_profile_orders": 1.0, "q_other": 1.0},
        "calibration2": _cal(1.0),
        "plan_fp_version": "v1",
        "plan_fp": {"q_profile_orders": "aaaa", "q_other": "bbbb"},
    }
    new = {
        "queries": {"q_profile_orders": 1.05, "q_other": 1.05},
        "calibration2": _cal(1.0),
        "plan_fp_version": "v1",
        "plan_fp": {"q_profile_orders": "cccc", "q_other": "dddd"},
    }
    code, out = _run(tmp_path, base, new)
    assert "q_other" in out.split("plan fingerprint changed")[1].split("\n")[0]
    assert "q_profile_orders" not in out.split(
        "plan fingerprint changed"
    )[1].split("\n")[0]


def test_fp_unstable_drift_stays_visible(tmp_path):
    """ADVICE r11: FP_UNSTABLE drift must not be silently swallowed —
    a visible 'excluded (unstable fp)' line keeps plan drift on
    q_profile_orders observable even though it is never gated."""
    base = {
        "queries": {"q_profile_orders": 1.0},
        "calibration2": _cal(1.0),
        "plan_fp_version": "v1",
        "plan_fp": {"q_profile_orders": "aaaa"},
    }
    new = {
        "queries": {"q_profile_orders": 1.05},
        "calibration2": _cal(1.0),
        "plan_fp_version": "v1",
        "plan_fp": {"q_profile_orders": "cccc"},
    }
    code, out = _run(tmp_path, base, new)
    assert code == 0
    assert "excluded (unstable fp) q_profile_orders" in out
    # and when the fingerprint does NOT drift, no line is printed
    new["plan_fp"]["q_profile_orders"] = "aaaa"
    code, out = _run(tmp_path, base, new)
    assert "excluded (unstable fp)" not in out


def _run_mirrors(tmp_path, olds, news, argv=()):
    import io
    import bench_diff
    from contextlib import redirect_stdout

    opaths, npaths = [], []
    for i, d in enumerate(olds):
        p = tmp_path / f"old{i}.json"
        p.write_text(json.dumps(d))
        opaths.append(str(p))
    for i, d in enumerate(news):
        p = tmp_path / f"new{i}.json"
        p.write_text(json.dumps(d))
        npaths.append(str(p))
    old_argv = sys.argv
    sys.argv = ["bench_diff.py", ",".join(opaths), ",".join(npaths),
                *argv]
    try:
        buf = io.StringIO()
        with redirect_stdout(buf):
            code = bench_diff.main()
        return code, buf.getvalue()
    finally:
        sys.argv = old_argv


def test_mirror_minima_collapse_one_sided_noise(tmp_path):
    """r11 verdict item 3: identical-code mirrors swing 1.5-2x on
    this host (lr_train 16.2<->24.4 s).  Feeding both mirrors of each
    side takes the per-entry MIN, so the noisy draw neither gates nor
    reads as an improvement."""
    old_a = {"queries": {"q_lr": 16.2, "q_x": 1.0}, "value": 17.2,
             "calibration2": _cal(1.0), "plan_fp_version": "v1",
             "plan_fp": {"q_lr": "ff", "q_x": "gg"}}
    old_b = {"queries": {"q_lr": 24.4, "q_x": 1.0}, "value": 25.4,
             "calibration2": _cal(1.3), "plan_fp_version": "v1",
             "plan_fp": {"q_lr": "ff", "q_x": "gg"}}
    new_a = {"queries": {"q_lr": 26.0, "q_x": 1.0}, "value": 27.0,
             "calibration2": _cal(1.0), "plan_fp_version": "v1",
             "plan_fp": {"q_lr": "ff", "q_x": "gg"}}
    new_b = {"queries": {"q_lr": 16.5, "q_x": 1.0}, "value": 17.5,
             "calibration2": _cal(1.0), "plan_fp_version": "v1",
             "plan_fp": {"q_lr": "ff", "q_x": "gg"}}
    code, out = _run_mirrors(tmp_path, [old_a, old_b], [new_a, new_b])
    assert code == 0, out
    assert "mirrors: per-entry MIN over 2 old / 2 new" in out
    assert "REGRESSED" not in out
    # single-file comparison of the two noisy draws WOULD gate
    code1, out1 = _run_mirrors(tmp_path, [old_a], [new_a])
    assert code1 == 1 and "REGRESSED q_lr" in out1


def test_mirror_intra_side_fp_instability_excluded(tmp_path):
    """A fingerprint that differs BETWEEN same-side mirrors is plan
    nondeterminism, not a code change: dropped from fp comparison
    with a visible line, and never listed as a plan change."""
    old_a = {"queries": {"q_nd": 1.0}, "value": 1.0,
             "calibration2": _cal(1.0), "plan_fp_version": "v1",
             "plan_fp": {"q_nd": "aa"}}
    old_b = {"queries": {"q_nd": 1.0}, "value": 1.0,
             "calibration2": _cal(1.0), "plan_fp_version": "v1",
             "plan_fp": {"q_nd": "bb"}}
    new = {"queries": {"q_nd": 1.02}, "value": 1.02,
           "calibration2": _cal(1.0), "plan_fp_version": "v1",
           "plan_fp": {"q_nd": "cc"}}
    code, out = _run_mirrors(tmp_path, [old_a, old_b], [new])
    assert code == 0, out
    assert "excluded (unstable fp, old-side mirrors disagree) q_nd" in out
    assert "plan fingerprint changed" not in out


def test_mirror_merge_keeps_healthiest_probe(tmp_path):
    """merge_mirrors takes the lowest-median calibration probe: the
    min-of-timings side must be judged against the healthiest host
    reading, not a degraded mirror's."""
    import bench_diff

    merged = bench_diff.merge_mirrors([
        {"queries": {"a": 2.0}, "value": 2.0, "calibration2": _cal(1.4)},
        {"queries": {"a": 1.5}, "value": 1.5, "calibration2": _cal(1.0)},
    ])
    assert merged["queries"]["a"] == 1.5
    assert merged["value"] == 1.5
    assert merged["calibration2"]["median"] == 1.0


def test_mirror_min_cannot_hide_intermittent_regression(tmp_path):
    """r12 advice: the new-side per-entry MIN masks a regression
    that manifests in only some mirrors.  The gate still judges the
    min (exit 0 — one-sided-noise robustness kept), but the entry
    whose SLOW draw fails the adjusted gate is reported as
    suspect(intermittent) so it can be verified solo."""
    old = {"queries": {"q_i": 2.0, "q_ok": 1.0}, "value": 3.0,
           "calibration2": _cal(1.0), "plan_fp_version": "v1",
           "plan_fp": {"q_i": "aa", "q_ok": "bb"}}
    new_a = {"queries": {"q_i": 2.1, "q_ok": 1.0}, "value": 3.1,
             "calibration2": _cal(1.0), "plan_fp_version": "v1",
             "plan_fp": {"q_i": "aa", "q_ok": "bb"}}
    new_b = {"queries": {"q_i": 9.0, "q_ok": 1.05}, "value": 10.05,
             "calibration2": _cal(1.0), "plan_fp_version": "v1",
             "plan_fp": {"q_i": "aa", "q_ok": "bb"}}
    code, out = _run_mirrors(tmp_path, [old], [new_a, new_b])
    assert code == 0, out
    assert "suspect(intermittent) q_i" in out
    assert "2.10..9.00s across new mirrors" in out
    # q_ok's spread (1.0..1.05) never fails the gate: not reported
    assert "suspect(intermittent) q_ok" not in out


def test_intermittent_report_skips_entries_already_gated(tmp_path):
    """An entry whose FAST draw already regresses is REGRESSED, not
    double-reported as intermittent."""
    old = {"queries": {"q_r": 2.0}, "value": 2.0,
           "calibration2": _cal(1.0), "plan_fp_version": "v1",
           "plan_fp": {"q_r": "aa"}}
    new_a = {"queries": {"q_r": 4.0}, "value": 4.0,
             "calibration2": _cal(1.0), "plan_fp_version": "v1",
             "plan_fp": {"q_r": "aa"}}
    new_b = {"queries": {"q_r": 9.0}, "value": 9.0,
             "calibration2": _cal(1.0), "plan_fp_version": "v1",
             "plan_fp": {"q_r": "aa"}}
    code, out = _run_mirrors(tmp_path, [old], [new_a, new_b])
    assert code == 1
    assert "REGRESSED q_r" in out
    assert "suspect(intermittent)" not in out
