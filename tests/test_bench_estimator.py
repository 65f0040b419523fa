"""bench.py ``_time_entry`` estimator — pinned on synthetic shot
streams (no Spark).

Round-12 lesson encoded here: the first (cold) shot of a bench entry
carries JIT / Arrow-worker-fork / codegen cost that is NOT the code's
steady state.  r12's only flagged "regression" (dhash@50k 2.5x) was
manufactured by the estimator itself: the cold shot exceeded the
repeat budget, sampling stopped at <=2 samples, and the even-length
median averaged the cold shot in (samples [11.99, 2.87] -> 7.43 s vs
a solo-verified ~2 s steady state; a mirror's png_roundtrip was a
single cold shot [20.50]).  The fix, pinned here:

- the budget applies to post-first-shot time only, so every entry
  gets at least one warm sample when repeats >= 2;
- the median excludes the first sample whenever >= 2 samples exist.
"""

from __future__ import annotations

import pytest


def _fake_clock(shots):
    """perf_counter stub: each _time_entry sample reads the clock
    twice (t0, t1); consecutive pairs differ by the scripted shot."""
    times = [0.0]
    for s in shots:
        times.append(times[-1] + s)  # t1 of this shot
        times.append(times[-1])  # t0 of the next shot
    it = iter(times)
    return lambda: next(it)


def _time(monkeypatch, shots, repeats, budget=12.0, hard_cap=45.0):
    import bench

    monkeypatch.setattr(bench.time, "perf_counter", _fake_clock(shots))
    taken = iter(shots)
    return bench._time_entry(
        lambda: next(taken),
        spark=None,
        repeats=repeats,
        budget=budget,
        hard_cap=hard_cap,
    )


def test_cold_shot_excluded_from_median(monkeypatch):
    # The r12-verdict synthetic stream: [12, 2, 2].  The old
    # estimator stopped after the cold 12 s shot (sum >= budget) and
    # reported 12; the fixed one keeps sampling (post-cold time 0)
    # and reports the warm steady state.
    median, samples = _time(monkeypatch, [12.0, 2.0, 2.0], repeats=3)
    assert samples == [12.0, 2.0, 2.0]
    assert median == 2.0


def test_budget_is_post_first_shot_only(monkeypatch):
    # dhash@50k's committed r12 samples: [11.99, 2.87].  One more
    # warm shot must be taken (old behavior: sum(samples) >= 12
    # stopped at the pair and the even-length median averaged the
    # cold shot in -> 7.43).
    median, samples = _time(
        monkeypatch, [11.99, 2.87, 2.5], repeats=3
    )
    assert len(samples) == 3
    assert median == pytest.approx(2.685)


def test_single_cold_shot_never_the_estimate(monkeypatch):
    # png_roundtrip's mirror pathology: a 20.5 s cold shot used to be
    # the (single-sample) median.  Now a warm sample follows and is
    # the estimate.
    median, samples = _time(monkeypatch, [20.5, 3.0, 3.1], repeats=3)
    assert samples[0] == 20.5
    assert median == pytest.approx(3.05)


def test_budget_still_bounds_the_slow_tail(monkeypatch):
    # A genuinely slow entry: one warm shot after the cold one, then
    # the post-cold budget stops sampling.
    median, samples = _time(
        monkeypatch, [36.0, 36.0, 36.0], repeats=3
    )
    assert samples == [36.0, 36.0]
    assert median == 36.0


def test_repeats_one_keeps_single_shot(monkeypatch):
    median, samples = _time(monkeypatch, [5.0], repeats=1)
    assert samples == [5.0]
    assert median == 5.0


def test_budget_cannot_leave_single_post_cold_sample(monkeypatch):
    # The r13-verdict pathology: dedup_editdist_verify@50k sampled
    # [3.27, 12.03] -- the contended SECOND shot alone exhausted the
    # 12 s budget, sampling stopped with one post-cold sample, and
    # the ledger carried 12.03 s for a solo-verified ~2.5 s entry.
    # The budget may no longer terminate before TWO post-cold samples
    # exist, and the wildly-split pair triggers the one-sided
    # contention guard (min, not mean).
    median, samples = _time(monkeypatch, [3.3, 12.0, 2.4], repeats=3)
    assert len(samples) == 3
    assert median != 12.0
    assert median == pytest.approx(2.4)


def test_contention_guard_min_of_wildly_split_pair(monkeypatch):
    # >2x split between the two post-cold samples: noise only ever
    # ADDS time, so the slow draw is the outlier and min is the
    # steady-state estimate ...
    median, _ = _time(monkeypatch, [1.0, 2.0, 4.1], repeats=3)
    assert median == pytest.approx(2.0)
    # ... while a tight pair keeps the median (mean of two).
    median, _ = _time(monkeypatch, [1.0, 2.0, 3.9], repeats=3)
    assert median == pytest.approx(2.95)


def test_contention_guard_only_for_pairs(monkeypatch):
    # With >= 3 post-cold samples the plain median is already robust
    # to one outlier; the guard must not kick in.
    median, samples = _time(
        monkeypatch, [1.0, 2.0, 12.0, 2.1], repeats=4, budget=100.0
    )
    assert len(samples) == 4
    assert median == pytest.approx(2.1)


def test_hard_cap_bounds_the_slow_tail(monkeypatch):
    # A genuinely ~30 s/shot entry: the hard per-entry cap (not the
    # post-cold budget) stops sampling, and only IT may leave a lone
    # post-cold sample -- acceptable exactly here, where relative
    # noise is small.
    median, samples = _time(monkeypatch, [30.0, 30.0, 30.0], repeats=3)
    assert samples == [30.0, 30.0]
    assert median == 30.0
