"""The scaling-pair estimator in bench.py is the number the BASELINE
criterion (>=0.8 efficiency N->4N) is judged on — pin its math with a
synthetic runner so a protocol regression can't silently re-open the
round-2 measurement gap (driver snapshot 0.667 vs local 0.83-0.93).

No Spark involved: `_scale_pair(runner=...)` injects fake per-level
times.
"""

from __future__ import annotations

import bench


def _runner_from(times: dict[int, list[float]]):
    """A fake run_one: pops the next elapsed time for the given level."""
    seq = {k: list(v) for k, v in times.items()}

    def run(cores: int) -> dict:
        el = seq[cores].pop(0)
        return {"elapsed": el, "docs_per_sec": round(1000.0 / el, 1)}

    return run


def test_ideal_scaling_reports_one():
    # 4x cores -> exactly 4x faster, no drift
    out = bench._scale_pair(
        2, 8, trials=4, cooldown=0,
        runner=_runner_from({2: [40.0] * 4, 8: [10.0] * 4}),
    )
    assert out["efficiency"] == 1.0
    assert out["efficiency_min_of_levels"] == 1.0
    assert out["efficiency_paired_median"] == 1.0
    assert "regime_warning" not in out
    assert len(out["trials"]) == 4
    # order alternates small-first / big-first so a time-decaying
    # throttle cannot systematically penalize one level
    assert [t["order"] for t in out["trials"]] == [
        "2->8", "8->2", "2->8", "8->2",
    ]


def test_paired_median_cancels_monotone_drift():
    # The VM slows down 40% midway: trials 3-4 run at 1.4x. Both levels
    # of a trial see the SAME regime (adjacent in time), so the paired
    # ratio still reads the true 0.9 efficiency; min-of-levels compares
    # a quiet small-level sample against a quiet big-level sample and
    # agrees here. (Times: t2 = 40, t8 = 40/(4*0.9) = 11.11, x1.4 late.)
    t2, t8 = 40.0, 40.0 / 3.6
    out = bench._scale_pair(
        2, 8, trials=4, cooldown=0,
        runner=_runner_from({
            2: [t2, t2, t2 * 1.4, t2 * 1.4],
            8: [t8, t8, t8 * 1.4, t8 * 1.4],
        }),
    )
    assert abs(out["efficiency_paired_median"] - 0.9) < 0.01
    assert abs(out["efficiency"] - 0.9) < 0.01


def test_cross_regime_minima_raise_the_regime_warning():
    # Round-2 failure mode: the BIG level never sampled a quiet window
    # (every big run landed throttled) while the small level did once,
    # so min-of-levels compares cross-regime minima and under-reports.
    # The estimator does NOT paper over this (a max() rescue would be
    # upward-biased in the mirrored scenario); instead the paired-median
    # diagnostic disagrees and `regime_warning` says to re-run quiet.
    t2, t8 = 40.0, 40.0 / 3.6  # true efficiency 0.9
    out = bench._scale_pair(
        2, 8, trials=4, cooldown=0, max_extra_trials=0,
        runner=_runner_from({
            # one small-level sample lands quiet (trial 2) while every
            # big-level sample is throttled x1.5
            2: [t2 * 1.5, t2, t2 * 1.5, t2 * 1.5],
            8: [t8 * 1.5, t8 * 1.5, t8 * 1.5, t8 * 1.5],
        }),
    )
    assert out["efficiency_min_of_levels"] < 0.7  # the under-report
    assert abs(out["efficiency_paired_median"] - 0.9) < 0.01
    assert "regime_warning" in out


def test_efficiency_is_capped_and_warned_in_the_inflation_mirror():
    # Mirror scenario: the SMALL level always throttled, big level once
    # quiet -> raw min-of-levels reads 1.35 for a true 0.9. The report
    # must not claim super-linear scaling: capped at 1.0 + warned.
    t2, t8 = 40.0, 40.0 / 3.6
    out = bench._scale_pair(
        2, 8, trials=4, cooldown=0, max_extra_trials=0,
        runner=_runner_from({
            2: [t2 * 1.5, t2 * 1.5, t2 * 1.5, t2 * 1.5],
            8: [t8 * 1.5, t8, t8 * 1.5, t8 * 1.5],
        }),
    )
    assert out["efficiency_min_of_levels"] > 1.0  # the raw artifact
    assert out["efficiency"] == 1.0
    assert "regime_warning" in out


def test_raw_trials_are_archived():
    out = bench._scale_pair(
        2, 8, trials=2, cooldown=0,
        runner=_runner_from({2: [40.0, 41.0], 8: [11.0, 11.5]}),
    )
    for t in out["trials"]:
        assert set(t) >= {
            "order", "elapsed_small", "elapsed_big", "paired_efficiency",
            "loadavg_at_start",
        }
    # best-of-levels bookkeeping: min elapsed per level is what's reported
    assert out["elapsed_small"] == 40.0
    assert out["elapsed_big"] == 11.0


def test_extension_rescues_a_starved_level():
    # Base trials: the big level never samples quiet (the r03 artifact:
    # 8-core full-input min 130 s vs 18 s capability). The adaptive
    # extension keeps sampling; trial 6's big run lands quiet and the
    # minima become same-regime: warning clears, efficiency reads ~0.9.
    t2, t8 = 40.0, 40.0 / 3.6
    out = bench._scale_pair(
        2, 8, trials=4, cooldown=0, max_extra_trials=4,
        runner=_runner_from({
            2: [t2, t2 * 1.5, t2, t2 * 1.5, t2, t2 * 1.5, t2],
            8: [t8 * 7, t8 * 7, t8 * 7, t8 * 7, t8 * 7, t8, t8],
        }),
    )
    # extension runs until the big-level quiet minimum is REPRODUCED
    # (two samples within 20%), then stops: minima confirmed, no warning
    assert out["extension_trials_run"] == 3
    assert abs(out["efficiency"] - 0.9) < 0.01
    assert "regime_warning" not in out
    assert len(out["trials"]) == 7


def test_extension_is_bounded_and_keeps_the_warning():
    # Disagreement persists through the whole extension budget: the
    # estimator stops at max_extra_trials and STILL reports the warning
    # (no papering over an unmeasurable regime).
    t2, t8 = 40.0, 40.0 / 3.6
    out = bench._scale_pair(
        2, 8, trials=2, cooldown=0, max_extra_trials=2,
        runner=_runner_from({
            2: [t2, t2 * 1.5, t2, t2 * 1.5],
            8: [t8 * 7, t8 * 7, t8 * 7, t8 * 7],
        }),
    )
    assert out["extension_trials_run"] == 2
    assert "regime_warning" in out
    assert len(out["trials"]) == 4


def test_near_gate_efficiency_forces_extension():
    # r04 fix: eff 0.768 with both minima "confirmed" (reproduced within
    # 20%) never extended in r03, even though the small level had only
    # sampled a lucky-fast window. Landing within gate_margin of the 0.8
    # criterion must now keep sampling; here the extension finds the big
    # level's true quiet time and the estimate crosses the gate.
    t2 = 40.0
    out = bench._scale_pair(
        2, 8, trials=4, cooldown=0, max_extra_trials=2,
        runner=_runner_from({
            # minima reproduce within 20% at both levels -> no regime
            # warning, but efficiency reads 40/(4*13) = 0.769
            2: [t2, t2, t2 * 1.1, t2 * 1.1, t2, t2],
            8: [13.0, 13.0, 13.0, 13.0, 11.77, 11.8],
        }),
    )
    assert out["extension_trials_run"] >= 1
    assert out["efficiency"] >= 0.8
    assert "regime_warning" not in out


def test_gate_extension_is_bounded_for_truly_sublinear_jobs():
    # a job that REALLY scales at 0.5 exhausts max_extra_trials and
    # reports the honest number (no inflation, no infinite loop)
    out = bench._scale_pair(
        2, 8, trials=2, cooldown=0, max_extra_trials=2,
        runner=_runner_from({2: [40.0] * 4, 8: [20.0] * 4}),
    )
    assert out["extension_trials_run"] == 2
    assert out["efficiency"] == 0.5


def test_gate_none_disables_proximity_extension():
    out = bench._scale_pair(
        2, 8, trials=2, cooldown=0, max_extra_trials=2, gate=None,
        runner=_runner_from({2: [40.0, 40.0], 8: [20.0, 20.0]}),
    )
    assert out["extension_trials_run"] == 0


def test_headline_best_of_extends_on_spread(monkeypatch):
    # the headline run is taken after the scaling block heats the box:
    # when the base runs disagree >30%, _best_of must extend and flag
    seq = iter([10.0, 14.0, 10.2, 9.9, 13.0])
    monkeypatch.setattr(
        bench, "parse_route_job",
        lambda spark, n, out: {
            "elapsed": next(seq), "docs": n, "lines": n,
            "docs_per_sec": 1.0, "lines_per_sec": 1.0,
        },
    )
    head = bench._best_of(None, 100, runs=3, max_extra=2)
    assert head["regime"]["runs"] == 5
    assert head["regime"]["throttled"] is True
    assert head["elapsed"] == 9.9  # min-of-N bookkeeping intact


def test_headline_best_of_stops_when_quiet(monkeypatch):
    seq = iter([10.0, 10.1, 10.2, 1.0, 1.0])
    monkeypatch.setattr(
        bench, "parse_route_job",
        lambda spark, n, out: {
            "elapsed": next(seq), "docs": n, "lines": n,
            "docs_per_sec": 1.0, "lines_per_sec": 1.0,
        },
    )
    head = bench._best_of(None, 100, runs=3, max_extra=2)
    assert head["regime"]["runs"] == 3
    assert head["regime"]["throttled"] is False


def test_compact_scaling_fits_the_driver_tail_budget():
    # r04 lesson: the driver archives only ~2 KB of stdout tail, and the
    # r04 headline was unrecoverable because the result line was bigger.
    # The compact projection must strip the per-trial arrays (they live
    # in bench_full_last.json) and stay far under the tail budget even
    # with a large trial count.
    import json

    scaling = bench._scale_pair(
        2, 8, trials=4, cooldown=0, max_extra_trials=4,
        runner=_runner_from({2: [40.0 + i for i in range(8)],
                             8: [20.0 + i for i in range(8)]}),
    )
    scaling["loadavg_after_quiesce"] = 3.2
    scaling["bandwidth_capped_pair"] = dict(
        scaling, trials=list(scaling["trials"])
    )
    compact = bench._compact_scaling(scaling)
    assert "trials" not in compact
    assert compact["trials_n"] == len(scaling["trials"])
    assert compact["efficiency"] == scaling["efficiency"]
    assert compact["bandwidth_capped_efficiency"] == scaling[
        "efficiency_min_of_levels"
    ]
    assert len(json.dumps(compact)) < 700


def test_absurd_big_slower_than_small_forces_extension():
    # 8 cores "slower" than 2 cores on an embarrassingly parallel job is
    # physically impossible quiet-state — even if the ratio diagnostics
    # happened to agree, the extension must kick in.
    out = bench._scale_pair(
        2, 8, trials=2, cooldown=0, max_extra_trials=1,
        runner=_runner_from({
            2: [10.0, 10.0, 10.0],
            8: [30.0, 30.0, 8.0],
        }),
    )
    assert out["extension_trials_run"] == 1
    assert out["elapsed_big"] == 8.0
    # budget ran out before the 8.0 minimum could be reproduced
    assert "regime_warning" in out


def test_compact_failed_list_is_bounded():
    # the final stdout line must survive a whole-family regression: 198
    # failed names would alone exceed the ~2 KB driver tail budget
    import json

    names = sorted(f"query_{i:03d}" for i in range(198))
    compact = bench._compact_failed(names)
    assert len(compact) == 11 and compact[-1] == "...+188 more"
    assert len(json.dumps(compact)) < 250
    # small lists pass through untouched (and stay in sorted order)
    assert bench._compact_failed(names[:3]) == names[:3]
    assert bench._compact_failed([]) == []


def _flaky_runner(times: dict[int, list[float]], fail_calls: set):
    """Fake run_one that raises on the Nth call for a level (0-based,
    keyed (cores, call_index)) — models a dead scale subprocess."""
    calls: dict[int, int] = {}

    def run(cores: int) -> dict:
        i = calls.get(cores, 0)
        calls[cores] = i + 1
        if (cores, i) in fail_calls:
            raise RuntimeError(f"worker died cores={cores} call={i}")
        el = times[cores][i]
        return {"elapsed": el, "docs_per_sec": round(1000.0 / el, 1)}

    return run


def test_one_dead_run_is_retried_and_survived():
    # r05i incident: a python-worker connection reset killed the whole
    # bench. A single dead run must be retried; the retry succeeding
    # means a full paired row and no failure record.
    out = bench._scale_pair(
        2, 8, trials=3, cooldown=0,
        runner=_flaky_runner(
            {2: [99.0, 40.0, 40.0, 40.0], 8: [10.0, 10.0, 10.0]},
            fail_calls={(2, 0)},  # first 2-core run dies; retry = call 1
        ),
    )
    assert "failed_runs" not in out
    assert len(out["trials"]) == 3
    assert out["efficiency"] == 1.0


def test_dead_level_drops_paired_row_but_keeps_minima():
    # both the run AND its retry die in trial 0: the trial yields no
    # paired row, but later trials carry the estimate and the failure
    # is recorded for the archive
    out = bench._scale_pair(
        2, 8, trials=3, cooldown=0,
        runner=_flaky_runner(
            {2: [40.0] * 6, 8: [99.0, 99.0, 10.0, 10.0, 10.0, 10.0]},
            fail_calls={(8, 0), (8, 1)},
        ),
    )
    assert len(out["failed_runs"]) == 1
    assert "cores 8" in out["failed_runs"][0]
    assert len(out["trials"]) >= 2
    assert out["efficiency"] == 1.0


def test_total_level_failure_raises_cleanly():
    import pytest

    def always_dead(cores):
        if cores == 8:
            raise RuntimeError("no memory")
        return {"elapsed": 40.0, "docs_per_sec": 25.0}

    with pytest.raises(RuntimeError, match="no surviving paired trial"):
        bench._scale_pair(
            2, 8, trials=2, cooldown=0, max_extra_trials=1,
            runner=always_dead,
        )


def test_compact_scaling_carries_error_and_failed_count():
    assert bench._compact_scaling({"error": "scaling failed: boom"}) == {
        "error": "scaling failed: boom", "trials_n": 0,
    }
    compact = bench._compact_scaling({
        "efficiency": 0.9, "trials": [1, 2], "failed_runs": ["t0 cores 8"],
    })
    assert compact["failed_runs_n"] == 1 and compact["trials_n"] == 2
