"""Threshold sweep (operators/evaluation.py) — pinned confusion
matrices and the undefined-ratio NULL contract."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from access_log_parser_spark.operators.evaluation import threshold_sweep

ROWS = [
    # score, label
    (0.9, 1), (0.8, 1), (0.7, 0), (0.4, 1), (0.3, 0), (0.1, 0),
]


def _sweep(spark, thresholds, rows=ROWS):
    df = spark.createDataFrame(
        [Row(score=s, label=l) for s, l in rows],
        schema="score double, label int",
    )
    return {
        r["threshold"]: r
        for r in threshold_sweep(df, thresholds=thresholds).collect()
    }


def test_threshold_sweep_confusion_and_ratios(spark):
    out = _sweep(spark, [0.5])
    r = out[0.5]
    # predicted positive: 0.9,0.8,0.7 -> tp=2 fp=1; below: tp missed=1 tn=2
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (2, 1, 1, 2)
    assert r["precision"] == round(2 / 3, 6)
    assert r["recall"] == round(2 / 3, 6)
    assert r["f1"] == round(2 * (2 / 3) * (2 / 3) / (4 / 3), 6)


def test_threshold_sweep_undefined_ratios_are_null(spark):
    # threshold above every score -> no predicted positives
    out = _sweep(spark, [2.0])
    r = out[2.0]
    assert (r["tp"], r["fp"]) == (0, 0)
    assert r["precision"] is None
    assert r["recall"] == 0.0
    assert r["f1"] is None
    # all-negative labels -> recall undefined
    out = _sweep(spark, [0.5], rows=[(0.9, 0), (0.1, 0)])
    assert out[0.5]["recall"] is None


def test_threshold_sweep_null_rows_excluded_and_empty_raises(spark):
    out = _sweep(
        spark, [0.5], rows=ROWS + [(None, 1), (0.6, None)]
    )
    assert (out[0.5]["tp"], out[0.5]["fp"]) == (2, 1)  # unchanged
    with pytest.raises(ValueError):
        _sweep(spark, [])


def test_threshold_sweep_empty_input_gives_zero_rows_not_crash(spark):
    out = _sweep(spark, [0.5], rows=[])
    r = out[0.5]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (0, 0, 0, 0)
    assert r["precision"] is None and r["recall"] is None
