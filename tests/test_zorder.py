"""Z-order layout: key correctness vs a Python-int reference, SQL-term
equivalence, and a mechanical parquet-footer proof that the layout
prunes on the secondary dimension where a linear sort cannot."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from access_log_parser_spark.functions.zorder import (
    write_zordered,
    zorder_key,
    zorder_sql_term,
)


def _morton(vals: list[int], bits: int) -> int:
    out = 0
    for j in range(bits):
        for i, v in enumerate(vals):
            out |= ((v >> j) & 1) << (j * len(vals) + i)
    return out


def test_zorder_key_matches_python_reference(spark):
    rows = [(x, y) for x in (0, 1, 5, 255) for y in (0, 3, 254, 255)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder_key(["x", "y"], bits=8).alias("z")).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _morton([x, y], 8), (x, y)


def test_zorder_three_columns_and_validation(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["a", "b", "c"])
    z = df.select(zorder_key(["a", "b", "c"], bits=4).alias("z")).collect()[0]["z"]
    assert z == _morton([1, 2, 3], 4)
    with pytest.raises(ValueError):
        zorder_key(["a"], bits=8)
    with pytest.raises(ValueError):
        zorder_key(["a", "b"], bits=32)


def test_zorder_sql_term_agrees_with_expression(spark):
    df = spark.createDataFrame([(12, 345), (511, 0), (77, 78)], ["x", "y"])
    out = df.select(
        zorder_key(["x", "y"], bits=10).alias("z_expr"),
        F.expr(zorder_sql_term(["x", "y"], bits=10)).alias("z_sql"),
    )
    assert all(r["z_expr"] == r["z_sql"] for r in out.collect())


def _candidate_files(path: str, col: str, value: int) -> int:
    """Files whose parquet footer min/max admit col == value."""
    n = 0
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = {md.row_group(0).column(i).path_in_schema: i for i in range(md.num_columns)}
        lo = min(md.row_group(g).column(names[col]).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(names[col]).statistics.max for g in range(md.num_row_groups))
        if lo <= value <= hi:
            n += 1
    return n


def test_zorder_write_prunes_secondary_dimension(spark, tmp_path):
    # 64x64 grid, one row per cell: primary dim x, secondary dim y.
    df = spark.range(64 * 64).select(
        (F.col("id") / 64).cast("int").alias("x"),
        (F.col("id") % 64).cast("int").alias("y"),
    )
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "lin")
    write_zordered(df, zpath, ["x", "y"], bits=6, num_files=16)
    (
        df.repartitionByRange(16, "x", "y").sortWithinPartitions("x", "y")
        .write.parquet(lpath)
    )
    z_files = _candidate_files(zpath, "y", 17)
    lin_files = _candidate_files(lpath, "y", 17)
    lin_total = len(glob.glob(f"{lpath}/*.parquet"))
    # Linear layout: y's min/max spans ~everything in every file -> no
    # pruning. Z-order: only the curve segments whose y-range covers 17.
    assert lin_files == lin_total
    assert z_files < lin_files / 2
    # and the primary dimension still prunes under z-order too
    assert _candidate_files(zpath, "x", 3) < lin_total
    # row equality is untouched by layout
    assert spark.read.parquet(zpath).orderBy("x", "y").collect() == (
        df.orderBy("x", "y").collect()
    )
