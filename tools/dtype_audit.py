"""Audit pandas dtypes of Spark vs DuckDB results for every oracle query —
catches schema-level mismatches the value compare can mask."""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry
from access_log_parser_spark import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="dtypes", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in entry.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = entry.oracle_sql()
    for name, fn in entry.queries().items():
        if name not in oracles:
            continue
        sdf = fn(spark, sf_dir).toPandas()
        odf = con.execute(oracles[name]).df()
        diffs = []
        for c in sorted(sdf.columns):
            a, b = str(sdf[c].dtype), str(odf[c].dtype)
            if a != b:
                diffs.append(f"{c}: spark={a} duckdb={b}")
        print(f"{name}: {'; '.join(diffs) if diffs else 'dtypes match'}")
    spark.stop()


if __name__ == "__main__":
    main()
