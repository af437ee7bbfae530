"""SparkSession factory with scale-oriented defaults.

Tuned for the 100 TB design point (SURVEY.md §7 phase 3) while remaining
correct on local[N]:

- AQE on (runtime coalesce, skew-join splitting) — skewed url-host
  partitions are the expected hazard for web-crawl corpora;
- Arrow enabled with a bounded batch size so the mapInPandas parse stage
  streams fixed-size batches instead of whole partitions;
- shuffle partitions sized for the local harness; on a real cluster this is
  overridden by --conf / AQE coalescing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "access-log-parser-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[%s]" % (
        os.environ.get("SPARK_GRAFT_CPUS", "*")
    )
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    )
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Commit protocol: v2 moves task outputs into place at task commit
        # instead of a serial driver-side rename pass at job commit — the
        # standard setting for object-store/cloud deployments, and it keeps
        # job-commit cost independent of task count (the serial rename is
        # O(files) on the driver, which anti-scales with executor count).
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .config("spark.hadoop.parquet.summary.metadata.level", "NONE")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
