"""SparkSession factory tuned for this engine.

The driver may hand us an externally-built session (``entry(spark)``),
so every query in this package must be correct under *any* reasonable
session conf — including Spark 4's ANSI mode (guarded divisions,
``try_cast``).  This factory is what our own tests and ``bench.py``
use; the conf choices document the 100 TB posture:

- AQE on (runtime re-plan, skew-join handling, partition coalescing),
- broadcast threshold generous enough to broadcast every dim/config
  table in the model (reference's config tables are <= 35 rows,
  SURVEY.md §1.4),
- shuffle partitions sized for the local harness; on a real cluster
  AQE coalescing makes the static number mostly irrelevant.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ai-scoring-engine-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession with engine defaults."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = min(32, max(4, cpus))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Pin the default parser escape mode: SQL-fragment twins of
        # Column-built regexes (e.g. dedup._TOKENS_SQL's '\\s+') are
        # only equal to their r"\s+" Column counterparts under
        # escapedStringLiterals=false; a legacy-parser session would
        # silently diverge tokenization (r13 advisor note).
        .config("spark.sql.parser.escapedStringLiterals", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
