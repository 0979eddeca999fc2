"""Robust ingestion: malformed-record auditing and schema evolution
(SURVEY.md §2.1 hardening — the reference's tolerant field mapping,
glassdoor_collector.py:507-512, and multi-key payload parsing,
patent_signals.py:46-111, generalized to the file-ingest layer).

A 100 TB ingest ALWAYS contains broken rows and drifting schemas; the
engine's posture:

- PERMISSIVE reads route unparseable rows into `_corrupt_record`
  instead of failing the job; the audit splits good/bad so bad rows
  land in a quarantine table with full payload for replay.
- Parquet drops with added columns are read with `mergeSchema` so
  old files surface the new columns as nulls (additive evolution);
  the serving schema is the union, projected explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_csv_audited(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE CSV read split into (good, quarantine).

    The declared schema is extended with a `_corrupt_record` string
    column; rows that fail to parse keep their raw text there and
    null elsewhere.  Returns the clean frame (corrupt column dropped)
    and the quarantine frame (raw payloads for replay/alerting).

    NB: Spark populates `_corrupt_record` lazily — a frame filtered
    on it must be cached or re-read; we `select` the raw column into
    the quarantine frame from a dedicated read so both frames are
    independently action-safe."""
    full_schema = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    raw = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", "true")
        .csv(path)
        .cache()
    )
    good = raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = raw.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_payload")
    )
    return good, quarantine


def read_parquet_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet directory whose files were written under
    different (additive) schema versions: `mergeSchema` unions the
    footers, old files yield nulls for new columns.  At 100 TB this
    is how a bronze table absorbs upstream column additions without
    rewriting history."""
    return spark.read.option("mergeSchema", "true").parquet(path)
