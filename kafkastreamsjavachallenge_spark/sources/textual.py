"""Text-format ingest (JSONL / CSV) with an explicit dead-letter path.

The reference silently maps malformed JSON to ``uid=""`` and filters it
(UniqueUsersApp.java:212-215,114 — SURVEY.md §1.3.3 calls this a quirk
to fix, not copy).  Production ingest needs the third option between
"crash on first bad record" (FAILFAST) and "silently lose it" (DROPMALFORMED):
capture every unparseable line verbatim, route it to a dead-letter
output for replay/diagnosis, and keep the good rows flowing.  These
readers wire Spark's PERMISSIVE corrupt-record capture into that
contract:

- the corrupt column is added to the user's schema (Spark requires it
  declared to populate it);
- ``split_dlq`` returns (good, dlq) DataFrames from ONE read — the dlq
  side carries only the raw line, ready for a quarantine sink;
- both readers work for batch and micro-batch (``spark.readStream``
  accepts the same options), so the DLQ contract holds on the streaming
  ingest path too.

Scale notes: JSONL/CSV scans are splittable by line (uncompressed or
bzip2/zstd-seekable), so they parallelize like parquet minus the
columnar pruning; the corrupt capture adds no pass (the parser already
visits every byte).  Keep text formats at the INGEST EDGE only — land
to parquet immediately (``writers``), because repeated analytic scans
of text re-pay parsing every time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return schema.add(CORRUPT_COL, StringType())


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    multiline: bool = False,
) -> DataFrame:
    """Read JSON-lines with PERMISSIVE corrupt-record capture.

    Returns the declared columns plus ``_corrupt_record`` (NULL for
    rows that parsed; the raw line for rows that did not).  Feed the
    result to ``split_dlq`` for the (good, dlq) pair."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("multiLine", str(multiline).lower())
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """Read CSV with PERMISSIVE corrupt-record capture (same contract
    as ``read_jsonl``): type-mismatched or ragged rows land verbatim in
    ``_corrupt_record`` instead of crashing the job or vanishing."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )


def split_dlq(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a PERMISSIVE-read frame into (good, dlq).

    good: rows that parsed, corrupt column dropped.
    dlq:  one ``raw`` string column per unparseable input line —
    exactly what a quarantine topic/table wants for later replay.

    The read is lazily checkpointed first: Spark refuses plans that
    project ONLY the internal corrupt column from a raw text scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — the parser
    would otherwise prune away the very columns whose failure defines
    corruption), and the checkpoint also means both outputs share one
    materialized scan instead of re-parsing the text per side.  For the
    STREAMING read path, do this split inside ``foreachBatch`` (each
    micro-batch frame is a batch DataFrame, where the checkpoint is
    legal)."""
    df = df.localCheckpoint(eager=False)
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    dlq = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw")
    )
    return good, dlq
