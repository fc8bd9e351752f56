"""Side-channel metrics — the Spark-first form of the reference's peek /
stdout logging (X2: UniqueUsersApp.java:124,225-238,
DeduplicateValueTransformer.java:58-68).

The reference peeks per record (a println in the hot path); ``observe``
attaches aggregate metrics to a plan node and collects them with the job —
zero extra passes, zero per-record cost, works identically on a 1000-node
cluster.  In streaming, the same observe() surfaces per-batch metrics in
StreamingQueryProgress.observedMetrics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def with_metrics(
    df: DataFrame, name: str, *metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to this point of the plan.

    Returns (df, observation); after any action on df, ``observation.get``
    yields the metric dict.  Example::

        df, obs = with_metrics(parsed, "ingest",
                               F.count(F.lit(1)).alias("rows"),
                               F.sum(F.col("uid").isNull().cast("int"))
                                .alias("null_uids"))
        df.write.parquet(...)
        obs.get  # {'rows': ..., 'null_uids': ...}
    """
    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def with_stream_metrics(df: DataFrame, name: str, *metrics: Column) -> DataFrame:
    """Streaming form of ``with_metrics``: attach named aggregate metrics
    to a STREAMING plan node.  ``Observation`` is batch-only; the
    string-name overload registers the metrics with the streaming engine,
    which reports them per micro-batch in
    ``StreamingQueryProgress.observedMetrics[name]`` — the zero-cost
    replacement for the reference's per-record println
    (UniqueUsersApp.java:124,225-238) that also works mid-stream on a
    cluster.  Collect them with ``streaming/pipeline.py
    run_with_observed``."""
    return df.observe(name, *metrics)
