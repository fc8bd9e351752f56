"""Boundary-distance canary for the e6 fixed-point oracles.

q_mmr_rerank / q_embed_norm_audit / q_temperature_mix floor double-valued
cosines / norms / weights at e6 fixed point on BOTH engines.  The floors
are cross-engine exact only while no underlying double lands ON an
integer e6 boundary: if `x * 1e6` sits within ~1 ulp of an integer, a
single differing float op (e.g. a different fold order in DuckDB
`list_sum` vs Spark `aggregate`) could flip `floor` between engines.

This test measures the distance from every floored value to its nearest
e6 boundary and asserts a safety margin far above ulp scale.  It honors
``SPARK_GRAFT_SIM_SF`` so the fuzz sweep (`scripts/fuzz_testdata.py`
seeds) exercises it against regenerated data — a seed that generates a
boundary-landing vector fails HERE, loudly, instead of as a driver hash
mismatch.  (Values exactly on a boundary by construction — 0.0 from
zero-norm guards, planted exact duplicates giving cosine exactly 1.0,
integer-total weights — are exempt: both engines compute them exactly.)
"""

from __future__ import annotations

import math
import os

from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_SIM_SF", "/root/testdata/sf0.001")

# |x*1e6 - round(x*1e6)| must exceed this unless x*1e6 is exactly
# integral.  Doubles near 1e6 have ulp ≈ 1.2e-10; 1e-6 is ~4 decimal
# orders of safety while still catching any seed that could plausibly
# flip under a 1-ulp fold-order difference.
MARGIN = 1e-6


def _boundary_violations(rows):
    bad = []
    for ident, x in rows:
        if x is None:
            continue
        scaled = x * 1e6
        dist = abs(scaled - round(scaled))
        if 0.0 < dist < MARGIN:
            bad.append((ident, x, dist))
    return bad


def test_mmr_cosines_clear_of_e6_boundaries(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    from kafkastreamsjavachallenge_spark.functions.vector import cosine

    nv = e.select("vec_id", F.col("embedding").alias("vec"))
    q = nv.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("vec").alias("qv")
    )
    c = nv.filter(F.col("vec_id") >= 3)
    scored = (
        c.crossJoin(F.broadcast(q))
        .select(
            F.concat_ws("-", "qid", "vec_id").alias("ident"),
            cosine(F.col("vec"), F.col("qv")).alias("x"),
        )
        .filter(F.col("x").isNotNull())
    )
    bad = _boundary_violations([(r.ident, r.x) for r in scored.collect()])
    assert not bad, f"cosines within {MARGIN} of an e6 boundary: {bad[:5]}"


def test_embed_norms_clear_of_e6_boundaries(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    norms = e.select(
        F.col("vec_id").cast("string").alias("ident"),
        F.sqrt(
            F.aggregate(
                F.col("embedding"),
                F.lit(0.0),
                lambda a, x: a + x.cast("double") * x.cast("double"),
            )
        ).alias("x"),
    )
    bad = _boundary_violations([(r.ident, r.x) for r in norms.collect()])
    assert not bad, f"norms within {MARGIN} of an e6 boundary: {bad[:5]}"


def test_temperature_weights_clear_of_e6_boundaries(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    per = (
        d.groupBy("source")
        .agg(F.sum(F.size(F.split(F.col("text"), " "))).alias("n_tokens"))
        .collect()
    )
    # replicate the pinned source-order fold exactly (python floats ==
    # IEEE doubles, so this matches both engines' arithmetic)
    per = sorted(per, key=lambda r: r.source)
    denom = 0.0
    for r in per:
        denom += math.sqrt(float(r.n_tokens))
    rows = [
        (r.source, math.sqrt(float(r.n_tokens)) / denom) for r in per
    ]
    bad = _boundary_violations(rows)
    assert not bad, f"weights within {MARGIN} of an e6 boundary: {bad[:5]}"
