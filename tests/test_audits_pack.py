"""Closed-form planted tests for the round-7 audit pack
(queries/audits.py): inputs constructed so the expected output is known
exactly — semantics pinned by arithmetic, cross-engine parity by the
registry oracles + scripts/verify_driver_sim.py.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _write_docs(spark, path, rows):
    df = spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_embs(spark, path, rows):
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    df.write.mode("overwrite").parquet(f"{path}/embeddings.parquet")


def _basis(i, scale=1.0, dim=64):
    v = [0.0] * dim
    v[i] = scale
    return v


def test_kcore_peels_pendant_pair_keeps_clique(spark, tmp_path):
    """Three identical docs form an LSH 3-clique (identical signatures
    collide in every band): each member has core degree 2 and survives
    the k=2 peel.  A separate identical PAIR is a single edge — both
    endpoints have degree 1 and peel away in round one.  A loner with
    unique vocabulary never enters the candidate graph at all."""
    from kafkastreamsjavachallenge_spark.queries.audits import q_kcore

    tri = " ".join(f"t{j}" for j in range(12))
    duo = " ".join(f"p{j}" for j in range(12))
    solo = " ".join(f"z{j}" for j in range(12))
    _write_docs(
        spark,
        tmp_path,
        [
            (0, tri, "en", "s"),
            (1, tri, "en", "s"),
            (2, tri, "en", "s"),
            (10, duo, "en", "s"),
            (11, duo, "en", "s"),
            (20, solo, "en", "s"),
        ],
    )
    out = {r["doc_id"]: r["deg_core"] for r in q_kcore(spark, str(tmp_path)).collect()}
    assert out == {0: 2, 1: 2, 2: 2}


def test_margin_knn_prefers_dense_margin_winner(spark, tmp_path):
    """One query x = 2·e0 against a 5-vector target block: y20 = e0
    (cos 1), y21 = (3,4)-mix (cos 0.6), y22..y24 orthogonal.  With k=4
    the neighborhood sums are exact e6 floors computed here with the
    same IEEE ops, so the mined pair and its integer margin are asserted
    to the digit."""
    from kafkastreamsjavachallenge_spark.queries.audits import q_margin_knn

    y21 = [0.0] * 64
    y21[0], y21[1] = 3.0, 4.0
    rows = [
        (0, _basis(0, 2.0), 0),
        (20, _basis(0), 1),
        (21, y21, 1),
        (22, _basis(1), 1),
        (23, _basis(2), 1),
        (24, _basis(3), 1),
    ]
    _write_embs(spark, tmp_path, rows)
    out = {
        r["vec_id"]: r for r in q_margin_knn(spark, str(tmp_path)).collect()
    }
    assert sorted(out) == [0]
    c06 = math.floor(6.0 / 10.0 * 1_000_000)  # cos(e0-ish, 3-4 mix)
    sx = 1_000_000 + c06  # top-4 of x: y20, y21, two zeros
    sy20 = c06  # y20's block neighbors: y21 at 0.6, rest 0
    want_margin = (8 * 1_000_000 * 10_000) // (sx + sy20)
    r = out[0]
    assert r["match_id"] == 20
    assert r["cos_e6"] == 1_000_000
    assert r["margin_bp"] == want_margin


def test_good_turing_closed_form(spark, tmp_path):
    """Source with token multiset {a:2, b:1, c:1}: N=4, V=3, n1=2, n2=1
    -> p0 = n1/N = 5000 bp, r1* = 2·n2/n1 = 1.0 (e6).  A second source
    with no hapax (every token twice) is excluded."""
    from kafkastreamsjavachallenge_spark.queries.audits import q_good_turing

    _write_docs(
        spark,
        tmp_path,
        [
            (0, "a a b c", "en", "s1"),
            (1, "x x y y", "en", "s2"),
        ],
    )
    out = {r["source"]: r for r in q_good_turing(spark, str(tmp_path)).collect()}
    assert sorted(out) == ["s1"]
    r = out["s1"]
    assert (r["n_tokens"], r["vocab"], r["n1"], r["n2"]) == (4, 3, 2, 1)
    assert r["p0_bp"] == 5000
    assert r["r1_star_e6"] == 1_000_000


def test_cohen_kappa_zero_and_perfect_agreement(spark, tmp_path):
    """Source s0 plants the four (A,B) cells once each: po = 1/2 equals
    chance pe = 1/2 -> kappa exactly 0.  Source s1 plants perfect
    agreement (one (1,1), one (0,0)) -> kappa exactly 1.  Source s2 has
    rater A constant but B split: chance pe is 1/2, observed 1/2 ->
    kappa 0 (still defined).  Source s3, where BOTH raters are constant
    (pe = 1, kappa undefined), is excluded."""
    from kafkastreamsjavachallenge_spark.queries.audits import q_cohen_kappa

    long_div = " ".join(f"w{j}" for j in range(60))  # A=1 (>=50), B=1
    long_rep = " ".join(["w"] * 60)  # A=1, B=0 (nd=1)
    short_div = " ".join(f"v{j}" for j in range(10))  # A=0, B=1
    short_rep = " ".join(["v"] * 10)  # A=0, B=0
    _write_docs(
        spark,
        tmp_path,
        [
            (0, long_div, "en", "s0"),
            (1, long_rep, "en", "s0"),
            (2, short_div, "en", "s0"),
            (3, short_rep, "en", "s0"),
            (10, long_div, "en", "s1"),
            (11, short_rep, "en", "s1"),
            (20, long_div, "en", "s2"),
            (21, long_rep, "en", "s2"),
            (30, long_div, "en", "s3"),
            (31, long_div, "en", "s3"),
        ],
    )
    out = {r["source"]: r for r in q_cohen_kappa(spark, str(tmp_path)).collect()}
    assert sorted(out) == ["s0", "s1", "s2"]  # s3: both raters constant
    assert out["s0"]["n11"] == 1 and out["s0"]["n00"] == 1
    assert out["s0"]["kappa_4"] == 0.0
    assert out["s1"]["kappa_4"] == 1.0
    assert out["s2"]["kappa_4"] == 0.0


def test_url_dedup_collapses_tracking_and_case(spark, tmp_path):
    """30 orders, one custkey: raw URLs differ by host case, trailing
    slash, and utm params, but canonicalize to exactly 2 urls (with and
    without the kept ?ref=aff).  orderkey%3==1 keeps ref (10 orders);
    the other 20 collapse to the bare canonical."""
    from kafkastreamsjavachallenge_spark.queries.audits import q_url_dedup

    spark.createDataFrame(
        [(k, 7) for k in range(30)], "o_orderkey long, o_custkey long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    r = q_url_dedup(spark, str(tmp_path)).collect()[0]
    assert r["n_raw"] == 30
    assert r["n_canon"] == 2
    assert r["max_group"] == 20
    assert r["dup_bp"] == (30 - 2) * 10000 // 30


def _write_events(spark, path, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    )
    df.write.mode("overwrite").parquet(f"{path}/events.parquet")


def test_t_closeness_planted_skewed_class(spark, tmp_path):
    """Two QI classes over an 8-bucket sensitive attribute: class A holds
    56 rows uniform over buckets 0..7 (7 each), class B holds 8 rows all
    in bucket 0.  Global (N=64): bucket0 = 15, others 7.  Exact EMD:
    class A's |prefix gaps| sum to 1568/(56·64) -> t = 1/16 = 62500 e6;
    class B's to 1568/(8·64) -> t = 7/16 = 437500 e6.  So thresholds
    0.20 and 0.35 each catch ONLY class B (8 rows), 0.50 catches
    nothing."""
    import datetime

    from kafkastreamsjavachallenge_spark.queries.audits import q_t_closeness

    t0 = datetime.datetime(2024, 1, 1, 9, 0, 0)
    t1 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (8 * r + b, t0, 1, "a", float(b))
        for r in range(7)
        for b in range(8)
    ]  # class A: 7 rows per bucket
    rows += [(100 + i, t1, 1, "a", 0.0) for i in range(8)]  # all bucket 0
    _write_events(spark, tmp_path, rows)
    out = {r["thr_e6"]: r for r in q_t_closeness(spark, str(tmp_path)).collect()}
    assert sorted(out) == [200000, 350000, 500000]
    assert out[200000]["n_classes"] == 1 and out[200000]["n_rows"] == 8
    assert out[350000]["n_classes"] == 1
    assert out[500000]["n_classes"] == 0 and out[500000]["n_rows"] == 0
    assert out[200000]["max_t_e6"] == 437500


def test_approx_quantile_bound_holds_on_real_data(spark):
    """The percentile_approx rank contract must hold (within_3err = 1)
    for every event_type on the real sf0.001 table — the same predicate
    the oracle pins, asserted here directly against the exact ranks."""
    from kafkastreamsjavachallenge_spark.queries.audits import (
        q_approx_quantile_bound,
    )

    from tests.conftest import SF_DIR

    rows = q_approx_quantile_bound(spark, SF_DIR).collect()
    assert rows and all(r["within_3err"] == 1 for r in rows)
