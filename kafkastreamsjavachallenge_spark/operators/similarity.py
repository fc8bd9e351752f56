"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k against a query vector.  The
  query row is broadcast; scoring is a pure projection; top-k compiles to
  TakeOrderedAndProject (per-partition heap + driver merge) — the exact
  baseline, linear scan, embarrassingly parallel.
- ``lsh_ann_topk``: SRP binary-sketch prefilter + exact re-rank — each
  vector reduced to an n-bit sign signature against deterministic
  md5-derived hyperplanes (reproducible in any engine with md5); rows
  within a Hamming radius of the query signature are the only ones that
  pay the exact cosine.  At 100 TB the stored signature column is ~10×
  smaller than the raw vectors and scans with SIMD popcount; sublinear
  candidate generation is the IVF family's job (``ivf_ann_topk``).
- ``lsh_buckets``: the coarse sign-bit bucket id (few planes) — the
  batch-retrieval equi-join key (q_ann_batch) and the partitioned-layout
  key for bucket-pruned storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafkastreamsjavachallenge_spark.functions.vector import cosine, dot

from kafkastreamsjavachallenge_spark.functions.text import hex4_to_int


def cosine_scores(
    df: DataFrame, query: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Score every row against a single-row query DataFrame (broadcast)."""
    q = query.select(F.col(vec_col).alias("__qvec"))
    return df.crossJoin(F.broadcast(q)).select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col("__qvec")), 4).alias("cos_sim"),
    )


def cosine_topk(
    df: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k; ties broken by id for determinism."""
    scores = cosine_scores(df, query, id_col, vec_col)
    return scores.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def _hyperplane(dim: int, plane: int):
    """Deterministic pseudo-random hyperplane: component i of plane p is
    derived from md5(p|i) → centered in [-0.5, 0.5).  Portable to any
    engine with md5 — no RNG state, no driver-side materialization."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            hex4_to_int(F.md5(F.concat_ws("|", F.lit(str(plane)), i.cast("string"))))
            / F.lit(65536.0)
            - F.lit(0.5)
        ),
    )


def lsh_buckets(
    df: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add a sign-bit LSH bucket id (int) per row — pure projection."""
    bucket = F.lit(0).cast("bigint")
    for p in range(n_planes):
        s = F.when(dot(F.col(vec_col), _hyperplane(dim, p)) >= 0, 1).otherwise(0)
        bucket = bucket + F.shiftleft(s.cast("bigint"), p)
    return df.withColumn("bucket", bucket)


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
) -> DataFrame:
    """IVF build step: assign every vector to its nearest centroid.

    Centroids broadcast (they are small by construction: k ≪ n); the
    argmin is a per-row reduction over the broadcast list — no shuffle of
    the big side.  At 100 TB the assigned table is written partitioned by
    ``centroid_id`` so probes become partition-pruned scans.  Any centroid
    source works (k-means output, a deterministic sample); the operator
    only requires (centroid_id, vec) rows.
    """
    from kafkastreamsjavachallenge_spark.functions.vector import dot, norm

    # norms hoisted out of the k-way score: inline cosine would re-fold
    # the row norm once per centroid and each centroid norm once per row;
    # precomputing both leaves one dot per (row, centroid).  Bit-identical
    # values (same fold, computed once), so argmax ties cannot move.
    c = F.broadcast(
        centroids.select(
            F.col(centroid_id).alias("__cid"),
            F.col(vec_col).alias("__cvec"),
            norm(F.col(vec_col)).alias("__cn"),
        )
    )
    scored = (
        df.withColumn("__dn", norm(F.col(vec_col)))
        .crossJoin(c)
        .withColumn(
            "__sim",
            dot(F.col(vec_col), F.col("__cvec")) / (F.col("__dn") * F.col("__cn")),
        )
    )
    # argmax via max_by, not a ranking window: partial aggregation applies
    # (each task reduces its k candidate rows per id before the shuffle),
    # and no per-partition sort is needed.  Ties break on the lowest
    # centroid id (negated in the max ordering) — deterministic.
    row = F.struct(*[scored[c] for c in df.columns], F.col("__cid"))
    best = scored.groupBy(id_col).agg(
        F.max_by(
            row, F.struct(F.col("__sim"), (-F.col("__cid")).alias("__nc"))
        ).alias("__b")
    )
    return best.select(
        *[F.col(f"__b.{c}").alias(c) for c in df.columns],
        F.col("__b.__cid").alias(centroid_id),
    )


def semdedup(
    df: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.92,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
) -> DataFrame:
    """Semantic deduplication via cluster-then-dedup (the SemDeDup recipe,
    Abbas et al. 2023, arXiv:2303.09540): assign every embedding to its
    nearest centroid, then compare pairs ONLY within a cluster and drop
    the higher id of any pair with cosine >= ``threshold``.

    Scale shape: the assignment is a broadcast argmax (big side never
    shuffles — ``ivf_assign``); the pairwise stage is an equi-join on the
    cluster id, so its cost is sum over clusters of |c|², bounded by the
    largest cluster and never corpus-quadratic.  At 100 TB the assigned
    table is written partitioned by ``centroid_id`` so each cluster
    dedups independently; a skewed cluster is split by raising k for a
    second-level clustering, exactly like IVF list balancing.

    Returns the kept rows (lowest id per semantic group survives) with
    their ``centroid_id``.

    Note: the ``semdedup_k_per_n`` ScaleProfile knob (corpus-scaled
    centroid count) is consumed by the Arrow twin ``semdedup_pandas``,
    which is the at-scale path — this declarative form's broadcast
    argmax evaluates n*k interpreted folds and measured 45x growth for
    10x data at corpus-scaled k (round-9 rehearsal), so scaling k here
    would make it worse, not better.
    """
    # r12 (guide §1.2): the assigned table feeds BOTH pair-join sides
    # and the final anti-join — checkpoint so the broadcast-argmax
    # assignment pass over the corpus runs once, not three times
    assigned = ivf_assign(df, centroids, id_col, vec_col, centroid_id).localCheckpoint(
        eager=False
    )
    # precompute each vector's norm BEFORE the pair join: inline
    # cosine(va, vb) re-folds norm(va) once per partner (3 64-element
    # folds per pair); hoisting the norms leaves one dot per pair — same
    # IEEE values (identical fold, just computed once), ~3x less float
    # work in the |c|^2 stage that dominates this operator
    from kafkastreamsjavachallenge_spark.functions.vector import norm

    a = assigned.select(
        F.col(centroid_id).alias("__cid"),
        F.col(id_col).alias("__ida"),
        F.col(vec_col).alias("__va"),
        norm(F.col(vec_col)).alias("__na"),
    )
    b = assigned.select(
        F.col(centroid_id).alias("__cid"),
        F.col(id_col).alias("__idb"),
        F.col(vec_col).alias("__vb"),
        norm(F.col(vec_col)).alias("__nb"),
    )
    from kafkastreamsjavachallenge_spark.functions.vector import dot

    dup = (
        a.join(b, "__cid")
        .filter(F.col("__ida") < F.col("__idb"))
        .filter(
            dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb"))
            >= threshold
        )
        .select(F.col("__idb").alias(id_col))
        .distinct()
    )
    return assigned.join(dup, id_col, "left_anti")


#: hard driver-side budget for the corpus-scaled centroid path: k rows of
#: (dim<=1024) float64 at 64k is ~512 MB in the worst case — already at
#: the edge of what a closure should carry; beyond it the documented
#: IVF-style sharded assignment is mandatory, and semdedup_pandas raises
#: rather than OOMing the driver mid-collect (round-11 ADVICE).
_SEMDEDUP_MAX_DRIVER_K = 65536


def semdedup_pandas(
    df: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.92,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    k_per_n: float | None = None,
) -> DataFrame:
    """Arrow/BLAS twin of ``semdedup`` — the shape the SemDeDup paper
    actually runs (GPU/BLAS matmuls), and the scale path once the
    centroid count grows with the corpus: the round-9 sf1 rehearsal
    measured the declarative path at 45x wall-time for 10x data with
    k = n/100 because its broadcast-argmax assignment evaluates n*k
    interpreted 64-dim folds; here assignment is ONE
    (batch x dim) @ (dim x k) matmul per Arrow batch and each cluster's
    pair stage is one normalized Gram matrix in ``applyInPandas``.

    Identical semantics to ``semdedup``: nearest-centroid assignment
    with ties to the LOWEST centroid id (numpy argmax returns the first
    maximum; the centroid matrix is sorted by id), then within each
    cluster drop the higher id of any pair with cosine >= threshold.
    BLAS reorders float sums, so a score within ~1 ulp of the
    threshold/argmax boundary could differ from the HOF fold — the same
    documented boundary class as ``maxsim_pandas``; set equality on the
    driver's corpora is pinned by tests/test_operators.py.

    Driver-side materialization: the centroid matrix (k x dim doubles,
    sorted by id) ships inside the Arrow closures — bounded by k, the
    same bounded-fetch class as the PQ codebook; at k beyond closure
    size, shard the assignment with a coarse first level (IVF-style).
    A pathologically skewed cluster makes one Gram matrix large —
    same remedy as the JVM path: raise k / second-level split.

    ``k_per_n`` (explicit kwarg, else the active ``scale.ScaleProfile``'s
    ``semdedup_k_per_n``) is the at-scale contract that makes "raise k"
    automatic: when it resolves non-None, the caller-supplied fixed
    ``centroids`` set is SUPERSEDED by the ``max(16, int(n * k_per_n))``
    lowest-``id_col`` rows of ``df`` itself, so cluster size — the
    quadratic hazard — stays ~1/k_per_n regardless of corpus growth
    (the round-9 rehearsal measured k = n/100 holding the BLAS path at
    2.3x growth for 10x data where fixed-k was n²-quadratic).  Under the
    default EXACT profile the knob is off and the passed centroids are
    used verbatim; at driver SFs the floor of 16 makes the derived set
    equal the registered queries' fixed lowest-16 centroids, so the
    profile does not move oracle-checked results there (pinned by
    tests/test_scale.py::test_scale_profile_parity)."""
    import numpy as np

    from pyspark.sql.types import LongType, StructField, StructType

    from kafkastreamsjavachallenge_spark.scale import resolve

    k_per_n = resolve(k_per_n, "semdedup_k_per_n")
    if k_per_n is not None:
        # one count job (the same single pass an index build pays) sizes
        # k; lowest-id selection is a distributed TakeOrdered bounded by
        # k — the same deterministic convention as the fixed-16 queries
        k = max(16, int(df.count() * k_per_n))
        if k > _SEMDEDUP_MAX_DRIVER_K:
            # the k x dim centroid matrix is collect()ed below and ships
            # inside every Arrow closure — unbounded k turns the
            # one-switch profile into a driver OOM at corpus scale.
            # Refuse loudly and point at the documented remedy rather
            # than letting the job die mid-collect.
            raise ValueError(
                f"semdedup k_per_n={k_per_n} derives k={k} centroids, "
                f"past the driver-side closure budget of "
                f"{_SEMDEDUP_MAX_DRIVER_K} (k x dim doubles are "
                "collected and broadcast in every Arrow closure). "
                "Shard the assignment with an IVF-style coarse first "
                "level (see docstring), or lower k_per_n."
            )
        centroids = (
            df.select(F.col(id_col).alias(centroid_id), F.col(vec_col))
            .orderBy(centroid_id)
            .limit(k)
        )

    # a COPY, not df.schema.add(...): add() mutates (and returns) the
    # DataFrame's cached schema object, which desyncs it from the JVM plan
    out_schema = StructType(
        list(df.schema.fields) + [StructField(centroid_id, LongType())]
    )

    crows = (
        centroids.select(centroid_id, vec_col).orderBy(centroid_id).collect()
    )
    if not crows:  # no centroids: the JVM path's broadcast join is empty
        return df.sparkSession.createDataFrame([], out_schema)
    dim = max(
        (len(r[vec_col]) for r in crows if r[vec_col] is not None), default=1
    )

    def _vec(v):
        # null vectors map to zeros (cosine 0, argmax falls to the
        # lowest centroid id) — the crash-freedom contract of the
        # robustness sweep's fully-nulled tables; real corpora never
        # take this branch
        return (
            np.asarray(v, dtype="float64")
            if v is not None and len(v) == dim
            else np.zeros(dim)
        )

    cids = np.asarray([r[centroid_id] for r in crows], dtype=np.int64)
    C = np.stack([_vec(r[vec_col]) for r in crows])
    cn = np.sqrt((C * C).sum(axis=1))
    Cn = C / np.where(cn == 0, 1.0, cn)[:, None]

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(**{centroid_id: pd.Series([], dtype="int64")})
                continue
            m = np.stack(pdf[vec_col].apply(_vec))
            # row norms are constant across centroids — argmax unaffected
            idx = (m @ Cn.T).argmax(axis=1)
            yield pdf.assign(**{centroid_id: cids[idx]})

    assigned = df.mapInPandas(assign, schema=out_schema)

    def dedup(pdf):
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        m = np.stack(pdf[vec_col].apply(_vec))
        nrm = np.sqrt((m * m).sum(axis=1))
        mn = m / np.where(nrm == 0, 1.0, nrm)[:, None]
        g = mn @ mn.T
        # dropped[j] <=> exists i<j with cos(i,j) >= threshold
        drop = (np.triu(g, 1) >= threshold).any(axis=0)
        return pdf[~drop]

    return assigned.groupBy(centroid_id).applyInPandas(
        lambda _k, pdf: dedup(pdf), schema=out_schema
    )


def _resolve_nprobe(nprobe: int | None) -> int:
    """Explicit ``nprobe`` wins; ``None`` falls back to the active
    ``scale.ScaleProfile``'s ``ann_nprobe`` (the one-switch deployment
    probe width), else the historical operator default of 2.  An
    explicit-but-invalid width (< 1, e.g. a profile typo of 0) raises
    instead of being silently coerced — probing zero lists returns an
    empty result, which looks like a recall bug, not a config bug."""
    from kafkastreamsjavachallenge_spark.scale import resolve

    resolved = resolve(nprobe, "ann_nprobe")
    if resolved is None:
        return 2
    if resolved < 1:
        raise ValueError(f"nprobe must be >= 1, got {resolved}")
    return resolved


def _probe_lists(
    query: DataFrame, centroids: DataFrame, nprobe: int, vec_col: str
) -> DataFrame:
    """The ``nprobe`` centroid ids nearest (cosine) to the query vector —
    the coarse-quantizer probe set shared by IVF-flat and IVF-PQ.  Ties
    break on the lowest centroid id; the whole thing is a 1-row × k
    broadcast score + limit, never touching the corpus."""
    qc = query.select(F.col(vec_col).alias("__qvec")).crossJoin(
        F.broadcast(
            centroids.select(
                F.col("centroid_id"), F.col(vec_col).alias("__cvec")
            )
        )
    )
    return (
        qc.withColumn("__sim", cosine(F.col("__qvec"), F.col("__cvec")))
        .orderBy(F.col("__sim").desc(), F.col("centroid_id"))
        .limit(nprobe)
        .select("centroid_id")
    )


def ivf_ann_topk(
    df: DataFrame,
    query: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF probe: score the query against centroids, search only the
    ``nprobe`` nearest inverted lists.

    Candidate filter is a semi-join on centroid_id (broadcast — nprobe
    ids), then exact cosine within the probed lists.  Recall grows with
    nprobe; cost is |probed lists|, not |table|.  ``nprobe=None`` defers
    to the active ``scale.ScaleProfile``'s ``ann_nprobe`` (the
    deployment-wide probe-width switch), else 2.
    """
    nprobe = _resolve_nprobe(nprobe)
    assigned = ivf_assign(df, centroids, id_col, vec_col)
    probes = _probe_lists(query, centroids, nprobe, vec_col)
    cands = assigned.join(F.broadcast(probes), on="centroid_id", how="left_semi")
    return cosine_topk(cands, query, k, id_col, vec_col)


def ivfpq_ann_topk(
    df: DataFrame,
    query: DataFrame,
    centroids: DataFrame,
    codebook: DataFrame,
    k: int = 10,
    nprobe: int | None = None,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ: the FAISS-style billion-vector layout — a coarse quantizer
    prunes the corpus to ``nprobe`` inverted lists, then PQ asymmetric
    distance scores ONLY the survivors from their m-byte code words
    (no-residual IVFPQ, i.e. ``by_residual=false``: codes quantize the
    raw vectors, not the centroid residuals, so one codebook serves every
    list and the ADC table stays m×k per query).

    Scale shape = the intersection of both parents' shapes: the corpus
    never shuffles (broadcast centroid argmax + broadcast probe semi-join
    + broadcast ADC table), scan cost per query is O(|probed lists| · m)
    integer lookups, and storage is m bytes/vector.  At 100 TB the code
    table is written partitioned by ``centroid_id`` so a probe is a
    partition-pruned scan of compressed codes — the only layout that
    keeps both the scan bytes AND the float math sublinear.
    ``nprobe=None`` defers to the active ``scale.ScaleProfile``'s
    ``ann_nprobe``, else 2.
    """
    nprobe = _resolve_nprobe(nprobe)
    assigned = ivf_assign(df, centroids, id_col, vec_col)
    probes = _probe_lists(query, centroids, nprobe, vec_col)
    cands = assigned.join(
        F.broadcast(probes), on="centroid_id", how="left_semi"
    ).drop("centroid_id")
    return pq_ann_topk(cands, query, codebook, k, m, dim, id_col, vec_col)


def ivf_assign_blas(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    dim: int = 64,
    strict_parity: bool = False,
) -> DataFrame:
    """Arrow twin of ``ivf_assign``: the nearest-centroid argmax computed
    as one vectorized kernel per Arrow batch.  Every arithmetic step
    reproduces the declarative form bit-for-bit: dots and norms
    accumulate with an explicit index-order loop (numpy reductions are
    pairwise — NOT fold-order), division and sqrt are single correctly-
    rounded IEEE ops, and argmax's first-maximum is the lowest-centroid
    tie-break (max_by(struct(sim, -cid))).  NaN similarity (zero norms)
    wins in both engines (Spark orders NaN largest; numpy argmax
    propagates NaN), ties on NaN break to the first = lowest cid.

    Divergence from the declarative form on DEGENERATE rows: a
    null/wrong-length vector here gets a NULL centroid and is DROPPED,
    whereas ``ivf_assign``'s max_by over struct(null __sim, -cid)
    assigns such rows to the LOWEST centroid id.  This is intentional
    (a garbage vector in a real list poisons probes) but means the
    default twin is only equivalence-safe inside ``ivfpq_ann_topk_blas``,
    where ``pq_encode`` drops those rows downstream on both paths anyway.
    A STANDALONE index build that must retain degenerate vectors passes
    ``strict_parity=True``: null/wrong-length rows are then assigned the
    lowest centroid id exactly like ``ivf_assign`` (row-for-row equality
    on such fixtures is pinned by
    tests/test_approx.py::test_ivf_assign_blas_strict_parity).
    Centroids collect driver-side — bounded by construction (k ≪ n),
    same discipline as the codebook."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    c_rows = centroids.select(centroid_id, vec_col).collect()
    # ascending-cid order makes argmax's first-maximum THE lowest-cid
    # tie-break (collect() order is otherwise partition-dependent)
    c_rows = sorted(
        (r for r in c_rows if r[1] is not None and len(r[1]) == dim),
        key=lambda r: r[0],
    )
    if not c_rows:
        return df.withColumn(centroid_id, F.lit(None).cast("long")).filter(
            F.lit(False)
        )
    cids = np.array([r[0] for r in c_rows], dtype=np.int64)
    C = np.stack(
        [np.asarray(r[1], dtype=np.float64) for r in c_rows]
    )  # (k, dim)

    def _seq_dot(X, Y):
        acc = None
        for i in range(X.shape[1]):
            t = X[:, i : i + 1] * Y[None, :, i]
            acc = t if acc is None else acc + t
        return acc

    def _seq_norm(X):
        acc = None
        for i in range(X.shape[1]):
            t = X[:, i] * X[:, i]
            acc = t if acc is None else acc + t
        return np.sqrt(acc)

    cn = _seq_norm(C)

    # strict_parity: degenerate rows take the declarative path's
    # lowest-cid assignment instead of NULL-and-drop
    fallback_cid = int(cids[0]) if strict_parity else None

    def _assign(v):
        vals = v.to_numpy()
        valid = np.array(
            [x is not None and len(x) == dim for x in vals], dtype=bool
        )
        out = [fallback_cid] * len(vals)
        if valid.any():
            X = np.stack(vals[valid]).astype(np.float64)
            with np.errstate(divide="ignore", invalid="ignore"):
                sim = _seq_dot(X, C) / (_seq_norm(X)[:, None] * cn[None, :])
            # NaN must win like Spark's max_by (NaN orders largest):
            # argmax alone returns the FIRST NaN, matching the lowest-cid
            # tie-break among NaNs; for NaN-free rows it is the plain
            # first-maximum = lowest cid on exact ties.
            best = np.argmax(sim, axis=1)
            for i, j in enumerate(np.flatnonzero(valid)):
                out[j] = int(cids[best[i]])
        return pd.Series(out, dtype="object")

    _assign.__annotations__ = {"v": pd.Series, "return": pd.Series}
    assign = pandas_udf(_assign, "long")
    out = df.withColumn(centroid_id, assign(F.col(vec_col)))
    if strict_parity:
        return out  # no NULLs produced — every row carries a centroid
    return out.filter(F.col(centroid_id).isNotNull())


def ivfpq_ann_topk_blas(
    df: DataFrame,
    query: DataFrame,
    centroids: DataFrame,
    codebook: DataFrame,
    k: int = 10,
    nprobe: int | None = None,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow twin of ``ivfpq_ann_topk``: coarse assignment, probe-set
    membership and encode/ADC fused into ONE Arrow kernel (r12, guide
    §4.1): the embedding column crosses the JVM↔Python boundary once
    instead of twice (the old shape shipped every vector into the assign
    UDF, back out, through a probe semi-join, then into the ADC UDF).
    The probe set is ``nprobe`` ids — collected driver-side like the
    codebook and the query block.  Every arithmetic step is the two
    parent twins' verbatim: ``ivf_assign_blas``'s sequential dot/norm
    folds + first-maximum argmax, and ``pq_ann_topk_blas``'s sequential
    ADC accumulation — so candidate sets and distances still match the
    declarative composite bit-for-bit.  ``nprobe=None`` defers to the
    active ``scale.ScaleProfile``'s ``ann_nprobe``, else 2."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    nprobe = _resolve_nprobe(nprobe)
    probe_ids = {
        r["centroid_id"]
        for r in _probe_lists(query, centroids, nprobe, vec_col).collect()
    }
    c_rows = centroids.select("centroid_id", vec_col).collect()
    c_rows = sorted(
        (r for r in c_rows if r[1] is not None and len(r[1]) == dim),
        key=lambda r: r[0],
    )
    sub_len = dim // m
    cb_rows = codebook.collect()
    q_rows = query.select(vec_col).collect()
    if len(q_rows) > 1:
        raise ValueError("ivfpq_ann_topk_blas supports at most one query row")
    degenerate = (
        not c_rows
        or not probe_ids
        or not cb_rows
        or not q_rows
        or q_rows[0][0] is None
        or len(q_rows[0][0]) != dim
    )
    if degenerate:
        return df.select(
            F.col(id_col), F.lit(None).cast("double").alias("adc_dist")
        ).filter(F.lit(False))

    cids = np.array([r[0] for r in c_rows], dtype=np.int64)
    Cc = np.stack([np.asarray(r[1], dtype=np.float64) for r in c_rows])
    probed = np.array([int(c) in probe_ids for c in cids], dtype=bool)
    k_codes = 1 + max(r["code"] for r in cb_rows)
    C = np.zeros((m, k_codes, sub_len), dtype=np.float64)
    for r in cb_rows:
        C[r["sub"], r["code"]] = np.asarray(r["cvec"], dtype=np.float64)
    qv = np.asarray(q_rows[0][0], dtype=np.float64)

    def _seq_dot(X, Y):
        acc = None
        for i in range(X.shape[1]):
            t = X[:, i : i + 1] * Y[None, :, i]
            acc = t if acc is None else acc + t
        return acc

    def _seq_norm(X):
        acc = None
        for i in range(X.shape[1]):
            t = X[:, i] * X[:, i]
            acc = t if acc is None else acc + t
        return np.sqrt(acc)

    def _seq_l2(X, Cs):
        acc = None
        for i in range(X.shape[1]):
            d = X[:, i : i + 1] - Cs[None, :, i]
            t = d * d
            acc = t if acc is None else acc + t
        return acc

    cn = _seq_norm(Cc)
    dt = np.stack(
        [
            _seq_l2(qv[s * sub_len : (s + 1) * sub_len][None, :], C[s])[0]
            for s in range(m)
        ]
    )

    def _fused(v):
        vals = v.to_numpy()
        valid = np.array(
            [x is not None and len(x) == dim for x in vals], dtype=bool
        )
        out = [None] * len(vals)
        if valid.any():
            X = np.stack(vals[valid]).astype(np.float64)
            with np.errstate(divide="ignore", invalid="ignore"):
                sim = _seq_dot(X, Cc) / (_seq_norm(X)[:, None] * cn[None, :])
            keep = probed[np.argmax(sim, axis=1)]
            total = None
            if keep.any():
                Xk = X[keep]
                for s in range(m):
                    codes = np.argmin(
                        _seq_l2(Xk[:, s * sub_len : (s + 1) * sub_len], C[s]),
                        axis=1,
                    )
                    t = dt[s][codes]
                    total = t if total is None else total + t
                kept_idx = np.flatnonzero(valid)[keep]
                for i, j in enumerate(kept_idx):
                    out[j] = float(total[i])
        return pd.Series(out, dtype="object")

    _fused.__annotations__ = {"v": pd.Series, "return": pd.Series}
    # asNondeterministic (guide §4.4): same duplicated-kernel pathology
    # as _adc — the isnotnull(adc_dist) filter re-evaluated the fused
    # kernel over the whole corpus (2 ArrowEvalPython nodes per scan)
    fused = pandas_udf(_fused, "double").asNondeterministic()
    return (
        df.select(id_col, F.round(fused(F.col(vec_col)), 4).alias("adc_dist"))
        .filter(F.col("adc_dist").isNotNull())
        .orderBy(F.col("adc_dist"), F.col(id_col))
        .limit(k)
    )



#: SRP packed-signature word width.  48 (not 64) so ``1 << j`` never
#: touches the sign bit — DuckDB's ``1::BIGINT << 63`` and a JVM long
#: would disagree on overflow semantics; 48-bit words stay positive
#: everywhere.  192 planes / 48 = 4 words per signature.
SRP_WORD_BITS = 48

#: Quantization scale for the sign dot product: a power of two, so
#: ``vec[i] * 2**20`` is EXACT in float64 and ``floor`` of it is the
#: same integer in numpy, the JVM, and DuckDB.
SRP_QUANT = 1 << 20


def srp_plane_ints(n_planes: int, dim: int) -> list[int]:
    """The deterministic hyperplane matrix as one flat row-major list of
    INTEGERS: component ``i`` of plane ``p`` sits at index ``p*dim + i``
    and equals ``int(md5(f"{p}|{i}")[:4], 16) - 32768`` — the md5 cell
    formula shared with ``_hyperplane`` and the DuckDB oracle, scaled by
    65536 (scaling never changes the sign of a dot product).  Integer
    planes × integer-quantized vectors make the sign bit EXACT and
    order-independent: every product is ≤ 2^36 and every partial sum
    ≤ 2^42, so even a float64 BLAS matmul computes them without rounding
    (all integers < 2^53 are exact in float64) — numpy, the JVM, and
    DuckDB agree bit-for-bit regardless of accumulation order."""
    import hashlib

    return [
        int(hashlib.md5(f"{p}|{i}".encode()).hexdigest()[:4], 16) - 32768
        for p in range(n_planes)
        for i in range(dim)
    ]


def _srp_words_udf(n_planes: int, dim: int):
    """Arrow-batched signature kernel: per batch, one float64 BLAS matmul
    ``floor(V·2^20) @ P.T`` (exact — see ``srp_plane_ints``), sign-bits
    packed into ``n_planes / 48`` 48-bit words.  Replaces the round-8
    Catalyst HOF fold (192 planes × 64 dims of interpreted lambda PER
    ROW — measured 2.4 s for 2000 rows; this kernel does the same rows
    in ~20 ms)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    n_words = n_planes // SRP_WORD_BITS
    shifts = (1 << np.arange(SRP_WORD_BITS, dtype=np.int64))
    # built ONCE in the factory and shipped in the closure (like the
    # semdedup centroid matrix) — rebuilding it in _sig would redo
    # n_planes·dim md5 hashes per Arrow batch on every executor
    planes = np.array(
        srp_plane_ints(n_planes, dim), dtype=np.float64
    ).reshape(n_planes, dim)

    def _sig(v):
        vals = v.to_numpy()
        # a null or wrong-length embedding gets a NULL signature — the
        # row then fails the Hamming filter, exactly like the fold form
        # (null-padded zip_with → null dot → null bits → filtered)
        valid = np.array(
            [x is not None and len(x) == dim for x in vals], dtype=bool
        )
        out = [None] * len(vals)
        if valid.any():
            vq = np.floor(
                np.stack(vals[valid]).astype(np.float64) * float(SRP_QUANT)
            )
            bits = (vq @ planes.T) >= 0.0  # exact integer compare
            words = np.empty((len(vq), n_words), dtype=np.int64)
            for w in range(n_words):
                block = bits[
                    :, w * SRP_WORD_BITS : (w + 1) * SRP_WORD_BITS
                ].astype(np.int64)
                words[:, w] = block @ shifts
            for i, j in enumerate(np.flatnonzero(valid)):
                out[j] = words[i]
        return pd.Series(out)

    # module-wide `from __future__ import annotations` stringifies def-site
    # hints, which the pandas_udf validator cannot resolve against the
    # factory's locals — attach live objects instead.
    _sig.__annotations__ = {"v": pd.Series, "return": pd.Series}
    # asNondeterministic (guide §4.4): the Hamming join condition implies
    # isnotnull(__sig); Catalyst pushed that inferred constraint below
    # the signature projection, re-evaluating the matmul kernel per row
    # (two ArrowEvalPython nodes per scan in the r11 plans of every LSH
    # retrieval consumer — the corpus crossed the Python boundary twice).
    # The kernel IS deterministic; the marker only forbids the optimizer
    # from duplicating or reordering it.  Corpus-side pre-filters
    # (vec_id, norm) are applied before the signature column exists, so
    # no wanted pushdown is lost.
    return pandas_udf(_sig, "array<long>").asNondeterministic()


def lsh_ann_topk(
    df: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_planes: int = 192,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hamming_t: int | None = None,
) -> DataFrame:
    """Approximate top-k via SRP binary sketches: each vector is reduced
    to an ``n_planes``-bit sign signature; candidates are rows whose
    signature is within Hamming distance ``hamming_t`` of the query's;
    only candidates pay the exact cosine.  This is the binary-sketch
    prefilter + exact re-rank design of production binary indexes
    (e.g. FAISS IndexBinaryFlat): signature Hamming distance estimates
    the angle (E[h] = n_planes·θ/π), so a radius threshold admits the
    near-angle shell and rejects the random bulk.

    Replaces the round-1 single-bucket + Hamming-k bucket-probe scheme:
    on near-uniform corpora (this testdata: top-10 cosines ≈ 0.31-0.41)
    NO bucket-probe config reaches deployment recall — measured at sf0.1,
    8-bit buckets gave recall@10 = 0.30 at 80 candidates and Hamming-2
    probing only 0.50 at 293, while 192-bit signatures at t = 84 give
    recall@10 = 1.0 at 244 candidates (sf0.01: 1.0 at 57).

    Cost/scale: the signature scan is linear but over n_planes/8 bytes
    per row (24 B at 192 bits vs 256 B of raw floats — a 10× IO cut; a
    real cluster stores the signature column and scans it with SIMD
    popcount); exact scoring touches only the Hamming ball (~4-12% on
    random data at t/n = 0.4375).  For sublinear candidate generation
    use the IVF family — this operator is the no-training, one-scan,
    tunable-recall path.
    """
    cands = lsh_candidates(df, query, n_planes, dim, vec_col, hamming_t)
    return cosine_topk(cands, query, k, id_col, vec_col)


def lsh_candidates(
    df: DataFrame,
    query: DataFrame,
    n_planes: int = 192,
    dim: int = 64,
    vec_col: str = "embedding",
    hamming_t: int | None = None,
) -> DataFrame:
    """The Hamming-ball candidate set of ``lsh_ann_topk`` BEFORE scoring —
    the shared step the top-k retrieval and the cost/recall frontier
    audit (q_ann_frontier) both read.  Rows of ``df`` whose SRP signature
    differs from the query's in at most ``hamming_t`` bits (default
    ``floor(0.4375 · n_planes)``, the measured recall≥0.9 knee on
    near-uniform data).

    Signatures are computed by one exact Arrow/BLAS matmul per batch
    (``_srp_words_udf`` — integer-quantized, order-independent, see
    ``srp_plane_ints``) and packed into 48-bit words, so the Hamming
    distance is ``bit_count(xor)`` over ``n_planes/48`` bigints — the
    SIMD-popcount scan a production binary index runs, not a per-bit
    fold.  The 1-row query signature is broadcast; the filter itself is
    a scan-side projection — no shuffle of the corpus."""
    if hamming_t is None:
        hamming_t = (n_planes * 7) // 16  # 0.4375 — 84 bits at 192
    if n_planes % SRP_WORD_BITS:
        raise ValueError(f"n_planes must be a multiple of {SRP_WORD_BITS}")
    sig_udf = _srp_words_udf(n_planes, dim)
    q_sig = query.select(sig_udf(F.col(vec_col)).alias("__qsig"))
    n_words = n_planes // SRP_WORD_BITS
    sig = sig_udf(F.col(vec_col))
    hamming = None
    for w in range(1, n_words + 1):
        term = F.bit_count(
            F.element_at("__sig", w).bitwiseXOR(F.element_at("__qsig", w))
        )
        hamming = term if hamming is None else hamming + term
    return (
        df.withColumn("__sig", sig)
        .crossJoin(F.broadcast(q_sig))
        .filter(hamming <= F.lit(hamming_t))
        .drop("__sig", "__qsig")
    )


def _subvectors(
    df: DataFrame, m: int, dim: int, id_col: str, vec_col: str
) -> DataFrame:
    """Split each vector into ``m`` contiguous subvectors: one row per
    (id, sub) with an array<double> slice — pure projection + explode."""
    sub_len = dim // m
    slices = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: F.struct(
            s.alias("sub"),
            F.slice(
                F.col(vec_col).cast("array<double>"), s * sub_len + 1, sub_len
            ).alias("sv"),
        ),
    )
    return df.select(
        F.col(id_col).alias("__id"), F.explode(slices).alias("__s")
    ).select("__id", F.col("__s.sub").alias("sub"), F.col("__s.sv").alias("sv"))


def pq_train(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 3,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization codebook: per-subspace Lloyd's k-means run
    jointly across all ``m`` subspaces (codebook key = (sub, code)).

    Fully deterministic (init = each subspace's k lowest-id subvectors;
    distance ties break on the lowest code).  Scale shape per iteration:
    the subvector table joins the broadcast m×k codebook on ``sub`` (never
    shuffled itself), reduced by a map-side-combinable ``min_by``, then a
    (m × k × sub_dim)-group mean — the classic PQ trainer re-expressed as
    two hash aggregates.  Returns (sub, code, cvec).
    """
    from pyspark.sql import Window

    from kafkastreamsjavachallenge_spark.functions.vector import l2_sq

    # r12 (guide §1.2): the subvector table feeds the init job AND every
    # iteration's assignment — a lazy localCheckpoint computes the
    # scan + slice-explode once instead of once per Lloyd's iteration
    subs = _subvectors(df, m, dim, id_col, vec_col).localCheckpoint(
        eager=False
    )
    w = Window.partitionBy("sub").orderBy("__id")
    # the codebook is ALWAYS m x k rows (128 here) regardless of corpus
    # size — collapse it to one partition before each checkpoint so the
    # per-iteration materialization and the downstream broadcasts cost
    # one task, not one per shuffle partition (a vanilla session's 200)
    codebook = (
        subs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("sub", (F.col("__rn") - 1).alias("code"), F.col("sv").alias("cvec"))
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        scored = subs.join(F.broadcast(codebook), "sub").withColumn(
            "__d", l2_sq(F.col("sv"), F.col("cvec"))
        )
        assigned = scored.groupBy("__id", "sub").agg(
            F.min_by(
                F.struct(F.col("code"), F.col("sv")),
                F.struct(F.col("__d"), F.col("code")),
            ).alias("__b")
        )
        means = (
            assigned.select(
                "sub",
                F.col("__b.code").alias("code"),
                F.posexplode("__b.sv").alias("__i", "__v"),
            )
            .groupBy("sub", "code", "__i")
            .agg(F.avg("__v").alias("__m"))
            .groupBy("sub", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__i", "__m"))),
                    lambda s: s["__m"],
                ).alias("cvec")
            )
        )
        # empty codes keep their previous centroid
        codebook = (
            means.unionByName(codebook.join(means, ["sub", "code"], "left_anti"))
            .coalesce(1)
            .localCheckpoint(eager=True)
        )
    return codebook


def pq_encode(
    df: DataFrame,
    codebook: DataFrame,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector its m-byte PQ code word (array of code ids
    ordered by subspace).  The big side joins the broadcast codebook on
    ``sub`` and reduces with min_by — no shuffle of the vectors; at 100 TB
    the stored code table is m bytes/vector instead of 4·dim."""
    from kafkastreamsjavachallenge_spark.functions.vector import l2_sq

    subs = _subvectors(df, m, dim, id_col, vec_col)
    scored = subs.join(F.broadcast(codebook), "sub").withColumn(
        "__d", l2_sq(F.col("sv"), F.col("cvec"))
    )
    best = scored.groupBy("__id", "sub").agg(
        F.min_by(F.col("code"), F.struct(F.col("__d"), F.col("code"))).alias("code")
    )
    return (
        best.groupBy("__id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "code"))),
                lambda s: s["code"],
            ).alias("codes")
        )
        .select(F.col("__id").alias(id_col), "codes")
    )


def pq_ann_topk(
    df: DataFrame,
    query: DataFrame,
    codebook: DataFrame,
    k: int = 10,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_query_id: bool = False,
) -> DataFrame:
    """PQ asymmetric-distance top-k: precompute the query's m×k distance
    table against the codebook (tiny, broadcast), then score every stored
    code word by summing m table lookups — the IVF-PQ probe kernel.

    The scored side touches only the m-byte codes; the sum-of-lookups is
    an explode + broadcast equi-join on (sub, code) + one hash aggregate,
    so scan cost per query is O(n·m) integer joins instead of O(n·dim)
    float math, and the whole distance table ships to every executor
    once.  Approximate by construction → verify recall against
    ``cosine_topk``/exact-L2 (tests), not an SQL oracle.

    ``query`` may contain multiple rows: the distance table carries the
    query id, the ADC sum groups by (query id, stored id), and the top-k
    is ranked per query (a single-row query yields the familiar flat
    top-k).  Pass ``keep_query_id=True`` to retain the query id as a
    ``query_id`` column — required to disambiguate multi-query output.
    """
    from pyspark.sql import Window

    from kafkastreamsjavachallenge_spark.functions.vector import l2_sq

    codes = pq_encode(df, codebook, m, dim, id_col, vec_col)
    q_subs = _subvectors(query, m, dim, id_col, vec_col)
    dtab = (
        q_subs.join(codebook, "sub")
        .select(
            F.col("__id").alias("__qid"),
            "sub",
            "code",
            l2_sq(F.col("sv"), F.col("cvec")).alias("d"),
        )
    )
    exploded = codes.select(
        id_col, F.posexplode("codes").alias("sub", "code")
    )
    scored = (
        exploded.join(F.broadcast(dtab), ["sub", "code"])
        .groupBy("__qid", id_col)
        .agg(F.round(F.sum("d"), 4).alias("adc_dist"))
    )
    w = Window.partitionBy("__qid").orderBy(F.col("adc_dist"), F.col(id_col))
    ranked = scored.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    if keep_query_id:
        return ranked.select(
            F.col("__qid").alias("query_id"), id_col, "adc_dist"
        ).orderBy("query_id", F.col("adc_dist"), F.col(id_col))
    return ranked.drop("__rn", "__qid").orderBy(
        F.col("adc_dist"), F.col(id_col)
    )


def pq_ann_topk_blas(
    df: DataFrame,
    query: DataFrame,
    codebook: DataFrame,
    k: int = 10,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow/BLAS twin of ``pq_ann_topk`` (single-row query): encode +
    ADC in ONE vectorized kernel per Arrow batch instead of the
    explode → broadcast-join → hash-agg pipeline (whose per-(row, sub,
    code) interpreted l2 folds dominate the declarative path's cost —
    the same finding as the q_maxsim_blas / q_semdedup_blas twins).

    Exactness contract: the per-subspace squared distances accumulate
    with an EXPLICIT 8-step sequential loop — numpy's axis-sum is
    pairwise even at 8 elements (measured: not bit-identical), so the
    kernel adds term-by-term in index order, reproducing the Catalyst
    fold and the DuckDB oracle bit-for-bit (float32→float64 casts and
    products are exact on all three).  argmin's first-minimum IS the
    lowest-code tie-break.  The ADC sum is 8 floats in subspace order;
    like the declarative path it agrees with the oracle away from the
    4-dp rounding boundary (the documented _PQ_SQL caveat).  The
    codebook (m×k rows) and the query block are bounded driver-side
    collections — the same discipline as the MaxSim query block.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    sub_len = dim // m
    cb_rows = codebook.collect()  # m*k rows — bounded by construction
    q_rows = query.select(vec_col).collect()
    if len(q_rows) > 1:
        raise ValueError("pq_ann_topk_blas supports at most one query row")
    degenerate = (
        not cb_rows
        or not q_rows
        or q_rows[0][0] is None
        or len(q_rows[0][0]) != dim
    )
    if degenerate:  # empty/nulled corpus fixtures — same rows as the
        # declarative path's empty joins: none
        return (
            df.select(
                F.col(id_col), F.lit(None).cast("double").alias("adc_dist")
            )
            .filter(F.lit(False))
        )
    k_codes = 1 + max(r["code"] for r in cb_rows)
    C = np.zeros((m, k_codes, sub_len), dtype=np.float64)
    for r in cb_rows:
        C[r["sub"], r["code"]] = np.asarray(r["cvec"], dtype=np.float64)
    qv = np.asarray(q_rows[0][0], dtype=np.float64)

    def _seq_l2(X, Cs):
        # (n, L) vs (k, L) -> (n, k), summed in index order (see above)
        acc = None
        for i in range(X.shape[1]):
            d = X[:, i : i + 1] - Cs[None, :, i]
            t = d * d
            acc = t if acc is None else acc + t
        return acc

    # query ADC table: dt[sub, code], same sequential fold as l2_sq
    dt = np.stack(
        [
            _seq_l2(qv[s * sub_len : (s + 1) * sub_len][None, :], C[s])[0]
            for s in range(m)
        ]
    )

    def _adc(v):
        vals = v.to_numpy()
        # null / wrong-length embeddings score None (→ SQL NULL) and are
        # filtered — the rows the declarative path's joins would drop.
        # None, NOT NaN: a corpus row whose embedding legitimately
        # CONTAINS NaN must keep its NaN adc_dist (sorts last, can
        # surface when fewer than k valid rows exist) exactly like the
        # declarative pq_ann_topk — a NaN sentinel would silently drop it
        valid = np.array(
            [x is not None and len(x) == dim for x in vals], dtype=bool
        )
        total = None
        if valid.any():
            X = np.stack(vals[valid]).astype(np.float64)
            for s in range(m):
                codes = np.argmin(
                    _seq_l2(X[:, s * sub_len : (s + 1) * sub_len], C[s]),
                    axis=1,
                )
                t = dt[s][codes]
                total = t if total is None else total + t
        if valid.all() and total is not None:
            # fast path (the normal case — whole batch valid): a float64
            # ndarray crosses Arrow an order of magnitude cheaper than
            # the object Series the mixed path needs for its None cells
            return pd.Series(total)
        out = [None] * len(vals)
        if total is not None:
            for i, j in enumerate(np.flatnonzero(valid)):
                out[j] = float(total[i])
        return pd.Series(out, dtype="object")

    _adc.__annotations__ = {"v": pd.Series, "return": pd.Series}
    # asNondeterministic (guide §4.4, the _srp_words_udf lesson): the
    # isnotnull(adc_dist) filter below otherwise pushes beneath the
    # projection and Catalyst re-evaluates the kernel — the executed
    # plan carried TWO corpus-sized ArrowEvalPython nodes for one call
    adc = pandas_udf(_adc, "double").asNondeterministic()
    return (
        df.select(id_col, F.round(adc(F.col(vec_col)), 4).alias("adc_dist"))
        # NULL marks invalid rows through Arrow; data-NaN passes through
        .filter(F.col("adc_dist").isNotNull())
        .orderBy(F.col("adc_dist"), F.col(id_col))
        .limit(k)
    )


def kmeans(
    df: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Distributed Lloyd's k-means over an embedding column — the trainer
    for IVF centroids (``ivf_ann_topk`` consumes any (centroid_id, vec)
    relation).

    Fully deterministic: init is the k lowest-id vectors; the assignment
    argmin breaks distance ties on the lowest centroid id; the update is a
    positional-explode mean re-assembled with an order-pinned array_sort.

    Scale shape per iteration: one broadcast cross-score of n×k rows
    reduced by a map-side-combinable ``min_by`` hash aggregate (the big
    table is never shuffled by centroid), then a (k × dim)-group mean.
    ``localCheckpoint`` truncates iteration lineage (reliable
    ``checkpoint`` on a real cluster).  Empty clusters keep their previous
    centroid.  Returns (assignments, centroids).
    """
    from kafkastreamsjavachallenge_spark.functions.vector import l2_sq
    from pyspark.sql import Window

    vecs = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__vec"),
    )
    w = Window.orderBy("__id")  # k rows — single-partition window is fine
    centroids = (
        vecs.orderBy("__id")
        .limit(k)
        .select(
            (F.row_number().over(w) - 1).alias("centroid_id"),
            F.col("__vec").alias("cvec"),
        )
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    assigned = None
    for _ in range(iters):
        scored = vecs.crossJoin(F.broadcast(centroids)).withColumn(
            "__d", l2_sq(F.col("__vec"), F.col("cvec"))
        )
        assigned = (
            scored.groupBy("__id")
            .agg(
                F.min_by(
                    F.struct(F.col("centroid_id"), F.col("__vec")),
                    F.struct(F.col("__d"), F.col("centroid_id")),
                ).alias("__b")
            )
            .select(
                "__id",
                F.col("__b.centroid_id").alias("centroid_id"),
                F.col("__b.__vec").alias("__vec"),
            )
        )
        means = (
            assigned.select("centroid_id", F.posexplode("__vec").alias("__i", "__v"))
            .groupBy("centroid_id", "__i")
            .agg(F.avg("__v").alias("__m"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__i", "__m"))),
                    lambda s: s["__m"],
                ).alias("cvec")
            )
        )
        # empty clusters keep their previous centroid
        # k rows always — one-partition checkpoint, one-task broadcasts
        centroids = (
            means.unionByName(centroids.join(means, "centroid_id", "left_anti"))
            .coalesce(1)
            .localCheckpoint(eager=True)
        )
    out = assigned.select(F.col("__id").alias(id_col), "centroid_id")
    return out, centroids.select("centroid_id", F.col("cvec").alias(vec_col))


def pca_top_component(
    df: DataFrame,
    sample_max_id: int = 128,
    iters: int = 3,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top principal component by power iteration over a BOUNDED,
    deterministic sample (``id < sample_max_id``), following the
    sample-trained discipline of the PQ codebook: model-fitting cost is
    fixed by the sample, never by the corpus.

    The entire fit happens inside ONE 1-row aggregate: the sample
    collects into an id-sorted list and every reduction (mean vector,
    covariance-free power steps  w = Σ_x ((x−μ)·v)(x−μ),  norms) is a
    SEQUENTIAL fold over that list — so the model is bit-reproducible
    across partitionings and engines; no corpus-sized shuffle exists
    anywhere.  v0 is the constant 1/8 vector (exactly representable).

    Returns a 1-row DataFrame (mu array<double>, pc array<double>).
    """
    zeros = F.array_repeat(F.lit(0.0), dim)

    def vsum(lst):
        return F.aggregate(lst, zeros, lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b))

    def sdot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
        )

    s = (
        df.filter(F.col(id_col) < sample_max_id)
        .select(
            id_col,
            F.transform(F.col(vec_col), lambda e: e.cast("double")).alias("__x"),
        )
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(id_col, "__x"))),
                lambda r: r["__x"],
            ).alias("xs")
        )
    )
    n = F.size("xs").cast("double")
    s = s.withColumn("mu", F.transform(vsum(F.col("xs")), lambda v: v / n))
    s = s.withColumn(
        "cx",
        F.transform(
            F.col("xs"), lambda x: F.zip_with(x, F.col("mu"), lambda a, b: a - b)
        ),
    )
    s = s.withColumn("v0", F.array_repeat(F.lit(0.125), dim))
    for t in range(iters):
        vt, vn = f"v{t}", f"v{t + 1}"
        ss = F.transform(F.col("cx"), lambda c: sdot(c, F.col(vt)))
        scaled = F.zip_with(
            F.col("cx"), ss, lambda c, sc: F.transform(c, lambda ci: sc * ci)
        )
        s = s.withColumn("__w", vsum(scaled))
        s = s.withColumn(
            vn,
            F.transform(
                F.col("__w"),
                lambda wi: wi / F.sqrt(sdot(F.col("__w"), F.col("__w"))),
            ),
        )
    return s.select("mu", F.col(f"v{iters}").alias("pc"))


def pca_project(
    df: DataFrame,
    model: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project every vector onto the fitted component: pc1 = (x−μ)·pc,
    rounded 4 dp.  Pure per-row arithmetic under a broadcast 1-row model
    — zero corpus shuffles at any scale."""

    def sdot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
        )

    x = F.transform(F.col(vec_col), lambda e: e.cast("double"))
    centered = F.zip_with(x, F.col("mu"), lambda a, b: a - b)
    return df.crossJoin(F.broadcast(model)).select(
        id_col, F.round(sdot(centered, F.col("pc")), 4).alias("pc1")
    )


def rp_project(
    df: DataFrame,
    out_dim: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson-Lindenstrauss random projection to ``out_dim`` components,
    in long form (id, component j, value): y_j = x · R_j with the same
    deterministic md5-derived plane family as the LSH operators (seeded
    'rp<j>|<i>' so the two families never collide).  Pure per-row
    arithmetic — the projection matrix is out_dim × dim literals folded
    per row, no broadcast, no shuffle, no RNG state; distances are
    preserved within the JL bound while ANN/cluster stages downstream
    touch 4× fewer floats."""
    planes = F.transform(
        F.sequence(F.lit(0), F.lit(out_dim - 1)),
        lambda j: F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (
                hex4_to_int(
                    F.md5(
                        F.concat(
                            F.lit("rp"), j.cast("string"), F.lit("|"), i.cast("string")
                        )
                    )
                )
                / F.lit(65536.0)
                - F.lit(0.5)
            ),
        ),
    )
    x = F.transform(F.col(vec_col), lambda e: e.cast("double"))
    d = df.select(id_col, x.alias("__x"), F.posexplode(planes).alias("j", "__r"))
    val = F.aggregate(
        F.zip_with(F.col("__x"), F.col("__r"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return d.select(id_col, "j", F.round(val, 4).alias("val"))


def write_ivf_partitioned(
    df: DataFrame,
    centroids: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "overwrite",
) -> None:
    """Materialize the IVF layout the probe docstrings promise: assign
    every vector to its nearest centroid (broadcast argmin, no shuffle of
    the big side) and write the table PARTITIONED BY ``centroid_id`` —
    one directory per inverted list.  At 100 TB this is the build step a
    deployment runs once per index rebuild; probes then become
    directory-pruned scans (`ivf_partitioned_topk`), reading nprobe/k of
    the corpus from disk instead of filtering it post-scan."""
    ivf_assign(df, centroids, id_col, vec_col).write.mode(mode).partitionBy(
        "centroid_id"
    ).parquet(path)


def ivf_partitioned_topk(
    spark,
    path: str,
    query: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF probe over the materialized layout: the ``nprobe`` nearest
    centroid ids (a bounded driver-side fetch of nprobe scalars — the
    documented scalar-only collect class) become LITERAL partition
    predicates, so Catalyst prunes at the DIRECTORY level
    (`PartitionFilters` in the scan, pinned by
    tests/test_plans.py::test_ivf_partitioned_probe_prunes_directories)
    and only the probed inverted lists are ever read.  Result is
    identical to the in-memory `ivf_ann_topk` with the same
    (centroids, k, nprobe) — equality is part of the same test."""
    nprobe = _resolve_nprobe(nprobe)
    probes = _probe_lists(query, centroids, nprobe, vec_col)
    probe_ids = [int(r["centroid_id"]) for r in probes.collect()]
    scan = spark.read.parquet(path).filter(
        F.col("centroid_id").isin(probe_ids)
    )
    return cosine_topk(scan, query, k, id_col, vec_col)
