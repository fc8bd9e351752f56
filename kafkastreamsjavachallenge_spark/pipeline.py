"""Fluent corpus-curation pipeline: the user-facing API that composes the
operator modules into one lazily-built DataFrame plan with a provenance
manifest.

A training-data pipeline is a sequence of curation steps — quality gate,
dedup, decontamination, sampling, splitting — each of which exists in this
engine as a standalone operator with its own oracle-checked query id.
``CorpusPipeline`` chains them WITHOUT materializing between steps: every
step contributes to one logical plan, so Catalyst fuses gates into the
scan, shares scans across steps, and the whole pipeline executes with the
same physical shape as the hand-composed q_curation_pipeline (two
exchanges for gate→dedup→split→audit; see tests/test_plans.py).

At 100 TB this matters twice over: no intermediate tables are written
between steps, and the manifest records exactly which steps/parameters
produced a dataset — the provenance a training run needs to be
reproducible.

Example::

    pipe = (CorpusPipeline(docs)
            .quality_filter(min_tokens=10, max_tokens=500, min_ttr=0.2)
            .exact_dedup()
            .neardup_dedup(threshold=0.5)
            .sample(rate_pct=50)
            .split())
    df = pipe.df()            # the composed lazy DataFrame
    pipe.manifest()           # [("quality_filter", {...}), ...]
    pipe.audit()              # per-step retained row counts (runs jobs)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafkastreamsjavachallenge_spark.functions import text as T
from kafkastreamsjavachallenge_spark.operators import dedup as D


def _h28(col):
    return T.base_hash28(col.cast("string"))


class CorpusPipeline:
    """Lazily-composed curation pipeline over a document DataFrame."""

    def __init__(
        self, df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
    ):
        self._df = df
        self._text = text_col
        self._id = id_col
        self._steps: list[tuple[str, dict]] = []
        self._stages: list[tuple[str, DataFrame]] = [("input", df)]

    # ------------------------------------------------------------ steps

    def _push(self, name: str, params: dict, df: DataFrame) -> "CorpusPipeline":
        self._steps.append((name, params))
        self._stages.append((name, df))
        self._df = df
        return self

    def quality_filter(
        self,
        min_tokens: int = 10,
        max_tokens: int = 500,
        min_ttr: float = 0.2,
    ) -> "CorpusPipeline":
        """Token-count bounds + lexical-diversity gate (pure filter —
        fuses into the scan; q_quality_score is the per-doc view)."""
        toks = T.tokens(self._text)
        n = F.size(toks)
        ttr = T.type_token_ratio(toks)
        out = self._df.filter(
            (n >= min_tokens) & (n <= max_tokens) & (ttr >= min_ttr)
        )
        return self._push(
            "quality_filter",
            {"min_tokens": min_tokens, "max_tokens": max_tokens, "min_ttr": min_ttr},
            out,
        )

    def filter(self, predicate, name: str = "filter") -> "CorpusPipeline":
        """Generic predicate gate (a Column or SQL string) — for one-off
        corpus rules that don't warrant a named step (allowed-license
        gates, per-run source blocklists).  Pure filter: fuses into the
        scan like quality_filter; the manifest records the predicate
        text so provenance stays complete."""
        cond = F.expr(predicate) if isinstance(predicate, str) else predicate
        return self._push(
            name, {"predicate": str(cond)}, self._df.filter(cond)
        )

    def exact_dedup(self) -> "CorpusPipeline":
        """One row per distinct content (min-id representative); one
        shuffle on the content digest (q_doc_dedup is the group view)."""
        return self._push(
            "exact_dedup", {}, D.exact_dedup(self._df, self._text, self._id)
        )

    def neardup_dedup(
        self,
        threshold: float = 0.5,
        n_perm: int = 8,
        bands: int = 4,
        rows_per_band: int = 2,
    ) -> "CorpusPipeline":
        """Drop near-duplicates: MinHash→LSH candidates→exact Jaccard
        verify (sub-quadratic end to end, q_neardup_verified's chain);
        of each verified pair the higher id is removed."""
        sigs = D.minhash_signatures(
            self._df, self._text, self._id, n_perm=n_perm
        )
        pairs = D.lsh_candidate_pairs(sigs, self._id, bands, rows_per_band)
        dupes = (
            D.ngram_jaccard(self._df, pairs, self._text, self._id)
            .filter(F.col("jaccard") >= threshold)
            .select(F.col("id_b").alias(self._id))
            .distinct()
        )
        out = self._df.join(dupes, on=self._id, how="left_anti")
        return self._push(
            "neardup_dedup",
            {
                "threshold": threshold,
                "n_perm": n_perm,
                "bands": bands,
                "rows_per_band": rows_per_band,
            },
            out,
        )

    def dedup_against(
        self,
        reference: DataFrame,
        threshold: float = 0.5,
        n_perm: int = 8,
        bands: int = 4,
        rows_per_band: int = 2,
    ) -> "CorpusPipeline":
        """Drop docs near-duplicate to ANY doc in ``reference`` — the
        incremental-crawl step (new crawl deduped against the existing
        training set; operators/dedup.crosscorpus_dedup's shape).  Ids
        must be unique across both inputs."""
        if self._text not in reference.columns:
            raise ValueError(
                f"dedup_against: reference DataFrame has no {self._text!r} "
                f"column (found {reference.columns})"
            )
        out = D.crosscorpus_dedup(
            self._df,
            reference,
            self._text,
            self._id,
            n_perm=n_perm,
            bands=bands,
            rows_per_band=rows_per_band,
            threshold=threshold,
        )
        return self._push(
            "dedup_against",
            {
                "threshold": threshold,
                "n_perm": n_perm,
                "bands": bands,
                "rows_per_band": rows_per_band,
            },
            out,
        )

    def decontaminate(
        self, benchmark: DataFrame, ngram: int = 5
    ) -> "CorpusPipeline":
        """Drop docs sharing any ``ngram``-token shingle with the
        benchmark set (q_decontaminate's shape): benchmark grams are
        small by construction → broadcast semi-join against the corpus
        explode; no pairwise work at any scale."""
        if self._text not in benchmark.columns:
            raise ValueError(
                f"decontaminate: benchmark DataFrame has no {self._text!r} "
                f"column (found {benchmark.columns}); shingling a "
                "non-text column would silently disable decontamination"
            )
        bench_text = self._text
        sh = T.shingles(T.tokens(self._text), ngram)
        bench_sh = T.shingles(T.tokens(bench_text), ngram)
        bench_grams = (
            benchmark.select(F.explode_outer(bench_sh).alias("g"))
            .filter(F.col("g").isNotNull())
            .distinct()
        )
        contaminated = (
            self._df.select(self._id, F.explode_outer(sh).alias("g"))
            .filter(F.col("g").isNotNull())
            .join(F.broadcast(bench_grams), "g", "left_semi")
            .select(self._id)
            .distinct()
        )
        out = self._df.join(contaminated, on=self._id, how="left_anti")
        return self._push("decontaminate", {"ngram": ngram}, out)

    def cap_domains(
        self, domain_col: str = "source", cap: int = 15
    ) -> "CorpusPipeline":
        """Keep at most ``cap`` docs per domain, chosen by deterministic
        md5 rank (q_domain_cap's predicate) — re-runs and backfills
        select the identical subset, hot domains can't dominate the mix."""
        from pyspark.sql import Window

        rk = F.row_number().over(
            Window.partitionBy(domain_col).orderBy(
                F.md5(F.col(self._id).cast("string")), self._id
            )
        )
        out = (
            self._df.withColumn("__rk", rk)
            .filter(F.col("__rk") <= cap)
            .drop("__rk")
        )
        return self._push(
            "cap_domains", {"domain_col": domain_col, "cap": cap}, out
        )

    def remove_dup_spans(self, block: int = 8) -> "CorpusPipeline":
        """Rewrite the text column with corpus-wide duplicated
        ``block``-token spans removed (operators/dedup.remove_dup_spans);
        docs scrubbed to nothing are dropped."""
        cleaned = D.remove_dup_spans(self._df, self._text, self._id, block)
        out = (
            self._df.drop(self._text)
            .join(
                cleaned.filter(F.col("n_blocks_kept") > 0).select(
                    self._id, F.col("cleaned_text").alias(self._text)
                ),
                self._id,
            )
        )
        return self._push("remove_dup_spans", {"block": block}, out)

    def dsir_filter(
        self,
        target: DataFrame,
        min_log_weight: float = 0.0,
        n_buckets: int = 64,
    ) -> "CorpusPipeline":
        """Keep docs whose DSIR importance log-weight against the
        ``target`` corpus meets the threshold (operators/retrieval.py
        dsir_logweights) — hashed-unigram importance-resampling
        selection, Xie et al. 2023."""
        from kafkastreamsjavachallenge_spark.operators.retrieval import (
            dsir_logweights,
        )

        if self._text not in target.columns:
            raise ValueError(
                f"dsir_filter: target DataFrame has no {self._text!r} "
                f"column (found {target.columns})"
            )
        tok = self._df.select(
            self._id, F.lit(False).alias("__tgt"),
            F.explode(T.tokens(self._text)).alias("tok"),
        ).unionByName(
            target.select(
                (-F.monotonically_increasing_id() - 1).alias(self._id),
                F.lit(True).alias("__tgt"),
                F.explode(T.tokens(self._text)).alias("tok"),
            )
        )
        w = dsir_logweights(
            tok, F.col("__tgt"), n_buckets=n_buckets, id_col=self._id
        )
        keep = w.filter(F.col("log_weight") >= min_log_weight).select(self._id)
        out = self._df.join(keep, on=self._id, how="left_semi")
        return self._push(
            "dsir_filter",
            {"min_log_weight": min_log_weight, "n_buckets": n_buckets},
            out,
        )

    def classifier_filter(self, min_margin: int = 0) -> "CorpusPipeline":
        """Keep docs the hashed-bigram linear classifier scores at or
        above ``min_margin`` (q_fasttext_score's integer margin) — the
        fastText-style quality gate; pure scan-side inference, fuses
        into the scan like quality_filter."""
        toks = T.tokens(self._text)
        n1 = F.greatest(F.size(toks) - 1, F.lit(0))
        bgs = F.zip_with(
            F.slice(toks, 1, n1),
            F.slice(toks, 2, n1),
            lambda a, b: F.concat_ws(" ", a, b),
        )
        margin = F.aggregate(
            F.transform(bgs, lambda g: (T.base_hash28(g) % 1024) % 21 - 10),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        out = self._df.filter(margin >= min_margin)
        return self._push("classifier_filter", {"min_margin": min_margin}, out)

    def priority_sample(
        self, k: int = 50, weight_col: str = "n_chars"
    ) -> "CorpusPipeline":
        """Keep the ``k`` docs with highest Duffield priority
        weight/uniform (q_priority_sample's scheme): a deterministic
        weight-proportional sample — top-(k) is a TakeOrdered heap, so
        no global sort at any corpus size."""
        h = _h28(F.col(self._id))
        prio = (F.col(weight_col).cast("double") * F.lit(268435456.0)) / (
            h + F.lit(1)
        ).cast("double")
        out = (
            self._df.withColumn("__prio", prio)
            .orderBy(F.col("__prio").desc(), self._id)
            .limit(k)
            .drop("__prio")
        )
        return self._push(
            "priority_sample", {"k": k, "weight_col": weight_col}, out
        )

    def sample(self, rate_pct: int = 10) -> "CorpusPipeline":
        """Deterministic hash sampling (md5-derived — stable across runs
        and engines, q_sample_hash's predicate)."""
        out = self._df.filter(_h28(F.col(self._id)) % 100 < rate_pct)
        return self._push("sample", {"rate_pct": rate_pct}, out)

    def split(self, train_pct: int = 80, valid_pct: int = 10) -> "CorpusPipeline":
        """Add a deterministic train/valid/test split column — rows never
        migrate between splits as the corpus grows (q_train_test_split)."""
        b = _h28(F.col(self._id)) % 100
        col = (
            F.when(b < train_pct, F.lit("train"))
            .when(b < train_pct + valid_pct, F.lit("valid"))
            .otherwise(F.lit("test"))
        )
        out = self._df.withColumn("split", col)
        return self._push(
            "split", {"train_pct": train_pct, "valid_pct": valid_pct}, out
        )

    def group_split(self, folds: int = 5) -> "CorpusPipeline":
        """Add a group-aware fold column: the fold comes from a portable
        hash of md5(text) — the exact-dup GROUP key — so duplicated
        documents always land in the same fold (q_group_kfold's leakage
        guarantee; hashing the row id instead would leak every dup pair
        across folds)."""
        col = _h28(F.md5(F.col(self._text))) % folds
        out = self._df.withColumn("fold", col.cast("bigint"))
        return self._push("group_split", {"folds": folds}, out)

    def leakage_report(self, shingle_k: int = 3, top: int = 5) -> DataFrame:
        """Shingle-leakage audit of the split() column on the CURRENT
        composed frame (q_split_leakage shape): the ``top`` test docs by
        distinct-k-shingle overlap with the non-test side.  Terminal
        (returns a report DataFrame, not a pipeline stage); requires
        .split() to have run.  The join is the df-bounded inverted-
        shingle shape — test shingles semi-join the distinct non-test
        shingle set, never doc×doc."""
        from pyspark.sql import Window

        from kafkastreamsjavachallenge_spark.operators.dedup import (
            shingled_docs,
        )

        assert "split" in self._df.columns, "leakage_report needs .split()"
        shd = (
            shingled_docs(self._df, self._text, self._id, shingle_k)
            .join(self._df.select(self._id, "split"), self._id)
            .filter(F.size("sh") > 0)
        )
        non_test = (
            shd.filter(F.col("split") != "test")
            .select(F.explode_outer("sh").alias("g"))
            .filter(F.col("g").isNotNull())
            .distinct()
        )
        test_ex = (
            shd.filter(F.col("split") == "test")
            .select(self._id, F.explode_outer("sh").alias("g"))
            .filter(F.col("g").isNotNull())
        )
        shared = (
            test_ex.join(non_test, "g", "left_semi")
            .groupBy(self._id)
            .agg(F.count(F.lit(1)).alias("n_shared"))
        )
        scored = (
            shd.filter(F.col("split") == "test")
            .select(self._id, F.size("sh").cast("bigint").alias("n_shingles"))
            .join(shared, self._id, "left")
            .select(
                self._id,
                "n_shingles",
                F.coalesce(F.col("n_shared"), F.lit(0))
                .cast("bigint")
                .alias("n_shared"),
            )
            .withColumn(
                "shared_bp", F.expr("(n_shared * 10000) div n_shingles")
            )
        )
        w = Window.orderBy(
            F.col("shared_bp").desc(), F.col("n_shared").desc(), self._id
        )
        return scored.select(
            "*", F.row_number().over(w).cast("bigint").alias("rk")
        ).filter(F.col("rk") <= top)

    # ----------------------------------------------------------- access

    def df(self) -> DataFrame:
        """The composed lazy DataFrame (no jobs have run)."""
        return self._df

    def manifest(self) -> list[tuple[str, dict]]:
        """Ordered (step, params) provenance of the composed plan."""
        return list(self._steps)

    def audit(self) -> list[tuple[str, int]]:
        """Row count after each step (runs one count job per stage) —
        the per-step retention funnel a curation run reports."""
        return [(name, df.count()) for name, df in self._stages]

    def funnel_report(self) -> DataFrame:
        """The audit() funnel as ONE composed DataFrame (q_filter_funnel
        shape): per stage in/removed/out counts and an integer
        basis-point removal rate — Spark runs the unioned 1-row counts as
        a single job instead of audit()'s one job per stage."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        parts = [
            df.agg(F.count(F.lit(1)).alias("n_out")).select(
                F.lit(i).alias("stage_idx"),
                F.lit(name).alias("stage"),
                F.col("n_out").cast("bigint").alias("n_out"),
            )
            for i, (name, df) in enumerate(self._stages)
        ]
        u = parts[0]
        for part in parts[1:]:
            u = u.unionByName(part)
        w = Window.orderBy("stage_idx")
        return (
            u.withColumn("n_in", F.lag("n_out").over(w))
            .filter(F.col("stage_idx") > 0)
            .select(
                "stage_idx",
                "stage",
                "n_in",
                (F.col("n_in") - F.col("n_out")).alias("n_removed"),
                "n_out",
                # n_in = 0 (an upstream stage emptied the pipeline) would
                # make DIV yield NULL; report 0-removed-of-0 as rate 0
                F.when(
                    F.col("n_in") > 0,
                    F.expr("((n_in - n_out) * 10000) DIV n_in"),
                )
                .otherwise(F.lit(0))
                .cast("bigint")
                .alias("removal_bp"),
            )
        )
