"""One-switch scale configuration for the bounded-work operator caps.

Round 9's sf1 rehearsal hardened every quadratic-prone path behind an
opt-in kwarg — ``max_df`` (hot-shingle cap on inverted-index self-joins),
``max_bucket`` (LSH degenerate-bucket cap), ``distance_cap`` (banded
thresholded Levenshtein), ``salt_buckets`` (giant-group MaxSim salting),
``max_rounds`` (iterative peel depth).  Each defaults to ``None`` so the
driver's DuckDB oracles see exact semantics.  A 100 TB deployment should
not have to thread five kwargs through every call site: it activates ONE
profile and every cap-aware operator picks its knob up from it.

Resolution order per knob: an explicit kwarg always wins; a ``None``
kwarg falls back to the active profile; the default profile (``EXACT``)
leaves every knob off, so behavior is bit-identical to round 9 unless a
profile is explicitly activated.  Parity on corpora where the caps do
not bind is pinned by tests/test_scale.py::test_scale_profile_parity.

Usage::

    from kafkastreamsjavachallenge_spark import scale
    scale.set_scale_profile(scale.PRODUCTION_100TB)     # process-wide:
    # every thread sees it (Spark drivers commonly submit jobs from
    # multiple threads — the deployment switch must not silently miss
    # a thread pool's workers).
    # or scoped (THREAD-local — safe for concurrent test harnesses;
    # other threads are unaffected):
    with scale.scale_profile(scale.PRODUCTION_100TB):
        q_edit_distance(spark, sf_dir)                  # caps active

``set_scale_profile`` writes a module-level process-wide default;
``scale_profile(...)`` pushes a thread-local override on top of it.
``get_scale_profile`` reads: thread-local override > process default
> ``EXACT``.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from dataclasses import dataclass


@dataclass(frozen=True)
class ScaleProfile:
    """Per-deployment values for the bounded-work caps.  ``None`` = knob
    off (exact semantics).  See the consuming operator's docstring for
    each knob's precise contract and the measured rehearsal numbers."""

    #: hot-shingle document-frequency cap for inverted-index self-joins
    #: (operators/dedup.py exact_neardup_pairs*, queries q_containment /
    #: q_dedup_recall).  Bounds join work by Σ_{df<=cap} df².
    max_df: int | None = None
    #: LSH band-bucket population cap (operators/dedup.py
    #: lsh_candidate_pairs): a non-discriminative bucket of n docs emits
    #: n² candidate rows; buckets above the cap are dropped pre-join.
    max_bucket: int | None = None
    #: banded-Levenshtein threshold (queries/llm.py q_edit_distance):
    #: O(cap·len) per pair instead of O(len²); beyond-cap pairs report
    #: dist=max_len, sim_bp=0.
    distance_cap: int | None = None
    #: MaxSim giant-group salting (operators/retrieval.py
    #: maxsim_pandas): partial-max splits per (group, salt).
    salt_buckets: int | None = None
    #: iterative peel depth for k-core (operators/graph.py kcore);
    #: ``None`` keeps each operator's own default.
    max_rounds: int | None = None
    #: SemDeDup centroids per corpus row (operators/similarity.py
    #: semdedup_pandas): at scale the cluster SIZE is the knob, not the
    #: cluster count, so k must grow with n — k = max(16, int(n *
    #: k_per_n)) keeps Σ|c|² ~ n / k_per_n.  When set it supersedes a
    #: caller-supplied fixed centroid set (that set's size is the
    #: quadratic hazard the knob exists to remove).
    semdedup_k_per_n: float | None = None
    #: IVF probe width for the registered ANN queries (queries/llm.py
    #: q_ann_ivf / q_ann_ivfpq* — resolved at query construction) and
    #: for operator callers passing ``nprobe=None``
    #: (operators/similarity.py ivf_ann_topk / ivfpq_ann_topk*).
    ann_nprobe: int | None = None
    #: refine-retrieval candidate width — how many ADC-ranked rows the
    #: exact cosine re-rank touches (queries/llm.py q_ann_pq_refine /
    #: q_ann_ivfpq_refine).
    ann_refine_width: int | None = None


#: exact semantics everywhere — the default, and what the driver's
#: oracle comparison runs under.
EXACT = ScaleProfile()

#: the values the sf1 (10x/100x) rehearsal measured as restoring
#: near-linear growth on saturated/degenerate corpora while not binding
#: on healthy ones (scripts/scale_rehearsal.py): max_df=100 bounded the
#: Σdf² joins (q_containment 2.2x growth), max_bucket=50 +
#: distance_cap=512 took the Levenshtein verify from 34x to 3.0x,
#: salting splits a corpus-share group across 32 tasks, and 16 peel
#: rounds covers 2x the depth any rehearsal graph needed.
PRODUCTION_100TB = ScaleProfile(
    max_df=100,
    max_bucket=50,
    distance_cap=512,
    salt_buckets=32,
    max_rounds=16,
    # SemDeDup's real contract (k scales with n; the rehearsal measured
    # k = n/100 keeping Σ|c|² ~ n·100 at 2.3x growth on the BLAS path)
    semdedup_k_per_n=0.01,
    # wider coarse probes + a wider exact-re-rank stage: at 100 TB the
    # inverted lists are corpus-scaled, so recall needs more of them,
    # and the refine tail stays O(width) = 200 rows regardless of corpus
    ann_nprobe=8,
    ann_refine_width=200,
)

#: process-wide default, set by ``set_scale_profile`` — the deployment
#: switch; visible to EVERY thread (Spark drivers commonly submit jobs
#: from thread pools).
_default: ScaleProfile = EXACT

#: thread-local override stack, used by the ``scale_profile`` context
#: manager — scoped activations must not leak across concurrently
#: running threads (e.g. parallel test workers).
_local = threading.local()


def get_scale_profile() -> ScaleProfile:
    """The active profile: thread-local override > process-wide default
    (``set_scale_profile``) > ``EXACT``."""
    local = getattr(_local, "profile", None)
    return _default if local is None else local


def set_scale_profile(profile: ScaleProfile) -> None:
    """Set the PROCESS-WIDE default profile (all threads see it unless
    they hold a scoped ``scale_profile`` override)."""
    global _default
    _default = profile


@contextmanager
def scale_profile(profile: ScaleProfile):
    """Scoped THREAD-local activation — restores the prior state on
    exit; concurrent threads are unaffected."""
    prev = getattr(_local, "profile", None)
    _local.profile = profile
    try:
        yield profile
    finally:
        _local.profile = prev


def resolve(value, knob: str):
    """Explicit kwarg wins; ``None`` falls back to the active profile."""
    if value is not None:
        return value
    return getattr(get_scale_profile(), knob)
