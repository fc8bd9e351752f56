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
    scale.set_scale_profile(scale.PRODUCTION_100TB)     # process-wide
    # or scoped:
    with scale.scale_profile(scale.PRODUCTION_100TB):
        q_edit_distance(spark, sf_dir)                  # caps active
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
)

_local = threading.local()


def get_scale_profile() -> ScaleProfile:
    """The active profile (thread-local, defaulting to ``EXACT``)."""
    return getattr(_local, "profile", EXACT)


def set_scale_profile(profile: ScaleProfile) -> None:
    _local.profile = profile


@contextmanager
def scale_profile(profile: ScaleProfile):
    """Scoped activation — restores the prior profile on exit."""
    prev = get_scale_profile()
    set_scale_profile(profile)
    try:
        yield profile
    finally:
        set_scale_profile(prev)


def resolve(value, knob: str):
    """Explicit kwarg wins; ``None`` falls back to the active profile."""
    if value is not None:
        return value
    return getattr(get_scale_profile(), knob)
