"""Unit pins for bench.py's measurement gates (no Spark needed).

Round-10 VERDICT item 2: the absolute ±25% variance gate flagged up to
half the headline ids whenever the host's minutes-scale drift widened
every spread together, so it distinguished nothing.  The drift-relative
gate must (a) stay quiet on a uniformly-drifty run, (b) still flag a
genuinely unstable (sleep-jittered) query, and (c) keep the old
behavior on a calm run with one noisy id.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


def test_variance_gate_quiet_on_uniform_host_drift():
    """r10's failure mode: EVERY id's spread widened to 0.3-0.8 by the
    same host drift (round_drift max_factor 3.6).  The old gate flagged
    23/46; the drift-relative gate must flag none of them — no id is an
    outlier against the cross-id median."""
    spreads = {f"q{i}": 0.3 + 0.01 * i for i in range(46)}  # 0.30..0.75
    abs_spread = {n: 1.0 for n in spreads}  # all past the 0.3s floor
    assert bench._variance_gate(spreads, abs_spread) == []


def test_variance_gate_flags_injected_jitter():
    """A deliberately unstable query (sleep-jittered: spread ~2x its
    median) must flag against both a calm and a drifty background."""
    calm = {f"q{i}": 0.05 + 0.002 * i for i in range(45)}
    drifty = {f"q{i}": 0.25 + 0.005 * i for i in range(45)}
    for background in (calm, drifty):
        spreads = dict(background)
        spreads["q_jittered"] = 2.0
        abs_spread = {n: 0.5 for n in spreads}
        assert bench._variance_gate(spreads, abs_spread) == ["q_jittered"]


def test_variance_gate_keeps_absolute_floors():
    """Sub-second percentage jitter (abs spread <= 0.3s) and spreads
    under the 25% floor never flag, however extreme relative to a tiny
    cross-id median."""
    spreads = {f"q{i}": 0.01 for i in range(40)}
    spreads["q_small_abs"] = 0.9  # huge relative spread...
    abs_spread = {n: 0.05 for n in spreads}  # ...but 50ms absolute
    assert bench._variance_gate(spreads, abs_spread) == []
    spreads2 = {f"q{i}": 0.02 for i in range(40)} | {"q_under": 0.2}
    abs2 = {n: 1.0 for n in spreads2}
    assert bench._variance_gate(spreads2, abs2) == []  # 0.2 < 0.25 floor
    assert bench._variance_gate({}, {}) == []


def test_regressions_normalize_by_host_speed():
    """Round-11 VERDICT item 5: the regression report must compare
    HOST-SPEED-NORMALIZED medians.  A 1.3x raw slowdown whose
    calibration drifted 1.3x alongside it (speed=1.3 vs prior 1.0) is
    host decay — neither regressed NOR noisy; the identical raw move on
    a calm anchor (speed=1.0) still flags (noisy on an identical plan,
    regressed on a changed one)."""
    prior = {
        "queries_median": {"q_x": 1.0},
        "plans": {"q_x": "aaa"},
        "host_speed_factor": 1.0,
    }
    medians = {"q_x": 1.3}

    drifted = bench._regressions(prior, medians, {"q_x": "aaa"}, {}, speed=1.3)
    assert drifted["regressed"] == [] and drifted["noisy"] == []

    calm_same_plan = bench._regressions(
        prior, medians, {"q_x": "aaa"}, {}, speed=1.0
    )
    assert calm_same_plan["noisy"] == ["q_x:1.0->1.3"]
    assert calm_same_plan["regressed"] == []

    calm_new_plan = bench._regressions(
        prior, medians, {"q_x": "bbb"}, {}, speed=1.0
    )
    assert calm_new_plan["regressed"] == ["q_x:1.0->1.3"]
    assert calm_new_plan["noisy"] == []


def test_regressions_normalize_prior_side_too():
    """A prior record taken on a slow host (factor 1.3) must not make a
    calm-host run read as an improvement: raw 1.3 -> 1.0 with the prior
    normalized to 1.0 is flat.  Pre-anchor records (no host_speed_factor)
    normalize by 1.0."""
    prior = {
        "queries_median": {"q_x": 1.3},
        "plans": {"q_x": "aaa"},
        "host_speed_factor": 1.3,
    }
    flat = bench._regressions(prior, {"q_x": 1.0}, {"q_x": "aaa"}, {}, speed=1.0)
    assert flat["improved"] == [] and flat["noisy"] == []

    legacy = {"queries_median": {"q_x": 1.0}, "plans": {"q_x": "aaa"}}
    out = bench._regressions(legacy, {"q_x": 1.3}, {"q_x": "aaa"}, {}, speed=1.0)
    assert out["noisy"] == ["q_x:1.0->1.3"]


def test_stream_tap_rates_are_per_batch_medians():
    """The tap must report the MEDIAN of per-micro-batch rates over
    committed samples only: discarded (stalled) samples and zero-row /
    zero-duration ticks contribute nothing, and one slow outlier batch
    cannot move the number (the r10 totals-ratio did: 53k vs 70k rows/s
    on identical plans)."""
    import types

    tap = object.__new__(_tap_class())
    tap.key = None
    tap.buf = []
    tap.acc = {}
    tap.GRACE_SEC = 0.0  # no sleep in unit tests

    def progress(rows, ms):
        ev = types.SimpleNamespace(
            progress=types.SimpleNamespace(
                numInputRows=rows, durationMs={"triggerExecution": ms}
            )
        )
        tap.onQueryProgress(ev)

    # sample 1: steady 1000 rows / 100 ms batches (10k rows/s) plus one
    # 10x-slow outlier batch and spin-up/drain ticks
    tap.begin("q_stream_x")
    for _ in range(4):
        progress(1000, 100)
    progress(1000, 1000)  # outlier (1k rows/s)
    progress(0, 50)  # drain tick: no rows
    progress(10, 0)  # zero-duration tick
    tap.commit()
    # sample 2: stalled -> discarded, must not depress the rate
    tap.begin("q_stream_x")
    progress(1000, 5000)
    tap.discard()
    # events with no open sample are dropped
    progress(999999, 1)

    rates, peaks, counts = tap.rates()
    assert rates == {"q_stream_x": 10000.0}  # median rejects the outlier
    assert peaks == {"q_stream_x": 10000.0}  # peak = best steady batch
    assert counts == {"q_stream_x": 5}


def _tap_class():
    """Build the real _Tap class without a SparkSession: reuse
    bench._install_progress_tap's closure by instantiating against a
    stub spark whose listener registration captures the instance."""
    captured = {}

    class _Streams:
        def addListener(self, tap):
            captured["tap"] = tap

    class _Spark:
        streams = _Streams()

    tap = bench._install_progress_tap(_Spark())
    assert tap is not None
    return type(tap)
