#!/usr/bin/env python
"""Per-id timing sweep over the registry — the outlier-finding feedback
loop (DESIGN.md "Feedback loops"): run every query (or a subset) at
$SPARK_GRAFT_SF_DIR (default sf0.1) and print one `SWEEP` line per id.

    python scripts/timing_sweep.py                 # everything, one-shot
    python scripts/timing_sweep.py --warm q_a q_b  # warm: median of 3

One-shot timings overstate 2-4x versus warm medians (JVM/session
warm-up) — confirm any apparent outlier with --warm before optimizing
(the q_stream_join lesson: 18s one-shot, 3.9s warm).  Streaming ids are
skipped by default (they execute a full availableNow drain on
construction); pass --streaming to include them.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafkastreamsjavachallenge_spark.queries import registry  # noqa: E402
from kafkastreamsjavachallenge_spark.session import (  # noqa: E402
    EngineConfig,
    build_session,
)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    warm = "--warm" in args
    include_streaming = "--streaming" in args
    ids = [a for a in args if a.startswith("q_")]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(
        EngineConfig(
            master=f"local[{cpus}]",
            shuffle_partitions=int(cpus),
            app_name="timing_sweep",
        )
    )

    reg = registry()
    names = ids or [
        n
        for n in reg
        if include_streaming or not n.startswith("q_stream")
    ]
    out = {}
    for name in names:
        fn, _ = reg[name]
        try:
            runs = []
            n_rows = None
            for i in range(4 if warm else 1):
                t0 = time.time()
                n_rows = fn(spark, sf_dir).count()
                runs.append(time.time() - t0)
            sec = statistics.median(runs[1:]) if warm else runs[0]
            out[name] = round(sec, 3)
            print(f"SWEEP {name} {out[name]} rows={n_rows}", flush=True)
        except Exception as e:  # noqa: BLE001 — sweep must finish
            print(f"SWEEP {name} ERROR {type(e).__name__}: {e}", flush=True)
    ranked = sorted(out.items(), key=lambda kv: -kv[1])
    print("SLOWEST", json.dumps(ranked[:10]))
    print(json.dumps({"sf_dir": sf_dir, "warm": warm, "timings": out}))


if __name__ == "__main__":
    main()
