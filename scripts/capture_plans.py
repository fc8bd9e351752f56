#!/usr/bin/env python
"""Capture .explain("formatted") for headline (or named) batch ids into
plans/<tag>/<id>_<suffix>.txt — the before/after evidence files an
optimization round commits alongside the code.

    python scripts/capture_plans.py r12 before            # all batch headline ids
    python scripts/capture_plans.py r12 after q_kcore ... # named ids only

Streaming ids are skipped (construction drains a real stream; their
"plan" is the micro-batch runtime's, not a comparable batch plan).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from kafkastreamsjavachallenge_spark.queries import queries  # noqa: E402
from kafkastreamsjavachallenge_spark.session import (  # noqa: E402
    EngineConfig,
    build_session,
)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r12"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = [a for a in sys.argv[3:] if a.startswith("q_")]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = build_session(
        EngineConfig(
            app_name="capture-plans",
            master=f"local[{cpus}]",
            shuffle_partitions=int(cpus),
        )
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    targets = names or [n for n in HEADLINE if not n.startswith("q_stream")]
    for name in targets:
        if name.startswith("q_stream"):
            print(f"SKIP {name} (streaming)")
            continue
        try:
            df = qs[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:
            txt = f"ERROR {type(exc).__name__}: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"WROTE {path} ({len(txt)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
