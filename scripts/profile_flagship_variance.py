"""Round-11 VERDICT item 3: profile q_unique_users' sample-to-sample
spread — the flagship was one of only 4 high_variance ids on the final
r11 record (trimmed spread 0.626 of a 1.07 s median) and should be the
most stable plan in the suite.

For N interleaved-style samples this records, per sample:
  - wall seconds
  - JVM GC time delta (driver JVM == executor JVM in local mode)
  - shuffle bytes written + records (via StatusTracker stage metrics is
    not exposed in PySpark; we use the REST-less executor metrics from
    the SparkContext status APIs where available, else GC only)
  - system-wide io-wait + idle tick deltas (/proc/stat)

Run on a QUIET box:  python scripts/profile_flagship_variance.py [id] [n]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cpu_ticks():
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    return sum(vals), vals[3], vals[4]


def main() -> None:
    qid = sys.argv[1] if len(sys.argv) > 1 else "q_unique_users"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from kafkastreamsjavachallenge_spark.session import EngineConfig, build_session
    from kafkastreamsjavachallenge_spark.queries import queries

    spark = build_session(
        EngineConfig(
            app_name="flagship-variance-profile",
            master=f"local[{cpus}]",
            shuffle_partitions=int(cpus),
        )
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()

    jvm = spark._jvm
    rt = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()

    def gc_ms() -> int:
        it = rt.iterator()
        total = 0
        while it.hasNext():
            total += it.next().getCollectionTime()
        return total

    def run_once() -> float:
        t0 = time.time()
        qs[qid](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    run_once()  # warmup (codegen, page cache, broadcast)
    samples = []
    for i in range(n):
        g0, (t0, i0, w0) = gc_ms(), cpu_ticks()
        wall = run_once()
        g1, (t1, i1, w1) = gc_ms(), cpu_ticks()
        samples.append(
            {
                "i": i,
                "wall": round(wall, 3),
                "gc_ms": g1 - g0,
                "busy_ticks": (t1 - t0) - (i1 - i0),
                "iowait_ticks": w1 - w0,
            }
        )
        print(json.dumps(samples[-1]), flush=True)
    walls = sorted(s["wall"] for s in samples)
    print(
        json.dumps(
            {
                "id": qid,
                "n": n,
                "min": walls[0],
                "median": walls[len(walls) // 2],
                "max": walls[-1],
                "spread_rel": round(
                    (walls[-1] - walls[0]) / walls[len(walls) // 2], 3
                ),
                "gc_total_ms": sum(s["gc_ms"] for s in samples),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
