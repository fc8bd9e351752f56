"""Multi-seed oracle fuzz sweep (round-10 VERDICT item 7): regenerate
the fuzzable tables with N seeds and run the full driver simulation
(scripts/verify_driver_sim.py — every registered query vs its DuckDB
oracle, exact value compare) against each, so a float-boundary or
order-sensitivity bug that only one regeneration seed exposes (the
round-3 q_curation_pipeline / round-6 order-sensitivity class) is
caught BEFORE the driver regenerates testdata between rounds.

    python scripts/fuzz_sweep.py            # default 3 seeds
    python scripts/fuzz_sweep.py 7 8 9      # explicit seeds

Appends one JSON line per sweep to fuzz_sweep_history.jsonl with the
per-seed fail lists; exits non-zero if any seed failed any id.
"""

import json
import os
import re
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HISTORY = os.path.join(REPO, "fuzz_sweep_history.jsonl")


def run_seed(seed: int) -> dict:
    out_dir = f"/tmp/fuzz_sweep_seed{seed}"
    # a prior sweep's leftovers (stale parquet from an older fixture
    # layout) must never mix generations — start from an empty dir
    shutil.rmtree(out_dir, ignore_errors=True)
    gen = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/fuzz_testdata.py"),
         out_dir, str(seed)],
        capture_output=True,
        text=True,
    )
    if gen.returncode != 0:
        # one seed's generation failure must not abort the sweep —
        # completed seeds' results and the history record still land
        msg = (gen.stdout + gen.stderr)[-200:]
        print(f"seed {seed}: GENERATION FAILED {msg}", flush=True)
        return {
            "seed": seed,
            "checked": 0,
            "fails": [f"<generation-failed: {msg}>"],
            "elapsed_sec": 0.0,
            "returncode": gen.returncode,
        }
    env = dict(os.environ, SPARK_GRAFT_SIM_SF=out_dir)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/verify_driver_sim.py")],
        env=env,
        capture_output=True,
        text=True,
    )
    elapsed = round(time.time() - t0, 1)
    m = re.search(
        r"MARKER SUMMARY checked=(\d+) elapsed=\d+s fails=\[(.*?)\]",
        proc.stdout,
    )
    if m:
        checked = int(m.group(1))
        fails = [f.strip(" '\"") for f in m.group(2).split(",") if f.strip()]
    else:  # sim crashed before the summary line — everything is suspect
        checked = 0
        fails = ["<sim-crashed: " + (proc.stdout + proc.stderr)[-200:] + ">"]
    print(
        f"seed {seed}: checked={checked} fails={fails} ({elapsed}s)",
        flush=True,
    )
    if not fails and proc.returncode == 0:
        # green seed: reclaim the per-seed corpus (~100 MB each); a red
        # seed's data is kept on disk for the fix-and-rerun loop
        shutil.rmtree(out_dir, ignore_errors=True)
    return {
        "seed": seed,
        "checked": checked,
        "fails": fails,
        "elapsed_sec": elapsed,
        "returncode": proc.returncode,
    }


def main() -> None:
    seeds = [int(s) for s in sys.argv[1:]] or [101, 102, 103]
    results = [run_seed(s) for s in seeds]
    record = {
        "metric": "fuzz_sweep",
        "seeds": seeds,
        "results": results,
        "all_green": all(
            not r["fails"] and r["returncode"] == 0 for r in results
        ),
    }
    with open(HISTORY, "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record))
    if not record["all_green"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
