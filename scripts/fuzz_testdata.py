"""Regenerate sf0.01-shaped `documents`, `embeddings`, `events`, `orders`
and `lineitem` tables with an arbitrary seed, symlinking the remaining
(tiny, static-domain) tables from the real sf0.01 dir.

The driver regenerates testdata between rounds, so any oracle whose gate
sits on a float boundary can pass on one seed and fail on the next
(exactly what happened to q_curation_pipeline in round 3).  This script
makes that failure mode testable locally:

    python scripts/fuzz_testdata.py /tmp/fuzz_seed7 7
    SPARK_GRAFT_SIM_SF=/tmp/fuzz_seed7 python scripts/verify_driver_sim.py \
        q_curation_pipeline q_ann_pq q_kmeans ...

Adversarial by construction: plants docs EXACTLY on the 0.2 TTR gate
(5*distinct == total), exact duplicate texts (dedup min-id path), exact
duplicate embedding vectors and near-equidistant vectors (argmin
tie-break path the ** 2 / x*x ulp bug could flip).

Deliberately NOT generated: NULL text.  FIXTURES.md pins `text` as
non-null space-separated tokens — the driver's generator has never
produced NULL text, and the ~80 text oracles are written against that
contract (a NULL row would surface engine-default divergences like
Spark NULLS FIRST vs DuckDB NULLS LAST in every ORDER BY, none of which
the driver can hit).  Out-of-contract NULL behavior is instead pinned
where it is a semantic choice: q_fasttext_score coalesces to the empty
document (total function), q_curriculum's ntile orders NULLS LAST
explicitly on both engines, and tests/test_robustness.py sweeps every
registered id over fully-nulled tables for crash-freedom.
"""
import os
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REAL = "/root/testdata/sf0.01"
VOCAB = (
    "key agg row scan slow fast table value part hash merge batch spark "
    "window order data column join small line customer query the a big "
    "filter sort group stream vector"
).split()
LANGS = ["en", "en", "en", "zh", "es", "fr", "de"]


def gen_documents(rng: random.Random, n: int = 500) -> pa.Table:
    rows = []
    for i in range(n):
        kind = rng.random()
        if kind < 0.06:
            # exact TTR boundary: d distinct tokens repeated to 5*d total
            d = rng.randint(2, 6)
            words = rng.sample(VOCAB, d) * 5
            rng.shuffle(words)
        elif kind < 0.12:
            # just below the gate: d distinct in 5*d + 1 tokens
            d = rng.randint(2, 6)
            words = rng.sample(VOCAB, d) * 5 + [rng.choice(VOCAB[:d])]
            rng.shuffle(words)
        elif kind < 0.18 and rows:
            # exact duplicate of an earlier doc (dedup keeps min doc_id)
            words = rows[rng.randrange(len(rows))][1].split()
        elif kind < 0.20:
            # adversarial unicode (cross-engine UTF-8 hashing/tokenizing)
            words = rng.sample(
                ["café", "日本語", "\U0001F600", "straße", "שלום", "∑"], 3
            ) + [rng.choice(VOCAB) for _ in range(rng.randint(5, 30))]
            rng.shuffle(words)
        elif kind < 0.22:
            # long document (linear-time guard for the HOF text paths)
            words = [rng.choice(VOCAB) for _ in range(rng.randint(3000, 8000))]
        else:
            words = [rng.choice(VOCAB) for _ in range(rng.randint(8, 100))]
        text = " ".join(words)
        rows.append((i, text, rng.choice(LANGS), f"src{i % 20}", len(text)))
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


def gen_embeddings(seed: int, n: int = 500, dim: int = 64) -> pa.Table:
    rs = np.random.RandomState(seed)
    vecs = rs.randn(n, dim).astype(np.float32)
    # exact duplicates: equidistant to every centroid -> argmin tie-break
    for i in range(20, n, 47):
        vecs[i] = vecs[i - 1]
    # vectors exactly midway between two early vectors (centroid seeds)
    for i in range(30, n, 61):
        vecs[i] = ((vecs[1] + vecs[2]) / 2).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([int(i % 8) for i in range(n)], pa.int32()),
        }
    )


def gen_events(rng: random.Random, n: int = 10_000) -> pa.Table:
    """sf0.01-shaped events: ~1-month horizon, JSON props, a few exact
    duplicate (ts, user) collisions (dedup/window boundary paths)."""
    types = ["click", "view", "purchase", "signup", "error"]
    base_us = 1_704_067_200_000_000  # 2024-01-01 UTC in microseconds
    rows = []
    for i in range(n):
        ts = base_us + rng.randrange(30 * 24 * 3600 * 1_000_000)
        rows.append(
            (
                i,
                ts,
                rng.randrange(200),
                rng.choice(types),
                round(rng.uniform(0, 20), 2),
                '{"k": %d}' % rng.randrange(100),
            )
        )
    rows.sort(key=lambda r: r[1])
    # duplicate ts+user collisions: every 500th event clones its neighbor
    rows = [
        r if i % 500 != 1 else (r[0],) + rows[i - 1][1:]
        for i, r in enumerate(rows)
    ]
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [r[1] for r in rows], pa.timestamp("us")
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )


def gen_orders(rng: random.Random, n: int = 15_000) -> pa.Table:
    """sf0.01-shaped orders: same domains as the real generator (status
    P/O/F, five priorities, 1995-2001 dates, 2-decimal prices, custkey
    0..1499) under an arbitrary seed — shakes out value-specific
    assumptions in the TPC-H-shape oracles, which the documents/events
    fuzz never touches."""
    statuses = ["P", "O", "F"]
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    base_us = 788_918_400_000_000  # 1995-01-01 UTC in microseconds
    day_us = 86_400 * 1_000_000
    rows = [
        (
            i,
            rng.randrange(1500),
            rng.choice(statuses),
            round(rng.uniform(1000.0, 500000.0), 2),
            base_us + rng.randrange(2400) * day_us,
            rng.choice(prios),
        )
        for i in range(n)
    ]
    return pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderstatus": pa.array([r[2] for r in rows], pa.string()),
            "o_totalprice": pa.array([r[3] for r in rows], pa.float64()),
            "o_orderdate": pa.array([r[4] for r in rows], pa.timestamp("us")),
            "o_orderpriority": pa.array([r[5] for r in rows], pa.string()),
        }
    )


def gen_lineitem(rng: random.Random, n_orders: int = 15_000, n: int = 60_000) -> pa.Table:
    """sf0.01-shaped lineitem: FK-consistent orderkeys, integer-valued
    quantities 1..50, 11-step discounts, A/N/R x F/O flags, 1995-2001
    ship dates — the domains every TPC-H-shape oracle filters on.
    Lineitems are generated PER ORDER with linenumbers 1..k, mirroring
    the real generator's (l_orderkey, l_linenumber) composite primary
    key — independent draws produced duplicate pairs, so fuzz runs never
    faithfully exercised oracles that lean on that uniqueness."""
    flags = ["A", "N", "R"]
    stats = ["F", "O"]
    base_us = 788_918_400_000_000 + 86_400 * 1_000_000
    day_us = 86_400 * 1_000_000
    # draw a 1..7 line count per order, then nudge random orders until the
    # total is exactly n — every order keeps >= 1 line, every
    # (l_orderkey, l_linenumber) pair is unique by construction
    if n < n_orders:
        raise ValueError(
            f"n={n} < n_orders={n_orders}: every order keeps >= 1 lineitem, "
            "so the total cannot shrink below the order count"
        )
    if n > 7 * n_orders:
        raise ValueError(
            f"n={n} > 7*n_orders={7 * n_orders}: linenumbers stay in the "
            "real generator's 1..7 domain, so each order holds <= 7 lines"
        )
    counts = [rng.randint(1, 7) for _ in range(n_orders)]
    total = sum(counts)
    while total < n:
        # only top up orders still under 7 lines — keeps l_linenumber in
        # the TPC-H 1..7 domain that domain-sensitive oracles assume
        i = rng.randrange(n_orders)
        if counts[i] < 7:
            counts[i] += 1
            total += 1
    while total > n:
        i = rng.randrange(n_orders)
        if counts[i] > 1:
            counts[i] -= 1
            total -= 1
    rows = []
    for orderkey, k in enumerate(counts):
        for linenumber in range(1, k + 1):
            rows.append(
                (
                    orderkey,
                    rng.randrange(2000),
                    rng.randrange(100),
                    linenumber,
                    float(rng.randint(1, 50)),
                    round(rng.uniform(900.0, 105000.0), 2),
                    rng.randrange(11) / 100.0,
                    rng.randrange(9) / 100.0,
                    rng.choice(flags),
                    rng.choice(stats),
                    base_us + rng.randrange(2450) * day_us,
                )
            )
    return pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            "l_suppkey": pa.array([r[2] for r in rows], pa.int64()),
            "l_linenumber": pa.array([r[3] for r in rows], pa.int32()),
            "l_quantity": pa.array([r[4] for r in rows], pa.float64()),
            "l_extendedprice": pa.array([r[5] for r in rows], pa.float64()),
            "l_discount": pa.array([r[6] for r in rows], pa.float64()),
            "l_tax": pa.array([r[7] for r in rows], pa.float64()),
            "l_returnflag": pa.array([r[8] for r in rows], pa.string()),
            "l_linestatus": pa.array([r[9] for r in rows], pa.string()),
            "l_shipdate": pa.array([r[10] for r in rows], pa.timestamp("us")),
        }
    )


def main() -> None:
    out, seed = sys.argv[1], int(sys.argv[2])
    # optional size multiplier: catches hidden size assumptions (fixed
    # top-k constants, bounded-block filters) under a differently-sized
    # regeneration, not just a differently-seeded one
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    os.makedirs(out, exist_ok=True)
    rng = random.Random(seed)
    pq.write_table(
        gen_documents(rng, n=500 * mult), os.path.join(out, "documents.parquet")
    )
    pq.write_table(
        gen_embeddings(seed, n=500 * mult), os.path.join(out, "embeddings.parquet")
    )
    pq.write_table(
        gen_events(rng, n=10_000 * mult), os.path.join(out, "events.parquet")
    )
    pq.write_table(
        gen_orders(rng, n=15_000 * mult), os.path.join(out, "orders.parquet")
    )
    pq.write_table(
        gen_lineitem(rng, n_orders=15_000 * mult, n=60_000 * mult),
        os.path.join(out, "lineitem.parquet"),
    )
    for t in "region nation customer supplier part".split():
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(REAL, f"{t}.parquet"), dst)
    print(f"fuzz testdata seed={seed} -> {out}")


if __name__ == "__main__":
    main()
