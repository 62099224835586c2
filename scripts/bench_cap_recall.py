"""Measure the derived band-bucket cap's cost/benefit on an adversarial
boilerplate corpus (the shape `max_bucket_size` exists for): every doc
shares a 400-char header, so the dominant per-band min-hash slice is one
corpus-wide bucket and the uncapped candidate join goes quadratic.
Reports candidates + wall with the cap off vs derived, and recall of the
planted near-dup pairs under the cap (the 'true pairs still meet in
sharper buckets' claim, measured).

Usage: python scripts/bench_cap_recall.py [n_noise] [n_planted]
  (defaults 20000 200)
"""

from __future__ import annotations

import json
import os
import random
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from neo4j_graphrag_python_spark.operators.dedup import (  # noqa: E402
    derived_bucket_cap,
    minhash_dedup_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
)
from neo4j_graphrag_python_spark.session import build_spark  # noqa: E402


def corpus(n_noise: int, n_planted: int):
    rng = random.Random(7)
    letters = "abcdefghijklmnopqrstuvwxyz "
    boiler = "".join(rng.choice(letters) for _ in range(400))
    rows = []
    for i in range(n_noise):
        tail = "".join(rng.choice(letters) for _ in range(180))
        rows.append((i, boiler + tail))
        if i < n_planted:
            t = list(tail)
            for p in (40, 90, 140):
                t[p] = "q" if t[p] != "q" else "z"
            rows.append((1_000_000 + i, boiler + "".join(t)))
    return rows, {(i, 1_000_000 + i) for i in range(n_planted)}


def main() -> None:
    n_noise = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_planted = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(
        "bench-cap", master=f"local[{cpus}]", shuffle_partitions=2 * cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows, planted = corpus(n_noise, n_planted)
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).localCheckpoint()
    n = len(rows)
    cap = derived_bucket_cap(n)

    sigs = minhash_signatures(docs, num_hashes=96).localCheckpoint()
    # price the candidate join from bucket sizes (Σ C(m,2) per band =
    # EXACT pre-dedup join output) — actually RUNNING the uncapped join
    # at this corpus means ~10⁹ output rows and tens of GB of
    # distinct-shuffle spill (measured filling the disk), which is the
    # point being demonstrated, not a number worth paying for twice
    from pyspark.sql import functions as F

    rows_per_band = 96 // 32
    banded = sigs.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(31)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.slice(
                            "sig", (b * rows_per_band + 1).cast("int"),
                            rows_per_band,
                        ).cast("string")
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("bb.band", "bb.bucket")
    sizes = banded.groupBy("band", "bucket").count()
    agg = sizes.agg(
        F.sum(F.expr("count*(count-1)/2")).alias("off"),
        F.sum(
            F.when(F.col("count") <= cap, F.expr("count*(count-1)/2")).otherwise(
                F.lit(0)
            )
        ).alias("on"),
        F.max("count").alias("max_bucket"),
    ).collect()[0]
    cand_off, cand_on = int(agg["off"]), int(agg["on"])
    max_bucket = int(agg["max_bucket"])
    t0 = time.time()
    cand_on_real = minhash_lsh_pairs(
        sigs, bands=32, max_bucket_size=cap
    ).count()
    wall_cand_on = round(time.time() - t0, 2)

    def run(cap_arg):
        t0 = time.time()
        got = {
            (r["id_a"], r["id_b"])
            for r in minhash_dedup_pairs(
                docs,
                num_hashes=96,
                bands=32,
                jaccard_threshold=0.7,
                max_bucket_size=cap_arg,
            ).collect()
        }
        return got, round(time.time() - t0, 2)

    got_on, wall_on = run("auto")
    # NO uncapped e2e at this scale — the est-prefilter join would ship
    # candidates × two 96-long signatures (~1.5 kB/row × ~10⁸ rows of
    # boiler-bucket flood = tens of GB of spill; measured filling the
    # disk).  The cap only ever REMOVES buckets, so capped ⊆ uncapped:
    # planted recall under the cap is the number that can regress, and
    # candidates_cap_off above already prices the uncapped plan.
    recall_on = len(planted & got_on) / len(planted)
    print(
        json.dumps(
            {
                "docs": n,
                "planted_pairs": n_planted,
                "derived_cap": cap,
                "join_volume_cap_off": cand_off,
                "join_volume_cap_on": cand_on,
                "max_bucket_size_seen": max_bucket,
                "candidates_cap_on": cand_on_real,
                "candidate_wall_on_s": wall_cand_on,
                "e2e_wall_cap_on_s": wall_on,
                "planted_recall_cap_on": recall_on,
                "pairs_cap_on": len(got_on),
                "loadavg_1m": round(os.getloadavg()[0], 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
