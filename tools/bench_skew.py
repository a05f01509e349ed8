"""Skew evidence: salted vs naive canonicalization on a hot-key corpus.

Builds a mention table where one entity ('spark') carries ~50% of all
mentions (far hotter than the generator's 20%), then times the two
aggregation strategies of kg.canonicalize and reports per-partition row
counts of the first shuffle — the salted plan's phase-1 spreads the hot
key over `salt` reducers, the naive plan funnels it to one.

Run: python tools/bench_skew.py [n_mentions]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    spark = (SparkSession.builder.master("local[32]")
             .appName("skew-bench")
             .config("spark.sql.shuffle.partitions", "64")
             # isolate the salting effect from AQE's own skew handling
             .config("spark.sql.adaptive.enabled", "false")
             .config("spark.driver.memory", "24g")
             .config("spark.ui.enabled", "false").getOrCreate())
    from versa_spark.kg import canonicalize

    h = F.abs(F.xxhash64("id"))
    ent = F.when(h % 2 == 0, F.lit("spark")).otherwise(
        F.concat(F.lit("e"), (h % 1000)))
    mentions = spark.range(n).select(
        F.concat(F.lit("conv-"), (F.col("id") % 200000)).alias("conv_id"),
        (F.col("id") % 25).cast("int").alias("turn_idx"),
        F.concat(F.lit("http://x/t/"), F.col("id")).alias("turn_iri"),
        ent.alias("canonical"),
        F.concat(F.lit("http://x/e/"), ent).alias("entity_iri"),
    ).persist()
    mentions.count()

    results = {}
    for salted in (False, True):
        best = None
        for _ in range(2):
            t0 = time.time()
            canonicalize.entity_mention_counts(
                mentions, salted=salted, salt=32).count()
            w = time.time() - t0
            best = w if best is None or w < best else best
        results["salted" if salted else "naive"] = round(best, 3)

    # shuffle-balance evidence: rows per reducer key-group in phase 1
    naive_max = (mentions.groupBy("entity_iri").count()
                 .agg(F.max("count")).first()[0])
    salted_max = (mentions
                  .withColumn("_salt", F.pmod(
                      F.xxhash64("conv_id", "turn_idx"), F.lit(32)))
                  .groupBy("entity_iri", "_salt").count()
                  .agg(F.max("count")).first()[0])
    out = {
        "metric": "skew_canonicalization",
        "n_mentions": n,
        "hot_share": 0.5,
        "wall_s": results,
        "speedup": round(results["naive"] / results["salted"], 2),
        "max_rows_single_reducer_key": {
            "naive": naive_max, "salted": salted_max,
            "reduction": round(naive_max / salted_max, 1)},
    }
    print(json.dumps(out, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
