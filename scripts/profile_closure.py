"""Phase-level timing of near_dup_sampling_weights (round-10 opt round).

Times, with a warm run first per phase shape (the bench's discard-run-0
discipline): pair generation, edge/label init, each closure round, and
the final membership join.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from code_challenge___data_engineer___machinemax_spark.session import get_spark  # noqa: E402
from code_challenge___data_engineer___machinemax_spark.tables import load_table  # noqa: E402
from code_challenge___data_engineer___machinemax_spark.operators.dedup import near_dup_pairs  # noqa: E402


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"{time.perf_counter() - t0:7.3f}  {label}")
    return out


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-closure")
    d = load_table(spark, sf_dir, "documents")
    # warm: full query once
    from code_challenge___data_engineer___machinemax_spark import plans
    q = plans.all_queries()["near_dup_sampling_weights"]
    t("warm full query (run 0)", lambda: q(spark, sf_dir).collect())
    t("timed full query (run 1)", lambda: q(spark, sf_dir).collect())

    # phase breakdown (fresh lineage, post-warm)
    pairs = t(
        "near_dup_pairs -> localCheckpoint",
        lambda: near_dup_pairs(d, "doc_id", "text", threshold=0.5, num_hashes=8, bands=4)
        .select("id_a", "id_b")
        .localCheckpoint(),
    )
    print("  n_pairs =", pairs.count())
    edges = t(
        "edges init (sym+distinct+ckpt)",
        lambda: pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .localCheckpoint(),
    )
    labels = t(
        "labels init (distinct+ckpt)",
        lambda: edges.select(F.col("src").alias("id")).distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(),
    )
    rounds = 0
    while True:
        rounds += 1
        def one_round(labels=labels):
            neighbor_min = (
                edges.join(labels, edges.dst == labels.id)
                .groupBy("src")
                .agg(F.min("component").alias("nbr_component"))
            )
            propagated = labels.join(neighbor_min, labels.id == neighbor_min.src, "left").select(
                "id",
                F.least(F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))).alias("component"),
                F.col("component").alias("__old"),
            )
            parents = propagated.select(F.col("id").alias("__pid"), F.col("component").alias("__pcomponent"))
            stepped = (
                propagated.join(parents, propagated.component == parents.__pid, "left")
                .select(
                    "id",
                    F.least(F.col("component"), F.coalesce(F.col("__pcomponent"), F.col("component"))).alias("component"),
                    (F.least(F.col("component"), F.coalesce(F.col("__pcomponent"), F.col("component"))) < F.col("__old")).alias("__changed"),
                )
                .localCheckpoint()
            )
            return stepped
        stepped = t(f"round {rounds} (2 joins + ckpt)", one_round)
        changed = t(f"round {rounds} changed-count", lambda: stepped.filter(F.col("__changed")).count())
        print(f"  changed = {changed}")
        labels = stepped.drop("__changed")
        if changed == 0 or rounds > 20:
            break
    # final membership join
    def tail():
        sizes = labels.groupBy("component").agg(F.count("*").cast("bigint").alias("n"))
        mem = labels.join(sizes, "component")
        return (
            d.select("doc_id")
            .join(mem.select(F.col("id").alias("doc_id"), "component", "n"), "doc_id", "left")
            .select("doc_id", F.coalesce("component", "doc_id").alias("cluster_id"))
            .collect()
        )
    t("final membership join + collect", tail)


if __name__ == "__main__":
    main()
