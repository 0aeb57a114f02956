"""Quickstart: the three ways to use incubator_gluten_spark.

Run: python3 examples/quickstart.py [sf_dir]   (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from incubator_gluten_spark import get_session, load_tables
from incubator_gluten_spark.catalog import register_views
from incubator_gluten_spark.datapipe import (
    ann_ivf_topk,
    connected_components,
    minhash_near_dup_pairs,
    scrub_pii,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session(app_name="quickstart")

    # 1. DataFrame API over the star schema -----------------------------
    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    revenue = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")), 2)
             .cast("double").alias("revenue"))
    )
    revenue.show()

    # 2. Plain SQL over registered views --------------------------------
    register_views(spark, sf_dir, ("customer", "nation"))
    spark.sql(
        """
        SELECT n_name, count(*) AS n
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n DESC LIMIT 5
        """
    ).show()

    # 3. Training-data pipeline operators -------------------------------
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    pairs = minhash_near_dup_pairs(docs, threshold=0.3)
    clusters = connected_components(pairs.select("id1", "id2"))
    print("near-dup clusters:", clusters.groupBy("comp").count().count())

    clean = docs.select(scrub_pii(F.col("text")).alias("text"))
    print("scrubbed docs:", clean.count())

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    queries = emb.limit(2).select(F.col("vec_id").alias("query_id"), "embedding")
    ann_ivf_topk(emb, queries, k=3, n_centroids=4, nprobe=2).show()


if __name__ == "__main__":
    main()
