"""Lakehouse wire-format walkthrough: the same orders data through the
three from-spec table formats (Delta log, Iceberg v1, Hudi COW) plus the
pure-Python Avro source — no connector jars involved.

Run: python3 examples/lakehouse_wire_formats.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from incubator_gluten_spark.catalog import load_tables  # noqa: E402
from incubator_gluten_spark.session import get_session  # noqa: E402
from incubator_gluten_spark.sources import delta_protocol as dp  # noqa: E402
from incubator_gluten_spark.sources import hudi_format as hf  # noqa: E402
from incubator_gluten_spark.sources import iceberg_format as ice  # noqa: E402
from incubator_gluten_spark.sources.avro import (  # noqa: E402
    register_avro_datasource,
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session(app_name="lakehouse-wire-formats")
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    cols = ["o_orderkey", "o_totalprice", "o_orderpriority"]
    y96 = orders.filter(F.year("o_orderdate") == 1996).select(*cols)
    y97 = orders.filter(F.year("o_orderdate") == 1997).select(*cols)
    work = tempfile.mkdtemp(prefix="lakehouse_demo_")

    # --- Delta: log-carried partition values, COW delete, time travel
    delta_root = f"{work}/delta"
    dp.create_table(y96, delta_root, partition_cols=["o_orderpriority"])
    dp.append(y97, delta_root)
    out = dp.delete_where(spark, delta_root, "o_orderpriority = '1-URGENT'")
    print(
        f"delta: v{out['version']} delete skipped "
        f"{out['files_skipped']} files, latest rows ="
        f" {dp.read_table(spark, delta_root).count()},"
        f" v0 rows = {dp.read_table(spark, delta_root, 0).count()}"
    )

    # --- Iceberg: metadata-only scan planning
    ice_root = f"{work}/iceberg"
    ice.create_table(y96, ice_root, partition_cols=["o_orderpriority"])
    ice.append(y97, ice_root)
    pruned = ice.plan_files(
        ice_root, partition_filter={"o_orderpriority": "1-URGENT"}
    )
    print(
        f"iceberg: planned {len(pruned)}/{len(ice.plan_files(ice_root))} "
        "files from manifests alone; rows in that partition = "
        f"{ice.read_table(spark, ice_root, partition_filter={'o_orderpriority': '1-URGENT'}).count()}"
    )

    # --- Hudi COW: record-key upsert, bounded rewrite
    hudi_root = f"{work}/hudi"
    hf.create_table(
        y96, hudi_root, key_col="o_orderkey", partition_col="o_orderpriority"
    )
    upd = y96.limit(100).withColumn("o_totalprice", F.lit(0.0))
    out = hf.upsert(spark, upd, hudi_root, key_col="o_orderkey")
    print(
        f"hudi: upsert rewrote {out['file_groups_rewritten']} file groups, "
        f"rows = {hf.read_table(spark, hudi_root).count()}"
    )

    # --- Avro: schema-inferring Python DataSource
    register_avro_datasource(spark)
    avro_dir = f"{work}/avro"
    y96.write.format("graft_avro").mode("append").option("path", avro_dir).save()
    back = spark.read.format("graft_avro").option("path", avro_dir).load()
    print(f"avro: round-tripped {back.count()} rows, schema = {back.dtypes}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
