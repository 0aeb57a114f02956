"""Readers and writers.

Design rules for 100 TB:
* every write is partitioned or bucketed on a join/filter key so downstream
  scans prune partitions and bucketed joins skip the shuffle;
* schemas are always passed explicitly on read (schema inference is a full
  extra pass over the data);
* CSV/JSON are interchange formats only — the pipeline persists parquet/ORC
  (columnar, splittable, predicate-pushdown-capable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession, path: str, schema: StructType | str, header: bool = True
) -> DataFrame:
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def read_json(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], fmt: str = "parquet"
) -> None:
    """Partitioned write (WriteFilesExecTransformer.scala:54 analog).
    Partition columns become directory keys -> static + dynamic partition
    pruning on read."""
    # zstd: best size/speed tradeoff of the parquet codecs at scan-heavy
    # scale (snappy default decodes faster but costs ~30% more bytes on disk)
    df.write.mode("overwrite").partitionBy(*partition_cols).option(
        "compression", "zstd"
    ).format(fmt).save(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """Bucketed managed table: co-locates rows by hash(bucket_cols) so a
    join between two tables bucketed the same way needs no shuffle at all
    (the reference's MergeTree-bucketed-write analog,
    backends-clickhouse/.../MergeTreeFileFormat.scala)."""
    import shutil

    spark = df.sparkSession
    # the in-memory catalog forgets tables across sessions while managed
    # locations persist; clear both so overwrite is idempotent
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{table}", ignore_errors=True)
    w = df.write.mode("overwrite").format(fmt).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
