"""SparkSession factory — the engine's "plugin configuration".

Gluten activates by injecting configs + rules into a stock Spark session
(reference: gluten-core/src/main/scala/org/apache/gluten/GlutenPlugin.scala:38,
README.md:70-71 requires off-heap memory, columnar shuffle manager, etc.).
Our analog: one factory that returns a SparkSession tuned for large-scale
columnar analytics. Every config below is chosen for the 100 TB / 1000-executor
case first and merely *works* on local[N]:

* AQE on (+ partition coalescing + skew-join splitting): at 100 TB the only
  sane shuffle sizing is "start high, let AQE coalesce", and skewed join keys
  are a certainty (reference keeps Spark AQE active too — SURVEY §4.2).
* preferSortMergeJoin=false mirrors the reference's RewriteJoin SMJ->shuffled
  hash join rewrite (gluten-substrait/.../extension/columnar/rewrite/RewriteJoin.scala).
  Spark only picks SHJ when the per-partition build side plausibly fits memory,
  so this is safe at scale and avoids two full sorts per join.
* Runtime bloom-filter join pruning = the analog of the reference's
  BloomFilterMightContainJointRewriteRule (backends-velox/.../BloomFilterMightContainJointRewriteRule.scala).
* maxPartitionBytes=256m: 100 TB / 256 MB = ~400k scan tasks — tractable;
  the 128m default doubles task-scheduling overhead for pure-scan stages.
* Arrow batch size 4096 rows mirrors the reference's default columnar batch
  (spark.gluten.sql.columnar.maxBatchSize,
  gluten-substrait/.../config/GlutenConfig.scala:1085).
* legacy.parquet.nanosAsLong: the events fixture carries TIMESTAMP(NANOS)
  which vanilla Spark 4 refuses; we read the raw int64 and convert in
  catalog.load_tables (truncation to micros matches DuckDB's CAST).
* Session timezone pinned UTC so timestamp semantics are engine-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_session(
    app_name: str = "incubator-gluten-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    streaming: bool = False,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    shuffle_partitions defaults to 2x cores locally; on a real cluster pass
    a high value (or leave AQE's coalescing to shrink from the initial
    number — spark.sql.adaptive.coalescePartitions.initialPartitionNum).
    """
    cpus = _default_cpus()
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or max(cpus * 2, 8)
    driver_memory = driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # --- memory: single-JVM local mode => driver is the executor
        .config("spark.driver.memory", driver_memory)
        .config("spark.driver.maxResultSize", "4g")
        # --- adaptive execution: the scale-survival kit
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.localShuffleReader.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        # --- join strategy (mirrors reference RewriteJoin + bloom join)
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # NOTE: spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled
        # deliberately NOT set — it deadlocks every job on this Spark build
        # (even a bare count()); the bloom-filter config above already covers
        # the reference's BloomFilterMightContainJointRewriteRule analog.
        # --- scan: pushdown + pruning + sane split sizes
        .config("spark.sql.files.maxPartitionBytes", "256m")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # --- python/arrow boundary (Pandas UDFs ride Arrow batches)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow-optimized Python UDTFs (row-based BatchEvalPython otherwise)
        .config("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # --- managed-table warehouse: /tmp, because the in-memory catalog
        # forgets tables between sessions while their directories persist
        .config("spark.sql.warehouse.dir", "/tmp/spark_graft_warehouse")
        # --- determinism / interop
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", "false")
    )
    if streaming:
        # RocksDB state store: state lives off-heap/on-disk per executor
        # instead of in JVM maps — the production choice once keyed state
        # exceeds executor memory (bundled with Spark 4, no extra jars)
        builder = (
            builder.config(
                "spark.sql.streaming.stateStore.providerClass",
                "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
            ).config(
                "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
                "true",
            )
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)

    spark = builder.getOrCreate()
    # getOrCreate() reuses an existing session and silently drops divergent
    # builder confs; re-apply the runtime-settable ones so later callers
    # (e.g. streaming=True or extra_conf) actually take effect.
    for k, v in (extra_conf or {}).items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a live session — builder already tried
    spark.sparkContext.setLogLevel("WARN")
    return spark
