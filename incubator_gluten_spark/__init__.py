"""incubator_gluten_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the *capabilities* of apache/incubator-gluten
(reference at /root/reference, studied read-only) expressed idiomatically
on the public PySpark DataFrame/SQL/Structured-Streaming API.

Gluten is a JVM<->native offloading layer: it keeps Spark's parser,
analyzer, Catalyst optimizer and scheduler, and swaps physical operator
execution into C++ (Velox/ClickHouse) over Arrow batches
(reference: gluten-core/src/main/scala/org/apache/gluten/GlutenPlugin.scala:38).
Because the *query surface* it accelerates is exactly Spark's, this rebuild
re-expresses every operator in SURVEY.md §2 as declarative DataFrame plans
that Catalyst + Tungsten execute natively, and adds the LLM-data-pipeline
operators (dedup / similarity / text analysis / multimodal) the reference
lacks.

Layout:
  session.py    tuned SparkSession factory (the "plugin config" analog)
  catalog.py    testdata star-schema loader / view registrar
  sources/      readers & writers (parquet/orc/csv/json, partitioned +
                bucketed + DSv2 writes)
  plans/        the full query inventory, one module per capability area:
                tpch (22 adapted queries), operators_queries (window/
                expand/agg/setop/generate/sample/limit/join shapes),
                functions_queries (§2.9 scalar families),
                datapipe_queries, sources_queries, streaming_queries
  streaming/    Structured Streaming jobs over the events fixture
  datapipe/     dedup, similarity search, text analysis, multimodal plumbing
  testing/      duckdb differential-comparison harness
"""

from incubator_gluten_spark.session import get_session
from incubator_gluten_spark.catalog import TABLES, load_tables

__all__ = ["get_session", "load_tables", "TABLES"]
__version__ = "0.1.0"
