"""Source/sink layer: readers and writers for the formats the reference
scans natively (SURVEY §2.1).

Parquet is the primary format (reference: FileSourceScanExecTransformer.scala:40,
"only fully supports parquet" per docs/velox-backend-limitations.md); ORC,
CSV and JSON are first-class Spark readers here (ArrowCsvScanSuite.scala
analog). Writes cover plain, partitioned and bucketed parquet/ORC
(WriteFilesExecTransformer.scala:54) plus DSv2 writeTo. Lakehouse
connectors (Iceberg/Delta/Hudi/Paimon — gluten-iceberg/ etc.) and the
Kafka stream source need jars not present in this environment; their
entry points are gated with availability probes rather than stubbed
silently.  Avro (reference: backends-velox MiscOperatorSuite.scala:64
keeps it on the V1 source list) is covered WITHOUT the missing
spark-avro jar by a pure-Python implementation of the public container
spec (sources/avro.py) mounted as a Python DataSource — interop-tested
against the Apache Avro JVM library that IS on the classpath.
"""

from incubator_gluten_spark.sources.io import (
    read_csv,
    read_json,
    read_orc,
    write_bucketed_table,
    write_partitioned,
)

__all__ = [
    "read_csv",
    "read_json",
    "read_orc",
    "write_partitioned",
    "write_bucketed_table",
]
