"""Connector/runtime environment probe — run once per round.

The reference ships lakehouse + Kafka connectors as separate modules
(gluten-iceberg/, gluten-delta/, gluten-hudi/, gluten-paimon/,
StreamKafkaSourceNode.java); this build gates the matching Spark entry
points on jar availability instead of faking coverage.  This script
answers, mechanically, "did the environment grow any of them?" so a
round never re-argues it from memory:

* python deps: google.protobuf (required by transformWithStateInPandas —
  implemented in streaming/jobs.py, registered only if importable)
* Spark jars: iceberg / delta / hudi / paimon / kafka-sql / avro
  (classpath scan of $SPARK_HOME/jars plus a JVM class-load attempt)

Prints one JSON object; exit code 0 always (a missing connector is a
fact, not an error).
"""

from __future__ import annotations

import glob
import importlib
import json
import os


def probe() -> dict:
    out: dict[str, object] = {}

    for mod in ("google.protobuf", "grpc"):
        try:
            importlib.import_module(mod)
            out[mod] = "available"
        except ImportError as exc:
            out[mod] = f"missing ({exc.msg.splitlines()[0][:60]})"

    spark_home = os.environ.get("SPARK_HOME")
    if not spark_home:
        try:
            import pyspark

            spark_home = os.path.dirname(pyspark.__file__)
        except ImportError:
            spark_home = ""
    jars = glob.glob(os.path.join(spark_home, "jars", "*.jar")) if spark_home else []
    jar_names = [os.path.basename(j) for j in jars]
    out["n_jars"] = len(jar_names)
    for conn in ("iceberg", "delta", "hudi", "paimon", "kafka", "avro"):
        hits = [j for j in jar_names if conn in j.lower()]
        out[f"jar_{conn}"] = hits if hits else "missing"

    try:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is not None:
            for fmt, cls in (
                ("kafka", "org.apache.spark.sql.kafka010.KafkaSourceProvider"),
                ("avro", "org.apache.spark.sql.avro.AvroFileFormat"),
                ("delta", "io.delta.sql.DeltaSparkSessionExtension"),
                ("iceberg", "org.apache.iceberg.spark.SparkCatalog"),
            ):
                try:
                    spark._jvm.java.lang.Class.forName(cls)
                    out[f"class_{fmt}"] = "loadable"
                except Exception:  # noqa: BLE001
                    out[f"class_{fmt}"] = "missing"
    except Exception:  # noqa: BLE001
        pass

    return out


if __name__ == "__main__":
    print(json.dumps(probe(), indent=1, sort_keys=True))
