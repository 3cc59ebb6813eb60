"""etl_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch rebuild of the capability set of Panorama-Block/etl
(reference at /root/reference: Kafka topic tail -> staged parquet ->
registry diff -> per-file Spark batch job -> ClickHouse append/upsert,
see reference src/pipeline/core/client_clickhouse.py:154-206) as one
idiomatic Spark pipeline: Structured Streaming binlog tail ->
foreachBatch MERGE into a versioned parquet lake table with schema
evolution, exactly-once commits, and per-partition lineage.

No Iceberg/Delta jars are available in this sandbox, so the lake layer
(`etl_spark.lake`) implements the needed subset natively on parquet:
atomic versioned manifests (snapshots), field-ID based schema evolution
(add / rename / type-widen), and bucket-pruned copy-on-write MERGE.
"""

__version__ = "0.1.0"
