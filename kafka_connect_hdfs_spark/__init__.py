"""kafka_connect_hdfs_spark — a PySpark-native rebuild of the capabilities of
the Confluent ``kafka-connect-hdfs`` sink connector (reference: /root/reference,
surveyed in SURVEY.md).

Two layers (SURVEY.md intro):

1. **Ingest pipeline** — the faithful part: records → directory partitioning →
   size/time rotation → offset-named immutable files → catalog registration,
   batch-first (pure ``DataFrame -> DataFrame`` operators) and wrapped in
   Structured Streaming for the live path (``streaming/``).
2. **Query surface** — the reference delegates queries over landed tables to
   Hive (docs/hdfs_connector.rst:192-200); here that surface is Spark SQL
   itself (``plans/``), plus the large-scale training-data operators
   (dedup / similarity / text analysis / multimodal) the reference never had.

Everything is DataFrame/SQL-level: no RDDs, no custom Catalyst rules
(SURVEY.md §4 shows none is needed).
"""

from kafka_connect_hdfs_spark.config import HdfsSinkConfig
from kafka_connect_hdfs_spark.session import get_spark, load_table, load_tables

__all__ = [
    "HdfsSinkConfig",
    "get_spark",
    "load_table",
    "load_tables",
    # main entry points (imported lazily to keep module import light):
    #   pipeline.land / land_topics / ingest_batch / register_external_table
    #   contract_names.land_with_contract_names / read_committed
    #   compaction.compact_partitions
    #   streaming.pipeline.kafka_source / start_ingest
]
__version__ = "0.1.0"
