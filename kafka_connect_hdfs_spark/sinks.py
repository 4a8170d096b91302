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


class PurePythonAvroSink(FormatSink):
    """O1/O5 without spark-avro: lands genuine Avro Object Container Files
    via the dependency-free codec in formats/avro_io.py (container spec:
    avro/AvroRecordWriterProvider.java:50-103; schema read-back:
    avro/AvroFileReader.java:42-53).

    Files are written per Spark partition on the executors
    (mapPartitionsWithIndex) — no driver collect. Hive-style partition dirs
    are grouped within each task, mirroring the reference's one-writer-per
    -encodedPartition layout (TopicPartitionWriter.getWriter).
    Used automatically when the JVM ``avro`` datasource is unavailable.
    """

    def write(self, df: DataFrame, path: str, partition_by: list[str], mode: str = "append") -> None:
        import os

        from kafka_connect_hdfs_spark.formats.avro_io import (
            struct_to_avro_schema, write_container,
        )

        local = path.removeprefix("file://")
        codec = self.options.get("compression", "null")
        if codec not in ("deflate", "bzip2"):
            codec = "null"  # snappy needs the native lib; reference default is null
        payload_fields = [f for f in df.schema.fields if f.name not in partition_by]
        avro_schema = struct_to_avro_schema(
            type(df.schema)(payload_fields), name="spark_record"
        )
        pcols = list(partition_by)
        names = [f.name for f in payload_fields]

        if pcols:
            df = df.repartition(*[F.col(c) for c in pcols]).sortWithinPartitions(
                *[F.col(c) for c in pcols]
            )

        def write_part(idx, rows):
            import itertools

            n = 0
            if pcols:
                for key, group in itertools.groupby(
                    rows, key=lambda r: tuple(r[c] for c in pcols)
                ):
                    d = os.path.join(
                        local, *[f"{c}={v}" for c, v in zip(pcols, key)]
                    )
                    os.makedirs(d, exist_ok=True)
                    n += write_container(
                        os.path.join(d, f"part-{idx:05d}.avro"),
                        avro_schema,
                        ({c: r[c] for c in names} for r in group),
                        codec=codec,
                    )
            else:
                os.makedirs(local, exist_ok=True)
                n += write_container(
                    os.path.join(local, f"part-{idx:05d}.avro"),
                    avro_schema,
                    ({c: r[c] for c in names} for r in rows),
                    codec=codec,
                )
            yield n

        os.makedirs(local, exist_ok=True)
        df.rdd.mapPartitionsWithIndex(write_part).sum()

    def read(self, spark: SparkSession, path: str) -> DataFrame:
        import glob as _glob
        import os

        from kafka_connect_hdfs_spark.formats.avro_io import (
            avro_to_struct, read_container,
        )

        local = path.removeprefix("file://")
        files = sorted(_glob.glob(os.path.join(local, "**", "*.avro"), recursive=True))
        if not files:
            raise FileNotFoundError(f"no .avro files under {path}")
        schema_json, _ = read_container(files[0])
        struct = avro_to_struct(schema_json)
        rows = []
        for fp in files:
            _, recs = read_container(fp)
            rel = os.path.relpath(os.path.dirname(fp), local)
            pvals = dict(
                seg.split("=", 1) for seg in rel.split(os.sep) if "=" in seg
            )
            for r in recs:
                rows.append({**r, **pvals})
        out_struct = struct
        pdf_cols = set(struct.fieldNames())
        extra = sorted({k for r in rows for k in r if k not in pdf_cols})
        from pyspark.sql import types as T

        for c in extra:
            out_struct = out_struct.add(T.StructField(c, T.StringType(), True))
        return spark.createDataFrame(
            [tuple(r.get(f) for f in out_struct.fieldNames()) for r in rows],
            out_struct,
        )

    def schema_of(self, spark: SparkSession, path: str):
        """Reference semantics: schema of the NEWEST committed file
        (TopicPartitionWriter.java:334-350 bootstraps from it)."""
        import glob as _glob
        import os

        from kafka_connect_hdfs_spark.formats.avro_io import (
            avro_to_struct, read_container,
        )

        local = path.removeprefix("file://")
        files = sorted(
            _glob.glob(os.path.join(local, "**", "*.avro"), recursive=True),
            key=lambda p: (os.path.getmtime(p), p),
        )
        schema_json, _ = read_container(files[-1])
        return avro_to_struct(schema_json)


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
        # pure-Python container writer — works without spark-avro; on a
        # cluster with the JVM avro datasource, swap to
        # FormatSink("avro", ".avro", {...}) for codegen-speed writes
        "avro": PurePythonAvroSink(
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
