"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` columns with typed metadata — the schema,
partitioning, Arrow batch shape, and UDF signatures are real and tested; the
actual codec calls are stubbed (image/audio libraries are not in this
container) behind clearly-marked deterministic fakes / NotImplementedError.

Scale design:
  - decode / feature-extract run as ``mapInPandas`` (Arrow-batched, one
    Python worker per partition) — the only operators in this repo allowed to
    use Python, because codecs genuinely can't be column expressions.
  - binary payloads are capped per batch via
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a partition of 10 MB
    videos doesn't materialize as one giant Arrow batch.
  - metadata-only operations (routing, filtering, partitioning by media
    type) never touch the binary column — column pruning keeps the payload
    on disk.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical multimodal record schema: payload + typed sidecar metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),   # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    list(MEDIA_SCHEMA.fields)
    + [
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("feature_hash", StringType(), True),
    ]
)

def codec_capabilities() -> "dict[str, bool]":
    """Capability probe (r05 VERDICT optional item): which real codec
    libraries are importable in THIS environment. The sandbox ships
    none, so everything is False here and the deterministic fake decode
    runs; an environment with PIL / soundfile / PyAV flips the matching
    capability and :func:`_decode` starts decoding real payloads through
    the SAME gates, unchanged (synthetic text-byte payloads still fall
    back to the fake, keeping the oracles replayable)."""
    caps = {}
    try:  # pragma: no cover - not present in this container
        import PIL.Image  # noqa: F401

        caps["image"] = True
    except ImportError:
        caps["image"] = False
    try:  # pragma: no cover
        import soundfile  # noqa: F401

        caps["audio"] = True
    except ImportError:
        caps["audio"] = False
    try:  # pragma: no cover
        import av  # noqa: F401

        caps["video"] = True
    except ImportError:
        caps["video"] = False
    return caps


_CAPS = codec_capabilities()
STUB_DECODERS_REAL = any(_CAPS.values())  # True once codec libs exist


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: materialize a media table from the documents fixture (the
    container ships no binary corpus) — payload = utf-8 bytes of the text,
    media_type round-robins image/audio/video. Deterministic, so correctness
    oracles can replay it.
    """
    media_type = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        media_type.alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.concat(F.lit("application/x-fake-"), media_type).alias("mime"),
        F.length(F.encode(F.col(text_col), "utf-8")).cast("long").alias("n_bytes"),
    )


def _fake_decode(media_type: str, payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a codec: derives (width, height, n_frames)
    from payload length — replayable by a SQL oracle, used whenever no
    real codec is available OR the payload isn't a decodable stream
    (the synthetic fixtures are utf-8 text bytes).
    """
    n = len(payload or b"")
    if media_type == "image":
        return (n % 640) + 1, (n % 480) + 1, 1
    if media_type == "audio":
        return 0, 0, (n % 1000) + 1
    return (n % 1920) + 1, (n % 1080) + 1, (n % 120) + 1


def _decode(media_type: str, payload: bytes) -> tuple[int, int, int]:
    """Decode dispatch: real codec when the capability probe found one
    AND the payload actually decodes; deterministic fake otherwise. The
    flip path for a codec-equipped environment is exactly this function
    — gates, schemas, and batch shapes stay identical.
    """
    if _CAPS.get(media_type):  # pragma: no cover - no codecs in sandbox
        try:
            if media_type == "image":
                import io

                import PIL.Image

                with PIL.Image.open(io.BytesIO(payload)) as im:
                    return im.width, im.height, getattr(im, "n_frames", 1)
            if media_type == "audio":
                import io

                import soundfile

                info = soundfile.info(io.BytesIO(payload))
                return 0, 0, int(info.frames)
            if media_type == "video":
                import io

                import av

                with av.open(io.BytesIO(payload)) as c:
                    vs = c.streams.video[0]
                    return int(vs.width), int(vs.height), int(vs.frames or 1)
        except Exception:  # noqa: BLE001 - non-decodable → deterministic fake
            pass
    return _fake_decode(media_type, payload)


def extract_features(df: DataFrame) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    The per-batch function works on pandas DataFrames — the shape a real
    decoder (PIL / torchaudio / pyav) would consume. Feature hash is md5 of
    the payload: a deterministic stand-in for an embedding.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # _decode, not _fake_decode: dispatches to a real codec when
            # the capability probe found one (falls back to the
            # deterministic fake for synthetic/undecodable payloads)
            dims = [
                _decode(mt, pl)
                for mt, pl in zip(pdf["media_type"], pdf["payload"])
            ]
            pdf = pdf.copy()
            pdf["width"] = [d[0] for d in dims]
            pdf["height"] = [d[1] for d in dims]
            pdf["n_frames"] = [d[2] for d in dims]
            pdf["feature_hash"] = [
                hashlib.md5(p or b"").hexdigest() for p in pdf["payload"]
            ]
            yield pdf

    from kafka_connect_hdfs_spark.functions import fan_out

    return fan_out(df).mapInPandas(batches, schema=FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling: one output row per sampled frame index
    (0, every_n, 2*every_n, ... < n_frames) with a per-frame feature hash.

    Scale shape: the frame-index explosion is a builtin ``sequence`` +
    ``explode`` (no Python) — rows multiply by n_frames/every_n but carry
    only ids and the short hash, never the payload; the real per-frame
    decode would then run in mapInPandas batches over (media_id, frame_idx)
    joined back to payloads partition-locally.
    """
    frames = df.filter(F.col("media_type") == "video").select(
        "media_id",
        "n_frames",
        F.explode(
            F.sequence(
                F.lit(0),
                F.col("n_frames") - 1,
                F.lit(every_n),
            )
        ).alias("frame_idx"),
    )
    # deterministic per-frame "feature": md5 of (media_id, frame_idx) — the
    # stub stand-in for a frame embedding (payload decode gated, see
    # _fake_decode)
    return frames.withColumn(
        "frame_hash",
        F.md5(F.concat_ws(":", F.col("media_id").cast("string"),
                          F.col("frame_idx").cast("string"))),
    )


def media_summary(df: DataFrame) -> DataFrame:
    """Metadata-only rollup — never touches the payload column (check
    ReadSchema in the plan: payload must be pruned away)."""
    return (
        df.groupBy("media_type")
        .agg(
            F.count("*").alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.min("n_bytes").alias("min_bytes"),
            F.max("n_bytes").alias("max_bytes"),
        )
        .orderBy("media_type")
    )


def phash_near_dup_pairs(
    df: DataFrame,
    hamming_max: int = 20,
    max_block_size: int = 10_000,
) -> DataFrame:
    """Perceptual-hash near-duplicate candidates over a media table: a
    48-bit content hash per payload (the stand-in for a real pHash/aHash —
    with codec libs wired in, compute the hash from decoded pixels inside
    ``extract_features`` instead; the join machinery is identical), then
    pairs within the same coarse block whose Hamming distance is ≤
    ``hamming_max``.

    Scale: the same banded shape as simhash dedup — candidates come from an
    equi-join on the top-8-bit block (256-way split of the corpus), with
    oversized blocks dropped (``max_block_size``) so a degenerate constant
    payload can't go quadratic. Only (media_id, 8-byte hash) projections
    shuffle; payloads stay on disk (column pruning). bit_count(xor) is a
    codegen JVM expression — no Python in the pair loop.
    """
    from kafka_connect_hdfs_spark.functions import md5_int48

    h = df.select(
        F.col("media_id"),
        md5_int48(F.col("payload")).alias("phash"),
    ).withColumn("block", F.shiftright(F.col("phash"), 40))
    sizes = h.groupBy("block").agg(F.count("*").alias("_bn"))
    small = sizes.filter(F.col("_bn") <= max_block_size).select("block")
    h = h.join(F.broadcast(small), "block")
    a = h.select("block", F.col("media_id").alias("id_a"), F.col("phash").alias("ph_a"))
    b = h.select("block", F.col("media_id").alias("id_b"), F.col("phash").alias("ph_b"))
    return (
        a.join(b, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= hamming_max)
    )


def media_exact_dedup(df: DataFrame) -> DataFrame:
    """Exact binary dedup over the payload column — the first pass of any
    image/audio/video corpus pipeline (identical bytes are identical
    media, regardless of filename or sidecar metadata). One row per
    distinct payload digest with the kept (min-id) item, copy count, and
    per-type byte savings.

    Scale: the payload reduces to its md5 IN the scan projection, so the
    shuffle carries (digest, id, type, n_bytes) — the bytes themselves
    never move (the same never-shuffle-the-payload rule as the decode
    operators, and the binary analog of text exact_duplicates).
    """
    with_fp = df.select(
        F.col("media_id"),
        F.col("media_type"),
        F.col("n_bytes"),
        F.md5(F.col("payload")).alias("digest"),
    )
    return (
        with_fp.groupBy("digest")
        .agg(
            F.min("media_id").alias("keep_id"),
            F.count("*").alias("n_copies"),
            F.min("media_type").alias("media_type"),
            F.max("n_bytes").alias("n_bytes"),
            ((F.count("*") - 1) * F.max("n_bytes")).alias("bytes_saved"),
        )
    )


def media_stub_embeddings(df: DataFrame, dim: int = 8) -> DataFrame:
    """Deterministic stand-in for a media encoder (CLIP/CLAP class):
    ``payload -> md5 -> dim pseudo-embedding`` with component i =
    byte_i/128 − 1 ∈ [−1, 1). Swap for a real encoder (mapInPandas over
    Arrow batches, the :func:`extract_features` shape) when codecs/models
    are available — the PLUMBING this proves is real: payloads reduce to
    a fixed-width vector in the scan projection (bytes never shuffle),
    and the output is drop-in compatible with every ANN operator in
    :mod:`operators.similarity` (brute force, IVF, PQ, sign sketch).
    Oracle-replayable because md5 is identical in SQL.
    """
    h = F.md5(F.col("payload"))
    emb = F.array(
        *[
            (
                F.conv(F.substring(h, 2 * i + 1, 2), 16, 10).cast("double")
                / F.lit(128.0)
                - F.lit(1.0)
            )
            for i in range(dim)
        ]
    )
    return df.select(
        F.col("media_id"), F.col("media_type"), emb.alias("embedding")
    )
