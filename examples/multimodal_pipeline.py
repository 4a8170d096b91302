"""Multimodal training-data preparation with REAL codecs.

What a media-corpus ingest pipeline runs with this repo's operators —
every step below genuinely parses container bytes (BMP headers, stride
padding, bottom-up rows; RIFF chunk walks, PCM16 frames) in pure
Python + numpy inside Spark's Arrow batch path, and each operator is
individually oracle-verified (`media_decode_stats`,
`media_audio_spectrum`, `media_image_gradients`, `media_image_resize`,
`media_audio_resample` in `__spark_entry__.py`):

    binary corpus
      ├─ decode_media_stats      real header/pixel/sample parsing
      ├─ image_gradient_stats    edge density (quality/blur signal)
      ├─ image_resize_stats      nearest-neighbor thumbnail raster
      ├─ audio_spectral_features rFFT dominant frequency
      ├─ audio_resample_stats    linear-interp rate normalization
      ├─ media_exact_dedup       byte-identical dedup (md5 in-scan)
      └─ media_stub_embeddings → ANN (swap for CLIP/CLAP when available)

Payloads never shuffle: every operator reduces the bytes to scalars in
the scan-side mapInPandas, so only fixed-width stats cross the wire —
the property that makes this shape hold at 100 TB.

Run: python examples/multimodal_pipeline.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from kafka_connect_hdfs_spark.operators.multimodal import (  # noqa: E402
    audio_resample_stats,
    audio_spectral_features,
    decode_media_stats,
    image_gradient_stats,
    image_resize_stats,
    media_exact_dedup,
    synthetic_media_corpus,
    synthetic_sine_corpus,
)
from kafka_connect_hdfs_spark.session import get_spark, load_table  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("multimodal-example")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")

    # a real binary corpus: genuine BMP images + WAV clips (in production
    # this is your landed `binary` column; the generator stands in for
    # the crawler)
    media = synthetic_media_corpus(docs).cache()

    stats = decode_media_stats(media)
    print("decoded:")
    stats.groupBy("media_type", "decode_ok").count().orderBy(
        "media_type"
    ).show()

    print("image edge density (top 5 by gradient):")
    image_gradient_stats(media).filter("decode_ok = 'bmp'").select(
        "media_id",
        "width",
        "height",
        (F.col("gx_sum") / F.col("n_gx")).alias("gx_mean"),
    ).orderBy(F.desc("gx_mean")).show(5)

    print("4x3 thumbnails (resize raster sums):")
    image_resize_stats(media).filter("decode_ok = 'bmp'").select(
        "media_id", "src_w", "src_h", "rs_val_sum"
    ).show(5)

    print("audio: resampled to 50 points (exact-integer numerators):")
    audio_resample_stats(media, n_out=50).filter(
        "decode_ok = 'wav'"
    ).select("media_id", "n_in", "rs_num_sum").show(5)

    print("audio: dominant frequency of pure-tone corpus (FFT):")
    tones = synthetic_sine_corpus(docs.limit(10))
    audio_spectral_features(tones).select(
        "media_id",
        "n_frames",
        "dominant_bin",
        (
            F.col("dominant_bin") * F.col("sample_rate") / F.col("n_frames")
        ).alias("dominant_hz"),
    ).orderBy("media_id").show(10)

    print("exact byte-dedup:")
    media_exact_dedup(media).agg(
        F.count("*").alias("n_distinct_payloads"),
        F.sum("bytes_saved").alias("bytes_saved"),
    ).show()

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
