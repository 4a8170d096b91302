"""Round-11 semantics pins: the four r10 ADVICE closures (chi2/MI
NULL-census filter, cramers_v non-negative clamp, _table_sig mtime
hardening, empty-table index bootstrap), plus the r11 build items
(star-routed duplicate clustering, PNG codec, row-level deletes,
Avro snappy) pinned in their own sections below as they land.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F


def _mk_table(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(40).select(
        F.col("id").alias("k"),
        F.concat(F.lit("c"), (F.col("id") % 5).cast("string")).alias("p"),
        (F.col("id") * 1.5).alias("v"),
    )
    df.write.partitionBy("p").parquet(path)
    return path


# ---------------------------------------------------------------------------
# r10 ADVICE: _table_sig must catch same-name/same-size rewrites (mtime)


def test_table_sig_catches_same_size_rewrite(spark, tmp_path):
    """An out-of-band rewrite that preserves file name AND size was
    invisible to the old name+size fingerprint — the index stayed
    'fresh' while its pairs could be wrong (r10 ADVICE). With mtime in
    each fingerprint line the status must flip to stale."""
    from kafka_connect_hdfs_spark.merge import (
        build_key_index, key_index_status, locate_keys,
    )

    path = _mk_table(spark, tmp_path)
    build_key_index(spark, path, "k", "p", n_buckets=8)
    assert key_index_status(spark, path, "p") == "fresh"
    # simulate a same-name/same-size rewrite: bump one data file's mtime
    # (content identical so the .crc sidecar stays valid)
    leaf = os.path.join(path, "p=c0")
    part = next(
        f for f in os.listdir(leaf)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )
    target = os.path.join(leaf, part)
    st = os.stat(target)
    os.utime(target, (st.st_atime, st.st_mtime + 10))
    assert key_index_status(spark, path, "p") == "stale"
    keys = spark.createDataFrame([(1,)], "k long")
    assert locate_keys(spark, path, keys, "k", "p") is None


def test_table_sig_covers_null_partition_leaf(spark, tmp_path):
    """Spark lands NULL partition values in
    `p=__HIVE_DEFAULT_PARTITION__`, which matches the `p=` prefix test —
    an out-of-band write into THAT leaf must flip the index stale too."""
    from kafka_connect_hdfs_spark.merge import (
        build_key_index, key_index_status,
    )

    path = str(tmp_path / "tnull")
    df = spark.createDataFrame(
        [(1, "c0", 1.0), (2, None, 2.0)], "k long, p string, v double"
    )
    df.write.partitionBy("p").parquet(path)
    build_key_index(spark, path, "k", "p", n_buckets=4)
    assert key_index_status(spark, path, "p") == "fresh"
    extra = spark.createDataFrame([(9, None, 9.0)], "k long, p string, v double")
    extra.write.mode("append").partitionBy("p").parquet(path)
    assert key_index_status(spark, path, "p") == "stale"


# ---------------------------------------------------------------------------
# r10 ADVICE: empty-table index bootstrap needs an explicit schema


def test_build_key_index_empty_table_with_schema(spark, tmp_path):
    """Bootstrap on an empty/leafless table: schema inference has no
    files to read, so the build REQUIRES the caller's table_schema —
    with it, an empty index publishes and locate_keys resolves (to
    nothing) instead of falling back."""
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    from kafka_connect_hdfs_spark.merge import build_key_index, locate_keys

    path = str(tmp_path / "empty_t")
    os.makedirs(path)
    schema = StructType(
        [
            StructField("k", LongType()),
            StructField("p", StringType()),
            StructField("v", DoubleType()),
        ]
    )
    meta = build_key_index(
        spark, path, "k", "p", n_buckets=4, table_schema=schema
    )
    assert meta["key_col"] == "k"
    keys = spark.createDataFrame([(1,), (2,)], "k long")
    located = locate_keys(spark, path, keys, "k", "p")
    assert located is not None
    assert located.count() == 0


def test_build_key_index_empty_table_without_schema_fails_fast(
    spark, tmp_path
):
    from kafka_connect_hdfs_spark.merge import build_key_index

    path = str(tmp_path / "empty_t2")
    os.makedirs(path)
    with pytest.raises(Exception):
        build_key_index(spark, path, "k", "p", n_buckets=4)


# ---------------------------------------------------------------------------
# r10 ADVICE: chi2/MI NULL-category rows excluded from the census


def _null_census_df(spark):
    rows = (
        [("x", "u")] * 2
        + [("x", "v")]
        + [("y", "u")]
        + [("x", None)] * 5
        + [(None, "u")] * 5
    )
    return spark.createDataFrame(rows, "a string, b string")


def test_chi2_marginals_exclude_null_rows(spark):
    """With 10 NULL-keyed rows present, the (x,u) expected count must be
    computed over the NULL-free census (N=4, n_x=3, n_u=3 → e=2.25) —
    the old join-side drop inflated it to 7*7/14 = 3.5."""
    from kafka_connect_hdfs_spark.operators.quality import chi2_independence

    out = {
        (r["a"], r["b"]): r
        for r in chi2_independence(_null_census_df(spark), "a", "b").collect()
    }
    assert set(out) == {("x", "u"), ("x", "v"), ("y", "u")}
    assert out[("x", "u")]["n_ab"] == 2
    assert abs(out[("x", "u")]["expected"] - 2.25) < 1e-9


def test_mutual_info_marginals_exclude_null_rows(spark):
    from kafka_connect_hdfs_spark.operators.quality import mutual_information

    out = {
        (r["a"], r["b"]): r
        for r in mutual_information(_null_census_df(spark), "a", "b").collect()
    }
    assert set(out) == {("x", "u"), ("x", "v"), ("y", "u")}
    assert out[("x", "u")]["n_a"] == 3
    assert out[("x", "u")]["n_b"] == 3


# ---------------------------------------------------------------------------
# r10 ADVICE: cramers_v chi2 clamped at 0 (near-independence rounding)


def test_cramers_v_never_negative_nor_nan(spark):
    """Near perfect independence with non-integer expectations, the
    zero-cell correction N − Σq6(e) can overshoot by half-up roundings;
    chi2 must clamp at 0 and V stay a real number in [0, 1]."""
    import math

    from kafka_connect_hdfs_spark.operators.quality import cramers_v

    # 3×3 independent-ish table with ragged counts (non-integer e)
    rows = []
    counts = {
        ("a", "u"): 7, ("a", "v"): 11, ("a", "w"): 5,
        ("b", "u"): 13, ("b", "v"): 21, ("b", "w"): 9,
        ("c", "u"): 3, ("c", "v"): 5, ("c", "w"): 2,
    }
    for (a, b), n in counts.items():
        rows += [(a, b)] * n
    r = cramers_v(spark.createDataFrame(rows, "x string, y string"), "x", "y")
    row = r.collect()[0]
    assert row["chi2"] >= 0.0
    assert not math.isnan(row["cramers_v"])
    assert 0.0 <= row["cramers_v"] <= 1.0


# ---------------------------------------------------------------------------
# PNG codec (r10 VERDICT item 2) — byte-level, no Spark


import numpy as np

from kafka_connect_hdfs_spark.operators.multimodal import (
    _PNG_MAGIC, decode_png, encode_png,
)


def _gen_pixels(did: int, w: int, h: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return ((did * 31 + xx * 7 + yy * 13) % 256).astype(np.uint8)


@pytest.mark.parametrize("did", [0, 4, 8, 12, 16, 20, 48, 104])
def test_png_roundtrip_gray(did):
    """Every fixture size decodes back bit-exact; heights ≥ 5 exercise
    all five row filters (encoder cycles y % 5)."""
    w, h = 4 + did % 13, 3 + did % 9
    px = _gen_pixels(did, w, h)
    data = encode_png(w, h, px)
    assert data[:8] == _PNG_MAGIC
    dw, dh, out = decode_png(data)
    assert (dw, dh) == (w, h)
    assert out.shape == (h, w)
    assert np.array_equal(out, px)


def test_png_roundtrip_gray_tall_narrow():
    """w=1 (stride == bpp: no left neighbor anywhere) and h=16 — every
    filter type appears 3+ times with the left-predictor degenerate."""
    px = (np.arange(16, dtype=np.uint8) * 37 % 256).reshape(16, 1)
    dw, dh, out = decode_png(encode_png(1, 16, px))
    assert (dw, dh) == (1, 16)
    assert np.array_equal(out, px)


def test_png_roundtrip_rgb():
    """Color type 2: 3 bytes/pixel — Sub/Paeth left neighbor is the
    same channel 3 bytes back, which a bpp-unaware unfilter gets wrong."""
    h, w = 7, 5
    rgb = np.zeros((h, w, 3), dtype=np.uint8)
    for c in range(3):
        rgb[:, :, c] = _gen_pixels(c + 1, w, h)
    dw, dh, out = decode_png(encode_png(w, h, rgb))
    assert (dw, dh) == (w, h)
    assert out.shape == (h, w, 3)
    assert np.array_equal(out, rgb)


def test_png_truncation_hardening():
    """EVERY strict prefix of a valid PNG must raise ValueError — no
    IndexError/struct.error escapes, no silent partial decode."""
    px = _gen_pixels(6, 9, 8)
    data = encode_png(9, 8, px)
    for cut in range(len(data)):
        with pytest.raises(ValueError):
            decode_png(data[:cut])


def test_png_crc_corruption_detected():
    px = _gen_pixels(2, 6, 6)
    data = bytearray(encode_png(6, 6, px))
    # flip one byte inside the IDAT body (after the 8-byte magic +
    # 25-byte IHDR chunk + 8-byte IDAT header)
    data[8 + 25 + 8 + 2] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_png_rejects_unsupported_variants():
    px = _gen_pixels(0, 4, 4)
    good = encode_png(4, 4, px)

    def mutate_ihdr(field_off: int, val: int) -> bytes:
        import struct as _s
        import zlib

        body = bytearray(good[16:16 + 13])
        body[field_off] = val
        chunk = (
            _s.pack(">I", 13) + b"IHDR" + bytes(body)
            + _s.pack(">I", zlib.crc32(b"IHDR" + bytes(body)) & 0xFFFFFFFF)
        )
        return good[:8] + chunk + good[8 + 25:]

    with pytest.raises(ValueError, match="unsupported"):
        decode_png(mutate_ihdr(8, 16))    # bit depth 16
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(mutate_ihdr(9, 3))     # palette color type
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(mutate_ihdr(12, 1))    # interlaced
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\xFF" + good[8:])  # bad magic


def test_png_bad_filter_byte_rejected():
    import struct as _s
    import zlib

    # hand-build: 2x2 gray, row filter byte 5 (invalid)
    raw = bytes([5, 1, 2]) + bytes([0, 3, 4])
    idat = zlib.compress(raw)
    ihdr = _s.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)

    def chunk(t, b):
        return _s.pack(">I", len(b)) + t + b + _s.pack(
            ">I", zlib.crc32(t + b) & 0xFFFFFFFF
        )

    data = (
        _PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="filter"):
        decode_png(data)


def test_png_multiple_idat_chunks_concatenate():
    """The spec allows IDAT split across chunks — the walk must stitch
    them before inflating."""
    import struct as _s
    import zlib

    px = _gen_pixels(4, 5, 6)
    good = encode_png(5, 6, px)
    # re-split the single IDAT into two chunks
    ilen = _s.unpack_from(">I", good, 8 + 25)[0]
    body = good[8 + 25 + 8:8 + 25 + 8 + ilen]
    a, b = body[:3], body[3:]

    def chunk(t, bb):
        return _s.pack(">I", len(bb)) + t + bb + _s.pack(
            ">I", zlib.crc32(t + bb) & 0xFFFFFFFF
        )

    data = (
        good[:8 + 25] + chunk(b"IDAT", a) + chunk(b"IDAT", b)
        + chunk(b"IEND", b"")
    )
    dw, dh, out = decode_png(data)
    assert np.array_equal(out, px)


def test_decode_media_stats_png_tier(spark, sf_dir):
    """The synthetic corpus now emits PNG for id % 4 == 0 — those rows
    must decode for real (decode_ok='png') with the SAME closed-form
    sums as the BMP tier (filtering is lossless)."""
    from kafka_connect_hdfs_spark.operators.multimodal import (
        decode_media_stats, synthetic_media_corpus,
    )
    from kafka_connect_hdfs_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").limit(40)
    stats = decode_media_stats(synthetic_media_corpus(docs)).collect()
    assert stats, "empty fixture"
    saw_png = saw_bmp = saw_jpeg = False
    for r in stats:
        did = r["media_id"]
        if did % 2 == 1:
            assert r["decode_ok"] == "wav"
            continue
        w, h = 4 + did % 13, 3 + did % 9
        if did % 8 == 6:
            # r12 JPEG tier: block-constant field, DC-only bit-exact
            yy, xx = np.mgrid[0:h, 0:w]
            px = ((did * 31 + (xx // 8) * 7 + (yy // 8) * 13) % 256)
            px = px.astype(np.int64)
            want = "jpeg"
        else:
            px = _gen_pixels(did, w, h).astype(np.int64)
            want = "png" if did % 4 == 0 else "bmp"
        idx = np.arange(w * h, dtype=np.int64).reshape(h, w)
        assert r["decode_ok"] == want
        saw_png |= want == "png"
        saw_bmp |= want == "bmp"
        saw_jpeg |= want == "jpeg"
        assert (r["width"], r["height"]) == (w, h)
        assert r["val_sum"] == int(px.sum())
        assert r["pos_sum"] == int((px * idx).sum())
    assert saw_png and saw_bmp and saw_jpeg


# ---------------------------------------------------------------------------
# Row-level deletes (r10 VERDICT item 4) — merge-on-read tombstones


def _commit_two(spark, tmp_path, name):
    from kafka_connect_hdfs_spark.snapshots import commit_snapshot

    path = str(tmp_path / name)
    a = spark.range(10).select(
        F.col("id").alias("k"), F.lit("a").alias("src")
    )
    b = spark.range(10, 20).select(
        F.col("id").alias("k"), F.lit("b").alias("src")
    )
    commit_snapshot(spark, a, path, now=lambda: 1000)
    commit_snapshot(spark, b, path, mode="append", now=lambda: 2000)
    return path


def _data_listing(path):
    out = {}
    droot = os.path.join(path, "data")
    for d in os.listdir(droot):
        full = os.path.join(droot, d)
        out[d] = {
            (f, os.stat(os.path.join(full, f)).st_ino)
            for f in os.listdir(full)
            if not f.startswith((".", "_"))
        }
    return out


def test_delete_rows_is_metadata_only_and_time_travels(spark, tmp_path):
    """A row delete is O(batch): no data dir changes (inode-pinned),
    the latest read hides the keys, the pre-delete version still shows
    them, and an append AFTER the delete does not resurrect them."""
    from kafka_connect_hdfs_spark.snapshots import (
        commit_snapshot, delete_rows, read_snapshot,
    )

    path = _commit_two(spark, tmp_path, "t_del")
    before = _data_listing(path)
    keys = spark.createDataFrame([(3,), (15,)], "k long")
    v = delete_rows(spark, path, keys, "k", now=lambda: 3000)
    assert v == 3
    assert _data_listing(path) == before  # inode-identical data dirs
    live = {r["k"] for r in read_snapshot(spark, path).collect()}
    assert live == set(range(20)) - {3, 15}
    pre = {r["k"] for r in read_snapshot(spark, path, version=2).collect()}
    assert pre == set(range(20))
    # append after delete: tombstones carry forward
    c = spark.range(20, 25).select(
        F.col("id").alias("k"), F.lit("c").alias("src")
    )
    commit_snapshot(spark, c, path, mode="append", now=lambda: 4000)
    live2 = {r["k"] for r in read_snapshot(spark, path).collect()}
    assert live2 == set(range(25)) - {3, 15}


def test_delete_rows_conflicting_key_raises(spark, tmp_path):
    from kafka_connect_hdfs_spark.snapshots import delete_rows

    path = _commit_two(spark, tmp_path, "t_conflict")
    delete_rows(
        spark, path, spark.createDataFrame([(1,)], "k long"), "k",
        now=lambda: 3000,
    )
    with pytest.raises(ValueError, match="equality"):
        delete_rows(
            spark, path, spark.createDataFrame([("a",)], "src string"),
            "src", now=lambda: 4000,
        )


def test_apply_deletes_rewrites_only_affected_dirs(spark, tmp_path):
    """Delete keys confined to the v2 data dir: compaction must rewrite
    ONLY that dir — the v1 dir stays inode-identical and referenced
    as-is — and clear the tombstone list."""
    from kafka_connect_hdfs_spark.snapshots import (
        _read_manifest, apply_deletes, delete_rows, list_snapshots,
        read_snapshot,
    )

    path = _commit_two(spark, tmp_path, "t_cow")
    before = _data_listing(path)
    keys = spark.createDataFrame([(15,), (17,)], "k long")  # only in v2
    delete_rows(spark, path, keys, "k", now=lambda: 3000)
    info = apply_deletes(spark, path, now=lambda: 4000)
    assert info["version"] == 4
    assert info["n_dirs_rewritten"] == 1
    assert info["n_dirs_untouched"] == 1
    assert _data_listing(path)["v1"] == before["v1"]  # untouched inode
    man = _read_manifest(spark, path, 4)
    assert not man.get("deletes")
    assert any(f.endswith("/v1") for f in man["files"])
    live = {r["k"] for r in read_snapshot(spark, path).collect()}
    assert live == set(range(20)) - {15, 17}
    # no-op second compaction: metadata answer, no new version
    info2 = apply_deletes(spark, path)
    assert info2["version"] is None
    assert 4 == list_snapshots(spark, path)[-1]


def test_rollback_and_incremental_respect_deletes(spark, tmp_path):
    """r12 semantics: a tombstone is sequence-SCOPED to the data dirs
    present at delete time (Iceberg v2), so key 22 — deleted BEFORE it
    ever existed, then appended — is new data and stays visible; and
    read_incremental REFUSES a range containing a delete commit (an
    added-rows-only delta would silently miss row deaths — the
    changelog_scan emission test covers the feed itself)."""
    from kafka_connect_hdfs_spark.snapshots import (
        commit_snapshot, delete_rows, read_incremental, read_snapshot,
        rollback_snapshot,
    )

    path = _commit_two(spark, tmp_path, "t_rb")
    delete_rows(
        spark, path, spark.createDataFrame([(5,), (15,)], "k long"), "k",
        now=lambda: 3000,
    )
    c = spark.range(13, 25).select(
        F.col("id").alias("k"), F.lit("c").alias("src")
    )
    commit_snapshot(spark, c, path, mode="append", now=lambda: 4000)  # v4
    # the delete at v3 is inside v2→v4: an added-rows-only delta would
    # be delete-blind — refuse and point at the changelog
    with pytest.raises(ValueError, match="changelog_scan"):
        read_incremental(spark, path, 2)
    # a range WITHOUT the delete still serves: v3→v4 adds the c rows,
    # and the re-appended 5/15 copies are newer than the tombstone
    inc = {r["k"] for r in read_incremental(spark, path, 3).collect()}
    assert inc == set(range(13, 25))
    # scoped semantics: 15 was deleted at v3 but RE-INSERTED by the v4
    # append — the tombstone only covers the v1/v2 dirs, so the new copy
    # is visible (15's old copy is dead); 5 was never re-inserted and
    # stays deleted
    live = {r["k"] for r in read_snapshot(spark, path).collect()}
    assert live == set(range(25)) - {5}
    # ...exactly ONE physical copy of 15 (the v4 one), while 13 (never
    # deleted, appended twice) has two
    by_k = {
        r["k"]: r["n"]
        for r in read_snapshot(spark, path).groupBy("k").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert by_k[15] == 1 and by_k[13] == 2 and 5 not in by_k
    # overwrite v5 resets deletes; rollback to v4 restores them + scopes
    commit_snapshot(
        spark,
        spark.range(2).select(F.col("id").alias("k"), F.lit("o").alias("src")),
        path, now=lambda: 5000,
    )
    assert {r["k"] for r in read_snapshot(spark, path).collect()} == {0, 1}
    rollback_snapshot(spark, path, 4, now=lambda: 6000)
    assert {
        r["k"] for r in read_snapshot(spark, path).collect()
    } == set(range(25)) - {5}
    by_k2 = {
        r["k"]: r["n"]
        for r in read_snapshot(spark, path).groupBy("k").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert by_k2[15] == 1 and 5 not in by_k2


def test_expire_reclaims_tombstone_dirs(spark, tmp_path):
    from kafka_connect_hdfs_spark.snapshots import (
        apply_deletes, delete_rows, expire_snapshots,
    )

    path = _commit_two(spark, tmp_path, "t_exp")
    delete_rows(
        spark, path, spark.createDataFrame([(1,)], "k long"), "k",
        now=lambda: 3000,
    )
    tomb = os.path.join(path, "_tombstones", "v3")
    assert os.path.isdir(tomb)
    apply_deletes(spark, path, now=lambda: 4000)
    expired = expire_snapshots(spark, path, keep_last=1)
    assert expired == [1, 2, 3]
    assert not os.path.isdir(tomb)


def test_clone_carries_live_tombstones(spark, tmp_path):
    from kafka_connect_hdfs_spark.snapshots import (
        clone_table, delete_rows, read_snapshot,
    )

    src = _commit_two(spark, tmp_path, "t_clone_src")
    delete_rows(
        spark, src, spark.createDataFrame([(7,)], "k long"), "k",
        now=lambda: 3000,
    )
    dst = str(tmp_path / "t_clone_dst")
    clone_table(spark, src, dst, now=lambda: 4000)
    live = {r["k"] for r in read_snapshot(spark, dst).collect()}
    assert live == set(range(20)) - {7}


# ---------------------------------------------------------------------------
# Avro snappy codec (r10 VERDICT item 7) — pure Python block codec


def test_snappy_roundtrip_and_ratio():
    from kafka_connect_hdfs_spark.formats.avro_io import (
        _snappy_compress, _snappy_decompress,
    )

    for payload in (
        b"", b"x", b"abc" * 40, bytes(range(256)) * 300,
        b"\x00" * 70000,  # crosses the 2-byte length form
    ):
        assert _snappy_decompress(_snappy_compress(payload)) == payload


def test_snappy_decoder_full_grammar():
    """The decoder must handle blocks real snappy libraries emit: all
    four element tags including overlapping copies (RLE) — our encoder
    never produces them, so hand-build the blocks."""
    from kafka_connect_hdfs_spark.formats.avro_io import _snappy_decompress

    # 'abcd' literal + copy1(off=4, len=4)  → 'abcdabcd'
    blk = bytes([8]) + bytes([(4 - 1) << 2]) + b"abcd" + bytes(
        [0b001 | ((4 - 4) << 2)]
    ) + bytes([4])
    assert _snappy_decompress(blk) == b"abcdabcd"
    # overlapping RLE: 'a' literal + copy1(off=1, len=10) → 'a' * 11
    blk = bytes([11]) + bytes([0]) + b"a" + bytes(
        [0b001 | ((10 - 4) << 2)]
    ) + bytes([1])
    assert _snappy_decompress(blk) == b"a" * 11
    # copy2: 'xy' literal + copy with 2-byte offset 2, len 6 → 'xyxyxyxy'
    blk = bytes([8]) + bytes([(2 - 1) << 2]) + b"xy" + bytes(
        [0b010 | ((6 - 1) << 2)]
    ) + (2).to_bytes(2, "little")
    assert _snappy_decompress(blk) == b"xyxyxyxy"
    # corruption: bad offset
    with pytest.raises(ValueError, match="offset"):
        _snappy_decompress(bytes([4]) + bytes([0b001]) + bytes([99]))
    # corruption: length mismatch vs preamble
    with pytest.raises(ValueError, match="length"):
        _snappy_decompress(bytes([9]) + bytes([(4 - 1) << 2]) + b"abcd")


def test_avro_snappy_container_crc_guard(tmp_path):
    from kafka_connect_hdfs_spark.formats.avro_io import (
        read_container, write_container,
    )

    schema = {
        "type": "record", "name": "r",
        "fields": [{"name": "i", "type": "long"}],
    }
    p = str(tmp_path / "s.avro")
    write_container(
        p, schema, [{"i": n} for n in range(500)], codec="snappy"
    )
    got_schema, got = read_container(p)
    assert got_schema == schema
    assert [r["i"] for r in got] == list(range(500))
    # flip one payload byte: the block CRC must catch it
    data = bytearray(open(p, "rb").read())
    data[-30] ^= 0xFF
    bad = str(tmp_path / "bad.avro")
    open(bad, "wb").write(bytes(data))
    with pytest.raises((ValueError, AssertionError)):
        read_container(bad)


def test_avro_snappy_jvm_cross_read(spark, tmp_path):
    """spark-avro (when present) must read our snappy containers — the
    real spec-compliance oracle for the block+CRC layout."""
    from kafka_connect_hdfs_spark.formats.avro_io import write_container

    schema = {
        "type": "record", "name": "r",
        "fields": [{"name": "a", "type": "long"}],
    }
    out = str(tmp_path / "sj")
    os.makedirs(out)
    write_container(
        f"{out}/p0.avro", schema, [{"a": n} for n in range(50)],
        codec="snappy",
    )
    try:
        back = spark.read.format("avro").load(out)
        n = back.count()
    except Exception as e:
        pytest.skip(f"JVM avro datasource unavailable: {e}")
    assert n == 50
    assert back.agg(F.sum("a")).first()[0] == sum(range(50))


def test_delete_rows_empty_batch_is_noop(spark, tmp_path):
    """An empty key batch must not commit (an empty tombstone dir would
    break parquet schema inference on every later read)."""
    from kafka_connect_hdfs_spark.snapshots import (
        delete_rows, list_snapshots, read_snapshot,
    )

    path = _commit_two(spark, tmp_path, "t_empty_del")
    v = delete_rows(
        spark, path,
        spark.createDataFrame([], "k long"), "k", now=lambda: 3000,
    )
    assert v == 2
    assert list_snapshots(spark, path) == [1, 2]
    assert read_snapshot(spark, path).count() == 20
    assert not os.path.isdir(os.path.join(path, "_tombstones"))


def test_png_ancillary_chunks_skipped():
    """Real-world PNGs carry ancillary chunks (tEXt, pHYs, ...) between
    IHDR and IDAT — the walk must skip them (CRC still validated) and
    decode identically."""
    import struct as _s
    import zlib

    px = _gen_pixels(8, 7, 6)
    good = encode_png(7, 6, px)

    def chunk(t, b):
        return _s.pack(">I", len(b)) + t + b + _s.pack(
            ">I", zlib.crc32(t + b) & 0xFFFFFFFF
        )

    spliced = (
        good[:8 + 25]
        + chunk(b"tEXt", b"Comment\x00synthetic fixture")
        + chunk(b"pHYs", _s.pack(">IIB", 2835, 2835, 1))
        + good[8 + 25:]
    )
    dw, dh, out = decode_png(spliced)
    assert (dw, dh) == (7, 6)
    assert np.array_equal(out, px)
    # a CORRUPT ancillary chunk still fails loudly (CRC covers them too)
    bad = bytearray(spliced)
    bad[8 + 25 + 8 + 2] ^= 0xFF  # inside tEXt body
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))


def test_tombstone_residue_audited_and_swept(spark, tmp_path):
    """A crashed delete's tombstone residue (dir present, in no
    manifest) must report 'orphan' in orphan_report and be reclaimed by
    vacuum_orphans; live tombstones report 'live'. A later normal
    commit at the same version number also sweeps residue."""
    from kafka_connect_hdfs_spark.snapshots import (
        commit_snapshot, delete_rows, orphan_report, vacuum_orphans,
    )

    path = _commit_two(spark, tmp_path, "t_tres")
    delete_rows(
        spark, path, spark.createDataFrame([(1,)], "k long"), "k",
        now=lambda: 3000,
    )
    # fake a crashed delete at v4: tombstone dir, no manifest
    residue = os.path.join(path, "_tombstones", "v4")
    os.makedirs(residue)
    open(os.path.join(residue, "part-junk.parquet"), "wb").write(b"x")
    rep = {
        r["data_dir"]: r["status"]
        for r in orphan_report(spark, path).collect()
    }
    assert rep["_tombstones/v3"] == "live"
    assert rep["_tombstones/v4"] == "orphan"
    deleted = vacuum_orphans(spark, path)
    assert "_tombstones/v4" in deleted
    assert not os.path.isdir(residue)
    assert os.path.isdir(os.path.join(path, "_tombstones", "v3"))
    # commit_snapshot's own orphan rule sweeps same-version residue
    os.makedirs(residue)
    commit_snapshot(
        spark,
        spark.range(3).select(F.col("id").alias("k"), F.lit("d").alias("src")),
        path, mode="append", now=lambda: 5000,
    )  # commits v4
    assert not os.path.isdir(residue)
