"""Round-12 regression pins: the quality.py NULL-census resolution fix
(r11 ADVICE — filter must run BEFORE the aliasing select so caller
columns literally named 'a'/'b' resolve against the caller's frame),
tombstone sequence-scoping, changelog scan, and JPEG baseline decode.
"""

import pytest
from pyspark.sql import functions as F

from kafka_connect_hdfs_spark.operators import quality


def _collides_fixture(spark):
    # caller columns literally named 'a' and 'b' — the aliasing-select
    # collision class: after .select(alias 'a','b'), F.col("a")/F.col("b")
    # resolve to the ALIASED output, i.e. the wrong source column
    rows = [
        ("x1", "y1"), ("x1", "y2"), ("x2", "y1"),
        (None, "y1"), ("x2", None), (None, None),
        ("x1", "y1"), ("x2", "y2"),
    ]
    return spark.createDataFrame(rows, "b string, a string")


@pytest.mark.parametrize("fn", [
    quality.mutual_information,
    quality.chi2_independence,
])
def test_null_census_with_colliding_names(spark, fn):
    df = _collides_fixture(spark)
    # ground truth: same data under collision-free names
    safe = df.select(F.col("b").alias("c1"), F.col("a").alias("c2"))
    got = fn(df, "b", "a").collect()
    want = fn(safe, "c1", "c2").collect()
    assert got == want
    # the census must exclude every row with a NULL in EITHER column:
    # 5 rows survive of the 8
    assert sum(r["n_ab"] for r in got) == 5


def test_cramers_v_with_colliding_names(spark):
    df = _collides_fixture(spark)
    safe = df.select(F.col("b").alias("c1"), F.col("a").alias("c2"))
    got = quality.cramers_v(df, "b", "a").collect()
    want = quality.cramers_v(safe, "c1", "c2").collect()
    assert got == want
    assert got[0]["n_rows"] == 5


# ---------------------------------------------------------------------------
# Row-delete sequence scoping, dtype fail-fast, changelog scan (r11
# VERDICT item 2 + ADVICE medium/low)


def _three_commits(spark, tmp_path, name):
    """v1: keys 0-9 (src a) · v2: append 10-19 (src b) → base table."""
    from kafka_connect_hdfs_spark.snapshots import commit_snapshot

    path = str(tmp_path / name)
    a = spark.range(10).select(F.col("id").alias("k"), F.lit("a").alias("src"))
    b = spark.range(10, 20).select(
        F.col("id").alias("k"), F.lit("b").alias("src")
    )
    commit_snapshot(spark, a, path, now=lambda: 1000)
    commit_snapshot(spark, b, path, mode="append", now=lambda: 2000)
    return path


def test_changelog_scan_emits_inserts_and_deletes(spark, tmp_path):
    """The delete-aware change feed: a mirror applying inserts-then-
    deletes per version lands exactly on read_snapshot(v_to), including
    through the delete that read_incremental refuses."""
    from kafka_connect_hdfs_spark.snapshots import (
        changelog_scan, commit_snapshot, delete_rows, read_snapshot,
    )

    path = _three_commits(spark, tmp_path, "t_cdf")
    delete_rows(
        spark, path, spark.createDataFrame([(3,), (15,)], "k long"), "k",
        now=lambda: 3000,
    )  # v3
    c = spark.range(15, 22).select(
        F.col("id").alias("k"), F.lit("c").alias("src")
    )
    commit_snapshot(spark, c, path, mode="append", now=lambda: 4000)  # v4
    feed = changelog_scan(spark, path, 1, 4).collect()
    ins = {(r["k"], r["change_version"]) for r in feed
           if r["change_type"] == "insert"}
    dels = {(r["k"], r["change_version"]) for r in feed
            if r["change_type"] == "delete"}
    assert ins == {(k, 2) for k in range(10, 20)} | {
        (k, 4) for k in range(15, 22)
    }
    # the delete materializes FULL row images of exactly the rows that
    # died: 3 (from v1) and 15's OLD copy (from v2) — change_version 3
    assert dels == {(3, 3), (15, 3)}
    dead_srcs = {(r["k"], r["src"]) for r in feed
                 if r["change_type"] == "delete"}
    assert dead_srcs == {(3, "a"), (15, "b")}
    # mirror replay: start from read_snapshot(v1), apply per version →
    # must equal read_snapshot(v4) as a multiset of (k, src)
    state = {(r["k"], r["src"], 1) for r in
             read_snapshot(spark, path, 1).collect()}

    def _multiset(rows):
        from collections import Counter
        return Counter((r[0], r[1]) for r in rows)

    mirror = _multiset(state)
    for v in (2, 3, 4):
        for r in feed:
            if r["change_version"] != v:
                continue
            if r["change_type"] == "insert":
                mirror[(r["k"], r["src"])] += 1
        for r in feed:
            if r["change_version"] != v:
                continue
            if r["change_type"] == "delete":
                mirror[(r["k"], r["src"])] -= 1
    mirror = +mirror
    final = _multiset(
        (r["k"], r["src"]) for r in read_snapshot(spark, path, 4).collect()
    )
    assert mirror == final
    # empty range → empty feed with the change columns present
    empty = changelog_scan(spark, path, 4, 4)
    assert empty.count() == 0
    assert {"change_type", "change_version"} <= set(empty.columns)


def test_changelog_scan_skips_compaction(spark, tmp_path):
    """apply_deletes inside the range changes files but not one visible
    row — the feed must emit the delete at ITS version, nothing at the
    compaction version, and keep serving appends after it."""
    from kafka_connect_hdfs_spark.snapshots import (
        apply_deletes, changelog_scan, commit_snapshot, delete_rows,
    )

    path = _three_commits(spark, tmp_path, "t_cdf_compact")
    delete_rows(
        spark, path, spark.createDataFrame([(7,)], "k long"), "k",
        now=lambda: 3000,
    )  # v3
    info = apply_deletes(spark, path, now=lambda: 4000)  # v4
    assert info["version"] == 4
    commit_snapshot(
        spark,
        spark.range(30, 33).select(
            F.col("id").alias("k"), F.lit("d").alias("src")
        ),
        path, mode="append", now=lambda: 5000,
    )  # v5
    feed = changelog_scan(spark, path, 1, 5).collect()
    by_version = {}
    for r in feed:
        by_version.setdefault(
            (r["change_version"], r["change_type"]), set()
        ).add(r["k"])
    assert by_version[(2, "insert")] == set(range(10, 20))
    assert by_version[(3, "delete")] == {7}
    assert (4, "insert") not in by_version and (4, "delete") not in by_version
    assert by_version[(5, "insert")] == {30, 31, 32}


def test_changelog_scan_with_schema_evolution(spark, tmp_path):
    """An append that ADDS a column mid-range: the feed unions by name
    with missing-column fill (old rows read NULL for the new column),
    and delete materialization still resolves the key — the same
    mergeSchema contract as read_snapshot."""
    from kafka_connect_hdfs_spark.snapshots import (
        changelog_scan, commit_snapshot, delete_rows,
    )

    path = str(tmp_path / "t_cdf_evo")
    a = spark.range(5).select(F.col("id").alias("k"))
    commit_snapshot(spark, a, path, now=lambda: 1000)
    b = spark.range(5, 8).select(
        F.col("id").alias("k"), F.lit("new").alias("extra")
    )
    commit_snapshot(spark, b, path, mode="append", now=lambda: 2000)
    delete_rows(
        spark, path, spark.createDataFrame([(2,), (6,)], "k long"), "k",
        now=lambda: 3000,
    )
    feed = changelog_scan(
        spark, path, 1, 3, options={"mergeSchema": "true"}
    ).collect()
    ins = {(r["k"], r["extra"]) for r in feed
           if r["change_type"] == "insert"}
    dels = {(r["k"], r["extra"]) for r in feed
            if r["change_type"] == "delete"}
    assert ins == {(5, "new"), (6, "new"), (7, "new")}
    # both deleted rows materialize; the v1 row has NULL for the
    # evolved column, the v2 row carries its value
    assert dels == {(2, None), (6, "new")}


def test_clone_carries_sequence_scopes(spark, tmp_path):
    """A clone of a table with scoped deletes must preserve the scopes:
    appending a deleted key to the CLONE re-inserts it there (newer
    than the cloned tombstone), while the clone still hides the
    source's originally-deleted copies."""
    from kafka_connect_hdfs_spark.snapshots import (
        clone_table, commit_snapshot, delete_rows, read_snapshot,
    )

    src = _three_commits(spark, tmp_path, "t_scope_src")
    delete_rows(
        spark, src, spark.createDataFrame([(4,), (14,)], "k long"), "k",
        now=lambda: 3000,
    )
    dst = str(tmp_path / "t_scope_clone")
    clone_table(spark, src, dst, now=lambda: 4000)
    assert {r["k"] for r in read_snapshot(spark, dst).collect()} == (
        set(range(20)) - {4, 14}
    )
    commit_snapshot(
        spark,
        spark.createDataFrame([(4, "re")], "k long, src string"),
        dst, mode="append", now=lambda: 5000,
    )
    rows = read_snapshot(spark, dst).collect()
    assert {r["k"] for r in rows} == set(range(20)) - {14}
    assert {r["src"] for r in rows if r["k"] == 4} == {"re"}
    # the source is untouched by the clone's append
    assert {r["k"] for r in read_snapshot(spark, src).collect()} == (
        set(range(20)) - {4, 14}
    )


def test_changelog_scan_refuses_overwrite(spark, tmp_path):
    from kafka_connect_hdfs_spark.snapshots import (
        changelog_scan, commit_snapshot,
    )

    path = _three_commits(spark, tmp_path, "t_cdf_ow")
    commit_snapshot(
        spark,
        spark.range(3).select(F.col("id").alias("k"), F.lit("o").alias("src")),
        path, now=lambda: 3000,
    )  # v3 overwrite
    with pytest.raises(ValueError, match="resync"):
        changelog_scan(spark, path, 1, 3)


def test_delete_rows_dtype_fail_fast(spark, tmp_path):
    """Write-time key normalization: an int batch casts losslessly to
    the table's long key; a non-numeric string batch REFUSES instead of
    writing a tombstone that matches nothing (r11 ADVICE)."""
    from kafka_connect_hdfs_spark.snapshots import (
        delete_rows, read_snapshot,
    )

    path = _three_commits(spark, tmp_path, "t_dtype")
    # int keys → long table key: lossless, accepted, and effective
    delete_rows(
        spark, path, spark.createDataFrame([(4,)], "k int"), "k",
        now=lambda: 3000,
    )
    assert {r["k"] for r in read_snapshot(spark, path).collect()} == (
        set(range(20)) - {4}
    )
    # non-numeric strings → long: try_cast NULLs them — refuse loudly
    with pytest.raises(TypeError, match="losslessly"):
        delete_rows(
            spark, path, spark.createDataFrame([("x",)], "k string"), "k",
            now=lambda: 4000,
        )
    # a key column the table does not have: refuse at write time (fresh
    # table — on the existing one the equality-schema conflict fires
    # first, which is the right precedence)
    path2 = _three_commits(spark, tmp_path, "t_dtype2")
    with pytest.raises(ValueError, match="not a column"):
        delete_rows(
            spark, path2, spark.createDataFrame([(1,)], "nope long"), "nope",
            now=lambda: 5000,
        )


def test_apply_deletes_respects_scope_of_reinserted_keys(spark, tmp_path):
    """Compaction must honor sequence scopes: a key deleted then
    RE-APPENDED lives in a dir outside the tombstone's scope — that dir
    is never probed, never rewritten, and the new copy survives the
    copy-on-write fold."""
    import os

    from kafka_connect_hdfs_spark.snapshots import (
        _read_manifest, apply_deletes, commit_snapshot, delete_rows,
        read_snapshot,
    )

    path = _three_commits(spark, tmp_path, "t_cow_scope")
    delete_rows(
        spark, path, spark.createDataFrame([(3,), (15,)], "k long"), "k",
        now=lambda: 3000,
    )  # v3, scope = {v1, v2}
    commit_snapshot(
        spark,
        spark.range(15, 17).select(
            F.col("id").alias("k"), F.lit("c").alias("src")
        ),
        path, mode="append", now=lambda: 4000,
    )  # v4 re-inserts 15
    v4_listing = {
        (f, os.stat(os.path.join(path, "data", "v4", f)).st_ino)
        for f in os.listdir(os.path.join(path, "data", "v4"))
        if not f.startswith((".", "_"))
    }
    info = apply_deletes(spark, path, now=lambda: 5000)
    # v1 and v2 each held a doomed key; v4 (out of scope) untouched
    assert info["n_dirs_rewritten"] == 2
    assert info["n_dirs_untouched"] == 1
    after = {
        (f, os.stat(os.path.join(path, "data", "v4", f)).st_ino)
        for f in os.listdir(os.path.join(path, "data", "v4"))
        if not f.startswith((".", "_"))
    }
    assert after == v4_listing  # inode-identical
    man = _read_manifest(spark, path, info["version"])
    assert not man.get("deletes") and not man.get("delete_scopes")
    rows = read_snapshot(spark, path).collect()
    ks = sorted(r["k"] for r in rows)
    # 3 gone; 15's old copy gone, NEW copy (src c) alive; 16 twice
    assert ks == sorted(list(set(range(20)) - {3, 15}) + [15, 16])
    assert {r["src"] for r in rows if r["k"] == 15} == {"c"}


def test_snapshot_audit_tombstone_aware(spark, tmp_path):
    """n_rows reports the LIVE (tombstone-applied) count, n_deleted_keys
    the distinct tombstoned keys, and a vanished _tombstones dir still
    referenced by a manifest audits as missing/unreadable (r11 ADVICE)."""
    import shutil

    from kafka_connect_hdfs_spark.snapshots import (
        delete_rows, snapshot_audit,
    )

    path = _three_commits(spark, tmp_path, "t_audit_tomb")
    delete_rows(
        spark, path, spark.createDataFrame([(3,), (15,)], "k long"), "k",
        now=lambda: 3000,
    )  # v3
    got = {
        r["version"]: (
            r["n_data_dirs"], r["n_missing_dirs"], r["n_rows"],
            r["n_deleted_keys"],
        )
        for r in snapshot_audit(spark, path).collect()
    }
    assert got[1] == (1, 0, 10, 0)
    assert got[2] == (2, 0, 20, 0)
    assert got[3] == (2, 0, 18, 2)  # LIVE rows, not physical 20
    shutil.rmtree(str(tmp_path / "t_audit_tomb" / "_tombstones" / "v3"))
    got2 = {
        r["version"]: (r["n_missing_dirs"], r["n_rows"], r["n_deleted_keys"])
        for r in snapshot_audit(spark, path).collect()
    }
    assert got2[3] == (1, None, None)  # unreadable, not "healthy"
    assert got2[2] == (0, 20, 0)


# ---------------------------------------------------------------------------
# Baseline JPEG codec (r11 VERDICT item 3) — DC-exact tier + AC path +
# the same truncation/corruption hardening battery as the PNG set


import numpy as np


def _jpeg_fixture(did):
    from kafka_connect_hdfs_spark.operators.multimodal import (
        encode_jpeg_gray,
    )

    w, h = 4 + did % 13, 3 + did % 9
    yy, xx = np.mgrid[0:h, 0:w]
    px = ((did * 31 + (xx // 8) * 7 + (yy // 8) * 13) % 256).astype(np.uint8)
    return w, h, px, encode_jpeg_gray(w, h, px)


def test_jpeg_dc_tier_exact_roundtrip():
    """Block-constant rasters (the fixture tier) must decode BIT-EXACTLY:
    q0=8 makes the quantized DC equal v−128 and the DC-only closed form
    reproduces v — across every (w, h) the corpus generator emits."""
    from kafka_connect_hdfs_spark.operators.multimodal import decode_jpeg

    for did in range(6, 6 + 8 * 120, 8):  # 120 ids: all 13×9 dim combos
        w, h, px, data = _jpeg_fixture(did)
        dw, dh, out = decode_jpeg(data)
        assert (dw, dh) == (w, h)
        assert (out == px).all(), did


def test_jpeg_ac_path_matches_float_reference():
    """Non-flat blocks exercise the AC Huffman coding and the
    fixed-point integer IDCT; an INDEPENDENT float pipeline (numpy DCT →
    quantize → dequantize → float IDCT, written here from the spec
    formulas) must agree within ±1 on every pixel."""
    from kafka_connect_hdfs_spark.operators.multimodal import (
        _JPEG_QTABLE, decode_jpeg, encode_jpeg_gray,
    )

    w, h = 24, 17
    yy, xx = np.mgrid[0:h, 0:w]
    px = ((xx * 37 + yy * 59 + xx * yy) % 256).astype(np.uint8)
    data = encode_jpeg_gray(w, h, px)
    dw, dh, out = decode_jpeg(data)
    assert (dw, dh) == (w, h)
    # independent reference: float DCT basis from the T.81 formulas
    x = np.arange(8)
    C = np.cos((2 * x + 1) * x.reshape(8, 1) * np.pi / 16) / 2.0
    C[0, :] /= np.sqrt(2.0)
    q = np.asarray(_JPEG_QTABLE, dtype=np.float64).reshape(8, 8)
    bw, bh = (w + 7) // 8, (h + 7) // 8
    padded = np.pad(
        px.astype(np.float64) - 128.0,
        ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge",
    )
    ref = np.zeros((bh * 8, bw * 8))
    for by in range(bh):
        for bx in range(bw):
            b = padded[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
            dq = np.round((C @ b @ C.T) / q) * q
            ref[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = C.T @ dq @ C
    ref = np.clip(np.round(ref) + 128, 0, 255)[:h, :w]
    assert np.abs(out.astype(np.int64) - ref.astype(np.int64)).max() <= 1
    # the AC path was actually taken: the image is not block-constant
    assert np.abs(np.diff(px.astype(int), axis=1)).max() > 0


def test_jpeg_truncation_and_corruption_raise():
    from kafka_connect_hdfs_spark.operators.multimodal import decode_jpeg

    _, _, _, data = _jpeg_fixture(14)
    # truncation at every segment boundary class
    for cut in (1, 3, 10, len(data) // 2, len(data) - 3):
        with pytest.raises(ValueError):
            decode_jpeg(data[:cut])
    # not a JPEG at all
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG\r\n\x1a\nnope")
    # progressive SOF2 must be rejected, not mis-decoded
    corrupt = bytearray(data)
    corrupt[data.index(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(corrupt))
    # 16-bit quant table precision nibble
    corrupt = bytearray(data)
    dqt_at = data.index(b"\xff\xdb")
    corrupt[dqt_at + 4] = 0x10  # pq=1
    with pytest.raises(ValueError, match="16-bit"):
        decode_jpeg(bytes(corrupt))
    # restart-interval DRI segment is outside the envelope
    dri = b"\xff\xdd\x00\x04\x00\x08"
    sos_at = data.index(b"\xff\xda")
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg(data[:sos_at] + dri + data[sos_at:])
    # a stray marker INSIDE the entropy-coded scan
    corrupt = bytearray(data)
    corrupt[-10:-8] = b"\xff\xc4"
    with pytest.raises(ValueError):
        decode_jpeg(bytes(corrupt))


def test_jpeg_variant_rejection():
    from kafka_connect_hdfs_spark.operators.multimodal import decode_jpeg

    _, _, _, data = _jpeg_fixture(30)
    sof_at = data.index(b"\xff\xc0")
    # multi-component (color) SOF
    corrupt = bytearray(data)
    corrupt[sof_at + 9] = 3  # ncomp
    with pytest.raises(ValueError, match="multi-component"):
        decode_jpeg(bytes(corrupt))
    # subsampled component
    corrupt = bytearray(data)
    corrupt[sof_at + 11] = 0x22  # sampling factors
    with pytest.raises(ValueError, match="subsampled"):
        decode_jpeg(bytes(corrupt))
    # 12-bit precision
    corrupt = bytearray(data)
    corrupt[sof_at + 4] = 12
    with pytest.raises(ValueError, match="non-8-bit"):
        decode_jpeg(bytes(corrupt))


def test_jpeg_dispatch_in_image_operators():
    """The shared image dispatch recognizes 0xFFD8 and reports
    codec='jpeg'; APPn/COM segments (e.g. JFIF headers from other
    encoders) are skipped, not fatal."""
    from kafka_connect_hdfs_spark.operators.multimodal import (
        _decode_image_gray, decode_jpeg,
    )

    w, h, px, data = _jpeg_fixture(22)
    dw, dh, gray, codec = _decode_image_gray(data)
    assert (dw, dh, codec) == (w, h, "jpeg")
    assert (gray == px.astype(np.int64)).all()
    # inject a JFIF APP0 after SOI: decode must skip it transparently
    app0 = b"\xff\xe0\x00\x10JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    dw, dh, out = decode_jpeg(data[:2] + app0 + data[2:])
    assert (out == px).all()


# ---------------------------------------------------------------------------
# AVI/MJPEG video codec (r12) — the video modality made real


def _avi_fixture(did):
    from kafka_connect_hdfs_spark.operators.multimodal import (
        encode_avi_mjpeg,
    )

    w, h = 4 + did % 13, 3 + did % 9
    n = 2 + did % 4
    yy, xx = np.mgrid[0:h, 0:w]
    frames = [
        ((did * 31 + f * 17 + (xx // 8) * 7 + (yy // 8) * 13) % 256)
        .astype(np.uint8)
        for f in range(n)
    ]
    return w, h, frames, encode_avi_mjpeg(w, h, frames)


def test_avi_mjpeg_dc_tier_exact_roundtrip():
    from kafka_connect_hdfs_spark.operators.multimodal import (
        decode_avi_mjpeg,
    )

    for did in range(0, 160):  # covers all (w, h, n) combos
        w, h, frames, data = _avi_fixture(did)
        dw, dh, out = decode_avi_mjpeg(data)
        assert (dw, dh) == (w, h) and len(out) == len(frames)
        for f, px in enumerate(frames):
            assert (out[f] == px).all(), (did, f)


def test_avi_riff_disambiguation():
    """WAV and AVI share the RIFF magic: the subtype at bytes 8-12 must
    route each to its own codec, in both directions."""
    from kafka_connect_hdfs_spark.operators.multimodal import (
        _decode, decode_avi_mjpeg, decode_wav, encode_wav_pcm16,
    )

    _, _, _, avi = _avi_fixture(7)
    wav = encode_wav_pcm16(np.arange(50, dtype=np.int16), 8000)
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        decode_avi_mjpeg(wav)
    with pytest.raises(ValueError, match="not a RIFF/WAVE"):
        decode_wav(avi)
    w, h = 4 + 7 % 13, 3 + 7 % 9
    assert _decode("video", avi) == (w, h, 2 + 7 % 4)
    assert _decode("audio", wav) == (0, 0, 50)


def test_avi_corruption_raises():
    from kafka_connect_hdfs_spark.operators.multimodal import (
        decode_avi_mjpeg,
    )

    _, _, _, data = _avi_fixture(11)
    for cut in (4, 11, 40, len(data) // 2):
        with pytest.raises(ValueError):
            decode_avi_mjpeg(data[:cut])
    # non-MJPG handler
    corrupt = bytearray(data)
    at = data.index(b"vidsMJPG")
    corrupt[at + 4:at + 8] = b"H264"
    with pytest.raises(ValueError, match="MJPG only"):
        decode_avi_mjpeg(bytes(corrupt))
    # frame-count mismatch: header claims one more frame than movi holds
    corrupt = bytearray(data)
    avih_at = data.index(b"avih") + 8
    n = int.from_bytes(data[avih_at + 16:avih_at + 20], "little")
    corrupt[avih_at + 16:avih_at + 20] = (n + 1).to_bytes(4, "little")
    with pytest.raises(ValueError, match="frame count"):
        decode_avi_mjpeg(bytes(corrupt))
    # header dims disagreeing with the per-frame JPEG dims
    corrupt = bytearray(data)
    corrupt[avih_at + 32:avih_at + 36] = (99).to_bytes(4, "little")
    with pytest.raises(ValueError, match="dims"):
        decode_avi_mjpeg(bytes(corrupt))


def test_video_frame_stats_stub_on_non_avi(spark):
    from kafka_connect_hdfs_spark.operators.multimodal import (
        video_frame_stats,
    )

    df = spark.createDataFrame(
        [(1, b"definitely not a video")], "media_id long, payload binary"
    )
    rows = video_frame_stats(df).collect()
    assert len(rows) == 1
    assert rows[0]["decode_ok"] == "stub" and rows[0]["val_sum"] is None


# ---------------------------------------------------------------------------
# MP4 / MP3 container probes (r12) — only sample decode remains stubbed


def test_probe_mp4_roundtrip_and_corruption():
    from kafka_connect_hdfs_spark.operators.multimodal import (
        encode_mp4_stub, probe_mp4,
    )

    data = encode_mp4_stub(
        12_345, [("vide", 640, 360), ("soun", 0, 0)]
    )
    meta = probe_mp4(data)
    assert meta == {
        "duration_ms": 12_345, "n_tracks": 2,
        "track_types": ["vide", "soun"], "width": 640, "height": 360,
    }
    with pytest.raises(ValueError, match="not an ISO-BMFF"):
        probe_mp4(b"RIFFxxxxWAVE")
    for cut in (10, 40, len(data) - 9):
        with pytest.raises(ValueError):
            probe_mp4(data[:cut])
    # a moov-less file (just the ftyp box) is outside the envelope
    with pytest.raises(ValueError, match="moov"):
        probe_mp4(data[:int.from_bytes(data[:4], "big")])


def test_probe_mp3_frame_walk():
    from kafka_connect_hdfs_spark.operators.multimodal import (
        encode_mp3_stub, probe_mp3,
    )

    data = encode_mp3_stub(25, bitrate_kbps=128, sample_rate=44100)
    meta = probe_mp3(data)
    assert meta["n_frames"] == 25
    assert meta["bitrate_kbps"] == 128 and meta["sample_rate"] == 44100
    assert meta["duration_ms"] == 25 * 1152 * 1000 // 44100
    # ID3v2 prefix skips transparently
    id3 = b"ID3\x03\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10
    assert probe_mp3(id3 + data)["n_frames"] == 25
    # truncated mid-frame / garbage / sync loss all raise
    with pytest.raises(ValueError, match="truncated"):
        probe_mp3(data[:-10])
    with pytest.raises(ValueError, match="sync"):
        probe_mp3(b"\x00\x01\x02\x03" + data)
    with pytest.raises(ValueError):
        probe_mp3(b"")


def test_null_census_swapped_collision(spark):
    # a_col named 'b' AND b_col named 'a': the select SWAPS the names, so
    # a post-select filter reads each check against the opposite column —
    # the sharpest variant of the collision
    df = _collides_fixture(spark)
    out = quality.chi2_independence(df, "a", "b").collect()
    ref = quality.chi2_independence(
        df.select(F.col("a").alias("c1"), F.col("b").alias("c2")),
        "c1", "c2",
    ).collect()
    assert out == ref
