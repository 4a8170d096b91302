"""Round-13 additions (r12 VERDICT items 2-4 + ADVICE): sequence
WATERMARKS replacing dir-list delete scopes (O(dirs) manifests),
changelog_scan across overwrite boundaries, the lossy-cast round-trip
guard, and legacy-manifest compatibility of the change feed."""

import json as _json

import pytest
from pyspark.sql import functions as F


def _strip_crc(man_file):
    """Drop Hadoop LocalFileSystem's checksum sidecar after an
    out-of-band manifest edit (reads would fail ChecksumException)."""
    crc = man_file.parent / f".{man_file.name}.crc"
    if crc.exists():
        crc.unlink()


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


# ---------------------------------------------------------------------------
# Sequence watermarks (r12 VERDICT item 2 — Iceberg v2 data-sequence-
# number semantics replacing the O(tombstones x dirs) dir-list scopes)


def test_watermark_scope_equivalent_to_list_scope(spark, tmp_path):
    """The watermark form and the r11/r12 dir-LIST form are the same
    semantics: rewriting a watermark manifest into the legacy list form
    changes no visible row — re-inserted keys stay visible, in-scope
    copies stay dead — and legacy manifests keep reading unmigrated."""
    from kafka_connect_hdfs_spark.snapshots import (
        commit_snapshot, delete_rows, read_snapshot,
    )

    path = _three_commits(spark, tmp_path, "t_wmk_equiv")
    delete_rows(
        spark, path, spark.createDataFrame([(3,), (15,)], "k long"), "k",
        now=lambda: 3000,
    )  # v3, watermark scope = {v1, v2}
    commit_snapshot(
        spark,
        spark.range(15, 17).select(
            F.col("id").alias("k"), F.lit("c").alias("src")
        ),
        path, mode="append", now=lambda: 4000,
    )  # v4 re-inserts 15
    want = sorted(
        (r["k"], r["src"]) for r in read_snapshot(spark, path).collect()
    )
    assert (15, "c") in want and (3, "a") not in want
    # rewrite v4's manifest into the legacy list-scope format: drop the
    # watermarks, record the tombstone's scope as an explicit dir list
    man_file = tmp_path / "t_wmk_equiv" / "_snapshots" / "v4.json"
    man = _json.loads(man_file.read_text())
    tomb = man["deletes"][0]
    scope_dirs = [
        d for d, s in zip(man["files"], man["file_seqs"])
        if s is not None and s <= man["delete_seqs"][0]
    ]
    del man["file_seqs"], man["delete_seqs"], man["seq"]
    man["delete_scopes"] = {tomb: scope_dirs}
    man_file.write_text(_json.dumps(man))
    _strip_crc(man_file)
    got = sorted(
        (r["k"], r["src"]) for r in read_snapshot(spark, path).collect()
    )
    assert got == want


def test_manifest_size_stays_linear_in_dirs(spark, tmp_path):
    """The r12-verdict growth edge, closed: k delete commits add O(k)
    bytes to the manifest (one tombstone path + one int each), NOT
    O(k x dirs) — every data-dir path is serialized exactly once, and
    the legacy ``delete_scopes`` key is no longer written."""
    from kafka_connect_hdfs_spark.snapshots import (
        commit_snapshot, delete_rows, read_snapshot,
    )

    path = str(tmp_path / "t_growth")
    commit_snapshot(
        spark, spark.range(10).select(F.col("id").alias("k")), path,
        now=lambda: 1000,
    )
    for i in range(1, 8):  # 8 data dirs total
        commit_snapshot(
            spark,
            spark.range(i * 10, i * 10 + 10).select(F.col("id").alias("k")),
            path, mode="append", now=lambda: 1000 + i,
        )
    sizes = []
    for j in range(5):
        v = delete_rows(
            spark, path,
            spark.createDataFrame([(j * 10 + 1,)], "k long"), "k",
            now=lambda: 5000 + j,
        )
        man_file = tmp_path / "t_growth" / "_snapshots" / f"v{v}.json"
        text = man_file.read_text()
        man = _json.loads(text)
        assert "delete_scopes" not in man
        for d in man["files"]:
            assert text.count(d) == 1  # each dir path serialized ONCE
        sizes.append(len(text))
    # per-delete growth is one tombstone path + one int — bounded by a
    # constant, not by the 8-dir table width
    deltas = [b - a for a, b in zip(sizes, sizes[1:])]
    assert all(d < 120 for d in deltas), (sizes, deltas)
    # and the deletes actually took effect
    assert {r["k"] for r in read_snapshot(spark, path).collect()} == (
        set(range(80)) - {1, 11, 21, 31, 41}
    )


def test_delete_rows_fractional_key_refused(spark, tmp_path):
    """r12 ADVICE (medium): try_cast(4.5 AS bigint) = 4 is non-NULL, so
    the NULL-check alone would commit a tombstone deleting a row the
    caller never targeted. The round-trip guard refuses; integral
    doubles still cast losslessly and delete."""
    from kafka_connect_hdfs_spark.snapshots import (
        delete_rows, read_snapshot,
    )

    path = _three_commits(spark, tmp_path, "t_frac")
    with pytest.raises(TypeError, match="losslessly"):
        delete_rows(
            spark, path, spark.createDataFrame([(4.5,)], "k double"), "k",
            now=lambda: 3000,
        )
    # nothing was committed by the refusal
    assert {r["k"] for r in read_snapshot(spark, path).collect()} == set(
        range(20)
    )
    delete_rows(
        spark, path, spark.createDataFrame([(4.0,)], "k double"), "k",
        now=lambda: 4000,
    )
    assert {r["k"] for r in read_snapshot(spark, path).collect()} == (
        set(range(20)) - {4}
    )


# ---------------------------------------------------------------------------
# changelog_scan: legacy-manifest inserts + overwrite boundaries
# (r12 ADVICE low / VERDICT item 3)


def test_changelog_legacy_unscoped_tombstone_hides_insert(spark, tmp_path):
    """On a table whose manifests predate scope tracking, tombstones
    apply to EVERY dir — including post-delete appends. The feed's
    inserts must hide what read_snapshot hides (r12 ADVICE): a mirror
    built from the feed may not diverge from the snapshot."""
    from kafka_connect_hdfs_spark.snapshots import (
        changelog_scan, commit_snapshot, delete_rows, read_snapshot,
    )

    path = _three_commits(spark, tmp_path, "t_legacy_cdf")
    delete_rows(
        spark, path, spark.createDataFrame([(3,), (15,)], "k long"), "k",
        now=lambda: 3000,
    )  # v3
    commit_snapshot(
        spark,
        spark.range(15, 17).select(
            F.col("id").alias("k"), F.lit("c").alias("src")
        ),
        path, mode="append", now=lambda: 4000,
    )  # v4 re-appends 15
    # strip ALL scoping metadata from every manifest → legacy table
    for v in (3, 4):
        man_file = tmp_path / "t_legacy_cdf" / "_snapshots" / f"v{v}.json"
        man = _json.loads(man_file.read_text())
        for k in ("file_seqs", "delete_seqs", "delete_scopes", "seq"):
            man.pop(k, None)
        man_file.write_text(_json.dumps(man))
        _strip_crc(man_file)
    live = {r["k"] for r in read_snapshot(spark, path).collect()}
    assert live == set(range(20)) - {3, 15}  # unscoped: 15 stays dead
    feed = changelog_scan(spark, path, 1, 4).collect()
    v4_ins = {r["k"] for r in feed
              if r["change_type"] == "insert" and r["change_version"] == 4}
    assert v4_ins == {16}  # 15 is tombstoned on a legacy table — hidden
    # mirror replay lands on the snapshot
    from collections import Counter

    mirror = Counter(
        (r["k"], r["src"]) for r in read_snapshot(spark, path, 1).collect()
    )
    for v in (2, 3, 4):
        for r in feed:
            if r["change_version"] == v and r["change_type"] == "insert":
                mirror[(r["k"], r["src"])] += 1
        for r in feed:
            if r["change_version"] == v and r["change_type"] == "delete":
                mirror[(r["k"], r["src"])] -= 1
    assert +mirror == Counter(
        (r["k"], r["src"]) for r in read_snapshot(spark, path).collect()
    )


def _replay(feed, start_rows, cols=("k", "src")):
    """Apply a changelog feed to a starting multiset, per version:
    inserts then deletes (disjoint row images, so order within a
    version cannot matter)."""
    from collections import Counter

    mirror = Counter(tuple(r[c] for c in cols) for r in start_rows)
    for v in sorted({r["change_version"] for r in feed}):
        for r in feed:
            if r["change_version"] == v and r["change_type"] == "insert":
                mirror[tuple(r[c] for c in cols)] += 1
        for r in feed:
            if r["change_version"] == v and r["change_type"] == "delete":
                mirror[tuple(r[c] for c in cols)] -= 1
    return +mirror


def test_changelog_diff_across_overwrite(spark, tmp_path):
    """on_overwrite='diff' (r12 VERDICT item 3 — Delta CDF REPLACE
    semantics): an overwrite mid-range emits net full row images (old
    minus new as deletes, new minus old as inserts) and the mirror
    replay lands exactly on read_snapshot(v_to); the default still
    refuses."""
    from collections import Counter

    from kafka_connect_hdfs_spark.snapshots import (
        changelog_scan, commit_snapshot, delete_rows, read_snapshot,
    )

    path = _three_commits(spark, tmp_path, "t_diff_ow")
    delete_rows(
        spark, path, spark.createDataFrame([(7,)], "k long"), "k",
        now=lambda: 3000,
    )  # v3
    # v4 OVERWRITE: keeps 0-4 (src a, surviving the old state) + new o-rows
    ow = spark.range(5).select(
        F.col("id").alias("k"), F.lit("a").alias("src")
    ).unionByName(
        spark.range(100, 103).select(
            F.col("id").alias("k"), F.lit("o").alias("src")
        )
    )
    commit_snapshot(spark, ow, path, now=lambda: 4000)  # v4
    commit_snapshot(
        spark,
        spark.range(200, 202).select(
            F.col("id").alias("k"), F.lit("p").alias("src")
        ),
        path, mode="append", now=lambda: 5000,
    )  # v5
    with pytest.raises(ValueError, match="on_overwrite"):
        changelog_scan(spark, path, 1, 5)
    feed = changelog_scan(spark, path, 1, 5, on_overwrite="diff").collect()
    # the boundary's net images: rows 0-4/src a survive the overwrite →
    # neither inserted nor deleted at v4
    v4_del = {(r["k"], r["src"]) for r in feed
              if r["change_version"] == 4 and r["change_type"] == "delete"}
    v4_ins = {(r["k"], r["src"]) for r in feed
              if r["change_version"] == 4 and r["change_type"] == "insert"}
    assert v4_del == {(k, "a") for k in range(5, 10) if k != 7} | {
        (k, "b") for k in range(10, 20)
    }
    assert v4_ins == {(k, "o") for k in (100, 101, 102)}
    mirror = _replay(feed, read_snapshot(spark, path, 1).collect())
    assert mirror == Counter(
        (r["k"], r["src"]) for r in read_snapshot(spark, path, 5).collect()
    )


def test_changelog_diff_across_rollback_and_duplicates(spark, tmp_path):
    """The diff boundary is a MULTISET diff: a rollback that halves a
    duplicated row's count emits exactly the lost copies as deletes,
    and the replay still lands on the target snapshot."""
    from collections import Counter

    from kafka_connect_hdfs_spark.snapshots import (
        changelog_scan, commit_snapshot, read_snapshot, rollback_snapshot,
    )

    path = str(tmp_path / "t_diff_rb")
    dup = spark.createDataFrame([(1, "a"), (2, "a")], "k long, src string")
    commit_snapshot(spark, dup, path, now=lambda: 1000)  # v1
    commit_snapshot(spark, dup, path, mode="append", now=lambda: 2000)  # v2
    rollback_snapshot(spark, path, 1, now=lambda: 3000)  # v3 → back to v1
    feed = changelog_scan(spark, path, 1, 3, on_overwrite="diff").collect()
    by = Counter(
        (r["change_version"], r["change_type"], r["k"]) for r in feed
    )
    # v2 inserted one copy of each; v3's rollback removed exactly one
    assert by[(2, "insert", 1)] == 1 and by[(2, "insert", 2)] == 1
    assert by[(3, "delete", 1)] == 1 and by[(3, "delete", 2)] == 1
    mirror = _replay(feed, read_snapshot(spark, path, 1).collect())
    assert mirror == Counter(
        (r["k"], r["src"]) for r in read_snapshot(spark, path, 3).collect()
    )


def test_changelog_diff_preserves_appenddelete_fast_path(spark, tmp_path):
    """on_overwrite='diff' on a range with NO replace boundary emits the
    identical feed as the default — the expensive two-state diff only
    runs at actual boundaries."""
    from kafka_connect_hdfs_spark.snapshots import (
        changelog_scan, delete_rows,
    )

    path = _three_commits(spark, tmp_path, "t_diff_fast")
    delete_rows(
        spark, path, spark.createDataFrame([(3,)], "k long"), "k",
        now=lambda: 3000,
    )
    a = sorted(
        (r["k"], r["src"], r["change_type"], r["change_version"])
        for r in changelog_scan(spark, path, 1, 3).collect()
    )
    b = sorted(
        (r["k"], r["src"], r["change_type"], r["change_version"])
        for r in changelog_scan(
            spark, path, 1, 3, on_overwrite="diff"
        ).collect()
    )
    assert a == b and len(a) > 0


# ---------------------------------------------------------------------------
# JPEG decode envelope (r12 ADVICE low): corrupt SOF0 dims must reject
# cheaply, never allocate a multi-GiB raster


def test_jpeg_oversized_dims_rejected_before_allocation():
    import numpy as np

    from kafka_connect_hdfs_spark.operators.multimodal import (
        decode_jpeg, encode_jpeg_gray,
    )

    data = encode_jpeg_gray(8, 8, np.zeros((8, 8), np.uint8))
    sof_at = data.index(b"\xff\xc0")
    # 65535x65535 claim (~4 GiB padded raster) on a ~100-byte payload
    corrupt = bytearray(data)
    corrupt[sof_at + 5:sof_at + 9] = b"\xff\xff\xff\xff"
    with pytest.raises(ValueError, match="envelope|too short"):
        decode_jpeg(bytes(corrupt))
    # a claim INSIDE the 64 MP envelope but impossible for the scan
    # bytes (1024x1024 needs >=4 KiB of scan data at 2 bits/block)
    corrupt2 = bytearray(data)
    corrupt2[sof_at + 5:sof_at + 9] = b"\x04\x00\x04\x00"
    with pytest.raises(ValueError, match="too short"):
        decode_jpeg(bytes(corrupt2))


# ---------------------------------------------------------------------------
# Changelog mirror consumer (r12 VERDICT item 4a): the downstream
# replica maintained from the feed must always equal read_snapshot


def test_changelog_mirror_sync_matches_snapshot(spark, tmp_path):
    from collections import Counter

    from kafka_connect_hdfs_spark.snapshots import (
        commit_snapshot, delete_rows, read_snapshot,
    )
    from kafka_connect_hdfs_spark.streaming.changelog import (
        last_synced_version, sync_changelog_mirror,
    )

    src = _three_commits(spark, tmp_path, "t_mirror_src")
    mirror = str(tmp_path / "t_mirror")

    def _census(df):
        return Counter((r["k"], r["src"]) for r in df.collect())

    # bootstrap tick: full copy of latest
    info = sync_changelog_mirror(spark, src, mirror)
    assert info["bootstrapped"] and info["to_version"] == 2
    assert _census(spark.read.parquet(mirror)) == _census(
        read_snapshot(spark, src)
    )
    # idle tick: marker-guarded no-op
    info = sync_changelog_mirror(spark, src, mirror)
    assert not info["bootstrapped"]
    assert info["from_version"] == info["to_version"] == 2
    # incremental: a delete and a re-insert land through the feed
    delete_rows(
        spark, src, spark.createDataFrame([(3,), (15,)], "k long"), "k",
        now=lambda: 3000,
    )  # v3
    commit_snapshot(
        spark,
        spark.range(15, 17).select(
            F.col("id").alias("k"), F.lit("c").alias("src")
        ),
        src, mode="append", now=lambda: 4000,
    )  # v4
    info = sync_changelog_mirror(spark, src, mirror)
    assert (info["from_version"], info["to_version"]) == (2, 4)
    assert last_synced_version(spark, mirror) == 4
    assert _census(spark.read.parquet(mirror)) == _census(
        read_snapshot(spark, src)
    )


def test_changelog_mirror_across_overwrite(spark, tmp_path):
    """With on_overwrite='diff' the mirror replays straight through a
    replace commit and still equals the snapshot; the default refuses
    (and leaves the mirror untouched)."""
    from collections import Counter

    from kafka_connect_hdfs_spark.snapshots import (
        commit_snapshot, read_snapshot,
    )
    from kafka_connect_hdfs_spark.streaming.changelog import (
        sync_changelog_mirror,
    )

    src = _three_commits(spark, tmp_path, "t_mirror_ow_src")
    mirror = str(tmp_path / "t_mirror_ow")
    sync_changelog_mirror(spark, src, mirror)
    commit_snapshot(
        spark,
        spark.range(100, 104).select(
            F.col("id").alias("k"), F.lit("o").alias("src")
        ),
        src, now=lambda: 3000,
    )  # v3 overwrite
    before = sorted(
        (r["k"], r["src"]) for r in spark.read.parquet(mirror).collect()
    )
    with pytest.raises(ValueError, match="on_overwrite"):
        sync_changelog_mirror(spark, src, mirror)
    assert before == sorted(
        (r["k"], r["src"]) for r in spark.read.parquet(mirror).collect()
    )
    info = sync_changelog_mirror(spark, src, mirror, on_overwrite="diff")
    assert (info["from_version"], info["to_version"]) == (2, 3)
    assert Counter(
        (r["k"], r["src"]) for r in spark.read.parquet(mirror).collect()
    ) == Counter(
        (r["k"], r["src"]) for r in read_snapshot(spark, src).collect()
    )


def test_changelog_mirror_foreachbatch_lane(spark, tmp_path):
    """The streaming wrapper: any trigger stream drives marker-guarded
    sync ticks; after the run the mirror equals the snapshot."""
    from collections import Counter

    from kafka_connect_hdfs_spark.snapshots import (
        delete_rows, read_snapshot,
    )
    from kafka_connect_hdfs_spark.streaming.changelog import (
        start_changelog_mirror, sync_changelog_mirror,
    )

    src = _three_commits(spark, tmp_path, "t_mirror_fb_src")
    mirror = str(tmp_path / "t_mirror_fb")
    sync_changelog_mirror(spark, src, mirror)  # bootstrap
    delete_rows(
        spark, src, spark.createDataFrame([(7,)], "k long"), "k",
        now=lambda: 3000,
    )
    ticks = str(tmp_path / "ticks")
    spark.range(3).write.parquet(ticks)  # 3 trigger rows -> >=1 batch
    q = start_changelog_mirror(
        spark.readStream.schema("id long").parquet(ticks),
        src, mirror, str(tmp_path / "chk"),
    )
    q.awaitTermination(120)
    assert Counter(
        (r["k"], r["src"]) for r in spark.read.parquet(mirror).collect()
    ) == Counter(
        (r["k"], r["src"]) for r in read_snapshot(spark, src).collect()
    )


# ---------------------------------------------------------------------------
# Container probe gate plumbing (r12 VERDICT item 5)


def test_container_probe_dispatch_and_stub(spark):
    """The probe operator routes ftyp -> MP4, frame-sync/ID3 -> MP3,
    anything else to the honest stub row."""
    from kafka_connect_hdfs_spark.operators.multimodal import (
        container_probe_stats, encode_mp3_stub, encode_mp4_stub,
    )

    mp4 = encode_mp4_stub(2000, [("vide", 320, 240)])
    mp3 = encode_mp3_stub(5, bitrate_kbps=128, sample_rate=44100)
    id3 = b"ID3\x03\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10 + mp3
    rows = container_probe_stats(
        spark.createDataFrame(
            [(1, bytearray(mp4)), (2, bytearray(mp3)),
             (3, bytearray(id3)), (4, bytearray(b"garbage")),
             (5, bytearray(mp4[:20]))],
            "media_id long, payload binary",
        )
    ).collect()
    by = {r["media_id"]: r for r in rows}
    assert by[1]["kind"] == "mp4" and by[1]["duration_ms"] == 2000
    assert by[1]["track_types"] == "vide" and by[1]["width"] == 320
    assert by[2]["kind"] == "mp3" and by[2]["n_frames"] == 5
    assert by[3]["kind"] == "mp3" and by[3]["n_frames"] == 5  # ID3 skip
    assert by[4]["kind"] == "stub" and by[4]["duration_ms"] is None
    assert by[5]["kind"] == "stub"  # truncated MP4: honest rejection


def test_clone_seq_continuation_scopes_new_deletes(spark, tmp_path):
    """The clone continues the SOURCE's seq counter: a delete committed
    ON THE CLONE outranks every carried dir (including dirs the source
    added after earlier deletes), while the clone's own later appends
    outrank that delete — the full watermark ordering survives the
    clone boundary."""
    from kafka_connect_hdfs_spark.snapshots import (
        clone_table, commit_snapshot, delete_rows, read_snapshot,
    )

    src = _three_commits(spark, tmp_path, "t_cloneseq_src")
    delete_rows(
        spark, src, spark.createDataFrame([(4,)], "k long"), "k",
        now=lambda: 3000,
    )  # src v3 (seq 3)
    commit_snapshot(
        spark,
        spark.range(20, 22).select(
            F.col("id").alias("k"), F.lit("c").alias("src")
        ),
        src, mode="append", now=lambda: 4000,
    )  # src v4 (seq 4) — dirs newer than src's tombstone
    dst = str(tmp_path / "t_cloneseq_dst")
    clone_table(spark, src, dst, now=lambda: 5000)  # clone seq = 4
    # delete ON THE CLONE: must reach the carried v4 dir (seq 4 <= 5)
    delete_rows(
        spark, dst, spark.createDataFrame([(20,), (7,)], "k long"), "k",
        now=lambda: 6000,
    )  # clone seq 5
    # clone's own append after its delete: newer, stays visible
    commit_snapshot(
        spark,
        spark.createDataFrame([(7, "re")], "k long, src string"),
        dst, mode="append", now=lambda: 7000,
    )  # clone seq 6
    rows = read_snapshot(spark, dst).collect()
    ks = sorted(r["k"] for r in rows)
    # 4 dead (src tombstone carried), 20 dead (clone delete reached the
    # carried post-src-delete dir), 7's old copy dead but re-insert alive
    assert ks == sorted(set(range(20)) - {4, 7, 20} | {7, 21}), ks
    assert {r["src"] for r in rows if r["k"] == 7} == {"re"}
    # the source never observes any of it
    assert sorted(
        r["k"] for r in read_snapshot(spark, src).collect()
    ) == sorted(set(range(22)) - {4})


# ---------------------------------------------------------------------------
# Atomic row-delta commit + the O(delta) snapshot-table mirror


def test_commit_changes_row_delta_semantics(spark, tmp_path):
    """ONE commit carrying inserts + equality deletes: pre-existing
    copies of the deleted keys die, the commit's OWN inserts survive
    their own tombstone (strict seq rule), pure appends and pure
    deletes degrade correctly, and the whole delta is one version."""
    from kafka_connect_hdfs_spark.snapshots import (
        commit_changes, read_snapshot, snapshot_history,
    )

    path = _three_commits(spark, tmp_path, "t_rowdelta")
    ins = spark.createDataFrame(
        [(4, "new"), (99, "new")], "k long, src string"
    )
    dels = spark.createDataFrame([(4,), (7,)], "k long")
    v = commit_changes(spark, path, ins, dels, "k", now=lambda: 3000)
    assert v == 3
    rows = read_snapshot(spark, path).collect()
    by = {}
    for r in rows:
        by.setdefault(r["k"], []).append(r["src"])
    assert by[4] == ["new"]          # updated: old copy dead, new alive
    assert 7 not in by               # pure delete
    assert by[99] == ["new"]         # pure insert
    assert by[5] == ["a"]            # untouched
    # time travel: v2 still shows the old state
    old = {r["k"]: r["src"] for r in read_snapshot(spark, path, 2).collect()}
    assert old[4] == "a" and old[7] == "a" and 99 not in old
    # pure-append / pure-delete degradations
    v = commit_changes(
        spark, path,
        spark.createDataFrame([(100, "p")], "k long, src string"),
        None, "k", now=lambda: 4000,
    )
    assert v == 4
    v = commit_changes(
        spark, path, None,
        spark.createDataFrame([(100,)], "k long"), "k", now=lambda: 5000,
    )
    assert v == 5
    ks = {r["k"] for r in read_snapshot(spark, path).collect()}
    assert 100 not in ks
    # both-empty is a no-op, not a commit
    assert commit_changes(
        spark, path,
        spark.createDataFrame([], "k long, src string"),
        spark.createDataFrame([], "k long"), "k", now=lambda: 6000,
    ) == 5
    assert [r["version"] for r in snapshot_history(spark, path).collect()] \
        == [1, 2, 3, 4, 5]


def test_commit_changes_dtype_guard_and_properties(spark, tmp_path):
    from kafka_connect_hdfs_spark.snapshots import (
        commit_changes, latest_property,
    )

    path = _three_commits(spark, tmp_path, "t_rowdelta_g")
    with pytest.raises(TypeError, match="losslessly"):
        commit_changes(
            spark, path, None,
            spark.createDataFrame([(4.5,)], "k double"), "k",
            now=lambda: 3000,
        )
    v = commit_changes(
        spark, path, None, spark.createDataFrame([(4,)], "k int"), "k",
        now=lambda: 4000, properties={"job": "t1"},
    )
    assert latest_property(spark, path, "job") == (v, "t1")
    assert latest_property(spark, path, "nope") is None


def test_mirror_table_sync_matches_snapshot(spark, tmp_path):
    """The O(delta) mirror: bootstrap + per-tick row-delta commits keep
    the snapshot-table replica equal to read_snapshot through appends,
    deletes, re-inserts, updates, and an overwrite boundary."""
    from kafka_connect_hdfs_spark.snapshots import (
        commit_snapshot, delete_rows, read_snapshot, snapshot_history,
    )
    from kafka_connect_hdfs_spark.streaming.changelog import (
        sync_changelog_mirror_table,
    )

    src = _three_commits(spark, tmp_path, "t_mt_src")
    mirror = str(tmp_path / "t_mt_mirror")

    def _census(p):
        return sorted(
            (r["k"], r["src"])
            for r in read_snapshot(spark, p).collect()
        )

    info = sync_changelog_mirror_table(
        spark, src, mirror, "k", now=lambda: 9000
    )
    assert info["bootstrapped"] and info["mirror_version"] == 1
    assert _census(mirror) == _census(src)
    # idle tick: no new commit
    info = sync_changelog_mirror_table(
        spark, src, mirror, "k", now=lambda: 9001
    )
    assert info["mirror_version"] is None
    # delta: delete 3+15, re-append 15 (update), append 20
    delete_rows(
        spark, src, spark.createDataFrame([(3,), (15,)], "k long"), "k",
        now=lambda: 3000,
    )
    commit_snapshot(
        spark,
        spark.createDataFrame(
            [(15, "c"), (20, "c")], "k long, src string"
        ),
        src, mode="append", now=lambda: 4000,
    )
    info = sync_changelog_mirror_table(
        spark, src, mirror, "k", now=lambda: 9002
    )
    assert (info["from_version"], info["to_version"]) == (2, 4)
    assert info["mirror_version"] == 2  # ONE commit for the whole delta
    assert _census(mirror) == _census(src)
    # overwrite boundary with diff mode
    commit_snapshot(
        spark,
        spark.createDataFrame(
            [(1, "o"), (15, "o"), (50, "o")], "k long, src string"
        ),
        src, now=lambda: 5000,
    )
    with pytest.raises(ValueError, match="on_overwrite"):
        sync_changelog_mirror_table(
            spark, src, mirror, "k", now=lambda: 9003
        )
    info = sync_changelog_mirror_table(
        spark, src, mirror, "k", on_overwrite="diff", now=lambda: 9004
    )
    assert _census(mirror) == _census(src) == [
        (1, "o"), (15, "o"), (50, "o")
    ]
    # crash-replay equivalence: a re-tick after the marker landed is a
    # no-op (the marker rode the same manifest rename as the data)
    before = [r["version"]
              for r in snapshot_history(spark, mirror).collect()]
    info = sync_changelog_mirror_table(
        spark, src, mirror, "k", now=lambda: 9005
    )
    assert info["mirror_version"] is None
    assert [r["version"]
            for r in snapshot_history(spark, mirror).collect()] == before


def test_mirror_table_net_zero_key_inside_range(spark, tmp_path):
    """A key inserted AND deleted between two syncs must not appear in
    the mirror (the netting keeps the tombstone from missing it and
    the same-commit insert rule from resurrecting it)."""
    from kafka_connect_hdfs_spark.snapshots import (
        commit_snapshot, delete_rows, read_snapshot,
    )
    from kafka_connect_hdfs_spark.streaming.changelog import (
        sync_changelog_mirror_table,
    )

    src = _three_commits(spark, tmp_path, "t_mt_nz_src")
    mirror = str(tmp_path / "t_mt_nz_mirror")
    sync_changelog_mirror_table(spark, src, mirror, "k", now=lambda: 9000)
    commit_snapshot(
        spark, spark.createDataFrame([(77, "x")], "k long, src string"),
        src, mode="append", now=lambda: 3000,
    )
    delete_rows(
        spark, src, spark.createDataFrame([(77,), (5,)], "k long"), "k",
        now=lambda: 4000,
    )
    sync_changelog_mirror_table(spark, src, mirror, "k", now=lambda: 9001)
    ks = {r["k"] for r in read_snapshot(spark, mirror).collect()}
    assert 77 not in ks and 5 not in ks
    assert ks == {r["k"] for r in read_snapshot(spark, src).collect()}


def test_changelog_scan_across_expired_intermediates(spark, tmp_path):
    """Expired versions inside the range: changes attribute to the
    first SURVIVING version at-or-after the commit and the replay
    still lands on the snapshot (the docstring's claim, pinned)."""
    from collections import Counter

    from kafka_connect_hdfs_spark.snapshots import (
        changelog_scan, commit_snapshot, delete_rows, expire_snapshots,
        read_snapshot,
    )

    path = _three_commits(spark, tmp_path, "t_cdf_expire")
    delete_rows(
        spark, path, spark.createDataFrame([(3,)], "k long"), "k",
        now=lambda: 3000,
    )  # v3
    commit_snapshot(
        spark,
        spark.range(30, 33).select(
            F.col("id").alias("k"), F.lit("d").alias("src")
        ),
        path, mode="append", now=lambda: 4000,
    )  # v4
    commit_snapshot(
        spark,
        spark.range(40, 42).select(
            F.col("id").alias("k"), F.lit("e").alias("src")
        ),
        path, mode="append", now=lambda: 5000,
    )  # v5
    start = Counter(
        (r["k"], r["src"]) for r in read_snapshot(spark, path, 2).collect()
    )
    expired = expire_snapshots(spark, path, keep_last=4)
    assert expired == [1]  # v2..v5 survive; range 2..5 has a gap-free
    # baseline, but v3's tombstone and v4's dir diffs still reconstruct
    feed = changelog_scan(spark, path, 2, 5).collect()
    final = Counter(
        (r["k"], r["src"]) for r in read_snapshot(spark, path, 5).collect()
    )
    # replay applied on top of the v2 census must land on v5
    mirror = Counter(start)
    for v in sorted({r["change_version"] for r in feed}):
        for r in feed:
            if r["change_version"] == v and r["change_type"] == "insert":
                mirror[(r["k"], r["src"])] += 1
        for r in feed:
            if r["change_version"] == v and r["change_type"] == "delete":
                mirror[(r["k"], r["src"])] -= 1
    assert +mirror == final
    # now expire INTO the range's middle: v4, v5 survive only
    expired = expire_snapshots(spark, path, keep_last=2)
    assert expired == [2, 3]
    feed2 = changelog_scan(spark, path, 4, 5).collect()
    assert {(r["k"], r["change_version"]) for r in feed2
            if r["change_type"] == "insert"} == {(40, 5), (41, 5)}


def test_mirror_table_marker_survives_compaction(spark, tmp_path):
    """apply_deletes on the mirror (routine tombstone folding) commits
    a manifest WITHOUT properties; the next sync must still find the
    marker by walking back — and keep applying deltas correctly."""
    from kafka_connect_hdfs_spark.snapshots import (
        apply_deletes, commit_snapshot, delete_rows, read_snapshot,
    )
    from kafka_connect_hdfs_spark.streaming.changelog import (
        sync_changelog_mirror_table,
    )

    src = _three_commits(spark, tmp_path, "t_mt_cpt_src")
    mirror = str(tmp_path / "t_mt_cpt_mirror")
    sync_changelog_mirror_table(spark, src, mirror, "k", now=lambda: 9000)
    delete_rows(
        spark, src, spark.createDataFrame([(5,)], "k long"), "k",
        now=lambda: 3000,
    )
    sync_changelog_mirror_table(spark, src, mirror, "k", now=lambda: 9001)
    # maintenance: fold the mirror's tombstones (marker-less commit)
    info = apply_deletes(spark, mirror, now=lambda: 9002)
    assert info["version"] is not None
    # idle tick resolves the marker through the compaction commit
    tick = sync_changelog_mirror_table(
        spark, src, mirror, "k", now=lambda: 9003
    )
    assert tick["mirror_version"] is None and tick["from_version"] == 3
    # and a real delta still applies on the compacted mirror
    commit_snapshot(
        spark, spark.createDataFrame([(5, "re")], "k long, src string"),
        src, mode="append", now=lambda: 4000,
    )
    sync_changelog_mirror_table(spark, src, mirror, "k", now=lambda: 9004)
    assert sorted(
        (r["k"], r["src"]) for r in read_snapshot(spark, mirror).collect()
    ) == sorted(
        (r["k"], r["src"]) for r in read_snapshot(spark, src).collect()
    )


# ---------------------------------------------------------------------------
# Contract enforcement (r13 hardening): the keyed-mirror and non-null-
# delete-key contracts FAIL FAST instead of silently diverging


def test_delete_rows_null_key_refused(spark, tmp_path):
    """A NULL delete key can never match the read-time equality
    anti-join — the delete would silently no-op. Enforced at write time
    (Iceberg's identifier-field non-null rule), for delete_rows and the
    rowdelta commit alike."""
    from kafka_connect_hdfs_spark.snapshots import (
        commit_changes, delete_rows,
    )

    path = _three_commits(spark, tmp_path, "t_nullkey")
    bad = spark.createDataFrame([(3,), (None,)], "k long")
    with pytest.raises(ValueError, match="NULL"):
        delete_rows(spark, path, bad, "k", now=lambda: 3000)
    with pytest.raises(ValueError, match="NULL"):
        commit_changes(spark, path, None, bad, "k", now=lambda: 3001)


def test_mirror_table_refuses_multiset_source(spark, tmp_path):
    """Two live rows sharing one key: the rowdelta netting would pick
    an arbitrary row_number winner — the sync must refuse and point at
    the directory/multiset form instead."""
    from kafka_connect_hdfs_spark.snapshots import commit_snapshot
    from kafka_connect_hdfs_spark.streaming.changelog import (
        sync_changelog_mirror_table,
    )

    src = _three_commits(spark, tmp_path, "t_multiset_src")
    mirror = str(tmp_path / "t_multiset_mirror")
    sync_changelog_mirror_table(spark, src, mirror, "k", now=lambda: 9000)
    commit_snapshot(
        spark,
        spark.createDataFrame(
            [(50, "x"), (50, "y")], "k long, src string"
        ),
        src, mode="append", now=lambda: 3000,
    )
    with pytest.raises(ValueError, match="not keyed"):
        sync_changelog_mirror_table(spark, src, mirror, "k", now=lambda: 9001)


def test_mirror_table_refuses_null_key_source(spark, tmp_path):
    """A NULL-keyed row's tombstone matches nothing, so the row would
    re-insert on EVERY tick and the mirror would grow without bound —
    refuse up front."""
    from kafka_connect_hdfs_spark.snapshots import commit_snapshot
    from kafka_connect_hdfs_spark.streaming.changelog import (
        sync_changelog_mirror_table,
    )

    src = _three_commits(spark, tmp_path, "t_nullsrc")
    mirror = str(tmp_path / "t_nullsrc_mirror")
    sync_changelog_mirror_table(spark, src, mirror, "k", now=lambda: 9000)
    commit_snapshot(
        spark,
        spark.createDataFrame([(None, "n")], "k long, src string"),
        src, mode="append", now=lambda: 3000,
    )
    with pytest.raises(ValueError, match="NULL"):
        sync_changelog_mirror_table(spark, src, mirror, "k", now=lambda: 9001)


def test_mirror_table_refuses_cross_version_double_insert(spark, tmp_path):
    """The key appears twice across DIFFERENT versions with no delete
    between — one live copy per key is violated even though no single
    version shows a duplicate; the feed balance check catches it."""
    from kafka_connect_hdfs_spark.snapshots import commit_snapshot
    from kafka_connect_hdfs_spark.streaming.changelog import (
        sync_changelog_mirror_table,
    )

    src = _three_commits(spark, tmp_path, "t_xver_src")
    mirror = str(tmp_path / "t_xver_mirror")
    sync_changelog_mirror_table(spark, src, mirror, "k", now=lambda: 9000)
    for ts, tag in ((3000, "x"), (4000, "y")):
        commit_snapshot(
            spark,
            spark.createDataFrame([(50, tag)], "k long, src string"),
            src, mode="append", now=lambda t=ts: t,
        )
    with pytest.raises(ValueError, match="not keyed"):
        sync_changelog_mirror_table(spark, src, mirror, "k", now=lambda: 9001)


def test_mirror_table_validate_mirror_catches_prerange_dup(spark, tmp_path):
    """The feed-invisible violation: ONE insert of a key that was
    already live before the range. validate='feed' cannot see it (and
    applies the netting); validate='mirror' refuses."""
    from kafka_connect_hdfs_spark.snapshots import commit_snapshot
    from kafka_connect_hdfs_spark.streaming.changelog import (
        sync_changelog_mirror_table,
    )

    src = _three_commits(spark, tmp_path, "t_prerange_src")
    mirror = str(tmp_path / "t_prerange_mirror")
    sync_changelog_mirror_table(spark, src, mirror, "k", now=lambda: 9000)
    commit_snapshot(  # k=5 is already live from v1
        spark,
        spark.createDataFrame([(5, "dup")], "k long, src string"),
        src, mode="append", now=lambda: 3000,
    )
    with pytest.raises(ValueError, match="already live"):
        sync_changelog_mirror_table(
            spark, src, mirror, "k", now=lambda: 9001, validate="mirror",
        )
    # and a legitimate re-insert of a DEAD key passes strict validation
    from kafka_connect_hdfs_spark.snapshots import delete_rows, read_snapshot

    src2 = _three_commits(spark, tmp_path, "t_prerange_ok")
    mirror2 = str(tmp_path / "t_prerange_ok_mirror")
    sync_changelog_mirror_table(spark, src2, mirror2, "k", now=lambda: 9000)
    delete_rows(
        spark, src2, spark.createDataFrame([(5,)], "k long"), "k",
        now=lambda: 3000,
    )
    commit_snapshot(
        spark,
        spark.createDataFrame([(5, "re")], "k long, src string"),
        src2, mode="append", now=lambda: 4000,
    )
    sync_changelog_mirror_table(
        spark, src2, mirror2, "k", now=lambda: 9001, validate="mirror",
    )
    assert sorted(
        (r["k"], r["src"]) for r in read_snapshot(spark, mirror2).collect()
    ) == sorted(
        (r["k"], r["src"]) for r in read_snapshot(spark, src2).collect()
    )


def test_changelog_mirror_foreachbatch_table_form(spark, tmp_path):
    """The streaming wrapper's snapshot-TABLE form (key_col given):
    ticks land as row-delta commits and the mirror table equals the
    source snapshot after the run."""
    from kafka_connect_hdfs_spark.snapshots import (
        delete_rows, read_snapshot,
    )
    from kafka_connect_hdfs_spark.streaming.changelog import (
        start_changelog_mirror, sync_changelog_mirror_table,
    )

    src = _three_commits(spark, tmp_path, "t_mirror_fbt_src")
    mirror = str(tmp_path / "t_mirror_fbt")
    sync_changelog_mirror_table(spark, src, mirror, "k", now=lambda: 9000)
    delete_rows(
        spark, src, spark.createDataFrame([(7,)], "k long"), "k",
        now=lambda: 3000,
    )
    ticks = str(tmp_path / "fbt_ticks")
    spark.range(3).write.parquet(ticks)
    q = start_changelog_mirror(
        spark.readStream.schema("id long").parquet(ticks),
        src, mirror, str(tmp_path / "fbt_chk"), key_col="k",
    )
    q.awaitTermination(120)
    assert sorted(
        (r["k"], r["src"]) for r in read_snapshot(spark, mirror).collect()
    ) == sorted(
        (r["k"], r["src"]) for r in read_snapshot(spark, src).collect()
    )


def test_commit_changes_null_or_missing_insert_key_refused(spark, tmp_path):
    """Row-delta inserts must carry a non-null identifier — a NULL or
    absent key row could never be deleted or replaced by a later row
    delta."""
    from kafka_connect_hdfs_spark.snapshots import commit_changes

    path = _three_commits(spark, tmp_path, "t_rd_nullins")
    with pytest.raises(ValueError, match="NULL"):
        commit_changes(
            spark, path,
            spark.createDataFrame([(None, "n")], "k long, src string"),
            None, "k", now=lambda: 3000,
        )
    with pytest.raises(ValueError, match="identifier column"):
        commit_changes(
            spark, path,
            spark.createDataFrame([("x",)], "src string"),
            None, "k", now=lambda: 3001,
        )


def test_mirror_table_across_schema_evolution(spark, tmp_path):
    """The row-delta mirror through an EVOLVING source: an appended
    commit adds a column (older dirs read it as NULL via mergeSchema),
    then a delete and an update of pre-evolution rows. Every tick must
    land the mirror on the evolved snapshot."""
    from kafka_connect_hdfs_spark.snapshots import (
        commit_changes, commit_snapshot, delete_rows, read_snapshot,
    )
    from kafka_connect_hdfs_spark.streaming.changelog import (
        sync_changelog_mirror_table,
    )

    opts = {"mergeSchema": "true"}
    src = _three_commits(spark, tmp_path, "t_evo_src")
    mirror = str(tmp_path / "t_evo_mirror")
    sync_changelog_mirror_table(
        spark, src, mirror, "k", options=opts, now=lambda: 9000,
    )
    commit_snapshot(  # v3 adds the `lang` column
        spark,
        spark.createDataFrame(
            [(30, "c", "en"), (31, "c", "de")],
            "k long, src string, lang string",
        ),
        src, mode="append", now=lambda: 3000,
    )
    delete_rows(
        spark, src, spark.createDataFrame([(4,)], "k long"), "k",
        now=lambda: 4000,
    )
    commit_changes(  # update a pre-evolution row to an evolved image
        spark, src,
        spark.createDataFrame(
            [(7, "upd", "fr")], "k long, src string, lang string"
        ),
        spark.createDataFrame([(7,)], "k long"), "k", now=lambda: 5000,
    )
    for tick in (9001, 9002):  # second tick is the idle no-op
        sync_changelog_mirror_table(
            spark, src, mirror, "k", options=opts,
            now=lambda t=tick: t, validate="mirror",
        )
    want = sorted(
        (r["k"], r["src"], r["lang"])
        for r in read_snapshot(spark, src, options=opts).collect()
    )
    got = sorted(
        (r["k"], r["src"], r["lang"])
        for r in read_snapshot(spark, mirror, options=opts).collect()
    )
    assert got == want and (7, "upd", "fr") in got and (30, "c", "en") in got
    assert all(k != 4 for k, _, _ in got)


def test_mirror_dir_form_across_schema_evolution(spark, tmp_path):
    """The directory-form mirror through an evolving source: the
    multiset fold (_aligned + exceptAll) must carry the added column,
    with pre-evolution mirror rows reading it as NULL."""
    from collections import Counter

    from kafka_connect_hdfs_spark.snapshots import (
        commit_snapshot, delete_rows, read_snapshot,
    )
    from kafka_connect_hdfs_spark.streaming.changelog import (
        sync_changelog_mirror,
    )

    opts = {"mergeSchema": "true"}
    src = _three_commits(spark, tmp_path, "t_evo_dir_src")
    mirror = str(tmp_path / "t_evo_dir_mirror")
    sync_changelog_mirror(spark, src, mirror, options=opts)
    commit_snapshot(
        spark,
        spark.createDataFrame(
            [(40, "c", "en")], "k long, src string, lang string"
        ),
        src, mode="append", now=lambda: 3000,
    )
    delete_rows(
        spark, src, spark.createDataFrame([(2,)], "k long"), "k",
        now=lambda: 4000,
    )
    sync_changelog_mirror(spark, src, mirror, options=opts)
    want = Counter(
        (r["k"], r["src"], r["lang"])
        for r in read_snapshot(spark, src, options=opts).collect()
    )
    got = Counter(
        (r["k"], r["src"], r["lang"])
        for r in spark.read.option("mergeSchema", "true")
        .parquet(mirror).collect()
    )
    assert got == want and (40, "c", "en") in got
