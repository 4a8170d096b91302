"""Model-based lifecycle test of the snapshot log (r13): a seeded
random interleaving of append / delete_rows / commit_changes /
overwrite / apply_deletes / rollback is replayed against a pure-Python
dict model, checking

- ``read_snapshot(latest)`` equals the model after EVERY operation,
- a row-delta MIRROR (``sync_changelog_mirror_table`` with
  ``on_overwrite="diff"``) ticked after every operation stays equal to
  the model — i.e. the change feed is lossless across every boundary
  the lifecycle can produce, in random combination,
- every HISTORICAL version still reads back as the model state recorded
  when it was committed (time travel is unaffected by later ops).

The targeted tests in test_round13_ops.py pin each boundary in
isolation; this one is the interaction net — e.g. a rollback landing on
a version whose tombstones were since compacted, followed by a rowdelta
re-inserting a twice-deleted key, is a sequence no hand-written case
enumerates. Seeds are fixed so failures replay deterministically
(repo determinism convention — no wall clock, no live randomness)."""

import random

import pytest
from pyspark.sql import functions as F  # noqa: F401 (fixture parity)

from kafka_connect_hdfs_spark.snapshots import (
    apply_deletes,
    commit_changes,
    commit_snapshot,
    delete_rows,
    expire_snapshots,
    list_snapshots,
    read_snapshot,
    rollback_snapshot,
)
from kafka_connect_hdfs_spark.streaming.changelog import (
    sync_changelog_mirror_table,
)

_SCHEMA = "k long, v long"


def _df(spark, rows):
    return spark.createDataFrame(sorted(rows), _SCHEMA)


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in sorted(keys)], "k long")


def _snap(spark, path, version=None):
    df = read_snapshot(spark, path, version)
    return sorted((r["k"], r["v"]) for r in df.collect())


class _Lifecycle:
    """Drive one random op against both the real table and the model.

    Model state is ``live: dict[key -> val]`` — the mirror contract
    (one live row per key) holds by construction: appends only use
    keys that are not currently live (fresh or previously deleted),
    updates go through the rowdelta path."""

    def __init__(self, spark, path, seed):
        self.spark, self.path, self.rng = spark, path, random.Random(seed)
        self.live: "dict[int, int]" = {}
        self.dead: "set[int]" = set()
        self.next_key = 0
        self.clock = [1000]
        self.model_at: "dict[int, dict[int, int]]" = {}

    def now(self):
        self.clock[0] += 1000
        return self.clock[0]

    def _fresh_keys(self, n):
        # mix brand-new keys with re-inserts of previously-deleted ones
        out = []
        reuse = [k for k in self.dead if self.rng.random() < 0.5][: n // 2]
        out.extend(reuse)
        while len(out) < n:
            out.append(self.next_key)
            self.next_key += 1
        return out

    def _record(self):
        v = list_snapshots(self.spark, self.path)[-1]
        self.model_at[v] = dict(self.live)

    def _apply_batch(self, rows):
        for k, val in rows:
            if k in self.dead:
                self.dead.discard(k)
            self.live[k] = val

    def op_append(self):
        keys = self._fresh_keys(self.rng.randint(1, 6))
        rows = [(k, self.rng.randint(0, 999)) for k in keys]
        mode = "append" if list_snapshots(self.spark, self.path) else (
            "overwrite"
        )
        commit_snapshot(
            self.spark, _df(self.spark, rows), self.path, mode=mode,
            now=self.now,
        )
        self._apply_batch(rows)
        self._record()

    def op_delete(self):
        if not self.live:
            return self.op_append()
        keys = self.rng.sample(
            sorted(self.live), self.rng.randint(1, min(4, len(self.live)))
        )
        delete_rows(
            self.spark, self.path, _keys_df(self.spark, keys), "k",
            now=self.now,
        )
        for k in keys:
            del self.live[k]
            self.dead.add(k)
        self._record()

    def op_rowdelta(self):
        if not self.live:
            return self.op_append()
        upd = self.rng.sample(
            sorted(self.live), self.rng.randint(1, min(3, len(self.live)))
        )
        fresh = self._fresh_keys(self.rng.randint(0, 2))
        drop = (
            self.rng.sample(
                sorted(set(self.live) - set(upd)),
                min(1, len(set(self.live) - set(upd))),
            )
            if self.rng.random() < 0.5
            else []
        )
        rows = [(k, self.rng.randint(0, 999)) for k in upd + fresh]
        commit_changes(
            self.spark, self.path, _df(self.spark, rows),
            _keys_df(self.spark, upd + drop), "k", now=self.now,
        )
        for k in drop:
            del self.live[k]
            self.dead.add(k)
        self._apply_batch(rows)
        self._record()

    def op_overwrite(self):
        keep = {
            k: v for k, v in self.live.items() if self.rng.random() < 0.5
        }
        keys = self._fresh_keys(self.rng.randint(1, 3))
        rows = [(k, self.rng.randint(0, 999)) for k in keys]
        full = sorted(keep.items()) + rows
        commit_snapshot(
            self.spark, _df(self.spark, full), self.path, mode="overwrite",
            now=self.now,
        )
        self.dead |= set(self.live) - set(keep)
        self.live = dict(full)
        self.dead -= set(self.live)
        self._record()

    def op_compact(self):
        res = apply_deletes(self.spark, self.path, now=self.now)
        if res["version"] is not None:  # no-op commits no version
            self._record()

    def op_rollback(self):
        versions = list_snapshots(self.spark, self.path)
        candidates = [v for v in versions[:-1] if v in self.model_at]
        if not candidates:
            return self.op_append()
        target = self.rng.choice(candidates)
        rollback_snapshot(self.spark, self.path, target, now=self.now)
        restored = dict(self.model_at[target])
        self.dead |= set(self.live) - set(restored)
        self.live = restored
        self.dead -= set(self.live)
        self._record()

    def step(self):
        op = self.rng.choice(
            [
                self.op_append, self.op_append, self.op_delete,
                self.op_delete, self.op_rowdelta, self.op_rowdelta,
                self.op_overwrite, self.op_compact, self.op_rollback,
            ]
        )
        op()

    def expect(self):
        return sorted(self.live.items())


def _mirror_scenario(spark, tmp_path, seed):
    """12 random ops; after each, latest-read == model AND a row-delta
    mirror synced over the change feed (diff mode) == model; at the
    end, every surviving historical version == its recorded model."""
    lc = _Lifecycle(spark, str(tmp_path / f"t_{seed}"), seed)
    mirror = str(tmp_path / f"m_{seed}")
    lc.op_append()  # bootstrap commit
    for _ in range(12):
        lc.step()
        assert _snap(spark, lc.path) == lc.expect(), "latest read diverged"
        info = sync_changelog_mirror_table(
            spark, lc.path, mirror, "k", on_overwrite="diff", now=lc.now,
        )
        assert info["to_version"] == list_snapshots(spark, lc.path)[-1]
        assert _snap(spark, mirror) == lc.expect(), "mirror diverged"
    for v, model in sorted(lc.model_at.items()):
        assert _snap(spark, lc.path, v) == sorted(model.items()), (
            f"historical v{v} diverged"
        )


def _clone_scenario(spark, tmp_path):
    """Run the lifecycle on a ZERO-COPY clone: 5 ops on the source,
    clone, then 10 random ops (with a live mirror) on the clone. The
    clone must track its own model — including deletes/compactions that
    touch clone-carried SOURCE dirs — while the source's latest state
    and every recorded source version stay untouched."""
    from kafka_connect_hdfs_spark.snapshots import clone_table

    src = _Lifecycle(spark, str(tmp_path / "t_src"), 43)
    src.op_append()
    for _ in range(5):
        src.step()
    src_state = dict(src.live)
    src_models = {v: dict(m) for v, m in src.model_at.items()}

    dst_path = str(tmp_path / "t_clone")
    clone_table(spark, src.path, dst_path)
    dst = _Lifecycle(spark, dst_path, 44)
    dst.live = dict(src.live)
    dst.dead = set(src.dead)
    dst.next_key = src.next_key
    dst.model_at = {1: dict(src.live)}  # the clone commit is its v1
    mirror = str(tmp_path / "m_clone")
    for _ in range(10):
        dst.step()
        assert _snap(spark, dst.path) == dst.expect(), "clone diverged"
        sync_changelog_mirror_table(
            spark, dst.path, mirror, "k", on_overwrite="diff", now=dst.now,
        )
        assert _snap(spark, mirror) == dst.expect(), "clone mirror diverged"
    for v, model in sorted(dst.model_at.items()):
        assert _snap(spark, dst.path, v) == sorted(model.items())
    # the source never observes any of it
    assert _snap(spark, src.path) == sorted(src_state.items())
    for v, model in sorted(src_models.items()):
        assert _snap(spark, src.path, v) == sorted(model.items()), (
            f"source v{v} disturbed by clone lifecycle"
        )


def _expiry_scenario(spark, tmp_path):
    """Same net without the mirror, adding expire_snapshots into the
    mix: expiry must never change the LATEST state, and every version
    that survives it must still read back as recorded."""
    lc = _Lifecycle(spark, str(tmp_path / "t_exp"), 13)
    lc.op_append()
    rng = random.Random(99)
    for i in range(14):
        if i % 5 == 4:
            keep = rng.randint(2, 4)
            expire_snapshots(spark, lc.path, keep_last=keep)
            survivors = set(list_snapshots(spark, lc.path))
            lc.model_at = {
                v: m for v, m in lc.model_at.items() if v in survivors
            }
        else:
            lc.step()
        assert _snap(spark, lc.path) == lc.expect(), f"diverged at op {i}"
    for v, model in sorted(lc.model_at.items()):
        assert _snap(spark, lc.path, v) == sorted(model.items())


def test_lifecycle_model_scenarios(spark, tmp_path):
    """All four lifecycle scenarios (mirror seed 7, mirror seed 29,
    clone continuation, expiry mix) drive DISJOINT table trees, so they
    overlap in a thread pool — identical coverage (the bodies are the
    former individual tests, unchanged), ~half the wall. Each scenario's
    steps stay strictly sequential; failures are re-raised with the
    scenario name."""
    from concurrent.futures import ThreadPoolExecutor

    scenarios = {
        "mirror[7]": lambda: _mirror_scenario(spark, tmp_path, 7),
        "mirror[29]": lambda: _mirror_scenario(spark, tmp_path, 29),
        "clone": lambda: _clone_scenario(spark, tmp_path),
        "expiry": lambda: _expiry_scenario(spark, tmp_path),
    }
    with ThreadPoolExecutor(max_workers=len(scenarios)) as pool:
        futures = {name: pool.submit(fn) for name, fn in scenarios.items()}
        failures = []
        for name, fut in futures.items():
            try:
                fut.result()
            except Exception as exc:  # noqa: BLE001 - re-reported below
                failures.append(f"{name}: {exc!r}")
    assert not failures, "; ".join(failures)
