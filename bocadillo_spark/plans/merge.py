"""MERGE-shaped idempotent upsert on the parquet plan-B sink.

The target names Iceberg sinks (MERGE/append, schema evolution, snapshot
time travel — SURVEY.md §1.1/§7). The Iceberg runtime jar is not fetchable
in this sandbox (no network), so this module implements the same COMMIT
PROTOCOL on plain parquet behind the existing sink seam:

- every merge produces a NEW immutable snapshot directory
  (snapshots/snap-{version}) — copy-on-write, exactly Iceberg's COW MERGE;
- a snapshot metadata json (version, parent, batch_id, operation, counts)
  is written first, then a single atomic pointer swap (_latest via
  os.replace) commits it — readers never see a partial snapshot;
- replaying a batch_id that already committed is a NO-OP (the T2
  safepoint/idempotent-commit analog,
  /root/reference/reader/enhanced_reader.go:129-136);
- old snapshots stay readable → version-based time travel.

At 100 TB: COW MERGE rewrites only the partitions containing matched keys
when the table is partitioned by a key prefix; the anti-join below is the
same shuffle Iceberg's MERGE plan runs. Merge-on-read (delete files +
compaction) is the documented alternative when update rates dwarf reads.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F


def _meta_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_snapshots")


def _snap_dir(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, "snapshots", f"snap-{version:06d}")


def current_version(table_dir: str) -> int:
    """0 = empty table (no committed snapshot)."""
    ptr = os.path.join(table_dir, "_latest")
    if not os.path.exists(ptr):
        return 0
    with open(ptr) as f:
        return int(f.read().strip())


def table_history(table_dir: str) -> list[dict]:
    md = _meta_dir(table_dir)
    if not os.path.isdir(md):
        return []
    out = []
    for name in sorted(os.listdir(md)):
        if name.startswith("v") and name.endswith(".json"):
            with open(os.path.join(md, name)) as f:
                out.append(json.load(f))
    return out


def _committed_batch_ids(table_dir: str) -> set:
    """Only batches at or below the POINTER are committed: metadata json is
    written before the pointer swap, so a crash in between leaves an
    orphaned metadata file whose batch must NOT be treated as applied (its
    replay re-runs and overwrites the same version — idempotent)."""
    latest = current_version(table_dir)
    return {
        m["batch_id"]
        for m in table_history(table_dir)
        if m.get("batch_id") is not None and m["version"] <= latest
    }


def read_table(spark: SparkSession, table_dir: str, version: int | None = None) -> DataFrame:
    """Read the table at `version` (default: latest) — snapshot time travel."""
    v = current_version(table_dir) if version is None else version
    if v == 0:
        raise ValueError("table has no committed snapshot")
    snap = _snap_dir(table_dir, v)
    if not os.path.isdir(snap):
        raise ValueError(f"snapshot v{v} data expired (metadata retained)")
    return spark.read.parquet(snap)


def _commit(table_dir: str, meta: dict) -> None:
    """Metadata json first, then the atomic pointer swap."""
    md = _meta_dir(table_dir)
    os.makedirs(md, exist_ok=True)
    mpath = os.path.join(md, f"v{meta['version']:06d}.json")
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    os.replace(tmp, mpath)
    ptr_tmp = os.path.join(table_dir, "._latest.tmp")
    with open(ptr_tmp, "w") as f:
        f.write(str(meta["version"]))
    os.replace(ptr_tmp, os.path.join(table_dir, "_latest"))  # the commit point


def _dedupe_updates(updates: DataFrame, key_cols: list[str]) -> DataFrame:
    """Deterministic last-writer-wins inside one batch: highest value of the
    non-key columns (as a struct) wins — replay-stable regardless of
    partitioning."""
    other = [c for c in updates.columns if c not in key_cols]
    if not other:
        return updates.dropDuplicates(key_cols)
    w = W.partitionBy(*key_cols).orderBy(F.struct(*other).desc())
    return (
        updates.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    key_cols: list[str],
    batch_id: int | str,
    delete_col: str | None = None,
) -> dict:
    """MERGE INTO target USING updates ON key:
    matched → replace row (or delete when `delete_col` is true),
    not matched → insert. Returns the committed snapshot metadata.

    Idempotent under replay two ways: (1) a batch_id already committed is
    skipped entirely; (2) re-merging identical content produces an
    identical table (upsert is content-idempotent)."""
    if batch_id in _committed_batch_ids(table_dir):
        v = current_version(table_dir)
        return {"version": v, "batch_id": batch_id, "skipped_replay": True}

    ups = _dedupe_updates(updates, key_cols)
    deletes = None
    if delete_col is not None:
        deletes = ups.where(F.col(delete_col)).select(*key_cols)
        ups = ups.where(~F.col(delete_col)).drop(delete_col)

    parent = current_version(table_dir)
    if parent == 0:
        if updates.isEmpty():
            # nothing to create: an empty parquet dir is unreadable (no
            # schema), and an empty batch needn't consume a version —
            # replaying it later is naturally a no-op
            return {"version": 0, "batch_id": batch_id, "empty_noop": True}
        merged = ups
        op = "create"
    else:
        cur = read_table(spark, table_dir, parent)
        keys = ups.select(*key_cols)
        if deletes is not None:
            keys = keys.unionByName(deletes).distinct()
        kept = cur.join(F.broadcast(keys) if _small(ups) else keys, key_cols, "left_anti")
        # schema evolution (Iceberg add-column semantics): columns new in
        # this batch backfill NULL for pre-existing rows; columns the batch
        # omits stay NULL for its rows. No column is ever dropped — the
        # snapshot schema is the union, recorded in the commit metadata.
        merged = kept.unionByName(ups, allowMissingColumns=True)
        op = "merge"

    version = parent + 1
    snap = _snap_dir(table_dir, version)
    merged.write.mode("overwrite").parquet(snap)
    n = spark.read.parquet(snap).count()
    meta = {
        "version": version,
        "parent": parent,
        "operation": op,
        "batch_id": batch_id,
        "key": list(key_cols),
        "row_count": int(n),
        "schema": merged.schema.simpleString(),
    }
    _commit(table_dir, meta)
    return meta


def compact(spark: SparkSession, table_dir: str, target_files: int = 4) -> dict:
    """Small-file compaction: rewrite the CURRENT snapshot into
    `target_files` coalesced files and commit it as a new snapshot
    (operation 'compact', no batch_id). Data-identical by construction;
    the maintenance op every MERGE-heavy table needs at scale — each COW
    merge writes a fresh file set, and read amplification grows with file
    count until a compaction folds them."""
    parent = current_version(table_dir)
    cur = read_table(spark, table_dir, parent)
    version = parent + 1
    snap = _snap_dir(table_dir, version)
    cur.coalesce(target_files).write.mode("overwrite").parquet(snap)
    n = spark.read.parquet(snap).count()
    meta = {
        "version": version,
        "parent": parent,
        "operation": "compact",
        "batch_id": None,
        "key": None,
        "row_count": int(n),
        "schema": cur.schema.simpleString(),
    }
    _commit(table_dir, meta)
    return meta


def expire_snapshots(table_dir: str, keep_last: int = 2) -> list[int]:
    """Snapshot GC: delete the DATA of all but the newest `keep_last`
    snapshots (commit metadata is kept, so history stays auditable; time
    travel to an expired version raises). Returns expired version ids."""
    import shutil

    latest = current_version(table_dir)
    expired = []
    for meta in table_history(table_dir):
        v = meta["version"]
        if v <= latest - keep_last:
            snap = _snap_dir(table_dir, v)
            if os.path.isdir(snap):
                shutil.rmtree(snap)
                expired.append(v)
    return expired


def _small(df: DataFrame) -> bool:
    """Broadcast the update keyset when the update batch is plan-estimated
    small — the common CDC shape (small batch vs huge table)."""
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        return stats.sizeInBytes() < 64 * 1024 * 1024
    except Exception:
        return False
