"""Resumable partitioned-parquet sink for arbitrary pipeline outputs.

The index build already commits per input partition
(``build_index.py``, reference analog ``imp/Importer.java``'s bulk
lifecycle); this module generalizes the same crash-safety contract to
ANY Dataset a pipeline produces (curated corpus, dedup survivors,
chunk/passage tables): output lands as ``part=<p>/`` directories keyed
by a deterministic hash of a key column, each partition committed
ATOMICALLY (temp root + directory rename, manifest updated last via
temp+rename), so a failed 100-TB run re-runs only the uncommitted
partitions — never one giant file, never a half-written partition
visible to readers.

Scale shape: ONE streaming pass, NO shuffle — every task fans its
blocks out under the partition directories it sees
(``write_parquet(partition_cols=…)``), so file count is
O(blocks × partitions-touched-per-block).  For fewer, larger files,
pre-``repartition`` or ``sort`` by the key upstream; the sink is
correct either way.  Resume costs one filtered re-read of the input
(rows hashing into committed partitions are dropped inside the first
``map_batches``, before any write I/O).

The partition hash is Knuth multiplicative on int keys (the same
arithmetic :func:`..relational.sample_hash` exposes to SQL) and
``pandas.util.hash_array`` (SipHash-based, fixed key, vectorized) on
everything else — stable across runs, processes and machines.
"""

from __future__ import annotations

import glob
import os
import shutil
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state.manifest import atomic_write_json

SINK_MANIFEST = "_SINK_MANIFEST.json"


def _part_ids(col: pa.ChunkedArray, num_partitions: int) -> np.ndarray:
    vals = col.to_numpy(zero_copy_only=False)
    if np.issubdtype(vals.dtype, np.integer):
        h = vals.astype(np.uint64) * np.uint64(2654435761)
    else:
        h = pd.util.hash_array(np.asarray(vals))
    return (h % np.uint64(num_partitions)).astype(np.int64)


def _read_sink_manifest(path: str) -> dict | None:
    import json

    p = os.path.join(path, SINK_MANIFEST)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _dir_rows(d: str) -> int:
    import pyarrow.parquet as pq

    return sum(pq.ParquetFile(f).metadata.num_rows
               for f in glob.glob(os.path.join(d, "*.parquet")))


def write_partitioned(ds, path: str, key_col: str,
                      num_partitions: int = 64,
                      resume: bool = True) -> dict:
    """Write ``ds`` under ``path/part=<p>/*.parquet`` with atomic
    per-partition commit and manifest-gated resume.

    Returns ``{"written": [...], "skipped": [...], "rows_written": n,
    "rows_total": n}`` where ``rows_total`` counts every committed row
    (prior runs included).  A partition is committed iff it appears in
    ``_SINK_MANIFEST.json``; its directory rename happens first and the
    manifest write (temp+rename) is the commit point, so a crash
    between the two re-writes that partition idempotently (the stale
    dir is removed before rewrite).
    """
    os.makedirs(path, exist_ok=True)
    man = _read_sink_manifest(path) if resume else None
    if man is not None and (man.get("num_partitions") != num_partitions
                            or man.get("key_col") != key_col):
        raise ValueError(
            f"existing sink at {path} was written with "
            f"num_partitions={man.get('num_partitions')} "
            f"key_col={man.get('key_col')!r}; pass matching values or "
            "resume=False to start over")
    committed: dict[str, int] = dict(man["committed"]) if man else {}
    if not resume:
        for d in glob.glob(os.path.join(path, "part=*")):
            shutil.rmtree(d)
    # pre-run hygiene: temp roots and never-committed partition dirs
    # left by a crashed run
    for d in glob.glob(os.path.join(path, ".tmp-*")):
        shutil.rmtree(d)
    for d in glob.glob(os.path.join(path, "part=*")):
        if d.rsplit("=", 1)[1] not in committed:
            shutil.rmtree(d)

    remaining = [p for p in range(num_partitions)
                 if str(p) not in committed]
    if not remaining:
        total = sum(committed.values())
        return {"written": [], "skipped": sorted(committed, key=int),
                "rows_written": 0, "rows_total": total}

    rem_mask = np.zeros(num_partitions, dtype=bool)
    rem_mask[remaining] = True

    def assign(t: pa.Table) -> pa.Table:
        part = _part_ids(t[key_col], num_partitions)
        t = t.append_column("__part", pa.array(part))
        return t.filter(pa.array(rem_mask[part]))

    tmp_root = os.path.join(path, f".tmp-{uuid.uuid4().hex[:8]}")
    ds.map_batches(assign, batch_format="pyarrow") \
      .write_parquet(tmp_root, partition_cols=["__part"])

    written, rows_written = [], 0
    for p in remaining:
        src = os.path.join(tmp_root, f"__part={p}")
        dst = os.path.join(path, f"part={p}")
        if os.path.isdir(src):
            os.replace(src, dst)
            n = _dir_rows(dst)
        else:
            n = 0  # no rows hashed here — commit as empty
        committed[str(p)] = n
        rows_written += n
        written.append(str(p))
    shutil.rmtree(tmp_root, ignore_errors=True)
    atomic_write_json(os.path.join(path, SINK_MANIFEST), {
        "num_partitions": num_partitions,
        "key_col": key_col,
        "committed": committed,
    })
    skipped = sorted((k for k in committed if k not in set(written)),
                     key=int)
    return {"written": written, "skipped": skipped,
            "rows_written": rows_written,
            "rows_total": sum(committed.values())}


def read_partitioned(path: str):
    """Read back ONLY committed partitions (the manifest is the source
    of truth — a crashed run's stray directories are invisible)."""
    import ray.data as rd

    man = _read_sink_manifest(path)
    if man is None:
        raise FileNotFoundError(f"no sink manifest under {path}")
    files = [f for p, n in man["committed"].items() if n > 0
             for f in sorted(glob.glob(
                 os.path.join(path, f"part={p}", "*.parquet")))]
    # partitioning=None: the part=<p> dir names are a commit-unit
    # detail, not a hive column — don't let discovery resurrect them
    return rd.read_parquet(files, partitioning=None)
