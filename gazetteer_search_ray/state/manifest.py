"""Index manifest: lifecycle, lineage, metrics, checkpoint/resume.

Plays the role of the reference's index DDL + import metadata
(``esclient/IndexHolder.java:34-67``,
``imp/addr/AddressesImporter.java:193-212`` region/import counters): a
JSON file at the index root listing global stats and one lineage record
per committed partition.  The manifest is written LAST via temp+rename,
so its presence is the atomic commit point — a partition directory
without a manifest is garbage and a rerun rebuilds it (SURVEY.md §4
'Checkpoint / resume').
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

MANIFEST_NAME = "_manifest.json"
FORMAT_VERSION = 2  # v2: postings "docs" payload is raw LE int64 (was delta+varbyte)


def atomic_write_json(path: str, obj: dict) -> None:
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, default=str)
    os.replace(tmp, path)


def atomic_write_table(table, path: str) -> None:
    """Parquet write via temp+rename — idempotent under Ray task retry."""
    import pyarrow.parquet as pq

    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex[:8]}")
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, MANIFEST_NAME)


def read_manifest(index_dir: str) -> dict | None:
    p = manifest_path(index_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def write_manifest(index_dir: str, manifest: dict) -> None:
    manifest = {"format_version": FORMAT_VERSION, **manifest}
    atomic_write_json(manifest_path(index_dir), manifest)


def is_committed(index_dir: str) -> bool:
    return read_manifest(index_dir) is not None


def drop_index(index_dir: str) -> None:
    """Index drop = directory delete (reference: IndexHolder.drop)."""
    if os.path.exists(index_dir):
        shutil.rmtree(index_dir)


def clean_uncommitted(index_dir: str) -> None:
    """Remove temp files left by a crashed run (pre-resume hygiene)."""
    for root, _dirs, files in os.walk(index_dir):
        for f in files:
            if f.startswith(".tmp-") or ".tmp-" in f:
                os.unlink(os.path.join(root, f))
