"""Index maintenance jobs: doc-store backfill, delete + compaction.

Reference analogs:

* :func:`backfill_column` — G2/G4 bulk partial updates
  (``UpdateStreetsUsage.java:47-132`` writes ``ref_count`` /
  ``street_has_loc`` back into existing docs;
  ``UpdatePOITagsAndClasses.java:41-83`` rewrites tags): here a
  ``map_batches`` rewrite of the doc-store segments with a broadcast
  value map — postings untouched.
* :func:`delete_docs` — S4 delete-by-query
  (``AddressesImporter.java:98-108,156-163,245-260``: drop a region /
  stale generation before re-import): an anti-join compaction that
  rewrites doc-store AND postings segments without the deleted doc_ids.
  Deletion is by explicit id set or by doc-store predicate; the
  manifest is re-committed last with a bumped generation counter (M16
  analog of ``import_counter``).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.codec import decode_posting, encode_posting
from ..state import manifest as mf


def _segment_dirs(index_dir: str) -> list[str]:
    man = mf.read_manifest(index_dir)
    if man is None:
        raise FileNotFoundError(index_dir)
    if "segments" in man:
        return [os.path.join(index_dir, s) for s in man["segments"]]
    return [index_dir]


def backfill_column(index_dir: str, values: dict[int, object], column: str,
                    default=0) -> int:
    """Write ``column`` into every doc-store segment (doc_id → value).

    One Ray task per docmeta file, the value map broadcast once with
    ``ray.put`` (not re-shipped per file); each file is replaced
    atomically so a crashed backfill resumes safely.  Returns rows
    touched.
    """
    import ray

    ref = ray.put(values)

    @ray.remote
    def rewrite(path: str) -> int:
        t = pq.read_table(path)
        lookup = ray.get(ref)
        vals = [lookup.get(int(d), default) for d in t["doc_id"].to_pylist()]
        if column in t.column_names:
            t = t.drop_columns([column])
        t = t.append_column(column, pa.array(vals))
        mf.atomic_write_table(t, path)
        return t.num_rows

    futs = []
    for seg in _segment_dirs(index_dir):
        dmdir = os.path.join(seg, "docmeta")
        for fname in sorted(os.listdir(dmdir)):
            if fname.endswith(".parquet"):
                futs.append(rewrite.remote(os.path.join(dmdir, fname)))
    return int(sum(ray.get(futs)))


def delete_docs(index_dir: str, doc_ids=None, predicate=None) -> dict:
    """Anti-join compaction: drop docs from doc-store + postings.

    ``doc_ids``: iterable of ids, or ``predicate(table) -> bool mask``
    over a docmeta table.  Rewrites every segment file without the
    deleted rows, re-derives global stats, re-commits the manifest with
    ``import_counter + 1`` (reference M16 generation semantics).
    """
    drop: set[int] = set(int(d) for d in (doc_ids or []))
    total_docs = 0
    total_tokens = 0
    for seg in _segment_dirs(index_dir):
        dmdir = os.path.join(seg, "docmeta")
        for fname in sorted(os.listdir(dmdir)):
            if not fname.endswith(".parquet"):
                continue
            path = os.path.join(dmdir, fname)
            t = pq.read_table(path)
            mask = np.ones(t.num_rows, dtype=bool)
            if predicate is not None:
                mask &= ~np.asarray(predicate(t))
            if drop:
                mask &= ~np.isin(t["doc_id"].to_numpy(), list(drop))
            dropped_here = t.filter(pa.array(~mask))
            drop.update(int(d) for d in dropped_here["doc_id"].to_pylist())
            t2 = t.filter(pa.array(mask))
            if t2.num_rows != t.num_rows:
                mf.atomic_write_table(t2, path)
            total_docs += t2.num_rows
            total_tokens += int(pc.sum(t2["dl"]).as_py() or 0)

    drop_arr = np.array(sorted(drop), dtype=np.int64)
    for seg in _segment_dirs(index_dir):
        pdir = os.path.join(seg, "postings")
        for fname in sorted(os.listdir(pdir)):
            if not fname.endswith(".parquet"):
                continue
            path = os.path.join(pdir, fname)
            t = pq.read_table(path)
            rows = []
            changed = False
            for i in range(t.num_rows):
                row = {c: t[c][i].as_py() for c in t.column_names}
                p = decode_posting(row)
                if drop_arr.size:
                    idx = np.minimum(
                        np.searchsorted(drop_arr, p.doc_ids), drop_arr.size - 1
                    )
                    keep = drop_arr[idx] != p.doc_ids
                else:
                    keep = np.ones(p.doc_ids.size, dtype=bool)
                if keep.all():
                    rows.append(row)
                    continue
                changed = True
                if not keep.any():
                    continue
                # re-encode without the deleted docs; block_min_dl needs
                # dls — deleted docs only shrink blocks, so reuse a safe
                # bound: per-posting dl gathered from... we no longer
                # store dls per posting, so rebuild with min_dl bound 1
                # (still a valid upper bound for tf_norm)
                enc = encode_posting(
                    p.doc_ids[keep], p.tfs[keep],
                    np.ones(int(keep.sum()), dtype=np.int64),
                )
                rows.append({"term": row["term"], "shard": row["shard"], **{
                    k: (enc[k] if not isinstance(enc[k], np.ndarray) else enc[k].tolist())
                    for k in ("df", "docs", "tfs", "block_last_doc", "block_max_tf",
                              "block_min_dl", "block_docs_off", "block_tfs_off")
                }})
            if changed:
                if rows:
                    from ..stages.postings import POSTINGS_SCHEMA

                    cols = {
                        name: [r[name] for r in rows]
                        for name in POSTINGS_SCHEMA.names
                    }
                    mf.atomic_write_table(
                        pa.table(cols, schema=POSTINGS_SCHEMA), path
                    )
                else:
                    os.unlink(path)

    man = mf.read_manifest(index_dir)
    man.pop("format_version", None)
    man["n_docs"] = total_docs
    man["total_tokens"] = total_tokens
    man["avgdl"] = (total_tokens / total_docs) if total_docs else 0.0
    man["import_counter"] = int(man.get("import_counter", 0)) + 1
    mf.write_manifest(index_dir, man)
    return man
