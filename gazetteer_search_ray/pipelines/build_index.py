"""Index build — the flagship pipeline (reference `import` command).

Reference lifecycle (``AddressesImporter.run``, SURVEY.md §3.1) becomes:

    read_parquet(corpus)                       # column-pruned
    → map_batches(TokenizeStage, actor pool)   # parse/normalize/prior/sha256
      ├ side-writes docmeta parquet segments   #   (doc store, fused pass)
      └ emits packed partial postings
    → groupby(term, shard).map_groups(merge)   # THE shuffle
    → sort(term)                               # term-ordered segments →
    → write_parquet(postings/)                 #   row-group min/max pruning
    → stats scan over docmeta (tiny)
    → manifest commit (atomic, LAST)

The manifest is the commit point; :func:`build_index_partitioned` builds
one sub-index per input partition with per-partition lineage records and
skips already-committed partitions on resume (reference analog: the
region_counter generation + delete-stale idempotent re-import,
``AddressesImporter.java:131-163,193-212``).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import pyarrow.dataset as pads

from ..functions.analyzer import AnalyzerConfig
from ..functions.codec import BLOCK_SIZE
from ..stages.postings import (
    SortedBlockEncoder,
    encode_partials_table,
    make_postings_merger,
)
from ..stages.tokenize import TokenizeStage
from ..state import manifest as mf

POSTINGS_DIR = "postings"
DOCMETA_DIR = "docmeta"


@dataclass
class BuildOptions:
    analyzer_config: AnalyzerConfig = field(default_factory=AnalyzerConfig.simple)
    num_doc_shards: int = 1
    block_size: int = BLOCK_SIZE
    batch_size: int = 512
    # tokenize actor pool size; None → stateless tasks (elastic). The
    # pool must leave CPUs for read + shuffle stages (ray_guide: a pool
    # reserving every CPU serializes the pipeline).
    tokenize_concurrency: int | None = None
    score_builder: object | None = None
    compute_sha256: bool = True
    # parquet row-group size of the postings segments: small enough that
    # a term lookup reads one row group, big enough to amortize footers
    row_group_size: int = 4096
    # reduce partitions for the merge sort; None → ~1 per cluster CPU
    sort_partitions: int | None = None
    # boundary sets up to this many rows merge on the driver (one
    # vectorized pass — saves an execution for small test builds);
    # above it, the distributed groupby merges: boundary DISTINCT keys
    # are only ~2 per sorted block, but their rows are the HOT terms,
    # whose encode must not serialize on the driver
    boundary_driver_limit: int = 20_000
    # extra text fields ((field_name, column_name), ...): indexed as
    # field-scoped terms with per-field BM25 length norms (the
    # reference's multi-field mapping, es_mappings/addr_row.json:41-121)
    extra_fields: tuple = ()


def _analyzer_dict(c: AnalyzerConfig) -> dict:
    d = dict(c.__dict__)
    d["optional_terms"] = sorted(d["optional_terms"])
    d["stop_terms"] = sorted(d["stop_terms"])
    d["char_replaces"] = [list(x) for x in d["char_replaces"]]
    d["synonyms"] = [list(x) for x in d["synonyms"]]
    return d


def build_index(ds, index_dir: str, opts: BuildOptions | None = None, overwrite: bool = True) -> dict:
    """Build one index segment group from a corpus Dataset.

    ``ds`` must have columns (doc_id, content) and optionally
    (repo, path, commit, lang) which are carried into the doc store.
    Returns the committed manifest dict.
    """
    opts = opts or BuildOptions()
    existing = mf.read_manifest(index_dir)
    if existing is not None and not overwrite:
        return existing
    mf.drop_index(index_dir)
    postings_dir = os.path.join(index_dir, POSTINGS_DIR)
    docmeta_dir = os.path.join(index_dir, DOCMETA_DIR)
    os.makedirs(postings_dir)
    os.makedirs(docmeta_dir)

    t0 = time.monotonic()
    kwargs = dict(
        analyzer_config=opts.analyzer_config,
        docmeta_dir=docmeta_dir,
        num_doc_shards=opts.num_doc_shards,
        score_builder=opts.score_builder,
        compute_sha256=opts.compute_sha256,
        extra_fields=opts.extra_fields,
    )
    if opts.tokenize_concurrency:
        partials = ds.map_batches(
            TokenizeStage,
            fn_constructor_kwargs=kwargs,
            batch_format="pyarrow",
            batch_size=opts.batch_size,
            concurrency=opts.tokenize_concurrency,
        )
    else:
        partials = ds.map_batches(
            TokenizeStage(**kwargs),
            batch_format="pyarrow",
            batch_size=opts.batch_size,
        )

    # the groupby(term)-equivalent exchange: range-sort then vectorized
    # per-block encode; only boundary runs need a real per-group merge
    # (see stages/postings.py).  Coalescing to ~1 block per CPU before
    # the sort matters: Ray's range sort degrades ~30× when fed many
    # small blocks (measured), and polars-backed block sorting is ~20×
    # faster than the default on string keys.
    import ray
    from ray.data import DataContext

    DataContext.get_current().use_polars_sort = True
    # ~4 blocks per CPU: smaller blocks let each worker re-use its
    # already-faulted heap pages across blocks (first-touch page faults
    # are ~100× slower than warm memory on ballooned VMs)
    n_blocks = opts.sort_partitions or max(
        8, min(512, 4 * int(ray.cluster_resources().get("CPU", 8)))
    )
    sorted_partials = partials.repartition(n_blocks).sort("skey")
    boundary = sorted_partials.map_batches(
        SortedBlockEncoder(postings_dir, opts.block_size, opts.row_group_size),
        batch_format="pyarrow",
        batch_size=None,
    )
    # Boundary runs are O(2 × sort blocks) keys — merge them on the
    # driver in one vectorized pass when small (saves an all-to-all);
    # fall back to the distributed groupby for pathological sizes.
    phase = {}
    t_p = time.monotonic()
    bmat = boundary.materialize()
    phase["pipeline_sec"] = round(time.monotonic() - t_p, 2)
    t_p = time.monotonic()
    if bmat.count() <= opts.boundary_driver_limit:
        import pyarrow as pa

        # blocks mix string/large_string depending on whether the
        # polars sort touched them — permissive promotion unifies
        tbl = pa.concat_tables(
            [ray.get(ref) for ref in bmat.to_arrow_refs()],
            promote_options="permissive",
        )
        rest_tbl = encode_partials_table(tbl, opts.block_size)
        if rest_tbl.num_rows:
            mf.atomic_write_table(
                rest_tbl, os.path.join(postings_dir, "postings-boundary.parquet")
            )
    else:
        rest = bmat.groupby("skey").map_groups(
            make_postings_merger(opts.block_size), batch_format="pyarrow"
        )
        rest.write_parquet(postings_dir, row_group_size=opts.row_group_size)
    phase["boundary_rows"] = bmat.count()
    phase["boundary_merge_sec"] = round(time.monotonic() - t_p, 2)
    t_p = time.monotonic()

    # global stats from the (tiny, one-row-per-doc) doc store
    meta = pads.dataset(docmeta_dir, format="parquet")
    field_cols = [f"dl__{f}" for f, _ in opts.extra_fields]
    stats = meta.to_table(columns=["doc_id", "dl"] + field_cols)
    n_docs = stats.num_rows
    import pyarrow.compute as pc

    total_tokens = int(pc.sum(stats["dl"]).as_py() or 0)
    field_stats = {}
    for (fname, _col), dcol in zip(opts.extra_fields, field_cols):
        ftot = int(pc.sum(stats[dcol]).as_py() or 0)
        field_stats[fname] = {
            "total_tokens": ftot,
            "avgdl": (ftot / n_docs) if n_docs else 0.0,
        }
    n_unique = pc.count_distinct(stats["doc_id"]).as_py()
    if n_unique != n_docs:
        raise ValueError(
            f"doc_id collision: {n_docs} rows, {n_unique} distinct ids"
        )
    elapsed = time.monotonic() - t0

    manifest = {
        "n_docs": n_docs,
        "total_tokens": total_tokens,
        "avgdl": (total_tokens / n_docs) if n_docs else 0.0,
        "fields": field_stats,
        # (field, source column) pairs so maintenance jobs
        # (update_index) can rebuild segments with the same mapping
        "extra_fields": [list(p) for p in opts.extra_fields],
        "block_size": opts.block_size,
        "num_doc_shards": opts.num_doc_shards,
        "analyzer": _analyzer_dict(opts.analyzer_config),
        "postings_files": sorted(os.listdir(postings_dir)),
        "docmeta_files": sorted(os.listdir(docmeta_dir)),
        "metrics": {
            **phase,
            "stats_sec": round(time.monotonic() - t_p, 2),
            "elapsed_sec": elapsed,
            "docs_per_sec": (n_docs / elapsed) if elapsed > 0 else None,
            "tokens_per_sec": (total_tokens / elapsed) if elapsed > 0 else None,
        },
    }
    mf.write_manifest(index_dir, manifest)
    return mf.read_manifest(index_dir)


def build_index_partitioned(
    input_files: list[str],
    index_dir: str,
    opts: BuildOptions | None = None,
    num_partitions: int = 4,
    resume: bool = True,
) -> dict:
    """Resumable multi-partition build: one sub-index per file group.

    Each partition is built independently (own docmeta/postings/manifest,
    committed atomically); on resume, committed partitions are skipped
    and only missing ones rebuild — a killed run therefore produces a
    byte-identical final index to a from-scratch run (FIXTURES.md §6).
    The query layer (`IndexReader`) treats partitions as segments: df and
    doc stats merge at read time, exactly like ES shards.
    """
    from ..sources.corpus import read_corpus

    opts = opts or BuildOptions()
    os.makedirs(index_dir, exist_ok=True)
    groups: list[list[str]] = [[] for _ in range(num_partitions)]
    for i, f in enumerate(sorted(input_files)):
        groups[i % num_partitions].append(f)
    groups = [g for g in groups if g]

    partitions = []
    for pid, files in enumerate(groups):
        pdir = os.path.join(index_dir, f"part-{pid:05d}")
        pman = mf.read_manifest(pdir)
        if resume and pman is not None and pman.get("input_files") == files:
            partitions.append({"partition_id": pid, "status": "skipped", **_lineage(pman, files)})
            continue
        ds = read_corpus(files)
        t0 = time.monotonic()
        pman = build_index(ds, pdir, opts, overwrite=True)
        pman["input_files"] = files
        mf.write_manifest(pdir, {k: v for k, v in pman.items() if k != "format_version"})
        partitions.append(
            {"partition_id": pid, "status": "built", "elapsed_sec": time.monotonic() - t0, **_lineage(pman, files)}
        )

    subs = [mf.read_manifest(os.path.join(index_dir, f"part-{p['partition_id']:05d}")) for p in partitions]
    n_docs = sum(s["n_docs"] for s in subs)
    total_tokens = sum(s["total_tokens"] for s in subs)
    top = {
        "n_docs": n_docs,
        "total_tokens": total_tokens,
        "avgdl": (total_tokens / n_docs) if n_docs else 0.0,
        "block_size": opts.block_size,
        "num_doc_shards": opts.num_doc_shards,
        "analyzer": _analyzer_dict(opts.analyzer_config),
        "segments": [f"part-{p['partition_id']:05d}" for p in partitions],
        "partitions": partitions,
    }
    mf.write_manifest(index_dir, top)
    return mf.read_manifest(index_dir)


def _lineage(pman: dict, files: list[str]) -> dict:
    return {
        "input_files": files,
        "row_count": pman["n_docs"],
        "token_count": pman["total_tokens"],
        "segment_metrics": pman.get("metrics"),
    }
