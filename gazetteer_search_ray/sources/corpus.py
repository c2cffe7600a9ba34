"""Corpus sources.

The engine's primary input is a Parquet table of source-code files with
columns ``(repo: string, path: string, commit: string, lang: string,
content: string)`` (BASELINE.json ``input_hint``; the reference's NDJSON
address export — ``imp/addr/AddressesImporter.java:114-151`` — plays the
same role).

Three entry points:

* :func:`read_corpus` — ``ray.data.read_parquet`` with column pruning and
  deterministic 63-bit ``doc_id`` assignment;
* :func:`documents_as_corpus` — adapter mapping the driver testdata
  ``documents(doc_id, text, lang, source, n_chars)`` table onto the
  corpus shape (FIXTURES.md §1);
* :func:`synthetic_corpus` / :func:`write_synthetic_corpus` — the
  deterministic seed-fixed code-corpus generator used by unit tests and
  the resume/scaling fixtures (FIXTURES.md §1: Zipf vocabulary for
  heavy-hitter skew, camelCase/snake_case compounds, short tokens, digit
  tokens, unicode tokens, bracketed spans, planted rare terms).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def _assign_doc_ids(batch: pa.Table) -> pa.Table:
    """Deterministic 63-bit doc_id from (repo, path, commit).

    Vectorized: one blake2b per row over the concatenated key — no
    global sort / zip-with-index pass is needed, which keeps doc_id
    assignment embarrassingly parallel at 10^12-file scale (SURVEY.md
    §4 'Ordering').
    """
    repo = batch["repo"].to_pylist()
    path = batch["path"].to_pylist()
    commit = batch["commit"].to_pylist()
    ids = np.empty(len(repo), dtype=np.int64)
    for i in range(len(repo)):
        h = hashlib.blake2b(
            f"{repo[i]}\x00{path[i]}\x00{commit[i]}".encode(), digest_size=8
        ).digest()
        ids[i] = int.from_bytes(h, "big") & 0x7FFF_FFFF_FFFF_FFFF
    return batch.append_column("doc_id", pa.array(ids, pa.int64()))


def read_corpus(paths, columns: list[str] | None = None):
    """Read a corpus parquet dir/file → Dataset with a ``doc_id`` column."""
    import ray.data as rd

    cols = columns or CORPUS_COLUMNS
    ds = rd.read_parquet(paths, columns=cols)
    if "doc_id" not in cols:
        ds = ds.map_batches(_assign_doc_ids, batch_format="pyarrow")
    return ds


def documents_as_corpus(sf_dir: str):
    """Map the testdata ``documents`` table onto the corpus shape.

    content=text, repo=source, path=str(doc_id), commit=sha1(repo/path)
    prefix, same lang; keeps the native int64 ``doc_id``.  Synthetic
    ``lat``/``lon`` are derived deterministically from doc_id (integer
    arithmetic, reproducible in the SQL oracle) so the geo-distance
    secondary sort (``QueryEngine.top_k_geo_sorted``) is
    driver-verifiable over a corpus that has no native coordinates.
    """
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )

    def adapt(batch: pa.Table) -> pa.Table:
        path = pc.cast(batch["doc_id"], pa.string())
        commits = pa.array(
            [
                hashlib.sha1(f"{s}/{d}".encode()).hexdigest()[:12]
                for s, d in zip(
                    batch["source"].to_pylist(), batch["doc_id"].to_pylist()
                )
            ]
        )
        d = batch["doc_id"].to_numpy()
        lat = ((d * 37) % 17000) / 100.0 - 85.0
        lon = ((d * 91) % 35000) / 100.0 - 175.0
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "repo": batch["source"],
                "path": path,
                "commit": commits,
                "lang": batch["lang"],
                "content": batch["text"],
                "n_chars": batch["n_chars"],
                "lat": pa.array(lat, pa.float64()),
                "lon": pa.array(lon, pa.float64()),
            }
        )

    return ds.map_batches(adapt, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# synthetic deterministic code corpus (FIXTURES.md §1)
# ---------------------------------------------------------------------------

_LANGS = ["python", "java", "go", "js", "rust", "text"]
_LANG_W = np.array([0.3, 0.2, 0.15, 0.15, 0.1, 0.1])
_EXT = {"python": "py", "java": "java", "go": "go", "js": "js", "rust": "rs", "text": "txt"}

# planted rare terms with a known (doc, tf) layout for exact BM25 hand
# checks: term -> [(doc index offset, tf)]
PLANTED = {
    "xqzfrobnicate": [(3, 2), (17, 1)],
    "qwyzzle": [(5, 5)],
}


def _vocab(n: int) -> list[str]:
    base = [
        "def", "return", "import", "class", "self", "if", "else", "for",
        "while", "func", "var", "let", "const", "public", "static", "void",
        "int", "string", "new", "try", "catch", "err", "nil", "true",
        "false", "match", "impl", "struct", "fn", "use",
    ]
    extra = [f"ident{i}" for i in range(len(base), n)]
    return base + extra


def synthetic_corpus(n_docs: int = 200, seed: int = 42) -> pa.Table:
    """Deterministic token-soup corpus of source-code files."""
    rng = np.random.default_rng(seed)
    vocab = _vocab(2000)
    zipf_p = 1.0 / np.arange(1, len(vocab) + 1) ** 1.1
    zipf_p /= zipf_p.sum()

    camel = ["getUserName", "parseAddrRow", "HttpServerV2", "readFileSync",
             "utf8Decode", "maxRetryCount"]
    snake = ["parse_addr_row", "read_file_sync", "max_retry_count"]
    unicodeish = ["straße", "naïveCafé", "Bebić"]

    # one vectorized Zipf draw for the whole corpus (per-doc rng.choice
    # with probabilities is ~100× slower at 10^5+ docs)
    n_toks = rng.integers(30, 200, size=n_docs)
    all_ids = rng.choice(len(vocab), size=int(n_toks.sum()), p=zipf_p)
    vocab_arr = np.array(vocab, dtype=object)
    all_toks = vocab_arr[all_ids]
    tok_off = np.concatenate(([0], np.cumsum(n_toks)))
    lang_ids = rng.choice(len(_LANGS), size=n_docs, p=_LANG_W)

    rows = {k: [] for k in ["repo", "path", "commit", "lang", "content"]}
    for i in range(n_docs):
        repo = f"org{i % 7}/repo{i % 23}"
        lang = _LANGS[int(lang_ids[i])]
        path = f"src/m{i % 13}/sub{i % 5}/file_{i}.{_EXT[lang]}"
        commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()[:12]
        toks = list(all_toks[tok_off[i] : tok_off[i + 1]])
        # sprinkle fixtures deterministically
        if i % 11 == 0:
            toks.append(camel[i % len(camel)])
        if i % 13 == 0:
            toks.append(snake[i % len(snake)])
        if i % 17 == 0:
            toks.append(unicodeish[i % len(unicodeish)])
        if i % 7 == 0:
            toks.append(f"(deprecated{i % 3})")
        if i % 5 == 0:
            toks.append(f"v{i % 100}")  # digit-bearing
        for term, layout in PLANTED.items():
            for off, tf in layout:
                if i == off:
                    toks.extend([term] * tf)
        rng.shuffle(toks)
        rows["repo"].append(repo)
        rows["path"].append(path)
        rows["commit"].append(commit)
        rows["lang"].append(lang)
        rows["content"].append(" ".join(map(str, toks)))
    return pa.table(rows)


def write_synthetic_corpus(
    out_dir: str, n_docs: int = 200, seed: int = 42, n_files: int = 4
) -> list[str]:
    """Write the synthetic corpus as ``n_files`` parquet shards."""
    os.makedirs(out_dir, exist_ok=True)
    t = synthetic_corpus(n_docs, seed)
    files = []
    per = (t.num_rows + n_files - 1) // n_files
    for i in range(n_files):
        shard = t.slice(i * per, per)
        if shard.num_rows == 0:
            continue
        f = os.path.join(out_dir, f"corpus-{i:04d}.parquet")
        pq.write_table(shard, f)
        files.append(f)
    return files


def read_corpus_ndjson(paths):
    """NDJSON(.gz) corpus reader — reference S1 parity adapter
    (``imp/addr/AddressesImporter.java:220-228``: BufferedReader + gzip
    sniff by extension + one JSON per line becomes
    ``ray.data.read_json`` with arrow's gzip auto-detection).  Expects
    objects with the corpus keys; assigns doc_ids like read_corpus.
    """
    import ray.data as rd

    ds = rd.read_json(paths)
    return ds.map_batches(_assign_doc_ids, batch_format="pyarrow")
