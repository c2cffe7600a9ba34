"""Corpus-cleaning operators: PII scan/redaction and corpus-level
boilerplate line removal.

The reference engine has no cleaning stage (its import pipeline
normalizes but never drops content — SURVEY.md §2.2), but both
operators are staples of large-scale training-data pipelines, so they
ship as first-class pipeline members with DuckDB oracles
(``driver_queries.py``: ``pii_scan`` / ``pii_redact`` /
``boilerplate`` / ``boilerplate_drop``).

Scale shapes:

* **PII scan/redact** are embarrassingly parallel ``map_batches``
  stages — RE2 kernels (``pyarrow.compute.count_substring_regex`` /
  ``replace_substring_regex``) over zero-copy Arrow batches, no
  shuffle, no state.  DuckDB's regex engine is also RE2, so the SQL
  oracles match byte-for-byte (differentially tested in
  ``tests/test_cleaning.py``).
* **Boilerplate removal** needs one corpus-wide exchange: which lines
  appear in ≥ ``min_docs`` distinct documents.  Each doc lives whole
  in one row, so per-doc line dedup happens inside ``map_batches``
  (no shuffle), and one ``groupby(line).count()`` — the only
  all-to-all — yields exact distinct-doc counts.  The frequent-line
  set is bounded by corpus redundancy (lines repeated across ≥ K
  docs), NOT by corpus size; it is broadcast once via ``ray.put`` and
  read in each filter actor's ``__init__``, never re-shipped per
  batch.  A pathological corpus (every line shared) degrades the
  broadcast, not the exchange — raise ``min_docs`` or pre-hash lines
  in that regime.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, redaction tag) — order is the REDACTION order
# (email first: its local part may contain digit runs a later phone
# pass would otherwise mangle).  Scan counts are per-pattern over the
# ORIGINAL text and may overlap across categories.
DEFAULT_PII: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\(?\d{3}\)?[ .\-]\d{3}[ .\-]\d{4}", "<PHONE>"),
)


def pii_scan(ds, text_col: str = "text", id_col: str = "doc_id",
             patterns: tuple = DEFAULT_PII):
    """Per-doc PII hit counts (one ``n_<name>`` column per pattern,
    plus their sum ``n_pii``).  Pure ``map_batches`` — no shuffle."""
    names = [name for name, _, _ in patterns]

    def scan(t: pa.Table) -> pa.Table:
        cols: dict = {id_col: t[id_col]}
        total = np.zeros(t.num_rows, dtype=np.int64)
        for name, pat, _ in patterns:
            c = pc.count_substring_regex(t[text_col], pat)
            c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            cnt = c.to_numpy(zero_copy_only=False).astype(np.int64)
            cols[f"n_{name}"] = pa.array(cnt)
            total += cnt
        cols["n_pii"] = pa.array(total)
        return pa.table(cols)

    return ds.map_batches(scan, batch_format="pyarrow")


def pii_redact(ds, text_col: str = "text", id_col: str = "doc_id",
               patterns: tuple = DEFAULT_PII):
    """Replace every PII match with its tag, sequentially in pattern
    order (matches DuckDB's nested ``regexp_replace(..., 'g')``)."""

    def redact(t: pa.Table) -> pa.Table:
        txt = t[text_col]
        for _, pat, tag in patterns:
            txt = pc.replace_substring_regex(txt, pattern=pat,
                                             replacement=tag)
        return pa.table({id_col: t[id_col], text_col: txt})

    return ds.map_batches(redact, batch_format="pyarrow")


def _doc_lines(t: pa.Table, text_col: str, sep: str) -> pd.DataFrame:
    """Distinct non-empty lines per doc in this batch — (line,) rows,
    one per (doc, line).  Docs are whole rows, so this dedup is local."""
    split = pc.split_pattern(t[text_col], sep)
    split = split.combine_chunks() if isinstance(split, pa.ChunkedArray) \
        else split
    n_lines = pc.list_value_length(split).to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(t.num_rows), n_lines)
    df = pd.DataFrame({
        "line": split.flatten().to_pandas(),
        "__doc": doc_idx,
    })
    df = df[df["line"] != ""].drop_duplicates()
    return df[["line"]]


def boilerplate_lines(ds, text_col: str = "text", id_col: str = "doc_id",
                      min_docs: int = 3, sep: str = "\n") -> pd.DataFrame:
    """Lines appearing in ≥ ``min_docs`` distinct docs →
    ``(line, n_docs)``, n_docs desc then line asc.  One
    ``groupby(line)`` exchange; the result is redundancy-bounded."""
    from ray.data.aggregate import Count

    lines = ds.map_batches(
        lambda t: pa.Table.from_pandas(_doc_lines(t, text_col, sep),
                                       preserve_index=False),
        batch_format="pyarrow",
    )
    counts = lines.groupby("line").aggregate(Count(alias_name="n_docs"))
    # the counts table is corpus-scale (every distinct line) — filter
    # vectorized per batch; only the redundancy-bounded survivors
    # reach the driver
    rep = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_docs"], min_docs)),
        batch_format="pyarrow",
    ).to_pandas()
    if rep.empty:  # all-blocks-filtered loses the schema
        rep = pd.DataFrame({"line": pd.Series(dtype=str),
                            "n_docs": pd.Series(dtype=np.int64)})
    rep["n_docs"] = rep["n_docs"].astype(np.int64)
    return rep.sort_values(["n_docs", "line"],
                           ascending=[False, True]).reset_index(drop=True)


URL_RE = r"https?://[A-Za-z0-9.\-]+(?:/[^\s]*)?"
# pc.extract_regex requires NAMED groups; the plain-group twin of this
# pattern lives in driver_queries._DOM_PAT for the DuckDB oracle
_DOMAIN_RE = r"https?://(?P<d>[A-Za-z0-9.\-]+)"


def extract_urls(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Explode every http(s) URL → ``(id, url, domain)`` rows (domain
    lowercased).  Shuffle-free flat map; the per-batch findall loop is
    C-level regex matching with the pattern compiled once per task.
    Matches DuckDB ``regexp_extract_all`` (same matches on the shared
    simple-dialect pattern — differentially tested)."""
    import re

    pat = re.compile(URL_RE)

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        matches = [pat.findall(s) if s else []
                   for s in t[text_col].to_pylist()]
        counts = np.fromiter((len(m) for m in matches), np.int64,
                             len(matches))
        urls = pa.array([u for m in matches for u in m], pa.string())
        doms = pc.utf8_lower(pc.struct_field(
            pc.extract_regex(urls, _DOMAIN_RE), "d"))
        return pa.table({
            id_col: pa.array(np.repeat(ids, counts)),
            "url": urls,
            "domain": doms,
        })

    return ds.map_batches(explode, batch_format="pyarrow")


def filter_blocked_domains(ds, blocked, text_col: str = "text",
                           id_col: str = "doc_id"):
    """Drop docs containing ANY URL whose domain is in ``blocked``
    (case-insensitive).  The blocklist is a broadcast set (tiny);
    shuffle-free membership pass, the C4-pipeline URL filter shape."""
    import re

    pat = re.compile(URL_RE)
    dom_pat = re.compile(_DOMAIN_RE)
    block = {d.lower() for d in blocked}

    def keep(t: pa.Table) -> pa.Table:
        mask = np.ones(t.num_rows, dtype=bool)
        for i, s in enumerate(t[text_col].to_pylist()):
            if not s or "://" not in s:
                continue
            for u in pat.findall(s):
                m = dom_pat.match(u)
                if m and m.group(1).lower() in block:
                    mask[i] = False
                    break
        return t.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


class _LineFilter:
    """Actor-pool stage: drops the broadcast frequent-line set from
    each doc, preserving line order.  The set is fetched once per
    actor (``ray.get`` in ``__init__``), never per batch."""

    def __init__(self, freq_ref, text_col: str, id_col: str, sep: str):
        import ray

        self.freq = set(ray.get(freq_ref))
        self.text_col, self.id_col, self.sep = text_col, id_col, sep

    def __call__(self, t: pa.Table) -> pa.Table:
        split = pc.split_pattern(t[self.text_col], self.sep)
        split = split.combine_chunks() \
            if isinstance(split, pa.ChunkedArray) else split
        values = split.flatten()
        keep = ~pd.Series(values.to_pandas()).isin(self.freq).to_numpy()
        n_lines = pc.list_value_length(split).to_numpy(zero_copy_only=False)
        ends = np.cumsum(n_lines)
        kept_per_doc = np.zeros(t.num_rows, dtype=np.int64)
        if len(keep):
            csum = np.concatenate(([0], np.cumsum(keep)))
            starts = np.concatenate(([0], ends[:-1]))
            kept_per_doc = csum[ends] - csum[starts]
        new_offsets = np.concatenate(([0], np.cumsum(kept_per_doc)))
        kept_list = pa.ListArray.from_arrays(
            pa.array(new_offsets, pa.int32()), values.filter(pa.array(keep)))
        joined = pc.binary_join(kept_list, self.sep)
        return pa.table({self.id_col: t[self.id_col], self.text_col: joined})


def remove_boilerplate(ds, text_col: str = "text", id_col: str = "doc_id",
                       min_docs: int = 3, sep: str = "\n",
                       concurrency: int = 2):
    """Drop every ≥``min_docs``-doc line from every doc.  Two passes
    over the corpus (count, then filter); the line set rides the
    object store once."""
    import ray

    rep = boilerplate_lines(ds, text_col, id_col, min_docs, sep)
    freq_ref = ray.put(rep["line"].tolist())
    return ds.map_batches(
        _LineFilter, batch_format="pyarrow", concurrency=concurrency,
        fn_constructor_kwargs=dict(freq_ref=freq_ref, text_col=text_col,
                                   id_col=id_col, sep=sep),
    )


def normalize_text(ds, text_col: str = "text", id_col: str = "doc_id"):
    """C4-style text normalization, one shuffle-free map pass:
    control characters → space, unicode NFC composition, lowercase,
    whitespace runs collapsed to one space, ends trimmed — the
    canonical pre-dedup/pre-tokenize cleanup so byte-different
    renderings of the same text hash equal downstream.

    Everything except NFC runs as vectorized RE2 / utf8 Arrow kernels.
    NFC itself takes a vectorized ASCII fast path
    (``pc.string_is_ascii`` — NFC is the identity on ASCII, so pure
    ASCII batches never leave Arrow) and falls back to per-string
    ``unicodedata.normalize`` ONLY for the non-ASCII minority:
    pyarrow 16.1's ``utf8_normalize`` returns decomposed output for
    every ``form`` argument (observed in this container), so it cannot
    be trusted for NFC parity with the SQL oracle's
    ``nfc_normalize``.

    Returns (id, text_norm, n_chars_norm) with codepoint lengths.
    """
    import unicodedata

    def f(t: pa.Table) -> pa.Table:
        s = pc.cast(t[text_col].combine_chunks(), pa.string())
        s = pc.replace_substring_regex(
            s, pattern=r"[\x00-\x1f\x7f]", replacement=" ")
        is_ascii = pc.string_is_ascii(s).to_numpy(zero_copy_only=False)
        if not is_ascii.all():
            vals = s.to_numpy(zero_copy_only=False)
            for i in np.flatnonzero(~is_ascii):
                if vals[i] is not None:
                    vals[i] = unicodedata.normalize("NFC", vals[i])
            s = pa.array(vals, pa.string())
        s = pc.utf8_lower(s)
        s = pc.replace_substring_regex(s, pattern=r"\s+", replacement=" ")
        s = pc.utf8_trim_whitespace(s)
        return pa.table({
            id_col: t[id_col],
            "text_norm": s,
            "n_chars_norm": pc.cast(pc.utf8_length(s), pa.int64()),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def json_extract_int(ds, field: str, json_col: str = "props",
                     keep_cols: tuple[str, ...] = ()):
    """Extract an integer field from a flat-JSON string column — the
    metadata-sidecar shape (crawl records carry per-page JSON props;
    the reference's closest analog is the OSM tag map each parser row
    carries, ``imp/addr/ImportObjectParser.java``).

    Vectorized RE2 extraction (``pc.extract_regex``) over zero-copy
    Arrow batches — no per-row JSON parser in the hot path, no
    shuffle.  Rows where the field is absent or non-integer yield
    null (SQL ``regexp_extract``-miss semantics).  Returns the input's
    ``keep_cols`` plus an int64 ``field`` column.
    """
    pat = rf'"{field}"\s*:\s*(?P<v>-?\d+)'

    def extract(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t[json_col], pat)
        # struct with one named capture group; null where no match
        v = pc.struct_field(m, "v")
        out = {c: t[c] for c in keep_cols}
        out[field] = pc.cast(v, pa.int64())
        return pa.table(out)

    return ds.map_batches(extract, batch_format="pyarrow")
