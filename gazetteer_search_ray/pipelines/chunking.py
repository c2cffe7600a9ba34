"""Passage chunking: split documents into fixed-size overlapping
windows (RAG / retrieval-index passage extraction, long-document
training-example splitting).

The reference engine indexes whole rows (one ES document per address
object, ``imp/addr/AddrRowValueExtractor.java``); an LLM-scale corpus
additionally needs the *inverse* of sequence packing
(:func:`..packing.pack_spans`): explode each document into chunks
small enough to embed / index / train on, with overlap so no boundary
context is lost.

Both operators here are embarrassingly parallel ``map_batches`` —
no shuffle, no driver-side state, each output chunk derives from
exactly one input row.  The kernels vectorize **by chunk index**, not
by row: chunk ``k`` of every doc in the batch is sliced in one Arrow
kernel call (``utf8_slice_codeunits`` / ``list_slice``), so the
Python-level loop runs ``max_chunks_in_batch`` times regardless of
batch size.  At 100 TB this stage streams: output size is
``~L/stride`` times input size, so downstream consumers see bounded
blocks (Ray Data splits oversized output blocks automatically).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _n_chunks(lengths: np.ndarray, stride: int) -> np.ndarray:
    """floor((L-1)/stride)+1 windows for L>0, none for empty docs —
    i.e. window starts at 0, stride, 2·stride, … while start < L."""
    return np.where(lengths > 0, (lengths - 1) // stride + 1, 0)


def chunk_text(ds, size: int, stride: int | None = None,
               text_col: str = "text", id_col: str = "doc_id"):
    """Fixed-size CHARACTER windows with overlap.

    Chunk ``k`` of a document covers codepoints
    ``[k*stride, k*stride + size)``; a doc of ``L > 0`` codepoints
    yields ``floor((L-1)/stride) + 1`` chunks (the last may be short),
    an empty doc yields none.  ``stride`` defaults to ``size`` (no
    overlap).  Output columns ``(id_col, chunk_id, chunk)``.
    """
    if stride is None:
        stride = size
    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")

    def explode(t: pa.Table) -> pa.Table:
        lens = pc.utf8_length(t[text_col]).to_numpy(zero_copy_only=False)
        lens = np.asarray(lens, dtype=np.int64)
        n_chunks = _n_chunks(lens, stride)
        ids_out, ks_out, chunks_out = [], [], []
        max_k = int(n_chunks.max()) if n_chunks.size else 0
        for k in range(max_k):
            mask = n_chunks > k
            sel = t.filter(pa.array(mask))
            chunks_out.append(pc.utf8_slice_codeunits(
                sel[text_col], start=k * stride, stop=k * stride + size))
            ids_out.append(sel[id_col])
            ks_out.append(pa.array(
                np.full(sel.num_rows, k, dtype=np.int64)))
        if not ids_out:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "chunk_id": pa.array([], pa.int64()),
                             "chunk": pa.array([], pa.string())})
        return pa.table({
            id_col: pa.concat_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                 else a for a in ids_out]),
            "chunk_id": pa.concat_arrays(ks_out),
            "chunk": pa.concat_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                 else a for a in chunks_out]),
        })

    return ds.map_batches(explode, batch_format="pyarrow")


def chunk_tokens(ds, size: int, stride: int | None = None,
                 text_col: str = "text", id_col: str = "doc_id",
                 sep: str = " "):
    """Fixed-size TOKEN windows with overlap (tokens = ``sep``-split
    fields, matching SQL ``string_split(text, sep)`` exactly, empties
    preserved).  Chunk ``k`` covers tokens
    ``[k*stride, k*stride + size)`` re-joined with ``sep``; a doc of
    ``T`` tokens yields ``floor((T-1)/stride) + 1`` chunks (splitting
    always yields ``T >= 1`` — an empty doc is one empty token).
    Output columns ``(id_col, chunk_id, n_tokens, chunk)``.
    """
    if stride is None:
        stride = size
    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")

    def explode(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t[text_col], pattern=sep)
        ntok = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ntok = np.asarray(ntok, dtype=np.int64)
        n_chunks = _n_chunks(ntok, stride)
        ids_out, ks_out, nt_out, chunks_out = [], [], [], []
        max_k = int(n_chunks.max()) if n_chunks.size else 0
        for k in range(max_k):
            mask = pa.array(n_chunks > k)
            sel_toks = pc.list_slice(
                toks.filter(mask) if isinstance(toks, pa.ChunkedArray)
                else toks.filter(mask),
                start=k * stride, stop=k * stride + size)
            sel_nt = np.minimum(ntok[n_chunks > k] - k * stride, size)
            chunks_out.append(pc.binary_join(
                sel_toks, pa.scalar(sep, pa.string())))
            ids_out.append(t[id_col].filter(mask))
            ks_out.append(pa.array(
                np.full(len(sel_nt), k, dtype=np.int64)))
            nt_out.append(pa.array(sel_nt.astype(np.int64)))
        if not ids_out:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "chunk_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "chunk": pa.array([], pa.string())})

        def _flat(arrs):
            return pa.concat_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                 else a for a in arrs])

        return pa.table({id_col: _flat(ids_out),
                         "chunk_id": pa.concat_arrays(ks_out),
                         "n_tokens": pa.concat_arrays(nt_out),
                         "chunk": _flat(chunks_out)})

    return ds.map_batches(explode, batch_format="pyarrow")
