"""Resumable partitioned sink (pipelines.sink.write_partitioned)."""
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from gazetteer_search_ray.pipelines.sink import (
    SINK_MANIFEST,
    read_partitioned,
    write_partitioned,
)


def _corpus(n=5000):
    rng = np.random.default_rng(7)
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "val": pa.array(rng.integers(0, 1000, n)),
        "text": pa.array([f"doc {i}" for i in range(n)]),
    })


def _read_all(path):
    return read_partitioned(path).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)


def test_roundtrip_and_manifest(ray_session, tmp_path):
    t = _corpus()
    out = str(tmp_path / "sink")
    stats = write_partitioned(rd.from_arrow(t), out, "doc_id",
                              num_partitions=16)
    assert len(stats["written"]) == 16 and stats["skipped"] == []
    assert stats["rows_written"] == t.num_rows == stats["rows_total"]
    got = _read_all(out)
    pd.testing.assert_frame_equal(
        got, t.to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert os.path.exists(os.path.join(out, SINK_MANIFEST))
    # partition column stays internal
    assert "__part" not in got.columns


def test_resume_skips_committed(ray_session, tmp_path):
    t = _corpus(2000)
    out = str(tmp_path / "sink")
    write_partitioned(rd.from_arrow(t), out, "doc_id", num_partitions=8)
    mtimes = {d: os.path.getmtime(os.path.join(out, d))
              for d in os.listdir(out) if d.startswith("part=")}
    stats = write_partitioned(rd.from_arrow(t), out, "doc_id",
                              num_partitions=8)
    assert stats["written"] == [] and len(stats["skipped"]) == 8
    assert stats["rows_written"] == 0
    assert stats["rows_total"] == t.num_rows
    for d, m in mtimes.items():
        assert os.path.getmtime(os.path.join(out, d)) == m  # untouched


def test_crash_resume_rewrites_only_missing(ray_session, tmp_path):
    import json

    t = _corpus(3000)
    out = str(tmp_path / "sink")
    write_partitioned(rd.from_arrow(t), out, "doc_id", num_partitions=8)
    # simulate a crash: drop 3 partitions from disk AND manifest
    mp = os.path.join(out, SINK_MANIFEST)
    man = json.load(open(mp))
    lost = ["1", "4", "6"]
    for p in lost:
        shutil.rmtree(os.path.join(out, f"part={p}"))
        del man["committed"][p]
    json.dump(man, open(mp, "w"))
    stats = write_partitioned(rd.from_arrow(t), out, "doc_id",
                              num_partitions=8)
    assert sorted(stats["written"]) == lost
    assert stats["rows_total"] == t.num_rows
    pd.testing.assert_frame_equal(
        _read_all(out),
        t.to_pandas().sort_values("doc_id").reset_index(drop=True))


def test_uncommitted_dir_is_invisible_and_rewritten(ray_session, tmp_path):
    import json

    t = _corpus(1000)
    out = str(tmp_path / "sink")
    write_partitioned(rd.from_arrow(t), out, "doc_id", num_partitions=4)
    # crash between rename and manifest write: dir exists, not committed
    mp = os.path.join(out, SINK_MANIFEST)
    man = json.load(open(mp))
    del man["committed"]["2"]
    json.dump(man, open(mp, "w"))
    assert os.path.isdir(os.path.join(out, "part=2"))  # stale dir
    stats = write_partitioned(rd.from_arrow(t), out, "doc_id",
                              num_partitions=4)
    assert stats["written"] == ["2"]
    pd.testing.assert_frame_equal(
        _read_all(out),
        t.to_pandas().sort_values("doc_id").reset_index(drop=True))


def test_string_keys_partition_deterministically(ray_session, tmp_path):
    t = pa.table({"url": pa.array([f"https://h{i % 37}.io/p{i}"
                                   for i in range(800)]),
                  "doc_id": pa.array(np.arange(800, dtype=np.int64))})
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_partitioned(rd.from_arrow(t), a, "url", num_partitions=8)
    write_partitioned(rd.from_arrow(t), b, "url", num_partitions=8)
    for p in range(8):
        da = os.path.join(a, f"part={p}")
        db = os.path.join(b, f"part={p}")
        ra = (rd.read_parquet(da).to_pandas().sort_values("doc_id")
              .reset_index(drop=True)) if os.path.isdir(da) else None
        rb = (rd.read_parquet(db).to_pandas().sort_values("doc_id")
              .reset_index(drop=True)) if os.path.isdir(db) else None
        if ra is None or len(ra) == 0:
            assert rb is None or len(rb) == 0
        else:
            pd.testing.assert_frame_equal(ra, rb)


def test_mismatched_layout_rejected(ray_session, tmp_path):
    t = _corpus(100)
    out = str(tmp_path / "sink")
    write_partitioned(rd.from_arrow(t), out, "doc_id", num_partitions=4)
    with pytest.raises(ValueError):
        write_partitioned(rd.from_arrow(t), out, "doc_id",
                          num_partitions=8)
    with pytest.raises(ValueError):
        write_partitioned(rd.from_arrow(t), out, "val", num_partitions=4)
    # resume=False starts over cleanly
    stats = write_partitioned(rd.from_arrow(t), out, "val",
                              num_partitions=4, resume=False)
    assert stats["rows_total"] == 100
