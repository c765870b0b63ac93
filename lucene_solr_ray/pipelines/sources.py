"""Additional corpus sources (the reference's benchmark feed readers).

read_line_docs replicates LineDocSource (lucene/benchmark/.../feeds/
LineDocSource.java:53): one document per line, `title TAB date TAB body`,
parsed vectorized from ray.data.read_text. Other formats map to native
Ray Data readers (read_json / read_csv / read_sql — SURVEY.md §2.1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data import Dataset


def read_line_docs(paths, start_id: int = 0) -> Dataset:
    """Line-doc corpus -> Dataset(doc_id, title, date, text).

    Doc ids are assigned per line hash of (title, body) — deterministic and
    independent of read parallelism (the engine needs stable int64 keys)."""
    ds = ray.data.read_text(paths)

    def parse(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t["text"], "\t", max_splits=2)
        lists = parts.to_pylist()
        titles, dates, bodies = [], [], []
        for row in lists:
            row = row or []
            titles.append(row[0] if len(row) > 0 else "")
            dates.append(row[1] if len(row) > 1 else "")
            bodies.append(row[2] if len(row) > 2 else "")
        from zlib import crc32

        ids = np.array(
            [crc32(f"{a}\x1f{b}".encode()) for a, b in zip(titles, bodies)],
            dtype=np.int64,
        )
        return pa.table(
            {
                "doc_id": pa.array(ids + start_id, pa.int64()),
                "title": pa.array(titles, pa.string()),
                "date": pa.array(dates, pa.string()),
                "text": pa.array(bodies, pa.large_string()),
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow")
