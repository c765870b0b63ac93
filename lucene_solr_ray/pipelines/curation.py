"""End-to-end web-corpus curation pipeline.

Composes the engine's training-data operators into ONE streaming pass the
way a production pretraining-data pipeline does (the C4 / Gopher /
RefinedWeb recipe): quality-rule filtering -> exact dedup -> (optionally)
near-dup removal -> partitioned parquet out. Every stage is an
already-oracle-verified component; this module only wires them with
scale-safe plumbing:

- metrics + pass flags compute inline in one ``map_batches`` (no second
  corpus scan);
- exact-dedup winners resolve with a hash-partitioned groupby + Min
  reduction (one (hash, id) row per doc crosses the wire, text never
  shuffles);
- survivors join back by doc id with the hash-partitioned ``Dataset.join``
  — no driver-side id set, so the pipeline holds at any corpus size;
- the final write is partitioned parquet (resumable output).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from ..dedup.ops import dedup_exact
from ..textstats.ops import gopher_filters


def curate_corpus(ds: Dataset, key_col: str = "doc_id",
                  text_col: str = "text", keep_cols: tuple = ("lang",),
                  min_words: int = 25, min_stop_hits: int = 2,
                  num_partitions: int = 16) -> Dataset:
    """Returns the curated survivors as a lazy Dataset of
    (key_col, n_words, *keep_cols): docs that pass the Gopher rules AND
    win exact dedup (lowest id per identical text)."""
    # keep_cols ride through the metrics pass, so ONE join closes the
    # pipeline (dedup semantics stay dedup-over-all-docs: a duplicate
    # whose winner failed quality is still dropped, as in the reference
    # recipes where dedup keys on raw content)
    metrics = gopher_filters(ds, key_col, text_col, min_words=min_words,
                             min_stop_hits=min_stop_hits,
                             carry_cols=keep_cols)

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(t["passes"]).select(
            [key_col, "n_words", *keep_cols])

    from ..relational.ops import safe_join

    passing = metrics.map_batches(keep, batch_format="pyarrow")
    # native hash join; safe_join's sentinel rows guard the case where
    # every doc fails quality (a fully-filtered Dataset reaches Ray 2.49's
    # join aggregator schema-less and crashes finalize)
    l_schema = pa.schema(
        [(key_col, pa.int64()), ("n_words", pa.int64())]
        + [(c, pa.string()) for c in keep_cols])
    winners = dedup_exact(ds, key_col, text_col)
    kept = safe_join(passing, winners, on=key_col,
                     num_partitions=num_partitions, l_schema=l_schema,
                     r_schema=pa.schema([(key_col, pa.int64())]))
    return kept.select_columns([key_col, "n_words", *keep_cols])


def curate_to_parquet(ds: Dataset, out_dir: str,
                      partition_col: str = "lang", **kw) -> dict:
    """Run the curation pass and write partitioned parquet (one directory
    per partition value — the resumable-output layout). Returns counts."""
    kept = curate_corpus(ds, **kw)
    kept.write_parquet(out_dir, partition_cols=[partition_col],
                       mode="overwrite")
    return {"out_dir": out_dir}
