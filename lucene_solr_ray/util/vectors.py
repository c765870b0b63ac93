"""Zero-copy-ish Arrow list<float> -> numpy matrix conversion.

`to_pylist()` on an embedding column builds millions of Python floats; the
values buffer of a (FixedSize)ListArray is already the flat matrix, so one
reshape replaces the per-row Python loop in every vector operator.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def vec_matrix(col, dim: int | None = None, dtype=np.float64) -> np.ndarray:
    """(n_rows, dim) float matrix from a list-of-number column.

    Works for ListArray / LargeListArray / FixedSizeListArray chunked or
    not; assumes equal-length lists (ragged input raises on reshape)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if not hasattr(col, "values"):
        # extension arrays (e.g. Ray's ArrowTensorArray) expose 2-D to_numpy
        arr = col.to_numpy(zero_copy_only=False)
        if arr.dtype == object:
            arr = np.stack(arr) if n else np.zeros((0, dim or 0))
        return np.asarray(arr, dtype=dtype)
    flat = col.values.to_numpy(zero_copy_only=False).astype(dtype)
    if n == 0:
        return flat.reshape(0, dim or 0)
    d = dim if dim is not None else len(flat) // n
    return flat.reshape(n, d)
