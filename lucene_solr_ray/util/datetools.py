"""DateTools (document/DateTools.java): date <-> sortable-string conversion
and resolution rounding, vectorized over Arrow timestamp columns.

Reference semantics (DateTools.java:83-131,157-177):
* `dateToString` formats UTC as "yyyyMMddHHmmssSSS" truncated to the
  resolution's prefix length (4/6/8/10/12/14/17) — the string sorts in
  time order (the whole point: range queries over term strings);
* `stringToDate` infers the resolution from the string LENGTH and parses
  back to a UTC timestamp (ParseException -> ValueError here);
* `round` floors a time to the resolution (calendar fall-through:
  Resolution.MONTH zeroes day-of-month..millis, etc.).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# resolution -> (format-string prefix length, strftime fmt, floor unit)
_RES = {
    "year":        (4,  "%Y",               "year"),
    "month":       (6,  "%Y%m",             "month"),
    "day":         (8,  "%Y%m%d",           "day"),
    "hour":        (10, "%Y%m%d%H",         "hour"),
    "minute":      (12, "%Y%m%d%H%M",       "minute"),
    "second":      (14, "%Y%m%d%H%M%S",     "second"),
    "millisecond": (17, None,               "millisecond"),
}
_LEN_TO_RES = {v[0]: k for k, v in _RES.items()}


def _as_ts_array(ts) -> pa.Array:
    if isinstance(ts, pa.ChunkedArray):
        ts = ts.combine_chunks()
    if not isinstance(ts, pa.Array):
        ts = pa.array(np.asarray(ts, dtype="datetime64[us]"))
    return ts


def date_to_string(ts, resolution: str = "millisecond") -> pa.Array:
    """Arrow timestamp array -> sortable yyyyMMddHHmmssSSS prefix strings."""
    res = resolution.lower()
    if res not in _RES:
        raise ValueError(f"unknown resolution {resolution!r}")
    ts = _as_ts_array(ts)
    n, fmt, _ = _RES[res]
    if fmt is not None:
        # Arrow's %S appends fractional seconds on sub-second units; the
        # slice keeps exactly the resolution's prefix
        return pc.utf8_slice_codeunits(pc.strftime(ts, format=fmt), 0, n)
    # millisecond: second prefix + zero-padded millis (strftime lacks %f ms)
    secs = pc.utf8_slice_codeunits(
        pc.strftime(ts, format="%Y%m%d%H%M%S"), 0, 14)
    us = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
    unit = ts.type.unit
    per_ms = {"s": None, "ms": 1, "us": 1000, "ns": 1_000_000}[unit]
    if per_ms is None:
        ms = np.zeros(len(us), np.int64)
    else:
        ms = (us // per_ms) % 1000
    ms_str = pa.array([f"{int(m):03d}" for m in ms], pa.string())
    return pc.binary_join_element_wise(secs, ms_str, "")


def string_to_date(strs) -> pa.Array:
    """Sortable date strings (resolution inferred from length) -> UTC
    timestamp[ms] array. Mixed lengths allowed; invalid input raises."""
    if isinstance(strs, (pa.Array, pa.ChunkedArray)):
        strs = strs.to_pylist()
    out = np.empty(len(strs), dtype="datetime64[ms]")
    for i, s in enumerate(strs):
        if s is None or len(s) not in _LEN_TO_RES:
            raise ValueError(f"not a valid date string: {s!r}")
        pad = "19700101000000000"
        full = s + pad[len(s):]
        try:
            out[i] = np.datetime64(
                f"{full[0:4]}-{full[4:6]}-{full[6:8]}T"
                f"{full[8:10]}:{full[10:12]}:{full[12:14]}."
                f"{full[14:17]}", "ms")
        except ValueError as e:
            raise ValueError(f"not a valid date string: {s!r}") from e
    return pa.array(out)


def round_date(ts, resolution: str) -> pa.Array:
    """Floor timestamps to the resolution (DateTools.round fall-through)."""
    res = resolution.lower()
    if res not in _RES:
        raise ValueError(f"unknown resolution {resolution!r}")
    ts = _as_ts_array(ts)
    return pc.floor_temporal(ts, unit=_RES[res][2])
