"""DateTools parity (document/DateTools.java): sortable-string format per
resolution, length-inferred parsing, calendar-floor rounding."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_solr_ray.util.datetools import (
    date_to_string,
    round_date,
    string_to_date,
)

TS = pa.array(np.array(
    ["2004-09-21T13:50:11.123", "1999-12-31T23:59:59.999"],
    dtype="datetime64[ms]"))


@pytest.mark.parametrize("res,want", [
    ("year", ["2004", "1999"]),
    ("month", ["200409", "199912"]),
    ("day", ["20040921", "19991231"]),
    ("hour", ["2004092113", "1999123123"]),
    ("minute", ["200409211350", "199912312359"]),
    ("second", ["20040921135011", "19991231235959"]),
    ("millisecond", ["20040921135011123", "19991231235959999"]),
])
def test_date_to_string_resolutions(res, want):
    assert date_to_string(TS, res).to_pylist() == want


def test_string_to_date_infers_resolution_from_length():
    # DateTools.stringToDate:125-131 parses by string length
    d = string_to_date(["2004", "200409", "20040921", "20040921135011123"])
    assert [str(x)[:10] for x in d.to_pylist()] == [
        "2004-01-01", "2004-09-01", "2004-09-21", "2004-09-21"]
    with pytest.raises(ValueError):
        string_to_date(["20049"])  # length 5 has no resolution
    with pytest.raises(ValueError):
        string_to_date(["2004bb"])


def test_roundtrip_all_resolutions():
    for s, res in [("2004", "year"), ("200409", "month"),
                   ("20040921", "day"), ("2004092113", "hour"),
                   ("200409211350", "minute"), ("20040921135011", "second"),
                   ("20040921135011123", "millisecond")]:
        assert date_to_string(string_to_date([s]), res).to_pylist() == [s]


def test_round_calendar_floor():
    # the DateTools.round javadoc example: 2004-09-21 13:50:11 -> MONTH
    # becomes 2004-09-01 00:00:00
    r = round_date(TS, "month").to_pylist()
    assert str(r[0]).startswith("2004-09-01 00:00:00")
    r = round_date(TS, "hour").to_pylist()
    assert str(r[1]).startswith("1999-12-31 23:00:00")
    # strings sort in time order (the format's purpose)
    s = date_to_string(TS, "millisecond").to_pylist()
    assert (s[0] < s[1]) == (TS[0].as_py() < TS[1].as_py())


def test_microsecond_unit_input():
    ts2 = pa.array(np.array(["2020-02-29T01:02:03.456789"],
                            dtype="datetime64[us]"))
    assert date_to_string(ts2, "millisecond").to_pylist() == [
        "20200229010203456"]
