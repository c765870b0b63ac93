"""PII scrubbing + URL host filtering curation ops."""

import pyarrow as pa
import pytest
import ray

from lucene_solr_ray.textstats.ops import pii_scrub, url_filter, url_hosts


@pytest.fixture(scope="module")
def pii_ds(ray_session):
    return ray.data.from_arrow(pa.table({
        "id": [0, 1, 2, 3],
        "body": [
            "write to john.doe+x@mail.example.org today",
            "call +1 555-123-4567 or 020 7946 0958 now",
            "server at 192.168.0.1 and 10.0.0.254 responded",
            None,
        ],
    }))


def test_pii_scrub(pii_ds):
    out = pii_scrub(pii_ds, "body").to_pandas().sort_values("id")
    assert list(out["body_scrubbed"]) == [
        "write to [EMAIL] today",
        "call [PHONE] or [PHONE] now",
        "server at [IP] and [IP] responded",
        "",
    ]
    assert list(out["n_email"]) == [1, 0, 0, 0]
    assert list(out["n_phone"]) == [0, 2, 0, 0]
    assert list(out["n_ip"]) == [0, 0, 2, 0]


def test_pii_order_no_double_count(ray_session):
    # the email's digits must not also count as a phone: email scrubs first
    ds = ray.data.from_arrow(pa.table({
        "id": [0], "body": ["mail 12345678901@nums.example.com please"]}))
    out = pii_scrub(ds, "body").to_pandas()
    assert int(out["n_email"].iloc[0]) == 1
    assert int(out["n_phone"].iloc[0]) == 0
    assert out["body_scrubbed"].iloc[0] == "mail [EMAIL] please"


@pytest.fixture(scope="module")
def url_ds(ray_session):
    urls = ([f"https://a.example.com/{i}" for i in range(5)]
            + [f"http://b.spam.biz/{i}" for i in range(3)]
            + ["not a url", None, "https://c.example.com/x"])
    return ray.data.from_arrow(pa.table({
        "id": list(range(len(urls))), "url": urls}))


def test_url_hosts(url_ds):
    out = url_hosts(url_ds, "url").to_pandas()
    got = dict(zip(out["host"], out["cnt"]))
    assert got == {"a.example.com": 5, "b.spam.biz": 3, "": 2,
                   "c.example.com": 1}


def test_url_filter(url_ds):
    kept = url_filter(url_ds, "url",
                      blocked_hosts={"a.example.com"},
                      blocked_tlds=("biz",)).to_pandas()
    hosts = set()
    for u in kept["url"]:
        if u and u.startswith("http"):
            hosts.add(u.split("/")[2])
    assert hosts == {"c.example.com"}
    assert len(kept) == 3  # c.example.com + 'not a url' + None survive


def test_pii_urp_processor(ray_session):
    from lucene_solr_ray.pipelines.urp import apply_chain

    t = pa.table({"id": [0], "body": ["mail a@b.example.net now"]})
    out = apply_chain(ray.data.from_arrow(t),
                      [("pii_scrub", {"field": "body"})]).to_pandas()
    assert out["body"].iloc[0] == "mail [EMAIL] now"
