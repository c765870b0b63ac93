import numpy as np
import pyarrow as pa

from lucene_solr_ray.analysis import html_to_text
from lucene_solr_ray.pipelines import corpus_table


def test_deterministic():
    a = corpus_table(200)
    b = corpus_table(200)
    assert a.equals(b)
    c = corpus_table(200, seed=7)
    assert not a["text"].equals(c["text"])


def test_schema_matches_input_hint():
    t = corpus_table(50)
    names = t.column_names
    for col in ["url", "warc_ts", "html", "text", "lang"]:
        assert col in names
    assert pa.types.is_timestamp(t.schema.field("warc_ts").type)
    assert pa.types.is_large_binary(t.schema.field("html").type)


def test_html_extraction_byte_identity():
    # the per-row invariant from BASELINE.json input_hint
    t = corpus_table(400)
    for h, txt in zip(t["html"].to_pylist(), t["text"].to_pylist()):
        assert html_to_text(h).strip() == txt


def test_zipf_head_present():
    t = corpus_table(500)
    from collections import Counter

    c: Counter = Counter()
    total = 0
    for txt in t["text"].to_pylist():
        ws = txt.split(" ")
        c.update(ws)
        total += len(ws)
    top = c.most_common(1)[0][1] / total
    assert top > 0.02  # head term carries real skew


def test_overlong_and_mixed_script_docs_exist():
    t = corpus_table(300)
    texts = t["text"].to_pylist()
    assert any("q" * 300 in x for x in texts)
    assert any("データ" in x or "エンジン" in x for x in texts)
