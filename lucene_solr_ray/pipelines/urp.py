"""UpdateRequestProcessor chain — declarative per-document ingest transforms.

The reference runs ~60 UpdateRequestProcessorFactory implementations as an
ordered chain in front of the index writer
(solr/core/src/java/org/apache/solr/update/processor/; chain wiring
UpdateRequestProcessorChain.java:60). Here a chain is a list of
(processor_name, params) pairs applied inside ONE fused ``map_batches``
stage — each processor is a vectorized Arrow/pandas transform over the
batch, so an arbitrarily long chain still costs a single pass over the
corpus with zero extra shuffles.

Implemented processors (reference factory in parens):

- ``clone``            (CloneFieldUpdateProcessorFactory.java:72)
- ``regex_replace``    (RegexReplaceProcessorFactory.java:48)
- ``trim``             (TrimFieldUpdateProcessorFactory.java:41)
- ``truncate``         (TruncateFieldUpdateProcessorFactory.java:44)
- ``field_length``     (FieldLengthUpdateProcessorFactory.java:40)
- ``default_value``    (DefaultValueUpdateProcessorFactory.java:48)
- ``remove_blank``     (RemoveBlankFieldUpdateProcessorFactory.java:39)
- ``concat``           (ConcatFieldUpdateProcessorFactory.java:53 — joins a
                        list column with a delimiter)
- ``count_values``     (CountFieldValuesUpdateProcessorFactory.java:45)
- ``uuid``             (UUIDUpdateProcessorFactory.java:44 — deterministic
                        UUIDv5-style hash of a key column; the reference's
                        random UUID is not reproducible, so the keyed hash
                        is the testable substitution)
- ``html_strip``       (HTMLStripFieldUpdateProcessorFactory.java:40 —
                        reuses the engine's HTMLStripCharFilter port)
- ``timestamp``        (TimestampUpdateProcessorFactory.java:44 — a fixed
                        value passed in params; wall-clock NOW would break
                        retry idempotence on a resumable build)
- ``signature``        (SignatureUpdateProcessorFactory.java:42 — exact
                        content hash column; feeds dedup_exact downstream)
- ``lower`` / ``upper``  (custom FieldMutating examples)
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa
import pyarrow.compute as pc

from ..util.polyhash import poly_hash_strings


def _proc_clone(t: pa.Table, p: dict) -> pa.Table:
    return t.append_column(p["dest"], t[p["src"]])


def _proc_regex_replace(t: pa.Table, p: dict) -> pa.Table:
    out = pc.replace_substring_regex(
        t[p["field"]], pattern=p["pattern"], replacement=p["replacement"])
    return t.set_column(t.column_names.index(p["field"]), p["field"], out)


def _proc_trim(t: pa.Table, p: dict) -> pa.Table:
    out = pc.utf8_trim_whitespace(t[p["field"]])
    return t.set_column(t.column_names.index(p["field"]), p["field"], out)


def _proc_truncate(t: pa.Table, p: dict) -> pa.Table:
    out = pc.utf8_slice_codeunits(t[p["field"]], 0, int(p["max_length"]))
    return t.set_column(t.column_names.index(p["field"]), p["field"], out)


def _proc_field_length(t: pa.Table, p: dict) -> pa.Table:
    out = pc.cast(pc.utf8_length(t[p["field"]]), pa.int64())
    dest = p.get("dest", p["field"])
    if dest in t.column_names:
        return t.set_column(t.column_names.index(dest), dest, out)
    return t.append_column(dest, out)


def _proc_default_value(t: pa.Table, p: dict) -> pa.Table:
    f = p["field"]
    if f not in t.column_names:
        return t.append_column(
            f, pa.array([p["value"]] * t.num_rows))
    out = pc.fill_null(t[f], p["value"])
    return t.set_column(t.column_names.index(f), f, out)


def _proc_remove_blank(t: pa.Table, p: dict) -> pa.Table:
    f = p["field"]
    col = t[f]
    blank = pc.equal(pc.utf8_trim_whitespace(pc.fill_null(col, "")), "")
    out = pc.if_else(blank, pa.scalar(None, col.type), col)
    return t.set_column(t.column_names.index(f), f, out)


def _proc_concat(t: pa.Table, p: dict) -> pa.Table:
    # joins a list<string> column's values (the reference concatenates a
    # multiValued field into one value)
    out = pc.binary_join(t[p["field"]], p.get("delimiter", ", "))
    dest = p.get("dest", p["field"])
    if dest in t.column_names:
        return t.set_column(t.column_names.index(dest), dest, out)
    return t.append_column(dest, out)


def _proc_count_values(t: pa.Table, p: dict) -> pa.Table:
    out = pc.cast(pc.list_value_length(t[p["field"]]), pa.int64())
    return t.append_column(p["dest"], out)


def _proc_uuid(t: pa.Table, p: dict) -> pa.Table:
    keys = [str(v) for v in t[p.get("key", t.column_names[0])].to_pylist()]
    ns = p.get("namespace", "urp")
    ids = []
    for k in keys:
        h = hashlib.md5((ns + ":" + k).encode()).hexdigest()
        ids.append(f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}")
    return t.append_column(p.get("dest", "id"),
                           pa.array(ids, pa.string()))


def _proc_html_strip(t: pa.Table, p: dict) -> pa.Table:
    from ..analysis.htmlstrip import html_to_text

    vals = t[p["field"]].to_pylist()
    out = pa.array([html_to_text(v) if v is not None else None
                    for v in vals], pa.string())
    dest = p.get("dest", p["field"])
    if dest in t.column_names:
        return t.set_column(t.column_names.index(dest), dest, out)
    return t.append_column(dest, out)


def _proc_timestamp(t: pa.Table, p: dict) -> pa.Table:
    import pyarrow as _pa

    ts = _pa.scalar(p["value"], _pa.timestamp("us"))
    return t.append_column(p.get("dest", "timestamp"),
                           _pa.array([ts.as_py()] * t.num_rows,
                                     _pa.timestamp("us")))


def _proc_signature(t: pa.Table, p: dict) -> pa.Table:
    h = poly_hash_strings(t[p["field"]].to_pylist())
    return t.append_column(p.get("dest", "signature"),
                           pa.array(h.view("int64"), pa.int64()))


def _proc_lower(t: pa.Table, p: dict) -> pa.Table:
    out = pc.utf8_lower(t[p["field"]])
    return t.set_column(t.column_names.index(p["field"]), p["field"], out)


def _proc_upper(t: pa.Table, p: dict) -> pa.Table:
    out = pc.utf8_upper(t[p["field"]])
    return t.set_column(t.column_names.index(p["field"]), p["field"], out)


def _proc_langid(t: pa.Table, p: dict) -> pa.Table:
    """Language-ID processor (solr/contrib/langid
    LanguageIdentifierUpdateProcessor.java:63 role): detect the language
    of `field`, write the code to `dest` (langField); detections scoring
    below `threshold` profile hits fall back to `fallback`."""
    from ..textstats.ops import detect_lang

    threshold = int(p.get("threshold", 1))
    fallback = p.get("fallback", "und")
    langs = [detect_lang(s, threshold, fallback)[0]
             for s in t[p["field"]].to_pylist()]
    return t.append_column(p.get("dest", "language"),
                           pa.array(langs, pa.string()))


def _proc_pii_scrub(t: pa.Table, p: dict) -> pa.Table:
    """PII redaction processor: email/phone/IPv4 -> placeholder tokens
    (the ingest-time scrub a web pipeline registers in the chain);
    in-place on `field` unless `dest` is given."""
    from ..textstats.ops import PII_PATTERNS

    cur = pc.coalesce(t[p["field"]], pa.scalar("", t[p["field"]].type))
    for _, pat, repl in PII_PATTERNS:
        cur = pc.replace_substring_regex(cur, pat, repl)
    dest = p.get("dest", p["field"])
    if dest in t.column_names:
        return t.set_column(t.column_names.index(dest), dest, cur)
    return t.append_column(dest, cur)


PROCESSORS = {
    "langid": _proc_langid,
    "pii_scrub": _proc_pii_scrub,
    "clone": _proc_clone,
    "regex_replace": _proc_regex_replace,
    "trim": _proc_trim,
    "truncate": _proc_truncate,
    "field_length": _proc_field_length,
    "default_value": _proc_default_value,
    "remove_blank": _proc_remove_blank,
    "concat": _proc_concat,
    "count_values": _proc_count_values,
    "uuid": _proc_uuid,
    "html_strip": _proc_html_strip,
    "timestamp": _proc_timestamp,
    "signature": _proc_signature,
    "lower": _proc_lower,
    "upper": _proc_upper,
}


def register_processor(name: str, fn) -> None:
    """SPI hook: add a custom processor (factory registration role)."""
    PROCESSORS[name] = fn


def validate_chain(chain: list) -> None:
    for name, params in chain:
        if name not in PROCESSORS:
            raise ValueError(f"unknown update processor: {name!r}")
        if name == "regex_replace":
            re.compile(params["pattern"])  # fail fast, not per batch


def apply_chain(ds, chain: list):
    """Run the processor chain over a Dataset in ONE fused map_batches
    stage (zero-copy Arrow in, each processor vectorized)."""
    validate_chain(chain)

    def run(t: pa.Table) -> pa.Table:
        for name, params in chain:
            t = PROCESSORS[name](t, params)
        return t

    return ds.map_batches(run, batch_format="pyarrow")
