"""Parser round-trip property for streaming expressions: for randomly
generated expression trees, parse(repr(tree)) must reproduce the tree
(name, positional args, named args — values compared as parsed strings).
Pins the tokenizer's bare/quoted/nesting rules against the printer."""

from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_ray.relational.streams import SExpr, parse_expression

name_st = st.from_regex(r"[a-zA-Z][a-zA-Z0-9_]{0,8}", fullmatch=True)
# bare values must avoid the parser's structural chars and whitespace edges
bare_st = st.from_regex(r"[a-zA-Z0-9_.:*\-]{1,10}", fullmatch=True)


def exprs(depth: int):
    if depth <= 0:
        leaf = st.builds(lambda n: SExpr(n), name_st)
        return leaf
    sub = exprs(depth - 1)
    arg = st.one_of(bare_st, sub)
    return st.builds(
        lambda n, args, named: SExpr(n, list(args), dict(named)),
        name_st,
        st.lists(arg, max_size=3),
        st.dictionaries(name_st, arg, max_size=3),
    )


def _norm(e):
    if not isinstance(e, SExpr):
        return str(e)
    return (e.name,
            tuple(_norm(a) for a in e.args),
            tuple(sorted((k, _norm(v)) for k, v in e.named.items())))


@settings(max_examples=120, deadline=None)
@given(exprs(2))
def test_parse_repr_roundtrip(tree):
    back = parse_expression(repr(tree))
    assert _norm(back) == _norm(tree)


@settings(max_examples=80, deadline=None)
@given(st.text(max_size=30))
def test_parser_never_crashes_unhandled(src):
    # arbitrary input either parses to an SExpr or raises ValueError —
    # never an unhandled exception type (the /stream handler's contract)
    try:
        out = parse_expression(src)
    except ValueError:
        return
    assert isinstance(out, SExpr)
