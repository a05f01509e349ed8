"""Mini query language tests — mirrors the reference's tested behavior
(/root/reference/test/py/test_miniquery.py:11-28) on the same fixture."""

import pytest

from versa_spark.model import from_quads
from versa_spark.iriref import I
from versa_spark.query import execute, parse

DC = "http://purl.org/dc/elements/1.1/"
H5 = "http://www.w3.org/TR/html5/"
H5L = "http://www.w3.org/TR/html5/link-type/"

QUERY_RELS = [
    ("http://uche.ogbuji.net/ndewo/", H5 + "title", "Ndewo, Colorado",
     {"@lang": "en"}),
    ("http://uche.ogbuji.net/ndewo/", H5L + "author",
     I("http://uche.ogbuji.net/"), {"link/description": "Uche Ogbuji"}),
    ("http://uche.ogbuji.net/ndewo/", H5L + "see-also",
     I("https://www.goodreads.com/book/show/18714145-ndewo-colorado"),
     {"@label": "Goodreads"}),
    ("http://uche.ogbuji.net/", H5L + "see-also",
     I("http://uche.ogbuji.net/ndewo/"), {}),
]

VARIABLES = {"DC": DC, "H5": H5, "H5L": H5L}


@pytest.fixture(scope="module")
def model(spark):
    return from_quads(spark, QUERY_RELS).cache()


def test_single_clause(model):
    assert execute(model, "?($a, H5 'title', *)", VARIABLES) == {
        "a": {"http://uche.ogbuji.net/ndewo/"}}


def test_single_clause_two_results(model):
    assert execute(model, "?($a, H5L 'see-also', *)", VARIABLES) == {
        "a": {"http://uche.ogbuji.net/", "http://uche.ogbuji.net/ndewo/"}}


def test_and_threads_bindings(model):
    # the reference's flagship conjunction (test_miniquery.py:17-19)
    result = execute(model,
                     "?($a, H5 'title', *) and ?($b, H5L 'see-also', $a)",
                     VARIABLES)
    assert result == {"a": {"http://uche.ogbuji.net/ndewo/"},
                      "b": {"http://uche.ogbuji.net/"}}


def test_or_unions(model):
    result = execute(
        model, "?($a, H5 'title', *) or ?($a, H5L 'see-also', *)",
        VARIABLES)
    assert result == {"a": {"http://uche.ogbuji.net/ndewo/",
                            "http://uche.ogbuji.net/"}}


def test_and_intersects_shared_var(model):
    result = execute(
        model, "?($a, H5L 'see-also', *) and ?($a, H5 'title', *)",
        VARIABLES)
    # see-also origins ∩ title origins = {ndewo}
    assert result == {"a": {"http://uche.ogbuji.net/ndewo/"}}


def test_target_variable_and_literal(model):
    result = execute(model, "?(*, H5 'title', $t)", VARIABLES)
    assert result == {"t": {"Ndewo, Colorado"}}


def test_parse_errors():
    for bad in ["?($a", "?($a, x)", "banana", "?($a, H5 'title', *) xor"]:
        with pytest.raises(ValueError):
            parse(bad)


def test_and_not_subtracts(model):
    # negation (reference miniast.py:87-92): see-also origins that do NOT
    # also carry a title link → NOT IN semantics per shared variable
    result = execute(
        model, "?($a, H5L 'see-also', *) and not ?($a, H5 'title', *)",
        VARIABLES)
    assert result == {"a": {"http://uche.ogbuji.net/"}}


def test_and_not_no_match_is_noop(model):
    result = execute(
        model,
        "?($a, H5 'title', *) and not ?($a, H5L 'author', 'nonexistent')",
        VARIABLES)
    assert result == {"a": {"http://uche.ogbuji.net/ndewo/"}}


def test_negation_parse_errors():
    for bad in ["not ?($a, H5 'title', *)",
                "?($a, H5 'title', *) or not ?($a, H5L 'see-also', *)"]:
        with pytest.raises(ValueError):
            parse(bad)


def test_and_binds_tighter_than_or(model):
    """Reference precedence (miniparser.py:79-82): OR lower than AND, so
    'c1 or c2 and c3' is c1 OR (c2 AND c3)."""
    # c2 AND c3 share $x and intersect to see-also origins that also
    # have a title → only ndewo/; c1 unions in the title origin (same)
    q = ("?($x, H5L 'author', *) or "
         "?($x, H5L 'see-also', *) and ?($x, H5 'title', *)")
    got = execute(model, q, VARIABLES)
    # and-group: see-also origins ∩ title origins = {ndewo/}
    # or with author origins {ndewo/} → {ndewo/}
    assert got == {"x": {"http://uche.ogbuji.net/ndewo/"}}
    # left-assoc equal precedence would compute (c1 OR c2) AND c3 with
    # identical inputs here, so also pin the parse SHAPE:
    from versa_spark.query import BoolOp, parse
    ast = parse(q)
    assert isinstance(ast, BoolOp) and ast.op == "or"
    assert isinstance(ast.right, BoolOp) and ast.right.op == "and"


def test_four_arg_clause_rejected(model):
    with pytest.raises(ValueError, match="attr-constrained"):
        parse("?($a, H5 'title', *, extra)")


def test_repeated_var_unions_positions(model):
    """Reference miniast.py:107-113: a var in two positions collects
    values from BOTH (setdefault().add() union, no row constraint)."""
    got = execute(model, "?($x, H5L 'see-also', $x)", VARIABLES)
    assert got == {"x": {
        "http://uche.ogbuji.net/", "http://uche.ogbuji.net/ndewo/",
        "https://www.goodreads.com/book/show/18714145-ndewo-colorado"}}
