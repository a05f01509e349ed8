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
