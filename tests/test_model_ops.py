"""Model + match-family tests mirroring the reference driver test suite
(/root/reference/test/py/test_memory.py) assertion style: exact tuple
equality and exact counts."""

import io

import pytest
from pyspark.sql import functions as F

from versa_spark import I, VTYPE_REL
from versa_spark.model import (
    canonical_quads, dedup_links, from_quads, jsondump, jsonload, size,
    union_models, models_equal,
)
from versa_spark import ops

DC = "http://purl.org/dc/elements/1.1/"


def test_match_attrs_exact(spark, rels1):
    # mirrors test_memory.py:33-41
    m = from_quads(spark, rels1)
    got = ops.match(m, origin="http://uche.ogbuji.net",
                    attrs={"@lang": "ig"}).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.origin, r.rel, r.target) == (
        "http://uche.ogbuji.net", DC + "title", "Ulo Uche")
    assert sorted((e.k, e.v) for e in r.attrs) == [
        ("@context", "http://uche.ogbuji.net#_metadata"), ("@lang", "ig")]


def test_match_wildcards_and_empty_string(spark, rels1):
    m = from_quads(spark, rels1)
    assert ops.match(m).count() == 5
    # '' is a wildcard, like the reference's truthiness test (memory.py:98)
    assert ops.match(m, origin="").count() == 5
    assert ops.match(m, origin="http://copia.ogbuji.net").count() == 2
    assert ops.match(m, rel=DC + "title").count() == 3
    assert ops.match(m, rel=DC + "title",
                     target="Copia").count() == 1


def test_multimatch_sets(spark, rels1):
    # reference driver/memory.py:119-150 — OR within a component
    m = from_quads(spark, rels1)
    assert ops.multimatch(m, rel={DC + "title", DC + "creator"}).count() == 5
    assert ops.multimatch(
        m, origin={"http://copia.ogbuji.net"},
        rel={DC + "title"}).count() == 1


def test_dedup_refuses_exact_duplicates(spark):
    # reference add() refuses dupes (memory.py:179-181); attr-differing
    # quads are distinct
    quads = [
        ("http://a", "http://p", "v", {}),
        ("http://a", "http://p", "v", {}),
        ("http://a", "http://p", "v", {"@lang": "en"}),
    ]
    m = dedup_links(from_quads(spark, quads))
    assert size(m) == 2


def test_union_models_update_semantics(spark, rels1):
    # reference update() (memory.py:221-229)
    m1 = from_quads(spark, rels1[:3])
    m2 = from_quads(spark, rels1[2:])
    u = union_models(m1, m2)
    assert size(u) == 5
    assert models_equal(u, from_quads(spark, rels1))


def test_all_origins_and_types(spark):
    T = "http://bibfra.me/purl/versa/type"
    quads = [
        (I("http://r1"), I(T), I("http://T1")),
        (I("http://r1"), I("http://p"), "x"),
        (I("http://r2"), I(T), I("http://T2")),
        (I("http://r3"), I("http://p"), "y"),
    ]
    m = from_quads(spark, quads)
    assert {r.origin for r in ops.all_origins(m).collect()} == {
        "http://r1", "http://r2", "http://r3"}
    assert {r.origin for r in ops.all_origins(
        m, only_types={"http://T1"}).collect()} == {"http://r1"}
    assert {r.origin for r in ops.all_origins(m, of_types="*").collect()} == {
        "http://r1", "http://r2"}
    assert {r.typ for r in ops.resourcetypes(m, "http://r1").collect()} == {
        "http://T1"}


def test_lookups_first_in_statement_order(spark, rels1):
    m = from_quads(spark, rels1)
    # simple_lookup = first target in statement order (util.py:25-27)
    assert ops.simple_lookup(
        m, "http://uche.ogbuji.net", DC + "title") == "Uche's home"
    assert ops.simple_lookup_byvalue(
        m, DC + "creator", "Uche Ogbuji") == "http://copia.ogbuji.net"
    ts = {r.target for r in ops.lookup(
        m, "http://uche.ogbuji.net", DC + "title").collect()}
    assert ts == {"Uche's home", "Ulo Uche"}


def test_follow_hops(spark):
    quads = [
        (I("http://a"), I("http://knows"), I("http://b")),
        (I("http://b"), I("http://name"), "Bee"),
        (I("http://a"), I("http://knows"), I("http://c")),
        (I("http://c"), I("http://name"), "Sea"),
    ]
    m = from_quads(spark, quads)
    start = spark.createDataFrame([("http://a",)], "node string")
    out = ops.follow_hops(m, start, ["http://knows", "http://name"])
    assert {r.target for r in out.collect()} == {"Bee", "Sea"}


def test_zoom_in(spark):
    quads = [
        (I("http://a"), I("http://p"), I("http://b")),
        (I("http://b"), I("http://p"), I("http://c")),
        (I("http://c"), I("http://p"), I("http://d")),
        (I("http://b"), I("http://q"), "literal with spaces"),
        (I("http://x"), I("http://p"), I("http://y")),
    ]
    m = from_quads(spark, quads)
    z0 = ops.zoom_in(m, "http://a", depth=0)
    assert size(z0) == 1
    z1 = ops.zoom_in(m, "http://a", depth=1)
    # a->b plus b's two links
    assert size(z1) == 3
    z2 = ops.zoom_in(m, "http://a", depth=2)
    assert size(z2) == 4


def test_transitive_closure(spark):
    quads = [
        (I("http://a"), I("http://p"), I("http://b")),
        (I("http://b"), I("http://p"), I("http://c")),
        (I("http://c"), I("http://p"), I("http://a")),  # cycle
    ]
    m = from_quads(spark, quads)
    out = {r.target for r in ops.transitive_closure(m, "http://a", "http://p").collect()}
    assert out == {"http://a", "http://b", "http://c"}


def test_replace_entity_resource(spark):
    quads = [
        (I("http://old"), I("http://p"), "v"),
        (I("http://z"), I("http://p"), I("http://old")),
        (I("http://z"), I("http://q"), "w", {"ref": "http://old"}),
    ]
    m = from_quads(spark, quads)
    out = ops.replace_entity_resource(m, "http://old", "http://new")
    cq = canonical_quads(out)
    assert ("http://new", "http://p", "v", ()) in cq
    assert ("http://z", "http://p", "http://new",
            (("@target-type", "@iri-ref"),)) in cq
    assert ("http://z", "http://q", "w", (("ref", "http://new"),)) in cq


def test_static_index_and_origin_view(spark, rels1):
    m = from_quads(spark, rels1)
    idx = {r.origin: [v.target for v in r.vals]
           for r in ops.static_index(m, DC + "title").collect()}
    assert idx["http://uche.ogbuji.net"] == ["Uche's home", "Ulo Uche"]
    ov = {r.origin: len(r.links) for r in ops.origin_view(m).collect()}
    assert ov == {"http://copia.ogbuji.net": 2, "http://uche.ogbuji.net": 3}


def test_json_roundtrip(spark, rels1):
    m = from_quads(spark, rels1 + [
        (I("http://x"), I("http://p"), I("http://iri-target"))])
    buf = io.StringIO()
    jsondump(m, buf)
    buf.seek(0)
    m2 = jsonload(spark, buf)
    assert models_equal(m.select(*[c for c in m.columns]), m2) or \
        canonical_quads(m) == canonical_quads(m2)


def test_remaining_util_ops(spark, rels1):
    """column / labels / lookup_byvalue / replace_values /
    duplicate_statements / remove_links / uniquify (reference
    util.py:78-223 family)."""
    from pyspark.sql import functions as F
    from versa_spark import VLABEL_REL
    from versa_spark.model import from_quads, size
    df = from_quads(spark, rels1)

    # column: distinct values of one position (util.py:78-88)
    rels = {r.rel for r in ops.column(df, "rel").collect()}
    assert rels == {"http://purl.org/dc/elements/1.1/creator",
                    "http://purl.org/dc/elements/1.1/title"}

    # labels (util.py:99-104): relabel title links
    labeled = df.withColumn(
        "rel", F.when(F.col("rel").endswith("title"),
                      F.lit(str(VLABEL_REL))).otherwise(F.col("rel")))
    labs = {(r.origin, r.label) for r in ops.labels(labeled).collect()}
    assert ("http://copia.ogbuji.net", "Copia") in labs and len(labs) == 3

    # lookup_byvalue (util.py:40-42)
    origins = {r.origin for r in ops.lookup_byvalue(
        df, "http://purl.org/dc/elements/1.1/creator",
        "Uche Ogbuji").collect()}
    assert origins == {"http://copia.ogbuji.net", "http://uche.ogbuji.net"}

    # replace_values: bulk origin remap (util.py:162-172)
    mapped = ops.replace_values(
        df, {"http://copia.ogbuji.net": "http://copia.example/new"})
    assert mapped.filter(
        F.col("origin") == "http://copia.example/new").count() == 2
    assert mapped.count() == size(df)

    # duplicate_statements (util.py:194-206)
    dup = ops.duplicate_statements(df, "http://copia.ogbuji.net",
                                   "http://copia.example/copy")
    assert size(dup) == size(df) + 2

    # remove_links + uniquify
    removed = ops.remove_links(
        df, F.col("origin") == "http://copia.ogbuji.net")
    assert size(removed) == size(df) - 2
    doubled = df.unionByName(df)
    assert size(ops.uniquify(doubled)) == size(df)


# ---------------------------------------------------------------------------
# round-4 core review fixes
# ---------------------------------------------------------------------------

def test_remove_links_keeps_null_predicate_rows(spark):
    from pyspark.sql import functions as F
    from versa_spark.model import from_quads
    df = from_quads(spark, [
        (I("http://x/a"), I("http://x/r"), "keep", {}),
        (I("http://x/b"), I("http://x/r"), None, {}),      # null target
        (I("http://x/c"), I("http://x/r"), "gone", {}),
    ])
    out = ops.remove_links(df, F.col("target") == "gone")
    kept = {r.origin for r in out.collect()}
    # the null-target row's predicate is NULL, not a match — it stays
    assert kept == {"http://x/a", "http://x/b"}


def test_replace_entity_resource_dedups_merged_links(spark):
    from versa_spark.model import from_quads
    df = from_quads(spark, [
        (I("http://x/old"), I("http://x/r"), "t", {}),
        (I("http://x/new"), I("http://x/r"), "t", {}),
    ])
    out = ops.replace_entity_resource(df, "http://x/old", "http://x/new")
    # the rewrite collapses both into one quad (reference add refuses
    # exact duplicates, memory.py:179-181)
    assert out.count() == 1


def test_replace_values_dedups_collisions(spark):
    from versa_spark.model import from_quads
    df = from_quads(spark, [
        (I("http://x/o1"), I("http://x/r"), "t", {}),
        (I("http://x/o2"), I("http://x/r"), "t", {}),
    ])
    out = ops.replace_values(df, {"http://x/o1": "http://x/m",
                                  "http://x/o2": "http://x/m"})
    assert out.count() == 1


def test_zoom_in_does_not_traverse_illegal_uri_chars(spark):
    # target 'a<b' is a single token but NOT a legal URI reference —
    # the reference's matches_uri_ref_syntax check refuses to traverse
    # it.  I() validation forbids such origins in models built via
    # from_quads, so build the frame raw (the external-parquet case
    # where unvalidated strings can appear).
    from versa_spark.model import LINK_SCHEMA
    rows = [("http://x/f", "http://x/r", "a<b", False, [], None),
            ("a<b", "http://x/r", "leaked", False, [], None),
            ("http://x/f", "http://x/r2", "http://x/g", True, [], None),
            ("http://x/g", "http://x/r", "ok", False, [], None)]
    df = spark.createDataFrame(rows, LINK_SCHEMA)
    out = ops.zoom_in(df, "http://x/f", depth=1)
    targets = {r.target for r in out.collect()}
    assert "leaked" not in targets and "ok" in targets


def test_follow_hops_empty_rels_raises(spark):
    from versa_spark.model import from_quads
    df = from_quads(spark, [(I("http://x/a"), I("http://x/r"), "t", {})])
    start = spark.createDataFrame([("http://x/a",)], ["node"])
    with pytest.raises(ValueError, match="at least one rel"):
        ops.follow_hops(df, start, [])


def test_attrs_map_duplicate_keys_last_wins(spark):
    """map_from_entries throws on duplicate keys under the default
    mapKeyDedupPolicy; attrs_map dedups in-plan, last wins."""
    from versa_spark.model import attrs_map
    df = spark.createDataFrame(
        [([{"k": "a", "v": "1"}, {"k": "a", "v": "2"},
           {"k": "b", "v": "3"}],)],
        "attrs array<struct<k:string,v:string>>")
    assert df.select(attrs_map("attrs").alias("m")).collect()[0].m == {
        "a": "2", "b": "3"}
