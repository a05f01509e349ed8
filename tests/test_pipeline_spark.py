"""Spark fan-out of the pipeline engine (applyInPandas per subgraph).

Runs the same rules as the LocalModel parity tests across many groups and
checks (a) group isolation, (b) global dedup of cross-group identical
entities, (c) agreement with the single-group LocalModel result.
"""

import pytest

from versa_spark import I, VTYPE_REL
from versa_spark.local import LocalModel, all_origins, model_to_rows
from versa_spark.model import LINK_SCHEMA, size
from versa_spark.pipeline import (
    follow, generic_pipeline, link, materialize, target, var,
)
from versa_spark.pipeline.spark_run import run_pipeline_grouped

SCH = I("https://schema.org/")
BF = I("http://bibfra.me/")


def book_quads(doc, isbn, name, author, bdate):
    B = I(f"http://example.org/classics/{doc}")
    return [
        (B, VTYPE_REL, SCH("Book")),
        (B, SCH("name"), name),
        (B, SCH("author"), author),
        (B, SCH("authorBirthDate"), bdate),
        (B, SCH("isbn"), isbn),
        (B, SCH("inLanguage"), "en"),
    ]


def make_pipeline():
    FINGERPRINT_RULES = {
        SCH("Book"): materialize(
            BF("Instance"),
            fprint=[(BF("isbn"), follow(SCH("isbn")))]),
    }
    TRANSFORM_RULES = {
        SCH("name"): link(rel=BF("name")),
        SCH("author"): materialize(
            BF("Person"), BF("creator"),
            vars={"birthDate": follow(SCH("authorBirthDate"),
                                      origin=var("input-resource"))},
            fprint=[(BF("name"), target()),
                    (BF("birthDate"), var("birthDate"))],
            links=[(BF("name"), target()),
                   (BF("birthDate"), var("birthDate"))]),
    }
    LABELIZE_RULES = {
        BF("Instance"): follow(BF("name")),
        BF("Person"): follow(BF("name")),
    }
    return generic_pipeline(FINGERPRINT_RULES, TRANSFORM_RULES,
                            LABELIZE_RULES)


BOOKS = [
    ("catcher", "0316769487", "The Catcher in the Rye", "J. D. Salinger",
     "1919-01-01"),
    ("gatsby", "9780743273565", "The Great Gatsby", "F. Scott Fitzgerald",
     "1896-09-24"),
    # Third doc repeats catcher's author+isbn → identical entity IDs
    ("catcher-dup", "0316769487", "The Catcher in the Rye",
     "J. D. Salinger", "1919-01-01"),
]


@pytest.fixture(scope="module")
def grouped_links(spark):
    rows = []
    for doc, isbn, name, author, bdate in BOOKS:
        m = LocalModel(book_quads(doc, isbn, name, author, bdate))
        for (o, r, t, ti, a, ix) in model_to_rows(m):
            rows.append((doc, o, r, t, ti, a, ix))
    from versa_spark.pipeline.spark_run import GROUPED_LINK_SCHEMA
    return spark.createDataFrame(rows, GROUPED_LINK_SCHEMA)


def test_grouped_run_matches_local(spark, grouped_links):
    out = run_pipeline_grouped(grouped_links, make_pipeline).cache()
    rows = out.collect()
    per_group = {}
    for r in rows:
        per_group.setdefault(r["group_key"], []).append(r)
    assert set(per_group) == {"catcher", "gatsby", "catcher-dup"}

    # Each group's output equals the LocalModel run on that group alone
    for doc, isbn, name, author, bdate in BOOKS:
        local_out = make_pipeline().run(
            input_model=LocalModel(book_quads(doc, isbn, name, author,
                                              bdate)))
        assert len(per_group[doc]) == len(local_out) == 8
        local_quads = {(o, r, t) for (o, r, t, _a) in local_out}
        spark_quads = {(r["origin"], r["rel"], r["target"])
                       for r in per_group[doc]}
        assert spark_quads == local_quads

    # catcher and catcher-dup produce IDENTICAL quads (deterministic IDs)
    c = {(r["origin"], r["rel"], r["target"]) for r in per_group["catcher"]}
    d = {(r["origin"], r["rel"], r["target"])
         for r in per_group["catcher-dup"]}
    assert c == d


def test_union_model_dedups_cross_group(spark, grouped_links):
    out = run_pipeline_grouped(grouped_links, make_pipeline,
                               keep_group_col=False)
    # 3 docs → 2 distinct books' outputs (8 links each) after global dedup
    assert size(out) == 16
    persons = all_origins_df = (
        out.filter((out.rel == str(VTYPE_REL)) &
                   (out.target == str(BF("Person")))))
    assert persons.count() == 2
