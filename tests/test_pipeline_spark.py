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


def test_dummy_context_never_accumulates_state():
    """Invariant behind worker-reuse safety: the module-global
    DUMMY_CONTEXT's mutable containers stay EMPTY across pipeline runs —
    context.__init__ re-freshens falsy containers at every derivation,
    so per-run state (entity ledger, hooks, variables) can never attach
    to the shared global (round-4 review finding, refuted and pinned)."""
    from versa_spark.iriref import I
    from versa_spark.local import LocalModel
    from versa_spark.pipeline import (follow, generic_pipeline, link,
                                      materialize)
    from versa_spark.pipeline.core import DUMMY_CONTEXT

    TYPE = I("http://bibfra.me/purl/versa/type")
    B = lambda s: I("http://example.org/vocab/" + s)  # noqa: E731
    S = lambda s: I("https://schema.org/" + s)        # noqa: E731
    quads = [
        (I("http://example.org/p/1"), TYPE, B("Book"), {}),
        (I("http://example.org/p/1"), B("title"), "T", {}),
        (I("http://example.org/p/1"), B("identifier"), "9", {}),
    ]

    def make():
        return generic_pipeline(
            {B("Book"): materialize(
                S("Book"),
                vars={"src": "fixed"},
                fprint=[(S("isbn"), follow(B("identifier")))])},
            {B("title"): link(rel=S("name"))},
            {S("Book"): follow(S("name"))})

    out1 = sorted(make().run(input_model=LocalModel(list(quads))))
    assert len(DUMMY_CONTEXT.existing_ids) == 0
    assert DUMMY_CONTEXT.variables == {} and DUMMY_CONTEXT.extras == {}
    # a second run over the SAME entity (the reused-worker case) emits
    # the identical links — nothing was suppressed by a shared ledger
    out2 = sorted(make().run(input_model=LocalModel(list(quads))))
    assert out1 == out2 and len(out1) > 0


def test_foreach_action_evaluating_none_falls_back_to_context():
    """Reference other_actions.py:265-274: the None check applies to the
    EVALUATED value — var() on an unset variable behaves like an
    omitted argument."""
    from versa_spark.iriref import I
    from versa_spark.local import LocalModel
    from versa_spark.pipeline import foreach, link, var
    from versa_spark.pipeline.core import context

    ctx = context(
        (I("http://x/o"), I("http://x/r"), "t", {}),
        LocalModel(), output_model=LocalModel())
    foreach(origin=var("unset"),
            action=link(rel=I("http://x/r2")))(ctx)
    out = list(ctx.output_model)
    assert out == [(I("http://x/o"), I("http://x/r2"), "t", {})]


def test_replace_from_list_order_is_first_occurrence():
    import re
    from versa_spark.local import LocalModel
    from versa_spark.pipeline import replace_from
    from versa_spark.pipeline.core import context

    act = replace_from([(re.compile(r"x(\d)"), r"y\1")],
                       ["x1", "x2", "x1", "plain"])
    ctx = context((None, None, None, {}), LocalModel())
    assert act(ctx) == ["y1", "y2", "plain"]   # deduped, stable order
