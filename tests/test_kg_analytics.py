"""KG analytics (versa_spark/kg/analytics.py) + events.asof_join:
exact-value assertions on hand-computed graphs, partitioning-invariance
for the deterministic sampler, and plan-shape guards for the scale
claims (no corpus self-join in pair generation; single exchange in the
as-of join)."""

import datetime as dt
import math

import pytest
from pyspark.sql import Row, functions as F

from versa_spark.events import asof_join
from versa_spark.kg import analytics


def _linked(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, entity_iri string")


# ---------------------------------------------------------------------------
# co-occurrence / PMI
# ---------------------------------------------------------------------------

def test_cooccurrence_pmi_exact(spark):
    # 4 turns: {A,B}, {A,B,C}, {A}, {C}  → N=4, n_A=3 n_B=2 n_C=2,
    # n_AB=2, n_AC=1, n_BC=1
    rows = [("c", 0, "A"), ("c", 0, "B"),
            ("c", 1, "A"), ("c", 1, "B"), ("c", 1, "C"),
            ("c", 2, "A"), ("d", 0, "C")]
    out = {(r.a, r.b): r for r in
           analytics.cooccurrence_pmi(_linked(spark, rows)).collect()}
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = out[("A", "B")]
    assert (ab.n_ab, ab.n_a, ab.n_b) == (2, 3, 2)
    assert ab.pmi == round(math.log(2 * 4 / (3 * 2)), 4)
    ac = out[("A", "C")]
    assert (ac.n_ab, ac.n_a, ac.n_b) == (1, 3, 2)
    assert ac.pmi == round(math.log(1 * 4 / (3 * 2)), 4)


def test_cooccurrence_dedups_within_turn(spark):
    # duplicate mention rows in one turn must not inflate counts
    rows = [("c", 0, "A"), ("c", 0, "A"), ("c", 0, "B")]
    out = analytics.cooccurrence_pmi(_linked(spark, rows)).collect()
    assert len(out) == 1 and out[0].n_ab == 1


def test_cooccurrence_plan_has_no_join_before_pairs(spark):
    # the scale claim: pair generation happens inside per-turn arrays —
    # the pair-count plan contains NO join operator at all
    rows = [("c", 0, "A"), ("c", 0, "B")]
    sets = analytics.turn_entity_sets(_linked(spark, rows))
    pair_counts = (analytics._pairs_from_sets(sets)
                   .groupBy("a", "b").count())
    plan = pair_counts._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# pagerank
# ---------------------------------------------------------------------------

def test_pagerank_two_node_cycle(spark):
    # symmetric 2-cycle: uniform distribution is the fixed point — every
    # iteration returns exactly 0.5 per node
    e = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    out = {r.node: r.rank for r in analytics.pagerank(e, iterations=4).collect()}
    assert out == {"a": 0.5, "b": 0.5}


def test_pagerank_chain_hand_computed(spark):
    # directed chain a->b->c, 2 iterations, d=0.85, N=3:
    # r0 = 1/3 each
    # r1(a)=0.05, r1(b)=0.05+0.85/3, r1(c)=0.05+0.85/3
    # r2(a)=0.05, r2(b)=0.05+0.85*r1(a), r2(c)=0.05+0.85*r1(b)
    e = spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
    out = {r.node: r.rank for r in analytics.pagerank(e, iterations=2).collect()}
    r1a = (1 - 0.85) / 3
    r1b = r1a + 0.85 * (1 / 3)
    assert out["a"] == round(r1a, 6)
    assert out["b"] == round(r1a + 0.85 * r1a, 6)
    assert out["c"] == round(r1a + 0.85 * r1b, 6)


def test_pagerank_ranks_sum_bounded(spark):
    # mass never exceeds 1 (dangling mass leaks, never grows)
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")],
        "src string, dst string")
    total = sum(r.rank for r in analytics.pagerank(e, iterations=5).collect())
    assert 0.9 < total <= 1.0 + 1e-9


# ---------------------------------------------------------------------------
# triangles
# ---------------------------------------------------------------------------

def test_triangle_stats_exact(spark):
    # triangle a-b-c plus tail c-d: degrees a2 b2 c3 d1 →
    # wedges = 1+1+3+0 = 5, triangles = 1, clustering = 3/5
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")],
        "src string, dst string")
    r = analytics.triangle_stats(e).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (4, 4, 5, 1)
    assert r.clustering == 0.6


def test_triangle_stats_dedups_and_orients(spark):
    # duplicate + reversed + self-loop edges collapse; K4 has 4 triangles
    edges = [("a", "b"), ("b", "a"), ("a", "b"), ("x", "x")]
    edges += [(u, v) for u in "abcd" for v in "abcd" if u < v]
    e = spark.createDataFrame(edges, "src string, dst string")
    r = analytics.triangle_stats(e).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (4, 6, 4)
    assert r.clustering == 1.0  # K4: 12 wedges, 3*4/12


def test_triangle_stats_no_triangles(spark):
    e = spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
    r = analytics.triangle_stats(e).collect()[0]
    assert r.n_triangles == 0 and r.clustering == 0.0


# ---------------------------------------------------------------------------
# entity timeline
# ---------------------------------------------------------------------------

def test_entity_timeline_exact(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    turns = spark.createDataFrame(
        [("c", 0, t0), ("c", 1, t0 + dt.timedelta(minutes=5)),
         ("d", 0, t0 + dt.timedelta(hours=1))],
        "conv_id string, turn_idx int, ts timestamp")
    linked = _linked(spark, [("c", 0, "A"), ("c", 1, "A"), ("d", 0, "A"),
                             ("c", 1, "B")])
    out = {r.entity_iri: r for r in
           analytics.entity_timeline(linked, turns).collect()}
    a = out["A"]
    assert a.first_seen == t0 and a.last_seen == t0 + dt.timedelta(hours=1)
    assert a.span_s == 3600 and a.n_mentions == 3 and a.n_convs == 2
    b = out["B"]
    assert b.span_s == 0 and b.n_convs == 1


# ---------------------------------------------------------------------------
# negative sampling
# ---------------------------------------------------------------------------

def _triples(spark):
    return spark.createDataFrame(
        [(f"o{i}", "r", f"E{i % 3}") for i in range(20)],
        "origin string, rel string, target string")


def test_negative_samples_shape_and_range(spark):
    ents = spark.createDataFrame([(f"E{i}",) for i in range(5)],
                                 ["entity_iri"])
    out = analytics.negative_samples(_triples(spark), ents, k=3).collect()
    assert len(out) == 60
    vocab = {f"E{i}" for i in range(5)}
    assert all(r.neg_target in vocab for r in out)
    assert {r.neg_ix for r in out} == {0, 1, 2}


def test_negative_samples_partitioning_invariant(spark):
    # the md5 pick is a pure row function: any repartitioning of the
    # positives yields the identical sample
    ents = spark.createDataFrame([(f"E{i}",) for i in range(5)],
                                 ["entity_iri"])
    a = sorted(map(tuple, analytics.negative_samples(
        _triples(spark), ents, k=2).collect()))
    b = sorted(map(tuple, analytics.negative_samples(
        _triples(spark).repartition(7), ents, k=2).collect()))
    assert a == b
    # and a different seed yields a different (but equally sized) sample
    c = sorted(map(tuple, analytics.negative_samples(
        _triples(spark), ents, k=2, seed=99).collect()))
    assert len(c) == len(a) and c != a


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------

def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m, 0)


def test_asof_join_exact(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(5)), (2, "u", _ts(10)), (3, "v", _ts(1)),
         (4, "w", _ts(30))],
        "event_id long, user_id string, ts timestamp")
    right = spark.createDataFrame(
        [(100, "u", _ts(4), 1.0), (101, "u", _ts(10), 2.0),
         (102, "u", _ts(11), 3.0), (103, "v", _ts(2), 4.0)],
        "event_id long, user_id string, ts timestamp, value double")
    out = {r.event_id: (r.event_id_r, r.value_r) for r in
           asof_join(left, right, right_cols=("event_id", "value"),
                     tiebreak="event_id").collect()}
    assert out[1] == (100, 1.0)        # strictly before
    assert out[2] == (101, 2.0)        # tie at equal ts matches (inclusive)
    assert out[3] == (None, None)      # right row is later → no match
    assert out[4] == (None, None)      # user has no right rows at all


def test_asof_join_tiebreak_last_wins(spark):
    left = spark.createDataFrame([(1, "u", _ts(9))],
                                 "event_id long, user_id string, ts timestamp")
    right = spark.createDataFrame(
        [(7, "u", _ts(9), 1.0), (9, "u", _ts(9), 2.0), (8, "u", _ts(9), 3.0)],
        "event_id long, user_id string, ts timestamp, value double")
    r = asof_join(left, right, right_cols=("event_id", "value"),
                  tiebreak="event_id").collect()[0]
    assert (r.event_id_r, r.value_r) == (9, 2.0)


def test_asof_join_matches_naive_emulation(spark):
    # property: the single-shuffle formulation equals the naive
    # (range-join + argmax) emulation on a generated fixture
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    left = (ev.filter(F.col("event_type") == "purchase")
            .select("event_id", "user_id", "ts"))
    right = (ev.filter(F.col("event_type") == "click")
             .select("event_id", "user_id", "ts", "value"))
    got = sorted((r.event_id, r.event_id_r) for r in
                 asof_join(left, right, right_cols=("event_id",),
                           tiebreak="event_id").collect())
    naive = (left.alias("l")
             .join(right.alias("r"),
                   (F.col("l.user_id") == F.col("r.user_id"))
                   & (F.col("l.ts") >= F.col("r.ts")), "left")
             .groupBy("l.event_id")
             .agg(F.max(F.struct(F.col("r.ts"), F.col("r.event_id")))
                  .alias("m"))
             .select("event_id", F.col("m.event_id").alias("rid")))
    want = sorted((r.event_id, r.rid) for r in naive.collect())
    assert got == want


def test_asof_join_single_exchange(spark):
    # the scale claim: ONE shuffle (on the by key) in the whole plan
    left = spark.createDataFrame([(1, "u", _ts(5))],
                                 "event_id long, user_id string, ts timestamp")
    right = spark.createDataFrame(
        [(2, "u", _ts(4), 1.0)],
        "event_id long, user_id string, ts timestamp, value double")
    out = asof_join(left, right, right_cols=("event_id", "value"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# conversation profiles
# ---------------------------------------------------------------------------

def test_conversation_profiles_exact(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    turns = spark.createDataFrame(
        [("c", 0, "user", "hello there", None, t0),
         ("c", 1, "assistant", "hi", None, t0 + dt.timedelta(minutes=2)),
         ("c", 2, "tool", "result", "search", t0 + dt.timedelta(minutes=3)),
         ("d", 0, "user", "x", None, t0)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")
    linked = _linked(spark, [("c", 0, "A"), ("c", 1, "A"), ("c", 1, "B")])
    out = {r.conv_id: r for r in
           analytics.conversation_profiles(turns, linked).collect()}
    c = out["c"]
    assert (c.n_turns, c.n_user_turns, c.n_assistant_turns,
            c.n_tool_turns) == (3, 1, 1, 1)
    assert c.total_chars == len("hello there") + len("hi") + len("result")
    assert c.span_s == 180
    assert c.n_entities == 2
    d = out["d"]
    assert d.n_entities == 0 and d.span_s == 0  # mention-free conv keeps 0


def test_conversation_profiles_without_linked(spark):
    t0 = dt.datetime(2024, 1, 1)
    turns = spark.createDataFrame(
        [("c", 0, "user", "x", None, t0)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")
    out = analytics.conversation_profiles(turns).collect()
    assert len(out) == 1 and "n_entities" not in out[0].asDict()


# ---------------------------------------------------------------------------
# conversation segmentation
# ---------------------------------------------------------------------------

def _seg_turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string")


def test_segment_conversations_exact(spark):
    turns = _seg_turns(spark, [
        ("c", 0, "alpha beta gamma"),
        ("c", 1, "alpha beta delta"),     # jacc 2/4 = 0.5 → same segment
        ("c", 2, "omega psi chi"),        # jacc 0 → boundary
        ("c", 3, "omega psi chi"),        # jacc 1 → same
        ("d", 0, "anything"),
    ])
    out = {(r.conv_id, r.turn_idx): r for r in
           analytics.segment_conversations(turns, threshold=0.5).collect()}
    assert out[("c", 0)].segment_id == 0
    assert out[("c", 0)].prev_jaccard is None
    assert out[("c", 1)].segment_id == 0
    assert out[("c", 1)].prev_jaccard == 0.5
    assert out[("c", 2)].segment_id == 1
    assert out[("c", 2)].prev_jaccard == 0.0
    assert out[("c", 3)].segment_id == 1
    assert out[("c", 3)].prev_jaccard == 1.0
    assert out[("d", 0)].segment_id == 0


def test_segment_conversations_empty_text_is_boundary(spark):
    turns = _seg_turns(spark, [("c", 0, "words here"), ("c", 1, ""),
                               ("c", 2, "words here")])
    out = {r.turn_idx: r.segment_id for r in
           analytics.segment_conversations(turns, threshold=0.2).collect()}
    # empty token set → union 0 → boundary; next turn vs empty → boundary
    assert out == {0: 0, 1: 1, 2: 2}


def test_segment_conversations_single_exchange(spark):
    turns = _seg_turns(spark, [("c", 0, "a b"), ("c", 1, "a c")])
    out = analytics.segment_conversations(turns)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # sessionize discipline: lag + running sum share ONE exchange
    assert plan.count("Exchange hashpartitioning") == 1


# ---------------------------------------------------------------------------
# event analytics: funnel / windowed rollup / percentiles (round 4)
# ---------------------------------------------------------------------------

def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
              "ts timestamp, value double")


def test_funnel_exact(spark):
    from versa_spark.events import funnel
    rows = [
        # u1: full ordered funnel
        (1, 1, "signup", _ts(0), 0.0), (2, 1, "click", _ts(5), 0.0),
        (3, 1, "purchase", _ts(9), 0.0),
        # u2: purchase BEFORE click → drops at stage 2
        (4, 2, "signup", _ts(0), 0.0), (5, 2, "purchase", _ts(2), 0.0),
        (6, 2, "click", _ts(5), 0.0),
        # u3: click only (no signup) → never enters
        (7, 3, "click", _ts(1), 0.0),
        # u4: signup then click, no purchase
        (8, 4, "signup", _ts(1), 0.0), (9, 4, "click", _ts(1), 0.0),
    ]
    out = {r.stage: r.n_users for r in funnel(_ev(spark, rows)).collect()}
    assert out == {"signup": 3, "click": 3, "purchase": 1}
    # u4's click at the SAME ts as signup counts (>= semantics)


def test_windowed_rollup_exact(spark):
    from versa_spark.events import windowed_rollup
    rows = [(1, 1, "click", _ts(5), 1.5), (2, 2, "click", _ts(50), 2.5),
            (3, 1, "click", dt.datetime(2024, 1, 1, 1, 10), 4.0)]
    out = {(r.bucket_us, r.event_type): (r.n_events, r.n_users, r.value_sum)
           for r in windowed_rollup(_ev(spark, rows)).collect()}
    assert len(out) == 2
    (b0, b1) = sorted(k[0] for k in out)
    assert b1 - b0 == 3600 * 1_000_000
    assert out[(b0, "click")] == (2, 2, 4.0)
    assert out[(b1, "click")] == (1, 1, 4.0)


def test_value_percentiles_exact(spark):
    from versa_spark.events import value_percentiles
    rows = [(i, 1, "view", _ts(i), float(i)) for i in range(11)]  # 0..10
    r = value_percentiles(_ev(spark, rows)).collect()[0]
    # type-7 on 0..10: p50 = 5.0, p90 = 9.0, p99 = 9.9
    assert (r.p50, r.p90, r.p99) == (5.0, 9.0, 9.9)


def test_retention_cohorts_exact(spark):
    from versa_spark.events import retention_cohorts
    d0 = dt.datetime(2024, 1, 1)
    day = dt.timedelta(days=1)
    rows = [
        (1, 1, "view", d0, 0.0),              # u1 cohort day0
        (2, 1, "view", d0 + 2 * day, 0.0),    # u1 active day2
        (3, 1, "view", d0 + 2 * day, 0.0),    # dup activity, same bucket
        (4, 2, "view", d0 + 1 * day, 0.0),    # u2 cohort day1
        (5, 2, "view", d0 + 2 * day, 0.0),    # u2 active day2 (offset 1)
    ]
    out = {(r.cohort_us, r.bucket_offset): r.n_users for r in
           retention_cohorts(_ev(spark, rows), bucket_s=86_400).collect()}
    b0 = min(k[0] for k in out)
    b1 = b0 + 86_400 * 1_000_000
    assert out[(b0, 0)] == 1        # u1 cohort size
    assert out[(b0, 2)] == 1        # u1 retained at offset 2 (deduped)
    assert out[(b1, 0)] == 1        # u2 cohort size
    assert out[(b1, 1)] == 1        # u2 retained at offset 1
    assert len(out) == 4


def _no_ckpt(monkeypatch):
    """No-op localCheckpoint so a function's FULL plan stays inspectable
    (funnel/retention/pagerank eagerly checkpoint their results, which
    truncates the plan to a LogicalRDD scan — a lifecycle detail, not
    the plan shape under test)."""
    from pyspark.sql import DataFrame
    monkeypatch.setattr(DataFrame, "localCheckpoint",
                        lambda self, eager=True: self)
    # Spark 4: the concrete class overrides the base's method
    from pyspark.sql.classic.dataframe import DataFrame as CDataFrame
    monkeypatch.setattr(CDataFrame, "localCheckpoint",
                        lambda self, eager=True: self)


_JOIN_LINE = __import__("re").compile(
    r"(?:SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"
    r"|BroadcastNestedLoopJoin|CartesianProduct)[^\n]*")
_GLOBAL_SORT = __import__("re").compile(r"Sort \[[^\]]*\], true,")


def _plan_stats(df):
    """(distinct join lines, has_window, has_global_sort) of the
    executed plan.  Partition-local sorts inside a co-partitioned
    SortMergeJoin print `], false,` and are fine at any scale; the
    scale-killer is a GLOBAL sort (`], true,`) or a Window over the
    full stream."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    joins = sorted({m.strip() for m in _JOIN_LINE.findall(plan)})
    return joins, ("Window" in plan), bool(_GLOBAL_SORT.search(plan))


def test_funnel_plan_shape(spark, monkeypatch):
    """funnel's docstring claim: narrow user-keyed frontier joins only
    — never a per-user window/global sort of the full event stream.
    Every join in the plan must be the frontier shape (equi-join on the
    user key with the `_t >= _prev` strict-order filter); a persisted
    frontier feeding two consumers re-prints with fresh expr ids, so
    the line count is k(k-1)/2, not k-1."""
    from versa_spark.events import funnel
    _no_ckpt(monkeypatch)
    rows = [(1, 1, "signup", _ts(0), 0.0), (2, 1, "click", _ts(5), 0.0),
            (3, 1, "purchase", _ts(9), 0.0)]
    joins, has_window, has_gsort = _plan_stats(funnel(_ev(spark, rows)))
    assert not has_window and not has_gsort
    assert len(joins) == 3      # k=3: 0+1+2 printed frontier joins
    for j in joins:             # all joins are user-key frontier joins
        assert "[_u#" in j and "_prev#" in j, j


def test_retention_plan_shape(spark, monkeypatch):
    """retention_cohorts' docstring claim: ONE user-keyed join (first
    bucket back to activity), no window / global sort over the
    stream."""
    from versa_spark.events import retention_cohorts
    _no_ckpt(monkeypatch)
    d0 = dt.datetime(2024, 1, 1)
    rows = [(1, 1, "view", d0, 0.0), (2, 1, "view", d0, 0.0)]
    out = retention_cohorts(_ev(spark, rows), bucket_s=86_400)
    joins, has_window, has_gsort = _plan_stats(out)
    assert not has_window and not has_gsort
    assert len(joins) == 1
    assert "[_u#" in joins[0]


def test_pagerank_plan_shape_per_iteration(spark, monkeypatch):
    """pagerank's docstring claim: each iteration adds exactly one
    edges⋈ranks join + one node-keyed rebase join — plan growth is a
    CONSTANT number of joins per iteration (a superlinear regression
    here is what makes 30-iteration runs unplannable), with no Window
    or global Sort anywhere."""
    _no_ckpt(monkeypatch)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"])

    def njoins(iters):
        joins, has_window, has_gsort = _plan_stats(
            analytics.pagerank(edges, iterations=iters))
        assert not has_window and not has_gsort
        return len(joins)

    n1, n2, n3 = njoins(1), njoins(2), njoins(3)
    assert n2 - n1 == n3 - n2 <= 3      # constant per-iteration growth


def test_cooccurrence_from_sets_matches_linked_path(spark):
    # the zero-collect_set variant must equal the mention-row path
    rows = [("c", 0, "A"), ("c", 0, "B"), ("c", 1, "A"), ("c", 1, "C"),
            ("d", 0, "B"), ("d", 0, "C"), ("d", 0, "B")]
    linked = _linked(spark, rows)
    via_linked = sorted(map(tuple,
                            analytics.cooccurrence_pmi(linked).collect()))
    sets = spark.createDataFrame(
        [("c", 0, ["A", "B"]), ("c", 1, ["A", "C"]), ("d", 0, ["B", "C"])],
        "conv_id string, turn_idx int, ents array<string>")
    via_sets = sorted(map(tuple,
                          analytics.cooccurrence_pmi_from_sets(sets)
                          .collect()))
    assert via_linked == via_sets


def test_cooccurrence_from_sets_normalizes_input(spark):
    # unsorted arrays and mention-free turns must not corrupt pairs or N
    messy = spark.createDataFrame(
        [("c", 0, ["B", "A"]), ("c", 1, ["A", "B"]), ("c", 2, []),
         ("d", 0, ["C", "A"])],
        "conv_id string, turn_idx int, ents array<string>")
    out = {(r.a, r.b): r for r in
           analytics.cooccurrence_pmi_from_sets(messy).collect()}
    ab = out[("A", "B")]
    # one (A,B) row with count 2 — NOT split across (A,B)/(B,A)
    assert ab.n_ab == 2
    assert ("B", "A") not in out
    # N excludes the empty turn: 3 mention-ful turns, pmi(A,B)=ln(2*3/(3*2))
    assert ab.pmi == 0.0


def test_cooccurrence_edges_weights(spark):
    rows = [("c", 0, "A"), ("c", 0, "B"), ("c", 1, "A"), ("c", 1, "B"),
            ("d", 0, "A"), ("d", 0, "C")]
    out = {(r.src, r.dst): r.weight for r in
           analytics.cooccurrence_edges(_linked(spark, rows)).collect()}
    assert out == {("A", "B"): 2, ("A", "C"): 1}
    plan = (analytics.cooccurrence_edges(_linked(spark, rows))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Join" not in plan   # no PMI marginal joins in the edge path


def test_asof_join_null_right_ts_never_matches(spark):
    left = spark.createDataFrame([(1, "u", _ts(5))],
                                 "event_id long, user_id string, ts timestamp")
    right = spark.createDataFrame(
        [(9, "u", None, 7.0)],
        "event_id long, user_id string, ts timestamp, value double")
    r = asof_join(left, right, right_cols=("event_id", "value")).collect()[0]
    # an unknown-time right row can never be "latest at or before"
    assert (r.event_id_r, r.value_r) == (None, None)


def test_session_stats_type_col_param(spark):
    from versa_spark.events import session_stats
    ev = spark.createDataFrame(
        [(1, "u", dt.datetime(2024, 1, 1), 1.0, "{}", "a"),
         (2, "u", dt.datetime(2024, 1, 1, 0, 1), 1.0, "{}", "b")],
        "event_id long, user_id string, ts timestamp, value double, "
        "props string, etype string")
    out = session_stats(ev, type_col="etype").collect()[0]
    assert out.n_types == 2


def test_cooccurrence_from_sets_dedupes_entries(spark):
    # arbitrary external parquet (the CLI boundary) may carry repeats in
    # `ents`; they must not create self-pairs or double-counts — parity
    # with what collect_set over the same mentions would produce
    dup = spark.createDataFrame(
        [("c", 0, ["A", "A", "B"]), ("c", 1, ["B", "A", "B"])],
        "conv_id string, turn_idx int, ents array<string>")
    out = {(r.a, r.b): r for r in
           analytics.cooccurrence_pmi_from_sets(dup).collect()}
    assert set(out) == {("A", "B")}          # no (A, A) self-pair
    ab = out[("A", "B")]
    assert (ab.n_ab, ab.n_a, ab.n_b) == (2, 2, 2)


def test_shortest_paths_bfs(spark):
    """Landmark BFS distances match a driver-side reference BFS on a
    deterministic random digraph; unreachable nodes are absent; the
    budget guard raises instead of silently truncating."""
    import collections
    import random
    from versa_spark.kg import analytics

    rng = random.Random(11)
    nodes = list(range(40))
    edges = sorted({(rng.choice(nodes), rng.choice(nodes))
                    for _ in range(120)})
    edges = [(a, b) for a, b in edges if a != b]
    e = spark.createDataFrame(edges, ["src", "dst"])
    landmarks = [0, 7]
    got = {(r.node, r.landmark): r.dist
           for r in analytics.shortest_paths(e, landmarks).collect()}

    adj = collections.defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
    want = {}
    for lm in landmarks:
        dist = {lm: 0}
        q = collections.deque([lm])
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        for n, d in dist.items():
            want[(n, lm)] = d
    assert got == want

    # chain graph: exact hop counts, and the budget guard trips when
    # max_iterations is below the eccentricity
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["src", "dst"])
    cg = {(r.node, r.landmark): r.dist
          for r in analytics.shortest_paths(chain, [0]).collect()}
    assert cg == {(i, 0): i for i in range(13)}
    with pytest.raises(RuntimeError, match="still expanding"):
        analytics.shortest_paths(chain, [0], max_iterations=5)
    # eccentricity EXACTLY equal to the budget must succeed (the
    # one-past-the-end emptiness probe, not a spurious raise)
    exact = {(r.node, r.landmark): r.dist
             for r in analytics.shortest_paths(
                 chain, [0], max_iterations=12).collect()}
    assert exact == cg
    with pytest.raises(ValueError, match="at least one landmark"):
        analytics.shortest_paths(chain, [])

    # DataFrame landmark input agrees with the list form
    lm_df = spark.createDataFrame([(0,), (7,)], ["landmark"])
    got2 = {(r.node, r.landmark): r.dist
            for r in analytics.shortest_paths(e, lm_df).collect()}
    assert got2 == want


def test_k_core(spark):
    """k-core peeling matches a reference sequential peeler on random
    graphs; a triangle+pendant fixture gives the exact expected cores."""
    import random
    from versa_spark.kg import analytics

    # triangle 1-2-3 with pendant 4 hanging off 3, isolated edge 5-6
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (5, 6)], ["src", "dst"])
    core2 = {r.node for r in analytics.k_core(e, k=2).collect()}
    assert core2 == {1, 2, 3}
    core1 = {r.node for r in analytics.k_core(e, k=1).collect()}
    assert core1 == {1, 2, 3, 4, 5, 6}
    core3 = {r.node for r in analytics.k_core(e, k=3).collect()}
    assert core3 == set()

    def ref_k_core(pairs, k):
        import collections
        adj = collections.defaultdict(set)
        for a, b in pairs:
            if a != b:
                adj[a].add(b); adj[b].add(a)
        changed = True
        while changed:
            changed = False
            for n in list(adj):
                if len(adj[n]) < k:
                    for m in adj.pop(n):
                        adj[m].discard(n)
                    changed = True
        return {n for n in adj if adj[n]}

    rng = random.Random(5)
    pairs = sorted({(rng.randrange(30), rng.randrange(30))
                    for _ in range(70)})
    df = spark.createDataFrame(pairs, ["src", "dst"])
    for k in (2, 3, 4):
        got = {r.node for r in analytics.k_core(df, k=k).collect()}
        assert got == ref_k_core(pairs, k), k


def test_k_core_exact_budget_boundary(spark):
    """A peel chain needing exactly max_iterations rounds reaches its
    fixpoint without a spurious budget error."""
    from versa_spark.kg import analytics
    # path 1-2-3-4-5-6 with k=2 peels endpoints each round: 3 rounds
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], ["src", "dst"])
    got = analytics.k_core(path, k=2, max_iterations=3)
    assert got.count() == 0
    with pytest.raises(RuntimeError, match="still peeling"):
        analytics.k_core(path, k=2, max_iterations=2)
