"""Deduplication at corpus scale: exact, n-gram Jaccard, MinHash+LSH,
SimHash, embedding-cosine.

Plan shapes (the part that must survive 100×):
* exact: md5-normalized hash groupBy — one shuffle, map-side partial agg;
* n-gram Jaccard: shingle → explode → self-join on shingle → pair groupBy.
  The shingle join is the classic quadratic trap; the LSH variants below
  exist precisely to avoid it at scale — keep exact Jaccard for
  verification of candidates, not discovery;
* MinHash+LSH: signatures via xxhash64(shingle, seed) min-aggregated
  JVM-side (no UDF), banded; candidates only join within buckets;
* SimHash: token hashes → bit-vote aggregate → 64-bit signature; candidate
  pairs by band equality;
* embedding cosine: exact pairwise above threshold for verification;
  scale path is LSH over random hyperplanes (simsearch module).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def normalized_text(text_col="text"):
    return F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")


def exact_duplicates(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Groups of ids sharing identical normalized text (md5 groupBy).
    Returns (fp_md5, n_docs, doc_ids sorted) for groups with n_docs > 1."""
    fp = df.select(F.col(id_col).alias("doc_id"),
                   F.md5(normalized_text(text_col)).alias("fp_md5"))
    return (fp.groupBy("fp_md5")
            .agg(F.count("*").alias("n_docs"),
                 F.sort_array(F.collect_list("doc_id")).alias("doc_ids"))
            .filter(F.col("n_docs") > 1))


def shingles(df: DataFrame, id_col: str = "doc_id",
             text_col: str = "text", k: int = 3) -> DataFrame:
    """Distinct word k-shingles per doc: (doc_id, shingle)."""
    words = F.split(normalized_text(text_col), " ")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(idx, lambda i: F.concat_ws(
        " ", F.slice(words, i + 1, k)))
    return (df.select(F.col(id_col).alias("doc_id"),
                      F.explode(F.array_distinct(
                          F.when(n >= k, sh).otherwise(
                              F.array(F.concat_ws(" ", words)))))
                      .alias("shingle")))


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 3,
                        threshold: float = 0.8) -> DataFrame:
    """Exact Jaccard over word k-shingles for all co-shingling pairs.
    (a, b, jaccard) with a < b and jaccard ≥ threshold.  Quadratic in
    shingle-sharing docs — the verification kernel, not the discovery
    path (use minhash_lsh_candidates for discovery at scale)."""
    sh = shingles(df, id_col, text_col, k)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("a"), "shingle")
    b = sh.select(F.col("doc_id").alias("b"), "shingle")
    inter = (a.join(b, "shingle")
             .filter(F.col("a") < F.col("b"))
             .groupBy("a", "b").agg(F.count("*").alias("n_inter")))
    sa = sizes.select(F.col("doc_id").alias("a"),
                      F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("b"),
                      F.col("n_sh").alias("n_b"))
    return (inter.join(sa, "a").join(sb, "b")
            .withColumn("jaccard",
                        F.col("n_inter")
                        / (F.col("n_a") + F.col("n_b") - F.col("n_inter")))
            .filter(F.col("jaccard") >= threshold)
            .select("a", "b", F.round("jaccard", 6).alias("jaccard")))


def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", k: int = 3,
                       num_hashes: int = 64) -> DataFrame:
    """(doc_id, sig array<long>): sig[i] = min over shingles of
    xxhash64(shingle, seed=i).  Pure JVM aggregation — num_hashes
    min() aggregates after one explode; no Python."""
    sh = shingles(df, id_col, text_col, k)
    aggs = [F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
            for i in range(num_hashes)]
    sig = sh.groupBy("doc_id").agg(*aggs)
    return sig.select("doc_id", F.array(
        *[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"))


def minhash_lsh_candidates(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", k: int = 3,
                           num_hashes: int = 64, bands: int = 16,
                           verify_threshold: float | None = 0.8
                           ) -> DataFrame:
    """Banded-LSH candidate pairs, optionally verified with exact Jaccard.

    bands × rows-per-band = num_hashes; docs agreeing on any full band
    bucket together; the pair join happens only within buckets (bucket id
    = hash of the band slice) — never all-pairs."""
    rows_per = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, k, num_hashes)
    banded = sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.xxhash64(F.concat_ws(
                         ",", *[F.col("sig")[b * rows_per + r].cast("string")
                                for r in range(rows_per)])).alias("bucket"))
            for b in range(bands)])).alias("bb")
    ).select("doc_id", "bb.band", "bb.bucket")
    left = banded.select(F.col("doc_id").alias("a"), "band", "bucket")
    right = banded.select(F.col("doc_id").alias("b"), "band", "bucket")
    cands = (left.join(right, ["band", "bucket"])
             .filter(F.col("a") < F.col("b"))
             .select("a", "b").distinct())
    if verify_threshold is None:
        return cands
    verified = ngram_jaccard_pairs(df, id_col, text_col, k,
                                   threshold=verify_threshold)
    return cands.join(verified, ["a", "b"], "inner")


def simhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """64-bit SimHash per doc: per-token xxhash64 → per-bit weighted vote →
    sign.  All JVM: explode tokens, then 64 sum() aggregates over bit
    tests."""
    words = F.split(normalized_text(text_col), " ")
    tok = (df.select(F.col(id_col).alias("doc_id"),
                     F.explode(words).alias("w"))
           .withColumn("h", F.xxhash64("w")))
    votes = [F.sum(F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1))
                          == 1, 1).otherwise(-1)).alias(f"b{i}")
             for i in range(64)]
    agg = tok.groupBy("doc_id").agg(*votes)
    sig = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0,
                     F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(1 << i).cast("long") if i < 63 else \
            F.when(F.col(f"b{i}") > 0,
                   F.lit(-(1 << 63)).cast("long")).otherwise(
                       F.lit(0).cast("long"))
        sig = term if sig is None else (sig + term)
    return agg.select("doc_id", sig.alias("simhash"))


def simhash_near_dups(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: candidates bucket on 16-bit bands (any
    identical band → candidate; Hamming ≤ 3 over 4 bands guarantees one
    matching band by pigeonhole), then exact Hamming filter."""
    sig = simhash_signatures(df, id_col, text_col)
    banded = sig.select("doc_id", "simhash", F.explode(F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.shiftrightunsigned(F.col("simhash"), b * 16)
                 .bitwiseAND(F.lit(0xFFFF)).alias("bucket"))
        for b in range(4)])).alias("bb")).select(
            "doc_id", "simhash", "bb.band", "bb.bucket")
    left = banded.select(F.col("doc_id").alias("a"),
                         F.col("simhash").alias("sig_a"), "band", "bucket")
    right = banded.select(F.col("doc_id").alias("b"),
                          F.col("simhash").alias("sig_b"), "band", "bucket")
    pairs = (left.join(right, ["band", "bucket"])
             .filter(F.col("a") < F.col("b"))
             .select("a", "b", "sig_a", "sig_b").distinct())
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (pairs.withColumn("hamming", hamming)
            .filter(F.col("hamming") <= max_hamming)
            .select("a", "b", "hamming"))


def connected_components(pairs: DataFrame, a_col: str = "a",
                         b_col: str = "b",
                         max_iters: int = 50) -> DataFrame:
    """Duplicate-pair graph → (doc_id, component) via iterative min-label
    propagation (alternating large-star/small-star style; converges in
    O(log n) rounds for near-dup graphs, whose components are tiny).

    This is the cluster step between near-dup *pairs* (minhash/simhash/
    cosine) and the resource-merge rewrite (ops.replace_values semantics,
    reference util.py:162-191): every member maps to the component's
    minimum id."""
    edges = (pairs.select(F.col(a_col).alias("x"), F.col(b_col).alias("y"))
             .unionByName(pairs.select(F.col(b_col).alias("x"),
                                       F.col(a_col).alias("y")))
             .distinct())
    labels = (edges.select(F.col("x").alias("node"))
              .distinct()
              .withColumn("component", F.col("node")))
    edges = edges.persist()
    for _ in range(max_iters):
        # neighbor-min: candidate label = min(own, min over neighbors)
        nbr = (edges.join(labels.withColumnRenamed("node", "y"), "y")
               .groupBy("x").agg(F.min("component").alias("nbr_min"))
               .withColumnRenamed("x", "node"))
        new_labels = (labels.join(nbr, "node", "left")
                      .select("node",
                              F.least(F.col("component"),
                                      F.coalesce(F.col("nbr_min"),
                                                 F.col("component")))
                              .alias("component"))
                      .persist())
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "node")
                   .filter(F.col("n.component") != F.col("o.component"))
                   .limit(1).count())
        labels.unpersist() if hasattr(labels, "unpersist") else None
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(F.col("node").alias("doc_id"), "component")


def merge_duplicates(links: DataFrame, pairs: DataFrame,
                     a_col: str = "a", b_col: str = "b") -> DataFrame:
    """Resource merge: rewrite origins/targets of *links* so every member
    of a duplicate cluster collapses to the cluster representative (the
    minimum id) — the bulk form of the reference's
    ``replace_entity_resource`` (util.py:175-191) fed by near-dup pairs."""
    cc = connected_components(pairs, a_col, b_col)
    mapping = (cc.filter(F.col("doc_id") != F.col("component"))
               .select(F.col("doc_id").cast("string").alias("_from"),
                       F.col("component").cast("string").alias("_to")))
    m_o = F.broadcast(mapping.select(F.col("_from").alias("_from_o"),
                                     F.col("_to").alias("_to_o")))
    m_t = F.broadcast(mapping.select(F.col("_from").alias("_from_t"),
                                     F.col("_to").alias("_to_t")))
    out = (links
           .join(m_o, links["origin"] == m_o["_from_o"], "left")
           .join(m_t, links["target"] == m_t["_from_t"], "left"))
    keep = [c for c in links.columns if c not in ("origin", "target")]
    return out.select(
        F.coalesce("_to_o", "origin").alias("origin"),
        F.coalesce("_to_t", "target").alias("target"), *keep)


def embedding_near_dups(emb: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        threshold: float = 0.95) -> DataFrame:
    """Exact pairwise cosine ≥ threshold (verification kernel; discovery
    at scale = simsearch LSH buckets).  Dot products via zip_with +
    aggregate — JVM higher-order functions, no UDF."""
    norm = F.sqrt(F.aggregate(F.col(vec_col),
                              F.lit(0.0),
                              lambda acc, x: acc + x * x))
    a = emb.select(F.col(id_col).alias("a"),
                   F.col(vec_col).alias("va"),
                   norm.alias("na"))
    b = emb.select(F.col(id_col).alias("b"),
                   F.col(vec_col).alias("vb"),
                   norm.alias("nb"))
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    return (a.crossJoin(b).filter(F.col("a") < F.col("b"))
            .withColumn("cosine", dot / (F.col("na") * F.col("nb")))
            .filter(F.col("cosine") >= threshold)
            .select("a", "b", F.round("cosine", 6).alias("cosine")))
