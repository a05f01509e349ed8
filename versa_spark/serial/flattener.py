"""Flatten Versa statements with attributes into attribute-free ones via
simple schematic patterns.

The reference module (serial/flattener.py) ships only its docstring —
"Use simple schematic patterns to 'flatten' Versa statements with
attributes into ones without attributes" — so the concrete semantics here
realize that intent as a DataFrame op:

* a pattern maps (rel, attr_key) → (new_rel, anchor) where anchor is
  'origin' or 'target';
* every link (o, r, t, {k: v, …}) whose (r, k) matches a pattern emits a
  new attribute-free link (anchor, new_rel, v);
* all base links are re-emitted with their attributes stripped (the
  flattened model carries NO attributes — attrs not named by any pattern
  are dropped, which is the point of a *schematic* flattener).

Spark shape: explode attrs → broadcast pattern join → union with the
attr-stripped base.  The pattern table is tiny (a schema, not data) so
the join is always map-side; the only wide operation is the explode,
which is linear in total attribute count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EMPTY_ATTRS = F.array().cast("array<struct<k:string,v:string>>")


def flatten(df: DataFrame, patterns) -> DataFrame:
    """links (origin, rel, target, t_iri, attrs, link_ix) → attribute-free
    links.

    ``patterns``: iterable of (rel, attr_key, new_rel) or
    (rel, attr_key, new_rel, anchor); anchor defaults to 'target' (the
    attribute describes the pointed-to end of the qualified edge), or
    'origin' to hang the flattened statement off the subject."""
    rows = []
    for p in patterns:
        rel, key, new_rel = str(p[0]), str(p[1]), str(p[2])
        anchor = p[3] if len(p) > 3 else "target"
        if anchor not in ("origin", "target"):
            raise ValueError(f"anchor must be origin|target, got {anchor!r}")
        rows.append((rel, key, new_rel, anchor))
    pat = F.broadcast(df.sparkSession.createDataFrame(
        rows, "p_rel string, p_key string, new_rel string, anchor string"))
    exploded = df.select("origin", "rel", "target",
                         F.explode("attrs").alias("e"))
    derived = (exploded
               .join(pat, (exploded["rel"] == pat["p_rel"])
                     & (exploded["e"]["k"] == pat["p_key"]))
               .select(
                   F.when(F.col("anchor") == "origin", F.col("origin"))
                    .otherwise(F.col("target")).alias("origin"),
                   F.col("new_rel").alias("rel"),
                   F.col("e")["v"].alias("target"),
                   F.lit(False).alias("t_iri"),
                   EMPTY_ATTRS.alias("attrs"),
                   F.lit(None).cast("long").alias("link_ix")))
    base = df.select("origin", "rel", "target", "t_iri",
                     EMPTY_ATTRS.alias("attrs"),
                     F.col("link_ix").cast("long").alias("link_ix"))
    return base.unionByName(derived)
