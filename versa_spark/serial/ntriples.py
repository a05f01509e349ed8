"""NTriples parse/write.

Mirrors /root/reference/tools/py/serial/ntriples.py:31-129: line-regex
parse, rdf:type ↔ v:type mapping, ``only_rel``/``exclude_rel`` parse-time
pushdown (the reference's only predicate pushdown — here it lands on the
scan via Catalyst), ``disjoint`` exclusion, blank nodes unsupported.

Two surfaces:
* ``parse``/``write_string`` — driver-side, fixture scale, quad lists;
* ``parse_df``/``write_df`` — Spark-native: ``spark.read.text`` →
  ``regexp_extract`` columns → filters (pushdown-friendly), and
  ``format_string`` → ``write.text``.
"""

from __future__ import annotations

import re

from versa_spark import VERSA_BASEIRI, VTYPE_REL
from versa_spark.iriref import I

RDF_TYPE_REL = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_NT_LINE = re.compile(
    r'^((<([^>]+)>)|(_:\w+))\s+<([^>]+)>\s+((<([^>]+)>)|"([^"]*)"|(_:\w+))'
    r"\s+\.\s*")

# regexp_extract-friendly variant (no nested alternation bookkeeping)
NT_REGEX_SUBJ = r"^<([^>]+)>"
NT_REGEX_PRED = r"^<[^>]+>\s+<([^>]+)>"
NT_REGEX_OBJ_IRI = r"^<[^>]+>\s+<[^>]+>\s+<([^>]+)>\s+\.\s*$"
NT_REGEX_OBJ_LIT = r'^<[^>]+>\s+<[^>]+>\s+"([^"]*)"\s+\.\s*$'


def parse(nt: str, disjoint=None, only_rel=None, exclude_rel=None):
    """NTriples text → quad list (reference ntriples.py:31-96)."""
    exclude_rel = set(exclude_rel or ())
    only_rel = set(only_rel or ())
    disjoint = disjoint or set()
    if only_rel:
        only_rel.add(VTYPE_REL)          # typing is never dropped
    seen = set()
    quads = []
    for line in nt.splitlines():
        m = _NT_LINE.match(line.strip())
        if not m:
            continue
        (_all, _s, s_iri, s_blank, p_iri, _o, _oi, o_iri, o_str,
         o_blank) = m.groups()
        if s_blank or o_blank:
            raise NotImplementedError("blank nodes not supported")
        if p_iri == RDF_TYPE_REL:
            p_iri = str(VTYPE_REL)
        p = I(p_iri)
        if only_rel and p not in only_rel:
            continue
        if not only_rel and p in exclude_rel:
            continue
        target = I(o_iri) if o_iri else o_str
        key = (I(s_iri), p, target, ())
        if key in seen or key in disjoint:
            continue
        seen.add(key)
        quads.append((I(s_iri), p, target, {}))
    return quads


def parse_df(spark, path_or_df, only_rel=None, exclude_rel=None,
             dedup: bool = True):
    """NTriples lines → link DataFrame.  Filters are plain column
    predicates, so Catalyst pushes them to the text scan — the reference's
    only_rel pushdown (ntriples.py:54-55,85-91), for free.

    ``dedup=False`` skips the final dropDuplicates — used by the
    streaming ingest (streaming.streaming_nt_ingest), which substitutes a
    watermark-bounded dropDuplicatesWithinWatermark so dedup state cannot
    grow forever on an unbounded feed."""
    from pyspark.sql import functions as F
    df = (spark.read.text(path_or_df)
          if isinstance(path_or_df, str) else path_or_df)
    line = F.trim(F.col("value"))
    parsed = df.select(
        F.regexp_extract(line, NT_REGEX_SUBJ, 1).alias("origin"),
        F.regexp_extract(line, NT_REGEX_PRED, 1).alias("rel_raw"),
        F.regexp_extract(line, NT_REGEX_OBJ_IRI, 1).alias("t_iri_val"),
        F.regexp_extract(line, NT_REGEX_OBJ_LIT, 1).alias("t_lit_val"),
        line.alias("_line"),
    ).filter((F.col("origin") != "") & (F.col("rel_raw") != "")
             # the WHOLE line must match one of the two object shapes:
             # regexp_extract alone returns '' for both "no match" and
             # a legal empty literal, so without this a lang-tagged,
             # typed-literal, escaped-quote, blank-node, or N-Quads
             # line would silently fabricate an empty-string literal.
             # Such lines are DROPPED — the same lines the driver-side
             # parse() skips (blank nodes, which parse() raises on, are
             # dropped too: a distributed filter cannot raise per row)
             & (F.col("_line").rlike(NT_REGEX_OBJ_IRI)
                | F.col("_line").rlike(NT_REGEX_OBJ_LIT)))
    out = parsed.select(
        "origin",
        F.when(F.col("rel_raw") == RDF_TYPE_REL, F.lit(str(VTYPE_REL)))
         .otherwise(F.col("rel_raw")).alias("rel"),
        F.when(F.col("t_iri_val") != "", F.col("t_iri_val"))
         .otherwise(F.col("t_lit_val")).alias("target"),
        (F.col("t_iri_val") != "").alias("t_iri"),
        F.array().cast("array<struct<k:string,v:string>>").alias("attrs"),
        F.lit(None).cast("long").alias("link_ix"),
    )
    if only_rel:
        rels = {str(r) for r in only_rel} | {str(VTYPE_REL)}
        out = out.filter(F.col("rel").isin(list(rels)))
    elif exclude_rel:
        out = out.filter(~F.col("rel").isin([str(r) for r in exclude_rel]))
    if not dedup:
        return out
    return out.dropDuplicates(["origin", "rel", "target", "t_iri"])


# vocabulary remap on write (reference ntriples.py:16-21): versa vocab →
# standard RDF(S) terms, applied to both predicate and object positions
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
RESOURCE_MAPPING = {
    VERSA_BASEIRI("Resource"): I(RDFS_NS + "Class"),
    VERSA_BASEIRI("Property"): I(RDF_NS + "Property"),
    VERSA_BASEIRI("description"): I(RDFS_NS + "comment"),
    VERSA_BASEIRI("label"): I(RDFS_NS + "label"),
}


def _strconv(item) -> str:
    if isinstance(item, I):
        return f"<{item}>"
    return f'"{item}"'


def write_string(quads, base=None) -> str:
    """Quads → NTriples text (reference ntriples.py:113-129)."""
    lines = []
    for (s, p, o, _a) in quads:
        if s == (base or "") + "@docheader":
            continue
        p = RESOURCE_MAPPING.get(p, p)
        o = RESOURCE_MAPPING.get(o, o)
        if p == VTYPE_REL:
            p = I(RDF_TYPE_REL)
        lines.append(f"{_strconv(s)} {_strconv(p)} {_strconv(o)} .")
    return "\n".join(lines) + ("\n" if lines else "")


def write_df(links_df):
    """Link DataFrame → DataFrame of NT lines (``.write.text``-ready):
    format_string + the RESOURCE_MAPPING when/otherwise chain stay in
    whole-stage codegen (reference applies the map at ntriples.py:124-125
    before the v:type→rdf:type rewrite)."""
    from pyspark.sql import functions as F

    def _remap(col):
        out = col
        for src, dst in RESOURCE_MAPPING.items():
            out = F.when(col == str(src), F.lit(str(dst))).otherwise(out)
        return out

    rel = _remap(F.col("rel"))
    rel = F.when(rel == str(VTYPE_REL), F.lit(RDF_TYPE_REL)).otherwise(rel)
    tgt = _remap(F.col("target"))
    obj = F.when(F.col("t_iri"), F.format_string("<%s>", tgt)) \
           .otherwise(F.format_string('"%s"', tgt))
    return links_df.select(F.format_string(
        "<%s> <%s> %s .", F.col("origin"), rel, obj).alias("value"))
