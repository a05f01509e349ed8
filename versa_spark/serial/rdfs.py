"""RDFS write: Versa vocab model → RDF triples with vocabulary remap.

Mirrors /root/reference/tools/py/serial/rdfs.py:31-100 without the rdflib
dependency: output is (s, p, o, o_is_iri) tuples (driver-side) or a link
DataFrame (``process_df`` — the remap is a when/otherwise expression chain,
wholly JVM-side).

Remap rules:
  v:Resource → rdfs:Class, v:Property → rdf:Property,
  v:description → rdfs:comment, v:label → rdfs:label,
  v:refines → rdfs:subClassOf (typed Resource) / subPropertyOf (Property),
  (s, v:properties, o) → (o, rdfs:domain, s)  [inverted],
  (s, v:value, o)      → (s, rdfs:range, o) unless o ∈ {Literal, IRI},
  v:type → rdf:type.
"""

from __future__ import annotations

from versa_spark import VERSA_BASEIRI, VTYPE_REL
from versa_spark.iri import absolutize
from versa_spark.iriref import I

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
RDF_TYPE = I(RDF_NS + "type")

RESOURCE_MAPPING = {
    I(VERSA_BASEIRI + "Resource"): I(RDFS_NS + "Class"),
    I(VERSA_BASEIRI + "Property"): I(RDF_NS + "Property"),
    I(VERSA_BASEIRI + "description"): I(RDFS_NS + "comment"),
    I(VERSA_BASEIRI + "label"): I(RDFS_NS + "label"),
}

# --- blank-node faking for RDF interop (reference serial/rdf.py:25-31) ---
# The reference represents RDF blank nodes as IRIs under this prefix; its
# mock_bnode derives the id from hash(now()) — non-deterministic and
# partition-order-hostile, so here the caller supplies the id seed
# (provenance key, row key, …), same convention as ids.resource_id's
# fallback_key.  Matches both spellings the reference checks for
# (rdf.py:49: with and without the leading underscores).

BNODE_PREFIX = "__VERSABLANKNODE__"


class mock_bnode(I):
    """A blank node faked as an IRI (reference rdf.py:25-31), seeded
    deterministically."""

    def __new__(cls, seed):
        return super().__new__(cls, BNODE_PREFIX + str(seed))


def is_bnode(r) -> bool:
    return isinstance(r, mock_bnode) or str(r).startswith(
        (BNODE_PREFIX, "VERSABLANKNODE_"))


def prep(s, p, o):
    """Prepare a triple for rdflib (reference rdf.py:44-54 — the
    bnode-aware variant; upstream accidentally shadows it with a second
    bnode-less def at rdf.py:57-67, an evident copy-paste bug, so the
    documented intent is implemented).  Returns rdflib terms when rdflib
    is importable, else (term, kind) tuples with kind ∈ {bnode, iri,
    literal} so the serialization decision is preserved without the
    dependency."""
    try:
        from rdflib import BNode, Literal, URIRef
        s2 = BNode(str(s)[len(BNODE_PREFIX):]) if is_bnode(s) else URIRef(s)
        o2 = BNode(str(o)[len(BNODE_PREFIX):]) if is_bnode(o) else (
            URIRef(o) if isinstance(o, I) else Literal(o))
        return s2, URIRef(p), o2
    except ImportError:
        def kind(r, iri_ok=True):
            if is_bnode(r):
                return "bnode"
            return "iri" if (iri_ok and isinstance(r, I)) else "literal"
        return ((str(s), kind(s)), (str(p), "iri"), (str(o), kind(o)))


def process(quads, rdfsonly=False, base=None):
    """Quads → list of (s, p, o, o_is_iri) RDF triples."""
    quads = [q[:3] + ({},) for q in quads]
    types = {}
    for (s, r, t, _a) in quads:
        if r == VTYPE_REL and s not in types:
            types[s] = t
    out = []
    for (s, p, o, _a) in quads:
        if s == (base or "") + "@docheader":
            continue
        p = RESOURCE_MAPPING.get(p, p)
        o = RESOURCE_MAPPING.get(o, o)
        if p == VERSA_BASEIRI + "refines":
            typ = types.get(s)
            if typ == VERSA_BASEIRI + "Resource":
                p = I(RDFS_NS + "subClassOf")
            elif typ == VERSA_BASEIRI + "Property":
                p = I(RDFS_NS + "subPropertyOf")
        if p == VERSA_BASEIRI + "properties":
            suri = absolutize(s, base) if base else s
            out.append((str(o), RDFS_NS + "domain", str(suri), True))
            continue
        if p == VERSA_BASEIRI + "value":
            if o not in ("Literal", "IRI"):
                ouri = absolutize(o, base) if base else o
                out.append((str(s), RDFS_NS + "range", str(ouri), True))
            continue
        p = RDF_TYPE if p == VTYPE_REL else p
        if not rdfsonly or str(p).startswith((RDF_NS, RDFS_NS)):
            out.append((str(s), str(p), str(o), isinstance(o, I)))
    return out


def process_df(links_df, rdfsonly=False):
    """Link DataFrame → remapped RDF triple DataFrame (pure expressions:
    the static remap is a chained when/otherwise; refines typing is a
    self-join against the type links)."""
    from pyspark.sql import functions as F
    df = links_df
    typ = (df.filter(F.col("rel") == str(VTYPE_REL))
           .select(F.col("origin").alias("_to"),
                   F.col("target").alias("_typ"))
           .dropDuplicates(["_to"]))
    df = df.join(F.broadcast(typ), df.origin == typ._to, "left")

    def remap(col):
        expr = col
        for k, v in RESOURCE_MAPPING.items():
            expr = F.when(col == str(k), F.lit(str(v))).otherwise(expr)
        return expr

    refines = str(VERSA_BASEIRI) + "refines"
    p = remap(F.col("rel"))
    p = (F.when((F.col("rel") == refines)
                & (F.col("_typ") == str(VERSA_BASEIRI) + "Resource"),
                F.lit(RDFS_NS + "subClassOf"))
         .when((F.col("rel") == refines)
               & (F.col("_typ") == str(VERSA_BASEIRI) + "Property"),
               F.lit(RDFS_NS + "subPropertyOf"))
         .when(F.col("rel") == str(VTYPE_REL), F.lit(str(RDF_TYPE)))
         .otherwise(p))
    props = str(VERSA_BASEIRI) + "properties"
    value = str(VERSA_BASEIRI) + "value"
    normal = (df.filter(~F.col("rel").isin([props, value]))
              .select(F.col("origin").alias("s"), p.alias("p"),
                      remap(F.col("target")).alias("o"),
                      F.col("t_iri").alias("o_is_iri")))
    domain = (df.filter(F.col("rel") == props)
              .select(F.col("target").alias("s"),
                      F.lit(RDFS_NS + "domain").alias("p"),
                      F.col("origin").alias("o"),
                      F.lit(True).alias("o_is_iri")))
    rng = (df.filter((F.col("rel") == value)
                     & ~F.col("target").isin(["Literal", "IRI"]))
           .select(F.col("origin").alias("s"),
                   F.lit(RDFS_NS + "range").alias("p"),
                   F.col("target").alias("o"),
                   F.lit(True).alias("o_is_iri")))
    out = normal.unionByName(domain).unionByName(rng)
    if rdfsonly:
        out = out.filter(F.col("p").startswith(RDF_NS)
                         | F.col("p").startswith(RDFS_NS))
    return out
