"""simpleobj: JSON-ish objects → Versa model via a render template.

Mirrors /root/reference/tools/py/serial/simpleobj.py:29-33: each object
fills a template (callable ``render(_=obj, **obj)`` or a plain
``str.format`` template) whose output is parsed as Versa Literate.

Spark surface: ``parse_df`` — same mapInPandas pattern as serial.csv
(one object = one independent subgraph)."""

from __future__ import annotations

from versa_spark.serial.literate import parse_to_quads


def _render(template, obj) -> str:
    if hasattr(template, "render"):
        return template.render(_=obj, **obj)
    if callable(template):
        return template(obj)
    return template.format(_=obj, **obj)


def parse(objlist, vl_template) -> list[tuple]:
    quads = []
    for obj in objlist:
        text = _render(vl_template, obj)
        obj_quads, _ = parse_to_quads(text)
        quads.extend(obj_quads)
    return quads


def parse_df(df, vl_template):
    """Spark DataFrame (one object per row) → link DataFrame."""
    from versa_spark.model import LINK_SCHEMA
    from versa_spark.shipping import ensure_shipped
    ensure_shipped(df.sparkSession)

    def _batches(pdf_iter):
        import pandas as pd
        from versa_spark.model import quads_to_rows
        for pdf in pdf_iter:
            quads = parse(
                ({k: ("" if v is None else v) for k, v in r.items()}
                 for r in pdf.to_dict("records")), vl_template)
            out = quads_to_rows(quads)
            yield pd.DataFrame(
                [(o, r, t, ti, [{"k": k, "v": v} for (k, v) in a], None)
                 for (o, r, t, ti, a, _ix) in out],
                columns=["origin", "rel", "target", "t_iri", "attrs",
                         "link_ix"])

    return df.mapInPandas(_batches, LINK_SCHEMA)
