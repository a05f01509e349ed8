"""Mermaid write: model → ``graph TD`` diagram text (visualization only).

Mirrors /root/reference/tools/py/serial/mermaid.py:28-96: tag stems from
the IRI leaf, middle-ellipsis truncation at 12 chars, numeric
disambiguation of stem collisions, label decoration for labeled resources.
Driver-side over collected quads (diagrams are small by nature)."""

from __future__ import annotations

import io
import sys

from versa_spark import VLABEL_REL
from versa_spark.ids import slugify
from versa_spark.iriref import I

TAG_MAX_STEM_LENGTH = 12


def _trunc(s: str) -> str:
    if len(s) >= TAG_MAX_STEM_LENGTH:
        half = TAG_MAX_STEM_LENGTH // 2
        return s[:half] + "..." + s[-half:]
    return s


def _tag(obj, tag_map, label, is_node=True) -> str:
    stem = tag_map.get(obj)
    disambig = ""
    if stem is None:
        existing = set(tag_map.values())
        stem = _trunc(str(obj).split("/")[-1])
        n = 0
        while f"{stem}-{n}" in existing:
            n += 1
        disambig = str(n) if n else ""
        tag_map[obj] = f"{stem}{'-' if disambig else ''}{disambig}"
    node_id = f"{slugify(stem)}{disambig}"
    if label:
        return f"{node_id}(fa:fa-tag {_trunc(label)})"
    shown = f"{stem}{'-' if disambig else ''}{disambig}"
    if not is_node:
        return shown
    return f"{node_id}({shown})" if isinstance(obj, I) else f"{node_id}[{shown}]"


def write(quads, out=None) -> str:
    """Quads → Mermaid text; returns the text (and writes to *out*)."""
    buf = io.StringIO()
    resource_tags: dict = {}
    property_tags: dict = {}
    value_tags: dict = {}
    by_origin: dict = {}
    labels: dict = {}
    order = []
    for q in quads:
        (o, r, t) = q[:3]
        if o not in by_origin:
            by_origin[o] = []
            order.append(o)
        by_origin[o].append((r, t))
        if r == VLABEL_REL and o not in labels:
            labels[o] = t

    buf.write("graph TD\n")
    for o in order:
        o_tag = _tag(o, resource_tags, labels.get(o))
        for (r, t) in by_origin[o]:
            r_tag = _tag(r, property_tags, None, is_node=False)
            if isinstance(t, I):
                t_tag = _tag(t, resource_tags, labels.get(t))
            else:
                t_tag = _tag(t, value_tags, None)
            buf.write(f"    {o_tag} -->|{r_tag}| {t_tag}\n")
        buf.write("\n")
    text = buf.getvalue()
    if out is not None:
        out.write(text)
    return text
