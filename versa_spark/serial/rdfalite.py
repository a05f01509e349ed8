"""RDFa-Lite parse: HTML5 with vocab/typeof/property/resource attributes.

Mirrors /root/reference/tools/py/serial/rdfalite.py:78-172 (attribute
semantics, vocab/prefix inheritance, bnode typeof targets, value
precedence resource > content > href > src > text) using the stdlib
``html.parser`` instead of html5lib (not in this environment).  Edge
HTML parsing is fixture-scale work (SURVEY.md §2.1: out of scope at
100 TB); for bulk HTML the same function runs per Arrow batch in
``parse_html_df``."""

from __future__ import annotations

from html.parser import HTMLParser

from versa_spark.iri import absolutize, is_absolute
from versa_spark.iriref import I

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

DEFAULT_PREFIXES = {
    "schema": "http://schema.org/",
    "dc": "http://purl.org/dc/terms/",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "rdf": RDF_NS,
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
}

_VOID = {"area", "base", "br", "col", "embed", "hr", "img", "input",
         "link", "meta", "param", "source", "track", "wbr"}


class _Node:
    __slots__ = ("tag", "attrs", "children", "text")

    def __init__(self, tag, attrs):
        self.tag = tag
        self.attrs = dict(attrs)
        self.children: list = []
        self.text: list[str] = []

    def all_text(self) -> str:
        out = list(self.text)
        for c in self.children:
            out.append(c.all_text())
        return "".join(out)


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", {})
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, attrs)
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(_Node(tag, attrs))

    def handle_endtag(self, tag):
        for ix in range(len(self.stack) - 1, 0, -1):
            if self.stack[ix].tag == tag:
                del self.stack[ix:]
                break

    def handle_data(self, data):
        self.stack[-1].text.append(data)


def _bnode_factory():
    n = [0]

    def make():
        n[0] += 1
        return I(f"__VERSABLANKNODE__{n[0]}")
    return make


def parse(htmlsource: str, source_uri: str = "http://example.org/doc"):
    """HTML text → list of (subject, property, value) triples (values are
    ``I`` for resources, str for literals)."""
    builder = _TreeBuilder()
    builder.feed(htmlsource)
    triples: list[tuple] = []
    bnode = _bnode_factory()

    def walk(node: _Node, resource, vocab, prefixes):
        attrs = node.attrs
        vocab = attrs.get("vocab", vocab)
        if vocab:
            if "prefix" in attrs:
                bits = (attrs["prefix"] or "").split()
                prefixes = dict(prefixes)
                for p, ns in zip(bits[0::2], bits[1::2]):
                    prefixes[p.strip().rstrip(":")] = ns.strip()
            new_resource = None
            if attrs.get("resource"):
                new_resource = resource = I(
                    absolutize(attrs["resource"], source_uri))
            if attrs.get("typeof") is not None:
                if not new_resource:
                    new_resource = bnode()
                for typeof in (attrs.get("typeof") or "").split():
                    triples.append((new_resource or resource,
                                    I(RDF_NS + "type"),
                                    I(absolutize(typeof, vocab))))
            new_value = new_resource if (attrs.get("property")
                                         and new_resource) else None
            for prop_name in (attrs.get("property") or "").split():
                if prop_name == "about":
                    continue
                # a colon means CURIE first (reference rdfalite.py:131-139:
                # any ':' goes through the prefix table; unknown prefix →
                # skip silently)
                if ":" in prop_name:
                    p, local = prop_name.split(":", 1)
                    if p in prefixes:
                        prop = I(prefixes[p] + local)
                    elif is_absolute(prop_name):
                        prop = I(prop_name)
                    else:
                        continue
                else:
                    prop = I(absolutize(prop_name, vocab))
                href = attrs.get("href") or attrs.get("src")
                value = (new_value or attrs.get("content")
                         or (I(href) if href else None)
                         or node.all_text())
                triples.append((resource, prop, value))
            if new_value:
                resource = new_value
        for child in node.children:
            walk(child, resource, vocab, prefixes)

    walk(builder.root, I(source_uri), None, dict(DEFAULT_PREFIXES))
    return triples


def parse_html_df(df, html_col: str = "html",
                  uri_col: str | None = None):
    """Bulk HTML → link rows via mapInPandas (each document independent)."""
    from versa_spark.model import LINK_SCHEMA
    from versa_spark.shipping import ensure_shipped
    ensure_shipped(df.sparkSession)

    def _batches(pdf_iter):
        import pandas as pd
        for pdf in pdf_iter:
            rows = []
            for ix, html in enumerate(pdf[html_col]):
                uri = (pdf[uri_col].iloc[ix] if uri_col
                       else f"http://example.org/doc/{ix}")
                for (s, p, o) in parse(html or "", uri):
                    rows.append((str(s), str(p), str(o), isinstance(o, I),
                                 [], None))
            yield pd.DataFrame(rows, columns=[
                "origin", "rel", "target", "t_iri", "attrs", "link_ix"])

    return df.mapInPandas(_batches, LINK_SCHEMA)
