"""CLI umbrella: parse / transform, extension-sniffing smart I/O.

Mirrors the reference CLI (/root/reference/tools/exec/versa:28-141):
``parse`` converts between serializations, ``transform`` runs a rulespec
pipeline.  The rulespec is a Python module defining
``VERSA_PIPELINE_ENTRY`` (a ``definition``), loaded with
``runpy.run_path`` into a namespace pre-seeded with the pipeline DSL —
same contract as the reference (versa:119-126) minus the bare ``exec``.

Fixture-scale paths run driver-side on LocalModel; ``--spark`` fans the
transform out per group via pipeline.spark_run (the production shape:
``spark-submit --py-files versa_spark.zip -m versa_spark.cli …``).
"""

from __future__ import annotations

import argparse
import runpy
import sys

from versa_spark.local import LocalModel, model_to_rows


def smart_parse(text: str, fmt: str):
    """Extension/format sniffing parse → quads (reference versa:28-56)."""
    if fmt in ("md", "vlit", "literate"):
        from versa_spark.serial.literate import parse_to_quads
        quads, _ = parse_to_quads(text)
        return quads
    if fmt in ("nt", "ntriples"):
        from versa_spark.serial import ntriples
        return ntriples.parse(text)
    if fmt == "json":
        import io
        import json as _json
        from versa_spark.iriref import I
        quads = []
        for item in _json.load(io.StringIO(text)):
            s, p, o, a = item
            if a.get("@target-type") == "@iri-ref":
                o = I(o)
                a = {k: v for k, v in a.items() if k != "@target-type"}
            quads.append((I(s), I(p), o, a))
        return quads
    raise ValueError(f"unknown input format {fmt!r}")


def smart_write(model: LocalModel, fmt: str, out) -> None:
    """(reference versa:59-82)"""
    quads = list(model)
    if fmt in ("md", "vlit", "literate"):
        from versa_spark.model import quads_to_rows
        from versa_spark.serial import literate
        import pandas  # noqa: F401  (env sanity)
        rows = quads_to_rows(quads)
        # driver-side canonical write over rows
        literate.write_rows(rows, out=out, canonical=True)
        return
    if fmt in ("nt", "ntriples"):
        from versa_spark.serial import ntriples
        out.write(ntriples.write_string(quads))
        return
    if fmt == "mermaid":
        from versa_spark.serial import mermaid
        mermaid.write(quads, out=out)
        return
    if fmt == "json":
        import json as _json
        from versa_spark.iriref import I
        items = []
        for (s, p, o, a) in quads:
            a = dict(a)
            if isinstance(o, I):
                a["@target-type"] = "@iri-ref"
            items.append([str(s), str(p), str(o), a])
        out.write(_json.dumps(items))
        return
    raise ValueError(f"unknown output format {fmt!r}")


def _sniff(path: str, explicit: str | None) -> str:
    if explicit:
        return explicit
    ext = path.rsplit(".", 1)[-1].lower()
    return {"md": "md", "vlit": "md", "nt": "nt", "json": "json",
            "mmd": "mermaid"}.get(ext, "md")


def load_rulespec(path: str):
    """Load VERSA_PIPELINE_ENTRY from a rulespec module, with the pipeline
    DSL pre-imported (reference versa:119-126)."""
    import versa_spark.pipeline as ppl_mod
    init = {k: getattr(ppl_mod, k) for k in ppl_mod.__all__}
    ns = runpy.run_path(path, init_globals=init)
    entry = ns.get("VERSA_PIPELINE_ENTRY")
    if entry is None:
        raise SystemExit("rulespec must define VERSA_PIPELINE_ENTRY")
    return entry


def _spark_dataop(args) -> int:
    """Spark-backed data ops (dedup / sessionize): read parquet, run the
    library op, write parquet.  Same session shape as the KG job."""
    from pyspark.sql import SparkSession
    from versa_spark.shipping import ensure_shipped
    existing = SparkSession.getActiveSession()
    spark = existing or (SparkSession.builder
                         .master(f"local[{args.cpus}]")
                         .appName(f"versa-spark-{args.cmd}")
                         .config("spark.sql.shuffle.partitions",
                                 str(int(args.cpus) * 2))
                         .config("spark.sql.adaptive.enabled", "true")
                         .config("spark.ui.enabled", "false")
                         .getOrCreate())
    ensure_shipped(spark)
    df = spark.read.parquet(args.source)
    if args.cmd == "graphstats":
        # KG-analytics bundle over a linked-mentions parquet (the KG
        # job's `linked` stage shape) OR a sets-shaped parquet with a
        # per-turn `ents` array (kg/extract.turn_entity_iri_sets) —
        # the sets shape routes through cooccurrence_pmi_from_sets,
        # skipping the collect_set corpus exchange entirely (the
        # measured scale path: 37.5 s → 5.1 s at 4M turns).  Outputs:
        # co-occurrence/PMI, PageRank over the symmetrized co-mention
        # graph, triangle census — three parquet dirs under --out
        from pyspark.sql import functions as F
        from versa_spark.kg import analytics
        if "ents" in df.columns:
            pmi = analytics.cooccurrence_pmi_from_sets(
                df.select("conv_id", "turn_idx", "ents"))
        else:
            linked = df.select("conv_id", "turn_idx", "entity_iri")
            pmi = analytics.cooccurrence_pmi(linked)
        pmi.write.mode("overwrite").parquet(f"{args.out}/cooccur")
        edges = pmi.select(F.col("a").alias("src"),
                           F.col("b").alias("dst"))
        sym = edges.unionByName(edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")))
        pr = analytics.pagerank(sym, iterations=args.iterations)
        pr.write.mode("overwrite").parquet(f"{args.out}/pagerank")
        tri = analytics.triangle_stats(edges)
        tri.write.mode("overwrite").parquet(f"{args.out}/triangles")
        extras = []
        if args.k_core > 0:
            core = analytics.k_core(sym, k=args.k_core)
            core.write.mode("overwrite").parquet(f"{args.out}/kcore")
            extras.append(f"{core.count()} nodes in the "
                          f"{args.k_core}-core")
        if args.landmarks:
            sp = analytics.shortest_paths(
                sym, [s for s in args.landmarks.split(",") if s])
            sp.write.mode("overwrite").parquet(
                f"{args.out}/shortest_paths")
            extras.append(f"{sp.count()} landmark distances")
        extra_txt = ("; " + "; ".join(extras)) if extras else ""
        print(f"graphstats: {pmi.count()} pairs, {pr.count()} ranked "
              f"nodes, triangle census{extra_txt} -> {args.out}")
        if existing is None:
            spark.stop()
        return 0
    if args.cmd == "aliases":
        from versa_spark.kg.linking import resolve_aliases
        d = resolve_aliases(df, surface_col=args.surface_col,
                            acronyms=not args.no_acronyms)
        d.write.mode("overwrite").parquet(args.out)
        # count the parquet JUST WRITTEN, not the lazy frame — re-using
        # `d` would replay the corpus groupBy + cluster joins twice more
        written = spark.read.parquet(args.out)
        n_s = written.count()
        n_c = written.select("canonical").distinct().count()
        print(f"aliases: {n_s} surfaces -> {n_c} canonical entities "
              f"at {args.out}")
        if existing is None:
            spark.stop()
        return 0
    if args.cmd == "dedup":
        if args.index:
            from versa_spark.dedup import dedup_against_index
            out = dedup_against_index(df, args.index,
                                      threshold=args.threshold)
        else:
            from versa_spark.dedup import dedup_corpus
            out = dedup_corpus(df, threshold=args.threshold)
    elif args.cmd == "dedupindex":
        from versa_spark.dedup import write_dedup_index
        write_dedup_index(df, args.index_path,
                          mode="append" if args.append else "overwrite")
        n = spark.read.parquet(f"{args.index_path}/sizes").count()
        print(f"dedupindex: {n} docs indexed at {args.index_path}")
        if existing is None:
            spark.stop()
        return 0
    elif args.cmd == "annindex":
        from versa_spark.simsearch import write_ann_index
        write_ann_index(df, args.index_path, n_cells=args.cells,
                        mode="append" if args.append else "overwrite")
        n = spark.read.parquet(f"{args.index_path}/vectors").count()
        print(f"annindex: {n} vectors indexed at {args.index_path}")
        if existing is None:
            spark.stop()
        return 0
    elif args.cmd == "annquery":
        from pyspark.sql import functions as F
        from versa_spark.simsearch import ann_query_index
        out = ann_query_index(
            df.select(F.col(args.q_id_col).alias("q_id"),
                      F.col(args.q_vec_col).alias("q_vec")),
            args.index_path, k=args.k, nprobe=args.nprobe)
    elif args.cmd == "decontaminate":
        from versa_spark.dedup import decontaminate, decontaminate_fuzzy
        bench = spark.read.parquet(args.benchmark)
        if args.fuzzy:
            out = decontaminate_fuzzy(df, bench,
                                      threshold=args.threshold,
                                      mode=args.mode)
        else:
            out = decontaminate(df, bench, n=args.ngram, mode=args.mode)
    elif args.cmd == "mediameta":
        from versa_spark.multimodal import extract_media_metadata
        out = extract_media_metadata(df)
    else:
        from versa_spark.events import session_stats
        out = session_stats(df, gap_minutes=args.gap_minutes)
    out.write.mode("overwrite").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    print(f"{args.cmd}: wrote {n} rows to {args.out}")
    if existing is None:          # don't stop a caller-owned session
        spark.stop()
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="versa_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    p_parse = sub.add_parser("parse", help="convert serializations")
    p_parse.add_argument("source")
    p_parse.add_argument("--in-fmt", default=None)
    p_parse.add_argument("--out", default="-")
    p_parse.add_argument("--out-fmt", default="nt")
    p_tx = sub.add_parser("transform", help="run a rulespec pipeline")
    p_tx.add_argument("rulespec")
    p_tx.add_argument("source")
    p_tx.add_argument("--in-fmt", default=None)
    p_tx.add_argument("--out", default="-")
    p_tx.add_argument("--out-fmt", default="md")
    p_dd = sub.add_parser(
        "dedup", help="near-dup removal over a parquet corpus "
                      "(LSH -> scoped verify -> components -> keep reps)")
    p_dd.add_argument("source", help="parquet with (doc_id, text)")
    p_dd.add_argument("out", help="output parquet path")
    p_dd.add_argument("--threshold", type=float, default=0.8)
    p_dd.add_argument("--index", default=None,
                      help="dedup the corpus AGAINST a stored LSH index "
                           "(built with dedupindex) instead of within "
                           "itself")
    p_dd.add_argument("--cpus", default="4")
    p_ix = sub.add_parser(
        "dedupindex", help="build (or --append to) a persistent LSH "
                           "index for incremental dedup")
    p_ix.add_argument("source", help="parquet with (doc_id, text)")
    p_ix.add_argument("index_path")
    p_ix.add_argument("--append", action="store_true")
    p_ix.add_argument("--cpus", default="4")
    p_ax = sub.add_parser(
        "annindex", help="build (or --append to) a persisted IVF index "
                         "over (vec_id, embedding) parquet")
    p_ax.add_argument("source")
    p_ax.add_argument("index_path")
    p_ax.add_argument("--cells", type=int, default=16)
    p_ax.add_argument("--append", action="store_true")
    p_ax.add_argument("--cpus", default="4")
    p_aq = sub.add_parser(
        "annquery", help="top-k cosine search of a query parquet "
                         "against a stored IVF index")
    p_aq.add_argument("source", help="query parquet")
    p_aq.add_argument("index_path")
    p_aq.add_argument("out")
    p_aq.add_argument("--k", type=int, default=10)
    p_aq.add_argument("--nprobe", type=int, default=2)
    p_aq.add_argument("--q-id-col", default="vec_id")
    p_aq.add_argument("--q-vec-col", default="embedding")
    p_aq.add_argument("--cpus", default="4")
    p_dc = sub.add_parser(
        "decontaminate",
        help="benchmark decontamination of a parquet corpus: exact "
             "13-gram (GPT-3/PaLM) by default, --fuzzy for cross-corpus "
             "near-dup (MinHash+LSH -> scoped Jaccard verify)")
    p_dc.add_argument("source", help="corpus parquet with (doc_id, text)")
    p_dc.add_argument("benchmark", help="benchmark parquet with (text)")
    p_dc.add_argument("out", help="output parquet path")
    p_dc.add_argument("--fuzzy", action="store_true")
    p_dc.add_argument("--ngram", type=int, default=13,
                      help="exact-mode n-gram length")
    p_dc.add_argument("--threshold", type=float, default=0.8,
                      help="fuzzy-mode Jaccard threshold")
    p_dc.add_argument("--mode", default="remove",
                      choices=["remove", "flag", "pairs"],
                      help="'pairs' is fuzzy-only (audit artifact)")
    p_dc.add_argument("--cpus", default="4")
    p_ss = sub.add_parser(
        "sessionize", help="gap sessionization rollup over an events "
                           "parquet (user_id, ts, ...)")
    p_ss.add_argument("source")
    p_ss.add_argument("out")
    p_ss.add_argument("--gap-minutes", type=int, default=30)
    p_ss.add_argument("--cpus", default="4")
    p_mm = sub.add_parser(
        "mediameta", help="decode media payloads (PGM/PPM/WAV native; "
                          "codec formats need libs) -> metadata parquet")
    p_mm.add_argument("source", help="parquet with (media_id, kind, payload)")
    p_mm.add_argument("out")
    p_mm.add_argument("--cpus", default="4")
    p_al = sub.add_parser(
        "aliases", help="induce a canonical dictionary from a mentions "
                        "parquet (any frame with a surface column) via "
                        "unsupervised alias resolution — feed the output "
                        "to `jobs kg --dictionary … --detect dictionary` "
                        "for a self-supervised gazetteer pipeline")
    p_al.add_argument("source", help="parquet with a surface column")
    p_al.add_argument("out", help="dictionary parquet "
                                  "(surface, canonical, entity_iri, …)")
    p_al.add_argument("--surface-col", default="surface")
    p_al.add_argument("--no-acronyms", action="store_true",
                      help="disable acronym linking (short-word false "
                           "merges are inherent to it)")
    p_al.add_argument("--cpus", default="4")
    p_gs = sub.add_parser(
        "graphstats", help="KG analytics over a linked-mentions parquet "
                           "(conv_id, turn_idx, entity_iri): "
                           "co-occurrence/PMI + PageRank + triangles")
    p_gs.add_argument("source")
    p_gs.add_argument("out", help="output dir (cooccur/pagerank/triangles)")
    p_gs.add_argument("--iterations", type=int, default=3)
    p_gs.add_argument("--k-core", type=int, default=0, dest="k_core",
                      help="also write the k-core node set (0 = off)")
    p_gs.add_argument("--landmarks", default=None,
                      help="comma-separated entity IRIs: also write "
                           "BFS distances from each")
    p_gs.add_argument("--cpus", default="4")
    args = ap.parse_args(argv)

    # argparse choices can't express the cross-field constraint: exact-mode
    # decontamination has no pair artifact, so reject up front instead of
    # letting dedup.decontaminate raise a mid-job ValueError traceback
    if (args.cmd == "decontaminate" and args.mode == "pairs"
            and not args.fuzzy):
        ap.error("--mode pairs requires --fuzzy")

    if args.cmd in ("dedup", "dedupindex", "annindex", "annquery",
                    "decontaminate", "sessionize", "mediameta",
                    "graphstats", "aliases"):
        return _spark_dataop(args)

    with open(args.source) as f:
        text = f.read()
    quads = smart_parse(text, _sniff(args.source, args.in_fmt))
    model = LocalModel(quads)

    if args.cmd == "transform":
        ppl = load_rulespec(args.rulespec)
        model = ppl.run(input_model=model)

    out = sys.stdout if args.out == "-" else open(args.out, "w")
    try:
        smart_write(model, args.out_fmt, out)
    finally:
        if out is not sys.stdout:
            out.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
