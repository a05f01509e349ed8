"""The end-to-end transcript → knowledge-graph job, checkpointed & resumable.

Stage graph (north rule):

    transcripts ─┬─ turn_order (slim window rank — text never rides it)
                 └─ turns (projection) ─┬─ conversation_links ──┐
                                        └─ turn_mentions ─ link_entities ─┬─ mention_links ──┤──▶ graph table
                                                                          ├─ entity_links ───┘     + adjacency edges
                                                                          └─ entity_mention_counts (metrics table)

Checkpoint/lineage: every stage writes Parquet under <workdir>/<stage>/ and
appends a manifest row (stage, status, rows, input_fingerprint, wall_s, ts).
A re-run skips stages whose manifest row is ``ok`` AND whose input
fingerprint is unchanged — a killed job resumes mid-extraction.  The
manifest doubles as the counter-metrics channel.

Partitioning: stage outputs are written partitioned by ``pt = pmod(
xxhash64(conv_id), n_buckets)`` so (a) downstream stages get partition
pruning for per-conversation access, (b) resume granularity is per
partition (a stage's write is atomic per partition via Parquet committer).
At 10^12-turn scale the same layout maps to Iceberg partition transforms
(bucket(conv_id)); this sandbox has no Iceberg runtime, so the lineage
manifest stands in for Iceberg snapshot metadata.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from versa_spark.kg import canonicalize, extract, linking, transcripts as T

MANIFEST = "_manifest.jsonl"


class KGJob:
    """``write_distribution``:

    * ``'auto'`` (default) — stages WITHOUT the fat ``text`` column
      repartition by ``pt`` before the partitioned write (the
      Iceberg ``write.distribution-mode=hash`` equivalent): without it
      every mapper writes into every bucket directory and a stage emits
      M×B files — at 10^12 turns that is 10^9+ tiny files, a metadata
      catastrophe.  The ``text``-carrying turns stage is exempt so the
      fat column still never rides an exchange: with the north rule's
      input (an Iceberg table bucketed by conv_id) each input split
      already holds exactly one bucket, so its mapper-aligned write
      produces one file per bucket naturally — alignment, not shuffle,
      is the production answer for the fat stage.
    * ``'none'`` — mapper-aligned writes everywhere (the pre-round-3
      behavior; fine at fixture scale)."""

    def __init__(self, spark: SparkSession, workdir: str,
                 n_buckets: int = 32, salt: int = 16,
                 write_distribution: str = "auto",
                 dictionary: DataFrame | None = None,
                 detect: str = "lexicon",
                 detect_opts: dict | None = None):
        if detect not in ("lexicon", "dictionary"):
            raise ValueError(f"unknown detect {detect!r} "
                             "(use 'lexicon' or 'dictionary')")
        if detect == "dictionary" and dictionary is None:
            raise ValueError("detect='dictionary' requires a dictionary")
        self.spark = spark
        self.workdir = workdir
        self.n_buckets = n_buckets
        self.salt = salt
        self.write_distribution = write_distribution
        # detect='dictionary' routes the mentions stage through the
        # token-n-gram gazetteer join (extract.turn_mentions_bigdict) —
        # detection+linking fuse into one map-side join and the linked
        # view becomes a pure projection of the mentions checkpoint.
        # With detect='lexicon' an explicit dictionary still drives the
        # LINKING stage (the build_graph semantics).  The dictionary's
        # CONTENT is part of the job's input: run() folds an
        # order-insensitive content digest into the effective stage
        # fingerprint, so a resume after a dictionary change recomputes
        # instead of silently serving stale stages.
        self.dictionary = dictionary
        self.detect = detect
        self.detect_opts = dict(detect_opts or {})
        os.makedirs(workdir, exist_ok=True)
        self.metrics: dict[str, dict] = {}

    def _dictionary_digest(self) -> str:
        """Cheap order-insensitive content digest of the dictionary: row
        count + sum of row hashes over one narrow scan.  Collision-safe
        enough for change DETECTION (a resume-invalidation signal, not
        an identity)."""
        cols = [F.col(c) for c in self.dictionary.columns]
        # decimal sum: a long sum of 64-bit hashes overflows under ANSI
        row = self.dictionary.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h")
        ).first()
        return f"{row['n']}:{row['h']}"

    # -- manifest / lineage ------------------------------------------------

    def _manifest_path(self) -> str:
        return os.path.join(self.workdir, MANIFEST)

    def _read_manifest(self) -> dict[str, dict]:
        out = {}
        try:
            with open(self._manifest_path()) as f:
                for line in f:
                    rec = json.loads(line)
                    out[rec["stage"]] = rec
        except FileNotFoundError:
            pass
        return out

    def _append_manifest(self, rec: dict) -> None:
        with open(self._manifest_path(), "a") as f:
            f.write(json.dumps(rec, separators=(",", ":")) + "\n")

    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.workdir, stage)

    def _run_stage(self, stage: str, input_fingerprint: str,
                   build) -> DataFrame:
        """Run or resume one stage: skip when the manifest has an ``ok``
        row with the same input fingerprint; else (re)compute and commit."""
        path = self._stage_dir(stage)
        prior = self._read_manifest().get(stage)
        if (prior and prior.get("status") == "ok"
                and prior.get("input_fingerprint") == input_fingerprint
                and os.path.isdir(path)):
            self.metrics[stage] = {**prior, "resumed": True}
            reader = self.spark.read
            if prior.get("schema"):
                # manifest-pinned schema: lets a legitimately EMPTY
                # stage (no part files to infer from) resume cleanly
                from pyspark.sql.types import StructType
                reader = reader.schema(
                    StructType.fromJson(json.loads(prior["schema"])))
            return reader.parquet(path)
        t0 = time.time()
        df = build()
        if "conv_id" in df.columns:
            df = df.withColumn(
                "pt", F.pmod(F.xxhash64("conv_id"), F.lit(self.n_buckets)))
            if (self.write_distribution == "auto"
                    and "text" not in df.columns):
                # hash write distribution: one exchange of the slim rows
                # buys B output files instead of M×B (see class docstring)
                df = df.repartition(self.n_buckets, "pt")
            (df.write.mode("overwrite").partitionBy("pt").parquet(path))
        else:
            df.write.mode("overwrite").parquet(path)
        # read back with the WRITER's schema pinned: a legitimately empty
        # stage (e.g. a gazetteer with no hits in this corpus) writes no
        # part files, and schema inference over the bare directory would
        # throw UNABLE_TO_INFER_SCHEMA instead of yielding 0 rows
        out = self.spark.read.schema(df.schema).parquet(path)
        rec = {"stage": stage, "status": "ok", "rows": out.count(),
               "input_fingerprint": input_fingerprint,
               "schema": df.schema.json(),
               "wall_s": round(time.time() - t0, 3), "ts": time.time()}
        self._append_manifest(rec)
        self.metrics[stage] = rec
        return out

    # -- the pipeline --------------------------------------------------

    def run(self, transcripts_df: DataFrame,
            input_fingerprint: str = "default") -> dict[str, DataFrame]:
        fp = input_fingerprint
        if self.dictionary is not None:
            fp = f"{fp}/dict={self._dictionary_digest()}"
        # turns: pure projection (turn IRI), NO window — the rank
        # exchange would shuffle + sort full rows including the fat text
        # column, and no downstream link family consumes turn_rank.  The
        # stable-ordering artifact is its own slim stage instead.
        turns = self._run_stage(
            "turns", fp,
            lambda: T.ordered_turns(transcripts_df, with_rank=False))
        turn_order = self._run_stage(
            "turn_order", fp, lambda: T.turn_order(transcripts_df))
        if self.detect == "dictionary":
            # one fused detect+link join; the checkpointed mentions rows
            # already carry (canonical, entity_iri), so `linked` is a
            # pure PROJECTION of the mentions checkpoint — writing it as
            # its own stage would re-shuffle and duplicate the job's
            # largest output on disk for a constant column
            mentions = self._run_stage(
                "mentions", fp, lambda: extract.turn_mentions_bigdict(
                    turns, self.dictionary, **self.detect_opts))
            linked = mentions.select(
                "conv_id", "turn_idx", "turn_iri", "surface",
                F.lit(True).alias("linked"), "canonical", "entity_iri")
            self.metrics["linked"] = {
                "stage": "linked", "status": "view-of-mentions",
                "rows": self.metrics["mentions"].get("rows"),
                "resumed": self.metrics["mentions"].get("resumed", False)}
        else:
            mentions = self._run_stage(
                "mentions", fp, lambda: extract.turn_mentions(turns))
            link_dict = (self.dictionary if self.dictionary is not None
                         else linking.canonical_dictionary(self.spark))
            linked = self._run_stage(
                "linked", fp, lambda: linking.link_entities(
                    mentions, link_dict))
        graph = self._run_stage(
            "graph", fp, lambda:
            extract.conversation_links(turns)
            .unionByName(canonicalize.mention_links(linked))
            .unionByName(canonicalize.entity_links(linked)))
        edges = self._run_stage(
            "edges", fp, lambda: canonicalize.adjacency_edges(graph))
        entity_stats = self._run_stage(
            "entity_stats", fp, lambda:
            canonicalize.entity_mention_counts(linked, salt=self.salt))
        return {"turns": turns, "turn_order": turn_order,
                "mentions": mentions, "linked": linked,
                "graph": graph, "edges": edges,
                "entity_stats": entity_stats}


def run_kg_job(spark: SparkSession, transcripts_df: DataFrame,
               workdir: str, **kw) -> dict[str, DataFrame]:
    return KGJob(spark, workdir, **kw).run(transcripts_df)
