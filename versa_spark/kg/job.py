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
                 detect: str = "lexicon"):
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
        # stage becomes a pure projection of the mentions checkpoint.
        # NB the dictionary's CONTENT is part of the job's input: callers
        # must fold a dictionary version into input_fingerprint, or a
        # resume after a dictionary change would wrongly skip stages.
        self.dictionary = dictionary
        self.detect = detect
        os.makedirs(workdir, exist_ok=True)
        self.metrics: dict[str, dict] = {}

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
            return self.spark.read.parquet(path)
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
        out = self.spark.read.parquet(path)
        rec = {"stage": stage, "status": "ok", "rows": out.count(),
               "input_fingerprint": input_fingerprint,
               "wall_s": round(time.time() - t0, 3), "ts": time.time()}
        self._append_manifest(rec)
        self.metrics[stage] = rec
        return out

    # -- the pipeline --------------------------------------------------

    def run(self, transcripts_df: DataFrame,
            input_fingerprint: str = "default") -> dict[str, DataFrame]:
        fp = input_fingerprint
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
            # already carry (canonical, entity_iri)
            mentions = self._run_stage(
                "mentions", fp, lambda: extract.turn_mentions_bigdict(
                    turns, self.dictionary))
            linked = self._run_stage(
                "linked", fp, lambda: mentions.select(
                    "conv_id", "turn_idx", "turn_iri", "surface",
                    F.lit(True).alias("linked"), "canonical",
                    "entity_iri"))
        else:
            mentions = self._run_stage(
                "mentions", fp, lambda: extract.turn_mentions(turns))
            linked = self._run_stage(
                "linked", fp, lambda: linking.link_entities(
                    mentions, linking.canonical_dictionary(self.spark)))
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
