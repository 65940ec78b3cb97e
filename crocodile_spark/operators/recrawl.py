"""Re-crawl upsert: resolve a crawl batch that REVISITS known urls.

:func:`incremental_er` deliberately scopes re-crawls out ("first version
wins") -- correct for pure-growth deltas, but at re-crawl cadence the
common case is a batch mixing brand-new urls, byte-identical re-fetches,
and urls whose content CHANGED. This operator implements full upsert
semantics -- updated url == delete old version + insert new version --
while touching only delta-scale state:

- **classify** (one corpus scan, no corpus shuffle): normalized batch
  rows split against the stored records by (url, row_hash) into NEW
  (url unseen), UNCHANGED (url seen, same row hash -- dropped, a no-op
  re-fetch), and UPDATED (url seen, hash differs).
- **remove**: the old versions of updated urls leave the corpus. Token
  document frequencies are SUBTRACTED in the stored-state DF merge
  (:func:`incremental_signatures` ``removed_records``); any token whose
  df decreased while distinctive is conservatively a FLIP (the grow-only
  rank argument does not survive removals), so every holder's signature
  is rebuilt -- a delta-scale set, since decreases only come from the
  removed records' own tokens.
- **dissolve**: clusters containing an updated url cannot be trusted --
  removing a record's edges can split its component, and the cluster id
  (min member url) may itself be the departing url. Affected clusters
  are dissolved: their surviving members become free nodes re-clustered
  from their regenerated edges, everything else is carried verbatim.
- **pair + score**: :func:`delta_pairs` with ``seed_urls`` = delta
  (new + updated versions) + dissolved members + signature-rebuilt old
  records. A record whose stored signature row is byte-identical
  contributes identical features to any pair of unchanged records, so
  its old accept/reject decisions stand -- seeding exactly the changed
  rows plus the dissolved members reproduces the full re-run's decisions
  under the same stable-DF-profile caveat documented on
  :func:`incremental_er` (old-old blocks created purely by cutoff drift
  are skipped there too). With ``existing_edges`` (edge-retaining
  repair), dissolved members leave the seed entirely: their surviving
  old edges stand in for re-scoring, and only delta-touched pairs are
  regenerated -- O(delta) repair (see the function docstring).
- **cluster**: :func:`merge_clusters` over the carried assignment with
  the dissolved members + delta as fresh nodes; min-url convention makes
  the contraction law line up unchanged.

Cost: O(|batch| + |affected cluster members| + |rebuilt signatures|) on
top of scan-only passes over the stored tables -- no corpus-scale
shuffle, the same posture as the delta path it extends.

Equivalence boundary, measured (scripts/recrawl_drift_diag.py at 210k
and 529k; BENCH.md r7): the upsert generates EVERY edge the full re-run
accepts (zero missed, all key families, both modes). Where partitions
diverge at scale (~1.7% of urls at 529k/21%-batch), it is the full
re-run that drops base-validated old-old edges -- corpus growth pushes
their blocks over the cap, so it never regenerates pairs the base had
scored and accepted -- making the incremental result the
quality-favoring superset (F1 vs gold identical to 4 decimals).

Reference parity: crocodile re-processes a modified document by deleting
its cached candidates and re-queuing the row (backend
result_sync/crocodile.py update loop); this is the set-at-a-time form
with explicit cluster repair.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from crocodile_spark.config import PipelineConfig
from crocodile_spark.operators.blocking import mention_signatures
from crocodile_spark.operators.incremental_er import (
    broadcast_if_small,
    delta_pairs,
    incremental_signatures,
    merge_clusters,
)
from crocodile_spark.operators.normalize_stage import normalize_pages
from crocodile_spark.operators.scoring import score


@dataclass
class RecrawlOutput:
    delta_records: DataFrame    # normalized rows ENTERING the corpus (new + updated versions)
    updated_urls: DataFrame     # urls whose old version left the corpus
    unchanged_urls: DataFrame   # byte-identical re-fetches (dropped, no state change)
    pairs: DataFrame            # regenerated candidate pairs (seed-touching)
    scored: DataFrame           # scored pairs
    clusters: DataFrame         # FULL updated (url, cluster_id) assignment
    signatures: DataFrame | None = None
    n_records: int | None = None  # corpus size after the upsert
    edges: DataFrame | None = None  # updated accepted-edge state (when existing_edges given)
    stage_stats: dict = field(default_factory=dict)
    # internal batch-scale frames persisted by recrawl_upsert (norm,
    # stored_hits) that no output field exposes -- tracked so unpersist()
    # releases them (r8, ADVICE: a per-batch loop otherwise accumulates
    # cached blocks across invocations)
    aux_persisted: tuple = ()

    def unpersist(self) -> None:
        """Release persisted frames (same lifetime contract as
        :class:`IncrementalOutput`); checkpointed frames are freed by the
        ContextCleaner."""
        frames = [self.delta_records, self.updated_urls, self.signatures]
        frames.extend(self.aux_persisted)
        frames.extend(getattr(self.signatures, "_inc_persisted", ()))
        for df in frames:
            if df is not None:
                try:
                    df.unpersist()
                except Exception:
                    pass


def recrawl_upsert(
    spark: SparkSession,
    existing_records: DataFrame,
    existing_clusters: DataFrame,
    pages: DataFrame,
    cfg: PipelineConfig | None = None,
    use_html: bool = True,
    existing_static_keys: DataFrame | None = None,
    existing_signatures: DataFrame | None = None,
    existing_token_df: DataFrame | None = None,
    existing_n_records: int | None = None,
    existing_edges: DataFrame | None = None,
) -> RecrawlOutput:
    """Upsert a re-crawl batch into an existing resolution.

    State arguments mirror :func:`incremental_er`; with the full stored
    state (signatures + token_df + n_records) the signature rebuild is
    the O(delta) merge law with removal support, otherwise signatures
    recompute over the survivor union (linear fallback).

    ``existing_edges`` (r7, edge-retaining repair): the base resolution's
    accepted edges (``base.scored.where("is_edge").select(url_a,url_b)``).
    Without them, an updated url dissolves its WHOLE cluster into the
    pair-generation seed -- measured at 111k with ~5% scattered updates,
    that rescored 63% of the full pair volume (BENCH.md r7). With them,
    only pairs touching a RE-DECIDED url (the delta + signature-rebuilt
    old records) are regenerated; a dissolved member whose own signature
    is byte-identical keeps its surviving old edges (those not incident to
    a re-decided url -- its old accept/reject decisions stand, the same
    stable-DF-profile law as :func:`incremental_er`'s old-old contract),
    and those edges re-enter clustering alongside the fresh ones. Repair
    cost drops from O(affected-cluster members x block size) to
    O(delta-touched pairs). The output ``edges`` carries the updated edge
    state for the next batch: old edges minus re-decided incidents, plus
    newly accepted -- maintain it exactly like signatures/token_df.
    """
    cfg = cfg or PipelineConfig()
    norm = normalize_pages(pages, use_html)
    # one row per url per batch, deterministic winner (max row_hash):
    # a crawl batch can legitimately fetch a url twice
    w = Window.partitionBy("url").orderBy(F.col("row_hash").desc())
    norm = (
        norm.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
        .persist()
    )
    n_batch = norm.count()

    # -- classify: one scan of the stored records, batch side broadcast --
    batch_urls = broadcast_if_small(norm.select("url"), "url", n_batch, cfg)
    stored_hits = (
        existing_records.select("url", F.col("row_hash").alias("old_hash"))
        .join(batch_urls, "url", "semi")
        .persist()
    )
    stored_hits.count()
    cls = norm.join(stored_hits, "url", "left")
    unchanged_urls = cls.where(F.col("old_hash") == F.col("row_hash")).select("url")
    delta = (
        cls.where(F.col("old_hash").isNull() | (F.col("old_hash") != F.col("row_hash")))
        .drop("old_hash")
        .persist()
    )
    n_delta = delta.count()
    updated_urls = (
        cls.where(F.col("old_hash").isNotNull() & (F.col("old_hash") != F.col("row_hash")))
        .select("url")
        .persist()
    )
    n_updated = updated_urls.count()

    # -- remove old versions + dissolve their clusters -------------------
    if n_updated:
        upd = broadcast_if_small(updated_urls, "url", n_updated, cfg)
        removed = existing_records.join(upd, "url", "semi")
        base_records = existing_records.join(upd, "url", "left_anti")
        affected_cids = (
            existing_clusters.join(upd, "url", "semi")
            .select("cluster_id")
            .distinct()
            .localCheckpoint(eager=True)
        )
        cid = broadcast_if_small(
            affected_cids, "cluster_id", affected_cids.count(), cfg
        )
        members = (
            existing_clusters.join(cid, "cluster_id", "semi")
            .select("url")
            .join(upd, "url", "left_anti")
        )
        base_clusters = existing_clusters.join(cid, "cluster_id", "left_anti")
        stored_keys = (
            existing_static_keys.join(upd, "url", "left_anti")
            if existing_static_keys is not None
            else None
        )
    else:
        removed = None
        base_records = existing_records
        members = spark.createDataFrame([], "url string")
        base_clusters = existing_clusters
        stored_keys = existing_static_keys

    # -- signatures: merge law with removal support ----------------------
    sigs = None
    if (
        existing_signatures is not None
        and existing_token_df is not None
        and existing_n_records is not None
    ):
        sigs = incremental_signatures(
            base_records,
            existing_signatures,
            existing_token_df,
            existing_n_records,
            delta,
            n_delta,
            cfg,
            removed_records=removed,
            n_removed=n_updated,
        )
    if sigs is None:
        union_records = base_records.select(*delta.columns).unionByName(delta)
        sigs = mention_signatures(union_records, cfg)
    # Collapse the signature LOGICAL plan to a scan leaf (the r6
    # plan-depth idiom, see incremental_er.py): delta_pairs + score below
    # embed the sigs subtree 5-7x (key families, seed joins, dup stars,
    # feature joins), and here that subtree nests the removal-aware DF
    # merge + the dissolution anti-joins ON TOP of the caller's stored
    # plans -- deep enough that merely FORMATTING the plan string for the
    # SQL-UI event OOMed a loaded driver heap (seen in-suite after 14
    # modules of cached state; passes alone). Execute WITH AQE via
    # persist+count, checkpoint the cached rows (a cheap cache scan),
    # release the interim cache.
    aux = getattr(sigs, "_inc_persisted", None)
    sigs_cached = sigs.persist()
    sigs_cached.count()
    sigs = sigs_cached.localCheckpoint(eager=True)
    sigs_cached.unpersist()
    if aux is not None:
        # re-attach the merge-law persisted frames to the checkpointed
        # frame so RecrawlOutput.unpersist() still releases them
        sigs._inc_persisted = aux

    # -- seeds: fresh-assignment urls + signature-rebuilt old records ----
    new_urls = delta.select("url")
    fresh_urls = new_urls.unionByName(members).distinct().localCheckpoint(eager=True)
    # Edge-retaining repair needs the merge law's rebuilt-record set (aux)
    # to know exactly which old records' decisions are stale; without it
    # (linear sig fallback) dissolve-and-rescore stays the safe path.
    retain = existing_edges is not None and n_updated > 0 and aux is not None
    # the SEED is every url whose pair decisions are re-derived this run:
    # retaining mode excludes untouched dissolved members (their old
    # edges stand in for re-scoring), dissolve mode includes them
    seed = new_urls if retain else fresh_urls
    if aux is not None:
        # affected_urls from the signature merge (includes removed urls,
        # harmless: they have no signature row, so they key nothing)
        seed = seed.unionByName(aux[0].select("url")).distinct()
    seed = seed.localCheckpoint(eager=True)

    pairs_cached = delta_pairs(
        sigs, new_urls, cfg, stored_keys, seed_urls=seed
    ).persist()
    pairs_cached.count()
    pairs = pairs_cached.localCheckpoint(eager=True)
    pairs_cached.unpersist()

    touched_urls = (
        pairs.select(F.col("url_a").alias("url"))
        .union(pairs.select(F.col("url_b").alias("url")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    touched_urls = broadcast_if_small(touched_urls, "url", touched_urls.count(), cfg)
    scored_cached = score(pairs, sigs.join(touched_urls, "url", "semi"), cfg).persist()
    scored_cached.count()
    scored = scored_cached.localCheckpoint(eager=True)
    scored_cached.unpersist()
    new_edges = scored.where(F.col("is_edge")).select("url_a", "url_b")

    out_edges = None
    if existing_edges is not None:
        # every pair touching a seed url was scored fresh this run, so old
        # edges incident to the seed are superseded (updated urls are in
        # the delta, hence in the seed); both orientations covered. The
        # seed is delta-scale and checkpointed -- gate it onto the
        # broadcast path so the anti joins FILTER the edge scan.
        seed_b = broadcast_if_small(seed, "url", seed.count(), cfg)
        kept_edges = existing_edges.join(
            seed_b.withColumnRenamed("url", "url_a"), "url_a", "left_anti"
        ).join(seed_b.withColumnRenamed("url", "url_b"), "url_b", "left_anti")
        out_edges = kept_edges.select("url_a", "url_b").unionByName(new_edges)
        if retain:
            # surviving edges inside the dissolved scope re-enter
            # clustering: accepted edges never span clusters, so a
            # one-sided member semi captures the affected-component set
            aff_members = (
                existing_clusters.join(cid, "cluster_id", "semi").select("url")
            )
            surviving = kept_edges.join(
                aff_members.withColumnRenamed("url", "url_a"), "url_a", "semi"
            ).select("url_a", "url_b")
            new_edges = new_edges.unionByName(surviving)

    clusters = merge_clusters(
        base_clusters, fresh_urls, new_edges, cfg.max_cc_iterations
    )
    n_after = (
        existing_n_records - n_updated + n_delta
        if existing_n_records is not None
        else None
    )
    return RecrawlOutput(
        delta_records=delta,
        updated_urls=updated_urls,
        unchanged_urls=unchanged_urls,
        pairs=pairs,
        scored=scored,
        clusters=clusters,
        signatures=sigs,
        n_records=n_after,
        edges=out_edges,
        aux_persisted=(norm, stored_hits),
        stage_stats={
            "n_batch": n_batch,
            "n_new_or_updated": n_delta,
            "n_updated": n_updated,
            "edge_retaining": bool(retain),
        },
    )
