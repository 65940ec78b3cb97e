"""Incremental entity resolution: resolve a DELTA of new web pages against
an already-clustered corpus without re-scoring the corpus.

At 10^12 documents a full re-run per crawl batch is not an option: the
quadratic stages (pair generation, scoring) must touch only pairs that
involve at least one NEW record, and clustering must not rebuild the
whole component graph. This module provides exactly that asymmetry:

- **normalize**: only the delta is normalized (row-local, linear in delta).
- **signatures**: with stored token-DF state (``existing_token_df`` +
  ``existing_n_records`` + ``existing_signatures``), document frequencies
  are MERGED (a vocab-scale outer join of the stored (token, df) table
  with delta counts) instead of re-aggregated over the union, and
  signatures are rebuilt ONLY for the delta plus the old records holding a
  token whose distinctive/rank status changed under the new counts (a
  narrow ``arrays_overlap`` scan -- no full-union explode, no corpus-wide
  groupBy). Byte-identical to the full recompute by the classification
  law in :func:`incremental_signatures`. Without state, falls back to
  recomputing over the union (linear, the r5 behavior).
- **pairs**: an asymmetric key join -- capped blocking keys of NEW records
  against capped keys of ALL records -- yields exactly the pairs touching
  the delta. Old-old pairs are never generated (they were scored when the
  old corpus was resolved). Exact-duplicate stars are restricted to hash
  groups containing a new record.
- **scoring**: identical law to the batch stage (same features, same
  scorer) over the delta-touching pairs only.
- **clustering**: connected components over the NEW accepted edges with
  every existing cluster CONTRACTED to its root node. Because the batch
  convention is cluster_id = min member url, the contracted node IS the
  min of its members, so min-propagation over the contracted graph yields
  the same roots as batch CC over the full edge set (old edges union new
  edges): CC(E_old + E_new) == expand(CC(contract(CC(E_old)) + E_new)).
  CC cost is O(|delta edges|), independent of corpus size; untouched old
  clusters never enter the loop.

Equivalence caveat (documented, tested): the corpus-relative DF cutoff can
make a token distinctive in the union that was not distinctive in the old
corpus alone, so a full batch re-run may generate an old-old candidate
pair the incremental path deliberately skips. On corpora whose token-DF
profile is stable under growth (the realistic crawl case, and the test
fixtures) the cluster partitions are identical.

Reference parity: crocodile's backend processes tables incrementally --
new rows are queued and resolved against the existing cache/cell state
(backend/app/services/result_sync.py, crocodile/crocodile.py ML_TABLE
update loop); this operator is the Spark-native, set-at-a-time form.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crocodile_spark.config import PipelineConfig
from crocodile_spark.operators.blocking import (
    blocking_keys,
    cap_blocks,
    exact_dup_pairs,
    mention_df_threshold,
    mention_signatures,
    signatures_from_distinctive,
    static_keys,
    token_document_frequencies,
    token_keys,
)
from crocodile_spark.operators.clustering import connected_components
from crocodile_spark.operators.normalize_stage import normalize_pages
from crocodile_spark.operators.scoring import score


@dataclass
class IncrementalOutput:
    delta_records: DataFrame  # normalized new records
    pairs: DataFrame          # delta-touching candidate pairs only
    scored: DataFrame         # scored delta-touching pairs
    clusters: DataFrame       # FULL updated assignment (url, cluster_id)
    signatures: DataFrame | None = None  # union signature table (persisted)
    stage_stats: dict = field(default_factory=dict)

    def unpersist(self) -> None:
        """Release the frames :func:`incremental_er` persisted (delta,
        signatures, pairs, scored). Lifetime contract (ADVICE r5): the
        persists live until the caller either calls this or stops the
        session -- a long-lived session invoking the operator repeatedly
        (gate + bench in one SparkSession) must call it after the
        clusters frame is materialized, or cached union-signature blocks
        accumulate across invocations."""
        frames = [self.delta_records, self.signatures, self.pairs, self.scored]
        # state-path aux frames (incremental_signatures persists the
        # affected-url set + rebuilt slice and rides them on the union)
        frames.extend(getattr(self.signatures, "_inc_persisted", ()))
        for df in frames:
            if df is not None:
                try:
                    df.unpersist()
                except Exception:
                    pass


def incremental_signatures(
    existing_records: DataFrame,
    existing_signatures: DataFrame,
    existing_token_df: DataFrame,
    existing_n_records: int,
    delta: DataFrame,
    n_delta: int,
    cfg: PipelineConfig,
    changed_collect_cap: int = 20_000,
) -> DataFrame | None:
    """Union signature table from stored state, byte-identical to
    ``mention_signatures(old union delta)`` -- without touching the old
    corpus beyond two narrow scans.

    The signature law depends on corpus state ONLY through (token -> df)
    and the relative cutoff c(N). Merging delta counts into the stored DF
    table (vocab-scale outer join) reproduces the union's (token, df)
    exactly. Document frequencies only GROW (the delta adds documents),
    which makes the set of old records whose signature can change exactly
    classifiable -- and far smaller than "holders of any df-changed
    token" (the r6-draft law, which collapsed to full recompute on
    realistic corpora where every touched entity's name tokens change
    df):

      * FLIP tokens -- signature-membership or block-eligibility changed:
        ``df_old <= c_old`` differs from ``df_new <= c_new`` (got hot in
        the delta, or the growing cutoff newly admits it), or df crossed
        ``max_block_size`` while distinctive. Every holder rebuilds.
        Under a stable DF profile these are tokens near the two
        boundaries -- a small set, collected driver-side (bounded by
        ``changed_collect_cap``, fallback to full recompute past it) and
        applied as a narrow ``arrays_overlap`` literal over the old
        records (a broadcast bloom filter at 10^12 docs).
      * RANK tokens -- distinctive on both sides, df changed, no flip.
        Because df never decreases, such a token can only move LATER in
        the (df, token) rarity order: it can fall OUT of a kept set but
        never enter one. So it affects exactly the records where the
        k-rarest truncation is active (stored ``size(sig_tokens) == k``)
        AND the token is currently IN the kept set. Those records are
        found by a JOIN of the stored signatures' exploded sig_tokens
        against the rank-token set -- no driver collect, no literal, and
        on corpora where few records exceed k distinctive tokens the
        affected set is ~empty even when millions of dfs moved.

    Tokens absent from the old corpus only affect delta records, which
    are rebuilt unconditionally. Everything else keeps its stored
    signature verbatim.
    """
    c_old = mention_df_threshold(cfg, existing_n_records)
    c_new = mention_df_threshold(cfg, existing_n_records + n_delta)
    B = cfg.max_block_size
    delta_df = token_document_frequencies(delta, cfg)
    merged = (
        existing_token_df.select("token", F.col("df").alias("df_old"))
        .join(
            delta_df.select("token", F.col("df").alias("df_delta")),
            "token",
            "full_outer",
        )
        .select(
            "token",
            (
                F.coalesce("df_old", F.lit(0)) + F.coalesce("df_delta", F.lit(0))
            ).alias("df"),
            "df_old",
        )
    )
    old_distinct = F.col("df_old") <= F.lit(c_old)
    new_distinct = F.col("df") <= F.lit(c_new)
    base_changed = merged.where(
        F.col("df_old").isNotNull()
        & (old_distinct | new_distinct)
        & (
            (old_distinct != new_distinct)
            | (F.col("df") != F.col("df_old"))
        )
    )
    block_flip = (F.col("df_old") <= F.lit(B)) != (F.col("df") <= F.lit(B))
    is_flip = (old_distinct != new_distinct) | block_flip
    flips = base_changed.where(is_flip).select("token")
    ranks = base_changed.where(~is_flip).select("token")

    flip_rows = [r["token"] for r in flips.limit(changed_collect_cap + 1).collect()]
    if len(flip_rows) > changed_collect_cap:
        return None
    flip_lit = F.array(*[F.lit(t) for t in flip_rows]).cast("array<string>")

    flip_urls = existing_records.select("url").where(
        F.arrays_overlap(F.col("tokens"), flip_lit)
    )
    rank_urls = (
        existing_signatures.where(
            F.size("sig_tokens") >= F.lit(cfg.sig_max_tokens)
        )
        .select("url", F.explode("sig_tokens").alias("token"))
        .join(ranks, "token", "semi")
        .select("url")
    )
    affected_urls = flip_urls.union(rank_urls).distinct().persist()
    affected_urls.count()
    affected_old = existing_records.select(*delta.columns).join(
        affected_urls, "url", "semi"
    )
    rebuild = affected_old.unionByName(delta)
    tok = rebuild.select("url", F.explode("tokens").alias("token")).where(
        F.length("token") >= cfg.min_token_length
    )
    rare = merged.where(F.col("df") <= F.lit(c_new)).select("token", "df")
    dist = tok.join(rare, "token", "inner").select("url", "token", "df")
    rebuilt = signatures_from_distinctive(rebuild, dist, cfg).persist()
    rebuilt.count()

    sig_cols = rebuilt.columns
    kept = existing_signatures.select(*sig_cols).join(
        affected_urls, "url", "left_anti"
    )
    # Only the DELTA-SCALE pieces are materialized (affected_urls: a tiny
    # url set; rebuilt: delta + affected rows). The union is returned
    # LAZY: every downstream consumer then re-derives it as (cached
    # stored-signature scan, broadcast anti-join on affected_urls) plus a
    # cached rebuilt scan -- re-materializing all N union rows into a new
    # cache block (the r6-draft behavior) cost ~22 s at 529k for data
    # that already sits in the stored cache. The persisted pieces ride on
    # the returned frame for IncrementalOutput.unpersist().
    out = kept.unionByName(rebuilt)
    out._inc_persisted = (affected_urls, rebuilt)
    return out


def delta_pairs(
    sigs: DataFrame,
    new_urls: DataFrame,
    cfg: PipelineConfig,
    existing_static_keys: DataFrame | None = None,
) -> DataFrame:
    """Candidate pairs touching at least one new record.

    Asymmetric generation: the left side of the key equi-join is restricted
    to keys of NEW records (semi join -- no data widening), the right side
    is all capped keys. new-new pairs appear in both orientations and
    new-old pairs in one; least/greatest + dropDuplicates canonicalizes.
    The join is delta_keys x block members, so work is
    O(|delta| * avg_block_size), not O(corpus^2).

    With ``existing_static_keys`` (the stored (url, key) host+MinHash rows
    of the already-resolved records), the MinHash shingling pass runs over
    the DELTA only; the corpus-DF-dependent ``tok:`` family is still
    recomputed over the union (a token-level aggregate, linear but far
    cheaper than shingling). The resulting key set is BYTE-IDENTICAL to
    the full recompute -- static keys are per-record constants -- so pair
    generation and the final partition are unchanged.
    """
    if existing_static_keys is None:
        keys = blocking_keys(sigs, cfg)
    else:
        delta_sigs = sigs.join(new_urls, "url", "semi")
        delta_static = static_keys(delta_sigs, cfg)
        keys = (
            token_keys(sigs)
            .union(existing_static_keys.select("url", "key"))
            .union(delta_static)
        )
        # NOT restricted to delta-held keys: pre-filtering the key
        # universe by a semi-join on the delta key set (an equivalent
        # law -- kept keys retain complete member sets, so cap counts
        # are identical) was A/B-measured at 529k/5% (2x2 alternating)
        # and lost on means (pairs stage 107/129 s restricted vs
        # 56/115 s not, heavy host-noise overlap): deriving the delta
        # key set costs two extra full-union signature scans, which at
        # best cancels the cap-shuffle reduction. Dropped for plan
        # simplicity. See BENCH.md round 6.
    capped = cap_blocks(keys, cfg)
    new_keys = capped.join(new_urls, "url", "semi")
    cand = (
        new_keys.select(F.col("url").alias("u1"), "key")
        .join(capped.select(F.col("url").alias("u2"), "key"), "key")
        .where(F.col("u1") != F.col("u2"))
        .select(
            F.least("u1", "u2").alias("url_a"),
            F.greatest("u1", "u2").alias("url_b"),
        )
    )
    # exact-duplicate stars, restricted to hash groups that gained a member
    # AND to edges touching a new record: old-old members of such a group
    # are already connected in the existing clusters (exact dups force
    # is_edge in the batch run), so re-emitting their edges is pure waste
    # and would break the no-old-old-pair contract
    delta_hashes = (
        sigs.join(new_urls, "url", "semi").select("row_hash").distinct()
    )
    dup = exact_dup_pairs(sigs.join(delta_hashes, "row_hash", "semi"))
    dup = (
        dup.join(new_urls.withColumnRenamed("url", "url_a"), "url_a", "semi")
        .select("url_a", "url_b")
        .union(
            dup.join(
                new_urls.withColumnRenamed("url", "url_b"), "url_b", "semi"
            ).select("url_a", "url_b")
        )
    )
    return cand.union(dup).dropDuplicates(["url_a", "url_b"])


def merge_clusters(
    existing_clusters: DataFrame,
    new_urls: DataFrame,
    new_edges: DataFrame,
    max_iterations: int = 20,
) -> DataFrame:
    """Updated (url, cluster_id) for old + new records.

    Contract: each edge endpoint is replaced by its representative -- the
    existing cluster root for old records, the url itself for new ones.
    Self-loops after contraction (both endpoints already in one cluster)
    drop out in CC's canonicalization. The contracted graph has one node
    per TOUCHED old cluster plus the connected new records; everything
    else is carried over unchanged by the left joins below.
    """
    rep_a = existing_clusters.select(
        F.col("url").alias("url_a"), F.col("cluster_id").alias("rep_a")
    )
    rep_b = existing_clusters.select(
        F.col("url").alias("url_b"), F.col("cluster_id").alias("rep_b")
    )
    contracted = (
        new_edges.join(rep_a, "url_a", "left")
        .join(rep_b, "url_b", "left")
        .select(
            F.coalesce("rep_a", "url_a").alias("u"),
            F.coalesce("rep_b", "url_b").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
    )
    cc = connected_components(contracted, max_iterations)

    # old records: re-root members of touched clusters, keep the rest
    root_update = cc.select(
        F.col("node").alias("cluster_id"), F.col("cluster_id").alias("new_cid")
    )
    old_assign = (
        existing_clusters.join(root_update, "cluster_id", "left")
        .select(
            "url",
            F.coalesce("new_cid", "cluster_id").alias("cluster_id"),
        )
    )
    # new records: direct CC assignment, singletons root themselves
    new_assign = (
        new_urls.join(cc.withColumnRenamed("node", "url"), "url", "left")
        .select("url", F.coalesce("cluster_id", "url").alias("cluster_id"))
    )
    return old_assign.unionByName(new_assign)


def incremental_er(
    spark: SparkSession,
    existing_records: DataFrame,
    existing_clusters: DataFrame,
    new_pages: DataFrame,
    cfg: PipelineConfig | None = None,
    use_html: bool = True,
    existing_static_keys: DataFrame | None = None,
    existing_signatures: DataFrame | None = None,
    existing_token_df: DataFrame | None = None,
    existing_n_records: int | None = None,
) -> IncrementalOutput:
    """Resolve ``new_pages`` against an existing resolution.

    ``existing_records`` is the normalized records table of the already
    resolved corpus (url, tokens, row_hash, host, text_norm, ...);
    ``existing_clusters`` its (url, cluster_id) assignment with the batch
    convention cluster_id = min member url. ``existing_static_keys``
    (optional): the stored host+MinHash (url, key) rows of the resolved
    corpus -- pass ``static_keys(base_signatures, cfg)`` persisted at base
    resolution time to skip re-shingling the corpus; the key set (and
    therefore the output) is identical either way.

    ``existing_signatures`` + ``existing_token_df`` +
    ``existing_n_records`` (r6, pass all three): the stored signature
    table, its (token, df) aggregate
    (``blocking.token_document_frequencies`` over the base records), and
    the base record count. With them the union signature table comes from
    :func:`incremental_signatures` -- delta counts merged into the stored
    DF table, signatures rebuilt only for delta + status-changed records
    -- removing the last corpus-linear aggregation from the delta path.
    Output is byte-identical with or without state.
    """
    cfg = cfg or PipelineConfig()
    delta = normalize_pages(new_pages, use_html)
    # re-crawl guard: a url already in the corpus must not enter the union
    # twice (duplicate rows would merge both versions' tokens under the
    # signature groupBy, fan out every scored pair touching the url, and
    # emit the url from both the old and new assignment below). First
    # version wins -- re-crawl UPDATES are an upsert into the records
    # table (J2 merge law), out of this operator's scope.
    delta = delta.join(
        existing_records.select("url"), "url", "left_anti"
    ).persist()
    n_delta = delta.count()
    new_urls = delta.select("url")

    sigs = None
    if (
        existing_signatures is not None
        and existing_token_df is not None
        and existing_n_records is not None
    ):
        sigs = incremental_signatures(
            existing_records,
            existing_signatures,
            existing_token_df,
            existing_n_records,
            delta,
            n_delta,
            cfg,
        )
    if sigs is None:
        union_records = existing_records.select(*delta.columns).unionByName(delta)
        sigs = mention_signatures(union_records, cfg)
    # eager (BOTH paths): delta_pairs + score scan sigs ~7x between them
    # (key families, dup stars, two feature joins); populating the cache
    # first prevents per-branch lineage recompute (see pipeline.py
    # non-checkpoint path, r6). Measured at 529k/5%: leaving the
    # state-path union LAZY (each consumer re-deriving the kept-side
    # anti-join from the stored cache) costs 220 s vs 98 s with one
    # eager 22 s materialization -- consumer count beats per-scan cost.
    sigs = sigs.persist()
    sigs.count()

    pairs = delta_pairs(sigs, new_urls, cfg, existing_static_keys).persist()
    scored = score(pairs, sigs, cfg).persist()
    new_edges = scored.where(F.col("is_edge")).select("url_a", "url_b")

    clusters = merge_clusters(
        existing_clusters, new_urls, new_edges, cfg.max_cc_iterations
    )
    return IncrementalOutput(delta, pairs, scored, clusters, signatures=sigs)
