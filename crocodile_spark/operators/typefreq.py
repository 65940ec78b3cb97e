"""A1 global type-frequency + X3 typeFreq features + M1/W4 ML re-rank.

A1 law (crocodile/feature.py:159-251): over (optionally sampled) processed
rows, per column and per type-QID, count the rows where the type appears in
ANY of the top-`top_n_for_type_freq` candidates (set-dedup per row), then
normalize by the column's row count -> ratio in [0,1].

X3 law (crocodile/ml.py:137-148): per candidate, the sorted-descending list
of its types' global frequencies, padded with 0.0 to five slots ->
typeFreq1..typeFreq5.

M1 replacement (SURVEY.md 2.9): broadcast logistic scorer over the 19-slot
feature vector (X4 order, crocodile/feature.py:10-30); W4 re-rank = same W2
window ordered by the model score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crocodile_spark.config import PipelineConfig

CELL_KEY = ["client_id", "dataset_name", "table_name", "row_id", "col_id"]
COL_KEY = ["client_id", "dataset_name", "table_name", "col_id"]


def global_type_frequencies(
    ranked: DataFrame, cfg: PipelineConfig, sample: bool = False
) -> DataFrame:
    """A1: (table_name, col_id, type_id) -> freq.

    ``ranked`` is the flat candidates table with ``rank`` and a
    ``types array<struct<id,name>>`` column. Sampling (A2) is seeded hash
    sampling for determinism (the reference's $sample is unseeded).
    """
    df = ranked.where(F.col("rank") <= cfg.top_n_for_type_freq)
    if sample:
        # pmod, not %: Spark % preserves the dividend's sign, so negative
        # xxhash64 values would always pass and inflate the kept fraction.
        df = df.where(
            F.pmod(
                F.xxhash64(F.concat_ws("|", *CELL_KEY), F.lit(cfg.type_freq_sample_seed)),
                F.lit(100),
            )
            < int(cfg.type_freq_sample_fraction * 100)
        )
    row_types = (
        df.select(*CELL_KEY, F.explode("types").alias("t"))
        .select(*CELL_KEY, F.col("t.id").alias("type_id"))
        .distinct()  # set-dedup per row (feature.py:227-236)
    )
    # Feature scope is per (client_id, dataset_name, table_name) in the
    # reference; keying by table_name alone would pool counts across
    # clients/datasets sharing a table name.
    col_key = COL_KEY
    rows_per_col = (
        df.select(*CELL_KEY).distinct().groupBy(*col_key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    counts = row_types.groupBy(*col_key, "type_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    return counts.join(rows_per_col, col_key).select(
        *col_key,
        "type_id",
        (F.col("n") / F.col("n_rows")).alias("freq"),
    )


def attach_type_freq_features(
    ranked: DataFrame, type_freqs: DataFrame, cfg: PipelineConfig
) -> DataFrame:
    """X3: typeFreq1..5 = top-5 descending frequencies of the candidate's
    types in its column, 0.0-padded. The freq table is column-level
    metadata (tiny) -> broadcast join (J8)."""
    exploded = ranked.select(
        *CELL_KEY, "qid", F.explode_outer("types").alias("t")
    ).select(*CELL_KEY, "qid", F.col("t.id").alias("type_id"))
    joined = exploded.join(
        F.broadcast(type_freqs), [*COL_KEY, "type_id"], "left"
    )
    per_cand = joined.groupBy(*CELL_KEY, "qid").agg(
        F.reverse(
            F.array_sort(F.collect_list(F.coalesce(F.col("freq"), F.lit(0.0))))
        ).alias("freqs")
    )
    out = ranked.join(per_cand, [*CELL_KEY, "qid"], "left")
    for i in range(5):
        out = out.withColumn(
            f"typeFreq{i + 1}",
            # try_element_at: ANSI mode errors on out-of-bounds element_at
            F.coalesce(F.try_element_at("freqs", F.lit(i + 1)), F.lit(0.0)),
        )
    return out.drop("freqs")


def feature_vector(df: DataFrame, cfg: PipelineConfig):
    """X4: the ordered 19-slot vector (missing -> 0.0)."""
    return F.array(
        *[
            F.coalesce(F.col(c), F.lit(0.0)).cast("double")
            if c in df.columns
            else F.lit(0.0)
            for c in cfg.feature_names
        ]
    )


def ml_rerank(
    df: DataFrame,
    cfg: PipelineConfig,
    weights: dict[str, float] | None = None,
    bias: float = 0.0,
) -> DataFrame:
    """M1 + W4: broadcast logistic scorer over the 19 features, then
    re-rank within each cell by the model probability (ml.py:166-196).

    ``weights`` maps feature name -> weight; defaults approximate the
    heuristic (uniform weight on the W1 features) so the re-rank is usable
    without training. scripts/train_scorer.py fits real weights on the
    synthetic gold corpus.
    """
    if weights is None:
        from crocodile_spark.operators.el import W1_FEATURES

        weights = {c: 2.0 for c in W1_FEATURES}
        bias = -4.0
    z = sum(
        (F.coalesce(F.col(c), F.lit(0.0)) * float(w) for c, w in weights.items()
         if c in df.columns),
        F.lit(float(bias)),
    )
    # unlinked-cell rows (null qid, kept by link_cells since r4) carry no
    # candidate to score: leave ml_score/ml_rank null instead of assigning
    # them sigmoid(bias) and rank 1 for a nonexistent candidate
    linked = F.col("qid").isNotNull() if "qid" in df.columns else F.lit(True)
    out = df.withColumn("_z", F.when(linked, z)).withColumn(
        "ml_score", F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_z")))
    )
    # rank by the LINEAR score: sigmoid is monotone but not injective in
    # float64, so ordering by ml_score could tie two candidates whose z
    # differ by a few ulp and fall back to the qid tie-break while an
    # exact-z comparison (e.g. the DuckDB oracle) would not. desc ordering
    # puts null _z last, so real candidates keep ranks 1..n.
    w_rank = Window.partitionBy(*CELL_KEY).orderBy(F.desc("_z"), F.asc("qid"))
    return out.withColumn(
        "ml_rank", F.when(linked, F.row_number().over(w_rank))
    ).drop("_z")
