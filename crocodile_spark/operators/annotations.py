"""Serving-layer result mutations (SURVEY.md section 2.10, Q10/Q11).

The reference mutates per-cell candidate lists in Mongo (manual annotation
at backend/app/endpoints/crocodile_api.py:1106-1263, candidate deletion +
promotion at :1265-1370). Here the results table is a flat DataFrame (one
row per cell x candidate) and each mutation is a pure transformation that
returns the updated table -- in production these are MERGE INTO statements
on the Iceberg results table; the emulation is the same anti-join + union
law as J2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CELL_KEY = ["client_id", "dataset_name", "table_name", "row_id", "col_id"]


def annotate_match(
    results: DataFrame,
    cell: dict,
    qid: str,
    score: float = 1.0,
) -> DataFrame:
    """Q10 manual-annotation law: within one cell, the chosen candidate gets
    match=true and the given score, every other candidate match=false; the
    cell is flagged manually_annotated and candidates re-rank matched-first
    (W7 ordering: match desc, then score desc, id asc)."""
    in_cell = F.lit(True)
    for k in CELL_KEY:
        in_cell = in_cell & (F.col(k) == F.lit(cell[k]))
    out = (
        results.withColumn(
            "match",
            F.when(in_cell & (F.col("qid") == qid), F.lit(True))
            .when(in_cell, F.lit(False))
            .otherwise(F.col("match") if "match" in results.columns else F.lit(False)),
        )
        .withColumn(
            "score",
            F.when(in_cell & (F.col("qid") == qid), F.lit(float(score))).otherwise(
                F.col("score")
            ),
        )
        .withColumn(
            "manually_annotated",
            F.when(in_cell, F.lit(True)).otherwise(
                F.col("manually_annotated")
                if "manually_annotated" in results.columns
                else F.lit(False)
            ),
        )
    )
    w = Window.partitionBy(*CELL_KEY).orderBy(
        F.desc("match"), F.desc("score"), F.asc("qid")
    )
    return out.withColumn("rank", F.row_number().over(w))


def delete_candidate(results: DataFrame, cell: dict, qid: str) -> DataFrame:
    """Q11 delete + promote law: remove one candidate from its cell; if the
    cell is left with no matched candidate, promote its top-ranked survivor
    to match=true with score 1.0."""
    in_cell = F.lit(True)
    for k in CELL_KEY:
        in_cell = in_cell & (F.col(k) == F.lit(cell[k]))
    kept = results.where(~(in_cell & (F.col("qid") == qid)))
    if "match" not in kept.columns:
        kept = kept.withColumn("match", F.lit(False))
    w = Window.partitionBy(*CELL_KEY)
    w_rank = w.orderBy(F.desc("match"), F.desc("score"), F.asc("qid"))
    kept = kept.withColumn("_has_match", F.max(F.col("match").cast("int")).over(w))
    kept = kept.withColumn("_rn", F.row_number().over(w_rank))
    promoted = (
        kept.withColumn(
            "match",
            F.when(in_cell & (F.col("_has_match") == 0) & (F.col("_rn") == 1), F.lit(True))
            .otherwise(F.col("match")),
        )
        .withColumn(
            "score",
            F.when(in_cell & (F.col("_has_match") == 0) & (F.col("_rn") == 1), F.lit(1.0))
            .otherwise(F.col("score")),
        )
        .drop("_has_match", "_rn")
    )
    return promoted.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy(*CELL_KEY).orderBy(
                F.desc("match"), F.desc("score"), F.asc("qid")
            )
        ),
    )
