"""Approximate-nearest-neighbor search over an embedding column.

Two strategies:
- brute_force_topk: exact cosine top-k per query (the correctness
  baseline; a crossJoin, O(Q x N) -- use only for small query sets or as
  the oracle for the ANN path);
- lsh_topk: random-hyperplane LSH with multi-probe bucketing -- the scale
  path: queries only compare against candidates sharing a hash bucket in
  at least one of ``num_tables`` independent tables. All native
  expressions; hyperplanes are seeded plan literals.

At 100 TB the brute-force path is a deliberate non-starter (quadratic);
lsh_topk's cost is bounded by bucket sizes, which are capped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crocodile_spark.functions.similarity import cosine_similarity
from crocodile_spark.operators.blocking import salted_count


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    corpus_id: str = "cand_id",
    emb: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query over the full corpus."""
    q = queries.select(F.col(query_id), F.col(emb).alias("_qv"))
    c = corpus.select(F.col(corpus_id), F.col(emb).alias("_cv"))
    sims = (
        q.crossJoin(c)
        .withColumn("cosine", cosine_similarity(F.col("_qv"), F.col("_cv")))
        .drop("_qv", "_cv")
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(corpus_id))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _hyperplane_buckets(emb_col: str, dim: int, num_planes: int, seed: int):
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_planes, dim))

    def sign_bit(p):
        dot = F.aggregate(
            F.zip_with(
                F.col(emb_col),
                F.array(*[F.lit(float(x)) for x in p]),
                lambda a, b: a.cast("double") * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0"))

    return F.concat(*[sign_bit(planes[i]) for i in range(num_planes)])


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    corpus_id: str = "cand_id",
    emb: str = "embedding",
    num_planes: int = 4,
    num_tables: int = 12,
    seed: int = 42,
    max_bucket_size: int = 4096,
) -> DataFrame:
    """ANN top-k: random-hyperplane LSH bucket join, exact cosine within
    candidates, union over ``num_tables`` independent tables.

    Recall grows with num_tables; cost is Sum(bucket pair volume), capped.
    """
    dim_row = corpus.select(F.size(F.col(emb)).alias("d")).first()
    if dim_row is None:
        raise ValueError("empty corpus")
    dim = int(dim_row["d"])

    cand_pairs = None
    for t in range(num_tables):
        bucket = _hyperplane_buckets(emb, dim, num_planes, seed + 1000 * t)
        qb = queries.withColumn("bucket", bucket).select(
            F.col(query_id), F.col(emb).alias("_qv"), "bucket"
        )
        cb = corpus.withColumn("bucket", bucket).select(
            F.col(corpus_id), F.col(emb).alias("_cv"), "bucket"
        )
        sizes = salted_count(cb.select(F.col(corpus_id).alias("id"), "bucket"), "bucket")
        ok = sizes.where(F.col("count") <= max_bucket_size).select("bucket")
        cb = cb.join(ok, "bucket", "inner")
        p = qb.join(cb, "bucket").select(query_id, corpus_id, "_qv", "_cv")
        cand_pairs = p if cand_pairs is None else cand_pairs.unionByName(p)

    cands = cand_pairs.dropDuplicates([query_id, corpus_id])
    sims = cands.withColumn(
        "cosine", cosine_similarity(F.col("_qv"), F.col("_cv"))
    ).drop("_qv", "_cv")
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(corpus_id))
    return sims.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def recall_at_k(ann: DataFrame, exact: DataFrame, query_id: str = "query_id",
                corpus_id: str = "cand_id") -> float:
    """Fraction of exact top-k pairs recovered by the ANN result."""
    hit = exact.join(ann, [query_id, corpus_id], "left_semi").count()
    total = exact.count()
    return hit / total if total else 1.0
