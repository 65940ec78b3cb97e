"""Stage 3 -- pairwise scoring (SURVEY.md section 7.1 step 4).

Re-expresses crocodile's feature algebra (X1, crocodile/feature.py:87-153)
for record *pairs*: the features the reference received from LamAPI
(ed_score, jaccard_score, jaccardNgram_score) are computed in-engine as
native column expressions; the heuristic score is the reference's W1 law --
the arithmetic mean of the available similarity features
(crocodile/processors.py:325-343) -- and the ML re-ranker (M1,
crocodile/ml.py:57-60) is replaced by a broadcast logistic scorer:
sigmoid(w . f + b) as a single native expression.

Scale notes: the pair table joins the (much smaller) signature table twice
-- both joins are plain hash joins on url; no Python in the loop. The
optional Jaro-Winkler column is an Arrow pandas UDF and is off by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crocodile_spark.config import PipelineConfig
from crocodile_spark.functions.similarity import (
    jaro_winkler_udf,
    levenshtein_similarity,
    monge_elkan_lev,
    ngram_jaccard,
    set_jaccard,
)

# ed/jaccard/jaccardNgram/desc are the reference's X1 slots; me_score is the
# token-set-aware edit similarity (Monge-Elkan, native Levenshtein inner
# loop) standing in for the reference's *fuzzy* retrieval pass (T5,
# processors.py:177-202).
PAIR_FEATURES = ("ed_score", "jaccard_score", "jaccardNgram_score", "desc", "me_score")

# Optional slot (r6, north_star parity: "embedding-cosine features ...
# feeding a broadcast logistic scorer"): computed when the record table
# carries an ``embedding`` column; missing/null vectors score 0.0 (no
# evidence), matching the coalesce law of the other slots.
EMB_FEATURE = "emb_cosine"

# Default logistic weights (trained offline on the synthetic gold corpus via
# scripts/train_scorer.py; persisted here as plain literals -- the analog of
# the reference shipping crocodile/models/default.h5, but broadcastable).
DEFAULT_WEIGHTS = {
    "ed_score": 4.0,
    "jaccard_score": 4.0,
    "jaccardNgram_score": 4.0,
    "desc": 2.0,
    "me_score": 6.0,
}
DEFAULT_BIAS = -9.0


def load_trained_weights(variant: str = "base") -> tuple[dict, float] | None:
    """Weights fitted by scripts/train_scorer.py, if present.

    ``variant='emb'`` loads the embedding-augmented model
    (logistic_weights_emb.json, trained with --with-embeddings); the two
    files are kept separate so corpora WITHOUT an embedding column never
    reference a missing feature column in the plan."""
    import json
    import os

    name = "logistic_weights_emb.json" if variant == "emb" else "logistic_weights.json"
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "models",
        name,
    )
    if not os.path.exists(path):
        return None
    with open(path) as f:
        payload = json.load(f)
    return payload["weights"], float(payload["bias"])


def embedding_cosine(a, b):
    """Native cosine between two array<double> columns; null/empty/zero
    vectors -> 0.0 (no evidence). HOF expressions run interpreted
    (CodegenFallback) but at feature dims (16-768) one dot per pair is
    far cheaper than shipping pairs through a Python worker; the Arrow
    matmul path (similarity_search) exists for top-k sweeps where the
    same vector is dotted against thousands."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda s, x: s + x * x))
    # size guard: zip_with pads the shorter array with nulls, nulling the
    # dot product -- without it a length-mismatched pair scores NULL (which
    # would null the whole heuristic sum) instead of "no evidence" 0.0
    return F.when(
        a.isNotNull()
        & b.isNotNull()
        & (F.size(a) == F.size(b))
        & (na > 0)
        & (nb > 0),
        dot / (na * nb),
    ).otherwise(F.lit(0.0))


def attach_pair_features(
    pairs: DataFrame,
    sigs: DataFrame,
    use_jaro_winkler: bool = False,
    broadcast_sigs: bool | None = None,
) -> DataFrame:
    """pairs(url_a, url_b) x sigs -> feature columns per pair.

    Join strategy: left to AQE by default -- it converts to broadcast-hash
    at runtime when the signature side's actual size is under the
    threshold, and splits skewed partitions otherwise (both enabled in the
    session defaults). ``broadcast_sigs=True`` forces the hint (driver-side
    broadcast build is single-threaded, so forcing it hurts scaling when
    the join would have been fine).
    """
    has_emb = "embedding" in sigs.columns
    proj_cols = ["url", "mention_norm", "sig_tokens", "tokens", "row_hash"]
    if has_emb:
        proj_cols.append("embedding")
    proj = sigs.select(*proj_cols)
    side = F.broadcast(proj) if broadcast_sigs else proj
    a = side.select(
        F.col("url").alias("url_a"),
        F.col("mention_norm").alias("mention_a"),
        F.col("sig_tokens").alias("sig_tokens_a"),
        F.col("tokens").alias("tokens_a"),
        F.col("row_hash").alias("row_hash_a"),
        *([F.col("embedding").alias("emb_a")] if has_emb else []),
    )
    b = side.select(
        F.col("url").alias("url_b"),
        F.col("mention_norm").alias("mention_b"),
        F.col("sig_tokens").alias("sig_tokens_b"),
        F.col("tokens").alias("tokens_b"),
        F.col("row_hash").alias("row_hash_b"),
        *([F.col("embedding").alias("emb_b")] if has_emb else []),
    )
    df = pairs.join(a, "url_a", "inner").join(b, "url_b", "inner")
    df = (
        df.withColumn(
            "ed_score", levenshtein_similarity(F.col("mention_a"), F.col("mention_b"))
        )
        .withColumn(
            "jaccard_score",
            # sig_tokens come from collect_set: distinct -> set_jaccard law
            set_jaccard(F.col("sig_tokens_a"), F.col("sig_tokens_b")),
        )
        .withColumn(
            "jaccardNgram_score",
            ngram_jaccard(F.col("mention_a"), F.col("mention_b")),
        )
        # 'desc' slot: full-token-set overlap = context similarity, the
        # in-engine analog of the BoW feature (X2, processors.py:285-292)
        .withColumn("desc", set_jaccard(F.col("tokens_a"), F.col("tokens_b")))
        .withColumn(
            "me_score", monge_elkan_lev(F.col("sig_tokens_a"), F.col("sig_tokens_b"))
        )
    )
    if has_emb:
        df = df.withColumn(
            EMB_FEATURE, embedding_cosine(F.col("emb_a"), F.col("emb_b"))
        )
    if use_jaro_winkler:
        df = df.withColumn(
            "jw_score", jaro_winkler_udf(F.col("mention_a"), F.col("mention_b"))
        )
    return df


def heuristic_score(df: DataFrame, features=PAIR_FEATURES) -> DataFrame:
    """W1 law: arithmetic mean of the feature columns (0.0 if none)."""
    expr = sum((F.col(c) for c in features), F.lit(0.0)) / float(len(features))
    return df.withColumn("score", F.coalesce(expr, F.lit(0.0)))


def logistic_score(
    df: DataFrame,
    weights: dict | None = None,
    bias: float | None = None,
    out: str = "match_prob",
) -> DataFrame:
    """M1 replacement: sigmoid(w . f + b) as one native expression.

    ``weights`` is tiny and lives in the plan as literals -- the moral
    equivalent of a broadcast variable, with zero pickling per task.
    Resolution order: explicit args > trained weights JSON > defaults.
    """
    if weights is None:
        trained = load_trained_weights()
        if trained is not None:
            t_w, t_b = trained
            weights = t_w
            bias = t_b if bias is None else bias
        else:
            weights = DEFAULT_WEIGHTS
    bias = DEFAULT_BIAS if bias is None else bias
    z = sum(
        (F.coalesce(F.col(c), F.lit(0.0)) * float(w) for c, w in weights.items()),
        F.lit(float(bias)),
    )
    return df.withColumn(out, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))


def score(pairs: DataFrame, sigs: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Full stage 3: features + W1 heuristic + logistic prob + edge flag.

    Exact duplicates (equal F3 row hashes) are certain matches regardless
    of the similarity score -- empty mention signatures would otherwise
    score identical texts below threshold.

    With an ``embedding`` column on the record table the ``emb_cosine``
    slot joins the feature set: it enters the W1 mean (heuristic score)
    and the logistic scorer switches to the embedding-augmented trained
    weights (logistic_weights_emb.json) with a literal fallback weight.
    Output schema gains the emb_cosine column only when the input has
    embeddings, so embedding-less corpora are byte-identical to r5.
    """
    df = attach_pair_features(pairs, sigs)
    has_emb = EMB_FEATURE in df.columns
    features = PAIR_FEATURES + ((EMB_FEATURE,) if has_emb else ())
    df = heuristic_score(df, features=features)
    if has_emb:
        trained = load_trained_weights("emb")
        if trained is not None:
            weights, bias = trained
        else:
            weights, bias = {**DEFAULT_WEIGHTS, EMB_FEATURE: 4.0}, DEFAULT_BIAS - 2.0
        df = logistic_score(df, weights=weights, bias=bias)
    else:
        df = logistic_score(df)
    exact = F.col("row_hash_a") == F.col("row_hash_b")
    return df.select(
        "url_a",
        "url_b",
        *features,
        "score",
        "match_prob",
        ((F.col("score") >= cfg.score_threshold) | exact).alias("is_edge"),
    )
