"""EL-parity tests (SURVEY.md section 5.2 layer 2): the reference's feature
math reimplemented verbatim in Python inside the test, asserted equal to the
Spark pipeline's output; plus ranking/gold-injection/type-frequency/export
fixtures."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from crocodile_spark.config import PipelineConfig
from crocodile_spark.datagen import el_fixture_to_spark, make_el_fixture
from crocodile_spark.operators.el import (
    W1_FEATURES,
    export_el,
    extract_cells,
    generate_candidates,
    link_cells,
    top_k_results,
    training_export,
)
from crocodile_spark.operators.typefreq import (
    attach_type_freq_features,
    global_type_frequencies,
    ml_rerank,
)


@pytest.fixture(scope="module")
def el_data(spark, corpus):
    pdf = make_el_fixture(corpus, n_rows=30, seed=43)
    input_rows = el_fixture_to_spark(spark, pdf).cache()
    from crocodile_spark.datagen import corpus_to_spark

    _, kb, _ = corpus_to_spark(spark, corpus)
    return input_rows, kb.cache(), pdf


@pytest.fixture(scope="module")
def ranked(spark, el_data):
    input_rows, kb, _ = el_data
    return link_cells(input_rows, kb, PipelineConfig()).cache()


# ---- reference math, reimplemented verbatim for parity ---------------------
# (from /root/reference/crocodile/feature.py:75-85 and processors.py:134)


def _py_norm(v: str) -> str:
    return str(v).strip().replace("_", " ").lower()


def _py_tokens(s: str) -> set:
    import re

    return {t for t in re.split(r"[^a-z0-9]+", s.lower()) if t}


def _py_jaccard(a: set, b: set) -> float:
    u = a | b
    return len(a & b) / len(u) if u else 0.0


def _py_ngrams(s: str, n: int = 3) -> set:
    return {s[i : i + n] for i in range(len(s) - n + 1)}


def _py_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


def test_feature_parity_with_reference_math(spark, ranked, el_data):
    """Every X1 similarity slot must equal the reference law recomputed in
    plain Python on the same inputs."""
    _, _, pdf = el_data
    kb_by_qid = {
        e["qid"]: e for e in pdf_kb_records(el_data)
    }
    rows = ranked.select(
        "mention_norm", "qid", "name", "description", "context_text",
        "ed_score", "jaccard_score", "jaccardNgram_score", "desc", "descNgram",
        "ntoken_mention", "length_mention",
    ).limit(200).collect()
    assert rows
    for r in rows:
        m = r["mention_norm"]
        name = _py_norm(r["name"]) if r["name"] is not None else ""
        desc = r["description"] or ""
        # ed_score = 1 - lev/maxlen
        mx = max(len(m), len(name))
        exp_ed = 1.0 - _py_lev(m, name) / mx if mx else 1.0
        assert math.isclose(r["ed_score"], exp_ed, abs_tol=1e-9), (m, name)
        # token jaccard on mention vs name tokens
        assert math.isclose(
            r["jaccard_score"], _py_jaccard(_py_tokens(m), _py_tokens(name)),
            abs_tol=1e-9,
        )
        # ngram jaccard mention vs name
        assert math.isclose(
            r["jaccardNgram_score"], _py_jaccard(_py_ngrams(m), _py_ngrams(name)),
            abs_tol=1e-9,
        )
        # desc = jaccard(row tokens minus stopwords, desc tokens minus stopwords)
        from crocodile_spark import ENGLISH_STOPWORDS

        row_toks = _py_tokens(r["context_text"]) - ENGLISH_STOPWORDS
        desc_toks = _py_tokens(desc) - ENGLISH_STOPWORDS
        assert math.isclose(r["desc"], _py_jaccard(row_toks, desc_toks), abs_tol=1e-9)
        # descNgram = ngram jaccard(mention, description raw)
        assert math.isclose(
            r["descNgram"], _py_jaccard(_py_ngrams(m), _py_ngrams(desc)), abs_tol=1e-9
        )
        assert r["ntoken_mention"] == float(len(m.split()))
        assert r["length_mention"] == float(len(m))


def pdf_kb_records(el_data):
    _, kb, _ = el_data
    return [r.asDict(recursive=True) for r in kb.collect()]


def test_w1_score_is_mean_of_seven(spark, ranked):
    rows = ranked.select(*W1_FEATURES, "score").limit(50).collect()
    for r in rows:
        exp = sum(r[c] for c in W1_FEATURES) / 7.0
        assert math.isclose(r["score"], exp, abs_tol=1e-9)


def test_candidate_retrieval_finds_gold(spark, ranked):
    """Recall of the blocking-join candidate generation: the gold entity is
    in the candidate set for >=95% of gold-labeled cells (the rest are
    injected by J9)."""
    cells_with_gold = ranked.where(F.col("gold_qid").isNotNull())
    per_cell = cells_with_gold.groupBy(
        "row_id", "col_id"
    ).agg(F.max("is_gold").alias("has_gold"))
    frac = per_cell.agg(F.avg("has_gold")).collect()[0][0]
    assert frac == 1.0, f"gold candidate present for only {frac:.2%} of cells"


def test_top1_accuracy_heuristic(spark, ranked):
    """The W1 heuristic alone should rank the gold entity first for the
    vast majority of cells (crocodile's pre-ML behavior)."""
    top1 = ranked.where(F.col("rank") == 1)
    acc = top1.agg(F.avg("is_gold")).collect()[0][0]
    assert acc >= 0.9, f"top-1 accuracy {acc:.2%}"


def test_w2_topk_and_tiebreak(spark, ranked):
    cfg = PipelineConfig()
    k = top_k_results(ranked, cfg)
    sizes = k.groupBy("row_id", "col_id").count().agg(F.max("count")).collect()[0][0]
    assert sizes <= cfg.max_candidates_in_result
    # rank is dense 1..n per cell and deterministic
    r = k.groupBy("row_id", "col_id").agg(F.min("rank").alias("mn")).collect()
    assert all(x["mn"] == 1 for x in r)


def test_w3_gold_in_training_slice(spark, ranked):
    """train_rank ordering puts the gold candidate inside the top-K slice
    even when its score rank is below K."""
    cfg = PipelineConfig()
    tr = training_export(ranked, cfg)
    per_cell = tr.groupBy("row_id", "col_id").agg(F.sum("target").alias("n_gold"))
    bad = per_cell.where(F.col("n_gold") != 1).count()
    assert bad == 0


def test_training_export_rounded(spark, ranked):
    cfg = PipelineConfig()
    tr = training_export(ranked, cfg)
    rows = tr.select("ed_score").limit(20).collect()
    for r in rows:
        assert math.isclose(r["ed_score"], round(r["ed_score"], 3), abs_tol=1e-12)


def test_a1_type_frequency_micro_fixture(spark):
    """Hand-computed A1 law (crocodile/feature.py:220-251): 4 rows x 1 col;
    candidate types in top-3; expected ratios computed by hand."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("client_id", T.StringType()),
            T.StructField("dataset_name", T.StringType()),
            T.StructField("table_name", T.StringType()),
            T.StructField("row_id", T.IntegerType()),
            T.StructField("col_id", T.IntegerType()),
            T.StructField("qid", T.StringType()),
            T.StructField("rank", T.IntegerType()),
            T.StructField(
                "types",
                T.ArrayType(
                    T.StructType(
                        [T.StructField("id", T.StringType()),
                         T.StructField("name", T.StringType())]
                    )
                ),
            ),
        ]
    )
    TA, TB = [{"id": "TA", "name": "a"}], [{"id": "TB", "name": "b"}]
    rows = []
    # row 0: top-3 cands have types TA, TA, TB -> row contributes TA once, TB once
    for rk, t in [(1, TA), (2, TA), (3, TB), (4, TB)]:  # rank 4 ignored
        rows.append(("c", "d", "t", 0, 0, f"Q{rk}", rk, t))
    # row 1: only TA
    rows.append(("c", "d", "t", 1, 0, "Q9", 1, TA))
    # row 2: only TB
    rows.append(("c", "d", "t", 2, 0, "Q10", 1, TB))
    # row 3: no types
    rows.append(("c", "d", "t", 3, 0, "Q11", 1, []))
    df = spark.createDataFrame(rows, schema)
    freqs = global_type_frequencies(df, PipelineConfig())
    got = {r["type_id"]: r["freq"] for r in freqs.collect()}
    # 4 rows in the column; TA in rows {0,1} -> 0.5; TB in rows {0,2} -> 0.5
    assert got == {"TA": 0.5, "TB": 0.5}


def test_x3_typefreq_slots_sorted_padded(spark, ranked):
    cfg = PipelineConfig()
    freqs = global_type_frequencies(ranked, cfg)
    out = attach_type_freq_features(ranked, freqs, cfg)
    rows = out.select("typeFreq1", "typeFreq2", "typeFreq3", "typeFreq4", "typeFreq5").limit(
        100
    ).collect()
    for r in rows:
        vals = [r[f"typeFreq{i}"] for i in range(1, 6)]
        assert vals == sorted(vals, reverse=True)
        assert all(0.0 <= v <= 1.0 for v in vals)


def test_ml_rerank_monotone_in_score(spark, ranked):
    """With uniform weights over the W1 features, the logistic re-rank must
    order candidates identically to the heuristic score (sigmoid is
    monotone)."""
    out = ml_rerank(ranked, PipelineConfig())
    disagree = out.where(
        (F.col("rank") != F.col("ml_rank"))
    ).join(
        # allow disagreement only where heuristic scores tie
        out.groupBy("row_id", "col_id", "score").agg(F.count(F.lit(1)).alias("n")).where(
            F.col("n") > 1
        ),
        ["row_id", "col_id", "score"],
        "left_anti",
    )
    assert disagree.count() == 0


def test_export_shape(spark, ranked, el_data):
    input_rows, _, _ = el_data
    wide = export_el(ranked, input_rows)
    cols = set(wide.columns)
    assert {"0_id", "0_name", "0_desc", "0_score", "2_id", "2_name", "2_desc", "2_score"} <= cols
    assert wide.count() == input_rows.count()
    # top-1 = gold for most rows
    gold_ok = wide.join(
        input_rows.select("row_id", F.element_at("correct_qids", F.concat_ws("-", "row_id", F.lit("0"))).alias("g0")),
        "row_id",
    ).where(F.col("0_id") == F.col("g0")).count()
    assert gold_ok >= 0.9 * input_rows.count()


def test_p4_skips_blank_cells(spark, el_data):
    input_rows, kb, _ = el_data
    from pyspark.sql import functions as F2

    dirty = input_rows.withColumn(
        "data", F2.array(F2.lit("   "), F2.lit("1999"), F2.lit(None), F2.lit("x"))
    )
    cells = extract_cells(dirty)
    assert cells.count() == 0  # both NE cols (0, 2) are blank/null


def test_retrieval_cap(spark, el_data):
    input_rows, kb, _ = el_data
    cfg = PipelineConfig(candidate_retrieval_limit=3)
    cells = extract_cells(input_rows)
    cands = generate_candidates(cells, kb, cfg)
    mx = cands.groupBy("mention_norm").count().agg(F.max("count")).collect()[0][0]
    assert mx <= 3


def test_ragged_rows_tolerated_not_crashed(spark, el_data):
    """ANSI-mode regression: ne_cols/context_cols indexes past the end of
    data must yield null (P4 drop), matching the reference's
    int(c) < len(row) guard (processors.py:130-136), not abort the job."""
    input_rows, kb, _ = el_data
    from pyspark.sql import functions as F2

    ragged = input_rows.withColumn(
        "data", F2.slice("data", 1, 1)  # keep only col 0; cols 1..3 now out of range
    ).withColumn("context_cols", F2.array(F2.lit(1), F2.lit(9)))
    cells = extract_cells(ragged)  # must not raise INVALID_ARRAY_INDEX_IN_ELEMENT_AT
    got_cols = {r["col_id"] for r in cells.select("col_id").distinct().collect()}
    assert got_cols <= {0}  # out-of-range NE cols dropped by P4


def test_a2_sample_fraction_is_unbiased(spark, ranked):
    """pmod regression: the seeded hash sample must keep ~fraction of cells,
    not ~0.5 + fraction/2 (Spark % preserves the dividend's sign)."""
    cfg = PipelineConfig(type_freq_sample_fraction=0.2)
    from crocodile_spark.operators.typefreq import CELL_KEY

    base = ranked.where(F.col("rank") <= cfg.top_n_for_type_freq)
    kept = base.where(
        F.pmod(
            F.xxhash64(F.concat_ws("|", *CELL_KEY), F.lit(cfg.type_freq_sample_seed)),
            F.lit(100),
        )
        < int(cfg.type_freq_sample_fraction * 100)
    )
    frac = kept.count() / max(base.count(), 1)
    assert 0.05 <= frac <= 0.40  # would be ~0.6 under the sign bug


def test_unlinked_cells_survive_into_cell_data(spark, corpus):
    """r4 coverage law: a valid NE cell whose mention matches NOTHING in
    the KB (no exact block, no shared fuzzy token, no gold) must survive
    link_cells with null candidate columns / null rank and reach
    build_cell_data with null confidence -- parity with the reference
    writing el_results even when empty (crocodile/processors.py:236-246)
    and the backend's full-coverage cell_data (result_sync.py:428-454)."""
    import pandas as pd

    from crocodile_spark.datagen import corpus_to_spark
    from crocodile_spark.operators.el import build_cell_data

    pdf = make_el_fixture(corpus, n_rows=5, seed=43)
    pdf = pd.concat(
        [
            pdf,
            pd.DataFrame(
                [
                    {
                        "client_id": "c1",
                        "dataset_name": "ds1",
                        "table_name": "t1",
                        "row_id": 5,
                        "data": ["zzqxv kwwyj", "1987", "xvvqz jjwwk", "n/a"],
                        "ne_cols": {"0": "OTHER"},
                        "context_cols": [0, 1],
                        "correct_qids": {},
                    }
                ]
            ),
        ],
        ignore_index=True,
    )
    input_rows = el_fixture_to_spark(spark, pdf)
    _, kb, _ = corpus_to_spark(spark, corpus)
    ranked = link_cells(input_rows, kb, PipelineConfig())

    mine = ranked.where(F.col("row_id") == 5).collect()
    assert len(mine) == 1, "unlinked cell must survive as exactly one row"
    assert mine[0]["qid"] is None and mine[0]["rank"] is None
    assert mine[0]["cell_value"] == "zzqxv kwwyj"
    # rank-bounded consumers drop it naturally
    assert top_k_results(ranked, PipelineConfig()).where(
        F.col("row_id") == 5
    ).count() == 0
    # cell_data keeps it with null confidence
    cd = build_cell_data(ranked).where(F.col("row_id") == 5).collect()
    assert len(cd) == 1
    assert cd[0]["confidence"] is None and cd[0]["cell_text"] == "zzqxv kwwyj"
    # ml re-rank leaves it unranked rather than ranking a nonexistent candidate
    rr = ml_rerank(ranked, PipelineConfig()).where(F.col("row_id") == 5).collect()
    assert len(rr) == 1 and rr[0]["ml_rank"] is None
