"""Source/sink round-trips (S1/S2/S8/S10/S11) and the MLP ranker (M1)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from crocodile_spark.ml import LAYER_SIZES, MlpRanker, mlp_rerank
from crocodile_spark.sources import (
    export_csv,
    read_gold_cea,
    read_input_csv,
    read_pandas,
)


def test_csv_roundtrip_and_sample(spark, tmp_path):
    import pandas as pd

    pdf = pd.DataFrame({"a": range(50), "b": [f"x{i}" for i in range(50)]})
    df = read_pandas(spark, pdf)
    out = str(tmp_path / "csv_out")
    export_csv(df, out, single_file=True)
    full, sample = read_input_csv(spark, out, sample_rows=10)
    assert full.count() == 50
    assert sample.count() == 10
    got = {(r["a"], r["b"]) for r in full.collect()}
    assert (0, "x0") in got and (49, "x49") in got


def test_gold_cea_scan(spark, tmp_path):
    p = tmp_path / "cea.csv"
    p.write_text(
        "TAB1,1,0,http://www.wikidata.org/entity/Q42\n"
        "TAB1,2,0,http://www.wikidata.org/entity/Q7\n"
    )
    rows = {
        (r["table_name"], r["row_id"], r["col_id"], r["qid"])
        for r in read_gold_cea(spark, str(p)).collect()
    }
    # 1-based file rows -> 0-based ids; QID from last URL segment (F12)
    assert rows == {("TAB1", 0, 0, "Q42"), ("TAB1", 1, 0, "Q7")}


def test_mlp_shapes_and_determinism():
    m = MlpRanker.random(seed=7)
    X = np.random.default_rng(0).standard_normal((32, 19))
    p1, p2 = m.predict_proba(X), m.predict_proba(X)
    assert p1.shape == (32,)
    assert np.allclose(p1, p2)
    assert ((p1 >= 0) & (p1 <= 1)).all()
    # parameter inventory matches the reference architecture
    n_dense = len(LAYER_SIZES)
    assert sum(1 for k in m.params if k.startswith("W")) == n_dense


def test_mlp_save_load_roundtrip(tmp_path):
    m = MlpRanker.random(seed=3)
    path = str(tmp_path / "mlp" / "weights.json")
    m.save(path)
    m2 = MlpRanker.load(path)
    X = np.ones((4, 19))
    assert np.allclose(m.predict_proba(X), m2.predict_proba(X))


def test_mlp_rerank_in_spark(spark):
    """The broadcast-MLP pandas UDF scores and re-ranks a small candidate
    table; spark scores must equal local numpy scores."""
    from crocodile_spark.config import PipelineConfig

    cfg = PipelineConfig()
    rows = []
    rng = np.random.default_rng(1)
    for row_id in range(4):
        for c in range(3):
            feats = {name: float(rng.random()) for name in cfg.feature_names}
            rows.append(
                {"client_id": "c", "dataset_name": "d", "table_name": "t",
                 "row_id": row_id, "col_id": 0, "qid": f"Q{c}", **feats}
            )
    df = spark.createDataFrame(rows)
    ranker = MlpRanker.random(seed=7)
    out = mlp_rerank(spark, df, cfg, ranker).collect()
    assert len(out) == 12
    for r in out:
        x = np.array([[r[name] for name in cfg.feature_names]])
        assert abs(r["ml_score"] - ranker.predict_proba(x)[0]) < 1e-9
    by_cell = {}
    for r in out:
        by_cell.setdefault(r["row_id"], []).append((r["ml_rank"], r["ml_score"]))
    for ranks in by_cell.values():
        ranks.sort()
        scores = [s for _, s in ranks]
        assert scores == sorted(scores, reverse=True)


def test_s3_json_ingest_feeds_link_cells(spark):
    """S3 REST-body ingest -> canonical input_rows -> full EL phase."""
    from crocodile_spark.config import PipelineConfig
    from crocodile_spark.datagen import corpus_to_spark, make_corpus
    from crocodile_spark.operators.el import link_cells
    from crocodile_spark.sources.tabular import json_rows_to_input_rows

    corpus = make_corpus(n_entities=10, pages_per_entity=2, seed=11)
    _, kb, _ = corpus_to_spark(spark, corpus)
    ents = corpus.kb_entities.to_dict("records")
    header = ["name", "year", "note"]
    rows = [
        {"name": ents[i]["name"], "year": 1990 + i, "note": float("nan")}
        for i in range(5)
    ] + [{"name": None, "year": 1}]  # missing cols + null mention
    input_rows = json_rows_to_input_rows(spark, header, rows)
    got = input_rows.orderBy("row_id").collect()
    assert got[0]["data"] == [ents[0]["name"], "1990", None]  # NaN scrubbed
    assert got[5]["data"] == [None, "1", None]                # missing key -> null
    enriched = (
        input_rows.withColumn(
            "ne_cols", F.create_map(F.lit("0"), F.lit("OTHER"))
        )
        .withColumn("context_cols", F.array(F.lit(0), F.lit(1)))
        .withColumn(
            "correct_qids", F.create_map().cast("map<string,string>")
        )
    )
    ranked = link_cells(enriched, kb, PipelineConfig())
    top1 = {r["row_id"]: r["qid"] for r in ranked.where("rank = 1").collect()}
    assert len(top1) == 5  # null-mention row dropped by P4, others linked
    for i in range(5):
        assert top1[i] == ents[i]["qid"]


def test_parse_json_rows_distributed(spark):
    rows = [('{"a": "x", "b": "1"}',), ('{"b": "2"}',), ("not json",)]
    df = spark.createDataFrame(rows, "json string")
    from crocodile_spark.sources.tabular import parse_json_rows

    got = [r["data"] for r in parse_json_rows(df, ["a", "b"]).collect()]
    assert got == [["x", "1"], [None, "2"], [None, None]]


def test_s9_export_csv_stream(spark):
    from crocodile_spark.sources.tabular import export_csv_stream

    df = spark.range(700).select(
        F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("val")
    )
    chunks = list(export_csv_stream(df, batch_rows=256))
    assert len(chunks) == 3  # 256 + 256 + 188 rows
    text = "".join(chunks)
    lines = text.strip().splitlines()
    assert lines[0] == "id,val"
    assert len(lines) == 701
    assert "42,v42" in lines


def test_j7_cell_data_shape(spark):
    from crocodile_spark.config import PipelineConfig
    from crocodile_spark.datagen import (
        corpus_to_spark,
        el_fixture_to_spark,
        make_corpus,
        make_el_fixture,
    )
    from crocodile_spark.operators.el import build_cell_data, link_cells

    corpus = make_corpus(n_entities=10, pages_per_entity=2, seed=11)
    input_rows = el_fixture_to_spark(spark, make_el_fixture(corpus, n_rows=10, seed=12))
    _, kb, _ = corpus_to_spark(spark, corpus)
    ranked = link_cells(input_rows, kb, PipelineConfig())
    cd = build_cell_data(ranked)
    rows = cd.collect()
    # exactly one serving row per valid NE cell
    n_cells = ranked.select("row_id", "col_id").distinct().count()
    assert len(rows) == n_cells
    for r in rows:
        assert r["cell_text"] is not None
        assert 0.0 <= r["confidence"] <= 1.0
        assert r["types"] == sorted(r["types"])
