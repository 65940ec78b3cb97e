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
