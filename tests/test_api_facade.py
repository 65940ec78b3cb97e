"""Reference-parity facade (README.md:88-111 usage shape): onboard a
pandas table, run the full EL lifecycle, get the enriched wide table."""

from __future__ import annotations

import pandas as pd
import pytest

from crocodile_spark.api import CrocodileSpark


@pytest.fixture(scope="module")
def table_and_kb(spark, corpus):
    from crocodile_spark.datagen import kb_to_spark, make_ambiguous_kb

    ents = corpus.kb_entities.to_dict("records")[:12]
    pdf = pd.DataFrame(
        {
            "film": [e["name"] for e in ents],
            "year": [1990 + i for i in range(len(ents))],
            "note": ["a short note about it"] * len(ents),
        }
    )
    kb = kb_to_spark(spark, make_ambiguous_kb(corpus))
    gold = {f"{i}-0": ents[i]["qid"] for i in range(len(ents))}
    return pdf, kb, gold, ents


def test_facade_run_with_explicit_columns_type(spark, table_and_kb):
    pdf, kb, gold, ents = table_and_kb
    croco = CrocodileSpark(
        input_csv=pdf,
        kb=kb,
        dataset_name="cinema",
        table_name="films",
        columns_type={"NE": {"0": "OTHER"}, "LIT": {"1": "NUMBER"}, "IGNORED": ["2"]},
        correct_qids=gold,
        candidate_retrieval_limit=10,
        return_dataframe=True,
        spark=spark,
    )
    out = croco.run()
    assert isinstance(out, pd.DataFrame)
    assert len(out) == len(pdf)
    # J6 export shape: {col}_id/_name/_desc/_score for the NE column
    assert {"0_id", "0_name", "0_desc", "0_score"} <= set(out.columns)
    top1 = dict(zip(out["row_id"], out["0_id"]))
    acc = sum(top1[i] == ents[i]["qid"] for i in range(len(ents))) / len(ents)
    assert acc >= 0.9, f"facade top-1 accuracy {acc:.2f}"


def test_facade_heuristic_classification_and_csv(spark, table_and_kb, tmp_path):
    pdf, kb, _, _ = table_and_kb
    dest = str(tmp_path / "enriched_csv")
    croco = CrocodileSpark(
        input_csv=pdf,
        kb=kb,
        save_output_to_csv=dest,
        return_dataframe=False,
        spark=spark,
    )
    out = croco.run()
    # heuristic M2: 'film' (multi-word names) classified NE -> linked
    ne_cols = [c for c in out.columns if c.endswith("_id")]
    assert ne_cols, out.columns
    got = spark.read.option("header", "true").csv(dest)
    assert got.count() == len(pdf)


def test_facade_reads_csv_path(spark, table_and_kb, tmp_path):
    pdf, kb, _, _ = table_and_kb
    p = str(tmp_path / "in.csv")
    pdf.to_csv(p, index=False)
    croco = CrocodileSpark(input_csv=p, kb=kb, spark=spark,
                           columns_type={"NE": {"0": "OTHER"}, "LIT": {}, "IGNORED": []})
    out = croco.run()
    assert len(out) == len(pdf)


def test_facade_empty_table_and_all_ignored(spark, table_and_kb):
    pdf, kb, _, _ = table_and_kb
    # all-IGNORED classification: no NE cells -> empty enriched extras,
    # rows preserved
    croco = CrocodileSpark(
        input_csv=pdf, kb=kb, spark=spark,
        columns_type={"NE": {}, "LIT": {}, "IGNORED": ["0", "1", "2"]},
    )
    out = croco.run()
    assert len(out) == len(pdf)
    assert not [c for c in out.columns if c.endswith("_id") and c != "row_id"]

    # empty input table
    croco2 = CrocodileSpark(
        input_csv=pdf.iloc[0:0], kb=kb, spark=spark,
        columns_type={"NE": {"0": "OTHER"}, "LIT": {}, "IGNORED": []},
    )
    assert len(croco2.run()) == 0


def test_facade_nan_and_missing_cells(spark, table_and_kb):
    import math

    pdf, kb, _, ents = table_and_kb
    dirty = pdf.copy()
    dirty.loc[0, "film"] = float("nan")   # NaN mention -> P4 drop, row kept
    croco = CrocodileSpark(
        input_csv=dirty, kb=kb, spark=spark,
        columns_type={"NE": {"0": "OTHER"}, "LIT": {"1": "NUMBER"}, "IGNORED": []},
    )
    out = croco.run().sort_values("row_id")
    assert len(out) == len(dirty)
    assert out.iloc[0]["0_id"] is None or (
        isinstance(out.iloc[0]["0_id"], float) and math.isnan(out.iloc[0]["0_id"])
    )
    assert out.iloc[1]["0_id"] == ents[1]["qid"]
