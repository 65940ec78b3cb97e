"""Q10/Q11 annotation mutations and the M2 heuristic column classifier."""

from __future__ import annotations

from pyspark.sql import functions as F

from crocodile_spark.operators.annotations import annotate_match, delete_candidate
from crocodile_spark.operators.classify import classify_columns

CELL = {"client_id": "c", "dataset_name": "d", "table_name": "t",
        "row_id": 0, "col_id": 0}


def _results(spark):
    rows = []
    for row_id in (0, 1):
        for i, (qid, score) in enumerate([("Q1", 0.9), ("Q2", 0.7), ("Q3", 0.5)]):
            rows.append(
                ("c", "d", "t", row_id, 0, qid, score, i == 0, False)
            )
    return spark.createDataFrame(
        rows,
        "client_id string, dataset_name string, table_name string, row_id int, "
        "col_id int, qid string, score double, match boolean, manually_annotated boolean",
    )


def test_annotate_match_law(spark):
    out = annotate_match(_results(spark), CELL, "Q3", score=1.0)
    cell0 = {r["qid"]: r for r in out.where("row_id = 0").collect()}
    assert cell0["Q3"]["match"] and cell0["Q3"]["score"] == 1.0
    assert not cell0["Q1"]["match"] and not cell0["Q2"]["match"]
    assert all(r["manually_annotated"] for r in cell0.values())
    # W7 matched-first ordering
    assert cell0["Q3"]["rank"] == 1
    # other cells untouched
    cell1 = {r["qid"]: r for r in out.where("row_id = 1").collect()}
    assert cell1["Q1"]["match"] and not cell1["Q1"]["manually_annotated"]


def test_delete_candidate_promotes(spark):
    # delete the matched candidate Q1 -> Q2 (next by score) promoted to 1.0
    out = delete_candidate(_results(spark), CELL, "Q1")
    cell0 = {r["qid"]: r for r in out.where("row_id = 0").collect()}
    assert set(cell0) == {"Q2", "Q3"}
    assert cell0["Q2"]["match"] and cell0["Q2"]["score"] == 1.0
    assert cell0["Q2"]["rank"] == 1
    # deleting an unmatched candidate does not promote
    out2 = delete_candidate(_results(spark), CELL, "Q3")
    cell0b = {r["qid"]: r for r in out2.where("row_id = 0").collect()}
    assert cell0b["Q1"]["match"] and cell0b["Q1"]["score"] == 0.9
    assert not cell0b["Q2"]["match"]


def test_classify_columns_heuristic(spark):
    rows = [
        ("Diego Maradona", "1986", "2020-01-0%d" % (i % 9 + 1), "yes", None)
        for i in range(20)
    ]
    rows += [("Lionel Messi", "1987.5", "1999/12/31", "no", None) for _ in range(20)]
    df = spark.createDataFrame(
        rows, "name string, num string, dt string, flag string, empty string"
    )
    got = classify_columns(df)
    assert got["NE"] == {"0": "OTHER"}
    assert got["LIT"]["1"] == "NUMBER"
    assert got["LIT"]["2"] == "DATETIME"
    assert got["LIT"]["3"] == "STRING"   # low-cardinality short strings
    assert got["IGNORED"] == ["4"]       # all-null column
