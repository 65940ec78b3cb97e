"""M2 replacement: heuristic column classifier.

The reference calls an external spaCy ColumnClassifier on a <=1024-row
sample (crocodile/crocodile.py:206-220) and accepts explicit overrides
(:221-224). This engine accepts explicit ``columns_type`` exactly like the
reference and, when none is given, runs a dependency-free heuristic over
the sample: a column is LIT NUMBER / LIT DATETIME when a supermajority of
its non-null values parse as such, LIT STRING when values are short and
low-cardinality, NE otherwise (names/entities: textual, high-cardinality).
Unclassifiable columns fall into IGNORED (utils.py:56-59 law).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NUMBER_RE = r"^\s*-?\d+(\.\d+)?([eE][+-]?\d+)?\s*$"
DATE_RE = (
    r"^\s*(\d{4}[-/]\d{1,2}[-/]\d{1,2}|\d{1,2}[-/]\d{1,2}[-/]\d{4})"
    r"([ T]\d{2}:\d{2}(:\d{2})?)?\s*$"
)


def classify_columns(
    sample: DataFrame,
    columns: list[str] | None = None,
    threshold: float = 0.8,
) -> dict:
    """Returns {"NE": {idx: nertype}, "LIT": {idx: littype}, "IGNORED": [idx]}
    -- the reference's ColType shape (crocodile/typing.py:1-10), with column
    indexes as string keys like the reference's classified_columns."""
    columns = columns or sample.columns
    aggs = []
    for i, c in enumerate(columns):
        v = F.col(c).cast("string")
        nn = F.count(F.when(v.isNotNull() & (F.length(F.trim(v)) > 0), 1))
        aggs += [
            nn.alias(f"nn_{i}"),
            F.count(F.when(v.rlike(NUMBER_RE), 1)).alias(f"num_{i}"),
            F.count(F.when(v.rlike(DATE_RE), 1)).alias(f"dt_{i}"),
            F.countDistinct(v).alias(f"card_{i}"),
            F.avg(F.length(v)).alias(f"len_{i}"),
            F.count(F.when(v.contains(" "), 1)).alias(f"mw_{i}"),
        ]
    row = sample.agg(*aggs).collect()[0]
    out = {"NE": {}, "LIT": {}, "IGNORED": []}
    for i, c in enumerate(columns):
        nn = row[f"nn_{i}"] or 0
        if nn == 0:
            out["IGNORED"].append(str(i))
            continue
        if (row[f"num_{i}"] or 0) / nn >= threshold:
            out["LIT"][str(i)] = "NUMBER"
        elif (row[f"dt_{i}"] or 0) / nn >= threshold:
            out["LIT"][str(i)] = "DATETIME"
        elif (row[f"mw_{i}"] or 0) / nn >= 0.5:
            # mostly multi-word text: entity-like regardless of cardinality
            out["NE"][str(i)] = "OTHER"
        elif (row[f"card_{i}"] or 0) / nn < 0.1 or (row[f"len_{i}"] or 0) < 4:
            # low-cardinality or very short single words: categorical literal
            out["LIT"][str(i)] = "STRING"
        else:
            out["NE"][str(i)] = "OTHER"
    return out
