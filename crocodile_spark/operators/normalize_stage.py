"""Stage 1 -- normalize (SURVEY.md section 7.1 step 2).

web_pages(url, warc_ts, html, text, lang) -> records(url, host, text,
text_norm, tokens, row_hash, lang, warc_ts).

Laws applied: HTML->text frozen extractor (Arrow pandas UDF; byte-identical
per url -- BASELINE.json input_hint invariant), F2-style lowercase +
whitespace collapse (reference crocodile/processors.py:106-111), F3 sha256
row hash (processors.py:112), F4 tokenize+stopword-set (utils.py:13-15).
Everything except the HTML extractor is native-expression / codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crocodile_spark.functions.normalize import (
    html_to_text_udf,
    row_hash,
    tokenize,
)


def normalize_pages(web_pages: DataFrame, use_html: bool = True) -> DataFrame:
    """Build the normalized record table from raw web pages.

    When ``use_html`` is set the text column is re-derived from the html
    bytes through the frozen extractor (the ``text`` input column is treated
    as untrusted); otherwise ``text`` is taken as-is (testdata tables have
    no html payload).
    """
    df = web_pages
    if use_html and "html" in df.columns:
        df = df.withColumn("extracted_text", html_to_text_udf(F.col("html")))
    else:
        df = df.withColumn("extracted_text", F.coalesce(F.col("text"), F.lit("")))

    # F2 law on page text: lower + whitespace collapse + trim
    text_norm = F.trim(
        F.regexp_replace(F.lower(F.col("extracted_text")), r"\s+", " ")
    )

    out = (
        df.withColumn("text_norm", text_norm)
        .withColumn("row_hash", row_hash(F.col("text_norm")))
        .withColumn("tokens", tokenize(F.col("text_norm")))
        .withColumn(
            "host", F.parse_url(F.col("url"), F.lit("HOST"))
        )
    )
    keep = ["url", "host", "text_norm", "tokens", "row_hash"]
    # embedding rides through so the scoring stage can compute the
    # emb_cosine pair feature (r6, north_star parity)
    for c in ("warc_ts", "lang", "entity_id", "embedding"):
        if c in out.columns:
            keep.append(c)
    return out.select(*keep)
