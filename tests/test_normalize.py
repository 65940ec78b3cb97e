"""Golden vectors for the frozen normalization law (SURVEY.md section 5.2
layer 1; laws F1-F5 cited to reference crocodile/processors.py:106-134,
crocodile/utils.py:8-15)."""

from __future__ import annotations

import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F

from crocodile_spark.functions.normalize import (
    char_ngrams,
    context_text,
    extract_text_from_html,
    normalize_mention,
    qid_from_url,
    row_hash,
    tokenize,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_normalize_mention_law(spark):
    df = spark.createDataFrame(
        [
            ("  Diego_Maradona  ", "diego maradona"),
            ("HELLO_WORLD", "hello world"),
            ("  plain  ", "plain"),
            ("_lead", " lead"),     # strip happens BEFORE '_'->' ' (reference order)
            ("", ""),
        ],
        ["raw", "expected"],
    )
    out = df.withColumn("got", normalize_mention("raw")).collect()
    for r in out:
        assert r["got"] == r["expected"], r


def test_normalize_mention_null_and_numeric(spark):
    df = spark.createDataFrame([Row(raw=None), Row(raw="42")])
    got = [r["got"] for r in df.withColumn("got", normalize_mention("raw")).collect()]
    assert got == [None, "42"]


def test_context_text_sorted_lower_collapsed(spark):
    df = spark.createDataFrame([("Zeta", "  Alpha ", "beta")], ["a", "b", "c"])
    # values sorted by *string* value ('  Alpha ' < 'Zeta' < 'beta'), joined,
    # lowered, whitespace-collapsed, trimmed
    got = df.select(context_text(["a", "b", "c"]).alias("v")).collect()[0]["v"]
    assert got == "alpha zeta beta"


def test_row_hash_is_sha256(spark):
    got = _one(spark, row_hash(F.lit("hello world")))
    assert got == hashlib.sha256(b"hello world").hexdigest()


def test_tokenize_set_semantics_and_stopwords(spark):
    got = _one(spark, tokenize(F.lit("The quick-quick BROWN fox, the fox!")))
    assert sorted(got) == ["brown", "fox", "quick"]


def test_tokenize_empty_and_all_stopwords(spark):
    assert _one(spark, tokenize(F.lit(""))) == []
    assert _one(spark, tokenize(F.lit("the and of"))) == []


def test_char_ngrams(spark):
    assert _one(spark, char_ngrams(F.lit("abcd"))) == ["abc", "bcd"]
    assert _one(spark, char_ngrams(F.lit("ab"))) == []       # len < n -> empty
    assert _one(spark, char_ngrams(F.lit("aaaa"))) == ["aaa"]  # distinct


def test_char_ngrams_regex_matches_sliding_window_law(spark):
    """r8: char_ngrams switched from a transform/substr HOF to one
    regexp_extract_all pass; the frozen F5 law (sliding window, distinct,
    first-occurrence order, shorter-than-n and NULL -> empty array) must
    hold bit-for-bit, including newlines (?s), astral-plane code points,
    and regex metacharacters in the DATA (the pattern is fixed)."""
    import random

    def old_law(col, n=3):
        c = col.cast("string")
        return F.array_distinct(
            F.when(
                F.length(c) >= n,
                F.transform(
                    F.sequence(F.lit(1), F.length(c) - (n - 1)),
                    lambda i: c.substr(i, F.lit(n)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        )

    alphabet = "ab c\nd\t€日本語🎉👍x1_ÀÖ'\"\\.*+?[](){}|^$"
    rng = random.Random(11)
    rows = [
        ("".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40))),)
        for _ in range(500)
    ]
    rows += [("",), (None,), ("🎉🎉🎉🎉",), ("a🎉b\nc",)]
    df = spark.createDataFrame(rows, "t string")
    for n in (1, 3, 5):
        got = df.select(
            char_ngrams(F.col("t"), n).alias("a"),
            old_law(F.col("t"), n).alias("b"),
        ).collect()
        assert all(r["a"] == r["b"] for r in got), n


def test_qid_from_url(spark):
    got = _one(spark, qid_from_url(F.lit("http://www.wikidata.org/entity/Q42")))
    assert got == "Q42"


def test_html_extractor_frozen_law():
    html = (
        "<html><head><title>T1 - x</title><script>var a=1;</script>"
        "<style>p{}</style></head><body><!-- c --><p>Hello &amp; world</p>"
        "<div>second   line</div></body></html>"
    )
    out = extract_text_from_html(html)
    assert "var a=1" not in out and "p{}" not in out and "<" not in out
    assert "Hello & world" in out and "second line" in out
    # deterministic: byte-identical on repeat, bytes input == str input
    assert out == extract_text_from_html(html.encode("utf-8"))
    assert extract_text_from_html(None) == ""


def test_html_udf_matches_pure_function(spark):
    from crocodile_spark.functions.normalize import html_to_text_udf

    html = "<html><body><p>A&lt;B</p><p>C</p></body></html>"
    df = spark.createDataFrame([(html.encode(),)], ["html"])
    got = df.select(html_to_text_udf("html").alias("t")).collect()[0]["t"]
    assert got == extract_text_from_html(html)
