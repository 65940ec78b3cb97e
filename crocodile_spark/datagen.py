"""Deterministic synthetic corpus generator (FIXTURES.md sections 1-4).

Generates the ``web_pages`` input table (BASELINE.json input_hint shape), a
``kb_entities`` candidate KB (FIXTURES.md section 2, mirroring the candidate
record the reference consumes at crocodile/feature.py:87-153), and pairwise
``gold_labels``. Everything is seeded -- same seed, same bytes.

Surface-form variation exactly covers the reference's normalization law
(crocodile/processors.py:106-134): case changes, '_' for spaces, extra
whitespace, token reordering -- plus one-char typos to exercise the edit-
distance feature, hot-key filler tokens to exercise block caps/salting, and
exact-duplicate texts to exercise the sha256 row-hash path
(crocodile/processors.py:112).
"""

from __future__ import annotations

import itertools
import random
from dataclasses import dataclass

import numpy as np
import pandas as pd

_CONSONANTS = "bcdfghjklmnpqrstvwz"
_VOWELS = "aeiou"

# Non-stopword filler vocabulary; a few of these are "hot" (appear in most
# pages) to create giant blocks that the blocking stage must cap/salt.
_HOT_FILLER = ["official", "website", "online", "page"]
_COLD_FILLER = [
    "archive", "report", "update", "review", "article", "profile", "summary",
    "notes", "journal", "catalog", "bulletin", "digest", "record", "gazette",
]

_NERTYPES = ["LOCATION", "ORGANIZATION", "PERSON", "OTHER"]
_KINDS = ["entity", "type", "disambiguation", "predicate"]
_TYPE_POOL = [("T%d" % i, "type_%d" % i) for i in range(12)]


def _word(rng: random.Random, n_syll: int = 2) -> str:
    return "".join(
        rng.choice(_CONSONANTS) + rng.choice(_VOWELS) for _ in range(n_syll)
    )


@dataclass
class Corpus:
    web_pages: pd.DataFrame       # url, warc_ts, html, text, lang, entity_id (gold col)
    kb_entities: pd.DataFrame     # qid, name, description, types, popularity, kind, nertype
    gold_pairs: pd.DataFrame      # url_a, url_b, label


def _variant(rng: random.Random, name: str) -> str:
    """One surface-form variant of an entity name, covering the F1/F2 law."""
    toks = name.split()
    kind = rng.randrange(6)
    if kind == 0:                                   # case change
        return name.upper() if rng.random() < 0.5 else name.title()
    if kind == 1:                                   # underscores for spaces
        return "_".join(toks)
    if kind == 2:                                   # extra whitespace
        return ("  " if rng.random() < 0.5 else " ").join(toks) + " "
    if kind == 3:                                   # token reorder
        t = toks[:]
        rng.shuffle(t)
        return " ".join(t)
    if kind == 4:                                   # one-char typo (edit distance 1)
        t = list(name)
        i = rng.randrange(len(t))
        if t[i] != " ":
            t[i] = rng.choice(_CONSONANTS + _VOWELS)
        return "".join(t)
    return name                                     # verbatim


def make_corpus(
    n_entities: int = 60,
    pages_per_entity: int = 8,
    seed: int = 42,
    dup_fraction: float = 0.05,
    neg_pair_factor: int = 4,
    filler_range: tuple[int, int] = (2, 6),
    embedding_dim: int = 0,
) -> Corpus:
    """Plant ``n_entities`` clusters of ~``pages_per_entity`` pages each.

    ``filler_range`` controls page length (filler tokens per page): the
    default keeps unit tests fast; benchmarks pass web-realistic sizes
    (e.g. (60, 180)) so stage compute dominates scheduling overhead. Long
    pages draw filler from a wider synthetic vocabulary (more realistic
    shingle diversity than the 14-word test vocab).

    ``embedding_dim`` > 0 adds an ``embedding`` column (array<double>) to
    web_pages: a seeded unit-norm base vector per entity plus per-page
    Gaussian noise (sigma 0.1), the stand-in for a document-encoder
    embedding -- same-entity page pairs land at cosine ~0.99, cross-entity
    near 0. Feeds the ``emb_cosine`` scoring feature (BASELINE.json
    north_star: 'embedding-cosine features ... feeding a broadcast
    logistic scorer'). Exact-duplicate pages copy the source embedding.
    """
    rng = random.Random(seed)
    emb_rng = np.random.default_rng(seed + 1)
    ent_base = (
        emb_rng.standard_normal((n_entities, embedding_dim))
        if embedding_dim > 0
        else None
    )
    if ent_base is not None:
        ent_base /= np.linalg.norm(ent_base, axis=1, keepdims=True)
    cold_filler = list(_COLD_FILLER)
    if filler_range[1] > 20:
        cold_filler += [_word(rng, rng.choice([2, 3])) for _ in range(400)]

    # --- entities: 3-token distinctive names -----------------------------
    entities = []
    seen = set()
    while len(entities) < n_entities:
        name = " ".join(_word(rng, rng.choice([2, 3])) for _ in range(3))
        if name in seen:
            continue
        seen.add(name)
        eid = len(entities)
        entities.append(
            {
                "entity_id": eid,
                "qid": f"Q{1000 + eid}",
                "name": name,
                "description": f"{name} is a {rng.choice(_COLD_FILLER)} about "
                f"{_word(rng)} {_word(rng)}",
                "types": [
                    {"id": t[0], "name": t[1]}
                    for t in rng.sample(_TYPE_POOL, rng.choice([1, 2, 3]))
                ],
                "popularity": round(rng.random(), 4),
                "kind": "entity" if rng.random() < 0.9 else rng.choice(_KINDS),
                "nertype": rng.choice(_NERTYPES),
            }
        )

    # --- pages -----------------------------------------------------------
    pages = []
    base_ts = pd.Timestamp("2025-06-01", tz="UTC")
    for ent in entities:
        slug = ent["name"].replace(" ", "-")
        for p in range(pages_per_entity):
            mention = _variant(rng, ent["name"])
            filler = [
                rng.choice(cold_filler)
                for _ in range(rng.randrange(filler_range[0], filler_range[1]))
            ]
            if rng.random() < 0.7:  # hot tokens in ~70% of pages -> skewed blocks
                filler += rng.sample(_HOT_FILLER, rng.randrange(1, 3))
            rng.shuffle(filler)
            k = rng.randrange(len(filler) + 1)
            text = " ".join(filler[:k] + [mention] + filler[k:])
            host = (
                f"{slug}.example.com" if rng.random() < 0.5 else
                f"crawl{rng.randrange(4)}.example.org"
            )
            url = f"https://{host}/{slug}/p{p}"
            title = f"{mention} - {rng.choice(_COLD_FILLER)}"
            html_doc = (
                f"<html><head><title>{title}</title>"
                f"<script>var t={p};</script><style>p{{margin:0}}</style></head>"
                f"<body><!-- crawl --><p>{text}</p></body></html>"
            )
            row = {
                "url": url,
                "warc_ts": base_ts + pd.Timedelta(days=rng.randrange(30),
                                                  seconds=rng.randrange(86400)),
                "html": html_doc.encode("utf-8"),
                "text": text,
                "lang": "en" if rng.random() < 0.9 else rng.choice(["de", "fr", "es"]),
                "entity_id": ent["entity_id"],
                "mention": mention,
            }
            if ent_base is not None:
                vec = ent_base[ent["entity_id"]] + 0.1 * emb_rng.standard_normal(
                    embedding_dim
                )
                row["embedding"] = [float(x) for x in vec]
            pages.append(row)

    # exact-duplicate texts under new urls (sha256 row-hash path)
    n_dups = int(len(pages) * dup_fraction)
    for i in range(n_dups):
        src = pages[rng.randrange(len(pages))]
        dup = dict(src)
        dup["url"] = src["url"] + f"/dup{i}"
        pages.append(dup)

    rng.shuffle(pages)
    web_pages = pd.DataFrame(pages)

    # --- gold pairwise labels -------------------------------------------
    by_entity: dict[int, list[str]] = {}
    for p in pages:
        by_entity.setdefault(p["entity_id"], []).append(p["url"])
    pos = []
    for eid, urls in by_entity.items():
        urls = sorted(set(urls))
        for a, b in itertools.combinations(urls, 2):
            pos.append({"url_a": a, "url_b": b, "label": 1})
    neg = []
    n_neg = min(len(pos) * neg_pair_factor, 200_000)
    all_urls = sorted({p["url"] for p in pages})
    url_ent = {p["url"]: p["entity_id"] for p in pages}
    while len(neg) < n_neg:
        a, b = rng.sample(all_urls, 2)
        if url_ent[a] == url_ent[b]:
            continue
        a, b = (a, b) if a < b else (b, a)
        neg.append({"url_a": a, "url_b": b, "label": 0})
    gold = pd.DataFrame(pos + neg).drop_duplicates(["url_a", "url_b"])

    kb = pd.DataFrame(
        [{k: e[k] for k in
          ("qid", "name", "description", "types", "popularity", "kind", "nertype")}
         for e in entities]
    )
    return Corpus(web_pages=web_pages, kb_entities=kb, gold_pairs=gold)


def make_ambiguous_kb(corpus: Corpus, seed: int = 44) -> pd.DataFrame:
    """KB with planted distractors: one sibling per entity sharing its
    first two name tokens (qid Q9xxx, fresh popularity/description).

    Entity names in make_corpus are token-disjoint, so candidate sets
    collapse to singletons and ranking is never exercised; siblings force
    multi-candidate cells (the fuzzy token-block retry T5 finds them) so
    EL feature/ranking math is tested on real competition.
    """
    rng = random.Random(seed)
    kb = corpus.kb_entities
    ents = kb.to_dict("records")
    sibs = []
    for e in ents:
        toks = e["name"].split()
        other = ents[rng.randrange(len(ents))]
        sibs.append(
            {
                "qid": "Q9" + e["qid"][1:],
                "name": " ".join(toks[:2] + [other["name"].split()[-1]]),
                "description": f"{toks[0]} is a {rng.choice(_COLD_FILLER)} "
                f"about {_word(rng)}",
                "types": [
                    {"id": t[0], "name": t[1]}
                    for t in rng.sample(_TYPE_POOL, rng.choice([1, 2]))
                ],
                "popularity": round(rng.random(), 4),
                "kind": "entity",
                "nertype": rng.choice(_NERTYPES),
            }
        )
    return pd.concat([kb, pd.DataFrame(sibs)], ignore_index=True)


def make_el_fixture(corpus: Corpus, n_rows: int = 30, seed: int = 43) -> pd.DataFrame:
    """Crocodile-style tabular fixture (FIXTURES.md section 4): rows with
    NE cells drawn from the corpus entities under surface-form variation,
    plus gold qid labels -- the input_rows table for EL-parity tests."""
    rng = random.Random(seed)
    ents = corpus.kb_entities.to_dict("records")
    rows = []
    for row_id in range(n_rows):
        e0 = ents[rng.randrange(len(ents))]
        e1 = ents[rng.randrange(len(ents))]
        data = [
            _variant(rng, e0["name"]),
            str(1950 + rng.randrange(70)),
            _variant(rng, e1["name"]),
            rng.choice(_COLD_FILLER),
        ]
        rows.append(
            {
                "client_id": "c1",
                "dataset_name": "ds1",
                "table_name": "t1",
                "row_id": row_id,
                "data": data,
                "ne_cols": {"0": e0["nertype"], "2": e1["nertype"]},
                "context_cols": [0, 1, 2, 3],
                "correct_qids": {
                    f"{row_id}-0": e0["qid"],
                    f"{row_id}-2": e1["qid"],
                },
            }
        )
    return pd.DataFrame(rows)


def el_fixture_to_spark(spark, pdf: pd.DataFrame):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("client_id", T.StringType(), False),
            T.StructField("dataset_name", T.StringType(), False),
            T.StructField("table_name", T.StringType(), False),
            T.StructField("row_id", T.IntegerType(), False),
            T.StructField("data", T.ArrayType(T.StringType()), True),
            T.StructField("ne_cols", T.MapType(T.StringType(), T.StringType()), True),
            T.StructField("context_cols", T.ArrayType(T.IntegerType()), True),
            T.StructField(
                "correct_qids", T.MapType(T.StringType(), T.StringType()), True
            ),
        ]
    )
    return spark.createDataFrame(pdf, schema=schema)


def kb_to_spark(spark, kb_pdf: pd.DataFrame):
    """KB pandas -> Spark with the canonical explicit schema."""
    from pyspark.sql import types as T

    kb_schema = T.StructType(
        [
            T.StructField("qid", T.StringType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("description", T.StringType(), True),
            T.StructField(
                "types",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("id", T.StringType()),
                            T.StructField("name", T.StringType()),
                        ]
                    )
                ),
            ),
            T.StructField("popularity", T.DoubleType(), True),
            T.StructField("kind", T.StringType(), True),
            T.StructField("nertype", T.StringType(), True),
        ]
    )
    return spark.createDataFrame(kb_pdf, schema=kb_schema)


def corpus_to_spark(spark, corpus: Corpus):
    """Create the three Spark DataFrames with explicit schemas."""
    from pyspark.sql import types as T

    fields = [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("entity_id", T.LongType(), True),
        T.StructField("mention", T.StringType(), True),
    ]
    if "embedding" in corpus.web_pages.columns:
        fields.append(
            T.StructField("embedding", T.ArrayType(T.DoubleType()), True)
        )
    pages_schema = T.StructType(fields)
    gold_schema = T.StructType(
        [
            T.StructField("url_a", T.StringType(), False),
            T.StructField("url_b", T.StringType(), False),
            T.StructField("label", T.IntegerType(), False),
        ]
    )
    wp = spark.createDataFrame(corpus.web_pages, schema=pages_schema)
    kb = kb_to_spark(spark, corpus.kb_entities)
    gold = spark.createDataFrame(corpus.gold_pairs, schema=gold_schema)
    return wp, kb, gold
