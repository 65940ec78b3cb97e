"""Scalar-function layer: the frozen normalization + similarity laws.

Everything here is a pure Column-in/Column-out combinator over native
``pyspark.sql.functions`` (JVM-side, whole-stage-codegen'd) unless
explicitly marked as a pandas UDF.
"""

from crocodile_spark.functions.normalize import (  # noqa: F401
    char_ngrams,
    context_text,
    extract_text_from_html,
    html_to_text_udf,
    normalize_mention,
    row_hash,
    tokenize,
    qid_from_url,
)
from crocodile_spark.functions.similarity import (  # noqa: F401
    cosine_similarity,
    jaro_winkler_udf,
    levenshtein_similarity,
    ngram_jaccard,
    token_jaccard,
)
