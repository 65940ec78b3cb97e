"""Structured Streaming layer: incremental corpus ingest.

The reference has no streaming operators (SURVEY.md section 2.10) -- its
'streaming' is queue polling. This module is the forward-looking ingest
path for a continuously-crawled corpus: new web_pages files stream through
the stage-1 normalization (stateless, so watermarks are unnecessary) and
append to the records table that the batch blocking/scoring/clustering
stages consume on their next run.
"""

from crocodile_spark.streaming.incremental import (  # noqa: F401
    normalize_stream,
    start_ingest,
)
