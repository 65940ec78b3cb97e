"""croco-spark: a PySpark-native record-linkage / entity-resolution engine.

A from-scratch rebuild of the *capabilities* of enRichMyData/crocodile
(reference read-only at /root/reference) as an idiomatic Spark pipeline:

    normalize -> block -> score -> cluster

over Common-Crawl-style web pages ``(url, warc_ts, html, text, lang)``.

Design stance (SURVEY.md section 7): DataFrame/SQL first so Catalyst handles
pruning/pushdown/join-choice; Arrow pandas UDFs only where built-ins cannot
express the semantics (HTML->text extraction, Jaro-Winkler); no per-row
Python anywhere in the hot path.
"""

__version__ = "0.1.0"

from crocodile_spark.config import PipelineConfig  # noqa: F401
from crocodile_spark.session import get_spark  # noqa: F401

# English stopword list frozen in-repo. The reference pulls NLTK's English
# stopword corpus at import time (crocodile/__init__.py:31-36 of the
# reference); we freeze an equivalent list so tokenization (F4) is
# deterministic and dependency-free.
ENGLISH_STOPWORDS = frozenset(
    """a about above after again against all am an and any are aren't as at be
because been before being below between both but by can't cannot could
couldn't did didn't do does doesn't doing don't down during each few for from
further had hadn't has hasn't have haven't having he he'd he'll he's her here
here's hers herself him himself his how how's i i'd i'll i'm i've if in into
is isn't it it's its itself let's me more most mustn't my myself no nor not of
off on once only or other ought our ours ourselves out over own same shan't
she she'd she'll she's should shouldn't so some such than that that's the
their theirs them themselves then there there's these they they'd they'll
they're they've this those through to too under until up very was wasn't we
we'd we'll we're we've were weren't what what's when when's where where's
which while who who's whom why why's with won't would wouldn't you you'd
you'll you're you've your yours yourself yourselves""".split()
)
