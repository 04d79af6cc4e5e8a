"""Keyword sentiment classifier as a Column expression.

Reference: /root/reference/jobs/spark_news_consumer.py:27-34
(``classify_news`` Python UDF). Re-expressed as a codegen-friendly
``F.when`` chain over ``contains`` — no Python in the hot path.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

NEGATIVE_WORDS = ["accident", "strike", "crash", "delay", "protest"]
POSITIVE_WORDS = ["smooth", "sunny", "festival", "celebration"]


def _contains_any(lowered: Column, words: list[str]) -> Column:
    return reduce(lambda a, b: a | b, (lowered.contains(w) for w in words))


def sentiment(headline: Column) -> Column:
    lowered = F.lower(headline)
    return (
        F.when(_contains_any(lowered, NEGATIVE_WORDS), F.lit("negative"))
        .when(_contains_any(lowered, POSITIVE_WORDS), F.lit("positive"))
        .otherwise(F.lit("neutral"))
    )


def sentiment_sql(headline: str) -> str:
    neg = " OR ".join(f"lower({headline}) LIKE '%{w}%'" for w in NEGATIVE_WORDS)
    pos = " OR ".join(f"lower({headline}) LIKE '%{w}%'" for w in POSITIVE_WORDS)
    return (
        f"CASE WHEN {neg} THEN 'negative' "
        f"WHEN {pos} THEN 'positive' ELSE 'neutral' END"
    )
