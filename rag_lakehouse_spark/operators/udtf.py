"""Python UDTF surface (Spark 3.5+/4.x table functions): one row in →
many typed rows out, callable from SQL via LATERAL. Used where the
expansion logic is easier in Python than as nested explode expressions;
for hot paths prefer the expression-based chunkers (operators.chunking).
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf


@udtf(returnType="sentence_no int, sentence string, n_words int")
class SplitSentences:
    """Sentence splitter table function: yields (sentence_no 1-based,
    sentence, word count) per input text."""

    def eval(self, text: str):  # noqa: D102
        if not text:
            return
        for i, s in enumerate(p for p in re.split(r"(?<=[.!?])\s+", text) if p.strip()):
            yield i + 1, s, len(s.split())


def register_udtfs(spark) -> None:
    """Register the engine's table functions for SQL use
    (``SELECT s.* FROM docs, LATERAL split_sentences(text) s``)."""
    spark.udtf.register("split_sentences", SplitSentences)
