"""Python UDTF surface (Spark 3.5+/4.x table functions): one row in →
many typed rows out, callable from SQL via LATERAL. Used where the
expansion logic is easier in Python than as nested explode expressions;
for hot paths prefer the expression-based chunkers (operators.chunking).
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf


# Whitespace is the explicit ASCII class, NOT \s: Python re's \s matches
# Unicode whitespace, Java's \s is ASCII, and DuckDB's RE2 \s is a third
# set — pinning [ \t\n\r\f\v] makes the sentence contract identical in
# the UDTF, the F.split expression twin, and the DuckDB oracle.
_WS = " \t\n\r\f\v"
_SENT_SPLIT = re.compile(r"(?<=[.!?])[ \t\n\r\f\v]+")
_WORD = re.compile(r"[^ \t\n\r\f\v]+")


@udtf(returnType="sentence_no int, sentence string, n_words int")
class SplitSentences:
    """Sentence splitter table function: yields (sentence_no 1-based,
    sentence, word count) per input text."""

    def eval(self, text: str):  # noqa: D102
        if not text:
            return
        for i, s in enumerate(p for p in _SENT_SPLIT.split(text) if p.strip(_WS)):
            yield i + 1, s, len(_WORD.findall(s))


def register_udtfs(spark) -> None:
    """Register the engine's table functions for SQL use
    (``SELECT s.* FROM docs, LATERAL split_sentences(text) s``)."""
    spark.udtf.register("split_sentences", SplitSentences)
