"""Text-analysis operators as reusable DataFrame transforms — the
library form of the plans in plans.text_queries (those stay inline so
their oracle SQL sits next to the Spark plan; these are the composable
API surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rag_lakehouse_spark.functions import text as TX


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append n_tokens / stopword_ratio / avg_token_len."""
    tok = TX.tokens(text_col)
    n_tok = F.size(tok)
    return df.withColumns(
        {
            "n_tokens": n_tok,
            "stopword_ratio": TX.stopword_count(tok).cast("double") / n_tok,
            "avg_token_len": F.aggregate(tok, F.lit(0), lambda a, t: a + F.length(t)).cast(
                "double"
            )
            / n_tok,
        }
    )


def with_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    min_chars: int = 100,
    max_chars: int = 20000,
    max_punct_ratio: float = 0.1,
    max_digit_ratio: float = 0.3,
) -> DataFrame:
    """Append C4/Gopher-style quality ratios + a pass/fail gate.

    The ratio denominator is floored at 1 (mirroring the tokenizer's
    single-empty-token contract): an empty text scores 0.0 ratios
    instead of 0/0 NaN (or a divide-by-zero under ANSI mode) — and
    still fails the gate on the length band."""
    n = F.greatest(F.length(text_col), F.lit(1)).cast("double")
    punct = F.length(F.regexp_replace(text_col, "[^.,!?;:]", "")).cast("double") / n
    digit = F.length(F.regexp_replace(text_col, "[^0-9]", "")).cast("double") / n
    return df.withColumns(
        {
            "punct_ratio": punct,
            "digit_ratio": digit,
            "passes_quality": F.length(text_col).between(min_chars, max_chars)
            & (punct < max_punct_ratio)
            & (digit < max_digit_ratio),
        }
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the md5-of-normalized-text exact-dedup key."""
    return df.withColumn("fingerprint", TX.fingerprint(text_col))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row per distinct normalized content (smallest id wins).

    Scale: joins the tiny (fingerprint → canonical id) map back instead
    of shuffling full rows through a window over text."""
    keyed = with_fingerprint(df, text_col)
    canon = keyed.groupBy("fingerprint").agg(F.min(id_col).alias("__keep_id"))
    return (
        keyed.join(canon, "fingerprint")
        .filter(F.col(id_col) == F.col("__keep_id"))
        .drop("__keep_id", "fingerprint")
    )


def predict_lang(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append marker-stopword language prediction (pred_lang)."""
    tok = F.split(TX.edge_trim(F.lower(F.col(text_col))), TX.WS)

    def _marker_filter(markers: tuple[str, ...]):
        # factory keeps the lambda at arity 1 (a default arg would make
        # Spark bind the element index to the second parameter)
        return lambda t: t.isin(*markers)

    scores = {
        lang: F.size(F.filter(tok, _marker_filter(markers)))
        for lang, markers in TX.LANG_MARKERS.items()
        if lang != "zh"
    }
    pred = (
        F.when(
            (scores["en"] >= scores["de"])
            & (scores["en"] >= scores["fr"])
            & (scores["en"] >= scores["es"]),
            "en",
        )
        .when((scores["de"] >= scores["fr"]) & (scores["de"] >= scores["es"]), "de")
        .when(scores["fr"] >= scores["es"], "fr")
        .otherwise("es")
    )
    return df.withColumn("pred_lang", pred)


def boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document boilerplate detection (the C4/trafilatura line
    rule): a trimmed non-blank line occurring in ≥ ``min_docs``
    DISTINCT documents is boilerplate (nav bars, cookie banners,
    license footers). Returns (line, n_docs) for the flagged lines.

    Scale: one explode over line counts (linear in corpus bytes), one
    groupBy on the line text with map-side combine; the flagged set is
    small by definition (lines repeated across many docs collapse to
    one group each) — broadcastable downstream."""
    lines = (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")).alias(
                "raw_line"
            ),
        )
        .select(F.col(id_col), TX.edge_trim(F.col("raw_line")).alias("line"))
        .filter(F.col("line") != "")
    )
    return (
        lines.groupBy("line")
        .agg(F.countDistinct(id_col).cast("bigint").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def strip_boilerplate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
) -> DataFrame:
    """Remove boilerplate lines from every document, preserving the
    original order of surviving lines (blank lines survive — they are
    formatting, not boilerplate). Output: one row per input document
    with ``n_lines``, ``n_stripped``, and ``cleaned`` (the re-joined
    text; '' when everything was stripped or the text was NULL).

    Scale: the boilerplate set broadcasts into an anti-join against
    the exploded lines; the reassembly groupBy shuffles only the
    KEPT lines keyed by doc — the one unavoidable shuffle of any
    doc-reconstruction transform."""
    bp = boilerplate_lines(df, id_col, text_col, min_docs).select("line")
    lines = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("pos", "raw_line"),
    )
    kept = lines.join(
        F.broadcast(bp),
        TX.edge_trim(F.col("raw_line")) == F.col("line"),
        "left_anti",
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "raw_line"))),
                lambda s: s["raw_line"],
            ),
            "\n",
        ).alias("cleaned"),
    )
    totals = df.select(
        F.col(id_col),
        F.size(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")).cast(
            "bigint"
        ).alias("n_lines"),
    )
    return totals.join(rebuilt, id_col, "left").select(
        id_col,
        "n_lines",
        (F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0))).alias("n_stripped"),
        F.coalesce(F.col("cleaned"), F.lit("")).alias("cleaned"),
    )


def encoding_defect_flags(df: DataFrame) -> DataFrame:
    """(source, rep, moj, ctl) per document — the SHARED inject+detect
    step of the encoding-health family (``text_encoding_quality`` and
    its streaming twin fold the same flags, so batch and maintained
    counters cannot drift). Requires (doc_id, text, source). Known
    defects are injected from closed doc_id formulas (U+FFFD when
    doc_id%7==0, a UTF-8-as-cp1252 mojibake digraph when %5==0, a BEL
    when %11==0 — the media synth-writer pattern applied to text); the
    detectors are the REAL regexes from functions.text, so the oracled
    counts check the detectors, not the injection."""
    mut = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 7 == 0, F.lit("�")).otherwise(
            F.lit("")
        ),
        F.when(
            F.col("doc_id") % 5 == 0, F.lit("â€™")
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 11 == 0, F.lit("\x07")).otherwise(
            F.lit("")
        ),
    )
    return df.select(
        "source",
        TX.has_replacement_char(mut).alias("rep"),
        TX.has_mojibake_markers(mut).alias("moj"),
        TX.has_raw_control_chars(mut).alias("ctl"),
    )
