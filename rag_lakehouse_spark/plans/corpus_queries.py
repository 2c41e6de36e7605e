"""Training-corpus governance queries: benchmark decontamination, PII
redaction, and the composed C4-style cleaning pipeline. These are the
operational day-2 queries of an LLM data pipeline, built from the
engine's text primitives (functions.text) so the DuckDB oracles reuse
the same fuzz-verified twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rag_lakehouse_spark.functions import text as TX
from rag_lakehouse_spark.functions import vector as VEC
from rag_lakehouse_spark.plans.registry import register
from rag_lakehouse_spark.sources.tables import load_table

_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"


@register(
    "corpus_decontaminate",
    oracle=f"""
    WITH bench AS (
      SELECT DISTINCT unnest({TX.duckdb_char_shingles('text', 13)}) AS sh
      FROM documents WHERE doc_id < 10
    ), doc_sh AS (
      SELECT doc_id, unnest({TX.duckdb_char_shingles('text', 13)}) AS sh
      FROM documents WHERE doc_id >= 10
    )
    SELECT doc_id, CAST(COUNT(DISTINCT doc_sh.sh) AS BIGINT) AS n_shared
    FROM doc_sh JOIN bench USING (sh)
    GROUP BY doc_id
    """,
    tags=("text", "decontamination", "training-data"),
)
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (the standard 13-gram collision
    check): docs sharing any normalized 13-gram with the benchmark set
    (here: doc_id < 10 stands in for an eval suite), with the shared
    count per doc.

    Scale: the benchmark's distinct shingle set is tiny by construction
    (eval suites, not corpora) → broadcast hash join against the
    corpus-side shingle explode; the only shuffle is the per-doc count.
    The corpus text itself never shuffles."""
    d = load_table(spark, sf_dir, "documents")
    bench = (
        TX.shingle_relation(d.filter(F.col("doc_id") < 10), "text", "doc_id", 13)
        .select(F.explode("shingles").alias("sh"))
        .distinct()
    )
    corpus = TX.shingle_relation(
        d.filter(F.col("doc_id") >= 10), "text", "doc_id", 13
    ).select("doc_id", F.explode("shingles").alias("sh"))
    return (
        corpus.join(F.broadcast(bench), "sh")
        .groupBy("doc_id")
        .agg(F.countDistinct("sh").alias("n_shared"))
    )


@register(
    "corpus_decontaminate_containment",
    oracle=f"""
    WITH bench_sh AS (
      SELECT DISTINCT bench_id, sh FROM (
        SELECT doc_id AS bench_id,
               unnest({TX.duckdb_char_shingles('text', 13)}) AS sh
        FROM documents WHERE doc_id < 10)
    ), bench_n AS (
      SELECT bench_id, CAST(COUNT(*) AS BIGINT) AS n_bench
      FROM bench_sh GROUP BY bench_id
    ), corpus_sh AS (
      SELECT doc_id, unnest({TX.duckdb_char_shingles('text', 13)}) AS sh
      FROM documents WHERE doc_id >= 10
    ), hits AS (
      SELECT c.doc_id, b.bench_id,
             CAST(COUNT(DISTINCT c.sh) AS BIGINT) AS n_shared
      FROM corpus_sh c JOIN bench_sh b USING (sh)
      GROUP BY c.doc_id, b.bench_id
    )
    SELECT h.doc_id, h.bench_id, h.n_shared, n.n_bench,
           CAST(h.n_shared AS DOUBLE) / n.n_bench AS containment,
           h.n_shared * 10 >= n.n_bench * 8 AS contaminated
    FROM hits h JOIN bench_n n USING (bench_id)
    """,
    tags=("text", "decontamination", "training-data"),
)
def corpus_decontaminate_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-benchmark-item CONTAINMENT decontamination — the
    complement of ``corpus_decontaminate``'s pooled collision count:
    for every (corpus doc, benchmark item) pair sharing any normalized
    13-gram, report |∩| / |benchmark item's shingles|. Containment
    (not Jaccard) is the right asymmetric measure here: a benchmark
    question quoted inside a much larger page scores near 1.0 even
    though the page's Jaccard to the item is tiny — the case pooled
    counting under-attributes. The θ=0.8 flag is the integer compare
    ``n_shared * 10 >= n_bench * 8`` (no float threshold divergence);
    the reported containment double is one exact int/int division,
    bit-identical cross-engine.

    Scale: benchmark shingles are bounded (eval suites, not corpora)
    → both the per-item sets and their sizes broadcast; the corpus
    side explodes once and never shuffles its text; the only shuffle
    carries (doc_id, bench_id, shingle) join hits into the pair
    count. Dedup happens via COUNT(DISTINCT) inside that aggregate,
    not a pre-join distinct over the full corpus shingle set."""
    d = load_table(spark, sf_dir, "documents")
    bench_sh = (
        TX.shingle_relation(d.filter(F.col("doc_id") < 10), "text", "doc_id", 13)
        .select(F.col("doc_id").alias("bench_id"), F.explode("shingles").alias("sh"))
        .distinct()
    )
    bench_n = bench_sh.groupBy("bench_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bench")
    )
    corpus = TX.shingle_relation(
        d.filter(F.col("doc_id") >= 10), "text", "doc_id", 13
    ).select("doc_id", F.explode("shingles").alias("sh"))
    hits = (
        corpus.join(F.broadcast(bench_sh), "sh")
        .groupBy("doc_id", "bench_id")
        .agg(F.countDistinct("sh").alias("n_shared"))
    )
    return hits.join(F.broadcast(bench_n), "bench_id").select(
        "doc_id",
        "bench_id",
        "n_shared",
        "n_bench",
        (F.col("n_shared").cast("double") / F.col("n_bench")).alias("containment"),
        (F.col("n_shared") * 10 >= F.col("n_bench") * 8).alias("contaminated"),
    )


@register(
    "text_pii_redact",
    oracle=f"""
    WITH synth AS (
      SELECT doc_id,
             text || ' contact user' || doc_id || '@example.com or +1-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '.' AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_EMAIL}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PHONE}')) AS BIGINT) AS n_phones,
           md5(regexp_replace(regexp_replace(t, '{_EMAIL}', '[EMAIL]', 'g'),
                              '{_PHONE}', '[PHONE]', 'g')) AS redacted_md5
    FROM synth
    """,
    tags=("text", "pii", "training-data"),
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: email/phone detection counts + the md5 of the
    redacted text. The synthetic corpus carries no PII, so each doc
    deterministically synthesizes one email + one phone from its id
    (identically in both engines) — the regexes then have real matches
    to find and strip, and the md5 proves the redacted BYTES agree
    cross-engine, not just the counts.

    Scale: pure codegen map work (regexp per row), no shuffle — 100 TB
    is embarrassingly parallel; patterns chosen to parse identically
    in Java regex and RE2."""
    d = load_table(spark, sf_dir, "documents")
    synth = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit("."),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(synth, _EMAIL, "[EMAIL]"), _PHONE, "[PHONE]"
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(synth, F.lit(_EMAIL), 0)).cast("bigint").alias("n_emails"),
        F.size(F.regexp_extract_all(synth, F.lit(_PHONE), 0)).cast("bigint").alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )


@register(
    "corpus_clean_pipeline",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id, source, text,
             length(text) AS n,
             length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS np,
             length(regexp_replace(text, '[^0-9]', '', 'g')) AS nd
      FROM documents WHERE lang = 'en'
    ), quality AS (
      SELECT * FROM feats
      WHERE n BETWEEN 100 AND 20000
        AND CAST(np AS DOUBLE) / n < 0.1
        AND CAST(nd AS DOUBLE) / n < 0.3
    ), canon AS (
      SELECT {TX.duckdb_fingerprint('text')} AS fp, MIN(doc_id) AS keep
      FROM quality GROUP BY 1
    ), deduped AS (
      SELECT q.* FROM quality q
      JOIN canon ON {TX.duckdb_fingerprint('q.text')} = fp AND q.doc_id = keep
    ), sampled AS (
      SELECT * FROM deduped WHERE substring(md5(text), 1, 2) < '80'
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS n_chars,
           CAST(SUM(np) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS punct_per_char
    FROM sampled GROUP BY source
    """,
    tags=("text", "pipeline", "training-data"),
)
def corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed C4-style cleaning pipeline in ONE plan: language
    filter → quality gate (length band + punct/digit density) → exact
    dedup (md5-of-normalized fingerprint, min-id canonical) → 50%
    deterministic content-hash sample → per-source corpus stats. Each
    stage is an already-oracled primitive; this query proves they
    COMPOSE without a materialization between stages.

    Scale: filters and ratios evaluate at the scan; the only shuffles
    are the fingerprint aggregate (32-byte keys) and the final tiny
    per-source stats. The mean punct density is exact (integer sums
    divided once), not an order-dependent average of doubles."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    n = F.length("text")
    np_ = F.length(F.regexp_replace("text", "[^.,!?;:]", ""))
    nd = F.length(F.regexp_replace("text", "[^0-9]", ""))
    feats = d.select(
        "doc_id", "source", "text", n.alias("n"), np_.alias("np"), nd.alias("nd")
    )
    quality = feats.filter(
        F.col("n").between(100, 20000)
        & (F.col("np").cast("double") / F.col("n") < 0.1)
        & (F.col("nd").cast("double") / F.col("n") < 0.3)
    )
    # min-id canonical per fingerprint in ONE aggregate (r15) — same
    # rewrite as corpus_export_manifest: one fingerprint evaluation,
    # one exchange of winner candidates instead of canon-agg + semi-join
    # shuffling every row's text by fp.
    deduped = (
        quality.groupBy(TX.fingerprint("text").alias("fp"))
        .agg(F.min(F.struct("doc_id", "source", "text", "n", "np", "nd")).alias("w"))
        .select("w.doc_id", "w.source", "w.text", "w.n", "w.np", "w.nd")
    )
    sampled = deduped.filter(F.substring(F.md5("text"), 1, 2) < "80")
    return sampled.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n").cast("bigint").alias("n_chars"),
        (F.sum("np").cast("double") / F.sum("n").cast("double")).alias("punct_per_char"),
    )


# ---------------------------------------------------------------------------
# Exact-substring (k-token window) dedup — Lee et al. 2021 span-level
# dedup (operators/substring_dedup.py). Both queries share one DuckDB
# CTE chain replicating windows → ownership → duplicate occurrences
# over the portable base60 hash.
# ---------------------------------------------------------------------------

from rag_lakehouse_spark.operators.dedup_portable import duckdb_base60  # noqa: E402
from rag_lakehouse_spark.operators.substring_dedup import (  # noqa: E402
    DEFAULT_K,
    dup_span_stats,
    strip_duplicate_spans,
)

_DUCK_DEDUP_TOKS = (
    "regexp_split_to_array(" + TX.duckdb_edge_trim("lower(coalesce(text, ''))") + ", '" + TX.DUCKDB_WS + "')"
)


def _duckdb_dup_window_ctes(k: int = DEFAULT_K) -> str:
    """CTE chain (no leading WITH) ending in ``dup(doc_id, pos)`` — the
    non-owned occurrences of globally-duplicated k-token windows."""
    win_text = f"array_to_string(toks[pos:pos+{k - 1}], ' ')"
    return f"""base AS (
      SELECT doc_id, {_DUCK_DEDUP_TOKS} AS toks FROM documents
    ),
    wins AS (
      SELECT doc_id, pos, {duckdb_base60(win_text)} AS whash
      FROM (SELECT doc_id, toks,
                   unnest(generate_series(1, len(toks) - {k - 1})) AS pos
            FROM base WHERE len(toks) >= {k})
    ),
    occ AS (SELECT whash, COUNT(*) AS cnt, MIN(doc_id) AS odoc
            FROM wins GROUP BY whash),
    own AS (SELECT w.whash, o.cnt, o.odoc, MIN(w.pos) AS opos
            FROM wins w JOIN occ o ON o.whash = w.whash AND w.doc_id = o.odoc
            GROUP BY w.whash, o.cnt, o.odoc),
    dup AS (SELECT w.doc_id, w.pos
            FROM wins w JOIN own o ON o.whash = w.whash
            WHERE o.cnt > 1 AND NOT (w.doc_id = o.odoc AND w.pos = o.opos))"""


@register(
    "corpus_dup_span_stats",
    oracle=f"""
    WITH {_duckdb_dup_window_ctes()},
    wstats AS (SELECT doc_id, COUNT(*) AS n_windows FROM wins GROUP BY doc_id),
    dstats AS (SELECT doc_id, COUNT(*) AS n_dup FROM dup GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(w.n_windows, 0) AS n_windows,
           COALESCE(s.n_dup, 0) AS n_dup_windows,
           CASE WHEN COALESCE(w.n_windows, 0) = 0 THEN 0e0
                ELSE CAST(COALESCE(s.n_dup, 0) AS DOUBLE) / w.n_windows
           END AS dup_fraction
    FROM documents d
    LEFT JOIN wstats w ON w.doc_id = d.doc_id
    LEFT JOIN dstats s ON s.doc_id = d.doc_id
    """,
    tags=("text", "dedup", "substring", "training-data"),
)
def corpus_dup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span fraction: the share of k-token
    sliding windows that are non-owned occurrences of a window seen
    elsewhere in the corpus (first occurrence owns; Lee et al. 2021
    exact-substring dedup, window granularity). The corpus-health
    signal behind ``corpus_strip_dup_spans``.

    Scale: windows are one codegen transform per doc; the only wide
    exchange is the groupBy on the uniform 60-bit window hash. See
    operators/substring_dedup.py.
    """
    return dup_span_stats(load_table(spark, sf_dir, "documents"))


@register(
    "corpus_strip_dup_spans",
    oracle=f"""
    WITH {_duckdb_dup_window_ctes()},
    cov AS (
      SELECT DISTINCT doc_id, tpos FROM (
        SELECT doc_id, unnest(generate_series(pos, pos + {DEFAULT_K - 1})) AS tpos
        FROM dup)
    ),
    tokrows AS (
      SELECT doc_id,
             unnest(generate_series(1, len(toks))) AS tpos,
             unnest(toks) AS tok
      FROM base
    ),
    kept AS (
      SELECT t.doc_id, t.tpos, t.tok
      FROM tokrows t
      LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.tpos = t.tpos
      WHERE c.doc_id IS NULL
    ),
    rebuilt AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             string_agg(tok, ' ' ORDER BY tpos) AS text_clean
      FROM kept GROUP BY doc_id
    )
    SELECT b.doc_id,
           len(b.toks) AS n_tokens,
           len(b.toks) - COALESCE(r.n_kept, 0) AS n_removed,
           md5(COALESCE(r.text_clean, '')) AS clean_md5
    FROM base b LEFT JOIN rebuilt r ON r.doc_id = b.doc_id
    """,
    tags=("text", "dedup", "substring", "training-data"),
)
def corpus_strip_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actual span-level cleaning transform: every token covered by
    a non-owned duplicate window removed, remaining tokens rejoined in
    order; verified by md5 of the reconstructed text (scalar output —
    the driver canonicalizer's contract — and byte-exact evidence the
    reconstruction matches across engines).

    Scale: covered positions are |dup_windows| × k rows deduplicated
    per (doc, pos); reassembly is a per-doc sort of kept tokens —
    bounded by document length, shuffled on the doc id.
    """
    out = strip_duplicate_spans(load_table(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        "n_tokens",
        "n_removed",
        F.md5(F.col("text_clean")).alias("clean_md5"),
    )


# ---------------------------------------------------------------------------
# DSIR-style importance selection (Xie et al. 2023, arXiv 2302.03169:
# Data Selection for Language Models via Importance Resampling) —
# hashed n-gram bucket models of a TARGET distribution vs the RAW pool,
# per-document importance scores, top-k selection.
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 256


@register(
    "corpus_dsir_select",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id, lang,
             ({duckdb_base60('feat')}) % {_DSIR_BUCKETS} AS bucket
      FROM (
        SELECT doc_id, lang, unnest({_DUCK_DEDUP_TOKS}) AS feat FROM documents
        UNION ALL
        SELECT doc_id, lang,
               unnest(list_transform(generate_series(1, len({_DUCK_DEDUP_TOKS}) - 1),
                      i -> array_to_string(({_DUCK_DEDUP_TOKS})[i:i+1], ' '))) AS feat
        FROM documents
      )
    ),
    bucket_stats AS (
      SELECT bucket,
             COUNT(*) FILTER (lang = 'en') AS t_b,
             COUNT(*) AS r_b
      FROM feats GROUP BY bucket
    ),
    totals AS (
      SELECT CAST(SUM(t_b) AS BIGINT) AS t_total,
             CAST(SUM(r_b) AS BIGINT) AS r_total
      FROM bucket_stats
    ),
    leaning AS (
      SELECT bucket,
             (t_b + 1) * (r_total + {_DSIR_BUCKETS})
               > (r_b + 1) * (t_total + {_DSIR_BUCKETS}) AS target_leaning
      FROM bucket_stats, totals
    ),
    doc_scores AS (
      SELECT f.doc_id,
             COUNT(*) AS n_feats,
             COUNT(*) FILTER (l.target_leaning) AS n_target_feats
      FROM feats f JOIN leaning l ON l.bucket = f.bucket
      GROUP BY f.doc_id
    )
    SELECT s.doc_id, d.lang, s.n_feats, s.n_target_feats,
           CAST(s.n_target_feats AS DOUBLE) / s.n_feats AS importance_score
    FROM doc_scores s JOIN documents d ON d.doc_id = s.doc_id
    ORDER BY importance_score DESC, s.doc_id
    LIMIT 100
    """,
    tags=("text", "selection", "dsir", "training-data"),
)
def corpus_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection: hashed n-gram features (unigrams +
    bigrams → 256 buckets via the portable base60 hash), add-1-smoothed
    bucket counts for the TARGET distribution (here: ``lang='en'``
    stands in for the downstream-domain sample) vs the RAW pool (all
    docs), then per-document importance scores and top-100 selection.

    Exactness variant: full DSIR weights each feature by the bucket
    log-likelihood ratio ``log p_target(b)/p_raw(b)``; this engine
    scores each feature by the SIGN of that ratio — the integer
    cross-multiplication ``(t_b+1)(R+B) > (r_b+1)(T+B)`` is the exact
    same decision boundary with no transcendentals, so the result is
    bit-reproducible across engines (the registry's float-determinism
    rule; sum-of-signs replaces sum-of-magnitudes). At 100 TB the
    integer products approach int64 limits — the production variant
    computes the LLR in double log-space per the paper, losing only the
    cross-engine hash check, or keeps exactness via DECIMAL(38).

    Scale: features shuffle once on the 256-way bucket key for stats,
    once on doc_id for scores; the bucket model (256 rows) broadcasts;
    top-k is TakeOrderedAndProject. Bigrams reuse
    ``substring_dedup.token_windows`` (k=2) — one transform pass.
    """
    from rag_lakehouse_spark.operators.substring_dedup import token_windows

    d = load_table(spark, sf_dir, "documents")
    toks = F.split(
        TX.edge_trim(F.lower(F.coalesce(F.col("text"), F.lit("")))), TX.WS
    )
    unigrams = d.select(
        F.col("doc_id"), F.col("lang"), F.explode(toks).alias("feat")
    )
    bigrams = token_windows(d, k=2, hash_fn=lambda c: c).select(
        "doc_id", F.col("whash").alias("feat")
    ).join(d.select("doc_id", "lang"), "doc_id")
    from rag_lakehouse_spark.operators.dedup_portable import base60

    feats = (
        unigrams.unionByName(bigrams.select("doc_id", "lang", "feat"))
        .select(
            "doc_id",
            "lang",
            (base60(F.col("feat")) % _DSIR_BUCKETS).alias("bucket"),
        )
        .localCheckpoint(eager=True)  # consumed twice: bucket stats + doc scores
    )
    bucket_stats = feats.groupBy("bucket").agg(
        F.count(F.when(F.col("lang") == "en", 1)).alias("t_b"),
        F.count(F.lit(1)).alias("r_b"),
    )
    totals = bucket_stats.agg(
        F.sum("t_b").alias("t_total"), F.sum("r_b").alias("r_total")
    )
    leaning = bucket_stats.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            (F.col("t_b") + 1) * (F.col("r_total") + _DSIR_BUCKETS)
            > (F.col("r_b") + 1) * (F.col("t_total") + _DSIR_BUCKETS)
        ).alias("target_leaning"),
    )
    doc_scores = (
        feats.join(F.broadcast(leaning), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.count(F.when(F.col("target_leaning"), 1)).alias("n_target_feats"),
        )
    )
    return (
        doc_scores.join(d.select("doc_id", "lang"), "doc_id")
        .select(
            "doc_id",
            "lang",
            "n_feats",
            "n_target_feats",
            (F.col("n_target_feats").cast("double") / F.col("n_feats")).alias(
                "importance_score"
            ),
        )
        .orderBy(F.desc("importance_score"), F.asc("doc_id"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Training-mixture planner: token-budget → per-language deterministic
# sampling thresholds → audited mixture. The data-driven step ABOVE
# sample_stratified_docs (which applies fixed per-stratum rates).
# ---------------------------------------------------------------------------

# Target mixture in parts-per-thousand (integers — the plan arithmetic
# stays exact end to end) and the token budget the mixture must fit.
_MIX_WEIGHTS_PPT = {"en": 500, "de": 125, "fr": 125, "es": 125, "zh": 125}
_MIX_BUDGET_TOKENS = 10_000
_H32 = 1 << 32


@register(
    "corpus_mixture_plan",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             len(regexp_split_to_array(regexp_replace(lower(coalesce(text, '')), '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g'),
                 '{TX.DUCKDB_WS}')) AS n_toks,
             (('0x' || substr(md5(text), 1, 8))::BIGINT) AS h32
      FROM documents
    ),
    lang_stats AS (
      SELECT lang, COUNT(*) AS n_docs,
             CAST(SUM(n_toks) AS BIGINT) AS n_tokens
      FROM toks GROUP BY lang
    ),
    planned AS (
      SELECT lang, n_docs, n_tokens,
             CASE lang {" ".join(f"WHEN '{k}' THEN {v}" for k, v in _MIX_WEIGHTS_PPT.items())}
                  ELSE 0 END AS weight_ppt,
             LEAST({_H32},
                   ({_MIX_BUDGET_TOKENS} * (CASE lang {" ".join(f"WHEN '{k}' THEN {v}" for k, v in _MIX_WEIGHTS_PPT.items())} ELSE 0 END) * {_H32})
                     // (1000 * n_tokens)) AS threshold
      FROM lang_stats
    )
    SELECT p.lang, p.n_docs, p.n_tokens, p.weight_ppt, p.threshold,
           COUNT(*) FILTER (t.h32 < p.threshold) AS n_sampled,
           CAST(COALESCE(SUM(t.n_toks) FILTER (t.h32 < p.threshold), 0) AS BIGINT)
             AS sampled_tokens
    FROM planned p JOIN toks t ON t.lang = p.lang
    GROUP BY p.lang, p.n_docs, p.n_tokens, p.weight_ppt, p.threshold
    """,
    tags=("sampling", "mixture", "training-data"),
)
def corpus_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture planning + deterministic execution in one pass:
    given target language weights (parts-per-thousand) and a global
    token budget, derive each language's hash-sampling threshold
    ``min(2^32, budget·weight·2^32 / (1000·lang_tokens))`` — all
    INTEGER arithmetic, so the plan is bit-reproducible — then apply it
    via the md5-prefix rule (same doc → same decision, composable and
    auditable; see sample_stratified_docs) and report achieved counts
    per language. In expectation ``sampled_tokens ≈ budget·weight``;
    languages with fewer tokens than their allocation saturate at
    threshold 2^32 (take everything).

    Scale: one tokenize+hash map pass, one groupBy(lang) for stats, a
    5-row broadcast back, one conditional re-aggregation — no
    all-corpus shuffle beyond the lang groupBy. The integer products
    are bounded by budget·weight·2^32 (~2e16), independent of corpus
    size — no overflow at any scale.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.size(
            F.split(TX.edge_trim(F.lower(F.coalesce(F.col("text"), F.lit("")))), TX.WS)
        ).alias("n_toks"),
        F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("bigint").alias("h32"),
    )
    lang_stats = toks.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("n_tokens"),
    )
    weight = F.coalesce(
        *[
            F.when(F.col("lang") == k, F.lit(v))
            for k, v in _MIX_WEIGHTS_PPT.items()
        ],
        F.lit(0),
    )
    # Threshold arithmetic must be INTEGER division end to end: the
    # product budget·weight·2^32 (~2e16) exceeds double's exact range,
    # so a float `/` + cast could truncate differently from DuckDB's
    # exact `//`. Spark's `DIV` is exact int64 division, matching it.
    planned = lang_stats.select(
        "lang", "n_docs", "n_tokens", weight.alias("weight_ppt")
    ).selectExpr(
        "lang",
        "n_docs",
        "n_tokens",
        "weight_ppt",
        f"least(CAST({_H32} AS BIGINT), "
        f"({_MIX_BUDGET_TOKENS}L * weight_ppt * {_H32}L) DIV (1000L * n_tokens)"
        ") AS threshold",
    )
    joined = toks.join(F.broadcast(planned), "lang")
    sampled = F.when(F.col("h32") < F.col("threshold"), F.col("n_toks"))
    return joined.groupBy(
        "lang", "n_docs", "n_tokens", "weight_ppt", "threshold"
    ).agg(
        F.count(sampled).alias("n_sampled"),
        F.coalesce(F.sum(sampled), F.lit(0)).cast("bigint").alias("sampled_tokens"),
    )


# SemDeDup-style decontamination dial: p90 of the max-benchmark-cosine
# distribution at sf0.01 (measured 0.32), so ~10% of the corpus is near
# enough to an eval vector to be dropped.
SEMANTIC_DECON_THRESHOLD = 0.32


_BENCH_NRM = f"sqrt({VEC.duckdb_dot('embedding', 'embedding')})"


@register(
    "corpus_semantic_decontaminate",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding, {_BENCH_NRM} AS nrm FROM embeddings),
    bench AS (SELECT * FROM e WHERE vec_id % 23 = 0),
    corpus AS (SELECT * FROM e WHERE vec_id % 23 <> 0),
    s AS (
      SELECT c.vec_id,
             MAX(({VEC.duckdb_dot('c.embedding', 'b.embedding')})
                 / (c.nrm * b.nrm + 1e-24)) AS max_benchmark_sim
      FROM corpus c CROSS JOIN bench b GROUP BY 1
    )
    SELECT d.doc_id, d.lang, d.source, s.max_benchmark_sim
    FROM documents d JOIN s ON s.vec_id = d.doc_id
    WHERE s.max_benchmark_sim < {{thr}}
    """.replace("{thr}", "0.32"),
    tags=("vector", "decontamination", "training-data"),
)
def corpus_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-space) benchmark decontamination — the
    complement of ``corpus_decontaminate``'s lexical 13-gram check:
    docs whose embedding is cosine-close to ANY held-out benchmark
    vector (every 23rd vec_id stands in for an embedded eval suite)
    are dropped; survivors report their max benchmark similarity.
    Catches paraphrased/reworded eval leakage that shares no 13-gram.

    Scale: the benchmark side is tiny by construction -> broadcast
    nested-loop against the corpus, norms hoisted per side, one dot
    fold per (corpus, bench) pair; the per-vector MAX combines
    map-side so the only shuffle carries one row per corpus vector.
    The doc join is a hash join on doc_id = vec_id."""
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "nrm", VEC.l2_norm("embedding")
    )
    bench = e.filter(F.col("vec_id") % 23 == 0).select(
        F.col("embedding").alias("b_emb"), F.col("nrm").alias("b_nrm")
    )
    scored = (
        e.filter(F.col("vec_id") % 23 != 0)
        .crossJoin(F.broadcast(bench))
        .select(
            "vec_id",
            (
                VEC.dot("embedding", "b_emb")
                / (F.col("nrm") * F.col("b_nrm") + F.lit(1e-24))
            ).alias("s"),
        )
        .groupBy("vec_id")
        .agg(F.max("s").alias("max_benchmark_sim"))
    )
    d = load_table(spark, sf_dir, "documents")
    return (
        d.join(scored, d.doc_id == scored.vec_id)
        .filter(F.col("max_benchmark_sim") < SEMANTIC_DECON_THRESHOLD)
        .select("doc_id", "lang", "source", "max_benchmark_sim")
    )


@register(
    "corpus_shard_export",
    oracle="""
    WITH h AS (
      SELECT doc_id, n_chars,
             (('0x' || substr(md5('shard:1337:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT) AS h
      FROM documents
    )
    SELECT doc_id, h % 8 AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS BIGINT) AS pos,
           n_chars
    FROM h
    """,
    tags=("training-data", "export", "layout"),
)
def corpus_shard_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seed-reproducible sharded export plan (the order a training run
    reads): portable-hash shard assignment + dense within-shard
    positions, independent of partitioning and rerun-stable — training
    provenance becomes a (snapshot, seed) pair. ``sources.layout.
    write_sharded`` materializes this plan as shard-partitioned
    parquet (pytest-verified byte-identical across reruns); the query
    exposes the plan itself for the differential check.

    Scale: hash is map work; one shuffle hash-partitioned on shard,
    per-shard sorts are independent (see ``sources.layout.shard_plan``)."""
    from rag_lakehouse_spark.sources.layout import shard_plan

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return shard_plan(d, id_col="doc_id", n_shards=8, seed=1337).select(
        "doc_id", "shard", "pos", "n_chars"
    )


@register(
    "corpus_boilerplate_strip",
    oracle="""
    WITH l AS (
      SELECT doc_id,
             unnest(string_split(coalesce(text, ''), chr(10))) AS raw_line,
             generate_subscripts(string_split(coalesce(text, ''), chr(10)), 1) AS pos
      FROM documents
    ), bp AS (
      SELECT regexp_replace(raw_line, '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g') AS line FROM l WHERE regexp_replace(raw_line, '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g') <> ''
      GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2
    ), kept AS (
      SELECT doc_id, pos, raw_line FROM l
      WHERE regexp_replace(raw_line, '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g') NOT IN (SELECT line FROM bp)
    ), reb AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             string_agg(raw_line, chr(10) ORDER BY pos) AS cleaned
      FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len(string_split(coalesce(d.text, ''), chr(10))) AS BIGINT) AS n_lines,
           CAST(len(string_split(coalesce(d.text, ''), chr(10)))
                - COALESCE(reb.n_kept, 0) AS BIGINT) AS n_stripped,
           COALESCE(reb.cleaned, '') AS cleaned
    FROM documents d LEFT JOIN reb USING (doc_id)
    """,
    tags=("text", "boilerplate", "training-data"),
)
def corpus_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/trafilatura-style cross-document boilerplate removal: any
    trimmed line occurring in ≥2 distinct docs (nav bars, banners,
    footers) is stripped from every document, surviving lines rejoined
    in original order. The fixture corpus is single-line-per-doc so
    stripping only fires on exact-dup docs there; the generated-corpus
    fuzz (multi-line docs with shared lines) exercises the real
    behavior — same pattern as the NULL/unicode edges elsewhere.

    Scale: line explode is linear; the line-frequency groupBy combines
    map-side; the boilerplate set broadcasts into an anti-join; only
    KEPT lines shuffle for reassembly (see ``operators.text.
    strip_boilerplate``)."""
    from rag_lakehouse_spark.operators.text import strip_boilerplate

    d = load_table(spark, sf_dir, "documents")
    return strip_boilerplate(d, id_col="doc_id", text_col="text", min_docs=2)


@register(
    "corpus_bpe_merges",
    oracle=None,  # iterative argmax loop — no SQL twin; pytest runs a
    # pure-Python reference trainer differentially (tests/test_bpe.py)
    tags=("text", "tokenizer", "training-data", "iterative"),
)
def corpus_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer induction over the corpus: the first 24 learned
    merge rules (rank, left, right, merged, pair_count) from iterative
    distributed pair counting on the word-frequency table. See
    ``operators.bpe`` for the algorithm and the scale argument (each
    round aggregates the VOCABULARY, not the corpus; driver state is
    one winning pair per round)."""
    from rag_lakehouse_spark.operators.bpe import train_merges, word_counts

    d = load_table(spark, sf_dir, "documents")
    # the fixture vocabulary is tiny (dozens of types) — 4 partitions
    # keep the 24 iteration rounds from scheduling mostly-empty tasks;
    # at web scale leave the word table at its natural shuffle width
    rules = train_merges(word_counts(d).repartition(4), n_merges=24)
    return spark.createDataFrame(
        [(r, l, rt, l + rt, c) for r, l, rt, c in rules],
        "rank int, left string, right string, merged string, pair_count bigint",
    )


@register(
    "corpus_export_manifest",
    oracle=f"""
    WITH gated AS (
      SELECT doc_id, text, n_chars FROM documents
      WHERE lang = 'en' AND n_chars BETWEEN 100 AND 20000
    ), canon AS (
      SELECT {TX.duckdb_fingerprint('text')} AS fp, MIN(doc_id) AS keep
      FROM gated GROUP BY 1
    ), deduped AS (
      SELECT g.* FROM gated g
      JOIN canon ON {TX.duckdb_fingerprint('g.text')} = fp AND g.doc_id = keep
    ), bench AS (
      SELECT DISTINCT unnest({TX.duckdb_char_shingles('text', 13)}) AS sh
      FROM documents WHERE doc_id < 10
    ), contaminated AS (
      SELECT DISTINCT d.doc_id
      FROM (SELECT doc_id, unnest({TX.duckdb_char_shingles('text', 13)}) AS sh
            FROM deduped) d
      JOIN bench USING (sh)
    ), clean AS (
      SELECT doc_id, n_chars FROM deduped
      WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    ), planned AS (
      SELECT doc_id, n_chars,
             (('0x' || substr(md5('shard:1337:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT) AS h
      FROM clean
    ), final AS (
      SELECT doc_id, n_chars, h % 8 AS shard,
             ROW_NUMBER() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS pos
      FROM planned
    )
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY pos)) AS order_md5
    FROM final GROUP BY shard
    """,
    tags=("training-data", "pipeline", "export", "composition"),
)
def corpus_export_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END export decision in one plan: quality gate
    (lang + length band) → exact dedup (min-id canonical per
    fingerprint) → 13-gram benchmark decontamination → seed-1337
    portable-hash shard/order assignment → per-shard manifest with an
    ``order_md5`` over the comma-joined doc_ids in position order —
    the hash a training job verifies before trusting a shard. Every
    stage is an already-oracled primitive; this row proves the full
    composition, order included, byte-for-byte across engines.

    Scale: gates at the scan; dedup shuffles 32-byte fingerprints;
    the benchmark shingle set broadcasts into an anti-join; the shard
    window sorts each shard independently. Nothing materializes
    between stages.

    BOUNDED-SHARD CONTRACT (the one non-streaming buffer): the
    ``order_md5`` aggregate buffers one (pos, doc_id) struct — ~16
    bytes — per doc of a shard in a single agg buffer, so memory per
    shard is O(shard size). That is the operating contract of a
    training export, not an accident: shards are sized for training
    I/O (n_shards is chosen so a shard is ~1-4 GB / low-millions of
    docs ⇒ tens of MB of digest buffer), and the shard count grows
    with the corpus while the shard SIZE stays fixed. If a deployment
    ever needs unbounded shards, the same md5 value can be computed
    with O(1) memory per shard: repartition by shard,
    sortWithinPartitions(pos), and fold hashlib.md5 over the
    comma-joined ids in mapPartitions — identical digest, Python path;
    not taken here because bounded shards keep the whole plan
    JVM-side."""
    from rag_lakehouse_spark.sources.layout import shard_plan

    d = load_table(spark, sf_dir, "documents")
    gated = d.filter(
        (F.col("lang") == "en") & F.col("n_chars").between(100, 20000)
    ).select("doc_id", "text", "n_chars")
    # min-id canonical per fingerprint in ONE aggregate (r15): doc_id
    # is unique, so min(struct(doc_id, ...)) IS the min-id row. The old
    # canon-agg + semi-join form evaluated the normalize+md5 fingerprint
    # twice per doc and shuffled every gated row's text by fp; the
    # partial agg now shuffles at most one winner candidate per
    # (task, fp). Measured 2.25 -> 1.77 s at sf0.1; output identical at
    # 3 SFs (oracle unchanged — it checks rows, not plan shape).
    deduped = (
        gated.groupBy(TX.fingerprint("text").alias("fp"))
        .agg(F.min(F.struct("doc_id", "text", "n_chars")).alias("w"))
        .select("w.doc_id", "w.text", "w.n_chars")
    )
    bench = (
        TX.shingle_relation(d.filter(F.col("doc_id") < 10), "text", "doc_id", 13)
        .select(F.explode("shingles").alias("sh"))
        .distinct()
    )
    doc_sh = TX.shingle_relation(deduped, "text", "doc_id", 13).select(
        "doc_id", F.explode("shingles").alias("sh")
    )
    contaminated = doc_sh.join(F.broadcast(bench), "sh").select("doc_id").distinct()
    clean = deduped.join(contaminated, "doc_id", "left_anti").select(
        "doc_id", "n_chars"
    )
    planned = shard_plan(clean, id_col="doc_id", n_shards=8, seed=1337)
    return planned.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "doc_id"))),
                    lambda s: s["doc_id"].cast("string"),
                ),
                ",",
            )
        ).alias("order_md5"),
    )


@register(
    "corpus_split_leakage",
    oracle=f"""
    WITH assigned AS (
      SELECT doc_id,
             CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'valid'
                  ELSE 'test' END AS split,
             {TX.duckdb_fingerprint('text')} AS fp
      FROM (
        SELECT doc_id, text,
               (('0x' || substr(md5('split:1337:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT) % 10 AS b
        FROM documents
      )
    ), leak AS (
      SELECT fp FROM assigned GROUP BY fp HAVING COUNT(DISTINCT split) > 1
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN fp IN (SELECT fp FROM leak) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_leaked
    FROM assigned GROUP BY split
    """,
    tags=("training-data", "governance", "split"),
)
def corpus_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-hygiene check on a reproducible 80/10/10 split: assign
    every doc to train/valid/test by the portable seed hash (the same
    provenance-is-a-seed contract as the shard export), then count per
    split how many docs share an exact content fingerprint with ANY
    other split — the leakage an honest eval must drive to zero (and
    the reason dedup runs BEFORE splitting).

    Scale: the split is map work; leakage detection shuffles 32-byte
    fingerprints twice (distinct-split count, broadcast-semi flag) —
    the exact-dedup cost profile, nothing text-sized moves."""
    from rag_lakehouse_spark.operators.dedup_portable import base60

    h = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        TX.fingerprint("text").alias("fp"),
        (
            base60(F.concat(F.lit("split:1337:"), F.col("doc_id").cast("string")))
            % 10
        ).alias("b"),
    )
    assigned = h.select(
        "doc_id",
        "fp",
        F.when(F.col("b") < 8, "train")
        .when(F.col("b") == 8, "valid")
        .otherwise("test")
        .alias("split"),
    )
    leak = (
        assigned.groupBy("fp")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .select("fp")
    )
    flagged = assigned.join(F.broadcast(leak), "fp", "left_semi").select(
        "doc_id", "split"
    )
    return (
        assigned.join(
            flagged.select("doc_id", F.lit(1).alias("leaked")), "doc_id", "left"
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.coalesce(F.sum("leaked"), F.lit(0)).cast("bigint").alias("n_leaked"),
        )
    )


_P60_F = float(1 << 60)


@register(
    "corpus_weighted_sample",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             round(
               -ln(((('0x' || substr(md5('wsamp:1337:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT) + 1)
                   / {_P60_F!r})
               / greatest(n_chars, 1), 9) AS sample_key
      FROM documents
    )
    SELECT doc_id, n_chars, sample_key FROM keyed
    ORDER BY sample_key, doc_id
    LIMIT 100
    """,
    tags=("training-data", "sampling", "weighted"),
)
def corpus_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministic and
    engine-portable (Efraimidis-Spirakis exponential race): each doc
    draws u in (0,1] from the portable seed hash and races with key
    ``-ln(u) / weight`` (weight = char count, floor 1) — the bottom-100
    keys are a size-weighted sample, reproducible from the (snapshot,
    seed) pair like the shard export. Completes the sampling surface:
    stratified hash thresholds, DSIR importance, mixture budgets, and
    now weighted WOR.

    Exactness: u is (int64+1)/2^60 — a correctly-rounded cast and a
    power-of-two division, identical in both engines; the one
    transcendental (ln) is rounded to 9 decimals on both sides (the
    BM25-idf precedent). Bottom-k is ORDER BY + LIMIT →
    TakeOrderedAndProject, no global sort."""
    d = load_table(spark, sf_dir, "documents")
    return bottom_k_sample(weighted_sample_keys(d))


def weighted_sample_keys(d: DataFrame) -> DataFrame:
    """(doc_id, n_chars, sample_key) — the deterministic
    Efraimidis-Spirakis race keys, shared by the batch sample and the
    streaming-maintained twin so both select the identical sample."""
    from rag_lakehouse_spark.operators.dedup_portable import base60

    u = (
        base60(F.concat(F.lit("wsamp:1337:"), F.col("doc_id").cast("string")))
        + F.lit(1)
    ) / F.lit(_P60_F)
    key = F.round(-F.log(u) / F.greatest(F.col("n_chars"), F.lit(1)), 9)
    return d.select("doc_id", "n_chars", key.alias("sample_key"))


def bottom_k_sample(keyed: DataFrame, k: int = 100) -> DataFrame:
    """Bottom-k of the race keys under the total order
    (sample_key, doc_id) — TakeOrderedAndProject, mergeable under
    set-union + re-take (min-k of a union == min-k of min-ks)."""
    return keyed.orderBy(F.asc("sample_key"), F.asc("doc_id")).limit(k)


@register(
    "corpus_bpe_encode",
    oracle=None,  # the learned-merge encode has no SQL twin; pytest
    # runs a pure-Python reference encoder differentially
    # (tests/test_bpe.py::test_bpe_encode_matches_reference*)
    tags=("text", "tokenizer", "training-data"),
)
def corpus_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a 12-rule BPE vocabulary on the corpus, then ENCODE the
    corpus with it: per-doc word/char/BPE-token counts and the
    chars-per-token compression ratio — the train→apply round trip a
    tokenizer pipeline actually ships (``corpus_bpe_merges`` proves
    induction; this proves the learned rules tokenize). Encoding runs
    Python only over the DISTINCT word set (``operators.bpe
    .encode_words``), joined back to the corpus by word."""
    from rag_lakehouse_spark.operators.bpe import (
        bpe_token_counts,
        train_merges,
        word_counts,
    )

    d = load_table(spark, sf_dir, "documents")
    rules = train_merges(word_counts(d).repartition(4), n_merges=12)
    return bpe_token_counts(d, rules)


# The surprisal CTE chain is shared with text_queries (same tokenizer
# twins, same integer-bits trick) — imported so the ensemble oracle
# composes the exact same SQL the individually-oracled queries run.
from rag_lakehouse_spark.plans.text_queries import _SURPRISAL_CTES as _SURP


@register(
    "corpus_quality_ensemble",
    oracle=f"""
    WITH {_SURP},
    edges AS (
      SELECT quantile_cont((total_bits * 1024) // n_tokens, 0.666666) AS e2
      FROM sc
    ),
    charclass AS (
      SELECT doc_id, source,
             length(text) BETWEEN 100 AND 20000
             AND CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
                 / length(text) < 0.1
             AND CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                 / length(text) < 0.3 AS char_ok
      FROM documents
    ),
    lines AS (
      SELECT doc_id, regexp_replace(l, '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g') AS l
      FROM (SELECT doc_id,
                   unnest(regexp_split_to_array(coalesce(text, ''), '\n')) AS l
            FROM documents)
      WHERE regexp_replace(l, '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g') <> ''
    ),
    line_stats AS (
      SELECT doc_id, COUNT(*) AS n_lines, COUNT(DISTINCT l) AS n_dl
      FROM lines GROUP BY doc_id
    ),
    tarr AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(regexp_replace(coalesce(text, ''), '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g'), '[ \t\n\x0B\f\r]+'), t -> t <> '') AS t
      FROM documents
    ),
    bigr AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(t) - 1),
                                   i -> t[i] || ' ' || t[i+1])) AS bg
      FROM tarr
    ),
    bc AS (SELECT doc_id, bg, COUNT(*) AS cnt FROM bigr GROUP BY 1, 2),
    bi AS (
      SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS total,
             CAST(MAX(cnt) AS BIGINT) AS top
      FROM bc GROUP BY 1
    ),
    flags AS (
      SELECT c.doc_id, c.source,
             c.char_ok,
             (COALESCE(ls.n_lines, 0) = 0
              OR (ls.n_lines - ls.n_dl) * 10 <= ls.n_lines * 3)
             AND (COALESCE(bi.total, 0) = 0
                  OR CAST(bi.top AS DOUBLE) / bi.total <= 0.18) AS rep_ok,
             sc.n_tokens IS NOT NULL
             AND (sc.total_bits * 1024) // sc.n_tokens <= edges.e2 AS flu_ok
      FROM charclass c
      LEFT JOIN line_stats ls USING (doc_id)
      LEFT JOIN bi USING (doc_id)
      LEFT JOIN sc USING (doc_id), edges
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN NOT char_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_char_fail,
           CAST(SUM(CASE WHEN NOT rep_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_rep_fail,
           CAST(SUM(CASE WHEN NOT flu_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_flu_fail,
           CAST(SUM(CASE WHEN char_ok AND rep_ok AND flu_ok THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept
    FROM flags GROUP BY source
    """,
    tags=("text", "quality", "pipeline", "training-data", "composition"),
)
def corpus_quality_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STACKED quality decision in one plan — the three
    independently-oracled signal families composed the way a C4/Gopher/
    CCNet-style pipeline actually gates: character-class ratios
    (length band, punct/digit density), repetition (duplicate-line
    fraction via integer compare, top-bigram share), and fluency
    (quantized unigram surprisal at or below the corpus's 2/3 tertile
    edge, broadcast). Per source: doc count, per-gate failure counts,
    and the docs surviving ALL gates — the report a mixture build
    reads before deciding per-source sampling rates.

    Every per-doc flag is integer/boolean arithmetic on already-proven
    primitives; the only doubles are the two ratio compares each side
    computes identically. 0-token docs fail fluency by definition
    (no score ≠ fluent); 0-line / 0-bigram docs pass repetition (no
    evidence of repetition).

    Scale: three independent per-doc aggregates (lines, bigrams,
    surprisal) joined back on doc_id — each is an explode + groupBy
    with map-side combine; the tertile edge is a 1-row broadcast; the
    final per-source rollup is |sources| rows. Nothing new to audit —
    this row exists to prove the signals COMPOSE without
    materialization between stages."""
    from rag_lakehouse_spark.plans.text_queries import _surprisal_per_doc

    d = load_table(spark, sf_dir, "documents")
    n = F.length("text")
    char_ok = (
        n.between(100, 20000)
        & (
            F.length(F.regexp_replace("text", "[^.,!?;:]", "")).cast("double") / n
            < 0.1
        )
        & (
            F.length(F.regexp_replace("text", "[^0-9]", "")).cast("double") / n
            < 0.3
        )
    )
    charclass = d.select("doc_id", "source", char_ok.alias("char_ok"))

    txt = F.coalesce(F.col("text"), F.lit(""))
    lines = (
        d.select("doc_id", F.explode(F.split(txt, "\n")).alias("__l"))
        .select("doc_id", TX.edge_trim("__l").alias("__l"))
        .filter(F.col("__l") != "")
    )
    line_stats = lines.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.countDistinct("__l").alias("n_dl"),
    )

    toks = d.select(
        "doc_id",
        F.filter(TX.tokens(txt), lambda t: t != F.lit("")).alias("__t"),
    )
    n_t = F.size("__t")
    bigr = (
        toks.filter(n_t >= 2)
        .select("doc_id", F.col("__t"), F.explode(F.sequence(F.lit(1), n_t - 1)).alias("__i"))
        .select(
            "doc_id",
            F.concat(
                F.element_at("__t", F.col("__i")),
                F.lit(" "),
                F.element_at("__t", F.col("__i") + 1),
            ).alias("__bg"),
        )
    )
    bi = (
        bigr.groupBy("doc_id", "__bg")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .groupBy("doc_id")
        .agg(
            F.sum("__cnt").cast("bigint").alias("total"),
            F.max("__cnt").cast("bigint").alias("top"),
        )
    )

    # sc feeds both the edge aggregate and the flag join — barrier per
    # the multi-consumer rule (the surprisal subtree is explode+joins)
    sc = _surprisal_per_doc(spark, sf_dir).localCheckpoint(eager=True)
    q_bits = F.expr("(total_bits * 1024) DIV n_tokens")
    edges = sc.agg(F.percentile(q_bits, 0.666666).alias("e2"))

    flags = (
        charclass.join(line_stats, "doc_id", "left")
        .join(bi, "doc_id", "left")
        .join(sc.withColumn("q_bits", q_bits), "doc_id", "left")
        .crossJoin(F.broadcast(edges))
        .select(
            "source",
            "char_ok",
            (
                (
                    (F.coalesce(F.col("n_lines"), F.lit(0)) == 0)
                    | ((F.col("n_lines") - F.col("n_dl")) * 10 <= F.col("n_lines") * 3)
                )
                & (
                    (F.coalesce(F.col("total"), F.lit(0)) == 0)
                    | (F.col("top").cast("double") / F.col("total") <= 0.18)
                )
            ).alias("rep_ok"),
            (
                F.col("n_tokens").isNotNull() & (F.col("q_bits") <= F.col("e2"))
            ).alias("flu_ok"),
        )
    )
    return flags.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(~F.col("char_ok"), 1).otherwise(0)).cast("bigint").alias("n_char_fail"),
        F.sum(F.when(~F.col("rep_ok"), 1).otherwise(0)).cast("bigint").alias("n_rep_fail"),
        F.sum(F.when(~F.col("flu_ok"), 1).otherwise(0)).cast("bigint").alias("n_flu_fail"),
        F.sum(
            F.when(F.col("char_ok") & F.col("rep_ok") & F.col("flu_ok"), 1).otherwise(0)
        ).cast("bigint").alias("n_kept"),
    )


@register(
    "corpus_source_overlap",
    oracle=f"""
    WITH fps AS (
      SELECT DISTINCT source, {TX.duckdb_fingerprint('text')} AS fp
      FROM documents
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM fps a JOIN fps b ON a.fp = b.fp AND a.source < b.source
    GROUP BY 1, 2
    """,
    tags=("training-data", "governance", "dedup", "provenance"),
)
def corpus_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: for every source pair, how many
    distinct content fingerprints appear in BOTH — the provenance
    report that tells a corpus owner which feeds are re-scraping each
    other (and where cross-source dedup will actually reclaim tokens;
    within-source duplication is `corpus_vocab_stats`/exact-dedup
    territory).

    Scale: text collapses to 32-byte md5 fingerprints at the scan; the
    self-join shuffles only (source, fp) pairs on fp, and the output
    is |sources|² rows. The DISTINCT before the join keeps a source's
    internal duplicates from inflating pair counts."""
    d = load_table(spark, sf_dir, "documents")
    fps = d.select("source", TX.fingerprint("text").alias("fp")).distinct()
    a = fps.select(F.col("source").alias("source_a"), "fp")
    b = fps.select(F.col("source").alias("source_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )


# Frozen BPE merge table for the portable encode twin — rank order
# matters (rule 2 consumes rule 1's 'th'; rule 8 consumes rule 4's
# 'an'), exercising the cascade semantics a real learned vocabulary
# has. A frozen rule list is the PRODUCTION contract anyway: deployed
# tokenizers are immutable artifacts applied to new text.
_BPE_FROZEN: list[tuple[str, str]] = [
    ("t", "h"),
    ("th", "e"),
    ("i", "n"),
    ("a", "n"),
    ("e", "r"),
    ("o", "n"),
    ("r", "e"),
    ("an", "d"),
]


def _bpe_encode_sql(expr: str) -> str:
    """DuckDB expression: final BPE symbol list of VARCHAR ``expr``
    under the frozen merge table. Each rule is one greedy
    left-to-right pass — a ``list_reduce`` whose accumulator is the
    output symbol list, seeded by wrapping each input symbol as a
    1-element list so the fold's implicit seed IS the first symbol
    (list accumulators are unaffected by the r8 struct-accumulator
    ``list_reduce`` quirk; verified by the hash checks). DuckDB
    indexes VARCHAR by codepoint exactly like Python ``list(word)``
    (verified incl. astral chars), so the char seeding matches
    ``encode_word_reference``."""
    cur = f"list_transform(generate_series(1, length({expr})), i -> {expr}[i])"
    for left, right in _BPE_FROZEN:
        cur = (
            f"list_reduce(list_transform({cur}, t -> [t]), "
            f"(acc, x) -> CASE WHEN acc[-1] = '{left}' AND x[1] = '{right}' "
            f"THEN list_append(acc[1:len(acc)-1], '{left}{right}') "
            f"ELSE list_append(acc, x[1]) END)"
        )
    return cur


@register(
    "corpus_bpe_encode_portable",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, t AS word FROM (
        SELECT doc_id, unnest({TX.duckdb_tokens("coalesce(text, '')")}) AS t
        FROM documents)
      WHERE t <> ''
    ), vocab AS (
      SELECT word, len({_bpe_encode_sql("word")}) AS n_toks
      FROM (SELECT DISTINCT word FROM words)
    ), per_doc AS (
      SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
             CAST(SUM(length(w.word)) AS BIGINT) AS n_word_chars,
             CAST(SUM(v.n_toks) AS BIGINT) AS n_bpe_tokens
      FROM words w JOIN vocab v USING (word) GROUP BY 1
    )
    SELECT d.doc_id,
           COALESCE(p.n_words, 0) AS n_words,
           COALESCE(p.n_word_chars, 0) AS n_word_chars,
           COALESCE(p.n_bpe_tokens, 0) AS n_bpe_tokens,
           CASE WHEN COALESCE(p.n_bpe_tokens, 0) > 0
                THEN CAST(p.n_word_chars AS DOUBLE) / p.n_bpe_tokens
           END AS chars_per_token
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
    tags=("text", "tokenizer", "training-data"),
)
def corpus_bpe_encode_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-encode the corpus under a FROZEN 8-rule merge table — the
    external-evidence twin for ``corpus_bpe_encode`` (VERDICT r8 #5):
    the SAME distributed encode machinery (``operators.bpe
    .encode_words`` mapInPandas over the DISTINCT vocabulary, counts
    joined back to the corpus — Python never sees corpus-sized data),
    but with the merge table pinned instead of trained, so the whole
    rank-ordered greedy merge cascade is replayable in SQL: the oracle
    applies each rule as one ``list_reduce`` pass over the symbol
    list, exactly the ``encode_word_reference`` semantics. The trained
    path keeps its pytest differentials (tests/test_bpe.py); this row
    proves the encode plumbing hash-exactly against an external
    engine."""
    from rag_lakehouse_spark.operators.bpe import bpe_token_counts

    d = load_table(spark, sf_dir, "documents")
    rules = [(i + 1, l, r, 0) for i, (l, r) in enumerate(_BPE_FROZEN)]
    return bpe_token_counts(d, rules)


@register(
    "corpus_vocab_coverage",
    oracle=f"""
    WITH words AS (
      SELECT source, t AS word FROM (
        SELECT source, unnest({TX.duckdb_tokens("coalesce(text, '')")}) AS t
        FROM documents)
      WHERE t <> ''
    ), wc AS (
      SELECT source, word, CAST(COUNT(*) AS BIGINT) AS n_occ
      FROM words GROUP BY 1, 2
    ), vocab AS (
      SELECT word,
             CAST(len(syms) AS BIGINT) AS n_toks,
             CAST(len(list_filter(syms, s -> length(s) > 1)) AS BIGINT)
               AS n_merged,
             CAST(coalesce(list_sum(list_transform(
                    list_filter(syms, s -> length(s) > 1),
                    s -> length(s))), 0) AS BIGINT) AS merged_chars
      FROM (SELECT word, {_bpe_encode_sql("word")} AS syms
            FROM (SELECT DISTINCT word FROM words))
    ), per_source AS (
      SELECT w.source,
             CAST(SUM(w.n_occ) AS BIGINT) AS n_tokens,
             CAST(SUM(w.n_occ * length(w.word)) AS BIGINT) AS n_chars,
             CAST(SUM(w.n_occ * v.n_toks) AS BIGINT) AS n_bpe_tokens,
             CAST(SUM(w.n_occ * v.n_merged) AS BIGINT) AS n_merged_symbols,
             CAST(SUM(w.n_occ * v.merged_chars) AS BIGINT) AS n_merged_chars
      FROM wc w JOIN vocab v USING (word) GROUP BY 1
    )
    SELECT s.source,
           COALESCE(p.n_tokens, 0) AS n_tokens,
           COALESCE(p.n_bpe_tokens, 0) AS n_bpe_tokens,
           COALESCE(p.n_merged_symbols, 0) AS n_merged_symbols,
           CASE WHEN COALESCE(p.n_chars, 0) > 0
                THEN CAST(p.n_merged_chars AS DOUBLE) / p.n_chars
           END AS merged_char_fraction,
           CASE WHEN COALESCE(p.n_bpe_tokens, 0) > 0
                THEN CAST(p.n_chars AS DOUBLE) / p.n_bpe_tokens
           END AS chars_per_token
    FROM (SELECT DISTINCT source FROM documents) s
    LEFT JOIN per_source p USING (source)
    """,
    tags=("text", "tokenizer", "training-data", "governance"),
)
def corpus_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source tokenizer FIT under the frozen merge table: what
    fraction of each source's characters ends up inside a merged
    (multi-character) symbol, plus compression (chars per BPE token).
    The corpus-QA readout that tells a training run which domain a
    deployed tokenizer serves poorly — a source full of code or
    non-English text shows a low merged-char fraction and near-1.0
    chars/token, i.e. it pays more sequence length per character than
    the domains the vocabulary was trained on.

    Scale: the same word-type collapse as every BPE row — Python
    encodes the DISTINCT vocabulary once (now also emitting merge-
    coverage stats per entry); occurrence counts fan the stats back by
    an equi-join; one bounded per-source aggregate. The oracle replays
    the frozen cascade per distinct word and recomputes the weighted
    sums exactly (all-integer until the two final divisions)."""
    from rag_lakehouse_spark.operators.bpe import encode_words_stats

    d = load_table(spark, sf_dir, "documents")
    rules = [(i + 1, l, r, 0) for i, (l, r) in enumerate(_BPE_FROZEN)]
    words = d.select(
        "source",
        F.explode(
            F.split(TX.edge_trim(F.coalesce("text", F.lit(""))), TX.WS)
        ).alias("word"),
    ).filter(F.col("word") != "")
    wc = words.groupBy("source", "word").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occ")
    )
    vocab = encode_words_stats(wc.select("word").distinct(), rules)
    per_source = (
        wc.join(vocab, "word")
        .groupBy("source")
        .agg(
            F.sum("n_occ").cast("bigint").alias("n_tokens"),
            F.sum(F.col("n_occ") * F.length("word")).cast("bigint").alias("n_chars"),
            F.sum(F.col("n_occ") * F.col("n_toks")).cast("bigint").alias(
                "n_bpe_tokens"
            ),
            F.sum(F.col("n_occ") * F.col("n_merged")).cast("bigint").alias(
                "n_merged_symbols"
            ),
            F.sum(F.col("n_occ") * F.col("merged_chars")).cast("bigint").alias(
                "n_merged_chars"
            ),
        )
    )
    return (
        d.select("source")
        .distinct()
        .join(per_source, "source", "left")
        .select(
            "source",
            F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
            F.coalesce("n_bpe_tokens", F.lit(0)).cast("bigint").alias(
                "n_bpe_tokens"
            ),
            F.coalesce("n_merged_symbols", F.lit(0)).cast("bigint").alias(
                "n_merged_symbols"
            ),
            F.when(
                F.coalesce("n_chars", F.lit(0)) > 0,
                F.col("n_merged_chars").cast("double") / F.col("n_chars"),
            ).alias("merged_char_fraction"),
            F.when(
                F.coalesce("n_bpe_tokens", F.lit(0)) > 0,
                F.col("n_chars").cast("double") / F.col("n_bpe_tokens"),
            ).alias("chars_per_token"),
        )
    )


@register(
    "corpus_token_budget_report",
    oracle=r"""
    WITH t AS (
      SELECT source,
             CAST(len(list_filter(regexp_split_to_array(
               regexp_replace(lower(coalesce(text, '')),
                              '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g'),
               '[ \t\n\x0B\f\r]+'), x -> x <> '')) AS BIGINT) AS n_tok
      FROM documents
    ), agg AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
             CAST(SUM((n_tok + 511) // 512) AS BIGINT) AS n_sequences
      FROM t GROUP BY source
    )
    SELECT source, n_docs, n_tokens, n_sequences,
           CAST(n_sequences * 512 - n_tokens AS BIGINT) AS n_pad,
           CASE WHEN n_sequences = 0 THEN 0e0
                ELSE CAST(n_tokens AS DOUBLE) / (n_sequences * 512) END
             AS utilization
    FROM agg
    """,
    tags=("corpus", "packing", "training-data"),
)
def corpus_token_budget_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget accounting per source — the cost sheet a training
    run reads before packing: document and whitespace-token counts,
    the number of 512-token training sequences under PER-DOCUMENT
    chunking (ceil(n_tok/512); empty docs contribute none), the pad
    tokens that padding-to-512 would waste, and the resulting
    utilization. The waste column is exactly what justifies
    cross-document packing (``corpus_pack_sequences`` eliminates it);
    this report quantifies the decision. All integer arithmetic
    except the final fixed-form utilization division.

    Scale: one tokenize pass (size over the split array — no
    explode), then a groupBy on source with map-side partials; output
    is |sources| rows. The SUM stays int64 (n_tok bounded by doc
    length; 100 TB of 512-token docs is ~2e11 tokens — within int64
    by 7 orders)."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(
        F.filter(
            F.split(
                TX.edge_trim(F.lower(F.coalesce(F.col("text"), F.lit("")))),
                TX.WS,
            ),
            lambda x: x != F.lit(""),
        )
    ).cast("bigint")
    agg = (
        d.select("source", n_tok.alias("n_tok"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.sum(F.expr("(n_tok + 511) DIV 512")).cast("bigint").alias(
                "n_sequences"
            ),
        )
    )
    return agg.select(
        "source",
        "n_docs",
        "n_tokens",
        "n_sequences",
        (F.col("n_sequences") * 512 - F.col("n_tokens"))
        .cast("bigint")
        .alias("n_pad"),
        F.when(F.col("n_sequences") == 0, F.lit(0.0))
        .otherwise(
            F.col("n_tokens").cast("double") / (F.col("n_sequences") * 512)
        )
        .alias("utilization"),
    )


@register(
    "corpus_kn_bigram_scores",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source,
             list_filter({TX.duckdb_tokens("coalesce(text, '')")},
                         t -> t <> '') AS t
      FROM documents
    ), bg AS (
      SELECT doc_id, source, t, unnest(generate_series(1, len(t) - 1)) AS i
      FROM toks
    ), bigr AS (
      SELECT doc_id, source, t[i] AS w1, t[i + 1] AS w2 FROM bg
    ), c12 AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bigr GROUP BY 1, 2
    ), c1 AS (
      SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
             CAST(COUNT(*) AS BIGINT) AS n1f
      FROM c12 GROUP BY 1
    ), n1b AS (
      SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1b FROM c12 GROUP BY 1
    ), bt AS (SELECT CAST(COUNT(*) AS BIGINT) AS b FROM c12),
    model AS (
      SELECT c12.w1, c12.w2,
             CAST(floor(round(log2(
               (greatest(CAST(c12.c12 AS DOUBLE) - 7.5e-1, 0e0)
                + 7.5e-1 * c1.n1f
                  * (CAST(n1b.n1b AS DOUBLE) / CAST(bt.b AS DOUBLE)))
               / c1.c1), 9) * 1048576e0) AS BIGINT) AS q
      FROM c12 JOIN c1 USING (w1) JOIN n1b USING (w2) CROSS JOIN bt
    ), sc AS (
      SELECT bigr.source, bigr.doc_id, model.q
      FROM bigr JOIN model USING (w1, w2)
    )
    SELECT source,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(q) AS BIGINT) AS sum_q,
           -((CAST(SUM(q) AS DOUBLE) / 1048576e0) / COUNT(*))
             AS bits_per_bigram
    FROM sc GROUP BY source
    """,
    tags=("text", "quality", "language-model", "training-data"),
)
def corpus_kn_bigram_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram language model (D = 0.75),
    trained on the corpus and scoring it — the smoothing family real
    LM-based quality filters (CCNet-style) use, beyond the
    integer-bits surprisal rungs: P(w2|w1) = (max(c(w1,w2) - D, 0)
    + D * N1+(w1*) * N1+(*w2)/|bigrams|) / c(w1), where the
    continuation counts N1+ come from DISTINCT bigram types — the KN
    insight that "Francisco" is frequent but follows only "San".
    Per-source report: docs scored, bigram mass, and mean bits per
    bigram (lower = more predictable text).

    Exactness: all model inputs are exact integers derived from ONE
    bigram-type table; the probability is a fixed-order double
    expression (dyadic D = 0.75 multiplies exactly), log2 rounds to 9
    decimals (the idf/ln precedent absorbs engines' last-ulp libm
    differences), and per-doc/source sums happen on the 2^-20-quantized
    INTEGER grid (the standing order-free-sum rule), so the report is
    externally hash-checked despite being an LM.

    Scale: bigram explode is linear in corpus tokens; every count
    derives from the c(w1,w2) type table (shuffle bounded by bigram
    vocabulary, map-side combined), which is CHECKPOINTED because four
    derivations read it — without the barrier Spark re-planned the
    corpus explode five times (plan-audited). The corpus scans exactly
    twice (type counts + occurrence scoring); the model joins back to
    occurrences by (w1, w2) equi-join and the 1-row |bigrams| total
    broadcasts."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    toks = d.select(
        "doc_id",
        "source",
        F.filter(
            TX.tokens(F.coalesce(F.col("text"), F.lit(""))),
            lambda t: t != F.lit(""),
        ).alias("__t"),
    )
    n_t = F.size("__t")
    bigr = (
        toks.filter(n_t >= 2)
        .select(
            "doc_id",
            "source",
            "__t",
            F.explode(F.sequence(F.lit(1), n_t - 1)).alias("__i"),
        )
        .select(
            "doc_id",
            "source",
            F.element_at("__t", F.col("__i")).alias("w1"),
            F.element_at("__t", F.col("__i") + 1).alias("w2"),
        )
    )
    # The bigram TYPE table feeds FOUR derivations (c1, n1b, |bigrams|,
    # and the model join) — without a barrier Spark re-plans the whole
    # corpus explode for each (observed: 5 parquet scans, zero reuse).
    # c12 is bounded by the bigram VOCABULARY, not the corpus, so an
    # eager checkpoint is the right materialization; the corpus itself
    # is scanned exactly twice (type counts + occurrence scoring).
    c12 = (
        bigr.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c12"))
        .localCheckpoint(eager=True)
    )
    c1 = c12.groupBy("w1").agg(
        F.sum("c12").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("n1f"),
    )
    n1b = c12.groupBy("w2").agg(F.count(F.lit(1)).cast("bigint").alias("n1b"))
    bt = c12.agg(F.count(F.lit(1)).cast("bigint").alias("b"))
    p = (
        F.greatest(F.col("c12").cast("double") - F.lit(0.75), F.lit(0.0))
        + F.lit(0.75)
        * F.col("n1f")
        * (F.col("n1b").cast("double") / F.col("b").cast("double"))
    ) / F.col("c1")
    model = (
        c12.join(c1, "w1")
        .join(n1b, "w2")
        .crossJoin(F.broadcast(bt))
        .select(
            "w1",
            "w2",
            F.floor(F.round(F.log2(p), 9) * F.lit(1048576.0))
            .cast("bigint")
            .alias("q"),
        )
    )
    sc = bigr.join(model, ["w1", "w2"])
    return sc.groupBy("source").agg(
        F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.sum("q").cast("bigint").alias("sum_q"),
        (
            -(
                (F.sum("q").cast("double") / F.lit(1048576.0))
                / F.count(F.lit(1))
            )
        ).alias("bits_per_bigram"),
    )


@register(
    "corpus_novelty_curve",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, unnest({TX.duckdb_char_shingles('text', 8)}) AS s
      FROM documents
    ), fs AS (
      SELECT s, MIN(doc_id) AS first_id FROM sh GROUP BY 1
    ), nv AS (
      SELECT first_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_novel
      FROM fs GROUP BY 1
    ), ns AS (
      SELECT doc_id,
             CAST(len({TX.duckdb_char_shingles('text', 8)}) AS BIGINT) AS n_sh
      FROM documents
    ), mx AS (SELECT MAX(doc_id) AS m FROM documents)
    SELECT CAST((ns.doc_id * 10) // (mx.m + 1) AS INT) AS ingest_decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ns.n_sh) AS BIGINT) AS n_shingles,
           CAST(SUM(coalesce(nv.n_novel, 0)) AS BIGINT) AS n_novel,
           CASE WHEN SUM(ns.n_sh) > 0
                THEN CAST(SUM(coalesce(nv.n_novel, 0)) AS DOUBLE)
                     / SUM(ns.n_sh) END AS novelty_rate
    FROM ns CROSS JOIN mx LEFT JOIN nv USING (doc_id)
    GROUP BY 1
    """,
    tags=("text", "dedup", "training-data", "governance"),
)
def corpus_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-novelty decay over ingestion order — the report that
    tells a crawl operator when a feed stops adding information: per
    ingestion decile (doc_id order), the fraction of each document's
    distinct 8-char shingles seen for the FIRST time at that document
    (first occurrence = min doc_id over the shingle's postings). A
    healthy fresh feed holds a high novelty rate; a feed re-crawling
    itself decays toward boilerplate-only novelty — the
    diminishing-returns curve behind data-mixture and crawl-budget
    decisions.

    Scale: the novelty side never joins back to the corpus — per-doc
    novel counts are a groupBy(first_id) over the shingle->first-id
    table itself (a count of wins per doc, bounded by |docs| rows),
    and per-doc shingle totals are a map-only array size (shingles
    are distinct within a doc by construction). So the corpus
    shingle-explodes ONCE; the original join-back form re-planned the
    explode per consumer (4 parquet scans, plan-audited) and shuffled
    corpus-sized shingle rows a second time. The decile map is an
    integer expression against one broadcast max. No all-pairs
    anything."""
    d = load_table(spark, sf_dir, "documents")
    sh = TX.with_shingles(d.select("doc_id", "text")).select(
        "doc_id", F.explode("shingles").alias("s")
    )
    fs = sh.groupBy("s").agg(F.min("doc_id").alias("first_id"))
    nv = fs.groupBy(F.col("first_id").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_novel")
    )
    ns = TX.with_shingles(d.select("doc_id", "text")).select(
        "doc_id", F.size("shingles").cast("bigint").alias("n_sh")
    )
    mx = d.agg(F.max("doc_id").alias("m"))
    j = ns.crossJoin(F.broadcast(mx)).join(nv, "doc_id", "left")
    g = j.groupBy(
        F.expr("CAST((doc_id * 10) DIV (m + 1) AS INT)").alias("ingest_decile")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_sh").cast("bigint").alias("n_shingles"),
        F.sum(F.coalesce("n_novel", F.lit(0))).cast("bigint").alias("n_novel"),
    )
    return g.select(
        "ingest_decile",
        "n_docs",
        "n_shingles",
        "n_novel",
        F.when(
            F.col("n_shingles") > 0,
            F.col("n_novel").cast("double") / F.col("n_shingles"),
        ).alias("novelty_rate"),
    )


@register(
    "corpus_dedup_savings",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, source, {TX.duckdb_fingerprint('text')} AS f,
             len(list_filter({TX.duckdb_tokens("coalesce(text, '')")},
                             t -> t <> '')) AS n_tok
      FROM documents
    ), canon AS (
      SELECT f, MIN(doc_id) AS canon_id FROM fp GROUP BY 1
    )
    SELECT fp.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(fp.n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN fp.doc_id <> c.canon_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_docs,
           CAST(SUM(CASE WHEN fp.doc_id <> c.canon_id THEN fp.n_tok
                         ELSE 0 END) AS BIGINT) AS tokens_saved,
           CASE WHEN SUM(fp.n_tok) > 0
                THEN CAST(SUM(CASE WHEN fp.doc_id <> c.canon_id
                               THEN fp.n_tok ELSE 0 END) AS DOUBLE)
                     / SUM(fp.n_tok) END AS dup_token_share
    FROM fp JOIN canon c USING (f)
    GROUP BY fp.source
    """,
    tags=("text", "dedup", "training-data", "governance"),
)
def corpus_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup ROI sheet: per source, the token mass exact dedup
    reclaims — documents whose normalized-content fingerprint already
    appeared at a lower doc_id count as duplicates, and their tokens
    as savings (cross-source duplicates charge the source holding the
    LATER copy — the feed that re-scraped). This is the number that
    justifies (or kills) a dedup stage in the pipeline budget, next to
    `corpus_source_overlap`'s who-duplicates-whom matrix.

    Scale: text collapses to 32-byte fingerprints at the scan; the
    only shuffles carry (fingerprint) groups and (source) partials.
    Canonical choice is min(doc_id) — the same deterministic rule as
    `dedup_exact_docs`, so the two reports agree on which copy
    survives."""
    d = load_table(spark, sf_dir, "documents")
    fp = d.select(
        "doc_id",
        "source",
        TX.fingerprint("text").alias("f"),
        F.size(
            F.filter(
                TX.tokens(F.coalesce(F.col("text"), F.lit(""))),
                lambda t: t != F.lit(""),
            )
        ).alias("n_tok"),
    )
    canon = fp.groupBy("f").agg(F.min("doc_id").alias("canon_id"))
    j = fp.join(canon, "f")
    dup = F.col("doc_id") != F.col("canon_id")
    g = j.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
        F.sum(F.when(dup, 1).otherwise(0)).cast("bigint").alias("n_dup_docs"),
        F.sum(F.when(dup, F.col("n_tok")).otherwise(0))
        .cast("bigint")
        .alias("tokens_saved"),
    )
    return g.select(
        "source",
        "n_docs",
        "n_tokens",
        "n_dup_docs",
        "tokens_saved",
        F.when(
            F.col("n_tokens") > 0,
            F.col("tokens_saved").cast("double") / F.col("n_tokens"),
        ).alias("dup_token_share"),
    )


@register(
    "corpus_sample_incremental",
    oracle=None,  # set below — shares the batch twin's oracle
    tags=("training-data", "sampling", "weighted", "streaming"),
)
def corpus_sample_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The weighted WOR sample MAINTAINED BY A STREAM: documents
    replay through an availableNow file stream (4 files, >=4
    micro-batches), each batch's bottom-100 deterministic race keys
    folded into versioned state — bottom-k under a total order is
    idempotent AND mergeable (min-k of a union == min-k of min-ks;
    re-observed docs carry identical keys and dedupe), so the
    maintained sample provably equals the one-shot
    ``corpus_weighted_sample`` (SHARED oracle). The NINTH
    incremental-index family member, and the streaming form of
    reservoir-style sampling a continuous-ingest pipeline actually
    serves: a current size-weighted corpus sample at any moment,
    without re-scanning history.

    Scale: per-increment cost is one micro-batch key projection + a
    (100 + 100)-row merge; state is bounded at k rows forever."""
    import os
    import shutil
    import tempfile

    from rag_lakehouse_spark.streaming.rollup_sink import (
        maintain_weighted_sample,
        read_weighted_sample,
    )

    base = tempfile.mkdtemp(prefix="rls_wsample_stream_")
    try:
        src = os.path.join(base, "docs")
        d = load_table(spark, sf_dir, "documents")
        d.select("doc_id", "n_chars").repartition(4).write.mode(
            "overwrite"
        ).parquet(src)
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(base, "wsample")
        maintain_weighted_sample(spark, stream, state).awaitTermination()
        return (
            read_weighted_sample(spark, state)
            .orderBy(F.asc("sample_key"), F.asc("doc_id"))
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


from rag_lakehouse_spark.plans import registry as _registry2  # noqa: E402

_registry2.QUERIES["corpus_sample_incremental"].oracle = _registry2.QUERIES[
    "corpus_weighted_sample"
].oracle


@register(
    "corpus_domain_blocklist",
    oracle="""
    WITH urls AS (
      SELECT doc_id, n_chars,
             CASE WHEN doc_id % 4 = 1 THEN 'sub.' ELSE '' END
               || 'h' || CAST(doc_id % 23 AS VARCHAR)
               || CASE WHEN doc_id % 6 = 0 THEN '.spam.example'
                       ELSE '.example' END AS host
      FROM documents
    ), bl AS (
      SELECT 'spam.example' AS domain UNION ALL SELECT 'h7.example'
    ), verdicts AS (
      SELECT u.doc_id, u.n_chars, u.host, b.domain
      FROM urls u LEFT JOIN bl b
        ON u.host = b.domain OR u.host LIKE '%.' || b.domain
    )
    SELECT COALESCE(domain, 'allowed') AS reason,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts
    FROM verdicts
    GROUP BY COALESCE(domain, 'allowed')
    """,
    tags=("corpus", "filter", "governance", "join"),
)
def corpus_domain_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL/domain blocklist filtering — the C4/RefinedWeb stage that
    drops documents from banned hosts BEFORE any text processing
    spends compute on them. Hosts are synthesized from closed doc_id
    formulas (subdomain and spam-TLD variants included); the block
    rule is the registrable-suffix convention: a listed domain bans
    the exact host AND every subdomain (``host == domain OR host
    endswith '.' || domain`` — the endswith guard keeps
    ``notspam.example`` safe from a ``spam.example`` listing, which
    substring matching gets wrong). Output: per block-reason (or
    'allowed') document counts, char mass, and distinct hosts — the
    governance sheet a corpus release attaches.

    Scale: the blocklist is a BROADCAST literal table (real lists are
    ~100k rows, still broadcast-size); the non-equi suffix match is a
    BroadcastNestedLoopJoin, map-only over the corpus — no shuffle
    until the bounded per-reason aggregate. At real registrable-suffix
    granularity the equi-join form (extract eTLD+1, hash-join) is the
    100x-list fallback; the suffix form here also covers multi-label
    listings that eTLD+1 extraction cannot express.

    Reference parity: the reference scrapes a fixed allowlisted site
    (jobs/scraper.py:33); blocklisting is the inverse control a
    multi-source crawl needs."""
    d = load_table(spark, sf_dir, "documents")
    urls = d.select(
        "doc_id",
        "n_chars",
        F.concat(
            F.when(F.col("doc_id") % 4 == 1, F.lit("sub.")).otherwise(
                F.lit("")
            ),
            F.lit("h"),
            (F.col("doc_id") % 23).cast("string"),
            F.when(
                F.col("doc_id") % 6 == 0, F.lit(".spam.example")
            ).otherwise(F.lit(".example")),
        ).alias("host"),
    )
    bl = spark.createDataFrame(
        [("spam.example",), ("h7.example",)], "domain string"
    )
    cond = (F.col("host") == F.col("domain")) | F.col("host").endswith(
        F.concat(F.lit("."), F.col("domain"))
    )
    verdicts = urls.join(F.broadcast(bl), cond, "left")
    return verdicts.groupBy(
        F.coalesce(F.col("domain"), F.lit("allowed")).alias("reason")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.count_distinct("host").cast("bigint").alias("n_hosts"),
    )
