"""Lexical (BM25) and hybrid (reciprocal-rank-fusion) retrieval over
the documents/embeddings tables — the keyword-search half of a RAG
engine. The reference retrieves by vector similarity only (reference
src/api.py:38-42, ChromaDB ``collection.query``); production RAG stacks
pair that with a lexical ranker and fuse (BM25 + RRF, the default in
e.g. OpenSearch/Vespa hybrid search). Public formulas only:
Robertson/Sparck-Jones BM25 (k1=1.2, b=0.75, Lucene's positive
``ln(1 + (N-df+0.5)/(df+0.5))`` idf) and Cormack et al. reciprocal rank
fusion ``1/(60+rank)``.

Cross-engine exactness: every arithmetic step is an IEEE-correctly-
rounded op (mul/div/add) on bit-identical inputs, EXCEPT ``ln`` —
libm/JDK natural logs are not guaranteed correctly rounded, so the
per-term idf is rounded to 9 decimals on BOTH engines (a 1-ulp input
disagreement only survives rounding in a ~1e-7-wide boundary window;
verified green at sf0.001/0.01/0.1). Per-document score summation uses
a conditional-aggregation pivot into per-term columns added in a FIXED
left-to-right order — never an unordered float SUM (the registry's
standing float-determinism rule; adding literal 0.0 for absent terms
is exact, so pivot zeros cannot perturb the fold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from rag_lakehouse_spark.functions import vector as VEC
from rag_lakehouse_spark.functions.text import DUCKDB_WS, WS, duckdb_edge_trim, edge_trim
from rag_lakehouse_spark.plans.registry import register
from rag_lakehouse_spark.sources.tables import load_table

# The fixed benchmark query: terms chosen with distinct document
# frequencies in the synthetic corpus so the idf weighting actually
# orders them. k1/b are the standard BM25 defaults.
QUERY_TERMS: tuple[str, ...] = ("vector", "query", "merge", "stream", "filter")
K1 = 1.2
B = 0.75
RRF_K = 60  # Cormack et al. 2009 constant
QUERY_VEC_ID = 0  # the dense-retrieval query vector (same as knn_topk_exact)


def _toks(text_col: str = "text"):
    """Whitespace tokens of the lowercased trimmed text — the simhash
    token contract (NULL → single empty token) so lexical search and
    near-dup fingerprints agree on what a token is."""
    return F.split(edge_trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), WS)


_DUCK_TOKS = (
    "regexp_split_to_array(" + duckdb_edge_trim("lower(coalesce(text, ''))") + ", '" + DUCKDB_WS + "')"
)


def bm25_scores(
    docs: DataFrame,
    terms: tuple[str, ...] = QUERY_TERMS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, score) BM25 scores for every document containing at
    least one query term.

    Plan: one tokenize pass computes doc length (``size`` on the token
    array — no explode needed); a second explode pass is filtered to
    the query terms IMMEDIATELY after the generator, so the (doc, term)
    tf relation that reaches the shuffle is |docs| × |terms| at most.
    df/N/avgdl are tiny aggregates broadcast back; the per-term pivot
    is a conditional-sum groupBy on the doc id. At 100 TB: tf rows
    shuffle on doc_id only, every stats side broadcasts, and the final
    top-k (in the registered query) is TakeOrderedAndProject.
    """
    lens = docs.select(F.col(id_col), F.size(_toks(text_col)).alias("dl"))
    tf = (
        docs.select(F.col(id_col), F.explode(_toks(text_col)).alias("term"))
        .filter(F.col("term").isin(*terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return bm25_from_stats(tf, lens, terms, id_col)


def bm25_from_stats(
    tf: DataFrame,
    lens: DataFrame,
    terms: tuple[str, ...] = QUERY_TERMS,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 scoring from precomputed statistics: ``tf`` =
    (id, term, tf) for at least the query terms, ``lens`` = (id, dl)
    for EVERY document. Shared by the one-shot ``bm25_scores`` and the
    streaming-maintained postings index (``streaming.search_sink``) —
    identical inputs produce bit-identical scores, which is what lets
    the incremental path share the one-shot oracle."""
    tf = tf.filter(F.col("term").isin(*terms))
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    idf = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(stats.select("n_docs")))
        .select(
            "term",
            F.round(
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                ),
                9,
            ).alias("idf"),
        )
    )
    contrib = (
        tf.join(lens, id_col)
        .join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(stats.select("avgdl")))
        .select(
            F.col(id_col),
            F.col("term"),
            (
                F.col("idf")
                * (F.col("tf") * F.lit(K1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(K1)
                    * (F.lit(1.0 - B) + F.lit(B) * F.col("dl") / F.col("avgdl"))
                )
            ).alias("contrib"),
        )
    )
    per_term = [
        F.sum(F.when(F.col("term") == t, F.col("contrib")).otherwise(F.lit(0.0))).alias(
            f"__c{i}"
        )
        for i, t in enumerate(terms)
    ]
    pivoted = contrib.groupBy(id_col).agg(*per_term)
    score = F.col("__c0")
    for i in range(1, len(terms)):
        score = score + F.col(f"__c{i}")  # fixed left-to-right fold
    return pivoted.select(F.col(id_col), score.alias("score"))


def _duckdb_bm25_ctes(terms: tuple[str, ...] = QUERY_TERMS) -> str:
    """CTE chain (no leading WITH) ending in ``bm25(doc_id, score)`` —
    the bit-exact DuckDB twin of ``bm25_scores`` over ``documents``."""
    in_list = ", ".join(f"'{t}'" for t in terms)
    # NB: every float constant is written in scientific notation — a bare
    # `0.5` parses as DECIMAL in DuckDB and would route the arithmetic
    # through decimal typing instead of the IEEE double ops Spark runs.
    pivot_cols = ",\n             ".join(
        f"SUM(CASE WHEN term = '{t}' THEN contrib ELSE 0e0 END) AS c{i}"
        for i, t in enumerate(terms)
    )
    fold = ""
    for i in range(len(terms)):
        fold = f"({fold} + c{i})" if fold else f"c{i}"
    return f"""lens AS (SELECT doc_id, len({_DUCK_TOKS}) AS dl FROM documents),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM (
        SELECT doc_id, unnest({_DUCK_TOKS}) AS term FROM documents)
      WHERE term IN ({in_list})
      GROUP BY doc_id, term
    ),
    stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(CAST(SUM(dl) AS BIGINT) AS DOUBLE) / COUNT(*) AS avgdl
      FROM lens
    ),
    idf AS (
      SELECT term,
             round(ln(1e0 + (n_docs - df + 5e-1) / (df + 5e-1)), 9) AS idf
      FROM (SELECT term, COUNT(*) AS df FROM tf GROUP BY term), stats
    ),
    contrib AS (
      SELECT t.doc_id, t.term,
             idf.idf * (t.tf * {K1 + 1.0!r}e0)
               / (t.tf + {K1!r}e0 * ({1.0 - B!r}e0 + {B!r}e0 * l.dl / s.avgdl)) AS contrib
      FROM tf t JOIN lens l ON l.doc_id = t.doc_id
      JOIN idf ON idf.term = t.term, stats s
    ),
    pivoted AS (
      SELECT doc_id,
             {pivot_cols}
      FROM contrib GROUP BY doc_id
    ),
    bm25 AS (SELECT doc_id, {fold} AS score FROM pivoted)"""


_BM25_TOPK_ORACLE = f"""
    WITH {_duckdb_bm25_ctes()}
    SELECT b.doc_id, d.source, b.score
    FROM bm25 b JOIN documents d ON d.doc_id = b.doc_id
    ORDER BY b.score DESC, b.doc_id
    LIMIT 10
    """


@register(
    "rag_bm25_topk",
    oracle=_BM25_TOPK_ORACLE,
    tags=("rag", "search", "bm25", "topk"),
)
def rag_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval: top-10 documents for the fixed query
    terms, with source attribution. The lexical counterpart of
    ``knn_topk_exact`` — together they are the two halves the hybrid
    query fuses.

    Scale: see ``bm25_scores`` (tf shuffle bounded by |docs|×|terms|,
    all stats broadcast); the final top-k is ORDER BY + LIMIT →
    TakeOrderedAndProject (per-partition partial top-k, no global sort).
    """
    d = load_table(spark, sf_dir, "documents")
    scored = bm25_scores(d)
    return (
        scored.join(d.select("doc_id", "source"), "doc_id")
        .select("doc_id", "source", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


_VEC_SCORE = (
    f"{VEC.duckdb_dot('b.embedding', 'a.embedding')} / (b.nrm * a.nrm + 1e-24)"
)


@register(
    "rag_hybrid_rrf",
    oracle=f"""
    WITH {_duckdb_bm25_ctes()},
    lex AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS lex_rank
      FROM bm25 QUALIFY lex_rank <= 20
    ),
    e AS (SELECT vec_id, embedding,
                 sqrt({VEC.duckdb_dot("embedding", "embedding")}) AS nrm
          FROM embeddings),
    vec AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY vscore DESC, doc_id) AS vec_rank
      FROM (
        SELECT b.vec_id AS doc_id, {_VEC_SCORE} AS vscore
        FROM e a, e b
        WHERE a.vec_id = {QUERY_VEC_ID} AND b.vec_id <> {QUERY_VEC_ID})
      QUALIFY vec_rank <= 20
    )
    SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
           l.lex_rank, v.vec_rank,
           (COALESCE(1e0 / ({RRF_K} + l.lex_rank), 0e0)
            + COALESCE(1e0 / ({RRF_K} + v.vec_rank), 0e0)) AS rrf_score
    FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
    ORDER BY rrf_score DESC, doc_id
    LIMIT 10
    """,
    tags=("rag", "search", "hybrid", "rrf"),
)
def rag_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-20 and dense-cosine top-20 rank lists
    fused by reciprocal rank fusion (``1/(60+rank)`` per list, absent →
    0). Rank arithmetic is integer → the RRF score is two
    correctly-rounded divisions plus one add, bit-identical across
    engines with no rounding step needed.

    Scale: both rank lists are top-k prunes (TakeOrderedAndProject /
    WindowGroupLimit) of independently-scalable retrieval plans; the
    fusion join is over ≤ 2k rows — driver-negligible at any corpus
    size. doc_id ↔ vec_id share the id space (the embeddings table is
    the documents table's vector projection, as in rag_retrieve_context).
    """
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "nrm", VEC.l2_norm("embedding")
    )
    # Top-20 prune FIRST (TakeOrderedAndProject — per-partition partial
    # top-k), then rank the surviving 20 rows; a bare global row_number
    # window would funnel every scored doc through one partition.
    lex = (
        bm25_scores(d)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
        .withColumn(
            "lex_rank",
            F.row_number().over(W.orderBy(F.desc("score"), F.asc("doc_id"))),
        )
        .select("doc_id", "lex_rank")
    )
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    vec = (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            (
                VEC.dot("embedding", "q_emb")
                / (F.col("nrm") * F.col("q_nrm") + F.lit(1e-24))
            ).alias("vscore"),
        )
        .orderBy(F.desc("vscore"), F.asc("doc_id"))
        .limit(20)
        .withColumn(
            "vec_rank",
            F.row_number().over(W.orderBy(F.desc("vscore"), F.asc("doc_id"))),
        )
        .select("doc_id", "vec_rank")
    )
    fused = lex.join(vec, "doc_id", "full_outer").select(
        "doc_id",
        "lex_rank",
        "vec_rank",
        (
            F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("vec_rank")), F.lit(0.0))
        ).alias("rrf_score"),
    )
    return fused.orderBy(F.desc("rrf_score"), F.asc("doc_id")).limit(10)


@register(
    "rag_bm25_incremental",
    oracle=_BM25_TOPK_ORACLE,
    tags=("rag", "search", "bm25", "streaming"),
)
def rag_bm25_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 served from a STREAMING-maintained term-postings
    index: documents replay through an availableNow file stream (4
    files, ≥4 micro-batches), each batch tokenizing only its own docs
    and appending (doc_id, term, tf) postings as an immutable O(batch)
    delta; an offline compaction merges the deltas; then BM25 runs from
    the maintained state through the same ``bm25_from_stats``
    arithmetic as the one-shot query — bit-identical scores, so this
    row shares ``rag_bm25_topk``'s DuckDB oracle (which also makes the
    hash check verify that compaction is row-preserving).

    The pattern that lets a continuously-ingesting corpus serve lexical
    search without re-tokenizing history — the search-family member of
    the incremental-index story (exact dedup, MinHash postings, IVF
    assignments, term postings).
    """
    import os
    import shutil
    import tempfile

    from rag_lakehouse_spark.streaming.append_state import compact_state
    from rag_lakehouse_spark.streaming.search_sink import (
        bm25_from_postings,
        maintain_term_postings,
    )

    base = tempfile.mkdtemp(prefix="rls_bm25_stream_")
    try:
        src = os.path.join(base, "documents")
        d = load_table(spark, sf_dir, "documents")
        d.select("doc_id", "text").repartition(4).write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(base, "term_postings")
        maintain_term_postings(spark, stream, state).awaitTermination()
        compact_state(spark, state)
        scored = bm25_from_postings(spark, state)
        return (
            scored.join(d.select("doc_id", "source"), "doc_id")
            .select("doc_id", "source", "score")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(10)
            .localCheckpoint(eager=True)  # detach from the temp state dir
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "corpus_heavy_tokens_incremental",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(list_filter({_DUCK_TOKS}, t -> t <> '')) AS t
      FROM documents
    ), tot AS (SELECT COUNT(*) AS n FROM toks)
    SELECT t AS item, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM toks, tot
    GROUP BY t, n
    HAVING COUNT(*) * 200 >= n
    """,
    tags=("text", "heavy-hitters", "streaming"),
)
def corpus_heavy_tokens_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy tokens served from the STREAMING-maintained term-postings
    index (same availableNow replay + delta-append + compaction as
    ``rag_bm25_incremental``): one maintained index, multiple exact
    serving paths — lexical search AND corpus frequency analytics read
    the identical state. Because term counts are mergeable, the
    incremental path needs no sketch; the one-shot Misra-Gries query
    (``corpus_heavy_tokens``) is the unindexed-scan counterpart.
    Hash-checked against DuckDB's plain GROUP BY/HAVING over all docs —
    which simultaneously verifies the replay covered every batch and
    compaction preserved rows."""
    import os
    import shutil
    import tempfile

    from rag_lakehouse_spark.streaming.append_state import compact_state
    from rag_lakehouse_spark.streaming.search_sink import (
        heavy_terms_from_postings,
        maintain_term_postings,
    )

    base = tempfile.mkdtemp(prefix="rls_hh_stream_")
    try:
        src = os.path.join(base, "documents")
        d = load_table(spark, sf_dir, "documents")
        d.select("doc_id", "text").repartition(4).write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(base, "term_postings")
        maintain_term_postings(spark, stream, state).awaitTermination()
        compact_state(spark, state)
        return heavy_terms_from_postings(spark, state).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "rag_retrieve_rerank",
    oracle=f"""
    WITH {_duckdb_bm25_ctes()},
    lex AS (
      SELECT doc_id, score AS lex_score,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rn
      FROM bm25 QUALIFY rn <= 50
    ),
    e AS (SELECT vec_id, embedding,
                 sqrt({VEC.duckdb_dot("embedding", "embedding")}) AS nrm
          FROM embeddings),
    rer AS (
      SELECT l.doc_id, l.lex_score, {_VEC_SCORE} AS dense_score
      FROM lex l JOIN e b ON b.vec_id = l.doc_id, e a
      WHERE a.vec_id = {QUERY_VEC_ID}
    )
    SELECT doc_id, lex_score, dense_score FROM rer
    ORDER BY dense_score DESC, doc_id
    LIMIT 10
    """,
    tags=("rag", "search", "rerank"),
)
def rag_retrieve_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieve-then-rerank (the OTHER standard hybrid, next
    to RRF fusion): a cheap lexical recall stage (BM25 top-50,
    TakeOrderedAndProject) followed by an expensive scorer applied to
    candidates ONLY (dense cosine vs the query vector), final top-10 by
    the reranker. This is the cascade every production RAG stack runs —
    the rerank cost is bounded by the candidate count, never the
    corpus.

    Scale: stage-1 prune is per-partition top-k; stage-2 joins 50 rows
    against the embeddings table on its id (broadcast the 50, one dot
    fold each); the corpus is only ever touched by the BM25 stats
    pass."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "nrm", VEC.l2_norm("embedding")
    )
    lex50 = (
        bm25_scores(d)
        .select("doc_id", F.col("score").alias("lex_score"))
        .orderBy(F.desc("lex_score"), F.asc("doc_id"))
        .limit(50)
    )
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    rer = (
        F.broadcast(lex50)
        .join(e, e.vec_id == lex50.doc_id)
        .crossJoin(F.broadcast(q))
        .select(
            "doc_id",
            "lex_score",
            (
                VEC.dot("embedding", "q_emb")
                / (F.col("nrm") * F.col("q_nrm") + F.lit(1e-24))
            ).alias("dense_score"),
        )
    )
    return rer.orderBy(F.desc("dense_score"), F.asc("doc_id")).limit(10)


RM3_FB_DOCS = 10   # pseudo-relevance feedback depth
RM3_FB_TERMS = 5   # expansion terms added to the query


def _bm25_contribs(
    docs: DataFrame,
    terms_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, term, contrib) — the per-(document, term) BM25 contribution
    for every corpus document and every term in the DYNAMIC term set
    (a 1-column ``term`` DataFrame). Shared by ``bm25_scores_dynamic``
    (per-doc fold) and ``rag_eval_bm25`` (per-query fold) so the two
    cannot drift; same K1/B/idf arithmetic as ``bm25_from_stats``.

    Scale: identical to the static scorer — tf filtered by a broadcast
    semi-join against the term set instead of an IN literal; df/avgdl
    are tiny broadcast aggregates."""
    lens = docs.select(F.col(id_col), F.size(_toks(text_col)).alias("dl"))
    tf = (
        docs.select(F.col(id_col), F.explode(_toks(text_col)).alias("term"))
        .filter(F.col("term") != "")
        .join(F.broadcast(terms_df), "term")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return _bm25_contribs_from_stats(tf, lens, id_col)


def _bm25_contribs_from_stats(
    tf: DataFrame,
    lens: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Contribution arithmetic from precomputed ``tf`` = (id, term, tf)
    — already restricted to the dynamic term set — and ``lens`` =
    (id, dl) for EVERY document. The from-stats seam lets the
    streaming-maintained postings index (``streaming.search_sink``)
    feed the SAME arithmetic, which is what lets
    ``rag_eval_bm25_incremental`` share the batch oracle."""
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    idf = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(stats.select("n_docs")))
        .select(
            "term",
            F.round(
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                ),
                9,
            ).alias("idf"),
        )
    )
    contrib = (
        tf.join(lens, id_col)
        .join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(stats.select("avgdl")))
        .select(
            F.col(id_col),
            "term",
            (
                F.col("idf")
                * (F.col("tf") * F.lit(K1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(K1)
                    * (F.lit(1.0 - B) + F.lit(B) * F.col("dl") / F.col("avgdl"))
                )
            ).alias("contrib"),
        )
    )
    return contrib


def _term_sorted_score_fold():
    """Sum of ``contrib`` in TERM-SORTED order — the deterministic
    replacement for an unordered float SUM when the term set is
    dynamic; mirrored in oracles by ``list_reduce(list_prepend(0e0,
    array_agg(contrib ORDER BY term)))``."""
    return F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct("term", "contrib"))),
            lambda x: x["contrib"],
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def bm25_scores_dynamic(
    docs: DataFrame,
    terms_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 over a DYNAMIC term set (a 1-column ``term`` DataFrame):
    the static per-term pivot that makes the fixed-terms scorer's
    double addition order deterministic can't exist here, so each
    doc's contributions are summed by an explicit TERM-SORTED left
    fold — bit-reproducible on any partitioning. Contribution
    arithmetic lives in ``_bm25_contribs`` (shared with the BM25
    retrieval evaluator)."""
    contrib = _bm25_contribs(docs, terms_df, id_col, text_col)
    return contrib.groupBy(id_col).agg(_term_sorted_score_fold().alias("score"))


def _duckdb_rm3_oracle() -> str:
    in_list = ", ".join(f"'{t}'" for t in QUERY_TERMS)
    contrib = (
        f"idf.idf * (t.tf * {K1 + 1.0!r}e0)"
        f" / (t.tf + {K1!r}e0 * ({1.0 - B!r}e0 + {B!r}e0 * l.dl / s.avgdl))"
    )
    return f"""
    WITH {_duckdb_bm25_ctes()},
    top10 AS (
      SELECT doc_id FROM bm25 ORDER BY score DESC, doc_id LIMIT {RM3_FB_DOCS}
    ),
    alltf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM (
        SELECT doc_id, unnest({_DUCK_TOKS}) AS term FROM documents)
      WHERE term <> '' GROUP BY doc_id, term
    ),
    expansion AS (
      SELECT term FROM alltf JOIN top10 USING (doc_id)
      WHERE term NOT IN ({in_list})
      GROUP BY term ORDER BY CAST(SUM(tf) AS BIGINT) DESC, term
      LIMIT {RM3_FB_TERMS}
    ),
    terms2 AS (
      SELECT term FROM expansion
      UNION ALL SELECT unnest([{in_list}]) AS term
    ),
    tf2 AS (SELECT a.* FROM alltf a JOIN terms2 USING (term)),
    idf2 AS (
      SELECT term,
             round(ln(1e0 + (n_docs - df + 5e-1) / (df + 5e-1)), 9) AS idf
      FROM (SELECT term, COUNT(*) AS df FROM tf2 GROUP BY term), stats
    ),
    contrib2 AS (
      SELECT t.doc_id, t.term, {contrib.replace('idf.idf', 'idf2.idf')} AS contrib
      FROM tf2 t JOIN lens l ON l.doc_id = t.doc_id
      JOIN idf2 ON idf2.term = t.term, stats s
    ),
    rescored AS (
      SELECT doc_id,
             list_reduce(list_prepend(0e0, array_agg(contrib ORDER BY term)),
                         (a, b) -> a + b) AS score
      FROM contrib2 GROUP BY doc_id
    )
    SELECT doc_id, score FROM rescored ORDER BY score DESC, doc_id LIMIT 10
    """


@register(
    "rag_rm3_expansion",
    oracle=None,  # set below (builder needs module constants)
    tags=("rag", "search", "query-expansion", "rm3"),
)
def rag_rm3_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RM3-style pseudo-relevance feedback: BM25 top-10 for the
    original query → the 5 highest-tf new terms in those docs (integer
    selection, lexicographic tie-break) join the query → the expanded
    query rescores the corpus → top-10. The classic recall-widening
    second pass, end-to-end deterministic: expansion is integer
    arithmetic and the dynamic-term rescore folds contributions in
    term order (``bm25_scores_dynamic``), so the doubles agree
    bit-for-bit across engines without a static pivot.

    Scale: stage 1 is the standard BM25 plan; expansion selection
    aggregates tf over 10 docs (broadcast semi-join); stage 2 is BM25
    again with a 10-term broadcast set. Corpus scanned twice, shuffles
    bounded by |docs| × |terms| both times."""
    d = load_table(spark, sf_dir, "documents")
    top10 = (
        bm25_scores(d)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(RM3_FB_DOCS)
        .select("doc_id")
    )
    alltf = (
        d.select("doc_id", F.explode(_toks("text")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    expansion = (
        alltf.join(F.broadcast(top10), "doc_id")
        .filter(~F.col("term").isin(*QUERY_TERMS))
        .groupBy("term")
        .agg(F.sum("tf").cast("bigint").alias("total_tf"))
        .orderBy(F.desc("total_tf"), F.asc("term"))
        .limit(RM3_FB_TERMS)
        .select("term")
    )
    orig = spark.createDataFrame([(t,) for t in QUERY_TERMS], "term string")
    terms2 = expansion.unionByName(orig)
    return (
        bm25_scores_dynamic(d, terms2)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


from rag_lakehouse_spark.plans import registry as _registry  # noqa: E402

_registry.QUERIES["rag_rm3_expansion"].oracle = _duckdb_rm3_oracle()


@register(
    "text_tfidf_keywords",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter({_DUCK_TOKS}, t -> t <> '')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM toks GROUP BY 1, 2),
    stats AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM toks),
    idf AS (
      SELECT term, round(ln(CAST(n_docs AS DOUBLE) / df), 9) AS idf
      FROM (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
           stats
    ),
    scored AS (
      SELECT t.doc_id, t.term, t.tf * idf.idf AS score
      FROM tf t JOIN idf USING (term)
    ),
    ranked AS (
      SELECT doc_id, term, score,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term ASC) AS rank
      FROM scored
    )
    SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, score
    FROM ranked WHERE rank <= 3
    """,
    tags=("text", "search", "keywords", "training-data"),
)
def text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-3 terms by tf·idf — the
    classic summarization/labeling pass (and the cheap topic signal a
    corpus browser or mixture report shows next to each source).

    Exactness: tf and df are integers; idf = ln(N/df) rounded to 9
    decimals (the standing BM25-idf rule — the one transcendental both
    engines agree on after rounding); score = integer·rounded-double,
    one deterministic product; ties break on term ASC.

    Scale: the tf groupBy shuffles (doc, term); idf is a
    vocabulary-sized aggregate joined back on term (AQE-skew-safe);
    the per-doc top-3 is a WindowGroupLimit — rank truncation happens
    map-side before the exchange, so the window never materializes a
    doc's full vocabulary downstream."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(_toks("text")).alias("term")).filter(
        F.col("term") != ""
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    stats = toks.agg(F.countDistinct("doc_id").cast("bigint").alias("n_docs"))
    idf = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            F.round(F.log(F.col("n_docs").cast("double") / F.col("df")), 9).alias(
                "idf"
            ),
        )
    )
    scored = tf.join(idf, "term").select(
        "doc_id", "term", (F.col("tf") * F.col("idf")).alias("score")
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", F.col("rank").cast("bigint").alias("rank"), "term", "score")
    )


# Retrieval-evaluation gains: DCG discount 1/log2(rank+1) and its ideal
# prefix sums, computed ONCE in Python at import and embedded as the
# SAME literal doubles in both engines — no transcendental runs at
# query time, so NDCG needs no rounding precedent at all.
import math as _math  # noqa: E402

_NDCG_GAIN = tuple(1.0 / _math.log2(r + 1) for r in range(1, 11))
_NDCG_IDEAL = []
_acc = 0.0
for _g in _NDCG_GAIN:  # left-to-right prefix, same adds both engines
    _acc += _g
    _NDCG_IDEAL.append(_acc)
_NDCG_IDEAL = tuple(_NDCG_IDEAL)
# EXPONENT notation is load-bearing (r10 fuzz catch): DuckDB lexes a
# bare 17-digit literal like 0.38685280723454163 as DECIMAL, and its
# DECIMAL->DOUBLE conversion can land one ulp off Python's correctly-
# rounded parse — 3.86852807234541630e-01 parses as DOUBLE directly
# (fast_float, correctly rounded, bit-equal to the Spark F.lit). The
# ANN-twin literals are unaffected: binary quarters are exact in
# few-digit decimal, so their DECIMAL->DOUBLE conversion is exact.
# RULE: any non-dyadic double embedded in an oracle string must carry
# an exponent.
_GAIN_SQL = "[" + ", ".join(f"{g:.17e}" for g in _NDCG_GAIN) + "]"
_IDEAL_SQL = "[" + ", ".join(f"{x:.17e}" for x in _NDCG_IDEAL) + "]"

# The metric tail shared by every retrieval evaluator (dense
# rag_eval_retrieval, lexical rag_eval_bm25): given hits(query_id,
# rank<=10) and nrel(query_id, n_rel>=1), emit MRR/recall@10/NDCG@10
# per query. ONE text / ONE plan for both rungs so they cannot drift.
_EVAL_METRICS_SQL = f"""agg AS (
      SELECT query_id,
             CAST(MIN(rank) AS INT) AS first_rel_rank,
             CAST(COUNT(*) AS BIGINT) AS n_hit,
             list_reduce(
               list_prepend(0e0, list_transform(
                 list_sort(array_agg(rank)), r -> ({_GAIN_SQL})[r])),
               (a, x) -> a + x) AS dcg
      FROM hits GROUP BY query_id
    )
    SELECT n.query_id, a.first_rel_rank,
           coalesce(1.0 / a.first_rel_rank, 0.0) AS rr,
           n.n_rel,
           CAST(coalesce(a.n_hit, 0) AS BIGINT) AS n_hit,
           coalesce(CAST(a.n_hit AS DOUBLE) / n.n_rel, 0.0) AS recall_at_10,
           coalesce(a.dcg / ({_IDEAL_SQL})[CAST(least(n.n_rel, 10) AS INT)], 0.0)
             AS ndcg_at_10
    FROM nrel n LEFT JOIN agg a USING (query_id)"""


def _eval_metrics(hits: DataFrame, nrel: DataFrame) -> DataFrame:
    """Spark twin of ``_EVAL_METRICS_SQL``: DCG folds the sorted hit
    ranks left-to-right over the Python-literal gain LUT, IDCG indexes
    the literal prefix-sum array — no transcendental at query time."""
    gain = F.array(*[F.lit(g) for g in _NDCG_GAIN])
    ideal = F.array(*[F.lit(x) for x in _NDCG_IDEAL])
    agg = hits.groupBy("query_id").agg(
        F.min("rank").cast("int").alias("first_rel_rank"),
        F.count(F.lit(1)).cast("bigint").alias("n_hit"),
        F.aggregate(
            F.array_sort(F.collect_list("rank")),
            F.lit(0.0),
            lambda a, r: a + F.element_at(gain, r),
        ).alias("dcg"),
    )
    return nrel.join(agg, "query_id", "left").select(
        "query_id",
        "first_rel_rank",
        F.coalesce(F.lit(1.0) / F.col("first_rel_rank"), F.lit(0.0)).alias("rr"),
        "n_rel",
        F.coalesce(F.col("n_hit"), F.lit(0)).cast("bigint").alias("n_hit"),
        F.coalesce(
            F.col("n_hit").cast("double") / F.col("n_rel"), F.lit(0.0)
        ).alias("recall_at_10"),
        F.coalesce(
            F.col("dcg")
            / F.element_at(ideal, F.least(F.col("n_rel"), F.lit(10)).cast("int")),
            F.lit(0.0),
        ).alias("ndcg_at_10"),
    )


# Graded-relevance extension of the shared tail (r12, VERDICT r11 #7):
# relevance levels g ∈ {1, 2} with the standard graded gain 2^g - 1
# (→ weights 1 and 3, exact small integers, so the per-hit product
# w·discount is ONE correctly-rounded multiply in both engines), DCG
# folded over rank-sorted (rank, rel) hits left-to-right, and IDCG
# composed from the SAME literal prefix-sum array: ideal ordering puts
# all level-2 docs first, so
#   IDCG = 3·P[min(c2,10)] + (P[min(c2+c1,10)] - P[min(c2,10)])
# with P the literal _NDCG_IDEAL prefix sums — no transcendental at
# query time, same as the binary tail.
_EVAL_METRICS_GRADED_SQL = f"""agg AS (
      SELECT query_id,
             CAST(MIN(rank) AS INT) AS first_rel_rank,
             CAST(COUNT(*) AS BIGINT) AS n_hit,
             list_reduce(
               list_prepend(0e0, list_transform(
                 list_sort(array_agg([rank, rel])),
                 p -> (CASE WHEN p[2] = 2 THEN 3e0 ELSE 1e0 END)
                        * ({_GAIN_SQL})[p[1]])),
               (a, x) -> a + x) AS dcg
      FROM hits GROUP BY query_id
    ), idcg AS (
      SELECT query_id,
             (CASE WHEN least(n_rel2, 10) > 0
                   THEN 3e0 * ({_IDEAL_SQL})[CAST(least(n_rel2, 10) AS INT)]
                   ELSE 0e0 END)
             + (CASE WHEN least(n_rel2 + n_rel1, 10) > 0
                     THEN ({_IDEAL_SQL})[CAST(least(n_rel2 + n_rel1, 10) AS INT)]
                     ELSE 0e0 END)
             - (CASE WHEN least(n_rel2, 10) > 0
                     THEN ({_IDEAL_SQL})[CAST(least(n_rel2, 10) AS INT)]
                     ELSE 0e0 END) AS ideal
      FROM nrel
    )
    SELECT n.query_id, a.first_rel_rank,
           coalesce(1.0 / a.first_rel_rank, 0.0) AS rr,
           n.n_rel1, n.n_rel2,
           CAST(coalesce(a.n_hit, 0) AS BIGINT) AS n_hit,
           coalesce(CAST(a.n_hit AS DOUBLE) / nullif(n.n_rel1 + n.n_rel2, 0),
                    0.0) AS recall_at_10,
           CASE WHEN i.ideal > 0 THEN coalesce(a.dcg / i.ideal, 0.0)
                ELSE 0.0 END AS ndcg_graded_at_10
    FROM nrel n
    JOIN idcg i USING (query_id)
    LEFT JOIN agg a USING (query_id)"""


def _eval_metrics_graded(hits: DataFrame, nrel: DataFrame) -> DataFrame:
    """Spark twin of ``_EVAL_METRICS_GRADED_SQL``: ``hits`` =
    (query_id, rank, rel∈{1,2}) judged top-10 rows, ``nrel`` =
    (query_id, n_rel1, n_rel2) graded relevant-set sizes."""
    gain = F.array(*[F.lit(g) for g in _NDCG_GAIN])
    ideal = F.array(*[F.lit(x) for x in _NDCG_IDEAL])

    def prefix(c):  # P[min(c,10)], with P[0] = 0
        cc = F.least(c, F.lit(10)).cast("int")
        return F.when(cc > 0, F.element_at(ideal, cc)).otherwise(F.lit(0.0))

    agg = hits.groupBy("query_id").agg(
        F.min("rank").cast("int").alias("first_rel_rank"),
        F.count(F.lit(1)).cast("bigint").alias("n_hit"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("rank", "rel"))),
            F.lit(0.0),
            lambda a, s: a
            + F.when(s["rel"] == 2, F.lit(3.0)).otherwise(F.lit(1.0))
            * F.element_at(gain, s["rank"]),
        ).alias("dcg"),
    )
    idcg = nrel.select(
        "query_id",
        (
            F.lit(3.0) * prefix(F.col("n_rel2"))
            + prefix(F.col("n_rel2") + F.col("n_rel1"))
            - prefix(F.col("n_rel2"))
        ).alias("ideal"),
    )
    return (
        nrel.join(idcg, "query_id")
        .join(agg, "query_id", "left")
        .select(
            "query_id",
            "first_rel_rank",
            F.coalesce(F.lit(1.0) / F.col("first_rel_rank"), F.lit(0.0)).alias(
                "rr"
            ),
            "n_rel1",
            "n_rel2",
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("bigint").alias("n_hit"),
            F.coalesce(
                F.col("n_hit").cast("double")
                / F.nullif(F.col("n_rel1") + F.col("n_rel2"), F.lit(0)),
                F.lit(0.0),
            ).alias("recall_at_10"),
            F.when(
                F.col("ideal") > 0,
                F.coalesce(F.col("dcg") / F.col("ideal"), F.lit(0.0)),
            )
            .otherwise(F.lit(0.0))
            .alias("ndcg_graded_at_10"),
        )
    )


from rag_lakehouse_spark.plans.embed_common import (  # noqa: E402
    CHUNK_EMB_CTES as _EMBED_CTES,
    chunked_embeddings as _chunked_embeddings,
)


@register(
    "rag_eval_retrieval",
    oracle=f"""
    WITH {_EMBED_CTES}, ranked AS (
      SELECT q.query_id, e.doc_id, e.chunk_id,
             ROW_NUMBER() OVER (
               PARTITION BY q.query_id
               ORDER BY {VEC.duckdb_cosine("e.embedding", "q.q_emb")} DESC,
                        e.chunk_id ASC) AS rank
      FROM emb e, q
    ), nrel AS (
      SELECT doc_id AS query_id, CAST(COUNT(*) AS BIGINT) AS n_rel
      FROM chunks WHERE doc_id < 5 GROUP BY doc_id
    ), hits AS (
      SELECT query_id, rank FROM ranked
      WHERE rank <= 10 AND doc_id = query_id
    ), {_EVAL_METRICS_SQL}
    """,
    tags=("rag", "evaluation", "portable-twin"),
)
def rag_eval_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation — MRR, recall@10, NDCG@10 — over
    the portable embed→search pipeline, fully hash-checked: queries
    are the first 5 document prefixes and a chunk is RELEVANT iff it
    came from the query's own document (self-retrieval ground truth,
    the standard synthetic-relevance protocol when no judgment set
    exists). Per query: the first relevant rank (NULL if none in the
    top-10), reciprocal rank, hit/relevant counts, recall@10, and
    NDCG@10 whose discount gains 1/log2(rank+1) are PYTHON-computed
    literals shared by both engines — DCG folds the sorted hit ranks
    left-to-right, IDCG indexes a literal prefix-sum array, so no
    transcendental is evaluated at query time and the division is the
    only float op on non-literal inputs.

    Scale: the candidate scoring reuses the ``embed_and_search``
    shape (broadcast queries, WindowGroupLimit top-10 per query); the
    metric aggregation touches ≤10 rows per query. Evaluating a real
    judgment set swaps the relevance predicate for a join against the
    qrels table — the metric plan is unchanged. The chunk→embed→query
    scaffolding is shared with ``embed_and_search_portable``
    (plans/embed_common.py) so the twins cannot drift apart."""
    chunks, emb, qs = _chunked_embeddings(spark, sf_dir)
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("chunk_id"))
    ranked = (
        emb.crossJoin(F.broadcast(qs))
        .select(
            "query_id",
            "doc_id",
            "chunk_id",
            VEC.cosine("embedding", "q_emb").alias("score"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
    )
    hits = ranked.filter(F.col("doc_id") == F.col("query_id")).select(
        "query_id", "rank"
    )
    nrel = (
        chunks.filter(F.col("doc_id") < 5)
        .groupBy(F.col("doc_id").alias("query_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rel"))
    )
    return _eval_metrics(hits, nrel)


# ---------------------------------------------------------------------------
# Lexical retrieval evaluation: the BM25 rung of the evaluation ladder.
# Queries are the 5 highest-tf terms of each of the first 5 documents
# (integer selection, lexicographic tie-break — the RM3 expansion
# precedent), and a document is RELEVANT to a query iff it shares the
# query document's source (the topical ground-truth proxy the synthetic
# corpus supports; a real judgment set would swap in a qrels join).
N_EVAL_QUERIES = 5
N_EVAL_QUERY_TERMS = 5

_EVAL_BM25_ORACLE = f"""
    WITH lens AS (SELECT doc_id, len({_DUCK_TOKS}) AS dl FROM documents),
    qtf AS (
      SELECT doc_id AS query_id, term, COUNT(*) AS tf FROM (
        SELECT doc_id, unnest({_DUCK_TOKS}) AS term FROM documents
        WHERE doc_id < {N_EVAL_QUERIES})
      WHERE term <> '' GROUP BY query_id, term
    ),
    qterms AS (
      SELECT query_id, term FROM qtf
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY tf DESC, term) <= {N_EVAL_QUERY_TERMS}
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM (
        SELECT doc_id, unnest({_DUCK_TOKS}) AS term FROM documents)
      WHERE term <> '' AND term IN (SELECT DISTINCT term FROM qterms)
      GROUP BY doc_id, term
    ),
    stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(CAST(SUM(dl) AS BIGINT) AS DOUBLE) / COUNT(*) AS avgdl
      FROM lens
    ),
    idf AS (
      SELECT term,
             round(ln(1e0 + (n_docs - df + 5e-1) / (df + 5e-1)), 9) AS idf
      FROM (SELECT term, COUNT(*) AS df FROM tf GROUP BY term), stats
    ),
    contrib AS (
      SELECT t.doc_id, t.term,
             idf.idf * (t.tf * {K1 + 1.0!r}e0)
               / (t.tf + {K1!r}e0 * ({1.0 - B!r}e0 + {B!r}e0 * l.dl / s.avgdl)) AS contrib
      FROM tf t JOIN lens l ON l.doc_id = t.doc_id
      JOIN idf ON idf.term = t.term, stats s
    ),
    scores AS (
      SELECT q.query_id, c.doc_id,
             list_reduce(list_prepend(0e0, array_agg(c.contrib ORDER BY c.term)),
                         (a, b) -> a + b) AS score
      FROM contrib c JOIN qterms q ON q.term = c.term
      GROUP BY q.query_id, c.doc_id
    ),
    ranked AS (
      SELECT query_id, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
      FROM scores
    ),
    qsrc AS (
      SELECT doc_id AS query_id, source AS q_source FROM documents
      WHERE doc_id < {N_EVAL_QUERIES}
    ),
    nrel AS (
      SELECT q.query_id, CAST(COUNT(*) AS BIGINT) AS n_rel
      FROM documents d JOIN qsrc q ON d.source = q.q_source
      GROUP BY q.query_id
    ),
    hits AS (
      SELECT r.query_id, r.rank
      FROM ranked r
      JOIN documents d ON d.doc_id = r.doc_id
      JOIN qsrc q ON q.query_id = r.query_id
      WHERE r.rank <= 10 AND d.source = q.q_source
    ),
    {_EVAL_METRICS_SQL}
    """


@register(
    "rag_eval_bm25",
    oracle=_EVAL_BM25_ORACLE,
    tags=("rag", "evaluation", "bm25"),
)
def rag_eval_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation — MRR, recall@10, NDCG@10 — over
    the LEXICAL (BM25) pipeline, fully hash-checked: with
    ``rag_eval_retrieval`` this covers both rungs of the retrieval
    ladder (dense and keyword) under ONE shared metric tail
    (``_eval_metrics`` / ``_EVAL_METRICS_SQL``), so the two
    evaluators cannot drift apart. Per query: its document's 5
    highest-tf terms (integer selection, lexicographic tie-break)
    form the term set; every corpus document is scored by
    ``_bm25_contribs`` (the exact ``bm25_scores_dynamic``
    arithmetic) with the per-(query, doc) score folded in TERM-SORTED
    order, ranked top-10, and judged against the same-source
    relevance set. NULL-source query docs drop out of ``nrel`` (NULL
    never equals) identically in both engines.

    Scale: query term selection aggregates 5 documents; the corpus tf
    pass is one explode filtered by a broadcast ≤25-term semi-join
    (so (doc, term) rows reaching the shuffle are bounded by
    |docs| x 25); df/avgdl broadcast; ranking is a per-query window
    over docs that matched at least one term; the metric aggregation
    touches ≤10 rows per query. Swapping a real query log + qrels
    replaces ``qterms``/``nrel`` joins only — the scoring and metric
    plans are unchanged."""
    docs = load_table(spark, sf_dir, "documents")
    qtf = (
        docs.filter(F.col("doc_id") < N_EVAL_QUERIES)
        .select(F.col("doc_id").alias("query_id"), F.explode(_toks()).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )

    def corpus_tf(terms_df: DataFrame) -> DataFrame:
        return (
            docs.select("doc_id", F.explode(_toks()).alias("term"))
            .filter(F.col("term") != "")
            .join(F.broadcast(terms_df), "term")
            .groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
        )

    lens = docs.select("doc_id", F.size(_toks()).alias("dl"))
    return _eval_bm25_pipeline(
        docs.select("doc_id", "source"), qtf, corpus_tf, lens
    )


def _eval_bm25_pipeline(docs_dim, qtf, corpus_tf, lens) -> DataFrame:
    """The evaluator pipeline from its stats sources — ``docs_dim`` =
    (doc_id, source), ``qtf`` = (query_id, term, tf) full vocabulary of
    the query documents (empty token excluded), ``corpus_tf(terms_df)``
    = (doc_id, term, tf) restricted to the given term set, ``lens`` =
    (doc_id, dl). Shared by the batch ``rag_eval_bm25`` (stats from
    text) and ``rag_eval_bm25_incremental`` (stats from the
    streaming-maintained postings index), so the two serve
    bit-identical metrics and one oracle checks both."""
    wq = W.partitionBy("query_id").orderBy(F.desc("tf"), F.asc("term"))
    qterms = (
        qtf.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= N_EVAL_QUERY_TERMS)
        .select("query_id", "term")
    )
    contrib = _bm25_contribs_from_stats(
        corpus_tf(qterms.select("term").distinct()), lens
    )
    scores = (
        contrib.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(_term_sorted_score_fold().alias("score"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    ranked = (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
    )
    qsrc = (
        docs_dim.filter(F.col("doc_id") < N_EVAL_QUERIES)
        .select(F.col("doc_id").alias("query_id"), F.col("source").alias("q_source"))
    )
    src_counts = docs_dim.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rel")
    )
    nrel = qsrc.join(
        src_counts, qsrc.q_source == src_counts.source
    ).select("query_id", "n_rel")
    hits = (
        docs_dim.select("doc_id", "source")
        .join(F.broadcast(ranked), "doc_id")
        .join(F.broadcast(qsrc), "query_id")
        .filter(F.col("source") == F.col("q_source"))
        .select("query_id", "rank")
    )
    return _eval_metrics(hits, nrel)


@register(
    "rag_eval_bm25_incremental",
    oracle=_EVAL_BM25_ORACLE,  # served state == one-shot stats, same metrics
    tags=("rag", "evaluation", "bm25", "streaming"),
)
def rag_eval_bm25_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONLINE retrieval evaluation: the full MRR/recall@10/NDCG@10
    suite served from the STREAMING-maintained term-postings index —
    documents replay through an availableNow file stream (4 files,
    ≥4 micro-batches) into the same postings state
    ``rag_bm25_incremental`` maintains, and EVERY evaluator input then
    derives from that state: per-query term selection from the query
    docs' postings rows, corpus tf by semi-join on the maintained
    postings, document lengths as SUM(tf) over the full vocabulary
    (== size(tokens) under the NULL → single-empty-token contract).
    Scores and metrics are bit-identical to the batch ``rag_eval_bm25``
    (shared ``_eval_bm25_pipeline``), so this row shares its DuckDB
    oracle — continuous ingest gets retrieval-quality monitoring
    without re-tokenizing history.

    Scale: the index maintenance cost is ``rag_bm25_incremental``'s
    (O(batch) deltas); each evaluation run touches |query-doc vocab| +
    |docs|x25 postings rows and the bounded metric tail — cheap enough
    to run per compaction cycle as a quality gate."""
    import os
    import shutil
    import tempfile

    from rag_lakehouse_spark.streaming.append_state import compact_state, read_deltas
    from rag_lakehouse_spark.streaming.search_sink import maintain_term_postings

    base = tempfile.mkdtemp(prefix="rls_bm25_eval_stream_")
    try:
        src = os.path.join(base, "documents")
        d = load_table(spark, sf_dir, "documents")
        d.select("doc_id", "text").repartition(4).write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(base, "term_postings")
        maintain_term_postings(spark, stream, state).awaitTermination()
        compact_state(spark, state)
        postings = (
            read_deltas(spark, state)
            .select("doc_id", "term", "tf")
            .localCheckpoint(eager=True)  # consumed 3x; detach from temp dir
        )
        qtf = (
            postings.filter(
                (F.col("doc_id") < N_EVAL_QUERIES) & (F.col("term") != "")
            )
            .select(F.col("doc_id").alias("query_id"), "term", "tf")
        )
        lens = postings.groupBy("doc_id").agg(
            F.sum("tf").cast("int").alias("dl")  # matches size(tokens)'s int
        )

        def corpus_tf(terms_df: DataFrame) -> DataFrame:
            return (
                postings.filter(F.col("term") != "")
                .join(F.broadcast(terms_df), "term")
                .select("doc_id", "term", "tf")
            )

        result = _eval_bm25_pipeline(
            d.select("doc_id", "source"), qtf, corpus_tf, lens
        )
        return result.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


# --- fused retrieval evaluation (r12, VERDICT r11 #7) ---

_EVAL_FUSED_ORACLE = f"""
    WITH lens AS (SELECT doc_id, len({_DUCK_TOKS}) AS dl FROM documents),
    qtf AS (
      SELECT doc_id AS query_id, term, COUNT(*) AS tf FROM (
        SELECT doc_id, unnest({_DUCK_TOKS}) AS term FROM documents
        WHERE doc_id < {N_EVAL_QUERIES})
      WHERE term <> '' GROUP BY query_id, term
    ),
    qterms AS (
      SELECT query_id, term FROM qtf
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY tf DESC, term) <= {N_EVAL_QUERY_TERMS}
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM (
        SELECT doc_id, unnest({_DUCK_TOKS}) AS term FROM documents)
      WHERE term <> '' AND term IN (SELECT DISTINCT term FROM qterms)
      GROUP BY doc_id, term
    ),
    stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(CAST(SUM(dl) AS BIGINT) AS DOUBLE) / COUNT(*) AS avgdl
      FROM lens
    ),
    idf AS (
      SELECT term,
             round(ln(1e0 + (n_docs - df + 5e-1) / (df + 5e-1)), 9) AS idf
      FROM (SELECT term, COUNT(*) AS df FROM tf GROUP BY term), stats
    ),
    contrib AS (
      SELECT t.doc_id, t.term,
             idf.idf * (t.tf * {K1 + 1.0!r}e0)
               / (t.tf + {K1!r}e0 * ({1.0 - B!r}e0 + {B!r}e0 * l.dl / s.avgdl)) AS contrib
      FROM tf t JOIN lens l ON l.doc_id = t.doc_id
      JOIN idf ON idf.term = t.term, stats s
    ),
    scores AS (
      SELECT q.query_id, c.doc_id,
             list_reduce(list_prepend(0e0, array_agg(c.contrib ORDER BY c.term)),
                         (a, b) -> a + b) AS score
      FROM contrib c JOIN qterms q ON q.term = c.term
      GROUP BY q.query_id, c.doc_id
    ),
    lex AS (
      SELECT query_id, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY score DESC, doc_id) AS lex_rank
      FROM scores QUALIFY lex_rank <= 20
    ),
    e AS (SELECT vec_id, embedding,
                 sqrt({VEC.duckdb_dot("embedding", "embedding")}) AS nrm
          FROM embeddings),
    vq AS (SELECT vec_id AS query_id, embedding AS qv, nrm AS qn
           FROM e WHERE vec_id < {N_EVAL_QUERIES}),
    vec AS (
      SELECT query_id, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY vscore DESC, doc_id) AS vec_rank
      FROM (
        SELECT q.query_id, b.vec_id AS doc_id,
               {VEC.duckdb_dot("b.embedding", "q.qv")}
                 / (b.nrm * q.qn + 1e-24) AS vscore
        FROM e b, vq q) sc
      QUALIFY vec_rank <= 20
    ),
    fusedall AS (
      SELECT COALESCE(l.query_id, v.query_id) AS query_id,
             COALESCE(l.doc_id, v.doc_id) AS doc_id,
             (COALESCE(1e0 / ({RRF_K} + l.lex_rank), 0e0)
              + COALESCE(1e0 / ({RRF_K} + v.vec_rank), 0e0)) AS rrf_score
      FROM lex l FULL OUTER JOIN vec v
        ON l.query_id = v.query_id AND l.doc_id = v.doc_id
    ),
    fused AS (
      SELECT query_id, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS rank
      FROM fusedall QUALIFY rank <= 10
    ),
    qsrc AS (
      SELECT doc_id AS query_id, source AS q_source FROM documents
      WHERE doc_id < {N_EVAL_QUERIES}
    ),
    judged AS (
      SELECT f.query_id, f.rank,
             CASE WHEN f.doc_id = f.query_id THEN 2
                  WHEN d.source = q.q_source THEN 1
                  ELSE 0 END AS rel
      FROM fused f
      JOIN documents d ON d.doc_id = f.doc_id
      JOIN qsrc q ON q.query_id = f.query_id
    ),
    hits AS (SELECT query_id, rank, rel FROM judged WHERE rel >= 1),
    nrel AS (
      SELECT q.query_id,
             CAST(SUM(CASE WHEN d.doc_id <> q.query_id
                            AND d.source = q.q_source
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_rel1,
             CAST(SUM(CASE WHEN d.doc_id = q.query_id
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_rel2
      FROM documents d, qsrc q GROUP BY q.query_id
    ),
    {_EVAL_METRICS_GRADED_SQL}
    """


@register(
    "rag_eval_fused",
    oracle=_EVAL_FUSED_ORACLE,
    tags=("rag", "evaluation", "hybrid", "rrf", "graded"),
)
def rag_eval_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUSED retrieval evaluation with GRADED relevance — the third
    rung of the evaluation ladder (dense ``rag_eval_retrieval``,
    lexical ``rag_eval_bm25``, fused here), covering the full modern
    retrieval stack under one oracle-checked metric family. Per query
    (the first 5 documents): the lexical run is the exact
    ``rag_eval_bm25`` scoring (5 top-tf query terms, term-sorted
    contribution fold) ranked top-20; the dense run is cosine of the
    query's OWN embedding against the embeddings table top-20 (the
    ``rag_hybrid_rrf`` doc_id ↔ vec_id projection); the two rank
    lists fuse by reciprocal rank fusion (1/(60+rank), absent list →
    0 — integer rank arithmetic, so fusion adds no rounding
    precedent) and the fused top-10 is judged on a THREE-level scale:
    rel 2 = the query document itself, rel 1 = same source, 0
    otherwise. Metrics come from the graded tail
    (``_eval_metrics_graded`` / ``_EVAL_METRICS_GRADED_SQL``): MRR
    and recall over rel ≥ 1, and graded NDCG@10 with gain 2^rel - 1
    folded rank-sorted over the shared literal discount LUT, IDCG
    composed from the literal prefix-sum array (level-2 docs first) —
    no transcendental at query time; the graded tail is fuzzed
    against a pure-Python referee (tests/test_plans.py).

    Scale: the lexical side is ``rag_eval_bm25``'s bounded plan
    (broadcast ≤25-term semi-join); the dense side broadcasts 5 query
    vectors and top-20-prunes per query (WindowGroupLimit); fusion
    joins two ≤100-row lists; judgement and nrel are conditional
    aggregates over one docs×5 broadcast pass; the metric tail
    touches ≤10 rows per query. A real judgment set swaps the graded
    CASE for a qrels join — plans unchanged.

    Reference parity: the reference retrieves dense-only
    (src/api.py:40-84); fusion + graded eval is training-data-
    pipeline surface beyond it."""
    docs = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "nrm", VEC.l2_norm("embedding")
    )

    # lexical per-query top-20 (the rag_eval_bm25 scoring, wider cut)
    qtf = (
        docs.filter(F.col("doc_id") < N_EVAL_QUERIES)
        .select(
            F.col("doc_id").alias("query_id"), F.explode(_toks()).alias("term")
        )
        .filter(F.col("term") != "")
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    wq = W.partitionBy("query_id").orderBy(F.desc("tf"), F.asc("term"))
    qterms = (
        qtf.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= N_EVAL_QUERY_TERMS)
        .select("query_id", "term")
    )
    corpus_tf = (
        docs.select("doc_id", F.explode(_toks()).alias("term"))
        .filter(F.col("term") != "")
        .join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    lens = docs.select("doc_id", F.size(_toks()).alias("dl"))
    contrib = _bm25_contribs_from_stats(corpus_tf, lens)
    scores = (
        contrib.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(_term_sorted_score_fold().alias("score"))
    )
    wl = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    lex = (
        scores.withColumn("lex_rank", F.row_number().over(wl))
        .filter(F.col("lex_rank") <= 20)
        .select("query_id", "doc_id", "lex_rank")
    )

    # dense per-query top-20
    vq = e.filter(F.col("vec_id") < N_EVAL_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    wv = W.partitionBy("query_id").orderBy(F.desc("vscore"), F.asc("doc_id"))
    vec = (
        e.crossJoin(F.broadcast(vq))
        .select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            (
                VEC.dot("embedding", "qv")
                / (F.col("nrm") * F.col("qn") + F.lit(1e-24))
            ).alias("vscore"),
        )
        .withColumn("vec_rank", F.row_number().over(wv))
        .filter(F.col("vec_rank") <= 20)
        .select("query_id", "doc_id", "vec_rank")
    )

    fusedall = lex.join(vec, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(RRF_K) + F.col("lex_rank")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(RRF_K) + F.col("vec_rank")), F.lit(0.0)
            )
        ).alias("rrf_score"),
    )
    wf = W.partitionBy("query_id").orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    fused = (
        fusedall.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= 10)
    )

    qsrc = (
        docs.filter(F.col("doc_id") < N_EVAL_QUERIES)
        .select(
            F.col("doc_id").alias("query_id"),
            F.col("source").alias("q_source"),
        )
    )
    judged = (
        fused.join(docs.select("doc_id", "source"), "doc_id")
        .join(F.broadcast(qsrc), "query_id")
        .select(
            "query_id",
            "rank",
            F.when(F.col("doc_id") == F.col("query_id"), F.lit(2))
            .when(F.col("source") == F.col("q_source"), F.lit(1))
            .otherwise(F.lit(0))
            .alias("rel"),
        )
    )
    hits = judged.filter(F.col("rel") >= 1).select("query_id", "rank", "rel")
    nrel = (
        docs.select("doc_id", "source")
        .crossJoin(F.broadcast(qsrc))
        .groupBy("query_id")
        .agg(
            F.sum(
                F.when(
                    (F.col("doc_id") != F.col("query_id"))
                    & (F.col("source") == F.col("q_source")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_rel1"),
            F.sum(
                F.when(F.col("doc_id") == F.col("query_id"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_rel2"),
        )
    )
    return _eval_metrics_graded(hits, nrel)
