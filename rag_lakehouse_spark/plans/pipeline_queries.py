"""RAG-pipeline parity queries: chunk expansion and retrieval-context
assembly — the reference's embed + serve path re-expressed as
DataFrame plans (reference jobs/embedder.py:61-87 and src/api.py:32-46),
plus rows-only registrations for the probabilistic dedup operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rag_lakehouse_spark.functions import text as TX
from rag_lakehouse_spark.functions import vector as VEC
from rag_lakehouse_spark.operators.chunking import chunk_fixed
from rag_lakehouse_spark.operators.dedup import minhash_lsh_pairs, simhash_docs
from rag_lakehouse_spark.plans.registry import register
from rag_lakehouse_spark.sources.tables import load_table


@register(
    "chunk_fixed_docs",
    oracle="""
    SELECT doc_id,
           unnest(generate_series(0, (greatest(length(text),1)-1)//200)) + 1
             AS chunk_number,
           'doc_' || doc_id || '_chunk_' ||
             unnest(generate_series(0, (greatest(length(text),1)-1)//200))
             AS chunk_id,
           unnest(list_transform(
               generate_series(0, (greatest(length(text),1)-1)//200),
               i -> substring(text, i*200+1, 200)))
             AS chunk_text
    FROM documents
    """,
    tags=("chunk", "explode"),
)
def chunk_fixed_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-size (200-char) chunk expansion: 1 doc → N
    chunk rows with ``chunk_number`` (1-based) and the reference's
    ``{id}_chunk_{i}`` id scheme (reference jobs/embedder.py:83).

    Scale: pure flatMap (explode) — no shuffle; chunking 100 TB is a
    map-only job. The semantic chunker variant is operators.chunking.
    """
    d = load_table(spark, sf_dir, "documents")
    return chunk_fixed(d, text_col="text", id_col="doc_id", size=200, id_prefix="doc")


@register(
    "rag_retrieve_context",
    oracle=f"""
    WITH scored AS (
      SELECT b.vec_id,
             {VEC.duckdb_cosine('a.embedding', 'b.embedding')} AS score
      FROM embeddings a, embeddings b
      WHERE a.vec_id = 0 AND b.vec_id <> 0
    ),
    ranked AS (
      SELECT vec_id, score,
             ROW_NUMBER() OVER (ORDER BY score DESC, vec_id) AS rank
      FROM scored
    )
    SELECT 0 AS query_id,
           COUNT(*) AS n_docs,
           string_agg(d.text, '

---

' ORDER BY r.rank) AS context,
           arg_min(d.source, r.rank) AS top_source
    FROM ranked r
    JOIN documents d ON d.doc_id = r.vec_id
    WHERE r.rank <= 3
    """,
    tags=("rag", "retrieval", "flagship"),
)
def rag_retrieve_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end retrieval read path: embed-side k-NN (k=3) → join back
    to the document table → context assembly with the reference's
    separator → top-1 source attribution. Mirrors reference
    src/api.py:38-46 ('\\n\\n---\\n\\n'.join + metadatas[0]) minus the
    external LLM call (kept out of the query path by design).

    Scale: query vector broadcasts; top-k is ``orderBy().limit(k)`` —
    planned as TakeOrderedAndProject (per-partition partial top-k, no
    single-partition WindowExec, no global sort); the doc join is
    id-equi (shuffle on 3 ids — effectively free); context assembly is
    a 3-row aggregate ordered by (-score, vec_id), the same total order
    the old rank column encoded.
    """
    e = load_table(spark, sf_dir, "embeddings")
    d = load_table(spark, sf_dir, "documents")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    topk = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", VEC.cosine("embedding", "q_emb").alias("score"))
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(3)
    )
    joined = topk.join(d, topk.vec_id == d.doc_id)
    order_key = F.struct((-F.col("score")).alias("neg"), F.col("vec_id").alias("tie"))
    return joined.agg(
        F.lit(0).alias("query_id"),
        F.count(F.lit(1)).alias("n_docs"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(order_key.alias("k"), F.col("text")))
                ),
                lambda x: x["text"],
            ),
            "\n\n---\n\n",
        ).alias("context"),
        F.min_by("source", order_key).alias("top_source"),
    )


# ---------------------------------------------------------------------------
# Probabilistic dedup — rows-only checks (not SQL-expressible: seeded
# xxhash64 signatures have no DuckDB equivalent). Property-tested in
# tests/test_dedup.py instead (SURVEY.md §5.2 golden/property strategy).
# ---------------------------------------------------------------------------


@register("dedup_minhash_lsh", oracle=None, tags=("dedup", "neardup", "minhash"))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidate pairs (shingle → 64 minhashes →
    16 bands × 4 rows → band-bucket equi-join), verified by exact
    Jaccard ≥ 0.5 on the candidates only.

    Scale: the LSH trick — candidate generation is an equi-join on
    (band_idx, band_hash), so the quadratic cost shrinks to colliding
    buckets; exact Jaccard runs only on candidates.
    """
    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        d, text_col="text", id_col="doc_id", num_hashes=64, bands=16, threshold=0.5
    )


@register("dedup_cluster_canonicals", oracle=None, tags=("dedup", "cluster", "iterative"))
def dedup_cluster_canonicals_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus dedup decision: MinHash-LSH near-dup pairs →
    connected components (iterative min-label propagation) → one
    canonical doc per duplicate cluster, singletons self-canonical.
    The keep/drop list a training-data pipeline actually consumes."""
    from rag_lakehouse_spark.operators.clusters import dedup_cluster_canonicals

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, text_col="text", id_col="doc_id", threshold=0.5)
    return dedup_cluster_canonicals(d, pairs)


@register("dedup_simhash", oracle=None, tags=("dedup", "neardup", "simhash"))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document (token-hash sign aggregation) —
    near-dup key for hamming-distance blocking."""
    d = load_table(spark, sf_dir, "documents")
    return simhash_docs(d, text_col="text", id_col="doc_id")


@register("dedup_simhash_pairs", oracle=None, tags=("dedup", "neardup", "simhash"))
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup PAIRS: the blocking join the fingerprints exist
    for — pigeonhole 16-bit segment equi-join generates candidates,
    bit_count hamming verifies ≤3 on candidates only (never all pairs).
    Registered (and benched) separately from ``dedup_simhash`` because
    the join stage is the part that can regress independently of the
    fingerprint aggregation — the MinHash history (a 25× slowdown
    caught only by bench) argues every dedup join stage needs its own
    canary."""
    from rag_lakehouse_spark.operators.dedup import simhash_near_pairs

    d = load_table(spark, sf_dir, "documents")
    return simhash_near_pairs(d, text_col="text", id_col="doc_id", max_hamming=3)


# ---------------------------------------------------------------------------
# Portable-hash twins of the probabilistic dedup family — the SAME
# pipeline shapes over a hash DuckDB reproduces bit-for-bit (md5 hex →
# 60-bit int + overflow-safe affine permutations), so MinHash-LSH and
# SimHash get full external value-hash verification instead of the
# rows-only checks the xxhash64 throughput path is limited to. See
# operators/dedup_portable.py for the hash construction.
# ---------------------------------------------------------------------------

from rag_lakehouse_spark.operators.dedup_portable import (  # noqa: E402
    portable_canonicals_oracle,
    portable_minhash_oracle,
    portable_minhash_pairs,
    portable_simhash,
    portable_simhash_oracle,
    portable_simhash_pairs,
    portable_simhash_pairs_oracle,
)


@register(
    "dedup_minhash_portable",
    oracle=portable_minhash_oracle("documents", shingle_k=8),
    tags=("dedup", "neardup", "minhash", "portable"),
)
def dedup_minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs over the portable affine hash family
    (24 hashes × 8 bands × 3 rows ≙ the 0.5-Jaccard S-curve of the
    64×16×4 xxhash64 pipeline), verified by exact Jaccard ≥ 0.5 —
    hash-green against a DuckDB oracle that replicates the ENTIRE
    pipeline: shingle → min-hash → band keys → candidate join →
    verification. The xxhash64 variant (``dedup_minhash_lsh``) remains
    the benchmarked throughput path; this twin proves the machinery."""
    d = load_table(spark, sf_dir, "documents")
    return portable_minhash_pairs(
        d, text_col="text", id_col="doc_id", shingle_k=8, threshold=0.5
    )


@register(
    "dedup_simhash_portable",
    oracle=portable_simhash_oracle("documents"),
    tags=("dedup", "neardup", "simhash", "portable"),
)
def dedup_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit portable SimHash fingerprints (token base60 hashes →
    ±1 vote sums per bit → packed int64) — hash-green against DuckDB
    computing the identical fingerprint. Twin of ``dedup_simhash``."""
    d = load_table(spark, sf_dir, "documents")
    return portable_simhash(d, text_col="text", id_col="doc_id")


@register(
    "dedup_simhash_pairs_portable",
    oracle=portable_simhash_pairs_oracle("documents", max_hamming=3),
    tags=("dedup", "neardup", "simhash", "portable"),
)
def dedup_simhash_pairs_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable SimHash near-pairs: 15-bit pigeonhole segment equi-join
    + bit_count(xor) hamming ≤ 3 verify — the blocking JOIN stage,
    hash-green against DuckDB. Twin of ``dedup_simhash_pairs``."""
    d = load_table(spark, sf_dir, "documents")
    return portable_simhash_pairs(d, text_col="text", id_col="doc_id", max_hamming=3)


@register(
    "dedup_canonicals_portable",
    oracle=portable_canonicals_oracle("documents", shingle_k=8),
    tags=("dedup", "cluster", "iterative", "portable"),
)
def dedup_canonicals_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END dedup decision over the portable MinHash-LSH edge
    set: near-dup pairs → connected components (iterative min-label
    propagation) → every doc labeled (cluster_id, is_canonical) — the
    full keep/drop pipeline, hash-green against a DuckDB oracle that
    replicates candidate banding, Jaccard verification, AND the
    component fixpoint (recursive CTE). Completes the oracled coverage
    of the dedup family: `dedup_cluster_canonicals` (xxhash64 edges)
    stays rows-only, `dup_components_exact` verifies components over
    the n-gram edge set; this row verifies them over the actual LSH
    candidate generation."""
    from rag_lakehouse_spark.operators.clusters import dedup_cluster_canonicals

    d = load_table(spark, sf_dir, "documents")
    pairs = portable_minhash_pairs(d, text_col="text", id_col="doc_id", threshold=0.5)
    return dedup_cluster_canonicals(d, pairs, id_col="doc_id")


@register(
    "dedup_incremental_stream",
    oracle=f"""
    SELECT {TX.duckdb_fingerprint('text')} AS fingerprint,
           MIN(doc_id) AS canonical_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
    tags=("dedup", "exact", "streaming"),
)
def dedup_incremental_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING-maintained exact-dedup index, hash-checked against
    the batch oracle: documents replay through an availableNow file
    stream (maxFilesPerTrigger=1 over a 4-file copy, so ≥4
    micro-batches each fold content fingerprints into the stored index
    via ``streaming.dedup_sink.maintain_dedup_index``), then the index
    reads back as a batch DataFrame. MIN(canonical) and SUM(copies) are
    mergeable, so batch boundaries cannot change the result — the
    incremental fold must equal the one-shot hash-groupBy the oracle
    runs (and ``dedup_exact_docs`` computes in batch).

    Scale: each fold touches one micro-batch plus the index (one row
    per distinct content); history is never re-scanned; the shuffle
    carries 32-byte fingerprints, never text."""
    import os
    import shutil
    import tempfile

    from rag_lakehouse_spark.streaming.dedup_sink import (
        maintain_dedup_index,
        read_dedup_index,
    )

    # mkdtemp per invocation + rmtree in finally — same isolation and
    # leak rationale as events_rollup_hour_only.
    base = tempfile.mkdtemp(prefix="rls_dedup_stream_")
    try:
        src = os.path.join(base, "documents")
        (
            load_table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .repartition(4)
            .write.mode("overwrite")
            .parquet(src)
        )
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(base, "dedup_index")
        maintain_dedup_index(spark, stream, state).awaitTermination()
        # eager checkpoint (one row per distinct content) detaches the
        # result from the temp parquet so the dir can be deleted now
        return read_dedup_index(spark, state).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "dedup_minhash_incremental",
    oracle=portable_minhash_oracle("documents", shingle_k=8),
    tags=("dedup", "neardup", "minhash", "streaming", "portable"),
)
def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-dup pairs from a STREAMING-maintained MinHash postings
    index: documents replay through an availableNow file stream (4
    files, ≥4 micro-batches), each batch appending its LSH band-key
    postings as an immutable O(batch) delta (streaming.append_state) —
    signatures computed once per doc ever and the corpus-sized index
    never rewritten, the way production dedup amortizes at 100 TB —
    then pairs
    derive from the maintained index (band self-join + exact-Jaccard
    verify on candidates). Because the postings equal the one-shot
    banding rows, the result is bit-identical to
    ``dedup_minhash_portable``, so the SAME DuckDB oracle hash-checks
    the incremental path end to end."""
    import os
    import shutil
    import tempfile

    from rag_lakehouse_spark.streaming.dedup_sink import (
        maintain_minhash_postings,
        near_pairs_from_postings,
    )

    base = tempfile.mkdtemp(prefix="rls_minhash_stream_")
    try:
        src = os.path.join(base, "documents")
        d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        d.repartition(4).write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(base, "minhash_postings")
        maintain_minhash_postings(spark, stream, state).awaitTermination()
        # Offline compaction between ingest and serve: merges the ≥4
        # per-batch deltas into one compact dir. The hash check below
        # therefore ALSO verifies that compaction is row-preserving —
        # the oracle doesn't know or care which layout it reads.
        from rag_lakehouse_spark.streaming.append_state import compact_state

        compact_state(spark, state)
        # verify against the ORIGINAL table (not the temp copy) so the
        # result detaches from the temp dir; the pair list is tiny —
        # checkpoint it and delete the dir
        return near_pairs_from_postings(
            spark, state, d, threshold=0.5
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "rag_batch_retrieve",
    oracle=f"""
    WITH scored AS (
      SELECT a.vec_id AS query_id, b.vec_id,
             {VEC.duckdb_cosine('a.embedding', 'b.embedding')} AS score
      FROM embeddings a, embeddings b
      WHERE a.vec_id < 8 AND b.vec_id >= 8
    ),
    ranked AS (
      SELECT query_id, vec_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, vec_id) AS rank
      FROM scored
    )
    SELECT r.query_id,
           COUNT(*) AS n_docs,
           string_agg(d.text, '

---

' ORDER BY r.rank) AS context,
           arg_min(d.source, r.rank) AS top_source
    FROM ranked r JOIN documents d ON d.doc_id = r.vec_id
    WHERE r.rank <= 3
    GROUP BY r.query_id
    """,
    tags=("rag", "retrieval", "batch"),
)
def rag_batch_retrieve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched retrieval serve path: top-3 context assembly for a WHOLE
    BATCH of query vectors in one plan — the shape a serving or
    training-data pipeline runs (the reference answers one question per
    /ask request; reference src/api.py:32-46).

    Scale: the query batch broadcasts (small by contract); scoring is a
    codegen expression against the streamed corpus; the per-query rank
    window gets a WindowGroupLimit partial limit, so the single shuffle
    on query_id carries only ~k rows per (query, partition); context
    assembly aggregates 3 rows per query.
    """
    e = load_table(spark, sf_dir, "embeddings")
    d = load_table(spark, sf_dir, "documents")
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        e.filter(F.col("vec_id") >= 8)
        .crossJoin(F.broadcast(q))
        .select("query_id", "vec_id", VEC.cosine("embedding", "q_emb").alias("score"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    topk = scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 3)
    joined = topk.join(d, topk.vec_id == d.doc_id)
    return joined.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rank", "text"))),
                lambda x: x["text"],
            ),
            "\n\n---\n\n",
        ).alias("context"),
        F.min_by("source", "rank").alias("top_source"),
    )


_MEDALLION_RAW_SQL = """
    SELECT 'Title ' || CAST(doc_id AS VARCHAR) AS title,
           CASE WHEN doc_id % 13 = 0 THEN NULL
                WHEN doc_id % 17 = 0 THEN 'N/A'
                ELSE '£' || CAST(doc_id % 500 AS VARCHAR) || '.99' END AS price,
           CASE WHEN doc_id % 7 = 0 THEN 'Out of stock'
                ELSE 'In stock (' || CAST(doc_id % 30 + 1 AS VARCHAR)
                     || ' available)' END AS availability,
           'desc of ' || CAST(doc_id AS VARCHAR) AS description,
           lang AS category,
           CASE WHEN doc_id % 11 = 0 THEN 'N/A'
                ELSE CAST(doc_id % 1000 AS VARCHAR) END AS review_count,
           source || '/book/' || CAST(doc_id AS VARCHAR) AS book_url,
           '2026-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
             || ' 08:30:00' AS scraped_at,
           'doc-' || CAST(doc_id AS VARCHAR) AS id
    FROM documents
"""


@register(
    "medallion_silver_pipeline",
    oracle=rf"""
    WITH raw AS ({_MEDALLION_RAW_SQL})
    SELECT 'r3-medallion' AS run_id,
           strftime(TRY_CAST(scraped_at AS TIMESTAMP), '%Y-%m-%d') AS run_date,
           title,
           TRY_CAST(regexp_replace(price, '^(\D+)', '') AS DOUBLE) AS price,
           price AS price_text,
           regexp_extract(price, '^(\D+)', 1) AS currency_symbol,
           COALESCE(TRY_CAST(regexp_extract(availability, '\((\d+)', 1) AS INT), 0)
             AS quantity,
           regexp_extract(availability, '^([^\(]+)', 1) AS stock_status,
           description,
           category,
           TRY_CAST(review_count AS INT) AS review_count,
           book_url,
           scraped_at,
           id
    FROM raw
    """,
    tags=("medallion", "pipeline", "e2e"),
)
def medallion_silver_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end medallion run, driver-verified: a deterministic
    scraped-record fixture derived from the documents table is written
    to a raw JSON zone, then ``run_pipeline`` executes the reference's
    signature path — raw JSON scan → bronze rename contract → silver
    14-column typed contract (regex parse / null repair / cast) →
    partitioned zone writes → read-back (reference
    jobs/bronze_transformation.py:21-30, jobs/silver_transformation.py:
    40-117). The oracle replays the same fixture derivations and silver
    expressions in DuckDB SQL, so every silver cell is hash-checked —
    including the repair paths (missing price key, unparsable 'N/A'
    price/review_count, quantity default on 'Out of stock').

    The fixture exercises schema raggedness the way real scrapes do:
    ``doc_id % 13`` rows omit the price key entirely (JSON null-key
    drop), so bronze sees a genuinely missing field, not an empty one.

    Scale: every stage is a map-only projection or a partitioned
    columnar write; nothing here shuffles. The returned frame re-reads
    the written silver zone — partition columns (run_id, run_date) are
    re-cast to the declared string contract because parquet partition
    discovery type-infers them on read.
    """
    import os
    import tempfile

    from rag_lakehouse_spark.sources.medallion import SILVER_SCHEMA, run_pipeline

    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    raw = d.select(
        F.concat(F.lit("Title "), s(did)).alias("title_xpath"),
        F.when(did % 13 == 0, F.lit(None).cast("string"))
        .when(did % 17 == 0, F.lit("N/A"))
        .otherwise(F.concat(F.lit("£"), s(did % 500), F.lit(".99")))
        .alias("price_xpath"),
        F.when(did % 7 == 0, F.lit("Out of stock"))
        .otherwise(
            F.concat(F.lit("In stock ("), s(did % 30 + 1), F.lit(" available)"))
        )
        .alias("availability_xpaths"),
        F.concat(F.lit("desc of "), s(did)).alias("description_xpaths"),
        F.col("lang").alias("category_xpath"),
        F.when(did % 11 == 0, F.lit("N/A"))
        .otherwise(s(did % 1000))
        .alias("review_count_xpath"),
        F.concat(F.col("source"), F.lit("/book/"), s(did)).alias("book_url"),
        F.concat(
            F.lit("2026-01-"), F.lpad(s(did % 28 + 1), 2, "0"), F.lit(" 08:30:00")
        ).alias("scraped_at"),
        F.concat(F.lit("doc-"), s(did)).alias("id"),
    )
    base = os.path.join(
        tempfile.gettempdir(),
        f"rls_medallion_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    raw_path = os.path.join(base, "raw")
    raw.write.mode("overwrite").json(raw_path)
    silver = run_pipeline(spark, raw_path, base, run_id="r3-medallion")
    # Partition discovery type-infers run_date (DATE) on read-back;
    # restore the declared silver string contract for comparison.
    return silver.select(
        *[F.col(name).try_cast(dtype).alias(name) for name, dtype in SILVER_SCHEMA.items()]
    )


@register(
    "dedup_edit_verified",
    oracle=None,  # set immediately below from the oracle builder
    tags=("dedup", "neardup", "edit-distance", "portable"),
)
def dedup_edit_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs confirmed by EDIT DISTANCE (≤10% of the shorter
    normalized text): SimHash pigeonhole blocking prunes to candidates,
    ``levenshtein`` verifies — the O(len²) DP never runs on more than
    the hamming-pruned pair set. The third verification dialect of the
    dedup family (exact Jaccard, hamming, now edit distance), all over
    one blocking infrastructure. Levenshtein agrees across engines
    only on ASCII (DuckDB counts bytes, Spark codepoints) — the shared
    ``normalized()`` guarantees it."""
    from rag_lakehouse_spark.operators.dedup_portable import edit_verified_pairs

    d = load_table(spark, sf_dir, "documents")
    return edit_verified_pairs(d, text_col="text", id_col="doc_id")


from rag_lakehouse_spark.operators.dedup_portable import (  # noqa: E402
    edit_verified_pairs_oracle as _ev_oracle,
)
from rag_lakehouse_spark.plans import registry as _registry_mod  # noqa: E402

_registry_mod.QUERIES["dedup_edit_verified"].oracle = _ev_oracle("documents")


@register(
    "chunk_sliding_docs",
    oracle="""
    SELECT doc_id,
           unnest(generate_series(0, (greatest(length(text),1)-1)//100)) + 1
             AS chunk_number,
           'doc_' || doc_id || '_chunk_' ||
             unnest(generate_series(0, (greatest(length(text),1)-1)//100))
             AS chunk_id,
           unnest(list_transform(
               generate_series(0, (greatest(length(text),1)-1)//100),
               i -> substring(text, i*100+1, 200)))
             AS chunk_text
    FROM documents
    """,
    tags=("chunk", "explode"),
)
def chunk_sliding_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping sliding-window chunking (200-char windows every 100
    chars — 50% overlap): the context-window expansion used when
    embedding retrieval must not lose sentences straddling fixed-chunk
    boundaries; each char lands in ≤ size/stride windows, so the
    output is a bounded constant factor over ``chunk_fixed_docs``.

    Scale: pure flatMap (explode), no shuffle, same as the fixed
    chunker; the overlap factor is the only cost difference."""
    from rag_lakehouse_spark.operators.chunking import chunk_sliding

    d = load_table(spark, sf_dir, "documents")
    return chunk_sliding(
        d, text_col="text", id_col="doc_id", size=200, stride=100, id_prefix="doc"
    )
