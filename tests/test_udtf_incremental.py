"""Python UDTF registration/LATERAL use and incremental micro-batch
streaming (maxFilesPerTrigger)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_lakehouse_spark.operators.udtf import SplitSentences, register_udtfs
from rag_lakehouse_spark.sources.tables import load_table


def test_udtf_lateral_sql(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "One. Two two! Three three three?"), (2, "Single sentence.")],
        "doc_id long, text string",
    ).createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        """
        SELECT d.doc_id, s.sentence_no, s.sentence, s.n_words
        FROM udtf_docs d, LATERAL split_sentences(d.text) s
        """
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 3 and len(by_doc[2]) == 1
    third = next(r for r in by_doc[1] if r.sentence_no == 3)
    assert third.n_words == 3 and third.sentence.startswith("Three")


def test_udtf_dataframe_api(spark):
    out = SplitSentences(F.lit("A b. C d e.")).collect()
    assert [(r.sentence_no, r.n_words) for r in out] == [(1, 2), (2, 3)]


def test_incremental_microbatches(spark, sf_dir, tmp_path_factory):
    """maxFilesPerTrigger=1 over a 3-file directory → ≥3 micro-batches,
    with state carried across batches (global dedup on event_id)."""
    from rag_lakehouse_spark.streaming import read_events_stream

    src = str(tmp_path_factory.mktemp("events_inc"))
    load_table(spark, sf_dir, "events").repartition(3).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    counted = stream.groupBy().agg(F.count(F.lit(1)).alias("n"))
    q = (
        counted.writeStream.outputMode("complete")
        .format("memory")
        .queryName("inc_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    progress = q.recentProgress
    assert len([p for p in progress if p["numInputRows"] > 0]) >= 3  # one batch per file
    total = spark.sql("SELECT * FROM inc_out").collect()[0].n
    assert total == load_table(spark, sf_dir, "events").count()


def test_udtf_sentence_stats_matches_expression_twin(spark, sf_dir):
    """The UDTF path must agree exactly with a pure-expression twin
    (F.split on the same pinned ASCII-whitespace regex — see
    operators/udtf.py for why the class is explicit, not \\s)."""
    from pyspark.sql import functions as F

    from rag_lakehouse_spark.plans import registry
    from rag_lakehouse_spark.sources.tables import load_table

    got = {
        r.doc_id: (r.n_sentences, r.total_words, r.max_sentence_words)
        for r in registry.queries()["udtf_sentence_stats"](spark, sf_dir).collect()
    }
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    ws = "[ \\t\\n\\r\\f\\x0B]"
    sent = F.filter(
        F.split("text", f"(?<=[.!?]){ws}+"),
        lambda s: F.regexp_like(s, F.lit(f"[^ \\t\\n\\r\\f\\x0B]")),
    )
    words = F.transform(
        sent,
        lambda s: F.size(F.filter(F.split(s, f"{ws}+"), lambda t: t != F.lit(""))),
    )
    twin = d.filter(F.length(F.trim("text")) > 0).select(
        "doc_id",
        F.size(sent).alias("n_sentences"),
        F.aggregate(words, F.lit(0).cast("bigint"), lambda a, x: a + x).alias("total_words"),
        F.array_max(words).alias("max_sentence_words"),
    )
    want = {
        r.doc_id: (r.n_sentences, r.total_words, r.max_sentence_words)
        for r in twin.collect()
    }
    assert got == want and len(got) > 0


# r16 (VERDICT r15 #2): long referee family - excluded from the
# default fast run; seal runs use -m "slow or not slow".
pytestmark = pytest.mark.slow
