"""The /ask serving interface — reference parity for src/api.py:10-84
(r14, VERDICT r13 #6): question → embed → retrieve top-k → assemble
context with the reference separator → prompt template → GENERATE →
attribution with the refusal/empty-context guards. The generation call
itself stays OUT of the query path by design (SURVEY.md §2.9: no
external LLM in the engine) — it sits behind ``Generator``, a one-
method seam whose default implementation is a deterministic no-op, so
the complete endpoint logic (both guard branches, the attribution
suppression, the exact prompt text) is executable and testable without
a model server. A real deployment plugs an Ollama/OpenAI-compatible
client into the same seam.

Branch semantics mirrored from the reference (src/api.py:49-78):

- empty context (nothing retrieved at/above threshold): answer is the
  exact refusal sentinel, source is "No source found", and the
  generator is NEVER called;
- generated answer CONTAINING the refusal sentinel: source is
  suppressed to "No source found" (the reference checks substring
  containment, not equality — kept verbatim);
- otherwise: source is the top-1 retrieved document's source field.

Retrieval is the engine's own serve path: exact cosine top-k over the
embeddings table (the same TakeOrderedAndProject shape as
``knn_topk_exact``) — at corpus scale the caller swaps in any rung of
the ANN ladder (operators/similarity.py, operators/graph_ann.py); the
interface only needs (vec_id, score) rows.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rag_lakehouse_spark.functions import vector as VEC
from rag_lakehouse_spark.plans.rag_queries import REFUSAL
from rag_lakehouse_spark.sources.tables import load_table

CONTEXT_SEPARATOR = "\n\n---\n\n"
NO_SOURCE = "No source found"

# the reference's prompt template (src/api.py:55-70), verbatim rules
PROMPT_TEMPLATE = """
You are a helpful and concise bookstore assistant. Your task is to \
answer the user's question based *only* on the provided context.
Follow these rules strictly:
1. Directly answer the user's question using information found in \
the context.
2. Do not use any outside knowledge or make up information.
3. If the context does not contain the information needed to answer \
the question, you must respond with the exact phrase: "{refusal}"

Here is the context:
---
{context}
---

Question: {question}

Answer:
"""


class Generator:
    """The generation seam: one method, prompt in, answer out. The
    base class is the DEFAULT deterministic no-op — it answers with
    the refusal sentinel, making the unplugged endpoint safe (it never
    fabricates and always suppresses attribution). Subclass and
    override ``generate`` to plug a real model client."""

    def generate(self, prompt: str) -> str:  # noqa: ARG002
        return REFUSAL


@dataclass
class AskResult:
    """The endpoint response shape (reference: jsonify({answer,
    source})), plus the assembled prompt and retrieval rows for
    observability/testing. ``prompt`` is None on the empty-context
    branch — proof the generator was never consulted."""

    answer: str
    source: str
    prompt: str | None
    n_retrieved: int


def embed_question(question: str, dim: int = 64) -> list[float]:
    """Driver-side single-question embedding via the same
    deterministic pseudo-embedder every indexed vector used
    (operators/embedding.pseudo_embed_texts) — one string, no Spark
    job. A real-model deployment swaps the encoder on BOTH sides
    (index and query) behind the same signature."""
    from rag_lakehouse_spark.operators.embedding import pseudo_embed_texts

    return [float(x) for x in pseudo_embed_texts([question], dim)[0]]


def retrieve_topk(
    spark: SparkSession,
    sf_dir: str,
    query_vec: list[float],
    k: int = 3,
    threshold: float | None = None,
) -> DataFrame:
    """(rank, vec_id, score, text, source) for the exact cosine top-k —
    the serve-path retrieval joined to the documents table for context
    text and attribution. ``threshold`` is an explicit opt-in score
    floor; the DEFAULT is pure top-k with no filter, matching the
    reference endpoint (chromadb n_results=3 applies no distance
    threshold — r14's 0.0 default silently dropped negative-cosine
    documents the reference would have answered from; ADVICE r14)."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    d = load_table(spark, sf_dir, "documents")
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = e.select("vec_id", VEC.cosine("embedding", qv).alias("score"))
    if threshold is not None:
        scored = scored.filter(F.col("score") >= threshold)
    scored = scored.orderBy(F.desc("score"), F.asc("vec_id")).limit(k)
    return scored.join(d, scored.vec_id == d.doc_id).select(
        "vec_id", "score", "text", "source"
    )


def ask(
    spark: SparkSession,
    sf_dir: str,
    question: str,
    generator: Generator | None = None,
    k: int = 3,
    threshold: float | None = None,
    query_vec: list[float] | None = None,
) -> AskResult:
    """The /ask endpoint, minus HTTP: returns the reference's
    {answer, source} contract. ``query_vec`` overrides the question
    embedding (tests drive the empty-context branch with an
    impossible threshold instead)."""
    generator = generator or Generator()
    vec = query_vec if query_vec is not None else embed_question(question)
    rows = (
        retrieve_topk(spark, sf_dir, vec, k=k, threshold=threshold)
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .collect()  # bounded: k rows
    )
    context = CONTEXT_SEPARATOR.join(r["text"] for r in rows)
    if not context:
        # reference src/api.py:49-51: refusal WITHOUT calling the LLM
        return AskResult(
            answer=REFUSAL, source=NO_SOURCE, prompt=None, n_retrieved=0
        )
    prompt = PROMPT_TEMPLATE.format(
        refusal=REFUSAL, context=context, question=question
    )
    answer = generator.generate(prompt)
    # reference src/api.py:78: substring containment suppresses
    # attribution (kept verbatim, including its looseness)
    source = (
        NO_SOURCE
        if "I do not have enough information" in answer
        else (rows[0]["source"] or NO_SOURCE)
    )
    return AskResult(
        answer=answer, source=source, prompt=prompt, n_retrieved=len(rows)
    )
