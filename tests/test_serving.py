"""The /ask serving interface (rag_lakehouse_spark.serving) — e2e
parity with the reference endpoint's branch structure
(src/api.py:49-78): empty-context refusal (generator never called),
generated-refusal attribution suppression, and the happy-path top-1
attribution, all against the real embeddings/documents tables."""

from __future__ import annotations

from rag_lakehouse_spark.plans.rag_queries import REFUSAL
from rag_lakehouse_spark.serving import (
    CONTEXT_SEPARATOR,
    NO_SOURCE,
    AskResult,
    Generator,
    ask,
    retrieve_topk,
)


class _Recording(Generator):
    def __init__(self, answer: str) -> None:
        self.answer = answer
        self.prompts: list[str] = []

    def generate(self, prompt: str) -> str:
        self.prompts.append(prompt)
        return self.answer


def test_empty_context_refuses_without_generating(spark, sf_dir):
    gen = _Recording("should never run")
    res = ask(
        spark, sf_dir, "what is the airspeed?", generator=gen, threshold=2.0
    )  # cosine can't reach 2.0: nothing retrieves
    assert res == AskResult(
        answer=REFUSAL, source=NO_SOURCE, prompt=None, n_retrieved=0
    )
    assert gen.prompts == []  # the reference skips the LLM entirely


def test_generated_refusal_suppresses_attribution(spark, sf_dir):
    gen = _Recording(
        "Well, I do not have enough information to answer this question."
    )
    res = ask(spark, sf_dir, "who wrote it?", generator=gen)
    assert res.n_retrieved == 3
    assert res.source == NO_SOURCE  # substring rule, verbatim
    assert len(gen.prompts) == 1


def test_happy_path_prompt_and_top1_attribution(spark, sf_dir):
    gen = _Recording("The answer is 42.")
    res = ask(spark, sf_dir, "what is the answer?", generator=gen, k=3)
    assert res.answer == "The answer is 42."
    assert res.n_retrieved == 3
    # attribution = top-1 retrieved doc's source, independently ranked
    rows = (
        retrieve_topk(
            spark,
            sf_dir,
            __import__(
                "rag_lakehouse_spark.serving", fromlist=["embed_question"]
            ).embed_question("what is the answer?"),
            k=3,
        )
        .orderBy("score", ascending=False)
        .collect()
    )
    assert res.source == rows[0]["source"]
    # the prompt carries the exact rules, separator-joined context in
    # rank order, and the question
    p = res.prompt
    assert REFUSAL in p and "Question: what is the answer?" in p
    ctx = CONTEXT_SEPARATOR.join(r["text"] for r in rows)
    assert ctx in p
    # default (unplugged) generator: deterministic safe no-op
    res2 = ask(spark, sf_dir, "what is the answer?")
    assert res2.answer == REFUSAL and res2.source == NO_SOURCE
