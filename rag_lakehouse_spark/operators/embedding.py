"""Embedding operators.

The reference embeds driver-side after ``collect()`` (reference
jobs/embedder.py:54-87) — its biggest scale defect. Here embedding is
an Arrow-batched pandas UDF: executors pull batches, the model loads
once per worker (iterator form), nothing ever funnels through the
driver.

Two embedders behind one signature:

- ``pseudo_embed_texts`` / ``pseudo_embed_udf`` — deterministic
  hash-seeded vectors (seeded per text via blake2b) for tests/oracles;
  no model weights needed (SURVEY.md §7.6 risk mitigation).
- ``sentence_transformer_udf`` — the real ``all-MiniLM-L6-v2``-style
  model (reference docker-compose.yaml:71), gated behind an import-try
  since the container has no model libs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_DIM = 64


def pseudo_embed_texts(texts: list[str], dim: int = DEFAULT_DIM) -> np.ndarray:
    """Deterministic pseudo-embedding: unit vector seeded by the text's
    blake2b digest. Same text → same vector, across runs and executors."""
    out = np.empty((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        seed = int.from_bytes(hashlib.blake2b((t or "").encode(), digest_size=8).digest(), "big")
        rng = np.random.default_rng(seed)
        v = rng.standard_normal(dim).astype(np.float32)
        out[i] = v / (np.linalg.norm(v) + 1e-12)
    return out


def pseudo_embed_udf(dim: int = DEFAULT_DIM):
    """Scalar-iterator pandas UDF: text → array<float> pseudo-embedding."""

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            vecs = pseudo_embed_texts(s.fillna("").tolist(), dim)
            yield pd.Series(list(vecs))

    return embed


def sentence_transformer_udf(model_name: str = "all-MiniLM-L6-v2"):
    """Real-model embedding UDF (384-d MiniLM, per the reference's
    EMBEDDING_MODEL env). Iterator form so the model loads once per
    executor process, not per batch. Raises ImportError where
    sentence-transformers isn't installed — callers fall back to
    ``pseudo_embed_udf``."""
    import importlib

    if importlib.util.find_spec("sentence_transformers") is None:  # pragma: no cover
        raise ImportError(
            "sentence-transformers not available in this environment; "
            "use pseudo_embed_udf() for deterministic testing"
        )

    @F.pandas_udf(T.ArrayType(T.FloatType()))  # pragma: no cover
    def embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        from sentence_transformers import SentenceTransformer

        model = SentenceTransformer(model_name)
        for s in batches:
            vecs = model.encode(s.fillna("").tolist(), convert_to_numpy=True)
            yield pd.Series(list(vecs.astype(np.float32)))

    return embed
