"""Grouped-map operators (applyInPandas): per-group computations that
need the whole group as a pandas frame — per-label vector
normalization/centering, per-group robust statistics. The grouped-map
form shuffles each group to one worker; groups must fit in memory
(fine for label/entity groups; NOT for power-law keys — pre-aggregate
those instead).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def center_embeddings_per_label(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Subtract the per-label centroid from every embedding (the
    per-class centering used before PCA/whitening in retrieval
    pipelines) and attach the residual norm."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(label_col, T.IntegerType()),
            T.StructField("centered", T.ArrayType(T.FloatType())),
            T.StructField("residual_norm", T.DoubleType()),
        ]
    )

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        centered = V - V.mean(axis=0, keepdims=True)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].values,
                label_col: pdf[label_col].values,
                "centered": [c.astype(np.float32) for c in centered],
                "residual_norm": np.linalg.norm(centered, axis=1),
            }
        )

    return df.groupBy(label_col).applyInPandas(center, schema)


def robust_zscore_per_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Median/MAD z-score per group (outlier scoring robust to the
    outliers themselves) — classic grouped-map shape: needs the full
    group distribution, not expressible as a streaming aggregate."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(group_col, T.StringType()),
            T.StructField("robust_z", T.DoubleType()),
        ]
    )

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].astype(float)
        med = v.median()
        mad = (v - med).abs().median() or 1e-9
        return pd.DataFrame(
            {
                id_col: pdf[id_col].values,
                group_col: pdf[group_col].values,
                "robust_z": 0.6745 * (v - med) / mad,
            }
        )

    return df.groupBy(group_col).applyInPandas(score, schema)
