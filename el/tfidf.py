"""Hashed TF-IDF context vectors (fit-once, persist, reuse).

Determinism across cluster sizes (SURVEY.md §4.4): the IDF table is a
*model artifact* fitted once and persisted; every run loads it, so
topic/context vectors never drift with partitioning. The artifact is
tiny (one float per occupied hash bucket, <= 2^18) and is shipped to
executors as a closure-captured numpy array — scalable to any input
size because its size is bounded by the hash dimension, not the corpus.

Document frequencies are computed with a plain DataFrame aggregation
(explode distinct tokens -> groupBy count) — map-side partial
aggregation and AQE sizing are free from Catalyst.
"""

from __future__ import annotations

import json
import os
import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DIM = 1 << 18
_TOKEN_RE = re.compile(r"[a-z0-9]+")

VEC_SCHEMA = T.StructType(
    [
        T.StructField("idx", T.ArrayType(T.IntegerType()), False),
        T.StructField("val", T.ArrayType(T.FloatType()), False),
    ]
)


def _bucket(tokens: list[str]) -> np.ndarray:
    # FNV-1a 32-bit, stable across processes (no PYTHONHASHSEED issues)
    out = np.empty(len(tokens), dtype=np.int64)
    for i, t in enumerate(tokens):
        h = 2166136261
        for ch in t.encode("utf-8"):
            h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
        out[i] = h % DIM
    return out


class TfidfModel:
    def __init__(self, idf: np.ndarray, n_docs: int):
        assert idf.shape == (DIM,)
        self.idf = idf.astype(np.float32)
        self.n_docs = n_docs

    # -- fitting ------------------------------------------------------
    @classmethod
    def fit(cls, texts: DataFrame, col: str = "context") -> "TfidfModel":
        """df-count per hashed token bucket over distinct tokens/doc."""
        toks = texts.select(
            F.explode(
                F.array_distinct(
                    F.filter(
                        F.split(F.lower(F.col(col)), r"[^a-z0-9]+"),
                        lambda t: F.length(t) > 0,
                    )
                )
            ).alias("tok")
        )
        df_counts = toks.groupBy("tok").agg(F.count("*").alias("df")).collect()
        n_docs = texts.count()
        idf = np.zeros(DIM, dtype=np.float64)
        if df_counts:
            tok_list = [r["tok"] for r in df_counts]
            buckets = _bucket(tok_list)
            dfs = np.array([r["df"] for r in df_counts], dtype=np.float64)
            # hash collisions: sum dfs into the bucket (standard hashing-TF)
            np.add.at(idf, buckets, dfs)
        nz = idf > 0
        idf[nz] = np.log((n_docs + 1.0) / (idf[nz] + 1.0)) + 1.0
        return cls(idf.astype(np.float32), n_docs)

    # -- persistence --------------------------------------------------
    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        np.save(os.path.join(path, "idf.npy"), self.idf)
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump({"n_docs": self.n_docs, "dim": DIM, "version": 1}, f)

    @classmethod
    def load(cls, path: str) -> "TfidfModel":
        idf = np.load(os.path.join(path, "idf.npy"))
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        return cls(idf, meta["n_docs"])

    # -- transform ----------------------------------------------------
    def vectorize_batch(self, texts: pd.Series) -> pd.DataFrame:
        """One Arrow batch of texts -> unit-normalized sparse vectors
        (sorted idx arrays, so cosine is a sparse dot downstream)."""
        idf = self.idf
        idx_out, val_out = [], []
        for text in texts.tolist():
            toks = _TOKEN_RE.findall(text.lower()) if text else []
            if not toks:
                idx_out.append(np.zeros(0, np.int32))
                val_out.append(np.zeros(0, np.float32))
                continue
            b = _bucket(toks)
            uniq, counts = np.unique(b, return_counts=True)
            w = counts.astype(np.float32) * idf[uniq]
            norm = float(np.linalg.norm(w))
            if norm > 0:
                w = w / norm
            idx_out.append(uniq.astype(np.int32))
            val_out.append(w.astype(np.float32))
        return pd.DataFrame({"idx": idx_out, "val": val_out})

    def transform(self, df: DataFrame, col: str = "context", out: str = "tfidf"):
        model = self  # closure capture; idf array is ~1 MB

        @F.pandas_udf(VEC_SCHEMA)
        def vec_udf(texts: pd.Series) -> pd.DataFrame:
            return model.vectorize_batch(texts)

        return df.withColumn(out, vec_udf(F.col(col)))
