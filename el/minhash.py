"""MinHash signatures + LSH band block keys (SURVEY.md §2.9 V3).

Implements the north-star's "minhash/LSH bands over TF-IDF shingles"
blocking strategy (BASELINE.json north_star): each mention's context
is shingled into character k-grams, the shingle set is minhashed with
m = bands*rows seeded universal hash functions, and each band of the
signature becomes one block key ``lsh:<band>:<hash(band slice)>``.
Two mentions whose contexts have Jaccard similarity s collide in at
least one band with probability 1-(1-s^rows)^bands (Broder 1997;
MMDS ch.3).

Scale design:
- all hashing is vectorized numpy inside ``mapInPandas`` — per Arrow
  batch, the signature of a row is a min-reduction over an
  (m x n_shingles) splitmix64 matrix; no per-row Python hot loops
  beyond the outer row walk, no RNG state (seeded splitmix64 streams
  from el.hashing, so signatures are pure functions of the text —
  deterministic across runs / partitionings / parallelism, §4.4);
- output is 'bands' rows per mention, produced Python-side and
  shuffled only once when downstream blocking groups by block_key;
- an alternative (pyspark.ml.feature.MinHashLSH) was rejected for
  VectorUDT friction at table boundaries (SURVEY.md V3): plain
  string keys compose with the other blocking strategies via a
  simple unionByName.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from el.hashing import splitmix64
from el.schemas import BLOCK_KEYS

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct uint64 hashes of the k-char shingles of ``text``.

    FNV-1a over a sliding window, fully vectorized: build the
    (n_shingles x k) byte matrix via stride tricks, then fold the k
    byte columns into the running FNV state.
    """
    b = text.encode("utf-8", errors="replace")
    if len(b) < k:
        b = b + b"\x00" * (k - len(b))
    arr = np.frombuffer(b, dtype=np.uint8)
    n = len(arr) - k + 1
    windows = np.lib.stride_tricks.sliding_window_view(arr, k)  # (n, k)
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            h = (h ^ windows[:, j].astype(np.uint64)) * _FNV_PRIME
    return np.unique(h)


def minhash_signature(shingles: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """m-vector signature: min over shingles of splitmix64(x ^ seed_i)."""
    if shingles.size == 0:
        return np.zeros(len(seeds), dtype=np.uint64)
    with np.errstate(over="ignore"):
        mat = splitmix64(shingles[None, :] ^ seeds[:, None])  # (m, n)
    return mat.min(axis=1)


def _band_seeds(rows: int, bands: int, seed: int) -> np.ndarray:
    base = np.arange(rows * bands, dtype=np.uint64) + np.uint64(
        (seed * 0x9E3779B9) & 0xFFFFFFFFFFFFFFFF
    )
    return splitmix64(base)


def band_keys_py(
    text: str, rows: int, bands: int, shingle_k: int, seeds: np.ndarray
) -> list[str]:
    """LSH band keys of one text (pure function; reused by tests)."""
    sig = minhash_signature(shingle_hashes(text.lower(), shingle_k), seeds)
    sig_bands = sig.reshape(bands, rows)
    with np.errstate(over="ignore"):
        folded = sig_bands[:, 0]
        for r in range(1, rows):
            folded = splitmix64(folded ^ sig_bands[:, r])
    return [f"lsh:{i}:{folded[i]:016x}" for i in range(bands)]


def lsh_band_keys(
    mentions: DataFrame,
    shingle_k: int = 3,
    rows: int = 4,
    bands: int = 16,
    seed: int = 7,
    text_col: str = "context",
) -> DataFrame:
    """mentions -> BLOCK_KEYS rows with strategy 'lsh_band'.

    ``bands`` rows out per mention; Jaccard(s) collision prob
    1-(1-s^rows)^bands (defaults: s50 ~= 0.5).
    """
    seeds = _band_seeds(rows, bands, seed)
    cols = mentions.select("mention_id", "url", text_col)

    def gen(batches):
        for pdf in batches:
            ids = pdf["mention_id"].tolist()
            urls = pdf["url"].tolist()
            texts = pdf[text_col].tolist()
            out_id, out_url, out_key = [], [], []
            for mid, url, text in zip(ids, urls, texts):
                if not text:
                    continue
                for key in band_keys_py(text, rows, bands, shingle_k, seeds):
                    out_id.append(mid)
                    out_url.append(url)
                    out_key.append(key)
            yield pd.DataFrame(
                {
                    "mention_id": pd.Series(out_id, dtype="int64"),
                    "url": pd.Series(out_url, dtype="object"),
                    "block_key": pd.Series(out_key, dtype="object"),
                }
            )

    raw_schema = T.StructType(
        [
            T.StructField("mention_id", T.LongType(), False),
            T.StructField("url", T.StringType(), False),
            T.StructField("block_key", T.StringType(), False),
        ]
    )
    return cols.mapInPandas(gen, schema=raw_schema).select(
        "mention_id",
        "url",
        F.lit("lsh_band").alias("strategy"),
        "block_key",
        F.lit(0).alias("salt"),
    ).select([f.name for f in BLOCK_KEYS.fields])
