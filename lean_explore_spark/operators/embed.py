"""Batched sentence-embedding operator (SURVEY §2.8 G3).

The reference embeds in executor batches of 64 with a loaded model
(scripts/generate_embeddings.py:251-274, SentenceTransformer
batch_size=64).  No model weights exist in this container, so the
KERNEL is pluggable and the default is a deterministic hash kernel —
but the Spark side is the real thing and follows the
``predict_batch_udf`` pattern:

* the embedder FACTORY is shipped in the closure and instantiated
  ONCE PER PYTHON WORKER (model load amortized over every batch that
  worker processes — the expensive part for a real model);
* texts flow through Arrow in batches; the kernel sees a
  ``list[str]`` of ≤ ``batch_size`` and returns a float32
  ``[n, dim]`` matrix;
* output is ``(doc_id, embedding array<float>)`` ready for
  operators.similarity / the embeddings table schema.

Swapping in a real model is one line:
``embed_texts(docs, embedder_factory=lambda: SentenceTransformer(...).encode)``.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

DEFAULT_DIM = 64
DEFAULT_BATCH = 64

EmbedKernel = Callable[[List[str]], np.ndarray]


# md5-fold kernel constants: 15-hex-digit fold (same trick as the
# lsh/simhash oracles) centered on a prime modulus — every component
# is an EXACT integer until the one final normalizing division, so a
# SQL engine reproduces the vectors bit-for-bit (embed_texts is
# hash-oracled in CORRECTNESS, not rows-only)
_KERNEL_MOD = 2_000_003
_KERNEL_CENTER = (_KERNEL_MOD - 1) // 2  # 1_000_001


def md5_unit_vector(text: str, dim: int = DEFAULT_DIM) -> np.ndarray:
    """Deterministic unit vector: c_j = fold15(md5(md5hex(text):j))
    mod P − (P−1)/2, then v = c / sqrt(Σ c²) — Σ c² ≤ 64·10¹² < 2⁵³ is
    exact in int64, so the only float ops are one sqrt + one division
    per component (cross-engine IEEE-stable)."""
    h0 = hashlib.md5(text.encode("utf-8")).hexdigest()
    c = np.array(
        [
            int(hashlib.md5(f"{h0}:{j}".encode()).hexdigest()[:15], 16)
            % _KERNEL_MOD
            - _KERNEL_CENTER
            for j in range(dim)
        ],
        dtype=np.int64,
    )
    ss = int(np.dot(c, c))
    if ss == 0:
        return np.zeros(dim, dtype=np.float64)
    import math

    return c.astype(np.float64) / math.sqrt(ss)


def hash_kernel_factory(dim: int = DEFAULT_DIM) -> EmbedKernel:
    """Deterministic stand-in kernel (md5-integer unit vectors) —
    identical to service.stub_embedder so queries embedded on the
    driver land in the same space as documents embedded here."""

    def encode(texts: List[str]) -> np.ndarray:
        out = np.empty((len(texts), dim), dtype=np.float64)
        for i, t in enumerate(texts):
            out[i] = md5_unit_vector(t, dim)
        return out

    return encode


def embed_texts(
    docs: DataFrame,
    embedder_factory: Callable[[], EmbedKernel] | None = None,
    batch_size: int = DEFAULT_BATCH,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, embedding): Arrow-batched executor-side embedding.

    One kernel instance per worker (factory called inside the iterator
    closure, before the batch loop); each Arrow batch is re-chunked to
    the kernel's ``batch_size`` exactly like the reference's encode
    loop.  Narrow map — no shuffle; the embeddings write inherits the
    input partitioning."""
    from lean_explore_spark.pyfiles import ensure_py_files

    ensure_py_files(docs.sparkSession)  # closure refs this module
    factory = embedder_factory or (lambda: hash_kernel_factory())

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kernel = factory()  # once per worker/task, NOT per batch
        for pdf in it:
            ids = pdf[id_col].tolist()
            texts = pdf[text_col].tolist()
            vecs: List[np.ndarray] = []
            for lo in range(0, len(texts), batch_size):
                out = np.asarray(
                    kernel(texts[lo : lo + batch_size]), dtype=np.float32
                )
                vecs.extend(out)
            yield pd.DataFrame({"vec_id": ids, "embedding": [list(v) for v in vecs]})

    return docs.select(
        docs[id_col], docs[text_col]
    ).mapInPandas(run, "vec_id long, embedding array<float>")
