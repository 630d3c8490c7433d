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


def hash_kernel_factory(dim: int = DEFAULT_DIM) -> EmbedKernel:
    """Deterministic stand-in kernel: md5-seeded Philox unit vector per
    text — identical to service.stub_embedder so queries embedded on
    the driver land in the same space as documents embedded here."""

    def encode(texts: List[str]) -> np.ndarray:
        out = np.empty((len(texts), dim), dtype=np.float64)
        for i, t in enumerate(texts):
            h = hashlib.md5(t.encode("utf-8")).digest()
            rng = np.random.Generator(
                np.random.Philox(
                    key=[
                        int.from_bytes(h[:8], "big"),
                        int.from_bytes(h[8:], "big"),
                    ]
                )
            )
            v = rng.normal(size=dim)
            out[i] = v / np.linalg.norm(v)
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
