"""Live-model embedding path: iterator-of-batches pandas UDF (SURVEY §2.9).

The reference embeds via batched HTTP calls to a local model server
(worker/app/services/embed_ollama.py:54-114 — batch 64, 180 s timeout,
deterministic dev fallback at :45-51). The Spark-native shape is an
ITERATOR-of-batches pandas UDF: the iterator form runs its setup code once
per executor task rather than once per batch, so each executor holds ONE
persistent HTTP session (or one loaded model) across all of its Arrow
batches — the per-batch cost is the request alone.

This module is the production skeleton; the container has no model server,
so the transport is injectable and the default is the dev-mode hash
embedding (bit-identical to functions/vectors.dev_embedding — the oracle
mode). Swap `post_fn` for a real HTTP client to go live; semantics
(batching, retries, dim validation) are real and tested either way.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

EMBED_BATCH = 64  # reference config.py:45
MAX_RETRIES = 3


def _dev_batch(texts: list[str], dim: int) -> list[list[float]]:
    """Deterministic fallback — the reference's EMBED_DEV_MODE semantics."""
    import hashlib

    out = []
    for t in texts:
        h = hashlib.sha256((t or "").encode("utf-8")).digest()
        out.append([h[i % 32] / 256.0 for i in range(dim)])
    return out


def live_embedding_udf(
    dim: int = 768,
    batch_size: int = EMBED_BATCH,
    post_fn: Callable[[list[str]], list[list[float]]] | None = None,
    max_retries: int = MAX_RETRIES,
):
    """Build the embedding UDF. ``post_fn(texts) -> vectors`` is the model
    transport (e.g. an HTTP POST to /api/embed); None = dev-mode hash.

    Returned vectors are dim-validated per row (reference
    qdrant_client.py:339-351): a wrong-dim vector becomes NULL rather than
    poisoning the table — count NULLs downstream as the skip metric.
    """

    @F.pandas_udf(ArrayType(DoubleType()))
    def _embed(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # Setup runs ONCE per executor task (the iterator-form contract):
        # a real transport would open its HTTP session / load its model here.
        fn = post_fn or (lambda texts: _dev_batch(texts, dim))
        for series in it:
            texts = series.fillna("").tolist()
            vectors: list[list[float] | None] = []
            for lo in range(0, len(texts), batch_size):
                batch = texts[lo : lo + batch_size]
                last_err: Exception | None = None
                for _ in range(max_retries):
                    try:
                        got = fn(batch)
                        break
                    except Exception as e:  # transport error: retry the batch
                        last_err = e
                        got = None
                if got is None:
                    raise RuntimeError(f"embedding transport failed: {last_err}")
                vectors.extend(
                    [v if (v is not None and len(v) == dim) else None for v in got]
                )
            yield pd.Series(vectors)

    return _embed


def parse_embed_response(data) -> list[list[float]]:
    """Tolerant response parser with the reference's contract
    (worker/app/services/embed_ollama.py:8-51). Accepted shapes:
    modern /api/embed ``{"embeddings": [[...], ...]}``; older single
    ``{"embedding": [...]}``; older batch
    ``{"embeddings": [{"embedding": [...]}, ...]}``.
    """
    if isinstance(data, dict) and "embeddings" in data:
        embs = data["embeddings"]
        if isinstance(embs, list):
            if embs and isinstance(embs[0], dict):
                return [e.get("embedding") for e in embs]
            return list(embs)
    if isinstance(data, dict) and "embedding" in data:
        return [data["embedding"]]
    raise ValueError("unrecognized embedding response shape")


def ollama_post_fn(
    base_url: str = "http://localhost:11434",
    model: str = "nomic-embed-text",
    timeout: float = 180.0,
) -> Callable[[list[str]], list[list[float]]]:
    """Concrete HTTP transport matching the reference's request/response
    shape (worker/app/services/embed_ollama.py:54-114): POST
    ``{"model": ..., "input": texts}`` to ``{base_url}/api/embed``, parse
    tolerantly, validate count and non-emptiness. Stdlib urllib — no extra
    dependency; errors raise so live_embedding_udf's retry loop applies.

    Pass the result as ``post_fn`` to :func:`live_embedding_udf` to go live;
    the dev-mode default stays in place when no transport is given.
    """
    import json
    import urllib.request

    url = f"{base_url.rstrip('/')}/api/embed"

    def post(texts: list[str]) -> list[list[float]]:
        req = urllib.request.Request(
            url,
            data=json.dumps({"model": model, "input": texts}).encode("utf-8"),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            data = json.loads(resp.read().decode("utf-8"))
        vectors = parse_embed_response(data)
        if len(vectors) != len(texts):
            raise ValueError(
                f"embedding count mismatch: expected {len(texts)}, got {len(vectors)}"
            )
        # every entry, not just the first: a malformed mid-batch item parses
        # to None/[] and would otherwise surface much later as an obscure
        # length-check failure inside the UDF
        bad = [i for i, v in enumerate(vectors) if not v]
        if bad:
            raise ValueError(f"empty embedding at batch positions {bad[:5]}")
        return vectors

    return post


def embed_column(text: Column | str, dim: int = 768, **kw) -> Column:
    """Convenience: the UDF applied to a text column."""
    text = F.col(text) if isinstance(text, str) else text
    return live_embedding_udf(dim=dim, **kw)(text)
