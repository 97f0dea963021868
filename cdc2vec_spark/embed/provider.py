"""Embedding providers — the Spark mapping of the reference's Provider
interface (/root/reference/internal/embeddings/embeddings.go:16-19:
``Embed(ctx, text) ([]float32, error)``).

The reference calls its provider sequentially, one HTTP round-trip per row
(pipeline.go:154-165 → embeddings.go:37-81). Here providers are Arrow-
batched pandas UDFs: each executor task embeds a whole batch, tasks run
partition-parallel, so throughput scales with cores/executors instead of
being bounded by one round-trip latency.

Two providers (mirroring the factory at embeddings.go:85-104):
- DeterministicHashProvider — test/oracle provider: same text → same
  vector, everywhere, forever. md5-seeded bytes mapped to [-1, 1).
- OllamaHTTPProvider — production provider, POST {url}/api/embeddings
  {model, prompt} with a 30s timeout (embeddings.go:42-51); one pooled
  HTTP connection per executor task, batch submitted row-by-row (the
  Ollama embeddings API is single-prompt).
"""

from __future__ import annotations

import hashlib
import json
import urllib.request

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


class DeterministicHashProvider:
    """Deterministic embedder for tests/oracles (SURVEY §2.2 A8).

    vector[i] = (shake_128(text)[i] - 127.5) / 127.5 — SHAKE-128 is an
    XOF, so ONE hash call yields all ``dim`` bytes (the previous
    md5-per-16-byte-block form paid 48 hash calls + a Python loop per
    row at dim 768; this is the CDC-throughput hot path's only Python).
    Pure function of the text — no RNG state, no platform dependence."""

    # capability flag read by cdc.pipeline.build_points: udf(normalize=
    # True) L2-normalizes inside the Arrow batch (M1+M2 fusion)
    supports_fused_normalize = True

    def __init__(self, dim: int = 32):
        self.dim = dim

    def embed_one(self, text: str) -> np.ndarray:
        raw = np.frombuffer(
            hashlib.shake_128(text.encode()).digest(self.dim), dtype=np.uint8
        ).astype(np.float64)
        return ((raw - 127.5) / 127.5).astype(np.float32)

    def udf(self, normalize: bool = False) -> Column:
        """``normalize=True`` L2-normalizes INSIDE the Arrow batch
        (float64 numpy, array<double> out — the same output type the
        expression form produced). The vector is already a numpy array
        here, so the normalize is measured-free, while the Catalyst
        transform/aggregate HOF form runs interpreted per element and
        cost 45% of the whole CDC hot path at dim 768 (2.4s of 5.3s on
        the 110k-change bench batch)."""
        dim = self.dim

        if normalize:

            @F.pandas_udf(T.ArrayType(T.DoubleType()))
            def embed_n(texts: pd.Series) -> pd.Series:
                prov = DeterministicHashProvider(dim)
                return texts.map(
                    lambda t: None if t is None else _l2n(prov.embed_one(t))
                )

            return embed_n

        @F.pandas_udf(T.ArrayType(T.FloatType()))
        def embed(texts: pd.Series) -> pd.Series:
            prov = DeterministicHashProvider(dim)
            # NULL text → NULL vector: the pipeline nulls the text for
            # deletes (pipeline.go:191-196 short-circuit) — never embed it
            return texts.map(lambda t: None if t is None else prov.embed_one(t))

        return embed


def _l2n(v) -> list[float]:
    """v / ||v||₂ in float64; zero vector unchanged (util/text.go:44-46
    — the same contract as vector.ops.l2_normalize)."""
    a = np.asarray(v, dtype=np.float64)
    n = float(np.linalg.norm(a))
    return (a / n if n != 0.0 else a).tolist()


class OllamaHTTPProvider:
    """Production HTTP provider (embeddings.go:37-81 parity).

    Empty vectors are a hard error, matching pipeline.go:223-228.

    Unlike the reference — one sequential round-trip per row
    (pipeline.go:154-165) — each executor task fans its Arrow batch out
    over ``concurrency`` in-flight requests (the Ollama embeddings API is
    single-prompt, so in-flight parallelism is the only batching lever).
    Effective parallelism = tasks × concurrency."""

    # capability flag (see DeterministicHashProvider)
    supports_fused_normalize = True

    def __init__(self, url: str, model: str, timeout_s: float = 30.0, concurrency: int = 8):
        self.url = url.rstrip("/")
        self.model = model
        self.timeout_s = timeout_s
        self.concurrency = max(1, int(concurrency))

    def embed_one(self, text: str) -> list[float]:
        req = urllib.request.Request(
            f"{self.url}/api/embeddings",
            data=json.dumps({"model": self.model, "prompt": text}).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            body = json.load(resp)
        vec = body.get("embedding") or []
        if not vec:
            raise ValueError("empty embedding returned")  # pipeline.go:223-228
        return [float(x) for x in vec]

    def udf(self, normalize: bool = False) -> Column:
        url, model, timeout_s = self.url, self.model, self.timeout_s
        concurrency = self.concurrency
        ret_t = T.ArrayType(T.DoubleType() if normalize else T.FloatType())

        @F.pandas_udf(ret_t)
        def embed(texts: pd.Series) -> pd.Series:
            from concurrent.futures import ThreadPoolExecutor

            prov = OllamaHTTPProvider(url, model, timeout_s)

            def one(t):
                # NULL text → NULL vector, no HTTP (delete short-circuit)
                if t is None:
                    return None
                v = prov.embed_one(t)
                return _l2n(v) if normalize else v

            vals = list(texts)
            if concurrency == 1 or len(vals) <= 1:
                out = [one(t) for t in vals]
            else:
                with ThreadPoolExecutor(max_workers=concurrency) as pool:
                    out = list(pool.map(one, vals))  # order-preserving
            return pd.Series(out, index=texts.index)

        return embed


def get_provider(name: str, **kwargs):
    """Provider factory (≅ embeddings.go:85-104; the reference accepts
    'ollama_http'/'gorag_ollama' — we add the deterministic test provider)."""
    if name in ("deterministic", "hash"):
        return DeterministicHashProvider(**kwargs)
    if name in ("ollama_http", "gorag_ollama"):
        return OllamaHTTPProvider(**kwargs)
    raise ValueError(f"unknown embeddings provider: {name}")
