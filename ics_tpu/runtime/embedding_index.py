"""In-memory embedding index with on-device cosine top-k (net-new TPU
tier; reference has only exact SHA-256 lookup, ``app/api/routes/images.py``).

The corpus matrix lives on the device in bf16 (rows L2-normalized, so
cosine = dot); queries run as a single [1, D] x [D, N] MXU matmul +
``lax.top_k``. Row counts are padded to power-of-two buckets so XLA keeps
one compiled graph per bucket instead of one per corpus size; the cache
refreshes when the (count, latest-write) version key changes.
"""

from __future__ import annotations

import functools
import logging
import threading
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ics_tpu.crud import embedding_crud

logger = logging.getLogger(__name__)

MIN_ROWS_BUCKET = 128


def _rows_bucket(n: int) -> int:
    b = MIN_ROWS_BUCKET
    while b < n:
        b *= 2
    return b


@functools.partial(jax.jit, static_argnums=3)
def _cosine_topk(query, matrix, n_valid, k: int):
    """query [D] f32, matrix [Nb, D] bf16 (rows L2-normed) -> (scores, idx)
    of the top k rows among the first ``n_valid``. Padding rows are masked
    to -inf BEFORE top_k: their raw score is 0, which outranks every
    real match with negative cosine — with a small corpus in a large
    bucket the top-k would otherwise fill with padding and valid results
    silently vanish (review r5). ``n_valid`` is traced (no extra graphs);
    k is static: one graph per (bucket, k) pair, both from small sets."""
    scores = jnp.dot(
        matrix, query.astype(matrix.dtype),
        preferred_element_type=jnp.float32,
    )
    scores = jnp.where(
        jnp.arange(matrix.shape[0]) < n_valid, scores, -jnp.inf
    )
    return jax.lax.top_k(scores, k)


class EmbeddingIndex:
    """Per-model corpus index shared by the similarity endpoints."""

    K_MAX = 64

    def __init__(self, db, modelo: str):
        self.db = db
        self.modelo = modelo
        self._lock = threading.Lock()
        self._version: Optional[tuple] = None
        self._hashes: list[str] = []
        self._matrix = None  # device array [Nb, D] bf16
        self._n = 0

    def refresh(self) -> None:
        with self.db.session() as s:
            version = embedding_crud.versao_corpus(s, self.modelo)
            if version == self._version:
                return
            hashes, mat = embedding_crud.carregar_corpus(s, self.modelo)
        with self._lock:
            self._version = version
            self._hashes = hashes
            self._n = len(hashes)
            if self._n == 0:
                self._matrix = None
                return
            bucket = _rows_bucket(self._n)
            padded = np.zeros((bucket, mat.shape[1]), np.float32)
            padded[: self._n] = mat.astype(np.float32)
            # bf16 on device: MXU-native, and the fp16 storage already
            # bounds the quantization error
            self._matrix = jax.device_put(jnp.asarray(padded, jnp.bfloat16))
            logger.info(
                "embedding index (%s): %d vectors (bucket %d, dim %d)",
                self.modelo, self._n, bucket, mat.shape[1],
            )

    def search(
        self,
        query: np.ndarray,
        k: int = 10,
        exclude: Optional[str] = None,
        min_score: Optional[float] = None,
    ) -> list[dict]:
        """L2-normalized query [D] -> [{content_hash, score}] best-first."""
        from ics_tpu.utils.metrics import registry as metrics_registry

        self.refresh()
        # SNAPSHOT under the lock: searches run on executor threads while
        # another thread's refresh() swaps matrix/hashes/n — indices from
        # the OLD matrix mapped through the NEW hashes list silently
        # return the wrong images (self-review r3)
        with self._lock:
            matrix, hashes, n = self._matrix, self._hashes, self._n
        metrics_registry.counter(
            "similarity_searches_total", "embedding cosine top-k searches"
        ).inc()
        metrics_registry.gauge(
            "embedding_index_vectors", "vectors in the similarity index"
        ).set(n)
        if n == 0 or matrix is None:
            return []
        # always extract K_MAX on device and slice on host: one compiled
        # graph per rows-bucket regardless of the requested k
        k_eff = min(self.K_MAX, int(matrix.shape[0]))
        q = jnp.asarray(np.asarray(query, np.float32))
        scores, idx = _cosine_topk(q, matrix, n, k_eff)
        scores = np.asarray(scores)
        idx = np.asarray(idx)
        out = []
        for i, sc in zip(idx, scores):
            if i >= n:  # padding row
                continue
            h = hashes[int(i)]
            if exclude is not None and h == exclude:
                continue
            if min_score is not None and float(sc) < min_score:
                continue
            out.append({"content_hash": h, "score": float(sc)})
            if len(out) >= k:
                break
        return out
