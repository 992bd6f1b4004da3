"""VQ-codebook nearest-latent tables for LANTERN relaxed acceptance.

Reference: entrypoints/generate_codebook.py — all-pairs L2 distances over the
(optionally L2-normalized) codebook embedding, then the top-(V-1) nearest
code ids per code, excluding self, stored uint16.

On TPU the all-pairs distance is one [V, d] x [d, V] matmul; the sort runs
per row.  V is 16384 (LlamaGen) or 8192 (Chameleon) — a single kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def nearest_latents(
    codebook: jnp.ndarray, k: int | None = None, l2_normalize: bool = False
) -> np.ndarray:
    """codebook [V, d] -> [V, k] int32 nearest code ids (self excluded),
    sorted by ascending L2 distance."""
    V = codebook.shape[0]
    k = k if k is not None else V - 1
    cb = jnp.asarray(codebook, jnp.float32)
    if l2_normalize:
        cb = cb / jnp.maximum(jnp.linalg.norm(cb, axis=-1, keepdims=True), 1e-12)
    sq = jnp.sum(cb * cb, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (cb @ cb.T)
    d2 = d2.at[jnp.arange(V), jnp.arange(V)].set(jnp.inf)     # exclude self
    _, idx = jax.lax.top_k(-d2, k)
    return np.asarray(idx, dtype=np.int32)


def save_table(path: str, table: np.ndarray) -> None:
    """uint16 .npy, matching the reference's on-disk format
    (ckpts/<model>/vq_distances/top_<k>_indices.npy)."""
    np.save(path, table.astype(np.uint16))


def load_table(path: str) -> np.ndarray:
    return np.load(path).astype(np.int32)
