"""Rotary position embeddings: 1-D (Chameleon) and 2-D image-grid (LlamaGen).

Two pairing conventions exist in the wild and both appear in the reference:

- **interleaved**: adjacent channel pairs rotate together; used by LlamaGen's
  2-D grid RoPE (modeling_llamagen_kv.py:213-223, x reshaped to [..., d/2, 2]).
- **half**: first/second half pairing with rotate_half; used by the Chameleon
  family (modeling_anole_kv.py apply_rotary_pos_emb).

Tables are precomputed on the host as (cos, sin) float32 arrays indexed by
position id; application is a pure jnp op over [..., T, H] with per-token
position ids (tree nodes share positions, so ids are data, not iota).

2-D grid semantics (modeling_llamagen_kv.py:197-211): the head dim splits in
half for x/y grid coordinates; the conditioning-prefix rows of the table are
ZERO (cos=sin=0), which zeroes q/k at prefix positions — an intentional quirk
of LlamaGen that we reproduce exactly (prefix keys then score 0 against every
query before masking).  A few zero rows are appended past the grid to absorb
speculative overshoot, as in the reference (+10 rows).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def rope_table_2d(
    grid_size: int, head_dim: int, base: float, cls_token_num: int, pad: int = 10
) -> tuple[np.ndarray, np.ndarray]:
    """(cos, sin) tables [cls + grid^2 + pad, head_dim // 2] for interleaved
    application over an image grid raster order."""
    half = head_dim // 2
    freqs = 1.0 / (base ** (np.arange(0, half, 2)[: half // 2] / half))
    t = np.arange(grid_size)
    f = np.outer(t, freqs)                                   # [g, hd/4]
    fx = np.broadcast_to(f[:, None, :], (grid_size, grid_size, f.shape[1]))
    fy = np.broadcast_to(f[None, :, :], (grid_size, grid_size, f.shape[1]))
    grid = np.concatenate([fx, fy], axis=-1).reshape(grid_size * grid_size, half)
    cos = np.cos(grid).astype(np.float32)
    sin = np.sin(grid).astype(np.float32)
    zeros_pre = np.zeros((cls_token_num, half), np.float32)
    zeros_post = np.zeros((pad, half), np.float32)
    return (
        np.concatenate([zeros_pre, cos, zeros_post], 0),
        np.concatenate([zeros_pre, sin, zeros_post], 0),
    )


def rope_table_1d(
    max_pos: int, head_dim: int, base: float
) -> tuple[np.ndarray, np.ndarray]:
    """(cos, sin) tables [max_pos, head_dim] for rotate-half application."""
    inv = 1.0 / (base ** (np.arange(0, head_dim, 2) / head_dim))
    f = np.outer(np.arange(max_pos), inv)                    # [p, hd/2]
    emb = np.concatenate([f, f], axis=-1)
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


def apply_rope_interleaved(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray, positions: jnp.ndarray
) -> jnp.ndarray:
    """x: [..., T, n_heads, head_dim]; positions: broadcastable to [..., T].
    Rotates adjacent channel pairs (LlamaGen convention). Computed in f32.

    ``cos``/``sin`` may be host numpy tables: ``jnp.take`` keeps them as
    host-side jaxpr constants (a device-resident constant would force a
    device->host readback during lowering — slow over a remote tunnel)."""
    c = jnp.take(cos, positions, axis=0)[..., None, :]       # [..., T, 1, hd/2]
    s = jnp.take(sin, positions, axis=0)[..., None, :]
    shape = x.shape
    xf = x.astype(jnp.float32).reshape(*shape[:-1], shape[-1] // 2, 2)
    x0, x1 = xf[..., 0], xf[..., 1]
    out = jnp.stack([x0 * c - x1 * s, x1 * c + x0 * s], axis=-1)
    return out.reshape(shape).astype(x.dtype)


def apply_rope_half(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray, positions: jnp.ndarray
) -> jnp.ndarray:
    """x: [..., T, n_heads, head_dim]; rotate-half convention (HF Llama)."""
    c = jnp.take(cos, positions, axis=0)[..., None, :]       # [..., T, 1, hd]
    s = jnp.take(sin, positions, axis=0)[..., None, :]
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (x.astype(jnp.float32) * c + rotated.astype(jnp.float32) * s).astype(x.dtype)
