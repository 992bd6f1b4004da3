"""Weight-only int8 (W8A16) quantization for the serving path.

The decode-time forwards are HBM weight-streaming bound (bench profile: the
XL tree forward reads ~1.4 GB of bf16 weights per step at ~2x speed-of-light).
Storing matmul kernels as int8 with per-output-channel scales halves the
bytes streamed per step; activations stay bf16 and the contraction runs on
the MXU after an in-VMEM dequant.  This is the TPU-native counterpart of the
reference's reliance on external quantized-kernel libraries (it ships none of
its own — SURVEY.md §0) and the "per-chip dequant/matmul kernels" called out
by the north-star target (BASELINE.json).

Layout convention: a quantized kernel replaces pytree entry ``name`` with
``name + "_q"`` (int8, same shape) and ``name + "_s"`` (float32 scale,
broadcastable over the contraction axis).  ``models/transformer.py`` and
``logits_head`` dispatch on the presence of the ``_q`` key, so jit sees the
layout statically via the pytree structure — no config flag is needed.

Two matmul implementations:
- ``int8_matmul``: XLA ``x @ q.astype(bf16) * s`` — portable (CPU tests).
- ``int8_matmul_pallas``: explicit kernel streaming int8 blocks from HBM and
  dequantizing in VMEM; used on real TPU inside the layer scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# matmul kernels eligible for quantization, in both the fused
# (fuse_params) and split layouts
LAYER_KERNELS = ("wqkv", "w_gu", "wq", "wk", "wv", "wo",
                 "w_gate", "w_up", "w_down")


def quantize_weight(w: jnp.ndarray, axis: int = -2):
    """Symmetric per-output-channel int8 quantization.

    ``axis`` is the contraction (input) axis that the scale must span; for
    the [in, out] (or stacked [L, in, out]) kernel convention that is -2.
    Returns ``(q int8, s float32)`` with ``q * s ~= w`` and ``s`` shaped like
    ``w`` with ``axis`` collapsed to 1.
    """
    wf = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    s = jnp.where(amax > 0, amax, 1.0) / 127.0
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return q, s.astype(jnp.float32)


def int8_matmul(x: jnp.ndarray, q: jnp.ndarray, s: jnp.ndarray,
                out_dtype=None) -> jnp.ndarray:
    """Portable dequant-matmul: ``(x @ q) * s`` in one XLA dot."""
    y = jax.lax.dot_general(
        x, q.astype(x.dtype),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (y * s).astype(out_dtype or x.dtype)


def _mm_kernel(x_ref, q_ref, s_ref, o_ref):
    acc = jax.lax.dot_general(
        x_ref[:], q_ref[:].astype(x_ref.dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = (acc * s_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def int8_matmul_pallas(
    x: jnp.ndarray,            # [..., K] bf16 activations
    q: jnp.ndarray,            # [K, N] int8 weight
    s: jnp.ndarray,            # [1, N] float32 scale
    block_n: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas dequant-matmul: int8 weight blocks stream HBM->VMEM, convert to
    the activation dtype in VMEM, contract on the MXU, scale in f32.

    The row count of decode-time forwards is tiny (2..128), so x is padded to
    the bf16 sublane tile (16) and kept whole in VMEM; the grid walks N.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    *lead, K = x.shape
    N = q.shape[-1]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    Mp = max(16, -(-M // 16) * 16)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    # lane-dim blocks must stay 128-aligned for Mosaic; if N has no aligned
    # divisor <= block_n, take the whole row in one block (N itself may be
    # unaligned only in tiny test configs, where one block is fine anyway)
    bn = min(block_n, N)
    while N % bn or (bn % 128 and bn != N):
        bn -= 128 if bn > 128 else bn  # step down by lanes; 0 -> whole row
        if bn <= 0:
            bn = N
            break
    out = pl.pallas_call(
        _mm_kernel,
        grid=(N // bn,),
        in_specs=[
            pl.BlockSpec((Mp, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mp, bn), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        interpret=interpret,
    )(x2, q, s.reshape(1, N).astype(jnp.float32))
    return out[:M].reshape(*lead, N)


def _impl() -> str:
    """Dequant-matmul implementation: 'pallas' (explicit kernel) or 'xla'
    (fused convert+dot).  Overridable via LANTERN_INT8_IMPL for perf A/B;
    'xla' is the compile-safe default (XLA fuses the convert into the dot's
    weight stream); flip to 'pallas' where it measures faster."""
    import os

    return os.environ.get("LANTERN_INT8_IMPL", "xla")


def mm(x: jnp.ndarray, w: dict, name: str) -> jnp.ndarray:
    """Matmul against ``w[name]``, using the quantized entries if present.

    The Pallas path needs 2-D [K, N] weights (a layer scan slices the
    stacked [L, K, N] kernels down to 2-D per step) and a real TPU backend;
    anything else falls back to the fused-convert XLA form.
    """
    if name in w:
        return x @ w[name]
    q, s = w[name + "_q"], w[name + "_s"]
    if q.ndim == 2 and jax.default_backend() == "tpu" and _impl() == "pallas":
        return int8_matmul_pallas(x, q, s)
    return int8_matmul(x, q, s)


def has_kernel(w: dict, name: str) -> bool:
    return name in w or name + "_q" in w


def head_of(params: dict):
    """The lm_head in whatever form the params carry: a dense [H, V] array,
    or an ``(int8, scale)`` pair.  Both are valid jit inputs; consumers
    dispatch with ``head_matmul``."""
    if "lm_head" in params:
        return params["lm_head"]
    return (params["lm_head_q"], params["lm_head_s"])


def head_matmul(hidden: jnp.ndarray, head) -> jnp.ndarray:
    """f32 logits from a ``head_of`` value."""
    if isinstance(head, tuple):
        return int8_matmul(hidden, head[0], head[1], out_dtype=jnp.float32)
    return (hidden @ head).astype(jnp.float32)


def quantize_params(params: dict, quantize_head: bool = True) -> dict:
    """Quantize the decoder's matmul kernels (and optionally lm_head).

    Embeddings (gathers), norms, and conditioning adapters stay in their
    original dtype — they are a rounding error of the streamed bytes.
    Works on either the fused (fuse_params) or split layer layout.
    """
    p = dict(params)
    layers = dict(p["layers"])
    for name in LAYER_KERNELS:
        if name in layers:
            w = layers.pop(name)
            q, s = quantize_weight(w)
            layers[name + "_q"] = q
            layers[name + "_s"] = s
    p["layers"] = layers
    if "fc_w" in p:   # drafter input-fusion projection (models/drafter.py)
        q, s = quantize_weight(p.pop("fc_w"))
        p["fc_w_q"] = q
        p["fc_w_s"] = s
    if quantize_head and "lm_head" in p:
        q, s = quantize_weight(p.pop("lm_head"))
        p["lm_head_q"] = q
        p["lm_head_s"] = s
    return p
