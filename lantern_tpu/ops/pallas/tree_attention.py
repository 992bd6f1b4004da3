"""Pallas flash tree-attention for speculative decoding.

The decode hot op: a T-token block (draft tree or accepted run) attends to
the committed KV prefix plus itself under an arbitrary ancestor mask.  The
dense path computes scores over the whole static cache [S]; this kernel
streams only ``ceil(length / BLK)`` KV blocks from HBM with online softmax,
so KV bandwidth tracks the *live* prefix instead of the allocation:

    out[t] = softmax([q_t . K[:len] | q_t . k_blk masked by tree]) . [V | v_blk]

Grid: (batch, heads).  Per program: the query tile and the new block live in
VMEM; committed KV blocks are DMA'd in a double-buffered fori_loop bounded by
the runtime length (blocks past it are never read).  An additive prefix bias
row ([S], 0/-inf) carries padding masks (left-padded captions / prompts).

MHA only (num_heads == num_kv_heads — true for every LANTERN family).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(
    len_ref,        # SMEM [1] int32: committed prefix length
    q_ref,          # VMEM [T, hd]
    kn_ref,         # VMEM [T, hd] new-block keys
    vn_ref,         # VMEM [T, hd] new-block values
    mask_ref,       # VMEM [T, T] block (tree/causal) mask, 0/1
    bias_ref,       # VMEM [1, S_pad] additive prefix bias (0 / -inf)
    k_hbm,          # HBM  [S_pad, hd]
    v_hbm,          # HBM  [S_pad, hd]
    o_ref,          # VMEM [T, hd] output
    *,
    blk: int,
    s_pad: int,
):
    T, hd = q_ref.shape
    q = q_ref[:].astype(jnp.float32)

    def body(k_scratch, v_scratch, sem_k, sem_v):
        length = len_ref[0]
        nblocks = pl.cdiv(length, blk)

        def get_k(slot, j):
            return pltpu.make_async_copy(
                k_hbm.at[pl.ds(j * blk, blk), :], k_scratch.at[slot], sem_k.at[slot]
            )

        def get_v(slot, j):
            return pltpu.make_async_copy(
                v_hbm.at[pl.ds(j * blk, blk), :], v_scratch.at[slot], sem_v.at[slot]
            )

        @pl.when(nblocks > 0)
        def _():
            get_k(0, 0).start()
            get_v(0, 0).start()

        def loop(j, carry):
            m, l, acc = carry
            slot = j % 2

            @pl.when(j + 1 < nblocks)
            def _():
                get_k((j + 1) % 2, j + 1).start()
                get_v((j + 1) % 2, j + 1).start()

            get_k(slot, j).wait()
            get_v(slot, j).wait()
            k = k_scratch[slot].astype(jnp.float32)           # [blk, hd]
            v = v_scratch[slot].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                  # [T, blk]
            # mask columns at/past the committed length + padding bias
            col = jax.lax.broadcasted_iota(jnp.int32, (T, blk), 1) + j * blk
            s = jnp.where(col < length, s, NEG_INF)
            s = s + bias_ref[0, pl.ds(j * blk, blk)][None, :]

            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)
            scale = jnp.exp(m - m_new)
            l_new = l * scale + jnp.sum(p, axis=1, keepdims=True)
            acc_new = acc * scale + jnp.dot(
                p, v, preferred_element_type=jnp.float32
            )
            return m_new, l_new, acc_new

        m0 = jnp.full((T, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((T, 1), jnp.float32)
        a0 = jnp.zeros((T, hd), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, nblocks, loop, (m0, l0, a0))

        # --- new (tree) block ---
        kn = kn_ref[:].astype(jnp.float32)
        vn = vn_ref[:].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, kn, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = jnp.where(mask_ref[:] != 0, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        scale = jnp.exp(m - m_new)
        l = l * scale + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * scale + jnp.dot(p, vn, preferred_element_type=jnp.float32)
        o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

    pl.run_scoped(
        body,
        k_scratch=pltpu.VMEM((2, blk, hd), k_hbm.dtype),
        v_scratch=pltpu.VMEM((2, blk, hd), v_hbm.dtype),
        sem_k=pltpu.SemaphoreType.DMA((2,)),
        sem_v=pltpu.SemaphoreType.DMA((2,)),
    )


def tree_attention(
    q: jnp.ndarray,            # [B, T, nh, hd]
    k_new: jnp.ndarray,        # [B, T, nh, hd]
    v_new: jnp.ndarray,        # [B, T, nh, hd]
    k_cache: jnp.ndarray,      # [B, S, nh, hd]
    v_cache: jnp.ndarray,      # [B, S, nh, hd]
    length: jnp.ndarray,       # [] int32
    block_mask: jnp.ndarray,   # [B, T, T] or [T, T] bool/int
    prefix_bias: jnp.ndarray,  # [B, S] f32 additive (0 / -inf)
    scale: float,
    blk: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash tree-attention over [committed prefix | new block].  Returns
    [B, T, nh, hd] in q's dtype."""
    B, T, nh, hd = q.shape
    S = k_cache.shape[1]
    if block_mask.ndim == 2:
        block_mask = jnp.broadcast_to(block_mask[None], (B, T, T))
    qs = (q * scale).swapaxes(1, 2).reshape(B * nh, T, hd)
    kns = k_new.swapaxes(1, 2).reshape(B * nh, T, hd)
    vns = v_new.swapaxes(1, 2).reshape(B * nh, T, hd)
    kcs = k_cache.swapaxes(1, 2).reshape(B * nh, S, hd)
    vcs = v_cache.swapaxes(1, 2).reshape(B * nh, S, hd)
    mask = jnp.repeat(block_mask.astype(jnp.int32), nh, axis=0)     # [B*nh, T, T]
    bias = jnp.repeat(prefix_bias.astype(jnp.float32), nh, axis=0)[:, None, :]
    lens = jnp.broadcast_to(jnp.reshape(length, (1, 1)), (B * nh, 1)).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * nh,),
        in_specs=[
            pl.BlockSpec((None, T, hd), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, T, hd), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, T, hd), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, T, T), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, S), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, S, hd), lambda i, *_: (i, 0, 0),
                         memory_space=pl.ANY),
            pl.BlockSpec((None, S, hd), lambda i, *_: (i, 0, 0),
                         memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((None, T, hd), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    def kernel(len_ref, q_ref, kn_ref, vn_ref, mask_ref, bias_ref,
               k_hbm, v_hbm, o_ref):
        _kernel(len_ref, q_ref, kn_ref, vn_ref, mask_ref, bias_ref,
                k_hbm, v_hbm, o_ref, blk=blk, s_pad=S)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * nh, T, hd), q.dtype),
        interpret=interpret,
    )(lens[:, 0], qs, kns, vns, mask, bias, kcs, vcs)
    return out.reshape(B, nh, T, hd).swapaxes(1, 2)


def tree_attention_reference(
    q, k_new, v_new, k_cache, v_cache, length, block_mask, prefix_bias, scale
):
    """Dense reference (mirrors models/transformer.forward attention)."""
    B, T, nh, hd = q.shape
    S = k_cache.shape[1]
    if block_mask.ndim == 2:
        block_mask = jnp.broadcast_to(block_mask[None], (B, T, T))
    s_pre = jnp.einsum("btnh,bsnh->bnts", q, k_cache,
                       preferred_element_type=jnp.float32) * scale
    vis = jnp.arange(S)[None, :] < length
    s_pre = jnp.where(vis[:, None, None, :], s_pre, NEG_INF)
    s_pre = s_pre + prefix_bias[:, None, None, :]
    s_blk = jnp.einsum("btnh,bunh->bntu", q, k_new,
                       preferred_element_type=jnp.float32) * scale
    s_blk = jnp.where(block_mask[:, None].astype(bool), s_blk, NEG_INF)
    s = jnp.concatenate([s_pre, s_blk], axis=-1)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bnts,bsnh->btnh", p[..., :S], v_cache.astype(jnp.float32))
    o = o + jnp.einsum("bntu,bunh->btnh", p[..., S:], v_new.astype(jnp.float32))
    return o.astype(q.dtype)
