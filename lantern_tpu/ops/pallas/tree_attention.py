"""Pallas flash tree-attention for speculative decoding.

The decode hot op: a T-token block (draft tree or accepted run) attends to
the committed KV prefix plus itself under an arbitrary ancestor mask.  The
dense path computes scores over the whole static cache [S]; this kernel
streams only ``ceil(length / BLK)`` KV blocks from HBM with online softmax,
so KV bandwidth tracks the *live* prefix instead of the allocation:

    out[t] = softmax([q_t . K[:len] | q_t . k_blk masked by tree]) . [V | v_blk]

Layout: TPU tiling wants a 128-lane minor dimension, but head_dim is 64 for
the LlamaGen family.  Rather than transposing the cache per step (a full
cache copy per layer) or relayouting 64-wide slices, heads are fused into
128-lane *groups* of ``pk = 128 // head_dim`` sub-heads — a pure reshape of
the cache's native [B, S, nh, hd] layout.  Per-sub-head scores use
lane-masked q (zeros in the other sub-head's lanes kill cross terms), and
the combined [T, 128] output de-multiplexes with the same masks.  pk = 1
(head_dim 128, Chameleon) degenerates to the plain kernel.

Grid: (batch, head_group).  Per program: the query group and the new block
live in VMEM; committed KV blocks are DMA'd in a double-buffered fori_loop
bounded by the per-batch runtime length (blocks past it are never read).
An additive prefix bias row ([S], 0/-inf) carries padding masks
(left-padded captions / prompts) and enables per-row lengths.

MHA only (num_heads == num_kv_heads — true for every LANTERN family).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
GRP = 128   # lane-group width (TPU minor-dim tile)


def _kernel(
    len_ref,        # SMEM [B] int32: committed prefix length per batch row
    q_ref,          # VMEM [T, GRP] (pk sub-heads side by side)
    kn_ref,         # VMEM [T, GRP] new-block keys
    vn_ref,         # VMEM [T, GRP] new-block values
    mask_ref,       # VMEM [T, T] block (tree/causal) mask, 0/1
    bias_ref,       # VMEM [1, S_pad] additive prefix bias (0 / -inf)
    *rest,          # [ks_ref, vs_ref,] k_hbm, v_hbm, o_ref — scale rows
                    # ([1, S_pad] f32 per (b, g)) present iff scaled: the
                    # cache streams as int8 and dequantizes per element,
                    # rounded through the model dtype (bit-identical to the
                    # in-flight fake-quant values; see kv.fake_quant_rows)
    blk: int,
    pk: int,
    scaled: bool = False,
):
    if scaled:
        ks_ref, vs_ref, k_hbm, v_hbm, o_ref = rest
    else:
        k_hbm, v_hbm, o_ref = rest
        ks_ref = vs_ref = None
    T, G = q_ref.shape
    hd = G // pk
    b = pl.program_id(0)
    g = pl.program_id(1)
    q = q_ref[:].astype(jnp.float32)
    # lane masks selecting each sub-head's 64-lane half (all-ones for pk=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, G), 1) // hd
    lmask = [(lane == p).astype(jnp.float32) for p in range(pk)]
    qp = [q * lmask[p] for p in range(pk)]

    def body(k_scratch, v_scratch, sem_k, sem_v):
        length = len_ref[b]
        nblocks = pl.cdiv(length, blk)

        # Mosaic allows ANY-space (HBM) refs only as whole arrays, so the
        # per-(batch, group) slice happens in the DMA source index.
        def get_k(slot, j):
            return pltpu.make_async_copy(
                k_hbm.at[b, g, pl.ds(j * blk, blk), :], k_scratch.at[slot],
                sem_k.at[slot]
            )

        def get_v(slot, j):
            return pltpu.make_async_copy(
                v_hbm.at[b, g, pl.ds(j * blk, blk), :], v_scratch.at[slot],
                sem_v.at[slot]
            )

        @pl.when(nblocks > 0)
        def _():
            get_k(0, 0).start()
            get_v(0, 0).start()

        def loop(j, carry):
            ms, ls, accs = carry
            slot = j % 2

            @pl.when(j + 1 < nblocks)
            def _():
                get_k((j + 1) % 2, j + 1).start()
                get_v((j + 1) % 2, j + 1).start()

            get_k(slot, j).wait()
            get_v(slot, j).wait()
            if scaled:
                # dequantize per element and ROUND THROUGH the model dtype:
                # a key read back from the int8 cache must be bit-identical
                # to the fake-quantized in-flight key the token saw during
                # its own verification forward (kv.fake_quant_rows), or
                # near-tie argmaxes break the greedy-lossless contract
                ks = ks_ref[0, pl.ds(j * blk, blk)]           # [blk]
                vs = vs_ref[0, pl.ds(j * blk, blk)]
                k = (k_scratch[slot].astype(jnp.float32) * ks[:, None]
                     ).astype(kn_ref.dtype).astype(jnp.float32)
                v = (v_scratch[slot].astype(jnp.float32) * vs[:, None]
                     ).astype(vn_ref.dtype).astype(jnp.float32)
            else:
                k = k_scratch[slot].astype(jnp.float32)       # [blk, G]
                v = v_scratch[slot].astype(jnp.float32)
            col = jax.lax.broadcasted_iota(jnp.int32, (T, blk), 1) + j * blk
            colmask = col < length
            bias = bias_ref[0, pl.ds(j * blk, blk)][None, :]

            ms2, ls2, accs2 = [], [], []
            for p in range(pk):
                s = jax.lax.dot_general(
                    qp[p], k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                              # [T, blk]
                s = jnp.where(colmask, s, NEG_INF) + bias
                m_new = jnp.maximum(ms[p], jnp.max(s, axis=1, keepdims=True))
                pr = jnp.exp(s - m_new)
                sc = jnp.exp(ms[p] - m_new)
                ls2.append(ls[p] * sc + jnp.sum(pr, axis=1, keepdims=True))
                accs2.append(accs[p] * sc + jax.lax.dot_general(
                    pr, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ))                                             # [T, G]
                ms2.append(m_new)
            return tuple(ms2), tuple(ls2), tuple(accs2)

        m0 = tuple(jnp.full((T, 1), NEG_INF, jnp.float32) for _ in range(pk))
        l0 = tuple(jnp.zeros((T, 1), jnp.float32) for _ in range(pk))
        a0 = tuple(jnp.zeros((T, G), jnp.float32) for _ in range(pk))
        ms, ls, accs = jax.lax.fori_loop(0, nblocks, loop, (m0, l0, a0))

        # --- new (tree) block ---
        kn = kn_ref[:].astype(jnp.float32)
        vn = vn_ref[:].astype(jnp.float32)
        tmask = mask_ref[:] != 0
        out = jnp.zeros((T, G), jnp.float32)
        for p in range(pk):
            s = jax.lax.dot_general(
                qp[p], kn, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = jnp.where(tmask, s, NEG_INF)
            m_new = jnp.maximum(ms[p], jnp.max(s, axis=1, keepdims=True))
            pr = jnp.exp(s - m_new)
            sc = jnp.exp(ms[p] - m_new)
            l = ls[p] * sc + jnp.sum(pr, axis=1, keepdims=True)
            acc = accs[p] * sc + jax.lax.dot_general(
                pr, vn, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # de-multiplex: keep only this sub-head's lanes of its acc
            out = out + (acc / jnp.maximum(l, 1e-30)) * lmask[p]
        o_ref[:] = out.astype(o_ref.dtype)

    pl.run_scoped(
        body,
        k_scratch=pltpu.VMEM((2, blk, GRP), k_hbm.dtype),
        v_scratch=pltpu.VMEM((2, blk, GRP), v_hbm.dtype),
        sem_k=pltpu.SemaphoreType.DMA((2,)),
        sem_v=pltpu.SemaphoreType.DMA((2,)),
    )


def tree_attention(
    q: jnp.ndarray,            # [B, T, nh, hd]
    k_new: jnp.ndarray,        # [B, T, nh, hd]
    v_new: jnp.ndarray,        # [B, T, nh, hd]
    k_cache: jnp.ndarray,      # [B, G, S, GRP] grouped (kv.group_cache)
    v_cache: jnp.ndarray,      # [B, G, S, GRP]
    length: jnp.ndarray,       # [] or [B] int32
    block_mask: jnp.ndarray,   # [B, T, T] or [T, T] bool/int
    prefix_bias: jnp.ndarray,  # [B, S] f32 additive (0 / -inf)
    scale: float,
    blk: int = 256,
    interpret: bool = False,
    k_scale: jnp.ndarray | None = None,   # [B, G, S] f32: int8 cache scales
    v_scale: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Flash tree-attention over [committed prefix | new block].  The cache
    arrives in its storage layout (head-group-major, see kv.py) and is
    streamed as-is — no transposes; an int8 cache (kv.py quantized=True)
    streams as int8 and dequantizes in-kernel against ``k_scale``/``v_scale``
    rows.  Returns [B, T, nh, hd] in q's dtype."""
    B, T, nh, hd = q.shape
    _, NP, S, W = k_cache.shape
    if W != GRP or GRP % hd or nh % (GRP // hd) or NP != nh * hd // GRP:
        raise ValueError(
            f"tree_attention needs a {GRP}-lane grouped cache matching q; "
            f"got cache [B,{NP},{S},{W}] for q heads {nh}x{hd}"
        )
    pk = GRP // hd
    while S % blk:
        blk //= 2            # DMA blocks must tile S exactly (S is 128-padded)
    if block_mask.ndim == 2:
        block_mask = jnp.broadcast_to(block_mask[None], (B, T, T))
    # The cache keeps its storage layout.  The per-step tensors (q / new
    # block / out) are tiny, so they afford a [B, NP, T, GRP] transpose,
    # which VMEM block slicing needs (the 2nd-minor dim of a block must be
    # whole or 8-aligned).
    qs = (q * scale).reshape(B, T, NP, GRP).swapaxes(1, 2)
    kns = k_new.reshape(B, T, NP, GRP).swapaxes(1, 2)
    vns = v_new.reshape(B, T, NP, GRP).swapaxes(1, 2)
    kcs = k_cache
    vcs = v_cache
    mask = block_mask.astype(jnp.int32)                              # [B, T, T]
    bias = prefix_bias.astype(jnp.float32)[:, None, :]               # [B, 1, S]
    lens = jnp.broadcast_to(
        jnp.asarray(length, jnp.int32).reshape(-1), (B,))            # [B]
    scaled = k_scale is not None

    in_specs = [
        pl.BlockSpec((None, None, T, GRP), lambda b, g, *_: (b, g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, None, T, GRP), lambda b, g, *_: (b, g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, None, T, GRP), lambda b, g, *_: (b, g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, T, T), lambda b, g, *_: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, 1, S), lambda b, g, *_: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [lens, qs, kns, vns, mask, bias]
    if scaled:
        # scale rows [B, G, S] -> [B, G, 1, S]; one [1, S] row per (b, g)
        in_specs += [
            pl.BlockSpec((None, None, 1, S), lambda b, g, *_: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, 1, S), lambda b, g, *_: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [k_scale.astype(jnp.float32)[:, :, None, :],
                 v_scale.astype(jnp.float32)[:, :, None, :]]
    # ANY (HBM) refs: whole array, trivial index map (mosaic requirement);
    # the kernel DMAs the per-cell slice itself
    in_specs += [pl.BlockSpec(memory_space=pl.ANY),
                 pl.BlockSpec(memory_space=pl.ANY)]
    args += [kcs, vcs]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, NP),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((None, None, T, GRP),
                               lambda b, g, *_: (b, g, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    kernel = functools.partial(_kernel, blk=blk, pk=pk, scaled=scaled)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, NP, T, GRP), q.dtype),
        interpret=interpret,
    )(*args)
    return out.swapaxes(1, 2).reshape(B, T, nh, hd)


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
    length = jnp.broadcast_to(jnp.asarray(length, jnp.int32).reshape(-1), (B,))
    vis = jnp.arange(S)[None, :] < length[:, None]
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
