"""In-place KV-cache block writes as aliased pallas DMA kernels.

Why this exists: the cache update is logically
``buf[:, :, :, start:start+T, :] = new`` at a *traced* offset.  Expressed as
``lax.dynamic_update_slice`` XLA materializes a full-buffer copy (measured:
the copy cost tracks the buffer size, not the block size), which at the
bench's XL geometry costs ~5 ms/step at batch 16 — 60x the bytes actually
written.  This kernel pins the semantics instead: the buffer is an
``input_output_aliases`` operand (guaranteed in-place) and only a
``T+ALIGN``-row window around the write moves through VMEM.

Mosaic constraint that shapes the design: an HBM memref slice on the
sublane dim must start at a *provably* tile-aligned index, but ``start`` is
an arbitrary runtime value (the KV length after an arbitrary accept).  So
the kernel writes the aligned window ``[s0a, s0a + T + ALIGN)`` with
``s0a = align_down(start)`` (hinted via ``pl.multiple_of``) and
read-modify-writes it: old window -> VMEM, new block rolled down by
``start - s0a`` rows (``pltpu.roll`` takes a dynamic shift), rows inside
``[start, start+T)`` replaced, window DMA'd back.  Bytes moved ≈ 3x the
block, independent of the buffer size.

Grid blocking: one grid step per layer plane is DMA-latency-bound (measured
~14 µs/plane on v5e — 0.5 ms for a 36-layer write whose bytes cost ~50 µs),
so the kernel processes ``Lb`` layer planes per grid step, as many as fit
the VMEM scratch budget while still sharing one ``start`` (all planes of a
request slot share theirs).

Two entry points:
- ``write_block``: append/overwrite a [.., T, W] block at ``start``
  (``kv.KVCache.write`` — tree/provisional block append; the reference's
  ``KVCache.cat``, kv_cache.py:52-66).
- ``gather_write_block``: tree-rollback compaction
  (``kv.KVCache.accept_path``; the reference's ``KVCache.copy``,
  kv_cache.py:38-50): rows ``start + rel[j]`` (inside the provisional tree
  window of ``blk`` rows) are gathered *in VMEM* and rewritten contiguously
  at ``start`` — one aliased kernel, no XLA gather (a ``jnp.take`` +
  aliased-write pair costs another full window of latency-bound traffic).

Layout contract matches kv.py: ``buf [L, B, G, S, W]``, ``new
[L, B, G, T, W]``, both the same dtype; ``start`` is a traced int32 scalar
(or [R] with L = R * layers for stacked caches, e.g. vmapped request slots —
each group of ``layers`` leading planes gets its own start).  T is arbitrary
(padded internally; the pad rows are masked out of the write).  Static
requirements: ``S % ALIGN == 0``, ``S >= align_up(T) + ALIGN``,
``W % 128 == 0`` (see ``supports``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mosaic's scoped-vmem stack limit is 16 MiB; the budget below must cover
# the declared scratch buffers AND the compiler's fused temporaries (the
# write kernel's f32 roll upcasts, the gather kernel's matmul operands), so
# callers account them via n_scratch window-equivalents against this cap.
_VMEM_BUDGET = 12 * 1024 * 1024


def _vmem_itemsize(dtype) -> int:
    """Effective per-element VMEM staging cost.  int8 windows are tiled
    (32, 128) with (4, 1) packing and Mosaic's fused temporaries upcast;
    measured scoped-vmem for int8 blocks runs ~2x the raw byte count
    (19.3M observed where the 1-byte model said 9.9M), so budget int8 as
    2 bytes/element."""
    return max(jnp.dtype(dtype).itemsize, 2)


def align_rows(dtype) -> int:
    """Sublane tile rows for a dtype: f32 (8, 128), bf16 (16, 128),
    int8/fp8 (32, 128).  The kernel's aligned-window start must be a
    multiple of this."""
    return 32 // max(jnp.dtype(dtype).itemsize, 1)


def supports(buf_shape, new_shape, dtype=jnp.bfloat16) -> bool:
    """Whether the kernel's static constraints hold for these shapes."""
    L, B, G, S, W = buf_shape
    T = new_shape[-2]
    ALIGN = align_rows(dtype)
    Tp = -(-T // ALIGN) * ALIGN
    # even the minimal Lb=1, bb=1 blocking must fit the scratch budget
    # (n_scratch=6 window-equivalents), or _block_layers would still launch a
    # kernel that fails at Mosaic compile time instead of falling back
    fits = 6 * G * (Tp + ALIGN) * W * _vmem_itemsize(dtype) <= _VMEM_BUDGET
    return W % 128 == 0 and S % ALIGN == 0 and S >= Tp + ALIGN and fits


def _block_layers(L, layers_per_start, B, G, Tw, W, itemsize, n_scratch):
    """(Lb, bb): layer planes and batch rows per grid step.  Lb divides
    ``layers_per_start`` so every block shares one start; together the
    ``n_scratch`` VMEM buffers stay under budget."""
    bb = B
    per_plane = G * Tw * W * itemsize

    def best_lb(bb):
        lb = 1
        for c in range(1, layers_per_start + 1):
            if layers_per_start % c == 0 and \
                    n_scratch * c * bb * per_plane <= _VMEM_BUDGET:
                lb = c
        return lb

    lb = best_lb(bb)
    while bb > 1 and lb == 1 and n_scratch * bb * per_plane > _VMEM_BUDGET:
        if B % (bb // 2):
            break
        bb //= 2
        lb = best_lb(bb)
    while B % bb:
        bb -= 1
    return lb, bb


def _make_kernel(B, G, S, W, Tp, T_logical, bb, Lb, layers_per_start, ALIGN):
    Tw = Tp + ALIGN

    def _kernel(start_ref, kn, vn, kin, vin, kout, vout,
                scr_ok, scr_nk, scr_ov, scr_nv, sem_ok, sem_nk, sem_ov, sem_nv):
        l0 = pl.program_id(0) * Lb
        b0 = pl.program_id(1) * bb
        start = start_ref[l0 // layers_per_start]
        s0a = jnp.minimum((start // ALIGN) * ALIGN, S - Tw)
        s0a = pl.multiple_of(s0a, ALIGN)
        off = start - s0a
        rows = lax.broadcasted_iota(jnp.int32, (Lb, bb, G, Tw, W), 3)
        # mask by the *logical* block: pad rows [T_logical, Tp) never land, so
        # callers need no headroom past start + T_logical in the buffer
        in_blk = (rows >= off) & (rows < off + T_logical)
        window = (pl.ds(l0, Lb), pl.ds(b0, bb), slice(None),
                  pl.ds(s0a, Tw), slice(None))
        blk_at = (pl.ds(l0, Lb), pl.ds(b0, bb))
        # start all four input DMAs up front, then process K while V's
        # copies are in flight (and V while K's writeback drains) — the
        # per-plane cost is DMA-latency-bound, so the K/V phases overlap
        cps = []
        for scr_o, scr_n, sem_o, sem_n, in_ref, n_ref in (
                (scr_ok, scr_nk, sem_ok, sem_nk, kin, kn),
                (scr_ov, scr_nv, sem_ov, sem_nv, vin, vn)):
            cp_o = pltpu.make_async_copy(in_ref.at[window], scr_o, sem_o)
            cp_o.start()
            cp_n = pltpu.make_async_copy(
                n_ref.at[blk_at], scr_n.at[:, :, :, pl.ds(0, Tp), :], sem_n
            )
            cp_n.start()
            cps.append((cp_o, cp_n))
        writes = []
        for (cp_o, cp_n), scr_o, scr_n, sem_o, out_ref in (
                (cps[0], scr_ok, scr_nk, sem_ok, kout),
                (cps[1], scr_ov, scr_nv, sem_ov, vout)):
            cp_o.wait()
            cp_n.wait()
            # dynamic_rotate only handles 32-bit lanes; upcast bf16 for the roll
            rolled = pltpu.roll(
                scr_n[:].astype(jnp.float32), shift=off, axis=3
            ).astype(scr_n.dtype)
            scr_o[:] = jnp.where(in_blk, rolled, scr_o[:])
            cp_w = pltpu.make_async_copy(scr_o, out_ref.at[window], sem_o)
            cp_w.start()
            writes.append(cp_w)
        for cp_w in writes:
            cp_w.wait()

    return _kernel


def write_block(
    k_buf: jnp.ndarray,   # [L, B, G, S, W]
    v_buf: jnp.ndarray,   # [L, B, G, S, W]
    k_new: jnp.ndarray,   # [L, B, G, T, W] same dtype as buf
    v_new: jnp.ndarray,
    start: jnp.ndarray,   # [] int32, or [R] with L = R * layers
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """In-place ``buf[..., start:start+T, :] = new`` for K and V; returns the
    (aliased) buffers.  T may be any size; the kernel pads the staging block
    internally and masks the write to exactly T rows."""
    if not supports(k_buf.shape, k_new.shape, k_buf.dtype):
        raise ValueError(
            f"write_block: unsupported shapes buf={k_buf.shape} new={k_new.shape}"
        )
    ALIGN = align_rows(k_buf.dtype)
    L, B, G, S, W = k_buf.shape
    starts = jnp.reshape(jnp.asarray(start, jnp.int32), (-1,))
    R = starts.shape[0]
    if L % R:
        raise ValueError(f"write_block: {R} starts don't tile {L} planes")
    T = k_new.shape[-2]
    Tp = -(-T // ALIGN) * ALIGN
    if Tp != T:
        pad = [(0, 0)] * 5
        pad[3] = (0, Tp - T)
        k_new = jnp.pad(k_new, pad)
        v_new = jnp.pad(v_new, pad)
    Tw = Tp + ALIGN
    itemsize = _vmem_itemsize(k_buf.dtype)
    # 4 staging windows + 2 window-equivalents for the f32 roll temporaries
    Lb, bb = _block_layers(L, L // R, B, G, Tw, W, itemsize, n_scratch=6)
    kern = _make_kernel(B, G, S, W, Tp, T, bb, Lb, L // R, ALIGN)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L // Lb, B // bb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # k_new
            pl.BlockSpec(memory_space=pl.ANY),   # v_new
            pl.BlockSpec(memory_space=pl.ANY),   # k_buf (aliased -> out 0)
            pl.BlockSpec(memory_space=pl.ANY),   # v_buf (aliased -> out 1)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((Lb, bb, G, Tw, W), k_buf.dtype),  # K old window
            pltpu.VMEM((Lb, bb, G, Tw, W), k_buf.dtype),  # K new block
            pltpu.VMEM((Lb, bb, G, Tw, W), k_buf.dtype),  # V old window
            pltpu.VMEM((Lb, bb, G, Tw, W), k_buf.dtype),  # V new block
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_buf.shape, k_buf.dtype),
            jax.ShapeDtypeStruct(v_buf.shape, v_buf.dtype),
        ],
        # scalar-prefetch operand shifts indices: inputs are
        # (start, k_new, v_new, k_buf, v_buf) = 0..4
        input_output_aliases={3: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(starts, k_new, v_new, k_buf, v_buf)


def gather_supports(buf_shape, blk: int, dtype=jnp.bfloat16) -> bool:
    """Static constraints for ``gather_write_block``: the staged window must
    cover the whole ``blk``-row provisional block plus alignment slop."""
    L, B, G, S, W = buf_shape
    ALIGN = align_rows(dtype)
    Tp = -(-blk // ALIGN) * ALIGN
    # minimal Lb=1, bb=1 blocking must fit the scratch budget (n_scratch=9:
    # two staging windows + staged matmul operand/result headroom)
    fits = 9 * G * (Tp + ALIGN) * W * _vmem_itemsize(dtype) <= _VMEM_BUDGET
    return W % 128 == 0 and S % ALIGN == 0 and S >= Tp + ALIGN and fits


def _make_gather_kernel(G, S, W, Tw, A, bb, Lb, layers_per_start, ALIGN):
    def _kernel(start_ref, rel_ref, kin, vin, kout, vout, scr_k, scr_v,
                sem_k, sem_v):
        l0 = pl.program_id(0) * Lb
        b0 = pl.program_id(1) * bb
        r = l0 // layers_per_start
        start = start_ref[r]
        s0a = jnp.minimum((start // ALIGN) * ALIGN, S - Tw)
        s0a = pl.multiple_of(s0a, ALIGN)
        off = start - s0a
        window = (pl.ds(l0, Lb), pl.ds(b0, bb), slice(None),
                  pl.ds(s0a, Tw), slice(None))
        cp_k = pltpu.make_async_copy(kin.at[window], scr_k, sem_k)
        cp_k.start()
        cp_v = pltpu.make_async_copy(vin.at[window], scr_v, sem_v)
        cp_v.start()
        # Compaction as ONE permutation matmul per window instead of A
        # select/reduce passes: P[t, s] = 1 where t in [off, off+A) picks its
        # source row off+rel[t-off], identity elsewhere.  Exactly one 1 per
        # row, so the f32-accumulated product is bit-exact row copying; the
        # MXU does the whole window in a single pass (P is built while the
        # input DMAs are in flight).
        t = lax.broadcasted_iota(jnp.int32, (Tw, Tw), 0)
        s = lax.broadcasted_iota(jnp.int32, (Tw, Tw), 1)
        P = ((t == s) & ((t < off) | (t >= off + A))).astype(jnp.float32)
        for j in range(A):
            P = P + ((t == off + j) & (s == off + rel_ref[r, j])).astype(
                jnp.float32)

        def apply(scr):
            data = scr[:]
            # contract in bf16 (f32 for f32 caches): exactly one 1.0 per P
            # row, so the f32-accumulated copy is bit-exact for bf16 values
            # and for int8 integers (<= 127, exact in bf16); bf16 operands
            # avoid materializing f32 copies of the whole window
            ct = jnp.float32 if data.dtype == jnp.float32 else jnp.bfloat16
            x = data.reshape(Lb * bb * G, Tw, W).astype(ct)
            Pc = P.astype(ct)
            y = jax.vmap(lambda m: jax.lax.dot(
                Pc, m, preferred_element_type=jnp.float32))(x)
            scr[:] = y.astype(data.dtype).reshape(data.shape)

        writes = []
        for cp, scr, sem, out_ref in ((cp_k, scr_k, sem_k, kout),
                                      (cp_v, scr_v, sem_v, vout)):
            cp.wait()
            apply(scr)
            cp_w = pltpu.make_async_copy(scr, out_ref.at[window], sem)
            cp_w.start()
            writes.append(cp_w)
        for cp_w in writes:
            cp_w.wait()

    return _kernel


def gather_write_block(
    k_buf: jnp.ndarray,   # [L, B, G, S, W]
    v_buf: jnp.ndarray,
    rel: jnp.ndarray,     # [A] int32 in [0, blk), or [R, A]
    start: jnp.ndarray,   # [] int32, or [R] with L = R * layers
    blk: int,             # static provisional-window rows (>= max(rel) + 1)
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Tree-rollback compaction, fully in-kernel:
    ``buf[..., start + j, :] = buf[..., start + rel[j], :]`` for j < A.
    The caller guarantees ``rel < blk`` and ``start + blk <= S`` (the
    provisional block was written there).  Returns the aliased buffers."""
    if not gather_supports(k_buf.shape, blk, k_buf.dtype):
        raise ValueError(
            f"gather_write_block: unsupported buf={k_buf.shape} blk={blk}"
        )
    ALIGN = align_rows(k_buf.dtype)
    L, B, G, S, W = k_buf.shape
    starts = jnp.reshape(jnp.asarray(start, jnp.int32), (-1,))
    R = starts.shape[0]
    if L % R:
        raise ValueError(f"gather_write_block: {R} starts don't tile {L} planes")
    rels = jnp.asarray(rel, jnp.int32)
    if rels.ndim == 1:
        rels = rels[None]
    if rels.shape[0] not in (1, R):
        raise ValueError(f"gather_write_block: rel rows {rels.shape[0]} != {R}")
    rels = jnp.broadcast_to(rels, (R, rels.shape[1]))
    A = rels.shape[1]
    if A > blk:
        # scatter targets [start, start+A) are only guaranteed to stay inside
        # the staged window (and the start+blk <= S caller contract) when
        # A <= blk; fail loudly instead of diverging from the XLA fallback
        raise ValueError(f"gather_write_block: {A} rows > blk={blk}")
    Tp = -(-blk // ALIGN) * ALIGN
    Tw = Tp + ALIGN
    itemsize = _vmem_itemsize(k_buf.dtype)
    # n_scratch=9: two real scratch windows + the permutation matmul's
    # staged operand/result copies (measured: Mosaic keeps ~4.3 window-
    # equivalents per plane alive at bf16; 17.25M scoped-vmem at Lb=4)
    Lb, bb = _block_layers(L, L // R, B, G, Tw, W, itemsize, n_scratch=9)
    kern = _make_gather_kernel(G, S, W, Tw, A, bb, Lb, L // R, ALIGN)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(L // Lb, B // bb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # k_buf (aliased -> out 0)
            pl.BlockSpec(memory_space=pl.ANY),   # v_buf (aliased -> out 1)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((Lb, bb, G, Tw, W), k_buf.dtype),
            pltpu.VMEM((Lb, bb, G, Tw, W), k_buf.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_buf.shape, k_buf.dtype),
            jax.ShapeDtypeStruct(v_buf.shape, v_buf.dtype),
        ],
        # inputs after scalar prefetch: (start, rel, k_buf, v_buf) = 0..3
        input_output_aliases={2: 0, 3: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(starts, rels, k_buf, v_buf)
