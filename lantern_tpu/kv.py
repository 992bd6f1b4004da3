"""Static-shape KV cache for speculative decoding on TPU.

Design (vs the reference's host-managed cache, models/drafters/kv_cache.py):

- One pair of HBM buffers for all layers in **head-group-major layout**
  ``k, v: [L, B, G, S, W]`` with a traced int32 ``length`` carried through
  the jitted decode loop — no CPU-resident lengths, no host syncs.
- **Layout**: TPU tiling wants a 128-lane minor dimension.  ``W = 128``
  lanes pack ``pk = 128 // head_dim`` consecutive kv-heads per *group*
  (``G = n_kv * head_dim / W`` groups); position ``s`` of group ``g`` holds
  ``[head_{g*pk}(s) | ... | head_{g*pk+pk-1}(s)]``.  This makes the flash
  tree-attention kernel's per-(batch, group) DMA slices ``[blk, 128]``
  perfectly tiled with **zero transposes of the cache** — the hot path
  streams the buffer exactly as stored.  Models whose ``n_kv * head_dim``
  isn't a multiple of 128 (tiny test configs) fall back to one head per
  group (``W = head_dim``) and take the dense attention path.
- **Append** writes a fixed-size [T]-token block at ``length`` via
  dynamic_update_slice.  Speculative tree blocks are written the same way;
  rows past the accepted prefix become garbage that is (a) invisible to
  attention, which masks by ``length``, and (b) overwritten by later writes.
  This replaces the reference's narrow+copy ``KVCache.cat``.
- **Rollback** (accepting a draft path) gathers the accepted rows — scattered
  inside the tree block — down to the contiguous prefix, mirroring
  ``KVCache.copy`` / update_inference_inputs (ea_model_llamagen.py:960-970)
  but as one fused gather + fixed-size write per layer under jit.

Sharding: shard ``G`` (head groups) over the tensor-parallel mesh axis and
``B`` over data; ``length`` is replicated.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax._src.interpreters import ad as _ad
from jax._src.interpreters import batching as _batching

from .configs import ModelConfig
from .ops.pallas import kv_update as _kvu

GRP = 128   # lane-group width (TPU minor-dim tile)

# In-place pallas write path.  "auto": use the aliased DMA kernel on TPU when
# shapes allow (XLA's dynamic_update_slice copies the full multi-GB buffer per
# step; the kernel moves ~3x the block instead).  "never": always
# dynamic_update_slice.  "interpret": force the kernel in pallas interpret
# mode (CPU tests).  vmapped callers (engine/batch.py request slots) route
# through a custom_vmap rule that runs ONE stacked kernel over the [R, L]
# planes with per-slot starts — a full-buffer dus copy per step at R slots
# costs more than the whole forward.  Autodiff (train) callers fall back;
# sharded multi-chip caches should go through shard_map before enabling this.
PALLAS_WRITE = "auto"

# In-scan KV writes (transformer.forward): "auto" threads the cache through
# the layer scan and updates each plane via dynamic_update_slice on the scan
# carry.  MEASURED SLOWER than the post-scan aliased kernel on v5e (XL, 64
# iters: T=1 in-scan 2.96 ms vs kernel 2.59; T=58 4.44 vs 3.86 — XLA does
# not alias the carried buffer cheaply through the per-layer dus), so the
# default stays "never"; the path is kept for future platforms/compilers.
WRITE_IN_SCAN = "never"


def _pallas_write_ok(cache: "KVCache", *new) -> tuple[bool, bool]:
    """(use_kernel, interpret) for this call site."""
    if PALLAS_WRITE == "never":
        return False, False
    interpret = PALLAS_WRITE == "interpret"
    if not interpret and jax.default_backend() not in ("tpu", "axon"):
        return False, False
    for a in (cache.k, cache.v, cache.length, *new):
        # batching is handled by the custom_vmap rule below; AD is not —
        # unwrap batch tracers so grad-of-vmapped still falls back
        while isinstance(a, _batching.BatchTracer):
            a = a.val
        if isinstance(a, (_ad.JVPTracer, _ad.LinearizeTracer)):
            return False, False
    if not _kvu.supports(cache.k.shape, new[0].shape, cache.k.dtype):
        return False, False
    return True, interpret


def _write_cv(interpret: bool):
    """custom_vmap-wrapped kernel write, cached per interpret mode.

    The unbatched primal is the plain aliased DMA kernel; under vmap the
    rule flattens the request axis into the layer-plane grid ([R, L, ...] ->
    [R*L, ...]) and hands the kernel a per-slot start vector — one kernel
    launch for the whole batch, still moving only ~3x the block bytes."""
    try:
        return _write_cv._cache[interpret]
    except (AttributeError, KeyError):
        pass
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def write(k, v, kn, vn, start):
        return _kvu.write_block(k, v, kn, vn, start, interpret=interpret)

    @write.def_vmap
    def _rule(axis_size, in_batched, k, v, kn, vn, start):  # noqa: ANN001
        kb, vb, knb, vnb, sb = in_batched

        def bc(x, batched):
            return x if batched else jnp.broadcast_to(
                x[None], (axis_size,) + jnp.shape(x))

        k, v, kn, vn = bc(k, kb), bc(v, vb), bc(kn, knb), bc(vn, vnb)
        s = jnp.asarray(start, jnp.int32).reshape(-1)
        s = jnp.broadcast_to(s, (axis_size,))
        R, L = k.shape[0], k.shape[1]

        def flat(a):
            return a.reshape((R * L,) + a.shape[2:])

        ko, vo = _kvu.write_block(flat(k), flat(v), flat(kn), flat(vn), s,
                                  interpret=interpret)

        def unflat(a):
            return a.reshape((R, L) + a.shape[1:])

        return (unflat(ko), unflat(vo)), (True, True)

    cache = getattr(_write_cv, "_cache", {})
    cache[interpret] = write
    _write_cv._cache = cache
    return write


def _gather_ok(cache: "KVCache", rel, block_size) -> tuple[bool, bool]:
    """(use_kernel, interpret) for the fused accept_path gather kernel."""
    if PALLAS_WRITE == "never" or block_size is None:
        return False, False
    interpret = PALLAS_WRITE == "interpret"
    if not interpret and jax.default_backend() not in ("tpu", "axon"):
        return False, False
    for a in (cache.k, cache.v, cache.length, rel):
        while isinstance(a, _batching.BatchTracer):
            a = a.val
        if isinstance(a, (_ad.JVPTracer, _ad.LinearizeTracer)):
            return False, False
    if not _kvu.gather_supports(cache.k.shape, block_size, cache.k.dtype):
        return False, False
    return True, interpret


def _gather_cv(interpret: bool, blk: int):
    """custom_vmap-wrapped fused rollback kernel (gather accepted rows +
    contiguous rewrite, all inside one aliased pallas call), cached per
    (interpret, provisional block size).  Same batching strategy as
    ``_write_cv``: the request axis folds into the layer-plane grid with
    per-slot starts and per-slot accepted-path indices."""
    cache = getattr(_gather_cv, "_cache", {})
    key = (interpret, blk)
    if key in cache:
        return cache[key]
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def gather(k, v, rel, start):
        return _kvu.gather_write_block(k, v, rel, start, blk,
                                       interpret=interpret)

    @gather.def_vmap
    def _rule(axis_size, in_batched, k, v, rel, start):  # noqa: ANN001
        kb, vb, relb, sb = in_batched

        def bc(x, batched):
            return x if batched else jnp.broadcast_to(
                x[None], (axis_size,) + jnp.shape(x))

        k, v = bc(k, kb), bc(v, vb)
        rels = jnp.asarray(rel, jnp.int32)
        if not relb:
            rels = jnp.broadcast_to(rels[None], (axis_size,) + rels.shape)
        s = jnp.asarray(start, jnp.int32).reshape(-1)
        s = jnp.broadcast_to(s, (axis_size,))
        R, L = k.shape[0], k.shape[1]

        def flat(a):
            return a.reshape((R * L,) + a.shape[2:])

        ko, vo = _kvu.gather_write_block(flat(k), flat(v), rels, s, blk,
                                         interpret=interpret)

        def unflat(a):
            return a.reshape((R, L) + a.shape[1:])

        return (unflat(ko), unflat(vo)), (True, True)

    cache[key] = gather
    _gather_cv._cache = cache
    return gather


def group_dims(n_kv: int, head_dim: int) -> tuple[int, int]:
    """(G, W): number of head groups and group width for the cache layout."""
    if GRP % head_dim == 0 and (n_kv * head_dim) % GRP == 0:
        return n_kv * head_dim // GRP, GRP
    return n_kv, head_dim


def group_blocks(blocks: jnp.ndarray) -> jnp.ndarray:
    """[..., T, n_kv, hd] new-block K/V -> grouped [..., G, T, W]."""
    *lead, T, nkv, hd = blocks.shape
    G, W = group_dims(nkv, hd)
    x = blocks.reshape(*lead, T, G, W)
    return jnp.moveaxis(x, -2, -3)


def ungroup_blocks(grouped: jnp.ndarray) -> jnp.ndarray:
    """Inverse of ``group_blocks``: [..., G, T, W] -> [..., T, n_kv, hd]...
    up to the head split — returns [..., T, G*W] flattened heads; callers
    reshape.  Used by the fake-quant round trip in transformer.forward."""
    x = jnp.moveaxis(grouped, -3, -2)                # [..., T, G, W]
    return x.reshape(*x.shape[:-2], -1)


def ungroup_cache(buf: jnp.ndarray, n_kv: int, head_dim: int) -> jnp.ndarray:
    """[..., G, S, W] cache -> [..., S, n_kv, hd] (dense-path fallback)."""
    *lead, G, S, W = buf.shape
    pk = W // head_dim
    x = buf.reshape(*lead, G, S, pk, head_dim)
    x = jnp.moveaxis(x, -4, -3)                      # [..., S, G, pk, hd]
    return x.reshape(*lead, S, n_kv, head_dim)


def dequant_cache(buf: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """int8 grouped cache [..., G, S, W] + scale [..., G, S] -> dtype."""
    return (buf.astype(jnp.float32) * scale[..., None]).astype(dtype)


def group_cache(buf: jnp.ndarray) -> jnp.ndarray:
    """[..., S, n_kv, hd] -> grouped [..., G, S, W] (tests / loaders)."""
    *lead, S, nkv, hd = buf.shape
    G, W = group_dims(nkv, hd)
    x = buf.reshape(*lead, S, G, W)
    return jnp.moveaxis(x, -2, -3)


def quantize_rows(grouped: jnp.ndarray):
    """Symmetric int8 per-(…, row) quantization of grouped K/V blocks.

    ``grouped``: [..., T, W] (group-major block layout).  Returns
    ``(q int8 [..., T, W], scale f32 [..., T])`` with ``q * scale ~= x``.
    One scale per 128-lane group row: exact per-head for head_dim 128
    (Chameleon/Lumina), shared across the pk=2 sub-heads for head_dim 64.
    """
    xf = grouped.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    s = jnp.where(amax > 0, amax, 1.0) / 127.0
    q = jnp.clip(jnp.round(xf / s[..., None]), -127, 127).astype(jnp.int8)
    return q, s


def fake_quant_rows(grouped: jnp.ndarray) -> jnp.ndarray:
    """quantize -> dequantize in the storage granularity (same dtype out).

    The in-flight block of a forward attends to itself *before* it lands in
    the cache; running it through the cache's exact quantizer keeps what a
    token saw during verification bit-identical to what later steps read
    back — greedy spec stays lossless vs AR with a quantized cache."""
    q, s = quantize_rows(grouped)
    return (q.astype(jnp.float32) * s[..., None]).astype(grouped.dtype)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k", "v", "length", "k_scale", "v_scale"],
    meta_fields=[],
)
@dataclasses.dataclass
class KVCache:
    k: jnp.ndarray        # [L, B, G, S, W]  (bf16/f32, or int8 when quantized)
    v: jnp.ndarray        # [L, B, G, S, W]
    length: jnp.ndarray   # int32 scalar: valid prefix length
    k_scale: jnp.ndarray | None = None   # [L, B, G, S] f32 (int8 cache only)
    v_scale: jnp.ndarray | None = None

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    @property
    def group_width(self) -> int:
        return self.k.shape[4]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @staticmethod
    def create(cfg: ModelConfig, batch: int, max_len: int | None = None,
               dtype=None, quantized: bool = False) -> "KVCache":
        S = max_len or cfg.max_seq_len
        S = -(-S // 128) * 128     # pad to the flash kernel's block granularity
        dt = jnp.int8 if quantized else (dtype or cfg.jnp_dtype)
        G, W = group_dims(cfg.num_kv_heads, cfg.head_dim)
        shape = (cfg.num_layers, batch, G, S, W)
        return KVCache(
            k=jnp.zeros(shape, dt),
            v=jnp.zeros(shape, dt),
            length=jnp.zeros((), jnp.int32),
            k_scale=jnp.zeros(shape[:-1], jnp.float32) if quantized else None,
            v_scale=jnp.zeros(shape[:-1], jnp.float32) if quantized else None,
        )

    def reset(self) -> "KVCache":
        return dataclasses.replace(self, length=jnp.zeros((), jnp.int32))

    def write(
        self, k_new: jnp.ndarray, v_new: jnp.ndarray, advance: bool = True,
        offset=0,
    ) -> "KVCache":
        """Write a [L, B, T, n_kv, hd] block at ``length + offset``; optionally
        commit it (advance the length by T; offset must be 0 then).  With
        ``advance=False`` the block is written as *provisional* (tree
        candidates / drafter expansion levels at increasing offsets):
        attention sees it via an explicit block mask, and later writes
        overwrite it."""
        if advance and not (isinstance(offset, int) and offset == 0):
            raise ValueError("write(advance=True) requires offset == 0: rows "
                             "below the offset would be committed unwritten")
        T = k_new.shape[2]
        kg = group_blocks(k_new)                          # [L, B, G, T, W]
        vg = group_blocks(v_new)
        if self.quantized:
            kg, ks = quantize_rows(kg)
            vg, vs = quantize_rows(vg)
        else:
            kg = kg.astype(self.k.dtype)
            vg = vg.astype(self.v.dtype)
            ks = vs = None
        s = self.length + jnp.asarray(offset, jnp.int32)
        use_kernel, interpret = _pallas_write_ok(self, kg, vg)
        if use_kernel:
            k, v = _write_cv(interpret)(self.k, self.v, kg, vg, s)
        else:
            z = jnp.zeros((), jnp.int32)
            k = jax.lax.dynamic_update_slice(self.k, kg, (z, z, z, s, z))
            v = jax.lax.dynamic_update_slice(self.v, vg, (z, z, z, s, z))
        length = self.length + (T if advance else 0)
        return KVCache(
            k=k, v=v, length=jnp.asarray(length, jnp.int32),
            k_scale=self._put_scale(self.k_scale, ks, s),
            v_scale=self._put_scale(self.v_scale, vs, s),
        )

    @staticmethod
    def _put_scale(buf, rows, s):
        """Scale-row update [L, B, G, T] -> [L, B, G, S] at position ``s``.
        The scale planes are ~W times smaller than the cache, so a plain
        dynamic_update_slice (full small-buffer copy) is cheap."""
        if buf is None:
            return None
        z = jnp.zeros((), jnp.int32)
        return jax.lax.dynamic_update_slice(buf, rows, (z, z, z, s))

    def commit(self, n: jnp.ndarray) -> "KVCache":
        """Advance length by a traced amount (rows must already be in place)."""
        return dataclasses.replace(self, length=self.length + jnp.asarray(n, jnp.int32))

    def accept_path(self, rel_indices: jnp.ndarray, accept_count: jnp.ndarray,
                    block_size: int | None = None) -> "KVCache":
        """Tree rollback: compact the accepted draft path into the prefix.

        ``rel_indices``: [A] int32, positions of the accepted path's nodes
        *relative to* ``length`` (i.e. slots within the provisional tree
        block), padded arbitrarily past ``accept_count``; A is the static
        max path length.  ``accept_count``: traced number of valid rows.
        Gathers those rows and rewrites them contiguously at ``length``,
        then advances by ``accept_count``.  Garbage rows past the new length
        are masked out by attention and later overwritten.

        ``block_size``: static size of the provisional tree window the
        indices point into (all ``rel_indices < block_size``).  When given,
        the gather happens *inside* the aliased pallas kernel (the XLA
        ``take`` alternative pays a second latency-bound pass over the
        cache planes).
        """
        rel = jnp.clip(rel_indices, 0)
        if block_size is not None:
            # one clamp feeds BOTH the kernel gather and the scale-plane
            # gather below — out-of-contract pad indices must not source K/V
            # and their scales from different rows
            rel = jnp.minimum(rel, block_size - 1)
        use_gather, g_interp = _gather_ok(self, rel, block_size)
        z = jnp.zeros((), jnp.int32)
        abs_idx = self.length + rel                               # [A]
        if use_gather:
            k, v = _gather_cv(g_interp, int(block_size))(
                self.k, self.v, rel, self.length
            )
        else:
            k_rows = jnp.take(self.k, abs_idx, axis=3)            # [L, B, G, A, W]
            v_rows = jnp.take(self.v, abs_idx, axis=3)
            use_kernel, interpret = _pallas_write_ok(self, k_rows, v_rows)
            if use_kernel:
                k, v = _write_cv(interpret)(
                    self.k, self.v, k_rows, v_rows, self.length
                )
            else:
                at = (z, z, z, self.length, z)
                k = jax.lax.dynamic_update_slice(self.k, k_rows, at)
                v = jax.lax.dynamic_update_slice(self.v, v_rows, at)
        if self.quantized:
            ks = self._put_scale(
                self.k_scale, jnp.take(self.k_scale, abs_idx, axis=3),
                self.length)
            vs = self._put_scale(
                self.v_scale, jnp.take(self.v_scale, abs_idx, axis=3),
                self.length)
        else:
            ks = vs = None
        return KVCache(
            k=k, v=v,
            length=self.length + jnp.asarray(accept_count, jnp.int32),
            k_scale=ks, v_scale=vs,
        )
