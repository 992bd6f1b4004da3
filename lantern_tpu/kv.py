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


def _pallas_write_ok(cache: "KVCache", *new) -> tuple[bool, bool]:
    """(use_kernel, interpret) for this call site."""
    if PALLAS_WRITE == "never":
        return False, False
    interpret = PALLAS_WRITE == "interpret"
    if not interpret and jax.default_backend() not in ("tpu", "axon"):
        return False, False
    for a in (cache.k, cache.v, cache.length, *new):
        # batching is handled by the custom_vmap rule below; AD is not
        if isinstance(a, (_ad.JVPTracer, _ad.LinearizeTracer)):
            return False, False
    if not _kvu.supports(cache.k.shape, new[0].shape):
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


def ungroup_cache(buf: jnp.ndarray, n_kv: int, head_dim: int) -> jnp.ndarray:
    """[..., G, S, W] cache -> [..., S, n_kv, hd] (dense-path fallback)."""
    *lead, G, S, W = buf.shape
    pk = W // head_dim
    x = buf.reshape(*lead, G, S, pk, head_dim)
    x = jnp.moveaxis(x, -4, -3)                      # [..., S, G, pk, hd]
    return x.reshape(*lead, S, n_kv, head_dim)


def group_cache(buf: jnp.ndarray, head_dim: int | None = None) -> jnp.ndarray:
    """[..., S, n_kv, hd] -> grouped [..., G, S, W] (tests / loaders)."""
    *lead, S, nkv, hd = buf.shape
    G, W = group_dims(nkv, hd)
    x = buf.reshape(*lead, S, G, W)
    return jnp.moveaxis(x, -2, -3)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k", "v", "length"],
    meta_fields=[],
)
@dataclasses.dataclass
class KVCache:
    k: jnp.ndarray        # [L, B, G, S, W]
    v: jnp.ndarray        # [L, B, G, S, W]
    length: jnp.ndarray   # int32 scalar: valid prefix length

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    @property
    def group_width(self) -> int:
        return self.k.shape[4]

    @staticmethod
    def create(cfg: ModelConfig, batch: int, max_len: int | None = None, dtype=None) -> "KVCache":
        S = max_len or cfg.max_seq_len
        S = -(-S // 128) * 128     # pad to the flash kernel's block granularity
        dt = dtype or cfg.jnp_dtype
        G, W = group_dims(cfg.num_kv_heads, cfg.head_dim)
        shape = (cfg.num_layers, batch, G, S, W)
        return KVCache(
            k=jnp.zeros(shape, dt),
            v=jnp.zeros(shape, dt),
            length=jnp.zeros((), jnp.int32),
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
        T = k_new.shape[2]
        kg = group_blocks(k_new).astype(self.k.dtype)     # [L, B, G, T, W]
        vg = group_blocks(v_new).astype(self.v.dtype)
        s = self.length + jnp.asarray(offset, jnp.int32)
        use_kernel, interpret = _pallas_write_ok(self, kg, vg)
        if use_kernel:
            k, v = _write_cv(interpret)(self.k, self.v, kg, vg, s)
        else:
            z = jnp.zeros((), jnp.int32)
            k = jax.lax.dynamic_update_slice(self.k, kg, (z, z, z, s, z))
            v = jax.lax.dynamic_update_slice(self.v, vg, (z, z, z, s, z))
        length = self.length + (T if advance else 0)
        return KVCache(k=k, v=v, length=jnp.asarray(length, jnp.int32))

    def commit(self, n: jnp.ndarray) -> "KVCache":
        """Advance length by a traced amount (rows must already be in place)."""
        return dataclasses.replace(self, length=self.length + jnp.asarray(n, jnp.int32))

    def accept_path(self, rel_indices: jnp.ndarray, accept_count: jnp.ndarray) -> "KVCache":
        """Tree rollback: compact the accepted draft path into the prefix.

        ``rel_indices``: [A] int32, positions of the accepted path's nodes
        *relative to* ``length`` (i.e. slots within the provisional tree
        block), padded arbitrarily past ``accept_count``; A is the static
        max path length.  ``accept_count``: traced number of valid rows.
        Gathers those rows and rewrites them contiguously at ``length``,
        then advances by ``accept_count``.  Garbage rows past the new length
        are masked out by attention and later overwritten.
        """
        abs_idx = self.length + jnp.clip(rel_indices, 0)      # [A]
        z = jnp.zeros((), jnp.int32)
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
        return KVCache(
            k=k, v=v,
            length=self.length + jnp.asarray(accept_count, jnp.int32),
        )
