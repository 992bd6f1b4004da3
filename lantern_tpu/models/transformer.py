"""Unified decoder for all LANTERN model families, as pure functions over
parameter pytrees.

One parameterized implementation replaces the reference's three ~1.7K-line
kv_variants models (SURVEY.md §7.1.3): RoPE kind (1-D / 2-D grid), QK-norm,
swin-norm ordering, and the conditioning adapter (class label / T5 caption /
token prompt) are config switches.

TPU-first structure:
- ``lax.scan`` over stacked layer weights -> one compiled block regardless of
  depth, uniform sharding rules.
- Decode steps read the committed KV prefix and the in-flight block
  separately: scores = [q . K_cache[:S] | q . k_new], jointly softmaxed.  The
  new block's K/V never round-trip through HBM before attention, and cache
  writes happen once per step outside the layer scan.
- The draft-tree ancestor mask enters as an explicit [T, T] ``block_mask``
  (replacing the reference's ``model.tree_mask`` attribute hook,
  modeling_llamagen_kv.py:1042-1048).
- All masking is by traced ``kv.length`` — no dynamic shapes anywhere.

Weight convention: matmul kernels are stored [in, out] (x @ W); loaders from
torch checkpoints transpose once on the host.
"""

from __future__ import annotations

import dataclasses

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import ModelConfig
from ..kv import (
    GRP,
    KVCache,
    dequant_cache,
    fake_quant_rows,
    group_blocks,
    ungroup_blocks,
    ungroup_cache,
)
from ..ops.quant import has_kernel, mm
from ..ops.rope import (
    apply_rope_half,
    apply_rope_interleaved,
    rope_table_1d,
    rope_table_2d,
)

NEG_INF = -1e30


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------

def make_rope_tables(cfg: ModelConfig):
    """Rope cos/sin tables as HOST numpy arrays.

    Deliberately not device arrays: callers often build these at trace time
    inside jit, where a device-resident constant forces MLIR lowering to read
    the buffer back host-side (jax _array_mlir_constant_handler) — a
    pathological stall over this environment's remote-TPU tunnel.  Host
    constants embed for free; XLA uploads them with the executable."""
    if cfg.rope_kind == "2d":
        cos, sin = rope_table_2d(
            cfg.grid_size, cfg.head_dim, cfg.rope_base, cfg.cls_token_num
        )
    else:
        cos, sin = rope_table_1d(cfg.max_seq_len, cfg.head_dim, cfg.rope_base)
    return np.asarray(cos), np.asarray(sin)


def init_params(rng: jax.Array, cfg: ModelConfig, dtype=None) -> dict:
    """Random-init parameter pytree (tests / tiny models; real weights come
    from checkpoint loaders)."""
    dt = dtype or cfg.jnp_dtype
    H, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    L = cfg.num_layers
    ks = iter(jax.random.split(rng, 32))

    def w(key, *shape, scale=0.02):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dt)

    layers = {
        "attn_norm": jnp.ones((L, H), dt),
        "wq": w(next(ks), L, H, nh * hd),
        "wk": w(next(ks), L, H, nkv * hd),
        "wv": w(next(ks), L, H, nkv * hd),
        "wo": w(next(ks), L, nh * hd, H),
        "ffn_norm": jnp.ones((L, H), dt),
        "w_gate": w(next(ks), L, H, I),
        "w_up": w(next(ks), L, H, I),
        "w_down": w(next(ks), L, I, H),
    }
    if cfg.qk_norm:
        layers["q_norm_w"] = jnp.ones((L, nh, hd), dt)
        layers["q_norm_b"] = jnp.zeros((L, nh, hd), dt)
        layers["k_norm_w"] = jnp.ones((L, nkv, hd), dt)
        layers["k_norm_b"] = jnp.zeros((L, nkv, hd), dt)

    params = {
        "embed": w(next(ks), V, H),
        "layers": layers,
        "norm": jnp.ones((H,), dt),
        "lm_head": w(next(ks), H, V),
    }
    if cfg.cond_kind == "label":
        params["cond"] = {"table": w(next(ks), cfg.num_classes + 1, H)}
    elif cfg.cond_kind == "caption":
        params["cond"] = {
            "fc1": w(next(ks), cfg.caption_dim, H),
            "fc2": w(next(ks), H, H),
            "uncond": w(next(ks), cfg.cls_token_num, cfg.caption_dim, scale=cfg.caption_dim ** -0.5),
        }
    return params


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

def fuse_params(params: dict) -> dict:
    """Fuse per-layer QKV and gate/up projections into single matmuls.

    One [H, (nh+2nkv)*hd] and one [H, 2I] kernel per layer replace five —
    fewer kernel launches per decode step (~108 at XL depth) and longer
    contiguous weight streams for the HBM-bound small-batch forward.
    Single-chip / data-parallel serving only: the fused column axis crosses
    q/k/v boundaries, so Megatron-style TP sharding (parallel/mesh.py) keeps
    the split layout.  ``forward`` accepts either layout.
    """
    p = dict(params)
    layers = dict(p["layers"])
    if "wq" in layers:
        layers["wqkv"] = jnp.concatenate(
            [layers.pop("wq"), layers.pop("wk"), layers.pop("wv")], axis=-1
        )
    if "w_gate" in layers:
        layers["w_gu"] = jnp.concatenate(
            [layers.pop("w_gate"), layers.pop("w_up")], axis=-1
        )
    p["layers"] = layers
    return p


def rms_norm(x: jnp.ndarray, w: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (w * (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype))


def head_layer_norm(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Per-head LayerNorm over head_dim (Chameleon QK-norm,
    modeling_anole_kv.py:274-291).  x: [B, T, n, hd]; w, b: [n, hd]."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    normed = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (normed * w + b).astype(x.dtype)


def cond_embed(params: dict, cfg: ModelConfig, cond) -> jnp.ndarray:
    """Conditioning prefix -> [B, cls_token_num, H].

    - label: int32 [B] class ids (id == num_classes selects the uncond row)
      (reference LabelEmbedder, modeling_llamagen_kv.py:120-147)
    - caption: float [B, cls_token_num, caption_dim] T5 features
      (reference CaptionEmbedder MLP, modeling_llamagen_kv.py:153-195)
    """
    if cfg.cond_kind == "label":
        return params["cond"]["table"][cond][:, None, :]
    if cfg.cond_kind == "caption":
        p = params["cond"]
        h = cond.astype(p["fc1"].dtype) @ p["fc1"]
        h = jax.nn.gelu(h, approximate=True)
        return h @ p["fc2"]
    raise ValueError(f"no conditioning for cond_kind={cfg.cond_kind}")


def token_embed(params: dict, input_ids: jnp.ndarray) -> jnp.ndarray:
    return params["embed"][input_ids]


def logits_head(params: dict, hidden: jnp.ndarray) -> jnp.ndarray:
    from ..ops.quant import head_matmul, head_of

    return head_matmul(hidden, head_of(params))


def build_mask(
    T: int,
    S: int,
    cur_len: jnp.ndarray,
    block_mask: Optional[jnp.ndarray],
    prefix_valid: Optional[jnp.ndarray],
    batch: int,
    prefix_override: Optional[jnp.ndarray] = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Additive masks for (prefix, new block).

    Returns ``(mask_prefix [B, 1, T, S], mask_block [B or 1, 1, T, T])`` in f32
    {0, NEG_INF}.  Prefix: key j visible iff j < cur_len and (optionally)
    prefix_valid[b, j]; or, when ``prefix_override`` ([T, S] or [B, T, S]
    bool) is given, exactly that — used by the drafter to expose earlier
    *provisional* tree-level rows beyond ``cur_len`` with ancestor
    visibility.  Block: ``block_mask`` (tree ancestor matrix, or [B, T, T]
    when padding differs per sample) or causal within the block.
    """
    if prefix_override is not None:
        po = prefix_override if prefix_override.ndim == 3 else prefix_override[None]
        mp = jnp.where(po, 0.0, NEG_INF).astype(jnp.float32)[:, None]  # [B?,1,T,S]
        if mp.shape[0] == 1 and batch > 1:
            mp = jnp.broadcast_to(mp, (batch, 1, T, S))
    else:
        j = jnp.arange(S)
        vis = (j[None, :] < cur_len)                             # [1, S]
        if prefix_valid is not None:
            vis = vis & prefix_valid
        mp = jnp.where(vis, 0.0, NEG_INF).astype(jnp.float32)    # [B or 1, S]
        mp = jnp.broadcast_to(mp[:, None, None, :], (mp.shape[0], 1, T, S))
        if mp.shape[0] == 1 and batch > 1:
            mp = jnp.broadcast_to(mp, (batch, 1, T, S))

    if block_mask is None:
        bm = jnp.tril(jnp.ones((T, T), bool))
    else:
        bm = block_mask.astype(bool)
    if bm.ndim == 2:
        bm = bm[None]
    mb = jnp.where(bm, 0.0, NEG_INF).astype(jnp.float32)[:, None]
    return mp, mb


class ForwardResult(NamedTuple):
    hidden: jnp.ndarray          # [B, T, H] final-norm hidden states
    kv: KVCache                  # cache with the new block written at length
    # deferred-commit mode (``defer_block=True``): the block's roped K/V
    # ([L, B, T, n_kv, hd] pair) returned INSTEAD of being written to the
    # cache — the speculative engine carries it and commits only the
    # accepted rows through the next forward's ``extra_kv``, eliminating
    # the per-step tree-rollback kernel (kv.accept_path)
    block: object = None


def forward(
    params: dict,
    cfg: ModelConfig,
    embeds: jnp.ndarray,          # [B, T, H]
    kv: KVCache,
    positions: jnp.ndarray,       # [T] or [B, T] position ids
    rope: tuple[jnp.ndarray, jnp.ndarray],
    block_mask: Optional[jnp.ndarray] = None,   # [T, T] tree/causal mask
    prefix_valid: Optional[jnp.ndarray] = None,  # [B or 1, S] padding mask
    prefix_override: Optional[jnp.ndarray] = None,  # [T, S] custom visibility
    commit: bool = True,
    write_offset=0,
    extra_kv=None,
    defer_block: bool = False,
) -> ForwardResult:
    """Run the decoder over a new token block against the KV cache.

    ``extra_kv``: optional ``(k_ex [L, B, A, n_kv, hd], v_ex, n_valid)`` of
    already-roped K/V rows (a previous block's accepted rows, carried by the
    engine) committed BEFORE the layer scan: one write kernel places them at
    ``length`` and advances it by the traced ``n_valid`` (rows past
    ``n_valid`` land as garbage above the committed frontier and are
    overwritten by the next commit before any read), so the block's
    attention reads them from the cache prefix bit-identically to having
    compacted them with ``kv.accept_path`` — without the rollback kernel.
    ``defer_block=True`` skips writing the new block and returns its roped
    K/V in ``ForwardResult.block`` for the engine to carry.

    ``commit=False`` writes the block's K/V provisionally (tree verification):
    the cache length does not advance; the caller later compacts accepted rows
    with ``kv.accept_path``.  ``write_offset`` places a provisional block past
    earlier provisional rows (drafter tree levels).
    """
    B, T, H = embeds.shape
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    S = kv.max_len
    cos, sin = rope
    if positions.ndim == 1:
        positions = positions[None, :]
    # clamp into the rope table: garbage tail rows of masked fixed-size
    # blocks may run past the end near the image boundary
    positions = jnp.clip(positions, 0, cos.shape[0] - 1)

    if extra_kv is not None:
        # deferred-commit: the carried accepted rows don't depend on this
        # block's compute, so they commit BEFORE the layer scan — one write
        # kernel, and the block's attention then reads them from the cache
        # prefix exactly as if kv.accept_path had compacted them (bit-
        # identical scores, same softmax column order)
        kv = kv.write(extra_kv[0], extra_kv[1], advance=False)
        kv = kv.commit(extra_kv[2])
    # flash only on real TPU: interpret-mode pallas inside lax.scan trips an
    # MLIR lowering-cache bug in this jax version; kernel semantics are
    # covered by standalone interpret tests
    use_flash = (
        cfg.use_flash_attention and prefix_override is None and nkv == nh
        and S % 128 == 0 and kv.group_width == GRP
        and S >= cfg.flash_min_seq
        # the kernel holds the whole query block in VMEM — fine for decode
        # blocks (trees <= ~64 rows, prompts <= a few hundred) but a
        # full-sequence prefill block would blow the scoped-vmem limit
        and T <= 512
        and jax.default_backend() == "tpu"
    )
    kv_quant = kv.quantized
    if use_flash:
        from ..ops.pallas.tree_attention import tree_attention

        bm_raw = (jnp.tril(jnp.ones((T, T), bool)) if block_mask is None
                  else block_mask.astype(bool))
        if bm_raw.ndim == 2:
            bm_raw = jnp.broadcast_to(bm_raw[None], (B, T, T))
        if prefix_valid is None:
            p_bias = jnp.zeros((B, S), jnp.float32)
        else:
            pv = jnp.broadcast_to(prefix_valid.astype(bool), (B, S))
            p_bias = jnp.where(pv, 0.0, NEG_INF).astype(jnp.float32)
        mask_prefix = mask_block = None
    else:
        mask_prefix, mask_block = build_mask(
            T, S, kv.length, block_mask, prefix_valid, B, prefix_override
        )
    apply_rope = (
        apply_rope_interleaved if cfg.rope_pairing == "interleaved" else apply_rope_half
    )
    scale = hd ** -0.5
    lp = params["layers"]

    # In-scan KV writes: thread the cache buffers through the layer scan and
    # dynamic_update_slice each layer's plane in place (XLA aliases carried
    # buffers inside the loop).  The post-scan write kernel costs a measured
    # ~0.6 ms/step at XL (staged aligned windows + launch) vs ~0 for the
    # carried dus.  Batched (vmapped) callers keep the post-scan stacked
    # kernel: a per-slot-start dus under vmap degrades to scatter/copies.
    from ..kv import WRITE_IN_SCAN, _batching

    if commit and not (isinstance(write_offset, int) and write_offset == 0):
        raise ValueError("forward(commit=True) requires write_offset == 0")
    inscan = (
        WRITE_IN_SCAN != "never"
        and not kv.quantized
        and not defer_block
        and not isinstance(kv.length, _batching.BatchTracer)
        and not any(isinstance(x, _batching.BatchTracer)
                    for x in (kv.k, kv.v, embeds))
    )
    w_start = kv.length + jnp.asarray(write_offset, jnp.int32)

    def layer(carry, xs):
        # k_cache/v_cache: [B, G, S, W] grouped; scales [B, G, S] or None.
        # The cache is INDEXED per layer rather than passed as scan xs:
        # scan xs must be layer-leading, and under vmap (batched serving)
        # that forces a full-buffer [R, L, ...] -> [L, R, ...] transpose of
        # the multi-GB stacked cache every step.  dynamic_index_in_dim on
        # the captured (or carried) buffer batches to a per-layer slice with
        # no transpose (verified in the lowered HLO of the batched step).
        idx, w = xs
        if inscan:
            h, kb, vb = carry
        else:
            h, kb, vb = carry, kv.k, kv.v
        k_cache = jax.lax.dynamic_index_in_dim(kb, idx, 0, keepdims=False)
        v_cache = jax.lax.dynamic_index_in_dim(vb, idx, 0, keepdims=False)
        k_sc = (None if kv.k_scale is None else
                jax.lax.dynamic_index_in_dim(kv.k_scale, idx, 0, keepdims=False))
        v_sc = (None if kv.v_scale is None else
                jax.lax.dynamic_index_in_dim(kv.v_scale, idx, 0, keepdims=False))
        # swin (post-norm) ordering: h += norm(attn(h)); h += norm(mlp(h))
        # (modeling_anole_kv.py:787-806); default is pre-norm LLaMA ordering.
        if cfg.swin_norm:
            x = h
        else:
            x = rms_norm(h, w["attn_norm"], cfg.rms_norm_eps)
            if cfg.first_layer_no_input_norm:
                # drafter layer 0 feeds the fc-fused input straight into
                # attention (cnets_llamagen.py:466-470)
                x = jnp.where(idx == 0, h, x)
        if has_kernel(w, "wqkv"):
            y = mm(x, w, "wqkv")
            q = y[..., : nh * hd].reshape(B, T, nh, hd)
            k = y[..., nh * hd: (nh + nkv) * hd].reshape(B, T, nkv, hd)
            v = y[..., (nh + nkv) * hd:].reshape(B, T, nkv, hd)
        else:
            q = mm(x, w, "wq").reshape(B, T, nh, hd)
            k = mm(x, w, "wk").reshape(B, T, nkv, hd)
            v = mm(x, w, "wv").reshape(B, T, nkv, hd)
        if cfg.qk_norm:
            q = head_layer_norm(q, w["q_norm_w"], w["q_norm_b"], cfg.norm_eps)
            k = head_layer_norm(k, w["k_norm_w"], w["k_norm_b"], cfg.norm_eps)
        q = apply_rope(q, cos, sin, positions)
        k = apply_rope(k, cos, sin, positions)
        if kv_quant:
            # the in-flight block round-trips through the cache quantizer:
            # what a token sees during its own verification forward is
            # bit-identical to what later steps read back from the int8
            # cache (keeps greedy spec lossless vs AR under KV quantization).
            # The ORIGINAL k/v are returned for the cache write, whose
            # quantize() yields exactly these dequantized values.
            k_use = ungroup_blocks(fake_quant_rows(group_blocks(k))).reshape(
                B, T, nkv, hd)
            v_use = ungroup_blocks(fake_quant_rows(group_blocks(v))).reshape(
                B, T, nkv, hd)
        else:
            k_use, v_use = k, v

        if use_flash:
            # grouped cache streams straight into the kernel — no transpose
            o = tree_attention(
                q, k_use, v_use, k_cache, v_cache, kv.length, bm_raw, p_bias,
                scale, k_scale=k_sc, v_scale=v_sc,
            ).astype(h.dtype)
        elif nkv == nh:
            # dense attention IN the grouped storage layout: the cache slice
            # is only reshape-viewed ([B,G,S,W] -> [B,G,S,pk,hd], minor-dim
            # split), never transposed — ungroup_cache's per-layer transpose
            # copied the whole live cache every layer (the dominant per-step
            # HBM cost for batched serving and ~0.5 ms/step single-request)
            fused = cfg.dense_softmax == "fused"
            if kv_quant and not fused:
                k_cache = dequant_cache(k_cache, k_sc, dtype=h.dtype)
                v_cache = dequant_cache(v_cache, v_sc, dtype=h.dtype)
            Gd, W = k_cache.shape[-3], k_cache.shape[-1]
            pk = W // hd
            k5 = k_cache.reshape(B, Gd, S, pk, hd)
            v5 = v_cache.reshape(B, Gd, S, pk, hd)
            # q and the in-flight rows are T-sized (small): transposing them
            # into [B, G, pk, T, hd] is cheap
            qg = q.reshape(B, T, Gd, pk, hd).transpose(0, 2, 3, 1, 4)
            if fused and kv_quant:
                # In-flight rows mirror the cache read math EXACTLY: scores
                # are (q . int8-values) * scale on both sides, so what a
                # token sees during its own verification forward stays
                # bit-identical to what later steps read back (the fused
                # analogue of fake_quant_rows' contract)
                from ..kv import quantize_rows as _qrows

                kq_blk, ks_blk = _qrows(group_blocks(k))       # [B,G,T,W]
                vq_blk, vs_blk = _qrows(group_blocks(v))
            else:
                kq_blk = vq_blk = ks_blk = vs_blk = None
            if fused and T <= cfg.dense_qk_mulsum_max_t:
                # mul-sum decode attention in the CACHE layout [B,G,S,pk,*]:
                # T~1 einsum "dots" lower to f32 kLoop multiply-reduce
                # fusions whose operands XLA materializes — a layout copy +
                # f32 convert of the whole per-layer KV plane (r5 HLO
                # census).  Written as elementwise-multiply + sum, the
                # storage-dtype cache read and its convert fuse into the
                # reduction; nothing cache-sized is ever rewritten.
                qf = qg.astype(jnp.float32)           # [B,G,pk,T,hd] (tiny)
                s2 = jnp.sum(
                    k5.astype(jnp.float32)[:, :, :, :, None, :]
                    * qf[:, :, None, :, :, :], axis=-1) * scale
                if kv_quant:                           # [B,G,S,pk,T]
                    s2 = s2 * k_sc[:, :, :, None, None]
                s2 = s2 + mask_prefix[:, 0].transpose(0, 2, 1)[:, None, :,
                                                               None, :]
                if kv_quant:
                    ku_s = kq_blk.reshape(B, Gd, T, pk, hd)
                    vu_s = vq_blk.reshape(B, Gd, T, pk, hd)
                else:
                    ku_s = k_use.reshape(B, T, Gd, pk, hd).transpose(
                        0, 2, 1, 3, 4)
                    vu_s = v_use.reshape(B, T, Gd, pk, hd).transpose(
                        0, 2, 1, 3, 4)
                sb = jnp.sum(
                    ku_s.astype(jnp.float32)[:, :, :, :, None, :]
                    * qf[:, :, None, :, :, :], axis=-1) * scale
                if kv_quant:                           # [B,G,U,pk,T]
                    sb = sb * ks_blk[:, :, :, None, None]
                mb = jnp.broadcast_to(mask_block, (B, 1, T, T))
                sb = sb + mb[:, 0].transpose(0, 2, 1)[:, None, :, None, :]
                m = jnp.maximum(s2.max(axis=2), sb.max(axis=2))  # [B,G,pk,T]
                e2 = jnp.exp(s2 - m[:, :, None])
                eb = jnp.exp(sb - m[:, :, None])
                den = e2.sum(axis=2) + eb.sum(axis=2)
                if kv_quant:
                    e2 = e2 * v_sc[:, :, :, None, None]
                    eb = eb * vs_blk[:, :, :, None, None]
                o = jnp.sum(e2[..., None]
                            * v5.astype(jnp.float32)[:, :, :, :, None, :],
                            axis=2)
                o = o + jnp.sum(eb[..., None]
                                * vu_s.astype(jnp.float32)[:, :, :, :,
                                                           None, :],
                                axis=2)                # [B,G,pk,T,hd]
                o = o / jnp.maximum(den, 1e-30)[..., None]
            else:
                if fused and kv_quant:
                    ku = kq_blk.astype(h.dtype).reshape(
                        B, Gd, T, pk, hd).transpose(0, 1, 3, 2, 4)
                    vu = vq_blk.astype(h.dtype).reshape(
                        B, Gd, T, pk, hd).transpose(0, 1, 3, 2, 4)
                else:
                    ku = k_use.reshape(B, T, Gd, pk, hd).transpose(
                        0, 2, 3, 1, 4)
                    vu = v_use.reshape(B, T, Gd, pk, hd).transpose(
                        0, 2, 3, 1, 4)
                s_pre = jnp.einsum(
                    "bgptd,bgspd->bgpts",
                    qg, (k5.astype(h.dtype) if fused and kv_quant else k5),
                    preferred_element_type=jnp.float32,
                ) * scale
                if fused and kv_quant:
                    # per-(G,S)-row int8 scale factors OUT of the head_dim
                    # contraction: scores scale along the key axis, so the
                    # dequantized cache never hits HBM
                    s_pre = s_pre * k_sc[:, :, None, None, :]
                s_pre = s_pre + mask_prefix[:, None]
                s_blk = jnp.einsum(
                    "bgptd,bgpud->bgptu", qg, ku,
                    preferred_element_type=jnp.float32,
                ) * scale
                if fused and kv_quant:
                    s_blk = s_blk * ks_blk[:, :, None, None, :]
                s_blk = s_blk + mask_block[:, None]
                if fused:
                    # two-part streaming softmax: no [.., S+T] concat copy;
                    # the unnormalized exp() weights go into the AV matmuls
                    # in the model dtype (they are <= 1 by the max-shift)
                    # and the normalizing divide happens ONCE at the end
                    m = jnp.maximum(s_pre.max(-1), s_blk.max(-1))[..., None]
                    e_pre = jnp.exp(s_pre - m)
                    e_blk = jnp.exp(s_blk - m)
                    den = e_pre.sum(-1) + e_blk.sum(-1)      # [B,G,pk,T]
                    if kv_quant:
                        # v_scale rides the contracted key axis: fold it
                        # into the exp weights, never dequantize the V cache
                        ep = (e_pre * v_sc[:, :, None, None, :]).astype(
                            h.dtype)
                        eb = (e_blk * vs_blk[:, :, None, None, :]).astype(
                            h.dtype)
                        vv = v5.astype(h.dtype)
                    else:
                        ep = e_pre.astype(h.dtype)
                        eb = e_blk.astype(h.dtype)
                        vv = v5
                    o = jnp.einsum("bgpts,bgspd->bgptd", ep, vv,
                                   preferred_element_type=jnp.float32)
                    o = o + jnp.einsum("bgptu,bgpud->bgptd", eb, vu,
                                       preferred_element_type=jnp.float32)
                    o = o / jnp.maximum(den, 1e-30)[..., None]
                else:
                    s = jnp.concatenate([s_pre, s_blk], axis=-1)
                    p = jax.nn.softmax(s, axis=-1)
                    p_pre, p_blk = p[..., :S], p[..., S:]
                    o = jnp.einsum("bgpts,bgspd->bgptd", p_pre,
                                   v5.astype(jnp.float32))
                    o = o + jnp.einsum("bgptu,bgpud->bgptd", p_blk,
                                       vu.astype(jnp.float32))
            o = o.transpose(0, 3, 1, 2, 4).reshape(B, T, nh, hd).astype(h.dtype)
        else:
            if kv_quant:
                k_cache = dequant_cache(k_cache, k_sc, dtype=h.dtype)
                v_cache = dequant_cache(v_cache, v_sc, dtype=h.dtype)
            k_cache_u = ungroup_cache(k_cache, nkv, hd)   # [B, S, nkv, hd]
            v_cache_u = ungroup_cache(v_cache, nkv, hd)
            rep = nh // nkv
            k_cache_h = jnp.repeat(k_cache_u, rep, axis=2)
            v_cache_h = jnp.repeat(v_cache_u, rep, axis=2)
            k_h = jnp.repeat(k_use, rep, axis=2)
            v_h = jnp.repeat(v_use, rep, axis=2)

            s_pre = jnp.einsum(
                "btnh,bsnh->bnts", q, k_cache_h, preferred_element_type=jnp.float32
            ) * scale + mask_prefix
            s_blk = jnp.einsum(
                "btnh,bunh->bntu", q, k_h, preferred_element_type=jnp.float32
            ) * scale + mask_block
            s = jnp.concatenate([s_pre, s_blk], axis=-1)
            p = jax.nn.softmax(s, axis=-1)
            p_pre, p_blk = p[..., :S], p[..., S:]
            o = jnp.einsum("bnts,bsnh->btnh", p_pre, v_cache_h.astype(jnp.float32))
            o = o + jnp.einsum("bntu,bunh->btnh", p_blk, v_h.astype(jnp.float32))
            o = o.astype(h.dtype)
        attn_out = mm(o.reshape(B, T, nh * hd), w, "wo")

        if cfg.swin_norm:
            h1 = h + rms_norm(attn_out, w["attn_norm"], cfg.rms_norm_eps)
            mlp_in = h1
        else:
            h1 = h + attn_out
            mlp_in = rms_norm(h1, w["ffn_norm"], cfg.rms_norm_eps)
        if has_kernel(w, "w_gu"):
            gu = mm(mlp_in, w, "w_gu")
            I = gu.shape[-1] // 2
            mlp = mm(jax.nn.silu(gu[..., :I]) * gu[..., I:], w, "w_down")
        else:
            mlp = mm(jax.nn.silu(mm(mlp_in, w, "w_gate")) * mm(mlp_in, w, "w_up"),
                     w, "w_down")
        if cfg.swin_norm:
            mlp = rms_norm(mlp, w["ffn_norm"], cfg.rms_norm_eps)
        h2 = h1 + mlp
        if inscan:
            z = jnp.zeros((), jnp.int32)
            kg = group_blocks(k).astype(kb.dtype)[None]   # [1, B, G, T, W]
            vg = group_blocks(v).astype(vb.dtype)[None]
            kb = jax.lax.dynamic_update_slice(kb, kg, (idx, z, z, w_start, z))
            vb = jax.lax.dynamic_update_slice(vb, vg, (idx, z, z, w_start, z))
            return (h2, kb, vb), None
        return h2, (k, v)

    block = None
    if inscan:
        (hidden, k_buf, v_buf), _ = jax.lax.scan(
            layer, (embeds, kv.k, kv.v),
            (jnp.arange(cfg.num_layers), lp),
            unroll=min(cfg.scan_unroll, cfg.num_layers),
        )
        T_new = embeds.shape[1]
        kv = dataclasses.replace(
            kv, k=k_buf, v=v_buf,
            length=kv.length + (T_new if commit else 0))
    else:
        hidden, (k_new, v_new) = jax.lax.scan(
            layer, embeds,
            (jnp.arange(cfg.num_layers), lp),
            unroll=min(cfg.scan_unroll, cfg.num_layers),
        )
        if defer_block:
            block = (k_new, v_new)
        else:
            kv = kv.write(k_new, v_new, advance=commit, offset=write_offset)
    if cfg.final_norm:
        hidden = rms_norm(hidden, params["norm"], cfg.rms_norm_eps)
    return ForwardResult(hidden=hidden, kv=kv, block=block)


def train_mask(T: int, attn_valid: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Additive [B or 1, 1, T, T] causal (+padding) mask for training."""
    causal = jnp.tril(jnp.ones((T, T), bool))[None]
    if attn_valid is not None:
        causal = causal & attn_valid[:, None, :].astype(bool)
    return jnp.where(causal, 0.0, NEG_INF).astype(jnp.float32)[:, None]


def train_layer_block(
    layers: dict,                 # layer-stacked weights [Ls, ...]
    cfg: ModelConfig,
    x: jnp.ndarray,               # [B, T, H]
    positions: jnp.ndarray,       # [B or 1, T] (already clipped)
    rope,
    mask: jnp.ndarray,            # additive [B or 1, 1, T, T]
    idx0=0,                       # global index of this block's first layer
    remat: bool = True,
) -> jnp.ndarray:
    """Scan a (slice of the) layer stack over ``x`` — the cache-free training
    block shared by ``forward_train`` and the pipeline-parallel stages
    (parallel/pipeline.py), which apply it to consecutive layer slices with
    the right global ``idx0`` (layer 0 skips the input norm on drafters)."""
    B, T, H = x.shape
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    cos, sin = rope
    apply_rope = (
        apply_rope_interleaved if cfg.rope_pairing == "interleaved" else apply_rope_half
    )
    scale = hd ** -0.5
    n_here = jax.tree.leaves(layers)[0].shape[0]

    def layer(h, xs):
        idx, w = xs
        if cfg.swin_norm:
            x = h
        else:
            x = rms_norm(h, w["attn_norm"], cfg.rms_norm_eps)
            if cfg.first_layer_no_input_norm:
                x = jnp.where(idx == 0, h, x)
        if "wqkv" in w:
            y = x @ w["wqkv"]
            q = y[..., : nh * hd].reshape(B, T, nh, hd)
            k = y[..., nh * hd: (nh + nkv) * hd].reshape(B, T, nkv, hd)
            v = y[..., (nh + nkv) * hd:].reshape(B, T, nkv, hd)
        else:
            q = (x @ w["wq"]).reshape(B, T, nh, hd)
            k = (x @ w["wk"]).reshape(B, T, nkv, hd)
            v = (x @ w["wv"]).reshape(B, T, nkv, hd)
        if cfg.qk_norm:
            q = head_layer_norm(q, w["q_norm_w"], w["q_norm_b"], cfg.norm_eps)
            k = head_layer_norm(k, w["k_norm_w"], w["k_norm_b"], cfg.norm_eps)
        q = apply_rope(q, cos, sin, positions)
        k = apply_rope(k, cos, sin, positions)
        if nkv != nh:
            rep = nh // nkv
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        s = jnp.einsum("btnh,bunh->bntu", q, k,
                       preferred_element_type=jnp.float32) * scale + mask
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bntu,bunh->btnh", p, v.astype(jnp.float32))
        attn_out = (o.astype(h.dtype).reshape(B, T, nh * hd)) @ w["wo"]
        if cfg.swin_norm:
            h1 = h + rms_norm(attn_out, w["attn_norm"], cfg.rms_norm_eps)
            mlp_in = h1
        else:
            h1 = h + attn_out
            mlp_in = rms_norm(h1, w["ffn_norm"], cfg.rms_norm_eps)
        if "w_gu" in w:
            gu = mlp_in @ w["w_gu"]
            I = gu.shape[-1] // 2
            mlp = (jax.nn.silu(gu[..., :I]) * gu[..., I:]) @ w["w_down"]
        else:
            mlp = (jax.nn.silu(mlp_in @ w["w_gate"]) * (mlp_in @ w["w_up"])) @ w["w_down"]
        if cfg.swin_norm:
            mlp = rms_norm(mlp, w["ffn_norm"], cfg.rms_norm_eps)
        return h1 + mlp, None

    body = jax.checkpoint(layer) if remat else layer
    out, _ = jax.lax.scan(
        body, x, (idx0 + jnp.arange(n_here), layers)
    )
    return out


def forward_train(
    params: dict,
    cfg: ModelConfig,
    embeds: jnp.ndarray,          # [B, T, H]
    positions: jnp.ndarray,       # [T] or [B, T]
    rope,
    attn_valid: Optional[jnp.ndarray] = None,   # [B, T] padding mask
    remat: bool = True,
) -> jnp.ndarray:
    """Cache-free causal forward for training (full-model finetuning /
    teacher-forced distillation).  Rematerializes each layer under grad
    (``jax.checkpoint``) to trade FLOPs for HBM, the TPU analog of the
    reference's FSDP gradient-checkpointing wrap policy
    (xllmx/solvers/finetune/finetune.py:375-417)."""
    T = embeds.shape[1]
    cos, _ = rope
    if positions.ndim == 1:
        positions = positions[None, :]
    positions = jnp.clip(positions, 0, cos.shape[0] - 1)
    mask = train_mask(T, attn_valid)
    hidden = train_layer_block(
        params["layers"], cfg, embeds, positions, rope, mask, remat=remat
    )
    if cfg.final_norm:
        hidden = rms_norm(hidden, params["norm"], cfg.rms_norm_eps)
    return hidden
