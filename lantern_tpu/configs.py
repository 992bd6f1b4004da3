"""Model configuration for the unified decoder.

One parameterized decoder covers all three reference families (SURVEY.md §2.3):

- **LlamaGen** (kv_variants/modeling_llamagen_kv.py): LLaMA blocks, 2-D RoPE
  over the image grid with interleaved pairing, class-label (c2i) or
  T5-caption (t2i) conditioning prefix, vocab 16384.
- **Anole / Chameleon** (modeling_anole_kv.py): 1-D RoPE (half pairing),
  per-head QK-LayerNorm, token prompts, vocab 65536.
- **Lumina-mGPT** (modeling_lumina_mgpt_kv.py): Chameleon + optional swin-norm
  (post-norm) layer ordering and flexible resolution.

Configs are frozen dataclasses (hashable -> usable as jit static args).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    # transformer dims
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    rms_norm_eps: float = 1e-5
    attention_bias: bool = False

    # rope
    rope_kind: str = "1d"          # "1d" (Chameleon) | "2d" (LlamaGen image grid)
    rope_pairing: str = "half"     # "half" (rotate-half) | "interleaved" (adjacent pairs)
    rope_base: float = 10000.0
    block_size: int = 0            # image tokens (grid_size**2); 2-D rope only

    # conditioning prefix
    cond_kind: str = "none"        # "none" | "label" (c2i) | "caption" (t2i)
    cls_token_num: int = 0         # conditioning prefix length (120 t2i, 1 c2i)
    caption_dim: int = 0           # T5 feature dim (t2i)
    num_classes: int = 0           # label classes (c2i); +1 row for uncond

    # chameleon extras
    qk_norm: bool = False          # per-head LayerNorm on q/k
    swin_norm: bool = False        # post-norm residual ordering
    norm_eps: float = 1e-5         # LayerNorm eps for qk_norm

    # EAGLE-drafter structural quirks (cnets_llamagen.py:428-470)
    first_layer_no_input_norm: bool = False  # drafter layer 0 skips input norm
    final_norm: bool = True                  # drafter has no final RMSNorm

    # attention implementation: Pallas flash tree-attention streams only the
    # live KV prefix from HBM (ops/pallas/tree_attention.py); dense attends
    # over the whole static cache with masks.  The drafter's multi-block
    # provisional masks always use the dense path.
    # pallas flash tree-attention on TPU (ops/pallas/tree_attention.py);
    # forward() falls back to the dense path off-TPU or when the geometry
    # doesn't fit the kernel (GQA, non-128 group width, custom visibility)
    use_flash_attention: bool = True
    # dense attention over a short static cache beats the flash kernel's
    # per-layer launch cost (measured on v5e at XL geometry: ~-0.3 ms/step at
    # S=512); flash pays off once the cache is long enough that streaming
    # only the live prefix matters (Lumina's 2.4K-token images)
    flash_min_seq: int = 1024
    # Dense-attention softmax plumbing (the nh == nkv grouped-layout path).
    # "fused": two-part streaming softmax — prefix and block scores are never
    # concatenated; unnormalized exp() weights are cast to the model dtype and
    # fed straight into the AV matmuls, with ONE divide after the dot; int8 KV
    # scales factor OUT of the dots (k_scale multiplies scores over the key
    # axis, v_scale folds into the exp weights over the contracted axis), so
    # the dequantized [B,G,S,W] cache is never materialized in HBM.
    # "concat": the r4 path (jax.nn.softmax over the concatenated [.., S+T]
    # scores against a dequantized cache) — kept for A/B and bit-exact
    # comparison against old goldens.
    dense_softmax: str = "fused"
    # Decode-block attention contraction strategy on the fused dense path.
    # For T <= this bound the QK/AV contractions are written as
    # elementwise-multiply + sum in the CACHE's [B,G,S,pk,hd] layout instead
    # of einsum: XLA lowers the T~1 "dots" to f32 kLoop multiply-reduce
    # fusions whose operands it materializes — a layout copy + f32 convert
    # of the ENTIRE per-layer KV plane (~26 MB/layer at XL, the dominant AR
    # forward overhead; r5 HLO census, scripts/count_hlo_ops.py).  The
    # mul-sum form keeps the cache read in storage dtype with the convert
    # fused into the reduce.  0 disables (always einsum).
    dense_qk_mulsum_max_t: int = 0
    # lax.scan unroll over the layer stack.  Measured DEAD END on v5e
    # (scripts/probe_unroll.py, PERF.md r4 table): unroll 2/4/6 all SLOW the
    # XL decode forwards 20-45% vs unroll=1 — XLA already pipelines the scan
    # body, and the bigger program only costs.  Keep 1 for every size; the
    # remaining latency-vs-stream-floor gap is per-layer op count.
    scan_unroll: int = 1

    # budget
    max_seq_len: int = 2048

    dtype: str = "bfloat16"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def grid_size(self) -> int:
        g = int(round(self.block_size ** 0.5))
        if g * g != self.block_size:
            raise ValueError(f"block_size {self.block_size} not a perfect square")
        return g

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class DrafterConfig:
    """EAGLE drafter: a 1-layer (configurable) decoder whose input is
    fc([token_embed, base_hidden]) (reference: cnets_llamagen.py:680).
    The decoder geometry mirrors the base model's block shape."""

    model: ModelConfig
    fc_bias: bool = True
    # draft budgets (dynamic EAGLE-2 drafting)
    total_tokens: int = 59         # verified tree nodes (incl. committed root)
    depth: int = 4                 # beam expansion steps
    top_k: int = 10


def _ffn_dim(hidden: int, multiple_of: int = 256) -> int:
    inner = int(2 * (4 * hidden) / 3)
    return multiple_of * ((inner + multiple_of - 1) // multiple_of)


# ---------------------------------------------------------------------------
# Presets. Decoder geometries follow the LlamaGen paper (GPT-B/L/XL/XXL/3B)
# and the reference drafter configs (/root/reference/data/configs/*.json).
# ---------------------------------------------------------------------------

def llamagen_config(
    size: str = "B",
    task: str = "c2i",
    image_tokens: int = 256,
    max_extra: int = 74,
) -> ModelConfig:
    """LlamaGen family.  task 'c2i': 1-token class label prefix; 't2i': 120
    T5 caption tokens.  ``image_tokens`` = generated VQ tokens (256 for 256px
    f16, 576 for 384px, 1024 for 512px)."""
    dims = {
        "nano": (2, 4, 64),        # CPU smoke tests only
        "B": (12, 12, 768),
        "L": (24, 16, 1024),
        "XL": (36, 20, 1280),
        "XXL": (48, 24, 1536),
        "3B": (24, 32, 3200),
    }
    n_layer, n_head, dim = dims[size]
    if task == "c2i":
        cond = dict(cond_kind="label", cls_token_num=1, num_classes=1000)
    elif task == "t2i":
        cond = dict(cond_kind="caption", cls_token_num=120, caption_dim=2048)
    else:
        raise ValueError(task)
    return ModelConfig(
        vocab_size=16384,
        hidden_size=dim,
        intermediate_size=_ffn_dim(dim),
        num_layers=n_layer,
        num_heads=n_head,
        num_kv_heads=n_head,
        rope_kind="2d",
        rope_pairing="interleaved",
        block_size=image_tokens,
        max_seq_len=cond["cls_token_num"] + image_tokens + max_extra,
        # measured r5 (scripts/probe_xl_fwd.py): mul-sum decode attention
        # cuts the XL AR forward 2.476 -> 2.114 ms within-run (-15%) by
        # keeping the per-layer KV plane reads in storage dtype
        dense_qk_mulsum_max_t=4,
        **cond,
    )


def chameleon_7b_config(max_seq_len: int = 4096, swin_norm: bool = False) -> ModelConfig:
    """Anole-7B / Lumina-mGPT-7B share the Chameleon-7B geometry
    (modeling_anole_kv.py / configuration_anole.py): 32L x 4096h x 32 heads,
    QK-norm, vocab 65536."""
    return ModelConfig(
        vocab_size=65536,
        hidden_size=4096,
        intermediate_size=11008,
        num_layers=32,
        num_heads=32,
        num_kv_heads=32,
        rope_kind="1d",
        rope_pairing="half",
        cond_kind="none",
        qk_norm=True,
        swin_norm=swin_norm,
        max_seq_len=max_seq_len,
    )


def tiny_config(
    vocab_size: int = 256,
    hidden_size: int = 64,
    num_layers: int = 2,
    num_heads: int = 4,
    rope_kind: str = "2d",
    cond_kind: str = "label",
    block_size: int = 16,
    qk_norm: bool = False,
    **kw,
) -> ModelConfig:
    """Small CPU-runnable config for tests."""
    cond = {
        "label": dict(cls_token_num=1, num_classes=10),
        "caption": dict(cls_token_num=8, caption_dim=32),
        "none": dict(),
    }[cond_kind]
    pairing = "interleaved" if rope_kind == "2d" else "half"
    kw.setdefault("max_seq_len", 96)
    kw.setdefault("dtype", "float32")
    return ModelConfig(
        vocab_size=vocab_size,
        hidden_size=hidden_size,
        intermediate_size=_ffn_dim(hidden_size, 32),
        num_layers=num_layers,
        num_heads=num_heads,
        num_kv_heads=num_heads,
        rope_kind=rope_kind,
        rope_pairing=pairing,
        block_size=block_size if rope_kind == "2d" else 0,
        cond_kind=cond_kind,
        qk_norm=qk_norm,
        # kw overrides cond-derived defaults (double-splat would TypeError
        # on e.g. tiny_config(cond_kind="label", num_classes=20))
        **{**cond, **kw},
    )


def drafter_config(base: ModelConfig, num_layers: int = 1, **kw) -> DrafterConfig:
    """Drafter mirroring a base model's block geometry (reference drafter
    JSONs are 1-hidden-layer copies of the base config).  The drafter's
    2-D RoPE prefix is one shorter than the base's (its inputs are the
    base's tokens shifted left by one, cnets_llamagen.py:562-574).

    Layer-0 input-norm skip is a LlamaGen-drafter quirk
    (cnets_llamagen.py:466-470); the Chameleon-family drafters normalize
    every layer (cnets_anole.py:505-549, cnets_lumina_mgpt.py equivalent) —
    derived here from the base's conditioning kind."""
    m = base.replace(
        num_layers=num_layers,
        cls_token_num=max(base.cls_token_num - 1, 0),
        first_layer_no_input_norm=base.cond_kind != "none",
        final_norm=False,
        cond_kind="none",
        # every reference drafter layer is pre-norm (cnets_* hardcode the
        # LLaMA residual ordering) even when the base model is swin-norm
        swin_norm=False,
        # mul-sum decode attention is a BASE-model AR-path optimization; the
        # drafter's per-level forwards are tiny either way, and switching
        # their contraction order shifts proposal numerics against trees
        # calibrated under the einsum drafter (r5: XL lantern compression
        # moved 2.51 -> 2.35 when the drafter levels picked up mul-sum)
        dense_qk_mulsum_max_t=0,
    )
    return DrafterConfig(model=m, **kw)
