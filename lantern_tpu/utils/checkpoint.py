"""Checkpoint IO: HF/torch checkpoints -> parameter pytrees, and native
orbax save/restore.

Torch-side mappings follow the reference module names so published LANTERN /
LlamaGen / drafter checkpoints load directly:
- base LlamaGen (kv_variants/modeling_llamagen_kv.py): ``model.embed_tokens``,
  ``model.layers.N.{self_attn.{q,k,v,o}_proj, mlp.{gate,up,down}_proj,
  input_layernorm, post_attention_layernorm}``, ``model.norm``, ``lm_head``,
  ``model.cls_embedding.*``.
- EAGLE drafter (cnets_llamagen.py): ``embed_tokens``, ``fc``, ``layers.0...``.

Kernels transpose once on the host to our [in, out] convention.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import DrafterConfig, ModelConfig


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Load a .safetensors or torch .bin/.pt/.ckpt file into numpy arrays."""
    if path.endswith(".safetensors"):
        # framework="pt": published Chameleon/Lumina checkpoints are bf16,
        # which safetensors' numpy framework cannot decode
        from safetensors import safe_open

        import torch

        out = {}
        with safe_open(path, framework="pt") as f:
            for k in f.keys():
                t = f.get_tensor(k)
                out[k] = (t.float().numpy()
                          if t.dtype == torch.bfloat16 else t.numpy())
        return out
    import torch

    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # Lightning-style ckpts (taming VQGAN) carry non-tensor metadata
        # that weights_only rejects
        sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict):
        for wrapper in ("model", "state_dict"):
            if wrapper in sd and isinstance(sd[wrapper], dict):
                sd = sd[wrapper]
                break
    out = {}
    for k, v in sd.items():
        if hasattr(v, "numpy"):
            out[k] = v.float().numpy()
        elif isinstance(v, (np.ndarray, int, float, list, tuple)):
            out[k] = np.asarray(v)
        # else: non-tensor metadata (Lightning hyper_parameters etc.) dropped
    return out


def load_torch_dir(path: str) -> Dict[str, np.ndarray]:
    """Load a HF model dir (sharded or single safetensors / pytorch_model)."""
    if os.path.isfile(path):
        return load_torch_file(path)
    for index in ("model.safetensors.index.json",
                  "pytorch_model.bin.index.json"):
        ip = os.path.join(path, index)
        if os.path.exists(ip):
            with open(ip) as f:
                weight_map = json.load(f)["weight_map"]
            out = {}
            for shard in sorted(set(weight_map.values())):
                out.update(load_torch_file(os.path.join(path, shard)))
            return out
    for name in ("model.safetensors", "pytorch_model.bin"):
        p = os.path.join(path, name)
        if os.path.exists(p):
            return load_torch_file(p)
    raise FileNotFoundError(f"no checkpoint found under {path}")


def _stack_layers(sd, fmt: str, L: int, transpose: bool) -> jnp.ndarray:
    ws = [sd[fmt.format(l)] for l in range(L)]
    if transpose:
        ws = [np.ascontiguousarray(w.T) for w in ws]
    return jnp.asarray(np.stack(ws))


def llamagen_params_from_torch(
    sd: Dict[str, np.ndarray], cfg: ModelConfig, prefix: str = "model.",
    dtype=None,
) -> dict:
    """Reference kv_variants LlamaForCausalLM state dict -> params pytree."""
    dt = dtype or cfg.jnp_dtype
    L = cfg.num_layers
    p = prefix

    def S(fmt, transpose=False):
        return _stack_layers(sd, p + fmt, L, transpose).astype(dt)

    layers = {
        "attn_norm": S("layers.{}.input_layernorm.weight"),
        "wq": S("layers.{}.self_attn.q_proj.weight", True),
        "wk": S("layers.{}.self_attn.k_proj.weight", True),
        "wv": S("layers.{}.self_attn.v_proj.weight", True),
        "wo": S("layers.{}.self_attn.o_proj.weight", True),
        "ffn_norm": S("layers.{}.post_attention_layernorm.weight"),
        "w_gate": S("layers.{}.mlp.gate_proj.weight", True),
        "w_up": S("layers.{}.mlp.up_proj.weight", True),
        "w_down": S("layers.{}.mlp.down_proj.weight", True),
    }
    params = {
        "embed": jnp.asarray(sd[p + "embed_tokens.weight"]).astype(dt),
        "layers": layers,
        "norm": jnp.asarray(sd[p + "norm.weight"]).astype(dt),
        "lm_head": jnp.asarray(sd["lm_head.weight"].T).astype(dt),
    }
    if cfg.cond_kind == "label":
        params["cond"] = {
            "table": jnp.asarray(sd[p + "cls_embedding.embedding_table.weight"]).astype(dt)
        }
    elif cfg.cond_kind == "caption":
        params["cond"] = {
            "fc1": jnp.asarray(sd[p + "cls_embedding.cap_proj.fc1.weight"].T).astype(dt),
            "fc2": jnp.asarray(sd[p + "cls_embedding.cap_proj.fc2.weight"].T).astype(dt),
            "uncond": jnp.asarray(sd[p + "cls_embedding.uncond_embedding"]).astype(dt),
        }
    return params


def chameleon_params_from_torch(
    sd: Dict[str, np.ndarray], cfg: ModelConfig, prefix: str = "model.",
    dtype=None,
) -> dict:
    """HF ChameleonForConditionalGeneration state dict -> params pytree.

    Covers Anole-7b and Lumina-mGPT kv_variants (modeling_anole_kv.py:1598,
    modeling_lumina_mgpt_kv.py:1553): LLaMA layout plus per-head QK-norm
    (``self_attn.q_norm/k_norm`` with weight+bias, ChameleonLayerNorm —
    modeling_anole_kv.py:274-291).  Lumina checkpoints store QK-norm params
    repeated ``model_parallel_size`` times over a leading MP axis
    (modeling_lumina_mgpt_kv.py:292-315); rank-0's slice is the canonical
    copy and is reshaped to [heads, head_dim].
    """
    dt = dtype or cfg.jnp_dtype
    L, nh, nkv, hd = cfg.num_layers, cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    p = prefix

    def S(fmt, transpose=False):
        return _stack_layers(sd, p + fmt, L, transpose).astype(dt)

    def qknorm(fmt, heads):
        ws = []
        for l in range(L):
            w = np.asarray(sd[p + fmt.format(l)]).reshape(-1, hd)
            if w.shape[0] < heads:
                # Lumina stores one row per MP shard; each shard's gamma/beta
                # is repeat-interleaved over its heads (lumina_mgpt_kv.py:308)
                if heads % w.shape[0]:
                    raise ValueError(
                        f"{fmt.format(l)}: {w.shape[0]} stored rows don't "
                        f"tile {heads} heads")
                w = np.repeat(w, heads // w.shape[0], axis=0)
            ws.append(w[:heads])
        return jnp.asarray(np.stack(ws)).astype(dt)

    layers = {
        "attn_norm": S("layers.{}.input_layernorm.weight"),
        "wq": S("layers.{}.self_attn.q_proj.weight", True),
        "wk": S("layers.{}.self_attn.k_proj.weight", True),
        "wv": S("layers.{}.self_attn.v_proj.weight", True),
        "wo": S("layers.{}.self_attn.o_proj.weight", True),
        "ffn_norm": S("layers.{}.post_attention_layernorm.weight"),
        "w_gate": S("layers.{}.mlp.gate_proj.weight", True),
        "w_up": S("layers.{}.mlp.up_proj.weight", True),
        "w_down": S("layers.{}.mlp.down_proj.weight", True),
    }
    if cfg.qk_norm:
        layers["q_norm_w"] = qknorm("layers.{}.self_attn.q_norm.weight", nh)
        layers["q_norm_b"] = qknorm("layers.{}.self_attn.q_norm.bias", nh)
        layers["k_norm_w"] = qknorm("layers.{}.self_attn.k_norm.weight", nkv)
        layers["k_norm_b"] = qknorm("layers.{}.self_attn.k_norm.bias", nkv)
    return {
        "embed": jnp.asarray(sd[p + "embed_tokens.weight"]).astype(dt),
        "layers": layers,
        "norm": jnp.asarray(sd[p + "norm.weight"]).astype(dt),
        "lm_head": jnp.asarray(sd["lm_head.weight"].T).astype(dt),
    }


def drafter_params_from_torch(
    sd: Dict[str, np.ndarray], dcfg: DrafterConfig,
    embed: Optional[jnp.ndarray] = None, dtype=None,
) -> dict:
    """Reference cnets drafter state dict -> drafter params pytree.  ``embed``
    overrides the checkpoint's (frozen, base-copied) embedding if given."""
    m = dcfg.model
    dt = dtype or m.jnp_dtype
    L = m.num_layers

    def S(fmt, transpose=False):
        return _stack_layers(sd, fmt, L, transpose).astype(dt)

    layers = {
        # layer 0 has no input_layernorm in the drafter; keep a unit row so
        # the stacked scan shape is uniform (it is skipped at index 0)
        "attn_norm": jnp.stack(
            [jnp.asarray(sd[f"layers.{l}.input_layernorm.weight"]).astype(dt)
             if f"layers.{l}.input_layernorm.weight" in sd
             else jnp.ones((m.hidden_size,), dt)
             for l in range(L)]
        ),
        "wq": S("layers.{}.self_attn.q_proj.weight", True),
        "wk": S("layers.{}.self_attn.k_proj.weight", True),
        "wv": S("layers.{}.self_attn.v_proj.weight", True),
        "wo": S("layers.{}.self_attn.o_proj.weight", True),
        "ffn_norm": S("layers.{}.post_attention_layernorm.weight"),
        "w_gate": S("layers.{}.mlp.gate_proj.weight", True),
        "w_up": S("layers.{}.mlp.up_proj.weight", True),
        "w_down": S("layers.{}.mlp.down_proj.weight", True),
    }
    if m.qk_norm:
        # Chameleon-family drafters carry per-head QK-norm
        # (cnets_anole.py:363-364); params stored [heads, head_dim]
        hd = m.head_dim

        def QN(fmt, heads):
            return jnp.asarray(np.stack([
                np.asarray(sd[fmt.format(l)]).reshape(-1, hd)[:heads]
                for l in range(L)
            ])).astype(dt)

        layers["q_norm_w"] = QN("layers.{}.self_attn.q_norm.weight", m.num_heads)
        layers["q_norm_b"] = QN("layers.{}.self_attn.q_norm.bias", m.num_heads)
        layers["k_norm_w"] = QN("layers.{}.self_attn.k_norm.weight", m.num_kv_heads)
        layers["k_norm_b"] = QN("layers.{}.self_attn.k_norm.bias", m.num_kv_heads)
    params = {
        "layers": layers,
        "fc_w": jnp.asarray(sd["fc.weight"].T).astype(dt),
        "fc_b": (jnp.asarray(sd["fc.bias"]).astype(dt) if "fc.bias" in sd
                 else jnp.zeros((m.hidden_size,), dt)),
        "embed": (embed if embed is not None
                  else jnp.asarray(sd["embed_tokens.weight"]).astype(dt)),
    }
    return params


# ---------------------------------------------------------------------------
# native checkpoints (orbax)
# ---------------------------------------------------------------------------

def save_pytree(path: str, tree) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree)
    ckptr.wait_until_finished()


def restore_pytree(path: str, like=None):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(os.path.abspath(path), target=like)
    return ckptr.restore(os.path.abspath(path))
