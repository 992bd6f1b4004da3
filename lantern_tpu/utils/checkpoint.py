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


def meta_chameleon_to_hf(shards, num_layers: int, n_heads: int, dim: int,
                         n_kv_heads: int = None) -> Dict[str, np.ndarray]:
    """Original-Meta Chameleon ``consolidated.*.pth`` shard dict(s) -> the
    HF-layout state dict ``chameleon_params_from_torch`` consumes.

    Faithful to the reference converter
    (models/base_models/lumina_mgpt/chameleon/
    convert_chameleon_weights_to_hf.py:81-300): q/k get the sliced-rotary
    permute (interleaved Meta RoPE -> HF half pairing, ibid:140-141), MLP
    w1/w2/w3 map to gate/down/up, and multi-shard tensors concatenate on
    the same axes — including the quirky MP-replicated QK-norm layout that
    ``chameleon_params_from_torch`` already undoes.
    """
    if isinstance(shards, dict):
        shards = [shards]
    ns = len(shards)
    n_kv = n_kv_heads or n_heads
    hd = dim // n_heads

    def permute(w, heads, dim1=dim, dim2=dim):
        w = np.asarray(w).reshape(heads, dim1 // heads // 2, 2, dim2)
        return w.transpose(0, 2, 1, 3).reshape(dim1, dim2)

    def cat(key, axis):
        return np.concatenate([np.asarray(s[key]) for s in shards], axis=axis)

    out: Dict[str, np.ndarray] = {}
    for li in range(num_layers):
        P = f"layers.{li}."
        O = f"model.layers.{li}."
        wq = cat(P + "attention.wq.weight", 0)
        wk = cat(P + "attention.wk.weight", 0)
        out[O + "self_attn.q_proj.weight"] = permute(wq, n_heads)
        out[O + "self_attn.k_proj.weight"] = permute(
            wk, n_kv, dim1=hd * n_kv)
        out[O + "self_attn.v_proj.weight"] = cat(P + "attention.wv.weight", 0)
        out[O + "self_attn.o_proj.weight"] = cat(P + "attention.wo.weight", 1)
        # QK-norm: each shard's [hd] gamma/beta gets the same interleaved->
        # sliced permute as wq/wk (converter:171-195 unsharded
        # .view(hd//2,2).t(), 239-256 sharded .view(ns,hd//2,2)
        # .transpose(1,2)) so it applies to the permuted head_dim layout,
        # then shards concatenate into the MP-replicated layout
        def qk_permute(v):
            r = np.asarray(v).reshape(-1, hd // 2, 2)
            return r.transpose(0, 2, 1).reshape(np.shape(v))

        for norm, hf in (("q_normalization", "q_norm"),
                         ("k_normalization", "k_norm")):
            for part in ("weight", "bias"):
                key = P + f"attention.{norm}.{part}"
                if key in shards[0]:
                    out[O + f"self_attn.{hf}.{part}"] = qk_permute(cat(key, 0))
        out[O + "mlp.gate_proj.weight"] = cat(P + "feed_forward.w1.weight", 0)
        out[O + "mlp.down_proj.weight"] = cat(P + "feed_forward.w2.weight", 1)
        out[O + "mlp.up_proj.weight"] = cat(P + "feed_forward.w3.weight", 0)
        if ns == 1:
            out[O + "input_layernorm.weight"] = np.asarray(
                shards[0][P + "attention_norm.weight"])
            out[O + "post_attention_layernorm.weight"] = np.asarray(
                shards[0][P + "ffn_norm.weight"])
        else:
            # converter:200-205 STACKS the replicated norms; rank 0 is
            # canonical downstream
            out[O + "input_layernorm.weight"] = np.stack(
                [np.asarray(s[P + "attention_norm.weight"]) for s in shards])
            out[O + "post_attention_layernorm.weight"] = np.stack(
                [np.asarray(s[P + "ffn_norm.weight"]) for s in shards])
    out["model.embed_tokens.weight"] = cat("tok_embeddings.weight", 1 if ns > 1 else 0)
    if ns == 1:
        out["model.norm.weight"] = np.asarray(shards[0]["norm.weight"])
    else:
        out["model.norm.weight"] = np.stack(
            [np.asarray(s["norm.weight"]) for s in shards]).mean(axis=0)
    out["lm_head.weight"] = cat("output.weight", 0)
    return out


def load_meta_chameleon_dir(path: str):
    """Load an original-Meta Chameleon checkpoint directory
    (``consolidated.NN.pth`` shards + ``params.json``) and return
    ``(hf_state_dict, params_json)``."""
    import glob as _glob
    import json as _json

    import torch

    with open(os.path.join(path, "params.json")) as f:
        pj = _json.load(f)
    files = sorted(_glob.glob(os.path.join(path, "consolidated.*.pth")))
    if not files:
        raise FileNotFoundError(f"no consolidated.*.pth under {path}")
    shards = [
        {k: np.asarray(v) for k, v in
         torch.load(f, map_location="cpu", weights_only=True).items()}
        for f in files
    ]
    model = pj.get("model", pj)
    dim = model["dim"]
    sd = meta_chameleon_to_hf(
        shards, num_layers=model["n_layers"], n_heads=model["n_heads"],
        dim=dim, n_kv_heads=model.get("n_kv_heads"))
    return sd, pj
