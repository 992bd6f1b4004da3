"""Device mesh and sharding rules.

The scaling dimension for visual-AR speculative decoding is model sharding +
request batching, not sequence length (SURVEY.md §5): base-model weights and
KV are tensor-sharded over the ``tp`` mesh axis (attention heads / FFN inner
dim / vocab), the drafter is replicated, and requests shard over ``dp``.
Collectives are left to XLA via sharding annotations under jit — the
reference's NCCL calls (xllmx/util/dist.py) have no analogue here.

Sharding rules map parameter-tree paths to PartitionSpecs.  Head counts that
don't divide ``tp`` fall back to replication (XLA would otherwise pad).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..configs import ModelConfig

DP, TP = "dp", "tp"


def make_mesh(n_devices: Optional[int] = None, dp: int = 1, devices=None) -> Mesh:
    """Mesh over available devices with axes (dp, tp); tp = n/dp."""
    devs = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devs)
    devs = devs[:n]
    if n % dp:
        raise ValueError(f"n_devices {n} not divisible by dp {dp}")
    arr = np.asarray(devs).reshape(dp, n // dp)
    return Mesh(arr, (DP, TP))


def _divisible(n: int, mesh: Mesh) -> bool:
    return n % mesh.shape[TP] == 0


def base_param_specs(cfg: ModelConfig, mesh: Mesh, params: Optional[dict] = None) -> dict:
    """Megatron-style TP: q/k/v + FFN-in column-sharded, o + FFN-out
    row-sharded, lm_head vocab-sharded, norms/embeddings replicated.

    When ``params`` is given, the specs mirror its actual layout — including
    W8A16 entries (ops/quant.py): ``*_q`` int8 kernels shard like their dense
    counterparts; ``*_s`` scales ([L, 1, N]) shard over the output column for
    column-parallel kernels and replicate for row-parallel ones (the
    per-column scale factors out of the row-parallel partial sums)."""
    heads_ok = _divisible(cfg.num_heads, mesh) and _divisible(cfg.num_kv_heads, mesh)
    ffn_ok = _divisible(cfg.intermediate_size, mesh)
    vocab_ok = _divisible(cfg.vocab_size, mesh)
    col = P(None, None, TP)
    row = P(None, TP, None)
    rep3 = P(None, None, None)
    layers = {
        "attn_norm": P(None, None),
        "wq": col if heads_ok else rep3,
        "wk": col if heads_ok else rep3,
        "wv": col if heads_ok else rep3,
        "wo": row if heads_ok else rep3,
        "ffn_norm": P(None, None),
        "w_gate": col if ffn_ok else rep3,
        "w_up": col if ffn_ok else rep3,
        "w_down": row if ffn_ok else rep3,
    }
    if cfg.qk_norm:
        qn = P(None, TP, None) if heads_ok else rep3
        layers.update(q_norm_w=qn, q_norm_b=qn, k_norm_w=qn, k_norm_b=qn)
    specs = {
        "embed": P(None, None),
        "layers": layers,
        "norm": P(None),
        "lm_head": P(None, TP) if vocab_ok else P(None, None),
    }
    if cfg.cond_kind == "label":
        specs["cond"] = {"table": P(None, None)}
    elif cfg.cond_kind == "caption":
        specs["cond"] = {"fc1": P(None, None), "fc2": P(None, None), "uncond": P(None, None)}
    if params is not None:
        specs = _match_layout(specs, params)
    return specs


def _match_layout(specs: dict, params: dict) -> dict:
    """Rewrite a spec tree to mirror a params tree that may carry quantized
    (``name_q``/``name_s``) entries or fused (wqkv / w_gu) kernels."""
    fused = {  # fused kernels shard like their widest constituent
        "wqkv": "wq", "w_gu": "w_gate",
    }

    def rewrite(spec_d: dict, par_d: dict) -> dict:
        out = {}
        for key, val in par_d.items():
            if isinstance(val, dict):
                out[key] = rewrite(spec_d.get(key, {}), val)
                continue
            base = key[:-2] if key.endswith(("_q", "_s")) else key
            ref = spec_d.get(base, spec_d.get(fused.get(base, base)))
            if ref is None:
                ref = P(*([None] * val.ndim))
            if key.endswith("_s"):
                # scale [.., 1, N]: keep only the output-column sharding
                axes = list(ref)
                if len(axes) >= 2:
                    axes[-2] = None
                ref = P(*axes)
            out[key] = ref
        return out

    return rewrite(specs, params)


def drafter_param_specs(dparams: dict) -> dict:
    """Drafter is small -> fully replicated."""
    return jax.tree.map(lambda a: P(*([None] * a.ndim)), dparams)


def kv_specs(cfg: ModelConfig, mesh: Mesh, quantized: bool = False):
    """KVCache [L, B, G, S, W]: head groups over tp, batch over dp.  For an
    int8 cache the [L, B, G, S] scale planes shard with their groups."""
    from ..kv import KVCache, group_dims
    G, _ = group_dims(cfg.num_kv_heads, cfg.head_dim)
    groups_ok = _divisible(G, mesh)
    g = TP if groups_ok else None
    spec = P(None, None, g, None, None)
    sspec = P(None, None, g, None) if quantized else None
    return KVCache(k=spec, v=spec, length=P(),  # type: ignore[arg-type]
                   k_scale=sspec, v_scale=sspec)


def tree_shardings(tree, specs, mesh: Mesh):
    """Mirror ``tree`` with NamedShardings from the (PartitionSpec-leaved)
    ``specs`` tree.  PartitionSpec is itself a pytree, so flatten specs only
    down to ``tree``'s structure."""
    leaves, treedef = jax.tree.flatten(tree)
    spec_leaves = treedef.flatten_up_to(specs)
    return jax.tree.unflatten(
        treedef, [NamedSharding(mesh, s) for s in spec_leaves]
    )


def shard_pytree(tree, specs, mesh: Mesh):
    """device_put every leaf with its NamedSharding."""
    shardings = tree_shardings(tree, specs, mesh)
    return jax.tree.map(jax.device_put, tree, shardings)
