"""Draft-budget autotune: pick ``total_tokens`` by timing the verify forward.

Reference semantics (ea_model_llamagen.py:202-226, ea_model_lumina_mgpt.py:
404-424): when ``total_token == -1`` the loader micro-benchmarks the base
model's forward at candidate tree sizes {40, 48, 50, 56, 60}, divides each
time by a latency weight {1, 1.05, 1.07, 1.1, 1.13} (larger trees earn more
accepted tokens per step), and keeps the argmin.

TPU version: the timed op is the *compiled* tree-verification forward — a
[2, L]-token forward against a committed KV prefix, the per-step hot op of
speculative decoding — timed over ``iters`` steady-state runs after a warmup
compile, per candidate length.  On TPU the candidates compile once each
(static shapes) and remain cached for the real decode loop if the chosen
size is used with the same geometry.
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from .. import configs
from ..kv import KVCache
from ..models import transformer as tfm

# (candidate tree size, latency weight) — reference ea_model_llamagen.py:204-205
CANDIDATES = (40, 48, 50, 56, 60)
WEIGHTS = (1.0, 1.05, 1.07, 1.1, 1.13)


def time_verify_forward(
    params: dict,
    cfg: configs.ModelConfig,
    length: int,
    prefix: int = 128,
    iters: int = 20,
    rope=None,
) -> float:
    """Steady-state seconds per [2, length]-token verify forward."""
    if rope is None:
        rope = tfm.make_rope_tables(cfg)
    kv = KVCache.create(cfg, 2).commit(min(prefix, cfg.max_seq_len - length))
    toks = jnp.zeros((2, length), jnp.int32)
    pos = jnp.arange(length, dtype=jnp.int32)
    mask = jnp.tril(jnp.ones((length, length), jnp.bool_))

    @jax.jit
    def fwd(params, kv, toks):
        res = tfm.forward(
            params, cfg, tfm.token_embed(params, toks), kv,
            positions=pos + kv.length, rope=rope, block_mask=mask,
            commit=False,
        )
        return tfm.logits_head(params, res.hidden)

    out = fwd(params, kv, toks)
    jax.block_until_ready(out)  # compile outside the timed region
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, kv, toks)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def autotune_total_tokens(
    params: dict,
    cfg: configs.ModelConfig,
    candidates: Sequence[int] = CANDIDATES,
    weights: Optional[Sequence[float]] = None,
    prefix: int = 128,
    iters: int = 20,
    verbose: bool = False,
) -> int:
    """Return the latency-weighted-argmin candidate ``total_tokens``."""
    if weights is None:
        weights = WEIGHTS if tuple(candidates) == CANDIDATES else None
    if weights is None:
        # reference weights interpolated over tree size
        lo, hi = min(candidates), max(candidates)
        weights = [1.0 + 0.13 * (c - lo) / max(1, hi - lo) for c in candidates]
    rope = tfm.make_rope_tables(cfg)
    scores = []
    for c, w in zip(candidates, weights):
        dt = time_verify_forward(params, cfg, c, prefix=prefix, iters=iters,
                                 rope=rope)
        scores.append(dt / w)
        if verbose:
            print(f"autotune: L={c} {dt*1e3:.2f} ms/fwd weighted {dt/w*1e3:.2f}")
    return int(candidates[scores.index(min(scores))])
