"""Vanilla CFG autoregressive decode loop — the 1.0x baseline.

Mirrors the reference's base-mode generate (modeling_llamagen_kv.py:1376-1444):
prefill the conditioning prefix as a cond/uncond batch pair, then one token
per step with CFG-combined sampling.  The whole loop runs on device as a
``lax.fori_loop`` inside one jit — no host syncs per token.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..configs import ModelConfig
from ..kv import KVCache
from ..ops.sampling import LogitsWarp, cfg_combine, sample_token
from ..models import transformer as tfm


class ARResult(NamedTuple):
    tokens: jnp.ndarray     # [max_new] generated ids
    kv: KVCache


@partial(jax.jit, static_argnames=("cfg", "max_new", "cfg_scale", "warp"))
def generate(
    params: dict,
    cfg: ModelConfig,
    cond,                      # label ids [1] or caption feats [1, Tc, Dc]
    uncond,                    # uncond counterpart (same shape)
    max_new: int,
    cfg_scale: float,
    warp: LogitsWarp,
    rng: jax.Array,
    rope=None,
    prefix_valid: Optional[jnp.ndarray] = None,   # [2, S] caption padding
) -> ARResult:
    """Greedy/sampled CFG AR generation for a single request (cond/uncond as
    batch rows [cond, uncond])."""
    if rope is None:
        rope = tfm.make_rope_tables(cfg)
    Tc = cfg.cls_token_num

    cond_pair = jnp.concatenate([cond, uncond], axis=0)
    embeds = tfm.cond_embed(params, cfg, cond_pair)
    kv = KVCache.create(cfg, 2)
    if prefix_valid is not None and prefix_valid.shape[-1] != kv.max_len:
        prefix_valid = jnp.pad(
            prefix_valid, ((0, 0), (0, kv.max_len - prefix_valid.shape[-1])),
            constant_values=True,
        )

    res = tfm.forward(
        params, cfg, embeds, kv, jnp.arange(Tc), rope,
        block_mask=None if prefix_valid is None else
        (jnp.tril(jnp.ones((Tc, Tc), bool)) & prefix_valid[:, None, :Tc]),
    )
    logits = tfm.logits_head(params, res.hidden[:, -1])
    rng, r = jax.random.split(rng)
    tok = sample_token(r, cfg_combine(logits, cfg_scale), warp)   # [1]

    class Carry(NamedTuple):
        kv: KVCache
        tok: jnp.ndarray
        out: jnp.ndarray
        rng: jax.Array

    def body(i, c: Carry):
        out = c.out.at[i].set(c.tok[0])
        emb = tfm.token_embed(params, jnp.broadcast_to(c.tok[:, None], (2, 1)))
        res = tfm.forward(
            params, cfg, emb, c.kv, jnp.reshape(Tc + i, (1,)), rope,
            prefix_valid=prefix_valid,
        )
        logits = tfm.logits_head(params, res.hidden[:, -1])
        rng, r = jax.random.split(c.rng)
        nxt = sample_token(r, cfg_combine(logits, cfg_scale), warp)
        return Carry(kv=res.kv, tok=nxt, out=out, rng=rng)

    init = Carry(kv=res.kv, tok=tok, out=jnp.zeros((max_new,), jnp.int32), rng=rng)
    fin = jax.lax.fori_loop(0, max_new, body, init)
    return ARResult(tokens=fin.out, kv=fin.kv)
