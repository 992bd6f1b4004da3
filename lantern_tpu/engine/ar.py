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
import numpy as np

from ..configs import ModelConfig
from ..kv import KVCache
from ..ops.sampling import LogitsWarp, cfg_combine, sample_token
from ..models import transformer as tfm


class ARResult(NamedTuple):
    tokens: jnp.ndarray     # [max_new] generated ids
    kv: KVCache
    # committed length: max_new, or with stop_ids the index one past the
    # first stop id (HF generate eos_token_id semantics,
    # inference_solver.py:441); -1 means "no stop tracking requested"
    n_valid: jnp.ndarray = np.asarray(-1, np.int32)


@partial(jax.jit, static_argnames=("cfg", "max_new", "warp", "kv_quant"))
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
    kv_quant: bool = False,
) -> ARResult:
    """Greedy/sampled CFG AR generation for a single request (cond/uncond as
    batch rows [cond, uncond])."""
    if rope is None:
        rope = tfm.make_rope_tables(cfg)
    Tc = cfg.cls_token_num

    cond_pair = jnp.concatenate([cond, uncond], axis=0)
    embeds = tfm.cond_embed(params, cfg, cond_pair)
    kv = KVCache.create(cfg, 2, quantized=kv_quant)
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


@partial(jax.jit, static_argnames=("cfg", "max_new", "warp", "kv_quant"))
def generate_many(
    params: dict,
    cfg: ModelConfig,
    conds,                     # [R] label ids or [R, 1, Tc, Dc] caption feats
    uncond,                    # single uncond row (broadcast across requests)
    max_new: int,
    cfg_scale: float,
    warp: LogitsWarp,
    rngs: jax.Array,           # [R] PRNG keys
    prefix_valid: Optional[jnp.ndarray] = None,   # [R, 2, S] or None
    kv_quant: bool = False,
) -> jnp.ndarray:
    """Batched vanilla-AR generation: R requests share every weight stream.

    Image generation is fixed-length, so plain vmap (lockstep, no slot
    swapping) IS continuous batching here — this is the TPU answer to the
    reference's vLLM AR batching for data generation
    (vllm_inference_solver.py:243-343).  Returns tokens [R, max_new].
    """
    def one(cond, rng, pv):
        return generate(params, cfg, cond, uncond, max_new, cfg_scale, warp,
                        rng, prefix_valid=pv, kv_quant=kv_quant).tokens

    in_pv = None if prefix_valid is None else 0
    return jax.vmap(one, in_axes=(0, 0, in_pv))(conds, rngs, prefix_valid)


@partial(jax.jit, static_argnames=("cfg", "max_new", "warp",
                                   "logits_fn", "kv_quant", "stop_ids"))
def generate_tokens_many(
    params: dict,
    cfg: ModelConfig,
    token_prompt,              # TokenPrompt with tokens [R, 2, L] (stacked)
    max_new: int,
    cfg_scale: float,
    warp: LogitsWarp,
    rngs: jax.Array,           # [R] PRNG keys
    logits_mask: Optional[jnp.ndarray] = None,
    logits_fn=None,
    kv_quant: bool = False,
    stop_ids: tuple = (),
):
    """Lockstep-batched Chameleon-family AR: R same-length token-prompt
    requests share every weight stream (the reference's vLLM data-gen role,
    vllm_inference_solver.py:243-343, expressed as vmap).  ``token_prompt``
    fields carry a leading request axis for ``tokens``/``positions``/
    ``valid`` (pos_diff may be [R] or shared).  Returns (tokens [R, max_new],
    n_valid [R]).  Uses dense attention (the flash kernel has no batching
    rule)."""
    import dataclasses as _dc

    cfg_d = _dc.replace(cfg, use_flash_attention=False)

    def one(tokens, positions, valid, rng):
        tp = token_prompt.__class__(tokens=tokens, positions=positions,
                                    valid=valid,
                                    pos_diff=positions[1, -1] * 0)
        res = generate_tokens(params, cfg_d, tp, max_new, cfg_scale, warp,
                              rng, logits_mask=logits_mask,
                              logits_fn=logits_fn, kv_quant=kv_quant,
                              stop_ids=stop_ids)
        return res.tokens, res.n_valid

    return jax.vmap(one)(token_prompt.tokens, token_prompt.positions,
                         token_prompt.valid, rngs)


@partial(jax.jit, static_argnames=("cfg", "max_new", "warp",
                                   "logits_fn", "kv_quant", "stop_ids"))
def generate_tokens(
    params: dict,
    cfg: ModelConfig,
    token_prompt,              # engine.spec.TokenPrompt: [2, L] cond/uncond
    max_new: int,
    cfg_scale: float,
    warp: LogitsWarp,
    rng: jax.Array,
    logits_mask: Optional[jnp.ndarray] = None,
    logits_fn=None,
    rope=None,
    kv_quant: bool = False,
    stop_ids: tuple = (),
) -> ARResult:
    """Chameleon-family base-mode CFG AR loop over a token prompt.

    Mirrors the reference's vanilla generates (modeling_anole_kv.py:1784-1837,
    pristine Lumina ``_sample``, modeling_lumina_mgpt.py:1644-1793): the
    cond/uncond rows carry their own position ids (the uncond branch restarts
    near the image start), every step samples ONE token from the CFG-combined
    logits and feeds it to both rows.  ``logits_mask`` suppresses non-image
    tokens; ``logits_fn(logits [T,V], cond_positions)`` applies the Lumina
    grid FSM.

    ``stop_ids`` enables EOS-terminated variable-length generation (HF
    generate ``eos_token_id`` semantics, inference_solver.py:441): the loop
    exits after committing any stop id and ``n_valid`` includes it.
    """
    if rope is None:
        rope = tfm.make_rope_tables(cfg)
    tp = token_prompt
    L = tp.tokens.shape[1]

    def warp_logits(logits, cond_pos):          # [2, 1, V], [1] -> [1, V]
        logits = cfg_combine(logits, cfg_scale)[0]
        if logits_mask is not None:
            logits = jnp.where(logits_mask, jnp.finfo(jnp.float32).min, logits)
        if logits_fn is not None:
            logits = logits_fn(logits, cond_pos)
        return logits

    kv = KVCache.create(cfg, 2, quantized=kv_quant)
    block = jnp.tril(jnp.ones((L, L), bool))[None] & tp.valid[:, None, :]
    res = tfm.forward(
        params, cfg, tfm.token_embed(params, tp.tokens), kv,
        positions=tp.positions, rope=rope, block_mask=block,
    )
    pv = jnp.pad(tp.valid, ((0, 0), (0, kv.max_len - L)), constant_values=True)
    logits = tfm.logits_head(params, res.hidden[:, -1:])          # [2, 1, V]
    rng, r = jax.random.split(rng)
    last_pos = tp.positions[:, -1]                                # [2]
    tok = sample_token(r, warp_logits(logits, last_pos[:1]), warp)  # [1]

    class Carry(NamedTuple):
        kv: KVCache
        tok: jnp.ndarray
        out: jnp.ndarray
        rng: jax.Array
        i: jnp.ndarray = np.asarray(0, np.int32)
        stopped: jnp.ndarray = np.zeros((), bool)

    stops = np.asarray(stop_ids, np.int32) if stop_ids else None

    def body(i, c: Carry):
        out = c.out.at[i].set(c.tok[0])
        emb = tfm.token_embed(params, jnp.broadcast_to(c.tok[:, None], (2, 1)))
        pos = (last_pos + 1 + i)[:, None]                         # [2, 1]
        res = tfm.forward(params, cfg, emb, c.kv, pos, rope, prefix_valid=pv)
        logits = tfm.logits_head(params, res.hidden[:, -1:])
        rng, r = jax.random.split(c.rng)
        nxt = sample_token(r, warp_logits(logits, pos[0]), warp)
        stop = (c.stopped if stops is None
                else c.stopped | jnp.any(c.tok[0] == stops))
        return Carry(kv=res.kv, tok=nxt, out=out, rng=rng,
                     i=jnp.asarray(i + 1, jnp.int32), stopped=stop)

    init = Carry(kv=res.kv, tok=tok, out=jnp.zeros((max_new,), jnp.int32),
                 rng=rng, i=jnp.zeros((), jnp.int32),
                 stopped=jnp.zeros((), bool))
    if stops is None:
        fin = jax.lax.fori_loop(0, max_new, body, init)
        return ARResult(tokens=fin.out, kv=fin.kv)
    fin = jax.lax.while_loop(
        lambda c: (c.i < max_new) & ~c.stopped, lambda c: body(c.i, c), init)
    return ARResult(tokens=fin.out, kv=fin.kv, n_valid=fin.i)
