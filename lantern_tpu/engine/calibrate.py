"""Drafter acceptance calibration -> data-driven draft-tree shapes.

The reference picks one of 6 hand-designed trees (choices.py:1-32) with no
way to fit the shape to a model/drafter pair.  Here: measure how often the
r-th ranked drafter prediction matches the base model's actual next token
(teacher-forced over a base rollout — the standard EAGLE independence
approximation), then feed the rank histogram to ``trees.optimize_tree`` to
build the expected-accept-length-optimal static tree for a given node
budget.

Usage (bench/CLI wiring: scripts/optimize_bench_tree.py):

    probs = measure_rank_probs(params, dparams, cfg, dcfg, cond, uncond, rng)
    paths = trees.optimize_tree(probs, num_nodes=57, max_depth=5)
    spec  = trees.get_tree(paths)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import DrafterConfig, ModelConfig
from ..kv import KVCache
from ..models import drafter as drf
from ..models import transformer as tfm
from ..ops.sampling import LogitsWarp, cfg_combine
from . import ar


def _teacher_hidden(params, cfg: ModelConfig, cond_pair, tokens, rope):
    """Base-model hidden states over [cond prefix | tokens], batch-2 CFG
    rows, causal, no cache reuse."""
    emb = jnp.concatenate(
        [tfm.cond_embed(params, cfg, cond_pair),
         tfm.token_embed(params, jnp.broadcast_to(tokens[None], (2,) + tokens.shape))],
        axis=1,
    )
    T = emb.shape[1]
    kv = KVCache.create(cfg, 2, max_len=T)
    res = tfm.forward(params, cfg, emb, kv, jnp.arange(T), rope, commit=False)
    return res.hidden                                         # [2, Tc+T, H]


def measure_rank_probs(
    params: dict,
    dparams: dict,
    cfg: ModelConfig,
    dcfg: DrafterConfig,
    cond,
    uncond,
    rng: jax.Array,
    num_tokens: Optional[int] = None,
    max_rank: int = 10,
    cfg_scale: float = 3.0,
    warp: LogitsWarp = LogitsWarp(),
    num_rollouts: int = 1,
) -> np.ndarray:
    """P(drafter's rank-r prediction == base's next token), r < max_rank.

    For each rollout: sample a CFG AR stream from the base, teacher-force
    the base for hidden states, teacher-force the drafter over
    (token, hidden) pairs (exactly the engine's draft-root input), CFG-
    combine its head logits, and histogram the rank of the true next token.
    Returns ``[max_rank]`` f64 probabilities (rest of the mass = miss).
    """
    num_tokens = num_tokens or cfg.block_size
    rope = tfm.make_rope_tables(cfg)
    drope = tfm.make_rope_tables(dcfg.model)
    Tc = cfg.cls_token_num
    head = tfm.logits_head  # dispatches dense / int8 layouts

    hits = np.zeros(max_rank, np.int64)
    total = 0
    for i in range(num_rollouts):
        key = jax.random.fold_in(rng, i)
        res = ar.generate(params, cfg, cond, uncond, num_tokens, cfg_scale,
                          warp, key)
        toks = res.tokens                                     # [T]
        cond_pair = (
            jnp.concatenate([cond, uncond], axis=0)
            if cfg.cond_kind == "caption"
            else jnp.concatenate([jnp.atleast_1d(cond), jnp.atleast_1d(uncond)])
        )
        hid = _teacher_hidden(params, cfg, cond_pair, toks, rope)
        # Drafter stream EXACTLY as the engine feeds it (spec.prefill_request
        # + drf.extend): Tc-1 zero-token prefix rows paired with the base's
        # conditioning hiddens, then (tok_t, hidden that emitted tok_t) at
        # drafter position Tc-1+t — the row scoring tok_{t+1}.  Feeding only
        # the image stream at positions 0.. (the old form) breaks the 2-D
        # RoPE alignment and reports garbage ranks.
        T = toks.shape[0]
        Dp = Tc - 1 + T
        dr_tokens = jnp.broadcast_to(
            jnp.concatenate([jnp.zeros((Tc - 1,), toks.dtype), toks])[None],
            (2, Dp))
        dr_hidden = hid[:, :Dp]
        mcfg = dcfg.model.replace(use_flash_attention=False)
        kv = KVCache.create(mcfg, 2, max_len=Dp)
        x = drf.fuse_inputs(dparams, dr_tokens, dr_hidden)
        out = tfm.forward(dparams, mcfg, x, kv, jnp.arange(Dp), drope,
                          commit=False).hidden                # [2, Dp, H]
        logits = cfg_combine(head(params, out), cfg_scale)[0]  # [Dp, V]
        # rank of the true next token among the drafter's logits
        true_next = toks[1:]                                  # [T-1]
        lg = logits[Tc - 1: Dp - 1]                           # [T-1, V]
        true_lg = jnp.take_along_axis(lg, true_next[:, None], axis=1)
        ranks = jnp.sum(lg > true_lg, axis=1)                 # [T-1]
        r = np.asarray(ranks)
        total += r.shape[0]
        for rank in range(max_rank):
            hits[rank] += int((r == rank).sum())
    probs = hits / max(total, 1)
    # optimize_tree needs strictly positive probabilities; floor at 1/total
    return np.maximum(probs, 1.0 / max(total, 2))
