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

from functools import partial
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


def measure_stale_rank_probs(
    params: dict,
    cfg: ModelConfig,
    token_prompt,
    rng: jax.Array,
    num_tokens: int,
    max_rank: int = 10,
    max_depth: int = 8,
    cfg_scale: float = 3.0,
    warp: LogitsWarp = LogitsWarp(),
    logits_fn=None,
    logits_mask=None,
    kv_quant: bool = False,
    num_rollouts: int = 1,
    chunk: int = 512,
) -> np.ndarray:
    """Depth-dependent rank probabilities for the hidden-passthrough drafter
    on a token-prompt (Chameleon/Lumina) model: ``[max_depth, max_rank]``.

    The passthrough drafter never updates its hidden along a draft path, so
    its proposal distribution at every level is the root's ``p_i`` — at depth
    d the candidates are ranked by a distribution that is ``d-1`` positions
    stale relative to the verifier's ``p_{i+d-1}``.  That staleness decay is
    exactly measurable teacher-forced: roll out the base AR stream (with the
    grid FSM), re-run one full forward for all-position CFG-combined logits,
    and for each depth d histogram the rank of the actual token at row+d
    within the row's FSM-masked logits (FSM evaluated at the parent
    position ``P+d``, the engine's convention — models/drafter.py
    draft_static; the r5 depth-alignment fix applies here too: the engine's
    level-1 proposal is one position stale, so depth-d targets sit d rows
    past the proposal row, not d-1).  Feeds ``trees.optimize_tree``'s 2-D
    form.
    """
    from ..ops.sampling import cfg_combine as _cfg_combine

    rope = tfm.make_rope_tables(cfg)
    tp = token_prompt
    L = tp.tokens.shape[1]
    T = num_tokens
    head = tfm.logits_head

    # one jitted kernel per chunk: eager per-op dispatch would hold several
    # [chunk, V] f32 temporaries live at 7B geometry (OOM next to the
    # resident params + teacher KV) and round-trip the remote tunnel per op.
    # params MUST be an argument, not a closure capture — jit bakes captured
    # concrete arrays in as program constants, copying all 7 GB to host
    @jax.jit
    def chunk_hits(params, hid_rows, P, toks_dev, t_idx):
        lg = _cfg_combine(head(params, hid_rows), cfg_scale)[0]
        lg = lg.astype(jnp.float32)                           # [C, V]
        hits = jnp.zeros((max_depth, max_rank), jnp.int32)
        tot = jnp.zeros((max_depth,), jnp.int32)
        for d in range(1, max_depth + 1):
            tpos = t_idx + d
            ok = tpos < toks_dev.shape[0]
            tgt = toks_dev[jnp.clip(tpos, 0, toks_dev.shape[0] - 1)]
            ml = lg
            if logits_mask is not None:
                ml = jnp.where(logits_mask, jnp.finfo(jnp.float32).min, ml)
            if logits_fn is not None:
                ml = logits_fn(ml, P + d)
            tv = jnp.take_along_axis(ml, tgt[:, None], axis=1)
            ranks = jnp.sum(ml > tv, axis=1)
            oh = (ranks[:, None] == jnp.arange(max_rank)[None]) & ok[:, None]
            hits = hits.at[d - 1].add(oh.sum(0))
            tot = tot.at[d - 1].add(ok.sum())
        return hits, tot

    # teacher forward runs as CHUNKED committed prefill: one full-sequence
    # dense-attention forward at 7B geometry materializes multi-GB score
    # tensors next to the resident params and OOMs; fixed-size segments
    # compile once and keep the attention workspace at [2, nh, seg, S]
    seg = chunk

    @jax.jit
    def seg_fwd(params, kv, toks_seg, pos_seg, valid_seg, pv):
        block = (jnp.tril(jnp.ones((seg, seg), bool))[None]
                 & valid_seg[:, None, :])
        res = tfm.forward(params, cfg, tfm.token_embed(params, toks_seg), kv,
                          pos_seg, rope, block_mask=block, prefix_valid=pv,
                          commit=True)
        return res.hidden, res.kv

    hits = np.zeros((max_depth, max_rank), np.int64)
    totals = np.zeros(max_depth, np.int64)
    for i in range(num_rollouts):
        key = jax.random.fold_in(rng, i)
        res = ar.generate_tokens(params, cfg, tp, T, cfg_scale, warp, key,
                                 logits_mask=logits_mask, logits_fn=logits_fn,
                                 kv_quant=kv_quant)
        toks = res.tokens                                     # [T]
        res = None          # free the rollout's KV cache before the teacher
        full = jnp.concatenate(
            [tp.tokens, jnp.broadcast_to(toks[None], (2, T))], axis=1)
        last_pos = tp.positions[:, -1]
        gen_pos = last_pos[:, None] + 1 + jnp.arange(T)[None]
        positions = jnp.concatenate([tp.positions, gen_pos], axis=1)
        valid = jnp.concatenate([tp.valid, jnp.ones((2, T), bool)], axis=1)
        n_full = full.shape[1]
        pad = (-n_full) % seg
        full_p = jnp.pad(full, ((0, 0), (0, pad)))
        pos_p = jnp.pad(positions, ((0, 0), (0, pad)), mode="edge")
        valid_p = jnp.pad(valid, ((0, 0), (0, pad)))
        kv = KVCache.create(cfg, 2, max_len=n_full + pad, quantized=kv_quant)
        pv = jnp.pad(valid_p, ((0, 0), (0, kv.max_len - valid_p.shape[1])),
                     constant_values=True)
        parts = []
        for lo in range(0, n_full + pad, seg):
            h, kv = seg_fwd(params, kv, full_p[:, lo:lo + seg],
                            pos_p[:, lo:lo + seg], valid_p[:, lo:lo + seg],
                            pv)
            parts.append(h)
        hid = jnp.concatenate(parts, axis=1)[:, :n_full]      # [2, L+T, H]
        kv = None
        # row L-1+t emits the distribution that scores toks[t] at depth 1
        cond_pos = positions[0]
        for lo in range(0, T, chunk):
            hi = min(lo + chunk, T)
            rows = jnp.arange(L - 1 + lo, L - 1 + hi)
            h, t = chunk_hits(params, hid[:, rows], cond_pos[rows], toks,
                              jnp.arange(lo, hi))
            hits += np.asarray(h, np.int64)
            totals += np.asarray(t, np.int64)
    probs = hits / np.maximum(totals, 1)[:, None]
    return np.maximum(probs, 1.0 / max(int(totals.max()), 2))


def measure_stale_accept_probs(
    params: dict,
    cfg: ModelConfig,
    token_prompt,
    rng: jax.Array,
    num_tokens: int,
    nearest: jnp.ndarray,
    lantern,
    max_rank: int = 10,
    max_depth: int = 8,
    cfg_scale: float = 3.0,
    warp: LogitsWarp = LogitsWarp(),
    logits_fn=None,
    logits_mask=None,
    kv_quant: bool = False,
    num_rollouts: int = 1,
    chunk: int = 32,
) -> np.ndarray:
    """Depth x rank probabilities that the STOCHASTIC LANTERN walk accepts
    the rank-r child of a correct node at depth d — the acceptance rule the
    bench lane actually runs, measured with the engine's own verifier.

    ``measure_stale_rank_probs`` calibrates the greedy objective (is the
    drafted token the argmax match?); under stochastic verification with a
    near-exact proposal (the stale distribution) acceptance probability is
    ~min(1, p/q) per trial — far higher than rank-match — so the greedy
    matrix drastically under-credits every node and mis-sizes the tree
    (r5 finding: greedy model predicts C~1.5 where the lane measures 2.59).

    Per teacher position t and depth d this Monte-Carlo instrument draws the
    stale proposals exactly as ``drafter.draft_stale`` does (warped softmax
    of the root row under the FSM at the parent position, Gumbel top-k
    without replacement, residual q), then runs ONE LEVEL of the real
    ``acceptance.stochastic_verify_tree`` (star tree: root + max_rank
    children) against the true distribution at t+d — LANTERN inflation,
    residual subtraction, trial order and all.

    Depth alignment (r5 fix): the engine's next-step root token is the
    bonus, sampled from the SAME distribution that then serves as the stale
    proposal — so level-1 children verify against the distribution one
    position PAST the proposal's (the bonus token's own row), level-d
    children d positions past.  The instrument's depth-d target row is
    therefore root+d, NOT root+d-1 (which had compared the proposal with
    itself at d=1, reporting a trivial 1.0 and crediting every deeper level
    one step too generously — the calibrated shapes it produced measured
    C~2.1 against the model's 3.4).  The returned matrix
    ``rho[d-1, r]`` = P(the accepted child has rank r), which is exactly the
    per-edge factor ``trees.optimize_tree``'s best-first model multiplies
    along paths.

    Feeds ``trees.optimize_tree`` (2-D form); cached by
    scripts/select_lumina_tree.py --objective accept.
    """
    from ..ops import acceptance as acc
    from ..ops.sampling import sample_without_replacement, warp_logits

    rope = tfm.make_rope_tables(cfg)
    tp = token_prompt
    L = tp.tokens.shape[1]
    T = num_tokens
    K = max_rank

    # star tree: slot 0 = the node whose distribution verifies, slots 1..K =
    # the K drafted children in rank order
    children = np.full((K + 1, K), -1, np.int32)
    children[0] = np.arange(1, K + 1)

    @jax.jit
    def chunk_accepts(params, hid_root, hid_tgt, P, rngs, depth_d):
        """hid_root/hid_tgt: [2, C, H] rows; P: [C] root cond positions.
        Returns [C] accepted rank (-1 = none) for traced depth ``depth_d``
        (one compile serves every depth)."""
        lg_root = cfg_combine(tfm.logits_head(params, hid_root), cfg_scale)[0]
        lg_tgt = cfg_combine(tfm.logits_head(params, hid_tgt), cfg_scale)[0]
        lg_root = lg_root.astype(jnp.float32)
        lg_tgt = lg_tgt.astype(jnp.float32)
        pos = P + depth_d
        if logits_mask is not None:
            neg = jnp.finfo(jnp.float32).min
            lg_root = jnp.where(logits_mask, neg, lg_root)
            lg_tgt = jnp.where(logits_mask, neg, lg_tgt)
        if logits_fn is not None:
            lg_root = logits_fn(lg_root, pos)
            lg_tgt = logits_fn(lg_tgt, pos)

        def one(lg_r, lg_t, r):
            r_draw, r_walk = jax.random.split(r)
            s = jax.nn.softmax(warp_logits(lg_r[None], warp), axis=-1)
            idx, q = sample_without_replacement(r_draw, s, K)     # [1, K]
            node_logits = jnp.concatenate(
                [lg_t[None], jnp.zeros((K, lg_t.shape[0]), jnp.float32)])
            tree_tokens = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), idx[0]])
            node_q = jnp.concatenate([jnp.ones((1,), jnp.float32), q[0]])
            path, alen, _ = acc.stochastic_verify_tree(
                r_walk, node_logits, tree_tokens, jnp.asarray(children),
                depth=1, warp=warp, nearest=nearest, lantern=lantern,
                node_q=node_q, level_probs=(s,),
                node_level_row=jnp.zeros((K + 1,), jnp.int32),
                batch_warp=False,
            )
            return jnp.where(alen >= 1, path[1] - 1, -1)
        return jax.vmap(one)(lg_root, lg_tgt, rngs)

    seg = 512

    @jax.jit
    def seg_fwd(params, kv, toks_seg, pos_seg, valid_seg, pv):
        block = (jnp.tril(jnp.ones((seg, seg), bool))[None]
                 & valid_seg[:, None, :])
        res = tfm.forward(params, cfg, tfm.token_embed(params, toks_seg), kv,
                          pos_seg, rope, block_mask=block, prefix_valid=pv,
                          commit=True)
        return res.hidden, res.kv

    hits = np.zeros((max_depth, max_rank), np.int64)
    totals = np.zeros(max_depth, np.int64)
    for i in range(num_rollouts):
        key = jax.random.fold_in(rng, i)
        res = ar.generate_tokens(params, cfg, tp, T, cfg_scale, warp, key,
                                 logits_mask=logits_mask, logits_fn=logits_fn,
                                 kv_quant=kv_quant)
        toks = res.tokens
        res = None
        full = jnp.concatenate(
            [tp.tokens, jnp.broadcast_to(toks[None], (2, T))], axis=1)
        last_pos = tp.positions[:, -1]
        gen_pos = last_pos[:, None] + 1 + jnp.arange(T)[None]
        positions = jnp.concatenate([tp.positions, gen_pos], axis=1)
        valid = jnp.concatenate([tp.valid, jnp.ones((2, T), bool)], axis=1)
        n_full = full.shape[1]
        pad = (-n_full) % seg
        full_p = jnp.pad(full, ((0, 0), (0, pad)))
        pos_p = jnp.pad(positions, ((0, 0), (0, pad)), mode="edge")
        valid_p = jnp.pad(valid, ((0, 0), (0, pad)))
        kv = KVCache.create(cfg, 2, max_len=n_full + pad, quantized=kv_quant)
        pv = jnp.pad(valid_p, ((0, 0), (0, kv.max_len - valid_p.shape[1])),
                     constant_values=True)
        parts = []
        for lo in range(0, n_full + pad, seg):
            h, kv = seg_fwd(params, kv, full_p[:, lo:lo + seg],
                            pos_p[:, lo:lo + seg], valid_p[:, lo:lo + seg],
                            pv)
            parts.append(h)
        hid = jnp.concatenate(parts, axis=1)[:, :n_full]
        kv = None
        cond_pos = positions[0]
        mc_key = jax.random.fold_in(key, 999)
        for d in range(1, max_depth + 1):
            # valid roots: target row t + d must exist
            Td = T - d
            if Td <= 0:
                break
            for lo in range(0, Td, chunk):
                hi = min(lo + chunk, Td)
                root_rows = jnp.arange(L - 1 + lo, L - 1 + hi)
                tgt_rows = root_rows + d
                rngs = jax.vmap(jax.random.fold_in, (None, 0))(
                    jax.random.fold_in(mc_key, d),
                    jnp.arange(lo, hi, dtype=jnp.uint32))
                ranks = np.asarray(chunk_accepts(
                    params, hid[:, root_rows], hid[:, tgt_rows],
                    cond_pos[root_rows], rngs,
                    jnp.asarray(d, jnp.int32)))
                for r in range(max_rank):
                    hits[d - 1, r] += int((ranks == r).sum())
                totals[d - 1] += ranks.shape[0]
    probs = hits / np.maximum(totals, 1)[:, None]
    return np.maximum(probs, 1e-4)


def measure_drafter_accept_probs(
    params: dict,
    dparams: dict,
    cfg: ModelConfig,
    dcfg: DrafterConfig,
    cond,
    uncond,
    rng: jax.Array,
    nearest: jnp.ndarray,
    lantern,
    num_tokens: Optional[int] = None,
    max_rank: int = 10,
    max_depth: int = 6,
    cfg_scale: float = 3.0,
    warp: LogitsWarp = LogitsWarp(),
    num_rollouts: int = 1,
    chunk: int = 64,
) -> np.ndarray:
    """Depth x rank STOCHASTIC-walk acceptance probabilities for a trained
    EAGLE drafter on a caption/label-cond (LlamaGen) model — the drafter
    counterpart of ``measure_stale_accept_probs`` (same star-tree Monte
    Carlo through the real ``stochastic_verify_tree``; same rationale: the
    greedy rank-match matrix mis-sizes trees for the sampling lane).

    Teacher-forced along a base rollout (the standard EAGLE independence
    approximation): the depth-d proposal distribution is the drafter's
    CFG-combined head distribution at the row scoring toks[t+d] with the
    TRUE path's (token, base-hidden) inputs; the target is the base model's
    distribution at the same position.  Alignment note: unlike the
    stale/passthrough case there is no extra staleness offset — the drafter
    genuinely conditions on position t+d-1's token and hidden.
    """
    from ..ops import acceptance as acc
    from ..ops.sampling import sample_without_replacement, warp_logits

    num_tokens = num_tokens or cfg.block_size
    rope = tfm.make_rope_tables(cfg)
    drope = tfm.make_rope_tables(dcfg.model)
    Tc = cfg.cls_token_num
    head = tfm.logits_head
    K = max_rank
    children = np.full((K + 1, K), -1, np.int32)
    children[0] = np.arange(1, K + 1)

    @jax.jit
    def all_logits(params, dparams, toks):
        """-> (base logits [T?, V] row t scores toks[t+1] ... , drafter
        logits aligned the same way), f32, CFG-combined."""
        cond_pair = (
            jnp.concatenate([cond, uncond], axis=0)
            if cfg.cond_kind == "caption"
            else jnp.concatenate([jnp.atleast_1d(cond), jnp.atleast_1d(uncond)])
        )
        hid = _teacher_hidden(params, cfg, cond_pair, toks, rope)
        T = toks.shape[0]
        Dp = Tc - 1 + T
        dr_tokens = jnp.broadcast_to(
            jnp.concatenate([jnp.zeros((Tc - 1,), toks.dtype), toks])[None],
            (2, Dp))
        mcfg = dcfg.model.replace(use_flash_attention=False)
        kv = KVCache.create(mcfg, 2, max_len=Dp)
        x = drf.fuse_inputs(dparams, dr_tokens, hid[:, :Dp])
        out = tfm.forward(dparams, mcfg, x, kv, jnp.arange(Dp), drope,
                          commit=False).hidden
        # base row Tc-1+u scores toks[u]; drafter row Tc-1+u scores toks[u+1]
        base_lg = cfg_combine(head(params, hid[:, Tc - 1: Tc - 1 + T]),
                              cfg_scale)[0].astype(jnp.float32)   # [T, V]
        dr_lg = cfg_combine(head(params, out[:, Tc - 1: Tc - 1 + T]),
                            cfg_scale)[0].astype(jnp.float32)     # [T, V]
        return base_lg, dr_lg

    @jax.jit
    def chunk_accepts(prop_rows, tgt_rows, rngs):
        def one(lg_p, lg_t, r):
            r_draw, r_walk = jax.random.split(r)
            s = jax.nn.softmax(warp_logits(lg_p[None], warp), axis=-1)
            idx, q = sample_without_replacement(r_draw, s, K)
            node_logits = jnp.concatenate(
                [lg_t[None], jnp.zeros((K, lg_t.shape[0]), jnp.float32)])
            tree_tokens = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), idx[0]])
            node_q = jnp.concatenate([jnp.ones((1,), jnp.float32), q[0]])
            path, alen, _ = acc.stochastic_verify_tree(
                r_walk, node_logits, tree_tokens, jnp.asarray(children),
                depth=1, warp=warp, nearest=nearest, lantern=lantern,
                node_q=node_q, level_probs=(s,),
                node_level_row=jnp.zeros((K + 1,), jnp.int32),
                batch_warp=False,
            )
            return jnp.where(alen >= 1, path[1] - 1, -1)
        return jax.vmap(one)(prop_rows, tgt_rows, rngs)

    hits = np.zeros((max_depth, max_rank), np.int64)
    totals = np.zeros(max_depth, np.int64)
    for i in range(num_rollouts):
        key = jax.random.fold_in(rng, i)
        res = ar.generate(params, cfg, cond, uncond, num_tokens, cfg_scale,
                          warp, key)
        toks = res.tokens
        base_lg, dr_lg = all_logits(params, dparams, toks)
        T = int(toks.shape[0])
        mc_key = jax.random.fold_in(key, 999)
        for d in range(1, max_depth + 1):
            # root committed toks[t]; level-d children score toks[t+d]:
            # proposal = drafter row t+d-1, target = base row t+d
            Td = T - d
            if Td <= 0:
                break
            for lo in range(0, Td, chunk):
                hi = min(lo + chunk, Td)
                rows = jnp.arange(lo, hi)
                rngs = jax.vmap(jax.random.fold_in, (None, 0))(
                    jax.random.fold_in(mc_key, d),
                    jnp.arange(lo, hi, dtype=jnp.uint32))
                ranks = np.asarray(chunk_accepts(
                    dr_lg[rows + d - 1], base_lg[rows + d], rngs))
                for r in range(max_rank):
                    hits[d - 1, r] += int((ranks == r).sum())
                totals[d - 1] += ranks.shape[0]
    probs = hits / np.maximum(totals, 1)[:, None]
    return np.maximum(probs, 1e-4)
