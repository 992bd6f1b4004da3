"""EAGLE-style drafter: a shallow decoder predicting the base model's next
hidden state from (token embedding, previous base hidden) pairs.

Reference: models/drafters/cnets_llamagen.py (Model).  Structure:
``h = fc([embed(tok), base_hidden])`` -> N decoder layers (layer 0 without
input norm, no final norm) -> next-hidden prediction; logits come from the
*base* model's lm_head applied to drafter hiddens, CFG-combined across the
leading cond/uncond batch pair at every draft step.

TPU-first deltas vs the reference host loops:
- The drafter KV cache is a static-shape ``KVCache``; expansion levels write
  *provisional* rows at fixed offsets past the committed prefix, and the
  accepted-token extension next step simply overwrites them (no cache
  truncation, replacing the reference's ``stable_kv`` snapshotting,
  cnets_llamagen.py:750-757).
- Static-tree drafting (``draft_static``, EAGLE-1 / LANTERN++,
  topK_genrate_v1 cnets_llamagen.py:944-1023) unrolls the per-level loop with
  per-level static shapes from the compiled ``TreeSpec``.
- Dynamic drafting (``draft_dynamic``, EAGLE-2, topK_genrate
  cnets_llamagen.py:732-912) keeps the whole beam expansion and tree
  re-assembly (ancestor closure, path table, lexicographic path sort) on
  device with static shapes; only values are data-dependent.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import DrafterConfig
from ..kv import KVCache
from ..trees import TreeSpec
from ..ops.sampling import (
    LogitsWarp,
    cfg_combine,
    sample_without_replacement,
    warp_logits,
)
from . import transformer as tfm


def init_drafter_params(rng: jax.Array, dcfg: DrafterConfig, embed: jnp.ndarray) -> dict:
    """Random-init drafter params; ``embed`` is the base model's (frozen)
    token embedding, shared by reference semantics (cnets_llamagen.py:517)."""
    m = dcfg.model
    p = tfm.init_params(rng, m)
    del p["lm_head"], p["norm"]
    p.pop("cond", None)
    p["embed"] = embed
    k = jax.random.fold_in(rng, 17)
    H = m.hidden_size
    p["fc_w"] = (jax.random.normal(k, (2 * H, H)) * 0.02).astype(m.jnp_dtype)
    p["fc_b"] = jnp.zeros((H,), m.jnp_dtype)
    return p


def fuse_inputs(params: dict, tokens: jnp.ndarray, hidden: jnp.ndarray) -> jnp.ndarray:
    """fc([embed(tokens), hidden]) (cnets_llamagen.py:680)."""
    from ..ops.quant import mm

    emb = params["embed"][tokens].astype(hidden.dtype)
    x = jnp.concatenate([emb, hidden], axis=-1)
    return mm(x, params, "fc_w") + params["fc_b"]


def extend(
    params: dict,
    dcfg: DrafterConfig,
    rope,
    kv: KVCache,
    tokens: jnp.ndarray,        # [B2, T] next-token ids (shifted-left stream)
    hidden: jnp.ndarray,        # [B2, T, H] base hiddens aligned with tokens
    n_valid,                    # traced: rows actually accepted (<= T)
    prefix_valid: Optional[jnp.ndarray] = None,
    positions: Optional[jnp.ndarray] = None,
    pos_offsets: Optional[jnp.ndarray] = None,
    block_valid: Optional[jnp.ndarray] = None,
) -> tuple[jnp.ndarray, KVCache]:
    """Append accepted (token, hidden) pairs to the drafter's committed
    prefix.  Writes all T rows (tail past ``n_valid`` is garbage that later
    writes overwrite) but advances the cache length by ``n_valid`` only.
    Returns the drafter output hiddens [B2, T, H] and the updated cache.

    ``pos_offsets`` [2]: per-branch position offsets (Chameleon sequential-
    prompt CFG: the uncond stream restarts near 0, cnets_anole.py:817-830);
    positions are clamped at 0.  ``positions`` overrides entirely.
    ``block_valid`` [B2, T]: pad mask over THIS block's rows (Chameleon
    prompt prefill — the reference threads the left-pad attention_mask into
    the drafter's own forward, cnets_anole.py:721-737; the LlamaGen drafter
    takes no mask, cnets_llamagen.py:732)."""
    T = tokens.shape[1]
    x = fuse_inputs(params, tokens, hidden)
    if positions is None:
        positions = kv.length + jnp.arange(T)
        if pos_offsets is not None:
            positions = jnp.maximum(positions[None, :] - pos_offsets[:, None], 0)
    block_mask = None
    if block_valid is not None:
        block_mask = (jnp.tril(jnp.ones((T, T), bool))[None]
                      & block_valid[:, None, :].astype(bool))
    res = tfm.forward(
        params, dcfg.model, x, kv, positions, rope,
        prefix_valid=prefix_valid, block_mask=block_mask, commit=False,
    )
    return res.hidden, res.kv.commit(n_valid)


def _head_logits(
    base_lm_head: jnp.ndarray, hidden: jnp.ndarray, cfg_scale: float,
    logits_mask: Optional[jnp.ndarray] = None,
    logits_fn=None, positions: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Base lm_head over drafter hiddens, CFG-combined: [2, T, H] -> [T, V].
    ``logits_mask`` (bool [V], True = forbidden) suppresses non-image tokens
    (Chameleon families, cnets_anole.py:837); ``logits_fn`` applies the
    position-indexed constraints inside the drafter (Lumina,
    cnets_lumina_mgpt.py:1187-1224)."""
    from ..ops.quant import head_matmul

    logits = head_matmul(hidden, base_lm_head)
    logits = cfg_combine(logits, cfg_scale)[0]
    if logits_mask is not None:
        logits = jnp.where(logits_mask, jnp.finfo(jnp.float32).min, logits)
    if logits_fn is not None:
        logits = logits_fn(logits, positions)
    return logits


def _level_prefix_mask(kv_len, S: int, lvl_mask: jnp.ndarray, offset: int, T: int,
                       prefix_valid: Optional[jnp.ndarray] = None):
    """[T, S] (or [2, T, S] with ``prefix_valid``) visibility: committed
    prefix + provisional rows [0, offset) with ancestor visibility from the
    level's compiled mask.  ``prefix_valid`` [2, S] hides left-pad prompt
    rows per CFG branch (Chameleon drafters thread the pad attention_mask
    through every draft forward, cnets_anole.py:721-737; pass None for
    LlamaGen, whose drafter takes no mask)."""
    j = jnp.arange(S)
    pm = jnp.broadcast_to(j[None, :] < kv_len, (T, S))
    if offset > 0:
        pm = jax.lax.dynamic_update_slice(
            pm, lvl_mask[:, :offset], (0, kv_len.astype(jnp.int32))
        )
    if prefix_valid is not None:
        pm = pm[None] & prefix_valid[:, None, :].astype(bool)
    return pm


class StaticDraft(NamedTuple):
    ss_token: jnp.ndarray        # [G, K] sampled tokens, level-major rows
    ss_prob: jnp.ndarray         # [G, K] residual q-probs (sampling) / logits
    level_probs: Tuple[jnp.ndarray, ...]  # per level [rows, V] full dists


def _sample_rows(logits, rng, K: int, warp: LogitsWarp, pin):
    """[rows, V] cfg-combined logits -> (idx [rows,K], q [rows,K], dist).

    Shared by ``draft_static`` (per-level drafter logits) and ``draft_stale``
    (one stale distribution broadcast per level); behavior must stay
    bit-identical between the two callers for the passthrough-equivalence
    contract (tests/test_stale_draft.py)."""
    if warp.active:
        probs = jax.nn.softmax(warp_logits(logits, warp), axis=-1)
        if pin is not None:
            p_sel, idx = jax.lax.top_k(probs, K)
            prev_cum = jnp.cumsum(p_sel, axis=-1) - p_sel
            q = p_sel / (1.0 - prev_cum)
            q = jnp.where(jnp.isfinite(q), jnp.clip(q, 0.0, 1.0), 0.0)
            return idx.astype(jnp.int32), q, probs
        idx, q = sample_without_replacement(rng, probs, K)
        return idx, q, probs
    idx = jax.lax.top_k(logits, K)[1].astype(jnp.int32)
    vals = jnp.take_along_axis(logits, idx, axis=-1)
    return idx, vals, jnp.zeros((logits.shape[0], 0), jnp.float32)


def draft_stale(
    spec: TreeSpec,
    root_logits: jnp.ndarray,    # [V] raw cfg-combined logits at the root
    length: jnp.ndarray,         # [] committed base length (FSM position base)
    warp: LogitsWarp,
    rng: jax.Array,
    logits_mask: Optional[jnp.ndarray] = None,
    logits_fn=None,
    pin: Optional[float] = None,
) -> StaticDraft:
    """Drafter-free static drafting from one stale distribution.

    The hidden-passthrough drafter (``fc_w = [0; I]``, zeroed decoder layers
    — the measured-optimal drafter on a random-weight base, PERF.md "Lumina
    drafter study") has a structural invariant: its output hidden equals its
    input hidden regardless of the proposed token, so EVERY node of the draft
    tree proposes from the SAME distribution — the base model's raw logits at
    the root, which the verify step already computed (spec._verify_and_update
    ``logits_all`` at the last accepted node).  ``draft_static`` with
    passthrough params therefore spends ``depth`` drafter forwards plus
    ``depth+1`` base-lm_head matmuls (at Lumina-7B geometry ~1.6 GB of
    re-streamed int8 head weights per step) recomputing a distribution it
    already holds.

    This function produces the IDENTICAL ``StaticDraft`` (same tokens, same
    residual q, same level distributions, same rng consumption order) with
    zero forwards: per level it re-applies the position-indexed constraints
    (``logits_mask`` / Lumina grid FSM) to the stale logits at that level's
    parent position — the only thing that actually varies across levels —
    broadcasts to the level's row count, and samples.  Engine wiring:
    ``SpecDecodeConfig(stale_draft=True)`` (spec.py), which also skips the
    drafter extension after acceptance.  Replaces the reference's per-level
    ``self.ea_layer(...)`` + head calls in topK_genrate_v1
    (cnets_llamagen.py:944-1023) for this drafter class.
    """
    K = spec.topk
    lg0 = root_logits.astype(jnp.float32)[None, :]               # [1, V]
    if logits_mask is not None:
        lg0 = jnp.where(logits_mask, jnp.finfo(jnp.float32).min, lg0)
    V = lg0.shape[-1]

    n_levels = len(spec.levels) + 1
    # ONE batched warp serves every level: iteration i's rows sit at parent
    # cond position length + i (the same positions draft_static feeds
    # _head_logits), and all rows of a level share one distribution, so the
    # per-level inputs are [n_levels, V] — the warp (whose top-k threshold
    # search is the expensive part at V=65536) runs once batched instead of
    # as a serial chain of n_levels single-row passes (measured 0.30 ms ->
    # ~0.07 ms at Lumina bench shapes, scripts/profile_lumina_glue.py r5).
    # Row-wise warp/softmax results are identical to the per-level passes
    # (tests/test_stale_draft.py keeps the drafter-path equivalence).
    lgs = jnp.broadcast_to(lg0, (n_levels, V))
    if logits_fn is not None:
        lgs = logits_fn(lgs, length + jnp.arange(n_levels, dtype=jnp.int32))
    if warp.active and pin is None:
        dists = jax.nn.softmax(warp_logits(lgs, warp), axis=-1)

    level_rows = [1] + [len(l.child_flat_idx) for l in spec.levels]
    ss_token, ss_prob, level_probs = [], [], []
    if warp.active and pin is None:
        # one batched Gumbel top-k serves every level's sampling: the
        # per-level perturbed scores stack into [sum(rows), V] and a single
        # lax.top_k replaces the serial per-level chain.  The Gumbel noise
        # still draws from the SAME per-level rng keys in the same order,
        # and top-k/q math is row-wise, so the result is bit-identical to
        # the per-level sample_without_replacement calls
        # (tests/test_stale_draft.py).
        zs, keep_dists = [], []
        for i, rows in enumerate(level_rows):
            rng, r = jax.random.split(rng)
            logp = jnp.log(jnp.maximum(dists[i], 1e-30))
            u = jax.random.uniform(r, (rows, V), minval=1e-20, maxval=1.0)
            zs.append(logp[None] + (-jnp.log(-jnp.log(u))))
            keep_dists.append(jnp.broadcast_to(dists[i: i + 1], (rows, V)))
        _, idx_all = jax.lax.top_k(jnp.concatenate(zs, axis=0), K)
        off = 0
        for i, rows in enumerate(level_rows):
            idx = idx_all[off: off + rows].astype(jnp.int32)
            off += rows
            p_sel = jnp.take_along_axis(
                jnp.broadcast_to(dists[i: i + 1], (rows, V)), idx, axis=-1)
            prev_cum = jnp.cumsum(p_sel, axis=-1) - p_sel
            q = p_sel / (1.0 - prev_cum)
            q = jnp.where(jnp.isfinite(q), jnp.clip(q, 0.0, 1.0), 0.0)
            ss_token.append(idx)
            ss_prob.append(q)
            level_probs.append(keep_dists[i])
    else:
        for i, rows in enumerate(level_rows):
            rng, r = jax.random.split(rng)
            idx1, q1, dist1 = _sample_rows(lgs[i: i + 1], r, K, warp, pin)
            idx = jnp.broadcast_to(idx1, (rows, K))
            q = jnp.broadcast_to(q1, (rows, K))
            dist = jnp.broadcast_to(dist1, (rows, dist1.shape[-1]))
            ss_token.append(idx)
            ss_prob.append(q)
            level_probs.append(dist)

    return StaticDraft(
        ss_token=jnp.concatenate(ss_token, axis=0),
        ss_prob=jnp.concatenate(ss_prob, axis=0).astype(jnp.float32),
        level_probs=tuple(level_probs),
    )


def draft_static(
    params: dict,
    dcfg: DrafterConfig,
    spec: TreeSpec,
    rope,
    kv: KVCache,
    root_hidden: jnp.ndarray,    # [2, 1, H] drafter output at the root token
    base_lm_head: jnp.ndarray,
    cfg_scale: float,
    warp: LogitsWarp,
    rng: jax.Array,
    pos_offsets: Optional[jnp.ndarray] = None,
    logits_mask: Optional[jnp.ndarray] = None,
    logits_fn=None,
    prefix_valid: Optional[jnp.ndarray] = None,
    pin: Optional[float] = None,
) -> tuple[StaticDraft, KVCache]:
    """EAGLE-1 static-tree drafting (topK_genrate_v1).  Returns the draft and
    the cache whose buffer now holds the provisional tree-level rows (length
    unchanged).

    ``pin`` (parity-test hook, see SpecDecodeConfig.pin): proposals become
    deterministic top-k of the warped distribution, with the same residual
    q-probs the sampled path computes."""
    K = spec.topk
    S = kv.max_len
    sampling = warp.active

    ss_token, ss_prob, level_probs = [], [], []
    out_hidden = root_hidden

    def sample_rows(logits, rng):
        return _sample_rows(logits, rng, K, warp, pin)

    def level_positions(d, T):
        pos = kv.length + jnp.zeros((T,), jnp.int32) + d
        if pos_offsets is not None:
            pos = jnp.maximum(pos[None, :] - pos_offsets[:, None], 0)
        return pos

    # the root row scores depth-1 tokens, which sit at cond position
    # kv.length + 1 -> FSM node-position argument is kv.length
    logits = _head_logits(base_lm_head, out_hidden, cfg_scale, logits_mask,
                          logits_fn, kv.length + jnp.zeros((1,), jnp.int32))
    n_levels = len(spec.levels) + 1
    for d in range(n_levels):
        rng, r = jax.random.split(rng)
        idx, q, dist = sample_rows(logits, r)
        ss_token.append(idx)
        ss_prob.append(q)
        level_probs.append(dist)
        if d == len(spec.levels):
            break
        lvl = spec.levels[d]
        flat_tok = idx.reshape(-1)[lvl.child_flat_idx]               # [n_d]
        tokens = jnp.broadcast_to(flat_tok[None, :], (2, flat_tok.shape[0]))
        parent_hidden = out_hidden[:, lvl.parent_row]                # [2, n_d, H]
        x = fuse_inputs(params, tokens, parent_hidden)
        T = tokens.shape[1]
        off = lvl.block_offset
        lvl_mask = np.asarray(lvl.attn_mask)
        res = tfm.forward(
            params, dcfg.model, x, kv,
            positions=level_positions(d, T),
            rope=rope,
            block_mask=lvl_mask[:, off:],
            prefix_override=_level_prefix_mask(kv.length, S, lvl_mask, off, T,
                                               prefix_valid),
            commit=False,
            write_offset=off,
        )
        kv = res.kv
        out_hidden = res.hidden
        # level-d rows are depth-(d+1) nodes: drafter index kv.length + d,
        # hence cond position kv.length + d + 1 (the drafter stream is
        # shifted one left of the cond stream) — the FSM takes the row's own
        # cond position, same convention as the verifier (spec.py)
        logits = _head_logits(base_lm_head, out_hidden, cfg_scale, logits_mask,
                              logits_fn,
                              kv.length + jnp.zeros((T,), jnp.int32) + d + 1)

    return StaticDraft(
        ss_token=jnp.concatenate(ss_token, axis=0),
        ss_prob=jnp.concatenate(ss_prob, axis=0).astype(jnp.float32),
        level_probs=tuple(level_probs),
    ), kv


class DynamicDraft(NamedTuple):
    draft_tokens: jnp.ndarray       # [N+1] incl. committed root token
    retrieve_indices: jnp.ndarray   # [N+1, depth+2] all-node root paths, -1 pad
    tree_mask: jnp.ndarray          # [N+1, N+1] ancestor|self (bool)
    tree_position_ids: jnp.ndarray  # [N+1] node depths
    children: jnp.ndarray           # [N+1, K] child slots in rank order, -1 pad


def _ancestor_closure(parent: jnp.ndarray, depth_bound: int) -> jnp.ndarray:
    """parent[i] in [0..N] (root's parent = 0) -> ancestor-or-self matrix.
    Column 0 (root) always visible, mirroring generate_tree_buffers."""
    n = parent.shape[0]
    A = jnp.eye(n, dtype=bool).at[:, 0].set(True)
    for _ in range(depth_bound):
        A = A | A[parent]
    return A


def draft_dynamic(
    params: dict,
    dcfg: DrafterConfig,
    rope,
    kv: KVCache,
    root_hidden: jnp.ndarray,    # [2, 1, H]
    root_token: jnp.ndarray,     # [] committed root token id
    base_lm_head: jnp.ndarray,
    cfg_scale: float,
    warp: LogitsWarp,
    pos_offsets: Optional[jnp.ndarray] = None,
    logits_mask: Optional[jnp.ndarray] = None,
    logits_fn=None,
    prefix_valid: Optional[jnp.ndarray] = None,
) -> tuple[DynamicDraft, KVCache]:
    """EAGLE-2 dynamic beam drafting (topK_genrate, cnets_llamagen.py:732-912).

    Beam-expands ``depth`` levels keeping the global top-k cumulative
    log-prob nodes, then selects the best ``total_tokens - 1`` nodes overall
    and re-assembles them into a tree, entirely on device.
    """
    K, depth = dcfg.top_k, dcfg.depth
    N = dcfg.total_tokens - 1          # nodes excl. root
    S = kv.max_len

    def head_logp(hidden, positions):
        logits = _head_logits(base_lm_head, hidden, cfg_scale, logits_mask,
                              logits_fn, positions)
        logits = warp_logits(logits, warp)
        return jax.nn.log_softmax(logits, axis=-1)

    lp = head_logp(root_hidden, kv.length + jnp.zeros((1,), jnp.int32))
    topk_p, topk_i = jax.lax.top_k(lp, K)
    scores = topk_p[0]                                           # [K]
    scores_list = [scores]                                       # level blobs
    ss_list = [topk_i[0]]
    parents_list = [jnp.zeros((1,), jnp.int32)]

    tokens = jnp.broadcast_to(topk_i, (2, K)).astype(jnp.int32)
    input_hidden = jnp.broadcast_to(root_hidden, (2, K, root_hidden.shape[-1]))
    tree_mask = jnp.eye(K, dtype=bool)                           # [K, K*(i+1)]
    topk_cs_index = jnp.arange(K, dtype=jnp.int32)

    for i in range(depth):
        x = fuse_inputs(params, tokens, input_hidden)
        pm = _level_prefix_mask(kv.length, S, tree_mask, i * K, K,
                                prefix_valid)
        pos_i = kv.length + jnp.zeros((K,), jnp.int32) + i
        if pos_offsets is not None:
            pos_i = jnp.maximum(pos_i[None, :] - pos_offsets[:, None], 0)
        res = tfm.forward(
            params, dcfg.model, x, kv,
            positions=pos_i,
            rope=rope,
            block_mask=tree_mask[:, i * K:],
            prefix_override=pm,
            commit=False,
            write_offset=i * K,
        )
        kv = res.kv
        out_hidden = res.hidden                                   # [2, K, H]

        bias = 1 + K * K * max(i - 1, 0) + (K if i > 0 else 0)
        parents_list.append(topk_cs_index + bias)

        # beam level-i rows sit at cond position kv.length + i + 1 (see the
        # static-path comment on the drafter stream shift)
        lp = head_logp(out_hidden, kv.length + jnp.zeros((K,), jnp.int32) + i + 1)
        topk_p, topk_i = jax.lax.top_k(lp, K)                     # [K, K]
        cu = topk_p + scores[:, None]
        scores, topk_cs_index = jax.lax.top_k(cu.reshape(-1), K)
        topk_cs_index = topk_cs_index.astype(jnp.int32)
        out_ids = topk_cs_index // K
        input_hidden = out_hidden[:, out_ids]
        tokens = jnp.broadcast_to(
            topk_i.reshape(-1)[topk_cs_index][None, :], (2, K)
        ).astype(jnp.int32)
        ss_list.append(topk_i.reshape(-1))
        scores_list.append(cu.reshape(-1))
        tree_mask = jnp.concatenate(
            [tree_mask[out_ids], jnp.eye(K, dtype=bool)], axis=1
        )

    scores_flat = jnp.concatenate(scores_list)                    # [K + depth*K^2]
    ss_flat = jnp.concatenate(ss_list)
    _, top_idx = jax.lax.top_k(scores_flat, N)
    top_idx = jnp.sort(top_idx).astype(jnp.int32)

    draft_tokens = jnp.concatenate(
        [root_token.reshape(1).astype(jnp.int32), ss_flat[top_idx]]
    )
    parents_flat = jnp.concatenate(parents_list)                  # [1 + depth*K]
    draft_parents = parents_flat[top_idx // K]
    mask_index = jnp.searchsorted(top_idx, draft_parents - 1).astype(jnp.int32)
    mask_index = jnp.where(draft_parents == 0, -1, mask_index) + 1  # [N] slots

    parent = jnp.concatenate([jnp.zeros((1,), jnp.int32), mask_index])
    A = _ancestor_closure(parent, depth + 1)                      # [N+1, N+1]
    tree_position_ids = jnp.sum(A, axis=1).astype(jnp.int32) - 1

    # children table for the tree-walk verifier: child slots per parent in
    # sibling-rank order (rank = count of earlier slots with the same parent)
    n1 = N + 1
    slots = jnp.arange(n1, dtype=jnp.int32)
    # exclude slot 0: parent[0] is self-referentially 0, which would count
    # the root as an earlier sibling of its own children (shifting their
    # ranks and dropping the K-th child off the table)
    same_parent_before = (parent[None, :] == parent[:, None]) & (
        slots[None, :] < slots[:, None]
    ) & (slots[None, :] > 0)
    sib_rank = jnp.sum(same_parent_before, axis=1).astype(jnp.int32)
    children = jnp.full((n1, K), -1, jnp.int32)
    children = children.at[parent[1:], sib_rank[1:]].set(slots[1:])

    # all-node root paths (prefix-closed superset of the reference's leaf
    # rows — identical acceptance semantics, static shape)
    D = depth + 2
    paths = jnp.full((n1, D), -1, jnp.int32)
    cur = jnp.arange(n1, dtype=jnp.int32)
    col = tree_position_ids                                      # own depth
    for _ in range(D):
        paths = paths.at[jnp.arange(n1), jnp.clip(col, 0)].set(
            jnp.where(col >= 0, cur, paths[jnp.arange(n1), jnp.clip(col, 0)])
        )
        cur = parent[cur]
        col = col - 1
    # lexicographic sort with pads last (reference custom_sort)
    big = n1 + 5
    keys = jnp.where(paths < 0, big, paths)
    order = jnp.lexsort([keys[:, c] for c in range(D - 1, -1, -1)])
    paths = paths[order]

    return DynamicDraft(
        draft_tokens=draft_tokens,
        retrieve_indices=paths,
        tree_mask=A,
        tree_position_ids=tree_position_ids,
        children=children,
    ), kv
