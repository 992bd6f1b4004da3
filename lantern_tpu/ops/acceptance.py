"""Speculative-decoding acceptance rules as pure, jittable jnp functions.

Four rules, matching the reference's verifier semantics with static shapes and
on-device PRNG (no host syncs):

- ``greedy_verify``            strict tree verification (argmax match)
- ``greedy_verify`` w/ lantern LANTERN relaxed acceptance, vectorized
- ``stochastic_verify``        EAGLE-2 multi-round rejection sampling (q == 1)
- ``stochastic_verify_multidraft``  EAGLE-1 rejection sampling with drafter
                               residual probabilities (q from the draft tree)

Shapes: ``path_logits`` [P, D, V] (CFG-combined base logits gathered along the
P leaf->root paths of length D = max_depth+1), ``candidates`` [P, D] int32 with
-1 padding.  Returns ``(best_path, accept_len, dist)`` where ``accept_len``
counts accepted tokens *after* the committed root and ``dist`` is the
distribution (or raw logits, for greedy) to sample the bonus token from.

LANTERN relaxation (reference: models/ea_model_llamagen.py:508-595, 621-658,
743-779): for a drafted token x, neighbor probabilities of the k nearest VQ
codes are aggregated into p(x) as long as the total-variation-distance penalty
stays within delta.  The reference computes the TVD via concatenated
target/approx tensors; algebraically that TVD reduces to the plain cumulative
sum of neighbor probabilities (0.5*cumsum from the inflated-p(x) slot plus
0.5*cumsum from the zeroed neighbor slots), which is exactly the quantity its
stochastic branch thresholds.  We implement the reduced form directly.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from .sampling import LogitsWarp, warp_logits


class LanternSpec(NamedTuple):
    """Static relaxed-acceptance config. ``k == 0`` disables the relaxation.

    ``k`` also fixes the neighbor-table width compiled into the program; the
    *effective* operating point can be overridden per call with traced scalars
    (``k_eff <= k``, ``delta_eff``) so one compiled engine serves a whole
    (k, delta) sweep — jit recompiles cost ~15 min over this environment's
    remote-TPU tunnel, a runtime operating point costs nothing."""

    k: int = 0
    delta: float = 0.0

    @property
    def enabled(self) -> bool:
        return self.k > 0

    def runtime(self, k_eff=None, delta_eff=None) -> "LanternRT":
        """Resolve the traced operating point (defaults = the static one)."""
        k = self.k if k_eff is None else k_eff
        d = self.delta if delta_eff is None else delta_eff
        return LanternRT(k=jnp.asarray(k, jnp.int32),
                         delta=jnp.asarray(d, jnp.float32))


class LanternRT(NamedTuple):
    """Traced (k, delta) operating point; shapes stay those of the static
    ``LanternSpec.k`` table width."""

    k: jnp.ndarray        # int32 scalar, <= spec.k
    delta: jnp.ndarray    # f32 scalar


def _neighbor_budget_index(
    cumsum_neighbors: jnp.ndarray, px: jnp.ndarray, delta, k_eff=None
) -> jnp.ndarray:
    """Largest neighbor index whose cumulative prob stays within the TVD budget
    (delta, or (delta-1)*p(x) in the multiplicative delta>1 mode); -1 if none.
    ``delta`` may be a python float (static) or a traced scalar; ``k_eff``
    (traced) masks neighbors past the effective table width."""
    if isinstance(delta, (int, float)):
        if delta > 1.0:
            ok = cumsum_neighbors <= (delta - 1.0) * px[..., None]
        else:
            ok = cumsum_neighbors <= delta
    else:
        d = jnp.asarray(delta, jnp.float32)
        ok = jnp.where(
            d > 1.0,
            cumsum_neighbors <= (d - 1.0) * px[..., None],
            cumsum_neighbors <= d,
        )
    idx = jnp.arange(cumsum_neighbors.shape[-1], dtype=jnp.int32)
    if k_eff is not None:
        ok = ok & (idx < jnp.asarray(k_eff, jnp.int32))
    idx = jnp.broadcast_to(idx, cumsum_neighbors.shape)
    return jnp.max(jnp.where(ok, idx, -1), axis=-1)


def relaxed_prob(
    probs: jnp.ndarray,
    token: jnp.ndarray,
    nearest: jnp.ndarray,
    lantern: LanternSpec,
    rt: Optional[LanternRT] = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """LANTERN-inflated acceptance probability of ``token`` under ``probs``.

    ``probs`` [..., V], ``token`` [...] int32, ``nearest`` [V, K_tab] neighbor
    table.  Returns ``(p_relaxed, budget_idx)`` with ``budget_idx == -1`` when
    no neighbor fits the budget (p unchanged).  ``rt`` (traced operating
    point) narrows the budget to ``rt.k`` neighbors / ``rt.delta``.
    """
    px = jnp.take_along_axis(probs, token[..., None], axis=-1)[..., 0]
    neigh = nearest[token][..., : lantern.k]                  # [..., k]
    np_ = jnp.take_along_axis(probs, neigh, axis=-1)          # [..., k]
    cum = jnp.cumsum(np_, axis=-1)
    if rt is None:
        j = _neighbor_budget_index(cum, px, lantern.delta)    # [...]
    else:
        j = _neighbor_budget_index(cum, px, rt.delta, k_eff=rt.k)
    gain = jnp.take_along_axis(cum, jnp.maximum(j, 0)[..., None], axis=-1)[..., 0]
    return jnp.where(j >= 0, px + gain, px), j


def greedy_verify(
    path_logits: jnp.ndarray,
    candidates: jnp.ndarray,
    nearest: Optional[jnp.ndarray] = None,
    lantern: LanternSpec = LanternSpec(),
    rt: Optional[LanternRT] = None,
):
    """Strict (or LANTERN-relaxed) greedy tree verification, fully vectorized.

    Matches /root/reference/models/ea_model_llamagen.py:789-905: a drafted
    token is accepted iff it is the argmax of the (relaxed) base distribution
    at its position; per-path accept length is the cumprod run-length; the best
    path is the argmax of accept lengths (first on ties).

    Returns ``(best_path, accept_len, bonus_logits)`` where ``bonus_logits``
    are the raw CFG-combined logits at the position after the last accepted
    token (the caller samples/argmaxes the bonus token from them).
    """
    P, D, V = path_logits.shape
    xi = candidates[:, 1:]                       # [P, D-1]
    valid = xi >= 0
    xi_safe = jnp.maximum(xi, 0)

    if lantern.enabled:
        if nearest is None:
            raise ValueError("lantern acceptance requires a nearest-latent table")
        probs = jax.nn.softmax(path_logits[:, :-1], axis=-1)  # [P, D-1, V]
        px_rel, _ = relaxed_prob(probs, xi_safe, nearest, lantern, rt)
        # scatter the inflated prob back and re-argmax (reference:581-587)
        probs = jnp.where(
            jax.nn.one_hot(xi_safe, V, dtype=bool), px_rel[..., None], probs
        )
        top = jnp.argmax(probs, axis=-1)
    else:
        top = jnp.argmax(path_logits[:, :-1], axis=-1)        # [P, D-1]

    match = (xi == top) & valid
    accept_per_path = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
    accept_len = jnp.max(accept_per_path)
    best = jnp.where(accept_len == 0, 0, jnp.argmax(accept_per_path)).astype(jnp.int32)
    bonus_logits = path_logits[best, accept_len]
    return best, accept_len, bonus_logits


def _dedup_mask(tokens: jnp.ndarray, eligible: jnp.ndarray) -> jnp.ndarray:
    """dup[j] = some eligible j' < j carries the same token (sequential-set
    dedup of the reference's ``candidates_set``, vectorized)."""
    P = tokens.shape[0]
    same = tokens[None, :] == tokens[:, None]                 # [j, j']
    earlier = jnp.tril(jnp.ones((P, P), dtype=bool), k=-1)
    return jnp.any(same & earlier & eligible[None, :], axis=1)


class _LevelState(NamedTuple):
    done: jnp.ndarray          # bool: no acceptance happened at some level
    accept_len: jnp.ndarray    # int32: accepted candidates incl. root (starts 1)
    best: jnp.ndarray          # int32 path index
    sample_dist: jnp.ndarray   # [V] residual distribution (valid if adjusted)
    adjusted: jnp.ndarray      # bool: sample_dist holds a residual


def stochastic_verify(
    rng: jax.Array,
    path_logits: jnp.ndarray,
    candidates: jnp.ndarray,
    warp: LogitsWarp,
    nearest: Optional[jnp.ndarray] = None,
    lantern: LanternSpec = LanternSpec(),
    q_probs: Optional[jnp.ndarray] = None,
    level_probs: Optional[Sequence[jnp.ndarray]] = None,
    p_indices: Optional[jnp.ndarray] = None,
    b_indices: Optional[jnp.ndarray] = None,
    tree_tokens: Optional[jnp.ndarray] = None,
    uniforms: Optional[jnp.ndarray] = None,
    rt: Optional[LanternRT] = None,
):
    """Multi-round speculative rejection sampling over the path table.

    Covers both reference variants:
    - EAGLE-2 / dynamic-tree (models/ea_model_llamagen.py:709-787): the draft
      proposal q is treated as 1, so a token is accepted with prob p(x).
      Call with ``q_probs=None``.
    - EAGLE-1 / static-tree multi-draft (models/ea_model_llamagen.py:597-669):
      q comes from the drafter's residual probabilities; on rejection the
      drafter's full distribution at the parent node (``level_probs``, indexed
      by ``p_indices``) minus already-drafted siblings (``b_indices`` slots into
      ``tree_tokens``) is subtracted from p.  Pass all four extras.

    The level loop is unrolled (static path depth); the within-level candidate
    walk is a bounded fori_loop carrying the residual distribution.  Returns
    ``(best_path, accept_len, sample_dist)`` with ``sample_dist`` [V] the
    distribution for the bonus token.

    ``uniforms`` ([D-1, P], optional; row i-1 serves level i, levels
    1..D-1 — the root needs no coin) overrides the per-trial uniform draws,
    used by parity tests to pin the acceptance coin flips.
    """
    P, D, V = path_logits.shape
    multidraft = q_probs is not None
    if lantern.enabled and nearest is None:
        raise ValueError("lantern acceptance requires a nearest-latent table")

    state = _LevelState(
        done=jnp.asarray(False),
        accept_len=jnp.asarray(1, jnp.int32),
        best=jnp.asarray(0, jnp.int32),
        sample_dist=jnp.zeros((V,), jnp.float32),
        adjusted=jnp.asarray(False),
    )

    for i in range(1, D):
        if uniforms is not None:
            level_u = uniforms[i - 1]
        else:
            rng, level_rng = jax.random.split(rng)
            level_u = jax.random.uniform(level_rng, (P,))
        state = _run_level(
            state, i, level_u, path_logits, candidates, warp,
            nearest, lantern, q_probs, level_probs, p_indices, b_indices,
            tree_tokens, multidraft, rt,
        )

    # Bonus distribution: residual if the last processed level adjusted p and
    # the walk ended early, else the processed base distribution at the last
    # accepted position (reference:781-787).
    full = state.accept_len == D
    base_logits = path_logits[state.best, state.accept_len - 1]
    base_dist = jax.nn.softmax(warp_logits(base_logits, warp), axis=-1)
    use_residual = state.adjusted & (~full)
    sample_dist = jnp.where(use_residual, state.sample_dist, base_dist)
    return state.best, state.accept_len - 1, sample_dist


def _lantern_zero_mask(nearest, x, jstar, lantern: LanternSpec, rt, V: int):
    """[V] bool mask of the drafted token's aggregated neighbors to zero out
    on rejection (reference ea_model_llamagen.py:743-779).  Deliberately
    asymmetric vs the acceptance budget: the reference zeroes the first
    ``k + 1`` nearest slots while aggregating probability over ``[:k]`` —
    keep both in sync with the reference, not with each other."""
    neigh1 = nearest[x][: lantern.k + 1]
    in_k = (jnp.arange(lantern.k + 1) <= rt.k) if rt is not None \
        else jnp.ones((lantern.k + 1,), bool)
    return jnp.zeros((V,), bool).at[neigh1].set((jstar >= 0) & in_k)


def _run_level(
    state: _LevelState, i: int, uniforms: jax.Array,
    path_logits, candidates, warp, nearest, lantern,
    q_probs, level_probs, p_indices, b_indices, tree_tokens, multidraft,
    rt: Optional[LanternRT] = None,
):
    P, D, V = path_logits.shape
    # Skip the level if the walk already stopped (i != accept_length).
    active = (~state.done) & (state.accept_len == i)

    # Paths sharing the accepted prefix. The prefix equals the best path's
    # first accept_len tokens.
    pos = jnp.arange(D)
    prefix_region = pos[None, :] < state.accept_len
    prefix_eq = jnp.where(
        prefix_region, candidates == candidates[state.best][None, :], True
    )
    is_eq = jnp.all(prefix_eq, axis=1)                      # [P]

    fi = jnp.argmax(is_eq)                                  # first matching path
    gt_logits = path_logits[fi, i - 1]
    gtp0 = jax.nn.softmax(warp_logits(gt_logits, warp), axis=-1)

    tokens = candidates[:, i]
    eligible = is_eq & (tokens >= 0)
    dup = _dedup_mask(tokens, eligible)
    tryable = eligible & (~dup)

    class Carry(NamedTuple):
        gtp: jnp.ndarray
        accepted: jnp.ndarray
        best: jnp.ndarray
        adjusted: jnp.ndarray

    def body(j, c: Carry):
        do_try = tryable[j] & (~c.accepted)
        if multidraft:
            do_try = do_try & (q_probs[j, i] > 0)

        x = jnp.maximum(tokens[j], 0)
        px = c.gtp[x]
        if lantern.enabled:
            neigh = nearest[x][: lantern.k]
            cum = jnp.cumsum(c.gtp[neigh])
            if rt is None:
                jstar = _neighbor_budget_index(
                    cum[None, :], px[None], lantern.delta)[0]
            else:
                jstar = _neighbor_budget_index(
                    cum[None, :], px[None], rt.delta, k_eff=rt.k)[0]
            px = jnp.where(jstar >= 0, px + cum[jnp.maximum(jstar, 0)], px)
        qx = q_probs[j, i] if multidraft else 1.0
        acp = px / qx
        accept_now = do_try & (uniforms[j] <= acp)
        reject_now = do_try & (~accept_now)

        # --- rejection update of the residual distribution ---
        if multidraft:
            # subtract the drafter's (sibling-masked) distribution at the
            # parent node (reference:646-661)
            q = level_probs[i - 1][p_indices[j, i]]
            sib_slots = b_indices[j, i]                      # [S], -1 padded
            sib_tok = jnp.where(sib_slots >= 0, tree_tokens[jnp.maximum(sib_slots, 0)], -1)
            sib_mask = jnp.zeros((V,), bool).at[jnp.maximum(sib_tok, 0)].set(sib_tok >= 0)
            has_sib = jnp.any(sib_slots >= 0)
            q = jnp.where(sib_mask, 0.0, q)
            q = jnp.where(has_sib, q / jnp.maximum(q.sum(), 1e-30), q)
            if lantern.enabled:
                q = jnp.where(_lantern_zero_mask(nearest, x, jstar, lantern, rt, V),
                              0.0, q)
            new_gtp = jnp.maximum(c.gtp - q, 0.0)
        else:
            new_gtp = c.gtp.at[x].set(0.0)
            if lantern.enabled:
                new_gtp = jnp.where(
                    _lantern_zero_mask(nearest, x, jstar, lantern, rt, V),
                    0.0, new_gtp
                )
        s = new_gtp.sum()
        new_gtp = jnp.where(s == 0, jnp.ones((V,), jnp.float32), new_gtp)
        new_gtp = new_gtp / jnp.maximum(new_gtp.sum(), 1e-30)

        gtp = jnp.where(reject_now, new_gtp, c.gtp)
        return Carry(
            gtp=gtp,
            accepted=c.accepted | accept_now,
            best=jnp.where(accept_now, j, c.best),
            adjusted=c.adjusted | reject_now,
        )

    init = Carry(gtp=gtp0, accepted=jnp.asarray(False),
                 best=jnp.asarray(0, jnp.int32), adjusted=jnp.asarray(False))
    out = jax.lax.fori_loop(0, P, body, init)

    accepted = active & out.accepted
    return _LevelState(
        done=state.done | (active & ~out.accepted),
        accept_len=jnp.where(accepted, state.accept_len + 1, state.accept_len),
        best=jnp.where(accepted, out.best, state.best),
        sample_dist=jnp.where(active, out.gtp, state.sample_dist),
        adjusted=jnp.where(active, out.adjusted, state.adjusted),
    )


class _WalkState(NamedTuple):
    done: jnp.ndarray          # bool
    cur: jnp.ndarray           # int32 current accepted slot
    accept_len: jnp.ndarray    # int32 accepted incl. root
    path: jnp.ndarray          # [D] accepted slot chain (root at 0)
    sample_dist: jnp.ndarray   # [V]
    adjusted: jnp.ndarray      # bool


def stochastic_verify_tree(
    rng: Optional[jax.Array],
    node_logits: jnp.ndarray,      # [N+1, V] cfg-combined logits per tree slot
    tree_tokens: jnp.ndarray,      # [N+1]
    children: jnp.ndarray,         # [N+1, C] child slots, -1 padded
    depth: int,                    # static max depth (levels to walk)
    warp: LogitsWarp,
    nearest: Optional[jnp.ndarray] = None,
    lantern: LanternSpec = LanternSpec(),
    node_q: Optional[jnp.ndarray] = None,       # [N+1] drafter residual q
    level_probs: Optional[Sequence[jnp.ndarray]] = None,
    node_level_row: Optional[jnp.ndarray] = None,  # [N+1] parent's in-level row
    uniforms: Optional[jnp.ndarray] = None,     # [depth, C]
    rt: Optional[LanternRT] = None,
    batch_warp: Optional[bool] = None,
):
    """Multi-round rejection sampling as a direct tree walk.

    Semantically identical to ``stochastic_verify`` over the path table (the
    reference's is_eq/dedup row scan reduces to trying the accepted node's
    children in slot order; sibling tokens are distinct by construction), but
    costs O(depth * max_children) instead of O(depth * num_paths) sequential
    iterations — the engine's fast path.

    Returns ``(accepted_slots [depth+1], accept_len, sample_dist)`` where
    ``accepted_slots[0] == 0`` (root) and entries past ``accept_len`` are
    garbage.
    """
    N1, V = node_logits.shape
    C = children.shape[1]
    multidraft = node_q is not None
    if lantern.enabled and nearest is None:
        raise ValueError("lantern acceptance requires a nearest-latent table")

    D = depth + 1
    # The walk needs the warped target distribution at each visited node.
    # batch_warp=True warps ALL node rows up front (one batched pass — the
    # serial chain of per-visited-node warps becomes a single [N+1, V]
    # kernel; measured 0.108 ms vs ~6 x 0.059 ms at Lumina's [39, 65536],
    # scripts/profile_lumina_glue.py r5); False warps each visited row on
    # demand.  Row-wise results are mathematically identical; XLA may tile
    # the batched softmax reduction differently, so the mode is PINNABLE by
    # the caller (SpecDecodeConfig.walk_batch_warp) rather than silently
    # flipping with tree size — None keeps the legacy size heuristic
    # (advisor r4 finding; tests/test_acceptance.py asserts mode agreement).
    if batch_warp is None:
        batch_warp = N1 * V <= (1 << 20)
    warped_all = (jax.nn.softmax(warp_logits(node_logits, warp), axis=-1)
                  if batch_warp else None)

    def node_dist(cur):
        if batch_warp:
            return warped_all[cur]
        return jax.nn.softmax(warp_logits(node_logits[cur], warp), axis=-1)

    state = _WalkState(
        done=jnp.asarray(False),
        cur=jnp.zeros((), jnp.int32),
        accept_len=jnp.asarray(1, jnp.int32),
        path=jnp.zeros((D,), jnp.int32),
        sample_dist=jnp.zeros((V,), jnp.float32),
        adjusted=jnp.asarray(False),
    )

    for i in range(1, D):
        if uniforms is not None:
            u = uniforms[i - 1]
        else:
            rng, r = jax.random.split(rng)
            u = jax.random.uniform(r, (C,))

        active = (~state.done) & (state.accept_len == i)
        gtp0 = node_dist(state.cur)
        # jnp.take: children may be a host numpy constant (tracer index)
        kids = jnp.take(children, state.cur, axis=0)       # [C]
        kid_tok = jnp.where(kids >= 0, tree_tokens[jnp.maximum(kids, 0)], -1)
        # sibling tokens are distinct for real drafters (sampled without
        # replacement per node); keep the reference's dedup for generality
        dup = jnp.any(
            (kid_tok[None, :] == kid_tok[:, None])
            & jnp.tril(jnp.ones((C, C), bool), k=-1)
            & (kids >= 0)[None, :],
            axis=1,
        )
        # drafter distribution row that sampled these children = the accepted
        # node's rank within the internal nodes of its level
        lvl_row = (jnp.take(node_level_row, state.cur, axis=0)
                   if multidraft else None)

        class Carry(NamedTuple):
            gtp: jnp.ndarray
            accepted: jnp.ndarray
            slot: jnp.ndarray
            adjusted: jnp.ndarray

        def body(c, carry: Carry):
            child = kids[c]
            x = jnp.maximum(kid_tok[c], 0)
            do_try = (child >= 0) & (~carry.accepted) & (~dup[c])
            if multidraft:
                do_try = do_try & (node_q[jnp.maximum(child, 0)] > 0)
            px = carry.gtp[x]
            if lantern.enabled:
                neigh = nearest[x][: lantern.k]
                cum = jnp.cumsum(carry.gtp[neigh])
                if rt is None:
                    jstar = _neighbor_budget_index(
                        cum[None, :], px[None], lantern.delta)[0]
                else:
                    jstar = _neighbor_budget_index(
                        cum[None, :], px[None], rt.delta, k_eff=rt.k)[0]
                px = jnp.where(jstar >= 0, px + cum[jnp.maximum(jstar, 0)], px)
            qx = node_q[jnp.maximum(child, 0)] if multidraft else 1.0
            accept_now = do_try & (u[c] <= px / qx)
            reject_now = do_try & (~accept_now)

            if multidraft:
                q = level_probs[i - 1][lvl_row]
                # zero earlier-drafted siblings (children before c)
                sib_tok = jnp.where(jnp.arange(C) < c, kid_tok, -1)
                sib_mask = jnp.zeros((V,), bool).at[jnp.maximum(sib_tok, 0)].set(sib_tok >= 0)
                has_sib = c > 0
                q = jnp.where(sib_mask, 0.0, q)
                q = jnp.where(has_sib, q / jnp.maximum(q.sum(), 1e-30), q)
                if lantern.enabled:
                    q = jnp.where(
                        _lantern_zero_mask(nearest, x, jstar, lantern, rt, V),
                        0.0, q
                    )
                new_gtp = jnp.maximum(carry.gtp - q, 0.0)
            else:
                new_gtp = carry.gtp.at[x].set(0.0)
                if lantern.enabled:
                    new_gtp = jnp.where(
                        _lantern_zero_mask(nearest, x, jstar, lantern, rt, V),
                        0.0, new_gtp
                    )
            ssum = new_gtp.sum()
            new_gtp = jnp.where(ssum == 0, jnp.ones((V,), jnp.float32), new_gtp)
            new_gtp = new_gtp / jnp.maximum(new_gtp.sum(), 1e-30)

            return Carry(
                gtp=jnp.where(reject_now, new_gtp, carry.gtp),
                accepted=carry.accepted | accept_now,
                slot=jnp.where(accept_now, child, carry.slot),
                adjusted=carry.adjusted | reject_now,
            )

        init = Carry(gtp=gtp0, accepted=jnp.asarray(False),
                     slot=jnp.zeros((), jnp.int32), adjusted=jnp.asarray(False))
        out = jax.lax.fori_loop(0, C, body, init)

        accepted = active & out.accepted
        state = _WalkState(
            done=state.done | (active & ~out.accepted),
            cur=jnp.where(accepted, out.slot, state.cur),
            accept_len=jnp.where(accepted, state.accept_len + 1, state.accept_len),
            path=jnp.where(accepted, state.path.at[i].set(out.slot), state.path),
            sample_dist=jnp.where(active, out.gtp, state.sample_dist),
            adjusted=jnp.where(active, out.adjusted, state.adjusted),
        )

    full = state.accept_len == D
    base_dist = node_dist(state.cur)
    use_residual = state.adjusted & (~full)
    sample_dist = jnp.where(use_residual, state.sample_dist, base_dist)
    return state.path, state.accept_len - 1, sample_dist
