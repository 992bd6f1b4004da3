"""Data-driven tree shapes: trees.optimize_tree + engine.calibrate."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lantern_tpu import configs, trees
from lantern_tpu.engine.calibrate import measure_rank_probs
from lantern_tpu.models import drafter as drf
from lantern_tpu.models import transformer as tfm


def test_optimize_tree_geometric_prefers_chain():
    # rank-0 dominates -> budget goes deep, not wide
    paths = trees.optimize_tree([0.9, 0.1], num_nodes=5, max_depth=4)
    assert (0,) in paths and (0, 0) in paths and (0, 0, 0) in paths
    assert (0, 0, 0, 0) in paths and (1,) in paths
    spec = trees.get_tree(paths)                 # compiles: prefix-closed
    assert spec.num_nodes == 6                   # +1 root


def test_optimize_tree_uniform_prefers_width():
    # equal ranks -> all depth-1 nodes before any depth-2
    paths = trees.optimize_tree([0.3, 0.3, 0.3], num_nodes=3, max_depth=4)
    assert sorted(p[0] for p in paths) == [0, 1, 2]
    assert all(len(p) == 1 for p in paths)


def test_optimize_tree_matches_budget_and_depth():
    probs = [0.5, 0.25, 0.12, 0.06]
    paths = trees.optimize_tree(probs, num_nodes=25, max_depth=3)
    assert len(paths) == 25
    assert max(len(p) for p in paths) <= 3
    # greedy optimality: every chosen path's prob >= every rejected
    # frontier child's prob
    def prob(path):
        return float(np.prod([probs[r] for r in path]))

    chosen = {tuple(p) for p in paths}
    frontier = []
    for p in paths:
        for r in range(len(probs)):
            c = tuple(p) + (r,)
            if c not in chosen and len(c) <= 3:
                frontier.append(prob(list(c)))
    assert min(prob(p) for p in paths) >= max(frontier) - 1e-12


def test_optimize_tree_validates_inputs():
    with pytest.raises(ValueError):
        trees.optimize_tree([], 5)
    with pytest.raises(ValueError):
        trees.optimize_tree([0.5, 0.0], 5)


def test_measure_rank_probs_aligned_drafter():
    """A drafter engineered to reproduce the base's own logits (fc passes
    the base HIDDEN through, zero decoder layers -> head sees exactly the
    teacher hidden) must calibrate with dominant rank-0 mass on a greedy
    rollout — and the optimized tree must then be chain-heavy."""
    cfg = configs.tiny_config(cond_kind="label", block_size=16)
    dcfg = configs.drafter_config(cfg, total_tokens=10, depth=3, top_k=4)
    params = tfm.init_params(jax.random.key(0), cfg)
    dparams = drf.init_drafter_params(jax.random.key(2), dcfg, params["embed"])
    H = cfg.hidden_size
    fc = np.zeros((2 * H, H), np.float32)
    fc[H:] = np.eye(H)                      # hidden passthrough
    dparams["fc_w"] = jnp.asarray(fc)
    dparams["fc_b"] = jnp.zeros((H,))
    dparams["layers"] = jax.tree.map(lambda a: a * 0.0, dparams["layers"])

    from lantern_tpu.ops.sampling import LogitsWarp

    probs = measure_rank_probs(
        params, dparams, cfg, dcfg,
        jnp.asarray([3]), jnp.asarray([cfg.num_classes]),
        jax.random.key(7), num_tokens=16, max_rank=4,
        warp=LogitsWarp(temperature=0.0), num_rollouts=2,
    )
    assert probs.shape == (4,)
    assert probs[0] == probs.max()
    assert probs[0] > 0.5            # aligned drafter mostly rank-0
    paths = trees.optimize_tree(probs, num_nodes=8, max_depth=4)
    assert (0, 0) in paths           # enough rank-0 mass to go deep


def test_optimize_tree_depth_dependent_rows():
    """2-D [depth][rank] probabilities: a sharp depth-decay row cuts deep
    chains that the flat model would keep (the passthrough drafter's
    staleness decay, PERF.md 'Lumina drafter study')."""
    flat = trees.optimize_tree([0.9, 0.1], num_nodes=10, max_depth=8)
    decayed = trees.optimize_tree(
        [[0.9, 0.1], [0.9, 0.1], [0.05, 0.01]], num_nodes=10, max_depth=8)
    assert max(len(p) for p in flat) > max(len(p) for p in decayed) or (
        sum(len(p) > 3 for p in flat) > sum(len(p) > 3 for p in decayed))
    # depth rows beyond the matrix reuse the last row; probs still validated
    with pytest.raises(ValueError):
        trees.optimize_tree([[0.5], [0.0]], num_nodes=3)


def test_measure_stale_rank_probs_tiny():
    """The token-prompt (Lumina) calibration instrument runs end-to-end on a
    tiny FSM-constrained model and yields a well-formed [depth, rank]
    matrix whose depth-1 column dominates (the stale proposal is freshest
    at depth 1)."""
    from lantern_tpu.engine.calibrate import measure_stale_rank_probs
    from lantern_tpu.models import chameleon as cham
    from lantern_tpu.ops.sampling import LogitsWarp

    GRID = 5
    MAX_NEW = GRID * (GRID + 1) + 1
    TEXT = list(range(60000, 60006))
    cfg = configs.tiny_config(cond_kind="none", rope_kind="1d", qk_norm=True,
                              swin_norm=True, vocab_size=65536,
                              max_seq_len=len(TEXT) + 3 + MAX_NEW + 16)
    params = tfm.init_params(jax.random.key(0), cfg)
    tp = cham.lumina_token_prompt(TEXT, grid=(GRID, GRID))
    fsm = cham.LuminaGridFSM(w=GRID, h=GRID, image_start_idx=len(TEXT),
                             vocab_size=cfg.vocab_size)
    probs = measure_stale_rank_probs(
        params, cfg, tp, jax.random.key(7), MAX_NEW, max_rank=3, max_depth=4,
        cfg_scale=3.0, warp=LogitsWarp(temperature=1.0, top_k=2000),
        logits_fn=fsm, chunk=16)
    assert probs.shape == (4, 3)
    assert (probs > 0).all() and (probs <= 1).all()
    # rank-0 beats deeper ranks at every depth on any peaked-enough model
    assert (probs[:, 0] >= probs[:, 1]).all()
    paths = trees.optimize_tree(probs, num_nodes=12, max_depth=4)
    t = trees.get_tree(paths)
    assert t.num_nodes == 13


def test_measure_stale_accept_probs_tiny():
    """The stochastic-walk acceptance calibration (the objective the bench
    lane optimizes trees for) runs end-to-end on a tiny FSM model, yields a
    well-formed [depth, rank] matrix, and — because stochastic acceptance
    of a near-exact stale proposal is ~min(1, p/q) per trial, not argmax
    match — credits level-1 far above the greedy rank-match instrument."""
    from lantern_tpu.engine.calibrate import (measure_stale_accept_probs,
                                              measure_stale_rank_probs)
    from lantern_tpu.models import chameleon as cham
    from lantern_tpu.ops.acceptance import LanternSpec
    from lantern_tpu.ops.sampling import LogitsWarp
    from lantern_tpu.ops.vq_distance import nearest_latents

    GRID = 5
    MAX_NEW = GRID * (GRID + 1) + 1
    TEXT = list(range(60000, 60006))
    cfg = configs.tiny_config(cond_kind="none", rope_kind="1d", qk_norm=True,
                              swin_norm=True, vocab_size=65536,
                              max_seq_len=len(TEXT) + 3 + MAX_NEW + 16)
    params = tfm.init_params(jax.random.key(0), cfg)
    cb = jax.random.normal(jax.random.key(3), (8192, 8))
    near = np.asarray(nearest_latents(cb, k=11))
    params["nearest_latents"] = jnp.asarray(
        cham.shift_nearest_table(near, cfg.vocab_size))
    tp = cham.lumina_token_prompt(TEXT, grid=(GRID, GRID))
    fsm = cham.LuminaGridFSM(w=GRID, h=GRID, image_start_idx=len(TEXT),
                             vocab_size=cfg.vocab_size)
    warp = LogitsWarp(temperature=1.0, top_k=2000)
    common = dict(cfg_scale=3.0, warp=warp, logits_fn=fsm, chunk=16)
    rho = measure_stale_accept_probs(
        params, cfg, tp, jax.random.key(7), MAX_NEW,
        nearest=params["nearest_latents"], lantern=LanternSpec(k=10, delta=5.0),
        max_rank=3, max_depth=3, **common)
    assert rho.shape == (3, 3)
    assert (rho >= 0).all() and (rho <= 1).all()
    # per-level total acceptance cannot exceed 1 (at most one child is
    # accepted); allow the instrument's 1e-4 probability floor per rank
    assert (rho.sum(axis=1) <= 1.0 + 3e-4 * rho.shape[1]).all()
    greedy = measure_stale_rank_probs(
        params, cfg, tp, jax.random.key(7), MAX_NEW, max_rank=3, max_depth=3,
        **common)
    # the walk objective credits depth-1 acceptance far above argmax match
    assert rho[0].sum() > greedy[0].sum()
    paths = trees.optimize_tree(rho, num_nodes=12, max_depth=3)
    assert trees.get_tree(paths).num_nodes == 13


def test_measure_drafter_accept_probs_tiny():
    """The drafter-aware stochastic-walk calibration (XL lane objective)
    runs end-to-end on a tiny caption model: well-formed [depth, rank]
    matrix, per-level mass <= 1, and a passthrough-aligned drafter earns
    high rank-0 acceptance (stochastic acceptance of a near-exact proposal
    is ~min(1, p/q), not argmax match)."""
    from lantern_tpu.engine.calibrate import measure_drafter_accept_probs
    from lantern_tpu.ops.acceptance import LanternSpec
    from lantern_tpu.ops.sampling import LogitsWarp
    from lantern_tpu.ops.vq_distance import nearest_latents

    cfg = configs.tiny_config(cond_kind="label", block_size=16)
    dcfg = configs.drafter_config(cfg, total_tokens=10, depth=3, top_k=4)
    params = tfm.init_params(jax.random.key(0), cfg)
    dparams = drf.init_drafter_params(jax.random.key(2), dcfg,
                                      params["embed"])
    H = cfg.hidden_size
    fc = np.zeros((2 * H, H), np.float32)
    fc[H:] = np.eye(H)
    dparams["fc_w"] = jnp.asarray(fc)
    dparams["fc_b"] = jnp.zeros((H,))
    dparams["layers"] = jax.tree.map(lambda a: a * 0.0, dparams["layers"])
    cb = jax.random.normal(jax.random.key(3), (cfg.vocab_size, 8))
    params["nearest_latents"] = jnp.asarray(np.asarray(
        nearest_latents(cb, k=6)))

    rho = measure_drafter_accept_probs(
        params, dparams, cfg, dcfg,
        jnp.asarray([3]), jnp.asarray([cfg.num_classes]),
        jax.random.key(7), nearest=params["nearest_latents"],
        lantern=LanternSpec(k=5, delta=5.0),
        num_tokens=16, max_rank=4, max_depth=3,
        warp=LogitsWarp(temperature=1.0, top_k=50), num_rollouts=2,
        chunk=8,
    )
    assert rho.shape == (3, 4)
    assert (rho >= 0).all() and (rho <= 1).all()
    assert (rho.sum(axis=1) <= 1.0 + 3e-4 * rho.shape[1]).all()
    # passthrough drafter at depth 1 proposes from a 1-stale near-exact
    # distribution: rank-0 stochastic acceptance well above argmax-match
    assert rho[0, 0] > 0.3
    paths = trees.optimize_tree(rho, num_nodes=12, max_depth=4)
    assert trees.get_tree(paths).num_nodes == 13
