"""Deferred KV commit: SpecDecodeConfig.deferred_commit.

Contract under test: with ``deferred_commit=True`` the tree block's K/V
never hit the cache — the engine carries them (SpecState.blk) and the NEXT
verification forward commits only the accepted rows via ``tfm.forward``'s
``extra_kv`` while exposing them to the new tree's attention as in-flight
columns.  This removes the per-step tree-rollback kernel (kv.accept_path;
the reference's per-step ``KVCache.copy``, kv_cache.py:38-50) from the
decode hot loop.

Numerics: the accepted rows commit BEFORE the next forward's layer scan, so
that forward reads them from the cache prefix exactly as the accept_path
engine would — committed bytes, attention column order, and the rng stream
are all unchanged.  Every mode therefore compares token-exact.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lantern_tpu import configs, trees
from lantern_tpu.engine import spec
from lantern_tpu.models import chameleon as cham
from lantern_tpu.models import drafter as drf
from lantern_tpu.models import transformer as tfm
from lantern_tpu.ops.acceptance import LanternSpec
from lantern_tpu.ops.sampling import LogitsWarp

V = 64
NEWLINE, IMG_END = 60, 61
H_GRID, W_GRID = 3, 3
MAX_NEW = (W_GRID + 1) * H_GRID + 1


def passthrough(dparams, cfg):
    H = cfg.hidden_size
    fc = np.zeros((2 * H, H), np.float32)
    fc[H:] = np.eye(H)
    out = dict(dparams)
    out["fc_w"] = jnp.asarray(fc, cfg.jnp_dtype)
    out["fc_b"] = jnp.zeros_like(dparams["fc_b"])
    out["layers"] = jax.tree.map(lambda a: a * 0, dparams["layers"])
    return out


@pytest.fixture(scope="module")
def setup():
    cfg = configs.tiny_config(
        vocab_size=V, hidden_size=64, num_layers=2, num_heads=4,
        rope_kind="1d", cond_kind="none", qk_norm=True,
    )
    dcfg = configs.drafter_config(cfg, total_tokens=10, depth=2, top_k=4)
    params = tfm.init_params(jax.random.key(0), cfg)
    dparams = passthrough(
        drf.init_drafter_params(jax.random.key(1), dcfg, params["embed"]), cfg)
    tp = cham.lumina_token_prompt([12, 33, 7])
    fsm = cham.LuminaGridFSM(
        w=W_GRID, h=H_GRID, image_start_idx=int(tp.pos_diff), vocab_size=V,
        newline_id=NEWLINE, image_end_id=IMG_END, image_lo=4, image_hi=50,
    )
    return cfg, dcfg, params, dparams, tp, fsm


def run_pair(cfg, dcfg, params, dparams, ecfg_kw, tp, fsm, seed=7):
    tspec = trees.get_tree("mc_sim_7b_63")
    outs = []
    for deferred in (False, True):
        ecfg = spec.SpecDecodeConfig(mode="static", deferred_commit=deferred,
                                     **ecfg_kw)
        res = spec.generate(
            params, dparams, ecfg, cfg, dcfg, tspec, None, None,
            jax.random.key(seed), token_prompt=tp, logits_fn=fsm,
        )
        outs.append(res)
    return outs


def assert_same(a, b):
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
    assert int(a.steps) == int(b.steps)
    assert int(a.accept_sum) == int(b.accept_sum)


@pytest.mark.parametrize("kvq", [False, True])
def test_deferred_greedy_token_exact(setup, kvq):
    """Greedy + stale drafting: token-exact vs the accept_path engine."""
    cfg, dcfg, params, dparams, tp, fsm = setup
    base, deferred = run_pair(
        cfg, dcfg, params, dparams,
        dict(warp=LogitsWarp(temperature=0.0), cfg_scale=2.0,
             max_new=MAX_NEW, stale_draft=True, kv_quant=kvq),
        tp, fsm)
    assert_same(base, deferred)


def test_deferred_greedy_full_drafter(setup):
    """Greedy with the REAL drafter path (no stale shortcut): the drafter's
    own cache/extension is untouched by deferred base-KV commit."""
    cfg, dcfg, params, dparams, tp, fsm = setup
    base, deferred = run_pair(
        cfg, dcfg, params, dparams,
        dict(warp=LogitsWarp(temperature=0.0), cfg_scale=2.0,
             max_new=MAX_NEW, stale_draft=False),
        tp, fsm)
    assert_same(base, deferred)


def test_deferred_sampling_token_exact(setup):
    """Stochastic LANTERN acceptance + int8 KV: token-exact across seeds,
    and the grid grammar holds through the deferred path."""
    cfg, dcfg, params, dparams, tp, fsm = setup
    emb = np.asarray(params["embed"], np.float64)
    d = ((emb[:, None] - emb[None]) ** 2).sum(-1)
    nearest = jnp.asarray(np.argsort(d, axis=1)[:, 1:10].astype(np.int32))
    p2 = dict(params, nearest_latents=nearest)
    for seed in (3, 11):
        base, deferred = run_pair(
            cfg, dcfg, p2, dparams,
            dict(warp=LogitsWarp(temperature=1.0, top_k=16), cfg_scale=2.0,
                 max_new=MAX_NEW, stale_draft=True, kv_quant=True,
                 lantern=LanternSpec(k=4, delta=0.5)),
            tp, fsm, seed=seed)
        assert_same(base, deferred)
        toks = np.asarray(deferred.tokens)[:MAX_NEW]
        np.testing.assert_array_equal(toks[W_GRID::W_GRID + 1][:H_GRID],
                                      [NEWLINE] * H_GRID)


def test_deferred_requires_static(setup):
    cfg, dcfg, params, dparams, tp, fsm = setup
    ecfg = spec.SpecDecodeConfig(mode="dynamic", deferred_commit=True,
                                 max_new=MAX_NEW)
    with pytest.raises(ValueError, match="static"):
        spec.generate(params, dparams, ecfg, cfg, dcfg,
                      trees.get_tree("mc_sim_7b_63"), None, None,
                      jax.random.key(0), token_prompt=tp, logits_fn=fsm)
