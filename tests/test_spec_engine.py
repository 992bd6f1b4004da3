"""End-to-end speculative-decode engine tests on a tiny random model.

The load-bearing invariant: greedy speculative decoding is *lossless* — the
committed token stream must equal the vanilla greedy AR stream exactly,
whatever the drafter proposes.  This exercises the whole engine: candidate
assembly, tree-masked verification forward, acceptance, KV rollback,
drafter state carry, and position bookkeeping.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lantern_tpu import configs, trees
from lantern_tpu.engine import ar, spec
from lantern_tpu.models import drafter as drf
from lantern_tpu.models import transformer as tfm
from lantern_tpu.ops.acceptance import LanternSpec
from lantern_tpu.ops.sampling import LogitsWarp

MAX_NEW = 16


@pytest.fixture(scope="module")
def tiny():
    cfg = configs.tiny_config(cond_kind="label", block_size=16)
    dcfg = configs.drafter_config(cfg, total_tokens=12, depth=3, top_k=4)
    params = tfm.init_params(jax.random.key(0), cfg)
    dparams = drf.init_drafter_params(jax.random.key(1), dcfg, params["embed"])
    return cfg, dcfg, params, dparams


def ar_greedy(cfg, params, label=3, cfg_scale=2.0):
    res = ar.generate(
        params, cfg,
        jnp.asarray([label]), jnp.asarray([cfg.num_classes]),
        MAX_NEW, cfg_scale, LogitsWarp(temperature=0.0), jax.random.key(7),
    )
    return np.asarray(res.tokens)


@pytest.mark.parametrize("mode,tree", [("static", "mc_sim_7b_63"),
                                        ("static", "chain"),
                                        ("dynamic", None)])
def test_greedy_spec_matches_ar(tiny, mode, tree):
    cfg, dcfg, params, dparams = tiny
    tspec = trees.get_tree(tree) if tree else None
    ecfg = spec.SpecDecodeConfig(
        warp=LogitsWarp(temperature=0.0), cfg_scale=2.0,
        max_new=MAX_NEW, mode=mode,
    )
    res = spec.generate(
        params, dparams, ecfg, cfg, dcfg, tspec,
        jnp.asarray([3]), jnp.asarray([cfg.num_classes]), jax.random.key(7),
    )
    expected = ar_greedy(cfg, params)
    np.testing.assert_array_equal(np.asarray(res.tokens), expected)
    assert int(res.steps) <= MAX_NEW
    assert int(res.accept_sum) >= int(res.steps)  # >= 1 token per step


def make_aligned_drafter(cfg, dcfg, params):
    """Drafter engineered to agree with the base's greedy chain: fc passes the
    token embedding straight through and the decoder layers are zeroed, so the
    drafter's head logits are lm_head @ embed(token) — which shares the argmax
    chain with a small-weight base model (whose hidden ~ norm(embed)).  This
    forces multi-token acceptance so rollback paths actually execute."""
    dparams = drf.init_drafter_params(jax.random.key(2), dcfg, params["embed"])
    H = cfg.hidden_size
    fc = np.zeros((2 * H, H), np.float32)
    fc[H:] = np.eye(H)   # hidden-passthrough: input is [embed, hidden]
    dparams["fc_w"] = jnp.asarray(fc)
    dparams["fc_b"] = jnp.zeros((H,))
    dparams["layers"] = jax.tree.map(lambda a: a * 0.0, dparams["layers"])
    return dparams


@pytest.mark.parametrize("mode,tree", [("static", "mc_sim_7b_63"), ("dynamic", None)])
def test_greedy_spec_compresses_steps(tiny, mode, tree):
    """An aligned drafter must (a) still be lossless and (b) actually
    compress: multiple tokens per verify step."""
    cfg, dcfg, params, _ = tiny
    dparams = make_aligned_drafter(cfg, dcfg, params)
    tspec = trees.get_tree(tree) if tree else None
    ecfg = spec.SpecDecodeConfig(
        warp=LogitsWarp(temperature=0.0), cfg_scale=2.0,
        max_new=MAX_NEW, mode=mode,
    )
    res = spec.generate(
        params, dparams, ecfg, cfg, dcfg, tspec,
        jnp.asarray([5]), jnp.asarray([cfg.num_classes]), jax.random.key(3),
    )
    expected = ar_greedy(cfg, params, label=5)
    np.testing.assert_array_equal(np.asarray(res.tokens), expected)
    sc = float(res.accept_sum) / float(res.steps)
    assert sc > 1.2, f"aligned drafter should compress, got {sc}"


@pytest.mark.parametrize("mode", ["static", "dynamic"])
def test_sampling_spec_runs(tiny, mode):
    cfg, dcfg, params, dparams = tiny
    tspec = trees.get_tree("mc_sim_7b_63_balanced") if mode == "static" else None
    ecfg = spec.SpecDecodeConfig(
        warp=LogitsWarp(temperature=1.0, top_k=50), cfg_scale=2.0,
        max_new=MAX_NEW, mode=mode,
    )
    res = spec.generate(
        params, dparams, ecfg, cfg, dcfg, tspec,
        jnp.asarray([1]), jnp.asarray([cfg.num_classes]), jax.random.key(11),
    )
    toks = np.asarray(res.tokens)
    assert toks.shape == (MAX_NEW,)
    assert (toks >= 0).all() and (toks < cfg.vocab_size).all()
    assert int(res.steps) >= 1


def test_lantern_spec_runs_and_relaxes(tiny):
    """LANTERN relaxed acceptance should never *reduce* step compression vs
    strict greedy on the same model/seed."""
    cfg, dcfg, params, dparams = tiny
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(cfg.vocab_size, 4))
    d = ((emb[:, None] - emb[None, :]) ** 2).sum(-1)
    nearest = jnp.asarray(np.argsort(d, axis=1)[:, 1:65].astype(np.int32))
    params_l = dict(params, nearest_latents=nearest)

    tspec = trees.get_tree("mc_sim_7b_63")
    base = spec.SpecDecodeConfig(
        warp=LogitsWarp(temperature=0.0), cfg_scale=2.0,
        max_new=MAX_NEW, mode="static",
    )
    strict = spec.generate(
        params_l, dparams, base, cfg, dcfg, tspec,
        jnp.asarray([3]), jnp.asarray([cfg.num_classes]), jax.random.key(7),
    )
    relaxed_cfg = spec.SpecDecodeConfig(
        warp=LogitsWarp(temperature=0.0), cfg_scale=2.0,
        lantern=LanternSpec(k=16, delta=0.5),
        max_new=MAX_NEW, mode="static",
    )
    relaxed = spec.generate(
        params_l, dparams, relaxed_cfg, cfg, dcfg, tspec,
        jnp.asarray([3]), jnp.asarray([cfg.num_classes]), jax.random.key(7),
    )
    sc_strict = float(strict.accept_sum) / float(strict.steps)
    sc_relaxed = float(relaxed.accept_sum) / float(relaxed.steps)
    assert sc_relaxed >= sc_strict - 1e-6
