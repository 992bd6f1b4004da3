"""Continuous batching: batched greedy decoding must produce exactly the
same tokens per request as single-request decoding, including slot reuse
(more requests than slots)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lantern_tpu import configs, trees
from lantern_tpu.engine import spec
from lantern_tpu.engine.batch import BatchedEngine
from lantern_tpu.engine.scheduler import Request, Scheduler
from lantern_tpu.models import drafter as drf
from lantern_tpu.models import transformer as tfm
from lantern_tpu.ops.sampling import LogitsWarp

MAX_NEW = 12


@pytest.fixture(scope="module")
def setup():
    cfg = configs.tiny_config(cond_kind="label", block_size=16)
    dcfg = configs.drafter_config(cfg, total_tokens=10, depth=2, top_k=4)
    params = tfm.init_params(jax.random.key(0), cfg)
    dparams = drf.init_drafter_params(jax.random.key(1), dcfg, params["embed"])
    ecfg = spec.SpecDecodeConfig(
        warp=LogitsWarp(temperature=0.0), cfg_scale=2.0,
        max_new=MAX_NEW, mode="static",
    )
    tree = trees.get_tree("mc_sim_7b_63")
    return cfg, dcfg, params, dparams, ecfg, tree


def single(cfg, dcfg, params, dparams, ecfg, tree, label, seed):
    res = spec.generate(
        params, dparams, ecfg, cfg, dcfg, tree,
        jnp.asarray([label]), jnp.asarray([cfg.num_classes]),
        jax.random.key(seed),
    )
    return np.asarray(res.tokens), int(res.steps)


@pytest.mark.parametrize("use_native", [False, True])
def test_batched_matches_single(setup, use_native):
    from lantern_tpu import native

    if use_native and not native.available():
        pytest.skip("native scheduler not built")
    cfg, dcfg, params, dparams, ecfg, tree = setup
    labels = [1, 4, 7, 2, 9]

    expected = {
        lab: single(cfg, dcfg, params, dparams, ecfg, tree, lab, 100 + i)
        for i, lab in enumerate(labels)
    }

    eng = BatchedEngine(
        ecfg=ecfg, cfg=cfg, dcfg=dcfg, tree=tree,
        params=params, dparams=dparams, num_slots=2,
    )
    reqs = [
        Request(uid=lab, cond=jnp.asarray([lab]),
                uncond=jnp.asarray([cfg.num_classes]), seed=100 + i)
        for i, lab in enumerate(labels)
    ]
    done = Scheduler(eng, use_native=use_native).run(reqs)

    assert len(done) == len(labels)
    for req in done:
        exp_tokens, exp_steps = expected[req.uid]
        np.testing.assert_array_equal(req.tokens, exp_tokens, err_msg=str(req.uid))
        assert req.steps == exp_steps


def test_batched_throughput_counts(setup):
    cfg, dcfg, params, dparams, ecfg, tree = setup
    eng = BatchedEngine(
        ecfg=ecfg, cfg=cfg, dcfg=dcfg, tree=tree,
        params=params, dparams=dparams, num_slots=3,
    )
    reqs = [Request(uid=i, cond=jnp.asarray([i % cfg.num_classes]),
                    uncond=jnp.asarray([cfg.num_classes]), seed=i)
            for i in range(3)]
    done = Scheduler(eng).run(reqs)
    for r in done:
        assert r.tokens.shape == (MAX_NEW,)
        assert r.steps >= 1 and r.step_compression >= 1.0
