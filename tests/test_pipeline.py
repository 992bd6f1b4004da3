"""Pipeline-parallel training (parallel/pipeline.py): GPipe microbatch
schedule over a ``pp`` mesh axis must reproduce the single-device training
loss and gradients exactly (same math, different schedule)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from lantern_tpu import configs
from lantern_tpu.models import transformer as tfm
from lantern_tpu.parallel import pipeline as pl
from lantern_tpu.train import finetune as ft


def tiny_cfg():
    return dataclasses.replace(
        configs.llamagen_config("nano", "c2i", image_tokens=16),
        cond_kind="none", num_layers=4,
    )


def make_mesh_pp(pp):
    devs = np.asarray(jax.devices()[:pp]).reshape(pp)
    return Mesh(devs, (pl.PP,))


def batch_for(cfg, B, T, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "tokens": jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32),
        "loss_mask": jnp.ones((B, T), jnp.float32),
    }


@pytest.mark.parametrize("pp,n_micro", [(2, 2), (4, 4), (2, 4)])
def test_pipeline_matches_single_device(pp, n_micro):
    cfg = tiny_cfg()
    assert cfg.num_layers % pp == 0, "test config must split into stages"
    mesh = make_mesh_pp(pp)
    rope = tfm.make_rope_tables(cfg)
    params = tfm.init_params(jax.random.key(0), cfg, dtype=jnp.float32)
    B, T = 4, 16
    batch = batch_for(cfg, B, T)

    # single-device reference (finetune.token_loss without cond prefix)
    fcfg = ft.FinetuneConfig(remat=False)
    ref_loss, ref_acc = ft.token_loss(params, cfg, rope, batch, fcfg)

    loss_fn = pl.pipeline_loss_fn(cfg, mesh, n_micro, rope, remat=False)
    staged = pl.split_stages(params["layers"], pp)
    with mesh:
        loss, acc = jax.jit(loss_fn)(params, staged, batch)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5)
    np.testing.assert_allclose(float(acc), float(ref_acc), rtol=1e-5)

    # gradients: staged grads (merged) must equal single-device layer grads
    def ref_lf(p):
        return ft.token_loss(p, cfg, rope, batch, fcfg)[0]

    ref_grads = jax.grad(ref_lf)(params)

    def pp_lf(p, s):
        return loss_fn(p, s, batch)[0]

    with mesh:
        gp, gs = jax.jit(jax.grad(pp_lf, argnums=(0, 1)))(params, staged)
    merged = pl.merge_stages(gs)
    for k in merged:
        np.testing.assert_allclose(
            np.asarray(merged[k]), np.asarray(ref_grads["layers"][k]),
            rtol=2e-4, atol=2e-5, err_msg=f"layers/{k}",
        )
    # non-stage params (embed, head, norm) also flow
    np.testing.assert_allclose(
        np.asarray(gp["lm_head"]), np.asarray(ref_grads["lm_head"]),
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(gp["embed"]), np.asarray(ref_grads["embed"]),
        rtol=2e-4, atol=2e-5,
    )


def test_split_merge_roundtrip():
    cfg = tiny_cfg()
    params = tfm.init_params(jax.random.key(1), cfg)
    staged = pl.split_stages(params["layers"], 2)
    back = pl.merge_stages(staged)
    for k in back:
        np.testing.assert_array_equal(np.asarray(back[k]),
                                      np.asarray(params["layers"][k]))
    with pytest.raises(ValueError):
        pl.split_stages(params["layers"], 7)


def test_pipeline_train_step_runs():
    cfg = tiny_cfg()
    mesh = make_mesh_pp(2)
    rope = tfm.make_rope_tables(cfg)
    params = tfm.init_params(jax.random.key(0), cfg, dtype=jnp.float32)
    staged = pl.split_stages(params.pop("layers"), 2)
    step_fn, init_fn = pl.make_train_step(cfg, mesh, 2, rope)
    opt_state = init_fn(params, staged)
    batch = batch_for(cfg, 4, 16)
    s0_leaf = np.asarray(staged["w_down"]).copy()
    with mesh:
        p1, s1, opt_state, m = step_fn(params, staged, opt_state, batch)
        p2, s2, _, m2 = step_fn(p1, s1, opt_state, batch)
    assert np.isfinite(float(m["loss"])) and np.isfinite(float(m2["loss"]))
    assert (np.asarray(s2["w_down"]) != s0_leaf).any()
