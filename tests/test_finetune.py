"""Full-model finetune solver: loss decreases, checkpoints round-trip, FSDP
sharding executes on the virtual mesh, resume continues from the saved step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lantern_tpu import configs
from lantern_tpu.models import transformer as tfm
from lantern_tpu.train import finetune as ft


@pytest.fixture(scope="module")
def setup():
    cfg = configs.tiny_config(cond_kind="label", block_size=16, vocab_size=64,
                              hidden_size=32, num_heads=4)
    params = tfm.init_params(jax.random.key(0), cfg)
    rope = tfm.make_rope_tables(cfg)
    fcfg = ft.FinetuneConfig(lr=5e-3, warmup_steps=2, total_steps=50, remat=True)
    return cfg, params, rope, fcfg


def batch_of(cfg, seed=0, B=4, T=12):
    rng = np.random.default_rng(seed)
    return {
        "tokens": jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T))),
        "cond": jnp.asarray(rng.integers(0, cfg.num_classes, (B,))),
        "loss_mask": jnp.ones((B, T), jnp.float32),
    }


def test_finetune_loss_decreases(setup):
    cfg, params, rope, fcfg = setup
    state = ft.init_state(params, fcfg)
    batch = batch_of(cfg)
    losses = []
    for _ in range(25):
        state, m = ft.train_step(state, cfg, fcfg, rope, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.8, losses[::8]
    assert np.isfinite(losses).all()


def test_checkpoint_roundtrip_and_resume(setup, tmp_path):
    cfg, params, rope, fcfg = setup
    state = ft.init_state(params, fcfg)
    batch = batch_of(cfg, seed=1)
    for _ in range(3):
        state, _ = ft.train_step(state, cfg, fcfg, rope, batch)
    ft.save_checkpoint(str(tmp_path), state)
    like = ft.init_state(params, fcfg)
    restored = ft.restore_checkpoint(str(tmp_path), like)
    assert restored is not None and int(restored.step) == 3
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # prune keeps last k
    for _ in range(4):
        restored, _ = ft.train_step(restored, cfg, fcfg, rope, batch)
        ft.save_checkpoint(str(tmp_path), restored, keep_last=2)
    import os
    assert len([d for d in os.listdir(tmp_path) if d.startswith("step_")]) == 2


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs virtual mesh")
def test_fsdp_sharded_step(setup):
    cfg, params, rope, fcfg = setup
    from lantern_tpu.parallel import mesh as pmesh

    mesh = pmesh.make_mesh(8, dp=2)
    specs = ft.fsdp_param_specs(params, mesh)
    sharded = pmesh.shard_pytree(params, specs, mesh)
    state = ft.init_state(sharded, fcfg)
    batch = batch_of(cfg)
    with jax.set_mesh(mesh):
        state, m = ft.train_step(state, cfg, fcfg, rope, batch)
    assert np.isfinite(float(m["loss"]))

    # sharded step must match unsharded numerics
    state_ref = ft.init_state(params, fcfg)
    state_ref, m_ref = ft.train_step(state_ref, cfg, fcfg, rope, batch)
    np.testing.assert_allclose(float(m["loss"]), float(m_ref["loss"]), rtol=1e-5)
