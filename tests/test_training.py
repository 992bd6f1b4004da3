"""Drafter training: loss decreases on a learnable synthetic task, and the
loss math matches the reference formulas on a hand-checked case."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lantern_tpu import configs
from lantern_tpu.models import drafter as drf
from lantern_tpu.models import transformer as tfm
from lantern_tpu.train import drafter_train as dt


@pytest.fixture(scope="module")
def setup():
    cfg = configs.tiny_config(cond_kind="label", block_size=16, vocab_size=64,
                              hidden_size=32, num_heads=4)
    dcfg = configs.drafter_config(cfg)
    params = tfm.init_params(jax.random.key(0), cfg)
    dparams = drf.init_drafter_params(jax.random.key(1), dcfg, params["embed"])
    rope = tfm.make_rope_tables(dcfg.model)
    return cfg, dcfg, params, dparams, rope


def synth_batch(cfg, B=4, T=12, seed=0):
    """Learnable task: the next hidden state is a linear function of the
    current token's embedding."""
    rng = np.random.default_rng(seed)
    H = cfg.hidden_size
    toks = rng.integers(0, cfg.vocab_size, (B, T)).astype(np.int32)
    hid = rng.normal(size=(B, T, H)).astype(np.float32)
    W = np.linalg.qr(rng.normal(size=(H, H)))[0].astype(np.float32)
    tgt = np.tanh(hid @ W)
    return {
        "tokens": jnp.asarray(toks), "hidden": jnp.asarray(hid),
        "target": jnp.asarray(tgt),
        "loss_mask": jnp.ones((B, T), jnp.float32),
        "attn_valid": jnp.ones((B, T), jnp.float32),
    }


def test_loss_decreases(setup):
    cfg, dcfg, params, dparams, rope = setup
    tcfg = dt.TrainConfig(lr=5e-3, noise="none")
    state = dt.init_train_state(dparams, tcfg)
    head = params["lm_head"]
    batch = synth_batch(cfg)
    losses = []
    key = jax.random.key(0)
    for i in range(30):
        key, k = jax.random.split(key)
        state, m = dt.train_step(state, dcfg, tcfg, rope, head, batch, k)
        losses.append(float(m.loss))
    assert losses[-1] < losses[0] * 0.7, losses[::10]
    assert np.isfinite(losses).all()


def test_loss_matches_reference_formula(setup):
    """vloss/ploss vs a direct numpy transcription of the reference formulas
    (train_drafter/main.py:159-162)."""
    cfg, dcfg, params, dparams, rope = setup
    tcfg = dt.TrainConfig(noise="none", p_w=0.1)
    head = np.asarray(params["lm_head"], np.float32)
    batch = synth_batch(cfg, B=2, T=6, seed=3)
    mask2 = np.asarray(batch["loss_mask"]).copy()
    mask2[0, -2:] = 0.0
    batch["loss_mask"] = jnp.asarray(mask2)

    _, m = dt.loss_and_metrics(dparams, dcfg, rope, jnp.asarray(head), batch, tcfg)

    pred = np.asarray(dt.drafter_teacher_forward(
        dparams, dcfg, rope, batch["tokens"], batch["hidden"], batch["attn_valid"]
    ))
    tgt = np.asarray(batch["target"])
    mask = mask2[..., None]
    d = np.abs(pred - tgt)
    sl1 = np.where(d < 1.0, 0.5 * d * d, d - 0.5)
    vloss = (mask * sl1.mean(-1, keepdims=True)).sum() / (mask.sum() + 1e-5)

    out_head = pred @ head
    tgt_head = tgt @ head
    tp = np.exp(tgt_head - tgt_head.max(-1, keepdims=True))
    tp /= tp.sum(-1, keepdims=True)
    lp = out_head - out_head.max(-1, keepdims=True)
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    ploss = -(mask * (tp * lp).sum(-1, keepdims=True)).sum() / (mask.sum() + 1e-5)

    np.testing.assert_allclose(float(m.vloss), vloss, rtol=1e-4)
    np.testing.assert_allclose(float(m.ploss), ploss, rtol=1e-4)
    np.testing.assert_allclose(float(m.loss), vloss + 0.1 * ploss, rtol=1e-4)


def test_cfg_loss_mode_runs(setup):
    cfg, dcfg, params, dparams, rope = setup
    tcfg = dt.TrainConfig(noise="none", cfg_loss=True, cfg_scale=3.0)
    state = dt.init_train_state(dparams, tcfg)
    batch = synth_batch(cfg, B=4)
    state, m = dt.train_step(state, dcfg, tcfg, rope, params["lm_head"], batch,
                             jax.random.key(0))
    assert np.isfinite(float(m.loss))


def test_embed_stays_frozen(setup):
    cfg, dcfg, params, dparams, rope = setup
    tcfg = dt.TrainConfig(lr=1e-2, noise="none")
    state = dt.init_train_state(dparams, tcfg)
    before = np.asarray(state.dparams["embed"])
    batch = synth_batch(cfg)
    state, _ = dt.train_step(state, dcfg, tcfg, rope, params["lm_head"], batch,
                             jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(state.dparams["embed"]), before)
    # but fc must have moved
    assert not np.allclose(np.asarray(state.dparams["fc_w"]),
                           np.asarray(dparams["fc_w"]))


def test_rollout_depth_one_is_reference_loss(setup):
    """rollout_depth=1 must reproduce the reference trainer's loss exactly."""
    cfg, dcfg, params, dparams, rope = setup
    head = params["lm_head"]
    batch = synth_batch(cfg)
    l1, _ = dt.loss_and_metrics(dparams, dcfg, rope, head, batch,
                                dt.TrainConfig(noise="none"))
    l1b, _ = dt.loss_and_metrics(dparams, dcfg, rope, head, batch,
                                 dt.TrainConfig(noise="none", rollout_depth=1))
    assert float(l1) == float(l1b)


def test_rollout_loss_adds_terms_and_grads_flow(setup):
    cfg, dcfg, params, dparams, rope = setup
    head = params["lm_head"]
    batch = synth_batch(cfg)
    tc1 = dt.TrainConfig(noise="none")
    tc3 = dt.TrainConfig(noise="none", rollout_depth=3, rollout_w=0.5)
    l1, _ = dt.loss_and_metrics(dparams, dcfg, rope, head, batch, tc1)
    l3, _ = dt.loss_and_metrics(dparams, dcfg, rope, head, batch, tc3)
    assert float(l3) > float(l1)          # extra positive CE terms

    g = jax.grad(
        lambda p: dt.loss_and_metrics(p, dcfg, rope, head, batch, tc3)[0]
    )(dparams)
    gnorm = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_rollout_training_decreases_loss(setup):
    cfg, dcfg, params, dparams, rope = setup
    tcfg = dt.TrainConfig(lr=5e-3, noise="none", rollout_depth=2)
    state = dt.init_train_state(dparams, tcfg)
    head = params["lm_head"]
    batch = synth_batch(cfg)
    losses = []
    key = jax.random.key(0)
    for i in range(30):
        key, k = jax.random.split(key)
        state, m = dt.train_step(state, dcfg, tcfg, rope, head, batch, k)
        losses.append(float(m.loss))
    assert losses[-1] < losses[0] * 0.8
