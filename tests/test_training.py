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


def test_head_chunk_matches_full(setup):
    """Chunked soft-CE (TrainConfig.head_chunk) must be bitwise-equivalent
    math to the full-logits path: loss, metrics, and one optimizer step."""
    cfg, dcfg, params, dparams, rope = setup
    head = params["lm_head"]
    batch = synth_batch(cfg, B=4, T=12, seed=3)
    for cfg_loss in (False, True):
        t_full = dt.TrainConfig(lr=1e-3, noise="none", cfg_loss=cfg_loss,
                                head_chunk=0)
        t_chunk = dt.TrainConfig(lr=1e-3, noise="none", cfg_loss=cfg_loss,
                                 head_chunk=5)   # non-divisor: exercises pad
        lf, mf = dt.loss_and_metrics(dparams, dcfg, rope, head, batch, t_full)
        lc, mc = dt.loss_and_metrics(dparams, dcfg, rope, head, batch, t_chunk)
        np.testing.assert_allclose(float(lf), float(lc), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(mf.top_acc),
                                   np.asarray(mc.top_acc), rtol=1e-6)
        np.testing.assert_allclose(float(mf.ploss), float(mc.ploss), rtol=1e-5)
        # gradients agree -> one train_step lands on the same params
        sf = dt.init_train_state(dparams, t_full)
        sc = dt.init_train_state(dparams, t_chunk)
        k = jax.random.key(0)
        sf, _ = dt.train_step(sf, dcfg, t_full, rope, head, batch, k)
        sc, _ = dt.train_step(sc, dcfg, t_chunk, rope, head, batch, k)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
            sf.dparams, sc.dparams)


def test_positions_override_changes_forward(setup):
    """batch["positions"] must reach the drafter forward (deployment uncond
    rows restart at the image start).  Random-init q/k scores are near-zero
    (softmax ~uniform regardless of rope), so boost wq/wk to make position
    rotations visible in the output."""
    cfg, dcfg, params, dparams, rope = setup
    dp = dict(dparams, layers=dict(dparams["layers"]))
    for k in ("wq", "wk"):
        dp["layers"][k] = dparams["layers"][k] * 40.0
    batch = synth_batch(cfg, B=2, T=10, seed=4)
    tcfg = dt.TrainConfig(noise="none")
    _, m0 = dt.loss_and_metrics(dp, dcfg, rope, params["lm_head"],
                                batch, tcfg)
    shifted = dict(batch, positions=jnp.flip(
        jnp.broadcast_to(jnp.arange(10)[None, :], (2, 10)), axis=1))
    _, m1 = dt.loss_and_metrics(dp, dcfg, rope, params["lm_head"],
                                shifted, tcfg)
    assert abs(float(m0.loss) - float(m1.loss)) > 1e-6


def test_remat_matches_no_remat(setup):
    """TrainConfig.remat (backward-recompute drafter forward, used by the
    full-geometry Lumina prep where dense T^2 attention residuals exceed
    HBM) must be bitwise-identical math, including rollout levels."""
    cfg, dcfg, params, dparams, rope = setup
    head = params["lm_head"]
    batch = synth_batch(cfg, B=4, T=12, seed=5)
    for depth in (1, 2):
        t_plain = dt.TrainConfig(lr=1e-3, noise="none", head_chunk=5,
                                 rollout_depth=depth, remat=False)
        t_remat = dt.TrainConfig(lr=1e-3, noise="none", head_chunk=5,
                                 rollout_depth=depth, remat=True)
        lp, mp = dt.loss_and_metrics(dparams, dcfg, rope, head, batch, t_plain)
        lr_, mr = dt.loss_and_metrics(dparams, dcfg, rope, head, batch, t_remat)
        np.testing.assert_allclose(float(lp), float(lr_), rtol=1e-6)
        sp = dt.init_train_state(dparams, t_plain)
        sr = dt.init_train_state(dparams, t_remat)
        k = jax.random.key(1)
        sp, _ = dt.train_step(sp, dcfg, t_plain, rope, head, batch, k)
        sr, _ = dt.train_step(sr, dcfg, t_remat, rope, head, batch, k)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6),
            sp.dparams, sr.dparams)
