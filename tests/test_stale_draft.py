"""Stale-distribution (drafter-free) drafting: SpecDecodeConfig.stale_draft.

Contract under test: with the hidden-passthrough drafter (fc_w = [0; I],
zeroed decoder layers — the measured-optimal drafter on a random-weight base,
PERF.md "Lumina drafter study"), ``stale_draft=True`` must produce the SAME
generation as the full drafter path: every tree node of the passthrough
drafter proposes from the base model's raw distribution at the root, which
the verify step already computed, so ``drf.draft_stale`` replaces the
per-level drafter forwards + lm_head matmuls with re-masked broadcasts of
one saved logits row (reference hot loop being bypassed:
cnets_llamagen.py:944-1023 per-level ea_layer + head calls).
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
    """The hidden-passthrough drafter: output hidden == input base hidden."""
    H = cfg.hidden_size
    fc = np.zeros((2 * H, H), np.float32)
    fc[H:] = np.eye(H)
    out = dict(dparams)
    out["fc_w"] = jnp.asarray(fc, cfg.jnp_dtype)
    out["fc_b"] = jnp.zeros_like(dparams["fc_b"])
    out["layers"] = jax.tree.map(lambda a: a * 0, dparams["layers"])
    return out


@pytest.fixture(scope="module")
def lumina_setup():
    cfg = configs.tiny_config(
        vocab_size=V, hidden_size=64, num_layers=2, num_heads=4,
        rope_kind="1d", cond_kind="none", qk_norm=True,
    )
    dcfg = configs.drafter_config(cfg, total_tokens=10, depth=2, top_k=4)
    params = tfm.init_params(jax.random.key(0), cfg)
    dparams = passthrough(
        drf.init_drafter_params(jax.random.key(1), dcfg, params["embed"]), cfg)
    return cfg, dcfg, params, dparams


def run_pair(cfg, dcfg, params, dparams, ecfg_kw, tree="mc_sim_7b_63",
             token_prompt=None, logits_fn=None, cond=None, uncond=None,
             seed=7):
    tspec = trees.get_tree(tree)
    outs = []
    for stale in (False, True):
        ecfg = spec.SpecDecodeConfig(mode="static", stale_draft=stale,
                                     **ecfg_kw)
        res = spec.generate(
            params, dparams, ecfg, cfg, dcfg, tspec, cond, uncond,
            jax.random.key(seed), token_prompt=token_prompt,
            logits_fn=logits_fn,
        )
        outs.append(res)
    return outs


def assert_same(a, b):
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
    assert int(a.steps) == int(b.steps)
    assert int(a.accept_sum) == int(b.accept_sum)
    assert int(a.n_valid) == int(b.n_valid)


def test_stale_matches_passthrough_lumina_sampling(lumina_setup):
    """Token-prompt + grid FSM + stochastic acceptance: full equivalence."""
    cfg, dcfg, params, dparams = lumina_setup
    tp = cham.lumina_token_prompt([12, 33, 7])
    fsm = cham.LuminaGridFSM(
        w=W_GRID, h=H_GRID, image_start_idx=int(tp.pos_diff), vocab_size=V,
        newline_id=NEWLINE, image_end_id=IMG_END, image_lo=4, image_hi=50,
    )
    full, stale = run_pair(
        cfg, dcfg, params, dparams,
        dict(warp=LogitsWarp(temperature=1.0, top_k=16), cfg_scale=2.0,
             max_new=MAX_NEW),
        token_prompt=tp, logits_fn=fsm)
    assert_same(full, stale)
    # grammar still enforced through the stale per-level FSM re-masking
    toks = np.asarray(stale.tokens)[:MAX_NEW]
    np.testing.assert_array_equal(toks[W_GRID::W_GRID + 1][:H_GRID],
                                  [NEWLINE] * H_GRID)


def test_stale_matches_passthrough_lumina_greedy(lumina_setup):
    cfg, dcfg, params, dparams = lumina_setup
    tp = cham.lumina_token_prompt([5, 9])
    fsm = cham.LuminaGridFSM(
        w=W_GRID, h=H_GRID, image_start_idx=int(tp.pos_diff), vocab_size=V,
        newline_id=NEWLINE, image_end_id=IMG_END, image_lo=4, image_hi=50,
    )
    full, stale = run_pair(
        cfg, dcfg, params, dparams,
        dict(warp=LogitsWarp(temperature=0.0), cfg_scale=2.0,
             max_new=MAX_NEW),
        token_prompt=tp, logits_fn=fsm)
    assert_same(full, stale)


def test_stale_matches_passthrough_llamagen_lantern():
    """Cond-embedding family + LANTERN relaxed acceptance."""
    cfg = configs.tiny_config(cond_kind="label", block_size=16)
    dcfg = configs.drafter_config(cfg, total_tokens=10, depth=2, top_k=4)
    params = tfm.init_params(jax.random.key(0), cfg)
    dparams = passthrough(
        drf.init_drafter_params(jax.random.key(1), dcfg, params["embed"]), cfg)
    emb = np.asarray(params["embed"], np.float64)
    d = ((emb[:, None] - emb[None]) ** 2).sum(-1)
    nearest = jnp.asarray(np.argsort(d, axis=1)[:, 1:10].astype(np.int32))
    params = dict(params, nearest_latents=nearest)
    cond = jnp.asarray([3])
    uncond = jnp.asarray([cfg.num_classes])
    full, stale = run_pair(
        cfg, dcfg, params, dparams,
        dict(warp=LogitsWarp(temperature=1.0, top_k=32), cfg_scale=2.0,
             max_new=16, lantern=LanternSpec(k=8, delta=0.5)),
        cond=cond, uncond=uncond, seed=11)
    assert_same(full, stale)


def test_draft_stale_unit_equivalence(lumina_setup):
    """drf.draft_stale == drf.draft_static with passthrough params, directly
    at the draft level (tokens, residual q, level distributions)."""
    cfg, dcfg, params, dparams = lumina_setup
    tspec = trees.get_tree("mc_sim_7b_63")
    rope = tfm.make_rope_tables(cfg)
    drope = tfm.make_rope_tables(dcfg.model)
    from lantern_tpu.kv import KVCache
    from lantern_tpu.ops import quant

    L = 6
    kv = KVCache.create(dcfg.model, 2).commit(L)
    hid = jax.random.normal(jax.random.key(3), (2, 1, cfg.hidden_size),
                            cfg.jnp_dtype)
    warp = LogitsWarp(temperature=1.0, top_k=16)
    rng = jax.random.key(9)
    full, _ = drf.draft_static(dparams, dcfg, tspec, drope, kv, hid,
                               quant.head_of(params), 2.0, warp, rng)
    from lantern_tpu.ops.sampling import cfg_combine

    root_logits = cfg_combine(
        tfm.logits_head(params, hid), 2.0)[0][0]              # [V] raw
    stale = drf.draft_stale(tspec, root_logits, kv.length, warp, rng)
    np.testing.assert_array_equal(np.asarray(full.ss_token),
                                  np.asarray(stale.ss_token))
    np.testing.assert_allclose(np.asarray(full.ss_prob),
                               np.asarray(stale.ss_prob), rtol=1e-6)
    for a, b in zip(full.level_probs, stale.level_probs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_stale_rejects_dynamic_mode(lumina_setup):
    cfg, dcfg, params, dparams = lumina_setup
    tp = cham.lumina_token_prompt([5])
    ecfg = spec.SpecDecodeConfig(mode="dynamic", stale_draft=True, max_new=4)
    with pytest.raises(ValueError, match="stale_draft"):
        spec.generate(params, dparams, ecfg, cfg, dcfg, None, None, None,
                      jax.random.key(0), token_prompt=tp)


def test_session_auto_stale_matches_explicit_off(lumina_setup):
    """ChameleonSession.random(aligned_drafter=True) flips stale_draft on by
    default ("auto"); the stream must match the full drafter path."""
    from lantern_tpu.engine.session import ChameleonSession

    cfg, dcfg, _, _ = lumina_setup
    sess = ChameleonSession.random(cfg, dcfg, family="lumina",
                                   grid=(H_GRID, W_GRID),
                                   aligned_drafter=True)
    sess.fsm_overrides = dict(newline_id=NEWLINE, image_end_id=IMG_END,
                              image_lo=4, image_hi=50)
    assert sess.passthrough_drafter
    kw = dict(temperature=1.0, top_k=16, cfg_scale=2.0, seed=3,
              tree="mc_sim_7b_63")
    toks_off, stats_off = sess.generate([12, 33], stale_draft=False, **kw)
    toks_auto, stats_auto = sess.generate([12, 33], **kw)
    np.testing.assert_array_equal(toks_off, toks_auto)
    assert stats_off.steps == stats_auto.steps


def test_batched_stale_matches_batched_full(lumina_setup):
    """BatchedEngine with stale_draft: per-slot streams match the full
    drafter path (vmapped draft_stale over slots)."""
    from lantern_tpu.engine.batch import BatchedEngine
    from lantern_tpu.engine.scheduler import Request, Scheduler

    cfg, dcfg, params, dparams = lumina_setup
    tspec = trees.get_tree("mc_sim_7b_63")
    prompts = [[12, 33, 7], [5, 9, 2], [40, 1, 3]]
    fsm = cham.LuminaGridFSM(
        w=W_GRID, h=H_GRID, image_start_idx=3, vocab_size=V,
        newline_id=NEWLINE, image_end_id=IMG_END, image_lo=4, image_hi=50,
    )
    results = {}
    for stale in (False, True):
        ecfg = spec.SpecDecodeConfig(
            warp=LogitsWarp(temperature=1.0, top_k=16), cfg_scale=2.0,
            max_new=MAX_NEW, mode="static", stale_draft=stale)
        eng = BatchedEngine(ecfg=ecfg, cfg=cfg, dcfg=dcfg, tree=tspec,
                            params=params, dparams=dparams, num_slots=2,
                            logits_fn=fsm)
        reqs = [Request(uid=i, token_prompt=cham.lumina_token_prompt(
                            p, grid=(H_GRID, W_GRID)), seed=50 + i)
                for i, p in enumerate(prompts)]
        results[stale] = Scheduler(eng).run(reqs)
    for a, b in zip(results[False], results[True]):
        assert a.error is None and b.error is None
        np.testing.assert_array_equal(a.tokens, b.tokens)
        assert a.steps == b.steps
