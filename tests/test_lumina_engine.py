"""Lumina-style engine test: greedy spec decode with the grid-constraint FSM
must reproduce the AR oracle AND obey the image grammar (newline every w+1
tokens, end-of-image at the end)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lantern_tpu import configs, trees
from lantern_tpu.engine import spec
from lantern_tpu.kv import KVCache
from lantern_tpu.models import chameleon as cham
from lantern_tpu.models import drafter as drf
from lantern_tpu.models import transformer as tfm
from lantern_tpu.ops.sampling import LogitsWarp, cfg_combine

V = 64
NEWLINE, IMG_END = 60, 61
H_GRID, W_GRID = 2, 3
MAX_NEW = (W_GRID + 1) * H_GRID + 1     # rows + newlines + eos


@pytest.fixture(scope="module")
def setup():
    cfg = configs.tiny_config(
        vocab_size=V, hidden_size=64, num_layers=2, num_heads=4,
        rope_kind="1d", cond_kind="none", qk_norm=True,
    )
    dcfg = configs.drafter_config(cfg, total_tokens=10, depth=2, top_k=4)
    params = tfm.init_params(jax.random.key(0), cfg)
    dparams = drf.init_drafter_params(jax.random.key(1), dcfg, params["embed"])
    return cfg, dcfg, params, dparams


def make_fsm(tp):
    return cham.LuminaGridFSM(
        w=W_GRID, h=H_GRID, image_start_idx=int(tp.pos_diff), vocab_size=V,
        newline_id=NEWLINE, image_end_id=IMG_END, image_lo=4, image_hi=50,
    )


def ar_oracle(cfg, params, tp, fsm, cfg_scale, max_new):
    rope = tfm.make_rope_tables(cfg)
    kv = KVCache.create(cfg, 2)
    L = tp.tokens.shape[1]
    block = jnp.tril(jnp.ones((L, L), bool))[None] & tp.valid[:, None, :]
    res = tfm.forward(params, cfg, tfm.token_embed(params, tp.tokens), kv,
                      tp.positions, rope, block_mask=block)
    kv = res.kv
    pv = np.ones((2, kv.max_len), bool)
    pv[:, :L] = np.asarray(tp.valid)
    pv = jnp.asarray(pv)
    diff = int(tp.pos_diff)
    out = []
    logits = cfg_combine(tfm.logits_head(params, res.hidden[:, -1:]), cfg_scale)[0, -1]
    logits = fsm(logits[None], jnp.asarray([L - 1]))[0]
    tok = int(jnp.argmax(logits))
    out.append(tok)
    for i in range(max_new - 1):
        p = L + i
        res = tfm.forward(params, cfg,
                          tfm.token_embed(params, jnp.asarray([[tok], [tok]])),
                          kv, jnp.asarray([[p], [p - diff]]), rope,
                          prefix_valid=pv)
        kv = res.kv
        logits = cfg_combine(tfm.logits_head(params, res.hidden[:, -1:]), cfg_scale)[0, -1]
        logits = fsm(logits[None], jnp.asarray([p]))[0]
        tok = int(jnp.argmax(logits))
        out.append(tok)
    return np.asarray(out)


@pytest.mark.parametrize("mode,tree", [("static", "mc_sim_7b_63"), ("dynamic", None)])
def test_lumina_greedy_spec_matches_ar_and_grammar(setup, mode, tree):
    cfg, dcfg, params, dparams = setup
    tp = cham.lumina_token_prompt([12, 33, 7])
    fsm = make_fsm(tp)
    expected = ar_oracle(cfg, params, tp, fsm, 2.0, MAX_NEW)

    # grammar: every (w+1)-th generated token is the newline; last is eos
    np.testing.assert_array_equal(expected[W_GRID::W_GRID + 1][:H_GRID],
                                  [NEWLINE] * H_GRID)
    assert expected[-1] == IMG_END
    inner = np.delete(expected[:-1], np.arange(W_GRID, MAX_NEW - 1, W_GRID + 1))
    assert ((inner >= 4) & (inner <= 50)).all()

    ecfg = spec.SpecDecodeConfig(
        warp=LogitsWarp(temperature=0.0), cfg_scale=2.0,
        max_new=MAX_NEW, mode=mode,
    )
    tspec = trees.get_tree(tree) if tree else None
    res = spec.generate(
        params, dparams, ecfg, cfg, dcfg, tspec, None, None,
        jax.random.key(7), token_prompt=tp, logits_fn=fsm,
    )
    np.testing.assert_array_equal(np.asarray(res.tokens)[:MAX_NEW], expected)
    # syntax tokens come for free through the drafter FSM -> they are always
    # accepted; with only 4-wide trees compression must exceed 1
    assert float(res.accept_sum) / float(res.steps) > 1.0


def test_lumina_prompt_layout():
    tp = cham.lumina_token_prompt([40, 41])
    toks = np.asarray(tp.tokens)
    np.testing.assert_array_equal(toks[0], [40, 41, 8197, 8828, 8828])
    assert int(tp.pos_diff) == 2
    np.testing.assert_array_equal(np.asarray(tp.positions)[1], [0, 0, 0, 1, 2])
    v = np.asarray(tp.valid)
    assert v[1, -3:].all() and not v[1, :-3].any()
