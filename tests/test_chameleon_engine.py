"""Chameleon-family (Anole-style) speculative engine: greedy spec decode must
reproduce a directly-computed greedy AR stream with dual-branch positions,
left-padded prompts, and non-image logit masking."""

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
MAX_NEW = 12


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


def ar_oracle(cfg, params, tp, cfg_scale, mask, max_new):
    """Direct greedy CFG AR loop over a TokenPrompt (the ground truth the
    speculative engine must reproduce)."""
    rope = tfm.make_rope_tables(cfg)
    kv = KVCache.create(cfg, 2)
    L = tp.tokens.shape[1]
    block = jnp.tril(jnp.ones((L, L), bool))[None] & tp.valid[:, None, :]
    res = tfm.forward(params, cfg, tfm.token_embed(params, tp.tokens), kv,
                      tp.positions, rope, block_mask=block)
    kv = res.kv
    S = kv.max_len
    pv = np.ones((2, S), bool)
    pv[:, :L] = np.asarray(tp.valid)
    pv = jnp.asarray(pv)
    logits = cfg_combine(tfm.logits_head(params, res.hidden[:, -1:]), cfg_scale)[0, -1]
    logits = jnp.where(mask, -1e30, logits)
    tok = int(jnp.argmax(logits))
    out = [tok]
    diff = int(tp.pos_diff)
    for i in range(max_new - 1):
        p = L + i
        pos = jnp.asarray([[p], [p - diff]])
        res = tfm.forward(params, cfg,
                          tfm.token_embed(params, jnp.asarray([[tok], [tok]])),
                          kv, pos, rope, prefix_valid=pv)
        kv = res.kv
        logits = cfg_combine(tfm.logits_head(params, res.hidden[:, -1:]), cfg_scale)[0, -1]
        logits = jnp.where(mask, -1e30, logits)
        tok = int(jnp.argmax(logits))
        out.append(tok)
    return np.asarray(out)


@pytest.mark.parametrize("mode,tree", [("static", "mc_sim_7b_63"), ("dynamic", None)])
def test_anole_greedy_spec_matches_ar(setup, mode, tree):
    cfg, dcfg, params, dparams = setup
    tp = cham.anole_token_prompt([12, 33, 7])
    mask = jnp.asarray(cham.non_image_token_mask(V))
    expected = ar_oracle(cfg, params, tp, 2.0, mask, MAX_NEW)
    assert (expected >= 4).all(), "oracle must emit image-range tokens"

    ecfg = spec.SpecDecodeConfig(
        warp=LogitsWarp(temperature=0.0), cfg_scale=2.0,
        max_new=MAX_NEW, mode=mode,
    )
    tspec = trees.get_tree(tree) if tree else None
    res = spec.generate(
        params, dparams, ecfg, cfg, dcfg, tspec, None, None,
        jax.random.key(7), token_prompt=tp, logits_mask=mask,
    )
    np.testing.assert_array_equal(np.asarray(res.tokens)[:MAX_NEW], expected)


def test_anole_prompt_layout():
    tp = cham.anole_token_prompt([10, 11])
    toks = np.asarray(tp.tokens)
    # cond: [0, 10, 11, 8710, 8197]; uncond: [1, 1, 1, 0, 8197]
    np.testing.assert_array_equal(toks[0], [0, 10, 11, cham.ANOLE_EOT, cham.IMAGE_START_ID])
    np.testing.assert_array_equal(toks[1], [1, 1, 1, 0, cham.IMAGE_START_ID])
    np.testing.assert_array_equal(np.asarray(tp.positions)[1], [0, 0, 0, 0, 1])
    assert int(tp.pos_diff) == 3
    v = np.asarray(tp.valid)
    assert v[1, -2:].all() and not v[1, :-2].any()


def test_nearest_table_shift():
    t = np.arange(12).reshape(4, 3).astype(np.int32)
    out = cham.shift_nearest_table(t, vocab_size=32)
    np.testing.assert_array_equal(out[4], t[0] + 4)
    np.testing.assert_array_equal(out[7], t[3] + 4)
    assert (out[0] == 0).all() and (out[8:] == 0).all()


def test_vocab_map_tables():
    """IMGIMG-name translation matches the reference mapping semantics
    (modeling_anole_kv.py:1110-1152): IMGIMG<letters>Z -> digits by A=0..J=9."""
    vocab_map = {
        "<image>": 1,
        "IMGIMGBAZ": 14,   # "BA" -> "10" -> code 10
        "IMGIMGAAZ": 12,   # "AA" -> "00" -> code 0
        "IMGIMGACZ": 13,   # "AC" -> "02" -> code 2
        "text_tok": 5,
    }
    img2bpe, bpe2img = cham.vocab_map_tables(vocab_map)
    assert img2bpe[10] == 14 and img2bpe[0] == 12 and img2bpe[2] == 13
    assert bpe2img[14] == 10 and bpe2img[12] == 0 and bpe2img[13] == 2
    assert bpe2img[5] == -1


def test_anole_spec_with_int8_kv_lossless(setup):
    """Quantized KV with left-padded dual-position prompts: greedy spec must
    reproduce the engine's own AR mode on the same int8 cache (ar.generate_
    tokens is the user surface, so the oracle here is the engine AR path)."""
    from lantern_tpu.engine import ar

    cfg, dcfg, params, dparams = setup
    tp = cham.anole_token_prompt([12, 33, 7])
    mask = jnp.asarray(cham.non_image_token_mask(V))
    res_ar = ar.generate_tokens(
        params, cfg, tp, MAX_NEW, 2.0, LogitsWarp(temperature=0.0),
        jax.random.key(7), logits_mask=mask, kv_quant=True,
    )
    ecfg = spec.SpecDecodeConfig(
        warp=LogitsWarp(temperature=0.0), cfg_scale=2.0,
        max_new=MAX_NEW, mode="static", kv_quant=True,
    )
    res = spec.generate(
        params, dparams, ecfg, cfg, dcfg, trees.get_tree("mc_sim_7b_63"),
        None, None, jax.random.key(7), token_prompt=tp, logits_mask=mask,
    )
    np.testing.assert_array_equal(np.asarray(res.tokens)[:MAX_NEW],
                                  np.asarray(res_ar.tokens)[:MAX_NEW])


def test_pad_rows_invisible_to_engine(setup):
    """Left-pad rows must not influence generation at all — base AND drafter
    mask them (the reference threads the pad attention_mask into the anole
    drafter's forwards, ea_model_anole.py:437).  Scrambling pad token ids
    must leave the sampled output stream unchanged."""
    cfg, dcfg, params, dparams = setup
    tp = cham.anole_token_prompt([12, 33, 7])
    assert not bool(np.asarray(tp.valid).all()), "prompt must have pads"
    mask = jnp.asarray(cham.non_image_token_mask(V))
    ecfg = spec.SpecDecodeConfig(
        warp=LogitsWarp(temperature=1.0, top_k=8), cfg_scale=2.0,
        max_new=MAX_NEW, mode="static",
    )

    def run(tp_):
        res = spec.generate(
            params, dparams, ecfg, cfg, dcfg, trees.get_tree("mc_sim_7b_63"),
            None, None, jax.random.key(3), token_prompt=tp_, logits_mask=mask,
        )
        return np.asarray(res.tokens)

    def proposals(tp_):
        state, _, _ = spec.prefill_request(
            params, dparams, ecfg, cfg, dcfg, trees.get_tree("mc_sim_7b_63"),
            None, None, jax.random.key(3), token_prompt=tp_,
            logits_mask=mask,
        )
        return np.asarray(state.draft.ss_token)

    ref = run(tp)
    prop_ref = proposals(tp)
    scrambled = tp._replace(
        tokens=jnp.where(tp.valid.astype(bool), tp.tokens, 41))
    np.testing.assert_array_equal(run(scrambled), ref)
    # the draft proposals themselves must be pad-invariant (catches drafter
    # pad leakage even when the verified output happens not to flip)
    np.testing.assert_array_equal(proposals(scrambled), prop_ref)


def test_batched_ar_tokens_matches_single():
    """ChameleonSession.generate_batch(mode='ar'): lockstep-vmapped token-
    prompt AR (ar.generate_tokens_many), bucketed by prompt length, matches
    single-request AR streams per seed."""
    from lantern_tpu.engine.session import ChameleonSession

    cfg = configs.tiny_config(
        vocab_size=256, hidden_size=64, num_layers=2, num_heads=4,
        rope_kind="1d", cond_kind="none", qk_norm=True, max_seq_len=160)
    dcfg = configs.drafter_config(cfg, total_tokens=8, depth=2, top_k=4)
    sess = ChameleonSession.random(cfg, dcfg, family="lumina", grid=(2, 3))
    sess.fsm_overrides = dict(newline_id=250, image_end_id=251,
                              image_lo=4, image_hi=249)
    prompts = [[7, 8], [9, 10], [7, 8, 11]]       # two lengths -> 2 buckets
    done = sess.generate_batch(prompts, slots=2, mode="ar",
                               temperature=0.0, cfg_scale=2.0)
    assert [r.uid for r in done] == [0, 1, 2]
    for r in done:
        assert r.error is None
        single, _ = sess.generate(prompts[r.uid], temperature=0.0,
                                  cfg_scale=2.0, mode="ar", seed=r.uid)
        np.testing.assert_array_equal(r.tokens, single)
