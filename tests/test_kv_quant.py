"""int8 KV cache (kv.py quantized=True).

Pins: quantize/dequant roundtrip bounds, scale bookkeeping through write /
accept_path, dense-path forward closeness vs a bf16 cache, the scaled flash
kernel vs the dense reference, and the engine-level losslessness contract:
greedy speculative decode with an int8 KV cache produces exactly the greedy
AR stream of the same int8-cached model (the in-flight block fake-quant in
transformer.forward is what makes this exact).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lantern_tpu import configs, trees
from lantern_tpu.engine import ar, spec
from lantern_tpu.kv import (
    KVCache,
    dequant_cache,
    fake_quant_rows,
    group_blocks,
    quantize_rows,
    ungroup_blocks,
    ungroup_cache,
)
from lantern_tpu.models import drafter as drf
from lantern_tpu.models import transformer as tfm
from lantern_tpu.ops.sampling import LogitsWarp


def test_quantize_rows_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 7, 128)),
                    jnp.float32)
    q, s = quantize_rows(x)
    assert q.dtype == jnp.int8 and s.shape == (2, 3, 7)
    back = q.astype(jnp.float32) * s[..., None]
    err = jnp.abs(back - x)
    assert float(jnp.max(err)) <= float(jnp.max(s)) / 2 + 1e-6
    # fake-quant == dequant(quantize(.))
    np.testing.assert_array_equal(np.asarray(fake_quant_rows(x)),
                                  np.asarray(back.astype(x.dtype)))


def test_group_ungroup_blocks_inverse():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 5, 4, 32)),
                    jnp.float32)                      # [B, T, nkv, hd]
    g = group_blocks(x)
    y = ungroup_blocks(g).reshape(x.shape)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


@pytest.fixture(scope="module")
def qcfg():
    # kernel-eligible layout: n_kv * head_dim % 128 == 0
    return configs.ModelConfig(
        vocab_size=128, hidden_size=256, num_layers=2, num_heads=2,
        num_kv_heads=2, intermediate_size=256, max_seq_len=128,
        dtype="float32", cond_kind="label", num_classes=10, block_size=16,
        cls_token_num=1,
    )


def test_cache_write_accept_scales(qcfg):
    cfg = qcfg
    B, T = 2, 9
    kn = jnp.asarray(
        np.random.default_rng(2).normal(
            size=(cfg.num_layers, B, T, cfg.num_kv_heads, cfg.head_dim)),
        jnp.float32)
    c = KVCache.create(cfg, B, quantized=True)
    assert c.quantized and c.k.dtype == jnp.int8
    c = c.write(kn, kn * 0.5, advance=True)
    # dequantized rows ~ originals
    deq = ungroup_cache(dequant_cache(c.k, c.k_scale), cfg.num_kv_heads,
                        cfg.head_dim)[:, :, :T]
    ref = np.asarray(kn)
    got = np.asarray(deq)
    assert np.max(np.abs(got - ref)) < 0.01 * np.max(np.abs(ref)) + 1e-5
    # accept_path moves scale rows along with int8 rows
    c2 = c.write(kn, kn, advance=False)
    rel = jnp.array([3, 0, 7], jnp.int32)
    c3 = c2.accept_path(rel, jnp.int32(3))
    picked = np.asarray(jnp.take(c2.k_scale, c2.length + rel, axis=3))
    land = np.asarray(c3.k_scale)[:, :, :, T: T + 3]
    np.testing.assert_array_equal(land, picked)
    assert picked.max() > 0


def test_forward_quantized_cache_close_to_bf16(qcfg):
    cfg = qcfg
    params = tfm.init_params(jax.random.key(0), cfg)
    rope = tfm.make_rope_tables(cfg)
    ids = jnp.asarray([[1, 2, 3, 4, 5, 6]])
    emb = tfm.token_embed(params, ids)
    pos = jnp.arange(6)

    def run(quantized):
        kv = KVCache.create(cfg, 1, quantized=quantized)
        r1 = tfm.forward(params, cfg, emb, kv, pos, rope)
        # second block attends over the cached first block
        r2 = tfm.forward(params, cfg, emb, r1.kv, pos + 6, rope)
        return np.asarray(r2.hidden, np.float32)

    h_ref, h_q = run(False), run(True)
    scale = np.abs(h_ref).max()
    assert np.max(np.abs(h_ref - h_q)) < 0.05 * scale + 0.05


def test_scaled_flash_kernel_matches_dense(qcfg):
    from lantern_tpu.ops.pallas.tree_attention import (
        tree_attention,
        tree_attention_reference,
    )

    cfg = qcfg
    nh, hd = cfg.num_heads, cfg.head_dim
    B, T = 2, 8
    rng = np.random.default_rng(3)
    c = KVCache.create(cfg, B, quantized=True)
    S = c.max_len
    pre = jnp.asarray(rng.normal(size=(cfg.num_layers, B, 40, nh, hd)),
                      jnp.float32)
    c = c.write(pre, pre * 0.3, advance=True)
    q = jnp.asarray(rng.normal(size=(B, T, nh, hd)), jnp.float32)
    k_new = jnp.asarray(rng.normal(size=(B, T, nh, hd)), jnp.float32)
    v_new = jnp.asarray(rng.normal(size=(B, T, nh, hd)), jnp.float32)
    mask = jnp.tril(jnp.ones((T, T), bool))
    bias = jnp.zeros((B, S), jnp.float32)

    out = tree_attention(
        q, k_new, v_new, c.k[0], c.v[0], c.length, mask, bias, hd ** -0.5,
        interpret=True, k_scale=c.k_scale[0], v_scale=c.v_scale[0],
    )
    # dense reference over the dequantized cache
    kd = ungroup_cache(dequant_cache(c.k[0], c.k_scale[0]), nh, hd)
    vd = ungroup_cache(dequant_cache(c.v[0], c.v_scale[0]), nh, hd)
    ref = tree_attention_reference(
        q, k_new, v_new, kd, vd, c.length, mask, bias, hd ** -0.5)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-3, atol=2e-3)


def test_greedy_spec_lossless_with_int8_kv(qcfg):
    cfg = qcfg
    dcfg = configs.drafter_config(cfg, total_tokens=10, depth=2, top_k=4)
    params = tfm.init_params(jax.random.key(0), cfg)
    dparams = drf.init_drafter_params(jax.random.key(1), dcfg, params["embed"])
    MAX_NEW = 12
    res_ar = ar.generate(
        params, cfg, jnp.asarray([3]), jnp.asarray([cfg.num_classes]),
        MAX_NEW, 2.0, LogitsWarp(temperature=0.0), jax.random.key(7),
        kv_quant=True,
    )
    ecfg = spec.SpecDecodeConfig(
        warp=LogitsWarp(temperature=0.0), cfg_scale=2.0,
        max_new=MAX_NEW, mode="static", kv_quant=True,
    )
    res = spec.generate(
        params, dparams, ecfg, cfg, dcfg, trees.get_tree("mc_sim_7b_63"),
        jnp.asarray([3]), jnp.asarray([cfg.num_classes]), jax.random.key(7),
    )
    np.testing.assert_array_equal(np.asarray(res.tokens),
                                  np.asarray(res_ar.tokens))
    assert int(res.accept_sum) >= int(res.steps)
