"""W8A16 weight-only quantization (ops/quant.py).

Pins: per-channel roundtrip error bounds, XLA and Pallas dequant-matmul
agreement, forward-pass closeness to the bf16 reference, and the spec-decode
engine running end-to-end on quantized params (greedy spec must still be
lossless vs the equally-quantized AR loop — quantization changes the model,
not the engine's exactness guarantee).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lantern_tpu import configs, trees
from lantern_tpu.engine import ar, spec
from lantern_tpu.models import drafter as drf
from lantern_tpu.models import transformer as tfm
from lantern_tpu.ops import quant
from lantern_tpu.ops.sampling import LogitsWarp


def test_quantize_roundtrip_error():
    w = np.random.default_rng(0).normal(size=(64, 96)).astype(np.float32) * 0.05
    q, s = quant.quantize_weight(jnp.asarray(w))
    assert q.dtype == jnp.int8 and s.shape == (1, 96)
    back = np.asarray(q, np.float32) * np.asarray(s)
    # symmetric 8-bit: error <= half a quantization step per element
    step = np.asarray(s)
    assert np.all(np.abs(back - w) <= step / 2 + 1e-7)


def test_quantize_stacked_and_zero_columns():
    w = np.zeros((3, 16, 8), np.float32)
    w[1] = np.random.default_rng(1).normal(size=(16, 8)) * 0.1
    q, s = quant.quantize_weight(jnp.asarray(w))
    assert q.shape == (3, 16, 8) and s.shape == (3, 1, 8)
    assert np.all(np.isfinite(np.asarray(s)))
    np.testing.assert_array_equal(np.asarray(q[0]), 0)


def test_int8_matmul_matches_dense():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 64)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(64, 128)) * 0.05, jnp.float32)
    q, s = quant.quantize_weight(w)
    y_ref = np.asarray(x.astype(jnp.float32) @ w)
    y_q = np.asarray(quant.int8_matmul(x, q, s, out_dtype=jnp.float32))
    # bf16 activations + int8 weights: ~1% relative tolerance on this scale
    assert np.max(np.abs(y_q - y_ref)) < 0.05 * np.max(np.abs(y_ref)) + 0.05


def test_pallas_kernel_matches_xla():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(5, 128)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(128, 256)) * 0.05, jnp.float32)
    q, s = quant.quantize_weight(w)
    y_xla = np.asarray(quant.int8_matmul(x, q, s), np.float32)
    y_pl = np.asarray(
        quant.int8_matmul_pallas(x, q, s, block_n=128, interpret=True),
        np.float32,
    )
    np.testing.assert_allclose(y_pl, y_xla, rtol=2e-2, atol=2e-2)


@pytest.fixture(scope="module")
def tiny():
    cfg = configs.tiny_config(cond_kind="label", block_size=16)
    params = tfm.init_params(jax.random.key(0), cfg)
    return cfg, params


def test_quantize_params_layout(tiny):
    cfg, params = tiny
    qp = quant.quantize_params(tfm.fuse_params(params))
    layers = qp["layers"]
    assert "wqkv_q" in layers and "wqkv_s" in layers and "wqkv" not in layers
    assert "w_down_q" in layers and "w_down" not in layers
    assert "lm_head_q" in qp and "lm_head" not in qp
    # norms untouched
    assert layers["attn_norm"].dtype == params["layers"]["attn_norm"].dtype
    # head helpers
    head = quant.head_of(qp)
    assert isinstance(head, tuple)
    h = jnp.ones((1, cfg.hidden_size), jnp.bfloat16) * 0.1
    lg = tfm.logits_head(qp, h)
    assert lg.dtype == jnp.float32 and lg.shape == (1, cfg.vocab_size)


def test_forward_close_to_bf16(tiny):
    from lantern_tpu.kv import KVCache

    cfg, params = tiny
    qp = quant.quantize_params(params)
    rope = tfm.make_rope_tables(cfg)
    kv = KVCache.create(cfg, batch=1, max_len=32)
    emb = tfm.token_embed(params, jnp.asarray([[1, 2, 3, 4]]))
    pos = jnp.arange(4)
    h_ref = tfm.forward(params, cfg, emb, kv, pos, rope).hidden
    h_q = tfm.forward(qp, cfg, emb, kv, pos, rope).hidden
    d = np.abs(np.asarray(h_ref, np.float32) - np.asarray(h_q, np.float32))
    scale = np.abs(np.asarray(h_ref, np.float32)).max()
    assert d.max() < 0.05 * scale + 0.05


def test_tp_specs_cover_quantized_layout(tiny):
    from jax.sharding import PartitionSpec as P

    from lantern_tpu.parallel import mesh as pmesh

    cfg, params = tiny
    qp = quant.quantize_params(params)
    m = pmesh.make_mesh(8, dp=2)
    specs = pmesh.base_param_specs(cfg, m, params=qp)
    # every param leaf has a spec leaf of matching tree path
    jax.tree.map(lambda a, s: None, qp, specs)  # raises on structure mismatch
    ly = specs["layers"]
    # int8 kernels shard exactly like their dense counterparts
    dense = pmesh.base_param_specs(cfg, m)
    assert ly["wq_q"] == dense["layers"]["wq"]
    assert ly["w_down_q"] == dense["layers"]["w_down"]
    assert specs["lm_head_q"] == dense["lm_head"]
    # scales: column-parallel keeps the N axis sharding of the kernel
    assert ly["wq_s"] == P(None, None, pmesh.TP)
    # row-parallel scale must not shard its singleton K axis
    assert ly["w_down_s"][-2] is None
    assert specs["lm_head_s"][-1] == specs["lm_head_q"][-1]
    # shard + run: values match unsharded forward
    sharded = pmesh.shard_pytree(qp, specs, m)
    h = jnp.ones((1, cfg.hidden_size), jnp.bfloat16) * 0.1
    np.testing.assert_allclose(
        np.asarray(tfm.logits_head(sharded, h)),
        np.asarray(tfm.logits_head(qp, h)), rtol=1e-5, atol=1e-5,
    )


def test_quantized_spec_engine_lossless_vs_quantized_ar(tiny):
    cfg, params = tiny
    dcfg = configs.drafter_config(cfg, total_tokens=12, depth=3, top_k=4)
    dparams = quant.quantize_params(
        drf.init_drafter_params(jax.random.key(1), dcfg, params["embed"])
    )
    assert "fc_w_q" in dparams and "fc_w" not in dparams
    qp = quant.quantize_params(params)
    MAX_NEW = 12
    res_ar = ar.generate(
        qp, cfg, jnp.asarray([3]), jnp.asarray([cfg.num_classes]),
        MAX_NEW, 2.0, LogitsWarp(temperature=0.0), jax.random.key(7),
    )
    ecfg = spec.SpecDecodeConfig(
        warp=LogitsWarp(temperature=0.0), cfg_scale=2.0,
        max_new=MAX_NEW, mode="static",
    )
    res = spec.generate(
        qp, dparams, ecfg, cfg, dcfg, trees.get_tree("mc_sim_7b_63"),
        jnp.asarray([3]), jnp.asarray([cfg.num_classes]), jax.random.key(7),
    )
    np.testing.assert_array_equal(np.asarray(res.tokens),
                                  np.asarray(res_ar.tokens))
