"""Pallas flash tree-attention: parity vs the dense reference (interpret mode
on CPU; the same kernel compiles for TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lantern_tpu.ops.pallas import tree_attention as ta


def make_case(seed, B=2, T=16, nh=4, hd=64, S=512, length=137):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(B, T, nh, hd)).astype(np.float32)
    kn = rng.normal(size=(B, T, nh, hd)).astype(np.float32)
    vn = rng.normal(size=(B, T, nh, hd)).astype(np.float32)
    kc = rng.normal(size=(B, S, nh, hd)).astype(np.float32)
    vc = rng.normal(size=(B, S, nh, hd)).astype(np.float32)
    # random ancestor-ish mask with diagonal
    mask = (rng.random((T, T)) < 0.4) | np.eye(T, dtype=bool)
    bias = np.zeros((B, S), np.float32)
    bias[0, :7] = ta.NEG_INF      # left-padded prompt on row 0
    return (jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
            jnp.asarray(kc), jnp.asarray(vc), jnp.asarray(length),
            jnp.asarray(mask), jnp.asarray(bias))


@pytest.mark.parametrize("length", [0, 1, 120, 137, 256, 512])
def test_kernel_matches_dense(length):
    args = make_case(0, length=length)
    scale = 64 ** -0.5
    ref = ta.tree_attention_reference(*args, scale)
    got = ta.tree_attention(*args, scale, blk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_kernel_bf16(seed=3):
    args = make_case(seed, length=200)
    args = tuple(
        a.astype(jnp.bfloat16) if a.dtype == jnp.float32 and a.ndim == 4 else a
        for a in args
    )
    scale = 64 ** -0.5
    ref = ta.tree_attention_reference(*args, scale)
    got = ta.tree_attention(*args, scale, blk=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2,
    )


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="flash path active only on TPU (see forward)")
def test_flash_forward_matches_dense_forward():
    """forward(use_flash_attention=True) must match the dense forward for
    prefill, decode, and tree blocks."""
    from lantern_tpu import configs, trees
    from lantern_tpu.kv import KVCache
    from lantern_tpu.models import transformer as tfm

    cfg = configs.tiny_config(cond_kind="label", block_size=16, max_seq_len=128)
    fcfg = cfg.replace(use_flash_attention=True)
    params = tfm.init_params(jax.random.key(0), cfg)
    rope = tfm.make_rope_tables(cfg)
    rng = np.random.default_rng(0)

    def run(c):
        kv = KVCache.create(c, 2)
        emb = jnp.asarray(rng.normal(size=(2, 1, c.hidden_size)).astype(np.float32))
        outs = []
        r = tfm.forward(params, c, emb, kv, jnp.arange(1), rope)
        outs.append(np.asarray(r.hidden)); kv = r.kv
        # a few decode steps
        for i in range(3):
            r = tfm.forward(params, c, emb, kv, jnp.asarray([1 + i]), rope)
            outs.append(np.asarray(r.hidden)); kv = r.kv
        # tree block, provisional
        spec = trees.get_tree("chain")
        temb = jnp.asarray(rng.normal(size=(2, spec.num_nodes, c.hidden_size)).astype(np.float32))
        r = tfm.forward(params, c, temb, kv, jnp.asarray(spec.depth + 4), rope,
                        block_mask=jnp.asarray(spec.attn_mask), commit=False)
        outs.append(np.asarray(r.hidden))
        return outs

    rng = np.random.default_rng(0)
    dense = run(cfg)
    rng = np.random.default_rng(0)
    flash = run(fcfg)
    for i, (a, b) in enumerate(zip(dense, flash)):
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-5, err_msg=f"stage {i}")
