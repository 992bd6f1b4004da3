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


def _grouped(args):
    """Kernel variant of the dense-reference args: caches in the storage
    layout (head-group-major, see kv.group_cache)."""
    from lantern_tpu.kv import group_cache
    q, kn, vn, kc, vc, *rest = args
    return (q, kn, vn, group_cache(kc), group_cache(vc), *rest)


@pytest.mark.parametrize("length", [0, 1, 120, 137, 256, 512])
def test_kernel_matches_dense(length):
    args = make_case(0, length=length)
    scale = 64 ** -0.5
    ref = ta.tree_attention_reference(*args, scale)
    got = ta.tree_attention(*_grouped(args), scale, blk=128, interpret=True)
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
    got = ta.tree_attention(*_grouped(args), scale, blk=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2,
    )


def test_kernel_per_row_lengths():
    """[B] lengths (batched-engine slots) match per-row dense reference."""
    args = make_case(5, length=0)
    q, kn, vn, kc, vc, _, mask, bias = args
    lens = jnp.asarray([137, 64], jnp.int32)
    scale = 64 ** -0.5
    ref = ta.tree_attention_reference(q, kn, vn, kc, vc, lens, mask, bias, scale)
    got = ta.tree_attention(*_grouped((q, kn, vn, kc, vc)), lens, mask, bias,
                            scale, blk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="flash path active only on TPU (see forward)")
def test_flash_forward_matches_dense_forward():
    """forward(use_flash_attention=True) must match the dense forward for
    prefill, decode, and tree blocks.

    Geometry: hidden 128 / 2 heads -> head_dim 64, n_kv*hd = 128, so the
    cache groups to (G=1, W=128) and the REAL pallas kernel engages (the
    default tiny config's 16-wide heads would silently fall back to dense).
    Tolerance is MXU-precision-bounded: the dense path itself moves ~7e-4
    between default and 'highest' matmul precision on TPU.
    """
    from lantern_tpu import configs, trees
    from lantern_tpu.kv import GRP, KVCache
    from lantern_tpu.models import transformer as tfm

    cfg = configs.tiny_config(hidden_size=128, num_heads=2, cond_kind="label",
                              block_size=16, max_seq_len=128)
    fcfg = cfg.replace(use_flash_attention=True)
    assert KVCache.create(fcfg, 1).group_width == GRP   # kernel really engages
    params = tfm.init_params(jax.random.key(0), cfg)
    rope = tfm.make_rope_tables(cfg)

    def run(c):
        kv = KVCache.create(c, 2)
        rng = np.random.default_rng(0)
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

    dense = run(cfg.replace(use_flash_attention=False))
    flash = run(fcfg)
    for i, (a, b) in enumerate(zip(dense, flash)):
        np.testing.assert_allclose(b, a, rtol=5e-3, atol=2e-3, err_msg=f"stage {i}")


def test_kernel_selftest_interpret():
    """The bench's pre-flight kernel-parity lane (ops/pallas/selftest.py):
    interpret mode here; the compiled-Mosaic execution path is
    ``BENCH_SELFTEST=1 python bench.py`` (default on) or
    ``python -m lantern_tpu.ops.pallas.selftest`` on a chip."""
    from lantern_tpu.ops.pallas.selftest import run_kernel_selftest

    errs = run_kernel_selftest()
    assert set(errs) >= {"tree_attention", "kv_write", "kv_rollback",
                         "int8_matmul"}
