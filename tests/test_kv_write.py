"""In-place pallas KV write kernel vs dynamic_update_slice semantics.

The kernel (ops/pallas/kv_update.py) must be bit-identical to the XLA
dynamic_update_slice path for every runtime start offset — including
unaligned starts (read-modify-write window), logical block sizes that are
not tile multiples (masked pad rows), and starts near the end of the buffer
(clamped window).  Reference semantics: KVCache.cat (kv_cache.py:52-66).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lantern_tpu.kv as kvmod
from lantern_tpu.kv import KVCache, group_blocks
from lantern_tpu.ops.pallas.kv_update import write_block


def _ref(buf, new, start):
    z = jnp.zeros((), jnp.int32)
    return jax.lax.dynamic_update_slice(buf, new, (z, z, z, start, z))


@pytest.mark.parametrize("start", [0, 8, 13, 111, -1])   # -1 -> S - t (full)
@pytest.mark.parametrize("t", [57, 64, 5])
def test_write_block_matches_dus(start, t):
    L, B, G, S, W = 2, 3, 2, 192, 128
    if start == -1:
        start = S - t
    key = jax.random.PRNGKey(start * 100 + t)
    kn = jax.random.normal(key, (L, B, G, t, W), jnp.float32)
    vn = -kn
    kb = jnp.full((L, B, G, S, W), 7.0, jnp.float32)
    vb = jnp.full((L, B, G, S, W), -7.0, jnp.float32)
    k2, v2 = write_block(kb, vb, kn, vn, jnp.int32(start), interpret=True)
    np.testing.assert_array_equal(k2, _ref(kb, kn, jnp.int32(start)))
    np.testing.assert_array_equal(v2, _ref(vb, vn, jnp.int32(start)))


def test_kvcache_write_and_accept_pallas_interpret(nano_cfg=None):
    """KVCache.write / accept_path: pallas path == dus path."""
    from lantern_tpu.configs import ModelConfig

    cfg = ModelConfig(
        vocab_size=64, hidden_size=256, num_layers=2, num_heads=2,
        num_kv_heads=2, intermediate_size=256, max_seq_len=192,
        dtype="float32",
    )
    B, T = 2, 17
    key = jax.random.PRNGKey(0)
    k_new = jax.random.normal(key, (cfg.num_layers, B, T, cfg.num_kv_heads, cfg.head_dim))
    v_new = k_new * 0.5
    rel = jnp.array([0, 3, 9, 16, 1, 2], jnp.int32)

    def run():
        c = KVCache.create(cfg, B).commit(jnp.int32(21))
        c = c.write(k_new, v_new, advance=False, offset=0)
        c = c.write(k_new, v_new, advance=True, offset=0)
        c = c.accept_path(rel, jnp.int32(4))
        return c

    prev = kvmod.PALLAS_WRITE
    try:
        kvmod.PALLAS_WRITE = "never"
        ref = run()
        kvmod.PALLAS_WRITE = "interpret"
        got = run()
    finally:
        kvmod.PALLAS_WRITE = prev
    assert cfg.head_dim * cfg.num_kv_heads % 128 == 0  # kernel-eligible layout
    np.testing.assert_array_equal(got.k, ref.k)
    np.testing.assert_array_equal(got.v, ref.v)
    assert int(got.length) == int(ref.length)


def test_pallas_write_grad_falls_back_vmap_uses_stacked_kernel():
    """Differentiated callers must not hit the aliased kernel; vmapped
    callers route through the custom_vmap rule (one stacked kernel)."""
    from lantern_tpu.configs import ModelConfig

    cfg = ModelConfig(
        vocab_size=64, hidden_size=256, num_layers=1, num_heads=2,
        num_kv_heads=2, intermediate_size=256, max_seq_len=64,
        dtype="float32",
    )
    B, T = 1, 16
    k_new = jnp.ones((cfg.num_layers, B, T, cfg.num_kv_heads, cfg.head_dim))

    prev = kvmod.PALLAS_WRITE
    try:
        kvmod.PALLAS_WRITE = "interpret"   # eligible unless a tracer blocks it

        def f(scale):
            c = KVCache.create(cfg, B)
            c = c.write(k_new * scale, k_new * scale)
            return jnp.sum(c.k)

        g = jax.grad(f)(jnp.float32(2.0))          # would fail on pallas path
        assert np.isfinite(float(g))
        out = jax.vmap(f)(jnp.arange(3, dtype=jnp.float32))
        assert out.shape == (3,)
        np.testing.assert_allclose(np.asarray(out),
                                   [float(f(s)) for s in range(3)])
    finally:
        kvmod.PALLAS_WRITE = prev


def test_vmapped_write_per_slot_starts():
    """Request-slot semantics (engine/batch.py): every slot writes its block
    at its OWN length; the stacked kernel must match per-slot dus exactly."""
    from lantern_tpu.configs import ModelConfig

    cfg = ModelConfig(
        vocab_size=64, hidden_size=256, num_layers=2, num_heads=2,
        num_kv_heads=2, intermediate_size=256, max_seq_len=192,
        dtype="float32",
    )
    R, B, T = 3, 2, 17
    key = jax.random.PRNGKey(1)
    k_new = jax.random.normal(
        key, (R, cfg.num_layers, B, T, cfg.num_kv_heads, cfg.head_dim))
    v_new = k_new * 0.25
    lengths = jnp.array([0, 13, 112], jnp.int32)
    rel = jnp.array([2, 0, 5, 1], jnp.int32)

    def one(kn, vn, length):
        c = KVCache.create(cfg, B).commit(length)
        c = c.write(kn, vn, advance=False, offset=0)
        c = c.accept_path(rel, jnp.int32(3))
        return c.k, c.v, c.length

    prev = kvmod.PALLAS_WRITE
    try:
        kvmod.PALLAS_WRITE = "never"
        refs = [one(k_new[i], v_new[i], lengths[i]) for i in range(R)]
        kvmod.PALLAS_WRITE = "interpret"
        got = jax.vmap(one)(k_new, v_new, lengths)
    finally:
        kvmod.PALLAS_WRITE = prev
    for i in range(R):
        np.testing.assert_array_equal(np.asarray(got[0][i]), refs[i][0])
        np.testing.assert_array_equal(np.asarray(got[1][i]), refs[i][1])
        assert int(got[2][i]) == int(refs[i][2])


@pytest.mark.parametrize("start", [0, 8, 13, 111, 135])
@pytest.mark.parametrize("blk", [57, 16, 5])
def test_gather_write_block_matches_take_dus(start, blk):
    """Fused rollback kernel == gather + dynamic_update_slice, for unaligned
    starts and provisional windows that are not tile multiples."""
    from lantern_tpu.ops.pallas.kv_update import gather_write_block

    L, B, G, S, W = 2, 3, 2, 192, 128
    A = min(6, blk)
    rng = np.random.default_rng(start * 100 + blk)
    kb = jnp.asarray(rng.normal(size=(L, B, G, S, W)), jnp.float32)
    vb = -kb * 0.5
    rel = jnp.asarray(rng.integers(0, blk, size=(A,)), jnp.int32)
    st = jnp.int32(start)

    abs_idx = st + rel
    z = jnp.zeros((), jnp.int32)
    k_ref = jax.lax.dynamic_update_slice(
        kb, jnp.take(kb, abs_idx, axis=3), (z, z, z, st, z))
    v_ref = jax.lax.dynamic_update_slice(
        vb, jnp.take(vb, abs_idx, axis=3), (z, z, z, st, z))
    k2, v2 = gather_write_block(kb, vb, rel, st, blk, interpret=True)
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(k_ref))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v_ref))


def test_accept_path_block_size_matches_plain(monkeypatch):
    """KVCache.accept_path(block_size=N) (fused kernel) == the take+write
    path, single and vmapped with per-slot lengths/paths."""
    from lantern_tpu.configs import ModelConfig

    cfg = ModelConfig(
        vocab_size=64, hidden_size=256, num_layers=2, num_heads=2,
        num_kv_heads=2, intermediate_size=256, max_seq_len=192,
        dtype="float32",
    )
    B, T, BLK = 2, 24, 24
    key = jax.random.PRNGKey(3)
    k_new = jax.random.normal(key, (cfg.num_layers, B, T, cfg.num_kv_heads, cfg.head_dim))

    def one(length, rel, block_size):
        c = KVCache.create(cfg, B).commit(length)
        c = c.write(k_new, k_new * 0.5, advance=False)
        c = c.accept_path(rel, jnp.int32(3), block_size=block_size)
        return c.k, c.v, c.length

    lengths = jnp.array([0, 13, 112], jnp.int32)
    rels = jnp.array([[2, 0, 5, 23], [0, 1, 2, 3], [23, 11, 7, 0]], jnp.int32)

    prev = kvmod.PALLAS_WRITE
    try:
        kvmod.PALLAS_WRITE = "never"
        ref1 = one(lengths[1], rels[1], None)
        refs = [one(lengths[i], rels[i], None) for i in range(3)]
        kvmod.PALLAS_WRITE = "interpret"
        got1 = one(lengths[1], rels[1], BLK)
        gotv = jax.vmap(lambda le, re: one(le, re, BLK))(lengths, rels)
    finally:
        kvmod.PALLAS_WRITE = prev
    np.testing.assert_array_equal(np.asarray(got1[0]), np.asarray(ref1[0]))
    np.testing.assert_array_equal(np.asarray(got1[1]), np.asarray(ref1[1]))
    for i in range(3):
        np.testing.assert_array_equal(np.asarray(gotv[0][i]), np.asarray(refs[i][0]))
        np.testing.assert_array_equal(np.asarray(gotv[1][i]), np.asarray(refs[i][1]))
        assert int(gotv[2][i]) == int(refs[i][2])
