"""Tensor-parallel sharding tests on the 8-device virtual CPU mesh.

The invariant: sharded execution computes the same thing.  Greedy decode is
deterministic, so the committed token stream under (dp=2, tp=4) must equal the
single-device stream bit-for-bit at the token level.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lantern_tpu import configs, trees
from lantern_tpu.engine import spec as spec_engine
from lantern_tpu.models import drafter as drf
from lantern_tpu.models import transformer as tfm
from lantern_tpu.ops.sampling import LogitsWarp
from lantern_tpu.parallel import mesh as pmesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def setup():
    cfg = configs.tiny_config(
        cond_kind="label", block_size=16, num_heads=8, hidden_size=128,
        vocab_size=512,
    )
    dcfg = configs.drafter_config(cfg, total_tokens=10, depth=2, top_k=4)
    params = tfm.init_params(jax.random.key(0), cfg)
    dparams = drf.init_drafter_params(jax.random.key(1), dcfg, params["embed"])
    return cfg, dcfg, params, dparams


def run(cfg, dcfg, params, dparams, max_new=12):
    ecfg = spec_engine.SpecDecodeConfig(
        warp=LogitsWarp(temperature=0.0), cfg_scale=2.0, max_new=max_new,
        mode="static",
    )
    res = spec_engine.generate(
        params, dparams, ecfg, cfg, dcfg, trees.get_tree("mc_sim_7b_63"),
        jnp.asarray([3]), jnp.asarray([cfg.num_classes]), jax.random.key(7),
    )
    return np.asarray(res.tokens), int(res.steps)


@pytest.mark.parametrize("dp", [1, 2])
def test_sharded_spec_decode_matches_single_device(setup, dp):
    cfg, dcfg, params, dparams = setup
    ref_tokens, ref_steps = run(cfg, dcfg, params, dparams)

    mesh = pmesh.make_mesh(8, dp=dp)
    sp = pmesh.shard_pytree(params, pmesh.base_param_specs(cfg, mesh), mesh)
    sd = pmesh.shard_pytree(dparams, pmesh.drafter_param_specs(dparams), mesh)
    with jax.set_mesh(mesh):
        got_tokens, got_steps = run(cfg, dcfg, sp, sd)
    np.testing.assert_array_equal(got_tokens, ref_tokens)
    assert got_steps == ref_steps


def test_param_specs_cover_tree(setup):
    cfg, dcfg, params, dparams = setup
    mesh = pmesh.make_mesh(8, dp=1)
    specs = pmesh.base_param_specs(cfg, mesh)
    # every param leaf must have a spec with matching rank
    shardings = pmesh.tree_shardings(params, specs, mesh)
    for (pth, leaf), (_, sh) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(shardings),
    ):
        assert len(sh.spec) <= leaf.ndim, (pth, sh.spec, leaf.shape)


def test_batched_engine_with_tp_sharded_params(setup):
    """Production serving config: the batched (vmapped-slot) engine over
    TP-sharded base weights — tokens must match the unsharded batched run."""
    from lantern_tpu.engine.batch import BatchedEngine

    cfg, dcfg, params, dparams = setup
    ecfg = spec_engine.SpecDecodeConfig(
        warp=LogitsWarp(temperature=0.0), cfg_scale=2.0, max_new=10,
        mode="static",
    )
    tree = trees.get_tree("mc_sim_7b_63")

    def run_batched(p, d, mesh=None):
        import contextlib

        ctx = jax.set_mesh(mesh) if mesh is not None else contextlib.nullcontext()
        with ctx:
            eng = BatchedEngine(ecfg, cfg, dcfg, tree, p, d, num_slots=2)
            reqs = [eng.prefill(jnp.asarray([lbl]),
                                jnp.asarray([cfg.num_classes]),
                                jax.random.key(7)) for lbl in (3, 5)]
            batch = eng.empty_batch(reqs[0])
            for i, r in enumerate(reqs):
                batch = eng.insert(batch, i, r)
            for _ in range(14):
                batch = eng.step(batch)
                n_new, _, _ = eng.slot_status(batch)
                if (n_new >= 10).all():
                    break
            return [np.asarray(eng.slot_tokens(batch, i))[:10]
                    for i in range(2)]

    ref = run_batched(params, dparams)
    mesh = pmesh.make_mesh(8, dp=2)
    sp = pmesh.shard_pytree(params, pmesh.base_param_specs(cfg, mesh), mesh)
    sd = pmesh.shard_pytree(dparams, pmesh.drafter_param_specs(dparams), mesh)
    got = run_batched(sp, sd, mesh)
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(a, b)


def test_sharded_spec_decode_with_int8_kv(setup):
    """TP-sharded decode with the quantized KV cache (scale planes shard
    with their head groups) must match the unsharded int8-KV run."""
    cfg, dcfg, params, dparams = setup

    def run_q(p, d):
        ecfg = spec_engine.SpecDecodeConfig(
            warp=LogitsWarp(temperature=0.0), cfg_scale=2.0, max_new=10,
            mode="static", kv_quant=True,
        )
        res = spec_engine.generate(
            p, d, ecfg, cfg, dcfg, trees.get_tree("mc_sim_7b_63"),
            jnp.asarray([3]), jnp.asarray([cfg.num_classes]),
            jax.random.key(7),
        )
        return np.asarray(res.tokens)

    ref = run_q(params, dparams)
    mesh = pmesh.make_mesh(8, dp=2)
    sp = pmesh.shard_pytree(params, pmesh.base_param_specs(cfg, mesh), mesh)
    sd = pmesh.shard_pytree(dparams, pmesh.drafter_param_specs(dparams), mesh)
    with jax.set_mesh(mesh):
        got = run_q(sp, sd)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("quantized", [False, True])
def test_kv_specs_shard_and_read_back(setup, quantized):
    """kv_specs must mirror both cache layouts (incl. the int8 scale
    planes), and a sharded cache must dequantize/ungroup to the same values
    as the unsharded one."""
    from lantern_tpu.kv import KVCache, dequant_cache, ungroup_cache

    cfg, dcfg, params, dparams = setup
    kv = KVCache.create(cfg, 2, quantized=quantized)
    kn = jnp.asarray(
        np.random.default_rng(0).normal(
            size=(cfg.num_layers, 2, 5, cfg.num_kv_heads, cfg.head_dim)),
        jnp.float32)
    kv = kv.write(kn, kn * 0.5, advance=True)
    mesh = pmesh.make_mesh(8, dp=2)
    specs = pmesh.kv_specs(cfg, mesh, quantized=quantized)
    sharded = pmesh.shard_pytree(kv, specs, mesh)   # structure must match
    def values(c):
        k = (dequant_cache(c.k, c.k_scale) if quantized
             else c.k.astype(jnp.float32))
        return np.asarray(ungroup_cache(k, cfg.num_kv_heads, cfg.head_dim))
    np.testing.assert_array_equal(values(sharded), values(kv))


def test_serving_engine_on_mesh_scheduler_driven(setup):
    """The full serving stack on the (dp=2, tp=4) mesh: Scheduler +
    BatchedEngine with requests sharded over dp (engine mesh=...), base
    params/KV over tp, drafter replicated — token-identical to the
    single-device scheduler run, slot axis verifiably dp-sharded."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lantern_tpu.engine.batch import BatchedEngine
    from lantern_tpu.engine.scheduler import Request, Scheduler

    cfg, dcfg, params, dparams = setup
    ecfg = spec_engine.SpecDecodeConfig(
        warp=LogitsWarp(temperature=0.0), cfg_scale=2.0, max_new=10,
        mode="static",
    )
    tree = trees.get_tree("mc_sim_7b_63")
    labels = [3, 5, 7, 2, 6, 1]      # 6 requests through 4 slots: slot reuse

    def reqs():
        return [Request(uid=i, cond=jnp.asarray([l]),
                        uncond=jnp.asarray([cfg.num_classes]), seed=40 + i)
                for i, l in enumerate(labels)]

    ref_eng = BatchedEngine(ecfg, cfg, dcfg, tree, params, dparams,
                            num_slots=4)
    ref = Scheduler(ref_eng, use_native=False).run(reqs())

    mesh = pmesh.make_mesh(8, dp=2)
    sp = pmesh.shard_pytree(params, pmesh.base_param_specs(cfg, mesh), mesh)
    sd = pmesh.shard_pytree(dparams, pmesh.drafter_param_specs(dparams), mesh)
    with jax.set_mesh(mesh):
        eng = BatchedEngine(ecfg, cfg, dcfg, tree, sp, sd, num_slots=4,
                            mesh=mesh)
        # placement probe: the empty batch's slot axis is dp-sharded
        proto = eng.prefill(jnp.asarray([3]), jnp.asarray([cfg.num_classes]),
                            jax.random.key(0))
        batch = eng.empty_batch(proto)
        want = NamedSharding(mesh, P("dp", None))
        assert batch[0].n_new.sharding.is_equivalent_to(want, 1)
        # and a step preserves it
        stepped = eng.step(eng.insert(batch, 0, proto))
        assert stepped[0].n_new.sharding.is_equivalent_to(
            want, 1), stepped[0].n_new.sharding

        got = Scheduler(eng, use_native=False).run(reqs())
    for a, b in zip(got, ref):
        assert a.uid == b.uid and a.error is None
        np.testing.assert_array_equal(a.tokens, b.tokens)
