"""Micro-benchmark the vmapped (8-slot) spec-step components on the TPU.

Hypothesis under test: vmapped dynamic_update_slice with per-slot start
indices lowers to scatter that XLA cannot do in place, copying the full
multi-GB KV pool on every write.

Run:  python scripts/profile_batch.py
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lantern_tpu import configs, trees
from lantern_tpu.engine import spec as spec_engine
from lantern_tpu.engine.spec import SpecDecodeConfig
from lantern_tpu.engine.batch import BatchedEngine
from lantern_tpu.models import drafter as drf
from lantern_tpu.models import transformer as tfm
from lantern_tpu.ops.acceptance import LanternSpec
from lantern_tpu.ops.sampling import LogitsWarp
from lantern_tpu.ops.vq_distance import nearest_latents

ITERS = int(os.environ.get("PROF_ITERS", 32))
R = int(os.environ.get("PROF_SLOTS", 8))


def main():
    size = os.environ.get("BENCH_SIZE", "XL")
    cfg = configs.llamagen_config(size, "t2i", image_tokens=256)
    dcfg = configs.drafter_config(cfg, total_tokens=59, depth=4, top_k=10)
    tree = trees.get_tree("naive_extend_57")

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    with jax.default_device(cpu):
        params = tfm.init_params(jax.random.key(0), cfg)
        dparams = drf.init_drafter_params(jax.random.key(1), dcfg, params["embed"])
        cb = jax.random.normal(jax.random.key(3), (cfg.vocab_size, 8))
        params["nearest_latents"] = jnp.asarray(nearest_latents(cb, k=11))
    params = jax.device_put(params, tpu)
    dparams = jax.device_put(dparams, tpu)

    warp = LogitsWarp(temperature=1.0, top_k=2000, top_p=1.0)
    ecfg = SpecDecodeConfig(warp=warp, cfg_scale=3.0,
                            lantern=LanternSpec(k=10, delta=5.0),
                            max_new=256, mode="static")
    rope = tfm.make_rope_tables(cfg)

    cond = jax.random.normal(jax.random.key(2), (1, cfg.cls_token_num, cfg.caption_dim))
    uncond = params["cond"]["uncond"][None].astype(cond.dtype)

    eng = BatchedEngine(ecfg, cfg, dcfg, tree, params, dparams, num_slots=R)
    req = eng.prefill(cond, uncond, jax.random.key(9))
    batch = eng.empty_batch(req)
    for i in range(R):
        batch = eng.insert(batch, i, req)
    bstate, bpv, boffs = batch
    jax.block_until_ready(bstate)
    print(f"prefilled {R} slots; base len =", np.asarray(bstate.base_kv.length))

    N1 = len(tree.tree_indices)
    attn_mask = np.asarray(tree.attn_mask)
    depth_arr = np.asarray(tree.depth)

    def timed(name, fn, *args, donate=False):
        jfn = jax.jit(fn, donate_argnums=(1,) if donate else ())
        out = jfn(*args)
        jax.block_until_ready(out)
        if donate:
            args = (args[0], out) + args[2:]
        t0 = time.perf_counter()
        out = jfn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"{name:36s} {dt:8.3f} ms/iter", flush=True)
        return out

    # A. vmapped base tree forward, carry kv through scan (provisional write)
    def tree_fwd_one(params, kv):
        tok2 = jnp.zeros((2, N1), jnp.int32)
        res = tfm.forward(params, cfg, tfm.token_embed(params, tok2), kv,
                          positions=depth_arr + kv.length, rope=rope,
                          block_mask=attn_mask, commit=False)
        return res.kv

    def loop_tree_fwd_v(params, bkv):
        def body(c, _):
            return jax.vmap(lambda kv: tree_fwd_one(params, kv))(c), ()
        c, _ = jax.lax.scan(body, bkv, None, length=ITERS)
        return c

    bkv = bstate.base_kv
    bkv = timed("vmapped tree fwd (R x 58x2)", loop_tree_fwd_v, params, bkv,
                donate=True)

    # B. vmapped accept_path alone
    def loop_accept_v(_unused, bkv):
        def body(c, _):
            def one(kv):
                kv2 = kv.accept_path(jnp.arange(6, dtype=jnp.int32),
                                     jnp.zeros((), jnp.int32))
                return kv2
            return jax.vmap(one)(c), ()
        c, _ = jax.lax.scan(body, bkv, None, length=ITERS)
        return c

    bkv = timed("vmapped accept_path (6 rows)", loop_accept_v, params, bkv,
                donate=True)

    # C. vmapped provisional kv.write alone (per-slot traced start)
    def loop_write_v(_unused, bkv):
        blk_k = jnp.zeros((cfg.num_layers, 2, N1, cfg.num_kv_heads,
                           cfg.head_dim), bkv.k.dtype)

        def body(c, _):
            def one(kv):
                return kv.write(blk_k, blk_k, advance=False)
            return jax.vmap(one)(c), ()
        c, _ = jax.lax.scan(body, bkv, None, length=ITERS)
        return c

    bkv = timed("vmapped kv.write provisional", loop_write_v, params, bkv,
                donate=True)

    # D. full batched step (donated path through the engine)
    b = (bstate._replace(base_kv=bkv), bpv, boffs)
    b = eng.step(b)
    jax.block_until_ready(b[0].tokens)
    t0 = time.perf_counter()
    for _ in range(8):
        bs = b[0]._replace(n_new=jnp.zeros((R,), jnp.int32))
        b = eng.step((bs, b[1], b[2]))
    jax.block_until_ready(b[0].tokens)
    print(f"{'full batched step':36s} {(time.perf_counter()-t0)/8*1e3:8.3f} ms/iter")


if __name__ == "__main__":
    main()
