"""Micro-benchmark the vmapped (R-slot) spec-step components on the TPU.

Measurement rules for the axon remote-TPU relay (same as profile_step.py):
``jax.block_until_ready`` does NOT reliably block here — only a host fetch
(np.asarray / device_get) forces completion — and per-call round-trips cost
~28 ms, so every component is timed as one jitted ``lax.scan`` of ITERS
iterations whose result is fetched.

Components:
  A. vmapped tree-verification forward, flash kernel vs dense attention
  B. vmapped accept_path (the custom_vmap stacked rollback kernel)
  C. vmapped provisional kv.write (the custom_vmap stacked write kernel)
  D. full batched spec step (step_many of 8, counters reset)

Run:  python scripts/profile_batch.py
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lantern_tpu import configs, trees
from lantern_tpu.engine.spec import SpecDecodeConfig
from lantern_tpu.engine.batch import BatchedEngine
from lantern_tpu.kv import KVCache
from lantern_tpu.models import drafter as drf
from lantern_tpu.models import transformer as tfm
from lantern_tpu.ops.acceptance import LanternSpec
from lantern_tpu.ops.sampling import LogitsWarp
from lantern_tpu.ops.vq_distance import nearest_latents

ITERS = int(os.environ.get("PROF_ITERS", 32))
R = int(os.environ.get("PROF_SLOTS", 8))

t_start = time.perf_counter()


def note(m):
    print(f"[prof +{time.perf_counter() - t_start:6.1f}s] {m}",
          file=sys.stderr, flush=True)


def main():
    size = os.environ.get("BENCH_SIZE", "XL")
    cfg = configs.llamagen_config(size, "t2i", image_tokens=256)
    dcfg = configs.drafter_config(cfg, total_tokens=59, depth=4, top_k=10)
    tree = trees.get_tree("naive_extend_57")

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    with jax.default_device(cpu):
        params = tfm.init_params(jax.random.key(0), cfg)
        dparams = drf.init_drafter_params(jax.random.key(1), dcfg,
                                          params["embed"])
        cb = jax.random.normal(jax.random.key(3), (cfg.vocab_size, 8))
        params["nearest_latents"] = jnp.asarray(nearest_latents(cb, k=11))
        params = tfm.fuse_params(params)
        dparams = tfm.fuse_params(dparams)
    params = jax.device_put(params, tpu)
    dparams = jax.device_put(dparams, tpu)
    note("params on device")

    warp = LogitsWarp(temperature=1.0, top_k=2000, top_p=1.0)
    ecfg = SpecDecodeConfig(warp=warp, cfg_scale=3.0,
                            lantern=LanternSpec(k=10, delta=5.0),
                            max_new=256, mode="static")
    rope = tfm.make_rope_tables(cfg)

    # hand-built batched state (eager prefill never finishes over the
    # tunnel; jit the creation too — one remote call instead of dozens)
    plen = jnp.full((R,), 248, jnp.int32)
    base_kv = jax.jit(jax.vmap(
        lambda l: dataclasses.replace(KVCache.create(cfg, 2), length=l)
    ))(plen)

    N1 = tree.num_nodes
    attn_mask = np.asarray(tree.attn_mask)
    depth_arr = np.asarray(tree.depth)
    D = np.asarray(tree.retrieve_indices).shape[1]

    # --- tunnel round-trip baseline ---
    @jax.jit
    def trivial(x):
        return x + 1
    x0 = jax.device_put(jnp.zeros((), jnp.float32), tpu)
    np.asarray(trivial(x0))
    t0 = time.perf_counter()
    for _ in range(5):
        x0 = trivial(x0)
        np.asarray(x0)
    rt = (time.perf_counter() - t0) / 5
    print(f"{'tunnel round-trip':34s} {rt * 1e3:8.3f} ms", flush=True)

    results = {}

    def timed(name, fn, *xs):
        note(f"compiling {name}")
        np.asarray(fn(*xs))
        t0 = time.perf_counter()
        np.asarray(fn(*xs))
        dt = (time.perf_counter() - t0 - rt) / ITERS
        results[name] = dt * 1e3
        print(f"{name:34s} {dt * 1e3:8.3f} ms/iter", flush=True)

    # A. vmapped tree forward: flash vs dense
    def make_tree_loop(c):
        def tree_fwd_one(kv, t):
            tok2 = jnp.broadcast_to(t, (2, N1))
            res = tfm.forward(params, c, tfm.token_embed(params, tok2), kv,
                              positions=depth_arr + kv.length, rope=rope,
                              block_mask=attn_mask, commit=False)
            t2 = jnp.abs(res.hidden[0, -1, 0].astype(jnp.int32)) % cfg.vocab_size
            return res.kv, t2

        @jax.jit
        def loop(params, bkv):
            def body(carry, _):
                bkv, ts = carry
                bkv2, t2 = jax.vmap(tree_fwd_one)(bkv, ts)
                return (bkv2, t2), t2[0]
            (_, _), h = jax.lax.scan(
                body, (bkv, jnp.zeros((R,), jnp.int32)), None, length=ITERS)
            return h.sum()
        return loop

    cfg_flash = dataclasses.replace(cfg, flash_min_seq=0)
    cfg_dense = dataclasses.replace(cfg, use_flash_attention=False)
    # PROF_FLASH=0 skips the vmapped flash variant: its remote Mosaic
    # compile has been observed to take 20+ min over the tunnel, and the
    # bench geometry (S=512 < flash_min_seq) runs dense anyway
    if os.environ.get("PROF_FLASH", "1") == "1":
        timed("vmapped tree fwd FLASH", make_tree_loop(cfg_flash), params, base_kv)
    timed("vmapped tree fwd DENSE", make_tree_loop(cfg_dense), params, base_kv)

    # B. vmapped accept_path
    sel = jnp.broadcast_to(jnp.arange(D, dtype=jnp.int32)[None], (R, D))

    @jax.jit
    def loop_accept(bkv):
        def body(bkv, _):
            bkv2 = jax.vmap(
                lambda kv, s: kv.accept_path(s, jnp.int32(0), block_size=N1)
            )(bkv, sel)
            return bkv2, bkv2.k[0, 0, 0, 0, 0]
        _, h = jax.lax.scan(body, bkv, None, length=ITERS)
        return h.sum()
    timed("vmapped accept_path (fused)", loop_accept, base_kv)

    # C. vmapped provisional write
    blk = jnp.zeros((R, cfg.num_layers, 2, N1, cfg.num_kv_heads,
                     cfg.head_dim), base_kv.k.dtype)

    @jax.jit
    def loop_write(bkv):
        def body(bkv, _):
            bkv2 = jax.vmap(
                lambda kv, b: kv.write(b, b, advance=False)
            )(bkv, blk)
            return bkv2, bkv2.k[0, 0, 0, 0, 0]
        _, h = jax.lax.scan(body, bkv, None, length=ITERS)
        return h.sum()
    timed("vmapped kv.write provisional", loop_write, base_kv)

    known = (results.get("vmapped tree fwd DENSE", 0)
             + results.get("vmapped accept_path (fused)", 0))
    print(f"{'sum (dense fwd + accept)':34s} {known:8.3f} ms", flush=True)

    # D. full batched step via the engine (step_many, counters reset by
    # rebuilding state between timed calls is unnecessary: 2*ITERS steps of
    # <= 6 tokens fit the pad because max_new bounds the commit slice)
    if os.environ.get("PROF_FULL", "1") == "1":
        eng = BatchedEngine(ecfg, cfg, dcfg, tree, params, dparams,
                            num_slots=R)
        note("prefilling engine")
        cond = jax.random.normal(jax.random.key(2),
                                 (1, cfg.cls_token_num, cfg.caption_dim))
        uncond = params["cond"]["uncond"][None].astype(cond.dtype)
        req = eng.prefill(cond, uncond, jax.random.key(9))
        batch = eng.empty_batch(req)
        for i in range(R):
            batch = eng.insert(batch, i, req)
        np.asarray(batch[0].base_kv.length)
        note("prefilled; compiling step_many")
        NSTEP = 8
        batch = eng.step_many(batch, NSTEP)
        np.asarray(batch[0].steps)
        t0 = time.perf_counter()
        batch = eng.step_many(batch, NSTEP)
        np.asarray(batch[0].steps)
        dt = (time.perf_counter() - t0 - rt) / NSTEP
        print(f"{'full batched step (step_many)':34s} {dt * 1e3:8.3f} ms/iter",
              flush=True)


if __name__ == "__main__":
    main()
