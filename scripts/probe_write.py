"""Isolate the per-step cost of the KV write paths on TPU.

Times the XL decode forward in a scan under three conditions:
  nowrite  — discard res.kv (XLA DCEs the write entirely)
  inscan   — per-layer dus on the scan-carried buffers (WRITE_IN_SCAN=auto)
  kernel   — post-scan aliased pallas DMA kernel (PALLAS_WRITE=auto)
  xla      — post-scan dynamic_update_slice (PALLAS_WRITE=never)

Usage: python scripts/probe_write.py [--iters 64] [--tokens 1|58]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="XL")
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--prefix", type=int, default=248)
    ap.add_argument("--tokens", default="1,58")
    args = ap.parse_args()
    ITERS = args.iters

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lantern_tpu import configs, kv as kvmod
    from lantern_tpu.kv import KVCache
    from lantern_tpu.models import transformer as tfm
    from lantern_tpu.ops.quant import quantize_params

    t0 = time.perf_counter()

    def note(m):
        print(f"[write +{time.perf_counter() - t0:6.1f}s] {m}", flush=True)

    cfg = configs.llamagen_config(args.size, "t2i", image_tokens=256)
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    with jax.default_device(cpu):
        params = quantize_params(tfm.fuse_params(
            tfm.init_params(jax.random.key(0), cfg)))
    params = jax.device_put(params, tpu)
    rope = tfm.make_rope_tables(cfg)
    note("params on device")
    rng = np.random.default_rng(0)

    def timed(name, fn, *a):
        jax.block_until_ready(fn(*a))
        np.asarray(jax.tree.leaves(fn(*a))[0])
        t = time.perf_counter()
        np.asarray(jax.tree.leaves(fn(*a))[0])
        dt = (time.perf_counter() - t) / ITERS * 1000
        print(f"{name:34s} {dt:8.3f} ms/iter", flush=True)

    for T in [int(x) for x in args.tokens.split(",")]:
        toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, T)), jnp.int32)
        bm = jnp.tril(jnp.ones((T, T), bool)) if T > 1 else None

        def make(mode):
            @jax.jit
            def run(params):
                kv = KVCache.create(cfg, 2)
                kv = dataclasses.replace(kv, length=jnp.asarray(args.prefix))

                def body(c, _):
                    kvc, _h = c
                    res = tfm.forward(params, cfg,
                                      tfm.token_embed(params, toks), kvc,
                                      args.prefix + jnp.arange(T), rope,
                                      block_mask=bm, commit=False)
                    nxt = kvc if mode == "nowrite" else res.kv
                    # keep length fixed so shapes/phases stay identical
                    nxt = dataclasses.replace(nxt, length=kvc.length)
                    return (nxt, res.hidden[0, -1, :8]), None

                (_, h), _ = jax.lax.scan(
                    body, (kv, jnp.zeros((8,), cfg.jnp_dtype)), None,
                    length=ITERS)
                return h

            return run

        old = (kvmod.PALLAS_WRITE, kvmod.WRITE_IN_SCAN)
        try:
            kvmod.WRITE_IN_SCAN = "never"
            timed(f"T={T:3d} nowrite", make("nowrite"), params)
            kvmod.WRITE_IN_SCAN = "auto"
            timed(f"T={T:3d} write in-scan", make("inscan"), params)
            kvmod.WRITE_IN_SCAN = "never"
            kvmod.PALLAS_WRITE = "auto"
            timed(f"T={T:3d} write kernel", make("kernel"), params)
            kvmod.PALLAS_WRITE = "never"
            timed(f"T={T:3d} write xla dus", make("xla"), params)
        finally:
            kvmod.PALLAS_WRITE, kvmod.WRITE_IN_SCAN = old


if __name__ == "__main__":
    main()
