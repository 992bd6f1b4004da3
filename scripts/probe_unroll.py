"""Measure layer-scan unroll impact on the decode-step forwards (TPU).

profile_step.py showed the XL forwards are op-launch-latency-bound (2.93 ms
for a 1-token forward vs a ~0.9 ms int8 weight-stream floor).  This probe
times the 1-token AR forward and the 58-token tree forward at several
``ModelConfig.scan_unroll`` values to pick the default.

Usage: python scripts/probe_unroll.py [--size XL] [--iters 64]
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
    ap.add_argument("--unrolls", default="1,2,4,6,12")
    ap.add_argument("--tree-tokens", type=int, default=58)
    args = ap.parse_args()
    ITERS = args.iters

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lantern_tpu import configs
    from lantern_tpu.kv import KVCache
    from lantern_tpu.models import transformer as tfm
    from lantern_tpu.ops.quant import quantize_params

    t0 = time.perf_counter()

    def note(m):
        print(f"[unroll +{time.perf_counter() - t0:6.1f}s] {m}", flush=True)

    cfg0 = configs.llamagen_config(args.size, "t2i", image_tokens=256)
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    with jax.default_device(cpu):
        params = tfm.init_params(jax.random.key(0), cfg0)
        params = tfm.fuse_params(params)
        params = quantize_params(params)
    params = jax.device_put(params, tpu)
    note("params on device")

    N = args.tree_tokens
    rng = np.random.default_rng(0)

    def timed(name, fn, *a):
        note(f"compiling {name}")
        jax.block_until_ready(fn(*a))
        np.asarray(jax.tree.leaves(fn(*a))[0])          # force
        t = time.perf_counter()
        np.asarray(jax.tree.leaves(fn(*a))[0])
        dt = (time.perf_counter() - t) / ITERS * 1000
        print(f"{name:38s} {dt:8.3f} ms/iter", flush=True)
        return dt

    for u in [int(x) for x in args.unrolls.split(",")]:
        cfg = dataclasses.replace(cfg0, scan_unroll=u)
        rope = tfm.make_rope_tables(cfg)

        def loop_fwd(T):
            toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, T)), jnp.int32)
            bm = jnp.tril(jnp.ones((T, T), bool)) if T > 1 else None

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
                    return (kvc, res.hidden[0, -1, :8]), None

                (_, h), _ = jax.lax.scan(body, (kv, jnp.zeros((8,), cfg.jnp_dtype)),
                                         None, length=ITERS)
                return h

            return run

        timed(f"AR fwd  (2x1)  unroll={u}", loop_fwd(1), params)
        timed(f"tree fwd (2x{N}) unroll={u}", loop_fwd(N), params)


if __name__ == "__main__":
    main()
