"""A/B the XL decode forward: einsum vs mul-sum decode attention (r5).

Usage: python scripts/probe_xl_fwd.py [--iters 64]
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
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--size", default="XL")
    ap.add_argument("--prefix", type=int, default=248)
    args = ap.parse_args()
    ITERS = args.iters

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lantern_tpu import configs, trees
    from lantern_tpu.kv import KVCache
    from lantern_tpu.models import transformer as tfm
    from lantern_tpu.ops.quant import quantize_params

    t_start = time.perf_counter()

    def note(m):
        print(f"[xlfwd +{time.perf_counter() - t_start:6.1f}s] {m}",
              file=sys.stderr, flush=True)

    cfg0 = configs.llamagen_config(args.size, "t2i", image_tokens=256)
    cfg0 = dataclasses.replace(cfg0, use_flash_attention=False)
    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    with jax.default_device(cpu):
        params = quantize_params(tfm.fuse_params(
            tfm.init_params(jax.random.key(0), cfg0)))
    params = jax.device_put(params, dev)
    rope = tfm.make_rope_tables(cfg0)
    kv = dataclasses.replace(KVCache.create(cfg0, 2),
                             length=jnp.asarray(args.prefix, jnp.int32))
    tree = trees.get_tree("naive_extend_57")
    attn_mask = np.asarray(tree.attn_mask)
    depth_arr = np.asarray(tree.depth)
    N1 = tree.num_nodes
    note("params on device")

    @jax.jit
    def trivial(x):
        return x + 1
    x0 = jax.device_put(jnp.zeros(()), dev)
    np.asarray(trivial(x0))
    t0 = time.perf_counter()
    for _ in range(5):
        x0 = trivial(x0)
        np.asarray(x0)
    rt = (time.perf_counter() - t0) / 5
    print(f"{'tunnel round-trip':30s} {rt * 1e3:8.3f} ms", flush=True)

    def timed(name, fn, *xs):
        note(f"compiling {name}")
        np.asarray(fn(*xs))
        t0 = time.perf_counter()
        np.asarray(fn(*xs))
        dt = (time.perf_counter() - t0 - rt) / ITERS
        print(f"{name:30s} {dt * 1e3:8.3f} ms/iter", flush=True)

    def make_ar(cfg):
        @jax.jit
        def loop(params, kv):
            def body(carry, _):
                kv, tok = carry
                res = tfm.forward(params, cfg, tfm.token_embed(params, tok),
                                  kv,
                                  positions=kv.length + jnp.zeros((1,), jnp.int32),
                                  rope=rope, commit=False)
                tok2 = (res.hidden[:, -1:, 0].astype(jnp.int32)
                        % cfg.vocab_size)
                return (res.kv, jnp.abs(tok2)), res.hidden[0, -1, 0]
            _, hh = jax.lax.scan(body, (kv, jnp.zeros((2, 1), jnp.int32)),
                                 None, length=ITERS)
            return hh.sum()
        return loop

    def make_tree(cfg):
        @jax.jit
        def loop(params, kv):
            def body(carry, _):
                kv, t = carry
                tok2 = jnp.broadcast_to(t, (2, N1))
                res = tfm.forward(params, cfg,
                                  tfm.token_embed(params, tok2), kv,
                                  positions=depth_arr + kv.length, rope=rope,
                                  block_mask=attn_mask, commit=False)
                t2 = (jnp.abs(res.hidden[0, -1, 0].astype(jnp.int32))
                      % cfg.vocab_size)
                return (res.kv, t2), res.hidden[0, -1, 0]
            _, hh = jax.lax.scan(body, (kv, jnp.zeros((), jnp.int32)), None,
                                 length=ITERS)
            return hh.sum()
        return loop

    for name, ms in (("einsum", 0), ("mulsum", 4)):
        cfg = dataclasses.replace(cfg0, dense_qk_mulsum_max_t=ms)
        timed(f"AR fwd 2x1 {name}", make_ar(cfg), params, kv)
    timed("tree fwd 2x58 einsum", make_tree(cfg0), params, kv)


if __name__ == "__main__":
    main()
