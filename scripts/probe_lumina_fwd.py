"""A/B the dense-attention implementations at Lumina-7B bench geometry.

Measures the decode forwards (AR 2x1 and tree-block 2xN) under:
  - dense "concat" softmax (the r4 path: dequantized cache + concatenated
    [.., S+T] scores through jax.nn.softmax)
  - dense "fused" two-part softmax (r5: no concat, exp-weights into the AV
    matmuls in bf16, int8 scales factored out of the dots so the dequantized
    cache never materializes)
  - both against int8 and bf16 KV caches

Reuses the bench's host-param disk cache (bench._host_param_cache), so the
run pays the ~GBs device transfer once, not the 240 s host rebuild.

Usage: python scripts/probe_lumina_fwd.py [--iters 32] [--variants all]
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
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--prefix", type=int, default=1200)
    ap.add_argument("--trees", default="39,58",
                    help="comma list of tree-block row counts to probe")
    ap.add_argument("--skip", default="",
                    help="comma list of variant substrings to skip")
    args = ap.parse_args()
    ITERS = args.iters

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lantern_tpu import configs, trees
    from lantern_tpu.kv import KVCache
    from lantern_tpu.models import transformer as tfm
    from lantern_tpu.ops.sampling import cfg_combine

    import bench

    t_start = time.perf_counter()

    def note(m):
        print(f"[fwd +{time.perf_counter() - t_start:6.1f}s] {m}",
              file=sys.stderr, flush=True)

    GRID = 48
    MAX_NEW = GRID * (GRID + 1) + 1
    cfg0 = configs.chameleon_7b_config(max_seq_len=19 + MAX_NEW + 74,
                                       swin_norm=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]

    def build_host_params():
        from lantern_tpu.models import drafter as drf
        from lantern_tpu.ops.quant import quantize_params
        from lantern_tpu.ops.vq_distance import nearest_latents
        from lantern_tpu.models import chameleon as cham

        dcfg = configs.drafter_config(cfg0, num_layers=1, total_tokens=59,
                                      depth=4, top_k=10)
        with jax.default_device(cpu):
            params = tfm.init_params(jax.random.key(0), cfg0)
            dparams = drf.init_drafter_params(jax.random.key(101), dcfg,
                                              params["embed"])
            H = cfg0.hidden_size
            fc = np.zeros((2 * H, H), np.float32)
            fc[H:] = np.eye(H)
            dparams["fc_w"] = jnp.asarray(fc, dtype=cfg0.jnp_dtype)
            dparams["layers"] = jax.tree.map(lambda a: a * 0,
                                             dparams["layers"])
            cb = jax.random.normal(jax.random.key(3), (8192, 8))
            near = np.asarray(nearest_latents(cb, k=11))
            params["nearest_latents"] = jnp.asarray(
                cham.shift_nearest_table(near, cfg0.vocab_size))
            params = tfm.fuse_params(params)
            dparams = tfm.fuse_params(dparams)
            params = quantize_params(params)
            dparams = quantize_params(dparams)
        return params, dparams

    tag = (f"lumina_L{cfg0.num_layers}_H{cfg0.hidden_size}"
           f"_I{cfg0.intermediate_size}_k10_pass_v1")
    params, _ = bench._host_param_cache(tag, build_host_params, note)
    params = jax.device_put(params, dev)
    note("7B params on device")

    rope = tfm.make_rope_tables(cfg0)
    plen = jnp.asarray(args.prefix, jnp.int32)
    kv_i8 = dataclasses.replace(KVCache.create(cfg0, 2, quantized=True),
                                length=plen)
    kv_bf = dataclasses.replace(KVCache.create(cfg0, 2, quantized=False),
                                length=plen)

    # trees for block probes
    sel = os.path.join(repo, "ckpts/bench_tree_lumina.json")
    tree39 = trees.get_tree(sel if os.path.exists(sel) else "chain_bush_8")
    tree58 = trees.get_tree("naive_extend_57")
    tree_by_n = {tree39.num_nodes: tree39, tree58.num_nodes: tree58}

    @jax.jit
    def trivial(x):
        return x + 1
    x0 = jax.device_put(jnp.zeros((), jnp.float32), dev)
    np.asarray(trivial(x0))
    t0 = time.perf_counter()
    for _ in range(5):
        x0 = trivial(x0)
        np.asarray(x0)
    rt = (time.perf_counter() - t0) / 5
    print(f"{'tunnel round-trip':34s} {rt * 1e3:8.3f} ms", flush=True)

    def timed(name, fn, *xs):
        if any(s and s in name for s in args.skip.split(",")):
            return
        note(f"compiling {name}")
        np.asarray(fn(*xs))
        t0 = time.perf_counter()
        np.asarray(fn(*xs))
        dt = (time.perf_counter() - t0 - rt) / ITERS
        print(f"{name:34s} {dt * 1e3:8.3f} ms/iter", flush=True)

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
            _, h = jax.lax.scan(body, (kv, jnp.zeros((2, 1), jnp.int32)),
                                None, length=ITERS)
            return h.sum()
        return loop

    def make_tree(cfg, tree):
        N1 = tree.num_nodes
        attn_mask = np.asarray(tree.attn_mask)
        depth_arr = np.asarray(tree.depth)

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
            _, h = jax.lax.scan(body, (kv, jnp.zeros((), jnp.int32)), None,
                                length=ITERS)
            return h.sum()
        return loop

    import dataclasses as _dc
    variants = [
        ("fused", _dc.replace(cfg0, use_flash_attention=False,
                              dense_softmax="fused")),
        ("concat", _dc.replace(cfg0, use_flash_attention=False,
                               dense_softmax="concat")),
    ]
    tree_ns = [int(x) for x in args.trees.split(",") if x]
    for vname, cfg in variants:
        for kvname, kv in (("int8", kv_i8), ("bf16", kv_bf)):
            timed(f"AR fwd 2x1 {vname} kv={kvname}", make_ar(cfg),
                  params, kv)
        for n in tree_ns:
            timed(f"tree fwd 2x{n} {vname} kv=int8",
                  make_tree(cfg, tree_by_n[n]), params, kv_i8)

    # head reference
    @jax.jit
    def loop_head(params):
        hid = jnp.zeros((2, tree39.num_nodes, cfg0.hidden_size),
                        cfg0.jnp_dtype)

        def body(carry, _):
            lg = cfg_combine(tfm.logits_head(params, hid + carry), 3.0)[0]
            return carry + (lg[0, 0] * 0).astype(carry.dtype), lg[0, 1]
        _, h = jax.lax.scan(body, jnp.zeros((), cfg0.jnp_dtype), None,
                            length=ITERS)
        return h.sum()
    timed(f"lm_head+cfg [2,{tree39.num_nodes}]", loop_head, params)


if __name__ == "__main__":
    main()
