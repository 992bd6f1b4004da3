"""Sweep LANTERN (k, delta) operating points with ONE compiled engine.

The operating point is a traced ``LanternRT`` (ops/acceptance.py), so the
whole official run.sh matrix — (k=10, d=5), (k=5, d=10), (k=5, d=20)
(reference run.sh:3-17) — plus any extra points share a single jit of
``spec.generate``.  Prints step_compression and tokens/s per point and the
best point by tokens/s.

Usage: python scripts/sweep_points.py [--size XL] [--seeds 2]
       [--points 10:5,5:10,5:20,10:20]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="XL")
    ap.add_argument("--tokens", type=int, default=256)
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--points", default="10:5,5:10,5:20,10:10,10:20")
    ap.add_argument("--tree", default="naive_extend_57")
    args = ap.parse_args()
    points = [tuple(float(x) for x in p.split(":")) for p in args.points.split(",")]
    kmax = max(int(k) for k, _ in points)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lantern_tpu import configs, trees
    from lantern_tpu.engine import spec
    from lantern_tpu.models import drafter as drf
    from lantern_tpu.models import transformer as tfm
    from lantern_tpu.ops.acceptance import LanternSpec
    from lantern_tpu.ops.sampling import LogitsWarp
    from lantern_tpu.ops.vq_distance import nearest_latents

    t_start = time.perf_counter()

    def note(m):
        print(f"[sweep +{time.perf_counter() - t_start:6.1f}s] {m}",
              file=sys.stderr, flush=True)

    cfg = configs.llamagen_config(args.size, "t2i", image_tokens=args.tokens)
    ckpt = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        f"ckpts/bench_drafter_{args.size}.npz")
    d_layers = 1
    if os.path.exists(ckpt):
        with np.load(ckpt) as z0:
            if "num_layers" in z0.files:
                d_layers = int(z0["num_layers"])
    dcfg = configs.drafter_config(cfg, num_layers=d_layers,
                                  total_tokens=59, depth=4, top_k=10)
    tree = trees.get_tree(args.tree)
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    with jax.default_device(cpu):
        params = tfm.init_params(jax.random.key(0), cfg)
        dparams = drf.init_drafter_params(jax.random.key(1), dcfg, params["embed"])
        cb = jax.random.normal(jax.random.key(3), (cfg.vocab_size, 8))
        params["nearest_latents"] = jnp.asarray(nearest_latents(cb, k=kmax + 1))

    if os.path.exists(ckpt):
        z = np.load(ckpt)
        dt_ = cfg.jnp_dtype
        dparams["fc_w"] = jnp.asarray(z["fc_w"], dt_)
        dparams["fc_b"] = jnp.asarray(z["fc_b"], dt_)
        dparams["layers"] = {
            k[len("layers."):]: jnp.asarray(z[k], dt_)
            for k in z.files if k.startswith("layers.")
        }
        note(f"loaded trained drafter {ckpt}")
    # match bench.py's default weight format (BENCH_QUANT) so the chosen
    # (k, delta) point is selected under the configuration the bench runs
    QUANT = os.environ.get("BENCH_QUANT", "int8")
    with jax.default_device(cpu):
        params = tfm.fuse_params(params)
        dparams = tfm.fuse_params(dparams)
        if QUANT == "int8":
            from lantern_tpu.ops.quant import quantize_params

            params = quantize_params(params)
            dparams = quantize_params(dparams)
    params = jax.device_put(params, tpu)
    dparams = jax.device_put(dparams, tpu)

    cond = jax.random.normal(jax.random.key(2), (1, cfg.cls_token_num, cfg.caption_dim))
    uncond = params["cond"]["uncond"][None].astype(cond.dtype)
    warp = LogitsWarp(temperature=1.0, top_k=2000, top_p=1.0)
    lantern = LanternSpec(k=kmax, delta=5.0)       # compiled table width
    ecfg = spec.SpecDecodeConfig(warp=warp, cfg_scale=3.0, lantern=lantern,
                                 max_new=args.tokens, mode="static")

    def run(k, d, seed):
        res = spec.generate(params, dparams, ecfg, cfg, dcfg, tree,
                            cond, uncond, jax.random.key(seed),
                            lantern_rt=lantern.runtime(k_eff=int(k), delta_eff=d))
        np.asarray(res.tokens)      # force (block_until_ready is a no-op here)
        return res

    note("compiling (single jit for all points)")
    run(*points[0], 0)
    note("compiled")

    rows = []
    for k, d in points:
        scs, ts = [], []
        for s in range(args.seeds):
            t0 = time.perf_counter()
            res = run(k, d, 100 + s)
            ts.append(time.perf_counter() - t0)
            scs.append(float(res.accept_sum) / max(1.0, float(res.steps)))
        row = {"k": int(k), "delta": d,
               "step_compression": round(float(np.mean(scs)), 3),
               "tokens_per_s": round(args.tokens / float(np.mean(ts)), 2)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    best = max(rows, key=lambda r: r["tokens_per_s"])
    print(json.dumps({"best": best}), flush=True)


if __name__ == "__main__":
    main()
