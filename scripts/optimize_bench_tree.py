"""Calibrate the bench drafter's rank-hit distribution and derive the
expected-accept-length-optimal static tree for the official node budget.

Saves ``ckpts/bench_tree.json`` (a get_tree-compatible path list) which
bench.py and generate_images (--tree-choices ckpts/bench_tree.json) pick up.

Usage: python scripts/optimize_bench_tree.py [--size XL] [--nodes 57]
       [--depth 5] [--rollouts 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default=os.environ.get("BENCH_SIZE", "XL"))
    ap.add_argument("--nodes", type=int, default=57)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--rollouts", type=int, default=4)
    ap.add_argument("--max-rank", type=int, default=10)
    ap.add_argument("--image-tokens", type=int, default=256)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lantern_tpu import configs, trees
    from lantern_tpu.engine.calibrate import measure_rank_probs
    from lantern_tpu.models import drafter as drf
    from lantern_tpu.models import transformer as tfm
    from lantern_tpu.ops.sampling import LogitsWarp

    t0 = time.time()

    def note(m):
        print(f"[tree +{time.time() - t0:6.1f}s] {m}", flush=True)

    cfg = configs.llamagen_config(args.size, "t2i",
                                  image_tokens=args.image_tokens)
    ckpt = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), f"ckpts/bench_drafter_{args.size}.npz")
    d_layers = 1
    if os.path.exists(ckpt):
        with np.load(ckpt) as z0:
            if "num_layers" in z0.files:
                d_layers = int(z0["num_layers"])
    dcfg = configs.drafter_config(cfg, num_layers=d_layers,
                                  total_tokens=args.nodes + 2,
                                  depth=args.depth, top_k=args.max_rank)
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    with jax.default_device(cpu):
        params = tfm.init_params(jax.random.key(0), cfg)   # = bench base
        dparams = drf.init_drafter_params(jax.random.key(101), dcfg,
                                          params["embed"])
    if os.path.exists(ckpt):
        z = np.load(ckpt)
        dt_ = cfg.jnp_dtype
        dparams["fc_w"] = jnp.asarray(z["fc_w"], dt_)
        dparams["fc_b"] = jnp.asarray(z["fc_b"], dt_)
        dparams["layers"] = {
            k[len("layers."):]: jnp.asarray(z[k], dt_)
            for k in z.files if k.startswith("layers.")
        }
        note(f"loaded trained drafter {ckpt} ({d_layers} layer(s))")
    params = jax.device_put(params, tpu)
    dparams = jax.device_put(dparams, tpu)

    cond = jax.random.normal(jax.random.key(2),
                             (1, cfg.cls_token_num, cfg.caption_dim))
    uncond = params["cond"]["uncond"][None].astype(cond.dtype)
    warp = LogitsWarp(temperature=1.0, top_k=2000, top_p=1.0)

    probs = measure_rank_probs(
        params, dparams, cfg, dcfg, cond, uncond, jax.random.key(77),
        num_tokens=args.image_tokens, max_rank=args.max_rank,
        cfg_scale=3.0, warp=warp, num_rollouts=args.rollouts,
    )
    note(f"rank probs: {np.round(probs, 4).tolist()}")

    paths = trees.optimize_tree(probs, num_nodes=args.nodes,
                                max_depth=args.depth)
    spec = trees.get_tree(paths)        # validates
    note(f"tree: {spec.num_nodes} nodes, depth {int(max(spec.depth))}")

    out = args.out or os.path.join(os.path.dirname(ckpt),
                                   f"bench_tree_{args.size}.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump({"rank_probs": probs.tolist(),
                   "paths": [list(p) for p in paths]}, f)
    note(f"saved {out}")


if __name__ == "__main__":
    main()
