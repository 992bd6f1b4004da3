"""Empirically select the bench draft tree by measured wall-clock tok/s.

Rank-hit calibration (optimize_bench_tree.py) models STRICT acceptance; the
bench's operating point is LANTERN relaxed acceptance (k=10, delta=5), whose
effective per-node accept probability is far higher than the drafter's
rank-hit rate — so the right shape is found by measuring, not modeling:
run the real engine at bench geometry over a candidate set (the library
shapes plus rank-calibrated shapes at several node budgets) and keep the
tok/s winner.  Writes ``ckpts/bench_tree_{size}.json`` (which bench.py
prefers) only when the winner beats the hand shape.

Usage: python scripts/select_bench_tree.py [--size XL] [--tokens 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HAND = "naive_extend_57"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default=os.environ.get("BENCH_SIZE", "XL"))
    ap.add_argument("--tokens", type=int, default=256)
    ap.add_argument("--lantern-k", type=int, default=10)
    ap.add_argument("--lantern-delta", type=float, default=5.0)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--extra-nodes", default="25,41,57",
                    help="node budgets for rank-calibrated shapes")
    ap.add_argument("--objective", default="accept",
                    choices=["accept", "greedy"],
                    help="'accept' calibrates on the stochastic LANTERN "
                    "walk the lane runs (calibrate.measure_drafter_"
                    "accept_probs); 'greedy' keeps the r4 rank-match "
                    "matrix")
    ap.add_argument("--depths", default="",
                    help="optional per-budget depths, e.g. '4,5,6' zipped "
                    "with --extra-nodes (default 6 for all)")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lantern_tpu import configs, trees
    from lantern_tpu.engine import spec
    from lantern_tpu.models import drafter as drf
    from lantern_tpu.models import transformer as tfm
    from lantern_tpu.ops.acceptance import LanternSpec
    from lantern_tpu.ops.quant import quantize_params
    from lantern_tpu.ops.sampling import LogitsWarp
    from lantern_tpu.ops.vq_distance import nearest_latents

    t0 = time.time()

    def note(m):
        print(f"[tree-sel +{time.time() - t0:6.1f}s] {m}", flush=True)

    size = args.size
    cfg = configs.llamagen_config(size, "t2i", image_tokens=args.tokens)
    ckpt = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), f"ckpts/bench_drafter_{size}.npz")
    d_layers = 1
    if os.path.exists(ckpt):
        with np.load(ckpt) as z0:
            if "num_layers" in z0.files:
                d_layers = int(z0["num_layers"])
    dcfg = configs.drafter_config(cfg, num_layers=d_layers,
                                  total_tokens=59, depth=4, top_k=10)
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    with jax.default_device(cpu):
        params = tfm.init_params(jax.random.key(0), cfg)
        dparams = drf.init_drafter_params(jax.random.key(1), dcfg,
                                          params["embed"])
        cb = jax.random.normal(jax.random.key(3),
                               (cfg.vocab_size, 8))
        params["nearest_latents"] = jnp.asarray(
            nearest_latents(cb, k=args.lantern_k + 1))
        if os.path.exists(ckpt):
            z = np.load(ckpt)
            dt_ = cfg.jnp_dtype
            dparams["fc_w"] = jnp.asarray(z["fc_w"], dt_)
            dparams["fc_b"] = jnp.asarray(z["fc_b"], dt_)
            dparams["layers"] = {
                k[len("layers."):]: jnp.asarray(z[k], dt_)
                for k in z.files if k.startswith("layers.")
            }
            note(f"loaded trained drafter ({d_layers} layer(s))")
        params = quantize_params(tfm.fuse_params(params))
        dparams = quantize_params(tfm.fuse_params(dparams))
    params = jax.device_put(params, tpu)
    dparams = jax.device_put(dparams, tpu)
    cond = jax.random.normal(jax.random.key(2),
                             (1, cfg.cls_token_num, cfg.caption_dim))
    uncond = params["cond"]["uncond"][None].astype(cond.dtype)
    warp = LogitsWarp(temperature=1.0, top_k=2000, top_p=1.0)
    note("params on device")

    # --- candidates -------------------------------------------------------
    cands: dict[str, object] = {
        name: trees.get_tree(name)
        for name in ("naive_extend_57", "mc_sim_7b_63", "medusa_2_7b_63",
                     "reverse_balanced_25")
    }
    # calibrated shapes at several budgets
    from lantern_tpu.engine import calibrate as calib

    if args.objective == "accept":
        probs = calib.measure_drafter_accept_probs(
            params, dparams, cfg, dcfg, cond, uncond, jax.random.key(77),
            nearest=params["nearest_latents"],
            lantern=LanternSpec(k=args.lantern_k, delta=args.lantern_delta),
            num_tokens=args.tokens, max_rank=10, max_depth=6,
            cfg_scale=3.0, warp=warp, num_rollouts=2)
        note("accept probs (rows=depth):")
        for d, row in enumerate(probs):
            note(f"  d={d + 1}: {np.round(row, 3).tolist()}")
    else:
        probs = calib.measure_rank_probs(
            params, dparams, cfg, dcfg, cond, uncond, jax.random.key(77),
            num_tokens=args.tokens, max_rank=10, cfg_scale=3.0, warp=warp,
            num_rollouts=2)
        note(f"rank probs: {np.round(probs, 4).tolist()}")
    budgets = [int(x) for x in args.extra_nodes.split(",")]
    depths = ([int(x) for x in args.depths.split(",")] if args.depths
              else [6] * len(budgets))
    for n, dep in zip(budgets, depths):
        paths = trees.optimize_tree(probs, num_nodes=n, max_depth=dep)
        cands[f"calib_{n}_d{dep}"] = trees.get_tree(paths)

    # --- measure ----------------------------------------------------------
    results = {}
    for name, tree in cands.items():
        ecfg = spec.SpecDecodeConfig(
            warp=warp, cfg_scale=3.0,
            lantern=LanternSpec(k=args.lantern_k, delta=args.lantern_delta),
            max_new=args.tokens, mode="static",
            # match the bench lane's production engine (bench.py xl lane)
            deferred_commit=os.environ.get("BENCH_XL_DEFER", "1") == "1",
            walk_batch_warp=True,
        )

        def run(seed):
            res = spec.generate(params, dparams, ecfg, cfg, dcfg, tree,
                                cond, uncond, jax.random.key(seed))
            np.asarray(res.tokens)
            return res

        try:
            run(7)                                        # compile
            best = 0.0
            comp = 0.0
            for r in range(args.reps):
                t1 = time.perf_counter()
                res = run(100 + r)
                dt = time.perf_counter() - t1
                best = max(best, args.tokens / dt)
                comp = float(res.accept_sum) / max(1.0, float(res.steps))
            results[name] = (best, comp, tree)
            note(f"{name:22s} {best:7.1f} tok/s  compression {comp:.3f} "
                 f"({tree.num_nodes} nodes)")
        except Exception as e:  # noqa: BLE001
            note(f"{name}: failed ({type(e).__name__}: {e})")

    winner = max(results, key=lambda k: results[k][0])
    note(f"winner: {winner} ({results[winner][0]:.1f} tok/s)")
    out = os.path.join(os.path.dirname(ckpt), f"bench_tree_{size}.json")
    if winner == HAND:
        if os.path.exists(out):
            os.remove(out)
            note(f"hand tree wins; removed {out}")
    else:
        tree = results[winner][2]
        with open(out, "w") as f:
            json.dump({"selected": winner,
                       "tok_s": results[winner][0],
                       "paths": [list(p) for p in tree.paths]}, f)
        note(f"saved {out}")


if __name__ == "__main__":
    main()
