"""Measure the batched speculation-vs-AR crossover (VERDICT r2 #3).

For each slot count R, time (a) the batched spec engine with int8 KV over a
set of draft-tree shapes and (b) lockstep batched AR with int8 KV —
apples-to-apples this time (the r2 sweep ran the spec path with bf16 KV).
Emits one JSON line per point plus a summary table; paste the winners into
``lantern_tpu/engine/policy.py`` and PERF.md.

Usage: python scripts/sweep_batched.py [--rs 4,8,16] [--trees ...]
       [--tokens 128]
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
    ap.add_argument("--rs", default="4,8,16")
    ap.add_argument("--trees", default="calibrated,chain_bush_8,chain")
    ap.add_argument("--tokens", type=int, default=128,
                    help="image tokens per request (shorter than the bench's "
                    "256: the crossover is a rate, not a length, question)")
    ap.add_argument("--with-ar", default="1")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lantern_tpu import configs, trees
    from lantern_tpu.engine import ar, spec
    from lantern_tpu.engine.batch import BatchedEngine
    from lantern_tpu.models import drafter as drf
    from lantern_tpu.models import transformer as tfm
    from lantern_tpu.ops.acceptance import LanternSpec
    from lantern_tpu.ops.quant import quantize_params
    from lantern_tpu.ops.sampling import LogitsWarp
    from lantern_tpu.ops.vq_distance import nearest_latents

    t0 = time.perf_counter()

    def note(m):
        print(f"[sweep +{time.perf_counter() - t0:6.1f}s] {m}",
              file=sys.stderr, flush=True)

    T = args.tokens
    cfg = configs.llamagen_config(args.size, "t2i", image_tokens=T)
    ck = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), f"ckpts/bench_drafter_{args.size}.npz")
    d_layers = 1
    if os.path.exists(ck):
        with np.load(ck) as z:
            if "num_layers" in z.files:
                d_layers = int(z["num_layers"])
    dcfg = configs.drafter_config(cfg, num_layers=d_layers,
                                  total_tokens=59, depth=4, top_k=10)
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    with jax.default_device(cpu):
        params = tfm.init_params(jax.random.key(0), cfg)
        dparams = drf.init_drafter_params(jax.random.key(101), dcfg,
                                          params["embed"])
        if os.path.exists(ck):
            z = np.load(ck)
            dt_ = cfg.jnp_dtype
            dparams["fc_w"] = jnp.asarray(z["fc_w"], dt_)
            dparams["fc_b"] = jnp.asarray(z["fc_b"], dt_)
            dparams["layers"] = {k[len("layers."):]: jnp.asarray(z[k], dt_)
                                 for k in z.files if k.startswith("layers.")}
            note(f"trained drafter loaded ({d_layers} layers)")
        cb = jax.random.normal(jax.random.key(3), (cfg.vocab_size, 8))
        params["nearest_latents"] = jnp.asarray(nearest_latents(cb, k=11))
        params = quantize_params(tfm.fuse_params(params))
        dparams = quantize_params(tfm.fuse_params(dparams))
    params = jax.device_put(params, tpu)
    dparams = jax.device_put(dparams, tpu)
    warp = LogitsWarp(temperature=1.0, top_k=2000, top_p=1.0)
    note("params ready (int8 weights)")

    tree_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), f"ckpts/bench_tree_{args.size}.json")

    def get_tree(name):
        if name == "calibrated":
            if not os.path.exists(tree_path):
                return None
            return trees.get_tree(tree_path)
        return trees.get_tree(name)

    results = []
    for R in (int(r) for r in args.rs.split(",")):
        cond = jax.random.normal(jax.random.key(2),
                                 (1, cfg.cls_token_num, cfg.caption_dim))
        uncond = params["cond"]["uncond"][None].astype(cond.dtype)
        for name in args.trees.split(","):
            tree = get_tree(name)
            if tree is None:
                note(f"tree {name} unavailable; skipped")
                continue
            ecfg = spec.SpecDecodeConfig(
                warp=warp, cfg_scale=3.0, lantern=LanternSpec(k=10, delta=5.0),
                max_new=T, mode="static", kv_quant=True,
            )
            try:
                eng = BatchedEngine(ecfg, cfg, dcfg, tree, params, dparams,
                                    num_slots=R)

                def run(seed):
                    reqs = [eng.prefill(cond, uncond,
                                        jax.random.key(seed + i))
                            for i in range(R)]
                    batch = eng.empty_batch(reqs[0])
                    for i, r in enumerate(reqs):
                        batch = eng.insert(batch, i, r)
                    while True:
                        batch = eng.step_many(batch, 16)
                        n_new, steps, acc = eng.slot_status(batch)
                        if (n_new >= T).all():
                            return float(steps.sum()), float(acc.sum())
                run(100)
                t = time.perf_counter()
                steps, acc = run(200)
                dt = time.perf_counter() - t
                tps = R * T / dt
                comp = acc / max(steps, 1)
                results.append(dict(R=R, config=f"spec:{name}",
                                    tok_s=round(tps, 1),
                                    compression=round(comp, 3)))
                note(f"R={R} spec:{name}: {tps:.1f} tok/s "
                     f"(compression {comp:.2f})")
            except Exception as e:  # noqa: BLE001
                note(f"R={R} spec:{name} failed: {type(e).__name__}: {e}")
        if args.with_ar == "1":
            try:
                conds = jnp.broadcast_to(cond, (R,) + cond.shape)
                rngs = jax.vmap(jax.random.key)(
                    jnp.arange(R, dtype=jnp.uint32))

                def run_ar():
                    toks = ar.generate_many(params, cfg, conds, uncond, T,
                                            3.0, warp, rngs, kv_quant=True)
                    np.asarray(toks)
                run_ar()
                t = time.perf_counter()
                run_ar()
                tps = R * T / (time.perf_counter() - t)
                results.append(dict(R=R, config="ar", tok_s=round(tps, 1),
                                    compression=1.0))
                note(f"R={R} ar: {tps:.1f} tok/s")
            except Exception as e:  # noqa: BLE001
                note(f"R={R} ar failed: {type(e).__name__}: {e}")
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
