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
    ap.add_argument("--geom", default="xl", choices=["xl", "lumina"],
                    help="lumina = the north-star 7B lane (stale drafting, "
                    "deferred commit, grid FSM, int8 W+KV, calibrated tree)")
    ap.add_argument("--tokens", type=int, default=256)
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--points", default="10:5,5:10,5:20,10:10,10:20")
    ap.add_argument("--tree", default="naive_extend_57")
    args = ap.parse_args()
    if args.geom == "lumina":
        return lumina_sweep(args)
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


def lumina_sweep(args):
    """Official (k, delta) sweep at the north-star Lumina-7B lane config.

    One compiled engine (traced LanternRT) serves every point; setup matches
    bench.py lumina_main exactly (host-param cache shared)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lantern_tpu import configs, trees
    from lantern_tpu.engine import ar, spec
    from lantern_tpu.models import chameleon as cham
    from lantern_tpu.models import drafter as drf
    from lantern_tpu.models import transformer as tfm
    from lantern_tpu.ops.acceptance import LanternSpec
    from lantern_tpu.ops.quant import quantize_params
    from lantern_tpu.ops.sampling import LogitsWarp
    from lantern_tpu.ops.vq_distance import nearest_latents
    from bench import _host_param_cache

    t_start = time.perf_counter()

    def note(m):
        print(f"[sweepL +{time.perf_counter() - t_start:6.1f}s] {m}",
              file=sys.stderr, flush=True)

    points = [tuple(float(x) for x in p.split(":"))
              for p in args.points.split(",")]
    kmax = max(int(k) for k, _ in points)
    GRID = int(os.environ.get("BENCH_LUMINA_GRID", 48))
    MAX_NEW = GRID * (GRID + 1) + 1
    TEXT = list(range(60000, 60016))
    cfg = configs.chameleon_7b_config(
        max_seq_len=len(TEXT) + 3 + MAX_NEW + 74, swin_norm=True)
    cfg = dataclasses.replace(cfg, use_flash_attention=False)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ck = os.path.join(repo, "ckpts/bench_drafter_lumina.npz")
    dcfg = configs.drafter_config(cfg, num_layers=1, total_tokens=59,
                                  depth=4, top_k=10)
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]

    def build():
        with jax.default_device(cpu):
            params = tfm.init_params(jax.random.key(0), cfg)
            dparams = drf.init_drafter_params(jax.random.key(101), dcfg,
                                              params["embed"])
            H = cfg.hidden_size
            fc = np.zeros((2 * H, H), np.float32)
            fc[H:] = np.eye(H)
            dparams["fc_w"] = jnp.asarray(fc, dtype=cfg.jnp_dtype)
            dparams["layers"] = jax.tree.map(lambda a: a * 0,
                                             dparams["layers"])
            cb = jax.random.normal(jax.random.key(3), (8192, 8))
            near = np.asarray(nearest_latents(cb, k=11))
            params["nearest_latents"] = jnp.asarray(
                cham.shift_nearest_table(near, cfg.vocab_size))
            params = quantize_params(tfm.fuse_params(params))
            dparams = quantize_params(tfm.fuse_params(dparams))
        return params, dparams

    tag = (f"lumina_L{cfg.num_layers}_H{cfg.hidden_size}"
           f"_I{cfg.intermediate_size}_k10_pass_v1")
    params, dparams = _host_param_cache(tag, build, note)
    params = jax.device_put(params, tpu)
    dparams = jax.device_put(dparams, tpu)
    note("7B params on device")

    warp = LogitsWarp(temperature=1.0, top_k=2000, top_p=1.0)
    tp = cham.lumina_token_prompt(TEXT, grid=(GRID, GRID))
    fsm = cham.LuminaGridFSM(w=GRID, h=GRID, image_start_idx=len(TEXT),
                             vocab_size=cfg.vocab_size)
    sel = os.path.join(repo, "ckpts/bench_tree_lumina.json")
    tree = trees.get_tree(sel if os.path.exists(sel) else "chain_bush_8")
    lantern = LanternSpec(k=kmax, delta=5.0)
    ecfg = spec.SpecDecodeConfig(
        warp=warp, cfg_scale=3.0, lantern=lantern, max_new=MAX_NEW,
        mode="static", kv_quant=True, stale_draft=True,
        deferred_commit=True, walk_batch_warp=True)

    def run(k, d, seed):
        res = spec.generate(params, dparams, ecfg, cfg, dcfg, tree,
                            None, None, jax.random.key(seed),
                            token_prompt=tp, logits_fn=fsm,
                            lantern_rt=lantern.runtime(k_eff=int(k),
                                                       delta_eff=d))
        np.asarray(res.tokens)
        return res

    note("compiling (single jit for all points)")
    run(*points[0], 0)
    note("compiled")

    # AR reference for vs_baseline per point
    def run_ar(seed):
        res = ar.generate_tokens(params, cfg, tp, MAX_NEW, 3.0, warp,
                                 jax.random.key(seed), logits_fn=fsm,
                                 kv_quant=True)
        np.asarray(res.tokens)
    run_ar(7)
    t0 = time.perf_counter()
    run_ar(8)
    t_ar = time.perf_counter() - t0
    note(f"AR: {MAX_NEW / t_ar:.2f} tok/s")

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
               "tokens_per_s": round(MAX_NEW / float(np.mean(ts)), 2),
               "vs_baseline": round(t_ar / float(np.mean(ts)), 3)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    best = max(rows, key=lambda r: r["tokens_per_s"])
    print(json.dumps({"best": best, "ar_tokens_per_s":
                      round(MAX_NEW / t_ar, 2)}), flush=True)


if __name__ == "__main__":
    main()
