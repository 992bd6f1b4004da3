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
    ap.add_argument("--geom", default="xl", choices=["xl", "lumina"],
                    help="lumina = Chameleon-7B-class token-prompt geometry "
                    "(grid FSM, stale drafting, int8 W+KV) — the KV-bound "
                    "regime where the crossover sits much higher than at XL")
    ap.add_argument("--grid", type=int, default=48,
                    help="lumina grid (FSM w=h); --tokens caps the rollout")
    ap.add_argument("--rs", default="4,8,16")
    ap.add_argument("--trees", default="calibrated,chain_bush_8,chain")
    ap.add_argument("--tokens", type=int, default=128,
                    help="image tokens per request (shorter than the bench's "
                    "256: the crossover is a rate, not a length, question; "
                    "at lumina geometry pick >=1024 so the KV term shows)")
    ap.add_argument("--with-ar", default="1")
    args = ap.parse_args()
    if args.geom == "lumina":
        return lumina_sweep(args)

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


def lumina_sweep(args):
    """Speculation-vs-AR crossover at Lumina-7B token-prompt geometry.

    Same protocol as the XL sweep (int8 weights + int8 KV on both paths)
    with the lane's production engine config: grid-FSM logits, drafter-free
    stale drafting (the measured-optimal drafter on this base), dense
    attention on the AR side (generate_tokens_many has no flash batching
    rule).  ``--tokens`` bounds the rollout; the KV buffer is sized to it,
    so slot counts are limited by R x KV/request (~0.5 MB/token int8)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lantern_tpu import configs, trees
    from lantern_tpu.engine import ar, spec
    from lantern_tpu.engine.batch import BatchedEngine
    from lantern_tpu.models import chameleon as cham
    from lantern_tpu.models import transformer as tfm
    from lantern_tpu.models import drafter as drf
    from lantern_tpu.ops.acceptance import LanternSpec
    from lantern_tpu.ops.quant import quantize_params
    from lantern_tpu.ops.sampling import LogitsWarp
    from lantern_tpu.ops.vq_distance import nearest_latents

    t0 = time.perf_counter()

    def note(m):
        print(f"[sweep-lumina +{time.perf_counter() - t0:6.1f}s] {m}",
              file=sys.stderr, flush=True)

    T = args.tokens
    GRID = args.grid
    TEXT = list(range(60000, 60016))
    prompt_len = len(TEXT) + 3
    cfg = configs.chameleon_7b_config(
        max_seq_len=prompt_len + T + 74, swin_norm=True)
    import dataclasses as _dc

    if "BENCH_LUMINA_LAYERS" in os.environ:      # scaled-down smoke runs
        H = int(os.environ.get("BENCH_LUMINA_H", 4096))
        cfg = _dc.replace(
            cfg, num_layers=int(os.environ["BENCH_LUMINA_LAYERS"]),
            hidden_size=H,
            intermediate_size=int(os.environ.get("BENCH_LUMINA_I", 11008)),
            num_heads=H // 128, num_kv_heads=H // 128)
    dcfg = configs.drafter_config(cfg, total_tokens=59, depth=4, top_k=10)
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    with jax.default_device(cpu):
        params = tfm.init_params(jax.random.key(0), cfg)
        dparams = drf.init_drafter_params(jax.random.key(101), dcfg,
                                          params["embed"])
        cb = jax.random.normal(jax.random.key(3), (8192, 8))
        near = np.asarray(nearest_latents(cb, k=11))
        params["nearest_latents"] = jnp.asarray(
            cham.shift_nearest_table(near, cfg.vocab_size))
        params = quantize_params(tfm.fuse_params(params))
        dparams = quantize_params(tfm.fuse_params(dparams))
    params = jax.device_put(params, tpu)
    dparams = jax.device_put(dparams, tpu)
    note("7B params on device (int8)")

    warp = LogitsWarp(temperature=1.0, top_k=2000, top_p=1.0)
    tp = cham.lumina_token_prompt(TEXT, grid=(GRID, GRID))
    fsm = cham.LuminaGridFSM(w=GRID, h=GRID, image_start_idx=len(TEXT),
                             vocab_size=cfg.vocab_size)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sel = os.path.join(repo, "ckpts/bench_tree_lumina.json")

    def get_tree(name):
        if name == "calibrated":
            return trees.get_tree(sel) if os.path.exists(sel) else None
        return trees.get_tree(name)

    results = []
    for R in (int(r) for r in args.rs.split(",")):
        for name in args.trees.split(","):
            tree = get_tree(name)
            if tree is None:
                note(f"tree {name} unavailable; skipped")
                continue
            ecfg = spec.SpecDecodeConfig(
                warp=warp, cfg_scale=3.0,
                lantern=LanternSpec(k=10, delta=5.0),
                max_new=T, mode="static", kv_quant=True, stale_draft=True,
            )
            try:
                eng = BatchedEngine(ecfg, cfg, dcfg, tree, params, dparams,
                                    num_slots=R, logits_fn=fsm)

                def run(seed):
                    reqs = [eng.prefill(None, None, jax.random.key(seed + i),
                                        token_prompt=tp) for i in range(R)]
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
                stacked = tp.__class__(
                    tokens=jnp.broadcast_to(tp.tokens, (R,) + tp.tokens.shape),
                    positions=jnp.broadcast_to(tp.positions,
                                               (R,) + tp.positions.shape),
                    valid=jnp.broadcast_to(tp.valid, (R,) + tp.valid.shape),
                    pos_diff=tp.pos_diff,
                )
                rngs = jax.vmap(jax.random.key)(
                    jnp.arange(R, dtype=jnp.uint32))

                def run_ar():
                    toks, _ = ar.generate_tokens_many(
                        params, cfg, stacked, T, 3.0, warp, rngs,
                        logits_fn=fsm, kv_quant=True)
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
