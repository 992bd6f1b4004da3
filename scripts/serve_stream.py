"""On-chip serving-stream benchmark: Scheduler + native C++ queue +
BatchedEngine driven by an open-loop (Poisson) arrival stream.

This is the measurement VERDICT r4 asked for (Weak #6): the serving engine
exercised with real arrivals and drains on the TPU — not steady-state
lockstep rollouts — reporting aggregate tok/s, p50/p95 request latency
(service and end-to-end), and the slot-refill cost.  The role model is the
reference's vLLM path (vllm_inference_solver.py:243-343), which owns
request admission/draining there.

Geometry: LlamaGen-XL t2i with small images (--tokens, default 64) so a few
hundred requests fit a bench-sized run.  Weights are random (zero-egress
rig); arrival-process dynamics, refill costs and latency distributions are
engine properties and transfer to real weights unchanged.

Usage:
  python scripts/serve_stream.py [--requests 200] [--slots 8] \
      [--tokens 64] [--rate 12] [--mode ar|spec] [--json out.json]
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


def pct(xs, p):
    xs = sorted(xs)
    if not xs:
        return float("nan")
    i = min(len(xs) - 1, int(round(p / 100 * (len(xs) - 1))))
    return xs[i]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=200)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--tokens", type=int, default=64)
    ap.add_argument("--rate", type=float, default=0.0,
                    help="mean arrivals/sec (Poisson); 0 = saturated "
                         "(all requests queued at t=0)")
    ap.add_argument("--mode", default="auto", choices=["auto", "ar", "spec"],
                    help="auto follows engine/policy.py's serving plan for "
                         "this slot count")
    ap.add_argument("--size", default="XL")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json", default="")
    ap.add_argument("--native", default="auto", choices=["auto", "0", "1"])
    args = ap.parse_args()

    import numpy as np
    import jax

    if os.environ.get("SERVE_CPU") == "1":
        # JAX_PLATFORMS alone does not stick on this box (sitecustomize
        # re-registers the remote-TPU plugin); pin via config before any op
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from lantern_tpu import configs, trees
    from lantern_tpu.engine import spec
    from lantern_tpu.engine.batch import BatchedEngine
    from lantern_tpu.engine.policy import serving_plan
    from lantern_tpu.engine.scheduler import Request, Scheduler
    from lantern_tpu.models import drafter as drf
    from lantern_tpu.models import transformer as tfm
    from lantern_tpu.ops.acceptance import LanternSpec
    from lantern_tpu.ops.sampling import LogitsWarp
    from lantern_tpu.ops.vq_distance import nearest_latents

    t_start = time.perf_counter()

    def note(m):
        print(f"[serve +{time.perf_counter() - t_start:6.1f}s] {m}",
              file=sys.stderr, flush=True)

    cfg = configs.llamagen_config(args.size, "t2i", image_tokens=args.tokens)
    dcfg = configs.drafter_config(cfg, num_layers=1, total_tokens=59,
                                  depth=4, top_k=10)
    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    with jax.default_device(cpu):
        params = tfm.init_params(jax.random.key(0), cfg)
        dparams = drf.init_drafter_params(jax.random.key(1), dcfg,
                                          params["embed"])
        H = cfg.hidden_size
        fc = np.zeros((2 * H, H), np.float32)
        fc[H:] = np.eye(H)
        dparams["fc_w"] = jnp.asarray(fc, dtype=cfg.jnp_dtype)
        dparams["layers"] = jax.tree.map(lambda a: a * 0, dparams["layers"])
        cb = jax.random.normal(jax.random.key(3), (cfg.vocab_size, 8))
        params["nearest_latents"] = jnp.asarray(nearest_latents(cb, k=11))
        params = tfm.fuse_params(params)
        dparams = tfm.fuse_params(dparams)
        from lantern_tpu.ops.quant import quantize_params

        params = quantize_params(params)
        dparams = quantize_params(dparams)
    params = jax.device_put(params, dev)
    dparams = jax.device_put(dparams, dev)
    note(f"params on device ({args.size}, int8)")
    uncond_row = params["cond"]["uncond"][None]

    # serving plan: AR (tree=None) vs small-tree speculation by slot count
    plan_mode, tree_name = serving_plan(args.slots, geometry="llamagen_xl")
    if args.mode != "auto":
        plan_mode = args.mode
        tree_name = tree_name or "chain_bush_8"
    warp = LogitsWarp(temperature=1.0, top_k=2000, top_p=1.0)
    if plan_mode == "ar":
        # nearest engine-native shape to lockstep AR: a 1-node chain (the
        # scheduler/queue/refill path under test is identical; pure batched
        # AR lives in ar.generate_many and has no slot churn to measure)
        tree_name = "chain1"
        tree = trees.get_tree([[0]])
    else:
        tree = trees.get_tree(tree_name or "chain_bush_8")
    ecfg = spec.SpecDecodeConfig(
        warp=warp, cfg_scale=3.0, lantern=LanternSpec(k=10, delta=5.0),
        max_new=args.tokens, mode="static", kv_quant=True,
        walk_batch_warp=True,
    )
    eng = BatchedEngine(ecfg, cfg, dcfg, tree, params, dparams,
                        num_slots=args.slots)
    note(f"engine: mode={plan_mode} tree={tree_name or 'chain[[0]]'} "
         f"({tree.num_nodes} nodes) slots={args.slots}")

    rng = np.random.default_rng(args.seed)
    cond = jax.random.normal(jax.random.key(2),
                             (1, cfg.cls_token_num, cfg.caption_dim))
    uncond = uncond_row.astype(cond.dtype)

    def build_reqs(n, rate):
        if rate > 0:
            gaps = rng.exponential(1.0 / rate, size=n)
            arrivals = np.concatenate([[0.0], np.cumsum(gaps)[:-1]])
        else:
            arrivals = np.zeros(n)
        return [Request(uid=i, cond=cond, uncond=uncond, seed=1000 + i,
                        arrival_time=float(arrivals[i]))
                for i in range(n)]

    use_native = None if args.native == "auto" else args.native == "1"
    sched = Scheduler(eng, use_native=use_native)
    note(f"scheduler: native={sched.use_native}")

    # warmup: compile prefill/step/insert with a few requests
    note("warmup (compiles prefill + step + insert)")
    sched.run(build_reqs(min(args.slots + 2, args.requests), 0.0))
    note("warmup done")

    # slot-refill cost: one prefill + insert, timed against one step
    pre = eng.prefill(cond, uncond, jax.random.key(7))
    batch = eng.empty_batch(pre)
    for s in range(args.slots):
        batch = eng.insert(batch, s, pre)
    batch = eng.step(batch)
    np.asarray(eng.slot_status(batch)[0])
    t0 = time.perf_counter()
    REP = 10
    for i in range(REP):
        p2 = eng.prefill(cond, uncond, jax.random.key(100 + i))
        batch = eng.insert(batch, i % args.slots, p2)
        np.asarray(eng.slot_status(batch)[0])
    t_refill = (time.perf_counter() - t0) / REP
    t0 = time.perf_counter()
    for _ in range(REP):
        batch = eng.step(batch)
    np.asarray(eng.slot_status(batch)[0])
    t_step = (time.perf_counter() - t0) / REP
    note(f"slot refill (prefill+insert+fetch): {t_refill * 1e3:.1f} ms; "
         f"decode step: {t_step * 1e3:.1f} ms")

    # the measured stream
    reqs = build_reqs(args.requests, args.rate)
    note(f"serving {args.requests} requests "
         + (f"at ~{args.rate}/s Poisson" if args.rate else "saturated"))
    t0 = time.perf_counter()
    done = sched.run(reqs, progress=False)
    wall = time.perf_counter() - t0
    ok = [r for r in done if r.error is None]
    toks = sum(args.tokens for _ in ok)
    lat = [r.latency for r in ok]
    e2e = [r.e2e_latency for r in ok]
    comp = [r.step_compression for r in ok]
    out = {
        "mode": plan_mode,
        "tree": tree_name or "ar[[0]]",
        "slots": args.slots,
        "requests": len(ok),
        "failed": len(done) - len(ok),
        "tokens_per_request": args.tokens,
        "arrival_rate_per_s": args.rate,
        "native_queue": sched.use_native,
        "wall_s": round(wall, 2),
        "aggregate_tokens_per_s": round(toks / wall, 1),
        "latency_p50_s": round(pct(lat, 50), 3),
        "latency_p95_s": round(pct(lat, 95), 3),
        "e2e_p50_s": round(pct(e2e, 50), 3),
        "e2e_p95_s": round(pct(e2e, 95), 3),
        "slot_refill_ms": round(t_refill * 1e3, 1),
        "decode_step_ms": round(t_step * 1e3, 1),
        "mean_step_compression": round(float(np.mean(comp)), 3) if comp else None,
        "backend": jax.default_backend(),
    }
    print(json.dumps(out), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
