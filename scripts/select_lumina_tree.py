"""Select the Lumina-lane draft tree by measured wall-clock tok/s.

At 7B geometry the tree-verification forward's MXU rows cost real time, so
the best shape trades compression against per-step cost — measured, not
modeled.  Runs the real spec engine at the bench's north-star configuration
(48x48 grid FSM, LANTERN k=10 d=5, int8 weights + int8 KV, trained drafter
when present) over a candidate shape set and writes
``ckpts/bench_tree_lumina.json`` when a candidate beats the current default.

Usage: python scripts/select_lumina_tree.py [--trees ...] [--grid 48]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int,
                    default=int(os.environ.get("BENCH_LUMINA_GRID", 48)))
    ap.add_argument("--trees",
                    default="chain_bush_8,mc_sim_7b_63,naive_extend_57,chain")
    ap.add_argument("--runs", type=int, default=1,
                    help="timed rollouts per tree (each is a full image)")
    ap.add_argument("--out", default="ckpts/bench_tree_lumina.json")
    ap.add_argument("--calibrate", action="store_true",
                    help="measure depth-dependent (stale) rank probs at this "
                    "geometry and add optimize_tree candidates at --budgets")
    ap.add_argument("--objective", default="accept",
                    choices=["accept", "greedy"],
                    help="calibration objective: 'accept' = per-(depth,rank) "
                    "STOCHASTIC-walk acceptance probs under the bench's "
                    "LANTERN point (the rule the lane runs; "
                    "calibrate.measure_stale_accept_probs); 'greedy' = the "
                    "r4 rank-match matrix (argmax objective)")
    ap.add_argument("--budgets", default="16:10,32:10,63:8",
                    help="nodes:max_depth list for calibrated candidates")
    ap.add_argument("--max-rank", type=int, default=10,
                    help="calibration rank width; stale (drafter-free) "
                    "drafting can propose arbitrarily wide levels at zero "
                    "drafter cost, so ranks past the reference's top_k=10 "
                    "are worth measuring")
    ap.add_argument("--probe-tokens", type=int, default=0,
                    help="tokens for the calibration rollout (0 = full image)")
    ap.add_argument("--probs-cache", default="ckpts/lumina_stale_probs.npz",
                    help="measured stale rank-prob matrix cache: loaded when "
                    "present (the measurement costs a full-image rollout + "
                    "teacher forward, ~11 min at 7B), written after a fresh "
                    "measurement; '' disables")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lantern_tpu import configs, trees
    from lantern_tpu.engine import spec
    from lantern_tpu.models import chameleon as cham
    from lantern_tpu.models import drafter as drf
    from lantern_tpu.models import transformer as tfm
    from lantern_tpu.ops.acceptance import LanternSpec
    from lantern_tpu.ops.quant import quantize_params
    from lantern_tpu.ops.sampling import LogitsWarp
    from lantern_tpu.ops.vq_distance import nearest_latents

    t0 = time.perf_counter()

    def note(m):
        print(f"[seltree +{time.perf_counter() - t0:6.1f}s] {m}", flush=True)

    GRID = args.grid
    MAX_NEW = GRID * (GRID + 1) + 1
    TEXT = list(range(60000, 60016))
    prompt_len = len(TEXT) + 3
    cfg = configs.chameleon_7b_config(
        max_seq_len=prompt_len + MAX_NEW + 74, swin_norm=True)
    if os.environ.get("BENCH_LUMINA_FLASH", "0") == "0":   # match the lane
        cfg = dataclasses.replace(cfg, use_flash_attention=False)
    if "BENCH_LUMINA_LAYERS" in os.environ:     # scaled-down smoke runs
        H = int(os.environ.get("BENCH_LUMINA_H", 4096))
        cfg = dataclasses.replace(
            cfg, num_layers=int(os.environ["BENCH_LUMINA_LAYERS"]),
            hidden_size=H,
            intermediate_size=int(os.environ.get("BENCH_LUMINA_I", 11008)),
            num_heads=H // 128, num_kv_heads=H // 128)
    ck = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ckpts/bench_drafter_lumina.npz")
    d_layers = 1
    if os.path.exists(ck):
        with np.load(ck) as z:
            if "num_layers" in z.files:
                d_layers = int(z["num_layers"])
    dcfg = configs.drafter_config(cfg, num_layers=d_layers,
                                  total_tokens=59, depth=4, top_k=10)
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]

    def build_host_params():
        with jax.default_device(cpu):
            params = tfm.init_params(jax.random.key(0), cfg)
            dparams = drf.init_drafter_params(jax.random.key(101), dcfg,
                                              params["embed"])
            if os.path.exists(ck):
                z = np.load(ck)
                dt_ = cfg.jnp_dtype
                dparams["fc_w"] = jnp.asarray(z["fc_w"], dt_)
                dparams["fc_b"] = jnp.asarray(z["fc_b"], dt_)
                dparams["layers"] = {
                    k[len("layers."):]: jnp.asarray(z[k], dt_)
                    for k in z.files if k.startswith("layers.")}
                note("trained lumina drafter loaded")
            else:
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

    # identical build recipe (seeds, fuse, quantize) to bench.py's lane ->
    # shares its host-param disk cache
    from bench import _host_param_cache

    tag = (f"lumina_L{cfg.num_layers}_H{cfg.hidden_size}"
           f"_I{cfg.intermediate_size}_k10_"
           + (f"tr{int(os.path.getmtime(ck))}" if os.path.exists(ck)
              else "pass") + "_v1")
    params, dparams = _host_param_cache(tag, build_host_params, note)
    params = jax.device_put(params, tpu)
    dparams = jax.device_put(dparams, tpu)
    note("7B params on device")

    warp = LogitsWarp(temperature=1.0, top_k=2000, top_p=1.0)
    tp = cham.lumina_token_prompt(TEXT, grid=(GRID, GRID))
    fsm = cham.LuminaGridFSM(w=GRID, h=GRID, image_start_idx=len(TEXT),
                             vocab_size=cfg.vocab_size)

    candidates = {}
    for name in args.trees.split(","):
        if not name:
            continue
        if name.startswith("ne:"):
            # level-major prefix of naive_extend_57: the r4 ne35/ne39/ne43
            # family, now first-class (sorted by depth, a prefix of every
            # path precedes it, so any cut is prefix-closed)
            n = int(name.split(":")[1])
            base = trees.get_tree("naive_extend_57")
            ordered = sorted([list(p) for p in base.paths],
                             key=lambda p: (len(p), p))
            candidates[f"ne{n + 1}"] = ordered[:n]
        else:
            candidates[name] = name
    if args.calibrate:
        from lantern_tpu.engine import calibrate as calib

        accept_obj = args.objective == "accept"
        max_depth = max(int(b.split(":")[1]) for b in args.budgets.split(","))
        cache = args.probs_cache
        if accept_obj and cache:
            cache = cache.replace("stale_probs", "accept_probs")
        if cache and os.path.exists(cache):
            with np.load(cache) as z:
                probs = z["probs"]
            if probs.shape[0] < max_depth:   # deeper budgets than the cache
                probs = np.concatenate(
                    [probs, np.broadcast_to(
                        probs[-1:], (max_depth - probs.shape[0],
                                     probs.shape[1]))])
            note(f"calibration probs loaded from {cache}")
        elif accept_obj:
            probs = calib.measure_stale_accept_probs(
                params, cfg, tp, jax.random.key(77),
                num_tokens=args.probe_tokens or MAX_NEW,
                nearest=params["nearest_latents"],
                lantern=LanternSpec(k=10, delta=5.0),
                max_rank=args.max_rank, max_depth=max_depth, cfg_scale=3.0,
                warp=warp, logits_fn=fsm, kv_quant=True)
            if cache:
                np.savez(cache, probs=probs, grid=GRID)
                note(f"stale ACCEPT probs cached to {cache}")
        else:
            probs = calib.measure_stale_rank_probs(
                params, cfg, tp, jax.random.key(77),
                num_tokens=args.probe_tokens or MAX_NEW,
                max_rank=args.max_rank, max_depth=max_depth, cfg_scale=3.0,
                warp=warp, logits_fn=fsm, kv_quant=True)
            if cache:
                np.savez(cache, probs=probs, grid=GRID)
                note(f"stale rank probs cached to {cache}")
        note(f"calibration probs ({args.objective} objective, rows=depth):")
        for d, row in enumerate(probs):
            note(f"  d={d + 1}: {np.round(row, 3).tolist()}")

        def model_c(paths):
            """best-first model's E[compression] = 1 + sum of path probs."""
            tot = 0.0
            for q in paths:
                x = 1.0
                for dd, r in enumerate(q):
                    x *= probs[min(dd, probs.shape[0] - 1)][r]
                tot += x
            return 1.0 + tot
        for b in args.budgets.split(","):
            nodes, depth = (int(x) for x in b.split(":"))
            paths = trees.optimize_tree(probs, num_nodes=nodes,
                                        max_depth=depth)
            name = f"calib_{nodes}n_d{depth}"
            candidates[name] = [list(p) for p in paths]
            note(f"{name}: model E[C] = {model_c(paths):.3f}, "
                 f"max_len {max(len(p) for p in paths)}")

    results = {}
    paths_by_name = {}
    for name, shape in candidates.items():
        tree = trees.get_tree(shape)
        paths_by_name[name] = [list(p) for p in tree.paths]
        ecfg = spec.SpecDecodeConfig(
            warp=warp, cfg_scale=3.0, lantern=LanternSpec(k=10, delta=5.0),
            max_new=MAX_NEW, mode="static", kv_quant=True,
            # measure the bench's production config: drafter-free stale
            # drafting when no trained drafter exists + deferred KV commit
            # on the dense path + pinned batched walk warp (bench.py lane)
            stale_draft=not os.path.exists(ck),
            deferred_commit=not cfg.use_flash_attention,
            walk_batch_warp=True,
        )

        def run(seed):
            res = spec.generate(params, dparams, ecfg, cfg, dcfg, tree,
                                None, None, jax.random.key(seed),
                                token_prompt=tp, logits_fn=fsm)
            np.asarray(res.tokens)
            return res
        try:
            run(7)
            best = None
            comp = None
            for i in range(args.runs):
                t = time.perf_counter()
                res = run(8 + i)
                dt = time.perf_counter() - t
                best = dt if best is None else min(best, dt)
                comp = float(res.accept_sum) / max(1.0, float(res.steps))
            tps = MAX_NEW / best
            results[name] = dict(tok_s=round(tps, 2),
                                 compression=round(comp, 3))
            note(f"{name}: {tps:.1f} tok/s, compression {comp:.3f}")
        except Exception as e:  # noqa: BLE001
            note(f"{name} failed: {type(e).__name__}: {e}")
    print(json.dumps(results, indent=1))
    if results:
        winner = max(results, key=lambda k: results[k]["tok_s"])
        note(f"winner: {winner}")
        with open(args.out, "w") as f:
            json.dump({"paths": paths_by_name[winner], "selected": winner,
                       "grid": GRID, "results": results}, f, indent=1)
        note(f"wrote {args.out} "
             "(set BENCH_LUMINA_TREE or let bench pick it up)")


if __name__ == "__main__":
    main()
