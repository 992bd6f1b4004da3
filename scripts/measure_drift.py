"""Spec-vs-AR output-distribution drift per LANTERN operating point.

LANTERN's relaxed acceptance changes the output distribution by design —
that is the delta trade (reference quantifies it with FID over real
checkpoints, entrypoints/eval_fid_clip.py:120-229; north star is speedup
"at reference-equal FID").  No public weights exist on this zero-egress rig,
so this is the rig-sized analogue VERDICT r4 asked for (item 7): generate
matched image sets at bench geometry under AR sampling, strict (EAGLE)
verification, and each official (k, delta) point, then quantify drift with

  - token-level instruments: unigram total-variation distance vs the AR
    set, and the fraction of out-of-top-k tokens,
  - the pinned FID-Inception pool3 instrument over VQGAN-decoded images
    (random VQGAN + fixed-seed inception instrument: numbers are relative
    between configs, not comparable to published FID).

Strict verification is distribution-preserving (the EAGLE guarantee), so
its row doubles as the instrument's noise floor at the sample budget.

One compiled engine serves every (k, delta) point via the traced operating
point (acc.LanternSpec.runtime).

Usage: python scripts/measure_drift.py [--images 48] [--size XL] [--json f]
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
    ap.add_argument("--images", type=int, default=48)
    ap.add_argument("--size", default="XL")
    ap.add_argument("--tokens", type=int, default=256)
    ap.add_argument("--json", default="")
    ap.add_argument("--fid", default="1", choices=["0", "1"])
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from lantern_tpu import configs, trees
    from lantern_tpu.engine import ar, spec
    from lantern_tpu.models import drafter as drf
    from lantern_tpu.models import transformer as tfm
    from lantern_tpu.ops.acceptance import LanternSpec
    from lantern_tpu.ops.sampling import LogitsWarp
    from lantern_tpu.ops.vq_distance import nearest_latents

    import bench

    t_start = time.perf_counter()

    def note(m):
        print(f"[drift +{time.perf_counter() - t_start:6.1f}s] {m}",
              file=sys.stderr, flush=True)

    cfg = configs.llamagen_config(args.size, "t2i", image_tokens=args.tokens)
    dcfg = configs.drafter_config(cfg, num_layers=1, total_tokens=59,
                                  depth=4, top_k=10)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    drafter_ckpt = os.path.join(repo, f"ckpts/bench_drafter_{args.size}.npz")
    trained = os.path.exists(drafter_ckpt)

    def build():
        with jax.default_device(cpu):
            params = tfm.init_params(jax.random.key(0), cfg)
            dparams = drf.init_drafter_params(jax.random.key(1), dcfg,
                                              params["embed"])
            if trained:
                z = np.load(drafter_ckpt)
                dt_ = cfg.jnp_dtype
                dparams["fc_w"] = jnp.asarray(z["fc_w"], dt_)
                dparams["fc_b"] = jnp.asarray(z["fc_b"], dt_)
                dparams["layers"] = {
                    k[len("layers."):]: jnp.asarray(z[k], dt_)
                    for k in z.files if k.startswith("layers.")
                }
            else:
                H = cfg.hidden_size
                fc = np.zeros((2 * H, H), np.float32)
                fc[H:] = np.eye(H)
                dparams["fc_w"] = jnp.asarray(fc, dtype=cfg.jnp_dtype)
                dparams["layers"] = jax.tree.map(lambda a: a * 0,
                                                 dparams["layers"])
            cb = jax.random.normal(jax.random.key(3), (cfg.vocab_size, 8))
            params["nearest_latents"] = jnp.asarray(nearest_latents(cb, k=11))
            params = tfm.fuse_params(params)
            dparams = tfm.fuse_params(dparams)
            from lantern_tpu.ops.quant import quantize_params

            params = quantize_params(params)
            dparams = quantize_params(dparams)
        return params, dparams

    tag = (f"drift_{args.size}_{args.tokens}_"
           + ("tr" if trained else "pass") + "_v1")
    params, dparams = bench._host_param_cache(tag, build, note)
    params = jax.device_put(params, dev)
    dparams = jax.device_put(dparams, dev)
    note("params on device")

    tree_path = os.path.join(repo, f"ckpts/bench_tree_{args.size}.json")
    tree = trees.get_tree(tree_path if os.path.exists(tree_path)
                          else "naive_extend_57")
    warp = LogitsWarp(temperature=1.0, top_k=2000, top_p=1.0)
    cond = jax.random.normal(jax.random.key(2),
                             (1, cfg.cls_token_num, cfg.caption_dim))
    uncond = params["cond"]["uncond"][None].astype(cond.dtype)

    N = args.images
    K_TAB = 10   # compiled neighbor-table width covers every official point

    ecfg = spec.SpecDecodeConfig(
        warp=warp, cfg_scale=3.0, lantern=LanternSpec(k=K_TAB, delta=5.0),
        max_new=args.tokens, mode="static", kv_quant=False,
        walk_batch_warp=True, deferred_commit=True,
    )

    def gen_ar(seed):
        return np.asarray(ar.generate(params, cfg, cond, uncond, args.tokens,
                                      3.0, warp, jax.random.key(seed)).tokens)

    def gen_spec(seed, k_eff, delta_eff):
        rt = ecfg.lantern.runtime(k_eff=k_eff, delta_eff=delta_eff)
        res = spec.generate(params, dparams, ecfg, cfg, dcfg, tree,
                            cond, uncond, jax.random.key(seed),
                            lantern_rt=rt)
        return np.asarray(res.tokens), float(res.step_compression)

    # strict: k_eff=0 disables the relaxation inside the same compiled engine
    POINTS = [("strict", 0, 0.0), ("k10_d5", 10, 5.0),
              ("k5_d10", 5, 10.0), ("k5_d20", 5, 20.0)]

    note(f"generating {N} AR images")
    sets = {"ar": np.stack([gen_ar(1000 + i) for i in range(N)])}
    comps = {}
    for name, k, d in POINTS:
        note(f"generating {N} spec images @ {name}")
        toks, cs = [], []
        for i in range(N):
            t, c = gen_spec(1000 + i, k, d)
            toks.append(t)
            cs.append(c)
        sets[name] = np.stack(toks)
        comps[name] = float(np.mean(cs))

    V = cfg.vocab_size

    def unigram(tokens):
        h = np.bincount(tokens.reshape(-1), minlength=V).astype(np.float64)
        return h / h.sum()

    u_ar = unigram(sets["ar"])
    rows = {}
    for name in sets:
        u = unigram(sets[name])
        tv = 0.5 * np.abs(u - u_ar).sum()
        rows[name] = {
            "unigram_tv_vs_ar": round(float(tv), 4),
            "mean_step_compression": (round(comps[name], 3)
                                      if name in comps else 1.0),
        }

    if args.fid == "1":
        from lantern_tpu.evals import inception, metrics
        from lantern_tpu.models import vqgan

        note("decoding token sets through VQ_16 + FID-Inception instrument")
        vq_cfg = vqgan.vq_16()
        g = cfg.grid_size
        with jax.default_device(cpu):
            vq_params = vqgan.init_vqgan_params(jax.random.key(9), vq_cfg)
            inc_params = inception.init_random_params(0)
        vq_params = jax.device_put(vq_params, dev)
        inc_params = jax.device_put(inc_params, dev)

        @jax.jit
        def feats_of(codes):
            img = vqgan.decode_code(vq_params, vq_cfg, codes, g)  # [B,H,W,3]
            img = jnp.clip((img + 1.0) * 127.5, 0, 255)
            img = jax.image.resize(
                img, (img.shape[0], 299, 299, 3), "bilinear")
            return inception.pool3_features(inc_params, img)

        feats = {}
        for name, toks in sets.items():
            fs = [np.asarray(feats_of(jnp.asarray(toks[i: i + 8])))
                  for i in range(0, N, 8)]
            feats[name] = np.concatenate(fs)
            note(f"features {name} done")
        for name in sets:
            if name == "ar":
                continue
            rows[name]["fid_instrument_vs_ar"] = round(
                metrics.fid_from_features(feats["ar"], feats[name]), 3)

    out = {"geometry": f"LlamaGen-{args.size} t2i {args.tokens}tok",
           "images_per_config": N,
           "tree": f"{tree.num_nodes} nodes",
           "drafter": "self-distilled" if trained else "passthrough",
           "note": ("instrument numbers are RELATIVE between configs "
                    "(random weights + random VQGAN/inception backbones); "
                    "strict row = the instrument's noise floor"),
           "configs": rows}
    print(json.dumps(out, indent=1), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
