"""Self-distill a drafter for the benchmark model.

The zero-egress environment has no published LANTERN checkpoints, so the
bench base model is random-init (deterministic from seed 0).  This script
runs the framework's own drafter lifecycle against that base — generate
self-distillation traces, train the 1-layer EAGLE drafter — and saves the
drafter params (without the shared embedding, which is reconstructed from
the base seed) to ``ckpts/bench_drafter_{size}/``.  bench.py loads it when
present, so reported step compression reflects a *trained* drafter.

Usage:  python scripts/prepare_bench_drafter.py [--size B] [--samples 256]
        [--epochs 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default=os.environ.get("BENCH_SIZE", "XL"))
    ap.add_argument("--samples", type=int, default=192)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--image-tokens", type=int, default=256)
    ap.add_argument("--rollout-depth", type=int, default=1)
    ap.add_argument("--layers", type=int, default=1,
                    help="drafter decoder layers (reference cnets use 1; "
                    "2 lifts top-1 acceptance for ~0.1ms extra draft cost)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--eval-rollouts", type=int, default=3,
                    help="post-train self-rollout spec decodes to measure "
                    "step compression (0 = skip)")
    ap.add_argument("--init", choices=("random", "passthrough"),
                    default="random",
                    help="passthrough: fc = [0; I] so training starts at the "
                         "hidden-passthrough operating point (the Lumina lane "
                         "needs this at 4096h/65536V; at XL geometry random "
                         "init already reached compression 2.5 — A/B both)")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lantern_tpu import configs
    from lantern_tpu.engine import ar
    from lantern_tpu.kv import KVCache
    from lantern_tpu.models import drafter as drf
    from lantern_tpu.models import transformer as tfm
    from lantern_tpu.ops.sampling import LogitsWarp
    from lantern_tpu.train import drafter_train as dt
    from lantern_tpu.utils import checkpoint as ckpt

    t0 = time.time()

    def note(m):
        print(f"[prep +{time.time() - t0:6.1f}s] {m}", flush=True)

    cfg = configs.llamagen_config(args.size, "t2i", image_tokens=args.image_tokens)
    dcfg = configs.drafter_config(cfg, num_layers=args.layers,
                                  total_tokens=59, depth=4, top_k=10)
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    with jax.default_device(cpu):
        params = tfm.init_params(jax.random.key(0), cfg)   # = bench base model
        dparams = drf.init_drafter_params(jax.random.key(101), dcfg, params["embed"])
        if args.init == "passthrough":
            H = cfg.hidden_size
            fc = np.zeros((dparams["fc_w"].shape[0], H), np.float32)
            fc[-H:] = np.eye(H)
            dparams["fc_w"] = jnp.asarray(fc, dparams["fc_w"].dtype)
            dparams["fc_b"] = jnp.zeros_like(dparams["fc_b"])
    params = jax.device_put(params, tpu)
    dparams = jax.device_put(dparams, tpu)
    rope = tfm.make_rope_tables(cfg)
    drope = tfm.make_rope_tables(dcfg.model)
    Tc = cfg.cls_token_num
    T_img = args.image_tokens
    warp = LogitsWarp(temperature=1.0, top_k=2000, top_p=1.0)
    note(f"base {args.size} ready")

    # ---- phase 1: self-distillation traces ---------------------------------
    # Sample sequences from the base (AR, CFG off for diversity) and record
    # teacher-forced hidden states: one forward gives both tokens' hidden and
    # the drafter targets.
    # NOTE: do not wrap in another jax.jit — ar.generate is already jitted,
    # and jit-of-jit wedges this environment's remote-compile path.
    def sample_tokens(cond, uncond, rng):
        # sample at the BENCH's cfg scale: the drafter must approximate the
        # deployment distribution, and its logits are cfg-combined at
        # inference (combined = 3*cond - 2*uncond), so both streams matter
        res = ar.generate(params, cfg, cond, uncond, T_img, 3.0, warp, rng)
        return res.tokens

    # params MUST be an argument, not a closure capture: jit inlines captured
    # device arrays as MLIR constants, and lowering then fetches all 1.5 GB
    # of weights host-side through the tunnel (hangs for minutes).
    @jax.jit
    def teacher(params, cond_pair, tokens):
        # batch-2 teacher: the engine feeds the drafter BOTH the cond and
        # uncond hidden streams (then cfg-combines its head logits); train
        # on both so neither row is out-of-distribution
        embeds = jnp.concatenate(
            [tfm.cond_embed(params, cfg, cond_pair),
             tfm.token_embed(params, jnp.broadcast_to(tokens, (2,) + tokens.shape[1:]))],
            axis=1,
        )
        T = embeds.shape[1]
        kv = KVCache.create(cfg, 2, max_len=T)
        return tfm.forward(params, cfg, embeds, kv, jnp.arange(T), rope).hidden

    # hidden-state traces stay ON DEVICE (the host<->device tunnel in this
    # environment is slow; fetching/re-uploading ~2 MB x samples x epochs
    # dominates otherwise).  Only the 1 KB token vectors come host-side.
    tok_rows, hid_rows = [], []
    max_len = Tc - 1 + T_img
    for i in range(args.samples):
        key = jax.random.key(1000 + i)
        cond = jax.random.normal(jax.random.fold_in(key, 0),
                                 (1, Tc, cfg.caption_dim))
        uncond = params["cond"]["uncond"][None].astype(cond.dtype)
        toks = sample_tokens(cond, uncond, jax.random.fold_in(key, 1))
        cond_pair = jnp.concatenate([cond, uncond], axis=0)
        hid2 = teacher(params, cond_pair, toks[None])               # [2, Tc+T, H]
        dr_tokens = np.zeros((max_len,), np.int32)
        dr_tokens[Tc - 1: Tc - 1 + T_img] = np.asarray(toks)
        hid_rows.append(hid2[0])        # cond stream
        tok_rows.append(dr_tokens)
        hid_rows.append(hid2[1])        # uncond stream (same tokens)
        tok_rows.append(dr_tokens)
        if i == 0 or (i + 1) % 32 == 0:
            note(f"traces {i + 1}/{args.samples}")
    hid_all = jnp.stack(hid_rows)                                   # [N, Tc+T, H]
    del hid_rows
    tok_all = np.stack(tok_rows)
    loss_mask_row = np.zeros((max_len,), np.float32)
    loss_mask_row[Tc - 1: Tc - 2 + T_img] = 1.0

    # ---- phase 2: drafter training -----------------------------------------
    n_rows = 2 * args.samples            # cond + uncond stream per sample
    steps_per_epoch = max(n_rows // args.bs, 1)
    tcfg = dt.TrainConfig(
        lr=args.lr, p_w=0.1, noise="uniform", noise_std=0.1,
        rollout_depth=args.rollout_depth,
        warmup_steps=max(2, steps_per_epoch // 2),
        total_steps=steps_per_epoch * args.epochs,
    )
    state = dt.init_train_state(dparams, tcfg)
    head = params["lm_head"]
    rng = np.random.default_rng(0)
    key = jax.random.key(7)
    order = np.arange(n_rows)

    @jax.jit
    def gather_batch(hid_all, idx):
        rows = jnp.take(hid_all, idx, axis=0).astype(jnp.float32)
        return rows[:, :max_len], rows[:, 1 : max_len + 1]

    for ep in range(args.epochs):
        rng.shuffle(order)
        agg = None
        for s in range(steps_per_epoch):
            idx = order[s * args.bs: (s + 1) * args.bs]
            hidden, target = gather_batch(hid_all, jnp.asarray(idx))
            b = {
                "tokens": jnp.asarray(tok_all[idx]),
                "hidden": hidden,
                "target": target,
                "loss_mask": jnp.asarray(
                    np.broadcast_to(loss_mask_row, (len(idx), max_len))),
                "attn_valid": jnp.ones((len(idx), max_len), jnp.float32),
            }
            key, k = jax.random.split(key)
            state, m = dt.train_step(state, dcfg, tcfg, drope, head, b, k)
            mnp = {k2: np.asarray(v) for k2, v in m._asdict().items()}
            agg = mnp if agg is None else {k2: agg[k2] + mnp[k2] for k2 in mnp}
        n = float(max(agg["total"], 1))
        note(f"epoch {ep}: loss={float(agg['loss']) / steps_per_epoch:.4f} "
             f"top1={float(agg['top_acc'][0]) / n:.3f} "
             f"top3={float(agg['top_acc'][2]) / n:.3f}")

    out = args.out or f"ckpts/bench_drafter_{args.size}"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    save = {k: v for k, v in state.dparams.items() if k != "embed"}
    save = jax.tree.map(lambda a: np.asarray(a, np.float16), save)
    np.savez_compressed(out + ".npz", **{
        f"layers.{k}": v for k, v in save["layers"].items()
    }, fc_w=save["fc_w"], fc_b=save["fc_b"],
        num_layers=np.int64(args.layers))
    note(f"saved {out}.npz")

    # ---- phase 3: self-rollout compression (the decision metric) ----------
    # Teacher-forced top-k accuracy overstates weak drafters and understates
    # distribution shift (the drafter consumes its own hidden states at
    # depth>1), so measure what the bench measures: accepted tokens per
    # verify step over a few full spec-decode rollouts.
    if args.eval_rollouts > 0:
        from lantern_tpu import trees
        from lantern_tpu.engine import spec
        from lantern_tpu.ops.acceptance import LanternSpec
        from lantern_tpu.ops.quant import quantize_params
        from lantern_tpu.ops.vq_distance import nearest_latents

        eval_dparams = state.dparams
        with jax.default_device(cpu):
            cb = jax.random.normal(jax.random.key(3), (cfg.vocab_size, 8))
            params["nearest_latents"] = jnp.asarray(nearest_latents(cb, k=11))
            # evaluate in the bench's default weight format (int8) so the
            # number steers decisions the bench actually reproduces
            if os.environ.get("BENCH_QUANT", "int8") == "int8":
                params = jax.device_put(quantize_params(
                    jax.device_put(params, cpu)), tpu)
                eval_dparams = jax.device_put(quantize_params(
                    jax.device_put(eval_dparams, cpu)), tpu)
        tree = trees.get_tree("naive_extend_57")
        ecfg = spec.SpecDecodeConfig(
            warp=warp, cfg_scale=3.0, lantern=LanternSpec(k=10, delta=5.0),
            max_new=T_img, mode="static",
        )
        acc_sum = step_sum = 0.0
        for i in range(args.eval_rollouts):
            key = jax.random.key(5000 + i)
            cond = jax.random.normal(jax.random.fold_in(key, 0),
                                     (1, Tc, cfg.caption_dim))
            uncond = params["cond"]["uncond"][None].astype(cond.dtype)
            res = spec.generate(params, eval_dparams, ecfg, cfg, dcfg, tree,
                                cond, uncond, jax.random.fold_in(key, 1))
            acc_sum += float(res.accept_sum)
            step_sum += float(res.steps)
            note(f"rollout {i}: compression so far {acc_sum / max(step_sum, 1):.3f}")
        note(f"self-rollout step_compression = {acc_sum / max(step_sum, 1):.4f} "
             f"({args.eval_rollouts} rollouts, lantern k=10 d=5)")


if __name__ == "__main__":
    main()
