"""Self-distill a drafter for the Lumina-mGPT-7B-class bench lane.

This is the north-star geometry (bench.py lumina_main): Chameleon-7B-class
decoder, 48x48 latent grid (2353 generated tokens), grid-FSM-constrained
CFG sampling.  The recipe mirrors scripts/prepare_bench_drafter.py's
dual-stream self-distillation (the engine cfg-combines the drafter's cond
AND uncond logit rows, so the drafter trains on BOTH hidden streams at the
deployment cfg scale — reference CFG-aware drafter:
models/drafters/cnets_lumina_mgpt.py:1148-1393), with the Lumina deltas:

- token prompts (random text ids + the image-start/grid header) instead of
  caption embeddings; sequences sampled through the grid FSM at cfg 3.0;
- per-stream deployment positions: the uncond row restarts at the image
  start (cnets_anole.py:817-830), threaded into the teacher-forced drafter
  forward via the batch "positions" rows;
- chunked head loss (TrainConfig.head_chunk): at V=65536, T~2370 the
  soft-CE logits would otherwise be ~1.2 GB per batch row;
- AR trace sampling is vmapped over a few requests so the 7B weight stream
  amortizes (ar.generate_tokens under jax.vmap).

Saves ckpts/bench_drafter_lumina.npz (drafter params minus the shared
embedding, reconstructed from the base seed); bench.py lumina_main loads it
when present, so the reported step compression reflects a *trained* drafter.

Usage: python scripts/prepare_lumina_drafter.py [--samples 48] [--epochs 6]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=48)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--bs", type=int, default=1,
                    help="rows per step (bs=2 OOMed v5e-16GB: dense 2372^2 "
                         "attention residuals next to the resident traces)")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--p-w", type=float, default=0.1,
                    help="soft-CE (head distribution) loss weight")
    ap.add_argument("--v-w", type=float, default=1.0,
                    help="hidden-regression loss weight (CE-dominant runs "
                         "set this << p_w; see PERF.md round-3 findings)")
    ap.add_argument("--grid", type=int, default=int(os.environ.get("BENCH_LUMINA_GRID", 48)))
    ap.add_argument("--layers", type=int, default=1)
    ap.add_argument("--sample-batch", type=int, default=1,
                    help="vmapped AR requests per sampling call (>1 uses the "
                         "dense-attention vmap path, which crashes the TPU "
                         "worker at full 7B geometry — keep 1 there)")
    ap.add_argument("--head-chunk", type=int, default=512)
    ap.add_argument("--rollout-depth", type=int, default=1,
                    help="on-policy rollout levels (drafter consumes its own "
                         "hidden predictions; directly optimizes deep-level "
                         "acceptance at ~2x step cost per extra level)")
    ap.add_argument("--init", choices=("passthrough", "random"),
                    default="passthrough",
                    help="passthrough: fc = [0; I] so the drafter starts "
                         "approximately at the hidden-passthrough identity "
                         "(the 0.02-scale random decoder layer stays live, "
                         "so step-0 behavior is near, not equal to, the "
                         "bench's zero-layer passthrough) and training "
                         "learns the h_i -> h_{i+1} correction.  random-init "
                         "measured 1.03 after 6 epochs at this geometry — "
                         "the 4096h/65536V random-base hidden map is not "
                         "learnable from scratch on 96 traces.")
    ap.add_argument("--eval-rollouts", type=int, default=2)
    ap.add_argument("--bench-layers", type=int, default=0,
                    help="override num_layers for smoke runs (0 = full 7B)")
    # NOT the bench's auto-loaded path: bench.py prefers
    # ckpts/bench_drafter_lumina.npz over the passthrough, and on a
    # random-weight base every trained variant measured WORSE (PERF.md
    # "Lumina drafter study") — so the trained npz is only promoted there
    # when its phase-3 self-rollout compression beats --promote-above.
    ap.add_argument("--out", default="ckpts/lumina_drafter_candidate")
    ap.add_argument("--promote-above", type=float, default=1.96,
                    help="promote the npz to ckpts/bench_drafter_lumina.npz "
                         "only if eval compression exceeds this (the "
                         "measured passthrough baseline at bench geometry); "
                         "<=0 disables promotion")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    import jax

    if os.environ.get("PREP_DEVICE") == "cpu":
        # tiny-geometry CPU debugging (--bench-layers): sitecustomize pins
        # the axon TPU plugin, so flip platforms after import (see
        # tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from lantern_tpu import configs
    from lantern_tpu.engine import ar
    from lantern_tpu.kv import KVCache
    from lantern_tpu.models import chameleon as cham
    from lantern_tpu.models import drafter as drf
    from lantern_tpu.models import transformer as tfm
    from lantern_tpu.ops.quant import quantize_params
    from lantern_tpu.ops.sampling import LogitsWarp
    from lantern_tpu.train import drafter_train as dt

    t0 = time.time()

    def note(m):
        print(f"[prep-lumina +{time.time() - t0:6.1f}s] {m}", flush=True)

    GRID = args.grid
    MAX_NEW = GRID * (GRID + 1) + 1
    TEXT_LEN = 16
    prompt_len = TEXT_LEN + 3
    # EXACTLY the bench lane's geometry and base seed (bench.py lumina_main)
    cfg = configs.chameleon_7b_config(
        max_seq_len=prompt_len + MAX_NEW + 74, swin_norm=True)
    if args.bench_layers:
        cfg = dataclasses.replace(
            cfg, num_layers=args.bench_layers,
            hidden_size=int(os.environ.get("BENCH_LUMINA_H", 4096)),
            intermediate_size=int(os.environ.get("BENCH_LUMINA_I", 11008)),
            num_heads=int(os.environ.get("BENCH_LUMINA_H", 4096)) // 128,
            num_kv_heads=int(os.environ.get("BENCH_LUMINA_H", 4096)) // 128)
    dcfg = configs.drafter_config(cfg, num_layers=args.layers,
                                  total_tokens=59, depth=4, top_k=10)

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    with jax.default_device(cpu):
        host_params = tfm.init_params(jax.random.key(0), cfg)   # = bench base
        dparams = drf.init_drafter_params(jax.random.key(101), dcfg,
                                          host_params["embed"])
        if args.init == "passthrough":
            # start AS the bench passthrough drafter (logits == base logits
            # at the current position), but with the 0.02-scale random layer
            # kept live (a zeroed layer has no gradient path) so training
            # can learn the next-hidden correction the passthrough lacks
            H = cfg.hidden_size
            fc = np.zeros((dparams["fc_w"].shape[0], H), np.float32)
            fc[-H:] = np.eye(H)
            dparams["fc_w"] = jnp.asarray(fc, dparams["fc_w"].dtype)
            dparams["fc_b"] = jnp.zeros_like(dparams["fc_b"])
        q_params = quantize_params(tfm.fuse_params(dict(host_params)))
    params = jax.device_put(q_params, tpu)
    dparams = jax.device_put(dparams, tpu)
    rope = tfm.make_rope_tables(cfg)
    drope = tfm.make_rope_tables(dcfg.model)
    warp = LogitsWarp(temperature=1.0, top_k=2000, top_p=1.0)
    fsm = cham.LuminaGridFSM(w=GRID, h=GRID, image_start_idx=TEXT_LEN,
                             vocab_size=cfg.vocab_size)
    note(f"7B-class base on device ({cfg.num_layers}L x {cfg.hidden_size}h, int8)")

    # ---- phase 1: sample FSM-constrained sequences (vmapped AR) ------------
    def one_prompt(key):
        text = list(np.asarray(
            jax.random.randint(key, (TEXT_LEN,), 60000, 64000)))
        return cham.lumina_token_prompt(text, grid=(GRID, GRID))

    # sample-batch > 1 vmaps the AR loop with dense attention (the pallas
    # flash kernel has no batching rule); batch 1 keeps the proven
    # single-request flash path (exactly the bench lumina AR configuration).
    # The batch-4 dense variant crashed the TPU worker at 7B geometry
    # (KV 4x2 rows + dense transients), so 1 is the full-scale default.
    cfg_sample = dataclasses.replace(cfg, use_flash_attention=False)

    def sample_many(tps, rngs):
        if len(tps) == 1:
            res = ar.generate_tokens(params, cfg, tps[0], MAX_NEW, 3.0,
                                     warp, rngs[0], logits_fn=fsm,
                                     kv_quant=True)
            return res.tokens[None]

        def one(tp_tokens, rng):
            tp = tps[0]._replace(tokens=tp_tokens)
            res = ar.generate_tokens(params, cfg_sample, tp, MAX_NEW, 3.0,
                                     warp, rng, logits_fn=fsm, kv_quant=True)
            return res.tokens
        toks = jnp.stack([tp.tokens for tp in tps])
        return jax.vmap(one)(toks, rngs)

    # ---- teacher: full-sequence forward, BOTH CFG streams ------------------
    # NOTE params as argument (jit-inlined constants would fetch 7 GB
    # host-side during lowering over the remote tunnel)
    @jax.jit
    def teacher(params, tp_tokens, tp_positions, tp_valid, gen_tokens):
        L = tp_tokens.shape[1]
        T = L + gen_tokens.shape[0]
        full = jnp.concatenate(
            [tp_tokens, jnp.broadcast_to(gen_tokens[None], (2,) + gen_tokens.shape)],
            axis=1)
        pos = jnp.concatenate(
            [tp_positions,
             tp_positions[:, -1:] + 1 + jnp.arange(gen_tokens.shape[0])[None]],
            axis=1)
        valid = jnp.concatenate(
            [tp_valid, jnp.ones((2, gen_tokens.shape[0]), bool)], axis=1)
        # chunked prefill: one full-sequence block would either blow the
        # flash kernel's scoped VMEM (query block ~32 MB) or materialize
        # multi-GB dense scores; 512-token query chunks against the growing
        # cache keep both paths small
        kv = KVCache.create(cfg, 2, max_len=T)
        S = kv.max_len
        pv = jnp.pad(valid, ((0, 0), (0, S - T)), constant_values=True)
        emb = tfm.token_embed(params, full)
        outs = []
        for lo in range(0, T, 512):
            hi = min(lo + 512, T)
            blk = (jnp.tril(jnp.ones((hi - lo, hi - lo), bool))[None]
                   & valid[:, None, lo:hi])
            res = tfm.forward(params, cfg, emb[:, lo:hi], kv,
                              pos[:, lo:hi], rope, block_mask=blk,
                              prefix_valid=pv)
            kv = res.kv
            outs.append(res.hidden)
        return jnp.concatenate(outs, axis=1)   # [2, T, H]

    S_BATCH = max(1, args.sample_batch)
    T_total = prompt_len + MAX_NEW
    # sampled token streams persist per sample (tiny): a restart after a
    # tunnel/worker stall skips re-sampling and only re-runs the teacher
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(args.out)) or ".",
                             "lumina_trace_cache")
    os.makedirs(cache_dir, exist_ok=True)
    tok_rows, hid_refs, pos_rows, valid_rows = [], [], [], []
    n_done = 0
    while n_done < args.samples:
        n = min(S_BATCH, args.samples - n_done)
        keys = [jax.random.key(1000 + n_done + j) for j in range(n)]
        tps = [one_prompt(jax.random.fold_in(k, 0)) for k in keys]
        cpaths = [os.path.join(cache_dir, f"g{GRID}_s{1000 + n_done + j}.npy")
                  for j in range(n)]
        if all(os.path.exists(c) for c in cpaths):
            gen = jnp.stack([jnp.asarray(np.load(c)) for c in cpaths])
        else:
            rngs = jnp.stack([jax.random.fold_in(k, 1) for k in keys])
            gen = sample_many(
                tps + [tps[-1]] * (S_BATCH - n),
                jnp.concatenate([rngs] + [rngs[-1:]] * (S_BATCH - n)))
            for j in range(n):
                np.save(cpaths[j], np.asarray(gen[j]))
        for j in range(n):
            tp = tps[j]
            hid2 = teacher(params, tp.tokens, tp.positions,
                           tp.valid.astype(bool), gen[j])
            full_host = np.concatenate(
                [np.asarray(tp.tokens[0]), np.asarray(gen[j])])
            # drafter stream: token_{i+1} at row i; last row gets a zero pad
            dr_tokens = np.concatenate(
                [full_host[1:], np.zeros((1,), np.int32)]).astype(np.int32)
            isi = int(tp.pos_diff)
            cond_pos = np.arange(T_total, dtype=np.int32)
            uncond_pos = np.maximum(cond_pos - isi, 0).astype(np.int32)
            v_cond = np.ones((T_total,), np.float32)
            v_uncond = np.ones((T_total,), np.float32)
            v_uncond[:isi] = 0.0
            for row, (p, v) in enumerate(((cond_pos, v_cond),
                                          (uncond_pos, v_uncond))):
                hid_refs.append(hid2[row])       # stays on device
                tok_rows.append(dr_tokens)
                pos_rows.append(p)
                valid_rows.append(v)
        n_done += n
        note(f"traces {n_done}/{args.samples}")
    # free the base BEFORE stacking the traces: training needs only the head
    # (dparams carries the shared embedding) and the stack's input rows +
    # output (~2x1.9 GB at 48 samples) do not fit next to the 7 GB base.
    # The eval phase re-uploads the full model from the host copy.
    # NOTE sample_many's closure also pins the 7 GB params — delete it too
    # (keeping it alive OOMed the first training step at 7B geometry).
    from lantern_tpu.ops import quant as qn
    head = qn.head_of(params)
    if isinstance(head, tuple):   # dequantize for the f32 training loss path
        q, s = head
        head = (q.astype(jnp.bfloat16) * s.astype(jnp.bfloat16))
    del params, sample_many, teacher

    hid_all = jnp.stack(hid_refs)                # [N, T, H] on device (bf16)
    del hid_refs
    tok_all = np.stack(tok_rows)
    pos_all = np.stack(pos_rows)
    valid_all = np.stack(valid_rows)
    # loss on every generated position (incl. FSM-forced grammar tokens:
    # their hidden states feed the drafter's next-level predictions)
    loss_mask_row = np.zeros((T_total,), np.float32)
    loss_mask_row[prompt_len - 1: T_total - 1] = 1.0
    note(f"traces on device: {hid_all.shape} {hid_all.dtype}")

    # ---- phase 2: drafter training ------------------------------------------
    n_rows = 2 * args.samples
    steps_per_epoch = max(n_rows // args.bs, 1)
    tcfg = dt.TrainConfig(
        lr=args.lr, p_w=args.p_w, v_w=args.v_w,
        noise="uniform", noise_std=0.1,
        warmup_steps=max(2, steps_per_epoch // 2),
        total_steps=steps_per_epoch * args.epochs,
        head_chunk=args.head_chunk,
        remat=True,   # dense T^2 attention residuals don't fit v5e HBM
        rollout_depth=args.rollout_depth,
    )
    state = dt.init_train_state(dparams, tcfg)
    rng_np = np.random.default_rng(0)
    key = jax.random.key(7)
    order = np.arange(n_rows)

    @jax.jit
    def gather_batch(hid_all, idx):
        rows = jnp.take(hid_all, idx, axis=0).astype(jnp.float32)
        tgt = jnp.concatenate(
            [rows[:, 1:], jnp.zeros_like(rows[:, :1])], axis=1)
        return rows, tgt

    for ep in range(args.epochs):
        rng_np.shuffle(order)
        agg = None
        for s in range(steps_per_epoch):
            idx = order[s * args.bs: (s + 1) * args.bs]
            hidden, target = gather_batch(hid_all, jnp.asarray(idx))
            b = {
                "tokens": jnp.asarray(tok_all[idx]),
                "hidden": hidden,
                "target": target,
                "positions": jnp.asarray(pos_all[idx]),
                "loss_mask": jnp.asarray(
                    np.broadcast_to(loss_mask_row, (len(idx), T_total))),
                "attn_valid": jnp.asarray(valid_all[idx]),
            }
            key, k = jax.random.split(key)
            state, m = dt.train_step(state, dcfg, tcfg, drope, head, b, k)
            mnp = {k2: np.asarray(v) for k2, v in m._asdict().items()}
            agg = mnp if agg is None else {k2: agg[k2] + mnp[k2] for k2 in mnp}
            if ep == 0 and s % 24 == 0:
                note(f"  step {s}/{steps_per_epoch} loss={float(mnp['loss']):.4f}")
        n = float(max(agg["total"], 1))
        note(f"epoch {ep}: loss={float(agg['loss']) / steps_per_epoch:.4f} "
             f"top1={float(agg['top_acc'][0]) / n:.3f} "
             f"top3={float(agg['top_acc'][2]) / n:.3f}")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save = {k: v for k, v in state.dparams.items() if k != "embed"}
    save = jax.tree.map(lambda a: np.asarray(a, np.float16), save)
    np.savez_compressed(args.out + ".npz", **{
        f"layers.{k}": v for k, v in save["layers"].items()
    }, fc_w=save["fc_w"], fc_b=save["fc_b"],
        num_layers=np.int64(args.layers))
    note(f"saved {args.out}.npz")

    # ---- phase 3: self-rollout compression (the decision metric) -----------
    if args.eval_rollouts > 0:
        from lantern_tpu import trees
        from lantern_tpu.engine import spec
        from lantern_tpu.ops.acceptance import LanternSpec
        from lantern_tpu.ops.vq_distance import nearest_latents

        del hid_all, head
        with jax.default_device(cpu):
            cb = jax.random.normal(jax.random.key(3), (8192, 8))
            near = np.asarray(nearest_latents(cb, k=11))
            q_params["nearest_latents"] = jnp.asarray(
                cham.shift_nearest_table(near, cfg.vocab_size))
            eval_dparams = quantize_params(tfm.fuse_params(
                jax.device_put(state.dparams, cpu)))
        params = jax.device_put(q_params, tpu)
        eval_dparams = jax.device_put(eval_dparams, tpu)
        TREE = os.environ.get("BENCH_LUMINA_TREE", "chain_bush_8")
        tree = trees.get_tree(TREE)
        ecfg = spec.SpecDecodeConfig(
            warp=warp, cfg_scale=3.0, lantern=LanternSpec(k=10, delta=5.0),
            max_new=MAX_NEW, mode="static", kv_quant=True,
        )
        acc_sum = step_sum = 0.0
        for i in range(args.eval_rollouts):
            key = jax.random.key(5000 + i)
            tp = one_prompt(jax.random.fold_in(key, 0))
            res = spec.generate(params, eval_dparams, ecfg, cfg, dcfg, tree,
                                None, None, jax.random.fold_in(key, 1),
                                token_prompt=tp, logits_fn=fsm)
            acc_sum += float(res.accept_sum)
            step_sum += float(res.steps)
            note(f"rollout {i}: compression so far "
                 f"{acc_sum / max(step_sum, 1):.3f}")
        comp = acc_sum / max(step_sum, 1)
        note(f"self-rollout step_compression = {comp:.4f} "
             f"(tree={TREE}, lantern k=10 d=5)")
        bench_npz = os.path.join(os.path.dirname(os.path.abspath(args.out)),
                                 "bench_drafter_lumina.npz")
        if args.promote_above > 0 and comp > args.promote_above:
            import shutil

            shutil.copyfile(args.out + ".npz", bench_npz)
            note(f"PROMOTED to {bench_npz} "
                 f"(compression {comp:.3f} > {args.promote_above})")
        elif args.promote_above > 0:
            note(f"NOT promoted: compression {comp:.3f} <= "
                 f"{args.promote_above} (passthrough baseline); bench keeps "
                 "the passthrough drafter")


if __name__ == "__main__":
    main()
