"""Component-level timing of one speculative step at bench (XL) geometry.

Environment-specific measurement rules (axon remote-TPU relay):
- ``jax.block_until_ready`` does NOT block here — executions are fully async
  and only a host fetch (np.asarray) forces completion.  Every timing below
  fetches its result.
- Per-call round-trip latency over the tunnel is large (~0.5s), so each
  component is timed as a jitted ``lax.scan`` of ITERS iterations (one
  remote call, amortized), and the measured trivial-jit round-trip is
  subtracted from totals.
- Engine state is hand-built (zero caches + a mid-generation length), NOT
  produced by an eager prefill: eager mode dispatches each op as its own
  remote call and never finishes at XL scale.

The full fused spec-step loop is deliberately absent — its compile takes
~20 min over the tunnel; bench.py's verify_steps_per_s already reports it.

Usage: python scripts/profile_step.py [--size XL] [--iters 64]
"""
from __future__ import annotations

import argparse
import dataclasses
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
                    help="xl = LlamaGen --size; lumina = Chameleon-7B-class "
                         "north-star geometry (32L x 4096h, vocab 65536, "
                         "2.4K-token KV)")
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--tokens", type=int, default=256)
    ap.add_argument("--prefix", type=int, default=-1,
                    help="simulated committed KV length (-1: geometry "
                         "default — XL 248 = cls 120 + half image, lumina "
                         "1200 = mid-image)")
    ap.add_argument("--quant", default=None, choices=["int8", "none"],
                    help="W8A16 weights (default: int8 at lumina geometry, "
                         "none at XL — matching the r2 PERF.md table)")
    ap.add_argument("--kv", default=None, choices=["int8", "bf16"],
                    help="KV cache dtype (default: int8 at lumina, bf16 XL)")
    ap.add_argument("--tree", default=None)
    args = ap.parse_args()
    ITERS = args.iters

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lantern_tpu import configs, trees
    from lantern_tpu.engine import spec
    from lantern_tpu.kv import KVCache
    from lantern_tpu.models import drafter as drf
    from lantern_tpu.models import transformer as tfm
    from lantern_tpu.ops.acceptance import LanternSpec
    from lantern_tpu.ops.sampling import LogitsWarp, cfg_combine
    from lantern_tpu.ops.quant import head_of as quant_head
    from lantern_tpu.ops.vq_distance import nearest_latents

    t_start = time.perf_counter()

    def note(m):
        print(f"[prof +{time.perf_counter() - t_start:6.1f}s] {m}",
              file=sys.stderr, flush=True)

    lumina = args.geom == "lumina"
    if lumina:
        GRID = 48
        MAX_NEW = GRID * (GRID + 1) + 1
        cfg = configs.chameleon_7b_config(max_seq_len=19 + MAX_NEW + 74,
                                          swin_norm=True)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sel = os.path.join(repo, "ckpts/bench_tree_lumina.json")
        tree_name = args.tree or (sel if os.path.exists(sel)
                                  else "chain_bush_8")
        prefix = args.prefix if args.prefix >= 0 else 1200
        quant = args.quant or "int8"
        kvq = (args.kv or "int8") == "int8"
    else:
        cfg = configs.llamagen_config(args.size, "t2i",
                                      image_tokens=args.tokens)
        tree_name = args.tree or "naive_extend_57"
        prefix = args.prefix if args.prefix >= 0 else 248
        quant = args.quant or "none"
        kvq = (args.kv or "bf16") == "int8"
    dcfg = configs.drafter_config(cfg, total_tokens=59, depth=4, top_k=10)
    tree = trees.get_tree(tree_name)
    note(f"geom={args.geom} tree={tree_name} ({tree.num_nodes} nodes) "
         f"weights={quant} kv={'int8' if kvq else 'bf16'} prefix={prefix}")
    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    with jax.default_device(cpu):
        params = tfm.init_params(jax.random.key(0), cfg)
        dparams = drf.init_drafter_params(jax.random.key(1), dcfg, params["embed"])
        cb = jax.random.normal(jax.random.key(3), (cfg.vocab_size, 8))
        params["nearest_latents"] = jnp.asarray(nearest_latents(cb, k=11))
        params = tfm.fuse_params(params)
        dparams = tfm.fuse_params(dparams)
        if quant == "int8":
            from lantern_tpu.ops.quant import quantize_params

            params = quantize_params(params)
            dparams = quantize_params(dparams)
    params = jax.device_put(params, dev)
    dparams = jax.device_put(dparams, dev)
    note("params on device")
    rope = tfm.make_rope_tables(cfg)
    drope = tfm.make_rope_tables(dcfg.model)
    warp = LogitsWarp(temperature=1.0, top_k=2000, top_p=1.0)

    plen = jnp.asarray(prefix, jnp.int32)
    base_kv = dataclasses.replace(KVCache.create(cfg, 2, quantized=kvq),
                                  length=plen)
    draft_kv = dataclasses.replace(KVCache.create(dcfg.model, 2), length=plen)

    N1 = tree.num_nodes
    attn_mask = np.asarray(tree.attn_mask)
    depth_arr = np.asarray(tree.depth)
    D = np.asarray(tree.retrieve_indices).shape[1]

    # --- tunnel round-trip baseline (jit dispatch + tiny fetch) ---
    @jax.jit
    def trivial(x):
        return x + 1
    x0 = jax.device_put(jnp.zeros((), jnp.float32), dev)
    np.asarray(trivial(x0))
    t0 = time.perf_counter()
    REP = 5
    for _ in range(REP):
        x0 = trivial(x0)
        np.asarray(x0)
    rt = (time.perf_counter() - t0) / REP
    print(f"{'tunnel round-trip':28s} {rt * 1e3:8.3f} ms", flush=True)

    results = {}

    def timed(name, fn, *xs):
        note(f"compiling {name}")
        np.asarray(fn(*xs))          # compile + warm
        t0 = time.perf_counter()
        np.asarray(fn(*xs))
        dt = (time.perf_counter() - t0 - rt) / ITERS
        results[name] = dt * 1e3
        print(f"{name:28s} {dt * 1e3:8.3f} ms/iter", flush=True)

    # 1. base AR forward (2-row CFG pair, 1 token)
    @jax.jit
    def loop_ar_fwd(params, kv):
        # loop-carried token <- previous hidden: defeats XLA loop-invariant
        # hoisting, which would otherwise compute the body once
        def body(carry, _):
            kv, tok = carry
            res = tfm.forward(params, cfg, tfm.token_embed(params, tok), kv,
                              positions=kv.length + jnp.zeros((1,), jnp.int32),
                              rope=rope, commit=False)
            tok2 = (res.hidden[:, -1:, 0].astype(jnp.int32) % cfg.vocab_size)
            return (res.kv, jnp.abs(tok2)), res.hidden[0, -1, 0]
        _, h = jax.lax.scan(body, (kv, jnp.zeros((2, 1), jnp.int32)), None,
                            length=ITERS)
        return h.sum()
    timed("base AR fwd (2x1 tok)", loop_ar_fwd, params, base_kv)

    # 2. tree verify forward (58 nodes x 2 rows)
    @jax.jit
    def loop_tree_fwd(params, kv):
        def body(carry, _):
            kv, t = carry
            tok2 = jnp.broadcast_to(t, (2, N1))
            res = tfm.forward(params, cfg, tfm.token_embed(params, tok2), kv,
                              positions=depth_arr + kv.length, rope=rope,
                              block_mask=attn_mask, commit=False)
            t2 = jnp.abs(res.hidden[0, -1, 0].astype(jnp.int32)) % cfg.vocab_size
            return (res.kv, t2), res.hidden[0, -1, 0]
        _, h = jax.lax.scan(body, (kv, jnp.zeros((), jnp.int32)), None,
                            length=ITERS)
        return h.sum()
    timed("tree fwd (58x2)", loop_tree_fwd, params, base_kv)

    # 2b. + lm_head + cfg combine
    @jax.jit
    def loop_tree_fwd_head(params, kv):
        def body(carry, _):
            kv, t = carry
            tok2 = jnp.broadcast_to(t, (2, N1))
            res = tfm.forward(params, cfg, tfm.token_embed(params, tok2), kv,
                              positions=depth_arr + kv.length, rope=rope,
                              block_mask=attn_mask, commit=False)
            lg = cfg_combine(tfm.logits_head(params, res.hidden), 3.0)[0]
            t2 = jnp.argmax(lg[-1]).astype(jnp.int32)
            return (res.kv, t2), lg[0, 0]
        _, h = jax.lax.scan(body, (kv, jnp.zeros((), jnp.int32)), None,
                            length=ITERS)
        return h.sum()
    timed("tree fwd + head + cfg", loop_tree_fwd_head, params, base_kv)

    # 2c. dense-attention variants (flash kernel launch cost probe)
    import dataclasses as _dc
    cfg_dense = _dc.replace(cfg, use_flash_attention=False)

    @jax.jit
    def loop_ar_fwd_dense(params, kv):
        def body(carry, _):
            kv, tok = carry
            res = tfm.forward(params, cfg_dense, tfm.token_embed(params, tok), kv,
                              positions=kv.length + jnp.zeros((1,), jnp.int32),
                              rope=rope, commit=False)
            tok2 = (res.hidden[:, -1:, 0].astype(jnp.int32) % cfg.vocab_size)
            return (res.kv, jnp.abs(tok2)), res.hidden[0, -1, 0]
        _, h = jax.lax.scan(body, (kv, jnp.zeros((2, 1), jnp.int32)), None,
                            length=ITERS)
        return h.sum()
    timed("base AR fwd dense-attn", loop_ar_fwd_dense, params, base_kv)

    @jax.jit
    def loop_tree_fwd_dense(params, kv):
        def body(carry, _):
            kv, t = carry
            tok2 = jnp.broadcast_to(t, (2, N1))
            res = tfm.forward(params, cfg_dense, tfm.token_embed(params, tok2), kv,
                              positions=depth_arr + kv.length, rope=rope,
                              block_mask=attn_mask, commit=False)
            t2 = jnp.abs(res.hidden[0, -1, 0].astype(jnp.int32)) % cfg.vocab_size
            return (res.kv, t2), res.hidden[0, -1, 0]
        _, h = jax.lax.scan(body, (kv, jnp.zeros((), jnp.int32)), None,
                            length=ITERS)
        return h.sum()
    timed("tree fwd dense-attn", loop_tree_fwd_dense, params, base_kv)

    # 3. static draft (4 levels incl. lm_head + sampling)
    @jax.jit
    def loop_draft(params, dparams, dkv):
        hid0 = jnp.zeros((2, 1, cfg.hidden_size), cfg.jnp_dtype)

        def body(carry, rng):
            dkv, hid = carry
            d, dkv2 = drf.draft_static(dparams, dcfg, tree, drope, dkv, hid,
                                       quant_head(params), 3.0, warp, rng)
            hid2 = hid + d.ss_prob[0, 0].astype(hid.dtype)
            return (dkv2, hid2), d.ss_token[0, 0]
        _, t = jax.lax.scan(body, (dkv, hid0),
                            jax.random.split(jax.random.key(11), ITERS))
        return t.sum()
    timed("draft_static (4 levels)", loop_draft, params, dparams, draft_kv)

    # 4. drafter extend over accepted rows
    @jax.jit
    def loop_extend(dparams, dkv):
        tokD = jnp.zeros((2, D), jnp.int32)
        hidD0 = jnp.zeros((2, D, cfg.hidden_size), cfg.jnp_dtype)

        def body(carry, _):
            dkv, hidD = carry
            out, dkv2 = drf.extend(dparams, dcfg, drope, dkv, tokD, hidD,
                                   jnp.int32(0))
            return (dkv2, hidD + out[:, :, :1] * 0 + out[0, -1, 0]), out[0, -1, 0]
        _, h = jax.lax.scan(body, (dkv, hidD0), None, length=ITERS)
        return h.sum()
    timed("drafter extend", loop_extend, dparams, draft_kv)

    # 5. KV rollback (fused accept_path gather kernel — the engine passes
    # block_size=N1, spec.py:198; without it the take+write fallback runs)
    sel = jnp.arange(D, dtype=jnp.int32)

    @jax.jit
    def loop_accept(kv):
        def body(kv, _):
            kv2 = kv.accept_path(sel, jnp.int32(0), block_size=N1)
            return kv2, kv2.k[0, 0, 0, 0, 0]
        _, h = jax.lax.scan(body, kv, None, length=ITERS)
        return h.sum()
    timed("kv accept_path (fused)", loop_accept, base_kv)

    # 6. stochastic verify walk (the acceptance glue)
    children = np.asarray(tree.children)
    inlevel = np.asarray(tree.inlevel_rank)
    from lantern_tpu.ops import acceptance as acc
    V = cfg.vocab_size
    # level_probs rows: level 0 = root (1 row); level d = that level's
    # expansion rows (see drafter.draft_static)
    lp_shapes = [1] + [len(l.child_flat_idx) for l in tree.levels]
    level_probs = tuple(jnp.full((r, V), 1.0 / V, jnp.float32) for r in lp_shapes)

    @jax.jit
    def loop_verify(nearest, logits0):
        def body(carry, rng):
            logits = logits0 + carry
            path, alen, dist = acc.stochastic_verify_tree(
                rng, logits, jnp.zeros((N1,), jnp.int32), children,
                depth=tree.max_depth, warp=warp, nearest=nearest,
                lantern=LanternSpec(k=10, delta=5.0),
                node_q=jnp.full((N1,), 0.5, jnp.float32),
                level_probs=level_probs, node_level_row=inlevel)
            return carry + dist[0], alen
        _, a = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                            jax.random.split(jax.random.key(5), ITERS))
        return a.sum()
    logits0 = jax.random.normal(jax.random.key(6), (N1, V), jnp.float32)
    timed("stochastic_verify_tree", loop_verify,
          jax.device_put(params["nearest_latents"], dev),
          jax.device_put(logits0, dev))

    # 7. full fused spec step (counters reset so buffers never overflow)
    if os.environ.get("PROF_FULL_STEP", "1") == "1":
        warp_s = warp
        ecfg = spec.SpecDecodeConfig(
            warp=warp_s, cfg_scale=3.0,
            lantern=LanternSpec(k=10, delta=5.0),
            max_new=args.tokens, mode="static",
        )

        @jax.jit
        def loop_step(params, dparams, base_kv, draft_kv):
            ctx = spec._Ctx(params=params, dparams=dparams, rope=rope,
                            drope=drope, nearest=params["nearest_latents"],
                            prefix_valid=None, pos_offsets=None,
                            logits_mask=None, logits_fn=None)
            step_fn = spec.make_static_step(ecfg, cfg, dcfg, tree, ctx)
            hid = jnp.zeros((2, 1, cfg.hidden_size), cfg.jnp_dtype)
            d0, dkv = drf.draft_static(dparams, dcfg, tree, drope, draft_kv,
                                       hid, quant_head(params), 3.0, warp_s,
                                       jax.random.key(3))
            st = spec.SpecState(
                base_kv=base_kv, draft_kv=dkv, draft=d0,
                root_token=jnp.zeros((), jnp.int32),
                tokens=jnp.zeros((args.tokens + tree.path_len + 1,), jnp.int32),
                n_new=jnp.zeros((), jnp.int32),
                steps=jnp.zeros((), jnp.int32),
                accept_sum=jnp.zeros((), jnp.int32),
                rng=jax.random.key(4),
            )

            def body(st, _):
                st = step_fn(st)
                return st._replace(n_new=jnp.zeros((), jnp.int32)), st.accept_sum
            st, a = jax.lax.scan(body, st, None, length=ITERS)
            return a.sum()
        timed("FULL spec step", loop_step, params, dparams, base_kv, draft_kv)

    known = (results.get("tree fwd + head + cfg", 0)
             + results.get("draft_static (4 levels)", 0)
             + results.get("drafter extend", 0)
             + results.get("stochastic_verify_tree", 0)
             + results.get("kv accept_path", 0))
    print(f"{'sum of spec-step parts':28s} {known:8.3f} ms "
          f"(bench spec step adds verify walk + commit glue)", flush=True)


if __name__ == "__main__":
    main()
