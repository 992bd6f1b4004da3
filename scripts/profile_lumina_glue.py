"""Isolated timing of the Lumina spec step's GLUE at bench vocab (V=65536).

The r4 Lumina step breakdown (PERF.md) attributes ~3.4 ms/step to "glue the
isolated probes don't see" — candidate gathers, FSM masking, stale-draft
sampling, the acceptance walk, bonus sampling.  None of those ops touch the
7B weights, so this probe times them on-chip at exact bench shapes (ne39
tree, V=65536, LANTERN k=10 d=5) WITHOUT the 240-460 s param transfer the
full-lane probes pay.  Each component runs as a jitted lax.scan of --iters
iterations (one remote call, amortized), mirroring scripts/profile_step.py's
measurement rules for this remote-TPU relay (async dispatch; only a host
fetch blocks).

Usage: python scripts/profile_lumina_glue.py [--iters 256] [--tree PATH]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=256)
    ap.add_argument("--tree", default=None)
    ap.add_argument("--grid", type=int, default=48)
    args = ap.parse_args()
    ITERS = args.iters

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lantern_tpu import trees
    from lantern_tpu.models import chameleon as cham
    from lantern_tpu.models import drafter as drf
    from lantern_tpu.ops import acceptance as acc
    from lantern_tpu.ops.sampling import (LogitsWarp, sample_without_replacement,
                                          warp_logits)
    from lantern_tpu.ops.vq_distance import nearest_latents

    t_start = time.perf_counter()

    def note(m):
        print(f"[glue +{time.perf_counter() - t_start:6.1f}s] {m}",
              file=sys.stderr, flush=True)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sel = os.path.join(repo, "ckpts/bench_tree_lumina.json")
    tree = trees.get_tree(args.tree or (sel if os.path.exists(sel)
                                        else "chain_bush_8"))
    V = 65536
    GRID = args.grid
    N1 = tree.num_nodes
    K = tree.topk
    warp = LogitsWarp(temperature=1.0, top_k=2000, top_p=1.0)
    fsm = cham.LuminaGridFSM(w=GRID, h=GRID, image_start_idx=16, vocab_size=V)
    note(f"tree {N1} nodes depth {tree.max_depth} topk {K}; V={V}")

    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    with jax.default_device(cpu):
        cb = jax.random.normal(jax.random.key(3), (8192, 8))
        near = np.asarray(nearest_latents(cb, k=11))
        nearest = jnp.asarray(cham.shift_nearest_table(near, V))
    nearest = jax.device_put(nearest, dev)
    logits0 = jax.device_put(
        jax.random.normal(jax.random.key(6), (N1, V), jnp.float32), dev)
    note("tables on device")

    # --- tunnel round-trip baseline ---
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
    print(f"{'tunnel round-trip':34s} {rt * 1e3:8.3f} ms", flush=True)

    results = {}

    def timed(name, fn, *xs):
        note(f"compiling {name}")
        np.asarray(fn(*xs))
        t0 = time.perf_counter()
        np.asarray(fn(*xs))
        dt = (time.perf_counter() - t0 - rt) / ITERS
        results[name] = dt * 1e3
        print(f"{name:34s} {dt * 1e3:8.3f} ms/iter", flush=True)

    length0 = jnp.asarray(1200, jnp.int32)

    # 1. draft_stale: the full drafter-free draft (warp+gumbel topk per level)
    @jax.jit
    def loop_stale(lg):
        def body(carry, rng):
            d = drf.draft_stale(tree, lg[0] + carry, length0, warp, rng,
                                logits_fn=fsm)
            return carry + d.ss_prob[0, 0], d.ss_token[0, 0]
        _, t = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                            jax.random.split(jax.random.key(1), ITERS))
        return t.sum()
    timed("draft_stale (full)", loop_stale, logits0)

    # 1b. minus FSM
    @jax.jit
    def loop_stale_nofsm(lg):
        def body(carry, rng):
            d = drf.draft_stale(tree, lg[0] + carry, length0, warp, rng)
            return carry + d.ss_prob[0, 0], d.ss_token[0, 0]
        _, t = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                            jax.random.split(jax.random.key(1), ITERS))
        return t.sum()
    timed("draft_stale (no FSM)", loop_stale_nofsm, logits0)

    # 2. single-row warp (the 32-pass top-2000 threshold search)
    @jax.jit
    def loop_warp1(lg):
        def body(carry, _):
            w = warp_logits(lg[:1] + carry, warp)
            return w[0, 0], w[0, 1]
        _, t = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=ITERS)
        return t.sum()
    timed("warp_logits [1,V] top2000", loop_warp1, logits0)

    # 2b. batched warp over all N1 rows
    @jax.jit
    def loop_warpN(lg):
        def body(carry, _):
            w = warp_logits(lg + carry, warp)
            return w[0, 0], w[0, 1]
        _, t = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=ITERS)
        return t.sum()
    timed(f"warp_logits [{N1},V] top2000", loop_warpN, logits0)

    # 3. sample_without_replacement (gumbel + lax.top_k k=10) at level width
    rows = max(len(l.child_flat_idx) for l in tree.levels)
    probs0 = jax.device_put(jnp.full((rows, V), 1.0 / V, jnp.float32), dev)

    @jax.jit
    def loop_swr(p):
        def body(carry, rng):
            idx, q = sample_without_replacement(rng, p + carry, K)
            return carry + q[0, 0] * 0.0, idx[0, 0]
        _, t = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                            jax.random.split(jax.random.key(2), ITERS))
        return t.sum()
    timed(f"sample_wo_repl [{rows},V] k={K}", loop_swr, probs0)

    # 3b. lax.top_k alone at the same shape
    @jax.jit
    def loop_topk(p):
        def body(carry, _):
            v, i = jax.lax.top_k(p + carry, K)
            return carry + v[0, 0] * 0.0, i[0, 0]
        _, t = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=ITERS)
        return t.sum()
    timed(f"lax.top_k [{rows},V] k={K}", loop_topk, probs0)

    # 4. FSM over the verify block [N1, V]
    @jax.jit
    def loop_fsm(lg):
        pos = jnp.asarray(np.asarray(tree.depth), jnp.int32)

        def body(carry, _):
            out = fsm(lg + carry, pos + length0)
            return out[0, 0] * 0.0 + carry + 1.0, out[0, 1]
        _, t = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=ITERS)
        return t.sum()
    timed(f"FSM mask [{N1},V]", loop_fsm, logits0)

    # 5. acceptance walk (multidraft, LANTERN k=10 d=5) — bench config
    children = np.asarray(tree.children)
    inlevel = np.asarray(tree.inlevel_rank)
    lp_shapes = [1] + [len(l.child_flat_idx) for l in tree.levels]
    level_probs = tuple(jnp.full((r, V), 1.0 / V, jnp.float32)
                        for r in lp_shapes)

    @jax.jit
    def loop_walk(nearest, lg):
        def body(carry, rng):
            path, alen, dist = acc.stochastic_verify_tree(
                rng, lg + carry, jnp.zeros((N1,), jnp.int32), children,
                depth=tree.max_depth, warp=warp, nearest=nearest,
                lantern=acc.LanternSpec(k=10, delta=5.0),
                node_q=jnp.full((N1,), 0.5, jnp.float32),
                level_probs=level_probs, node_level_row=inlevel)
            return carry + dist[0], alen
        _, a = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                            jax.random.split(jax.random.key(5), ITERS))
        return a.sum()
    timed("stochastic_verify_tree", loop_walk, nearest, logits0)

    # 6. bonus categorical over [V]
    @jax.jit
    def loop_bonus(lg):
        def body(carry, rng):
            d = jax.nn.softmax(lg[0] + carry)
            tok = jax.random.categorical(rng, jnp.log(jnp.maximum(d, 1e-30)))
            return carry + tok.astype(jnp.float32) * 0.0, tok
        _, t = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                            jax.random.split(jax.random.key(7), ITERS))
        return t.sum()
    timed("bonus softmax+categorical [V]", loop_bonus, logits0)

    # 7. gumbel noise generation at the biggest level shape
    @jax.jit
    def loop_gumbel(p):
        def body(carry, rng):
            u = jax.random.uniform(rng, p.shape, minval=1e-20, maxval=1.0)
            g = -jnp.log(-jnp.log(u))
            return carry + g[0, 0] * 0.0, g[0, 0]
        _, t = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                            jax.random.split(jax.random.key(8), ITERS))
        return t.sum()
    timed(f"gumbel noise [{rows},V]", loop_gumbel, probs0)

    glue = (results.get("draft_stale (full)", 0)
            + results.get("stochastic_verify_tree", 0)
            + results.get(f"FSM mask [{N1},V]", 0)
            + results.get("bonus softmax+categorical [V]", 0))
    print(f"{'sum: draft+walk+FSM+bonus':34s} {glue:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
