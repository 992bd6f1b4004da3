"""Micro-benchmark the components of one speculative step on the real TPU.

Times, via jitted scan loops (so per-iteration host dispatch is amortized):
  1. base AR forward        (2-token CFG pair through the full model)
  2. base tree forward      (58-node tree block x2 through the full model)
  3. drafter draft_static   (depth-4 static tree draft incl. lm_head+sampling)
  4. full spec step         (verify + accept + rollback + redraft)
  5. full AR step           (forward + cfg + warp + sample)

Run:  python scripts/profile_step.py          (TPU)
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lantern_tpu import configs, trees
from lantern_tpu.engine import spec as spec_engine
from lantern_tpu.engine.spec import SpecDecodeConfig, _Ctx
from lantern_tpu.models import drafter as drf
from lantern_tpu.models import transformer as tfm
from lantern_tpu.kv import KVCache
from lantern_tpu.ops.acceptance import LanternSpec
from lantern_tpu.ops.sampling import LogitsWarp
from lantern_tpu.ops.vq_distance import nearest_latents

ITERS = int(os.environ.get("PROF_ITERS", 64))


def timed(name, fn, *args):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:28s} {dt:8.3f} ms/iter")
    return dt


def main():
    size = os.environ.get("BENCH_SIZE", "XL")
    cfg = configs.llamagen_config(size, "t2i", image_tokens=256)
    dcfg = configs.drafter_config(cfg, total_tokens=59, depth=4, top_k=10)
    tree = trees.get_tree("naive_extend_57")

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    with jax.default_device(cpu):
        params = tfm.init_params(jax.random.key(0), cfg)
        dparams = drf.init_drafter_params(jax.random.key(1), dcfg, params["embed"])
        cb = jax.random.normal(jax.random.key(3), (cfg.vocab_size, 8))
        params["nearest_latents"] = jnp.asarray(nearest_latents(cb, k=11))
    params = jax.device_put(params, tpu)
    dparams = jax.device_put(dparams, tpu)

    warp = LogitsWarp(temperature=1.0, top_k=2000, top_p=1.0)
    ecfg = SpecDecodeConfig(warp=warp, cfg_scale=3.0,
                            lantern=LanternSpec(k=10, delta=5.0),
                            max_new=256, mode="static")
    rope = tfm.make_rope_tables(cfg)
    drope = tfm.make_rope_tables(dcfg.model)
    ctx = _Ctx(params=params, dparams=dparams, rope=rope, drope=drope,
               nearest=params["nearest_latents"], prefix_valid=None,
               pos_offsets=None, logits_mask=None, logits_fn=None)

    cond = jax.random.normal(jax.random.key(2), (1, cfg.cls_token_num, cfg.caption_dim))
    uncond = params["cond"]["uncond"][None].astype(cond.dtype)

    # prefilled state for realistic cache contents
    state, _, _ = spec_engine.prefill_request(
        params, dparams, ecfg, cfg, dcfg, tree, cond, uncond, jax.random.key(9))
    jax.block_until_ready(state)
    print("prefilled; base len =", int(state.base_kv.length))

    N1 = len(tree.tree_indices)
    attn_mask = np.asarray(tree.attn_mask)
    depth_arr = np.asarray(tree.depth)

    # 1. bare base AR forward (2 tokens, committed append)
    @jax.jit
    def loop_ar_fwd(params, st):
        def body(carry, _):
            kv = carry
            tok = jnp.zeros((2, 1), jnp.int32)
            res = tfm.forward(params, cfg, tfm.token_embed(params, tok), kv,
                              positions=kv.length + jnp.zeros((1,), jnp.int32),
                              rope=rope, commit=False)
            return res.kv, res.hidden[:, -1, 0]
        kv = st.base_kv
        kv, h = jax.lax.scan(body, kv, None, length=ITERS)
        return h

    # 2. bare tree verify forward (58 nodes x2, provisional)
    @jax.jit
    def loop_tree_fwd(params, st):
        def body(carry, _):
            kv = carry
            tok2 = jnp.zeros((2, N1), jnp.int32)
            res = tfm.forward(params, cfg, tfm.token_embed(params, tok2), kv,
                              positions=depth_arr + kv.length, rope=rope,
                              block_mask=attn_mask, commit=False)
            return kv, res.hidden[:, -1, 0]
        kv, h = jax.lax.scan(body, st.base_kv, None, length=ITERS)
        return h

    # 2b. tree forward + lm_head + cfg combine
    @jax.jit
    def loop_tree_fwd_head(params, st):
        def body(carry, _):
            kv = carry
            tok2 = jnp.zeros((2, N1), jnp.int32)
            res = tfm.forward(params, cfg, tfm.token_embed(params, tok2), kv,
                              positions=depth_arr + kv.length, rope=rope,
                              block_mask=attn_mask, commit=False)
            lg = spec_engine.cfg_combine(
                tfm.logits_head(params, res.hidden), 3.0)[0]
            return kv, lg[0, 0]
        kv, h = jax.lax.scan(body, st.base_kv, None, length=ITERS)
        return h

    # 3. drafter static draft only
    @jax.jit
    def loop_draft(params, dparams, st):
        def body(carry, rng):
            dk, hid = carry
            d, dk2 = drf.draft_static(dparams, dcfg, tree, drope, dk, hid,
                                      params["lm_head"], 3.0, warp, rng)
            return (dk, hid), d.ss_token[0, 0]
        rngs = jax.random.split(jax.random.key(11), ITERS)
        hid = jnp.zeros((2, 1, cfg.hidden_size), cfg.jnp_dtype)
        _, toks = jax.lax.scan(body, (st.draft_kv, hid), rngs)
        return toks

    # 4. full spec step — params/dparams must be jit ARGUMENTS (captured
    # arrays inline as dense HLO constants: gigabytes for a real model)
    @jax.jit
    def loop_step(params, dparams, st):
        c = _Ctx(params=params, dparams=dparams, rope=rope, drope=drope,
                 nearest=params["nearest_latents"], prefix_valid=None,
                 pos_offsets=None, logits_mask=None, logits_fn=None)
        step_fn = spec_engine.make_static_step(ecfg, cfg, dcfg, tree, c)

        def body(carry, _):
            st = step_fn(carry)
            # reset counters so the token buffer never overflows
            return st._replace(n_new=jnp.zeros((), jnp.int32)), st.accept_sum
        st2, acc = jax.lax.scan(body, st, None, length=ITERS)
        return acc

    # 5. full AR step loop (forward+sample) via ar.generate on ITERS tokens
    from lantern_tpu.engine import ar

    def loop_ar_full():
        return ar.generate(params, cfg, cond, uncond, ITERS, 3.0, warp,
                           jax.random.key(13))

    t_ar_fwd = timed("base AR fwd (2 tok)", loop_ar_fwd, params, state)
    t_tree = timed("tree fwd (58x2)", loop_tree_fwd, params, state)
    t_tree_h = timed("tree fwd + head + cfg", loop_tree_fwd_head, params, state)
    t_draft = timed("drafter draft_static d4", loop_draft, params, dparams, state)
    t_step = timed("full spec step", loop_step, params, dparams, state)
    r = loop_ar_full(); jax.block_until_ready(r.tokens)
    t0 = time.perf_counter(); r = loop_ar_full(); jax.block_until_ready(r.tokens)
    t_arf = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{'full AR step (ar.generate)':28s} {t_arf:8.3f} ms/iter")

    print()
    print(f"head+cfg cost        : {t_tree_h - t_tree:6.3f} ms")
    print(f"accept+rollback+misc : {t_step - t_tree_h - t_draft:6.3f} ms")
    print(f"AR overhead vs fwd   : {t_arf - t_ar_fwd:6.3f} ms")


if __name__ == "__main__":
    main()
