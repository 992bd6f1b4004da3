"""Benchmark driver: speculative vs vanilla AR decode throughput on one chip.

Emits one JSON line per lane,
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}
with the NORTH-STAR lane (Lumina-mGPT-7B-class geometry, BASELINE.json)
printed LAST so the driver records it as the headline.  The XL lane mirrors
the reference's official LlamaGen operating point (run.sh:3-17):
LlamaGen-XL-class t2i geometry (36L x 1280h, vocab 16384, bf16), 256 image
tokens, calibrated static tree, sampling (temperature 1.0, top-k 2000),
EAGLE-1 multi-draft verification with LANTERN relaxed acceptance (k=10,
delta=5 multiplicative).  vs_baseline = wall-clock speedup over the vanilla
CFG AR loop on the same model.

Lane selection: BENCH_GEOM=lumina|xl runs one lane in-process; default runs
both as budget-guarded subprocesses (BENCH_BUDGET seconds, default 840).

No public LANTERN checkpoints ship in this zero-egress environment, so
weights are random: per-step costs match the real model exactly, while
step_compression is what the acceptance rule yields for an untrained
(hidden-passthrough) drafter — a lower bound on the trained-drafter number.
"""

from __future__ import annotations

import json
import time


def main():
    """Orchestrator: run BOTH lanes as guarded subprocesses under a wall-clock
    budget, and print the Lumina north-star line LAST (the driver records the
    final JSON line as the headline).  Round-3 postmortem: the XL lane ran
    first in-process and its cold remote compiles ate the driver timeout, so
    the round recorded no Lumina measurement at all (BENCH_r03 rc=124).  Lane
    order is now north-star-first, each lane has its own timeout, and the
    compiled-Mosaic kernel selftest runs at the END — a selftest failure
    exits nonzero (loud) but can no longer starve the measurement."""
    import os
    import signal
    import subprocess
    import sys

    t_start = time.perf_counter()
    budget = float(os.environ.get("BENCH_BUDGET", 1000))

    def note(msg):
        print(f"[bench +{time.perf_counter() - t_start:6.1f}s] {msg}",
              file=sys.stderr, flush=True)

    def remaining():
        return budget - (time.perf_counter() - t_start)

    def run_lane(geom, timeout):
        """Run one lane as a subprocess; returns its JSON lines (stdout).
        stderr is inherited so lane notes stream into the driver tail."""
        env = dict(os.environ, BENCH_GEOM=geom)
        try:
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=env, stdout=subprocess.PIPE, text=True,
                               timeout=timeout)
            lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
            if r.returncode != 0:
                note(f"{geom} lane failed rc={r.returncode}")
            return lines
        except subprocess.TimeoutExpired as e:
            lines = [ln for ln in (e.stdout or "").splitlines()
                     if ln.startswith("{")]
            note(f"{geom} lane timed out after {timeout:.0f}s")
            return lines

    # --- compiled-Mosaic kernel parity FIRST, under a hard sub-budget -----
    # r4 postmortem: the selftest ran last, the lanes consumed the driver
    # budget, and the timeout was a benign stderr note — the round recorded
    # no on-chip kernel-parity evidence.  Now it runs first (small, compile-
    # cached after the first run), cannot starve the lanes (hard cap), and
    # its status is stamped into every lane's JSON extra so a timeout is
    # visible in the record, not just the tail.
    selftest = "skipped"

    # Kill-safety: the driver may SIGTERM the whole bench at ITS cap; any
    # lane line already computed must still reach stdout (lumina LAST =
    # headline).  r3 lost the entire record to exactly this.
    flushed = {"done": False}
    pending = {"xl": [], "lumina": []}

    def stamp(line):
        """Inject the selftest status into a lane's JSON extra."""
        try:
            obj = json.loads(line)
            obj.setdefault("extra", {})["selftest"] = selftest
            return json.dumps(obj)
        except Exception:  # noqa: BLE001
            return line

    def flush_lines():
        if flushed["done"]:
            return
        flushed["done"] = True
        for ln in pending["xl"]:
            print(stamp(ln), flush=True)
        for ln in pending["lumina"]:
            print(stamp(ln), flush=True)

    def on_term(signum, frame):
        note(f"signal {signum}: flushing computed lane lines before exit")
        flush_lines()
        sys.exit(124)
    signal.signal(signal.SIGTERM, on_term)

    if os.environ.get("BENCH_SELFTEST", "1") == "1":
        t_st = min(float(os.environ.get("BENCH_SELFTEST_TIMEOUT", 200)),
                   max(0.0, remaining() - 760))
        if t_st > 20:
            note(f"kernel selftest starting (timeout {t_st:.0f}s)")
            try:
                r = subprocess.run(
                    [sys.executable, "-m", "lantern_tpu.ops.pallas.selftest"],
                    cwd=os.path.dirname(os.path.abspath(__file__)),
                    stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                    text=True, timeout=t_st)
                if r.returncode != 0:
                    selftest = "FAIL"
                    note(f"KERNEL SELFTEST FAILED:\n{r.stdout[-800:]}")
                else:
                    selftest = "ok"
                    note("kernel selftest OK: "
                         f"{r.stdout.strip().splitlines()[-1]}")
            except subprocess.TimeoutExpired:
                selftest = "timeout"
                note("kernel selftest TIMED OUT (status recorded in JSON)")
        else:
            note("kernel selftest skipped: no budget headroom")

    # --- north-star lane first: Lumina-mGPT-7B-class geometry -------------
    if os.environ.get("BENCH_LUMINA", "1") == "1":
        # the lane's long pole is the lazy 7B param transfer over the remote
        # tunnel (measured 240-460 s run-to-run, independent of the compile
        # cache); give the headline lane room before the XL lane competes
        t_lum = min(float(os.environ.get("BENCH_LUMINA_TIMEOUT", 730)),
                    remaining() - 30)
        note(f"lumina lane starting (timeout {t_lum:.0f}s)")
        pending["lumina"] = run_lane("lumina", t_lum)

    # --- XL lane second, only with budget left ----------------------------
    if os.environ.get("BENCH_XL", "1") == "1":
        t_xl = min(float(os.environ.get("BENCH_XL_TIMEOUT", 480)),
                   remaining() - 20)
        if t_xl > 60:
            note(f"XL lane starting (timeout {t_xl:.0f}s)")
            pending["xl"] = run_lane("xl", t_xl)
        else:
            note("XL lane skipped: budget exhausted")
    # XL first, Lumina LAST -> the parsed headline.  If the lumina lane
    # produced nothing, the XL line is the (fallback) headline.
    empty = not pending["xl"] and not pending["lumina"]
    flush_lines()
    if empty:
        note("no lane produced a JSON line")
        sys.exit(2)
    if selftest == "FAIL":
        sys.exit(3)   # lines already printed; rc flags the regression


def xl_main():
    import os
    import sys

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lantern_tpu import configs, trees
    from lantern_tpu.engine import ar, spec
    from lantern_tpu.models import drafter as drf
    from lantern_tpu.models import transformer as tfm
    from lantern_tpu.ops.acceptance import LanternSpec
    from lantern_tpu.ops.sampling import LogitsWarp
    from lantern_tpu.ops.vq_distance import nearest_latents

    t_start = time.perf_counter()

    def note(msg):
        print(f"[bench +{time.perf_counter() - t_start:6.1f}s] {msg}",
              file=sys.stderr, flush=True)

    IMAGE_TOKENS = int(os.environ.get("BENCH_TOKENS", 256))
    size = os.environ.get("BENCH_SIZE", "XL")
    LK = int(os.environ.get("BENCH_LANTERN_K", 10))
    LD = float(os.environ.get("BENCH_LANTERN_DELTA", 5.0))

    cfg = configs.llamagen_config(size, "t2i", image_tokens=IMAGE_TOKENS)
    drafter_ckpt_probe = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"ckpts/bench_drafter_{size}.npz",
    )
    d_layers = 1
    if os.path.exists(drafter_ckpt_probe):
        with np.load(drafter_ckpt_probe) as z0:
            if "num_layers" in z0.files:
                d_layers = int(z0["num_layers"])
    dcfg = configs.drafter_config(cfg, num_layers=d_layers,
                                  total_tokens=59, depth=4, top_k=10)
    # calibrated tree (scripts/optimize_bench_tree.py) beats the hand-made
    # shape when present; same 57-node budget either way.  Per-size file —
    # a shape calibrated for one model/drafter pair must not leak to another.
    tree_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             f"ckpts/bench_tree_{size}.json")
    tree_name = "naive_extend_57"
    if os.path.exists(tree_path) and os.environ.get("BENCH_TREE", "auto") != "fixed":
        # static-mode drafting follows the spec's own levels; dcfg's
        # total_tokens/depth only drive the dynamic mode and buffer pads
        tree = trees.get_tree(tree_path)
        tree_name = "calibrated"
    else:
        tree = trees.get_tree(tree_name)

    # init on host CPU then transfer: remote-compiling a dozen RNG kernels
    # over the TPU tunnel costs minutes; host init costs seconds
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    drafter_ckpt = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"ckpts/bench_drafter_{size}.npz",
    )
    trained = os.path.exists(drafter_ckpt)
    # W8A16: halve the bytes streamed per decode step (ops/quant.py).  Both
    # the AR baseline and the spec engine run the same quantized model, so
    # vs_baseline stays an apples-to-apples acceptance/engine speedup.
    QUANT = os.environ.get("BENCH_QUANT", "int8")
    if QUANT not in ("int8", "none"):
        raise SystemExit(f"BENCH_QUANT must be 'int8' or 'none', got {QUANT!r}")

    def build_host_params(quant=QUANT):
        with jax.default_device(cpu):
            params = tfm.init_params(jax.random.key(0), cfg)
            dparams = drf.init_drafter_params(jax.random.key(1), dcfg,
                                              params["embed"])
            # prefer a self-distilled drafter
            # (scripts/prepare_bench_drafter.py); fall back to a
            # hidden-passthrough untrained one
            if trained:
                z = np.load(drafter_ckpt)
                dt_ = cfg.jnp_dtype
                dparams["fc_w"] = jnp.asarray(z["fc_w"], dt_)
                dparams["fc_b"] = jnp.asarray(z["fc_b"], dt_)
                dparams["layers"] = {
                    k[len("layers."):]: jnp.asarray(z[k], dt_)
                    for k in z.files if k.startswith("layers.")
                }
                note(f"loaded trained drafter {drafter_ckpt}")
            else:
                H = cfg.hidden_size
                fc = np.zeros((2 * H, H), np.float32)
                fc[H:] = np.eye(H)   # passthrough: input is [embed, hidden]
                dparams["fc_w"] = jnp.asarray(fc, dtype=cfg.jnp_dtype)
                dparams["layers"] = jax.tree.map(lambda a: a * 0,
                                                 dparams["layers"])
            # VQ nearest-latent table (LANTERN relaxed accept)
            cb = jax.random.normal(jax.random.key(3), (cfg.vocab_size, 8))
            params["nearest_latents"] = jnp.asarray(
                nearest_latents(cb, k=LK + 1))
            # fused QKV / gate-up layouts: fewer, longer weight streams per
            # layer; fuse AND quantize on host — doing either on the remote
            # TPU backend round-trips the weights through the tunnel
            params = tfm.fuse_params(params)
            dparams = tfm.fuse_params(dparams)
            if quant == "int8":
                from lantern_tpu.ops.quant import quantize_params

                params = quantize_params(params)
                dparams = quantize_params(dparams)
        return params, dparams

    tag = (f"xl_{size}_{IMAGE_TOKENS}_{QUANT}_k{LK}_"
           + (f"tr{int(os.path.getmtime(drafter_ckpt))}" if trained
              else "pass") + "_v1")
    params, dparams = _host_param_cache(tag, build_host_params, note)
    params = jax.device_put(params, tpu)
    dparams = jax.device_put(dparams, tpu)

    cond = jax.random.normal(jax.random.key(2), (1, cfg.cls_token_num, cfg.caption_dim))
    uncond = params["cond"]["uncond"][None].astype(cond.dtype)

    warp = LogitsWarp(temperature=1.0, top_k=2000, top_p=1.0)
    note(f"params built ({size}, {IMAGE_TOKENS} tokens)")

    def force(res):
        np.asarray(res.tokens)
        return res

    KVQ = os.environ.get("BENCH_KV", "none") == "int8"

    def run_ar(seed):
        return force(ar.generate(params, cfg, cond, uncond, IMAGE_TOKENS, 3.0,
                                 warp, jax.random.key(seed), kv_quant=KVQ))

    def make_spec(lantern):
        ecfg = spec.SpecDecodeConfig(
            warp=warp, cfg_scale=3.0, lantern=lantern,
            max_new=IMAGE_TOKENS, mode="static", kv_quant=KVQ,
            walk_batch_warp=True,   # pinned (advisor r4): one batched warp
            # carry the tree block, commit accepted rows pre-scan next step
            # (kills the per-step accept_path rollback kernel; token-exact)
            deferred_commit=os.environ.get("BENCH_XL_DEFER", "1") == "1",
        )

        def run(seed):
            return force(spec.generate(params, dparams, ecfg, cfg, dcfg, tree,
                                       cond, uncond, jax.random.key(seed)))
        return run

    run_strict = make_spec(LanternSpec())
    run_lantern = make_spec(LanternSpec(k=LK, delta=LD))

    # the headline JSON line must survive an int8-path compile failure on
    # this backend: fall back to bf16 weights and recompile once
    try:
        run_ar(7)
        note("AR compiled")
    except Exception as e:  # noqa: BLE001
        if QUANT == "none":
            raise
        note(f"int8 compile failed ({type(e).__name__}: {e}); "
             "falling back to bf16 weights")
        QUANT = "none"
        hp, hd_ = build_host_params(quant="none")   # rare path: rebuild bf16
        params = jax.device_put(hp, tpu)
        dparams = jax.device_put(hd_, tpu)
        uncond = params["cond"]["uncond"][None].astype(cond.dtype)
        run_ar(7)
        note("AR compiled (bf16)")
    run_strict(7)
    note("strict spec compiled")
    sres = run_lantern(7)
    note("lantern spec compiled")

    t0 = time.perf_counter(); run_ar(8); t_ar = time.perf_counter() - t0
    t0 = time.perf_counter(); st = run_strict(8); t_strict = time.perf_counter() - t0
    t0 = time.perf_counter(); sres = run_lantern(8); t_spec = time.perf_counter() - t0
    note(f"timed: ar={t_ar:.2f}s strict={t_strict:.2f}s lantern={t_spec:.2f}s")

    toks_per_s = IMAGE_TOKENS / t_spec
    ar_toks_per_s = IMAGE_TOKENS / t_ar
    sc = float(sres.accept_sum) / max(1.0, float(sres.steps))

    # --- continuous-batching throughput (the serving-engine multiplier) ---
    # Two measured points (PERF.md "batched-serving economics"): the spec
    # engine with the slot-count-appropriate small tree, and lockstep
    # batched AR with int8 KV (the measured best at high slot counts —
    # speculation's per-token FLOP multiplier loses to weight-stream
    # amortization as R grows).  Guarded: any failure here must not lose
    # the headline JSON line.
    batched_spec_tps = batched_ar_tps = None
    R = int(os.environ.get("BENCH_SLOTS", 8))
    R_AR = int(os.environ.get("BENCH_AR_SLOTS", 16))
    try:
        if R > 1:
            from lantern_tpu.engine.batch import BatchedEngine

            # policy-selected shape for this R; int8 KV to match the batched
            # AR phase below — the r2/r3 benches ran spec with bf16 KV
            # against int8-KV AR, rigging the comparison against speculation
            from lantern_tpu.engine.policy import serving_plan

            _, btree_name = serving_plan(R, geometry="llamagen_xl")
            btree = trees.get_tree(btree_name or "chain_bush_8")
            ecfg_b = spec.SpecDecodeConfig(
                warp=warp, cfg_scale=3.0, lantern=LanternSpec(k=LK, delta=LD),
                max_new=IMAGE_TOKENS, mode="static", kv_quant=True,
            )
            eng = BatchedEngine(ecfg_b, cfg, dcfg, btree, params, dparams,
                                num_slots=R)

            def run_batched(seed):
                reqs = [eng.prefill(cond, uncond, jax.random.key(seed + i))
                        for i in range(R)]
                batch = eng.empty_batch(reqs[0])
                for i, r in enumerate(reqs):
                    batch = eng.insert(batch, i, r)
                while True:
                    batch = eng.step_many(batch, 24)
                    n_new, _, _ = eng.slot_status(batch)
                    if (n_new >= IMAGE_TOKENS).all():
                        return batch

            run_batched(700)
            note(f"batched spec engine compiled (R={R})")
            t0 = time.perf_counter()
            run_batched(900)
            t_batched = time.perf_counter() - t0
            batched_spec_tps = R * IMAGE_TOKENS / t_batched
            note(f"batched spec: {batched_spec_tps:.1f} tok/s over {R} slots")
    except Exception as e:  # noqa: BLE001
        note(f"batched spec phase skipped: {type(e).__name__}: {e}")
    try:
        if R_AR > 1:
            conds = jnp.broadcast_to(cond, (R_AR,) + cond.shape)
            rngs = jax.vmap(jax.random.key)(
                jnp.arange(R_AR, dtype=jnp.uint32))

            def run_bar():
                toks = ar.generate_many(params, cfg, conds, uncond,
                                        IMAGE_TOKENS, 3.0, warp, rngs,
                                        kv_quant=True)
                np.asarray(toks)

            run_bar()
            note(f"batched AR compiled (R={R_AR}, int8 KV)")
            t0 = time.perf_counter()
            run_bar()
            batched_ar_tps = R_AR * IMAGE_TOKENS / (time.perf_counter() - t0)
            note(f"batched AR: {batched_ar_tps:.1f} tok/s over {R_AR} slots")
    except Exception as e:  # noqa: BLE001
        note(f"batched AR phase skipped: {type(e).__name__}: {e}")
    batched_tps = max(filter(None, (batched_spec_tps, batched_ar_tps)),
                      default=None)
    # frozen-reference ratio (scripts/record_pinned_baseline.py): measured
    # once against bf16 vanilla AR and committed, so progress is visible
    # without the moving-own-AR denominator
    pinned = None
    pin_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "ckpts/pinned_baseline.json")
    if os.path.exists(pin_path) and size == "XL" and IMAGE_TOKENS == 256:
        with open(pin_path) as f:
            pinned = json.load(f)["tokens_per_s"]
    out = {
        "metric": (
            f"image_tokens_per_s_per_chip (LlamaGen-{size} t2i {IMAGE_TOKENS}tok, "
            f"EAGLE-1 static tree + LANTERN k={LK} d={LD}, sampling, "
            + ("self-distilled drafter)" if trained else "untrained drafter)")
        ),
        "value": round(toks_per_s, 2),
        "unit": "tokens/s",
        "vs_baseline": round(toks_per_s / ar_toks_per_s, 3),
        "extra": {
            "ar_tokens_per_s": round(ar_toks_per_s, 2),
            "strict_tokens_per_s": round(IMAGE_TOKENS / t_strict, 2),
            "step_compression_lantern": round(sc, 3),
            "step_compression_strict": round(
                float(st.accept_sum) / max(1.0, float(st.steps)), 3),
            "verify_steps_per_s": round(float(sres.steps) / t_spec, 2),
            "batched_tokens_per_s": (round(batched_tps, 2)
                                     if batched_tps else None),
            "batched_slots": (R if batched_tps == batched_spec_tps else R_AR)
            if batched_tps else None,
            "batched_spec_tokens_per_s": (round(batched_spec_tps, 2)
                                          if batched_spec_tps else None),
            "batched_ar_tokens_per_s": (round(batched_ar_tps, 2)
                                        if batched_ar_tps else None),
            "pinned_ar_tokens_per_s": pinned,
            "vs_pinned_ar": (round(toks_per_s / pinned, 3)
                             if pinned else None),
            "weights": QUANT + (
                ":" + os.environ.get("LANTERN_INT8_IMPL", "xla")
                if QUANT == "int8" else ""),
            "kv": "int8" if KVQ else "bf16",
            "tree": tree_name,
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(out), flush=True)


def _host_param_cache(tag, build, note):
    """Host-side pytree disk cache for bench params.

    Building the 7B-class random pytree (init + fuse + int8 quantize on 4
    host cores) costs ~240 s per lane run — a third of the lane's driver
    budget — and is bit-deterministic from the seed, so the finished host
    pytree is pickled once under ~/.cache and reloaded afterwards.  Purely a
    bench-startup optimization: the measured engine sees identical arrays.
    Set BENCH_PARAM_CACHE=0 to disable."""
    import os
    import pickle

    if os.environ.get("BENCH_PARAM_CACHE", "1") != "1":
        return build()
    d = os.environ.get("BENCH_PARAM_CACHE_DIR",
                       os.path.expanduser("~/.cache/lantern_bench"))
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, tag + ".pkl")
    if os.path.exists(path):
        t = time.perf_counter()
        with open(path, "rb") as f:
            out = pickle.load(f)
        note(f"host params loaded from cache ({time.perf_counter() - t:.0f}s)")
        return out
    out = build()
    import jax
    import numpy as np

    host = jax.tree.map(np.asarray, out)
    with open(path, "wb") as f:
        pickle.dump(host, f, protocol=5)
    note(f"host params cached to {path}")
    return out


def lumina_main():
    """Lumina-mGPT-7B-class bench: the KV-bound operating point (2353-token
    images, reference max_gen_len 2354 — entrypoints/generate_images.py:
    210-218) where the flash tree-attention kernel and the int8 KV cache do
    their work.  Emits its own JSON line after the headline LlamaGen line."""
    import os
    import sys

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lantern_tpu import configs, trees
    from lantern_tpu.engine import ar, spec
    from lantern_tpu.models import chameleon as cham
    from lantern_tpu.models import drafter as drf
    from lantern_tpu.models import transformer as tfm
    from lantern_tpu.ops.acceptance import LanternSpec
    from lantern_tpu.ops.sampling import LogitsWarp
    from lantern_tpu.ops.vq_distance import nearest_latents

    t_start = time.perf_counter()

    def note(msg):
        print(f"[bench-lumina +{time.perf_counter() - t_start:6.1f}s] {msg}",
              file=sys.stderr, flush=True)

    GRID = int(os.environ.get("BENCH_LUMINA_GRID", 48))
    MAX_NEW = GRID * (GRID + 1) + 1                      # 2353 at 48x48
    LK = int(os.environ.get("BENCH_LANTERN_K", 10))
    LD = float(os.environ.get("BENCH_LANTERN_DELTA", 5.0))
    TEXT = list(range(60000, 60016))                     # 16 text tokens

    prompt_len = len(TEXT) + 3
    cfg = configs.chameleon_7b_config(
        max_seq_len=prompt_len + MAX_NEW + 74, swin_norm=True)
    import dataclasses as _dc

    if "BENCH_LUMINA_LAYERS" in os.environ:     # scaled-down smoke runs
        cfg = _dc.replace(cfg, num_layers=int(os.environ["BENCH_LUMINA_LAYERS"]),
                          hidden_size=int(os.environ.get("BENCH_LUMINA_H", 4096)),
                          intermediate_size=int(os.environ.get("BENCH_LUMINA_I", 11008)),
                          num_heads=int(os.environ.get("BENCH_LUMINA_H", 4096)) // 128,
                          num_kv_heads=int(os.environ.get("BENCH_LUMINA_H", 4096)) // 128)
    # default DENSE attention: measured A/B at this geometry (r4) — dense
    # 118.5 tok/s vs flash 104.0, AR 62.5 vs 56.9 (32 per-layer Mosaic
    # launches cost more than the full-buffer reads they avoid at S~2.4K;
    # PERF.md "Lumina step breakdown").  Flash stays the default for batched
    # serving, where per-slot KV traffic dominates.
    if os.environ.get("BENCH_LUMINA_FLASH", "0") == "0":
        cfg = _dc.replace(cfg, use_flash_attention=False)

    # self-distilled drafter (scripts/prepare_lumina_drafter.py); fall back
    # to the hidden-passthrough stand-in when absent
    drafter_ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "ckpts/bench_drafter_lumina.npz")
    trained = os.path.exists(drafter_ckpt)
    d_layers = 1
    if trained:
        with np.load(drafter_ckpt) as z0:
            if "num_layers" in z0.files:
                d_layers = int(z0["num_layers"])

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    dcfg = configs.drafter_config(cfg, num_layers=d_layers,
                                  total_tokens=59, depth=4, top_k=10)

    def build_host_params():
        with jax.default_device(cpu):
            params = tfm.init_params(jax.random.key(0), cfg)
            dparams = drf.init_drafter_params(jax.random.key(101), dcfg,
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
                note(f"loaded trained drafter {drafter_ckpt}")
            else:
                # hidden-passthrough drafter — the MEASURED-OPTIMAL drafter
                # for a random-weight base, not a stand-in: the round-3
                # recipe matrix (PERF.md "Lumina drafter study") scored it
                # above every trained variant (1.957 vs 1.03-1.05 at this
                # geometry; 3.07 vs 2.47-2.93 at a trainable tiny replica).
                # A trained npz, when present (real-weight deployments),
                # still takes precedence — and disables stale_draft below.
                H = cfg.hidden_size
                fc = np.zeros((2 * H, H), np.float32)
                fc[H:] = np.eye(H)   # input is [embed, hidden]
                dparams["fc_w"] = jnp.asarray(fc, dtype=cfg.jnp_dtype)
                dparams["layers"] = jax.tree.map(lambda a: a * 0,
                                                 dparams["layers"])
            cb = jax.random.normal(jax.random.key(3), (8192, 8))
            near = np.asarray(nearest_latents(cb, k=LK + 1))
            params["nearest_latents"] = jnp.asarray(
                cham.shift_nearest_table(near, cfg.vocab_size))
            params = tfm.fuse_params(params)
            dparams = tfm.fuse_params(dparams)
            from lantern_tpu.ops.quant import quantize_params

            params = quantize_params(params)
            dparams = quantize_params(dparams)
        return params, dparams

    tag = (f"lumina_L{cfg.num_layers}_H{cfg.hidden_size}"
           f"_I{cfg.intermediate_size}_k{LK}_"
           + (f"tr{int(os.path.getmtime(drafter_ckpt))}" if trained
              else "pass") + "_v1")
    params, dparams = _host_param_cache(tag, build_host_params, note)
    params = jax.device_put(params, tpu)
    dparams = jax.device_put(dparams, tpu)
    note("7B-class params on device (int8)")

    warp = LogitsWarp(temperature=1.0, top_k=2000, top_p=1.0)
    tp = cham.lumina_token_prompt(TEXT, grid=(GRID, GRID))
    fsm = cham.LuminaGridFSM(w=GRID, h=GRID, image_start_idx=len(TEXT),
                             vocab_size=cfg.vocab_size)
    KVQ = os.environ.get("BENCH_KV_LUMINA", "int8") == "int8"
    # measured-winner tree (scripts/select_lumina_tree.py) when present; at
    # 7B-class geometry the trade is compression vs per-step MXU rows, so
    # the shape is picked by wall clock, not by hand (PERF.md economics)
    sel_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "ckpts/bench_tree_lumina.json")
    TREE = os.environ.get("BENCH_LUMINA_TREE", "")
    if not TREE:
        TREE = sel_path if os.path.exists(sel_path) else "chain_bush_8"
    tree = trees.get_tree(TREE)

    def run_ar(seed):
        res = ar.generate_tokens(params, cfg, tp, MAX_NEW, 3.0, warp,
                                 jax.random.key(seed), logits_fn=fsm,
                                 kv_quant=KVQ)
        np.asarray(res.tokens)
        return res

    # untrained => the hidden-passthrough drafter, which stale_draft executes
    # drafter-free: every tree node proposes from the verify step's own raw
    # distribution at the accepted node, eliminating all per-step drafter
    # forwards + lm_head re-streams (~1.6 GB int8/step at this geometry)
    # with bit-identical proposals (tests/test_stale_draft.py)
    ecfg = spec.SpecDecodeConfig(
        warp=warp, cfg_scale=3.0, lantern=LanternSpec(k=LK, delta=LD),
        max_new=MAX_NEW, mode="static", kv_quant=KVQ,
        # pinned batched walk warp (advisor r4): one [N+1, 65536] pass
        # replaces the serial per-visited-node warp chain (~-0.25 ms/step,
        # scripts/profile_lumina_glue.py r5)
        walk_batch_warp=True,
        stale_draft=not trained,
        # the tree block never hits the cache: accepted rows commit through
        # the next verify forward's extra_kv (kills the per-step rollback
        # kernel, ~0.9 ms at this geometry); dense-attention path only
        deferred_commit=not cfg.use_flash_attention,
    )

    def run_spec(seed):
        res = spec.generate(params, dparams, ecfg, cfg, dcfg, tree,
                            None, None, jax.random.key(seed),
                            token_prompt=tp, logits_fn=fsm)
        np.asarray(res.tokens)
        return res

    # compile BOTH loops first, then take the timed runs back-to-back:
    # vs_baseline is a within-run ratio, and the ~5% chip-speed drift
    # observed across minutes (PERF.md r5 ops note) should hit both sides
    # equally, not straddle a compile gap
    t0 = time.perf_counter(); run_ar(7)
    note(f"AR compiled+run ({time.perf_counter() - t0:.1f}s)")
    t0 = time.perf_counter(); run_spec(7)
    note(f"spec compiled+run ({time.perf_counter() - t0:.1f}s)")
    t0 = time.perf_counter(); run_ar(8); t_ar = time.perf_counter() - t0
    t0 = time.perf_counter(); sres = run_spec(8); t_spec = time.perf_counter() - t0
    note(f"timed: ar={t_ar:.2f}s spec={t_spec:.2f}s")

    sc = float(sres.accept_sum) / max(1.0, float(sres.steps))
    out = {
        "metric": (
            f"image_tokens_per_s_per_chip (Lumina-mGPT-7B-class t2i "
            f"{MAX_NEW}tok {GRID}x{GRID} grid-FSM, EAGLE-1 static tree + "
            f"LANTERN k={LK} d={LD}, sampling, "
            + ("self-distilled drafter)" if trained
               else "stale-distribution drafter-free)")),
        "value": round(MAX_NEW / t_spec, 2),
        "unit": "tokens/s",
        "vs_baseline": round(t_ar / t_spec, 3),
        "extra": {
            "ar_tokens_per_s": round(MAX_NEW / t_ar, 2),
            "step_compression": round(sc, 3),
            "verify_steps_per_s": round(float(sres.steps) / t_spec, 2),
            "weights": "int8",
            "kv": "int8" if KVQ else "bf16",
            "flash": cfg.use_flash_attention,
            "deferred_commit": ecfg.deferred_commit,
            "tree": TREE,
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    import os as _os

    _geom = _os.environ.get("BENCH_GEOM", "all")
    if _geom == "lumina":
        lumina_main()
    elif _geom in ("llamagen", "xl"):
        xl_main()
    else:
        main()
