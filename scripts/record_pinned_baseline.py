"""Record the FROZEN AR baseline (run once; commit the JSON).

bench.py's ``vs_baseline`` divides by our own AR loop re-measured every run
on identical weights — correct for isolating the speculative engine, but the
denominator improves every round, so no number tracks absolute progress.
This script measures the pinned configuration — LlamaGen-XL t2i, 256 image
tokens, vanilla CFG AR, **bf16 weights, bf16 KV** (no quantization: the
frozen config must never inherit later optimizations) — and writes
``ckpts/pinned_baseline.json``.  bench.py then reports
``vs_pinned_ar`` = headline tok/s / this frozen tok/s alongside the
moving-denominator ratio.

Usage: python scripts/record_pinned_baseline.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    import jax
    import numpy as np

    from lantern_tpu import configs
    from lantern_tpu.engine import ar
    from lantern_tpu.models import transformer as tfm
    from lantern_tpu.ops.sampling import LogitsWarp

    TOKENS = 256
    cfg = configs.llamagen_config("XL", "t2i", image_tokens=TOKENS)
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    with jax.default_device(cpu):
        params = tfm.init_params(jax.random.key(0), cfg)
        params = tfm.fuse_params(params)
    params = jax.device_put(params, tpu)
    cond = jax.random.normal(jax.random.key(2),
                             (1, cfg.cls_token_num, cfg.caption_dim))
    uncond = params["cond"]["uncond"][None].astype(cond.dtype)
    warp = LogitsWarp(temperature=1.0, top_k=2000, top_p=1.0)

    def run(seed):
        res = ar.generate(params, cfg, cond, uncond, TOKENS, 3.0, warp,
                          jax.random.key(seed))
        np.asarray(res.tokens)

    run(7)                      # compile
    times = []
    for s in (8, 9, 10):
        t0 = time.perf_counter()
        run(s)
        times.append(time.perf_counter() - t0)
    tps = TOKENS / min(times)
    out = {
        "config": ("LlamaGen-XL t2i 256tok vanilla CFG AR, bf16 weights, "
                   "bf16 KV, fused QKV/gate-up, temperature 1.0 top-k 2000, "
                   "cfg 3.0, single chip"),
        "tokens_per_s": round(tps, 2),
        "times_s": [round(t, 4) for t in times],
        "backend": jax.default_backend(),
        "recorded": time.strftime("%Y-%m-%d"),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ckpts/pinned_baseline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
