"""Op-level evidence for the XL AR-forward latency gap (VERDICT r4 #2).

Compiles the XL decode forward for the TPU backend and counts the optimized
HLO's kernel-launch-visible ops inside the layer-scan loop body — fusions,
dots (convolutions), converts, reduces, dynamic-slices — the population
whose per-op dispatch latency explains the measured distance between the
2.13 ms (r4) / post-r5 AR forward and the ~0.9 ms int8 weight-stream floor.

Prints a per-opcode census of the while-loop body and an estimate of
(ops x latency) for a few per-op latency guesses.  Compile-only: nothing
executes on the chip, but the TPU compiler service is used — do not run
concurrently with a measurement job.

Usage: python scripts/count_hlo_ops.py [--size XL] [--quant int8] [--T 1]
"""
from __future__ import annotations

import argparse
import collections
import os
import re
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="XL")
    ap.add_argument("--quant", default="int8", choices=["int8", "none"])
    ap.add_argument("--T", type=int, default=1, help="block rows (1=AR)")
    ap.add_argument("--geom", default="xl", choices=["xl", "lumina"])
    ap.add_argument("--dense", default="fused", choices=["fused", "concat"])
    ap.add_argument("--dump", default="", help="write full HLO text here")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from lantern_tpu import configs
    from lantern_tpu.kv import KVCache
    from lantern_tpu.models import transformer as tfm

    if args.geom == "lumina":
        cfg = configs.chameleon_7b_config(max_seq_len=2432, swin_norm=True)
        kvq = True
    else:
        cfg = configs.llamagen_config(args.size, "t2i", image_tokens=256)
        kvq = False
    cfg = dataclasses.replace(cfg, use_flash_attention=False,
                              dense_softmax=args.dense)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = tfm.init_params(jax.random.key(0), cfg)
        params = tfm.fuse_params(params)
        if args.quant == "int8":
            from lantern_tpu.ops.quant import quantize_params

            params = quantize_params(params)
    rope = tfm.make_rope_tables(cfg)
    kv = KVCache.create(cfg, 2, quantized=kvq)
    T = args.T

    def fwd(params, kv, tok):
        res = tfm.forward(params, cfg, tfm.token_embed(params, tok), kv,
                          positions=kv.length + jnp.arange(T), rope=rope,
                          commit=False)
        return res.hidden

    tok = jnp.zeros((2, T), jnp.int32)
    print(f"lowering+compiling {args.geom}/{args.size} T={T} "
          f"quant={args.quant} dense={args.dense} for "
          f"{jax.default_backend()} ...", file=sys.stderr, flush=True)
    compiled = jax.jit(fwd).lower(params, kv, tok).compile()
    txt = compiled.as_text()
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(txt)

    # --- census of the while-loop body (the layer scan) -------------------
    # optimized HLO: the scan body is a computation called by a while op;
    # find the largest computation whose name mentions body/while
    comps = re.split(r"\n(?=%?\w[\w.\-]* \{|\w[\w.\-]*? \()", txt)
    body_blocks = re.findall(
        r"(^[%\w][^\n]*body[^\n]*\{.*?^\})", txt, re.S | re.M)
    target = max(body_blocks, key=len) if body_blocks else txt
    ops = collections.Counter()
    fusion_kinds = collections.Counter()
    for line in target.splitlines():
        m = re.search(r"=\s+[\w\[\]{},:/ ]*?\b(\w+)\(", line)
        if not m:
            continue
        op = m.group(1)
        if op in ("parameter", "constant", "get-tuple-element", "tuple",
                  "bitcast"):
            continue
        ops[op] += 1
        if op == "fusion":
            km = re.search(r'kind=(\w+)', line)
            fusion_kinds[km.group(1) if km else "?"] += 1
    total = sum(ops.values())
    print(f"while-body launch-visible ops: {total}")
    for op, n in ops.most_common():
        print(f"  {op:24s} {n}")
    if fusion_kinds:
        print("fusion kinds:", dict(fusion_kinds))
    # in a lax.scan the body computation executes once per layer, so total
    # forward dispatch ~= body_ops x num_layers x per-op latency
    L = cfg.num_layers
    print(f"\nbody ops per scan iter: {total} ({L} iters)")
    for lat_us in (1.0, 1.5, 2.0):
        print(f"  dispatch estimate @ {lat_us:.1f} us/op: "
              f"{total * lat_us * L * 1e-3:.2f} ms/forward")


if __name__ == "__main__":
    main()
