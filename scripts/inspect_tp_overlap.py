"""Inspect the TP logit all-gather in the compiled spec step (virtual mesh).

The north star asks for the lm_head logit collective to overlap with verify
compute (the TP branch of the reference runs it synchronously through vLLM's
tensor_model_parallel_gather, third_party/vllm/.../logits_processor.py:86-95).
XLA expresses overlap as async collective pairs: an ``all-gather-start``
whose matching ``all-gather-done`` is separated by other computation in the
schedule.  This script compiles one TP-sharded verification step on the
8-device virtual CPU mesh and reports, for every async collective pair, how
many fusions/dots the scheduler placed between start and done.

Note: the CPU backend compiles the same partitioned HLO but schedules less
aggressively than the TPU latency-hiding scheduler; a nonzero gap here is a
lower bound on the overlap the TPU backend achieves.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/inspect_tp_overlap.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    # sitecustomize force-registers the remote-TPU plugin; pin CPU before
    # any jax op initializes the backend
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from lantern_tpu import configs, trees
    from lantern_tpu.engine import spec as spec_engine
    from lantern_tpu.models import drafter as drf
    from lantern_tpu.models import transformer as tfm
    from lantern_tpu.ops.sampling import LogitsWarp
    from lantern_tpu.parallel import mesh as pmesh

    mesh = pmesh.make_mesh(8, dp=2)
    tp = mesh.shape[pmesh.TP]
    cfg = configs.tiny_config(
        cond_kind="label", block_size=16, num_heads=8, hidden_size=128,
        vocab_size=64 * tp,
    )
    dcfg = configs.drafter_config(cfg, total_tokens=10, depth=2, top_k=4)
    tree = trees.get_tree("mc_sim_7b_63")
    params = tfm.init_params(jax.random.key(0), cfg)
    dparams = drf.init_drafter_params(jax.random.key(1), dcfg, params["embed"])
    params = pmesh.shard_pytree(params, pmesh.base_param_specs(cfg, mesh), mesh)
    dparams = pmesh.shard_pytree(dparams, pmesh.drafter_param_specs(dparams), mesh)

    ecfg = spec_engine.SpecDecodeConfig(
        warp=LogitsWarp(temperature=0.0), cfg_scale=2.0, max_new=8,
        mode="static",
    )

    with jax.set_mesh(mesh):
        lowered = spec_engine.generate.lower(
            params, dparams, ecfg, cfg, dcfg, tree,
            jnp.asarray([3]), jnp.asarray([cfg.num_classes]),
            jax.random.key(7), max_steps=4,
        )
        compiled = lowered.compile()
    hlo = compiled.as_text()

    lines = hlo.splitlines()
    pairs = {}
    for i, ln in enumerate(lines):
        m = re.search(r"%?([\w.-]+) = .*(all-gather-start|all-reduce-start|"
                      r"collective-permute-start)", ln)
        if m:
            pairs[m.group(1)] = [i, None, m.group(2)]
        m = re.search(r"(all-gather-done|all-reduce-done|"
                      r"collective-permute-done)\(.*?%?([\w.-]+)\)", ln)
        if m and m.group(2) in pairs:
            pairs[m.group(2)][1] = i
    n_async = 0
    for name, (s, d, kind) in sorted(pairs.items(), key=lambda kv: kv[1][0]):
        if d is None:
            continue
        gap = [ln for ln in lines[s + 1: d]
               if re.search(r"= (fusion|dot|convolution|custom-call)", ln)]
        n_async += 1
        print(f"{kind} {name}: start line {s}, done line {d}, "
              f"{len(gap)} compute ops scheduled inside the window")
    sync = len(re.findall(r" all-gather\(", hlo))
    print(f"\nasync collective pairs: {n_async}; "
          f"synchronous all-gathers: {sync}")
    print("collective op census:",
          {k: hlo.count(k) for k in
           ("all-gather", "all-reduce", "reduce-scatter",
            "collective-permute")})


if __name__ == "__main__":
    main()
