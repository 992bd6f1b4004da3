"""Serving-configuration policy: draft shape (or plain AR) by slot count.

Speculation multiplies per-token FLOPs by the tree size; batching multiplies
tokens per weight stream.  As R grows, weight-stream amortization — the
thing speculation exists to beat — comes for free, and the measured optimum
shifts from big trees to small trees to no tree at all (PERF.md
"batched-serving economics"; the reference's analogous decision is burying
speculation entirely once it adopts vLLM for batch work,
vllm_inference_solver.py:243-343).

``serving_plan`` encodes the measured crossover table from
``scripts/sweep_batched.py`` on v5e-1 at XL geometry (int8 weights + int8 KV
on BOTH paths).  Callers: ``session.generate_batch(tree="auto")`` and
run.sh's SLOTS path.
"""

from __future__ import annotations

from typing import Optional, Tuple

# Measured aggregate tok/s by (R, config) — v5e-1, LlamaGen-XL geometry,
# int8 weights + int8 KV, trained dual-stream drafter, LANTERN k=10 d=5
# (scripts/sweep_batched.py; see PERF.md for the full table).  The policy
# interpolates between measured slot counts by nearest measured R.
MEASURED_BEST = {
    # R: ("spec", tree_name) or ("ar", None) — filled by the sweep.
    # (bench.py additionally swaps in the calibrated ckpts/bench_tree_*.json
    # shape for the single-request lane when present.)
    1: ("spec", "naive_extend_57"),
    4: ("spec", "chain_bush_8"),
    8: ("spec", "chain_bush_8"),
    16: ("ar", None),
}


def serving_plan(slots: int) -> Tuple[str, Optional[str]]:
    """(mode, tree_name) for a slot count: mode "spec" with a static tree
    name ("calibrated" = the ckpts/bench_tree_*.json shape when present),
    or mode "ar" (lockstep batched AR)."""
    if slots <= 1:
        return MEASURED_BEST[1]
    best_r = min(MEASURED_BEST, key=lambda r: abs(r - slots))
    # ties toward the larger measured R (the crossover moves one way)
    for r in MEASURED_BEST:
        if abs(r - slots) == abs(best_r - slots):
            best_r = max(best_r, r)
    return MEASURED_BEST[best_r]
