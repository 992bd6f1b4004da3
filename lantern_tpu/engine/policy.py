"""Serving-configuration policy: draft shape (or plain AR) by slot count.

Speculation multiplies per-token FLOPs by the tree size; batching multiplies
tokens per weight stream.  As R grows, weight-stream amortization — the
thing speculation exists to beat — comes for free, and the measured optimum
shifts from big trees to small trees to no tree at all (PERF.md
"batched-serving economics"; the reference's analogous decision is burying
speculation entirely once it adopts vLLM for batch work,
vllm_inference_solver.py:243-343).

The crossover is a *geometry* question, not just a slot-count question: at
XL geometry the verification forward is weight-stream-bound, so batching
alone amortizes it and AR wins at R=16; at Lumina-7B geometry the step is
KV-bound over 2.4K-token images, per-slot KV traffic scales with R either
way, and speculation's tree rows stay nearly free — so the crossover sits
much higher, if it exists at all.

``serving_plan`` encodes the measured tables from ``scripts/sweep_batched.py``
on v5e-1 (int8 weights + int8 KV on BOTH paths).  Callers:
``session.generate_batch(tree="auto")`` (both families) and run.sh's SLOTS
path.
"""

from __future__ import annotations

from typing import Optional, Tuple

# Measured aggregate-tok/s winners by geometry and R — v5e-1, int8 weights +
# int8 KV, LANTERN k=10 d=5 (scripts/sweep_batched.py; full tables in
# PERF.md).  The policy interpolates by nearest measured R (ties toward the
# larger R — the crossover moves one way).
MEASURED_BEST = {
    # LlamaGen-XL t2i: weight-stream-bound steps; trained dual-stream
    # drafter.  (bench.py additionally swaps in the calibrated
    # ckpts/bench_tree_*.json shape for the single-request lane.)
    "llamagen_xl": {
        1: ("spec", "naive_extend_57"),
        4: ("spec", "chain_bush_8"),
        8: ("spec", "chain_bush_8"),
        16: ("ar", None),
    },
    # Lumina-mGPT-7B-class t2i 48x48: KV-bound steps; passthrough drafter
    # (measured-optimal on this base, PERF.md "Lumina drafter study").
    "lumina_7b": {
        1: ("spec", "calibrated"),
        2: ("spec", "calibrated"),
        4: ("spec", "chain_bush_8"),
    },
}


def serving_plan(slots: int,
                 geometry: str = "llamagen_xl") -> Tuple[str, Optional[str]]:
    """(mode, tree_name) for a slot count at a geometry: mode "spec" with a
    static tree name ("calibrated" = the ckpts/bench_tree_*.json shape when
    present), or mode "ar" (lockstep batched AR).  Unknown geometries use
    the nearest measured one (XL for caption models, 7B for token models is
    the caller's choice)."""
    table = MEASURED_BEST.get(geometry) or MEASURED_BEST["llamagen_xl"]
    if slots <= 1:
        return table[min(table)]
    best_r = min(table, key=lambda r: abs(r - slots))
    for r in table:
        if abs(r - slots) == abs(best_r - slots):
            best_r = max(best_r, r)
    return table[best_r]
