"""Continuous-batching request scheduler (host side).

Drives a BatchedEngine: keeps all R slots busy, swaps finished requests for
queued ones between jitted steps, and collects per-request outputs/stats.
This is the serving-loop replacement for the reference's vLLM integration
(vllm_inference_solver.py) — CFG pairing is inherent to the request state
rather than patched into a logits processor.

The scheduler is deliberately plain Python: each step is one device dispatch
(~ms), so host orchestration cost is negligible, and this is the integration
point for a native (C++) request queue and multi-host dispatch.
"""

from __future__ import annotations

import dataclasses
import time
from collections import deque
from typing import Any, List, Optional

import jax
import numpy as np

from .batch import BatchedEngine


@dataclasses.dataclass
class Request:
    uid: Any
    cond: Any = None
    uncond: Any = None
    token_prompt: Any = None
    seed: int = 0
    # results
    tokens: Optional[np.ndarray] = None
    steps: int = 0
    accept_sum: int = 0
    latency: float = 0.0
    _t0: float = 0.0

    @property
    def step_compression(self) -> float:
        return self.accept_sum / max(self.steps, 1)


class Scheduler:
    def __init__(self, engine: BatchedEngine):
        self.engine = engine

    def run(self, requests: List[Request], progress: bool = False) -> List[Request]:
        eng = self.engine
        queue = deque(requests)
        done: List[Request] = []
        slots: List[Optional[Request]] = [None] * eng.num_slots

        def prefill(req: Request):
            req._t0 = time.perf_counter()
            return eng.prefill(
                req.cond, req.uncond, jax.random.key(req.seed),
                token_prompt=req.token_prompt,
            )

        first = queue.popleft()
        proto = prefill(first)
        batch = eng.empty_batch(proto)
        batch = eng.insert(batch, 0, proto)
        slots[0] = first
        for s in range(1, eng.num_slots):
            if not queue:
                break
            req = queue.popleft()
            batch = eng.insert(batch, s, prefill(req))
            slots[s] = req

        while any(r is not None for r in slots):
            batch = eng.step(batch)
            n_new, steps, acc = eng.slot_status(batch)
            for s, req in enumerate(slots):
                if req is None:
                    continue
                if n_new[s] >= eng.ecfg.max_new:
                    req.tokens = eng.slot_tokens(batch, s)
                    req.steps = int(steps[s])
                    req.accept_sum = int(acc[s])
                    req.latency = time.perf_counter() - req._t0
                    done.append(req)
                    if progress:
                        print(f"request {req.uid}: steps={req.steps} "
                              f"compression={req.step_compression:.3f}")
                    if queue:
                        nxt = queue.popleft()
                        batch = eng.insert(batch, s, prefill(nxt))
                        slots[s] = nxt
                    else:
                        slots[s] = None
        done.sort(key=lambda r: requests.index(r))
        return done
