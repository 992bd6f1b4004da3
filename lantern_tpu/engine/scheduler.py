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
    prefix_valid: Any = None       # [2, S] pad mask (left-padded captions)
    seed: int = 0
    # results
    tokens: Optional[np.ndarray] = None
    steps: int = 0
    accept_sum: int = 0
    latency: float = 0.0
    error: Optional[str] = None    # failure capture: the request failed at
    #   prefill; the batch keeps serving (vllm_inference_solver.py:312-325
    #   records failures per request the same way)
    _t0: float = 0.0

    @property
    def step_compression(self) -> float:
        return self.accept_sum / max(self.steps, 1)


class Scheduler:
    """Drives a BatchedEngine over a request list.  Slot assignment and
    request lifecycle bookkeeping run in the native C++ runtime when built
    (lantern_tpu/native.py); otherwise a pure-Python fallback."""

    def __init__(self, engine: BatchedEngine, use_native: Optional[bool] = None):
        self.engine = engine
        if use_native is None:
            from .. import native

            use_native = native.available()
        self.use_native = use_native

    def run(self, requests: List[Request], progress: bool = False) -> List[Request]:
        if self.use_native:
            return self._run_native(requests, progress)
        return self._run_python(requests, progress)

    # ------------------------------------------------------------------
    def _prefill(self, req: Request):
        req._t0 = time.perf_counter()
        if req.error is not None:
            # pre-failed upstream (e.g. prompt/cond construction); re-raise
            # so the run loops route it through the same failure capture
            raise RuntimeError(req.error)
        return self.engine.prefill(
            req.cond, req.uncond, jax.random.key(req.seed),
            token_prompt=req.token_prompt, prefix_valid=req.prefix_valid,
        )

    def _run_native(self, requests: List[Request], progress: bool) -> List[Request]:
        from ..native import NativeScheduler

        eng = self.engine
        by_uid = {}
        sched = NativeScheduler(eng.num_slots)
        for i, req in enumerate(requests):
            uid = i + 1
            by_uid[uid] = req
            sched.enqueue(uid, prompt_len=0, max_new=eng.ecfg.max_new)

        batch = None
        slot_uid = [0] * eng.num_slots
        done: List[Request] = []
        while sched.num_active or sched.num_waiting:
            for slot, uid in sched.fill_slots():
                req = by_uid[uid]
                try:
                    pre = self._prefill(req)
                except Exception as e:  # noqa: BLE001 — keep the batch alive
                    if req.error is None:
                        req.error = f"{type(e).__name__}: {e}"
                    req.latency = time.perf_counter() - req._t0
                    sched.fail(uid)
                    done.append(req)
                    if progress:
                        print(f"request {req.uid} FAILED: {req.error}")
                    continue
                if batch is None:
                    batch = eng.empty_batch(pre)
                batch = eng.insert(batch, slot, pre)
                slot_uid[slot] = uid
            if batch is None:
                continue   # every request so far failed at prefill
            batch = eng.step(batch)
            n_new, steps, acc = eng.slot_status(batch)
            # capture finished slots' tokens before the queue refills them
            before = {s: slot_uid[s] for s in range(eng.num_slots)}
            newly = sched.report_step(n_new, steps, acc)
            drained = []
            while newly and len(drained) < newly:
                got = sched.drain()
                if not got:
                    break
                drained.extend(got)
            if newly:
                for uid, st, ac in drained:
                    req = by_uid[uid]
                    slot = next(s for s, u in before.items() if u == uid)
                    req.tokens = eng.slot_tokens(batch, slot)
                    req.steps = int(st)
                    req.accept_sum = int(ac)
                    req.latency = time.perf_counter() - req._t0
                    done.append(req)
                    if progress:
                        print(f"request {req.uid}: steps={req.steps} "
                              f"compression={req.step_compression:.3f}")
        order = {id(r): i for i, r in enumerate(requests)}
        done.sort(key=lambda r: order[id(r)])
        return done

    def _run_python(self, requests: List[Request], progress: bool) -> List[Request]:
        if not requests:
            return []
        eng = self.engine
        queue = deque(requests)
        done: List[Request] = []
        slots: List[Optional[Request]] = [None] * eng.num_slots

        def next_prefilled():
            """Pop requests until one prefills cleanly; failed ones are
            recorded (error set) and the batch keeps serving."""
            while queue:
                req = queue.popleft()
                try:
                    return req, self._prefill(req)
                except Exception as e:  # noqa: BLE001
                    if req.error is None:
                        req.error = f"{type(e).__name__}: {e}"
                    req.latency = time.perf_counter() - req._t0
                    done.append(req)
                    if progress:
                        print(f"request {req.uid} FAILED: {req.error}")
            return None, None

        first, proto = next_prefilled()
        if first is None:
            return done    # every request failed at prefill
        batch = eng.empty_batch(proto)
        batch = eng.insert(batch, 0, proto)
        slots[0] = first
        for s in range(1, eng.num_slots):
            req, pre = next_prefilled()
            if req is None:
                break
            batch = eng.insert(batch, s, pre)
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
                    nxt, pre = next_prefilled()
                    if nxt is not None:
                        batch = eng.insert(batch, s, pre)
                        slots[s] = nxt
                    else:
                        slots[s] = None
        order = {id(r): i for i, r in enumerate(requests)}
        done.sort(key=lambda r: order[id(r)])
        return done
