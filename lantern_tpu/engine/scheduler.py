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
    # open-loop arrival offset in seconds from Scheduler.run() start; None =
    # available immediately (closed-loop / saturated).  With arrivals set,
    # the scheduler only admits a request once its arrival time passes —
    # the serving bench uses this to drive a Poisson stream against the
    # batch (the role vLLM's async engine plays for the reference,
    # vllm_inference_solver.py:243-343)
    arrival_time: Optional[float] = None
    # results
    tokens: Optional[np.ndarray] = None
    steps: int = 0
    accept_sum: int = 0
    latency: float = 0.0           # completion - service start (prefill)
    e2e_latency: float = 0.0       # completion - arrival (includes queueing)
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
        self._t_run0 = time.perf_counter()
        if self.use_native:
            return self._run_native(requests, progress)
        return self._run_python(requests, progress)

    # ------------------------------------------------------------------
    def _arrived(self, req: Request) -> bool:
        return (req.arrival_time is None
                or time.perf_counter() - self._t_run0 >= req.arrival_time)

    def _finish(self, req: Request):
        now = time.perf_counter()
        req.latency = now - req._t0
        arr = self._t_run0 + (req.arrival_time or 0.0)
        req.e2e_latency = now - arr

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
        # requests enter the native queue only once their arrival time passes
        # (open-loop streams); immediate requests enqueue up front
        pending = sorted((r for r in requests), key=lambda r: r.arrival_time or 0.0)

        def admit():
            while pending and self._arrived(pending[0]):
                req = pending.pop(0)
                uid = len(by_uid) + 1
                by_uid[uid] = req
                sched.enqueue(uid, prompt_len=0, max_new=eng.ecfg.max_new)
        admit()

        batch = None
        slot_uid = [0] * eng.num_slots
        done: List[Request] = []
        while sched.num_active or sched.num_waiting or pending:
            admit()
            if not (sched.num_active or sched.num_waiting):
                # idle until the next arrival
                nxt = self._t_run0 + (pending[0].arrival_time or 0.0)
                time.sleep(max(0.0, min(0.05, nxt - time.perf_counter())))
                continue
            for slot, uid in sched.fill_slots():
                req = by_uid[uid]
                try:
                    pre = self._prefill(req)
                except Exception as e:  # noqa: BLE001 — keep the batch alive
                    if req.error is None:
                        req.error = f"{type(e).__name__}: {e}"
                    self._finish(req)
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
                    self._finish(req)
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
        queue = deque(sorted(requests, key=lambda r: r.arrival_time or 0.0))
        done: List[Request] = []
        slots: List[Optional[Request]] = [None] * eng.num_slots

        def next_prefilled(wait: bool = False):
            """Pop ARRIVED requests until one prefills cleanly; failed ones
            are recorded (error set) and the batch keeps serving.  With
            ``wait``, sleeps for the next arrival when the queue is
            non-empty but nothing has arrived yet."""
            while queue:
                if not self._arrived(queue[0]):
                    if not wait:
                        return None, None
                    nxt = self._t_run0 + (queue[0].arrival_time or 0.0)
                    time.sleep(max(0.0, nxt - time.perf_counter()))
                req = queue.popleft()
                try:
                    return req, self._prefill(req)
                except Exception as e:  # noqa: BLE001
                    if req.error is None:
                        req.error = f"{type(e).__name__}: {e}"
                    self._finish(req)
                    done.append(req)
                    if progress:
                        print(f"request {req.uid} FAILED: {req.error}")
            return None, None

        first, proto = next_prefilled(wait=True)
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

        while any(r is not None for r in slots) or queue:
            if not any(r is not None for r in slots):
                # every slot drained while later arrivals are still pending
                nxt, pre = next_prefilled(wait=True)
                if nxt is None:
                    break
                batch = eng.insert(batch, 0, pre)
                slots[0] = nxt
            batch = eng.step(batch)
            n_new, steps, acc = eng.slot_status(batch)
            for s, req in enumerate(slots):
                if req is None:
                    continue
                if n_new[s] >= eng.ecfg.max_new:
                    req.tokens = eng.slot_tokens(batch, s)
                    req.steps = int(steps[s])
                    req.accept_sum = int(acc[s])
                    self._finish(req)
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
