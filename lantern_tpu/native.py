"""ctypes bindings for the native serving runtime (native/scheduler.cc).

Builds on demand via ``make -C native`` when the shared library is missing;
falls back cleanly (``available() == False``) where no toolchain exists, in
which case the pure-Python scheduler path is used.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import time
from typing import List, Optional, Tuple

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "liblantern_sched.so")

_lib = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = _bind(ctypes.CDLL(_LIB_PATH))
    except OSError:
        # stale/corrupt library: rebuild once, else fall back cleanly
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR, "clean"],
                           check=True, capture_output=True, timeout=30)
        except Exception:
            return None
        if not _build():
            return None
        try:
            lib = _bind(ctypes.CDLL(_LIB_PATH))
        except OSError:
            return None
    except AttributeError:
        # library built from an older source missing a symbol
        return None
    _lib = lib
    return lib


def _bind(lib):
    lib.lantern_sched_create.restype = ctypes.c_void_p
    lib.lantern_sched_create.argtypes = [ctypes.c_int32]
    lib.lantern_sched_destroy.argtypes = [ctypes.c_void_p]
    lib.lantern_sched_enqueue.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_uint64,
    ]
    lib.lantern_sched_fill_slots.restype = ctypes.c_int32
    lib.lantern_sched_fill_slots.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.lantern_sched_report_step.restype = ctypes.c_int32
    lib.lantern_sched_report_step.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.lantern_sched_drain.restype = ctypes.c_int32
    lib.lantern_sched_drain.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.lantern_sched_fail.restype = ctypes.c_int32
    lib.lantern_sched_fail.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.lantern_sched_num_failed.restype = ctypes.c_int32
    lib.lantern_sched_num_failed.argtypes = [ctypes.c_void_p]
    lib.lantern_sched_num_waiting.restype = ctypes.c_int32
    lib.lantern_sched_num_waiting.argtypes = [ctypes.c_void_p]
    lib.lantern_sched_num_active.restype = ctypes.c_int32
    lib.lantern_sched_num_active.argtypes = [ctypes.c_void_p]
    lib.lantern_sched_totals.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64)
    ]
    return lib


def available() -> bool:
    return _load() is not None


class NativeScheduler:
    """Request queue + slot table backed by the C++ runtime."""

    def __init__(self, num_slots: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native scheduler library unavailable")
        self._lib = lib
        self.num_slots = num_slots
        self._h = lib.lantern_sched_create(num_slots)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.lantern_sched_destroy(self._h)
            self._h = None

    def enqueue(self, uid: int, prompt_len: int, max_new: int) -> None:
        self._lib.lantern_sched_enqueue(
            self._h, uid, prompt_len, max_new, time.monotonic_ns()
        )

    def fill_slots(self) -> List[Tuple[int, int]]:
        n = self.num_slots
        slots = (ctypes.c_int32 * n)()
        uids = (ctypes.c_uint64 * n)()
        k = self._lib.lantern_sched_fill_slots(self._h, slots, uids)
        return [(slots[i], uids[i]) for i in range(k)]

    def report_step(self, n_new, steps, accept_sum) -> int:
        n = self.num_slots
        a = (ctypes.c_int32 * n)(*[int(x) for x in n_new])
        b = (ctypes.c_int32 * n)(*[int(x) for x in steps])
        c = (ctypes.c_int32 * n)(*[int(x) for x in accept_sum])
        return self._lib.lantern_sched_report_step(self._h, a, b, c)

    def drain(self, cap: int = 64) -> List[Tuple[int, int, int]]:
        uids = (ctypes.c_uint64 * cap)()
        steps = (ctypes.c_int32 * cap)()
        acc = (ctypes.c_int32 * cap)()
        k = self._lib.lantern_sched_drain(self._h, cap, uids, steps, acc)
        return [(uids[i], steps[i], acc[i]) for i in range(k)]

    def fail(self, uid: int) -> bool:
        """Drop a live request whose prefill failed; frees its slot."""
        return bool(self._lib.lantern_sched_fail(self._h, uid))

    @property
    def num_failed(self) -> int:
        return self._lib.lantern_sched_num_failed(self._h)

    @property
    def num_waiting(self) -> int:
        return self._lib.lantern_sched_num_waiting(self._h)

    @property
    def num_active(self) -> int:
        return self._lib.lantern_sched_num_active(self._h)

    def totals(self):
        out = (ctypes.c_uint64 * 4)()
        self._lib.lantern_sched_totals(self._h, out)
        return {"enqueued": out[0], "completed": out[1],
                "tokens": out[2], "device_steps": out[3]}
