"""Loader for reference modules (read-only, /root/reference) used as golden
oracles in parity tests.  The reference package __init__ pulls in heavy /
unavailable deps, so we register a bare package shell and stub the few leaf
modules missing from this environment (ftfy, bs4); the pure-function oracles
we compare against (tree buffer compilers, acceptance rules, the kv_variants
LlamaModel) then import cleanly on torch-CPU.
"""

import importlib
import importlib.machinery
import sys
import types
import warnings

REF_ROOT = "/root/reference"

_STUBS = {
    "ftfy": {"fix_text": lambda x: x},
    "bs4": {"BeautifulSoup": object},
}


def _ensure_pkg():
    # newer transformers dropped LogitsWarper (merged into LogitsProcessor);
    # the reference imports it (ea_model_lumina_mgpt.py:14) — alias it back
    try:
        from transformers.generation import logits_process as _lp

        if not hasattr(_lp, "LogitsWarper"):
            _lp.LogitsWarper = _lp.LogitsProcessor
    except ImportError:
        pass
    if "models" not in sys.modules:
        pkg = types.ModuleType("models")
        pkg.__path__ = [f"{REF_ROOT}/models"]
        sys.modules["models"] = pkg
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    for name, attrs in _STUBS.items():
        if name not in sys.modules:
            stub = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(stub, k, v)
            stub.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
            sys.modules[name] = stub


def _imp(name):
    _ensure_pkg()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return importlib.import_module(name)


def load_ref_utils():
    return _imp("models.drafters.utils")


def load_ref_utils_c():
    return _imp("models.drafters.utils_c")


def load_ref_kv_llamagen():
    return _imp("models.kv_variants.modeling_llamagen_kv")


def load_ref_ea_llamagen():
    load_ref_kv_llamagen()
    return _imp("models.ea_model_llamagen")
