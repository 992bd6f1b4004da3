"""Loader for reference modules (read-only, /root/reference) used as golden
oracles in parity tests.  The reference package __init__ pulls in heavy /
unavailable deps, so we register a bare package shell and stub the modules that
fail to import in this environment; the pure-function oracles we compare
against (tree buffer compilers, acceptance rules) import cleanly on torch-CPU.
"""

import importlib
import sys
import types
import warnings

REF_ROOT = "/root/reference"


def _ensure_pkg():
    if "models" not in sys.modules:
        pkg = types.ModuleType("models")
        pkg.__path__ = [f"{REF_ROOT}/models"]
        sys.modules["models"] = pkg
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)


def load_ref_utils():
    _ensure_pkg()
    return importlib.import_module("models.drafters.utils")


def load_ref_utils_c():
    _ensure_pkg()
    return importlib.import_module("models.drafters.utils_c")


def load_ref_ea_llamagen():
    """Import ea_model_llamagen with the (unneeded) kv model stubbed out."""
    _ensure_pkg()
    name = "models.kv_variants.modeling_llamagen_kv"
    if name not in sys.modules:
        try:
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                importlib.import_module(name)
        except Exception:
            stub = types.ModuleType(name)
            stub.LlamaForCausalLM = object
            sys.modules[name] = stub
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return importlib.import_module("models.ea_model_llamagen")
