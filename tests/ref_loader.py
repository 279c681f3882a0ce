"""Load reference PyTorch modules by file path for behavioral parity tests.

The reference tree (/root/reference) has no installable package layout, so
modules are loaded with importlib directly. Parity tests are skipped when the
reference is unavailable (it is a dev-time fixture, not a runtime dependency).
"""
import importlib.util
import sys
import types

REF = "/root/reference"


def _load(name: str, path: str, package: str | None = None):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_ref_superpoint():
    mod = _load(
        "ref_superpoint",
        f"{REF}/src/models/extractors/SuperPoint/superpoint.py",
    )
    return mod.SuperPoint


def load_ref_gats_spg():
    pkg = types.ModuleType("ref_gats_pkg")
    pkg.__path__ = [f"{REF}/src/models/GATsSPG_architectures"]
    sys.modules["ref_gats_pkg"] = pkg
    _load("ref_gats_pkg.GATs",
          f"{REF}/src/models/GATsSPG_architectures/GATs.py")
    mod = _load("ref_gats_pkg.GATs_SuperGlue",
                f"{REF}/src/models/GATsSPG_architectures/GATs_SuperGlue.py")
    return mod.GATsSuperGlue


def load_ref_superglue():
    mod = _load(
        "ref_superglue",
        f"{REF}/src/models/matchers/SuperGlue/superglue.py",
    )
    return mod.SuperGlue


def _ensure_stub(name: str):
    """Install a no-op stand-in for an optional dependency of a reference
    module (e.g. loguru, absent from this image) before loading it."""
    if name in sys.modules:
        return
    mod = types.ModuleType(name)

    class _Null:
        def __getattr__(self, k):
            return lambda *a, **kw: None

    mod.logger = _Null()
    sys.modules[name] = mod


def load_ref_data_utils():
    """Reference crop/pad/leaf machinery (src/utils/data_utils.py) — the
    pack_data semantics of /root/reference/inference.py:80-94 live here."""
    _ensure_stub("loguru")
    return _load("ref_data_utils", f"{REF}/src/utils/data_utils.py")


def load_ref_eval_utils():
    """Reference ransac_PnP (cv2 EPnP, scale/units semantics) + pose
    errors (src/utils/eval_utils.py)."""
    return _load("ref_eval_utils", f"{REF}/src/utils/eval_utils.py")


def load_ref_evaluator():
    """Reference cmd1/3/5 Evaluator (src/evaluators/cmd_evaluator.py)."""
    mod = _load("ref_cmd_evaluator", f"{REF}/src/evaluators/cmd_evaluator.py")
    return mod.Evaluator
