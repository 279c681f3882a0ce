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
