"""Load standalone modules of the reference implementation for golden tests.

Only reference files with no package-relative imports are loadable (losses,
positional encoding, linear/conv/patching layers, dataset, lr schedulers);
they are used as *oracles* — our JAX implementations must match them
numerically.  Tests using them skip when the reference checkout is absent.
"""
import importlib.util
import os

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def load_reference_module(name: str, relpath: str):
    path = os.path.join(REFERENCE_ROOT, relpath)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
