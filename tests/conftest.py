"""Test harness setup: force an 8-device virtual CPU mesh so multi-chip
sharding code paths are exercised without TPUs (SURVEY.md section 4)."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize force-registers the TPU backend and overwrites
# jax_platforms at import; re-force CPU here (env var alone is not enough).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)


def load_reference_module(name: str, relpath: str):
    """Import a reference module by file path under a private name (parity
    harness only — the reference stays read-only and un-copied)."""
    import importlib.util

    path = os.path.join(REFERENCE_DIR, relpath)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
