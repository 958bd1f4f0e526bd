"""Native host-core loader: compiles csrc/omni_host.c on first use.

The TPU compute path is JAX/XLA/Pallas; the host side of the step loop
(descriptor fill loops, fused-window slot precomputation) runs native
(SURVEY.md §2.10 — the reference's equivalents live in vLLM's C++/CUDA
runtime and msgspec). Compilation happens once into a per-version cache
dir with the system C compiler; on ANY failure the callers fall back to
the numpy paths, so the extension is an accelerator, never a
requirement. Disable with OMNI_TPU_NO_NATIVE=1.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import sysconfig

_mod = None
_tried = False


def _build_and_load():
    src = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                       "csrc", "omni_host.c")
    if not os.path.isfile(src):
        # installed package layout: csrc alongside the package
        src = os.path.join(os.path.dirname(__file__), "csrc", "omni_host.c")
        if not os.path.isfile(src):
            return None
    tag = f"{sys.version_info.major}{sys.version_info.minor}"
    cache = os.path.join(
        os.path.expanduser("~"), ".cache", "vllm_omni_tpu", "native")
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, f"_omni_host.cpython-{tag}.so")
    if not os.path.isfile(so) or (
            os.path.getmtime(so) < os.path.getmtime(src)):
        cc = os.environ.get("CC", "cc")
        include = sysconfig.get_path("include")
        cmd = [cc, "-O2", "-shared", "-fPIC", f"-I{include}", src, "-o", so]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    spec = importlib.util.spec_from_file_location("_omni_host", so)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def get_host_core():
    """The native module, or None (numpy fallback)."""
    global _mod, _tried
    if _tried:
        return _mod
    _tried = True
    if os.environ.get("OMNI_TPU_NO_NATIVE"):
        return None
    try:
        _mod = _build_and_load()
    except Exception:  # missing compiler, sandbox, exotic platform...
        _mod = None
    return _mod
