"""Native (C++) host tier: tokenizer + postings accumulator.

The framework's ingestion hot path is C++ (the reference is all-C++; its
tokenize/hash/append loop is the indexing bottleneck, SURVEY.md section 3.1).
The extension builds on first import with g++ (no pybind11 in this
environment — plain CPython C API); pure-Python fallbacks exist everywhere
it is used, so a missing toolchain degrades performance, not correctness.
"""

from __future__ import annotations

import importlib
import importlib.util
import os
import subprocess
import sys
import sysconfig

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "_native.cpp")


def _so_path() -> str:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(_HERE, f"_native{suffix}")


def _build() -> bool:
    so = _so_path()
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(_SRC):
        return True
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        "-march=native", "-fvisibility=hidden",
        f"-I{include}", _SRC, "-o", so,
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
        return True
    except Exception as e:  # pragma: no cover - toolchain missing
        sys.stderr.write(f"diagon_tpu: native build failed ({e}); "
                         "using pure-Python fallbacks\n")
        return False


_native = None
if os.environ.get("DIAGON_TPU_NO_NATIVE") != "1":
    try:
        if _build():
            spec = importlib.util.spec_from_file_location(
                "diagon_tpu.native._native", _so_path()
            )
            _native = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(_native)
    except Exception as e:  # pragma: no cover
        sys.stderr.write(f"diagon_tpu: native load failed ({e})\n")
        _native = None


def available() -> bool:
    return _native is not None
