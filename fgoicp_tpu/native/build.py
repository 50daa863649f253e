"""Build the native loader shared library with g++ (no pip deps).

The library is cached next to the sources and rebuilt when the source is
newer.  Failures are non-fatal — callers fall back to pure Python.
"""

from __future__ import annotations

import os
import subprocess
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_HERE, "src", "loader.cc")
LIB = os.path.join(_HERE, "_libfgoicp_native.so")


def ensure_built(quiet: bool = True) -> str | None:
    """Return the path to the built .so, building if needed; None on
    failure."""
    try:
        if os.path.exists(LIB) and \
                os.path.getmtime(LIB) >= os.path.getmtime(SRC):
            return LIB
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=_HERE)
        os.close(fd)
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
               "-o", tmp, SRC]
        res = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=120)
        if res.returncode != 0:
            if not quiet:
                raise RuntimeError(f"native build failed:\n{res.stderr}")
            os.unlink(tmp)
            return None
        os.replace(tmp, LIB)
        return LIB
    except Exception:
        if not quiet:
            raise
        return None


if __name__ == "__main__":
    path = ensure_built(quiet=False)
    print(f"built {path}")
