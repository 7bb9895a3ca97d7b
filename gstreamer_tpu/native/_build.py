"""Shared native-extension build helper.

Binaries are NOT committed (a fresh clone has arbitrary mtimes, so an
mtime-based staleness check could silently load a stale or wrong-arch
.so).  Rebuilds are keyed on a sha256 of the source: the hash of the
source that produced the .so is stored in a `<so>.srchash` sidecar and
compared on load.
"""

from __future__ import annotations

import hashlib
import os
import subprocess


def _src_hash(src: str) -> str:
    with open(src, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def ensure_built(src: str, so: str, extra_flags=()) -> bool:
    """Compile `src` -> `so` if the .so is missing or was built from a
    different source content.  Returns True if `so` is usable."""
    src = os.path.normpath(src)
    if not os.path.exists(src):
        return os.path.exists(so)
    want = _src_hash(src)
    sidecar = so + ".srchash"
    if os.path.exists(so) and os.path.exists(sidecar):
        try:
            with open(sidecar) as f:
                if f.read().strip() == want:
                    return True
        except OSError:
            pass
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", so, src, *extra_flags],
            check=True, capture_output=True, timeout=180)
    except Exception:
        return False
    try:
        with open(sidecar, "w") as f:
            f.write(want + "\n")
    except OSError:
        pass
    return True
