"""Build the native preprocessing extension in-place.

Usage: python -m vis_tpu.native.build
Compiles src/preprocess.c into _vis_native.so next to this file with -O3
-march=native.  vis_tpu.native.__init__ loads it lazily and the Python
fallback keeps everything working when the .so is absent.
"""

from __future__ import annotations

import subprocess
import sys
import sysconfig
from pathlib import Path

HERE = Path(__file__).parent


def build() -> Path:
    src = HERE / "src" / "preprocess.c"
    out = HERE / "_vis_native.so"
    include = sysconfig.get_path("include")
    base = [
        "gcc", "-O3", "-march=native", "-shared", "-fPIC",
        f"-I{include}", str(src), "-o", str(out), "-lm",
    ]
    # The resize loops carry `#pragma omp parallel for` — without -fopenmp
    # they silently compile single-threaded.  Fall back for toolchains
    # built without OpenMP support.
    try:
        subprocess.run(base + ["-fopenmp"], check=True,
                       capture_output=True)
    except subprocess.CalledProcessError:
        subprocess.run(base, check=True)
    return out


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
    sys.exit(0)
