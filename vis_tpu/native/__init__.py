"""Native (C) components with pure-Python fallbacks.

`fused_preprocess()` is the production host path: decoded RGB frame ->
[patches, C*T*P*P] float32 matrix in one native pass (bicubic resize + CLIP
normalize + merge-window patchify).  Build once with
`python -m vis_tpu.native.build`; absent the .so, callers fall back to the
numpy path in vis_tpu.ops.preprocess automatically.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_native = None
_load_attempted = False


def _load():
    global _native, _load_attempted
    if _load_attempted:
        return _native
    _load_attempted = True
    so_path = Path(__file__).parent / "_vis_native.so"
    if so_path.exists():
        import importlib.util

        try:
            spec = importlib.util.spec_from_file_location("_vis_native", so_path)
            module = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(module)
            _native = module
        except Exception as exc:
            # A stale or ABI-mismatched .so (built on another host/Python)
            # must degrade to the numpy path, not fail the first inspection.
            import logging

            logging.getLogger(__name__).warning(
                "native preprocess extension failed to load (%s); "
                "falling back to the numpy path", exc
            )
            _native = None
    return _native


def native_available() -> bool:
    return _load() is not None


def fused_preprocess(
    rgb: np.ndarray,
    dst_h: int,
    dst_w: int,
    mean: Tuple[float, float, float],
    std: Tuple[float, float, float],
    temporal: int = 2,
    patch: int = 14,
    merge: int = 2,
) -> Optional[np.ndarray]:
    """Fused resize+normalize+patchify; None when the .so is unavailable.

    rgb: [H, W, 3] uint8 contiguous.  Returns [grid_h*grid_w, 3*T*P*P] f32.
    """
    native = _load()
    if native is None:
        return None
    # Validate before crossing into C: a zero patch/merge reaches an integer
    # modulo in the extension and a SIGFPE kills the interpreter, not just
    # the request.
    if temporal < 1 or patch < 1 or merge < 1:
        raise ValueError(
            f"temporal/patch/merge must be >= 1, got {temporal}/{patch}/{merge}"
        )
    if dst_h % (patch * merge) or dst_w % (patch * merge):
        raise ValueError(
            f"dst dims ({dst_h}x{dst_w}) must be multiples of "
            f"patch*merge={patch * merge}"
        )
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    src_h, src_w = rgb.shape[:2]
    raw = native.resize_normalize_patchify(
        rgb.tobytes(), src_h, src_w, dst_h, dst_w,
        tuple(float(m) for m in mean), tuple(float(s) for s in std),
        temporal, patch, merge,
    )
    grid = (dst_h // patch) * (dst_w // patch)
    return np.frombuffer(raw, dtype=np.float32).reshape(
        grid, 3 * temporal * patch * patch
    )


__all__ = ["fused_preprocess", "native_available"]
