"""Image-quality compute kernels: Laplacian sharpness and brightness.

Device-side replacements for the reference's OpenCV calls
(reference: src/safety/image_quality.py:105-168).  The Laplacian uses the
3x3 stencil [[0,1,0],[1,-4,1],[0,1,0]] with reflect-101 borders, matching
cv2.Laplacian(..., CV_64F) exactly on uint8 input, so host (numpy) and
device (jnp) paths agree bit-for-bit in float64 / to ~1e-6 in float32.

The jax variant is jit-compiled per input shape; the quality gate calls it
once per inspection (DEVICE_PREPROCESS drives), so per-shape compiles are
bounded by the distinct upload sizes.
"""

from __future__ import annotations

import numpy as np

try:  # jax is optional at import time so pure-CPU tooling can use numpy path
    import jax
    import jax.numpy as jnp

    _HAS_JAX = True
except Exception:  # pragma: no cover
    _HAS_JAX = False


def laplacian_variance_np(gray: np.ndarray) -> float:
    """Variance of the 3x3 Laplacian response (sharpness proxy), host path."""
    g = gray.astype(np.float64)
    p = np.pad(g, 1, mode="reflect")  # reflect-101: edge pixel not duplicated
    lap = (
        p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:] - 4.0 * g
    )
    return float(lap.var())


def mean_brightness_np(gray: np.ndarray) -> float:
    return float(np.mean(gray))


if _HAS_JAX:

    @jax.jit
    def _laplacian_variance_jit(gray: "jnp.ndarray") -> "jnp.ndarray":
        g = gray.astype(jnp.float32)
        p = jnp.pad(g, 1, mode="reflect")
        lap = p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:] - 4.0 * g
        return jnp.var(lap)

    def laplacian_variance_jax(gray: np.ndarray) -> float:
        return float(_laplacian_variance_jit(jnp.asarray(gray)))

else:  # pragma: no cover

    def laplacian_variance_jax(gray: np.ndarray) -> float:
        return laplacian_variance_np(gray)


def laplacian_variance(gray: np.ndarray, device: bool = False) -> float:
    """Sharpness metric; `device=True` routes through jax/XLA."""
    if device and _HAS_JAX:
        return laplacian_variance_jax(gray)
    return laplacian_variance_np(gray)


__all__ = [
    "laplacian_variance",
    "laplacian_variance_np",
    "laplacian_variance_jax",
    "mean_brightness_np",
]
