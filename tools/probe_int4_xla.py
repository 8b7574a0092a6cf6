"""On-chip A/B probe: XLA-native int4 (S4) weight storage vs the Pallas
split-nibble kernel (ops/quantized.py quantized_matmul4) for the decode
step's weight-streaming matmul.

Motivation: the r2 roofline analysis pinned decode at ~36% of HBM ideal,
VPU-bound on nibble unpack inside the Pallas kernel (ARCHITECTURE.md).
XLA has its own packed-S4 storage + dequant emitters that Mosaic lacks on
this toolchain; if plain-XLA `w4.astype(bf16) * scale` einsum beats the
kernel, the production path should switch.

Notes:
- The axon plugin ignores JAX_PLATFORMS: this ALWAYS runs on the chip.
- device_put of an S4 host array crashes (RecursionError in the plugin's
  shard path) -> S4 buffers must be created ON device inside a jit.
- Probe numbers are RELATIVE only (the probe harness understates the
  production fused-scan rate ~4.5x; see memory notes / ARCHITECTURE).

Run:  python tools/probe_int4_xla.py
"""

import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

from vis_tpu.ops.quantized import quantize_weight4, quantized_matmul4

# down_proj-like decode matmul at Qwen2.5-VL-7B dims.
OUT, IN = 3584, 18944
B = 1
ITERS = 64


def main():
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})")
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (OUT, IN), jnp.float32) * 0.02
    x = jax.random.normal(jax.random.PRNGKey(1), (B, IN), jnp.bfloat16)

    # --- (a) Pallas split-nibble kernel over packed u8 ------------------
    qw = quantize_weight4(w)
    qw = jax.tree.map(jnp.asarray, qw)

    @jax.jit
    def run_pallas(x, qw):
        def body(acc, _):
            y = quantized_matmul4(x, qw)
            return acc + y, None
        acc, _ = jax.lax.scan(
            body, jnp.zeros((B, OUT), jnp.float32), None, length=ITERS
        )
        return acc

    # --- (b) XLA-native S4 storage, astype(bf16) einsum ------------------
    # S4 arrays cannot cross ANY jit boundary on the axon plugin (its
    # shard-arg path recurses on S4 inputs, even device-resident ones), so
    # the S4 planes are built from the packed u8 INSIDE the same jit; the
    # one-time unpack amortizes over the scan and the steady-state body
    # measures the S4->bf16 matmul alone.
    scale = qw.scale  # [OUT, 2] f32

    @jax.jit
    def run_s4(x, qw):
        half = IN // 2
        b = qw.q.astype(jnp.int32)
        lo4 = ((b & 15) - 8).astype(jnp.int4)
        hi4 = (((b >> 4) & 15) - 8).astype(jnp.int4)
        lo4 = jax.lax.optimization_barrier(lo4)
        hi4 = jax.lax.optimization_barrier(hi4)
        scale = qw.scale

        def body(acc, _):
            w_lo = lo4.astype(jnp.bfloat16)
            w_hi = hi4.astype(jnp.bfloat16)
            y_lo = jax.lax.dot_general(
                x[:, :half], w_lo, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            y_hi = jax.lax.dot_general(
                x[:, half:], w_hi, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            y = y_lo * scale[:, 0][None] + y_hi * scale[:, 1][None]
            return acc + y, None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((B, OUT), jnp.float32), None, length=ITERS
        )
        return acc

    # --- (c) plain-XLA u8 unpack (the kernel's fallback path) -----------
    @jax.jit
    def run_u8(x, qw):
        half = IN // 2

        def body(acc, _):
            b = qw.q.astype(jnp.int32)
            w_lo = ((b & 15) - 8).astype(jnp.bfloat16)
            w_hi = (((b >> 4) & 15) - 8).astype(jnp.bfloat16)
            y_lo = jax.lax.dot_general(
                x[:, :half], w_lo, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            y_hi = jax.lax.dot_general(
                x[:, half:], w_hi, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            y = y_lo * qw.scale[:, 0][None] + y_hi * qw.scale[:, 1][None]
            return acc + y, None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((B, OUT), jnp.float32), None, length=ITERS
        )
        return acc

    def timeit(name, fn, *args):
        out = np.asarray(fn(*args))  # compile + settle
        t0 = time.perf_counter()
        out = np.asarray(fn(*args))
        dt = time.perf_counter() - t0
        per = dt / ITERS * 1e3
        gbps = (OUT * IN / 2) / (dt / ITERS) / 1e9
        print(f"{name:24s} {per:7.3f} ms/matmul  ({gbps:6.1f} GB/s eff)  "
              f"sum={float(out.sum()):.3f}")
        return per

    a = timeit("pallas split-nibble", run_pallas, x, qw)
    b = timeit("XLA-native S4", run_s4, x, qw)
    c = timeit("plain-XLA u8 unpack", run_u8, x, qw)
    print(f"\nS4/pallas: {b / a:.2f}x   u8/pallas: {c / a:.2f}x "
          f"(<1 = faster than the kernel)")


if __name__ == "__main__":
    main()
