"""On-chip probe: the decode step's vocab-projection (lm_head) term at
Qwen2.5-VL-7B dims (152k vocab x 3584 hidden) under int4 / int8 / bf16.

Answers round-2 review item 3a at the step level: does an int8 vocab head
halve the ~2.5 ms int4 vocab-matmul term?  (The PIPELINE A/B in bench.py
showed no E2E win from moving the single int8 head onto the inspector,
because the schema fast-forward evaluates the lm_head once per forced
window — this probe isolates the per-evaluation cost itself.)

Notes:
- The axon plugin ignores JAX_PLATFORMS: this ALWAYS runs on the chip.
- Weights are generated ON device (host->HBM is ~23 MB/s through the
  tunnel; shipping a 1 GiB bf16 table would take ~47 s).
- Probe numbers are RELATIVE only (probe harnesses understate the
  production fused-scan rate; see memory notes / ARCHITECTURE.md).

Run:  python tools/probe_vocab_head.py
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from vis_tpu.ops.quantized import (
    quantize_weight,
    quantize_weight4,
    quantized_matmul,
    quantized_matmul4,
)

VOCAB, HIDDEN = 151936, 3584  # Qwen2.5-VL-7B lm_head
PAD = -(-VOCAB // 512) * 512
B = 1
ITERS = 16


def main() -> None:
    dev = jax.devices()[0]
    print(f"# device: {dev} ({dev.platform})")

    @jax.jit
    def make_bf16(key):
        return (
            jax.random.normal(key, (PAD, HIDDEN), jnp.float32) * 0.02
        ).astype(jnp.bfloat16)

    import sys as _sys

    def _stage(msg):
        print(f"# stage: {msg}", flush=True)

    _stage("make bf16 table")
    w_bf16 = make_bf16(jax.random.PRNGKey(0))
    _stage("quantize int8")
    w_int8 = jax.jit(quantize_weight)(w_bf16)
    _stage("quantize int4")
    w_int4 = jax.jit(quantize_weight4)(w_bf16)
    _stage("tables ready")
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((B, HIDDEN)), jnp.bfloat16
    )
    for name, w in (("int4", w_int4), ("int8", w_int8), ("bf16", w_bf16)):
        gib = sum(np.prod(l.shape) * l.dtype.itemsize
                  for l in jax.tree_util.tree_leaves(w)) / 2**30
        print(f"# {name} table: {gib:.3f} GiB")

    def bench(name, matmul, w):
        # The table must be a jit ARGUMENT: a closed-over array gets
        # embedded as a constant in the uploaded program and the tunnel's
        # remote compiler rejects the body (HTTP 413) or stalls.
        @jax.jit
        def run(x, w):
            # Chain iterations through a data dependency so XLA can't
            # batch the weight reads; mirrors decode's serial step shape.
            def step(h, _):
                out = matmul(h, w)[:, :VOCAB]
                bump = (out.max(axis=-1, keepdims=True) * 0).astype(h.dtype)
                return h + bump, ()

            h, _ = lax.scan(step, x, None, length=ITERS)
            return h

        print(f"# stage: compile {name}", flush=True)
        np.asarray(run(x, w))  # compile (block via host transfer)
        t0 = time.perf_counter()
        np.asarray(run(x, w))
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"{name}: {dt:.3f} ms/eval")
        return dt

    t4 = bench("int4", lambda h, w: quantized_matmul4(h, w), w_int4)
    t8 = bench("int8", lambda h, w: quantized_matmul(h, w), w_int8)
    tb = bench(
        "bf16",
        lambda h, w: jnp.einsum(
            "bh,vh->bv", h, w, preferred_element_type=jnp.float32
        ),
        w_bf16,
    )
    print(f"# int8/int4 ratio: {t8 / t4:.2f}  bf16/int4: {tb / t4:.2f}")


if __name__ == "__main__":
    main()
