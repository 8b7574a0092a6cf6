"""Probe 3: does lax.scan over stacked weights COPY each layer's slice?

probe_unpack*.py: every scan-over-stacked-layers MLP variant sustains
270-330 GB/s, while a SOLO quantized_matmul4 call on the same shapes
measures ~1 TB/s (tools/probe_int4_xla.py).  3x gap == read + write +
kernel-read, i.e. XLA materializing the scan xs slice before the
pallas_call consumes it.  Variants (gateup[37888,3584]+down[3584,18944]
int4, 28 layers):

  A. scan over stacked xs (current production structure)
  B. unrolled python loop over 28 per-layer arrays (direct operands)
  C. single-layer fori chain x64 (direct operands — the solo calibration)
  D. scan over layer INDEX, stacked array closed over, kernel index_map
     picks the layer block (PrefetchScalarGridSpec) — no XLA slice

Run: python tools/probe_scan_slice.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vis_tpu.ops.quantized import QuantizedWeight4, quantized_matmul4

HIDDEN, INTER, LAYERS = 3584, 18944, 28


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf).ravel()[:1]


def timeit(fn, *args, n=3, **kw):
    out = fn(*args, **kw)
    _sync(out)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def mlp_body(h, gq, gs, dq, ds):
    # scales arrive [2, out] (kernel layout); QuantizedWeight4 stores [out, 2]
    gu = quantized_matmul4(h, QuantizedWeight4(q=gq, scale=gs.T))
    g, u = jnp.split(gu, 2, axis=-1)
    act = (jax.nn.silu(g) * u).astype(jnp.bfloat16)
    d = quantized_matmul4(act, QuantizedWeight4(q=dq, scale=ds.T))
    return (h + d).astype(jnp.bfloat16)


# --- D. stacked-layer kernel with in-kernel layer pick -----------------------

def _q4_stacked_kernel(idx_ref, x_ref, qp_ref, scale_ref, o_ref):
    x = x_ref[...]
    half = qp_ref.shape[-1]
    b = qp_ref[0].astype(jnp.int32)
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
    o_ref[...] = (
        y_lo * scale_ref[0, 0, :][None, :]
        + y_hi * scale_ref[0, 1, :][None, :]
    )


def q4_matmul_stacked(x, q_stacked, scale_stacked, layer_idx):
    """x [B, I] @ q_stacked[layer_idx]^T — the layer slice is DMA'd inside
    the kernel via the index_map (no XLA-level slice materialization)."""
    n_layers, out_dim, half = q_stacked.shape
    in_dim = half * 2
    batch = x.shape[0]
    max_rows = max(128, (2 * 1024 * 1024) // max(1, half))
    block_o = 0
    for candidate in (2048, 1024, 512, 256, 128):
        if candidate <= max_rows and out_dim % candidate == 0:
            block_o = candidate
            break
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(out_dim // block_o,),
        in_specs=[
            pl.BlockSpec((batch, in_dim), lambda i, idx: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_o, half), lambda i, idx: (idx[0], i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, block_o), lambda i, idx: (idx[0], 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((batch, block_o), lambda i, idx: (0, i),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _q4_stacked_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((batch, out_dim), jnp.float32),
    )(jnp.asarray([layer_idx], jnp.int32), x.astype(jnp.bfloat16),
      q_stacked, scale_stacked)


def main():
    which = set((sys.argv[1] if len(sys.argv) > 1 else "ABCD").upper())
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def make():
        ks = jax.random.split(key, 2)
        gu_q = jax.random.bits(ks[0], (LAYERS, 2 * INTER, HIDDEN // 2), jnp.uint8)
        gu_s = jnp.full((LAYERS, 2, 2 * INTER), 0.01, jnp.float32)
        dn_q = jax.random.bits(ks[1], (LAYERS, HIDDEN, INTER // 2), jnp.uint8)
        dn_s = jnp.full((LAYERS, 2, HIDDEN), 0.01, jnp.float32)
        return gu_q, gu_s, dn_q, dn_s

    gu_q, gu_s, dn_q, dn_s = make()
    mlp_bytes = LAYERS * (gu_q[0].size + dn_q[0].size)
    print(f"int4 MLP stack bytes: {mlp_bytes/1e9:.3f} GB", flush=True)
    x0 = jnp.ones((1, HIDDEN), jnp.bfloat16) * 0.01
    STEPS = 32

    # A. scan over stacked xs --------------------------------------------------
    if "A" in which:
        def stack_scan(ws, x):
            def body(h, layer):
                gq, gs, dq, ds = layer
                return mlp_body(h, gq, gs, dq, ds), None
            out, _ = jax.lax.scan(body, x, ws)
            return out

        chain = jax.jit(lambda ws, x, n: jax.lax.fori_loop(
            0, n, lambda i, h: stack_scan(ws, h), x), static_argnames=("n",))
        t = timeit(lambda: chain((gu_q, gu_s, dn_q, dn_s), x0, STEPS))
        print(f"A. scan over xs:        {t/STEPS*1e3:7.3f} ms/pass "
              f"({mlp_bytes/(t/STEPS)/1e9:.0f} GB/s)", flush=True)

    # B. unrolled python loop --------------------------------------------------
    if "B" in which:
        per_layer = [
            (gu_q[i], gu_s[i], dn_q[i], dn_s[i]) for i in range(LAYERS)
        ]

        def unrolled(layers, x):
            h = x
            for (gq, gs, dq, ds) in layers:
                h = mlp_body(h, gq, gs, dq, ds)
            return h

        chain = jax.jit(lambda ls, x, n: jax.lax.fori_loop(
            0, n, lambda i, h: unrolled(ls, h), x), static_argnames=("n",))
        t = timeit(lambda: chain(per_layer, x0, STEPS), n=2)
        print(f"B. unrolled direct:     {t/STEPS*1e3:7.3f} ms/pass "
              f"({mlp_bytes/(t/STEPS)/1e9:.0f} GB/s)", flush=True)

    # C. single layer x LAYERS fori (direct operands) -------------------------
    if "C" in which:
        def single(ws, x, n):
            gq, gs, dq, ds = ws
            return jax.lax.fori_loop(
                0, n, lambda i, h: mlp_body(h, gq, gs, dq, ds), x)

        chain = jax.jit(single, static_argnames=("n",))
        t = timeit(lambda: chain((gu_q[0], gu_s[0], dn_q[0], dn_s[0]), x0,
                                 STEPS * LAYERS))
        one_bytes = gu_q[0].size + dn_q[0].size
        print(f"C. one layer, direct:   {t/(STEPS*LAYERS)*1e3:7.3f} ms/layer "
              f"({one_bytes/(t/(STEPS*LAYERS))/1e9:.0f} GB/s)", flush=True)

    # D. scan over index, in-kernel layer pick ---------------------------------
    if "D" not in which:
        return

    def mlp_body_stacked(h, idx, guq, gus, dnq, dns):
        gu = q4_matmul_stacked(h, guq, gus, idx)
        g, u = jnp.split(gu, 2, axis=-1)
        act = (jax.nn.silu(g) * u).astype(jnp.bfloat16)
        d = q4_matmul_stacked(act, dnq, dns, idx)
        return (h + d).astype(jnp.bfloat16)

    def stack_idx(ws, x):
        guq, gus, dnq, dns = ws

        def body(h, idx):
            return mlp_body_stacked(h, idx, guq, gus, dnq, dns), None
        out, _ = jax.lax.scan(body, x, jnp.arange(LAYERS, dtype=jnp.int32))
        return out

    chain = jax.jit(lambda ws, x, n: jax.lax.fori_loop(
        0, n, lambda i, h: stack_idx(ws, h), x), static_argnames=("n",))
    try:
        t = timeit(lambda: chain((gu_q, gu_s, dn_q, dn_s), x0, STEPS))
        print(f"D. scan idx, in-kernel: {t/STEPS*1e3:7.3f} ms/pass "
              f"({mlp_bytes/(t/STEPS)/1e9:.0f} GB/s)", flush=True)
    except Exception as exc:
        print(f"D. FAILED: {type(exc).__name__}: {str(exc)[:300]}", flush=True)


if __name__ == "__main__":
    main()
