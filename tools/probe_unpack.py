"""Probe int4 unpack variants inside the Pallas matmul kernel.

The decode-cost probe (tools/probe_decode_cost.py) shows the int4 matmul
stack sustaining ~310 GB/s — far under HBM — because the nibble unpack is
VPU-bound (~8 lane-ops/byte).  Variants measured here, MLP-stack shape
(28 layers of gateup[37888,3584] + down[3584,18944]):

  A. current _q4_matmul_kernel (baseline)
  B. folded-bias unpack: w_lo = (b & 15), w_hi = (b >> 4), the -8 folded
     into y -= 8 * sum(x_half) — 5 lane-ops/byte instead of 8
  C. native jnp.int4 storage, hardware convert in-kernel
  D. int8 fused MLP (calibrates what a 1-convert unpack sustains)
  E. HBM copy floor (u8 round-trip)

Run: python tools/probe_unpack.py
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


# -- variant B: folded-bias unpack kernel -----------------------------------

def _q4_matmul_kernel_folded(x_ref, qp_ref, scale_ref, o_ref):
    x = x_ref[...]
    half = qp_ref.shape[1]
    b = qp_ref[...].astype(jnp.int32)
    w_lo = (b & 15).astype(jnp.bfloat16)      # stored value+8, bias folded out
    w_hi = (b >> 4).astype(jnp.bfloat16)      # high bits already zero
    x_lo = x[:, :half]
    x_hi = x[:, half:]
    y_lo = jax.lax.dot_general(
        x_lo, w_lo, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) - 8.0 * jnp.sum(x_lo.astype(jnp.float32), axis=1, keepdims=True)
    y_hi = jax.lax.dot_general(
        x_hi, w_hi, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) - 8.0 * jnp.sum(x_hi.astype(jnp.float32), axis=1, keepdims=True)
    o_ref[...] = (
        y_lo * scale_ref[0, :][None, :] + y_hi * scale_ref[1, :][None, :]
    )


def q4_matmul_folded(x, q, scale):
    out_dim, half = q.shape
    in_dim = half * 2
    batch = x.shape[0]
    max_rows = max(128, (2 * 1024 * 1024) // max(1, half))
    block_o = 0
    for candidate in (2048, 1024, 512, 256, 128):
        if candidate <= max_rows and out_dim % candidate == 0:
            block_o = candidate
            break
    return pl.pallas_call(
        _q4_matmul_kernel_folded,
        out_shape=jax.ShapeDtypeStruct((batch, out_dim), jnp.float32),
        grid=(out_dim // block_o,),
        in_specs=[
            pl.BlockSpec((batch, in_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_o, half), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, block_o), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((batch, block_o), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(x.astype(jnp.bfloat16), q, scale)


# -- variant C: native int4 ---------------------------------------------------

def _i4_matmul_kernel(x_ref, q_ref, scale_ref, o_ref):
    x = x_ref[...]
    w = q_ref[...].astype(jnp.bfloat16)
    y = jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[...] = y * scale_ref[0, :][None, :]


def i4_matmul(x, q, scale):
    out_dim, in_dim = q.shape
    batch = x.shape[0]
    max_rows = max(128, (2 * 1024 * 1024) // max(1, in_dim // 2))
    block_o = 0
    for candidate in (2048, 1024, 512, 256, 128):
        if candidate <= max_rows and out_dim % candidate == 0:
            block_o = candidate
            break
    return pl.pallas_call(
        _i4_matmul_kernel,
        out_shape=jax.ShapeDtypeStruct((batch, out_dim), jnp.float32),
        grid=(out_dim // block_o,),
        in_specs=[
            pl.BlockSpec((batch, in_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_o, in_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_o), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((batch, block_o), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(x.astype(jnp.bfloat16), q, scale)


def main():
    print(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)

    @jax.jit
    def make():
        ks = jax.random.split(key, 6)
        gu_q = jax.random.bits(ks[0], (LAYERS, 2 * INTER, HIDDEN // 2), jnp.uint8)
        gu_s = jnp.full((LAYERS, 2, 2 * INTER), 0.01, jnp.float32)
        dn_q = jax.random.bits(ks[1], (LAYERS, HIDDEN, INTER // 2), jnp.uint8)
        dn_s = jnp.full((LAYERS, 2, HIDDEN), 0.01, jnp.float32)
        return gu_q, gu_s, dn_q, dn_s

    gu_q, gu_s, dn_q, dn_s = make()
    mlp_bytes = LAYERS * (gu_q[0].size + dn_q[0].size)
    print(f"MLP stack bytes: {mlp_bytes/1e9:.3f} GB")

    x0 = jnp.ones((1, HIDDEN), jnp.bfloat16) * 0.01
    STEPS = 32

    # A. current kernel ------------------------------------------------------
    from vis_tpu.ops.quantized import QuantizedWeight4, quantized_matmul4

    def stack_current(ws, x):
        guq, gus, dnq, dns = ws

        def body(h, layer):
            gq, gs, dq, ds = layer
            gu = quantized_matmul4(h, QuantizedWeight4(q=gq, scale=gs.T))
            g, u = jnp.split(gu, 2, axis=-1)
            act = (jax.nn.silu(g) * u).astype(jnp.bfloat16)
            d = quantized_matmul4(act, QuantizedWeight4(q=dq, scale=ds.T))
            return (h + d).astype(jnp.bfloat16), None

        out, _ = jax.lax.scan(body, x, (guq, gus, dnq, dns))
        return out

    chain = jax.jit(lambda ws, x, n: jax.lax.fori_loop(
        0, n, lambda i, h: stack_current(ws, h), x), static_argnames=("n",))
    t = timeit(lambda: chain((gu_q, gu_s, dn_q, dn_s), x0, STEPS))
    print(f"A. current kernel:   {t/STEPS*1e3:7.3f} ms/pass "
          f"({mlp_bytes/(t/STEPS)/1e9:.0f} GB/s)")

    # B. folded-bias ----------------------------------------------------------
    def stack_folded(ws, x):
        guq, gus, dnq, dns = ws

        def body(h, layer):
            gq, gs, dq, ds = layer
            gu = q4_matmul_folded(h, gq, gs)
            g, u = jnp.split(gu, 2, axis=-1)
            act = (jax.nn.silu(g) * u).astype(jnp.bfloat16)
            d = q4_matmul_folded(act, dq, ds)
            return (h + d).astype(jnp.bfloat16), None

        out, _ = jax.lax.scan(body, x, (guq, gus, dnq, dns))
        return out

    chain = jax.jit(lambda ws, x, n: jax.lax.fori_loop(
        0, n, lambda i, h: stack_folded(ws, h), x), static_argnames=("n",))
    t = timeit(lambda: chain((gu_q, gu_s, dn_q, dn_s), x0, STEPS))
    print(f"B. folded-bias:      {t/STEPS*1e3:7.3f} ms/pass "
          f"({mlp_bytes/(t/STEPS)/1e9:.0f} GB/s)")

    # C. native int4 ----------------------------------------------------------
    sys.stdout.flush()
    try:
        @jax.jit
        def make_i4():
            ks = jax.random.split(key, 2)
            gu = jax.random.randint(
                ks[0], (LAYERS, 2 * INTER, HIDDEN), -7, 8, jnp.int8
            ).astype(jnp.int4)
            dn = jax.random.randint(
                ks[1], (LAYERS, HIDDEN, INTER), -7, 8, jnp.int8
            ).astype(jnp.int4)
            gs = jnp.full((LAYERS, 1, 2 * INTER), 0.01, jnp.float32)
            ds = jnp.full((LAYERS, 1, HIDDEN), 0.01, jnp.float32)
            return gu, gs, dn, ds

        gu4, gs4, dn4, ds4 = make_i4()

        def stack_i4(ws, x):
            guq, gus, dnq, dns = ws

            def body(h, layer):
                gq, gs, dq, ds = layer
                gu = i4_matmul(h, gq, gs)
                g, u = jnp.split(gu, 2, axis=-1)
                act = (jax.nn.silu(g) * u).astype(jnp.bfloat16)
                d = i4_matmul(act, dq, ds)
                return (h + d).astype(jnp.bfloat16), None

            out, _ = jax.lax.scan(body, x, (guq, gus, dnq, dns))
            return out

        chain = jax.jit(lambda ws, x, n: jax.lax.fori_loop(
            0, n, lambda i, h: stack_i4(ws, h), x), static_argnames=("n",))
        t = timeit(lambda: chain((gu4, gs4, dn4, ds4), x0, STEPS))
        print(f"C. native int4:      {t/STEPS*1e3:7.3f} ms/pass "
              f"({mlp_bytes/(t/STEPS)/1e9:.0f} GB/s)")
    except Exception as exc:
        print(f"C. native int4: UNSUPPORTED ({type(exc).__name__}: "
              f"{str(exc)[:200]})")

    # D. int8 fused MLP --------------------------------------------------------
    sys.stdout.flush()
    try:
        del gu4, gs4, dn4, ds4
    except NameError:
        pass
    from vis_tpu.ops.quantized import QuantizedWeight, fused_swiglu_mlp

    @jax.jit
    def make_i8():
        ks = jax.random.split(key, 2)
        gu = jax.random.randint(ks[0], (LAYERS, 2 * INTER, HIDDEN), -127, 128,
                                jnp.int32).astype(jnp.int8)
        dn = jax.random.randint(ks[1], (LAYERS, HIDDEN, INTER), -127, 128,
                                jnp.int32).astype(jnp.int8)
        gs = jnp.full((LAYERS, 2 * INTER), 0.0001, jnp.float32)
        ds = jnp.full((LAYERS, HIDDEN), 0.0001, jnp.float32)
        return gu, gs, dn, ds

    gu8, gs8, dn8, ds8 = make_i8()
    i8_bytes = LAYERS * (gu8[0].size + dn8[0].size)

    def stack_i8(ws, x):
        guq, gus, dnq, dns = ws

        def body(h, layer):
            gq, gs, dq, ds = layer
            out = fused_swiglu_mlp(
                h, QuantizedWeight(q=gq, scale=gs),
                QuantizedWeight(q=dq, scale=ds),
            )
            return (h + out).astype(jnp.bfloat16), None

        out, _ = jax.lax.scan(body, x, (guq, gus, dnq, dns))
        return out

    chain = jax.jit(lambda ws, x, n: jax.lax.fori_loop(
        0, n, lambda i, h: stack_i8(ws, h), x), static_argnames=("n",))
    t = timeit(lambda: chain((gu8, gs8, dn8, ds8), x0, STEPS))
    print(f"D. int8 fused MLP:   {t/STEPS*1e3:7.3f} ms/pass "
          f"({i8_bytes/(t/STEPS)/1e9:.0f} GB/s over 2x bytes)")

    # E. HBM copy floor ---------------------------------------------------------
    sys.stdout.flush()
    del gu8, gs8, dn8, ds8, gu_q, gu_s, dn_q, dn_s
    big = jax.random.bits(key, (2 * 1024, 1024, 1024), jnp.uint8)  # 2 GB

    @partial(jax.jit, donate_argnums=(0,))
    def flip(x):
        return x ^ jnp.uint8(1)

    out = flip(big)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(4):
        out = flip(out)
    _sync(out)
    t = (time.perf_counter() - t0) / 4
    print(f"E. HBM u8 xor pass:  {t*1e3:7.3f} ms "
          f"({2 * out.size/(t)/1e9:.0f} GB/s read+write)")


if __name__ == "__main__":
    main()
