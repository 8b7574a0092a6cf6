"""Probe 2: can the MXU eat quantized weights without a per-byte VPU cast?

probe_unpack.py showed BOTH int4 (8 lane-ops/byte) and int8 (1 cast/byte)
sustaining only ~290 GB/s — the per-byte VPU work (convert to bf16) is the
wall, not HBM.  If dot_general can take int8 operands natively (MXU
s8 x s8 -> s32), weight bytes go VMEM -> MXU with NO elementwise pass, and
int4 only pays a nibble->i8 split (cheaper lanes than ->bf16?).

Variants, MLP-stack shape (28 x gateup[37888,3584] + down[3584,18944]):
  S. stream floor: read the u8 block, emit block-sum — the DMA bound
  F. int8 native dot: x_i8 [1,I] . w_i8 [bi,I] -> i32, scale after
  G. mixed dot: x bf16 . w i8 directly (does Mosaic take it? how fast?)
  H. int4 -> i8 unpack via i32 staging, then i8 dot
  I. int4 -> i8 unpack via i8 bitcast + i8 shifts (signed-nibble storage)
  K. int4 -> bf16 (current) but dot in ONE fused [2*half] layout

Run: python tools/probe_unpack2.py
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


def pick_block(out_dim, bytes_per_row, budget=2 * 1024 * 1024):
    max_rows = max(128, budget // max(1, bytes_per_row))
    for candidate in (2048, 1024, 512, 256, 128):
        if candidate <= max_rows and out_dim % candidate == 0:
            return candidate
    return 128


# --- S. stream floor ---------------------------------------------------------

def _stream_kernel(q_ref, o_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    o_ref[...] += jnp.sum(q_ref[...].astype(jnp.int32)).reshape(1, 1)


def stream_pass(q):
    out_dim, width = q.shape
    block_o = pick_block(out_dim, width)
    return pl.pallas_call(
        _stream_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        grid=(out_dim // block_o,),
        in_specs=[pl.BlockSpec((block_o, width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
    )(q)


# --- F. int8 native dot ------------------------------------------------------

def _i8dot_kernel(x_ref, q_ref, scale_ref, o_ref):
    x = x_ref[...]                       # [B, I] int8
    w = q_ref[...]                       # [bo, I] int8
    y = jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    o_ref[...] = y.astype(jnp.float32) * scale_ref[0, :][None, :]


def i8_dot(x_i8, q, scale):
    out_dim, in_dim = q.shape
    batch = x_i8.shape[0]
    block_o = pick_block(out_dim, in_dim)
    return pl.pallas_call(
        _i8dot_kernel,
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
    )(x_i8, q, scale)


# --- G. mixed bf16 x i8 dot --------------------------------------------------

def _mixdot_kernel(x_ref, q_ref, scale_ref, o_ref):
    x = x_ref[...]                       # [B, I] bf16
    w = q_ref[...]                       # [bo, I] int8 — no astype
    y = jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[...] = y * scale_ref[0, :][None, :]


def mix_dot(x, q, scale):
    out_dim, in_dim = q.shape
    batch = x.shape[0]
    block_o = pick_block(out_dim, in_dim)
    return pl.pallas_call(
        _mixdot_kernel,
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


# --- H. int4 -> i8 via i32 staging, i8 dot ----------------------------------

def _q4i8_kernel(x_ref, qp_ref, scale_ref, o_ref):
    x = x_ref[...]                       # [B, I] int8 (quantized activation)
    half = qp_ref.shape[1]
    b = qp_ref[...].astype(jnp.int32)
    w_lo = ((b & 15) - 8).astype(jnp.int8)
    w_hi = ((b >> 4) - 8).astype(jnp.int8)
    y_lo = jax.lax.dot_general(
        x[:, :half], w_lo, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y_hi = jax.lax.dot_general(
        x[:, half:], w_hi, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[...] = (
        y_lo.astype(jnp.float32) * scale_ref[0, :][None, :]
        + y_hi.astype(jnp.float32) * scale_ref[1, :][None, :]
    )


def q4_i8dot(x_i8, q, scale):
    out_dim, half = q.shape
    batch = x_i8.shape[0]
    block_o = pick_block(out_dim, half)
    return pl.pallas_call(
        _q4i8_kernel,
        out_shape=jax.ShapeDtypeStruct((batch, out_dim), jnp.float32),
        grid=(out_dim // block_o,),
        in_specs=[
            pl.BlockSpec((batch, half * 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_o, half), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, block_o), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((batch, block_o), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(x_i8, q, scale)


# --- I. int4 -> i8 via i8 shifts (signed-nibble storage) ---------------------

def _q4i8s_kernel(x_ref, qp_ref, scale_ref, o_ref):
    x = x_ref[...]
    half = qp_ref.shape[1]
    b8 = pltpu.bitcast(qp_ref[...], jnp.int8)
    w_lo = (b8 << 4) >> 4                # signed low nibble
    w_hi = b8 >> 4                       # signed high nibble (arith shift)
    y_lo = jax.lax.dot_general(
        x[:, :half], w_lo, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y_hi = jax.lax.dot_general(
        x[:, half:], w_hi, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[...] = (
        y_lo.astype(jnp.float32) * scale_ref[0, :][None, :]
        + y_hi.astype(jnp.float32) * scale_ref[1, :][None, :]
    )


def q4_i8s_dot(x_i8, q, scale):
    out_dim, half = q.shape
    batch = x_i8.shape[0]
    block_o = pick_block(out_dim, half)
    return pl.pallas_call(
        _q4i8s_kernel,
        out_shape=jax.ShapeDtypeStruct((batch, out_dim), jnp.float32),
        grid=(out_dim // block_o,),
        in_specs=[
            pl.BlockSpec((batch, half * 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_o, half), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, block_o), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((batch, block_o), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(x_i8, q, scale)


def quant_act(h):
    """Per-row dynamic int8 activation quantization (VPU, tiny)."""
    s = jnp.maximum(jnp.max(jnp.abs(h), axis=-1, keepdims=True), 1e-6) / 127.0
    return jnp.clip(jnp.round(h / s), -127, 127).astype(jnp.int8), s


def main():
    print(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)

    @jax.jit
    def make():
        ks = jax.random.split(key, 4)
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

    # S. stream floor ---------------------------------------------------------
    def stream_stack(ws):
        guq, dnq = ws

        def body(acc, layer):
            gq, dq = layer
            acc = acc + stream_pass(gq)[0, 0] + stream_pass(dq)[0, 0]
            return acc, None

        out, _ = jax.lax.scan(body, jnp.int32(0), (guq, dnq))
        return out

    chain = jax.jit(lambda ws, n: jax.lax.fori_loop(
        0, n, lambda i, a: a ^ stream_stack(ws), jnp.int32(0)),
        static_argnames=("n",))
    try:
        t = timeit(lambda: chain((gu_q, dn_q), STEPS))
        print(f"S. u8 stream floor:  {t/STEPS*1e3:7.3f} ms/pass "
              f"({mlp_bytes/(t/STEPS)/1e9:.0f} GB/s)", flush=True)
    except Exception as exc:
        print(f"S. FAILED: {type(exc).__name__}: {str(exc)[:160]}", flush=True)

    # F/G need int8 weights ---------------------------------------------------
    @jax.jit
    def make_i8():
        ks = jax.random.split(key, 2)
        gu = jax.random.randint(ks[0], (LAYERS, 2 * INTER, HIDDEN), -127, 128,
                                jnp.int32).astype(jnp.int8)
        dn = jax.random.randint(ks[1], (LAYERS, HIDDEN, INTER), -127, 128,
                                jnp.int32).astype(jnp.int8)
        gs = jnp.full((LAYERS, 1, 2 * INTER), 0.0001, jnp.float32)
        ds = jnp.full((LAYERS, 1, HIDDEN), 0.0001, jnp.float32)
        return gu, gs, dn, ds

    gu8, gs8, dn8, ds8 = make_i8()
    i8_bytes = LAYERS * (gu8[0].size + dn8[0].size)

    # F. int8 native dot -----------------------------------------------------
    def stack_f(ws, x):
        guq, gus, dnq, dns = ws

        def body(h, layer):
            gq, gs, dq, ds = layer
            h8, hs = quant_act(h)
            gu = i8_dot(h8, gq, gs) * hs
            g, u = jnp.split(gu, 2, axis=-1)
            act = (jax.nn.silu(g) * u).astype(jnp.bfloat16)
            a8, as_ = quant_act(act)
            d = i8_dot(a8, dq, ds) * as_
            return (h + d).astype(jnp.bfloat16), None

        out, _ = jax.lax.scan(body, x, (guq, gus, dnq, dns))
        return out

    chain = jax.jit(lambda ws, x, n: jax.lax.fori_loop(
        0, n, lambda i, h: stack_f(ws, h), x), static_argnames=("n",))
    try:
        t = timeit(lambda: chain((gu8, gs8, dn8, ds8), x0, STEPS))
        print(f"F. i8 native dot:    {t/STEPS*1e3:7.3f} ms/pass "
              f"({i8_bytes/(t/STEPS)/1e9:.0f} GB/s over 2x bytes)", flush=True)
    except Exception as exc:
        print(f"F. FAILED: {type(exc).__name__}: {str(exc)[:160]}", flush=True)

    # G. mixed bf16 x i8 dot --------------------------------------------------
    def stack_g(ws, x):
        guq, gus, dnq, dns = ws

        def body(h, layer):
            gq, gs, dq, ds = layer
            gu = mix_dot(h, gq, gs)
            g, u = jnp.split(gu, 2, axis=-1)
            act = (jax.nn.silu(g) * u).astype(jnp.bfloat16)
            d = mix_dot(act, dq, ds)
            return (h + d).astype(jnp.bfloat16), None

        out, _ = jax.lax.scan(body, x, (guq, gus, dnq, dns))
        return out

    chain = jax.jit(lambda ws, x, n: jax.lax.fori_loop(
        0, n, lambda i, h: stack_g(ws, h), x), static_argnames=("n",))
    try:
        t = timeit(lambda: chain((gu8, gs8, dn8, ds8), x0, STEPS))
        print(f"G. bf16 x i8 dot:    {t/STEPS*1e3:7.3f} ms/pass "
              f"({i8_bytes/(t/STEPS)/1e9:.0f} GB/s over 2x bytes)", flush=True)
    except Exception as exc:
        print(f"G. FAILED: {type(exc).__name__}: {str(exc)[:160]}", flush=True)

    del gu8, gs8, dn8, ds8

    # H. int4 -> i8 staging dot ----------------------------------------------
    def stack_h(ws, x):
        guq, gus, dnq, dns = ws

        def body(h, layer):
            gq, gs, dq, ds = layer
            h8, hs = quant_act(h)
            gu = q4_i8dot(h8, gq, gs) * hs
            g, u = jnp.split(gu, 2, axis=-1)
            act = (jax.nn.silu(g) * u).astype(jnp.bfloat16)
            a8, as_ = quant_act(act)
            d = q4_i8dot(a8, dq, ds) * as_
            return (h + d).astype(jnp.bfloat16), None

        out, _ = jax.lax.scan(body, x, (guq, gus, dnq, dns))
        return out

    chain = jax.jit(lambda ws, x, n: jax.lax.fori_loop(
        0, n, lambda i, h: stack_h(ws, h), x), static_argnames=("n",))
    try:
        t = timeit(lambda: chain((gu_q, gu_s, dn_q, dn_s), x0, STEPS))
        print(f"H. q4->i8 (i32) dot: {t/STEPS*1e3:7.3f} ms/pass "
              f"({mlp_bytes/(t/STEPS)/1e9:.0f} GB/s)", flush=True)
    except Exception as exc:
        print(f"H. FAILED: {type(exc).__name__}: {str(exc)[:160]}", flush=True)

    # I. int4 -> i8 via i8 shifts ----------------------------------------------
    def stack_i(ws, x):
        guq, gus, dnq, dns = ws

        def body(h, layer):
            gq, gs, dq, ds = layer
            h8, hs = quant_act(h)
            gu = q4_i8s_dot(h8, gq, gs) * hs
            g, u = jnp.split(gu, 2, axis=-1)
            act = (jax.nn.silu(g) * u).astype(jnp.bfloat16)
            a8, as_ = quant_act(act)
            d = q4_i8s_dot(a8, dq, ds) * as_
            return (h + d).astype(jnp.bfloat16), None

        out, _ = jax.lax.scan(body, x, (guq, gus, dnq, dns))
        return out

    chain = jax.jit(lambda ws, x, n: jax.lax.fori_loop(
        0, n, lambda i, h: stack_i(ws, h), x), static_argnames=("n",))
    try:
        t = timeit(lambda: chain((gu_q, gu_s, dn_q, dn_s), x0, STEPS))
        print(f"I. q4->i8 (i8<<) dot:{t/STEPS*1e3:7.3f} ms/pass "
              f"({mlp_bytes/(t/STEPS)/1e9:.0f} GB/s)", flush=True)
    except Exception as exc:
        print(f"I. FAILED: {type(exc).__name__}: {str(exc)[:160]}", flush=True)


if __name__ == "__main__":
    main()
