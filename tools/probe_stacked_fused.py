"""Probe 4: compose the in-kernel layer pick (probe 3 D: 478 GB/s) with
(a) folded-bias unpack (probe 1 B: +8%) and (b) a fused gateup+down MLP
region (saves one ~17us region boundary + keeps the intermediate in VMEM).
Also sweeps the 152k int4 vocab head (only ~300 GB/s today) block sizes.

Shapes: 7B MLP stack (28 x gateup[37888,3584] + down[3584,18944] int4),
head [152064, 3584] int4.

Run: python tools/probe_stacked_fused.py [variants]
  variants: D=stacked pick (reference), E=stacked+folded, F=fused MLP,
            H=head sweep
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


def pick_block(out_dim, half, budget=2 * 1024 * 1024):
    max_rows = max(128, budget // max(1, half))
    for candidate in (2048, 1024, 512, 256, 128):
        if candidate <= max_rows and out_dim % candidate == 0:
            return candidate
    return 0


# --- E. stacked + folded-bias unpack ----------------------------------------

def _q4_stacked_folded_kernel(idx_ref, x_ref, qp_ref, scale_ref, o_ref):
    x = x_ref[...]
    half = qp_ref.shape[-1]
    b = qp_ref[0].astype(jnp.int32)
    w_lo = (b & 15).astype(jnp.bfloat16)
    w_hi = (b >> 4).astype(jnp.bfloat16)
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
        y_lo * scale_ref[0, 0, :][None, :]
        + y_hi * scale_ref[0, 1, :][None, :]
    )


def q4_stacked(x, q_stacked, scale_stacked, layer_idx, kernel):
    n_layers, out_dim, half = q_stacked.shape
    in_dim = half * 2
    batch = x.shape[0]
    block_o = pick_block(out_dim, half)
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
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((batch, out_dim), jnp.float32),
    )(jnp.asarray([layer_idx], jnp.int32), x.astype(jnp.bfloat16),
      q_stacked, scale_stacked)


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


# --- F. fused gateup+down MLP, stacked + folded ------------------------------

def _q4_fused_mlp_kernel(idx_ref, x_ref, gq_ref, gs_ref, dq_ref, ds_ref,
                         o_ref, *, inter_block):
    """Grid step j handles intermediate rows [j*bi, (j+1)*bi): computes
    g/u for that slab from the gateup block, applies SwiGLU, multiplies by
    the matching down block, accumulates into o.  gate rows live at
    [j*bi ..] and up rows at [inter + j*bi ..] of the fused gateup array —
    two block views of the same operand."""
    x = x_ref[...]                       # [B, H] bf16
    halfh = gq_ref.shape[-1]             # HIDDEN // 2
    b = gq_ref[0].astype(jnp.int32)      # [2*bi, H/2] packed (gate;up rows)
    w_lo = (b & 15).astype(jnp.bfloat16)
    w_hi = (b >> 4).astype(jnp.bfloat16)
    x_lo = x[:, :halfh]
    x_hi = x[:, halfh:]
    corr_lo = 8.0 * jnp.sum(x_lo.astype(jnp.float32), axis=1, keepdims=True)
    corr_hi = 8.0 * jnp.sum(x_hi.astype(jnp.float32), axis=1, keepdims=True)
    y = (
        (jax.lax.dot_general(x_lo, w_lo, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) - corr_lo)
        * gs_ref[0, 0, :][None, :]
        + (jax.lax.dot_general(x_hi, w_hi, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32) - corr_hi)
        * gs_ref[0, 1, :][None, :]
    )                                     # [B, 2*bi]
    g = y[:, :inter_block]
    u = y[:, inter_block:]
    act = (g * jax.nn.sigmoid(g) * u).astype(jnp.bfloat16)   # [B, bi]
    act_lo = act[:, : inter_block // 2]
    act_hi = act[:, inter_block // 2:]
    db = dq_ref[0].astype(jnp.int32)      # [H, bi/2] packed for this slab
    d_lo = (db & 15).astype(jnp.bfloat16)
    d_hi = (db >> 4).astype(jnp.bfloat16)
    dcorr_lo = 8.0 * jnp.sum(act_lo.astype(jnp.float32), axis=1, keepdims=True)
    dcorr_hi = 8.0 * jnp.sum(act_hi.astype(jnp.float32), axis=1, keepdims=True)
    d = (
        (jax.lax.dot_general(act_lo, d_lo, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) - dcorr_lo)
        * ds_ref[0, 0, :][None, :]
        + (jax.lax.dot_general(act_hi, d_hi, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32) - dcorr_hi)
        * ds_ref[0, 1, :][None, :]
    )                                     # [B, H]

    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    o_ref[...] += d


def q4_fused_mlp(x, gq, gs, dq, ds, layer_idx, inter_block=1184):
    """Fused SwiGLU MLP over stacked int4 weights with in-kernel layer pick.

    Layout contract (per layer): gq [L, 2*INTER, H/2] fused gate;up rows,
    per-slab interleave-compatible: slab j uses gate rows [j*bi,(j+1)*bi)
    and up rows [INTER + j*bi, ...).  dq is [L, H, INTER/2] packed over the
    intermediate dim — slab j's columns are [j*bi/2, (j+1)*bi/2) ONLY IF the
    down packing pairs element k with k + INTER/2... which it does NOT.
    For THIS probe dq is repacked per-slab (dq2 [L, blocks, H, bi/2]) so
    each slab is self-contained: byte b of slab j packs act elements
    (j*bi + b) and (j*bi + bi/2 + b)."""
    n_layers, twointer, halfh = gq.shape
    inter = twointer // 2
    batch = x.shape[0]
    blocks = inter // inter_block
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((batch, halfh * 2), lambda j, idx: (0, 0),
                         memory_space=pltpu.VMEM),
            # gate rows j*bi.. and up rows at block offset (inter/bi + j)
            # can't be one contiguous block; the probe pre-interleaves gq
            # into [L, blocks, 2*bi, H/2] so slab j is gq2[idx, j].
            pl.BlockSpec((1, 1, 2 * inter_block, halfh),
                         lambda j, idx: (idx[0], j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, 2 * inter_block),
                         lambda j, idx: (idx[0], j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, HIDDEN, inter_block // 2),
                         lambda j, idx: (idx[0], j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, HIDDEN),
                         lambda j, idx: (idx[0], j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((batch, HIDDEN), lambda j, idx: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = partial(_q4_fused_mlp_kernel, inter_block=inter_block)

    def fixed(idx_ref, x_ref, gq_ref, gs_ref, dq_ref, ds_ref, o_ref):
        kernel(idx_ref, x_ref, gq_ref[:, 0], gs_ref[:, 0], dq_ref[:, 0],
               ds_ref[:, 0], o_ref)

    return pl.pallas_call(
        fixed,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((batch, HIDDEN), jnp.float32),
    )(jnp.asarray([layer_idx], jnp.int32), x.astype(jnp.bfloat16),
      gq, gs, dq, ds)


def main():
    which = set((sys.argv[1] if len(sys.argv) > 1 else "DEFH").upper())
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    STEPS = 32

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

    def run_stack(tag, kernel):
        def body_fn(ws, x):
            guq, gus, dnq, dns = ws

            def body(h, idx):
                gu = q4_stacked(h, guq, gus, idx, kernel)
                g, u = jnp.split(gu, 2, axis=-1)
                act = (jax.nn.silu(g) * u).astype(jnp.bfloat16)
                d = q4_stacked(act, dnq, dns, idx, kernel)
                return (h + d).astype(jnp.bfloat16), None

            out, _ = jax.lax.scan(body, x, jnp.arange(LAYERS, dtype=jnp.int32))
            return out

        chain = jax.jit(lambda ws, x, n: jax.lax.fori_loop(
            0, n, lambda i, h: body_fn(ws, h), x), static_argnames=("n",))
        t = timeit(lambda: chain((gu_q, gu_s, dn_q, dn_s), x0, STEPS))
        print(f"{tag} {t/STEPS*1e3:7.3f} ms/pass "
              f"({mlp_bytes/(t/STEPS)/1e9:.0f} GB/s)", flush=True)

    if "D" in which:
        try:
            run_stack("D. stacked pick:      ", _q4_stacked_kernel)
        except Exception as exc:
            print(f"D. FAILED: {type(exc).__name__}: {str(exc)[:200]}",
                  flush=True)

    if "E" in which:
        try:
            run_stack("E. stacked + folded:  ", _q4_stacked_folded_kernel)
        except Exception as exc:
            print(f"E. FAILED: {type(exc).__name__}: {str(exc)[:200]}",
                  flush=True)

    # F. fused MLP --------------------------------------------------------
    if "F" in which:
        bi = 1184  # 18944 / 16 slabs
        blocks = INTER // bi

        @jax.jit
        def repack(guq, gus, dnq, dns):
            # gq2: [L, blocks, 2*bi, H/2] — slab j = gate rows then up rows
            gate = guq[:, :INTER].reshape(LAYERS, blocks, bi, HIDDEN // 2)
            up = guq[:, INTER:].reshape(LAYERS, blocks, bi, HIDDEN // 2)
            gq2 = jnp.concatenate([gate, up], axis=2)
            gs_gate = gus[:, :, :INTER].reshape(LAYERS, 2, blocks, bi)
            gs_up = gus[:, :, INTER:].reshape(LAYERS, 2, blocks, bi)
            gs2 = jnp.concatenate([gs_gate, gs_up], axis=3).transpose(0, 2, 1, 3)
            # dq2: [L, blocks, H, bi/2] — slab j packs act (j*bi + b, j*bi
            # + bi/2 + b).  Source dq packs (k, k + INTER/2); rebuild from
            # nibbles.
            lo = (dnq & 15).astype(jnp.uint8)          # elements [0, I/2)
            hi = (dnq >> 4).astype(jnp.uint8)          # elements [I/2, I)
            full = jnp.concatenate([lo, hi], axis=-1)  # [L, H, INTER] nibbles
            slab = full.reshape(LAYERS, HIDDEN, blocks, bi).transpose(0, 2, 1, 3)
            s_lo = slab[..., : bi // 2]
            s_hi = slab[..., bi // 2:]
            dq2 = (s_lo | (s_hi << 4))                 # [L, blocks, H, bi/2]
            # per-slab scales: source scale [L, 2, H] applies per input
            # HALF of the ORIGINAL packing — after repack, slab columns
            # [0, bi/2) came from the lo half and [bi/2, bi) from hi, so
            # scale rows stay (lo, hi) per slab, broadcast over slabs.
            ds2 = jnp.broadcast_to(
                dns[:, None], (LAYERS, blocks, 2, HIDDEN)
            )
            return gq2, gs2, dq2, ds2

        gq2, gs2, dq2, ds2 = repack(gu_q, gu_s, dn_q, dn_s)

        def body_fn(ws, x):
            gq2_, gs2_, dq2_, ds2_ = ws

            def body(h, idx):
                d = q4_fused_mlp(h, gq2_, gs2_, dq2_, ds2_, idx,
                                 inter_block=bi)
                return (h + d).astype(jnp.bfloat16), None

            out, _ = jax.lax.scan(body, x, jnp.arange(LAYERS, dtype=jnp.int32))
            return out

        chain = jax.jit(lambda ws, x, n: jax.lax.fori_loop(
            0, n, lambda i, h: body_fn(ws, h), x), static_argnames=("n",))
        try:
            t = timeit(lambda: chain((gq2, gs2, dq2, ds2), x0, STEPS))
            print(f"F. fused MLP region:   {t/STEPS*1e3:7.3f} ms/pass "
                  f"({mlp_bytes/(t/STEPS)/1e9:.0f} GB/s)", flush=True)
        except Exception as exc:
            print(f"F. FAILED: {type(exc).__name__}: {str(exc)[:200]}",
                  flush=True)

    # H. vocab head block sweep -------------------------------------------
    if "H" in which:
        VOCAB = 152064

        @jax.jit
        def make_head():
            q = jax.random.bits(key, (VOCAB, HIDDEN // 2), jnp.uint8)
            s = jnp.full((2, VOCAB), 0.01, jnp.float32)
            return q, s

        hq, hs = make_head()
        head_bytes = hq.size

        def head_block_call(x, q, s, block_o, kernel):
            out_dim, half = q.shape
            batch = x.shape[0]
            return pl.pallas_call(
                kernel,
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
            )(x.astype(jnp.bfloat16), q, s)

        def flat_folded(x_ref, qp_ref, scale_ref, o_ref):
            x = x_ref[...]
            half = qp_ref.shape[-1]
            b = qp_ref[...].astype(jnp.int32)
            w_lo = (b & 15).astype(jnp.bfloat16)
            w_hi = (b >> 4).astype(jnp.bfloat16)
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
                y_lo * scale_ref[0, :][None, :]
                + y_hi * scale_ref[1, :][None, :]
            )

        for block in (512, 1024, 2048):
            if VOCAB % block:
                pad = block - VOCAB % block
                hq_p = jnp.pad(hq, ((0, pad), (0, 0)))
                hs_p = jnp.pad(hs, ((0, 0), (0, pad)))
            else:
                hq_p, hs_p = hq, hs

            def head_chain(q, s, x, n, block=block):
                def step(i, h):
                    y = head_block_call(h, q, s, block, flat_folded)
                    return jnp.tanh(y[:, :HIDDEN]).astype(jnp.bfloat16)
                return jax.lax.fori_loop(0, n, step, x)

            chain = jax.jit(head_chain, static_argnames=("n",))
            try:
                t = timeit(lambda: chain(hq_p, hs_p, x0, STEPS))
                print(f"H. head block {block:4d}: rows={hq_p.shape[0]} "
                      f"{t/STEPS*1e3:7.3f} ms/step "
                      f"({head_bytes/(t/STEPS)/1e9:.0f} GB/s)", flush=True)
            except Exception as exc:
                print(f"H. block {block} FAILED: {type(exc).__name__}: "
                      f"{str(exc)[:160]}", flush=True)


if __name__ == "__main__":
    main()
