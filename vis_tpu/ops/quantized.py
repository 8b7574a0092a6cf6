"""Weight-only int8 quantization with a Pallas dequantizing matmul.

Serving-memory/bandwidth optimization for the decode path (decode is
HBM-bound: every step reads all decoder weights).  Weights are stored as
per-output-channel symmetric int8 (+f32 scales, half the bytes of bf16);
the Pallas kernel streams int8 tiles into VMEM, dequantizes on the VPU, and
feeds the MXU — XLA alone materializes the dequantized weights in HBM and
only reaches ~1.3x, the fused kernel approaches the full 2x bandwidth win.

QuantizedWeight is a pytree, so it flows through jit/scan/sharding like a
plain array; vis_tpu.models.common.layers.linear dispatches on it.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantizedWeight:
    """Per-output-channel symmetric int8 weight: w ≈ q * scale[:, None].

    q: [out, in] int8; scale: [out] f32.  Layout matches the framework's
    [out, in] linear convention, so it drops in anywhere a weight array goes.
    """

    q: jnp.ndarray
    scale: jnp.ndarray

    def tree_flatten(self):
        return (self.q, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self) -> Tuple[int, int]:
        return self.q.shape

    def dequantize(self, dtype=jnp.bfloat16) -> jnp.ndarray:
        return (self.q.astype(jnp.float32) * self.scale[:, None]).astype(dtype)


def quantize_weight(w: jnp.ndarray, pad_out_multiple: int = 1) -> QuantizedWeight:
    """Symmetric per-row (output channel) int8 quantization.

    pad_out_multiple pads the output-row count with zero rows (zero scales →
    zero outputs) so awkward dims like a 151936 vocab can use large matmul
    tiles; callers slice the output back to the true dim."""
    w32 = w.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w32), axis=1), 1e-8) / 127.0
    q = jnp.clip(jnp.round(w32 / scale[:, None]), -127, 127).astype(jnp.int8)
    out = q.shape[0]
    if pad_out_multiple > 1 and out % pad_out_multiple:
        pad = pad_out_multiple - out % pad_out_multiple
        q = jnp.pad(q, ((0, pad), (0, 0)))
        scale = jnp.pad(scale, (0, pad))
    return QuantizedWeight(q=q, scale=scale)


# ---------------------------------------------------------------------------
# Pallas dequantizing matmul
# ---------------------------------------------------------------------------

def _q8_matmul_kernel(x_ref, q_ref, scale_ref, o_ref, *, block_o: int):
    """y_tile = (x @ dequant(q_tile)^T) * scale_tile.

    x_ref: [B, I] bf16 (whole activation in VMEM — decode B is tiny);
    q_ref: [block_o, I] int8 tile; scale_ref: [1, block_o] f32;
    o_ref: [B, block_o] f32.
    """
    x = x_ref[...]
    w = q_ref[...].astype(jnp.bfloat16)  # VPU int8 -> bf16, stays in VMEM
    y = jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [B, block_o]
    o_ref[...] = y * scale_ref[0, :][None, :]


def quantized_matmul(
    x: jnp.ndarray, qw: QuantizedWeight, *, block_o: Optional[int] = None
) -> jnp.ndarray:
    """x [B, I] @ qw^T -> [B, O] f32, streaming int8 weights.

    block_o=None auto-selects the tile; an explicit value is honored
    (probe/tuning use).  Requirements: O % block_o == 0 and I a multiple
    of 128 (pad upstream); falls back to dequantize+einsum otherwise or
    off-TPU.
    """
    out_dim, in_dim = qw.q.shape
    batch = x.shape[0]
    if block_o is None:
        # Grid-step count is a first-order cost on the decode path (each
        # step pays fixed DMA-setup/pipeline overhead): pick the LARGEST
        # tile that divides out_dim and fits VMEM comfortably (~6 MB per
        # int8 block, double-buffered by Mosaic).
        # int8 block + its bf16 VMEM copy are 3 bytes/element (+ double
        # buffering); a 3 MB int8 block keeps the working set inside the
        # 16 MB VMEM scope at 7B/8B dims (down_proj in_dim ~19k -> 128).
        max_rows = max(128, (3 * 1024 * 1024) // max(1, in_dim))
        block_o = 256
        for candidate in (1024, 512, 256, 128):
            if candidate <= max_rows and out_dim % candidate == 0:
                block_o = candidate
                break
    # The kernel holds the full activation block in VMEM, so it is a
    # DECODE-path kernel (few rows); prefill-sized activations fall back to
    # the XLA path, where weight bandwidth is not the bottleneck anyway.
    use_kernel = (
        jax.default_backend() == "tpu"
        and batch <= 128
        and out_dim % block_o == 0
        and in_dim % 128 == 0
    )
    if not use_kernel:
        return jnp.einsum(
            "bi,oi->bo", x.astype(jnp.bfloat16), qw.dequantize(),
            preferred_element_type=jnp.float32,
        )

    kernel = functools.partial(_q8_matmul_kernel, block_o=block_o)
    return pl.pallas_call(
        kernel,
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
    )(x.astype(jnp.bfloat16), qw.q, qw.scale.reshape(1, -1))


def quantized_linear(
    x: jnp.ndarray, qw: QuantizedWeight, bias: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """linear() semantics over a QuantizedWeight: [..., I] -> [..., O]."""
    lead_shape = x.shape[:-1]
    flat = x.reshape(-1, x.shape[-1])
    y = quantized_matmul(flat, qw)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.reshape(*lead_shape, qw.q.shape[0]).astype(x.dtype)


# ---------------------------------------------------------------------------
# Fused int8 SwiGLU MLP kernel
# ---------------------------------------------------------------------------

def _fused_mlp_kernel(x_ref, gate_ref, up_ref, gs_ref, us_ref, down_ref,
                      o_ref):
    """One grid step handles one block of the intermediate dimension:
    g/u = x @ {gate,up}_block^T (dequant), h = silu(g)*u, o += h @ down_block^T.

    Decode steps are LATENCY-bound on serialized kernel regions (~17 us per
    region measured on v5e), so the whole MLP — two projections, the SwiGLU
    elementwise, and the down projection — runs as ONE region, streaming
    every weight byte exactly once.
    """
    x = x_ref[...]                                     # [B, H] bf16
    gate = gate_ref[...].astype(jnp.bfloat16)          # [bi, H]
    up = up_ref[...].astype(jnp.bfloat16)
    g = jax.lax.dot_general(
        x, gate, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * gs_ref[0, :][None, :]                          # [B, bi]
    u = jax.lax.dot_general(
        x, up, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * us_ref[0, :][None, :]
    h = (g * jax.nn.sigmoid(g) * u).astype(jnp.bfloat16)
    down = down_ref[...].astype(jnp.bfloat16)          # [H, bi]
    y = jax.lax.dot_general(
        h, down, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                                  # [B, H]

    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    o_ref[...] += y


def _mlp_block_size(inter: int, hidden: int) -> Optional[int]:
    """Largest intermediate block that divides `inter` and keeps the three
    weight blocks (~3 * bi * hidden int8, double-buffered) well under VMEM."""
    cap = (4 * 1024 * 1024) // max(1, 3 * hidden)
    # Candidates must be multiples of 128: bi is the LANE dimension of the
    # (1, bi) scale and (hidden, bi) down blocks, and Mosaic cannot lower
    # mid-tile lane offsets (448 = 3.5 tiles compiled to a crash).
    for candidate in (1280, 1024, 896, 768, 640, 512, 384, 256, 128):
        if candidate <= cap and inter % candidate == 0:
            return candidate
    return None


def fused_swiglu_mlp(
    x: jnp.ndarray, gateup: QuantizedWeight, down: QuantizedWeight,
    interpret: bool = False,
) -> Optional[jnp.ndarray]:
    """down(silu(gate(x)) * up(x)) in one Pallas kernel.

    gateup: fused [2*inter, hidden] int8 (gate rows first — the
    decoder.fuse_stacked_projections layout); down: [hidden, inter] int8.
    Returns None when the shapes don't fit the kernel (caller falls back).
    """
    lead_shape = x.shape[:-1]
    flat = x.reshape(-1, x.shape[-1])
    batch, hidden = flat.shape
    inter = gateup.q.shape[0] // 2
    bi = _mlp_block_size(inter, hidden)
    use_kernel = (
        (jax.default_backend() == "tpu" or interpret)
        and batch <= 128
        and bi is not None
        and hidden % 128 == 0
        and down.q.shape == (hidden, inter)
    )
    if not use_kernel:
        return None
    blocks = inter // bi
    scale2d = gateup.scale.reshape(1, -1)
    y = pl.pallas_call(
        _fused_mlp_kernel,
        out_shape=jax.ShapeDtypeStruct((batch, hidden), jnp.float32),
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((batch, hidden), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            # gate rows j*bi.., then up rows inter + j*bi.. — two views of
            # the same fused array via block-index offset.
            pl.BlockSpec((bi, hidden), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bi, hidden), lambda j, _b=blocks: (j + _b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bi), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bi), lambda j, _b=blocks: (0, j + _b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, bi), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((batch, hidden), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(flat.astype(jnp.bfloat16), gateup.q, gateup.q, scale2d, scale2d, down.q)
    y = y * down.scale[None, :]
    return y.reshape(*lead_shape, hidden).astype(x.dtype)


# ---------------------------------------------------------------------------
# int4 weight-only quantization
# ---------------------------------------------------------------------------

def unpack_int4(packed_i32: jnp.ndarray, scales: jnp.ndarray,
                dtype=jnp.bfloat16) -> jnp.ndarray:
    """Split-nibble int4 layout law in ONE place: packed bytes
    [..., half] hold (value+8) nibbles — low nibble = first input half,
    high nibble = second — with per-(row, half) scales [..., 2].  The
    Pallas matmul kernel re-states this arithmetic in-kernel
    (_q4_matmul_kernel) for VMEM staging; any layout change must update
    both."""
    lo = ((packed_i32 & 15) - 8).astype(jnp.float32) * scales[..., 0:1]
    hi = (((packed_i32 >> 4) & 15) - 8).astype(jnp.float32) * scales[..., 1:2]
    return jnp.concatenate([lo, hi], axis=-1).astype(dtype)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantizedWeight4:
    """Split-half-packed symmetric int4 weight.

    q: [out, in//2] uint8 — byte j packs input element j (low nibble) and
    element j + in//2 (high nibble), both stored as value+8 (range 1..15;
    nibble 0 only appears in zero-padded rows, whose scale is 0).
    scale: [out, 2] f32 — one scale per output row per input HALF, i.e.
    group-wise quantization with group_size = in//2 at zero runtime cost:
    the matmul splits into x_lo @ w_lo^T * s0 + x_hi @ w_hi^T * s1, so no
    nibble interleave is ever reconstructed (TPU lane-friendly).

    Half the bytes of int8: the decode step's weight-read traffic and the
    resident footprint both halve — what lets the 7B+11B+8B model set share
    one 16 GB v5e chip.
    """

    q: jnp.ndarray
    scale: jnp.ndarray

    def tree_flatten(self):
        return (self.q, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.q.shape[0], self.q.shape[1] * 2)

    def dequantize(self, dtype=jnp.bfloat16) -> jnp.ndarray:
        return unpack_int4(self.q.astype(jnp.int32), self.scale, dtype)


def quantize_weight4(w: jnp.ndarray, pad_out_multiple: int = 1) -> QuantizedWeight4:
    """Symmetric int4 quantization with per-(row, input-half) scales."""
    w32 = w.astype(jnp.float32)
    out, inn = w32.shape
    if inn % 2:
        raise ValueError(f"int4 packing needs an even input dim, got {inn}")
    half = inn // 2
    w_lo, w_hi = w32[:, :half], w32[:, half:]
    s_lo = jnp.maximum(jnp.max(jnp.abs(w_lo), axis=1), 1e-8) / 7.0
    s_hi = jnp.maximum(jnp.max(jnp.abs(w_hi), axis=1), 1e-8) / 7.0
    q_lo = jnp.clip(jnp.round(w_lo / s_lo[:, None]), -7, 7) + 8
    q_hi = jnp.clip(jnp.round(w_hi / s_hi[:, None]), -7, 7) + 8
    packed = (q_lo.astype(jnp.uint8) | (q_hi.astype(jnp.uint8) << 4))
    scale = jnp.stack([s_lo, s_hi], axis=1)
    if pad_out_multiple > 1 and out % pad_out_multiple:
        pad = pad_out_multiple - out % pad_out_multiple
        packed = jnp.pad(packed, ((0, pad), (0, 0)))
        scale = jnp.pad(scale, ((0, pad), (0, 0)))
    return QuantizedWeight4(q=packed, scale=scale)


def _q4_matmul_kernel(x_ref, qp_ref, scale_ref, o_ref):
    """y_tile = x_lo @ w_lo^T * s0 + x_hi @ w_hi^T * s1 from packed nibbles.

    x_ref: [B, I] bf16; qp_ref: [block_o, I/2] uint8;
    scale_ref: [2, block_o] f32; o_ref: [B, block_o] f32.

    The stored -8 nibble bias is FOLDED into a per-half sum(x) correction
    (x @ (n-8) == x @ n - 8*sum(x)) — 5 lane-ops/byte instead of 8, +8%
    measured (tools/probe_unpack.py variant B).  Unpack stages through
    int32 (Mosaic legalizes neither u8->bf16 casts nor u8 shifts); the
    int32 staging copy is 4 bytes/nibble-pair of VMEM, which is why the
    block budget below is sized so the whole working set (u8 + int32 +
    2x bf16 planes) stays inside the 16 MB scope.
    """
    x = x_ref[...]
    half = qp_ref.shape[1]
    b = qp_ref[...].astype(jnp.int32)
    w_lo = (b & 15).astype(jnp.bfloat16)
    w_hi = (b >> 4).astype(jnp.bfloat16)   # u8 source: high bits already 0
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
    o_ref[...] = y_lo * scale_ref[0, :][None, :] + y_hi * scale_ref[1, :][None, :]


def quantized_matmul4(
    x: jnp.ndarray, qw: QuantizedWeight4, *, interpret: bool = False
) -> jnp.ndarray:
    """x [B, I] @ qw^T -> [B, O] f32, streaming packed int4 weights."""
    out_dim, half = qw.q.shape
    in_dim = half * 2
    batch = x.shape[0]
    # Per block row the kernel stages ~1 byte (packed u8, double-buffered)
    # + 2x2 bytes (bf16 nibble planes) per input-half element; a 2 MB u8
    # block keeps the whole working set ~10 MB, inside the 16 MB VMEM scope
    # at any model scale (7B down_proj: block 128 x 9472).
    max_rows = max(128, (2 * 1024 * 1024) // max(1, half))
    block_o = 0
    for candidate in (2048, 1024, 512, 256, 128):
        if candidate <= max_rows and out_dim % candidate == 0:
            block_o = candidate
            break
    use_kernel = (
        (jax.default_backend() == "tpu" or interpret)
        and batch <= 128
        and block_o > 0
        and half % 128 == 0
    )
    if not use_kernel:
        return jnp.einsum(
            "bi,oi->bo", x.astype(jnp.bfloat16), qw.dequantize(),
            preferred_element_type=jnp.float32,
        )
    return pl.pallas_call(
        _q4_matmul_kernel,
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
        interpret=interpret,
    )(x.astype(jnp.bfloat16), qw.q, qw.scale.T)


# ---------------------------------------------------------------------------
# Stacked int4 matmul with in-kernel layer pick
# ---------------------------------------------------------------------------
#
# MEASURED MOTIVATION (tools/probe_scan_slice.py, one v5e chip, 7B MLP
# dims): scanning layer weights as lax.scan xs makes XLA materialize a
# copy of each layer's slice before the pallas_call consumes it — the
# weight stream drops to ~294 GB/s (read + write + kernel-read).  Keeping
# the STACKED array as a plain operand and letting the kernel's index_map
# DMA the layer's blocks directly from HBM (PrefetchScalarGridSpec) runs
# the same math at ~478 GB/s — 1.63x on the decode path's dominant cost.


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantizedWeight4Pick:
    """A VIEW of one layer inside stacked int4 weights: q [L, out, in//2],
    scale [L, out, 2], idx scalar int32.  linear() dispatches it to
    quantized_matmul4_stacked, which picks layer `idx` inside the Pallas
    kernel (no XLA-level slice).  Built inside decode-scan bodies; the
    stacked arrays are ordinary jit operands (NOT scan xs)."""

    q: jnp.ndarray
    scale: jnp.ndarray
    idx: jnp.ndarray

    def tree_flatten(self):
        return (self.q, self.scale, self.idx), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.q.shape[1], self.q.shape[2] * 2)


def _q4_stacked_kernel(idx_ref, x_ref, qp_ref, scale_ref, o_ref):
    """Layer-picking twin of _q4_matmul_kernel with the -8 nibble bias
    FOLDED into a per-half activation-sum correction (measured +8%:
    tools/probe_unpack.py variant B): stored nibbles are value+8, so
    x @ (n - 8) == x @ n - 8 * sum(x).  scale_ref: [1, 2, block_o]."""
    x = x_ref[...]
    half = qp_ref.shape[-1]
    b = qp_ref[0].astype(jnp.int32)
    w_lo = (b & 15).astype(jnp.bfloat16)
    w_hi = (b >> 4).astype(jnp.bfloat16)   # u8 source: high bits already 0
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


def quantized_matmul4_stacked(
    x: jnp.ndarray, pick: QuantizedWeight4Pick, *, interpret: bool = False
) -> jnp.ndarray:
    """x [B, I] @ stacked_q[idx]^T -> [B, O] f32; the layer's blocks are
    DMA'd straight from the stacked HBM array inside the kernel."""
    n_layers, out_dim, half = pick.q.shape
    in_dim = half * 2
    batch = x.shape[0]
    max_rows = max(128, (2 * 1024 * 1024) // max(1, half))
    block_o = 0
    for candidate in (2048, 1024, 512, 256, 128):
        if candidate <= max_rows and out_dim % candidate == 0:
            block_o = candidate
            break
    use_kernel = (
        (jax.default_backend() == "tpu" or interpret)
        and batch <= 128
        and block_o > 0
        and half % 128 == 0
    )
    if not use_kernel:
        q = jax.lax.dynamic_index_in_dim(pick.q, pick.idx, 0, keepdims=False)
        s = jax.lax.dynamic_index_in_dim(
            pick.scale, pick.idx, 0, keepdims=False
        )
        return jnp.einsum(
            "bi,oi->bo", x.astype(jnp.bfloat16),
            unpack_int4(q.astype(jnp.int32), s),
            preferred_element_type=jnp.float32,
        )
    # Scales transpose to the kernel's [L, 2, out] lane-major layout; the
    # transpose is loop-invariant, so XLA hoists it out of decode loops
    # (bytes are trivial next to the packed weights).
    scale_t = pick.scale.transpose(0, 2, 1)
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
        interpret=interpret,
    )(jnp.reshape(pick.idx, (1,)).astype(jnp.int32),
      x.astype(jnp.bfloat16), pick.q, scale_t)


def quantized_linear4_stacked(
    x: jnp.ndarray, pick: QuantizedWeight4Pick,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    lead_shape = x.shape[:-1]
    flat = x.reshape(-1, x.shape[-1])
    y = quantized_matmul4_stacked(flat, pick)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.reshape(*lead_shape, pick.q.shape[1]).astype(x.dtype)


def quantized_linear4(
    x: jnp.ndarray, qw: QuantizedWeight4, bias: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    lead_shape = x.shape[:-1]
    flat = x.reshape(-1, x.shape[-1])
    y = quantized_matmul4(flat, qw)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.reshape(*lead_shape, qw.q.shape[0]).astype(x.dtype)


def embed_rows4(table: QuantizedWeight4, token_ids: jnp.ndarray) -> jnp.ndarray:
    """Embedding gather from a packed int4 table (dequantized on the fly)."""
    rows = jnp.take(table.q, token_ids, axis=0).astype(jnp.int32)
    s = jnp.take(table.scale, token_ids, axis=0)  # [..., 2]
    return unpack_int4(rows, s)


__all__ = [
    "QuantizedWeight",
    "quantize_weight",
    "quantized_matmul",
    "fused_swiglu_mlp",
    "quantized_linear",
    "QuantizedWeight4",
    "QuantizedWeight4Pick",
    "quantize_weight4",
    "quantized_matmul4",
    "quantized_matmul4_stacked",
    "quantized_linear4",
    "quantized_linear4_stacked",
    "embed_rows4",
    "unpack_int4",
]
