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
    x: jnp.ndarray, qw: QuantizedWeight, *, block_o: int = 256
) -> jnp.ndarray:
    """x [B, I] @ qw^T -> [B, O] f32, streaming int8 weights.

    Requirements: O % block_o == 0 and I a multiple of 128 (pad upstream);
    falls back to dequantize+einsum otherwise or off-TPU.
    """
    out_dim, in_dim = qw.q.shape
    batch = x.shape[0]
    # Grid-step count is a first-order cost on the decode path (each step
    # pays fixed DMA-setup/pipeline overhead): pick the LARGEST tile that
    # divides out_dim and fits VMEM comfortably (~6 MB per int8 block,
    # double-buffered by Mosaic).
    max_rows = max(128, (6 * 1024 * 1024) // max(1, in_dim))
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
    for candidate in (1280, 1024, 896, 768, 640, 512, 448, 384, 256, 128):
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


__all__ = [
    "QuantizedWeight",
    "quantize_weight",
    "quantized_matmul",
    "fused_swiglu_mlp",
    "quantized_linear",
]
