"""Decode-step cost attribution at 7B dims (int4) on one real chip.

Where do the ~12 ms/step go?  Times, each as a sequential fori chain inside
ONE dispatch (the tunnel RTT is ~28 ms, so per-call timing is useless):
  1. full fused decode loop (the production path)
  2. matmul-only layer stack (qkv -> o -> gateup -> down, no attention/KV)
  3. vocab head alone
  4. attention + KV write alone (cache read, softmax, scatter)
  5. raw weight-stream floor: one Pallas pass over the same bytes

Run: python tools/probe_decode_cost.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vis_tpu.models.common.decoder import (
    DecoderConfig,
    decode_loop_scan,
    fuse_stacked_projections,
    init_decoder_params,
    quantize_stacked_params,
    stack_decoder_layers,
)
from vis_tpu.models.common.layers import KVCache
from vis_tpu.ops.quantized import QuantizedWeight4, quantized_matmul4

CFG = DecoderConfig(
    vocab_size=152064, hidden_size=3584, num_layers=28, num_heads=28,
    num_kv_heads=4, intermediate_size=18944, rope_theta=1_000_000.0,
    qkv_bias=True, tie_word_embeddings=False,
)
CACHE_LEN = 2048
STEPS = 64


def materialize_like(shape_tree, seed=0):
    leaves, treedef = jax.tree.flatten(shape_tree)

    def make(key):
        out = []
        keys = jax.random.split(key, len(leaves))
        for k, leaf in zip(keys, leaves):
            if jnp.issubdtype(leaf.dtype, jnp.integer) or jnp.issubdtype(
                leaf.dtype, jnp.unsignedinteger
            ):
                out.append(
                    jax.random.bits(k, leaf.shape, jnp.uint8).astype(leaf.dtype)
                )
            else:
                out.append(
                    (jax.random.normal(k, leaf.shape, jnp.float32) * 0.005
                     + 0.01).astype(leaf.dtype)
                )
        return treedef.unflatten(out)

    return jax.jit(make)(jax.random.PRNGKey(seed))


def _sync(out):
    # block_until_ready is unreliable through the axon tunnel; a literal
    # device->host copy of one leaf is the only trustworthy barrier.
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.tree.leaves(out)[-1] if leaf is None else leaf).ravel()[:1]


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


def main():
    print(f"devices: {jax.devices()}")

    def make_params(key):
        p = stack_decoder_layers(init_decoder_params(CFG, key))
        p = fuse_stacked_projections(p)
        return quantize_stacked_params(p, quantize_embeddings=True, mode="int4")

    params = materialize_like(jax.eval_shape(make_params, jax.random.PRNGKey(0)))
    layers = params["layers_stacked"]

    def qbytes(qw):
        return qw.q.size * qw.q.dtype.itemsize + qw.scale.size * 4

    layer_bytes = sum(
        qbytes(w) for w in (layers["qkv_proj"], layers["o_proj"],
                            layers["mlp"]["gateup_proj"],
                            layers["mlp"]["down_proj"])
    )
    head_bytes = qbytes(params["lm_head"])
    print(f"layer-stack weight bytes: {layer_bytes/1e9:.3f} GB; "
          f"head: {head_bytes/1e9:.3f} GB")

    cache = KVCache.create(CFG.num_layers, 1, CACHE_LEN, CFG.num_kv_heads,
                           CFG.head_dim_, dtype=jnp.bfloat16)
    cache = KVCache(k=cache.k, v=cache.v, lengths=jnp.asarray([900], jnp.int32))
    logits0 = jnp.zeros((1, CFG.vocab_size), jnp.float32)

    # 1. full production decode loop -------------------------------------
    loop = jax.jit(partial(decode_loop_scan, CFG),
                   static_argnames=("num_steps", "eos_id"))
    t = timeit(lambda: loop(params, logits0, jnp.int32(900),
                            KVCache(k=cache.k, v=cache.v, lengths=cache.lengths),
                            num_steps=STEPS, eos_id=None), n=2)
    full_ms = t / STEPS * 1e3
    print(f"1. full decode step:        {full_ms:7.3f} ms/step")

    # 2. matmul-only layer stack ------------------------------------------
    def matmul_stack(x, ls):
        def body(h, layer):
            qkv = quantized_matmul4(h, layer["qkv_proj"])  # [1, 4608]
            att = qkv[:, : CFG.hidden_size].astype(jnp.bfloat16)
            o = quantized_matmul4(att, layer["o_proj"]).astype(jnp.bfloat16)
            gu = quantized_matmul4(o, layer["mlp"]["gateup_proj"])
            g, u = jnp.split(gu, 2, axis=-1)
            act = (jax.nn.silu(g) * u).astype(jnp.bfloat16)
            d = quantized_matmul4(act, layer["mlp"]["down_proj"])
            return (h + d).astype(jnp.bfloat16), None
        out, _ = jax.lax.scan(body, x, ls)
        return out

    def matmul_chain(ls, x, n):
        def step(i, h):
            return matmul_stack(h, ls)
        return jax.lax.fori_loop(0, n, step, x)

    x0 = jnp.ones((1, CFG.hidden_size), jnp.bfloat16) * 0.01
    chain = jax.jit(matmul_chain, static_argnames=("n",))
    t = timeit(lambda: chain(layers, x0, STEPS))
    mm_ms = t / STEPS * 1e3
    print(f"2. matmul-only stack:       {mm_ms:7.3f} ms/step "
          f"({layer_bytes/ (t/STEPS) / 1e9:.0f} GB/s)")

    # 2b. MLP only ---------------------------------------------------------
    def mlp_stack(x, ls):
        def body(h, layer):
            gu = quantized_matmul4(h, layer["mlp"]["gateup_proj"])
            g, u = jnp.split(gu, 2, axis=-1)
            act = (jax.nn.silu(g) * u).astype(jnp.bfloat16)
            d = quantized_matmul4(act, layer["mlp"]["down_proj"])
            return (h + d).astype(jnp.bfloat16), None
        out, _ = jax.lax.scan(body, x, ls)
        return out

    mlp_bytes = sum(qbytes(w) for w in (layers["mlp"]["gateup_proj"],
                                        layers["mlp"]["down_proj"]))
    chain = jax.jit(lambda ls, x, n: jax.lax.fori_loop(
        0, n, lambda i, h: mlp_stack(h, ls), x), static_argnames=("n",))
    t = timeit(lambda: chain(layers, x0, STEPS))
    print(f"2b. MLP-only stack:         {t/STEPS*1e3:7.3f} ms/step "
          f"({mlp_bytes/(t/STEPS)/1e9:.0f} GB/s)")

    # 2c. qkv+o only --------------------------------------------------------
    def attnmm_stack(x, ls):
        def body(h, layer):
            qkv = quantized_matmul4(h, layer["qkv_proj"])
            att = qkv[:, : CFG.hidden_size].astype(jnp.bfloat16)
            o = quantized_matmul4(att, layer["o_proj"]).astype(jnp.bfloat16)
            return (h + o).astype(jnp.bfloat16), None
        out, _ = jax.lax.scan(body, x, ls)
        return out

    qo_bytes = sum(qbytes(w) for w in (layers["qkv_proj"], layers["o_proj"]))
    chain = jax.jit(lambda ls, x, n: jax.lax.fori_loop(
        0, n, lambda i, h: attnmm_stack(h, ls), x), static_argnames=("n",))
    t = timeit(lambda: chain(layers, x0, STEPS))
    print(f"2c. qkv+o-only stack:       {t/STEPS*1e3:7.3f} ms/step "
          f"({qo_bytes/(t/STEPS)/1e9:.0f} GB/s)")

    # 3. vocab head ----------------------------------------------------------
    def head_chain(hw, x, n):
        def step(i, h):
            y = quantized_matmul4(h, hw)
            return jnp.tanh(y[:, : CFG.hidden_size]).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, n, step, x)

    chain = jax.jit(head_chain, static_argnames=("n",))
    t = timeit(lambda: chain(params["lm_head"], x0, STEPS))
    print(f"3. vocab head:              {t/STEPS*1e3:7.3f} ms/step "
          f"({head_bytes/(t/STEPS)/1e9:.0f} GB/s)")

    # 4. attention + KV write only -------------------------------------------
    from vis_tpu.models.common.decoder import cache_key_mask
    from vis_tpu.models.common.layers import apply_rope, rope_cos_sin

    def attn_only(x, k_buf, v_buf, lengths, n):
        kvh, hd = CFG.num_kv_heads, CFG.head_dim_
        rep = CFG.num_heads // kvh

        def step(i, carry):
            h, kb, vb, ln = carry
            cos, sin = rope_cos_sin(ln[:, None], hd, CFG.rope_theta)
            q = h.reshape(1, 1, CFG.num_heads, hd)
            k = h[:, : kvh * hd].reshape(1, 1, kvh, hd)
            v = k
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            mask = cache_key_mask(ln, kb.shape[2])

            def body(xx, layer_kv):
                ck, cv = layer_kv
                qg = q.reshape(1, 1, kvh, rep, hd)
                lg = jnp.einsum("bqgrd,bkgd->bgrqk", qg,
                                ck.astype(q.dtype),
                                preferred_element_type=jnp.float32)
                lg = lg + mask[:, :, None]
                ln_new = jnp.einsum("bqgrd,bkgd->bgrqk", qg, k,
                                    preferred_element_type=jnp.float32)
                joint = jnp.concatenate([lg, ln_new], axis=-1)
                probs = jax.nn.softmax(joint, axis=-1)
                pc = probs[..., :kb.shape[2]]
                pn = probs[..., kb.shape[2]:]
                out = jnp.einsum("bgrqk,bkgd->bqgrd", pc.astype(v.dtype),
                                 cv.astype(v.dtype),
                                 preferred_element_type=jnp.float32)
                out = out + jnp.einsum("bgrqk,bkgd->bqgrd",
                                       pn.astype(v.dtype), v,
                                       preferred_element_type=jnp.float32)
                return xx + jnp.sum(out.astype(jnp.bfloat16)), (k, v)

            s, (k_new, v_new) = jax.lax.scan(body, jnp.bfloat16(0.0), (kb, vb))
            kb = jax.lax.dynamic_update_slice(
                kb, k_new.astype(kb.dtype), (0, 0, ln[0], 0, 0))
            vb = jax.lax.dynamic_update_slice(
                vb, v_new.astype(vb.dtype), (0, 0, ln[0], 0, 0))
            h = h + jnp.full_like(h, 1e-6) * s
            return (h, kb, vb, ln + 1)

        h, kb, vb, ln = jax.lax.fori_loop(
            0, n, step, (x, k_buf, v_buf, lengths))
        return h, ln

    hvec = jnp.ones((1, CFG.num_heads * CFG.head_dim_), jnp.bfloat16) * 0.01
    chain = jax.jit(attn_only, static_argnames=("n",))
    t = timeit(lambda: chain(
        hvec, jnp.zeros_like(cache.k), jnp.zeros_like(cache.v),
        jnp.asarray([900], jnp.int32), STEPS), n=2)
    print(f"4. attention+KV write:      {t/STEPS*1e3:7.3f} ms/step")

    # 5. raw weight-stream floor ----------------------------------------------
    total_bytes = layer_bytes + head_bytes

    def stream_floor(ls, hw, x, n):
        def step(i, acc):
            def body(a, layer):
                s = (jnp.sum(layer["qkv_proj"].q.astype(jnp.float32)) +
                     jnp.sum(layer["o_proj"].q.astype(jnp.float32)) +
                     jnp.sum(layer["mlp"]["gateup_proj"].q.astype(jnp.float32)) +
                     jnp.sum(layer["mlp"]["down_proj"].q.astype(jnp.float32)))
                return a + s, None
            acc2, _ = jax.lax.scan(body, acc, ls)
            acc2 = acc2 + jnp.sum(hw.q.astype(jnp.float32))
            return acc2 * (1.0 + 1e-12 * jnp.float32(i))
        return jax.lax.fori_loop(0, n, step, x)

    chain = jax.jit(stream_floor, static_argnames=("n",))
    t = timeit(lambda: chain(layers, params["lm_head"], jnp.float32(0.0), 8), n=2)
    print(f"5. XLA reduce-stream floor: {t/8*1e3:7.3f} ms/pass "
          f"({total_bytes/(t/8)/1e9:.0f} GB/s)")

    print(f"\nsum(2+3+4) = {mm_ms:.2f} + head + attn vs full {full_ms:.2f}")


if __name__ == "__main__":
    main()
