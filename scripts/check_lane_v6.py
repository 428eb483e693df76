#!/usr/bin/env python3
"""TPU numerics check for the v6 streaming kernels at chunked shapes.

Compares lane (grid-chunked on these shapes) and the temporal core kernel
against the XLA 'plain' impls on the real chip, forward and input-gradient,
at the grids the v5/mega gates excluded.  ('plain' compiles in seconds;
fused_block at 64x64 is a multi-10-minute relay compile — the round-2
wide-grid timeout pathology — so it is not the oracle here; lane vs
fused_block equivalence is covered by the CPU interpret goldens.)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_bubbleformer"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

from bubbleformer_tpu.layers.attention import (
    AxialAttentionBlock,
    TemporalAttentionBlock,
)
from bubbleformer_tpu.ops.axial_lane import _grid_chunk, lane_axial_supported
from bubbleformer_tpu.ops.temporal_block_mega import _core_chunk, core_temporal_supported


def _compare(name, mod_a, mod_b, v, x):
    t0 = time.time()
    va, ga = jax.value_and_grad(
        lambda xx: jnp.sum(mod_a.apply(v, xx).astype(jnp.float32) ** 2)
    )(x)
    print(f"  {name} kernel fwd+grad compile+run {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    vb, gb = jax.value_and_grad(
        lambda xx: jnp.sum(mod_b.apply(v, xx).astype(jnp.float32) ** 2)
    )(x)
    print(f"  plain compile+run {time.time()-t0:.1f}s", flush=True)
    rel = abs(float(va) - float(vb)) / max(abs(float(vb)), 1e-9)
    gdiff = float(jnp.max(jnp.abs(ga.astype(jnp.float32) - gb.astype(jnp.float32))))
    gref = float(jnp.max(jnp.abs(gb.astype(jnp.float32))))
    print(f"  loss rel diff {rel:.3e}; max grad diff {gdiff:.3e} (ref max {gref:.3e})", flush=True)
    assert rel < 2e-2, rel  # bf16 accumulation-order tolerance
    assert gdiff < 2e-2 * max(gref, 1.0), (gdiff, gref)


def main():
    rng = np.random.default_rng(0)
    for h, w, c, heads in [(64, 64, 384, 6), (32, 128, 384, 6), (32, 32, 768, 12)]:
        assert lane_axial_supported(h, w, c, heads), (h, w, c, heads)
        gch = _grid_chunk(h, w, c, h * w)
        print(f"axial grid {h}x{w} C={c}: grid_chunk={gch} ({h*w//gch} steps/image)", flush=True)
        x = jnp.asarray(rng.standard_normal((1, h, w, c)).astype(np.float32)).astype(jnp.bfloat16)
        lane = AxialAttentionBlock(embed_dim=c, num_heads=heads, attn_impl="lane", dtype=jnp.bfloat16)
        plain = AxialAttentionBlock(embed_dim=c, num_heads=heads, attn_impl="plain", dtype=jnp.bfloat16)
        v = lane.init(jax.random.key(0), x)
        _compare("lane", lane, plain, v, x)

    t_len, h, w, c, heads = 5, 32, 32, 768, 12
    assert core_temporal_supported(t_len, h, w, c)
    nc = _core_chunk(t_len, h * w, c)
    print(f"temporal core grid {h}x{w} C={c}: chunk={nc} ({h*w//nc} steps/image)", flush=True)
    x = jnp.asarray(
        rng.standard_normal((1, t_len, h, w, c)).astype(np.float32)
    ).astype(jnp.bfloat16)
    core = TemporalAttentionBlock(embed_dim=c, num_heads=heads, attn_impl="core", dtype=jnp.bfloat16)
    plain = TemporalAttentionBlock(embed_dim=c, num_heads=heads, attn_impl="unrolled", dtype=jnp.bfloat16)
    v = core.init(jax.random.key(0), x)
    _compare("core", core, plain, v, x)
    print("streamed kernels TPU numerics OK")


if __name__ == "__main__":
    main()
