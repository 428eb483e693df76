#!/usr/bin/env python3
"""TPU numerics check for the v6 streaming lane kernel at chunked shapes.

Compares lane (grid-chunked on these shapes) against fused_block on the
real chip, forward and input-gradient, at the grids the v5 gate excluded.
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

from bubbleformer_tpu.layers.attention import AxialAttentionBlock
from bubbleformer_tpu.ops.axial_lane import _grid_chunk, lane_axial_supported


def main():
    for h, w, c, heads in [(64, 64, 384, 6), (32, 128, 384, 6), (32, 32, 768, 12)]:
        assert lane_axial_supported(h, w, c, heads), (h, w, c, heads)
        gch = _grid_chunk(h, w, c, h * w)
        print(f"grid {h}x{w} C={c}: grid_chunk={gch} ({h*w//gch} steps/image)", flush=True)
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((1, h, w, c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        lane = AxialAttentionBlock(embed_dim=c, num_heads=heads, attn_impl="lane", dtype=jnp.bfloat16)
        fb = AxialAttentionBlock(embed_dim=c, num_heads=heads, attn_impl="fused_block", dtype=jnp.bfloat16)
        v = lane.init(jax.random.key(0), x)

        def loss(mod):
            return jax.jit(lambda xx: jnp.sum(mod.apply(v, xx).astype(jnp.float32) ** 2))

        t0 = time.time()
        yl, gl = jax.value_and_grad(lambda xx: jnp.sum(lane.apply(v, xx).astype(jnp.float32) ** 2))(x), None
        print(f"  lane fwd+grad compile+run {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        yf = jax.value_and_grad(lambda xx: jnp.sum(fb.apply(v, xx).astype(jnp.float32) ** 2))(x)
        print(f"  fused_block compile+run {time.time()-t0:.1f}s", flush=True)
        vl, gl = yl
        vf, gf = yf
        rel = abs(float(vl) - float(vf)) / max(abs(float(vf)), 1e-9)
        gdiff = float(jnp.max(jnp.abs(gl.astype(jnp.float32) - gf.astype(jnp.float32))))
        gref = float(jnp.max(jnp.abs(gf.astype(jnp.float32))))
        print(f"  loss rel diff {rel:.3e}; max grad diff {gdiff:.3e} (ref max {gref:.3e})", flush=True)
        assert rel < 2e-2, rel  # bf16 accumulation-order tolerance
        assert gdiff < 2e-2 * max(gref, 1.0), (gdiff, gref)
    print("lane v6 TPU numerics OK")


if __name__ == "__main__":
    main()
