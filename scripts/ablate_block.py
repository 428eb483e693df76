#!/usr/bin/env python3
"""Block-anatomy ablation: time SpaceTimeBlock pieces fwd+bwd on the chip.

Measures a 12-deep stack of block components at the flagship inner shape
(post-embed: B=4, T=5, 32x32 token grid, C=384, heads=6) with the scanned
device-only methodology from bench.py (the relay lies to naive timers).
Emits one JSON line per variant so perf claims live in a recorded artifact
(VERDICT round-1, weak #4) instead of docstrings.

Usage:
    python scripts/ablate_block.py --variants full temporal axial
    python scripts/ablate_block.py --variants full --attn-impl flash
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Persistent compilation cache: stack-variant recompiles through the remote
# relay cost minutes; cached executables rerun in seconds.
jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_bubbleformer")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def log(*a):
    print(*a, file=sys.stderr, flush=True)


class Stack(nn.Module):
    """N repeated components (temporal block / axial block / full block)."""

    variant: str
    depth: int
    embed_dim: int
    num_heads: int
    attn_impl: str
    dtype: jnp.dtype | None

    @nn.compact
    def __call__(self, x):
        from bubbleformer_tpu.layers.attention import (
            AxialAttentionBlock,
            TemporalAttentionBlock,
        )
        from bubbleformer_tpu.models.axial_vit import SpaceTimeBlock

        b, t, h, w, c = x.shape
        kw = dict(
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            attn_impl=self.attn_impl,
            dtype=self.dtype,
        )
        for i in range(self.depth):
            if self.variant == "full":
                x, _ = SpaceTimeBlock(name=f"b{i}", **kw)(x, 0.0)
            elif self.variant == "temporal":
                x = TemporalAttentionBlock(name=f"b{i}", **kw)(x, 0.0, True)
            elif self.variant == "axial":
                y = x.reshape(b * t, h, w, c)
                y = AxialAttentionBlock(name=f"b{i}", **kw)(y, 0.0, True)
                x = y.reshape(b, t, h, w, c)
            else:
                raise ValueError(self.variant)
        return x


def time_variant(variant, args):
    mod = Stack(
        variant=variant,
        depth=args.depth,
        embed_dim=args.embed_dim,
        num_heads=args.heads,
        attn_impl=args.attn_impl,
        dtype=jnp.bfloat16,
    )
    rng = jax.random.key(0)
    x = jax.random.normal(
        rng, (args.batch, args.tw, args.grid, args.grid, args.embed_dim), jnp.bfloat16
    )
    params = mod.init(jax.random.key(1), x)["params"]

    def loss_fn(p, x):
        out = mod.apply({"params": p}, x)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    grad_fn = jax.value_and_grad(loss_fn)

    if args.fwd_only:
        def body(carry, _):
            p, x = carry
            val = loss_fn(p, x)
            # fold the loss back so the scan has a real dependency chain
            x2 = x + (1e-12 * val).astype(x.dtype)
            return (p, x2), val
    else:
        def body(carry, _):
            p, x = carry
            val, g = grad_fn(p, x)
            # fold grads back so the scan has a real dependency chain
            p2 = jax.tree.map(lambda a, b: a - 1e-12 * b.astype(a.dtype), p, g)
            return (p2, x), val

    n = args.steps

    @jax.jit
    def run(p, x):
        (_, _), vals = jax.lax.scan(body, (p, x), None, length=n)
        return vals[-1]

    t0 = time.time()
    _ = float(run(params, x))
    compile_s = time.time() - t0
    t0 = time.time()
    _ = float(run(params, x))
    dt = (time.time() - t0) / n
    return dt, compile_s


def time_kernel_isolated(args):
    """Time the axial attention op alone (fwd and fwd+bwd), outside any block.

    Isolates the op from the block's qkv projection/norms so kernel-level
    claims (e.g. fused_packed fwd 1.9 ms / bwd 2.3 ms at the flagship shape)
    live in a recorded artifact rather than ad-hoc probes."""
    from bubbleformer_tpu.ops.attention import axis_attention
    from bubbleformer_tpu.ops.axial_fused import fused_axial_attention
    from bubbleformer_tpu.ops.axial_fused_packed import fused_axial_attention_packed

    bt = args.batch * args.tw
    heads, d = args.heads, args.embed_dim // args.heads
    h = w = args.grid
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32), jnp.bfloat16)
    q, k, v = (mk(bt, h, w, heads, d) for _ in range(3))
    bx = jnp.asarray(rng.standard_normal((heads, w, w)).astype(np.float32))
    by = jnp.asarray(rng.standard_normal((heads, h, h)).astype(np.float32))
    sx = jnp.asarray(rng.uniform(0.5, 1.5, heads).astype(np.float32))
    sy = jnp.asarray(rng.uniform(0.5, 1.5, heads).astype(np.float32))

    if args.attn_impl == "fused_packed":
        op = lambda q, k, v: fused_axial_attention_packed(q, k, v, bx, by, sx, sy)
    elif args.attn_impl == "fused":
        op = lambda q, k, v: fused_axial_attention(q, k, v, bx, by, sx, sy)
    else:  # plain: rows+cols averaged via dot_general axis attention
        def op(q, k, v):
            xx = axis_attention(q, k, v, axis=2, bias=bx, scale_factor=sx)
            xx = jnp.transpose(xx, (0, 1, 3, 2, 4))
            xy = axis_attention(q, k, v, axis=1, bias=by, scale_factor=sy)
            xy = jnp.transpose(xy, (0, 3, 1, 2, 4))
            return (xx + xy) * 0.5

    def run_mode(mode):
        if mode == "fwd":
            def body_fn(qq, kk, vv):
                o = op(qq, kk, vv)
                return jnp.sum(o.astype(jnp.float32)), o
        else:
            def body_fn(qq, kk, vv):
                l, g = jax.value_and_grad(
                    lambda a, b, c: jnp.sum(op(a, b, c).astype(jnp.float32) ** 2),
                    argnums=(0, 1, 2),
                )(qq, kk, vv)
                return l + jnp.sum(g[0].astype(jnp.float32)) + jnp.sum(
                    g[1].astype(jnp.float32)
                ), g[2]

        n = args.steps

        @jax.jit
        def run(q, k, v):
            def body(carry, _):
                qq, kk, vv = carry
                val, new_v = body_fn(qq, kk, vv)
                return (qq, kk, new_v.astype(vv.dtype)), val

            _, vals = jax.lax.scan(body, (q, k, v), None, length=n)
            return vals[-1]

        t0 = time.time()
        _ = float(run(q, k, v))
        compile_s = time.time() - t0
        t0 = time.time()
        _ = float(run(q, k, v))
        return (time.time() - t0) / n, compile_s

    for mode in ["fwd", "fwd_bwd"]:
        dt, compile_s = run_mode(mode)
        print(
            json.dumps(
                {
                    "variant": f"kernel_{mode}",
                    "attn_impl": args.attn_impl,
                    "ms_per_call": round(dt * 1e3, 3),
                    "compile_s": round(compile_s, 1),
                    "bt": bt,
                    "grid": args.grid,
                    "heads": args.heads,
                    "head_dim": d,
                }
            ),
            flush=True,
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", nargs="+", default=["full", "temporal", "axial"])
    ap.add_argument(
        "--kernel", action="store_true",
        help="time the axial attention op alone (fwd / fwd+bwd) instead of "
        "block stacks",
    )
    ap.add_argument("--attn-impl", default="plain")
    ap.add_argument(
        "--fwd-only", action="store_true",
        help="time the forward pass alone (stack variants only)",
    )
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--tw", type=int, default=5)
    ap.add_argument("--grid", type=int, default=32)
    ap.add_argument("--embed-dim", type=int, default=384)
    ap.add_argument("--heads", type=int, default=6)
    ap.add_argument("--depth", type=int, default=12)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind}; shape B{args.batch} T{args.tw} "
        f"{args.grid}x{args.grid} C{args.embed_dim} h{args.heads} "
        f"depth {args.depth} impl {args.attn_impl}")
    if args.kernel:
        time_kernel_isolated(args)
        return
    for v in args.variants:
        dt, compile_s = time_variant(v, args)
        print(
            json.dumps(
                {
                    "variant": v,
                    "attn_impl": args.attn_impl,
                    ("ms_per_step_fwd" if args.fwd_only else "ms_per_step_fwd_bwd"):
                        round(dt * 1e3, 2),
                    "compile_s": round(compile_s, 1),
                    "depth": args.depth,
                    "grid": args.grid,
                    "embed_dim": args.embed_dim,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
