#!/usr/bin/env python3
"""Probe: embed/debed pyramid stage formulations (round-5 profile item #1).

The r05 scanned profile attributes ~25 ms/step to the embed/debed pyramid +
loss side — the largest single subsystem — dominated by the s2d/d2s 6-D
transpose copies in T(2,128) layouts and {2,3,1,0}<->{3,2,1,0} layout flips
at 256^2/128^2 (PROFILE_SCANNED_r05.txt).  This probe A/Bs stage-chain
formulations fwd+bwd at the flagship embed shapes, on the chip:

* ``xla6d``   — the shipped form: 6-D reshape/transpose fold + one matmul.
* ``xla_str`` — strided-slice partial matmuls: ``y = sum_dydx
  x[:, dy::2, dx::2, :] @ K[(dy,dx) rows]``.  No 6-D transpose exists; the
  four quarter-size strided slices keep natural (..., C) layouts and XLA
  can fuse them into the matmul operand loads.  Identical parameters and
  math (the fold is a row-permutation of the contraction — verified).

Both are pure XLA and fully differentiable, so the probe measures the full
training-relevant cost (fwd + bwd via autodiff) of the 4-stage embed chain
plus the mirrored debed consideration left to the kernel decision.

    python scripts/probe_pyramid.py --steps 30
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_bubbleformer")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def in_norm(y, eps=1e-5):
    """InstanceNorm (stats only, no affine — affine folds into the probe's
    elementwise chain identically for both variants).  Takes the f32 stage
    output, emits bf16 (the model's compute dtype)."""
    f = y.astype(jnp.float32)
    m = jnp.mean(f, axis=(1, 2), keepdims=True)
    v = jnp.maximum(jnp.mean(jnp.square(f), axis=(1, 2), keepdims=True) - m * m, 0.0)
    return ((f - m) * jax.lax.rsqrt(v + eps)).astype(jnp.bfloat16)


def fold6d(x):
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, h // 2, w // 2, 4 * c)


def stage_6d(x, k):
    """Shipped form: fold to (..., 4C) then one matmul (f32 accumulate)."""
    return jnp.dot(
        fold6d(x), k.reshape(-1, k.shape[-1]),
        preferred_element_type=jnp.float32,
    )


def stage_strided(x, k):
    """Partial-matmul form: 4 quarter-size strided slices, 4 matmuls summed
    in f32 (same accumulation numerics as the single 4C-row matmul).
    k: (2, 2, C, F) — identical parameter as the conv kernel."""
    acc = None
    for dy in (0, 1):
        for dx in (0, 1):
            part = jnp.dot(
                x[:, dy::2, dx::2, :], k[dy, dx],
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
    return acc


def chain(stage, x, ks):
    """4-stage embed chain: stage -> IN -> gelu (except last)."""
    for i, k in enumerate(ks):
        x = stage(x, k)
        x = in_norm(x)
        if i < len(ks) - 1:
            x = jax.nn.gelu(x, approximate=False)
    return x


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--tw", type=int, default=5)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--embed-dim", type=int, default=384)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    bt = args.batch * args.tw
    e = args.embed_dim
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((bt, args.size, args.size, 4)).astype(np.float32)
    ).astype(jnp.bfloat16)
    widths = [4, e // 4, e // 4, e // 4, e]
    ks = [
        jnp.asarray(
            (rng.standard_normal((2, 2, widths[i], widths[i + 1])) * 0.05).astype(
                np.float32
            )
        ).astype(jnp.bfloat16)
        for i in range(4)
    ]

    # Correctness: identical outputs (the fold is a permutation of the
    # contraction rows; k.reshape matches the (dy, dx, c) minor order).
    y6 = chain(stage_6d, x[:2], ks)
    ys = chain(stage_strided, x[:2], ks)
    err = float(jnp.max(jnp.abs(y6.astype(jnp.float32) - ys.astype(jnp.float32))))
    log(f"variant agreement max err: {err:.2e}")
    # f32-accumulated partials differ from the single 4C-row dot only in
    # summation order; after four IN-renormalized stages with bf16 casts
    # the observable difference is a couple of bf16 ulps at unit scale.
    assert err < 0.05, err

    results = {"agreement_max_err": err}
    for name, stage in [("xla6d", stage_6d), ("xla_str", stage_strided)]:
        if args.fwd_only:
            def run(x, ks):
                return jnp.sum(chain(stage, x, ks).astype(jnp.float32))
        else:
            def run(x, ks):
                def loss(ks):
                    return jnp.sum(chain(stage, x, ks).astype(jnp.float32))

                l, g = jax.value_and_grad(loss)(ks)
                return l + sum(jnp.sum(gg.astype(jnp.float32)) for gg in g)

        def scan_steps(x, ks, n):
            # The carry feeds back into the input so XLA can neither hoist
            # the chain out of the loop nor DCE it (relay measurement rule:
            # scan N iterations inside one jit, sync on a host fetch).
            def body(c, _):
                l = run(x + (c * 1e-8).astype(x.dtype), ks)
                return l.astype(jnp.float32), None

            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return out

        f = jax.jit(lambda x, ks: scan_steps(x, ks, args.steps))
        t0 = time.time()
        _ = float(f(x, ks))
        log(f"{name}: compile+first {time.time()-t0:.1f}s")
        t0 = time.time()
        _ = float(f(x, ks))
        dt = (time.time() - t0) / args.steps * 1e3
        log(f"{name}: {dt:.3f} ms per chain pass ({'fwd' if args.fwd_only else 'fwd+bwd'})")
        results[name + ("_fwd_ms" if args.fwd_only else "_fwdbwd_ms")] = round(dt, 3)

    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
