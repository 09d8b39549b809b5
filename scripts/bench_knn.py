"""k-NN kernel measurement harness: XLA (`ops.neighbors.knn`) vs Pallas
(`ops.pallas_knn.knn_pallas`) on the real chip.

Reproduces the measurements quoted in `ops/pallas_knn.py`'s STATUS note —
the numbers that justify keeping the XLA path wired in the hot loop at
post-downsample map sizes and the Pallas kernel as the exact-k alternative
for >64k-point maps. Run on a chip:

    python scripts/bench_knn.py                 # production size (1920x8192)
    python scripts/bench_knn.py --sizes 1920x16384,3840x65536
    python scripts/bench_knn.py --no-pallas     # XLA-only sweep (cheap)

Pallas Mosaic compile time at large N is substantial (the unrolled
chunk x knockout rounds; quoted ~330 s at 8192 refs) and is reported
separately from steady-state latency so the tradeoff is visible.
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def measure(fn, args, iters=20):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3, compile_s, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1920x8192",
                    help="comma-separated QxN list")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--no-pallas", action="store_true")
    args = ap.parse_args()

    from lmsf_slam_tpu.ops import neighbors
    from lmsf_slam_tpu.ops.pallas_knn import knn_pallas

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    key = jax.random.PRNGKey(0)
    rows = []
    for spec in args.sizes.split(","):
        Q, N = (int(s) for s in spec.split("x"))
        kq, kr = jax.random.split(jax.random.fold_in(key, Q * N))
        q = jax.random.uniform(kq, (Q, 3), minval=-50.0, maxval=50.0)
        r = jax.random.uniform(kr, (N, 3), minval=-50.0, maxval=50.0)
        qm = jnp.ones(Q, bool)
        rm = jnp.ones(N, bool)

        xla = jax.jit(lambda a, b, c, d: neighbors.knn(a, b, c, d, k=args.k))
        xla_ms, xla_compile, (xd, xi) = measure(
            xla, (q, qm, r, rm), args.iters)
        row = {"Q": Q, "N": N, "k": args.k,
               "xla_ms": round(xla_ms, 3),
               "xla_compile_s": round(xla_compile, 1)}

        if not args.no_pallas:
            pal = lambda a, b, c, d: knn_pallas(
                a, b, c, d, k=args.k, interpret=not on_tpu)
            pal_ms, pal_compile, (pd, pi) = measure(
                pal, (q, qm, r, rm), args.iters)
            # exactness check: Pallas is exact top-k; XLA uses approx_max_k
            # (0.95 recall target) — compare against brute-force on a sample
            sample = slice(0, min(Q, 512))
            d_full = jnp.sum(
                (q[sample, None, :] - r[None, :, :]) ** 2, axis=-1)
            true_d = jax.lax.top_k(-d_full, args.k)[0] * -1.0
            pal_err = float(jnp.max(jnp.abs(
                jnp.sort(pd[sample], axis=1) - jnp.sort(true_d, axis=1))))
            xla_recall = float(jnp.mean(
                jnp.abs(jnp.sort(xd[sample], axis=1)
                        - jnp.sort(true_d, axis=1)) < 1e-3))
            row.update(pallas_ms=round(pal_ms, 3),
                       pallas_compile_s=round(pal_compile, 1),
                       pallas_max_err=round(pal_err, 6),
                       xla_recall=round(xla_recall, 4))
        rows.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"device": str(jax.devices()[0]), "rows": len(rows)}))


if __name__ == "__main__":
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
