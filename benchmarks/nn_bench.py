"""Micro-benchmarks: bidirectional NN (chamfer core) + retrieval top-k.

Run on the real chip:  python benchmarks/nn_bench.py [nn|topk|all]

Round-2 baseline (dual-matmul nn_distance, lax.top_k retrieval):
  nn [16x16384 vs 2048] XLA 10.0 ms; retrieve_topk [512 x 100k x 512, k=40]
  11.0 ms (NOTES.md).
"""

from __future__ import annotations

import sys

import numpy as np


def bench_nn():
    import jax
    import jax.numpy as jnp

    from benchmarks.timing import time_fn
    from ured_tpu.ops.chamfer import chamfer_raw

    rng = np.random.default_rng(0)
    shapes = [
        (16, 16384, 2048),
        (256, 1024, 2048),
        (16, 2048, 16384),
        (16, 16, 1024, 1024),  # per-part chamfer shape (B, P folded)
    ]
    for shp in shapes:
        if len(shp) == 4:
            b, p, n, m = shp
            x = jnp.asarray(rng.normal(size=(b * p, n, 3)), jnp.float32)
            y = jnp.asarray(rng.normal(size=(b * p, m, 3)), jnp.float32)
            label = f"[{b}x{p}x{n} vs {m}]"
        else:
            b, n, m = shp
            x = jnp.asarray(rng.normal(size=(b, n, 3)), jnp.float32)
            y = jnp.asarray(rng.normal(size=(b, m, 3)), jnp.float32)
            label = f"[{b}x{n} vs {m}]"
        f = jax.jit(lambda x, y: chamfer_raw(x, y)[0])
        dt = time_fn(f, x, y)
        print(f"nn {label}: {dt * 1e3:.2f} ms")

        # forward+backward through the custom VJP
        g = jax.jit(jax.grad(
            lambda x, y: chamfer_raw(x, y)[0].mean()
            + chamfer_raw(x, y)[2].mean()))
        dt = time_fn(g, x, y)
        print(f"nn+grad {label}: {dt * 1e3:.2f} ms")


def bench_nn_variants():
    """Full-contract comparison (all four outputs consumed): XLA fused
    argmin+recompute vs Pallas exact vs Pallas packed-min."""
    import jax
    import jax.numpy as jnp

    from benchmarks.timing import time_fn
    from ured_tpu.ops.chamfer import _nn_both_directions
    from ured_tpu.ops.chamfer_pallas import (
        nn_distance_pallas,
        nn_indices_pallas_packed,
        pick_tile,
    )

    rng = np.random.default_rng(0)
    shapes = [(16, 16384, 2048), (256, 1024, 2048), (16, 2048, 2048)]
    for b, n, m in shapes:
        x = jnp.asarray(rng.normal(size=(b, n, 3)), jnp.float32)
        y = jnp.asarray(rng.normal(size=(b, m, 3)), jnp.float32)
        xm = jnp.ones((b, n), jnp.float32)
        ym = jnp.ones((b, m), jnp.float32)
        label = f"[{b}x{n} vs {m}]"
        def consume_all(f):
            # sum every output so DCE cannot drop a direction
            def g(x, y, xm, ym):
                import jax.numpy as jnp
                return sum(o.sum().astype(jnp.float32) for o in f(x, y, xm, ym))
            return g

        cands = {
            "xla_fused": consume_all(_nn_both_directions),
        }
        if pick_tile(n, m) > 0:
            cands["pallas_exact"] = consume_all(
                lambda x, y, xm, ym: nn_distance_pallas(x, y, xm, ym))
            cands["pallas_packed"] = consume_all(
                lambda x, y, xm, ym: nn_indices_pallas_packed(x, y, xm, ym))
        for name, f in cands.items():
            try:
                dt = time_fn(jax.jit(f), x, y, xm, ym)
                print(f"nnvar {label} {name}: {dt * 1e3:.2f} ms",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"nnvar {label} {name}: FAILED "
                      f"{type(e).__name__}: {e}", flush=True)


def bench_topk():
    import jax
    import jax.numpy as jnp

    from benchmarks.timing import time_fn
    from ured_tpu.parallel.retrieval import l2_normalize

    rng = np.random.default_rng(0)
    q_, s_, c, k = 512, 102400, 512, 40
    q = jnp.asarray(rng.normal(size=(q_, c)), jnp.float32)
    db = jnp.asarray(rng.normal(size=(s_, c)), jnp.float32)

    def sims(q, db):
        return jnp.einsum("qc,sc->qs", l2_normalize(q), l2_normalize(db),
                          preferred_element_type=jnp.float32)

    variants = {
        "matmul_only": lambda q, db: jnp.max(sims(q, db), -1),
        "lax.top_k": lambda q, db: jax.lax.top_k(sims(q, db), k)[0],
        "approx_max_k": lambda q, db: jax.lax.approx_max_k(sims(q, db), k)[0],
        "approx_r1.0": lambda q, db: jax.lax.approx_max_k(
            sims(q, db), k, recall_target=0.999)[0],
        "blocked_exact": lambda q, db: _blocked_topk(sims(q, db), k)[0],
    }
    for name, f in variants.items():
        try:
            dt = time_fn(jax.jit(f), q, db)
            print(f"topk[{q_}x{s_}x{c},k={k}] {name}: {dt * 1e3:.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"topk {name}: FAILED {type(e).__name__}: {e}")


def _blocked_topk(s, k, block=8192):
    """Exact top-k via per-block top-k then a final merge."""
    import jax
    import jax.numpy as jnp

    q_, n = s.shape
    nb = n // block
    sb = s[:, : nb * block].reshape(q_, nb, block)
    vals, idx = jax.lax.top_k(sb, k)                  # [Q, nb, k]
    idx = idx + (jnp.arange(nb) * block)[None, :, None]
    vals = vals.reshape(q_, nb * k)
    idx = idx.reshape(q_, nb * k)
    v, j = jax.lax.top_k(vals, k)
    return v, jnp.take_along_axis(idx, j, axis=-1)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("nn", "all"):
        bench_nn()
    if which in ("variants", "all"):
        bench_nn_variants()
    if which in ("topk", "all"):
        bench_topk()
