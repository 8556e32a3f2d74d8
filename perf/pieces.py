"""Per-kernel device timings of the live solver state (PROFILE_994K.md).

Runs one warm solve of a bench problem, then times each piece of the
band engine's hot loop (operator apply, blocktri apply, V-cycle) on
the session's actual device state -- the evidence base for per-
iteration cost claims. Usage:

    python perf/pieces.py [target_nodes]     # default 1_000_000
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)


def main():
    import numpy as np

    import xfemm_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp
    from xfemm_tpu.mesh import meshdata
    from xfemm_tpu.models import benchprob, magnetostatics
    from xfemm_tpu.ops import band as band_mod
    from xfemm_tpu.ops import blocktri as bt_mod
    from xfemm_tpu.ops import solver as solver_mod

    target = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    prob = benchprob.build(target)
    cache = os.path.join(ROOT, ".bench_cache",
                         "mesh_994k.npz" if target >= 900_000
                         else f"mesh_{target}.npz")
    mesh = meshdata.load_npz(cache) if os.path.exists(cache) else None
    if mesh is None:
        from xfemm_tpu.mesh import mesher
        mesh = mesher.mesh_problem(prob)
    sol = magnetostatics.solve(prob, mesh)
    print(f"solve done, resid {sol.residual:.2e}", flush=True)

    ent = next(iter(solver_mod._BAND_CACHE.values()))
    amg = ent["band_amg"]
    bt = ent.get("bt")
    lv0 = amg.levels[0]
    n = amg.n
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n),
                    jnp.float32)

    def timeit(name, fn, nbytes, reps=20):
        r = fn(x)
        jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(reps):
            r = fn(x)
        jax.block_until_ready(r)
        dt = (time.time() - t0) / reps * 1000
        rate = nbytes / (dt * 1e-3) / 1e9 if nbytes else 0.0
        print(f"{name:32s} {dt:8.2f} ms  {rate:6.0f} GB/s "
              f"({100 * rate / 819:.0f}% of v5e peak)", flush=True)

    op_f = jax.jit(lambda A, d, oob, v: band_mod.band_apply(A, d, v, oob))
    fine_b = lv0.A.dense.size * lv0.A.dense.dtype.itemsize
    timeit("fine op (band + sidecar)",
           lambda v: op_f(lv0.A, lv0.dvec, lv0.oob, v), fine_b)
    if bt is not None:
        bt_f = jax.jit(lambda b_, v: bt_mod.bt_apply(b_, v))
        bt_b = (bt.Sinv.size * bt.Sinv.dtype.itemsize
                + bt.G.size * bt.G.dtype.itemsize)
        timeit("bt apply", lambda v: bt_f(bt, v), bt_b)
        if isinstance(bt, bt_mod.BTSmoother):
            vc_f = jax.jit(lambda a, b_, v: band_mod.band_vcycle(
                a, v, bt=b_))
            vc_b = 2 * bt_b + 2 * fine_b + sum(
                lv.A.dense.size * lv.A.dense.dtype.itemsize * 3
                for lv in amg.levels[1:])
            timeit("composite V-cycle",
                   lambda v: vc_f(amg, bt, v), vc_b)
    if len(amg.levels) > 1:
        lv1 = amg.levels[1]
        n1 = lv1.A.ncols
        timeit("L1 apply (band + sidecar)",
               lambda v: op_f(lv1.A, lv1.dvec, lv1.oob, v[:n1]),
               lv1.A.dense.size * lv1.A.dense.dtype.itemsize)


if __name__ == "__main__":
    main()
