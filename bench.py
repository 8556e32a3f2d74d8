"""Headline benchmark: 254k-DOF nonlinear magnetostatic solve on TPU.

Solves the scalable benchmark problem (xfemm_tpu/models/benchprob.py: a
saturated-steel cylinder between two coils, nonlinear B-H Newton loop,
Precision 1e-8 -- the same physics class as the reference's fsolver hot
path) and reports wall time for a warm solve (compiles cached; the first
solve pays one-time XLA compilation).

Baseline: the unmodified reference fsolver (single-threaded C++, built
from /root/reference at -O2) solves the identical premeshed 249,469-node
problem in 15.3 s on this machine (AMD EPYC-class host, single core) --
measured 2026-08-18 (best of 2: 15.31/15.45 s) on the mesh produced by
the current refinement kernel (generation-stamped queue, magnetics
area_tighten 1.0, benchprob factor 0.857). ``vs_baseline`` is the
speedup factor baseline_time / our_time (>1 means faster than the
reference).

Prints exactly one JSON line.
"""

import json
import os
import sys
import time

REF_FSOLVER_SECONDS = 15.3        # reference fsolver on the same mesh
TARGET_NODES = 250_000


def _probe_accelerator(timeout_s: float = 180.0) -> bool:
    """Check (in a subprocess, so a wedged tunnel RPC can't hang the
    benchmark) whether the accelerator backend initializes."""
    import subprocess
    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s,
            cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired:
        print(f"backend probe hung >{timeout_s:.0f}s", file=sys.stderr)
        return False
    if proc.returncode != 0:
        print(f"backend probe failed: {proc.stderr.strip()[-400:]}",
              file=sys.stderr)
        return False
    return proc.stdout.strip() not in ("", "cpu")


def _backend_platform() -> str:
    """Initialize the JAX backend, retrying once if the remote TPU
    tunnel is briefly unavailable; fall back to CPU (explicitly labeled
    in the metric) rather than failing the benchmark artifact when the
    accelerator is unreachable or its init hangs."""
    import jax
    for attempt in (1, 2):
        if _probe_accelerator():
            return jax.devices()[0].platform
        if attempt == 1:
            time.sleep(60)
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")
    return jax.devices()[0].platform


def main() -> None:
    t_start = time.time()
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import xfemm_tpu  # noqa: F401  (enables the persistent compile cache)
    platform = _backend_platform()
    suffix = "" if platform in ("tpu", "axon") \
        else f" [{platform} FALLBACK -- accelerator unreachable]"
    from xfemm_tpu.mesh import mesher
    from xfemm_tpu.models import benchprob, magnetostatics

    prob = benchprob.build(TARGET_NODES)
    mesh = mesher.mesh_problem(prob)

    # warm-up: pays XLA compilation (cached across runs where possible)
    sol = magnetostatics.solve(prob, mesh)
    assert sol.residual <= prob.Precision, sol.residual

    # best of 3: the remote-TPU tunnel adds multi-second RPC jitter per
    # run, and min is the standard estimator for dispatch-bound repeats
    from xfemm_tpu.utils import profiling
    profiling.ENABLED = True
    elapsed = float("inf")
    its_total = 0
    for _ in range(3):
        t0 = time.time()
        sol = magnetostatics.solve(prob, mesh)
        elapsed = min(elapsed, time.time() - t0)
        its_total += int(sol.iterations)
        assert sol.residual <= prob.Precision, sol.residual
    assert np.isfinite(sol.A).all()

    # observability (stderr; stdout stays one JSON line): phase split of
    # the three timed solves plus a fine-level SpMV throughput/MFU
    # estimate from the band dims and the CG iteration count
    print(profiling.report(), file=sys.stderr)
    try:
        from xfemm_tpu.ops import solver as solver_mod
        ent = next(iter(solver_mod._BAND_CACHE.values()), None)
        dev = ent["band_amg"].levels[0] if ent else None
        if dev is not None:
            # the sidecar-split fine band is skinny: its SpMV is
            # HBM-bandwidth-bound, so achieved GB/s vs the v5e's
            # ~819 GB/s is the honest utilization number (the MXU
            # TFLOP metric only applies to the coarse dense factors)
            NT, R, W = dev.A.dense.shape
            bytes_apply = float(NT) * R * W \
                * dev.A.dense.dtype.itemsize
            oob = 0 if dev.oob is None else int(dev.oob.rows.size)
            cg_s = profiling.phase_seconds("device cg") \
                + profiling.phase_seconds("device newton")
            if cg_s > 0 and its_total:
                # ~2 fine applies per preconditioned CG iteration
                # (operator + V-cycle smoothing at the fine level);
                # its_total and cg_s both cover all three timed solves
                bw = 2 * its_total * bytes_apply / cg_s / 1e9
                print(f"fine band {NT}x{R}x{W} "
                      f"({bytes_apply / 1e9:.2f} GB/apply, {oob} oob), "
                      f"SpMV stream ~{bw:.0f} GB/s "
                      f"(~{100 * bw / 819:.0f}% of v5e HBM peak), "
                      f"{its_total} CG its over 3 solves",
                      file=sys.stderr)
    except Exception as exc:  # observability must never fail the bench
        print(f"(bandwidth estimate unavailable: {exc})", file=sys.stderr)

    print(json.dumps({
        "metric": f"nonlinear magnetostatic solve, {mesh.num_nodes} nodes, "
                  f"1e-8 tol (warm){suffix}",
        "value": round(elapsed, 2),
        "unit": "s",
        "vs_baseline": round(REF_FSOLVER_SECONDS / elapsed, 3),
    }))


if __name__ == "__main__":
    main()
