"""Headline benchmark: 250k-DOF nonlinear magnetostatic solve on TPU.

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

Budget-resilient by construction (the round-2 artifact was rc=124/null
because the JSON only printed after warmup + 3 timed solves + reports):
the mesh loads from a checked-in/cached npz instead of re-meshing, the
backend probe makes ONE attempt with no retry sleep, and the JSON line
prints IMMEDIATELY after the first valid timed solve -- every further
repeat only improves the already-emitted evidence on stderr.

Prints exactly one JSON line on stdout.
"""

import json
import os
import sys
import time

REF_FSOLVER_SECONDS = 15.3        # reference fsolver on the same mesh
TARGET_NODES = 250_000
_HERE = os.path.dirname(os.path.abspath(__file__))
MESH_CACHE = os.path.join(_HERE, ".bench_cache",
                          f"mesh_{TARGET_NODES}.npz")


def _probe_accelerator(timeout_s: float = 150.0) -> bool:
    """Check (in a subprocess, so a wedged tunnel RPC can't hang the
    benchmark) whether the accelerator backend initializes."""
    import subprocess
    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s,
            cwd=_HERE)
    except subprocess.TimeoutExpired:
        print(f"backend probe hung >{timeout_s:.0f}s", file=sys.stderr)
        return False
    if proc.returncode != 0:
        print(f"backend probe failed: {proc.stderr.strip()[-400:]}",
              file=sys.stderr)
        return False
    return proc.stdout.strip() not in ("", "cpu")


def _backend_platform() -> str:
    """Initialize the JAX backend; fall back to CPU (explicitly labeled
    in the metric) rather than failing the benchmark artifact when the
    accelerator is unreachable or its init hangs. ONE attempt -- the
    old retry slept 60 s, which cost the whole artifact under a tight
    driver budget (BENCH_r02 was rc=124)."""
    import jax
    if _probe_accelerator():
        return jax.devices()[0].platform
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")
    return jax.devices()[0].platform


def _get_mesh(prob):
    """Premeshed-fixture strategy (the reference's own:
    cfemm/fsolver/test/CMakeLists.txt:15-27): the bench mesh persists
    as an npz keyed by target size, so repeat runs skip the mesher and,
    more importantly, are guaranteed to time the SAME 249,469-node mesh
    the 15.3 s fsolver baseline was measured on."""
    from xfemm_tpu.mesh import mesher, meshdata

    if os.path.exists(MESH_CACHE):
        try:
            return meshdata.load_npz(MESH_CACHE)
        except Exception as exc:
            print(f"mesh cache unreadable ({exc}); remeshing",
                  file=sys.stderr)
    t0 = time.time()
    mesh = mesher.mesh_problem(prob)
    print(f"meshed {mesh.num_nodes} nodes in {time.time() - t0:.1f}s",
          file=sys.stderr)
    try:
        os.makedirs(os.path.dirname(MESH_CACHE), exist_ok=True)
        meshdata.save_npz(mesh, MESH_CACHE)
    except Exception as exc:
        print(f"mesh cache write failed ({exc})", file=sys.stderr)
    return mesh


def main() -> None:
    t_start = time.time()
    import numpy as np

    sys.path.insert(0, _HERE)
    import xfemm_tpu  # noqa: F401  (enables the persistent compile cache)
    platform = _backend_platform()
    suffix = "" if platform in ("tpu", "axon") \
        else f" [{platform} FALLBACK -- accelerator unreachable]"
    from xfemm_tpu.models import benchprob, magnetostatics

    prob = benchprob.build(TARGET_NODES)
    mesh = _get_mesh(prob)

    # warm-up: pays XLA compilation (cached across runs where possible).
    # Report the persistent-cache state explicitly: cold-with-warm-disk-
    # cache is the number a returning user pays (measured 43-100 s at
    # 250k), cold-no-cache adds the full XLA/Mosaic compile through the
    # device tunnel (300-450 s)
    import glob
    import jax as _jax
    cache_dir = _jax.config.jax_compilation_cache_dir or ""
    n_cached = len(glob.glob(os.path.join(cache_dir, "*-cache"))) \
        if cache_dir else 0
    t0 = time.time()
    sol = magnetostatics.solve(prob, mesh)
    assert sol.residual <= prob.Precision, sol.residual
    print(f"cold solve {time.time() - t0:.1f}s "
          f"({time.time() - t_start:.1f}s since start; XLA cache "
          f"{'warm-on-disk, ' + str(n_cached) + ' entries' if n_cached else 'EMPTY'})",
          file=sys.stderr)

    from xfemm_tpu.utils import profiling
    profiling.ENABLED = True

    # first timed solve -> the artifact, emitted IMMEDIATELY
    t0 = time.time()
    sol = magnetostatics.solve(prob, mesh)
    elapsed = time.time() - t0
    assert sol.residual <= prob.Precision, sol.residual
    assert np.isfinite(sol.A).all()
    print(json.dumps({
        "metric": f"nonlinear magnetostatic solve, {mesh.num_nodes} nodes, "
                  f"1e-8 tol (warm){suffix}",
        "value": round(elapsed, 2),
        "unit": "s",
        "vs_baseline": round(REF_FSOLVER_SECONDS / elapsed, 3),
    }), flush=True)

    # best-of-3 evidence + observability (stderr only from here on; the
    # remote-TPU tunnel adds multi-second RPC jitter per run, so the
    # min over repeats is the honest dispatch-bound estimate)
    its_total = int(sol.iterations)
    best = elapsed
    for _ in range(2):
        t0 = time.time()
        sol = magnetostatics.solve(prob, mesh)
        best = min(best, time.time() - t0)
        its_total += int(sol.iterations)
        assert sol.residual <= prob.Precision, sol.residual
    print(f"best of 3 warm solves: {best:.2f}s "
          f"({REF_FSOLVER_SECONDS / best:.2f}x vs fsolver)",
          file=sys.stderr)
    print(profiling.report(), file=sys.stderr)
    stream_gbps = None
    try:
        from xfemm_tpu.ops import blocktri as bt_mod
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
            # per-CG-iteration streamed bytes by engine: the factor
            # (bt_pcg: 1 op + 1 factor; composite smoother: 3 ops +
            # 2 factor + coarse chain) or the plain V-cycle (3 ops +
            # coarse chain)
            bt = ent.get("bt")
            bt_bytes = 0.0
            if bt is not None:
                bt_bytes = float(bt.Sinv.size * bt.Sinv.dtype.itemsize
                                 + bt.G.size * bt.G.dtype.itemsize)
            coarse_bytes = sum(
                3.0 * lv.A.dense.size * lv.A.dense.dtype.itemsize
                for lv in ent["band_amg"].levels[1:])
            if isinstance(bt, bt_mod.BTSmoother):
                per_it = 3 * bytes_apply + 2 * bt_bytes + coarse_bytes
            elif bt is not None:
                per_it = bytes_apply + bt_bytes
            else:
                per_it = 3 * bytes_apply + coarse_bytes
            cg_s = profiling.phase_seconds("device cg") \
                + profiling.phase_seconds("device newton")
            if cg_s > 0 and its_total:
                # its_total and cg_s cover the three timed solves
                bw = its_total * per_it / cg_s / 1e9
                stream_gbps = bw
                print(f"fine band {NT}x{R}x{W} "
                      f"({bytes_apply / 1e9:.2f} GB/apply, {oob} oob, "
                      f"bt {bt_bytes / 1e9:.2f} GB), "
                      f"in-loop stream ~{bw:.0f} GB/s "
                      f"(~{100 * bw / 819:.0f}% of v5e HBM peak), "
                      f"{its_total} CG its over 3 solves",
                      file=sys.stderr)
                # gap accounting: the standalone kernels stream at
                # 380-500 GB/s (perf/pieces.py); the in-loop average is
                # lower because a warm solve is only ~40% device-busy
                # -- the rest is per-dispatch launch/serialization on
                # the tunneled device, host<->device vector transfers
                # between refinement passes, and the host CSR/metric
                # work between dispatches (phase split above)
                print("gap owner: dispatch/transfer overhead between "
                      "passes, not kernel bandwidth "
                      "(perf/pieces.py measures the kernels at "
                      "380-500 GB/s)", file=sys.stderr)
    except Exception as exc:  # observability must never fail the bench
        print(f"(bandwidth estimate unavailable: {exc})", file=sys.stderr)

    # stream-rate floor: the r4 regression (87 GB/s vs r3's 141) went
    # unnoticed because nothing asserted a floor. The JSON artifact is
    # already emitted above, so failing here is loud but harmless.
    # Tunnel jitter swings the in-loop average ~2x between runs (the
    # same 69-iteration solve measured 110 and 78 GB/s an hour apart),
    # so the hard floor sits below the jitter band and a WARNING flags
    # anything under the healthy range.
    if platform not in ("cpu",) and stream_gbps is not None:
        if stream_gbps < 100.0:
            print(f"WARNING: in-loop stream {stream_gbps:.0f} GB/s is "
                  f"below the healthy 100+ band (tunnel jitter or a "
                  f"regression -- re-run; sustained values near 50 "
                  f"mean a real regression)", file=sys.stderr)
        assert stream_gbps >= 50.0, (
            f"in-loop stream rate regressed to {stream_gbps:.0f} GB/s "
            f"(hard floor 50): profile the solve loop before shipping")


if __name__ == "__main__":
    main()
