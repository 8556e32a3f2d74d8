"""Single source of truth for the README performance table.

Measures every row on the CURRENT meshes against freshly-timed runs of
the unmodified reference solvers (built from /root/reference at -O2,
binaries expected at /tmp/refbin -- see .claude/skills/verify/SKILL.md
for the build recipe), and writes ``perf/measurements.json``. The
README table is generated from that file by ``perf/table.py`` --
hand-edited numbers drift (round 2 shipped three mutually inconsistent
baselines for the same problem).

Usage:
    python perf/measure.py                 # all rows
    python perf/measure.py mag250k ac125k  # subset

Each row: mesh once (cached under .bench_cache as npz + the premeshed
reference files), run the reference binary best-of-2, run ours warm
best-of-5 (first solve = cold, also recorded).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)
CACHE = os.path.join(ROOT, ".bench_cache")
REFBIN = "/tmp/refbin"
OUT = os.path.join(HERE, "measurements.json")


def _mesh_cached(name, prob):
    from xfemm_tpu.mesh import mesher, meshdata
    path = os.path.join(CACHE, f"{name}.npz")
    if os.path.exists(path):
        return meshdata.load_npz(path)
    t0 = time.time()
    mesh = mesher.mesh_problem(prob)
    print(f"[{name}] meshed {mesh.num_nodes} nodes "
          f"in {time.time() - t0:.1f}s", file=sys.stderr)
    os.makedirs(CACHE, exist_ok=True)
    meshdata.save_npz(mesh, path)
    return mesh


def _run_reference(name, prob, mesh, binary, ext):
    """Write .fem + premeshed files into a scratch dir, run the
    reference solver twice (it deletes the mesh files), best-of-2."""
    from xfemm_tpu.geometry import femfile
    from xfemm_tpu.mesh import meshdata
    exe = os.path.join(REFBIN, binary)
    if not os.path.exists(exe):
        print(f"[{name}] reference binary {exe} missing -- skipping "
              f"baseline (see verify skill for the build recipe)",
              file=sys.stderr)
        return None
    work = os.path.join("/tmp", f"perf_{name}")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    base = os.path.join(work, "prob")
    femfile.dump(prob, base + ext)
    best = None
    for _ in range(2):
        meshdata.write_mesh_files(mesh, base)
        t0 = time.time()
        proc = subprocess.run([exe, base], capture_output=True,
                              text=True, timeout=3600)
        dt = time.time() - t0
        if proc.returncode != 0:
            print(f"[{name}] reference run failed: "
                  f"{proc.stdout[-500:]} {proc.stderr[-500:]}",
                  file=sys.stderr)
            return None
        best = dt if best is None else min(best, dt)
        print(f"[{name}] reference {binary}: {dt:.2f}s", file=sys.stderr)
    return best


def _time_ours(name, solve_fn, repeats=5):
    from xfemm_tpu.utils import profiling
    t0 = time.time()
    sol = solve_fn()
    cold = time.time() - t0
    print(f"[{name}] ours cold: {cold:.2f}s", file=sys.stderr)
    profiling.ENABLED = True
    profiling.reset()
    best = None
    its = 0
    for _ in range(repeats):
        t0 = time.time()
        sol = solve_fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        its += int(getattr(sol, "iterations", 0))
    print(f"[{name}] ours warm best-of-{repeats}: {best:.2f}s",
          file=sys.stderr)
    # per-warm-solve phase split (averaged over the repeats): the
    # committed evidence for where the remaining time goes
    phases = {k: round(v / repeats, 3)
              for k, v in sorted(profiling.snapshot().items(),
                                 key=lambda kv: -kv[1]) if v >= 0.005}
    profiling.ENABLED = False
    print(f"[{name}] warm phases: {phases}", file=sys.stderr)
    return cold, best, sol, phases, its // repeats


def row_mag(name, target):
    from xfemm_tpu.models import benchprob, magnetostatics
    prob = benchprob.build(target)
    mesh = _mesh_cached(name, prob)
    ref = _run_reference(name, prob, mesh, "fsolver", ".fem")
    cold, warm, sol, phases, its = _time_ours(
        name, lambda: magnetostatics.solve(prob, mesh))
    assert sol.residual <= prob.Precision
    return dict(problem="nonlinear magnetostatic, 1e-8",
                nodes=int(mesh.num_nodes), ref_s=ref, cold_s=cold,
                warm_s=warm, ref_binary="fsolver",
                warm_phases_s=phases, cg_iterations=its)


def row_ac(name, target):
    from xfemm_tpu.models import benchprob, harmonic
    prob = benchprob.build_ac(target)
    mesh = _mesh_cached(name, prob)
    ref = _run_reference(name, prob, mesh, "fsolver", ".fem")
    cold, warm, sol, phases, its = _time_ours(
        name, lambda: harmonic.solve(prob, mesh))
    assert sol.residual <= prob.Precision
    return dict(problem="50 Hz eddy current (complex), 1e-8",
                nodes=int(mesh.num_nodes), ref_s=ref, cold_s=cold,
                warm_s=warm, ref_binary="fsolver",
                warm_phases_s=phases, cg_iterations=its)


def row_heat(name, target):
    from xfemm_tpu.models import benchprob, heatflow
    prob = benchprob.build_heat(target)
    mesh = _mesh_cached(name, prob)
    ref = _run_reference(name, prob, mesh, "hsolver", ".feh")
    cold, warm, sol, phases, its = _time_ours(
        name, lambda: heatflow.solve(prob, mesh))
    assert sol.residual <= prob.Precision
    return dict(problem="nonlinear heat flow K(T), 1e-8",
                nodes=int(mesh.num_nodes), ref_s=ref, cold_s=cold,
                warm_s=warm, ref_binary="hsolver",
                warm_phases_s=phases, cg_iterations=its)


ROWS = {
    "mag250k": lambda: row_mag("mesh_250000", 250_000),
    "mag994k": lambda: row_mag("mesh_994k", 1_000_000),
    "ac125k": lambda: row_ac("mesh_ac125k", 125_000),
    "heat230k": lambda: row_heat("mesh_heat230k", 230_000),
}


def main():
    names = sys.argv[1:] or list(ROWS)
    if len(names) > 1:
        # one subprocess per row: rows budget the WHOLE device for
        # their hierarchy (running them in one process leaks the
        # previous row's device caches into the next row's budget --
        # heat230k RESOURCE_EXHAUSTED after the AC row's 4 GB of band
        # state), and per-row cold times stay honest
        for name in names:
            print(f"--- spawning {name} ---", file=sys.stderr)
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), name])
            if proc.returncode != 0:
                print(f"row {name} failed rc={proc.returncode}",
                      file=sys.stderr)
        return
    import xfemm_tpu  # noqa: F401  compile cache
    data = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            data = json.load(f)
    for name in names:
        print(f"=== {name} ===", file=sys.stderr)
        row = ROWS[name]()
        row["measured_at"] = time.strftime("%Y-%m-%d %H:%M UTC",
                                           time.gmtime())
        import jax
        row["backend"] = jax.devices()[0].platform
        data[name] = row
        with open(OUT, "w") as f:
            json.dump(data, f, indent=1)
        print(json.dumps({name: row}), flush=True)


if __name__ == "__main__":
    main()
