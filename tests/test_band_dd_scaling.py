"""Iteration-count scaling of the sharded band engine vs device count.

SURVEY §2.11 north-star: mesh-partition domain decomposition whose
preconditioner quality does not collapse as the partition count grows.
This pins the band_dd claim at 100k DOF (VERDICT r3 item 8): per-device
dense bands + exact local block-Thomas factors, P = 2, 4, 8, 16 virtual
devices, asserting

* every partition count reproduces the single-matrix solution (1e-8),
* iteration growth stays bounded (its(P=16) <= 3x its(P=2)) -- the
  additive-Schwarz-style local factors lose only boundary coupling, so
  iterations grow roughly with the interface fraction, not P.

Measured table lives in PARITY.md ("Multi-chip scaling").  Runs in a
subprocess because the 16-device mesh needs
--xla_force_host_platform_device_count=16 before JAX initializes
(conftest pins 8 for everything else).
"""

import json
import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent

SWEEP = r"""
import os, sys, json
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if not f.startswith("--xla_force_host_platform_device_count")]
os.environ["XLA_FLAGS"] = " ".join(
    flags + ["--xla_force_host_platform_device_count=16"])
sys.path.insert(0, sys.argv[1])
import numpy as np
from xfemm_tpu.mesh import mesher, meshdata
from xfemm_tpu.models import benchprob, magnetostatics
from xfemm_tpu.ops import assembly
from xfemm_tpu.ops.solver import ElementBlock
from xfemm_tpu.ops import solver as solver_mod
from xfemm_tpu.parallel.driver import DistributedSession

N = 100_000
cache = os.path.join(sys.argv[1], ".bench_cache", f"mesh_{N}.npz")
p = benchprob.build(N)
if os.path.exists(cache):
    mesh = meshdata.load_npz(cache)
else:
    mesh = mesher.mesh_problem(p)
    try:
        meshdata.save_npz(mesh, cache)
    except OSError:
        pass
pk = magnetostatics.pack(p, mesh)
geom = assembly.tri_geometry(pk.xy, pk.tris)
Mx, My, _ = assembly.curl_matrices(geom)
mu = np.where(pk.nonlinear, 1000.0, pk.mu_x)
Me = np.asarray(Mx)/mu[:, None, None] + np.asarray(My)/mu[:, None, None]
idx = pk.ridx[pk.tris]; sign = pk.rsign[pk.tris]
eb = [ElementBlock(idx=idx, sign=sign, mat=-Me)]
b = np.zeros(pk.nreduced)
np.add.at(b, idx.reshape(-1),
          -(sign * (-(pk.Jre*np.asarray(geom.area)/3.0)[:, None]
                    * np.ones((1, 3)))).reshape(-1))
coords = np.zeros((pk.nreduced, 2)); coords[pk.ridx] = pk.xy

# f64 CSR ground truth (scipy spsolve on the Dirichlet-eliminated
# operator -- exact, independent of any iterative path under test)
import scipy.sparse.linalg as spla
sess0 = solver_mod.Session()
At = sess0.csr_values(eb, pk.nreduced, np.asarray(pk.fixed_mask, bool))
x_ref = spla.spsolve(At.tocsc(), b)

out = {"n": int(pk.nreduced)}
for P in (2, 4, 8, 16):
    sess = DistributedSession(P)
    x, res, its = sess.solve(eb, b, pk.fixed_mask, pk.fixed_vals,
                             1e-10, coords=coords)
    assert sess._bdd is not None and not sess._bdd_disabled, P
    err = float(np.abs(np.asarray(x) - x_ref).max()
                / np.abs(x_ref).max())
    out[str(P)] = {"its": int(its), "res": float(res), "err": err}
print("SWEEPJSON " + json.dumps(out))
"""


@pytest.mark.slow
def test_band_dd_iteration_scaling():
    proc = subprocess.run(
        [sys.executable, "-c", SWEEP, str(REPO)],
        capture_output=True, text=True, timeout=3600,
        env={k: v for k, v in os.environ.items()
             if k not in ("XLA_FLAGS",)})
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = next(ln for ln in proc.stdout.splitlines()
                if ln.startswith("SWEEPJSON "))
    data = json.loads(line[len("SWEEPJSON "):])
    assert data["n"] >= 99_000
    for P in ("2", "4", "8", "16"):
        assert data[P]["err"] < 1e-8, (P, data)
        assert data[P]["res"] <= 1e-10 * 1e2, (P, data)
    # bounded growth: 8x more devices costs < 3x iterations
    assert data["16"]["its"] <= 3 * data["2"]["its"], data
    assert data["16"]["its"] <= 600, data
