"""Heat-flow and electrostatics solvers vs the reference binaries.

Golden data produced by the unmodified reference hsolver/esolver on the
checked-in premeshed fixtures:

* HeatTemp0: the reference test suite's Temp0.feh (nonlinear air K(T)
  curve, convection boundaries on both walls) meshed by this package.
* ElecTest: the reference test suite's test.fee (axisymmetric capacitor
  with two fixed-voltage conductors) -- exercises the conductor
  machinery and the charge integral.
"""

import numpy as np
from scipy.spatial import cKDTree

from xfemm_tpu.geometry import femfile
from xfemm_tpu.io import ansfile
from xfemm_tpu.mesh.meshdata import read_mesh_files
from xfemm_tpu.models import electrostatics, heatflow


def test_heat_matches_reference(fixtures):
    p = femfile.load(str(fixtures / "HeatTemp0.feh"))
    mesh = read_mesh_files(str(fixtures / "HeatTemp0"))
    sol = heatflow.solve(p, mesh)
    assert sol.residual <= p.Precision

    g = ansfile.read_ans(str(fixtures / "HeatTemp0.anh.golden"))
    d, idx = cKDTree(mesh.nodes).query(g.mesh.nodes)
    assert d.max() < 1e-12
    Tg = np.real(g.values)
    scale = np.abs(Tg).max()
    assert np.abs(sol.T[idx] - Tg).max() / scale < 1e-6


def test_heat_band_device_loop_matches_reference(fixtures, monkeypatch):
    """The TPU heat path (f32 band engine + the fused K(T) substitution
    loop ops/newton.py::run_heat, forced on by pretending the device has
    no f64) must reproduce the golden solution and actually take the
    fused loop."""
    import collections
    from xfemm_tpu.ops import newton, solver

    monkeypatch.setattr(solver, "device_f64_ok", lambda: False)
    monkeypatch.setattr(solver, "band_platform_ok", lambda: True)
    monkeypatch.setattr(solver, "ROW_TILE_MIN", 64)
    monkeypatch.setattr(solver, "_BAND_CACHE", collections.OrderedDict())
    monkeypatch.setattr(solver, "_PATTERN_CACHE",
                        collections.OrderedDict())
    calls = []
    real_run = newton.run_heat
    monkeypatch.setattr(newton, "run_heat",
                        lambda *a, **k: (calls.append(1),
                                         real_run(*a, **k))[1])

    p = femfile.load(str(fixtures / "HeatTemp0.feh"))
    mesh = read_mesh_files(str(fixtures / "HeatTemp0"))
    sol = heatflow.solve(p, mesh)
    assert sol.residual <= p.Precision
    assert calls, "fused device heat loop never engaged"

    g = ansfile.read_ans(str(fixtures / "HeatTemp0.anh.golden"))
    d, idx = cKDTree(mesh.nodes).query(g.mesh.nodes)
    Tg = np.real(g.values)
    scale = np.abs(Tg).max()
    assert np.abs(sol.T[idx] - Tg).max() / scale < 1e-6


def test_electrostatics_matches_reference(fixtures):
    p = femfile.load(str(fixtures / "ElecTest.fee"))
    mesh = read_mesh_files(str(fixtures / "ElecTest"))
    sol = electrostatics.solve(p, mesh)
    assert sol.residual <= p.Precision

    g = ansfile.read_ans(str(fixtures / "ElecTest.res.golden"))
    d, idx = cKDTree(mesh.nodes).query(g.mesh.nodes)
    assert d.max() < 1e-12
    scale = np.abs(g.values).max()
    assert np.abs(sol.V[idx] - g.values).max() / scale < 5e-6
    # conductor voltage + computed total charge
    for (gv, gq), ov, oq in zip(g.conductor_results, sol.conductor_V,
                                sol.conductor_q):
        assert abs(ov - gv) <= 1e-6 * max(1.0, abs(gv))
        assert abs(oq - gq) <= 1e-6 * max(abs(gq), 1e-12)
