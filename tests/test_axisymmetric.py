"""Axisymmetric magnetostatics vs the reference solver.

Golden data: tests/fixtures/AxiSolenoid.ans.golden was produced by the
unmodified reference fsolver on the checked-in premeshed AxiSolenoid
fixture (nonlinear steel rod on the axis + coil annulus + A=0 far
boundary), so both solvers see the identical mesh. Exercises the
r-weighted element matrices, on-axis pinning, and the energy-form Newton
loop of staticaxi.cpp.
"""

import numpy as np
from scipy.spatial import cKDTree

from xfemm_tpu.geometry import femfile
from xfemm_tpu.io import ansfile
from xfemm_tpu.mesh.meshdata import read_mesh_files
from xfemm_tpu.models import axisymmetric


def test_axi_solenoid_matches_reference(fixtures):
    p = femfile.load(str(fixtures / "AxiSolenoid.fem"))
    mesh = read_mesh_files(str(fixtures / "AxiSolenoid"))
    sol = axisymmetric.solve(p, mesh)
    assert sol.residual <= p.Precision

    g = ansfile.read_ans(str(fixtures / "AxiSolenoid.ans.golden"))
    tree = cKDTree(mesh.nodes)
    d, idx = tree.query(g.mesh.nodes)
    assert d.max() < 1e-12
    Ag = np.real(g.values)
    scale = np.abs(Ag).max()
    assert np.abs(sol.A[idx] - Ag).max() / scale < 1e-6


def test_axi_band_device_newton_matches_reference(fixtures, monkeypatch):
    """The TPU axisymmetric path (f32 band engine + the fused device
    Newton loop with the energy-form |B|, forced on by pretending the
    device has no f64) must reproduce the golden solution and actually
    take the fused loop."""
    import collections
    from xfemm_tpu.ops import newton, solver

    monkeypatch.setattr(solver, "device_f64_ok", lambda: False)
    monkeypatch.setattr(solver, "band_platform_ok", lambda: True)
    monkeypatch.setattr(solver, "ROW_TILE_MIN", 64)
    monkeypatch.setattr(solver, "_BAND_CACHE", collections.OrderedDict())
    monkeypatch.setattr(solver, "_PATTERN_CACHE",
                        collections.OrderedDict())
    calls = []
    real_run = newton.run
    monkeypatch.setattr(
        newton, "run",
        lambda *a, **k: (calls.append(k.get("axi", False)),
                        real_run(*a, **k))[1])

    p = femfile.load(str(fixtures / "AxiSolenoid.fem"))
    mesh = read_mesh_files(str(fixtures / "AxiSolenoid"))
    sol = axisymmetric.solve(p, mesh)
    assert sol.residual <= p.Precision
    assert calls and all(calls), "fused axi device Newton never engaged"

    g = ansfile.read_ans(str(fixtures / "AxiSolenoid.ans.golden"))
    d, idx = cKDTree(mesh.nodes).query(g.mesh.nodes)
    Ag = np.real(g.values)
    scale = np.abs(Ag).max()
    assert np.abs(sol.A[idx] - Ag).max() / scale < 1e-6


def test_axi_scatter_mode_matches_reference(fixtures, monkeypatch):
    """The 1M-class fused-loop variant (newton.run_scatter: one Newton
    step per dispatch, changed entries scattered into the donated band)
    must reproduce the same golden solution. Forced on by zeroing the
    band-size threshold."""
    import collections
    from xfemm_tpu.ops import newton, solver

    monkeypatch.setattr(solver, "device_f64_ok", lambda: False)
    monkeypatch.setattr(solver, "band_platform_ok", lambda: True)
    monkeypatch.setattr(solver, "ROW_TILE_MIN", 64)
    monkeypatch.setattr(solver, "_BAND_CACHE", collections.OrderedDict())
    monkeypatch.setattr(solver, "_PATTERN_CACHE",
                        collections.OrderedDict())
    monkeypatch.setenv("XFEMM_TPU_DN_SCATTER_BYTES", "0")
    calls = []
    real_run = newton.run_scatter
    monkeypatch.setattr(
        newton, "run_scatter",
        lambda *a, **k: (calls.append(True), real_run(*a, **k))[1])

    p = femfile.load(str(fixtures / "AxiSolenoid.fem"))
    mesh = read_mesh_files(str(fixtures / "AxiSolenoid"))
    sol = axisymmetric.solve(p, mesh)
    assert sol.residual <= p.Precision
    assert calls, "scatter-mode device Newton never engaged"

    g = ansfile.read_ans(str(fixtures / "AxiSolenoid.ans.golden"))
    d, idx = cKDTree(mesh.nodes).query(g.mesh.nodes)
    Ag = np.real(g.values)
    scale = np.abs(Ag).max()
    assert np.abs(sol.A[idx] - Ag).max() / scale < 1e-6
