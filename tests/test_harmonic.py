"""Time-harmonic (AC) magnetics vs the reference solver.

Golden data: tests/fixtures/ACtest.ans.golden was produced by the
unmodified reference fsolver on the checked-in premeshed ACtest fixture
(50 Hz: current-driven solid copper bar -> circuit Case 2 voltage-gradient
DOF, linear conducting steel plate with eddy currents, aluminum bar with a
fixed complex J, A=0 far boundary). Exercises the complex assembly, the
eddy mass term, and the bordered circuit system of harmonic2d.cpp.
"""

import numpy as np
from scipy.spatial import cKDTree

from xfemm_tpu.geometry import femfile
from xfemm_tpu.io import ansfile
from xfemm_tpu.mesh.meshdata import read_mesh_files
from xfemm_tpu.models import harmonic


def test_ac_matches_reference(fixtures):
    p = femfile.load(str(fixtures / "ACtest.fem"))
    mesh = read_mesh_files(str(fixtures / "ACtest"))
    sol = harmonic.solve(p, mesh)
    assert sol.residual <= p.Precision

    g = ansfile.read_ans(str(fixtures / "ACtest.ans.golden"))
    tree = cKDTree(mesh.nodes)
    d, idx = tree.query(g.mesh.nodes)
    assert d.max() < 1e-12
    scale = np.abs(g.values).max()
    assert np.abs(sol.A[idx] - g.values).max() / scale < 1e-6
    # circuit Case-2 voltage gradient matches (complex)
    assert np.allclose(sol.label_case, g.label_case, rtol=1e-6, atol=1e-12)


def test_ac_band_engine_matches_reference(fixtures, monkeypatch):
    """The TPU AC path (f32 (re,im) pairs + shifted-real band AMG +
    fused restarted GMRES, forced on by pretending the device has no
    f64) must reproduce the golden solution through the mixed-precision
    refinement driver."""
    from xfemm_tpu.ops import solver

    monkeypatch.setattr(solver, "device_f64_ok", lambda: False)
    monkeypatch.setattr(solver, "band_platform_ok", lambda: True)
    monkeypatch.setattr(solver, "ROW_TILE_MIN", 64)
    monkeypatch.setattr(solver, "_CBAND_CACHE", type(
        solver._CBAND_CACHE)())

    p = femfile.load(str(fixtures / "ACtest.fem"))
    mesh = read_mesh_files(str(fixtures / "ACtest"))
    sol = harmonic.solve(p, mesh)
    assert sol.residual <= p.Precision
    # the band entry must still be cached (no latch-off to Jacobi)
    assert any(v is not None for v in solver._CBAND_CACHE.values())

    g = ansfile.read_ans(str(fixtures / "ACtest.ans.golden"))
    tree = cKDTree(mesh.nodes)
    d, idx = tree.query(g.mesh.nodes)
    scale = np.abs(g.values).max()
    assert np.abs(sol.A[idx] - g.values).max() / scale < 1e-6
    assert np.allclose(sol.label_case, g.label_case, rtol=1e-6, atol=1e-10)
