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


def test_ac_wound_region_integrals(fixtures):
    """Wound (LamType>2) AC regions: stored energy/coenergy use the
    label's effective complex permeability and apparent conductivity
    (fpproc.cpp:3770-3778, GetFillFactor fpproc.cpp:4746), and the
    resistive losses use sig = 1e6/Re(1/o) (fpproc.cpp:3842). Goldens
    were produced by the unmodified reference fsolver + femmcli
    mo_blockintegral on the checked-in premeshed ACwound fixture
    (100-turn magnet-wire coil in a series circuit at 50 Hz)."""
    from pytest import approx

    from xfemm_tpu.post.fpproc import MagPostProcessor

    p = femfile.load(str(fixtures / "ACwound.fem"))
    mesh = read_mesh_files(str(fixtures / "ACwound"))
    sol = harmonic.solve(p, mesh)
    assert sol.residual <= p.Precision

    g = ansfile.read_ans(str(fixtures / "ACwound.ans.golden"))
    tree = cKDTree(mesh.nodes)
    d, idx = tree.query(g.mesh.nodes)
    assert d.max() < 1e-12
    scale = np.abs(g.values).max()
    assert np.abs(sol.A[idx] - g.values).max() / scale < 1e-6

    post = MagPostProcessor(p, mesh, sol.A, sol.label_case)
    coil = {k for k, l in enumerate(post.labels)
            if abs(l.x) < 1e-9 and abs(l.y) < 1e-9}
    assert len(coil) == 1
    # reference femmcli mo_blockintegral values on ACwound.ans
    assert post.block_integral(2, coil).real == \
        approx(1.273529694319e-04, rel=2e-4)       # stored energy
    assert post.block_integral(17, coil).real == \
        approx(1.273529694319e-04, rel=2e-4)       # coenergy (== AC)
    assert post.block_integral(4, coil).real == \
        approx(1.097620254739e+00, rel=2e-4)       # resistive losses
    aj = post.block_integral(0, coil)
    assert aj == approx(4.848451777805e-03 - 5.719153002085e-04j,
                        rel=2e-4)                  # A.J
    assert post.block_integral(7, coil).real == approx(1e3, rel=1e-6)
