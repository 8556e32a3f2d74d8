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
