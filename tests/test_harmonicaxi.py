"""Harmonic axisymmetric magnetics vs the reference solver.

Golden: tests/fixtures/ACaxi.ans.golden from the unmodified reference
fsolver on the checked-in premeshed ACaxi fixture (50 Hz: aluminum rod on
the axis carrying eddy currents + a current-driven solid coil annulus ->
circuit Case 2). Exercises the complex axisymmetric assembly of
harmonicaxi.cpp.
"""

import numpy as np
from scipy.spatial import cKDTree

from xfemm_tpu.geometry import femfile
from xfemm_tpu.io import ansfile
from xfemm_tpu.mesh.meshdata import read_mesh_files
from xfemm_tpu.models import harmonicaxi


def test_ac_axi_matches_reference(fixtures):
    p = femfile.load(str(fixtures / "ACaxi.fem"))
    mesh = read_mesh_files(str(fixtures / "ACaxi"))
    sol = harmonicaxi.solve(p, mesh)
    assert sol.residual <= p.Precision

    g = ansfile.read_ans(str(fixtures / "ACaxi.ans.golden"))
    d, idx = cKDTree(mesh.nodes).query(g.mesh.nodes)
    assert d.max() < 1e-12
    scale = np.abs(g.values).max()
    assert np.abs(sol.A[idx] - g.values).max() / scale < 1e-6
    assert np.allclose(sol.label_case, g.label_case, rtol=1e-6, atol=1e-12)
