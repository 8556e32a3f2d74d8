"""Harmonic axisymmetric magnetics vs the reference solver.

Goldens from the unmodified reference fsolver on checked-in premeshed
fixtures (exercising the complex axisymmetric assembly of
harmonicaxi.cpp:34):

* ACaxi (50 Hz, parallel circuit): aluminum rod on the axis carrying
  eddy currents + a current-driven solid coil annulus.
* ACaxi400 (400 Hz, SERIES circuit -> harmonic circuit Case 2, the
  unknown-voltage-gradient DOF path of harmonic2d.cpp:535-547 on the
  axisymmetric formulation): same geometry, CircuitType 1.

The ACaxi400 block-integral / circuit-property constants are the
reference's OWN postprocessor output: femmcli mi_loadsolution +
mo_blockintegral/mo_getcircuitproperties evaluated on this exact golden
.ans (fpproc.cpp:3642 block integrals; GetVoltageDrop/GetFluxLinkage
fpproc.h:245-251), so the comparison is same-mesh, same-solution.
"""

import numpy as np
import pytest
from scipy.spatial import cKDTree

from xfemm_tpu.geometry import femfile
from xfemm_tpu.io import ansfile
from xfemm_tpu.mesh.meshdata import read_mesh_files
from xfemm_tpu.models import harmonicaxi
from xfemm_tpu.post.fpproc import MagPostProcessor


def _solve_vs_golden(fixtures, stem):
    p = femfile.load(str(fixtures / f"{stem}.fem"))
    mesh = read_mesh_files(str(fixtures / stem))
    sol = harmonicaxi.solve(p, mesh)
    assert sol.residual <= p.Precision

    g = ansfile.read_ans(str(fixtures / f"{stem}.ans.golden"))
    d, idx = cKDTree(mesh.nodes).query(g.mesh.nodes)
    assert d.max() < 1e-12
    scale = np.abs(g.values).max()
    assert np.abs(sol.A[idx] - g.values).max() / scale < 1e-6
    assert np.allclose(sol.label_case, g.label_case, rtol=1e-6, atol=1e-12)
    return p, mesh, sol


def test_ac_axi_matches_reference(fixtures):
    _solve_vs_golden(fixtures, "ACaxi")


def test_ac_axi_series_circuit_matches_reference(fixtures):
    """400 Hz + series circuit: the Case-2 bordered system (extra
    voltage-gradient DOF coupling every coil element)."""
    p, mesh, sol = _solve_vs_golden(fixtures, "ACaxi400")
    # series solid circuit resolves to Case 2 with a nonzero dV
    assert sol.label_case[2][0] == pytest.approx(0.0)
    assert abs(sol.label_case[2][1]) > 1e-5


# labels: 0 = outer air, 1 = aluminum rod (0.5,0), 2 = coil (2.5,0)
REF_ACAXI400 = {
    # femmcli on ACaxi400.ans.golden (same mesh + solution):
    "coil_loss": 0.04983725541655186,            # blockintegral(4)
    "coil_AJ": 0.0002097635444444539 - 1.413972146981966e-05j,
    "coil_energy": 7.636042497783758e-06,        # blockintegral(2)
    "rod_loss": 0.01608316784427291,             # eddy loss in the rod
    "rod_J": -82.09176867385763 - 66.38030996460395j,  # blockintegral(7)
    "circ_volts": -0.000240362959638525 + 0.005195904737962252j,
    "circ_flux": 1.963352852159631e-06 + 4.47608640949693e-07j,
}


def test_ac_axi_series_loss_integrals(fixtures):
    """Eddy-loss/current block integrals + circuit quantities on the
    axisymmetric harmonic path, vs the reference postprocessor's values
    for the identical solution."""
    p, mesh, sol = _solve_vs_golden(fixtures, "ACaxi400")
    post = MagPostProcessor(p, mesh, sol.A, sol.label_case)

    def close(got, exp, tol=1e-5):
        assert got == pytest.approx(exp, rel=tol, abs=1e-12 + tol * abs(exp))

    close(complex(post.block_integral(4, {2})).real, REF_ACAXI400["coil_loss"])
    close(complex(post.block_integral(0, {2})), REF_ACAXI400["coil_AJ"])
    close(complex(post.block_integral(2, {2})).real,
          REF_ACAXI400["coil_energy"])
    close(complex(post.block_integral(4, {1})).real, REF_ACAXI400["rod_loss"])
    close(complex(post.block_integral(7, {1})), REF_ACAXI400["rod_J"])

    amps, volts, flux = post.circuit_properties("I1")
    close(complex(amps), 100 + 30j)
    close(complex(volts), REF_ACAXI400["circ_volts"])
    close(complex(flux), REF_ACAXI400["circ_flux"])
