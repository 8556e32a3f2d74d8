"""Heat/electrostatics postprocessors vs the reference check values.

Fixtures HPTemp0.anh / EPtest.res are the reference repository's own
hpproc/epproc test solutions; expected numbers are from the matching
*.out.check files (cfemm/hpproc/test/Temp0.out.check block 0 section,
cfemm/epproc/test/test.out.check).
"""

import numpy as np
import pytest

from xfemm_tpu.io import ansfile
from xfemm_tpu.post.scalarproc import ElecPostProcessor, HeatPostProcessor


@pytest.fixture(scope="module")
def heat(fixtures):
    g = ansfile.read_ans(str(fixtures / "HPTemp0.anh"))
    p = HeatPostProcessor(g.problem, g.mesh, np.real(g.values))
    p.smoothing = False      # .out.check "Field Smoothing OFF" section
    return p


def test_heat_block_integrals(heat):
    assert heat.block_integral(0, {0}) == pytest.approx(304.268541, abs=5e-6)
    assert heat.block_integral(1, {0}) == pytest.approx(0.000337, abs=1e-6)
    assert heat.block_integral(2, {0}) == pytest.approx(0.006750, abs=5e-7)
    F = heat.block_integral(3, {0})
    assert F.real == pytest.approx(528.872549, abs=5e-6)
    assert F.imag == pytest.approx(323.304446, abs=5e-6)
    G = heat.block_integral(4, {0})
    assert G.real == pytest.approx(105.774510, abs=5e-6)
    assert G.imag == pytest.approx(161.652223, abs=5e-6)


def test_heat_point_values(heat):
    pv = heat.get_point_values(0.005, 0.005)
    assert pv["T"] == pytest.approx(306.833130, abs=5e-6)
    assert pv["Fx"] == pytest.approx(342.652400, abs=5e-6)
    assert pv["Fy"] == pytest.approx(-37.388763, abs=5e-6)
    assert pv["Kx"] == pytest.approx(5.0)
    assert pv["Ky"] == pytest.approx(2.0)
    assert pv["Gx"] == pytest.approx(68.530480, abs=5e-6)
    pv = heat.get_point_values(0.010, 0.010)
    assert pv["T"] == pytest.approx(306.591810, abs=5e-6)
    assert pv["Kx"] == pytest.approx(0.026575, abs=5e-6)
    assert pv["Gx"] == pytest.approx(2545.839944, rel=5e-4)


def test_electro_integrals_and_points(fixtures):
    g = ansfile.read_ans(str(fixtures / "EPtest.res"))
    post = ElecPostProcessor(g.problem, g.mesh, np.real(g.values))
    post.smoothing = False   # .out.check "Field Smoothing OFF" section
    assert post.block_integral(1, {0}) == pytest.approx(1.513797, abs=5e-6)
    assert post.block_integral(2, {0}) == pytest.approx(4.156622, abs=5e-6)
    E = post.block_integral(4, {0})
    vol = post.block_integral(2, {0})
    assert E.real / vol == pytest.approx(-6.609329, abs=5e-6)
    assert E.imag / vol == pytest.approx(1.359289, abs=5e-6)
    pv = post.get_point_values(0.25, 0.0)
    assert pv["V"] == pytest.approx(48.386490, abs=5e-6)
    assert pv["Ex"] == pytest.approx(30.117813, abs=5e-6)
    assert pv["Ey"] == pytest.approx(1.169330, abs=5e-6)
    pv = post.get_point_values(0.10, 0.80)
    assert pv["V"] == pytest.approx(38.170717, abs=5e-6)
    assert pv["Ex"] == pytest.approx(-2.867381, abs=5e-6)


def test_smoothed_point_values(fixtures):
    """Smoothed (default) point values vs the reference's "Field
    Smoothing ON" sections. Our nodal patch fit weights ring nodes once
    where the reference's ccw+cw scans count most twice, so agreement
    is ~1e-4 relative rather than exact."""
    g = ansfile.read_ans(str(fixtures / "HPTemp0.anh"))
    heat = HeatPostProcessor(g.problem, g.mesh, np.real(g.values))
    pv = heat.get_point_values(0.005, 0.005)
    assert pv["T"] == pytest.approx(306.833130, abs=5e-6)
    assert pv["Fx"] == pytest.approx(327.588978, rel=2e-3)
    assert pv["Fy"] == pytest.approx(-31.309126, rel=2e-2)

    ge = ansfile.read_ans(str(fixtures / "EPtest.res"))
    post = ElecPostProcessor(ge.problem, ge.mesh, np.real(ge.values))
    pv = post.get_point_values(0.25, 0.0)
    assert pv["V"] == pytest.approx(48.386490, abs=5e-6)
    assert pv["Ex"] == pytest.approx(32.241565, rel=2e-2)
    assert pv["Ey"] == pytest.approx(2.438517, rel=2e-1)
