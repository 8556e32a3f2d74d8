"""B-H material model tests.

Checks the cubic-Hermite fit invariants the reference relies on
(cfemm/libfemm/CMaterialProp.cpp:127-534): interpolation through the knots,
consistency of (v, dv) with finite differences, monotonicity after the
repair loop, and vectorized-vs-scalar agreement.
"""

import math

import numpy as np
import pytest

from xfemm_tpu.constants import MU0
from xfemm_tpu.geometry import femfile
from xfemm_tpu.materials.magnetic import MagneticMaterial, bh_props_vec


@pytest.fixture()
def steel(fixtures):
    p = femfile.load(str(fixtures / "Temp.fem"))
    mat = next(m for m in p.blockproplist if m.BHpoints > 0)
    mat.get_slopes(0.0)
    return mat


def test_interpolates_knots(steel):
    for b, h in zip(steel.Bdata, steel.Hdata):
        assert math.isclose(steel.get_H(b).real, h.real,
                            rel_tol=1e-12, abs_tol=1e-09)


def test_dhdb_matches_fd(steel):
    bs = np.linspace(0.05, steel.Bdata[-1] * 0.95, 37)
    eps = 1e-07
    for b in bs:
        fd = (steel.get_H(b + eps).real - steel.get_H(b - eps).real) / (2 * eps)
        an = steel.get_dHdB(b).real
        assert math.isclose(fd, an, rel_tol=1e-05, abs_tol=1e-03)


def test_curve_monotone(steel):
    bs = np.linspace(0.0, steel.Bdata[-1] * 1.2, 2000)
    hs = np.array([steel.get_H(b).real for b in bs])
    assert np.all(np.diff(hs) >= -1e-09)


def test_get_bh_props_consistent(steel):
    # v = H/B and dv = d(v)/d(B^2)
    for b in (0.3, 0.9, 1.5, 1.9, 2.5):
        v, dv = steel.get_bh_props(b)
        assert math.isclose(v.real, steel.get_H(b).real / b, rel_tol=1e-12)
        eps = 1e-06
        v1, _ = steel.get_bh_props(b + eps)
        v0, _ = steel.get_bh_props(b - eps)
        fd = (v1.real - v0.real) / ((b + eps) ** 2 - (b - eps) ** 2)
        assert math.isclose(fd, dv.real, rel_tol=1e-04, abs_tol=1e-06)


def test_vectorized_matches_scalar(steel):
    Bd, Hd, sl = steel.knot_arrays()
    bs = np.concatenate([np.linspace(0.0, steel.Bdata[-1] * 1.3, 101), [0.0]])
    v_vec, dv_vec = bh_props_vec(bs, Bd, Hd, sl)
    for b, v, dv in zip(bs, v_vec, dv_vec):
        v_s, dv_s = steel.get_bh_props(b)
        assert math.isclose(v, v_s.real, rel_tol=1e-12, abs_tol=1e-300)
        assert math.isclose(dv, dv_s.real, rel_tol=1e-12, abs_tol=1e-300)


def test_linear_material():
    mat = MagneticMaterial(mu_x=1000.0, mu_y=1000.0)
    v, dv = mat.get_bh_props(1.0)
    assert v == 1000.0 and dv == 0.0


def test_get_b_inverts(steel):
    for b in (0.5, 1.2, 1.8):
        h = steel.get_H(b).real
        assert math.isclose(steel.get_B(h), b, rel_tol=1e-06)


def test_energy_consistent(steel):
    # dE/dB = H
    for b in (0.4, 1.0, 1.7, 2.4):
        eps = 1e-06
        fd = (steel.get_energy(b + eps) - steel.get_energy(b - eps)) / (2 * eps)
        assert math.isclose(fd, steel.get_H(b).real, rel_tol=1e-05, abs_tol=1e-02)
    # coenergy + energy = B*H
    for b in (0.4, 1.0, 1.7):
        assert math.isclose(steel.get_coenergy(b) + steel.get_energy(b),
                            b * steel.get_H(b).real, rel_tol=1e-12)


def test_harmonic_doctoring_runs(steel, fixtures):
    p = femfile.load(str(fixtures / "Temp.fem"))
    mat = next(m for m in p.blockproplist if m.BHpoints > 0)
    mat.Theta_hn = 2.0
    mat.get_slopes(2 * math.pi * 50.0)
    assert mat.MuMax > 0
    # doctored H data becomes complex (hysteresis lag)
    assert any(abs(h.imag) > 0 for h in mat.Hdata[1:])


def test_heat_library_roundtrip(tmp_path):
    """hi_getmaterial pulls a K(T)-curve material from a heatlib-format
    library (MatlibReader semantics)."""
    lib = tmp_path / "myheat.dat"
    lib.write_text("""<BeginFolder>
<FolderName> = "Metals"
<BeginBlock>
<BlockName> = "TestAl"
<Kx> = 236
<Ky> = 236
<Kt> = 0
<qv> = 0
    <TKPoints> = 2
      273\t236
      473\t238
<EndBlock>
<EndFolder>
""")
    import xfemm_tpu.femm_compat as femm
    femm.newdocument(2)
    femm.hi_getmaterial("TestAl", libpath=str(lib))
    m = femm._d().problem.blockproplist[0]
    assert m.name == "TestAl" and m.Kx == 236
    assert list(m.Tdata) == [273, 473]
