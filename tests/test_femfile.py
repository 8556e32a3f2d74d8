"""Tests for .fem problem file parsing and round-tripping.

Fixture provenance: tests/fixtures/TorqueBenchmark.fem and Temp.* are data
files taken verbatim from the reference test suite
(cfemm/femmcli/test/femmcli_TorqueBenchmark.fem, cfemm/fsolver/test/Temp.*)
so the numerical contracts match.
"""

import math

from xfemm_tpu.constants import FileType, LengthUnit, ProblemType, PI
from xfemm_tpu.geometry import femfile
from xfemm_tpu.geometry.problem import BdryFormat


def test_parse_torque_benchmark(fixtures):
    p = femfile.load(str(fixtures / "TorqueBenchmark.fem"))
    assert p.Frequency == 0
    assert p.Precision == 1e-10
    assert p.Depth == 2
    assert p.LengthUnits == LengthUnit.CENTIMETERS
    assert p.ProblemType == ProblemType.PLANAR

    assert len(p.nodeproplist) == 1
    assert [bp.name for bp in p.lineproplist] == ["pbc1", "pbc2", "AGE"]
    assert p.lineproplist[2].BdryFormat == BdryFormat.PERIODIC_AIRGAP
    assert [m.name for m in p.blockproplist] == ["Air", "Ext", "magnet"]
    assert p.blockproplist[2].H_c == 1000000.0

    assert len(p.nodelist) == 13
    assert len(p.linelist) == 4
    assert len(p.arclist) == 8
    # AGE arcs carry boundary marker 2 (0-based) and MaxSideLength 5
    age_arcs = [a for a in p.arclist if a.BoundaryMarker == 2]
    assert len(age_arcs) == 4
    assert all(a.MaxSideLength == 5 and a.mySideLength == 3.8 for a in age_arcs)

    holes = [l for l in p.labellist if l.is_hole()]
    labels = [l for l in p.labellist if not l.is_hole()]
    assert len(holes) == 1
    assert len(labels) == 4
    # label MaxArea comes through the pi*d^2/4 transform
    assert math.isclose(labels[0].MaxArea,
                        PI * 0.053000800000000001 ** 2 / 4.0)
    # "Ext" label (index 0 in file order) has MagDir 180
    assert labels[0].MagDir == 180
    assert labels[0].BlockType == 1


def test_parse_temp_fixture(fixtures):
    p = femfile.load(str(fixtures / "Temp.fem"))
    assert p.LengthUnits == LengthUnit.METERS
    assert len(p.circproplist) == 3
    assert all(c.CircType == 1 for c in p.circproplist)
    nonlinear = [m for m in p.blockproplist if m.BHpoints > 0]
    assert len(nonlinear) == 1
    assert nonlinear[0].BHpoints == 9


def test_roundtrip(fixtures):
    p = femfile.load(str(fixtures / "TorqueBenchmark.fem"))
    text = femfile.dumps(p)
    q = femfile.loads(text, FileType.MAGNETICS)
    assert len(q.nodelist) == len(p.nodelist)
    assert len(q.arclist) == len(p.arclist)
    for a, b in zip(p.nodelist, q.nodelist):
        assert a.x == b.x and a.y == b.y and a.BoundaryMarker == b.BoundaryMarker
    for a, b in zip(p.labellist, q.labellist):
        assert math.isclose(a.MaxArea, b.MaxArea, rel_tol=1e-14, abs_tol=1e-300)
        assert a.BlockType == b.BlockType
        assert a.MagDir == b.MagDir
    for a, b in zip(p.lineproplist, q.lineproplist):
        assert a.name == b.name and a.BdryFormat == b.BdryFormat
    for a, b in zip(p.blockproplist, q.blockproplist):
        assert a.name == b.name and a.H_c == b.H_c and a.mu_x == b.mu_x


def test_parse_heat_and_electro(fixtures):
    ph = femfile.load(str(fixtures / "Temp0.feh"))
    assert ph.filetype == FileType.HEATFLOW
    assert len(ph.blockproplist) >= 1
    pe = femfile.load(str(fixtures / "test.fee"))
    assert pe.filetype == FileType.ELECTROSTATICS
    assert len(pe.blockproplist) >= 1
