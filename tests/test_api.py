"""Session API (the femmcli mi_*/mo_* functional surface, pythonic)."""

import numpy as np
import pytest

import xfemm_tpu.api as femm
from xfemm_tpu.constants import LengthUnit
from xfemm_tpu.materials.magnetic import MagneticMaterial


def build_coil_doc():
    doc = femm.new_document("magnetics")
    doc.problem.LengthUnits = LengthUnit.CENTIMETERS
    doc.problem.Precision = 1e-8
    doc.problem.Depth = 10.0
    doc.add_boundary("A0", BdryFormat=0)
    doc.add_material("Air")
    doc.add_material(MagneticMaterial(name="Cu", Cduct=58.0))
    doc.add_circuit("I1", amps=100.0, circuit_type=1)
    n = [doc.add_node(-8, -8), doc.add_node(8, -8), doc.add_node(8, 8),
         doc.add_node(-8, 8)]
    for a, b in zip(n, n[1:] + n[:1]):
        doc.add_segment(a, b, boundary="A0")
    c = [doc.add_node(-1, -2), doc.add_node(1, -2), doc.add_node(1, 2),
         doc.add_node(-1, 2)]
    for a, b in zip(c, c[1:] + c[:1]):
        doc.add_segment(a, b)
    doc.add_block_label(5, 5, material="Air")
    doc.add_block_label(0, 0, material="Cu", circuit="I1", turns=20)
    return doc


def test_analyze_and_circuit_properties():
    doc = build_coil_doc()
    sol = doc.analyze()
    amps, volts, flux = sol.circuit_properties("I1")
    assert amps == 100.0
    # stranded DC voltage drop = I * N^2 * rho * depth / area:
    # 100 * 400 * (1/58e6) * 0.1 / 8e-4 = 0.0862...
    assert volts.real == pytest.approx(100 * 400 * 0.1 / (58e6 * 8e-4),
                                       rel=1e-6)
    assert flux.real > 0
    # block selection by point
    assert sol.select_blocks_at((0.0, 0.0)) == {1}


def test_geometry_editing_intersections():
    doc = femm.new_document("magnetics")
    a = doc.add_node(0, 0)
    b = doc.add_node(2, 0)
    doc.add_segment(a, b)
    # crossing segment splits both
    c = doc.add_node(1, -1)
    d = doc.add_node(1, 1)
    doc.add_segment(c, d)
    assert len(doc.problem.nodelist) == 5       # intersection node added
    assert len(doc.problem.linelist) == 4       # both segments split


def test_copy_rotate_and_mirror():
    doc = femm.new_document("magnetics")
    a = doc.add_node(1, 0)
    b = doc.add_node(2, 0)
    doc.add_segment(a, b)
    doc.copy_rotate(0, 0, 90, copies=3)
    assert len(doc.problem.linelist) == 4
    pts = sorted((round(n.x, 9), round(n.y, 9))
                 for n in doc.problem.nodelist)
    assert (0.0, 1.0) in pts and (-2.0, 0.0) in pts

    doc2 = femm.new_document("magnetics")
    a = doc2.add_node(1, 1)
    b = doc2.add_node(2, 1)
    doc2.add_segment(a, b)
    doc2.mirror(0, 0, 1, 0)                      # about the x-axis
    assert any(abs(n.y + 1) < 1e-12 for n in doc2.problem.nodelist)


def test_library_import(tmp_path):
    libtext = """<BeginBlock>
<BlockName> = "TestSteel"
<Mu_x> = 2000
<Mu_y> = 2000
<Sigma> = 10
<LamType> = 0
<LamFill> = 1
<BHPoints> = 0
<EndBlock>
"""
    p = tmp_path / "matlib.dat"
    p.write_text(libtext)
    doc = femm.new_document("magnetics")
    m = doc.add_material_from_library(str(p), "TestSteel")
    assert m.mu_x == 2000 and m.Cduct == 10


def test_exporters(fixtures, tmp_path):
    """TikZ / FreeCAD / Elmer exporters (the mfemm visualisation and
    +mfemm2elmer interop surface)."""
    from xfemm_tpu.geometry import femfile
    from xfemm_tpu.mesh import mesher
    from xfemm_tpu.utils import export

    prob = femfile.load(str(fixtures / "TorqueBenchmark.fem"))
    tikz = export.to_tikz(prob, width_mm=100)
    assert tikz.startswith("\\begin{tikzpicture}")
    assert "arc (" in tikz and tikz.rstrip().endswith("\\end{tikzpicture}")

    fc = export.to_freecad(prob)
    assert "Draft.makeCircle" in fc and "FreeCAD.newDocument" in fc

    mesh = mesher.mesh_problem(prob)
    export.to_elmer(mesh, prob, str(tmp_path / "elmer"))
    hdr = (tmp_path / "elmer" / "mesh.header").read_text().split()
    assert int(hdr[0]) == mesh.num_nodes
    assert int(hdr[1]) == mesh.num_elements
    nodes = (tmp_path / "elmer" / "mesh.nodes").read_text().splitlines()
    assert len(nodes) == mesh.num_nodes
    els = (tmp_path / "elmer" / "mesh.elements").read_text().splitlines()
    assert len(els) == mesh.num_elements and " 303 " in els[0]
