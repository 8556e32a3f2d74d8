"""Mesher tests: native kernel behavior and the full fmesher-equivalent
pipeline on reference fixtures.

Golden values come from running the reference fmesher on the same inputs
(see tests/fixtures provenance notes): notably the TorqueBenchmark mesh
must reproduce the air-gap-element ring structure (96 quad elements,
periodic, weights +1) and the theta <-> 180-theta periodic pairing between
the two unit circles.
"""

import math

import numpy as np
import pytest

from xfemm_tpu.geometry import femfile
from xfemm_tpu.mesh import core, mesher
from xfemm_tpu.mesh.meshdata import read_mesh_files, write_mesh_files


def _mesh_quality(P, T):
    a, b, c = P[T[:, 0]], P[T[:, 1]], P[T[:, 2]]
    d1 = b - a
    d2 = c - a
    areas = 0.5 * (d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0])

    def ang(p, q, r):
        u = q - p
        v = r - p
        return np.degrees(np.arccos(np.clip(
            (u * v).sum(1) / np.sqrt((u * u).sum(1) * (v * v).sum(1)),
            -1, 1)))

    mn = np.minimum(np.minimum(ang(a, b, c), ang(b, c, a)), ang(c, a, b))
    return areas, mn


def test_square_refinement():
    pts = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)
    segs = np.array([[0, 1], [1, 2], [2, 3], [3, 0]], np.int32)
    tr = core.triangulate(pts, segs,
                          regions=np.array([[0.5, 0.5, 1, 0.001]]),
                          min_angle=33.0)
    areas, mn = _mesh_quality(tr.points, tr.triangles)
    assert np.all(areas > 0)           # CCW orientation
    assert areas.max() <= 0.001 + 1e-12
    assert abs(areas.sum() - 1.0) < 1e-12
    assert mn.min() >= 33.0 - 1e-06


def test_hole_and_two_regions():
    # outer square with inner square hole boundary, two materials
    pts = np.array([[0, 0], [4, 0], [4, 4], [0, 4],
                    [1, 1], [3, 1], [3, 3], [1, 3]], float)
    segs = np.array([[0, 1], [1, 2], [2, 3], [3, 0],
                     [4, 5], [5, 6], [6, 7], [7, 4]], np.int32)
    regions = np.array([[0.1, 0.1, 1, 0.05], [2.0, 2.0, 2, 0.05]])
    tr = core.triangulate(pts, segs, regions=regions, min_angle=30.0)
    areas, _ = _mesh_quality(tr.points, tr.triangles)
    a1 = areas[tr.tri_attrs == 1].sum()
    a2 = areas[tr.tri_attrs == 2].sum()
    assert abs(a1 - 12.0) < 1e-09      # 16 - 4
    assert abs(a2 - 4.0) < 1e-09
    # hole variant: no region 2, mark inner as hole
    tr2 = core.triangulate(pts, segs, holes=np.array([[2.0, 2.0]]),
                           regions=np.array([[0.1, 0.1, 1, 0.05]]),
                           min_angle=30.0)
    areas2, _ = _mesh_quality(tr2.points, tr2.triangles)
    assert abs(areas2.sum() - 12.0) < 1e-09


def test_edge_markers_preserved_through_splits():
    pts = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)
    segs = np.array([[0, 1], [1, 2], [2, 3], [3, 0]], np.int32)
    sm = np.array([-2, -3, -4, -5], np.int32)
    tr = core.triangulate(pts, segs, segment_markers=sm,
                          regions=np.array([[0.5, 0.5, 1, 0.01]]),
                          min_angle=30.0)
    # every boundary edge carries its input segment's marker
    for marker in (-2, -3, -4, -5):
        sel = tr.edge_markers == marker
        assert sel.sum() >= 2
    # marked edges lie on the correct side
    for (a, b), mk in zip(tr.edges, tr.edge_markers):
        if mk == -2:  # bottom y=0
            assert tr.points[a][1] == 0 and tr.points[b][1] == 0


def test_torque_benchmark_mesh(fixtures):
    p = femfile.load(str(fixtures / "TorqueBenchmark.fem"))
    mesh = mesher.mesh_problem(p)

    # golden structure from the reference fmesher run on this file:
    # 360 periodic point pairs, one periodic AGE with 96 ring elements
    assert len(mesh.pbc_pairs) == 360
    assert len(mesh.airgaps) == 1
    age = mesh.airgaps[0]
    assert age.BdryFormat == 0
    assert age.totalArcElements == 96
    assert age.totalArcLength == pytest.approx(360.0)
    assert age.ri == pytest.approx(0.725)
    assert age.ro == pytest.approx(0.775)
    assert np.all(age.quad_weights == 1.0)
    assert age.quad_nodes.shape == (97, 4)
    # ring nodes sit on their circles
    P = mesh.nodes
    inner = P[age.quad_nodes[:, 0]]
    outer = P[age.quad_nodes[:, 2]]
    assert np.allclose(np.hypot(inner[:, 0], inner[:, 1]), 0.725, atol=1e-12)
    assert np.allclose(np.hypot(outer[:, 0], outer[:, 1]), 0.775, atol=1e-12)

    # periodic pairing: angle theta on circle O <-> angle 180-theta on the
    # Kelvin circle at (2.25, 0) (verified against the reference's .pbc)
    for a, b, t in mesh.pbc_pairs:
        assert t == 0
        ang_a = math.degrees(math.atan2(P[a][1], P[a][0]))
        ang_b = math.degrees(math.atan2(P[b][1], P[b][0] - 2.25))
        s = ang_a + ang_b
        assert min(abs(s - 180), abs(s + 180)) < 1e-06

    # mesh quality: positive CCW areas, area constraint met
    areas, mn = _mesh_quality(P, mesh.elements)
    assert np.all(areas > 0)
    assert areas.max() <= math.pi * 0.0530008 ** 2 / 4.0 + 1e-12
    assert (mn < 20).mean() < 0.01


def test_meshfile_roundtrip(tmp_path, fixtures):
    p = femfile.load(str(fixtures / "TorqueBenchmark.fem"))
    mesh = mesher.mesh_problem(p)
    base = str(tmp_path / "tb")
    write_mesh_files(mesh, base)
    back = read_mesh_files(base)
    assert np.array_equal(back.elements, mesh.elements)
    assert np.array_equal(back.pbc_pairs, mesh.pbc_pairs)
    assert np.allclose(back.nodes, mesh.nodes)
    assert back.airgaps[0].totalArcElements == 96
    assert np.array_equal(back.airgaps[0].quad_nodes, mesh.airgaps[0].quad_nodes)


def test_read_reference_premeshed(fixtures):
    mesh = read_mesh_files(str(fixtures / "Temp"))
    assert mesh.num_nodes == 15306
    assert mesh.num_elements == 30081
    assert len(mesh.pbc_pairs) == 176


def test_refinement_density_short_segment():
    """Steiner-point economy regression guard: one short interior
    segment in a big square. The vendored Triangle emits 57 points for
    this PSLG; tpumesh emits ~77. The stale-queue/recycled-slot bug
    (entries acting on new triangles occupying recycled slots, processed
    out of shortest-edge order) put this at 116 and motor meshes at
    1.3x Triangle density -- a wide margin still traps that failure
    class without pinning the chaotic exact count."""
    pts = np.array([(0, 0), (10, 0), (10, 10), (0, 10),
                    (4.95, 5.0), (5.05, 5.0)], float)
    segs = np.array([(0, 1), (1, 2), (2, 3), (3, 0), (4, 5)], np.int32)
    t = core.triangulate(pts, segs, min_angle=33.0)
    assert len(t.points) <= 95, len(t.points)


def test_refinement_density_cocircular_polygon():
    """Discretized-arc economy: a regular 64-gon (all points
    co-circular, the hardest self-organization case). Triangle: 187
    points; tpumesh: ~207; the recycled-slot bug gave 239+."""
    k = 64
    th = np.linspace(0, 2 * np.pi, k, endpoint=False)
    pts = np.stack([np.cos(th), np.sin(th)], axis=1)
    segs = np.stack([np.arange(k), (np.arange(k) + 1) % k],
                    axis=1).astype(np.int32)
    t = core.triangulate(pts, segs, min_angle=33.0)
    assert len(t.points) <= 225, len(t.points)
