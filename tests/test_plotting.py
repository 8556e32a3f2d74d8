"""Visualization layer smoke tests (mfemm/visualisation parity).

Render each plot type on the Agg backend and assert real artists were
produced -- guards the deferred-import structure and the API surface
(plotfemmproblem / plotmesh_mfemm / density / flux-line / B-field
views) without pixel comparisons.
"""

import matplotlib
matplotlib.use("Agg")

import numpy as np

from xfemm_tpu.geometry import femfile
from xfemm_tpu.mesh.meshdata import read_mesh_files
from xfemm_tpu.utils import plotting


def test_plot_problem_and_mesh(fixtures):
    p = femfile.load(str(fixtures / "AxiSolenoid.fem"))
    ax = plotting.plot_problem(p)
    assert ax.lines, "no geometry drawn"
    mesh = read_mesh_files(str(fixtures / "AxiSolenoid"))
    ax2 = plotting.plot_mesh(mesh)
    assert ax2.lines or ax2.collections


def test_plot_solution_views(fixtures):
    from xfemm_tpu.models import magnetostatics
    from xfemm_tpu.post.fpproc import MagPostProcessor

    p = femfile.load(str(fixtures / "ACtest.fem"))
    # reuse the premeshed fixture for a quick DC solve: zero frequency
    p.Frequency = 0.0
    mesh = read_mesh_files(str(fixtures / "ACtest"))
    sol = magnetostatics.solve(p, mesh)

    post = MagPostProcessor(p, mesh, np.real(sol.A), sol.label_case)
    ax = plotting.plot_B(post, quiver_step=40)
    assert ax.collections, "no density/quiver artists"
    ax2 = plotting.plot_flux_lines(mesh, np.real(sol.A))
    assert ax2.collections
    ax3 = plotting.plot_density(mesh, np.abs(np.real(sol.A)))
    assert ax3.collections
    ax4 = plotting.plot_solution(p, mesh, sol)
    assert ax4.collections
