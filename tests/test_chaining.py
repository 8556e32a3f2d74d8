"""Solution chaining: incremental/frozen permeability about a DC offset.

The reference supports [PrevSoln]/[PrevType] for AC-about-DC analyses
(fsolver.cpp:202-239, harmonic2d.cpp:566-590). Its shipped binary
actually segfaults on this path (an out-of-bounds std::copy in the
GetSlopes backup, fsolver.cpp:253-257), so golden comparison is
impossible; instead these tests check the defining identity: for a
material whose B-H curve is exactly linear (H = B / (mu0 * mu_r)), the
incremental and frozen permeabilities equal mu_r, so the chained AC
solve must match a plain linear AC solve with the same mu_r.
"""

import numpy as np
import pytest

from xfemm_tpu.constants import MU0
from xfemm_tpu.materials.magnetic import MagneticMaterial
from xfemm_tpu.mesh import mesher
from xfemm_tpu.models import benchprob, harmonic, magnetostatics


MUR = 500.0


def _problems(freq):
    # nonlinear-but-actually-linear steel
    p = benchprob.build(2500)
    p.Frequency = freq
    steel = p.blockproplist[1]
    steel.Bdata = []
    steel.Hdata = []
    steel.slope = []
    for b in (0.0, 0.5, 1.0, 1.5, 2.0, 2.5):
        steel.Bdata.append(b)
        steel.Hdata.append(complex(b / (MU0 * MUR)))
    # genuinely linear twin
    p_lin = benchprob.build(2500)
    p_lin.Frequency = freq
    p_lin.blockproplist[1] = MagneticMaterial(name="Steel", mu_x=MUR,
                                              mu_y=MUR)
    return p, p_lin


def test_ac_incremental_linear_limit(tmp_path):
    pdc, _ = _problems(0.0)
    mesh = mesher.mesh_problem(pdc)
    sol_dc = magnetostatics.solve(pdc, mesh)

    # write the base solution, chain an AC problem from it
    from xfemm_tpu.geometry import femfile
    from xfemm_tpu.io import ansfile
    base = tmp_path / "base.ans"
    sf = ansfile.SolutionFile(
        problem=pdc, mesh=ansfile.solution_mesh_from_solver(mesh, 1.0),
        values=sol_dc.A, label_case=sol_dc.label_case)
    ansfile.write_ans(sf, str(base))

    pac, plin = _problems(50.0)
    pac.PrevSoln = str(base)
    pac.PrevType = 1
    sol_inc = harmonic.solve(pac, mesh)
    sol_lin = harmonic.solve(plin, mesh)
    scale = np.abs(sol_lin.A).max()
    assert np.abs(sol_inc.A - sol_lin.A).max() / scale < 1e-6

    # frozen permeability gives the same answer in the linear limit
    pfr, _ = _problems(50.0)
    pfr.PrevSoln = str(base)
    pfr.PrevType = 2
    sol_frozen = harmonic.solve(pfr, mesh)
    assert np.abs(sol_frozen.A - sol_lin.A).max() / scale < 1e-6


def test_transient_heat_stepping(tmp_path):
    """Lumped cooling of a conductive block toward a fixed-T boundary:
    each dT step must move the average temperature monotonically toward
    the wall temperature with a physical time constant."""
    from xfemm_tpu.constants import FileType, LengthUnit, ProblemType
    from xfemm_tpu.geometry.problem import (BlockLabel, BoundaryProp,
                                            HeatMaterial, Problem, Segment)
    from xfemm_tpu.mesh import mesher as _mesher
    from xfemm_tpu.models import heatflow

    p = Problem(filetype=FileType.HEATFLOW)
    p.LengthUnits = LengthUnit.METERS
    p.Precision = 1e-8
    p.Depth = 1.0
    p.dT = 10.0
    p.blockproplist = [HeatMaterial(name="m", Kx=10.0, Ky=10.0, Kt=1.0)]
    p.lineproplist = [BoundaryProp(name="wall", BdryFormat=0, Tset=300.0)]
    n = [p.add_node(0, 0), p.add_node(1, 0), p.add_node(1, 1),
         p.add_node(0, 1)]
    for a, b in zip(n, n[1:] + n[:1]):
        p.linelist.append(Segment(n0=a, n1=b, BoundaryMarker=0))
    p.labellist = [BlockLabel(x=0.5, y=0.5, BlockType=0, MaxArea=0.01)]
    mesh = _mesher.mesh_problem(p)

    T = np.full(mesh.num_nodes, 400.0)
    avgs = []
    for _ in range(3):
        sol = heatflow.solve(p, mesh, Tprev=T)
        T = sol.T
        avgs.append(T.mean())
    assert avgs[0] > avgs[1] > avgs[2]
    # the trajectory approaches the wall temperature from above; by
    # step 3 the remaining excess (~1e-7) is comparable to the linear
    # solver's solution-error band at Precision 1e-8, so allow
    # tolerance-level noise around the equilibrium rather than assert
    # a strict floor the discretization cannot guarantee
    assert avgs[2] > 300.0 - 1e-5
