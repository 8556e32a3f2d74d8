"""Multi-chip domain decomposition: sharded solve == single-chip solve.

The reference has no parallel backend at all (SURVEY.md 2.11); these are
the new contracts: the shard_map halo-exchange CG over an 8-device mesh
(virtual CPU devices in tests, ICI on hardware) must reproduce the
single-device solution to solver tolerance.
"""

import numpy as np
import pytest


def _system():
    from xfemm_tpu.mesh import mesher
    from xfemm_tpu.models import benchprob, magnetostatics
    from xfemm_tpu.ops import assembly

    p = benchprob.build(2500)
    mesh = mesher.mesh_problem(p)
    pk = magnetostatics.pack(p, mesh)
    geom = assembly.tri_geometry(pk.xy, pk.tris)
    Mx, My, _ = assembly.curl_matrices(geom)
    mu = np.where(pk.nonlinear, 1000.0, pk.mu_x)
    Me = np.asarray(Mx) / mu[:, None, None] + np.asarray(My) / mu[:, None, None]
    idx = pk.ridx[pk.tris]
    sign = pk.rsign[pk.tris]
    blocks = [(idx, sign, -Me)]
    b = np.zeros(pk.nreduced)
    np.add.at(b, idx.reshape(-1),
              -(sign * (-(pk.Jre * np.asarray(geom.area) / 3.0)[:, None]
                        * np.ones((1, 3)))).reshape(-1))
    coords = np.zeros((pk.nreduced, 2))
    coords[pk.ridx] = pk.xy
    return pk, blocks, b, coords


def test_distributed_matches_single():
    import jax
    from jax.sharding import Mesh

    from xfemm_tpu.ops.solver import ElementBlock, solve
    from xfemm_tpu.parallel import halo, partition as part

    pk, blocks, b, coords = _system()
    eb = [ElementBlock(idx=blocks[0][0], sign=blocks[0][1],
                       mat=blocks[0][2])]
    x_single, res_s, _ = solve(eb, b, pk.fixed_mask, pk.fixed_vals, 1e-10)
    x_single = np.asarray(x_single)

    ndev = 8
    assert len(jax.devices()) >= ndev
    ps = part.partition(blocks, pk.nreduced, pk.fixed_mask, pk.fixed_vals,
                        coords, ndev)
    dev_mesh = Mesh(np.array(jax.devices()[:ndev]), ("d",))
    x_dist, res_d, iters = halo.solve_distributed(ps, b, 1e-10, dev_mesh)

    scale = np.abs(x_single).max()
    assert np.abs(x_dist - x_single).max() / scale < 1e-8
    assert res_d <= 1e-8


def test_partition_covers_all_elements():
    from xfemm_tpu.parallel import partition as part

    pk, blocks, b, coords = _system()
    ps = part.partition(blocks, pk.nreduced, pk.fixed_mask, pk.fixed_vals,
                        coords, 8)
    # every DOF owned exactly once
    assert ps.valid.sum() == pk.nreduced
    # element count preserved (padding rows carry zero matrices)
    mats = ps.blocks[0][2].reshape(-1, 3, 3)
    nonzero_elems = int((np.abs(mats).sum(axis=(1, 2)) > 0).sum())
    assert nonzero_elems == blocks[0][0].shape[0]


def test_distributed_schwarz_amg():
    """Additive-Schwarz local-AMG preconditioning (parallel/schwarz.py):
    same answer as the single-chip solve, in FEWER iterations than the
    Jacobi-preconditioned distributed CG."""
    import jax
    from jax.sharding import Mesh

    from xfemm_tpu.ops.solver import ElementBlock, solve
    from xfemm_tpu.parallel import halo, partition as part

    pk, blocks, b, coords = _system()
    eb = [ElementBlock(idx=blocks[0][0], sign=blocks[0][1],
                       mat=blocks[0][2])]
    x_single, _, _ = solve(eb, b, pk.fixed_mask, pk.fixed_vals, 1e-10)
    x_single = np.asarray(x_single)

    ndev = 8
    ps = part.partition(blocks, pk.nreduced, pk.fixed_mask, pk.fixed_vals,
                        coords, ndev)
    dev_mesh = Mesh(np.array(jax.devices()[:ndev]), ("d",))
    x_j, _, it_jac = halo.solve_distributed(ps, b, 1e-10, dev_mesh)
    x_s, res_s, it_sch = halo.solve_distributed(ps, b, 1e-10, dev_mesh,
                                                schwarz=True)
    scale = np.abs(x_single).max()
    assert np.abs(x_s - x_single).max() / scale < 1e-8
    assert res_s <= 1e-8
    assert it_sch < it_jac


def test_distributed_nonlinear_solve_end_to_end():
    """The PRODUCT path: magnetostatics.solve(problem, mesh, devices=8)
    runs the full Newton loop with every linear solve distributed over
    an 8-device mesh (partition + halo CG + Schwarz AMG), and must
    reproduce the single-chip solution."""
    from xfemm_tpu.mesh import mesher
    from xfemm_tpu.models import benchprob, magnetostatics

    p = benchprob.build(3000)
    mesh = mesher.mesh_problem(p)
    ref = magnetostatics.solve(p, mesh)
    dist = magnetostatics.solve(p, mesh, devices=8)
    assert dist.residual <= p.Precision
    scale = np.abs(ref.A).max()
    assert np.abs(dist.A - ref.A).max() / scale < 1e-6
    # the nonlinear problem actually took multiple Newton iterations
    assert dist.iterations > 0


def test_distributed_ac_csym_solve():
    """The AC pairs path: the distributed complex-symmetric CG
    (halo._pcg_csym_shard, (re,im) pairs + halo exchange) must
    reproduce the single-chip solve_complex on an eddy-current-style
    complex-symmetric system (stiffness + i*mass)."""
    from xfemm_tpu.ops import solver
    from xfemm_tpu.parallel.driver import DistributedSession

    pk, blocks, b, coords = _system()
    idx, sign, negMe = blocks[0]
    # add an eddy mass term i*w*sigma*(consistent 3x3) on the nonlinear
    # (conducting) elements: complex-symmetric, like harmonic2d.cpp:460
    E = idx.shape[0]
    mass = np.tile((np.full((3, 3), 1.0) + np.eye(3)) / 12.0, (E, 1, 1))
    matc = negMe.astype(complex) + 1j * 0.3 * mass
    cblocks = [solver.ElementBlock(idx=idx, sign=sign, mat=matc)]
    bc = b.astype(complex)

    x_ref, rr_ref, _ = solver.solve_complex(
        cblocks, bc, pk.fixed_mask, pk.fixed_vals.astype(complex), 1e-9)
    x_ref = np.asarray(x_ref)

    sess = DistributedSession(8, schwarz=False)
    x_d, rr_d, it = sess.solve_complex(
        cblocks, bc, pk.fixed_mask, pk.fixed_vals.astype(complex), 1e-9,
        coords=coords)
    assert rr_d <= 1e-9
    scale = np.abs(x_ref).max()
    assert np.abs(x_d - x_ref).max() / scale < 1e-7


def test_distributed_heat_solve_end_to_end(fixtures):
    """heatflow.solve(..., devices=8): the K(T) substitution loop with
    every linear solve distributed must reproduce the single-chip
    solution (multi-block system: elements + convection edges)."""
    from xfemm_tpu.geometry import femfile
    from xfemm_tpu.mesh.meshdata import read_mesh_files
    from xfemm_tpu.models import heatflow

    p = femfile.load(str(fixtures / "HeatTemp0.feh"))
    mesh = read_mesh_files(str(fixtures / "HeatTemp0"))
    ref = heatflow.solve(p, mesh)
    dist = heatflow.solve(p, mesh, devices=8)
    assert dist.residual <= p.Precision
    scale = np.abs(ref.T).max()
    assert np.abs(dist.T - ref.T).max() / scale < 1e-6


def test_distributed_electrostatics_schwarz_fallback(fixtures):
    """electrostatics.solve(..., devices=8) on the axisymmetric
    capacitor: the operator whose on-axis rows vanish like r used to
    defeat the Schwarz V-cycle (near-singular local coarse blocks +
    an underestimated smoother bound); with the Gershgorin omega and
    scaled coarse inversion it now converges through Schwarz, and the
    stall-guard/Jacobi fallback added for it remains as the safety
    net."""
    from xfemm_tpu.geometry import femfile
    from xfemm_tpu.mesh.meshdata import read_mesh_files
    from xfemm_tpu.models import electrostatics

    p = femfile.load(str(fixtures / "ElecTest.fee"))
    mesh = read_mesh_files(str(fixtures / "ElecTest"))
    ref = electrostatics.solve(p, mesh)
    dist = electrostatics.solve(p, mesh, devices=8)
    assert dist.residual <= p.Precision
    scale = np.abs(ref.V).max()
    assert np.abs(dist.V - ref.V).max() / scale < 1e-6


def test_distributed_harmonic_solve_end_to_end(fixtures):
    """harmonic.solve(..., devices=8): the AC pairs path end-to-end from
    a real .fem (eddy steel plate + fixed-J source, circuits stripped --
    Case-2 bordered rows stay single-chip by design). Must reproduce the
    single-chip complex solution."""
    from xfemm_tpu.geometry import femfile
    from xfemm_tpu.mesh.meshdata import read_mesh_files
    from xfemm_tpu.models import harmonic

    p = femfile.load(str(fixtures / "ACtest.fem"))
    for lab in p.labellist:
        lab.InCircuit = -1
    mesh = read_mesh_files(str(fixtures / "ACtest"))
    ref = harmonic.solve(p, mesh)
    dist = harmonic.solve(p, mesh, devices=8)
    assert dist.residual <= p.Precision
    scale = np.abs(ref.A).max()
    assert np.abs(dist.A - ref.A).max() / scale < 1e-6

    # circuit Case-2 problems keep the single-chip path (documented):
    # devices=8 on the unmodified fixture must still meet the contract
    p2 = femfile.load(str(fixtures / "ACtest.fem"))
    full = harmonic.solve(p2, mesh, devices=8)
    assert full.residual <= p2.Precision


def test_distributed_axisymmetric_solve_end_to_end(fixtures):
    """axisymmetric.solve(..., devices=8) on the nonlinear solenoid:
    the r-weighted Newton loop with every linear solve distributed must
    reproduce the single-chip solution."""
    from xfemm_tpu.geometry import femfile
    from xfemm_tpu.mesh.meshdata import read_mesh_files
    from xfemm_tpu.models import axisymmetric

    p = femfile.load(str(fixtures / "AxiSolenoid.fem"))
    mesh = read_mesh_files(str(fixtures / "AxiSolenoid"))
    ref = axisymmetric.solve(p, mesh)
    dist = axisymmetric.solve(p, mesh, devices=8)
    assert dist.residual <= p.Precision
    scale = np.abs(ref.A).max()
    assert np.abs(dist.A - ref.A).max() / scale < 1e-6


def test_distributed_harmonicaxi_solve_end_to_end(fixtures):
    """harmonicaxi.solve(..., devices=8): distributed complex pairs on
    the axisymmetric eddy problem (circuit replaced by a fixed J so no
    Case-2 bordered rows)."""
    from xfemm_tpu.geometry import femfile
    from xfemm_tpu.mesh.meshdata import read_mesh_files
    from xfemm_tpu.models import harmonicaxi

    p = femfile.load(str(fixtures / "ACaxi.fem"))
    for lab in p.labellist:
        lab.InCircuit = -1
    for m in p.blockproplist:
        if m.name == "Coil":
            m.J = 2.0 + 0.0j
    mesh = read_mesh_files(str(fixtures / "ACaxi"))
    ref = harmonicaxi.solve(p, mesh)
    dist = harmonicaxi.solve(p, mesh, devices=8)
    assert dist.residual <= p.Precision
    scale = np.abs(ref.A).max()
    assert np.abs(dist.A - ref.A).max() / scale < 1e-6


def test_sharded_band_engine_matches_single():
    """The sharded band engine (parallel/band_dd.py): per-device dense
    bands + exact local block-Thomas factors must reproduce the
    single-chip solution, in far fewer iterations than the
    first-generation element-block/Jacobi stack, and the value-refresh
    path (second call on the same session) must converge identically."""
    from xfemm_tpu.mesh import mesher
    from xfemm_tpu.models import benchprob, magnetostatics
    from xfemm_tpu.ops import assembly
    from xfemm_tpu.ops.solver import ElementBlock, solve
    from xfemm_tpu.parallel.driver import DistributedSession

    p = benchprob.build(10000)
    mesh = mesher.mesh_problem(p)
    pk = magnetostatics.pack(p, mesh)
    geom = assembly.tri_geometry(pk.xy, pk.tris)
    Mx, My, _ = assembly.curl_matrices(geom)
    mu = np.where(pk.nonlinear, 1000.0, pk.mu_x)
    Me = np.asarray(Mx) / mu[:, None, None] \
        + np.asarray(My) / mu[:, None, None]
    idx = pk.ridx[pk.tris]
    sign = pk.rsign[pk.tris]
    eb = [ElementBlock(idx=idx, sign=sign, mat=-Me)]
    b = np.zeros(pk.nreduced)
    np.add.at(b, idx.reshape(-1),
              -(sign * (-(pk.Jre * np.asarray(geom.area) / 3.0)[:, None]
                        * np.ones((1, 3)))).reshape(-1))
    coords = np.zeros((pk.nreduced, 2))
    coords[pk.ridx] = pk.xy

    x_single, _, _ = solve(eb, b, pk.fixed_mask, pk.fixed_vals, 1e-10)
    x_single = np.asarray(x_single)

    sess = DistributedSession(8)
    x_dd, res_d, it_d = sess.solve(eb, b, pk.fixed_mask, pk.fixed_vals,
                                   1e-10, coords=coords)
    assert sess._bdd is not None and not sess._bdd_disabled
    scale = np.abs(x_single).max()
    assert np.abs(np.asarray(x_dd) - x_single).max() / scale < 1e-8
    assert res_d <= 1e-8

    # warm call exercises the At -> Ap -> band/sidecar value refresh
    x2, res2, it2 = sess.solve(eb, b, pk.fixed_mask, pk.fixed_vals,
                               1e-10, coords=coords)
    assert np.abs(np.asarray(x2) - x_single).max() / scale < 1e-8
    assert it2 <= it_d + 5
