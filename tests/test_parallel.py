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
