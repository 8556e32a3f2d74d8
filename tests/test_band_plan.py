"""CPU-only regression tests for the band-hierarchy planner.

Round 2 shipped three planner fixes validated only at 250k, and the 994k
solve then RESOURCE_EXHAUSTED the real device (the re-RCM'd L2 Galerkin
coarse level kept a 55,424-wide band: 6.9 GB bf16 for a ~62k matrix;
hierarchy total 14.25 GB on a 16 GB part). These tests build the FULL
hierarchy *plan* -- ``ops.band.setup_band_amg(plan_only=True)`` through
the exact ordering/tier/budget policy ``ops.solver.solve`` applies
(``pick_band_order`` / ``plan_band_hierarchy``) -- for synthetic
250k/1M-class FEM matrices and assert the planned device residency fits
the 16 GB budget with every coarse level bounded, without needing a TPU.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from xfemm_tpu.ops import band as band_mod
from xfemm_tpu.ops import blocktri as bt_mod
from xfemm_tpu.ops import solver as solver_mod

HBM = 16e9      # v5e part, the budget every threshold was tuned on


def _grid_fem(nx: int, ny: int):
    """Adjacency matrix of a triangulated structured grid (each quad
    split along one diagonal): the same 7-point nodal stencil and
    |row-col| distance profile a real 2-D FEM mesh produces, at a
    fraction of the meshing cost."""
    n = nx * ny
    ii = np.arange(n, dtype=np.int64)
    x = ii % nx
    y = ii // nx
    coords = np.stack([x, y], axis=1).astype(np.float64)
    rows = [ii]
    cols = [ii]
    vals = [np.full(n, 6.0)]
    for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1), (1, 1), (-1, -1)):
        ok = ((x + dx >= 0) & (x + dx < nx)
              & (y + dy >= 0) & (y + dy < ny))
        rows.append(ii[ok])
        cols.append(((y + dy) * nx + (x + dx))[ok])
        vals.append(np.full(int(ok.sum()), -1.0))
    A = sp.coo_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(n, n)).tocsr()
    A.sum_duplicates()
    return A, coords


def _plan(nx: int, ny: int):
    """Run the solver's full planning pipeline, return (plan, report)."""
    At, coords = _grid_fem(nx, ny)
    perm, partitioned, gpos = solver_mod.pick_band_order(At, coords, hbm=HBM)
    Ap = At[perm][:, perm].tocsr()
    Ap.sum_duplicates()
    plan = solver_mod.plan_band_hierarchy(Ap, partitioned, hbm=HBM)
    assert plan is not None, "no storage tier fits -- planner regression"
    report, none = band_mod.setup_band_amg(
        Ap, sym=plan["sym"],
        fine_dtype=("bf16" if plan["fine_dtype"] else None),
        bt_coarse_budget=plan["bt_budget"],
        bt_transient_budget=plan["bt_transient"],
        coords=coords[perm],
        budget_bytes=plan["hier_budget"],
        fine_full=plan["fine_full"],
        band_key=gpos[perm],
        plan_only=True)
    assert none is None
    return plan, report, partitioned


def _check_budget(plan, report):
    totals = report[-1]
    assert "total_bytes" in totals
    total = totals["total_bytes"]
    extra = 0.0
    if plan["fine_bt_ok"]:
        # the fine blocktri factor (built by solve() after the
        # hierarchy) and its build transient must also fit; smoother-
        # role factors store per plan dtype and build chunked (bounded
        # fill transient, blocktri.build_factor_chunked)
        n0, bs = report[0]["n"], plan["bsize"]
        if plan.get("bt_smooth"):
            it = 2 if plan.get("bt_store") == "bf16" else 4
            extra = bt_mod.factor_bytes(n0, bs, it)
            extra += (2 * 128 * bs * bs * 4
                      if bt_mod.factor_bytes(n0, bs) > 2e9
                      else bt_mod.factor_bytes(n0, bs, 4))
        else:
            extra = 2 * bt_mod.factor_bytes(n0, bs)
    assert total + extra <= 0.85 * HBM, (total, extra, report)
    # every coarse (preconditioner-internal) level individually bounded:
    # the round-2 failure was ONE level holding 6.9 GB
    for lvl in report[1:-1]:
        lvl_bytes = lvl["bytes_A"] + lvl["bytes_P"] + lvl["bytes_Abf"]
        assert lvl_bytes <= plan["hier_budget"], lvl


def test_plan_250k_grid():
    """250k-class: global RCM, f32 full band, fine blocktri factor."""
    plan, report, partitioned = _plan(500, 500)
    assert not partitioned
    assert plan["sym"] is False and plan["fine_dtype"] is None
    assert plan["fine_bt_ok"], plan
    _check_budget(plan, report)
    # the fine level must hold the FULL operator: never truncated
    assert not report[0]["truncated"]
    assert report[0]["discarded"] == 0


def test_plan_1m_grid():
    """1M-class: the round-2 OOM regime. RCB-partitioned ordering,
    sym (triu) storage, hierarchy + any coarse factor fit 16 GB."""
    plan, report, partitioned = _plan(1000, 1000)
    assert partitioned
    # the partitioned fine band gets an in-part blocktri factor used as
    # the V-cycle's fine smoother (two-level DD)
    assert plan["fine_bt_ok"] and plan["bt_smooth"], plan
    assert not plan["fine_full"]
    _check_budget(plan, report)
    assert not report[0]["truncated"]
    assert report[0]["discarded"] == 0
    # the fine band must dominate: no coarse level may exceed it
    fine = report[0]["bytes_A"]
    for lvl in report[1:-1]:
        assert lvl["bytes_A"] <= max(fine, 2e9), lvl


def test_plan_respects_tiny_budget():
    """A deliberately starved budget still yields a legal plan: coarse
    levels truncate rather than blow past the cap."""
    At, coords = _grid_fem(400, 400)
    perm, _part, _g = solver_mod.pick_band_order(At, coords, hbm=HBM)
    Ap = At[perm][:, perm].tocsr()
    Ap.sum_duplicates()
    # budget barely above the fine band: every coarse level must shrink
    rows = np.repeat(np.arange(Ap.shape[0]), np.diff(Ap.indptr))
    dist = np.abs(rows - Ap.indices)
    R, cut, _sp = band_mod.plan_level(dist, Ap.shape[0], sym=False)
    fine_bytes = band_mod._band_est(Ap.shape[0], cut, R, False)
    budget = fine_bytes * 1.3
    report, _ = band_mod.setup_band_amg(
        Ap, coords=coords[perm], budget_bytes=budget, plan_only=True)
    assert report[-1]["total_bytes"] <= budget * 1.001, report
