"""Steady/transient heat flow (HSolver semantics).

Functional equivalent of the reference's ``HSolver::AnalyzeProblem``
(cfemm/hsolver/hsolver.cpp:458-857): nonlinear K(T) conductivity by
successive substitution (3-node-average lookup), convection / heat-flux /
radiation boundary formats (radiation linearized about the previous
iterate), lumped transient term from dT/Tprev, planar + axisymmetric
(2*pi*r element depth, Kelvin-transform external region), and conductor
constraints: fixed-temperature conductors become Dirichlet sets, while
total-flux conductors merge their nodes into one reduced DOF whose summed
equation *is* the flux balance -- the TPU-native replacement for the
reference's extra conductor rows (hsolver.cpp:744-760). Internal working
units are meters (hsolver.cpp:65).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..constants import LENGTH_TO_METERS, PI, ProblemType
from ..geometry.problem import Problem
from ..mesh.meshdata import EdgeMultiplicity, MeshData
from ..ops import assembly, solver
from ..ops.solver import ElementBlock
from ..utils import profiling
from .magnetostatics import build_prolongation

KSB = 5.67032e-8      # Stefan-Boltzmann (femmconstants.h:26)


@dataclass
class HeatSolution:
    problem: Problem
    mesh: MeshData
    T: np.ndarray                 # (N,) nodal temperature
    node_Q: np.ndarray            # (N,) .anh Q col: -2 free, -1 fixed/
                                  # point-prop node, else conductor index
    conductor_V: np.ndarray       # (C,) solved conductor temperature
    conductor_q: np.ndarray       # (C,) solved conductor total flux
    iterations: int = 0
    residual: float = 0.0


def decode_markers(mesh: MeshData):
    """Node/edge marker decoding shared by heat + electrostatics
    (hsolver.cpp:210-235, 355-385): node marker = (pointprop+2) |
    ((conductor+1)<<16); edge marker = -((bdry+2) | ((conductor+1)<<16)).
    Edge conductors propagate to their endpoint nodes."""
    m = mesh.node_markers.astype(np.int64)
    node_pp = np.where(m > 1, (m & 0xFFFF) - 2, -1)
    node_pp = np.where(node_pp < 0, -1, node_pp)
    node_cond = np.where(m > 1, (m >> 16) - 1, -1)

    em = mesh.edge_markers.astype(np.int64)
    neg = em < 0
    em2 = np.where(neg, -em, 0)
    edge_bdry = np.where(neg, (em2 & 0xFFFF) - 2, -1)
    edge_cond = np.where(neg, (em2 >> 16) - 1, -1)
    for (a, b), ccond in zip(mesh.edges, edge_cond):
        if ccond >= 0:
            node_cond[a] = ccond
            node_cond[b] = ccond
    return node_pp, node_cond, edge_bdry, edge_cond


def compute_node_Q(problem: Problem, mesh: MeshData, node_pp, node_cond,
                   edge_bdry) -> np.ndarray:
    """The reference's per-node Q bookkeeping, written to the solution
    file and consumed by the postprocessor's nodal smoothing
    (hsolver.cpp:495-533 + :764-775, esolver.cpp:410-440 + :590-600):
    -2 free, -1 for any point-property node or fixed-potential segment
    endpoint, conductor index for any conductor node (last wins).
    getNodalD treats Q != -2 as 'do not smooth across this node'."""
    Q = np.full(len(mesh.nodes), -2, np.int64)
    npp = len(problem.nodeproplist)
    Q[(node_pp >= 0) & (node_pp < npp)] = -1
    eb = np.asarray(edge_bdry)
    nlp = len(problem.lineproplist)
    for ei in np.nonzero((eb >= 0) & (eb < nlp))[0]:
        if problem.lineproplist[eb[ei]].BdryFormat == 0:
            a, b = mesh.edges[ei]
            Q[a] = -1
            Q[b] = -1
    cond = np.asarray(node_cond)
    Q[cond >= 0] = cond[cond >= 0]
    return Q


def conductor_prolongation(n, pbc_pairs, node_cond, conductors):
    """(Anti)periodic folding composed with total-flux conductor merges:
    all nodes of a CircType-0 conductor share one reduced DOF."""
    ridx, rsign, nred = build_prolongation(n, pbc_pairs)
    remap = np.arange(nred)
    for ci, cond in enumerate(conductors):
        if cond.CircType != 0:
            continue
        members = np.unique(ridx[node_cond == ci])
        if len(members) > 1:
            remap[members] = members.min()
    # compress ids
    uniq, newid = np.unique(remap, return_inverse=True)
    ridx = newid[remap[ridx]]
    # conductor -> reduced DOF map
    cond_dof = np.full(len(conductors), -1, np.int64)
    for ci, cond in enumerate(conductors):
        sel = node_cond == ci
        if sel.any():
            cond_dof[ci] = ridx[np.nonzero(sel)[0][0]]
    return ridx, rsign, len(uniq), cond_dof


import collections

_HEAT_SETUP_CACHE: "collections.OrderedDict[tuple, tuple]" = \
    collections.OrderedDict()


def _setup_static(problem, mesh, labels, mats, conductors, units, axi,
                  depth):
    """All (problem, mesh)-static state of the heat solve: geometry,
    marker decoding, conductor prolongation, fixed DOFs, boundary
    edges, per-element property arrays and the solver Session. Cached
    by content fingerprint in _HEAT_SETUP_CACHE."""
    xy = mesh.nodes * units
    tris = mesh.elements
    N = mesh.num_nodes
    T = mesh.num_elements
    lbl_bt = np.array([l.BlockType for l in labels], np.int64)
    blk = lbl_bt[mesh.element_labels]

    node_pp, node_cond, edge_bdry, edge_cond = decode_markers(mesh)
    ridx, rsign, nred, cond_dof = conductor_prolongation(
        N, mesh.pbc_pairs, node_cond, conductors)

    geom = assembly.tri_geometry(xy, tris)
    area = np.asarray(geom.area)
    rc = xy[tris][:, :, 0].mean(axis=1)
    dep_el = 2.0 * PI * rc if axi else np.full(T, depth)

    # external-region warp (hsolver.cpp:578-586)
    kludge = np.ones(T)
    if axi:
        lbl_ext = np.array([l.IsExternal for l in labels], bool)
        is_ext = lbl_ext[mesh.element_labels]
        if is_ext.any():
            extRo = problem.extRo * units
            extRi = problem.extRi * units
            extZo = problem.extZo * units
            z = xy[tris][:, :, 1].mean(axis=1) - extZo
            kludge = np.where(is_ext, (rc * rc + z * z) / (extRi * extRo),
                              1.0)

    # fixed DOFs
    fixed_mask = np.zeros(nred, bool)
    fixed_vals = np.zeros(nred)
    npp = len(problem.nodeproplist)
    special = np.nonzero((node_cond >= 0)
                         | ((node_pp >= 0) & (node_pp < npp)))[0]
    for i in special:
        ci = node_cond[i]
        if ci >= 0 and conductors[ci].CircType == 1:
            fixed_mask[ridx[i]] = True
            fixed_vals[ridx[i]] = conductors[ci].V
        j = node_pp[i]
        if 0 <= j < npp:
            pp = problem.nodeproplist[j]
            if pp.qp == 0:
                fixed_mask[ridx[i]] = True
                fixed_vals[ridx[i]] = pp.V
    # fixed-T segments (BdryFormat 0)
    bdry_edges = []        # (a, b, bf_index, mult)
    edge_count = EdgeMultiplicity(tris)
    marked = np.nonzero((np.asarray(edge_bdry) >= 0)
                        & (np.asarray(edge_bdry)
                           < len(problem.lineproplist)))[0]
    for ei in marked:
        a, b = mesh.edges[ei]
        bi = edge_bdry[ei]
        bp = problem.lineproplist[bi]
        if bp.BdryFormat == 0:
            for nd in (a, b):
                fixed_mask[ridx[nd]] = True
                fixed_vals[ridx[nd]] = bp.Tset
        elif bp.BdryFormat in (1, 2, 3):
            mult = edge_count.get(tuple(sorted((int(a), int(b)))), 1)
            bdry_edges.append((int(a), int(b), bi, mult))

    # point sources + conductor total-flux RHS
    b_extra = np.zeros(nred)
    for i in special:
        j = node_pp[i]
        if 0 <= j < npp:
            pp = problem.nodeproplist[j]
            if pp.qp != 0 and not fixed_mask[ridx[i]]:
                dp = 2.0 * PI * xy[i, 0] if axi else depth
                b_extra[ridx[i]] += dp * pp.qp
    for ci, cond in enumerate(conductors):
        if cond.CircType == 0 and cond_dof[ci] >= 0:
            b_extra[cond_dof[ci]] += cond.q

    dof_coords = np.zeros((nred, 2))
    dof_coords[ridx] = xy

    mat_npts = np.array([m.npts for m in mats], np.int64)
    mat_kt = np.array([m.Kt for m in mats])
    mat_qv = np.array([m.qv for m in mats])
    nl_el = mat_npts[blk] > 0
    Kt = mat_kt[blk]
    qv = mat_qv[blk]
    has_rad = any(problem.lineproplist[bi].BdryFormat == 3
                  for _a, _b, bi, _m in bdry_edges)
    nonlinear = bool(nl_el.any()) or has_rad

    return (xy, blk, node_pp, node_cond, edge_bdry, edge_cond, ridx,
            rsign, nred, cond_dof, geom, area, rc, dep_el, kludge,
            fixed_mask, fixed_vals, bdry_edges, b_extra, dof_coords,
            nonlinear, Kt, qv, nl_el, has_rad, solver.Session())


def solve(problem: Problem, mesh: MeshData, Tprev: np.ndarray | None = None,
          max_iter: int = 100, devices: int | None = None,
          device_mesh=None) -> HeatSolution:
    """``devices=N`` runs every linear solve of the K(T) loop on an
    N-device 1-D ``jax.sharding.Mesh`` (domain-decomposition halo
    exchange + additive-Schwarz AMG, parallel/driver.py) -- the
    multi-chip analogue of the reference's PCGSolve call inside
    hsolver.cpp's AnalyzeProblem loop."""
    from ..mesh.meshdata import resolve_default_labels
    resolve_default_labels(problem, mesh)
    if Tprev is None and problem.PrevSoln:
        # transient stepping: load T of the previous step (LoadPrev,
        # hsolver.cpp:860-866) by exact node-coordinate match
        from scipy.spatial import cKDTree

        from ..io import ansfile
        g = ansfile.read_ans(problem.PrevSoln)
        d, idx = cKDTree(g.mesh.nodes).query(mesh.nodes)
        if d.max() > 1e-08:
            raise ValueError("previous solution mesh does not match")
        Tprev = np.real(g.values)[idx]
    units = LENGTH_TO_METERS[problem.LengthUnits]
    axi = problem.ProblemType == ProblemType.AXISYMMETRIC
    tris = mesh.elements
    N = mesh.num_nodes
    T = mesh.num_elements
    depth = problem.Depth * units if not axi else 1.0
    labels = [l for l in problem.labellist if not l.is_hole()]
    mats = problem.blockproplist
    conductors = problem.circproplist

    # (problem, mesh)-static setup, cached across repeat solves
    # (transient chains, parameter sweeps): marker decoding, geometry,
    # fixed DOFs, boundary edges, per-element property arrays -- ~4 s
    # of host work per 327k solve otherwise repeated every call
    from .magnetostatics import _problem_fingerprint
    ckey = (id(problem), id(mesh))
    fp = (_problem_fingerprint(problem), getattr(problem, "dT", 0.0))
    hit = _HEAT_SETUP_CACHE.get(ckey)
    if fp[0] is not None and hit is not None and hit[0] == fp:
        su = hit[1]
    else:
        su = _setup_static(problem, mesh, labels, mats, conductors,
                           units, axi, depth)
        if fp[0] is not None:
            _HEAT_SETUP_CACHE[ckey] = (fp, su)
            while len(_HEAT_SETUP_CACHE) > 4:
                _HEAT_SETUP_CACHE.popitem(last=False)
    (xy, blk, node_pp, node_cond, edge_bdry, edge_cond, ridx, rsign,
     nred, cond_dof, geom, area, rc, dep_el, kludge, fixed_mask,
     fixed_vals, bdry_edges, b_extra, dof_coords, nonlinear, Kt, qv,
     nl_el, has_rad, sess) = su

    dT = getattr(problem, "dT", 0.0)
    Tp = np.zeros(N) if Tprev is None else np.asarray(Tprev)

    Vo = np.zeros(N)           # previous nodal temperatures
    V = np.zeros(nred)
    iters_total = 0
    rel_resid = 0.0
    res = 0.0
    dev_heat = getattr(sess, "_dev_heat", None)
    dev_runs = 0
    dsess = None
    if devices:
        from ..parallel.driver import DistributedSession
        dsess = DistributedSession(devices, mesh=device_mesh)

    for it in range(max_iter if nonlinear else 1):
        # the substitution MIDDLE runs entirely on device in one
        # dispatch (ops/newton.py::run_heat): K(T) lookup, operator
        # refresh, preconditioned CG, convergence test. The accepting
        # pass at the full contract Precision stays on host below.
        if (dev_heat is not None and dev_runs < 2 and it > 0
                and res >= 3e4 * problem.Precision
                and sess.band_amg is not None):
            from ..ops import newton as newton_dev
            from ..ops import solver as solver_mod
            with profiling.phase("device heat"):
                from .magnetostatics import _dn_cg_budget
                amg_rest, dense, _abf = newton_dev.strip_fine_band(
                    sess.band_amg)
                # budget-bounded dispatch chain (see the magnetostatic
                # fused loop): one unbounded dispatch at 1M-class sizes
                # kills the tunneled TPU worker
                cg_budget = _dn_cg_budget(sess)
                target = max(90.0 * problem.Precision, 3e-6)
                Vd = jnp.asarray(V, jnp.float32)
                res_d = res
                cgit = 0.0
                steps_tot = 0
                for _sub in range(12):
                    state = jnp.asarray([res_d], jnp.float32)
                    Vd, dense, dvec, oob_vals, stats = \
                        newton_dev.run_heat(
                            dev_heat, amg_rest, dense, Vd, state,
                            tol_floor=max(problem.Precision, 3e-7),
                            target_res=target,
                            bt=sess.bt, cg_budget=cg_budget)
                    prev_res = res_d
                    res_d, ksteps, cg_sub = np.asarray(stats, np.float64)
                    cgit += cg_sub
                    steps_tot += int(ksteps)
                    budget_cut = (cg_budget > 0 and cg_sub >= cg_budget
                                  and int(ksteps) > 0 and res_d > target)
                    if not budget_cut or res_d >= 0.98 * prev_res:
                        break
                    # chain must not multiply the per-run step cap
                    if steps_tot >= 30:
                        break
                sess.band_amg = newton_dev.rebuild_band_amg(
                    amg_rest, dense, None, dvec, oob_vals)
                if sess.band_ckey is not None \
                        and sess.band_ckey in solver_mod._BAND_CACHE:
                    solver_mod._BAND_CACHE[sess.band_ckey]["band_amg"] = \
                        sess.band_amg
                V = np.asarray(Vd, np.float64)
            iters_total += int(cgit)
            dev_runs += 1
            res = float(res_d)
            Vo = V[ridx] * rsign
            continue
        # element conductivity: 3-node average of K(T_prev)
        knx = np.zeros(T)
        kny = np.zeros(T)
        for bidx in set(blk.tolist()):
            sel = blk == bidx
            mat = mats[bidx]
            if mat.npts == 0:
                knx[sel] = mat.Kx
                kny[sel] = mat.Ky
            else:
                kav = mat.get_k_array(Vo[tris[sel]]).mean(axis=1)
                knx[sel] = kav
                kny[sel] = kav

        Kx = -dep_el * knx / (4.0 * area) / kludge
        Ky = -dep_el * kny / (4.0 * area) / kludge
        Me = (Kx[:, None, None] * geom.p[:, :, None] * geom.p[:, None, :]
              + Ky[:, None, None] * geom.q[:, :, None] * geom.q[:, None, :])
        be = np.zeros((T, 3))
        if dT != 0:
            Kt_term = -dep_el * Kt * area / (3.0 * dT)
            Me = Me + Kt_term[:, None, None] * np.eye(3)[None]
            be = be + Kt_term[:, None] * Tp[tris]
        be = be + (-dep_el * qv * area / 3.0)[:, None]

        blocks = [ElementBlock(idx=ridx[tris], sign=rsign[tris], mat=-Me)]
        b = np.zeros(nred)
        np.add.at(b, ridx[tris].reshape(-1),
                  -(rsign[tris] * be).reshape(-1))
        b += b_extra

        # derivative boundary edges (hsolver.cpp:655-722)
        if bdry_edges:
            eidx = np.zeros((len(bdry_edges), 2), np.int64)
            esgn = np.ones((len(bdry_edges), 2))
            emat = np.zeros((len(bdry_edges), 2, 2))
            for row, (a, bb, bi, mult) in enumerate(bdry_edges):
                bp = problem.lineproplist[bi]
                length = float(np.hypot(*(xy[bb] - xy[a])))
                bf = bp.BdryFormat
                if bf == 1:
                    c0, c1 = 0.0, bp.qs
                elif bf == 2:
                    c0, c1 = bp.h, -bp.h * bp.Tinf
                else:   # radiation, linearized about previous iterate
                    Tlast = (Vo[a] + Vo[bb]) / 2.0
                    c0 = 4.0 * bp.beta * KSB * Tlast ** 3
                    c1 = -(bp.beta * KSB * (bp.Tinf ** 4
                                            + 3.0 * Tlast ** 4))
                eidx[row] = (ridx[a], ridx[bb])
                esgn[row] = (rsign[a], rsign[bb])
                if axi:
                    ra, rb = xy[a, 0], xy[bb, 0]
                    K = -2.0 * PI * c0 * length / 6.0 * mult
                    emat[row] = -np.array([
                        [2.0 * (3 * ra + rb) / 4.0, (ra + rb) / 2.0],
                        [(ra + rb) / 2.0, 2.0 * (ra + 3 * rb) / 4.0]]) * K
                    Kb = 2.0 * PI * c1 * length / 2.0 * mult
                    b[ridx[a]] -= rsign[a] * Kb * (2 * ra + rb) / 3.0
                    b[ridx[bb]] -= rsign[bb] * Kb * (ra + 2 * rb) / 3.0
                else:
                    K = -depth * c0 * length / 6.0 * mult
                    emat[row] = -K * np.array([[2.0, 1.0], [1.0, 2.0]])
                    Kb = depth * c1 * length / 2.0 * mult
                    b[ridx[a]] -= rsign[a] * Kb
                    b[ridx[bb]] -= rsign[bb] * Kb
            blocks.append(ElementBlock(idx=eidx, sign=esgn, mat=emat))

        # inexact forcing: early successive-substitution iterations only
        # need to out-resolve the current outer error; acceptance always
        # follows a full-Precision solve
        if not nonlinear or (it > 0 and res < 3e4 * problem.Precision):
            tol_it = problem.Precision
        elif it == 0:
            tol_it = max(problem.Precision, 1e-4)
        else:
            tol_it = max(problem.Precision, min(1e-4, 0.03 * res))
        changed = None
        if nonlinear:
            changed = [nl_el]
            if len(blocks) > 1:
                changed.append(
                    np.ones(len(blocks[1].idx), bool) if has_rad else None)

        V_old = V
        if dsess is not None:
            with profiling.phase("distributed solve"):
                V, rel_resid, cg_iters = dsess.solve(
                    blocks, b, fixed_mask, fixed_vals, tol_it,
                    x0=V if it > 0 else None, coords=dof_coords)
        else:
            V, rel_resid, cg_iters = solver.solve(
                blocks, b, fixed_mask, fixed_vals, tol_it,
                x0=V if it > 0 else None, coords=dof_coords, session=sess,
                changed=changed)
        V = np.asarray(V)
        iters_total += int(cg_iters)
        Vo = V[ridx] * rsign

        if not nonlinear:
            break
        e1 = float(np.sum((V - V_old) ** 2))
        e2 = float(np.sum(V_old ** 2))
        # unit sentinel when no previous iterate exists (it-0 against
        # V_old = 0): the substitution error is unknown, so the forcing
        # schedule must stay loose rather than jump to full precision
        res = math.sqrt(e1 / e2) if e2 != 0 else 1.0
        if (e2 != 0 and res < problem.Precision * 100.0
                and tol_it <= problem.Precision):
            break

        # after the it-0 solve has built the band hierarchy and value
        # maps, intermediate substitution iterations can run on device
        if (it == 0 and dev_heat is None and not has_rad
                and dsess is None
                and not os.environ.get("XFEMM_TPU_NO_DEVICE_NEWTON")):
            from ..ops import newton as newton_dev
            # block mat = mat_0 + k * mat_k for K(T) elements (the
            # transient lumped term is k-independent)
            ce = dep_el / (4.0 * area) / kludge
            pq = (geom.p[:, :, None] * geom.p[:, None, :]
                  + geom.q[:, :, None] * geom.q[:, None, :])
            mat_k_full = ce[:, None, None] * pq
            mat_0_full = np.zeros_like(mat_k_full)
            if dT != 0:
                Kt_term0 = -dep_el * Kt * area / (3.0 * dT)
                mat_0_full += -Kt_term0[:, None, None] * np.eye(3)[None]
            # rhs with the changed elements' A.g coupling removed
            # entirely (setup folds the k-independent part back in)
            g = np.where(fixed_mask, fixed_vals, 0.0)
            b_nofixed = np.asarray(b, np.float64).copy()
            if fixed_mask.any() and np.any(fixed_vals[fixed_mask] != 0.0):
                for bi_, blkk in enumerate(blocks):
                    bidx = np.asarray(blkk.idx)
                    bsgn = np.asarray(blkk.sign, np.float64)
                    bmat = np.asarray(blkk.mat, np.float64)
                    if bi_ == 0:
                        bmat = bmat.copy()
                        bmat[nl_el] = 0.0
                    gl = bsgn * g[bidx]
                    ye = np.einsum("ekl,el->ek", bmat, gl)
                    np.subtract.at(b_nofixed, bidx.reshape(-1),
                                   (bsgn * ye).reshape(-1))
            mats_T = {bi2: mats[bi2].Tdata for bi2 in set(blk.tolist())}
            mats_K = {bi2: mats[bi2].Kdata for bi2 in set(blk.tolist())}
            dev_heat = newton_dev.setup_heat(
                sess, ridx, rsign, tris, fixed_mask, fixed_vals,
                mats_T, mats_K, blk, mat_k_full, mat_0_full, b_nofixed)
            sess._dev_heat = dev_heat

    Tn = V[ridx] * rsign

    # conductor results: solved T and total flux (ChargeOnConductor,
    # hsolver.cpp:987-1042: gradient of the conductor indicator weighted
    # by the flux density, integrated over adjacent elements)
    cond_V = np.zeros(len(conductors))
    cond_q = np.zeros(len(conductors))
    for ci, cond in enumerate(conductors):
        if cond.CircType == 0:
            cond_q[ci] = cond.q
            if cond_dof[ci] >= 0:
                cond_V[ci] = V[cond_dof[ci]]
        else:
            cond_V[ci] = cond.V
            cond_q[ci] = _charge_on_conductor(
                ci, node_cond, xy, tris, blk, mats, Tn, axi, depth)

    node_Q = compute_node_Q(problem, mesh, node_pp, node_cond, edge_bdry)
    return HeatSolution(problem=problem, mesh=mesh, T=Tn,
                        node_Q=node_Q, conductor_V=cond_V,
                        conductor_q=cond_q, iterations=iters_total,
                        residual=float(rel_resid))


def _charge_on_conductor(ci, node_cond, xy, tris, blk, mats, Tn, axi,
                         depth):
    P = (node_cond == ci).astype(float)
    sel = P[tris].any(axis=1)
    if not sel.any():
        return 0.0
    t = tris[sel]
    v = xy[t]
    bb = v[:, [1, 2, 0], 1] - v[:, [2, 0, 1], 1]
    cc = v[:, [2, 0, 1], 0] - v[:, [1, 2, 0], 0]
    da = bb[:, 0] * cc[:, 1] - bb[:, 1] * cc[:, 0]
    a = da / 2.0
    if axi:
        a = a * 2.0 * PI * v[:, :, 0].mean(axis=1)
    else:
        a = a * depth
    vx = -(P[t] * bb).sum(axis=1) / da
    vy = -(P[t] * cc).sum(axis=1) / da
    Dx = -(Tn[t] * bb).sum(axis=1) / da
    Dy = -(Tn[t] * cc).sum(axis=1) / da
    kn = np.zeros((sel.sum(), 2))
    for row, (el_nodes, bidx) in enumerate(zip(t, blk[sel])):
        mat = mats[bidx]
        ks = [mat.get_k(Tn[nd]) for nd in el_nodes]
        kn[row, 0] = sum(k[0] for k in ks) / 3.0
        kn[row, 1] = sum(k[1] for k in ks) / 3.0
    return float(np.sum(a * (Dx * kn[:, 0] * vx + Dy * kn[:, 1] * vy)))
