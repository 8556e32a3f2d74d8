"""Time-harmonic axisymmetric magnetics (HarmonicAxisymmetric semantics).

Functional equivalent of cfemm/fsolver/harmonicaxi.cpp:34-820: the
axisymmetric r-weighted element matrices of the static path (staticaxi
geometry with the log-mean radius R_hat) with complex effective
permeability, a lumped eddy term -j*R*a*w*sigma*c/6 * 4/3 per entry,
2r-weighted Robin/impedance boundaries, on-axis pinning, loop-factor
point currents, circuit Case 2 voltage-gradient DOFs (couplings without
the R factor, diagonal and RHS carrying 1/R and 2x factors), and flux
output 2*pi*r*c*V. Successive approximation for nonlinear B-H, with B
from the conjugated energy form.

Same sign convention as models/harmonic.py: the reference's harmonic
global system is negated so the blocks match the DC machinery.
"""

from __future__ import annotations

import math

import numpy as np

from ..constants import C_APOT, MU0, PI, ProblemType
from ..geometry.problem import Problem
from ..mesh.meshdata import MeshData
from ..ops import assembly, solver
from ..ops.solver import ElementBlock
from .harmonic import _effective_mu, _hermite_complex, _proximity_mu
from .magnetostatics import MagSolution, pack


def solve(problem: Problem, mesh: MeshData,
          max_newton: int = 100, devices: int | None = None,
          device_mesh=None) -> MagSolution:
    """``devices=N``: distributed complex-symmetric solves; circuit
    Case-2 bordered problems keep the single-chip path (see
    models/harmonic.py)."""
    assert problem.ProblemType == ProblemType.AXISYMMETRIC
    assert problem.Frequency != 0
    pk = pack(problem, mesh)
    c = C_APOT
    w = problem.Frequency * 2.0 * PI
    geom = assembly.axi_geometry(pk.xy, pk.tris)
    Mx, My, Mxy = assembly.axi_curl_matrices(geom)
    T = pk.tris.shape[0]
    area = np.asarray(geom.area)
    R = np.asarray(geom.R)
    vol = np.asarray(geom.vol)
    labels = [l for l in problem.labellist if not l.is_hole()]
    mats = problem.blockproplist

    for m in mats:
        if m.BHpoints > 0 and not m.slope:
            m.get_slopes(w)

    if any(mats[labels[i].BlockType].LamType in (1, 2) for i in pk.lbl):
        raise ValueError("On-edge lamination not supported in AC analyses")

    # wound/proximity (areas in m^2: cm^2 -> 1e-4)
    atot = np.zeros(len(labels))
    np.add.at(atot, pk.lbl, np.abs(area) * 1e-4)
    is_wound = np.zeros(len(labels), bool)
    prox_mu = np.ones(len(labels), complex)
    for k, lab in enumerate(labels):
        mat = mats[lab.BlockType]
        is_wound[k] = abs(lab.Turns) > 1 or mat.LamType > 2
        prox_mu[k] = _proximity_mu(problem, lab, mat, atot[k])
    el_wound = is_wound[pk.lbl]

    # circuit cases (harmonicaxi.cpp:86-160: CircInt2 = a*sigma/(0.01 r))
    sigma_raw = np.array([mats[labels[i].BlockType].Cduct for i in pk.lbl])
    sigma_circ = np.where(el_wound, 0.0, sigma_raw)
    Jc_block = pk.Jre + 1j * pk.Jim
    nc = len(pk.circuits)
    case = np.zeros(nc, np.int64)
    circJ = np.zeros(nc, complex)
    circdV = np.zeros(nc, complex)
    if nc:
        i1 = np.zeros(nc)
        i2 = np.zeros(nc)
        i3 = np.zeros(nc, complex)
        for e in range(T):
            ci = pk.circuit[e]
            if ci >= 0:
                i1[ci] += area[e]
                i2[ci] += area[e] * sigma_circ[e] / (0.01 * R[e])
                i3[ci] += Jc_block[e] * area[e] * 100.0
        for k, circ in enumerate(pk.circuits):
            if circ.CircType == 0:
                if i2[k] == 0:
                    case[k] = 1
                    amps = complex(circ.Amps)
                    circJ[k] = 0.0 if i1[k] == 0 else \
                        0.01 * (amps - i3[k]) / i1[k]
                else:
                    case[k] = 2
            else:
                case[k] = 0
                circdV[k] = complex(circ.dVolts)
    case2_ids = [k for k in range(nc) if case[k] == 2]
    case2_slot = {k: pk.nreduced + j for j, k in enumerate(case2_ids)}
    ntot = pk.nreduced + len(case2_ids)

    eff_mu = [_effective_mu(problem, m) for m in mats]
    mu1 = np.array([eff_mu[labels[i].BlockType][0] for i in pk.lbl])
    mu2 = np.array([eff_mu[labels[i].BlockType][1] for i in pk.lbl])
    prox_el = prox_mu[pk.lbl]
    lam_gt2 = np.array([mats[labels[i].BlockType].LamType > 2
                        for i in pk.lbl])
    mu1 = np.where(lam_gt2, prox_el, mu1)
    mu2 = np.where(lam_gt2, prox_el, mu2)

    lam_inplane = np.array([
        mats[labels[i].BlockType].LamType == 0
        and mats[labels[i].BlockType].Lam_d > 0 for i in pk.lbl])
    sigma_eddy = np.where(el_wound | lam_inplane, 0.0, sigma_raw)
    # lumped eddy: ref Me += (-j R a w sigma c/6)*4/3 per entry; negated
    eddy_K = 1j * R * area * w * sigma_eddy * c / 6.0 * (4.0 / 3.0)
    M_eddy = eddy_K[:, None, None] * np.ones((1, 3, 3))

    fixed_mask = np.zeros(ntot, bool)
    fixed_mask[:pk.nreduced] = pk.fixed_mask
    fixed_vals = np.zeros(ntot, complex)
    fixed_vals[:pk.nreduced] = pk.fixed_vals_c
    # on-axis nodes already pinned by pack (fixed to 0)

    # sources -2R(J+Jv)a/3; Case 0 Jv = -100 dV sigma / R
    Jv = np.zeros(T, complex)
    for e in range(T):
        ci = pk.circuit[e]
        if ci >= 0:
            if case[ci] == 1:
                Jv[e] = circJ[ci]
            elif case[ci] == 0:
                Jv[e] = -100.0 * circdV[ci] * sigma_raw[e] / R[e]
    src = -2.0 * R * (Jc_block + Jv) * area / 3.0
    be_static = np.tile(src[:, None], (1, 3))

    b_extra = np.zeros(ntot, complex)
    # point currents: ref b -= 2r*0.01*J -> negated: += (pack stores
    # 0.01*J without the loop factor; apply it here)
    pp_idx = (mesh.node_markers & 0xFFFF).astype(np.int64) - 2
    for i in range(mesh.num_nodes):
        j = pp_idx[i]
        if 0 <= j < len(problem.nodeproplist):
            pp = problem.nodeproplist[j]
            if pp.J != 0:
                b_extra[pk.ridx[i]] += 2.0 * pk.xy[i, 0] * 0.01 * pp.J \
                    * pk.rsign[i]
    for k in case2_ids:
        amps = complex(pk.circuits[k].Amps)
        b_extra[case2_slot[k]] -= 2.0 * 0.01 * amps
    for e in range(T):
        ci = pk.circuit[e]
        if ci >= 0 and case[ci] == 2:
            # ref b[cdof] += (-2R J a/3)/R per corner -> negated
            b_extra[case2_slot[ci]] += 3.0 * (2.0 * Jc_block[e]
                                              * area[e] / 3.0)

    c2_blocks = []
    if case2_ids:
        sel = [e for e in range(T)
               if pk.circuit[e] >= 0 and case[pk.circuit[e]] == 2]
        idx = np.zeros((len(sel), 4), np.int64)
        sgn = np.ones((len(sel), 4))
        matsb = np.zeros((len(sel), 4, 4), complex)
        for row, e in enumerate(sel):
            ci = pk.circuit[e]
            idx[row, :3] = pk.ridx[pk.tris[e]]
            sgn[row, :3] = pk.rsign[pk.tris[e]]
            idx[row, 3] = case2_slot[ci]
            K = 2j * area[e] * w * sigma_raw[e] * c
            matsb[row, :3, 3] = K / 3.0
            matsb[row, 3, :3] = K / 3.0
            matsb[row, 3, 3] = K / R[e]
        c2_blocks.append(ElementBlock(idx=idx, sign=sgn, mat=matsb))

    nonlinear = any(mats[labels[i].BlockType].BHpoints > 0 for i in pk.lbl)
    bh = {}
    for i in set(int(x) for x in pk.blk):
        if mats[i].BHpoints > 0:
            bh[i] = mats[i].knot_arrays_complex()

    V = np.zeros(ntot, complex)
    relax = 1.0
    res = 0.0
    lastres = 0.0
    iters_total = 0
    rel_resid = 0.0

    dsess = None
    dof_coords_c = None
    if devices and not case2_ids:
        from ..parallel.driver import DistributedSession
        dsess = DistributedSession(devices, mesh=device_mesh,
                                   schwarz=False)
        dof_coords_c = np.zeros((ntot, 2))
        dof_coords_c[pk.ridx] = pk.xy

    for it in range(max_newton if nonlinear else 1):
        Mn = np.zeros((T, 3, 3), complex)
        be = be_static.copy()
        if it > 0:
            Vl = (pk.rsign[pk.tris] * V[pk.ridx[pk.tris]]).astype(complex)
            vv_vec = np.einsum("tjw,tw->tj", (Mx + My).astype(complex), Vl)
            dv_en = np.einsum("tj,tj->t", np.conj(Vl), vv_vec) \
                * (1e4 * c * c / vol)
            B = np.sqrt(np.abs(dv_en))
            for bi, (Bd, Hd, Sl) in bh.items():
                elsel = (pk.blk == bi)
                Bm = B[elsel]
                h, dh = _hermite_complex(Bm, Bd, Hd, Sl)
                Bm_safe = np.where(Bm == 0, 1.0, Bm)
                v = np.where(Bm == 0, Sl[0], h / Bm_safe)
                murel = 1.0 / (MU0 * v)
                muinc = 1.0 / (MU0 * dh)
                K = 2.0 * murel * muinc / (murel + muinc)
                mu1[elsel] = K
                mu2[elsel] = K
                Kn = -(1.0 / murel - 1.0 / K)
                Mn[elsel] = Kn[:, None, None] * (Mx + My)[elsel]
            be = be + np.einsum("tjk,tk->tj", Mn, Vl)

        Me = (Mx / mu2[:, None, None] + My / mu1[:, None, None] - M_eddy)
        blocks = [ElementBlock(idx=pk.ridx[pk.tris],
                               sign=pk.rsign[pk.tris], mat=-Me)]
        if pk.robin:
            # pack already folded the 2r loop factor into c0/c1
            idx = np.array([[pk.ridx[a], pk.ridx[b]]
                            for (a, b), *_ in pk.robin])
            sgn = np.array([[pk.rsign[a], pk.rsign[b]]
                            for (a, b), *_ in pk.robin])
            mb = np.zeros((len(pk.robin), 2, 2), complex)
            for i, (_, length, c0, c1, mult) in enumerate(pk.robin):
                Km = -0.0001 * c * complex(c0) * length / 6.0
                mb[i] = -mult * Km * np.array([[2.0, 1.0], [1.0, 2.0]])
            blocks.append(ElementBlock(idx=idx, sign=sgn, mat=mb))
        if pk.ssd:
            idx = np.array([[pk.ridx[a], pk.ridx[b]]
                            for (a, b), *_ in pk.ssd])
            sgn = np.array([[pk.rsign[a], pk.rsign[b]]
                            for (a, b), *_ in pk.ssd])
            mb = np.zeros((len(pk.ssd), 2, 2), complex)
            for i, ((a, bb), length, Sig, Mu, mult) in enumerate(pk.ssd):
                r = (pk.xy[a, 0] + pk.xy[bb, 0]) / 2.0
                ds = math.sqrt(2.0 / (0.4 * PI * w * Sig * Mu))
                Km = (1 + 1j) / (-ds * Mu * 100.0) * (2.0 * r * length / 6.0)
                mb[i] = -mult * Km * np.array([[2.0, 1.0], [1.0, 2.0]])
            blocks.append(ElementBlock(idx=idx, sign=sgn, mat=mb))
        blocks.extend(c2_blocks)

        b = np.zeros(ntot, complex)
        flat_idx = pk.ridx[pk.tris].reshape(-1)
        flat_sgn = pk.rsign[pk.tris].reshape(-1)
        np.add.at(b, flat_idx, -flat_sgn * be.reshape(-1))
        b = b + b_extra
        for (a, bb), length, c0, c1, mult in pk.robin:
            Kb = (complex(c1) * length / 2.0) * 0.0001 * mult
            b[pk.ridx[a]] += -pk.rsign[a] * Kb
            b[pk.ridx[bb]] += -pk.rsign[bb] * Kb

        V_old = V
        if dsess is not None:
            V, rel_resid, cg_iters = dsess.solve_complex(
                blocks, b, fixed_mask, fixed_vals, problem.Precision,
                x0=V if it > 0 else None, coords=dof_coords_c)
        else:
            V, rel_resid, cg_iters = solver.solve_complex(
                blocks, b, fixed_mask, fixed_vals, problem.Precision,
                x0=V if it > 0 else None)
        V = np.asarray(V)
        iters_total += int(cg_iters)

        if not nonlinear:
            break
        num = float(np.sum(np.abs(V[:pk.nreduced]
                                  - V_old[:pk.nreduced]) ** 2))
        den = float(np.sum(np.abs(V[:pk.nreduced]) ** 2))
        if den == 0:
            break
        lastres = res
        res = math.sqrt(num / den)
        if it > 5:
            if res > lastres and relax > 0.1:
                relax /= 2.0
            else:
                relax += 0.1 * (1.0 - relax)
            V = relax * V + (1.0 - relax) * V_old
        if res < 100.0 * problem.Precision and it > 0:
            break

    Vfull = V[pk.ridx] * pk.rsign
    A = Vfull * c * 2.0 * PI * pk.xy[:, 0] * 0.01
    for k in case2_ids:
        circdV[k] = 1j * w * c * 0.01 * V[case2_slot[k]]

    label_case = np.zeros((len(labels), 2), complex)
    seen = dict(zip(pk.lbl.tolist(), pk.circuit.tolist()))
    for k in range(len(labels)):
        ci = seen.get(k, -1)
        if ci < 0:
            label_case[k] = (1, 0.0)
        elif case[ci] == 1:
            label_case[k] = (1, circJ[ci])
        else:
            label_case[k] = (0, circdV[ci])

    return MagSolution(problem=problem, mesh=mesh, A=A,
                       circuits=pk.circuits, label_case=label_case,
                       iterations=iters_total, residual=float(rel_resid))
