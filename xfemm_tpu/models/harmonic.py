"""Time-harmonic (AC) planar magnetics with eddy currents.

Functional equivalent of the reference's ``FSolver::Harmonic2D``
(cfemm/fsolver/harmonic2d.cpp:38-890): complex-valued vector potential,
frequency-dependent effective permeability for laminations (mu tanh(K)/K
with skin-depth K) and hysteresis lag angles, consistent eddy-current mass
term -j*w*sigma*a*c/12, small-skin-depth impedance boundaries, proximity-
effect permeability for wound regions (fsolver.cpp:1083 GetFillFactor),
and circuit Case 2: per-circuit voltage-gradient DOFs appended after the
node DOFs, coupled through -j*w*sigma*c terms with a total-current RHS.

Sign convention: the reference's harmonic global system is the negative
of its DC one; this module negates it back so the element blocks and RHS
scatter reuse the planar DC machinery (_element_blocks/_rhs semantics).
The nonlinear path is the reference's default successive approximation
(ACSolver==0) with mu averaged from the doctored AC B-H curve.
"""

from __future__ import annotations

import cmath
import math

import numpy as np

from ..constants import C_APOT, DEG, MU0, PI, ProblemType
from ..geometry.problem import BdryFormat, Problem
from ..mesh.meshdata import MeshData
from ..ops import assembly, solver
from ..ops.solver import ElementBlock
from .magnetostatics import MagSolution, age_blocks, pack


def _hermite_complex(B, Bd, Hd, Sl):
    """Complex cubic-Hermite H(B) and dH/dB on doctored AC knots
    (CMaterialProp::GetH semantics with complex Hdata/slope)."""
    k = np.searchsorted(Bd, B, side="right") - 1
    k = np.clip(k, 0, len(Bd) - 2)
    B0, B1 = Bd[k], Bd[k + 1]
    H0, H1 = Hd[k], Hd[k + 1]
    s0, s1 = Sl[k], Sl[k + 1]
    l = B1 - B0
    z = (B - B0) / l
    z2 = z * z
    h = ((1 - 3 * z2 + 2 * z2 * z) * H0
         + z * (1 - 2 * z + z2) * l * s0
         + z2 * (3 - 2 * z) * H1
         + z2 * (z - 1) * l * s1)
    dh = (6 * z * (z - 1) * H0 / l
          + (1 - 4 * z + 3 * z2) * s0
          + 6 * z * (1 - z) * H1 / l
          + z * (3 * z - 2) * s1)
    # beyond the last knot: linear extension with the final slope
    out = B > Bd[-1]
    h = np.where(out, Hd[-1] + Sl[-1] * (B - Bd[-1]), h)
    dh = np.where(out, Sl[-1] + 0 * dh, dh)
    return h, dh


def _proximity_mu(problem: Problem, lab, mat, atot: float) -> complex:
    """GetFillFactor's frequency-dependent wound-region permeability
    (fsolver.cpp:1083-1196)."""
    if problem.Frequency == 0 or mat.LamType < 3:
        return 1.0
    if atot == 0 or mat.Cduct == 0:
        return 1.0
    wiretype = mat.LamType - 3
    W = 2.0 * PI * problem.Frequency
    if wiretype == 3:                    # rectangular wire
        d = mat.WireD * 0.001
        fill = abs(d * d * lab.Turns / atot)
        dd = d / math.sqrt(fill)
        fill = d / dd
        o = mat.Cduct * (d / dd) * 1e6
        k = cmath.sqrt(1j * W * o * MU0) * d / 2.0
        ufd = MU0 * cmath.tanh(k) / k
        return (fill * ufd + (1.0 - fill) * MU0) / MU0
    if wiretype == 0:
        R = mat.WireD * 0.0005
        awire = PI * R * R * mat.NStrands * lab.Turns
    elif wiretype == 1:
        R = mat.WireD * 0.0005 * math.sqrt(mat.NStrands)
        awire = PI * R * R * lab.Turns
    elif wiretype == 2:
        R = mat.WireD * 0.0005
        awire = PI * R * R * mat.NStrands * lab.Turns
    else:
        R = mat.WireD * 0.0005
        awire = PI * R * R * mat.NStrands * lab.Turns
    fill = abs(awire / atot)
    o = mat.Cduct * 1e6
    W = 2.0 * PI * problem.Frequency * o * MU0 * R * R / 2.0
    if wiretype in (0, 1, 2):
        c1 = 0.7756067409818643 + fill * (0.6873854335408803 + fill * (
            0.06841584481674128 - 0.07143732702512284 * fill))
        c2 = 1.5 * fill / c1
    elif wiretype == 4:                  # 10% CCA
        c1 = 0.7270741505617485 + 0.8902950067721367 * fill \
            + 0.11894736885885195 * fill ** 2 - 0.12247276254503957 * fill ** 3
        c2 = 0.006784920229549677 + 1.8942880489198526 * fill \
            - 1.3631438759519217 * fill ** 2 + 0.504431701685587 * fill ** 3
    else:                                # 15% CCA
        c1 = 0.7486913529860821 + 0.9042845510838825 * fill \
            + 0.1361040321433224 * fill ** 2 - 0.10652380745682069 * fill ** 3
        c2 = 0.006790468527313965 + 1.8945509985370095 * fill \
            - 1.3643501010185972 * fill ** 2 + 0.5036765577982594 * fill ** 3
    sq = cmath.sqrt(c1 * 1j * W)
    return c2 * (cmath.tanh(sq) / sq) + (1.0 - c2)


def _effective_mu(problem: Problem, mat) -> tuple[complex, complex]:
    """Per-blockprop effective permeability: hysteresis lag + laminated
    skin-depth correction (harmonic2d.cpp:176-215)."""
    w = problem.Frequency * 2.0 * PI
    if mat.LamType != 0:
        return 1.0, 1.0
    mux = mat.mu_x * cmath.exp(-1j * mat.Theta_hx * DEG)
    muy = mat.mu_y * cmath.exp(-1j * mat.Theta_hy * DEG)
    if mat.Lam_d != 0:
        f = mat.LamFill
        if mat.Cduct != 0:
            deg45 = 1 + 1j
            half = cmath.exp(-1j * mat.Theta_hx * DEG / 2.0)
            ds = math.sqrt(2.0 / (0.4 * PI * w * mat.Cduct * mat.mu_x))
            K = half * deg45 * mat.Lam_d * 0.001 / (2.0 * ds)
            mux = (mux * cmath.tanh(K) / K) * f + (1.0 - f)
            half = cmath.exp(-1j * mat.Theta_hy * DEG / 2.0)
            ds = math.sqrt(2.0 / (0.4 * PI * w * mat.Cduct * mat.mu_y))
            K = half * deg45 * mat.Lam_d * 0.001 / (2.0 * ds)
            muy = (muy * cmath.tanh(K) / K) * f + (1.0 - f)
        else:
            mux = mux * f + (1.0 - f)
            muy = muy * f + (1.0 - f)
    return mux, muy


def solve(problem: Problem, mesh: MeshData,
          max_newton: int = 100, Aprev=None, devices: int | None = None,
          device_mesh=None) -> MagSolution:
    """``devices=N`` runs the complex-symmetric solves distributed on an
    N-device mesh ((re,im) pairs + halo exchange, parallel/driver.py).
    Problems with circuit Case-2 voltage-gradient DOFs keep the
    single-chip path: those bordered rows couple densely to every
    element of their winding, which a 1-D slab halo cannot carry (the
    reference solves them inside the same matrix, cspars.cpp; here they
    would need a Schur complement over the few circuit DOFs)."""
    assert problem.ProblemType == ProblemType.PLANAR, \
        "harmonic axisymmetric in models/harmonicaxi.py"
    assert problem.Frequency != 0
    if Aprev is None and problem.PrevSoln:
        from .magnetostatics import load_previous
        Aprev = load_previous(problem, mesh)
    pk = pack(problem, mesh)
    c = C_APOT
    w = problem.Frequency * 2.0 * PI
    geom = assembly.tri_geometry(pk.xy, pk.tris)
    Mx, My, Mxy = assembly.curl_matrices(geom)
    T = pk.tris.shape[0]
    area = np.asarray(geom.area)
    labels = [l for l in problem.labellist if not l.is_hole()]
    mats = problem.blockproplist

    for m in mats:
        if m.BHpoints > 0 and not m.slope:
            if problem.PrevSoln:
                m.prepare_incremental(w, problem.PrevType)
            else:
                m.get_slopes(w)

    if any(mats[labels[i].BlockType].LamType in (1, 2) for i in pk.lbl):
        raise ValueError("On-edge lamination not supported in AC analyses")

    # per-label wound/proximity data (GetFillFactor); element areas in
    # m^2 (coords are cm -> 1e-4)
    atot = np.zeros(len(labels))
    np.add.at(atot, pk.lbl, np.abs(area) * 1e-4)
    is_wound = np.zeros(len(labels), bool)
    prox_mu = np.ones(len(labels), complex)
    for k, lab in enumerate(labels):
        mat = mats[lab.BlockType]
        is_wound[k] = abs(lab.Turns) > 1 or mat.LamType > 2
        prox_mu[k] = _proximity_mu(problem, lab, mat, atot[k])

    el_wound = is_wound[pk.lbl]

    # circuit case selection (harmonic2d.cpp:95-168)
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
                i2[ci] += area[e] * sigma_circ[e]
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

    # effective permeability per block property
    eff_mu = [_effective_mu(problem, m) for m in mats]

    # per-element initial mu (Iter==0): eff_mu, overridden by proximity
    # for wound LamType>2 regions (harmonic2d.cpp:664-668)
    mu1 = np.array([eff_mu[labels[i].BlockType][0] for i in pk.lbl])
    mu2 = np.array([eff_mu[labels[i].BlockType][1] for i in pk.lbl])
    prox_el = prox_mu[pk.lbl]
    lam_gt2 = np.array([mats[labels[i].BlockType].LamType > 2
                        for i in pk.lbl])
    mu1 = np.where(lam_gt2, prox_el, mu1)
    mu2 = np.where(lam_gt2, prox_el, mu2)

    # eddy conductivity: zero for wound coils and in-plane laminated
    # blocks (harmonic2d.cpp:481-489)
    lam_inplane = np.array([
        mats[labels[i].BlockType].LamType == 0
        and mats[labels[i].BlockType].Lam_d > 0 for i in pk.lbl])
    sigma_eddy = np.where(el_wound | lam_inplane, 0.0, sigma_raw)
    eddy_K = 1j * area * w * sigma_eddy * c / 12.0   # negated ref (-I..)
    ones_eye = np.ones((3, 3)) + np.eye(3)
    M_eddy = eddy_K[:, None, None] * ones_eye[None]

    # fixed DOFs (complex values), extended with case-2 slots (free)
    fixed_mask = np.zeros(ntot, bool)
    fixed_mask[:pk.nreduced] = pk.fixed_mask
    fixed_vals = np.zeros(ntot, complex)
    fixed_vals[:pk.nreduced] = pk.fixed_vals_c

    # static RHS: sources -(J + Jv) a/3 per corner (reference uses the
    # raw blockprop Cduct for Case 0, harmonic2d.cpp:526-533)
    Jv = np.zeros(T, complex)
    for e in range(T):
        ci = pk.circuit[e]
        if ci >= 0:
            if case[ci] == 1:
                Jv[e] = circJ[ci]
            elif case[ci] == 0:
                Jv[e] = -circdV[ci] * sigma_raw[e]
    src = -(Jc_block + Jv) * area / 3.0
    be_static = np.tile(src[:, None], (1, 3))

    # rhs extras: point currents (+0.01 J, negated ref), case-2 current
    # constraints and element-source sums
    b_extra = np.zeros(ntot, complex)
    b_extra[:pk.nreduced] = pk.b_extra_c
    for k in case2_ids:
        amps = complex(pk.circuits[k].Amps)
        b_extra[case2_slot[k]] -= 0.01 * amps
        # element source contributions: ref adds be[j] (3x src) per elem
    for e in range(T):
        ci = pk.circuit[e]
        if ci >= 0 and case[ci] == 2:
            b_extra[case2_slot[ci]] += -3.0 * (-(Jc_block[e]) * area[e] / 3.0)

    # case-2 coupling blocks: nodes couple to the circuit DOF with
    # +j w sigma c /3, circuit diagonal +j w sigma c (negated ref)
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
            K = 1j * area[e] * w * sigma_raw[e] * c
            matsb[row, :3, 3] = K / 3.0
            matsb[row, 3, :3] = K / 3.0
            matsb[row, 3, 3] = K
        c2_blocks.append(ElementBlock(idx=idx, sign=sgn, mat=matsb))

    # nonlinear AC B-H tables (doctored curves)
    nonlinear = any(mats[labels[i].BlockType].BHpoints > 0 for i in pk.lbl)
    Mxy_v12 = 0.0
    if Aprev is not None and nonlinear:
        # AC incremental/frozen permeability about the DC offset
        # (harmonic2d.cpp:566-590): B-H elements become linear with a
        # complex tensor permeability
        from .magnetostatics import prev_element_B
        B1p, B2p = prev_element_B(problem, mesh, Aprev)
        v12 = np.zeros(T, complex)
        frozen = problem.PrevType == 2
        for t in np.nonzero(np.array(
                [mats[labels[i].BlockType].BHpoints > 0
                 for i in pk.lbl]))[0]:
            mat = mats[labels[pk.lbl[t]].BlockType]
            B = math.hypot(B1p[t], B2p[t])
            muinc, murel = mat.incremental_permeability_ac(B, w)
            if B == 0:
                mu1[t] = mu2[t] = muinc
            elif frozen:
                mu1[t] = mu2[t] = murel
            else:
                b1s, b2s = B1p[t] ** 2, B2p[t] ** 2
                B2 = B * B
                mu1[t] = B2 * muinc * murel / (b1s * murel + b2s * muinc)
                mu2[t] = B2 * muinc * murel / (b1s * muinc + b2s * murel)
                v12[t] = -B1p[t] * B2p[t] * (murel - muinc) \
                    / (B2 * murel * muinc)
        Mxy_v12 = Mxy * v12[:, None, None]
        nonlinear = False
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

    from ..utils import profiling
    for it in range(max_newton if nonlinear else 1):
        _ph = profiling.phase("ac elements")
        _ph.__enter__()
        Mn = np.zeros((T, 3, 3), complex)
        be = be_static.copy()
        if it > 0:
            Vl = (pk.rsign[pk.tris] *
                  V[pk.ridx[pk.tris]]).astype(complex)
            B1 = np.sum(Vl * geom.q, axis=1)
            B2 = np.sum(Vl * geom.p, axis=1)
            B = c * np.sqrt(np.abs(B1 * np.conj(B1))
                            + np.abs(B2 * np.conj(B2))) / (0.02 * area)
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

        Me = (Mx / mu2[:, None, None] + My / mu1[:, None, None] - M_eddy
              + Mxy_v12)
        # NOTE: M_eddy subtracts because _element_blocks negates Me and
        # the mass term must stay +j w sigma c/12 in the global matrix
        blocks = [ElementBlock(idx=pk.ridx[pk.tris],
                               sign=pk.rsign[pk.tris], mat=-Me)]
        # Robin and small-skin-depth impedance edges (complex)
        if pk.robin:
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
            for i, (_, length, Sig, Mu, mult) in enumerate(pk.ssd):
                ds = math.sqrt(2.0 / (0.4 * PI * w * Sig * Mu))
                Km = (1 + 1j) / (-ds * Mu * 100.0) * (length / 6.0)
                mb[i] = -mult * Km * np.array([[2.0, 1.0], [1.0, 2.0]])
            blocks.append(ElementBlock(idx=idx, sign=sgn, mat=mb))
        for nn, age_m in pk.age:
            blocks.append(ElementBlock(idx=pk.ridx[nn], sign=pk.rsign[nn],
                                       mat=age_m.astype(complex)))
        blocks.extend(c2_blocks)
        # pad node-block indices into the extended DOF space: indices are
        # already valid (case-2 slots only in c2_blocks)

        b = np.zeros(ntot, complex)
        flat_idx = pk.ridx[pk.tris].reshape(-1)
        flat_sgn = pk.rsign[pk.tris].reshape(-1)
        np.add.at(b, flat_idx, -flat_sgn * be.reshape(-1))
        b = b + b_extra
        for (a, bb), length, c0, c1, mult in pk.robin:
            Kb = (complex(c1) * length / 2.0) * 0.0001 * mult
            b[pk.ridx[a]] += -pk.rsign[a] * Kb
            b[pk.ridx[bb]] += -pk.rsign[bb] * Kb

        _ph.__exit__(None, None, None)
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
        num = float(np.sum(np.abs(V[:pk.nreduced] - V_old[:pk.nreduced]) ** 2))
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

    # solution: A = c*V (complex); case-2 voltage gradients
    Vfull = V[pk.ridx] * pk.rsign
    A = Vfull * c
    for k in case2_ids:
        circdV[k] = 1j * c * w * V[case2_slot[k]]

    # per-label circuit results (WriteHarmonic2D:969-994): (case, value)
    label_case = np.zeros((len(labels), 2), complex)
    for k, lab in enumerate(labels):
        ci = -1
        for e in range(T):
            if pk.lbl[e] == k:
                ci = pk.circuit[e]
                break
        if ci < 0:
            label_case[k] = (1, 0.0)
        elif case[ci] == 0:
            label_case[k] = (0, circdV[ci])
        elif case[ci] == 1:
            label_case[k] = (1, circJ[ci])
        else:
            label_case[k] = (0, circdV[ci])

    return MagSolution(problem=problem, mesh=mesh, A=A,
                       circuits=pk.circuits, label_case=label_case,
                       iterations=iters_total, residual=float(rel_resid))
