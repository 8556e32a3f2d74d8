"""Nonlinear 2-D magnetostatics solver (planar), TPU-native.

Functional equivalent of the reference's ``FSolver::Static2D``
(cfemm/fsolver/static2d.cpp:53-1033): same unit conventions (coordinates in
cm, scaled potential ``V = A / c`` with ``c = 4e-5*pi``), same circuit
preprocessing, magnetization/current sources, boundary conditions, Newton
matrices, and adaptive relaxation -- but as batched device arrays: element
assembly is one fused set of (T,3,3) einsums, the linear solve is the
matrix-free Jacobi-PCG of ops/solver.py, and periodic/antiperiodic
constraints are folded into a prolongation (index+sign) map built on host
instead of mutating matrix rows.
"""

from __future__ import annotations

import cmath
import math
import os
from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from ..constants import C_APOT, DEG, LENGTH_TO_CM, MU0, PI, ProblemType, \
    CoordinateSystem
from ..geometry.problem import BdryFormat, Problem
from ..materials.magnetic import MagneticMaterial
from ..mesh.meshdata import MeshData
from ..ops import assembly, solver
from ..ops.solver import ElementBlock
from ..utils.luaexpr import eval_magdir


# ---------------------------------------------------------------------- #
# constraint prolongation                                                #
# ---------------------------------------------------------------------- #

def build_prolongation(n: int, pbc_pairs: np.ndarray):
    """Union-find with signs over (anti)periodic node pairs.

    Returns (ridx, rsign, nreduced): full node -> reduced DOF index and
    +-1 sign, replicating the row/column folding of spars.cpp:366-474 via
    a master/slave map (exact for the converged solution).
    """
    parent = np.arange(n)
    sign = np.ones(n, np.int8)

    def find(i):
        root = i
        s = 1
        while parent[root] != root:
            s *= sign[root]
            root = parent[root]
        # path compression
        j = i
        s2 = 1
        while parent[j] != j:
            nxt = parent[j]
            snxt = sign[j]
            parent[j] = root
            sign[j] = s
            s = s // snxt if snxt in (1, -1) else s
            # recompute properly below
            j = nxt
        return root

    # simple two-pass find without fancy compression (n is small enough)
    def find_with_sign(i):
        s = 1
        while parent[i] != i:
            s *= sign[i]
            i = parent[i]
        return i, s

    for a, b, t in pbc_pairs:
        ra, sa = find_with_sign(int(a))
        rb, sb = find_with_sign(int(b))
        rel = -1 if t else 1  # value[a] = rel * value[b]
        if ra == rb:
            continue
        # attach rb under ra: value[rb] = sign_rb_to_ra * value[ra]
        # value[a] = sa*value[ra]; value[b] = sb*value[rb]
        # constraint: sa*value[ra] = rel * sb * value[rb]
        parent[rb] = ra
        sign[rb] = rel * sa * sb  # value[rb] = (sa/ (rel*sb)) ... signs are +-1
    ridx = np.zeros(n, np.int64)
    rsign = np.zeros(n, np.float64)
    roots = {}
    for i in range(n):
        r, s = find_with_sign(i)
        if r not in roots:
            roots[r] = len(roots)
        ridx[i] = roots[r]
        rsign[i] = s
    return ridx, rsign, len(roots)


# ---------------------------------------------------------------------- #
# air gap element matrix                                                 #
# ---------------------------------------------------------------------- #

def age_matrix(ci: float, co: float, K: float) -> np.ndarray:
    """10x10 air-gap quad element stiffness in the shift parameters
    (ci, co), transcribed from static2d.cpp:220-274. ``K = dr/(R*dtta)``,
    with the reference's normalization applied by the caller."""
    Ki = 1.0 / K
    P = lambda x, n: x ** n
    MG = np.zeros((10, 10))
    MG[0][0] = (5*P(-1 + ci,2)*P(ci,4)*(K + Ki))/48.
    MG[0][1] = -((-1 + ci)*P(ci,3)*(5*(-1 + ci*(-5 + 4*ci))*K + (-5 + ci*(-19 + 14*ci))*Ki))/48.
    MG[0][2] = ((-1 + ci)*P(ci,2)*(5*(2 + ci*(-1 - 9*ci + 6*P(ci,2)))*K + (10 + ci*(1 + 3*ci*(-7 + 4*ci)))*Ki))/48.
    MG[0][3] = -(P(-1 + ci,2)*P(ci,2)*(5*(-2 + ci*(-3 + 4*ci))*K + (2 + ci*(-3 + 2*ci))*Ki))/48.
    MG[0][4] = (P(-1 + ci,3)*P(ci,3)*(5*K - Ki))/48.
    MG[0][5] = ((-1 + ci)*P(ci,2)*(-1 + co)*P(co,2)*(K - 5*Ki))/48.
    MG[0][6] = -((-1 + ci)*P(ci,2)*co*((-1 + co*(-5 + 4*co))*K + (5 + (19 - 14*co)*co)*Ki))/48.
    MG[0][7] = ((-1 + ci)*P(ci,2)*((2 + co*(-1 - 9*co + 6*P(co,2)))*K - (10 + co*(1 + 3*co*(-7 + 4*co)))*Ki))/48.
    MG[0][8] = -((-1 + ci)*P(ci,2)*(-1 + co)*((-2 + co*(-3 + 4*co))*K + (-2 + (3 - 2*co)*co)*Ki))/48.
    MG[0][9] = ((-1 + ci)*P(ci,2)*P(-1 + co,2)*co*(K + Ki))/48.
    MG[1][1] = (P(ci,2)*(5*P(1 + (5 - 4*ci)*ci,2)*K + (5 + ci*(38 + ci*(49 + 4*ci*(-29 + 11*ci))))*Ki))/48.
    MG[1][2] = (-5*ci*(-1 + 2*ci)*(-2 + 3*(-1 + ci)*ci)*(-1 + ci*(-5 + 4*ci))*K + ci*(10 + ci*(39 - ci*(50 + ci*(85 + 6*ci*(-23 + 8*ci)))))*Ki)/48.
    MG[1][3] = ((-1 + ci)*ci*(5*(2 + ci*(13 + ci*(3 + 16*(-2 + ci)*ci)))*K + (-2 + 5*ci*(1 + ci*(3 + 4*(-2 + ci)*ci)))*Ki))/48.
    MG[1][4] = -(P(-1 + ci,2)*P(ci,2)*(5*(-1 + ci*(-5 + 4*ci))*K + Ki + ci*(-1 + 2*ci)*Ki))/48.
    MG[1][5] = -(ci*(-1 + co)*P(co,2)*((-1 + ci*(-5 + 4*ci))*K + (5 + (19 - 14*ci)*ci)*Ki))/48.
    MG[1][6] = (ci*co*((-1 + ci*(-5 + 4*ci))*(-1 + co*(-5 + 4*co))*K + (-5 + ci*(-19 + 14*ci) - 19*co + ci*(-77 + 58*ci)*co + 2*(7 + (29 - 22*ci)*ci)*P(co,2))*Ki))/48.
    MG[1][7] = (-(ci*(-1 + ci*(-5 + 4*ci))*(2 + co*(-1 - 9*co + 6*P(co,2)))*K) + ci*(-10 + co*(-1 + 3*(7 - 4*co)*co) + ci*(-38 + co + 99*P(co,2) - 60*P(co,3)) + P(ci,2)*(28 + 2*co*(-1 + 3*co*(-13 + 8*co))))*Ki)/48.
    MG[1][8] = (ci*(-1 + co)*((-1 + ci*(-5 + 4*ci))*(-2 + co*(-3 + 4*co))*K + (2 + co*(-3 + 2*co) + P(ci,2)*(4 + 2*(9 - 10*co)*co) + ci*(-2 + co*(-21 + 22*co)))*Ki))/48.
    MG[1][9] = -(ci*P(-1 + co,2)*co*((-1 + ci*(-5 + 4*ci))*K + (-1 + ci - 2*P(ci,2))*Ki))/48.
    MG[2][2] = (5*P(-2 + ci + 9*P(ci,2) - 6*P(ci,3),2)*K + (20 + (-1 + ci)*ci*(-4 + 3*(-1 + ci)*ci*(-25 + 24*(-1 + ci)*ci)))*Ki)/48.
    MG[2][3] = (-5*(4 + P(ci,2)*(-33 + ci*(18 + ci*(65 + 6*ci*(-13 + 4*ci)))))*K + (4 + P(ci,2)*(39 - ci*(30 + ci*(115 + 6*ci*(-25 + 8*ci)))))*Ki)/48.
    MG[2][4] = (P(-1 + ci,2)*ci*(5*(2 + ci*(-1 - 9*ci + 6*P(ci,2)))*K + (-2 + ci*(-5 + 3*ci*(-5 + 4*ci)))*Ki))/48.
    MG[2][5] = ((-1 + co)*P(co,2)*((2 + ci*(-1 - 9*ci + 6*P(ci,2)))*K - (10 + ci*(1 + 3*ci*(-7 + 4*ci)))*Ki))/48.
    MG[2][6] = (-((2 + ci*(-1 - 9*ci + 6*P(ci,2)))*co*(-1 + co*(-5 + 4*co))*K) + co*(-10 - 38*co + 28*P(co,2) + P(ci,2)*(21 + 99*co - 78*P(co,2)) + ci*(-1 + co - 2*P(co,2)) + 12*P(ci,3)*(-1 + co*(-5 + 4*co)))*Ki)/48.
    MG[2][7] = ((2 + ci*(-1 - 9*ci + 6*P(ci,2)))*(2 + co*(-1 - 9*co + 6*P(co,2)))*K - (2*(10 + co) + 6*P(co,2)*(-7 + 4*co) + 3*P(ci,2)*(-14 + co*(5 + (55 - 36*co)*co)) + ci*(2 + co*(5 + 3*(5 - 4*co)*co)) + 12*P(ci,3)*(2 + co*(-1 - 9*co + 6*P(co,2))))*Ki)/48.
    MG[2][8] = (-((2 + ci*(-1 - 9*ci + 6*P(ci,2)))*(2 + co - 7*P(co,2) + 4*P(co,3))*K) + (-1 + co)*(4 + 2*ci*(5 + 3*(5 - 4*ci)*ci) + 3*(-2 + ci*(3 + (17 - 12*ci)*ci))*co + 2*(2 + ci*(-7 + 3*ci*(-11 + 8*ci)))*P(co,2))*Ki)/48.
    MG[2][9] = (P(-1 + co,2)*co*((2 + ci*(-1 - 9*ci + 6*P(ci,2)))*K + (2 + ci*(5 + 3*(5 - 4*ci)*ci))*Ki))/48.
    MG[3][3] = (P(-1 + ci,2)*(5*P(2 + (3 - 4*ci)*ci,2)*K + (20 + ci*(36 + ci*(-35 - 60*ci + 44*P(ci,2))))*Ki))/48.
    MG[3][4] = -(P(-1 + ci,3)*ci*(5*(-2 + ci*(-3 + 4*ci))*K + (-10 + ci*(-9 + 14*ci))*Ki))/48.
    MG[3][5] = -((-1 + ci)*(-1 + co)*P(co,2)*((-2 + ci*(-3 + 4*ci))*K + (-2 + (3 - 2*ci)*ci)*Ki))/48.
    MG[3][6] = ((-1 + ci)*co*((-2 + ci*(-3 + 4*ci))*(-1 + co*(-5 + 4*co))*K + (2 + ci*(-3 + 2*ci) - 2*co + ci*(-21 + 22*ci)*co + 2*(2 + (9 - 10*ci)*ci)*P(co,2))*Ki))/48.
    MG[3][7] = (-((2 + ci - 7*P(ci,2) + 4*P(ci,3))*(2 + co*(-1 - 9*co + 6*P(co,2)))*K) + (-1 + ci)*(4 + 2*co*(5 + 3*(5 - 4*co)*co) + ci*(-6 + 3*co*(3 + (17 - 12*co)*co)) + 2*P(ci,2)*(2 + co*(-7 + 3*co*(-11 + 8*co))))*Ki)/48.
    MG[3][8] = ((-1 + ci)*(-1 + co)*((-2 + ci*(-3 + 4*ci))*(-2 + co*(-3 + 4*co))*K + (-20 + 3*ci*(1 + 2*co)*(-6 + 5*co) + 2*co*(-9 + 14*co) + P(ci,2)*(28 + 30*co - 44*P(co,2)))*Ki))/48.
    MG[3][9] = -((-1 + ci)*P(-1 + co,2)*co*((-2 + ci*(-3 + 4*ci))*K + (10 + (9 - 14*ci)*ci)*Ki))/48.
    MG[4][4] = (5*P(-1 + ci,4)*P(ci,2)*(K + Ki))/48.
    MG[4][5] = (P(-1 + ci,2)*ci*(-1 + co)*P(co,2)*(K + Ki))/48.
    MG[4][6] = -(P(-1 + ci,2)*ci*co*((-1 + co*(-5 + 4*co))*K + (-1 + co - 2*P(co,2))*Ki))/48.
    MG[4][7] = (P(-1 + ci,2)*ci*((2 + co*(-1 - 9*co + 6*P(co,2)))*K + (2 + co*(5 + 3*(5 - 4*co)*co))*Ki))/48.
    MG[4][8] = -(P(-1 + ci,2)*ci*(-1 + co)*((-2 + co*(-3 + 4*co))*K + (10 + (9 - 14*co)*co)*Ki))/48.
    MG[4][9] = (P(-1 + ci,2)*ci*P(-1 + co,2)*co*(K - 5*Ki))/48.
    MG[5][5] = (5*P(-1 + co,2)*P(co,4)*(K + Ki))/48.
    MG[5][6] = -((-1 + co)*P(co,3)*(5*(-1 + co*(-5 + 4*co))*K + (-5 + co*(-19 + 14*co))*Ki))/48.
    MG[5][7] = ((-1 + co)*P(co,2)*(5*(2 + co*(-1 - 9*co + 6*P(co,2)))*K + (10 + co*(1 + 3*co*(-7 + 4*co)))*Ki))/48.
    MG[5][8] = -(P(-1 + co,2)*P(co,2)*(5*(-2 + co*(-3 + 4*co))*K + (2 + co*(-3 + 2*co))*Ki))/48.
    MG[5][9] = (P(-1 + co,3)*P(co,3)*(5*K - Ki))/48.
    MG[6][6] = (P(co,2)*(5*P(1 + (5 - 4*co)*co,2)*K + (5 + co*(38 + co*(49 + 4*co*(-29 + 11*co))))*Ki))/48.
    MG[6][7] = (-5*co*(-1 + 2*co)*(-2 + 3*(-1 + co)*co)*(-1 + co*(-5 + 4*co))*K + co*(10 + co*(39 - co*(50 + co*(85 + 6*co*(-23 + 8*co)))))*Ki)/48.
    MG[6][8] = ((-1 + co)*co*(5*(2 + co*(13 + co*(3 + 16*(-2 + co)*co)))*K + (-2 + 5*co*(1 + co*(3 + 4*(-2 + co)*co)))*Ki))/48.
    MG[6][9] = -(P(-1 + co,2)*P(co,2)*(5*(-1 + co*(-5 + 4*co))*K + Ki + co*(-1 + 2*co)*Ki))/48.
    MG[7][7] = (5*P(-2 + co + 9*P(co,2) - 6*P(co,3),2)*K + (20 + (-1 + co)*co*(-4 + 3*(-1 + co)*co*(-25 + 24*(-1 + co)*co)))*Ki)/48.
    MG[7][8] = (-5*(4 + P(co,2)*(-33 + co*(18 + co*(65 + 6*co*(-13 + 4*co)))))*K + (4 + P(co,2)*(39 - co*(30 + co*(115 + 6*co*(-25 + 8*co)))))*Ki)/48.
    MG[7][9] = (P(-1 + co,2)*co*(5*(2 + co*(-1 - 9*co + 6*P(co,2)))*K + (-2 + co*(-5 + 3*co*(-5 + 4*co)))*Ki))/48.
    MG[8][8] = (P(-1 + co,2)*(5*P(2 + (3 - 4*co)*co,2)*K + (20 + co*(36 + co*(-35 - 60*co + 44*P(co,2))))*Ki))/48.
    MG[8][9] = -(P(-1 + co,3)*co*(5*(-2 + co*(-3 + 4*co))*K + (-10 + co*(-9 + 14*co))*Ki))/48.
    MG[9][9] = (5*P(-1 + co,4)*P(co,2)*(K + Ki))/48.
    # symmetrize (reference assembles upper triangle into symmetric storage)
    MG = MG + np.triu(MG, 1).T
    return MG


def age_blocks(mesh: MeshData):
    """Expand each air-gap element into (node-ids, weights, MG) batched
    arrays following the gather pattern of static2d.cpp:277-348."""
    blocks = []
    for age in mesh.airgaps:
        n = age.totalArcElements
        dt = (PI / 180.0) * (age.totalArcLength / n)
        K = 2.0 * (age.ro - age.ri) / (dt * (age.ro + age.ri))
        ci = age.InnerShift
        co = age.OuterShift
        if ci > co:
            ci, co = ci - co, 0.0
        else:
            ci, co = 1.0 - co + ci, 1.0
        MG = age_matrix(ci, co, K)
        qn = age.quad_nodes
        qw = age.quad_weights
        nn = np.zeros((n, 10), np.int64)
        ww = np.zeros((n, 10))
        for k in range(n):
            km1 = k - 1 if k - 1 >= 0 else n - 1
            kp2 = 1 if (k + 2) > n else k + 2
            nn[k] = [qn[km1][0], qn[k][0], qn[k][1], qn[k + 1][1], qn[kp2][1],
                     qn[km1][2], qn[k][2], qn[k][3], qn[k + 1][3], qn[kp2][3]]
            ww[k] = [qw[km1][0], qw[k][0], qw[k][1], qw[k + 1][1], qw[kp2][1],
                     qw[km1][2], qw[k][2], qw[k][3], qw[k + 1][3], qw[kp2][3]]
            if k == 0 and age.BdryFormat == 1:
                ww[k][0] = -ww[k][0]
                ww[k][5] = -ww[k][5]
            if k + 1 == n and age.BdryFormat == 1:
                ww[k][4] = -ww[k][4]
                ww[k][9] = -ww[k][9]
        mats = MG[None, :, :] * ww[:, :, None] * ww[:, None, :]
        blocks.append((nn, mats))
    return blocks


# ---------------------------------------------------------------------- #
# packing                                                                #
# ---------------------------------------------------------------------- #

@dataclass
class PackedMagnetostatic:
    """Host-built arrays for the device solve (planar magnetostatics)."""

    problem: Problem
    mesh: MeshData
    units: float                     # problem units -> cm
    xy: np.ndarray                   # (N,2) node coords in cm
    tris: np.ndarray                 # (T,3)
    ridx: np.ndarray                 # (N,) reduced DOF
    rsign: np.ndarray                # (N,)
    nreduced: int
    # element-gathered material data
    lbl: np.ndarray                  # (T,) label index
    blk: np.ndarray                  # (T,) material index
    mu_x: np.ndarray
    mu_y: np.ndarray
    lam_type: np.ndarray
    lam_fill: np.ndarray
    nonlinear: np.ndarray            # (T,) bool
    Jre: np.ndarray                  # block current density (real part)
    Jim: np.ndarray                  # block current density (imag part)
    Hc: np.ndarray
    magdir: np.ndarray               # degrees (functional dirs evaluated)
    Cduct: np.ndarray                # effective (0 if wound)
    circuit: np.ndarray              # (T,) expanded circuit index or -1
    # padded B-H tables gathered per element (Tn, K): only nonlinear rows
    bh_B: np.ndarray
    bh_H: np.ndarray
    bh_S: np.ndarray
    # boundary conditions
    fixed_mask: np.ndarray           # (nreduced,)
    fixed_vals: np.ndarray           # (nreduced,) in V units (A/c)
    b_extra: np.ndarray              # (nreduced,) point currents etc.
    fixed_vals_c: np.ndarray         # (nreduced,) complex (harmonic phases)
    b_extra_c: np.ndarray            # (nreduced,) complex point currents
    robin: list                      # [(nodes(2,), length, c0, c1, mult)]
    ssd: list                        # [(nodes(2,), length, Sig, Mu, mult)]
    age: list                        # [(nn (K,10), mats (K,10,10))]
    # expanded circuits (series unrolled), Case/J/dV solved on host
    circuits: list = field(default_factory=list)


def _eval_magdirs(problem: Problem, mesh: MeshData, units: float):
    """Per-element magnetization direction, evaluating functional
    directions at element centroids (static2d.cpp:510-598).
    Centroids are converted back to problem units for the expression."""
    labels = [l for l in problem.labellist if not l.is_hole()]
    lbl = mesh.element_labels
    base = np.array([l.MagDir for l in labels])
    out = base[lbl].astype(float)
    has_fctn = np.array([bool(l.MagDirFctn) for l in labels], bool)
    if has_fctn.any():
        cents = mesh.nodes[mesh.elements].mean(axis=1)
        for t in np.nonzero(has_fctn[lbl])[0]:
            lab = labels[lbl[t]]
            out[t] = eval_magdir(lab.MagDirFctn, cents[t, 0], cents[t, 1])
    return out


def pack(problem: Problem, mesh: MeshData) -> PackedMagnetostatic:
    from ..mesh.meshdata import resolve_default_labels
    resolve_default_labels(problem, mesh)
    units = LENGTH_TO_CM[problem.LengthUnits]
    xy = mesh.nodes * units
    tris = mesh.elements
    N = mesh.num_nodes
    T = mesh.num_elements

    labels = [l for l in problem.labellist if not l.is_hole()]
    mats: list[MagneticMaterial] = problem.blockproplist
    for m in mats:
        if m.BHpoints > 0 and not m.slope:
            if problem.PrevSoln:
                # incremental/frozen-permeability setup (fsolver.cpp:248)
                m.prepare_incremental(problem.Frequency * 2.0 * PI,
                                      problem.PrevType)
            else:
                m.get_slopes(problem.Frequency * 2.0 * PI)
                m.MuMax = 0.0

    # series-circuit expansion (fsolver.cpp:280-317)
    import copy
    circuits = [copy.copy(c) for c in problem.circproplist]
    label_circuit = np.full(len(labels), -1, np.int64)
    for k, lab in enumerate(labels):
        ic = lab.InCircuit
        if ic < 0:
            continue
        if circuits[ic].CircType == 1:
            nc = copy.copy(circuits[ic])
            nc.Amps = nc.Amps * lab.Turns
            circuits.append(nc)
            label_circuit[k] = len(circuits) - 1
        else:
            label_circuit[k] = ic
    for c in circuits:
        c.CircType = 0 if c.CircType == 1 else c.CircType

    lbl = mesh.element_labels.astype(np.int64)
    lab_blk = np.array([l.BlockType for l in labels], np.int64)
    lab_turns = np.array([l.Turns for l in labels])
    m_lam = np.array([m.LamType for m in mats], np.int64)
    m_mux = np.array([m.mu_x for m in mats])
    m_muy = np.array([m.mu_y for m in mats])
    m_fill = np.array([m.LamFill for m in mats])
    m_bh = np.array([m.BHpoints > 0 for m in mats], bool)
    m_jre = np.array([m.J.real for m in mats])
    m_jim = np.array([m.J.imag for m in mats])
    m_hc = np.array([m.H_c for m in mats])
    m_cd = np.array([m.Cduct for m in mats])

    blk = lab_blk[lbl]
    is_wound = (np.abs(lab_turns[lbl]) > 1) | (m_lam[blk] > 2)
    mu_x = m_mux[blk]
    mu_y = m_muy[blk]
    lam_type = m_lam[blk]
    lam_fill = m_fill[blk]
    nonlinear = m_bh[blk]
    Jre = m_jre[blk]
    Jim = m_jim[blk]
    Hc = m_hc[blk]
    Cduct = np.where(is_wound, 0.0, m_cd[blk])
    circuit = label_circuit[lbl]
    magdir = _eval_magdirs(problem, mesh, units)

    # padded B-H tables per material, gathered per element
    Kmax = max((m.BHpoints for m in mats if m.BHpoints > 0), default=2) + 1
    nmats = len(mats)
    tbl_B = np.zeros((nmats, Kmax))
    tbl_H = np.zeros((nmats, Kmax))
    tbl_S = np.ones((nmats, Kmax))
    for i, m in enumerate(mats):
        if m.BHpoints == 0:
            tbl_B[i] = np.arange(Kmax)
            continue
        Bd, Hd, Sl = m.knot_arrays()
        k = len(Bd)
        tbl_B[i, :k] = Bd
        tbl_H[i, :k] = Hd
        tbl_S[i, :k] = Sl
        # linear-extension padding: lookups beyond the last knot
        # extrapolate with the final slope (CMaterialProp.cpp:1030-1037)
        for j in range(k, Kmax):
            tbl_B[i, j] = tbl_B[i, j - 1] + 1.0
            tbl_H[i, j] = tbl_H[i, j - 1] + Sl[-1]
            tbl_S[i, j] = Sl[-1]
    bh_B = tbl_B[blk]
    bh_H = tbl_H[blk]
    bh_S = tbl_S[blk]

    # prolongation from (anti)periodic pairs
    ridx, rsign, nreduced = build_prolongation(N, mesh.pbc_pairs)

    # Dirichlet + point sources from node markers (marker>=2 ->
    # pointprop index marker-2, fsolver.cpp:382-384)
    axi = problem.ProblemType == ProblemType.AXISYMMETRIC
    fixed_mask = np.zeros(nreduced, bool)
    fixed_vals = np.zeros(nreduced)
    fixed_vals_c = np.zeros(nreduced, complex)
    b_extra = np.zeros(nreduced)
    b_extra_c = np.zeros(nreduced, complex)
    pp_idx = (mesh.node_markers & 0xFFFF).astype(np.int64) - 2
    pp_nodes = np.nonzero((pp_idx >= 0)
                          & (pp_idx < len(problem.nodeproplist)))[0]
    for i in pp_nodes:
        j = pp_idx[i]
        pp = problem.nodeproplist[j]
        if pp.J != 0:
            # point current source (static2d.cpp:819-825; axisymmetric
            # carries the 2*pi*r loop factor, staticaxi.cpp:637-642)
            amp = 0.01 * pp.J.real * (2.0 * xy[i, 0] if axi else 1.0)
            b_extra[ridx[i]] += amp * rsign[i]
            b_extra_c[ridx[i]] += 0.01 * pp.J * rsign[i]
        else:
            fixed_mask[ridx[i]] = True
            fixed_vals[ridx[i]] = pp.A.real / C_APOT * rsign[i]
            fixed_vals_c[ridx[i]] = pp.A / C_APOT * rsign[i]
    if axi:
        # on-axis nodes pinned to zero potential (staticaxi.cpp:645-646)
        on_axis = np.abs(xy[:, 0]) < units * 1e-06
        for i in np.nonzero(on_axis)[0]:
            fixed_mask[ridx[i]] = True
            fixed_vals[ridx[i]] = 0.0

    # Dirichlet / Robin / small-skin-depth boundary edges from markers
    robin = []
    ssd = []
    needs_adj = any(bp.BdryFormat in (BdryFormat.MIXED,
                                      BdryFormat.SMALL_SKIN_DEPTH)
                    for bp in problem.lineproplist)
    edge_adj = None
    if needs_adj:
        from ..mesh.meshdata import EdgeMultiplicity
        edge_adj = EdgeMultiplicity(tris)
    marked = np.nonzero(np.asarray(mesh.edge_markers) < 0)[0]
    for ei in marked:
        a, b = mesh.edges[ei]
        mk = mesh.edge_markers[ei]
        bidx = -(int(mk) + 2)
        if bidx >= len(problem.lineproplist):
            continue
        bp = problem.lineproplist[bidx]
        if bp.BdryFormat == BdryFormat.PRESCRIBED_A:
            for node in (a, b):
                x, y = xy[node]
                if axi and x == 0.0:
                    continue  # on-axis stays pinned (staticaxi.cpp:701)
                xo, yo = x / units, y / units
                if problem.Coords == CoordinateSystem.CARTESIAN:
                    val = bp.A0 + bp.A1 * xo + bp.A2 * yo
                else:
                    r = math.hypot(xo, yo)
                    th = math.degrees(math.atan2(yo, xo)) if (xo, yo) != (0, 0) else 0.0
                    val = bp.A0 + bp.A1 * r + bp.A2 * th
                fixed_mask[ridx[node]] = True
                fixed_vals[ridx[node]] = \
                    val * math.cos(bp.phi * DEG) / C_APOT * rsign[node]
                fixed_vals_c[ridx[node]] = \
                    val * cmath.exp(1j * bp.phi * DEG) / C_APOT * rsign[node]
        elif bp.BdryFormat == BdryFormat.MIXED:
            length = float(np.hypot(*(xy[b] - xy[a])))
            mult = edge_adj.get(tuple(sorted((int(a), int(b)))), 1)
            # axisymmetric Robin terms carry the loop factor 2*r_mid
            # (staticaxi.cpp:315-333); fold it into the coefficients so
            # the downstream assembly is geometry-agnostic
            scale = (xy[a, 0] + xy[b, 0]) if axi else 1.0
            robin.append(((int(a), int(b)), length, bp.c0 * scale,
                          bp.c1 * scale, mult))
        elif bp.BdryFormat == BdryFormat.SMALL_SKIN_DEPTH:
            # small-skin-depth impedance BC, harmonic only
            # (harmonic2d.cpp:504-520)
            length = float(np.hypot(*(xy[b] - xy[a])))
            mult = edge_adj.get(tuple(sorted((int(a), int(b)))), 1)
            ssd.append(((int(a), int(b)), length, bp.Sig, bp.Mu, mult))

    return PackedMagnetostatic(
        problem=problem, mesh=mesh, units=units, xy=xy, tris=tris,
        ridx=ridx, rsign=rsign, nreduced=nreduced, lbl=lbl, blk=blk,
        mu_x=mu_x, mu_y=mu_y, lam_type=lam_type, lam_fill=lam_fill,
        nonlinear=nonlinear, Jre=Jre, Jim=Jim, Hc=Hc, magdir=magdir,
        Cduct=Cduct,
        circuit=circuit, bh_B=bh_B, bh_H=bh_H, bh_S=bh_S,
        fixed_mask=fixed_mask, fixed_vals=fixed_vals, b_extra=b_extra,
        fixed_vals_c=fixed_vals_c, b_extra_c=b_extra_c,
        robin=robin, ssd=ssd, age=age_blocks(mesh), circuits=circuits)


# ---------------------------------------------------------------------- #
# solve                                                                  #
# ---------------------------------------------------------------------- #

@dataclass
class MagSolution:
    """Solved magnetostatic problem: A in the reference's output units
    (the quantity written to .ans, = c * V)."""

    problem: Problem
    mesh: MeshData
    A: np.ndarray                    # (N,) nodal vector potential
    circuits: list                   # expanded circuit list w/ Case, J, dV
    label_case: np.ndarray           # per-label (case, value) pairs
    iterations: int = 0
    residual: float = 0.0
    Aprev: np.ndarray | None = None  # previous solution (chained runs)


def _circuit_preprocess(pk: PackedMagnetostatic, geom):
    """Case selection and per-circuit J / dV (static2d.cpp:85-167)."""
    area = np.asarray(geom.area)
    nc = len(pk.circuits)
    if nc == 0:
        return
    has = pk.circuit >= 0
    ci = pk.circuit[has]
    a_s = area[has]
    i1 = np.bincount(ci, weights=a_s, minlength=nc)
    i2 = np.bincount(ci, weights=a_s * pk.Cduct[has], minlength=nc)
    i3 = np.bincount(ci, weights=pk.Jre[has] * a_s * 100.0, minlength=nc)
    for k, c in enumerate(pk.circuits):
        if c.CircType == 0:
            if i2[k] == 0:
                c.Case = 1
                c.J = 0.0 if i1[k] == 0 else 0.01 * (c.Amps.real - i3[k]) / i1[k]
            else:
                c.Case = 0
                c.dV = -0.01 * (c.Amps.real - i3[k]) / i2[k]
        else:
            c.Case = 0
            c.dV = c.dVolts.real


def _element_blocks(pk: PackedMagnetostatic, Me):
    """Assemble host-f64 blocks: volume elements (sign convention: the
    global matrix gets -Me, static2d.cpp:807-815), Robin edges, AGEs."""
    elem_ridx = pk.ridx[pk.tris]
    elem_sign = pk.rsign[pk.tris]
    blocks = [ElementBlock(idx=elem_ridx, sign=elem_sign, mat=-Me)]
    if pk.robin:
        c = C_APOT
        idx = np.array([[pk.ridx[a], pk.ridx[b]] for (a, b), *_ in pk.robin])
        sgn = np.array([[pk.rsign[a], pk.rsign[b]] for (a, b), *_ in pk.robin])
        mats = np.zeros((len(pk.robin), 2, 2))
        for i, (_, length, c0, c1, mult) in enumerate(pk.robin):
            Km = -0.0001 * c * complex(c0).real * length / 6.0
            mats[i] = -mult * Km * np.array([[2.0, 1.0], [1.0, 2.0]])
        blocks.append(ElementBlock(idx=idx, sign=sgn, mat=mats))
    for nn, mats in pk.age:
        blocks.append(ElementBlock(idx=pk.ridx[nn], sign=pk.rsign[nn],
                                   mat=mats))
    return blocks


def _rhs(pk: PackedMagnetostatic, geom, be):
    """Scatter -be plus point currents and Robin c1 terms (host f64)."""
    b = np.zeros(pk.nreduced)
    flat_idx = pk.ridx[pk.tris].reshape(-1)
    flat_sgn = pk.rsign[pk.tris].reshape(-1)
    np.add.at(b, flat_idx, -flat_sgn * np.asarray(be).reshape(-1))
    b = b + pk.b_extra
    # Robin RHS: be[j] += c1*l/2*1e-4 then global b -= be
    # (static2d.cpp:475-477 with the :814 sign convention)
    for (a, bb), length, c0, c1, mult in pk.robin:
        Kb = (complex(c1).real * length / 2.0) * 0.0001 * mult
        b[pk.ridx[a]] += -pk.rsign[a] * Kb
        b[pk.ridx[bb]] += -pk.rsign[bb] * Kb
    return b


def load_previous(problem: Problem, mesh: MeshData):
    """Nodal A of the previous solution named by [PrevSoln], mapped
    onto this mesh by exact coordinate match (the reference instead
    reuses the mesh embedded in the .ans, fsolver.cpp:990)."""
    from scipy.spatial import cKDTree

    from ..io import ansfile
    g = ansfile.read_ans(problem.PrevSoln)
    d, idx = cKDTree(g.mesh.nodes).query(mesh.nodes)
    if d.max() > 1e-08:
        raise ValueError(
            f"previous solution mesh does not match (max gap {d.max()})")
    return np.real(g.values)[idx]


def prev_element_B(problem: Problem, mesh: MeshData, Aprev: np.ndarray):
    """Element flux density of the previous solution (getPrev2DB /
    getPrevAxiB, fsolver.cpp:116-197)."""
    from ..constants import LENGTH_TO_METERS
    lc = LENGTH_TO_METERS[problem.LengthUnits]
    tris = mesh.elements
    v = mesh.nodes[tris]
    x, y = v[:, :, 0], v[:, :, 1]
    nxt = np.roll(np.arange(3), -1)
    prv = np.roll(np.arange(3), 1)
    b = y[:, nxt] - y[:, prv]
    c = x[:, prv] - x[:, nxt]
    da = b[:, 0] * c[:, 1] - b[:, 1] * c[:, 0]
    A = np.asarray(Aprev, float)[tris]
    if problem.ProblemType == ProblemType.PLANAR:
        B1 = (A * c).sum(axis=1) / (da * lc)
        B2 = -(A * b).sum(axis=1) / (da * lc)
        return B1, B2
    R = x
    r = R.mean(axis=1)
    v0, v2, v4 = A[:, 0], A[:, 1], A[:, 2]

    def mid(Ra, Rb, va, vb):
        deg = (Ra < 1e-06) & (Rb < 1e-06)
        safe = np.where(deg, 1.0, 4.0 * (Ra + Rb))
        out = (Rb * (3.0 * va + vb) + Ra * (va + 3.0 * vb)) / safe
        return np.where(deg, (va + vb) / 2.0, out)

    v1 = mid(R[:, 0], R[:, 1], v0, v2)
    v3 = mid(R[:, 1], R[:, 2], v2, v4)
    v5 = mid(R[:, 2], R[:, 0], v4, v0)
    dp = (-v0 + v2 + 4.0 * v3 - 4.0 * v5) / 3.0
    dq = (-v0 - 4.0 * v1 + 4.0 * v3 + v4) / 3.0
    daxi = da * 2.0 * PI * r * lc * lc
    return (-(c[:, 1] * dp + c[:, 2] * dq) / daxi,
            (b[:, 1] * dp + b[:, 2] * dq) / daxi)


def incremental_mu(problem: Problem, pk: "PackedMagnetostatic",
                   B1p: np.ndarray, B2p: np.ndarray, mats):
    """(mu1, mu2, v12) tensors about the DC offset for B-H elements
    (static2d.cpp:633-679 / staticaxi.cpp:488-500)."""
    T = len(pk.lbl)
    mu1 = np.ones(T)
    mu2 = np.ones(T)
    v12 = np.zeros(T)
    frozen = problem.PrevType == 2
    for t in np.nonzero(pk.nonlinear)[0]:
        mat = mats[pk.blk[t]]
        B = math.hypot(B1p[t], B2p[t])
        muinc, murel = mat.incremental_permeability_dc(B)
        if B == 0:
            mu1[t] = mu2[t] = muinc
        elif frozen:
            mu1[t] = mu2[t] = murel
        else:
            b1s, b2s = B1p[t] ** 2, B2p[t] ** 2
            B2 = B * B
            mu1[t] = B2 * muinc * murel / (b1s * murel + b2s * muinc)
            mu2[t] = B2 * muinc * murel / (b1s * muinc + b2s * murel)
            v12[t] = -B1p[t] * B2p[t] * (murel - muinc) / (B2 * murel
                                                           * muinc)
    return mu1, mu2, v12


def _dn_cg_budget(sess) -> int:
    """Per-dispatch inner-CG budget for the fused device-Newton loop.

    One fused dispatch streams the fine band ~4x per preconditioned CG
    iteration (operator apply + V-cycle smoothing residuals), so an
    unbounded dispatch at 1M-class sizes occupies the device for many
    minutes -- which the tunneled TPU worker does not survive
    (reproduced at 994k DOFs: one 30-step x 400-iteration dispatch over
    the 4.6 GB fine band ends in 'TPU worker process crashed or
    restarted'). Budget the accumulated inner iterations so one
    dispatch streams at most ~XFEMM_TPU_DN_STREAM_GB gigabytes
    (default 2000, i.e. ~10-25 s of device time); the solve loop then
    chains dispatches from the returned state.
    ``XFEMM_TPU_DN_CG_BUDGET`` overrides directly (0 = unbounded)."""
    env = os.environ.get("XFEMM_TPU_DN_CG_BUDGET")
    if env is not None:
        return int(env)
    if sess.band_amg is None:
        return 0
    lv0 = sess.band_amg.levels[0]
    band_bytes = lv0.A.dense.size * lv0.A.dense.dtype.itemsize
    if lv0.Abf is not None:
        band_bytes += lv0.Abf.dense.size * 2
    stream = float(os.environ.get("XFEMM_TPU_DN_STREAM_GB", "2000")) * 1e9
    return max(200, int(stream / (4.0 * band_bytes)))


def _dn_scatter_mode(sess) -> bool:
    """Choose the fused-loop refresh mode: single-step dispatches that
    scatter changed entries INTO the donated band (newton.run_scatter)
    once the fine band exceeds XFEMM_TPU_DN_SCATTER_BYTES (default
    3 GB). Below that, the multi-step while_loop with the delta-COO
    sidecar wins -- its per-iteration sidecar cost is small and one
    dispatch covers the whole Newton middle (no per-step round trips,
    which matter when a dispatch is only tens of ms). Above it, each
    dispatch runs for seconds anyway and the delta sidecar's
    per-iteration gather/scatter dominates (994k: ~3x the band
    stream)."""
    if sess.band_amg is None:
        return False
    lv0 = sess.band_amg.levels[0]
    band_bytes = lv0.A.dense.size * lv0.A.dense.dtype.itemsize
    thresh = float(os.environ.get("XFEMM_TPU_DN_SCATTER_BYTES", "3e9"))
    return band_bytes > thresh


_PACK_CACHE: "OrderedDict[tuple, tuple]" = __import__(
    "collections").OrderedDict()
_PACK_CACHE_MAX = 4


def _problem_fingerprint(problem: Problem):
    """Content hash of everything pack()/tri_geometry depend on: repeat
    solves on the same (problem, mesh) pair (rotor sweeps with frozen
    geometry, transient chains, parameter studies over sources only via
    re-pack) reuse the packed arrays, while any in-place property edit
    (femm_compat mutates the document between analyses) changes the
    hash and forces a repack. Returns None when the property lists are
    unpicklable (then caching is skipped)."""
    import hashlib
    import pickle
    try:
        payload = pickle.dumps(
            (problem.Frequency, problem.LengthUnits, problem.ProblemType,
             problem.Precision, problem.Depth, problem.PrevSoln,
             problem.PrevType, problem.nodeproplist, problem.lineproplist,
             problem.blockproplist, problem.circproplist,
             problem.labellist), protocol=4)
    except Exception:
        return None
    return hashlib.blake2b(payload, digest_size=16).digest()


def solve(problem: Problem, mesh: MeshData,
          max_newton: int = 100, Aprev: np.ndarray | None = None,
          devices: int | None = None, device_mesh=None,
          x0_A: np.ndarray | None = None
          ) -> MagSolution:
    """Planar nonlinear magnetostatic solve (Static2D semantics).

    ``x0_A`` warm-starts the Newton loop from a previous solution's
    nodal A (same mesh layout): the initial permeabilities come from its
    field state and the first linear solve starts at it, which cuts the
    Newton iteration count on consecutive rotor-sweep angles
    (generalizing the reference's [prevsoln] machinery,
    fsolver.cpp:202-239, to in-memory chaining).

    ``devices=N`` runs every linear solve of the Newton loop on an
    N-device 1-D ``jax.sharding.Mesh`` (domain-decomposition halo
    exchange + additive-Schwarz AMG, parallel/driver.py) -- the
    multi-chip analogue of the reference's PCGSolve call site
    (static2d.cpp:948). The Newton trajectory and convergence contract
    are unchanged.
    """
    assert problem.ProblemType == ProblemType.PLANAR, \
        "axisymmetric path in models/axisymmetric.py"
    from ..utils import profiling
    if Aprev is None and problem.PrevSoln:
        Aprev = load_previous(problem, mesh)
    c = C_APOT
    # pack/geometry cache: keyed on object identity (the cache holds
    # strong refs, so ids stay valid) + property-content fingerprint
    ckey = (id(problem), id(mesh))
    fp = _problem_fingerprint(problem)
    hit = _PACK_CACHE.get(ckey)
    # ``extra`` carries cross-solve solver state for the SAME problem
    # values: the solver Session (CSR pattern, frozen linear-part
    # values, band hierarchy + blocktri factor) and the initial-mu
    # element blocks of iteration 0 -- a rotor-sweep/repeat solve then
    # skips ~1 s of host reassembly per solve
    extra: dict = {}
    if fp is not None and hit is not None and hit[0] == fp:
        pk, geom, Mx, My, Mxy = hit[1]
        extra = hit[2]
        _PACK_CACHE.move_to_end(ckey)
    else:
        with profiling.phase("pack"):
            pk = pack(problem, mesh)
        with profiling.phase("geometry"):
            geom = assembly.tri_geometry(pk.xy, pk.tris)
            _circuit_preprocess(pk, geom)
            Mx, My, Mxy = assembly.curl_matrices(geom)
        # fingerprint AFTER pack: get_slopes fills material spline state
        # in place, so the pre-pack hash would never match again and the
        # first repeat solve would always repack
        fp2 = _problem_fingerprint(problem)
        if fp2 is not None:
            _PACK_CACHE[ckey] = (fp2, (pk, geom, Mx, My, Mxy), extra)
            while len(_PACK_CACHE) > _PACK_CACHE_MAX:
                _PACK_CACHE.popitem(last=False)

    T = pk.tris.shape[0]
    area = geom.area

    # element source current density t (circuit contribution)
    t_src = np.zeros(T)
    if pk.circuits:
        cJ = np.array([complex(c.J).real for c in pk.circuits])
        cdV = np.array([complex(c.dV).real for c in pk.circuits])
        cCase = np.array([c.Case for c in pk.circuits])
        ci = pk.circuit
        has = ci >= 0
        cis = np.where(has, ci, 0)
        t_src = np.where(has,
                         np.where(cCase[cis] == 1, cJ[cis],
                                  -cdV[cis] * pk.Cduct),
                         0.0)

    # static RHS pieces: sources (static2d.cpp:483-507) and magnetization
    # (static2d.cpp:584-598). Edge-j magnetization term K_j adds to the
    # endpoints j and j+1, so be[j] = src + K_j + K_{j-1}.
    src = -(pk.Jre + t_src) * area / 3.0
    v = pk.xy[pk.tris]  # (T,3,2)
    nxt = np.roll(np.arange(3), -1)
    prv_of = np.array([2, 0, 1])
    dxe = v[:, nxt, 0] - v[:, :, 0]
    dye = v[:, nxt, 1] - v[:, :, 1]
    th = pk.magdir * PI / 180.0
    Kmag = 0.0001 * pk.Hc[:, None] * (
        np.cos(th)[:, None] * dxe + np.sin(th)[:, None] * dye) / 2.0
    be_static = src[:, None] + Kmag + Kmag[:, prv_of]

    # initial permeabilities (static2d.cpp:603-631)
    lt = pk.lam_type
    f = pk.lam_fill
    mu1 = np.where(lt == 0, pk.mu_x * f + (1 - f),
                   np.where(lt == 1, pk.mu_x * f + (1 - f),
                            np.where(lt == 2,
                                     pk.mu_y / (f + pk.mu_y * (1 - f)), 1.0)))
    mu2 = np.where(lt == 0, pk.mu_y * f + (1 - f),
                   np.where(lt == 1, pk.mu_x / (f + pk.mu_x * (1 - f)),
                            np.where(lt == 2, pk.mu_y * f + (1 - f), 1.0)))

    nonlinear = bool(pk.nonlinear.any())
    nl = pk.nonlinear
    Mxy_v12 = 0.0
    if Aprev is not None and nonlinear:
        # incremental/frozen permeability: the B-H elements become
        # linear with a tensor permeability about the DC offset
        B1p, B2p = prev_element_B(problem, mesh, Aprev)
        mu1i, mu2i, v12 = incremental_mu(problem, pk, B1p, B2p,
                                 problem.blockproplist)
        mu1 = np.where(nl, mu1i, mu1)
        mu2 = np.where(nl, mu2i, mu2)
        Mxy_v12 = Mxy * v12[:, None, None]
        nonlinear = False

    # representative coordinates per reduced DOF (AMG aggregation)
    dof_coords = np.zeros((pk.nreduced, 2))
    dof_coords[pk.ridx] = pk.xy

    # session reuse is only valid for the same device dtype (tests flip
    # device_f64_ok; a cached f64 hierarchy must not serve an f32 run)
    _skey = ("sess", bool(solver.device_f64_ok()))
    sess = extra.get(_skey)
    if sess is None:
        sess = solver.Session()
        extra[_skey] = sess
    dsess = None
    if devices:
        from ..parallel.driver import DistributedSession
        dsess = DistributedSession(devices, mesh=device_mesh)
    V = np.zeros(pk.nreduced)
    warm = x0_A is not None
    if warm:
        V[pk.ridx] = np.asarray(x0_A, np.float64) * pk.rsign / c
    relax = 1.0
    res = 0.0
    lastres = 0.0
    iters_total = 0
    rel_resid = 0.0

    _NEWTON_DEBUG = bool(os.environ.get("XFEMM_TPU_NEWTON_DEBUG"))
    Me = None          # element matrices, built on the first host pass
    dev_handoff = False  # next host pass follows a device run
    dev_state = None   # (DeviceNewton, has_lam) once eligible
    dev_runs = 0       # fused device-Newton dispatches taken
    it_shift = 0       # extra global iterations from device runs
    # repeat solve of a cached session: the DeviceNewton state and band
    # hierarchy already exist, so the fused device loop can start at
    # iteration 0 (skipping the host initial-mu solve entirely)
    if (nonlinear and dsess is None
            and not os.environ.get("XFEMM_TPU_NO_DEVICE_NEWTON")):
        made = extra.get(("dn", bool(solver.device_f64_ok())))
        if made is not None and sess.band_amg is not None:
            from ..ops import blocktri as _bt_mod
            if not isinstance(sess.bt, _bt_mod.BTSmoother):
                # repeat solves skip host it-0 and run the whole Newton
                # from scratch in the fused loop -- EXCEPT in the
                # two-level-DD regime (1M-class): there the composite
                # preconditioner plateaus on interface modes, and only
                # the host refinement driver's exact-f64-residual
                # restarts break the plateau (measured at 994k: the
                # fused-from-scratch trajectory costs 798 CG its where
                # host-it0 + fused middle costs 483)
                dev_state = (made[0], made[1])
    for it in range(max_newton if nonlinear else 1):
        # inexact-Newton forcing: far from the root the linear solve
        # only needs to out-resolve the current Newton error, so early
        # iterations run at a loose tolerance and the tolerance tightens
        # with the Newton displacement norm. The solve that satisfies
        # the Newton test is always at the full contract Precision, so
        # the reference's accuracy guarantees (spars.cpp:300,
        # static2d.cpp:1005-1011) are unchanged.
        if not nonlinear:
            tol_it = problem.Precision
        elif it == 0:
            tol_it = max(problem.Precision, 1e-4)
        elif res < 1e3 * problem.Precision:
            tol_it = problem.Precision
        elif dev_handoff and res < 1e-4:
            # the device loop exits at its f32 displacement floor
            # (~1e-5..1e-4); a second device run cannot improve on it
            # and can DIVERGE chasing noise (measured at 994k: a devrun
            # re-entered at res 4.2e-5 and blew the iterate up to 0.24,
            # cascading into a band-engine latch-off), so go straight
            # to the full-precision host endgame
            tol_it = problem.Precision
        else:
            tol_it = max(problem.Precision, min(1e-4, 0.03 * res))

        # repeat solve: the it-0 linear system's inputs are covered by
        # the pack fingerprint, so its solution is identical -- reuse
        # it and enter the fused Newton middle directly (the it-0 pass
        # costs 163 CG its at 994k; the preconditioner state left by
        # the previous solve serves the middle at least as well)
        if (it == 0 and nonlinear and dsess is None and not warm
                and Aprev is None and extra.get("it0_V") is not None
                and sess.band_amg is not None and sess.sub_cache is not None
                and not os.environ.get("XFEMM_TPU_NO_DEVICE_NEWTON")):
            made = extra.get(("dn", bool(solver.device_f64_ok())))
            if made is not None:
                V = extra["it0_V"].copy()
                lastres = 0.0
                res = 1.0            # |V - 0| / |V|
                dev_state = (made[0], made[1])
                if _NEWTON_DEBUG:
                    print("newton it=0 reused cached it-0 solution",
                          flush=True)
                continue

        # the Newton middle and tail run entirely on device in ONE
        # dispatch (ops/newton.py::run): element update, operator
        # refresh, bt-preconditioned CG, and the adaptive relaxation,
        # looping until the displacement is below the acceptance
        # threshold (or stalls). Only the accepting pass at the full
        # contract Precision runs on host afterwards.
        if (dev_state is not None and dev_runs < 2
                and tol_it > problem.Precision
                and (dev_runs == 0 or res > 1e-3)
                and sess.band_amg is not None):
            from ..ops import newton as newton_dev
            from ..ops import solver as solver_mod
            dn, has_lam = dev_state
            cg_budget = _dn_cg_budget(sess)
            with profiling.phase("device newton"):
                # donate the session's own fine band (no copy -- a 1M
                # sym band is ~10 GB); rebuild the session's BandAMG
                # around the returned refreshed buffers afterwards
                amg_rest, dense, _abf = newton_dev.strip_fine_band(
                    sess.band_amg)
                # at iteration 0 no Newton displacement exists yet; the
                # unit sentinel makes the loop run and reproduces the
                # host's initial 1e-4 forcing tolerance
                res_in = res if it > 0 else 1.0
                dbg_steps = int(os.environ.get(
                    "XFEMM_TPU_DN_MAX_STEPS", "30"))
                dbg_inner = int(os.environ.get(
                    "XFEMM_TPU_DN_INNER", "400"))
                # the fused phase runs as a CHAIN of budget-bounded
                # dispatches: the while_loop exits once cg_budget inner
                # iterations accumulate and the host immediately
                # re-dispatches from the returned state. Keeps every
                # single device execution in the tens of seconds (an
                # unbounded 994k dispatch kills the tunneled TPU
                # worker, see ops/newton.py::run). At 1M-class sizes
                # the chain switches to the single-step SCATTER mode
                # (newton.run_scatter): the delta-COO sidecar that the
                # multi-step loop applies per CG iteration costs ~3x
                # the banded stream there.
                use_scatter = _dn_scatter_mode(sess)
                Vd = jnp.asarray(V, jnp.float32)
                base_it = float(it + it_shift)
                relax_d, res_d, lastres_d = relax, res_in, lastres
                steps = 0
                cgit = 0.0
                target = 90.0 * problem.Precision
                best_res = np.inf
                since = 0
                for _sub in range(30 if use_scatter else 12):
                    state = jnp.asarray(
                        [relax_d, res_d, lastres_d, base_it],
                        jnp.float32)
                    if use_scatter:
                        Vd, dense, dvec, oob_vals, stats = \
                            newton_dev.run_scatter(
                                dn, amg_rest, dense, Vd, state,
                                tol_floor=max(problem.Precision, 3e-7),
                                bt=sess.bt, has_lam=has_lam,
                                inner_iter=(min(dbg_inner, cg_budget)
                                            if cg_budget else dbg_inner))
                    else:
                        Vd, dense, dvec, oob_vals, stats = newton_dev.run(
                            dn, amg_rest, dense, Vd, state,
                            tol_floor=max(problem.Precision, 3e-7),
                            target_res=target,
                            bt=sess.bt, has_lam=has_lam,
                            max_steps=dbg_steps, inner_iter=dbg_inner,
                            cg_budget=cg_budget)
                    prev_res = res_d
                    relax_d, res_d, lastres_d, ksteps, cg_sub = \
                        np.asarray(stats, np.float64)
                    steps += int(ksteps)
                    base_it += int(ksteps)
                    cgit += cg_sub
                    if use_scatter:
                        # single-step chain: same progress rule as the
                        # device loop's (res>target, 3-strike stall)
                        if res_d <= target or int(ksteps) == 0:
                            break
                        if res_d < 0.95 * best_res:
                            best_res, since = res_d, 0
                        else:
                            since += 1
                            if since >= 3:
                                break
                    else:
                        budget_cut = (cg_budget > 0
                                      and cg_sub >= cg_budget
                                      and int(ksteps) > 0
                                      and res_d > target)
                        if not budget_cut or res_d >= 0.98 * prev_res:
                            break
                    # the chain must not multiply the per-run Newton
                    # step cap: 12 budget-bounded dispatches x
                    # max_steps=30 would allow 360 device steps where
                    # the single-dispatch semantics allowed 30
                    if steps >= dbg_steps:
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
            it_shift += max(steps - 1, 0)
            # a collapsed relax reflects the device loop's f32 noise
            # floor, not the true Newton map; entering the host endgame
            # over-damped makes it crawl. 0.5 is the optimal damping
            # for the oscillatory tail mode, and the host rule re-adapts
            # from there.
            relax = max(float(relax_d), 0.5)
            lastres = float(lastres_d)
            res = float(res_d)
            # the device residuals are f32-floor values; comparing the
            # next host f64 displacement against them would trip the
            # oscillation guard spuriously
            dev_handoff = True
            if _NEWTON_DEBUG:
                print(f"newton it={it}(+{steps}) devrun "
                      f"res={res:.3e} cg={int(cgit)} relax={relax:.3f}",
                      flush=True)
            if res == 0.0:
                break
            continue

        Mn = np.zeros((T, 3, 3))
        be = be_static
        if it > 0 or (warm and nonlinear):
          with profiling.phase("newton host"):
              # element B + Newton matrices, only for the nonlinear subset
              # (static2d.cpp:691-796); linear elements keep their mu
              ns = np.nonzero(nl)[0]
              tri_s = pk.tris[ns]
              Vl = pk.rsign[tri_s] * V[pk.ridx[tri_s]]
              lts = lt[ns]
              fs = f[ns]
              areas = area[ns]
              B1 = np.sum(Vl * geom.q[ns], axis=1)
              B2 = np.sum(Vl * geom.p[ns], axis=1)
              # LamType 1/2 variants scale one component by 1/fill
              B1 = np.where(lts == 2, B1 / fs, B1)
              B2 = np.where(lts == 1, B2 / fs, B2)
              Bmag = c * np.sqrt(B1 ** 2 + B2 ** 2) / (0.02 * areas)
              vv, dv = assembly.hermite_vdv(Bmag, pk.bh_B[ns], pk.bh_H[ns],
                                            pk.bh_S[ns])
              mu_el = 1.0 / (MU0 * vv)
              mu1[ns] = np.where(lts == 0, mu_el,
                                 np.where(lts == 1, mu_el * fs,
                                          mu_el / (fs + mu_el * (1 - fs))))
              mu2[ns] = np.where(lts == 0, mu_el,
                                 np.where(lts == 1,
                                          mu_el / (fs + mu_el * (1 - fs)),
                                          mu_el * fs))
              # Newton matrices (static2d.cpp:700-796)
              Mxs = Mx[ns]
              Mys = My[ns]
              vvec0 = np.einsum("tjw,tw->tj", Mxs + Mys, Vl)
              Mn0 = (-200.0 * c ** 3 * dv / areas)[:, None, None] * \
                  vvec0[:, :, None] * vvec0[:, None, :]
              Mns = Mn0
              if (lts != 0).any():
                  # LamType 1: v = (My/t + Mx) V, u = (My/t + t*Mx) V
                  v1 = np.einsum("tjw,tw->tj",
                                 Mys / fs[:, None, None] + Mxs, Vl)
                  u1 = np.einsum("tjw,tw->tj", Mys / fs[:, None, None]
                                 + fs[:, None, None] * Mxs, Vl)
                  Mn1 = (-100.0 * c ** 3 * dv / areas)[:, None, None] * (
                      v1[:, :, None] * u1[:, None, :]
                      + v1[:, None, :] * u1[:, :, None])
                  v2 = np.einsum("tjw,tw->tj",
                                 Mxs / fs[:, None, None] + Mys, Vl)
                  u2 = np.einsum("tjw,tw->tj", Mxs / fs[:, None, None]
                                 + fs[:, None, None] * Mys, Vl)
                  Mn2 = (-100.0 * c ** 3 * dv / areas)[:, None, None] * (
                      v2[:, :, None] * u2[:, None, :]
                      + v2[:, None, :] * u2[:, :, None])
                  Mns = np.where((lts == 0)[:, None, None], Mn0,
                                 np.where((lts == 1)[:, None, None], Mn1,
                                          Mn2))
              Mn[ns] = Mns
              be = be_static.copy()
              be[ns] += np.einsum("tjk,tk->tj", Mns, Vl)

        with profiling.phase("element matrices"):
            fresh_full = False
            if Me is None:
                # first host pass of this solve. When the fused device
                # loop covered iteration 0 (repeat/warm solves), this
                # runs at it > 0 with the CURRENT mu/Mn state.
                # initial-mu blocks are identical across repeat solves
                # of the same problem values (no warm Newton sources, no
                # previous-solution permeability): reuse them
                it0_cacheable = Aprev is None and not (warm and nonlinear)
                it0_hit = extra.get("it0") if it0_cacheable else None
                if it0_hit is not None:
                    Me, blocks, b_base = it0_hit
                else:
                    Me = (Mx / mu2[:, None, None] + My / mu1[:, None, None]
                          + Mn + Mxy_v12)
                    blocks = _element_blocks(pk, Me)
                    b_base = _rhs(pk, geom, be_static)
                    # the full build above already holds the current
                    # mu/Mn, so the subset refresh below is redundant
                    fresh_full = it > 0
                    if it0_cacheable and it == 0:
                        extra["it0"] = (Me, blocks, b_base)
            if it == 0:
                # warm start: the Newton source corrections from the
                # initial field state belong in the very first RHS
                b = b_base if not (warm and nonlinear) \
                    else _rhs(pk, geom, be)
            else:
                # only the nonlinear subset's matrices/sources changed:
                # write them straight into the LIVE volume block's mat
                # buffer (blocks[0].mat is -Me; only nonlinear slots
                # ever change, so the linear part stays valid across
                # iterations AND across cached warm solves) -- the full
                # (T,3,3) negate-and-copy of _element_blocks was ~0.2 s
                # per pass at 250k, pure waste for a <30% subset
                if not fresh_full:
                    neg_ns = -(Mx[ns] / mu2[ns, None, None]
                               + My[ns] / mu1[ns, None, None] + Mn[ns])
                    if isinstance(Mxy_v12, np.ndarray):
                        neg_ns -= Mxy_v12[ns]
                    blocks[0].mat[ns] = neg_ns
                b = b_base.copy()
                dbe = be[ns] - be_static[ns]
                flat_i = pk.ridx[pk.tris[ns]].reshape(-1)
                flat_s = pk.rsign[pk.tris[ns]].reshape(-1)
                np.add.at(b, flat_i, -flat_s * dbe.reshape(-1))

        V_old = V
        if dsess is not None:
            with profiling.phase("distributed solve"):
                V, rel_resid, cg_iters = dsess.solve(
                    blocks, b, pk.fixed_mask, pk.fixed_vals, tol_it,
                    x0=V if (it > 0 or warm) else None, coords=dof_coords)
        else:
            V, rel_resid, cg_iters = solver.solve(
                blocks, b, pk.fixed_mask, pk.fixed_vals, tol_it,
                x0=V if (it > 0 or warm) else None, coords=dof_coords,
                session=sess, changed=[nl] if nonlinear else None)
        V = np.asarray(V)
        iters_total += int(cg_iters)

        if not nonlinear:
            break
        num = float(np.sum((V - V_old) ** 2))
        den = float(np.sum(V ** 2))
        if den == 0:
            break
        lastres = res
        res = math.sqrt(num / den)
        if (it == 0 and Aprev is None and not warm
                and "it0" in extra and "it0_V" not in extra):
            # cache the it-0 solution next to the it-0 element blocks
            extra["it0_V"] = V.copy()
        if _NEWTON_DEBUG:
            print(f"newton it={it} host tol={tol_it:.2e} "
                  f"res={res:.3e} cg={int(cg_iters)} relax={relax:.3f}",
                  flush=True)
        if it + it_shift > 5:
            if res > lastres and relax > 0.125 and not dev_handoff:
                relax /= 2.0
            elif res < 3e-5:
                # near the root an improving Newton step converges
                # quadratically undamped; mixing only slows the tail
                relax = 1.0
            else:
                relax += 0.1 * (1.0 - relax)
            V = relax * V + (1.0 - relax) * V_old
        dev_handoff = False
        if (res < 100.0 * problem.Precision and it > 0
                and tol_it <= problem.Precision):
            break

        # after the initial solve has built the band hierarchy and value
        # maps, intermediate Newton iterations can run on device
        if (it == 0 and nonlinear and dev_state is None
                and dsess is None
                and not os.environ.get("XFEMM_TPU_NO_DEVICE_NEWTON")):
            from ..ops import newton as newton_dev
            _dkey = ("dn", bool(solver.device_f64_ok()))
            made = extra.get(_dkey)
            if made is None:
                made = newton_dev.setup(pk, geom, Mx, My, sess, b_base, c)
                if made is not None:
                    extra[_dkey] = made
            if made is not None:
                dev_state = (made[0], made[1])

    # expand back to full nodes, convert to A (static2d.cpp:1018-1021)
    Vfull = V[pk.ridx] * pk.rsign
    A = Vfull * c

    # per-label circuit info (WriteStatic2D:1122-1148)
    labels = [l for l in problem.labellist if not l.is_hole()]
    label_case = np.zeros((len(labels), 2))
    seen = dict(zip(pk.lbl.tolist(), pk.circuit.tolist()))
    for k in range(len(labels)):
        ci = seen.get(k, -1)
        if ci < 0:
            label_case[k] = (1, 0.0)
        else:
            circ = pk.circuits[ci]
            if circ.Case == 0:
                label_case[k] = (0, circ.dV.real if isinstance(circ.dV, complex) else circ.dV)
            else:
                label_case[k] = (1, circ.J.real if isinstance(circ.J, complex) else circ.J)

    return MagSolution(problem=problem, mesh=mesh, A=A,
                       circuits=pk.circuits, label_case=label_case,
                       iterations=iters_total, residual=float(rel_resid),
                       Aprev=Aprev)
