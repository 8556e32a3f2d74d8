"""Nonlinear axisymmetric magnetostatics (StaticAxisymmetric semantics).

Functional equivalent of the reference's ``FSolver::StaticAxisymmetric``
(cfemm/fsolver/staticaxi.cpp:45-800): the element trial space is
``c0 + c1 r^2 + c2 z`` giving r-weighted stiffness matrices (Mr with the
arithmetic radius, Mz with the log-mean radius R_hat), on-axis DOFs pinned
to zero, loop factors 2*pi*r on sources, and the solved quantity written
out as flux 2*pi*r*A (Webers). Assembly is batched on host in f64; the
Krylov solve runs on device through ops/solver.py (same mixed-precision
path as the planar model).
"""

from __future__ import annotations

import math
import os

import jax.numpy as jnp
import numpy as np

from ..constants import C_APOT, MU0, PI, ProblemType
from ..geometry.problem import Problem
from ..mesh.meshdata import MeshData
from ..ops import assembly, solver
from ..utils import profiling
from .magnetostatics import (MagSolution, PackedMagnetostatic, _element_blocks,
                             _rhs, pack)


def _circuit_preprocess_axi(pk: PackedMagnetostatic, geom):
    """Case selection and per-circuit J / dV with the axisymmetric loop
    integrals (staticaxi.cpp:74-137): CircInt2 carries 100*a*sigma/r."""
    area = np.asarray(geom.area)
    R = np.asarray(geom.R)
    nc = len(pk.circuits)
    if nc == 0:
        return
    has = pk.circuit >= 0
    ci = pk.circuit[has]
    a_s = area[has]
    i1 = np.bincount(ci, weights=a_s, minlength=nc)
    i2 = np.bincount(ci, weights=100.0 * a_s * pk.Cduct[has] / R[has],
                     minlength=nc)
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


def solve(problem: Problem, mesh: MeshData,
          max_newton: int = 100, devices: int | None = None,
          device_mesh=None) -> MagSolution:
    assert problem.ProblemType == ProblemType.AXISYMMETRIC
    pk = pack(problem, mesh)
    c = C_APOT
    geom = assembly.axi_geometry(pk.xy, pk.tris)
    _circuit_preprocess_axi(pk, geom)
    Mx, My, Mxy = assembly.axi_curl_matrices(geom)

    T = pk.tris.shape[0]
    area = np.asarray(geom.area)
    R = np.asarray(geom.R)
    vol = np.asarray(geom.vol)
    rn = np.asarray(geom.rn)

    # element circuit source density t (staticaxi.cpp:340-352)
    t_src = np.zeros(T)
    for e in range(T):
        ci = pk.circuit[e]
        if ci >= 0:
            circ = pk.circuits[ci]
            if circ.Case == 1:
                t_src[e] = circ.J.real if isinstance(circ.J, complex) else circ.J
            else:
                dv = circ.dV.real if isinstance(circ.dV, complex) else circ.dV
                t_src[e] = -100.0 * dv * pk.Cduct[e] / R[e]

    # sources: K = -2R(J+t)a/3 per corner (staticaxi.cpp:340-352)
    src = -2.0 * R * (pk.Jre + t_src) * area / 3.0
    # magnetization: edge j with midside radius (staticaxi.cpp:427-440)
    nxt = np.roll(np.arange(3), -1)
    prv_of = np.array([2, 0, 1])
    v = pk.xy[pk.tris]
    dxe = v[:, nxt, 0] - v[:, :, 0]
    dye = v[:, nxt, 1] - v[:, :, 1]
    redge = (rn + rn[:, nxt]) / 2.0
    th = pk.magdir * PI / 180.0
    Kmag = -0.0001 * redge * pk.Hc[:, None] * (
        np.cos(th)[:, None] * dxe + np.sin(th)[:, None] * dye)
    # edge j contributes K_j to corners j and j+1, so corner j collects
    # K_j + K_{j-1}; src is already the per-corner value -2R(J+t)a/3
    be_static = src[:, None] + Kmag + Kmag[:, prv_of]

    # initial permeabilities (staticaxi.cpp:429-451)
    lt = pk.lam_type
    f = pk.lam_fill
    mu1 = np.where(lt == 0, pk.mu_x * f,
                   np.where(lt == 1, pk.mu_x * f + (1 - f),
                            np.where(lt == 2, pk.mu_y * f + (1 - f), 1.0)))
    mu2 = np.where(lt == 0, pk.mu_y * f,
                   np.where(lt == 1, pk.mu_x / (f + pk.mu_x * (1 - f)),
                            np.where(lt == 2,
                                     pk.mu_y / (f + pk.mu_y * (1 - f)),
                                     1.0)))

    # external-region (Kelvin transform) permeability warp
    # (staticaxi.cpp:608-615); ext* are in problem units -> cm
    labels = [l for l in problem.labellist if not l.is_hole()]
    is_ext = np.array([labels[i].IsExternal for i in pk.lbl], bool)
    if is_ext.any():
        u = pk.units
        extRo = problem.extRo * u
        extRi = problem.extRi * u
        extZo = problem.extZo * u
        Z = v[:, :, 1].mean(axis=1) - extZo
        kludge = (R * R + Z * Z) * extRi / (extRo ** 3)
        mu1 = np.where(is_ext, mu1 / kludge, mu1)
        mu2 = np.where(is_ext, mu2 / kludge, mu2)

    nonlinear = bool(pk.nonlinear.any())
    nl = pk.nonlinear

    # representative coordinates per reduced DOF (AMG aggregation)
    dof_coords = np.zeros((pk.nreduced, 2))
    dof_coords[pk.ridx] = pk.xy

    sess = solver.Session()
    V = np.zeros(pk.nreduced)
    relax = 1.0
    res = 0.0
    lastres = 0.0
    iters_total = 0
    rel_resid = 0.0
    dev_state = None
    dev_runs = 0
    it_shift = 0       # extra global iterations from device runs
    dev_handoff = False
    dsess = None
    if devices:
        from ..parallel.driver import DistributedSession
        dsess = DistributedSession(devices, mesh=device_mesh)

    for it in range(max_newton if nonlinear else 1):
        # the Newton middle runs on device in one dispatch
        # (ops/newton.py::run with axi=True); the accepting pass at the
        # full contract Precision stays on host below
        if (dev_state is not None and dev_runs < 2 and it > 0
                and res >= 3e4 * problem.Precision
                and sess.band_amg is not None):
            from ..ops import newton as newton_dev
            from ..ops import solver as solver_mod
            dn, has_lam = dev_state
            with profiling.phase("device newton"):
                from .magnetostatics import _dn_cg_budget, \
                    _dn_scatter_mode
                amg_rest, dense, _abf = newton_dev.strip_fine_band(
                    sess.band_amg)
                # budget-bounded dispatch chain (see the planar fused
                # loop): one unbounded dispatch at 1M-class sizes kills
                # the tunneled TPU worker; 1M-class bands switch to the
                # single-step scatter mode (newton.run_scatter)
                cg_budget = _dn_cg_budget(sess)
                use_scatter = _dn_scatter_mode(sess)
                target = max(90.0 * problem.Precision, 3e-6)
                Vd = jnp.asarray(V, jnp.float32)
                base_it = float(it + it_shift)
                relax_d, res_d, lastres_d = relax, res, lastres
                steps = 0
                cgit = 0.0
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
                                bt=sess.bt, has_lam=has_lam, axi=True,
                                inner_iter=(min(400, cg_budget)
                                            if cg_budget else 400))
                    else:
                        Vd, dense, dvec, oob_vals, stats = newton_dev.run(
                            dn, amg_rest, dense, Vd, state,
                            tol_floor=max(problem.Precision, 3e-7),
                            target_res=target,
                            bt=sess.bt, has_lam=has_lam, axi=True,
                            cg_budget=cg_budget)
                    prev_res = res_d
                    relax_d, res_d, lastres_d, ksteps, cg_sub = \
                        np.asarray(stats, np.float64)
                    steps += int(ksteps)
                    base_it += int(ksteps)
                    cgit += cg_sub
                    if use_scatter:
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
                    # keep the original per-run step-cap semantics: the
                    # chain of budget-bounded dispatches must not allow
                    # 12 x 30 device Newton steps
                    if steps >= 30:
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
            # the device loop exits at an f32 noise floor; entering the
            # host tail over-damped makes it crawl (same reasoning as
            # the planar path)
            relax = max(float(relax_d), 0.5)
            lastres = float(lastres_d)
            res = float(res_d)
            # the device residuals are f32-floor values; comparing the
            # next host f64 displacement against them would trip the
            # oscillation damping spuriously
            dev_handoff = True
            continue
        dev_handoff_prev = dev_handoff
        dev_handoff = False
        Mn = np.zeros((T, 3, 3))
        be = be_static
        if it > 0:
            Vl = pk.rsign[pk.tris] * V[pk.ridx[pk.tris]]
            # B^2 from the energy quadratic form (staticaxi.cpp:510-521)
            MxMy0 = Mx + My
            MxMy1 = Mx + My / (f * f)[:, None, None]
            MxMy2 = Mx / (f * f)[:, None, None] + My
            Mb = np.where((lt == 0)[:, None, None], MxMy0,
                          np.where((lt == 1)[:, None, None], MxMy1, MxMy2))
            vv_vec = np.einsum("tjw,tw->tj", Mb, Vl)
            dv_en = np.einsum("tj,tj->t", Vl, vv_vec) * (1e4 * c * c / vol)
            Bmag = np.sqrt(np.abs(dv_en))
            vv, dv = assembly.hermite_vdv(Bmag, pk.bh_B, pk.bh_H, pk.bh_S)
            mu_el = 1.0 / (MU0 * vv)
            mu1_new = np.where(lt == 0, mu_el,
                               np.where(lt == 1, mu_el * f,
                                        mu_el / (f + mu_el * (1 - f))))
            mu2_new = np.where(lt == 0, mu_el,
                               np.where(lt == 1,
                                        mu_el / (f + mu_el * (1 - f)),
                                        mu_el * f))
            mu1 = np.where(nl, mu1_new, mu1)
            mu2 = np.where(nl, mu2_new, mu2)
            # Newton matrices (staticaxi.cpp:523-600)
            v0 = np.einsum("tjw,tw->tj", Mx + My, Vl)
            Mn0 = (-200.0 * c ** 3 * dv / vol)[:, None, None] * \
                v0[:, :, None] * v0[:, None, :]
            v1 = np.einsum("tjw,tw->tj", My / f[:, None, None] + Mx, Vl)
            u1 = np.einsum("tjw,tw->tj",
                           My / f[:, None, None] + f[:, None, None] * Mx, Vl)
            Mn1 = (-100.0 * c ** 3 * dv / vol)[:, None, None] * (
                v1[:, :, None] * u1[:, None, :]
                + v1[:, None, :] * u1[:, :, None])
            v2 = np.einsum("tjw,tw->tj", Mx / f[:, None, None] + My, Vl)
            u2 = np.einsum("tjw,tw->tj",
                           Mx / f[:, None, None] + f[:, None, None] * My, Vl)
            Mn2 = (-100.0 * c ** 3 * dv / vol)[:, None, None] * (
                v2[:, :, None] * u2[:, None, :]
                + v2[:, None, :] * u2[:, :, None])
            Mn = np.where((lt == 0)[:, None, None], Mn0,
                          np.where((lt == 1)[:, None, None], Mn1, Mn2))
            Mn = np.where(nl[:, None, None], Mn, 0.0)
            be = be + np.einsum("tjk,tk->tj", Mn, Vl)

        Me = (Mx / mu2[:, None, None] + My / mu1[:, None, None] + Mn)
        blocks = _element_blocks(pk, Me)
        b = _rhs(pk, geom, be)

        # inexact-Newton forcing, same schedule as the planar path: the
        # accepting solve is always at full contract Precision
        if not nonlinear:
            tol_it = problem.Precision
        elif it == 0:
            tol_it = max(problem.Precision, 1e-4)
        elif res < 3e4 * problem.Precision:
            tol_it = problem.Precision
        else:
            tol_it = max(problem.Precision, min(1e-4, 0.03 * res))

        V_old = V
        if dsess is not None:
            with profiling.phase("distributed solve"):
                V, rel_resid, cg_iters = dsess.solve(
                    blocks, b, pk.fixed_mask, pk.fixed_vals, tol_it,
                    x0=V if it > 0 else None, coords=dof_coords)
        else:
            V, rel_resid, cg_iters = solver.solve(
                blocks, b, pk.fixed_mask, pk.fixed_vals, tol_it,
                x0=V if it > 0 else None, coords=dof_coords, session=sess,
                changed=[nl] if nonlinear else None)
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
        if it + it_shift > 5:
            if res > lastres and relax > 0.125 and not dev_handoff_prev:
                relax /= 2.0
            else:
                relax += 0.1 * (1.0 - relax)
            V = relax * V + (1.0 - relax) * V_old
        # accept only after a full-Precision solve (the inexact early
        # iterations run at a looser linear tolerance)
        if (res < 100.0 * problem.Precision and it > 0
                and tol_it <= problem.Precision):
            break

        # after the it-0 solve has built the band hierarchy and value
        # maps, intermediate Newton iterations can run on device
        if (it == 0 and nonlinear and dev_state is None
                and dsess is None
                and not os.environ.get("XFEMM_TPU_NO_DEVICE_NEWTON")):
            from ..ops import newton as newton_dev
            b_static = _rhs(pk, geom, be_static)
            made = newton_dev.setup(pk, geom, Mx, My, sess, b_static, c,
                                    axi=True)
            if made is not None:
                dev_state = made

    # flux output: A_i = V_i * c * 2*pi*r_m (staticaxi.cpp:779-784)
    Vfull = V[pk.ridx] * pk.rsign
    A = Vfull * c * (pk.xy[:, 0] * 0.01 * 2.0 * PI)

    label_case = _label_case(pk, T, len(labels))
    return MagSolution(problem=problem, mesh=mesh, A=A,
                       circuits=pk.circuits, label_case=label_case,
                       iterations=iters_total, residual=float(rel_resid))


def _label_case(pk: PackedMagnetostatic, T: int, nlabels: int):
    label_case = np.zeros((nlabels, 2))
    seen = {}
    for e in range(T):
        seen[int(pk.lbl[e])] = int(pk.circuit[e])
    for k in range(nlabels):
        ci = seen.get(k, -1)
        if ci < 0:
            label_case[k] = (1, 0.0)
        else:
            circ = pk.circuits[ci]
            val = circ.dV if circ.Case == 0 else circ.J
            val = val.real if isinstance(val, complex) else val
            label_case[k] = (circ.Case, val)
    return label_case
