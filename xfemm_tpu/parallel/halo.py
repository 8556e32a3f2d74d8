"""Distributed Jacobi-PCG with ring halo exchange (shard_map over ICI).

Runs the whole CG iteration inside one ``jax.shard_map`` over a 1-D device
mesh: each device applies its slab's element blocks to its extended local
vector ``[left-halo | owned]``, exchanges boundary strips with a single
``ppermute`` ring shift in each direction per matvec (these ride the ICI
links on real hardware), and reduces dot products with ``psum``. No global
gather ever happens; memory and FLOPs scale with the slab size.

This is the TPU-native replacement for the scale axis the reference lacks
entirely (SURVEY.md section 2.11: no threading, no MPI -- its only scaling
lever is Cuthill-McKee bandwidth reduction).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .partition import PartitionedSystem


class DeviceArrays(NamedTuple):
    """Pytree of per-device (leading-axis-sharded) arrays."""

    blocks_idx: tuple
    blocks_sign: tuple
    blocks_mat: tuple
    fixed_mask: jnp.ndarray
    fixed_vals: jnp.ndarray
    valid: jnp.ndarray


def device_arrays(ps: PartitionedSystem, dtype=jnp.float64) -> DeviceArrays:
    return DeviceArrays(
        blocks_idx=tuple(jnp.asarray(b[0]) for b in ps.blocks),
        blocks_sign=tuple(jnp.asarray(b[1], dtype) for b in ps.blocks),
        blocks_mat=tuple(jnp.asarray(b[2], dtype) for b in ps.blocks),
        fixed_mask=jnp.asarray(ps.fixed_mask),
        fixed_vals=jnp.asarray(ps.fixed_vals, dtype),
        valid=jnp.asarray(ps.valid),
    )


def _local_matvec(da: DeviceArrays, x_own, hmax, axis_name):
    """One distributed operator application on owned slots (per device)."""
    nmax = x_own.shape[0]
    ndev = jax.lax.psum(1, axis_name)
    me = jax.lax.axis_index(axis_name)

    # pull the left neighbor's boundary tail into our halo strip
    tail = x_own[nmax - hmax:]
    halo = jax.lax.ppermute(tail, axis_name,
                            [(d, (d + 1) % ndev) for d in range(ndev)])
    halo = jnp.where(me == 0, 0.0, halo)
    x_ext = jnp.concatenate([halo, x_own])

    y_ext = jnp.zeros_like(x_ext)
    for idx, sign, mat in zip(da.blocks_idx, da.blocks_sign, da.blocks_mat):
        xe = sign * x_ext[idx]
        ye = jnp.einsum("ekl,el->ek", mat, xe)
        y_ext = y_ext.at[idx.reshape(-1)].add((sign * ye).reshape(-1))

    # push halo contributions back to their owner (right-to-left shift)
    back = jax.lax.ppermute(y_ext[:hmax], axis_name,
                            [(d, (d - 1) % ndev) for d in range(ndev)])
    back = jnp.where(me == ndev - 1, 0.0, back)
    y_own = y_ext[hmax:]
    y_own = y_own.at[nmax - hmax:].add(back)
    return jnp.where(da.valid, y_own, 0.0)


def _pcg_shard(da: DeviceArrays, b, x0, diag, tol, max_iter, hmax,
               axis_name, amg=None, coarse=None):
    fixed = da.fixed_mask

    def op(x):
        xf = jnp.where(fixed, 0.0, x)
        y = _local_matvec(da, xf, hmax, axis_name)
        return jnp.where(fixed, x, y)

    def pdot(u, v):
        return jax.lax.psum(jnp.dot(u, v), axis_name)

    invd = jnp.where(da.valid, 1.0 / diag, 0.0)

    if amg is None:
        def prec_local(r):
            return invd * r
    else:
        from ..ops.amg import vcycle

        def prec_local(r):
            # additive Schwarz: local V-cycle on the owned block, no
            # communication (the local matrix carries identity rows at
            # Dirichlet/padding slots, so those components pass through)
            z = vcycle(amg, r)
            return jnp.where(da.valid, z, 0.0)

    if coarse is None:
        prec = prec_local
    else:
        coarse_inv, aggc = coarse
        nmax = da.fixed_mask.shape[0]
        m = (nmax + aggc - 1) // aggc

        def prec(r):
            # two-level additive Schwarz: add a GLOBAL coarse correction
            # over per-shard contiguous aggregates. One all_gather of
            # ndev*m values, replicated tiny dense solve, local scatter.
            z = prec_local(r)
            rm = jnp.where(da.fixed_mask, 0.0, jnp.where(da.valid, r, 0.0))
            pad = m * aggc - nmax
            rc = jnp.pad(rm, (0, pad)).reshape(m, aggc).sum(axis=1)
            rc_all = jax.lax.all_gather(rc, axis_name).reshape(-1)
            zc = coarse_inv @ rc_all
            me = jax.lax.axis_index(axis_name)
            zc_me = jax.lax.dynamic_slice(zc, (me * m,), (m,))
            zfine = jnp.repeat(zc_me, aggc)[:nmax]
            zfine = jnp.where(da.fixed_mask | ~da.valid, 0.0, zfine)
            return z + zfine

    res0 = pdot(invd * b, b)
    res0 = jnp.where(res0 == 0.0, 1.0, res0)

    r = b - op(x0)
    z = prec(r)
    p = z
    res = pdot(z, r)

    # stall guard: a non-contracting preconditioner (e.g. an operator
    # the Schwarz V-cycle cannot handle) must not burn max_iter -- exit
    # once no 10% improvement happened within the window so the driver
    # can latch the preconditioner off and retry (driver.py)
    stall_window = 500

    def cond(state):
        _, _, _, res, it, _best, since = state
        return jnp.logical_and(
            jnp.sqrt(jnp.abs(res) / res0) > tol,
            jnp.logical_and(it < max_iter, since < stall_window))

    def body(state):
        x, r, p, res, it, best, since = state
        u = op(p)
        delta = res / pdot(p, u)
        x = x + delta * p
        r = r - delta * u
        z = prec(r)
        res_new = pdot(z, r)
        p = z + (res_new / res) * p
        improved = jnp.abs(res_new) < 0.9 * best
        best = jnp.minimum(best, jnp.abs(res_new))
        since = jnp.where(improved, 0, since + 1)
        return x, r, p, res_new, it + 1, best, since

    x, r, p, res, it, _, _ = jax.lax.while_loop(
        cond, body, (x0, r, p, res, jnp.array(0, jnp.int32),
                     jnp.abs(res), jnp.array(0, jnp.int32)))
    return x, jnp.sqrt(jnp.abs(res) / res0), it


def make_distributed_pcg(mesh: Mesh, hmax: int, max_iter: int = 200000,
                         axis_name: str = "d", amg=None, coarse=None):
    """Build a jitted distributed PCG over a 1-D device mesh.

    Returns ``solve(da, b_dev, fixed_vals_dev, tol, x0_dev)`` operating on
    (ndev, nmax) arrays sharded along the device axis. ``amg`` is an
    optional stacked per-shard hierarchy (parallel/schwarz.py) applied as
    an additive-Schwarz V-cycle preconditioner.
    """
    spec = P(axis_name)

    coarse_aggc = None if coarse is None else coarse[1]
    cache = {}

    def solve(da: DeviceArrays, b, diag, tol, x0):
        nblk = len(da.blocks_idx)
        # one traced executable per block-structure signature; Newton
        # iterations and rotor sweeps reuse it (only values change)
        key = (nblk,) + tuple(a.shape for a in da.blocks_idx)
        fn = cache.get(key)
        if fn is None:
            da_spec = DeviceArrays(blocks_idx=(spec,) * nblk,
                                   blocks_sign=(spec,) * nblk,
                                   blocks_mat=(spec,) * nblk,
                                   fixed_mask=spec, fixed_vals=spec,
                                   valid=spec)
            out_specs = (spec, P(), P())

            def kern(da_l, b_l, diag_l, x0_l, tol_l, amg_l, coarse_l):
                # leading singleton device axis is stripped by shard_map
                da_s = DeviceArrays(
                    blocks_idx=tuple(a[0] for a in da_l.blocks_idx),
                    blocks_sign=tuple(a[0] for a in da_l.blocks_sign),
                    blocks_mat=tuple(a[0] for a in da_l.blocks_mat),
                    fixed_mask=da_l.fixed_mask[0],
                    fixed_vals=da_l.fixed_vals[0],
                    valid=da_l.valid[0])
                amg_s = (None if amg_l is None
                         else jax.tree_util.tree_map(lambda a: a[0], amg_l))
                coarse_s = (None if coarse_l is None
                            else (coarse_l, coarse_aggc))
                x, rr, it = _pcg_shard(da_s, b_l[0], x0_l[0], diag_l[0],
                                       tol_l, max_iter, hmax, axis_name,
                                       amg=amg_s, coarse=coarse_s)
                return x[None], rr, it

            amg_spec = (None if amg is None
                        else jax.tree_util.tree_map(lambda _: spec, amg))
            coarse_spec = None if coarse is None else P()   # replicated
            fn = jax.jit(jax.shard_map(
                kern, mesh=mesh,
                in_specs=(da_spec, spec, spec, spec, P(),
                          amg_spec, coarse_spec),
                out_specs=out_specs))
            cache[key] = fn
        return fn(da, b, diag, x0, jnp.asarray(tol), amg,
                  None if coarse is None else coarse[0])

    return solve


def distributed_diag(mesh: Mesh, da: DeviceArrays, hmax: int,
                     axis_name: str = "d"):
    """Assembled operator diagonal in device layout (for Jacobi)."""
    spec = P(axis_name)

    def kern(da_l):
        da_s = DeviceArrays(
            blocks_idx=tuple(a[0] for a in da_l.blocks_idx),
            blocks_sign=tuple(a[0] for a in da_l.blocks_sign),
            blocks_mat=tuple(a[0] for a in da_l.blocks_mat),
            fixed_mask=da_l.fixed_mask[0],
            fixed_vals=da_l.fixed_vals[0],
            valid=da_l.valid[0])
        nmax = da_s.fixed_mask.shape[0]
        ndev = jax.lax.psum(1, axis_name)
        me = jax.lax.axis_index(axis_name)
        d_ext = jnp.zeros(hmax + nmax, da_s.blocks_mat[0].dtype)
        for idx, sign, mat in zip(da_s.blocks_idx, da_s.blocks_sign,
                                  da_s.blocks_mat):
            dd = jnp.einsum("ekk->ek", mat)
            d_ext = d_ext.at[idx.reshape(-1)].add(dd.reshape(-1))
        back = jax.lax.ppermute(d_ext[:hmax], axis_name,
                                [(d, (d - 1) % ndev) for d in range(ndev)])
        back = jnp.where(me == ndev - 1, 0.0, back)
        d_own = d_ext[hmax:]
        d_own = d_own.at[nmax - hmax:].add(back)
        d_own = jnp.where(da_s.fixed_mask, 1.0, d_own)
        d_own = jnp.where(da_s.valid, d_own, 1.0)
        return d_own[None]

    nblk = len(da.blocks_idx)
    in_spec = DeviceArrays(blocks_idx=(spec,) * nblk,
                           blocks_sign=(spec,) * nblk,
                           blocks_mat=(spec,) * nblk,
                           fixed_mask=spec, fixed_vals=spec, valid=spec)
    fn = jax.shard_map(kern, mesh=mesh, in_specs=(in_spec,), out_specs=spec)
    return jax.jit(fn)(da)


class DeviceArraysC(NamedTuple):
    """Per-device arrays for the complex-symmetric ((re, im) pair) path.
    The TPU cannot hold complex dtypes on the wire (see ops/solver.py
    ``_pcg_csym_pairs``); matrices ship as separate real/imag parts."""

    blocks_idx: tuple
    blocks_sign: tuple
    blocks_mre: tuple
    blocks_mim: tuple
    fixed_mask: jnp.ndarray
    valid: jnp.ndarray


def _local_matvec_c(dc: DeviceArraysC, xr_own, xi_own, hmax, axis_name):
    """Distributed (Ar + iAi)(xr + i xi) on owned slots, one halo
    exchange of the stacked (re, im) boundary strip per application."""
    nmax = xr_own.shape[0]
    ndev = jax.lax.psum(1, axis_name)
    me = jax.lax.axis_index(axis_name)

    tails = jnp.stack([xr_own[nmax - hmax:], xi_own[nmax - hmax:]])
    halo = jax.lax.ppermute(tails, axis_name,
                            [(d, (d + 1) % ndev) for d in range(ndev)])
    halo = jnp.where(me == 0, 0.0, halo)
    xr_ext = jnp.concatenate([halo[0], xr_own])
    xi_ext = jnp.concatenate([halo[1], xi_own])

    yr_ext = jnp.zeros_like(xr_ext)
    yi_ext = jnp.zeros_like(xi_ext)
    for idx, sign, mr, mi in zip(dc.blocks_idx, dc.blocks_sign,
                                 dc.blocks_mre, dc.blocks_mim):
        ger = sign * xr_ext[idx]
        gei = sign * xi_ext[idx]
        er = (jnp.einsum("ekl,el->ek", mr, ger)
              - jnp.einsum("ekl,el->ek", mi, gei))
        ei = (jnp.einsum("ekl,el->ek", mr, gei)
              + jnp.einsum("ekl,el->ek", mi, ger))
        flat = idx.reshape(-1)
        yr_ext = yr_ext.at[flat].add((sign * er).reshape(-1))
        yi_ext = yi_ext.at[flat].add((sign * ei).reshape(-1))

    backs = jnp.stack([yr_ext[:hmax], yi_ext[:hmax]])
    back = jax.lax.ppermute(backs, axis_name,
                            [(d, (d - 1) % ndev) for d in range(ndev)])
    back = jnp.where(me == ndev - 1, 0.0, back)
    yr = yr_ext[hmax:].at[nmax - hmax:].add(back[0])
    yi = yi_ext[hmax:].at[nmax - hmax:].add(back[1])
    return (jnp.where(dc.valid, yr, 0.0), jnp.where(dc.valid, yi, 0.0))


def _pcg_csym_shard(dc: DeviceArraysC, br, bi, x0r, x0i, dr_, di_, tol,
                    max_iter, hmax, axis_name):
    """Distributed complex-symmetric Jacobi-PCG (the bilinear z.r form
    of cspars.cpp:822), (re, im) pairs throughout, psum reductions."""
    fixed = dc.fixed_mask

    def op(xr, xi):
        xr_f = jnp.where(fixed, 0.0, xr)
        xi_f = jnp.where(fixed, 0.0, xi)
        yr, yi = _local_matvec_c(dc, xr_f, xi_f, hmax, axis_name)
        return jnp.where(fixed, xr, yr), jnp.where(fixed, xi, yi)

    def cdot(ar, ai, br_, bi_):
        return (jax.lax.psum(jnp.sum(ar * br_ - ai * bi_), axis_name),
                jax.lax.psum(jnp.sum(ar * bi_ + ai * br_), axis_name))

    def cdiv(ar, ai, br_, bi_):
        den = br_ * br_ + bi_ * bi_
        return ((ar * br_ + ai * bi_) / den,
                (ai * br_ - ar * bi_) / den)

    dmag2 = dr_ * dr_ + di_ * di_
    dmag2 = jnp.where(dmag2 == 0.0, 1.0, dmag2)
    invd_r = jnp.where(dc.valid, dr_ / dmag2, 0.0)
    invd_i = jnp.where(dc.valid, -di_ / dmag2, 0.0)

    def prec(rr, ri):
        return invd_r * rr - invd_i * ri, invd_r * ri + invd_i * rr

    bb_r = br * br - bi * bi
    bb_i = 2.0 * br * bi
    s_r = jax.lax.psum(jnp.sum(invd_r * bb_r - invd_i * bb_i), axis_name)
    s_i = jax.lax.psum(jnp.sum(invd_i * bb_r + invd_r * bb_i), axis_name)
    res0 = jnp.hypot(s_r, s_i)
    res0 = jnp.where(res0 == 0.0, 1.0, res0)

    ar0, ai0 = op(x0r, x0i)
    rr, ri = br - ar0, bi - ai0
    zr, zi = prec(rr, ri)
    pr, pi = zr, zi
    res_r, res_i = cdot(zr, zi, rr, ri)

    def cond(st):
        (_, _, _, _, _, _, res_r, res_i, it) = st
        return jnp.logical_and(
            jnp.sqrt(jnp.hypot(res_r, res_i) / res0) > tol,
            it < max_iter)

    def body_fixed(st):
        (xr, xi, rr, ri, pr, pi, res_r, res_i, it) = st
        ur, ui = op(pr, pi)
        pap_r, pap_i = cdot(pr, pi, ur, ui)
        a_r, a_i = cdiv(res_r, res_i, pap_r, pap_i)
        xr = xr + a_r * pr - a_i * pi
        xi = xi + a_r * pi + a_i * pr
        rr = rr - (a_r * ur - a_i * ui)
        ri = ri - (a_r * ui + a_i * ur)
        zr, zi = prec(rr, ri)
        nres_r, nres_i = cdot(zr, zi, rr, ri)
        b_r, b_i = cdiv(nres_r, nres_i, res_r, res_i)
        pr_new = zr + b_r * pr - b_i * pi
        pi_new = zi + b_r * pi + b_i * pr
        return xr, xi, rr, ri, pr_new, pi_new, nres_r, nres_i, it + 1

    st = (x0r, x0i, rr, ri, pr, pi, res_r, res_i, jnp.array(0, jnp.int32))
    st = jax.lax.while_loop(cond, body_fixed, st)
    (xr, xi, rr, ri, pr, pi, res_r, res_i, it) = st
    return xr, xi, jnp.sqrt(jnp.hypot(res_r, res_i) / res0), it


def make_distributed_csym_pcg(mesh: Mesh, hmax: int,
                              max_iter: int = 200000,
                              axis_name: str = "d"):
    """Cached jitted distributed complex-symmetric PCG factory."""
    spec = P(axis_name)
    cache = {}

    def solve(dc: DeviceArraysC, br, bi, dr_, di_, tol, x0r, x0i):
        nblk = len(dc.blocks_idx)
        key = (nblk,) + tuple(a.shape for a in dc.blocks_idx)
        fn = cache.get(key)
        if fn is None:
            dc_spec = DeviceArraysC(
                blocks_idx=(spec,) * nblk, blocks_sign=(spec,) * nblk,
                blocks_mre=(spec,) * nblk, blocks_mim=(spec,) * nblk,
                fixed_mask=spec, valid=spec)

            def kern(dc_l, br_l, bi_l, dr_l, di_l, x0r_l, x0i_l, tol_l):
                dc_s = DeviceArraysC(
                    blocks_idx=tuple(a[0] for a in dc_l.blocks_idx),
                    blocks_sign=tuple(a[0] for a in dc_l.blocks_sign),
                    blocks_mre=tuple(a[0] for a in dc_l.blocks_mre),
                    blocks_mim=tuple(a[0] for a in dc_l.blocks_mim),
                    fixed_mask=dc_l.fixed_mask[0],
                    valid=dc_l.valid[0])
                xr, xi, rr, it = _pcg_csym_shard(
                    dc_s, br_l[0], bi_l[0], x0r_l[0], x0i_l[0],
                    dr_l[0], di_l[0], tol_l, max_iter, hmax, axis_name)
                return xr[None], xi[None], rr, it

            fn = jax.jit(jax.shard_map(
                kern, mesh=mesh,
                in_specs=(dc_spec, spec, spec, spec, spec, spec, spec,
                          P()),
                out_specs=(spec, spec, P(), P())))
            cache[key] = fn
        return fn(dc, br, bi, dr_, di_, x0r, x0i, jnp.asarray(tol))

    return solve


def make_distributed_matvec(mesh: Mesh, hmax: int, axis_name: str = "d"):
    """Cached jitted distributed matvec factory (same layout as the
    PCG): ``mv(da, x_dev) -> y_dev``."""
    spec = P(axis_name)
    cache = {}

    def mv(da: DeviceArrays, x):
        nblk = len(da.blocks_idx)
        key = (nblk,) + tuple(a.shape for a in da.blocks_idx)
        fn = cache.get(key)
        if fn is None:
            in_spec = DeviceArrays(blocks_idx=(spec,) * nblk,
                                   blocks_sign=(spec,) * nblk,
                                   blocks_mat=(spec,) * nblk,
                                   fixed_mask=spec, fixed_vals=spec,
                                   valid=spec)

            def kern(da_l, x_l):
                da_s = DeviceArrays(
                    blocks_idx=tuple(a[0] for a in da_l.blocks_idx),
                    blocks_sign=tuple(a[0] for a in da_l.blocks_sign),
                    blocks_mat=tuple(a[0] for a in da_l.blocks_mat),
                    fixed_mask=da_l.fixed_mask[0],
                    fixed_vals=da_l.fixed_vals[0],
                    valid=da_l.valid[0])
                return _local_matvec(da_s, x_l[0], hmax, axis_name)[None]

            fn = jax.jit(jax.shard_map(kern, mesh=mesh,
                                       in_specs=(in_spec, spec),
                                       out_specs=spec))
            cache[key] = fn
        return fn(da, x)

    return mv


def solve_distributed(ps: PartitionedSystem, b: "np.ndarray",
                      tol: float, mesh: Mesh, x0=None,
                      max_iter: int = 200000, schwarz: bool = False):
    """End-to-end distributed solve from a PartitionedSystem.

    ``b`` is in reduced-DOF numbering; returns (x_reduced, relres, iters).
    Dirichlet values are imposed via projection exactly like the
    single-chip path (ops/solver.py).
    """
    import numpy as np

    da = device_arrays(ps)
    diag = distributed_diag(mesh, da, ps.hmax)

    g_dev = jnp.asarray(np.where(ps.fixed_mask, ps.fixed_vals, 0.0))
    # rhs adjustment b - A g computed with the distributed matvec
    spec = P("d")
    nblk = len(da.blocks_idx)
    in_spec = DeviceArrays(blocks_idx=(spec,) * nblk,
                           blocks_sign=(spec,) * nblk,
                           blocks_mat=(spec,) * nblk,
                           fixed_mask=spec, fixed_vals=spec, valid=spec)

    def mv_kern(da_l, x_l):
        da_s = DeviceArrays(
            blocks_idx=tuple(a[0] for a in da_l.blocks_idx),
            blocks_sign=tuple(a[0] for a in da_l.blocks_sign),
            blocks_mat=tuple(a[0] for a in da_l.blocks_mat),
            fixed_mask=da_l.fixed_mask[0], fixed_vals=da_l.fixed_vals[0],
            valid=da_l.valid[0])
        return _local_matvec(da_s, x_l[0], ps.hmax, "d")[None]

    mv = jax.jit(jax.shard_map(mv_kern, mesh=mesh,
                               in_specs=(in_spec, spec), out_specs=spec))
    bg = mv(da, g_dev)
    b_dev = jnp.asarray(ps.to_devices(b))
    rhs = jnp.where(da.fixed_mask, da.fixed_vals, b_dev - bg)
    rhs = jnp.where(da.valid, rhs, 0.0)
    if x0 is None:
        x0_dev = g_dev
    else:
        x0_dev = jnp.asarray(ps.to_devices(x0))
        x0_dev = jnp.where(da.fixed_mask, da.fixed_vals, x0_dev)

    amg = None
    coarse = None
    if schwarz:
        from .schwarz import build_global_coarse, build_schwarz_amg
        amg = build_schwarz_amg(ps, dtype=np.float64)
        coarse = build_global_coarse(ps)
    solver = make_distributed_pcg(mesh, ps.hmax, max_iter, amg=amg,
                                  coarse=coarse)
    x_dev, relres, iters = solver(da, rhs, diag, tol, x0_dev)
    return ps.from_devices(np.asarray(x_dev)), float(relres), int(iters)
