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

    def cond(state):
        _, _, _, res, it = state
        return jnp.logical_and(jnp.sqrt(jnp.abs(res) / res0) > tol,
                               it < max_iter)

    def body(state):
        x, r, p, res, it = state
        u = op(p)
        delta = res / pdot(p, u)
        x = x + delta * p
        r = r - delta * u
        z = prec(r)
        res_new = pdot(z, r)
        p = z + (res_new / res) * p
        return x, r, p, res_new, it + 1

    x, r, p, res, it = jax.lax.while_loop(
        cond, body, (x0, r, p, res, jnp.array(0, jnp.int32)))
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

    def solve(da: DeviceArrays, b, diag, tol, x0):
        nblk = len(da.blocks_idx)
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
            x, rr, it = _pcg_shard(da_s, b_l[0], x0_l[0], diag_l[0], tol_l,
                                   max_iter, hmax, axis_name, amg=amg_s,
                                   coarse=coarse_s)
            return x[None], rr, it

        amg_spec = (None if amg is None
                    else jax.tree_util.tree_map(lambda _: spec, amg))
        coarse_spec = None if coarse is None else P()   # replicated
        fn = jax.shard_map(kern, mesh=mesh,
                           in_specs=(da_spec, spec, spec, spec, P(),
                                     amg_spec, coarse_spec),
                           out_specs=out_specs)
        return jax.jit(fn)(da, b, diag, x0, jnp.asarray(tol), amg,
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
