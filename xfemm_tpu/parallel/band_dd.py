"""Sharded dense-band engine: the multi-chip fast path.

The first-generation distributed stack (halo.py element-block SpMV +
schwarz.py aggregation AMG) scales correctness, not throughput: its
operator is a per-element gather/scatter (the access pattern the
single-chip band engine exists to avoid, ops/band.py:1-17) and its
preconditioner a smoothed-aggregation V-cycle that struggles on
saturated Newton operators. This module shards the band engine itself:

* DOFs are split into ``ndev`` coordinate slabs (the same recursive
  bisection the single-chip planner uses, ops/band.py
  ``partition_order``), each part is reverse-Cuthill-McKee ordered, and
  every part's in-part matrix is packed as a dense band with ONE common
  (NT, R, W, shift0) geometry -- a (P, NT, R, W) array sharded on its
  leading axis, so each device streams its own band through the same
  MXU/pallas kernels as the single-chip path (ops/pallas_band.py).
* Cross-part couplings (a ~1% fringe for 2-D meshes) live in a padded
  per-part COO sidecar applied against an ``all_gather`` of the
  solution vector -- one small collective per operator application
  riding ICI, next to a multi-GB local band stream.
* The preconditioner is additive Schwarz with EXACT local solves: each
  device factors its own band block-tridiagonally (ops/blocktri.py)
  and applies the frozen factor locally, zero communication. Local
  bandwidth shrinks ~sqrt(P) with the partition, so the per-part
  factor is cheap exactly where the single-chip factor would blow HBM.

This is the TPU-native scale-out of the reference's only scaling lever
(Cuthill-McKee bandwidth reduction + sequential PCG, spars.cpp:238);
SURVEY.md section 2.11 records that the reference has no parallelism
at all.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp
from scipy.sparse import csgraph
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import band as band_mod
from ..ops import blocktri
from ..ops.band import BandMatrix
from ..ops.blocktri import BTFactor

CCHUNK = 128
ROW_TILE = 128


class BandDDState(NamedTuple):
    """Host + device state of a sharded band system (pattern-frozen)."""
    ndev: int
    n: int                    # logical (reduced) dimension
    nloc: int                 # padded per-part size (multiple of b)
    perm: np.ndarray          # global permuted order (part-major)
    iperm: np.ndarray
    part_of: np.ndarray       # (n,) part of each PERMUTED position
    loc_of: np.ndarray        # (n,) local slot of each permuted position
    # band geometry (common across parts)
    shift0: int
    W: int
    NT: int
    # device fill maps (flattened over all in-part entries)
    fill_pos: jnp.ndarray     # flat position into (P*NT*R*W)
    fill_sel: jnp.ndarray     # source position in Ap.data
    pad_pos: jnp.ndarray      # unit-diagonal band slots for padding rows
    # sidecar (padded per part): (P, M)
    oob_rows: jnp.ndarray
    oob_cols: jnp.ndarray     # global padded index part*nloc + loc
    oob_sel: jnp.ndarray      # source in Ap.data (0 for padding)
    oob_w: jnp.ndarray        # 1.0 real, 0.0 padding
    # block-tridiagonal factor structure per part
    b: int
    NB: int
    bt_maps: list             # per-part BTDeviceMaps
    bt_lsel: list             # per-part Ap.data positions (-1 -> 1.0)
    # CSR entry map At order -> Ap order
    data_map: np.ndarray
    Ap_pattern: object        # Ap with pattern only (indices/indptr)


def _rcb_parts(coords: np.ndarray, ndev: int) -> np.ndarray:
    """Recursive coordinate bisection into ndev equal parts (ndev is a
    power of two for clean halving; others fall back to slab split)."""
    n = coords.shape[0]
    part = np.zeros(n, np.int64)
    if ndev & (ndev - 1):
        order = np.argsort(coords[:, 0], kind="stable")
        for d, ids in enumerate(np.array_split(order, ndev)):
            part[ids] = d
        return part

    def rec(ids, lo, k):
        if k == 1:
            part[ids] = lo
            return
        c = coords[ids]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        order = ids[np.argsort(c[:, axis], kind="stable")]
        half = order.size // 2
        rec(order[:half], lo, k // 2)
        rec(order[half:], lo + k // 2, k // 2)

    rec(np.arange(n), 0, ndev)
    return part


def setup_band_dd(At: sp.csr_matrix, coords: np.ndarray,
                  ndev: int) -> "BandDDState | None":
    """Build the sharded band structure from the (Dirichlet-eliminated)
    assembled CSR. Returns None when ineligible (a part's bandwidth
    exceeds the largest block size)."""
    n = At.shape[0]
    part = _rcb_parts(np.asarray(coords, np.float64), ndev)

    # per-part RCM, part-major global permutation
    perm_parts = []
    for p in range(ndev):
        ids = np.nonzero(part == p)[0]
        sub = At[ids][:, ids]
        r = csgraph.reverse_cuthill_mckee(sub, symmetric_mode=True)
        perm_parts.append(ids[r])
    sizes = np.array([len(x) for x in perm_parts])
    perm = np.concatenate(perm_parts)
    iperm = np.empty_like(perm)
    iperm[perm] = np.arange(n)
    offs = np.concatenate([[0], np.cumsum(sizes)])

    Ap = At[perm][:, perm].tocsr()
    Ap.sum_duplicates()

    rows = np.repeat(np.arange(n), np.diff(Ap.indptr)).astype(np.int64)
    cols = Ap.indices.astype(np.int64)
    rpart = np.searchsorted(offs, rows, side="right") - 1
    cpart = np.searchsorted(offs, cols, side="right") - 1
    rloc_g = rows - offs[rpart]
    cloc_g = cols - offs[cpart]
    inpart = rpart == cpart

    # common block size from the max in-part bandwidth
    bw = int(np.abs(rloc_g[inpart] - cloc_g[inpart]).max()) if \
        inpart.any() else 0
    b = blocktri.pick_block(bw)
    if b is None:
        return None
    nloc = int(-(-sizes.max() // b) * b)
    NT = nloc // ROW_TILE

    # ---- unified band geometry over parts ---------------------------
    tile = rloc_g // ROW_TILE
    lo = np.full((ndev, NT), 2 ** 62, np.int64)
    hi = np.full((ndev, NT), -1, np.int64)
    ti = tile[inpart]
    pi = rpart[inpart]
    np.minimum.at(lo, (pi, ti), cloc_g[inpart])
    np.maximum.at(hi, (pi, ti), cloc_g[inpart])
    # empty tiles (padding region of smaller parts) must follow the
    # band diagonal, NOT column 0: lo=0 at tile t gives shift=-t, and a
    # single empty trailing tile then drags shift0 to -NT and the
    # unified window W to the full matrix width (a 50k-wide 20 GB
    # "band" at 100k DOF / 2 parts)
    empty = hi < 0
    tdiag = np.broadcast_to(np.arange(NT)[None, :] * CCHUNK, hi.shape)
    lo[empty] = tdiag[empty]
    hi[empty] = tdiag[empty]
    shift = lo // CCHUNK - np.arange(NT)[None, :]
    shift0 = int(shift.min())
    K = int((hi // CCHUNK - (np.arange(NT)[None, :] + shift0)).max()) + 1
    K = max(K, 1)
    W = K * CCHUNK

    # padding rows' unit diagonals must stay inside the window
    # (wloc = r - (tile+shift0)*cchunk for col == row)
    # r in [0, nloc): wloc = r - (r//R + shift0)*cchunk
    padr = np.concatenate([np.arange(sizes[p], nloc) for p in
                           range(ndev)]) if (sizes < nloc).any() else \
        np.zeros(0, np.int64)
    padp = np.concatenate([np.full(nloc - sizes[p], p, np.int64)
                           for p in range(ndev)]) if padr.size else \
        np.zeros(0, np.int64)
    wl_pad = padr - (padr // ROW_TILE + shift0) * CCHUNK
    while padr.size and (wl_pad.min() < 0 or wl_pad.max() >= W):
        if wl_pad.min() < 0:
            shift0 -= 1
        K += 1
        W = K * CCHUNK
        wl_pad = padr - (padr // ROW_TILE + shift0) * CCHUNK

    wloc = cloc_g - (tile + shift0) * CCHUNK
    ok = inpart & (wloc >= 0) & (wloc < W)
    if not bool(ok[inpart].all()):
        return None   # geometry failed to unify (pathological part)
    rr = rloc_g - tile * ROW_TILE
    fill_pos = (((rpart[inpart] * NT + tile[inpart]) * ROW_TILE
                 + rr[inpart]) * W + wloc[inpart])
    fill_sel = np.nonzero(inpart)[0]
    pad_pos = (((padp * NT + padr // ROW_TILE) * ROW_TILE
                + padr % ROW_TILE) * W + wl_pad)

    # ---- sidecar ------------------------------------------------------
    osel = np.nonzero(~inpart)[0]
    orows = rloc_g[osel]
    ocols = cpart[osel] * nloc + cloc_g[osel]
    opart = rpart[osel]
    M = max(int(np.bincount(opart, minlength=ndev).max()), 1)
    oob_rows = np.zeros((ndev, M), np.int32)
    oob_cols = np.zeros((ndev, M), np.int32)
    oob_sel = np.zeros((ndev, M), np.int64)
    oob_w = np.zeros((ndev, M), np.float32)
    slot = np.zeros(ndev, np.int64)
    order = np.argsort(opart, kind="stable")
    for k in order:
        p = opart[k]
        j = slot[p]
        slot[p] = j + 1
        oob_rows[p, j] = orows[k]
        oob_cols[p, j] = ocols[k]
        oob_sel[p, j] = osel[k]
        oob_w[p, j] = 1.0

    # ---- per-part blocktri layouts -----------------------------------
    bt_maps = []
    bt_lsel = []
    NB = nloc // b
    for p in range(ndev):
        sel_p = np.nonzero(inpart & (rpart == p))[0]
        lr = rloc_g[sel_p]
        lc = cloc_g[sel_p]
        # padded local CSR pattern (+ unit diagonal padding rows)
        pr = np.arange(sizes[p], nloc)
        rows_l = np.concatenate([lr, pr])
        cols_l = np.concatenate([lc, pr])
        src = np.concatenate([sel_p, np.full(pr.size, -1, np.int64)])
        order_l = np.lexsort((cols_l, rows_l))
        A_l = sp.csr_matrix(
            (np.ones(order_l.size), (rows_l[order_l], cols_l[order_l])),
            shape=(nloc, nloc))
        # rebuild src in the CSR's canonical order (coo_matrix sums
        # duplicates; the assembled pattern has none)
        assert A_l.nnz == order_l.size
        lay = blocktri.pack_layout(A_l, b)
        bt_maps.append(blocktri.device_maps(lay))
        bt_lsel.append(src[order_l])

    part_of = np.searchsorted(offs, np.arange(n), side="right") - 1
    loc_of = np.arange(n) - offs[part_of]

    return BandDDState(
        ndev=ndev, n=n, nloc=nloc, perm=perm, iperm=iperm,
        part_of=part_of, loc_of=loc_of,
        shift0=shift0, W=W, NT=NT,
        fill_pos=jnp.asarray(fill_pos),
        fill_sel=jnp.asarray(fill_sel),
        pad_pos=jnp.asarray(pad_pos),
        oob_rows=jnp.asarray(oob_rows),
        oob_cols=jnp.asarray(oob_cols),
        oob_sel=jnp.asarray(oob_sel),
        oob_w=jnp.asarray(oob_w),
        b=b, NB=NB, bt_maps=bt_maps, bt_lsel=bt_lsel,
        data_map=None, Ap_pattern=Ap)


@functools.partial(jax.jit, static_argnames=("P_", "NT", "R", "W"))
def _fill_dense(data, fill_pos, fill_sel, pad_pos,
                P_: int, NT: int, R: int, W: int):
    dense = (jnp.zeros(P_ * NT * R * W, jnp.float32)
             .at[fill_pos].add(data[fill_sel].astype(jnp.float32))
             .at[pad_pos].add(1.0))
    return dense.reshape(P_, NT, R, W)


def device_values(st: BandDDState, Ap: sp.csr_matrix):
    """Per-solve value refresh: the sharded dense band, sidecar values,
    and the Jacobi stopping weights, all from the permuted CSR."""
    data = jnp.asarray(Ap.data, jnp.float32)
    dense = _fill_dense(data, st.fill_pos, st.fill_sel, st.pad_pos,
                        P_=st.ndev, NT=st.NT, R=ROW_TILE, W=st.W)
    oob_vals = data[st.oob_sel] * st.oob_w
    dg = np.asarray(Ap.diagonal())
    dg[dg == 0.0] = 1.0
    invd = np.ones((st.ndev, st.nloc), np.float32)
    invd[st.part_of, st.loc_of] = 1.0 / dg
    return dense, oob_vals, jnp.asarray(invd)


def build_factors(st: BandDDState, Ap_data: np.ndarray) -> BTFactor:
    """Per-part block-Thomas factors, stacked (P, NB, b, b)."""
    Sinvs, Gs, ss = [], [], []
    for p in range(st.ndev):
        lsel = st.bt_lsel[p]
        vals = np.where(lsel >= 0, Ap_data[np.maximum(lsel, 0)], 1.0)
        f = blocktri.build_factor(st.bt_maps[p], vals, b=st.b, NB=st.NB)
        Sinvs.append(f.Sinv)
        Gs.append(f.G)
        ss.append(f.s)
    return BTFactor(Sinv=jnp.stack(Sinvs), G=jnp.stack(Gs),
                    s=jnp.stack(ss))


def _pcg_dd(dense_l, oob_rows, oob_cols, oob_vals, bt_l: BTFactor,
            rhs, invd, x0, tol, max_iter, shift0: int, nloc: int,
            axis_name: str):
    """Per-device body of the sharded band PCG (inside shard_map)."""
    bm = BandMatrix(dense_l, shift0, CCHUNK, nloc)

    def op(x):
        xg = jax.lax.all_gather(x, axis_name).reshape(-1)
        y = band_mod.band_matvec(bm, x)[:nloc]
        return y.at[oob_rows].add(oob_vals * xg[oob_cols])

    def prec(r):
        return blocktri.bt_apply(bt_l, r)

    def pdot(u, v):
        return jax.lax.psum(jnp.dot(u, v), axis_name)

    res0 = pdot(invd * rhs, rhs)
    res0 = jnp.where(res0 == 0.0, 1.0, res0)
    r = rhs - op(x0)
    z = prec(r)
    p = z
    res = pdot(z, r)
    stop = pdot(invd * r, r)

    def cond(state):
        _, _, _, res, stop, it, best, since = state
        return jnp.logical_and(
            jnp.sqrt(jnp.abs(stop) / res0) > tol,
            jnp.logical_and(it < max_iter, since < 60))

    def body(state):
        x, r, p, res, stop, it, best, since = state
        u = op(p)
        delta = res / pdot(p, u)
        x = x + delta * p
        r = r - delta * u
        z = prec(r)
        res_new = pdot(z, r)
        stop = pdot(invd * r, r)
        p = z + (res_new / res) * p
        improved = jnp.abs(res_new) < 0.99 * best
        best = jnp.where(improved, jnp.abs(res_new), best)
        since = jnp.where(improved, 0, since + 1)
        return x, r, p, res_new, stop, it + 1, best, since

    state = (x0, r, p, res, stop, jnp.array(0, jnp.int32),
             jnp.abs(res), jnp.array(0, jnp.int32))
    x, r, p, res, stop, it, _, _ = jax.lax.while_loop(cond, body, state)
    return x, jnp.sqrt(jnp.abs(stop) / res0), it


def make_dd_pcg(mesh: Mesh, st: BandDDState, max_iter: int = 20000,
                axis_name: str = "d"):
    spec = P(axis_name)
    shift0, nloc = st.shift0, st.nloc

    def kern(dense, orows, ocols, ovals, Sinv, G, s, rhs, invd, x0, tol):
        bt_l = BTFactor(Sinv=Sinv[0], G=G[0], s=s[0])
        x, rr, it = _pcg_dd(dense[0], orows[0], ocols[0], ovals[0],
                            bt_l, rhs[0], invd[0], x0[0], tol,
                            max_iter, shift0, nloc, axis_name)
        return x[None], rr, it

    return jax.jit(jax.shard_map(
        kern, mesh=mesh,
        in_specs=(spec,) * 10 + (P(),),
        out_specs=(spec, P(), P())))
