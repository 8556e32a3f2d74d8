"""Device-resident Newton iteration step for planar nonlinear magnetostatics.

The reference's Newton loop (static2d.cpp:177-1016) re-assembles and
re-solves once per iteration; the straightforward equivalent in
models/magnetostatics.py pays ~1.3 s of HOST work per iteration at 250k
nodes (numpy element matrices + CSR value refresh) before the device
even sees the system. This module moves that whole middle phase into
ONE jitted device dispatch per Newton iteration:

    element B from V  ->  B-H Hermite lookup  ->  Newton matrices
    ->  CSR value refresh (segment-sum)  ->  dense-band update
    ->  band-AMG PCG to the iteration's inexact-Newton tolerance

Control (forcing-term schedule, adaptive relaxation, the convergence
test) STAYS ON HOST: the Newton trajectory is identical to the host
path's. Only *intermediate* iterations (linear tolerance looser than
the problem Precision) use this step; the accepting iteration(s) run
the full f64 host assembly + mixed-precision refinement driver, so the
reference's convergence contract (spars.cpp:300, static2d.cpp:1005-1011)
is checked exactly as before.

Only the planar path with an f32 fine band level is eligible; every
other configuration silently keeps the host loop (``setup`` returns
``None``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import MU0
from . import assembly, band as band_mod
from .band import BandAMG, BandLevel, BandMatrix


class DeviceNewton(NamedTuple):
    """Static (per-solve) device data for the on-device Newton loop."""
    # changed-element data (S = number of nonlinear elements)
    idxT: jnp.ndarray        # (S, 3) reduced DOF ids
    sgnT: jnp.ndarray        # (S, 3) +-1 fold signs
    q: jnp.ndarray           # (S, 3)
    p: jnp.ndarray           # (S, 3)
    area: jnp.ndarray        # (S,)
    lt: jnp.ndarray          # (S,) lamination type
    fs: jnp.ndarray          # (S,) fill factor
    bhB: jnp.ndarray         # (S, K)
    bhH: jnp.ndarray
    bhS: jnp.ndarray
    Mx: jnp.ndarray          # (S, 3, 3)
    My: jnp.ndarray
    souter: jnp.ndarray      # (S, 3, 3) sign outer products
    kmask: jnp.ndarray | None  # (S*9,) Dirichlet row/col keep mask
    slot: jnp.ndarray        # (S*9,) CSR slot of each entry
    # global CSR -> band maps
    vals_static: jnp.ndarray     # (nnz,) frozen part of CSR values
    diag_fixed: jnp.ndarray      # slots forced to 1.0
    data_map: jnp.ndarray        # At order -> Ap (permuted) order
    upper_sel: jnp.ndarray | None
    diag_pos: jnp.ndarray | None
    band_rows: jnp.ndarray
    band_cols: jnp.ndarray
    perm: jnp.ndarray
    iperm: jnp.ndarray
    # RHS
    rhs_base: jnp.ndarray        # (n,) with Dirichlet values in place
    scat_idx: jnp.ndarray        # (S*3,) rows of the dbe scatter
    scat_w: jnp.ndarray          # (S*3,) -sign * keep
    # traced scalars
    c: jnp.ndarray
    # subset-only band refresh (the nonlinear elements touch only a
    # small fraction of CSR slots -- 7% on the headline problem -- so
    # the per-step dense scatter shrinks accordingly). ``None`` falls
    # back to the full-band rewrite.
    sub_rank: jnp.ndarray | None = None     # (S*9,) rank in sub slots
    sub_zero: jnp.ndarray | None = None     # (nsub,) zeros template
    band_sub_rows: jnp.ndarray | None = None  # (J,) flat band row
    band_sub_cols: jnp.ndarray | None = None  # (J,) band col window
    band_sub_rank: jnp.ndarray | None = None  # (J,) rank into contrib
    band_sub_static: jnp.ndarray | None = None  # (J,) frozen part
    dvec_rows: jnp.ndarray | None = None    # (Jd,) changed diag rows
    dvec_rank: jnp.ndarray | None = None
    dvec_static: jnp.ndarray | None = None
    # out-of-band sidecar refresh (partitioned orderings, band.Sidecar):
    # sidecar slots touched by changed elements
    oob_upd_pos: jnp.ndarray | None = None   # (Jo,) sidecar position
    oob_upd_rank: jnp.ndarray | None = None  # (Jo,) rank into contrib
    oob_static: jnp.ndarray | None = None    # (Jo,) frozen part
    keep_sel_dev: jnp.ndarray | None = None  # full-path in-band select
    oob_src_dev: jnp.ndarray | None = None   # full-path sidecar select
    # delta-COO operator refresh (the fused loops): the fine band stays
    # FROZEN inside the device loop and the changed entries ride a
    # sidecar extension A x = A0 x + delta x instead -- a scatter into
    # the multi-GB tiled band inside a while body defeats XLA's carry
    # aliasing and materializes the whole band as an HLO temp (the 994k
    # OOM: a 4.27 GB flat relayout). (Jd,) per delta entry; symmetric
    # (triu) storage appends mirrored off-diagonal duplicates.
    delta_rows: jnp.ndarray | None = None    # global permuted row
    delta_cols: jnp.ndarray | None = None    # global permuted col
    delta_brows: jnp.ndarray | None = None   # source band row (gather)
    delta_bcols: jnp.ndarray | None = None   # source band wloc (gather)
    delta_rank: jnp.ndarray | None = None    # rank into contrib
    delta_static: jnp.ndarray | None = None  # frozen value part


def setup(pk, geom, Mx, My, session, b_base, c: float, axi: bool = False):
    """Build the device data: returns (DeviceNewton, has_lam) or None
    when ineligible.

    Eligibility: band engine active with an f32 (non-bf16) fine level,
    sub_cache present (the it-0 solve ran with ``changed=``), and no
    nonzero Dirichlet values coupled to changed elements (their A.g RHS
    correction would change per iteration). ``axi=True`` packs the
    element VOLUME into the area field and zero q/p (the axisymmetric
    |B| comes from the energy quadratic form, see _newton_elements)."""
    if not _band_eligible(session):
        return None
    maps = _band_refresh_maps(session, pk.fixed_mask)
    if maps is None:
        return None
    ns = maps["ns"]
    fixed = pk.fixed_mask
    if fixed.any() and np.any(pk.fixed_vals[fixed] != 0.0):
        return None

    f32 = np.float32
    idxT = pk.ridx[pk.tris[ns]]
    sgnT = pk.rsign[pk.tris[ns]]
    keep = (~fixed).astype(f32)
    rhs_base = np.where(fixed, pk.fixed_vals, b_base).astype(f32)
    scat_idx = idxT.reshape(-1).astype(np.int32)
    scat_w = (-sgnT.reshape(-1) * keep[scat_idx]).astype(f32)
    lts = pk.lam_type[ns]
    if axi:
        qp = np.zeros((ns.size, 3), f32)
        denom = np.asarray(geom.vol)[ns]
    else:
        qp = None
        denom = geom.area[ns]
    dn = DeviceNewton(
        idxT=jnp.asarray(idxT.astype(np.int32)),
        sgnT=jnp.asarray(sgnT.astype(f32)),
        q=jnp.asarray(qp if axi else geom.q[ns].astype(f32)),
        p=jnp.asarray(qp if axi else geom.p[ns].astype(f32)),
        area=jnp.asarray(np.asarray(denom).astype(f32)),
        lt=jnp.asarray(lts.astype(np.int32)),
        fs=jnp.asarray(pk.lam_fill[ns].astype(f32)),
        bhB=jnp.asarray(pk.bh_B[ns].astype(f32)),
        bhH=jnp.asarray(pk.bh_H[ns].astype(f32)),
        bhS=jnp.asarray(pk.bh_S[ns].astype(f32)),
        Mx=jnp.asarray(Mx[ns].astype(f32)),
        My=jnp.asarray(My[ns].astype(f32)),
        rhs_base=jnp.asarray(rhs_base),
        scat_idx=jnp.asarray(scat_idx),
        scat_w=jnp.asarray(scat_w),
        c=jnp.asarray(float(c), f32),
        **maps["fields"])
    return dn, bool((lts != 0).any())


def _band_eligible(session) -> bool:
    """Band-engine + HBM eligibility shared by the device loops.

    A bf16 fine operator (the 1M-class regime) is eligible: the fused
    loops switch their inner solver to restarted GMRES(m) with f32
    residual recomputation (CG is unstable on the perturbed bf16
    operator, band.py::band_fgmres). The loop donates and updates the
    SESSION's fine band in place, so HBM must hold one fine band + the
    coarse hierarchy + the refresh temporaries. Symmetric (triu) fine
    levels are supported -- _refresh_operator scatters through
    upper_sel and rebuilds dvec."""
    if session.band_amg is None or session.pattern is None \
            or session.sub_cache is None or session.perm is None:
        return False
    from .solver import device_hbm_bytes
    lv0 = session.band_amg.levels[0]
    band_bytes = lv0.A.dense.size * lv0.A.dense.dtype.itemsize
    if lv0.Abf is not None:
        band_bytes += lv0.Abf.dense.size * 2
    # 0.45: the loop must coexist with the solve path's hierarchy,
    # element data and executables; 0.7 was measured to RESOURCE_EXHAUST
    # a 16 GB part on the 988k sym-f32 band (9.6 GB)
    if band_bytes > 0.45 * device_hbm_bytes():
        return False
    if session.bt is not None and lv0.Abf is not None:
        # the blocktri factor replaces the V-cycle, whose smoother is
        # the only consumer of the bf16 band copy -- drop it so the
        # loop skips the ~GB astype rewrite every iteration
        session.band_amg = BandAMG(
            levels=(lv0._replace(Abf=None),)
            + session.band_amg.levels[1:],
            coarse_inv=session.band_amg.coarse_inv,
            n=session.band_amg.n,
            bt_coarse=session.band_amg.bt_coarse)
    return True


def _band_refresh_maps(session, fixed):
    """Subset band-refresh maps shared by the magnetostatic and heat
    device loops: which band positions the changed elements can touch,
    their frozen static values, and the CSR->band scatter ranks.
    Returns ``None`` when the session lacks the band machinery, else a
    dict with ``ns`` (changed-element ids) and ``fields`` (the
    DeviceNewton/DeviceHeat constructor kwargs for the map portion)."""
    slot_s, souter_s, kmask_s, ch_masks = session.sub_cache
    if souter_s[0] is None:
        return None
    ns = np.nonzero(ch_masks[0])[0]
    if ns.size == 0:
        return None
    lay = session.band_layout
    upper_sel, diag_pos = lay.upper_sel, lay.diag_pos
    tile, rloc, wloc, R = lay.tile, lay.rloc, lay.wloc, lay.R
    f32 = np.float32
    slot, indptr, indices, nnz, diag_slots = session.pattern
    perm, iperm = session.perm

    # subset-only refresh maps: which band positions can ever change.
    # ``src_t`` maps post-triu data order -> At CSR slot; ``final_src``
    # further restricts to the in-band (kept) entries the band holds.
    sub_pos = np.unique(slot_s)
    sub_rank = np.searchsorted(sub_pos, slot_s).astype(np.int32)
    src_t = session.band_data_map if upper_sel is None \
        else session.band_data_map[upper_sel]
    final_src = src_t if lay.keep_sel is None else src_t[lay.keep_sel]
    fixed_diag = diag_slots[fixed]
    in_sub = np.isin(final_src, sub_pos)
    if fixed_diag.size:
        # unit rows are constant 1.0 from the initial build (kmask
        # zeroes their contributions): never rewrite them
        in_sub &= ~np.isin(final_src, fixed_diag)
    j_sub = np.nonzero(in_sub)[0].astype(np.int64)
    j_src = final_src[j_sub]
    band_rows_h = (tile * R + rloc).astype(np.int64)
    band_sub_static = session.vals_static[j_src].astype(f32)
    band_sub_rank = np.searchsorted(sub_pos, j_src).astype(np.int32)

    # delta-COO maps: global (row, col) of each changed in-band slot in
    # the PERMUTED numbering, so the fused loops can apply the changed
    # entries as a sidecar extension against a frozen band. Symmetric
    # (triu) storage appends mirrors for off-diagonal slots (the fused
    # symmetric product counts the frozen diagonal exactly once, so a
    # single (r, r) delta entry is the correct diagonal correction).
    cchunk = session.band_amg.levels[0].A.cchunk
    d_rows = band_rows_h[j_sub]
    d_cols = (wloc[j_sub] + (tile[j_sub] + lay.shift0) * cchunk)
    d_brows = band_rows_h[j_sub]
    d_bcols = wloc[j_sub].astype(np.int64)
    d_rank = band_sub_rank
    d_static = band_sub_static
    if upper_sel is not None:
        off = np.nonzero(d_rows != d_cols)[0]
        d_rows = np.concatenate([d_rows, d_cols[off]])
        d_cols = np.concatenate([d_cols, band_rows_h[j_sub][off]])
        d_brows = np.concatenate([d_brows, d_brows[off]])
        d_bcols = np.concatenate([d_bcols, d_bcols[off]])
        d_rank = np.concatenate([d_rank, d_rank[off]])
        d_static = np.concatenate([d_static, d_static[off]])
    dvec_rows = dvec_rank = dvec_static = None
    if diag_pos is not None:
        diag_src = src_t[diag_pos]
        dsel = np.isin(diag_src, sub_pos)
        if fixed_diag.size:
            dsel &= ~np.isin(diag_src, fixed_diag)
        dvec_rows = np.nonzero(dsel)[0].astype(np.int32)
        dvec_static = session.vals_static[diag_src[dvec_rows]].astype(f32)
        dvec_rank = np.searchsorted(
            sub_pos, diag_src[dvec_rows]).astype(np.int32)
    # sidecar slots whose values the changed elements can move
    oob_upd_pos = oob_upd_rank = oob_static = None
    if lay.oob_src is not None:
        oob_slot = src_t[lay.oob_src]
        osel = np.isin(oob_slot, sub_pos)
        oob_upd_pos = np.nonzero(osel)[0].astype(np.int32)
        oob_static = session.vals_static[
            oob_slot[oob_upd_pos]].astype(f32)
        oob_upd_rank = np.searchsorted(
            sub_pos, oob_slot[oob_upd_pos]).astype(np.int32)
    fields = dict(
        souter=jnp.asarray(souter_s[0].astype(f32)),
        kmask=None if kmask_s is None else jnp.asarray(kmask_s.astype(f32)),
        slot=jnp.asarray(slot_s.astype(np.int32)),
        vals_static=jnp.asarray(session.vals_static.astype(f32)),
        diag_fixed=jnp.asarray(diag_slots[fixed].astype(np.int32)),
        data_map=jnp.asarray(session.band_data_map.astype(np.int32)),
        upper_sel=None if upper_sel is None
        else jnp.asarray(upper_sel.astype(np.int32)),
        diag_pos=None if diag_pos is None
        else jnp.asarray(diag_pos.astype(np.int32)),
        band_rows=jnp.asarray((tile * R + rloc).astype(np.int32)),
        band_cols=jnp.asarray(wloc.astype(np.int32)),
        perm=jnp.asarray(perm.astype(np.int32)),
        iperm=jnp.asarray(iperm.astype(np.int32)),
        sub_rank=jnp.asarray(sub_rank),
        sub_zero=jnp.zeros(sub_pos.size, jnp.float32),
        band_sub_rows=jnp.asarray(band_rows_h[j_sub].astype(np.int32)),
        band_sub_cols=jnp.asarray(wloc[j_sub].astype(np.int32)),
        band_sub_rank=jnp.asarray(band_sub_rank),
        band_sub_static=jnp.asarray(band_sub_static),
        dvec_rows=None if dvec_rows is None else jnp.asarray(dvec_rows),
        dvec_rank=None if dvec_rank is None else jnp.asarray(dvec_rank),
        dvec_static=None if dvec_static is None
        else jnp.asarray(dvec_static),
        oob_upd_pos=None if oob_upd_pos is None
        else jnp.asarray(oob_upd_pos),
        oob_upd_rank=None if oob_upd_rank is None
        else jnp.asarray(oob_upd_rank),
        oob_static=None if oob_static is None
        else jnp.asarray(oob_static),
        keep_sel_dev=None if lay.keep_sel is None
        else jnp.asarray(lay.keep_sel.astype(np.int32)),
        oob_src_dev=None if lay.oob_src is None
        else jnp.asarray(lay.oob_src.astype(np.int32)),
        delta_rows=jnp.asarray(d_rows.astype(np.int32)),
        delta_cols=jnp.asarray(d_cols.astype(np.int32)),
        delta_brows=jnp.asarray(d_brows.astype(np.int32)),
        delta_bcols=jnp.asarray(d_bcols.astype(np.int32)),
        delta_rank=jnp.asarray(d_rank.astype(np.int32)),
        delta_static=jnp.asarray(d_static.astype(f32)))
    return {"ns": ns, "fields": fields}


def strip_fine_band(amg: BandAMG):
    """Return ``(amg_rest, dense, abf)``: the BandAMG with the level-0
    ``A.dense`` (and ``Abf.dense``) replaced by tiny placeholders, plus
    the real buffers. ``step`` donates ``dense``; passing the same
    buffer inside the (non-donated) ``amg`` pytree would alias the
    donation, so the placeholders keep the pytree structure (presence
    of Abf/dvec is structural) without referencing the buffer."""
    lv0 = amg.levels[0]
    dense = lv0.A.dense
    ph = jnp.zeros((1, 1, 1), dense.dtype)
    newA = BandMatrix(dense=ph, shift0=lv0.A.shift0, cchunk=lv0.A.cchunk,
                      ncols=lv0.A.ncols)
    abf = None
    newAbf = None
    if lv0.Abf is not None:
        abf = lv0.Abf.dense
        newAbf = BandMatrix(dense=jnp.zeros((1, 1, 1), jnp.bfloat16),
                            shift0=lv0.Abf.shift0, cchunk=lv0.Abf.cchunk,
                            ncols=lv0.Abf.ncols)
    rest = BandAMG(
        levels=(lv0._replace(A=newA, Abf=newAbf),) + amg.levels[1:],
        coarse_inv=amg.coarse_inv, n=amg.n, bt_coarse=amg.bt_coarse)
    return rest, dense, abf


def rebuild_band_amg(amg_rest: BandAMG, dense, abf, dvec,
                     oob_vals=None) -> BandAMG:
    """Inverse of ``strip_fine_band`` with refreshed buffers: wrap the
    step's returned fine-band values back into a full BandAMG (for the
    session and the solver's pattern cache)."""
    from .band import Sidecar
    lv0 = amg_rest.levels[0]
    newA = BandMatrix(dense=dense, shift0=lv0.A.shift0,
                      cchunk=lv0.A.cchunk, ncols=lv0.A.ncols)
    newAbf = None
    if lv0.Abf is not None and abf is not None:
        newAbf = BandMatrix(dense=abf, shift0=lv0.Abf.shift0,
                            cchunk=lv0.Abf.cchunk, ncols=lv0.Abf.ncols)
    oob = lv0.oob
    if oob is not None and oob_vals is not None:
        oob = Sidecar(rows=oob.rows, cols=oob.cols, vals=oob_vals)
    lv = lv0._replace(A=newA, Abf=newAbf, dvec=dvec, oob=oob)
    return BandAMG(levels=(lv,) + amg_rest.levels[1:],
                   coarse_inv=amg_rest.coarse_inv, n=amg_rest.n,
                   bt_coarse=amg_rest.bt_coarse)


def _newton_elements(dn: DeviceNewton, V, has_lam: bool,
                     axi: bool = False):
    """Element update: B from V, spline mu, Newton matrices Mn and the
    changed-element matrices Me (static2d.cpp:600-796 semantics, f32).

    ``axi=True`` switches |B| to the axisymmetric energy quadratic form
    (staticaxi.cpp:510-521; ``dn.area`` then carries the element VOLUME
    and the lamination-variant curl operators are formed from Mx/My on
    the fly); the mu update, Newton matrices and Me are otherwise the
    same expressions with vol in place of area."""
    Vl = dn.sgnT * V[dn.idxT]
    if axi:
        fsn = dn.fs[:, None, None]
        MxMy0 = dn.Mx + dn.My
        Mb = jnp.where((dn.lt == 0)[:, None, None], MxMy0,
                       jnp.where((dn.lt == 1)[:, None, None],
                                 dn.Mx + dn.My / (fsn * fsn),
                                 dn.Mx / (fsn * fsn) + dn.My))
        vv_vec = jnp.einsum("tjw,tw->tj", Mb, Vl)
        dv_en = jnp.einsum("tj,tj->t", Vl, vv_vec) * \
            (1e4 * dn.c * dn.c / dn.area)
        Bmag = jnp.sqrt(jnp.abs(dv_en))
    else:
        B1 = jnp.sum(Vl * dn.q, axis=1)
        B2 = jnp.sum(Vl * dn.p, axis=1)
        B1 = jnp.where(dn.lt == 2, B1 / dn.fs, B1)
        B2 = jnp.where(dn.lt == 1, B2 / dn.fs, B2)
        Bmag = dn.c * jnp.sqrt(B1 * B1 + B2 * B2) / (0.02 * dn.area)
    vv, dv = assembly.hermite_vdv(Bmag, dn.bhB, dn.bhH, dn.bhS)
    mu_el = 1.0 / (MU0 * vv)
    mu1 = jnp.where(dn.lt == 0, mu_el,
                    jnp.where(dn.lt == 1, mu_el * dn.fs,
                              mu_el / (dn.fs + mu_el * (1.0 - dn.fs))))
    mu2 = jnp.where(dn.lt == 0, mu_el,
                    jnp.where(dn.lt == 1,
                              mu_el / (dn.fs + mu_el * (1.0 - dn.fs)),
                              mu_el * dn.fs))
    vvec0 = jnp.einsum("tjw,tw->tj", dn.Mx + dn.My, Vl)
    Mn = (-200.0 * dn.c ** 3 * dv / dn.area)[:, None, None] * \
        vvec0[:, :, None] * vvec0[:, None, :]
    if has_lam:
        fsn = dn.fs[:, None, None]
        v1 = jnp.einsum("tjw,tw->tj", dn.My / fsn + dn.Mx, Vl)
        u1 = jnp.einsum("tjw,tw->tj", dn.My / fsn + fsn * dn.Mx, Vl)
        Mn1 = (-100.0 * dn.c ** 3 * dv / dn.area)[:, None, None] * (
            v1[:, :, None] * u1[:, None, :]
            + v1[:, None, :] * u1[:, :, None])
        v2 = jnp.einsum("tjw,tw->tj", dn.Mx / fsn + dn.My, Vl)
        u2 = jnp.einsum("tjw,tw->tj", dn.Mx / fsn + fsn * dn.My, Vl)
        Mn2 = (-100.0 * dn.c ** 3 * dv / dn.area)[:, None, None] * (
            v2[:, :, None] * u2[:, None, :]
            + v2[:, None, :] * u2[:, :, None])
        Mn = jnp.where((dn.lt == 0)[:, None, None], Mn,
                       jnp.where((dn.lt == 1)[:, None, None], Mn1, Mn2))
    Me = dn.Mx / mu2[:, None, None] + dn.My / mu1[:, None, None] + Mn
    return Vl, Me, Mn


def _refresh_operator(dn: DeviceNewton, amg: BandAMG, Me, entry_vals):
    """Current operator from the changed element matrices, WITHOUT
    touching the fine band: the changed in-band entries ride a sidecar
    extension ``A x = A0 x + delta x`` against the frozen band values
    (``entry_vals``, gathered once per ``run``). A scatter into the
    multi-GB tiled band inside a ``while_loop`` body defeats XLA's
    carry aliasing and materializes the whole band as a flat-relayout
    HLO temp (4.27 GB at 994k -- the round-3 OOM), while the delta
    gather/scatter is ~1e-3 of the band stream per application. The
    out-of-band sidecar's own touched slots update in place (small 1-D
    vals array). Returns ``(amg_new, contrib)``; the caller derives the
    final dvec / session values from ``contrib`` after the loop."""
    from .band import Sidecar
    data_s = (dn.souter * (-Me)).reshape(-1)
    if dn.kmask is not None:
        data_s = data_s * dn.kmask
    lv0 = amg.levels[0]
    contrib = dn.sub_zero.at[dn.sub_rank].add(data_s)
    dval = (dn.delta_static + contrib[dn.delta_rank]) - entry_vals
    if lv0.oob is not None:
        vals0 = lv0.oob.vals
        if dn.oob_upd_pos is not None:
            vals0 = vals0.at[dn.oob_upd_pos].set(
                dn.oob_static + contrib[dn.oob_upd_rank])
        merged = Sidecar(
            rows=jnp.concatenate([lv0.oob.rows, dn.delta_rows]),
            cols=jnp.concatenate([lv0.oob.cols, dn.delta_cols]),
            vals=jnp.concatenate([vals0, dval]))
        oob_vals_new = vals0
    else:
        merged = Sidecar(rows=dn.delta_rows, cols=dn.delta_cols,
                         vals=dval)
        oob_vals_new = None
    lv = lv0._replace(oob=merged)
    amg_new = BandAMG(levels=(lv,) + amg.levels[1:],
                      coarse_inv=amg.coarse_inv, n=amg.n,
                      bt_coarse=amg.bt_coarse)
    return amg_new, contrib, oob_vals_new


def _inner_solve(amg_new, r_scaled, tol_eff, inner_iter, bt, n):
    """Inner linear solve of the fused loops: bf16 fine operator ->
    restarted GMRES(24) with f32 residual recomputation (CG diverges on
    the bf16-perturbed operator, band.py::band_fgmres); else
    block-tridiagonal-preconditioned CG when a factor is available, or
    the band-AMG V-cycle PCG."""
    f32 = jnp.float32
    lvn = amg_new.levels[0]
    invd = lvn.invd
    if lvn.A.dense.dtype == jnp.bfloat16:
        res0_pass = jnp.dot(invd * r_scaled, r_scaled)
        res0_pass = jnp.where(res0_pass == 0.0, 1.0, res0_pass)

        def fg_cond(st):
            _x, rn, j, _tot = st
            return jnp.logical_and(rn > tol_eff, j < 4)

        def fg_body(st):
            x, _rn, j, tot = st
            rc = r_scaled - band_mod.band_apply(lvn.A, lvn.dvec, x,
                                                lvn.oob)
            d, _rr, fits = band_mod.band_fgmres(amg_new, rc, 24)
            x = x + d
            rc2 = r_scaled - band_mod.band_apply(lvn.A, lvn.dvec, x,
                                                 lvn.oob)
            rn2 = jnp.sqrt(jnp.dot(invd * rc2, rc2) / res0_pass)
            return x, rn2, j + 1, tot + fits

        d_p, _rn, _j, its = jax.lax.while_loop(
            fg_cond, fg_body,
            (jnp.zeros(n, f32), jnp.array(jnp.inf, f32),
             jnp.array(0, jnp.int32), jnp.array(0, jnp.int32)))
    elif bt is None:
        d_p, _rel, its = band_mod.band_pcg(
            amg_new, r_scaled, tol_eff.astype(f32),
            jnp.zeros(n, f32), inner_iter)
    else:
        from . import blocktri as bt_mod
        if isinstance(bt, bt_mod.BTSmoother):
            # partitioned ordering: in-part factor as the V-cycle's
            # fine smoother (two-level DD), not standalone. Short
            # stall window: the composite plateaus on interface modes;
            # bailing early lets the Newton step proceed with the
            # partial correction (the next step re-solves anyway)
            d_p, _rel, its = band_mod.band_pcg(
                amg_new, r_scaled, tol_eff.astype(f32),
                jnp.zeros(n, f32), inner_iter, stall_window=48, bt=bt)
        else:
            d_p, _rel, its = bt_mod.bt_pcg(
                lvn.A, lvn.dvec, lvn.invd, bt, r_scaled,
                tol_eff.astype(f32), jnp.zeros(n, f32), inner_iter,
                oob=lvn.oob)
    return d_p, its


@functools.partial(jax.jit,
                   static_argnames=("inner_iter", "has_lam", "max_steps",
                                    "tol_floor", "target_res", "axi",
                                    "cg_budget"),
                   donate_argnums=(2,))
def run(dn: DeviceNewton, amg: BandAMG, dense, V, state,
        tol_floor: float = 3e-7, target_res: float = 9e-7, bt=None,
        inner_iter: int = 400, has_lam: bool = False,
        max_steps: int = 30, axi: bool = False, cg_budget: int = 0):
    """Run the Newton MIDDLE AND TAIL in ONE device dispatch.

    ``step`` pays a host round-trip per Newton iteration; on a remote
    (tunneled) TPU that round-trip dwarfs the device work, so this
    kernel moves the whole loop into a ``lax.while_loop``: element
    update -> operator refresh -> bt-preconditioned CG -> adaptive
    relaxation (the EXACT rule of static2d.cpp:974-989, which is what
    converges the oscillatory Newton tail) -> convergence/stall test.
    The accepting pass at the full contract Precision still runs on
    host afterwards, so the reference's convergence guarantee is
    checked in f64 exactly as before.

    ``state`` packs the host's Newton control state into ONE (4,) f32
    device array -- (relax, res, lastres, base_it) -- and the returned
    ``stats`` packs (relax, res, lastres, steps, cg_total) the same
    way: a remote (tunneled) device pays a round trip per transferred
    buffer, so scalars travel batched. ``base_it`` is the host's
    global iteration number (the relaxation rule activates past global
    iteration 5); the tolerances are compile-time constants.

    ``cg_budget`` (> 0) stops the loop once the ACCUMULATED inner CG
    iterations reach the budget; the host then re-dispatches from the
    returned state. One unbounded dispatch at 1M-class sizes can run
    the device for many minutes (30 Newton steps x 400 V-cycle-PCG
    iterations over a 4.6 GB band), which the tunneled TPU worker
    does not survive -- the worker process is killed mid-execution
    ("TPU worker process crashed or restarted", reproduced at 994k
    DOFs) -- so production callers size the budget to keep a dispatch
    in the tens of seconds (magnetostatics._dn_cg_budget).

    Returns ``(V, dense, dvec, stats)``.
    """
    from .band import Sidecar
    n = V.shape[0]
    lv0 = amg.levels[0]
    f32 = jnp.float32
    relax_in = state[0]
    res_in = state[1]
    lastres_in = state[2]
    base_it = state[3]
    has_oob = lv0.oob is not None
    R = dense.shape[1]
    # frozen band values at the changed slots: the loop applies the
    # operator as A0 + delta (see _refresh_operator)
    entry_vals = dense[dn.delta_brows // R, dn.delta_brows % R,
                       dn.delta_bcols].astype(f32)

    def body(carry):
        (V, oob_vals, contrib, relax, res, lastres, k, cg_tot, best,
         since) = carry
        oob_cur = Sidecar(lv0.oob.rows, lv0.oob.cols, oob_vals) \
            if has_oob else None
        amg_cur = BandAMG(
            levels=(lv0._replace(
                A=BandMatrix(dense, lv0.A.shift0, lv0.A.cchunk,
                             lv0.A.ncols),
                Abf=None, oob=oob_cur),)
            + amg.levels[1:],
            coarse_inv=amg.coarse_inv, n=amg.n, bt_coarse=amg.bt_coarse)
        Vl, Me, Mn = _newton_elements(dn, V, has_lam, axi)
        amg_new, contrib, oob_new = _refresh_operator(dn, amg_cur, Me,
                                                      entry_vals)
        dbe = jnp.einsum("tjk,tk->tj", Mn, Vl)
        b = dn.rhs_base.at[dn.scat_idx].add(dn.scat_w * dbe.reshape(-1))
        lvn = amg_new.levels[0]
        bp = b[dn.perm]
        r = bp - band_mod.band_apply(lvn.A, lvn.dvec, V[dn.perm],
                                     lvn.oob)
        # per-step inexact forcing (the host schedule's 0.03*res), then
        # the same current-residual-relative conversion as ``step``
        tol_k = jnp.clip(0.03 * res, tol_floor, 1e-4)
        invd = lvn.invd
        res0_sys = jnp.dot(invd * bp, bp)
        res_cur = jnp.dot(invd * r, r)
        tol_eff = jnp.clip(
            tol_k * jnp.sqrt(res0_sys / jnp.maximum(res_cur, 1e-30)),
            1e-7, 0.5)
        scale = jnp.maximum(jnp.max(jnp.abs(r)), 1e-30)
        d_p, its = _inner_solve(amg_new, r / scale, tol_eff, inner_iter,
                                bt, n)
        V_new = V + (scale * d_p)[dn.iperm]
        num = jnp.linalg.norm(V_new - V)
        den = jnp.maximum(jnp.linalg.norm(V_new), 1e-30)
        res_new = num / den
        # adaptive relaxation, static2d.cpp:974-989 semantics (host
        # parity: compare against the PREVIOUS residual, activate past
        # global iteration 5, mix AFTER measuring)
        glob = base_it + k.astype(f32)
        active = glob > 5.0
        worse = jnp.logical_and(res_new > res, relax > 0.125)
        # near the root an improving Newton step is contraction-optimal
        # undamped: mixing with the previous iterate only slows the
        # quadratic tail, so lift the relaxation entirely below 1e-5
        # (the `worse` branch re-damps if the iteration turns
        # oscillatory again)
        relax_new = jnp.where(
            active,
            jnp.where(worse, relax * 0.5,
                      jnp.where(res_new < 3e-5, 1.0,
                                relax + 0.1 * (1.0 - relax))),
            relax)
        V_out = jnp.where(active, relax_new * V_new
                          + (1.0 - relax_new) * V, V_new)
        improved = res_new < 0.95 * best
        best_new = jnp.minimum(best, res_new)
        since_new = jnp.where(improved, 0, since + 1)
        oob_out = oob_new if has_oob else oob_vals
        return (V_out, oob_out, contrib, relax_new,
                res_new, res, k + 1, cg_tot + its, best_new, since_new)

    def cond(carry):
        (_, _, _, _, res, _, k, cg_tot, _, since) = carry
        go = jnp.logical_and(
            res > target_res,
            jnp.logical_and(k < max_steps, since < 3))
        if cg_budget > 0:
            go = jnp.logical_and(go, cg_tot < cg_budget)
        return go

    oob0 = lv0.oob.vals if has_oob else jnp.zeros((0,), f32)
    carry0 = (V, oob0, dn.sub_zero, relax_in.astype(f32),
              res_in.astype(f32), lastres_in.astype(f32),
              jnp.array(0, jnp.int32), jnp.array(0, jnp.int32),
              res_in.astype(f32), jnp.array(0, jnp.int32))
    (V, oob_vals, contrib, relax, res, lastres, k, cg_tot, _, _) = \
        jax.lax.while_loop(cond, body, carry0)
    # final dvec from the last contrib (identity when the loop never
    # ran); the session's BAND values are refreshed from the fresh CSR
    # by the next host solver.solve call (ops/solver.py:1306-1318), so
    # the frozen dense returns unchanged
    dvec = lv0.dvec
    if dvec is not None and dn.dvec_rows is not None:
        mixed = jnp.where(k > 0,
                          dn.dvec_static + contrib[dn.dvec_rank],
                          dvec[dn.dvec_rows])
        dvec = dvec.at[dn.dvec_rows].set(mixed)
    stats = jnp.stack([relax, res, lastres, k.astype(f32),
                       cg_tot.astype(f32)])
    return V, dense, dvec, oob_vals, stats


@functools.partial(jax.jit,
                   static_argnames=("inner_iter", "has_lam", "tol_floor",
                                    "axi"),
                   donate_argnums=(2,))
def run_scatter(dn: DeviceNewton, amg: BandAMG, dense, V, state,
                tol_floor: float = 3e-7, bt=None, inner_iter: int = 400,
                has_lam: bool = False, axi: bool = False):
    """ONE Newton step per dispatch, with the changed operator entries
    scattered INTO the donated fine band at top level.

    ``run`` keeps the band frozen and applies the changed entries as a
    delta-COO sidecar every operator application -- at 1M-class sizes
    that sidecar is ~500k entries and the per-iteration gather/scatter
    triples the cost of a preconditioned CG iteration (measured 994k:
    ~100 ms/it in-loop vs ~36 ms/it for the host band pass on the same
    hierarchy). Outside a ``while_loop`` the scatter aliases the
    DONATED band buffer in place (no carry-aliasing copy, the reason
    the refresh could not live inside ``run``'s loop body), so this
    variant refreshes the band once per Newton step and the inner CG
    runs on the clean banded operator at full stream rate. The host
    chains these dispatches exactly like ``run``'s budget chain; the
    extra dispatch round-trips are noise at the sizes where this mode
    is selected (magnetostatics picks it via XFEMM_TPU_DN_SCATTER_BYTES,
    default: fine band > 3 GB).

    Returns ``(V, dense, dvec, oob_vals, stats)`` with the same stats
    layout as ``run`` (relax, res, lastres, steps=1, cg_its). ``dense``
    comes back REFRESHED (current operator values), which matches the
    session contract -- the next host solve refreshes band values from
    the fresh CSR anyway (ops/solver.py update_fine_values)."""
    from .band import Sidecar
    n = V.shape[0]
    lv0 = amg.levels[0]
    f32 = jnp.float32
    relax = state[0]
    res = state[1]
    base_it = state[3]
    R = dense.shape[1]

    Vl, Me, Mn = _newton_elements(dn, V, has_lam, axi)
    data_s = (dn.souter * (-Me)).reshape(-1)
    if dn.kmask is not None:
        data_s = data_s * dn.kmask
    contrib = dn.sub_zero.at[dn.sub_rank].add(data_s)
    vals_new = dn.band_sub_static + contrib[dn.band_sub_rank]
    dense = dense.at[dn.band_sub_rows // R, dn.band_sub_rows % R,
                     dn.band_sub_cols].set(vals_new.astype(dense.dtype))
    dvec = lv0.dvec
    if dvec is not None and dn.dvec_rows is not None:
        dvec = dvec.at[dn.dvec_rows].set(
            dn.dvec_static + contrib[dn.dvec_rank])
    oob_cur = None
    oob_vals = jnp.zeros((0,), f32)
    if lv0.oob is not None:
        oob_vals = lv0.oob.vals
        if dn.oob_upd_pos is not None:
            oob_vals = oob_vals.at[dn.oob_upd_pos].set(
                dn.oob_static + contrib[dn.oob_upd_rank])
        oob_cur = Sidecar(lv0.oob.rows, lv0.oob.cols, oob_vals)
    amg_new = BandAMG(
        levels=(lv0._replace(
            A=BandMatrix(dense, lv0.A.shift0, lv0.A.cchunk, lv0.A.ncols),
            Abf=None, dvec=dvec, oob=oob_cur),) + amg.levels[1:],
        coarse_inv=amg.coarse_inv, n=amg.n, bt_coarse=amg.bt_coarse)

    dbe = jnp.einsum("tjk,tk->tj", Mn, Vl)
    b = dn.rhs_base.at[dn.scat_idx].add(dn.scat_w * dbe.reshape(-1))
    lvn = amg_new.levels[0]
    bp = b[dn.perm]
    r = bp - band_mod.band_apply(lvn.A, lvn.dvec, V[dn.perm], lvn.oob)
    tol_k = jnp.clip(0.03 * res, tol_floor, 1e-4)
    invd = lvn.invd
    res0_sys = jnp.dot(invd * bp, bp)
    res_cur = jnp.dot(invd * r, r)
    tol_eff = jnp.clip(
        tol_k * jnp.sqrt(res0_sys / jnp.maximum(res_cur, 1e-30)),
        1e-7, 0.5)
    scale = jnp.maximum(jnp.max(jnp.abs(r)), 1e-30)
    d_p, its = _inner_solve(amg_new, r / scale, tol_eff, inner_iter,
                            bt, n)
    V_new = V + (scale * d_p)[dn.iperm]
    num = jnp.linalg.norm(V_new - V)
    den = jnp.maximum(jnp.linalg.norm(V_new), 1e-30)
    res_new = num / den
    # adaptive relaxation, same rule as ``run`` with k = 0
    active = base_it > 5.0
    worse = jnp.logical_and(res_new > res, relax > 0.125)
    relax_new = jnp.where(
        active,
        jnp.where(worse, relax * 0.5,
                  jnp.where(res_new < 3e-5, 1.0,
                            relax + 0.1 * (1.0 - relax))),
        relax)
    V_out = jnp.where(active, relax_new * V_new
                      + (1.0 - relax_new) * V, V_new)
    stats = jnp.stack([relax_new, res_new, res, jnp.asarray(1.0, f32),
                       its.astype(f32)])
    return V_out, dense, dvec, oob_vals, stats


class DeviceHeat(NamedTuple):
    """Static device data for the fused K(T) successive-substitution
    loop (the heat analogue of ``run``; hsolver.cpp:458 AnalyzeProblem
    outer loop). The element matrices are LINEAR in the isotropic
    conductivity k(T): mat = mat_0 + k * mat_k, so the operator refresh
    is one clamped piecewise-linear lookup plus a scaled scatter."""
    idxT: jnp.ndarray        # (S, 3) reduced DOF ids of K(T) elements
    sgnT: jnp.ndarray        # (S, 3) +-1 fold signs
    Tc: jnp.ndarray          # (S, P) padded temperature knots
    Kc: jnp.ndarray          # (S, P) padded conductivity knots
    mat_k: jnp.ndarray       # (S, 3, 3) d(block mat)/dk
    mat_0: jnp.ndarray       # (S, 3, 3) k-independent part
    ge_k: jnp.ndarray        # (S, 3) mat_k @ (sgn * g) Dirichlet coupling
    rhs_pre: jnp.ndarray     # (n,) rhs with changed elements at k=0
    scat_idx: jnp.ndarray    # (S*3,)
    scat_w: jnp.ndarray      # (S*3,) -sign * keep
    # shared map fields (consumed by _refresh_operator via duck typing)
    souter: jnp.ndarray
    kmask: jnp.ndarray | None
    slot: jnp.ndarray
    vals_static: jnp.ndarray
    diag_fixed: jnp.ndarray
    data_map: jnp.ndarray
    upper_sel: jnp.ndarray | None
    diag_pos: jnp.ndarray | None
    band_rows: jnp.ndarray
    band_cols: jnp.ndarray
    perm: jnp.ndarray
    iperm: jnp.ndarray
    sub_rank: jnp.ndarray | None = None
    sub_zero: jnp.ndarray | None = None
    band_sub_rows: jnp.ndarray | None = None
    band_sub_cols: jnp.ndarray | None = None
    band_sub_rank: jnp.ndarray | None = None
    band_sub_static: jnp.ndarray | None = None
    dvec_rows: jnp.ndarray | None = None
    dvec_rank: jnp.ndarray | None = None
    dvec_static: jnp.ndarray | None = None
    oob_upd_pos: jnp.ndarray | None = None
    oob_upd_rank: jnp.ndarray | None = None
    oob_static: jnp.ndarray | None = None
    keep_sel_dev: jnp.ndarray | None = None
    oob_src_dev: jnp.ndarray | None = None
    delta_rows: jnp.ndarray | None = None
    delta_cols: jnp.ndarray | None = None
    delta_brows: jnp.ndarray | None = None
    delta_bcols: jnp.ndarray | None = None
    delta_rank: jnp.ndarray | None = None
    delta_static: jnp.ndarray | None = None


def setup_heat(session, ridx, rsign, tris, fixed, fixed_vals, mats_T,
               mats_K, blk, mat_k_full, mat_0_full, b_nofixed):
    """Build the device data for the fused heat loop, or None when
    ineligible.

    ``mat_k_full``/``mat_0_full`` are (T, 3, 3) block-matrix pieces for
    ALL elements (mat = mat_0 + k * mat_k in the sign convention the
    ElementBlock carries); ``mats_T``/``mats_K`` map block-label id ->
    K(T) curve lists. Unlike the magnetostatic setup, nonzero Dirichlet
    temperatures are supported: the per-iteration A.g RHS correction of
    the changed elements is linear in k and lives in ``ge_k``."""
    if not _band_eligible(session):
        return None
    slot_s, souter_s, kmask_s, ch_masks = session.sub_cache
    if len(ch_masks) > 1 and any(m is not None for m in ch_masks[1:]):
        # a re-linearized radiation boundary also changes per iteration;
        # the fused loop only refreshes the element block
        return None
    maps = _band_refresh_maps(session, fixed)
    if maps is None:
        return None
    ns = maps["ns"]

    f32 = np.float32
    idxT = ridx[tris[ns]]
    sgnT = rsign[tris[ns]]
    keep = (~fixed).astype(f32)
    scat_idx = idxT.reshape(-1).astype(np.int32)
    scat_w = (-sgnT.reshape(-1) * keep[scat_idx]).astype(f32)

    # padded per-element K(T) curves (clamped linear interp; pad with a
    # strictly increasing far tail so jnp.interp's right clamp holds)
    P = max(max(len(mats_T[b]) for b in set(blk[ns].tolist())), 2)
    S = ns.size
    Tc = np.zeros((S, P), f32)
    Kc = np.zeros((S, P), f32)
    for bidx in set(blk[ns].tolist()):
        sel = blk[ns] == bidx
        Td = list(mats_T[bidx])
        Kd = list(mats_K[bidx])
        while len(Td) < P:
            Td.append((Td[-1] if Td else 0.0) + 1e6)
            Kd.append(Kd[-1] if Kd else 1.0)
        Tc[sel] = np.asarray(Td, f32)
        Kc[sel] = np.asarray(Kd, f32)

    # Dirichlet RHS coupling: rhs = rhs_pre + scatter(-sgn*keep * k*ge_k)
    g = np.where(fixed, fixed_vals, 0.0)
    gl = sgnT * g[idxT]
    ge_k = np.einsum("tjk,tk->tj", mat_k_full[ns], gl).astype(f32)
    ge_0 = np.einsum("tjk,tk->tj", mat_0_full[ns], gl)
    # b_nofixed already contains NO A.g correction for the changed
    # elements' k-dependent part; fold the k=0 part here
    b_pre = b_nofixed.copy()
    np.add.at(b_pre, scat_idx, -(sgnT.reshape(-1) * ge_0.reshape(-1)))
    b_pre = np.where(fixed, fixed_vals, b_pre)

    dh = DeviceHeat(
        idxT=jnp.asarray(idxT.astype(np.int32)),
        sgnT=jnp.asarray(sgnT.astype(f32)),
        Tc=jnp.asarray(Tc),
        Kc=jnp.asarray(Kc),
        mat_k=jnp.asarray(mat_k_full[ns].astype(f32)),
        mat_0=jnp.asarray(mat_0_full[ns].astype(f32)),
        ge_k=jnp.asarray(ge_k),
        rhs_pre=jnp.asarray(b_pre.astype(f32)),
        scat_idx=jnp.asarray(scat_idx),
        scat_w=jnp.asarray(scat_w),
        **maps["fields"])
    return dh


def _heat_elements(dh: DeviceHeat, V):
    """Element conductivity from the iterate: 3-node average of the
    clamped piecewise-linear K(T) -- the average of K at the corner
    temperatures, NOT K of the average temperature (hsolver.cpp:573-575
    and the host loop's kvals[tris].mean) -- then the changed-element
    block matrices mat = mat_0 + k * mat_k."""
    Tl = dh.sgnT * V[dh.idxT]
    kav = jnp.mean(jax.vmap(jnp.interp)(Tl, dh.Tc, dh.Kc), axis=1)
    mat = dh.mat_0 + kav[:, None, None] * dh.mat_k
    return kav, mat


@functools.partial(jax.jit,
                   static_argnames=("inner_iter", "max_steps",
                                    "tol_floor", "target_res",
                                    "cg_budget"),
                   donate_argnums=(2,))
def run_heat(dn: DeviceHeat, amg: BandAMG, dense, V, state,
             tol_floor: float = 3e-7, target_res: float = 9e-7,
             bt=None, inner_iter: int = 400, max_steps: int = 30,
             cg_budget: int = 0):
    """Run the K(T) successive-substitution middle in ONE dispatch.

    Mirrors ``run``: conductivity lookup -> operator refresh ->
    preconditioned CG at the inexact-forcing tolerance -> convergence /
    stall test, all inside a ``lax.while_loop``. The reference's
    substitution is undamped (hsolver.cpp:458), so there is no
    relaxation state. The accepting pass at the full contract Precision
    runs on host afterwards. ``state`` is a (1,) f32 array holding the
    incoming outer residual; returns ``(V, dense, dvec, oob_vals,
    stats)`` with stats = (res, steps, cg_total)."""
    from .band import Sidecar
    n = V.shape[0]
    lv0 = amg.levels[0]
    f32 = jnp.float32
    res_in = state[0]
    has_oob = lv0.oob is not None
    R = dense.shape[1]
    entry_vals = dense[dn.delta_brows // R, dn.delta_brows % R,
                       dn.delta_bcols].astype(f32)

    def body(carry):
        V, oob_vals, contrib, res, k, cg_tot, best, since = carry
        oob_cur = Sidecar(lv0.oob.rows, lv0.oob.cols, oob_vals) \
            if has_oob else None
        amg_cur = BandAMG(
            levels=(lv0._replace(
                A=BandMatrix(dense, lv0.A.shift0, lv0.A.cchunk,
                             lv0.A.ncols),
                Abf=None, oob=oob_cur),)
            + amg.levels[1:],
            coarse_inv=amg.coarse_inv, n=amg.n, bt_coarse=amg.bt_coarse)
        kav, mat = _heat_elements(dn, V)
        # _refresh_operator computes souter * (-Me); the block carries
        # ``mat`` directly, so pass Me = -mat
        amg_new, contrib, oob_new = _refresh_operator(dn, amg_cur, -mat,
                                                      entry_vals)
        dbe = kav[:, None] * dn.ge_k
        b = dn.rhs_pre.at[dn.scat_idx].add(dn.scat_w * dbe.reshape(-1))
        lvn = amg_new.levels[0]
        bp = b[dn.perm]
        r = bp - band_mod.band_apply(lvn.A, lvn.dvec, V[dn.perm],
                                     lvn.oob)
        tol_k = jnp.clip(0.03 * res, tol_floor, 1e-4)
        invd = lvn.invd
        res0_sys = jnp.dot(invd * bp, bp)
        res_cur = jnp.dot(invd * r, r)
        tol_eff = jnp.clip(
            tol_k * jnp.sqrt(res0_sys / jnp.maximum(res_cur, 1e-30)),
            1e-7, 0.5)
        scale = jnp.maximum(jnp.max(jnp.abs(r)), 1e-30)
        d_p, its = _inner_solve(amg_new, r / scale, tol_eff, inner_iter,
                                bt, n)
        V_new = V + (scale * d_p)[dn.iperm]
        num = jnp.linalg.norm(V_new - V)
        den = jnp.maximum(jnp.linalg.norm(V_new), 1e-30)
        res_new = num / den
        improved = res_new < 0.95 * best
        best_new = jnp.minimum(best, res_new)
        since_new = jnp.where(improved, 0, since + 1)
        oob_out = oob_new if has_oob else oob_vals
        return (V_new, oob_out, contrib, res_new, k + 1,
                cg_tot + its, best_new, since_new)

    def cond(carry):
        (_, _, _, res, k, cg_tot, _, since) = carry
        go = jnp.logical_and(
            res > target_res,
            jnp.logical_and(k < max_steps, since < 3))
        if cg_budget > 0:
            go = jnp.logical_and(go, cg_tot < cg_budget)
        return go

    oob0 = lv0.oob.vals if has_oob else jnp.zeros((0,), f32)
    carry0 = (V, oob0, dn.sub_zero, res_in.astype(f32),
              jnp.array(0, jnp.int32), jnp.array(0, jnp.int32),
              res_in.astype(f32), jnp.array(0, jnp.int32))
    (V, oob_vals, contrib, res, k, cg_tot, _, _) = \
        jax.lax.while_loop(cond, body, carry0)
    dvec = lv0.dvec
    if dvec is not None and dn.dvec_rows is not None:
        mixed = jnp.where(k > 0,
                          dn.dvec_static + contrib[dn.dvec_rank],
                          dvec[dn.dvec_rows])
        dvec = dvec.at[dn.dvec_rows].set(mixed)
    stats = jnp.stack([res, k.astype(f32), cg_tot.astype(f32)])
    return V, dense, dvec, oob_vals, stats
