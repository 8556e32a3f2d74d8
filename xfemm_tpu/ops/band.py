"""Dense-band SpMV engine: the TPU-native hot loop.

Arbitrary-index gathers run ~700x below HBM bandwidth on TPU (XLA
lowers them to serialized element loads), so the ELLPACK operator is
dispatch-bound at ~30 ms per SpMV for 254k DOFs. This module instead
maps the FEM matrix onto the MXU: after a reverse-Cuthill-McKee
reordering the matrix is banded (bandwidth ~sqrt(N) for 2-D meshes);
rows are tiled in blocks of R and each tile's band is stored DENSE over
a window of K column-chunks. The matvec is then

    windows[t] = concat(x_chunks[t - KL .. t - KL + K - 1])   # reshapes
    y[t] = dense[t] @ windows[t]                              # MXU

with zero gathers: the windows come from K shifted reshapes of the
padded vector, and the contraction is a batched matvec. Measured on a
254k-DOF problem: 3.4 ms/SpMV in f32 (vs 30 ms gather ELLPACK), 1.3e-7
relative accuracy.

The AMG hierarchy reuses the same trick at every level: aggregation is
UNIFORM AND CONTIGUOUS in the RCM order (aggregates = runs of AGG fine
DOFs), so the smoothed prolongator and its transpose are banded
rectangular operators with perfectly regular chunk alignment, and the
coarse Galerkin matrices inherit the banding. Everything in the V(1,1)
cycle -- fine/mid SpMVs, grid transfers, the dense coarse inverse -- is
dense tensor algebra.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import numpy as np
import scipy.sparse as sp

from .amg import JACOBI_OMEGA, lambda_max_est


class Sidecar(NamedTuple):
    """Out-of-band COO entries accompanying a BandMatrix.

    A partitioned ordering (``partition_order``) makes 99%+ of entries
    tightly banded but leaves a few cross-part couplings at arbitrary
    distance from the diagonal; storing those in the dense band would
    blow the window up to the full matrix width. They live here instead
    and are applied as one gather + scatter-add (~0.03 ms for 64k
    entries on a v5e -- noise next to a multi-GB band read). For
    symmetric (triu) band storage the mirror copies are materialized, so
    one application covers both triangles."""

    rows: "np.ndarray"       # (M,) int32 device
    cols: "np.ndarray"       # (M,) int32 device
    vals: "np.ndarray"       # (M,) f32 device

AGG = 4                  # fine DOFs per aggregate (power of two). Small
                         # aggregates make a much stronger coarse space:
                         # at 254k DOFs, CG-AMG iterations fall 234 (AGG
                         # 32) -> 117 (8) -> ~70 (4) while the extra
                         # coarse-level work is a fraction of the fine
                         # SpMV, so smaller is faster end-to-end.
COARSE_MAX = 1500        # dense-inverse threshold
ROW_TILE = 512           # rows per band tile
BF16_SMOOTH_MIN = 32 * 2 ** 20   # bf16 copy for smoothing matvecs when a
                                 # level's f32 band exceeds this (bytes)
BF16_SMOOTH_MAX = 3 * 10 ** 9    # ...but skip the copy for giant levels
                                 # (1M-class): the f32 band is already at
                                 # the HBM budget, smoothing shares it
P_MAX_BYTES = 10 ** 9            # smoothed-prolongator bands (bf16) above
                                 # this fall back to aggregation transfers


@jax.tree_util.register_pytree_node_class
class BandMatrix:
    """Banded (possibly rectangular) matrix: row tile t multiplies the
    column window starting at chunk (t + shift0) of size cchunk. The
    geometry fields are static pytree aux data so jit treats them as
    compile-time constants."""

    def __init__(self, dense, shift0: int, cchunk: int, ncols: int):
        self.dense = dense       # (NT, R, W) device array
        self.shift0 = shift0
        self.cchunk = cchunk
        self.ncols = ncols

    def tree_flatten(self):
        return (self.dense,), (self.shift0, self.cchunk, self.ncols)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)


@functools.lru_cache(maxsize=1)
def _pallas_enabled() -> bool:
    """Pallas streaming kernels for the band products: on for real
    accelerator backends. Measured on the v5e at the 250k bench shape
    (1949x128x2176 f32): 4.1 ms/apply (527 GB/s, 64% of HBM peak) vs
    22-24 ms (95 GB/s) for the XLA einsum lowering; the fused symmetric
    apply streams a 4.6 GB triu band once in 9.0 ms where the XLA path
    streams it twice. Off on CPU (only the interpreter could run the
    kernels); ``XFEMM_TPU_PALLAS=0/1`` overrides."""
    import os
    force = os.environ.get("XFEMM_TPU_PALLAS")
    if force is not None:
        return force not in ("", "0")
    import jax
    return jax.default_backend() != "cpu"


def band_matvec(bm: BandMatrix, x):
    """y = A x; x is the logical (ncols,) device vector. The product is
    accumulated in f32 regardless of the band's storage dtype, so a
    bf16 band (the smoothing fast path) still returns f32."""
    import jax.numpy as jnp
    if _pallas_enabled():
        from . import pallas_band
        if pallas_band.band_pallas_ok(bm):
            return pallas_band.band_matvec_pallas(bm, x)
    NT, R, W = bm.dense.shape
    cchunk = bm.cchunk
    K = W // cchunk
    x = x.astype(bm.dense.dtype)
    # pad so chunk indices t+shift0 .. t+shift0+K-1 are always valid
    lpad = max(0, -bm.shift0) * cchunk
    total = (NT + max(0, bm.shift0) + K) * cchunk + lpad
    xpad = jnp.zeros(total, x.dtype).at[lpad:lpad + bm.ncols].set(x)
    xc = xpad.reshape(-1, cchunk)
    base = bm.shift0 + lpad // cchunk
    wins = jnp.concatenate([xc[base + s: base + s + NT]
                            for s in range(K)], axis=1)
    y = jnp.einsum("trw,tw->tr", bm.dense, wins,
                   preferred_element_type=jnp.float32)
    return y.reshape(-1)


def band_rmatvec(bm: BandMatrix, y):
    """x = A^T y computed from the SAME dense band as ``band_matvec``.
    Tile t's contribution lands in column chunks [t+shift0, t+shift0+K):
    one batched einsum then K static shifted slice-adds. Storing the
    transpose explicitly is ruinous for rectangular operators -- the
    window of P^T drifts ``AGG`` chunks per row tile, blowing the dense
    band up ~100x (7.5 GiB for the 254k fine prolongator) -- while the
    transposed product reuses the 0.08 GiB band of P."""
    import jax.numpy as jnp
    NT, R, W = bm.dense.shape
    cchunk = bm.cchunk
    K = W // cchunk
    nrows = NT * R
    y = y.astype(bm.dense.dtype)
    yt = jnp.zeros(nrows, y.dtype).at[:y.shape[0]].set(y).reshape(NT, R)
    contrib = jnp.einsum("trw,tr->tw", bm.dense, yt,
                         preferred_element_type=jnp.float32)
    contrib = contrib.reshape(NT, K, cchunk)
    lpad = max(0, -bm.shift0) * cchunk
    total = (NT + max(0, bm.shift0) + K) * cchunk + lpad
    z = jnp.zeros((total // cchunk, cchunk), contrib.dtype)
    base = bm.shift0 + lpad // cchunk
    for s in range(K):
        z = z.at[base + s: base + s + NT].add(contrib[:, s])
    return z.reshape(-1)[lpad:lpad + bm.ncols]


def pack_band_layout(A: sp.csr_matrix, row_tile: int, cchunk: int):
    """Band geometry only -- the slot (tile, rloc, wloc) of every CSR
    entry -- without materializing the dense band on host. Large fine
    levels are filled ON DEVICE from these slots (see
    ``_device_band_fill``): the dense band is multi-GB while the CSR
    values are a few MB, so the host never allocates it and the
    interconnect never carries it."""
    n, ncols = A.shape
    R = row_tile
    NT = (n + R - 1) // R
    deg = np.diff(A.indptr)
    rows = np.repeat(np.arange(n), deg)
    tile = rows // R
    rloc = rows - tile * R
    cmin = np.full(NT, 2 ** 62, np.int64)
    cmax = np.full(NT, -1, np.int64)
    np.minimum.at(cmin, tile, A.indices)
    np.maximum.at(cmax, tile, A.indices)
    empty = cmax < 0
    cmin[empty] = 0
    cmax[empty] = 0
    lo_chunk = cmin // cchunk
    shift = lo_chunk - np.arange(NT)
    shift0 = int(shift.min())
    hi_chunk = cmax // cchunk
    K = int((hi_chunk - (np.arange(NT) + shift0)).max()) + 1
    K = max(K, 1)
    W = K * cchunk
    wloc = A.indices - (tile + shift0) * cchunk
    assert wloc.min() >= 0 and wloc.max() < W, (wloc.min(), wloc.max(), W)
    return (tile, rloc, wloc, shift0, NT, R, W, ncols)


def fill_band_device(layout, data, cchunk: int,
                     dtype=np.float32) -> BandMatrix:
    """Scatter CSR values into the dense band on device (~ms) instead of
    filling and uploading a multi-GB host array."""
    import jax.numpy as jnp
    tile, rloc, wloc, shift0, NT, R, W, ncols = layout
    rows = jnp.asarray((tile * R + rloc).astype(np.int32))
    cols = jnp.asarray(wloc.astype(np.int32))
    dense = _device_band_fill(rows, cols, jnp.asarray(data.astype(dtype)),
                              (NT, R, W))
    return BandMatrix(dense=dense, shift0=shift0, cchunk=cchunk,
                      ncols=ncols)


def pack_band(A: sp.csr_matrix, row_tile: int, cchunk: int,
              dtype=np.float32) -> "tuple":
    """Host-side band packing of a CSR matrix. Returns (layout, dense)
    where layout = (tile, rloc, wloc, shift0, NT, R, W, ncols) gives the
    slot of every CSR entry for value-only device rebuilds."""
    n, ncols = A.shape
    R = row_tile
    NT = (n + R - 1) // R
    deg = np.diff(A.indptr)
    rows = np.repeat(np.arange(n), deg)
    tile = rows // R
    rloc = rows - tile * R
    # chunk window per tile
    cmin = np.full(NT, 2 ** 62, np.int64)
    cmax = np.full(NT, -1, np.int64)
    np.minimum.at(cmin, tile, A.indices)
    np.maximum.at(cmax, tile, A.indices)
    empty = cmax < 0
    cmin[empty] = 0
    cmax[empty] = 0
    lo_chunk = cmin // cchunk
    shift = lo_chunk - np.arange(NT)
    shift0 = int(shift.min())
    # uniform window: chunks [t + shift0, t + shift0 + K)
    hi_chunk = cmax // cchunk
    K = int((hi_chunk - (np.arange(NT) + shift0)).max()) + 1
    K = max(K, 1)
    W = K * cchunk
    wloc = A.indices - (tile + shift0) * cchunk
    assert wloc.min() >= 0 and wloc.max() < W, (wloc.min(), wloc.max(), W)
    dense = np.zeros((NT, R, W), dtype)
    dense[tile, rloc, wloc] = A.data.astype(dtype)
    layout = (tile, rloc, wloc, shift0, NT, R, W, ncols)
    return layout, dense


def pick_parts(n: int, min_part: int = 48_000, max_parts: int = 16) -> int:
    """Number of RCB parts for ``partition_order``: halve while parts
    stay comfortably larger than ``min_part`` rows (below that the
    in-part bandwidth stops shrinking ~sqrt(part) and the interface
    outliers start to matter)."""
    parts = 1
    while parts < max_parts and n // (2 * parts) >= min_part:
        parts *= 2
    return parts


def partition_order(At: sp.csr_matrix, coords: np.ndarray,
                    parts: int) -> np.ndarray:
    """Recursive-coordinate-bisection parts, reverse-Cuthill-McKee
    WITHIN each part, concatenated. In-part bandwidth scales with the
    part diameter (~sqrt(n/parts) for 2-D meshes) instead of the domain
    diameter, shrinking the dense band by ~parts^0.5x; the cross-part
    couplings (<1% of nnz for FEM meshes) overflow into the Sidecar.
    This is the single-chip analogue of the mesh-partition domain
    decomposition the multi-chip backend uses (parallel/partition.py)."""
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    n = At.shape[0]
    idxs = [np.arange(n)]
    while len(idxs) < parts:
        nxt = []
        for idx in idxs:
            if len(idx) < 4:
                nxt.append(idx)
                continue
            xy = coords[idx]
            ax = int(np.argmax(xy.max(axis=0) - xy.min(axis=0)))
            order = np.argsort(xy[:, ax], kind="stable")
            h = len(idx) // 2
            nxt.append(idx[order[:h]])
            nxt.append(idx[order[h:]])
        idxs = nxt
    out = []
    for idx in idxs:
        sub = At[idx][:, idx].tocsr()
        p = np.asarray(reverse_cuthill_mckee(sub, symmetric_mode=True))
        out.append(idx[p])
    return np.concatenate(out)


_ROW_TILES = (128, 256, 512)


def _band_W(cut: int, R: int, sym: bool) -> int:
    """Exact worst-case window width of ``pack_band_layout`` for a band
    of half-width ``cut`` at row tile/chunk R: a tile's rows span
    columns [tR - cut, tR + R - 1 + cut] (triu: [tR, tR + R - 1 + cut]),
    so K = 2*ceil(cut/R) + 1 chunks (sym: ceil(cut/R) + 1). The old
    ``2*cut//R + 2`` formula under-counted by one chunk for most cuts
    (measured: planned 655 MB vs 737 MB packed at 160k/cut=400), which
    let budget-truncated levels overshoot their allowance."""
    kc = (cut + R - 1) // R
    K = (kc + 1) if sym else (2 * kc + 1)
    return K * R


def pick_row_tile(cut: int, sym: bool) -> int:
    """Row-tile size minimizing the band window W (the SpMV is HBM-bound
    at ~755 GB/s measured on v5e, so bytes == time); ties prefer larger
    tiles (fewer window concats)."""
    return min(_ROW_TILES, key=lambda R: (_band_W(cut, R, sym), -R))


def _band_est(n: int, cut: int, R: int, sym: bool,
              itemsize: int = 4) -> float:
    NT = (n + R - 1) // R
    return float(NT) * R * _band_W(cut, R, sym) * itemsize


#: byte-equivalent cost of one sidecar entry per operator application,
#: measured on the real v5e (2026-08-18, synchronous-execution mode of
#: the tunneled device -- the only mode a solve ever runs in after its
#: first host readback): a fused random-gather + scatter-add costs
#: ~17 ns/entry asymptotically while the dense band streams at
#: ~130 GB/s, so one COO entry trades against ~2200 band bytes.  The
#: scatter also pays a size-independent launch/serialization overhead
#: of ~1.5-2.5 ms per apply (~2e8 band-byte-equivalents), modeled as
#: SIDECAR_FIXED_BYTES: a split must save more than that to pay at all.
#: Net effect: tight global-RCM bands (250k-class) keep their full
#: band; partitioned orderings (1M-class, where the interface tail
#: inflates the dense width several GB) still split.
SIDECAR_EQ_BYTES = 2200
SIDECAR_FIXED_BYTES = 2.0e8
SIDECAR_MAX = 4_000_000          # hard cap (memory + refresh maps)
#: per-COARSE-level sidecar entry cap. Coarse Galerkin levels are
#: preconditioner-internal and their halo tails are huge but tiny in
#: magnitude (994k L1: 1.2M entries costing 18 ms/apply); only the
#: largest entries ride the sidecar, the rest are discarded.
COARSE_SIDECAR_MAX = int(__import__("os").environ.get(
    "XFEMM_TPU_COARSE_SIDECAR_MAX", "65536"))
#: cap the sidecar as a FRACTION of nnz as well: the linear byte model
#: would happily shove over half of a global-RCM 1M matrix into COO
#: (994k: cut=15 with a 4.0M tail "beat" the 14 GB full band), but a
#: sidecar that large destroys the band's meaning -- the kept band no
#: longer approximates the operator, so every consumer built on it
#: (smoothers, the fine blocktri factor) collapses.  2% keeps the split
#: in its designed role: carving a partitioned ordering's thin
#: interface tail.
SIDECAR_FRAC_MAX = 0.02
#: byte cap for any SINGLE coarse (preconditioner-internal) level's
#: dense band, applied inside setup_band_amg's budget enforcement (see
#: the per-level `remaining` clamp there).  1.5 GB keeps the whole
#: 1M-class hierarchy near ~8 GB so the fused Newton working set and
#: XLA temps fit a 16 GB part alongside it.
COARSE_LEVEL_MAX_BYTES = float(__import__("os").environ.get(
    "XFEMM_TPU_COARSE_LEVEL_MAX_BYTES", str(1.5e9)))


def plan_level(dist: np.ndarray, n: int, sym: bool,
               sidecar_eq: int = SIDECAR_EQ_BYTES,
               tail_cap: int = SIDECAR_MAX):
    """Choose (R, cut) for a band level from its |row-col| distances.

    Minimizes the modeled per-apply cost over candidate cuts: dense
    band bytes at the cut plus the sidecar's gather/scatter equivalent
    for the strict tail. Interface clusters of partitioned orderings
    (which can be ~1% of nnz at coarse Galerkin levels -- hundreds of
    thousands of entries) are carved out exactly when the byte model
    says they pay for themselves; a tight banded matrix keeps its full
    band because no cut beats it. Returns (R, cut, split); split=False
    keeps every entry in the band."""
    if dist.size == 0:
        return _ROW_TILES[-1], 0, False
    qs = np.sort(dist)
    bw = int(qs[-1])
    mirror = 2 if sym else 1     # triu sidecars materialize mirrors
    max_tail = int(min(tail_cap // mirror,
                       SIDECAR_FRAC_MAX * dist.size,
                       dist.size - 1))
    # log-spaced tail-size candidates (the distance histogram is dense
    # in the band bulk and sparse in the tail)
    tails = np.unique(np.geomspace(1, max(max_tail, 1),
                                   num=48).astype(np.int64))
    cands = {bw} | {int(qs[dist.size - 1 - t]) for t in tails
                    if t < dist.size}
    best = (np.inf, _ROW_TILES[-1], bw, False)
    for cut in sorted(cands):
        tail = int(dist.size - np.searchsorted(qs, cut, side="right"))
        if tail > max_tail:
            continue
        R = pick_row_tile(cut, sym)
        cost = _band_est(n, cut, R, sym) \
            + float(tail) * mirror * sidecar_eq \
            + (SIDECAR_FIXED_BYTES if tail > 0 else 0.0)
        if cost < best[0]:
            best = (cost, R, cut, tail > 0)
    return best[1], best[2], best[3]


#: relative drop tolerance for coarse Galerkin matrices. Smoothed
#: aggregation over 1-D contiguous (RCM-run) aggregates DENSIFIES the
#: coarse operators: each Galerkin product multiplies the row degree
#: ~9x (measured on the 994k bench: 7 -> 63 -> ~450 entries/row by L2),
#: which simultaneously explodes the coarse bandwidth (a 46k-wide band
#: for a 62k matrix) and the host setup time (418 s of Galerkin
#: products). Dropping entries below eps * sqrt(|a_ii a_jj|) keeps
#: every coarse level sparse AND banded; the levels are preconditioner-
#: internal, so the only cost is a slightly weaker V-cycle. The dropped
#: mass is NOT lumped onto the diagonal: the off-diagonals of these
#: near-M-matrices are negative, so lumping REDUCES diagonal dominance
#: and was measured to destroy the preconditioner's positivity (the
#: bf16 GMRES path stalled at 0.03%/cycle); pure dropping only
#: increases dominance and stays SPD. Env-overridable for A/B runs.
FILTER_EPS = float(__import__("os").environ.get(
    "XFEMM_TPU_FILTER_EPS", "0.02"))


def _filter_galerkin(Ac: sp.csr_matrix, eps: float) -> sp.csr_matrix:
    """Drop |a_ij| < eps*sqrt(|a_ii a_jj|) off-diagonal entries."""
    n = Ac.shape[0]
    d = np.abs(np.asarray(Ac.diagonal(), np.float64))
    d[d == 0] = 1.0
    rows = np.repeat(np.arange(n), np.diff(Ac.indptr))
    scale = np.sqrt(d[rows] * d[Ac.indices])
    keep = (np.abs(Ac.data) >= eps * scale) | (rows == Ac.indices)
    if bool(keep.all()):
        return Ac
    Af, _dropped = _split_csr(Ac, keep)
    return Af


def _split_csr(A: sp.csr_matrix, keep: np.ndarray):
    """(A_kept, dropped_sel): the CSR holding only ``keep`` entries plus
    the positions of the dropped ones in A's data order."""
    n = A.shape[0]
    rows = np.repeat(np.arange(n), np.diff(A.indptr))
    deg = np.bincount(rows[keep], minlength=n)
    indptr = np.concatenate([[0], np.cumsum(deg)]).astype(A.indptr.dtype)
    Ak = sp.csr_matrix((A.data[keep], A.indices[keep], indptr),
                       shape=A.shape)
    return Ak, np.nonzero(~keep)[0]


class FineLayout(NamedTuple):
    """Slot map for value-only refreshes of the fine band level: the
    dense-band position of every kept entry plus the selections that
    carve the permuted CSR data into (triu ->) in-band + sidecar."""

    tile: "np.ndarray"
    rloc: "np.ndarray"
    wloc: "np.ndarray"
    shift0: int
    NT: int
    R: int
    W: int
    ncols: int
    upper_sel: "np.ndarray | None"   # triu selection (sym storage)
    diag_pos: "np.ndarray | None"    # diag slots in post-triu data
    keep_sel: "np.ndarray | None"    # in-band slots in post-triu data
    oob_src: "np.ndarray | None"     # post-triu slot per sidecar entry


class BandLevel(NamedTuple):
    A: BandMatrix
    invd: "np.ndarray"       # (n,) device
    omega: "np.ndarray"      # scalar device
    P: BandMatrix | None     # smoothed prolongator band (bf16): using
                             # it for the V-cycle transfers instead of
                             # plain aggregation halves CG iterations
                             # (66 vs 153 at 254k DOFs). None for levels
                             # whose band exceeds the storage budget
                             # (1M-class fine level): those fall back to
                             # reshape-sum/repeat transfers.
    Pbf: BandMatrix | None = None
    Abf: BandMatrix | None = None   # bf16 copy for the V-cycle smoothing
                                    # residuals (2 of the 3 fine SpMVs
                                    # per CG iteration): ~2x the f32
                                    # matvec speed, and the preconditioner
                                    # tolerates the reduced precision
    dvec: "np.ndarray | None" = None   # symmetric (upper-band) storage:
                                    # A holds triu only and the product
                                    # is U x + U^T x - diag x. Halves
                                    # HBM for the dominant levels; same
                                    # traffic per application
    oob: "Sidecar | None" = None    # out-of-band COO entries of a
                                    # partitioned ordering (shared by
                                    # the f32 band and its bf16 copy)
    P_oob: "Sidecar | None" = None  # ditto for the smoothed prolongator
    bts: "object | None" = None     # bf16 block-tridiagonal factor of
                                    # this level's KEPT band, used as
                                    # the level smoother in place of
                                    # damped Jacobi (coarse analogue of
                                    # the fine BTSmoother; built only
                                    # when the two-level DD config is
                                    # active, setup_band_amg
                                    # coarse_bt_smooth)
    cperm: "np.ndarray | None" = None   # when this level's ordering is
                                    # partitioned (sidecar split), the
                                    # NEXT level is rebuilt in its own
                                    # global RCM order; restriction
                                    # gathers rc[cperm] on the way down
                                    # and zc[ciperm] on the way up. One
                                    # 250k-gather per V-cycle visit --
                                    # noise -- and every coarse level
                                    # stays tightly banded instead of
                                    # inheriting interface outliers that
                                    # overwhelm the sidecar budget.
    ciperm: "np.ndarray | None" = None


def band_apply(A: BandMatrix, dvec, x, oob: "Sidecar | None" = None):
    """y = A x for square levels: plain band product, or the
    upper-band symmetric form when ``dvec`` is present; ``oob`` adds
    the out-of-band COO sidecar of a partitioned ordering."""
    n = x.shape[0]
    if dvec is not None:
        if _pallas_enabled():
            from . import pallas_band
            if pallas_band.band_pallas_ok(A):
                # fused U x + U^T x - d x: ONE stream of the triu band
                # instead of two (matvec + rmatvec)
                y = pallas_band.band_apply_sym_pallas(A, dvec, x)
                if oob is not None:
                    y = y.at[oob.rows].add(
                        oob.vals * x[oob.cols].astype(y.dtype))
                return y
        y = band_matvec(A, x)[:n] + band_rmatvec(A, x)[:n] - dvec * x
    else:
        y = band_matvec(A, x)[:n]
    if oob is not None:
        y = y.at[oob.rows].add(oob.vals * x[oob.cols].astype(y.dtype))
    return y


class BandAMG(NamedTuple):
    levels: tuple
    coarse_inv: "np.ndarray"
    n: int
    #: optional near-exact bottom solve: a block-tridiagonal factor
    #: (ops/blocktri.py BTFactor) of the FIRST Galerkin coarse matrix.
    #: When present the hierarchy is two-grid -- fine smoothing plus an
    #: (almost) exact coarse correction -- which cuts PCG iterations
    #: ~5-10x on 1M-class problems where the fine-level factor itself
    #: cannot fit HBM (blocktri.factor_bytes(1M, 2048) ~ 16 GB, but the
    #: 250k coarse level factors in 1-2 GB).
    bt_coarse: "object | None" = None


SYM_MIN_BYTES = 256 * 2 ** 20    # store levels above this as triu


def _cut_for_budget(qs: np.ndarray, n: int, bytes_allow: float,
                    sym: bool) -> tuple[int, int]:
    """Largest (R, cut) whose dense band fits ``bytes_allow``, scanning
    the level's sorted |row-col| distance quantiles. The dtype rule of
    ``setup_band_amg`` (bf16 above 1 GB f32) participates, so a cut
    whose f32 band misses the budget but whose bf16 band fits is kept.
    Returns (R, cut); cut may be 0 (the floor is the diagonal-only band
    at the SMALLEST row tile -- n*128*itemsize bytes)."""
    best = (pick_row_tile(0, sym), 0)
    # distance quantiles as candidates, coarsened to ~64 probes
    probe = np.unique(qs[np.linspace(0, qs.size - 1, 64).astype(np.int64)])
    for cut in probe:
        cut = int(cut)
        R = pick_row_tile(cut, sym)
        est = _band_est(n, cut, R, sym)
        itemsize = 2 if est > 1e9 else 4
        if est * itemsize / 4 <= bytes_allow and cut > best[1]:
            best = (R, cut)
    return best


def setup_band_amg(At: sp.csr_matrix, dtype=np.float32, sym: bool = False,
                   fine_dtype=None, bt_coarse_budget: float = 0.0,
                   bt_transient_budget: float | None = None,
                   coords: "np.ndarray | None" = None,
                   budget_bytes: float | None = None,
                   plan_only: bool = False,
                   fine_full: bool = False,
                   band_key: "np.ndarray | None" = None,
                   fine_abf: bool = True,
                   coarse_bt_smooth: bool = False):
    """Build the band hierarchy (host, f64 -> device dtype). ``At`` must
    already be RCM-ordered with Dirichlet identity rows. Returns
    (BandAMG, fine_layout) -- the fine layout supports value-only
    updates via ``update_fine_values``.

    ``sym=True`` stores large square levels as their upper triangle
    (``band_apply`` reconstructs A x as U x + U^T x - diag x), halving
    HBM so 1M-DOF problems fit a single chip. ``fine_dtype`` optionally
    drops the fine operator itself to bf16: the mixed-precision
    refinement driver then needs a couple more outer passes (each pass
    still contracts the true f64 residual by ~1/|dA| ~ 250x), trading
    a little convergence for another 2x of memory.

    ``coords`` (optional (n, 2), aligned with ``At``'s ordering): node
    coordinates. When a level's ordering is partitioned (sidecar
    split), the next Galerkin level is rebuilt in its own partitioned
    order (RCB on the aggregate centroids + in-part RCM) -- a global
    RCM of the real coarse matrix still carries the smoothing-widened
    frontal bandwidth (~10k at 250k coarse nodes, a 10 GB band), while
    recursive partitioning keeps every level's in-band width at the
    part scale. Without coords the fallback is the global RCM.

    ``bt_coarse_budget`` (bytes, > 0 enables): try to block-tridiagonal
    factor the FIRST Galerkin coarse matrix and stop the hierarchy there
    (two-grid with a near-exact coarse solve). The factor is built
    BEFORE the fine band is filled on device, so the transient peak is
    ``2 * factor_bytes`` rather than ``fine_band + 2 * factor_bytes``;
    ``bt_transient_budget`` bounds that build-time peak separately
    (defaults to the steady budget).

    ``budget_bytes`` (bytes, optional): HARD cap on the hierarchy's
    total device residency. The fine (operator) level is exact and is
    only ACCOUNTED; every coarse level is preconditioner-internal, so
    when its planned band exceeds the remaining budget it is truncated
    to fit -- the widest cut whose band fits is kept, the largest
    dropped couplings (by magnitude) go to a capped COO sidecar, and
    the remainder is discarded. A truncated level only weakens the
    V-cycle; it can never RESOURCE_EXHAUST the device (the round-2
    994k failure mode: a 55,424-wide re-RCM'd L2 coarse band -- 6.9 GB
    bf16 for a 62k matrix -- because plan_level's 2% sidecar fraction
    rejected every split candidate).

    ``plan_only=True`` skips all device work and returns
    ``(report, None)`` where report is a list of per-level dicts
    (n, R, cut, W, bytes, dtype, sidecar/dropped counts) plus a final
    totals entry -- the CPU-only regression surface for the planner.

    ``fine_full=True`` forces the FINE level to keep its complete band
    (no sidecar split), whatever the byte model prefers. The caller
    sets it when a fine block-tridiagonal factor will be built: the
    factor only covers the kept band, and shedding even a 0.1% tail of
    genuinely long-range couplings out of the factor was measured to
    cost 27x the CG iterations on the 250k bench (673 vs 25 per solve)
    -- the byte model cannot see preconditioner quality.

    ``band_key`` ((n,), optional): the GLOBAL-RCM position of each row
    (in ``At``'s ordering). Coarse levels of a partitioned fine
    ordering are reordered by the aggregate-min of this key instead of
    re-RCM / re-partitioning: a matrix that INHERITS a band ordering
    stays narrow, while scipy's RCM on the already-formed coarse graph
    is far from optimal (measured at 994k: the global-RCM-keyed coarse
    ordering gives bw ~1350 where re-RCM gives 3326 and the
    re-partitioned order left 10k+ -- too wide for any blocktri block,
    which is why the 994k two-grid coarse factor never built)."""
    import jax.numpy as jnp

    from ..utils import profiling

    levels = []
    bt_coarse = None
    # f32 throughout: the hierarchy is a preconditioner, and the host
    # Galerkin products dominate setup time -- f32 halves their memory
    # traffic (the CG operator itself is filled from the f64 CSR data)
    A = At.astype(np.float32)
    fine_layout = None
    first = True
    used = 0.0                  # device bytes committed so far
    report: list[dict] = []     # plan_only output
    while A.shape[0] > COARSE_MAX and len(levels) < 6:
        n = A.shape[0]
        d = np.asarray(A.diagonal(), np.float64)
        d[d == 0] = 1.0
        invd = 1.0 / d
        lam = lambda_max_est(A, invd)
        omega = JACOBI_OMEGA * 2.0 / lam

        # uniform contiguous aggregation in the (RCM) ordering
        nc = (n + AGG - 1) // AGG
        agg = np.arange(n) // AGG
        with profiling.phase("band galerkin"):
            P0 = sp.csr_matrix((np.ones(n, np.float32),
                                (np.arange(n), agg)), shape=(n, nc))
            P = (P0 - sp.diags((omega * invd).astype(np.float32))
                 @ (A @ P0)).tocsr()
            Ac = (P.T @ A @ P).tocsr()
            Ac.sum_duplicates()
            if FILTER_EPS > 0.0:
                Ac = _filter_galerkin(Ac, FILTER_EPS)

        rowsA = np.repeat(np.arange(n), np.diff(A.indptr))
        dist = np.abs(A.indices - rowsA)
        R_f, cut_f, split_f = plan_level(dist, n, sym=False)
        if first and fine_full:
            cut_f = int(dist.max()) if dist.size else 0
            R_f, split_f = pick_row_tile(cut_f, False), False
        use_sym = sym and _band_est(n, cut_f, R_f, False) > SYM_MIN_BYTES
        Astore = A
        dvec = None
        upper_sel = diag_pos = None
        if use_sym:
            usel = np.nonzero(A.indices >= rowsA)[0]
            Astore = sp.triu(A, k=0, format="csr")
            if not plan_only:
                dvec = jnp.asarray(np.asarray(A.diagonal()), np.float32)
            upper_sel = usel
            diag_pos = Astore.indptr[:-1].astype(np.int64)
            dist_s = dist[usel]
            R_l, cut_l, split_l = plan_level(dist_s, n, sym=True)
            if first and fine_full:
                cut_l = int(dist_s.max()) if dist_s.size else 0
                R_l, split_l = pick_row_tile(cut_l, True), False
        else:
            dist_s = dist
            R_l, cut_l, split_l = R_f, cut_f, split_f

        # HARD budget enforcement for coarse levels (preconditioner-
        # internal): when the planned band exceeds the remaining device
        # budget, truncate to the widest cut that fits. plan_level's
        # sidecar-fraction cap can reject every split candidate on a
        # partitioned ordering's coarse Galerkin matrix, leaving the
        # FULL bandwidth in the plan -- at 994k that was a 55,424-wide
        # 6.9 GB L2 band and a RESOURCE_EXHAUSTED device.
        truncated = False
        trunc_cap = 0
        if budget_bytes is not None and not first:
            # Per-level cap on top of the global budget: smoothed
            # aggregation's halo can defeat plan_level's 2%-of-nnz
            # sidecar fraction and leave a near-full-width coarse band
            # that technically fits the global budget (994k: a
            # 13,440-wide 6.7 GB bf16 L1 "fit" a 12.8 GB budget and
            # left no HBM headroom for the fused Newton working set --
            # the device worker died mid-solve). Coarse levels are
            # preconditioner-internal; capping each one forces the
            # truncation path (top-magnitude sidecar + discard), which
            # only weakens the V-cycle.
            remaining = min(max(budget_bytes - used, 0.0),
                            COARSE_LEVEL_MAX_BYTES)

            def _lvl_bytes(cut, R):
                est = _band_est(n, cut, R, use_sym)
                return est * (0.5 if est > 1e9 else 1.0)  # bf16 rule

            tail_b = 0.0
            if split_l:          # the planned sidecar's bytes count too
                tail_b = 12.0 * (2 if use_sym else 1) \
                    * int((dist_s > cut_l).sum())
            if _lvl_bytes(cut_l, R_l) + tail_b > remaining:
                # reserve the capped sidecar's worst-case bytes so the
                # truncated band + its COO tail still fit together
                R_l, cut_l = _cut_for_budget(
                    np.sort(dist_s), n,
                    max(remaining - SIDECAR_MAX * 12.0, 0.0), use_sym)
                split_l = True
                truncated = True
                # whatever budget the truncated band leaves decides how
                # many dropped couplings may ride the sidecar at all
                mirror = 2 if use_sym else 1
                spare = remaining - _lvl_bytes(cut_l, R_l)
                trunc_cap = min(SIDECAR_MAX // mirror,
                                int(max(spare, 0.0) // (12 * mirror)))

        # a split level's ordering is partitioned: its Galerkin coarse
        # matrix would inherit interface couplings far beyond any
        # sidecar budget (measured 29.6 GB for the 994k L1 band).
        # Rebuild the NEXT level in its own global RCM order instead;
        # the V-cycle bridges the orderings with one gather each way
        # (band_vcycle, lv.cperm/ciperm).
        # P keeps its PRE-perm column space (the banded-P trick needs
        # aggregate j near row AGG*j); band_vcycle applies the gather
        # AFTER restriction, so both transfer paths stay consistent.
        cperm_dev = ciperm_dev = None
        p1 = None
        ccoords = None
        ckey = None
        if coords is not None:
            pad = nc * AGG - n
            ccoords = np.pad(coords, ((0, pad), (0, 0)), mode="edge") \
                .reshape(nc, AGG, -1).mean(axis=1)
        if band_key is not None:
            pad = nc * AGG - n
            ckey = np.pad(band_key, (0, pad), mode="edge") \
                .reshape(nc, AGG).min(axis=1)
        if split_l:
            if ckey is not None:
                # order the aggregates by their fine global-RCM key:
                # inherits the fine band structure (bw/AGG-ish) where a
                # re-RCM of the formed coarse graph lands 2-8x wider
                p1 = np.argsort(ckey, kind="stable")
            else:
                parts_c = pick_parts(nc, min_part=12_000)
                if ccoords is not None and parts_c > 1:
                    p1 = partition_order(Ac, ccoords, parts_c)
                else:
                    from scipy.sparse.csgraph import reverse_cuthill_mckee
                    p1 = np.asarray(reverse_cuthill_mckee(
                        Ac, symmetric_mode=True))
            Ac = Ac[p1][:, p1].tocsr()
            Ac.sum_duplicates()
            if ccoords is not None:
                ccoords = ccoords[p1]
            if ckey is not None:
                ckey = ckey[p1]
            if not plan_only:
                cperm_dev = jnp.asarray(p1.astype(np.int32))
                ciperm_dev = jnp.asarray(np.argsort(p1).astype(np.int32))

        force_agg_P = False
        P_extra_budget = 0.0
        if first and bt_coarse_budget > 0.0:
            # Two-grid: factor the coarse Galerkin matrix now, BEFORE
            # the fine band exists on device (peak = 2 * factor bytes).
            # Candidate ladder, strongest first (measured PCG its on
            # the 1M benchmark matrix, random rhs @1e-5: 68 / 121 / 124
            # vs 175 for the plain multilevel V-cycle):
            #   1. smoothed-P Galerkin Ac, RE-RCM-ORDERED (smoothing
            #      widens Ac's inherited bandwidth ~3x; its own RCM
            #      recovers a ~4x smaller factor) -- pairs with
            #      smoothed-P transfers when the P band also fits;
            #   2. same factor, aggregation transfers (P too big);
            #   3. unsmoothed P0^T A P0 (variational for aggregation
            #      transfers; smallest factor).
            from scipy.sparse.csgraph import reverse_cuthill_mckee

            from . import blocktri as bt_mod
            cands = []
            pc = np.asarray(reverse_cuthill_mckee(Ac, symmetric_mode=True))
            Acp = Ac[pc][:, pc].tocsr()
            cands.append((Acp, pc, False))
            cands.append((Ac, None, False))
            A0c = (P0.T @ A @ P0).tocsr()
            if p1 is not None:
                # the hierarchy's coarse vectors arrive in the re-RCM'd
                # order (cperm gather above); view A0c in it too
                A0c = A0c[p1][:, p1].tocsr()
            p0c = np.asarray(reverse_cuthill_mckee(A0c,
                                                   symmetric_mode=True))
            cands.append((A0c[p0c][:, p0c].tocsr(), p0c, True))
            cands.append((A0c, None, True))
            transient = (bt_transient_budget
                         if bt_transient_budget else bt_coarse_budget)
            for cand, cperm, needs_agg in cands:
                bwc = bt_mod.bandwidth(cand)
                bsize = bt_mod.pick_block(bwc)
                if bsize is None:
                    continue
                fb = bt_mod.factor_bytes(cand.shape[0], bsize)
                if fb > bt_coarse_budget or 2.0 * fb > transient:
                    continue
                cand.sum_duplicates()
                if plan_only:
                    bt_coarse = {"plan_bt_bytes": fb, "n": cand.shape[0],
                                 "block": bsize}
                    used += fb
                    force_agg_P = needs_agg
                    P_extra_budget = bt_coarse_budget - fb
                    break
                with profiling.phase("bt coarse factor"):
                    lay_c = bt_mod.pack_layout(cand, bsize)
                    maps_c = bt_mod.device_maps(lay_c)
                    factor = bt_mod.build_factor(
                        maps_c, cand.data, b=bsize, NB=lay_c.NB)
                    factor.Sinv.block_until_ready()
                used += fb
                bt_coarse = bt_mod.BTCoarse(
                    factor, n=cand.shape[0],
                    perm=None if cperm is None
                    else jnp.asarray(cperm.astype(np.int32)),
                    iperm=None if cperm is None
                    else jnp.asarray(np.argsort(cperm).astype(np.int32)))
                force_agg_P = needs_agg
                # whatever budget the factor left over may hold the
                # smoothed-P band (bf16) -- worth it: P transfers beat
                # aggregation 68 vs 121 its on the 1M benchmark
                P_extra_budget = bt_coarse_budget - fb
                break

        # out-of-band split: a partitioned ordering leaves <1% of
        # entries far off the diagonal; they go to a COO sidecar so the
        # dense window W tracks the IN-PART bandwidth
        keep_sel = oob_src = None
        oob_dev = None
        pack_target = Astore
        n_discard = 0
        if split_l:
            keep = dist_s <= cut_l
            pack_target, dropped = _split_csr(Astore, keep)
            keep_sel = np.nonzero(keep)[0]
            # sidecar entry cap: budget truncation uses its byte-derived
            # cap; COARSE levels additionally cap at COARSE_SIDECAR_MAX
            # regardless -- each sidecar entry costs ~17 ns of fused
            # gather/scatter per apply, and a Galerkin level's halo tail
            # can reach 1M+ entries (994k L1: 1.2M entries = 18 ms per
            # apply, x3 applies per V-cycle = 60% of every CG
            # iteration). The tail is smoothed-aggregation halo mass
            # with tiny magnitudes; keeping only the largest
            # COARSE_SIDECAR_MAX only weakens the (preconditioner-
            # internal) level. Measured after the cap: 86 -> ~45 ms per
            # composite CG iteration at unchanged iteration counts.
            cap = trunc_cap if truncated else None
            if not first:
                cap = COARSE_SIDECAR_MAX if cap is None \
                    else min(cap, COARSE_SIDECAR_MAX)
            if cap is not None:
                # only the largest dropped couplings (by magnitude)
                # ride the sidecar; the rest are DISCARDED -- legal
                # because this level is strictly a preconditioner
                # component (never the CG operator)
                if dropped.size > cap:
                    n_discard = int(dropped.size - cap)
                    if cap == 0:
                        dropped = dropped[:0]
                    else:
                        mag = np.abs(np.asarray(Astore.data)[dropped])
                        sel = np.argpartition(
                            mag, dropped.size - cap
                        )[dropped.size - cap:]
                        dropped = dropped[np.sort(sel)]
            rows_store = np.repeat(np.arange(n), np.diff(Astore.indptr))
            r_oob = rows_store[dropped]
            c_oob = Astore.indices[dropped]
            if use_sym:
                # mirror the dropped triu entries (diag has dist 0 and
                # is never dropped, so no double count)
                rows_full = np.concatenate([r_oob, c_oob])
                cols_full = np.concatenate([c_oob, r_oob])
                oob_src = np.concatenate([dropped, dropped])
            else:
                rows_full, cols_full, oob_src = r_oob, c_oob, dropped
        layA = pack_band_layout(pack_target, R_l, R_l)
        if first:
            fine_layout = FineLayout(*layA, upper_sel=upper_sel,
                                     diag_pos=diag_pos,
                                     keep_sel=keep_sel, oob_src=oob_src)

        # storage policy: the FINE operator must stay f32 unless
        # explicitly overridden (refinement cannot converge past
        # cond(A) * eps of the operator dtype); coarse matrices are
        # preconditioner-internal, so large ones store bf16-only. Grid
        # transfers use the unsmoothed aggregation (see band_vcycle),
        # so no prolongator bands live on device at all.
        lvl_dtype = fine_dtype if fine_dtype is not None else dtype
        A_dtype = lvl_dtype if first else (
            jnp.bfloat16 if layA[4] * layA[5] * layA[6] * 4 > 1e9
            else dtype)
        if first:
            Adata_all = At.data[upper_sel] if use_sym else At.data
        else:
            Adata_all = Astore.data
        Adata = Adata_all if keep_sel is None else Adata_all[keep_sel]
        NT_l, R_b, W_l = layA[4], layA[5], layA[6]
        bytes_A = float(NT_l) * R_b * W_l \
            * (2 if A_dtype == jnp.bfloat16 else 4)
        used += bytes_A
        if oob_src is not None:
            used += oob_src.size * 12.0
        cch_p = max(R_l // AGG, 8)
        # the smoothed prolongator inherits A's cross-part outliers
        # (scaled diagonal distance |i - AGG j|); split them the same way
        rowsP = np.repeat(np.arange(n), np.diff(P.indptr))
        distP = np.abs(rowsP - P.indices.astype(np.int64) * AGG)
        cutP = cut_l + 2 * AGG
        Pstore = P
        pdropped = None
        p_drop = distP > cutP
        ndropP = int(p_drop.sum())
        if ndropP and ndropP <= max(0.01 * P.nnz, 32768):
            Pstore, pdropped = _split_csr(P, ~p_drop)
        layP = pack_band_layout(Pstore, R_l, cch_p)
        bytes_P = float(layP[4]) * layP[5] * layP[6] * 2
        p_side = 0.0 if pdropped is None else pdropped.size * 12.0
        use_P = (not force_agg_P
                 and bytes_P <= max(P_MAX_BYTES, P_extra_budget)
                 and (budget_bytes is None
                      or used + bytes_P + p_side <= budget_bytes))
        if use_P:
            used += bytes_P + p_side
        abf_bytes = 0.0
        # ``fine_abf=False``: the caller will smooth the fine level with
        # an exact block-tridiagonal factor (plan bt_smooth) -- a bf16
        # residual copy would only corrupt its coarse correction
        use_abf = (A_dtype != jnp.bfloat16
                   and BF16_SMOOTH_MIN < bytes_A <= BF16_SMOOTH_MAX
                   and (fine_abf or not first))
        if use_abf:
            abf_bytes = bytes_A / 2.0
            use_abf = (budget_bytes is None
                       or used + abf_bytes <= budget_bytes)
        if use_abf:
            used += abf_bytes
        if plan_only:
            report.append({
                "level": len(report), "n": n, "R": R_l, "cut": int(cut_l),
                "NT": NT_l, "W": W_l, "sym": bool(use_sym),
                "dtype": ("bf16" if A_dtype == jnp.bfloat16 else "f32"),
                "bytes_A": bytes_A,
                "bytes_P": bytes_P if use_P else 0.0,
                "bytes_Abf": abf_bytes if use_abf else 0.0,
                "split": bool(split_l),
                "truncated": bool(truncated), "discarded": n_discard,
                "sidecar": 0 if oob_src is None else int(oob_src.size)})
            A = Ac
            coords = ccoords
            band_key = ckey
            first = False
            if bt_coarse is not None:
                break
            continue
        Adev = fill_band_device(layA, Adata, R_l, A_dtype)
        if oob_src is not None:
            oob_dev = Sidecar(
                rows=jnp.asarray(rows_full.astype(np.int32)),
                cols=jnp.asarray(cols_full.astype(np.int32)),
                vals=jnp.asarray(Adata_all[oob_src].astype(np.float32)))
        P_oob_dev = None
        Pdev = None
        if use_P:
            Pdev = fill_band_device(layP, Pstore.data, cch_p, jnp.bfloat16)
            if pdropped is not None:
                P_oob_dev = Sidecar(
                    rows=jnp.asarray(rowsP[pdropped].astype(np.int32)),
                    cols=jnp.asarray(P.indices[pdropped].astype(np.int32)),
                    vals=jnp.asarray(P.data[pdropped].astype(np.float32)))
        Abf = None
        if use_abf:
            Abf = BandMatrix(dense=Adev.dense.astype(jnp.bfloat16),
                             shift0=Adev.shift0, cchunk=Adev.cchunk,
                             ncols=Adev.ncols)
        bts_dev = None
        if (coarse_bt_smooth and not first and not use_sym
                and oob_src is not None):
            # exact-band smoother for a split coarse level: a bf16
            # block-tridiagonal factor of the kept band (the level's
            # sidecar tail stays outside, like the fine BTSmoother)
            from . import blocktri as bt_mod
            bs_c = bt_mod.pick_block(int(cut_l))
            fb_c = (0 if bs_c is None
                    else bt_mod.factor_bytes(n, bs_c, 2))
            if (bs_c is not None and 0 < fb_c <= 1.6e9
                    and (budget_bytes is None
                         or used + fb_c <= budget_bytes)):
                lay_c2 = bt_mod.pack_layout(pack_target, bs_c)
                maps_c2 = bt_mod.device_maps(lay_c2)
                bts_dev = bt_mod.build_factor(
                    maps_c2, pack_target.data, b=bs_c, NB=lay_c2.NB,
                    store_dtype=jnp.bfloat16)
                used += fb_c
        levels.append(BandLevel(
            A=Adev,
            invd=jnp.asarray(invd, dtype),
            omega=jnp.asarray(omega, dtype),
            P=Pdev, Abf=Abf, dvec=dvec, oob=oob_dev, P_oob=P_oob_dev,
            bts=bts_dev, cperm=cperm_dev, ciperm=ciperm_dev))
        A = Ac
        coords = ccoords
        band_key = ckey
        first = False
        if bt_coarse is not None:
            break

    if plan_only:
        report.append({"total_bytes": used,
                       "bt_coarse": (bt_coarse or {}),
                       "budget": budget_bytes})
        return report, None
    from .amg import scaled_inv
    if bt_coarse is not None:
        cinv = np.zeros((1, 1))       # placeholder; bottom solve is bt
    else:
        cinv = scaled_inv(A.toarray().astype(np.float64))
    amg = BandAMG(levels=tuple(levels),
                  coarse_inv=jnp.asarray(cinv.astype(dtype)),
                  n=At.shape[0], bt_coarse=bt_coarse)
    import os
    if os.environ.get("XFEMM_TPU_BAND_DEBUG"):
        tot = 0.0
        for i, lv in enumerate(amg.levels):
            ab = lv.A.dense.size * lv.A.dense.dtype.itemsize
            pb = 0 if lv.P is None else lv.P.dense.size * 2
            xb = 0 if lv.Abf is None else lv.Abf.dense.size * 2
            ob = 0 if lv.oob is None else lv.oob.rows.size * 12
            tot += ab + pb + xb + ob
            print(f"[band] L{i}: A{tuple(lv.A.dense.shape)} "
                  f"{lv.A.dense.dtype} {ab / 1e9:.2f}GB P={pb / 1e9:.2f}GB"
                  f" Abf={xb / 1e9:.2f}GB oob="
                  f"{0 if lv.oob is None else lv.oob.rows.size}"
                  f" sym={'y' if lv.dvec is not None else 'n'}",
                  flush=True)
        btb = 0.0
        if bt_coarse is not None:
            f = bt_coarse.factor
            btb = (f.Sinv.size * f.Sinv.dtype.itemsize
                   + f.G.size * f.G.dtype.itemsize)
        print(f"[band] coarse_inv {amg.coarse_inv.size * 4 / 1e9:.3f}GB "
              f"bt_coarse {btb / 1e9:.2f}GB total "
              f"{(tot + btb) / 1e9:.2f}GB", flush=True)
    return amg, fine_layout


def _pow2_at_least(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


@functools.partial(__import__("jax").jit, static_argnames=("shape",))
def _device_band_fill(row_idx, col_idx, vals, shape):
    """Scatter CSR values into the (NT,R,W) band on device. Indexing is
    2-D (row = tile*R + rloc, col = wloc) so indices stay within int32
    even when NT*R*W exceeds 2^31 (1M-node problems)."""
    import jax.numpy as jnp
    NT, R, W = shape
    dense = jnp.zeros((NT * R, W), vals.dtype).at[row_idx, col_idx].set(vals)
    return dense.reshape(shape)


@functools.partial(__import__("jax").jit, donate_argnums=(0,))
def _device_band_update(dense, row_idx, col_idx, vals):
    """In-place value refresh of an existing band (same pattern): every
    nnz slot is rewritten, structural zeros are untouched, and donation
    lets XLA reuse the buffer -- no multi-GB transient, which is what
    lets 1M-DOF hierarchies update within a 16 GB part. The scatter
    indexes the 3-D buffer directly: a reshape on the write side breaks
    XLA's donation aliasing and materializes the full band as a temp."""
    NT, R, W = dense.shape
    vals = vals.astype(dense.dtype)
    return dense.at[row_idx // R, row_idx % R, col_idx].set(vals)


def update_fine_values(amg: BandAMG, fine_layout: FineLayout, data,
                       idx_dev=None) -> BandAMG:
    """New fine-level matrix values (same pattern), keeping the frozen
    coarse hierarchy. The (NT,R,W) band is rebuilt ON DEVICE from the
    CSR values (a few MB) -- shipping the multi-GB dense band through
    the interconnect every Newton iteration would dwarf the solve."""
    import jax.numpy as jnp
    lay = fine_layout
    if lay.upper_sel is not None:
        data = np.ascontiguousarray(data[lay.upper_sel])
    band_data = data if lay.keep_sel is None else data[lay.keep_sel]
    if idx_dev is None:
        idx_dev = (jnp.asarray((lay.tile * lay.R + lay.rloc)
                               .astype(np.int32)),
                   jnp.asarray(lay.wloc.astype(np.int32)))
    lv0 = amg.levels[0]
    dense = _device_band_update(lv0.A.dense, idx_dev[0], idx_dev[1],
                                jnp.asarray(band_data.astype(np.float32)))
    newA = BandMatrix(dense=dense, shift0=lay.shift0,
                      cchunk=lv0.A.cchunk, ncols=lay.ncols)
    newAbf = None
    if lv0.Abf is not None:
        newAbf = BandMatrix(dense=dense.astype(jnp.bfloat16),
                            shift0=lay.shift0, cchunk=lv0.A.cchunk,
                            ncols=lay.ncols)
    new_dvec = None
    if lv0.dvec is not None:
        new_dvec = jnp.asarray(data[lay.diag_pos].astype(np.float32))
    new_oob = lv0.oob
    if lv0.oob is not None:
        new_oob = Sidecar(rows=lv0.oob.rows, cols=lv0.oob.cols,
                          vals=jnp.asarray(
                              data[lay.oob_src].astype(np.float32)))
    levels = (lv0._replace(A=newA, Abf=newAbf, dvec=new_dvec,
                           oob=new_oob),) + amg.levels[1:]
    return BandAMG(levels=levels, coarse_inv=amg.coarse_inv, n=amg.n,
                   bt_coarse=amg.bt_coarse)


#: Chebyshev smoothing degree for the band V-cycle. Degree 1 is plain
#: damped Jacobi (the default: measured on the 250k nonlinear bench,
#: degree 2 cuts CG iterations only ~24% -- the coarse-grid correction,
#: not the smoother, limits convergence here -- while nearly doubling
#: the per-cycle fine-level cost, a net loss). Kept selectable because
#: polynomial smoothing is the TPU-parallel analogue of the reference's
#: sequential SSOR sweeps (spars.cpp:197).
CHEBY_DEGREE = 1


def _cheby_smooth(lv: BandLevel, As, r):
    """Smoother application for A z = r from z = 0: damped Jacobi at
    degree 1, else degree-CHEBY_DEGREE Jacobi-preconditioned Chebyshev
    on [lmax/4, 1.1 lmax] (``lv.omega`` encodes the power-iteration
    estimate of lambda_max(D^-1 A): omega = 2*JACOBI_OMEGA/lmax)."""
    if CHEBY_DEGREE <= 1:
        return lv.omega * lv.invd * r
    from .amg import JACOBI_OMEGA as _W
    lam = 2.0 * _W / lv.omega
    lmax = 1.1 * lam
    lmin = 0.25 * lam
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta
    rho = 1.0 / sigma
    z = lv.invd * r / theta
    d = z
    for _ in range(CHEBY_DEGREE - 1):
        rk = r - band_apply(As, lv.dvec, z, lv.oob)
        rho_new = 1.0 / (2.0 * sigma - rho)
        d = (rho_new * rho) * d + (2.0 * rho_new / delta) * (lv.invd * rk)
        z = z + d
        rho = rho_new
    return z


def band_vcycle(amg: BandAMG, r, bt=None):
    """Symmetric V-cycle with Chebyshev(CHEBY_DEGREE) pre/post smoothing,
    all ops dense-band.

    ``bt`` (optional): a block-tridiagonal factor of the FINE level's
    kept (in-band) entries, used as the level-0 pre/post smoother in
    place of damped Jacobi. For a PARTITIONED ordering the kept band is
    block-diagonal over the parts, so this smoother solves every part
    exactly while the coarse hierarchy supplies the cross-part
    correction -- a two-level domain-decomposition preconditioner. The
    factor ALONE (bt_pcg) degrades like 1/H without a coarse space
    (measured 33x the iterations on the 250k bench); composed with the
    V-cycle's coarse levels it replaces the 994k hierarchy's weakest
    link, the plain Jacobi smoother (measured: 1700 -> ~60 CG its per
    solve, see perf/measurements.json)."""
    import jax.numpy as jnp
    L = len(amg.levels)

    def smooth(lv, As, r, l):
        if l == 0 and bt is not None:
            from .blocktri import bt_apply
            return bt_apply(bt, r)
        if lv.bts is not None:
            from .blocktri import bt_apply
            return bt_apply(lv.bts, r)
        return _cheby_smooth(lv, As, r)

    def cycle(l, r):
        if l == L:
            if amg.bt_coarse is not None:
                from .blocktri import bt_coarse_apply
                return bt_coarse_apply(amg.bt_coarse, r)
            return amg.coarse_inv @ r
        lv = amg.levels[l]
        # the bf16 smoothing copy exists for cheap Jacobi residuals;
        # next to an EXACT fine smoother its 4e-3 residual error is the
        # dominant error and wrecks the coarse correction (measured at
        # 994k: 142 -> 588 its for the first pass) -- bt smoothing
        # always pairs with the f32 operator
        As = lv.Abf if lv.Abf is not None \
            and not (l == 0 and bt is not None) else lv.A
        z = smooth(lv, As, r, l)
        d = r - band_apply(As, lv.dvec, z, lv.oob)
        rc_len = (amg.levels[l + 1].A.ncols if l + 1 < L
                  else (amg.coarse_inv.shape[0]
                        if amg.bt_coarse is None
                        else amg.bt_coarse.n))
        if lv.P is not None:
            # smoothed-prolongator transfers (bf16): halves CG
            # iterations vs plain aggregation
            rc = band_rmatvec(lv.P, d)[:rc_len]
            if lv.P_oob is not None:
                rc = rc.at[lv.P_oob.cols].add(
                    lv.P_oob.vals * d[lv.P_oob.rows])
        else:
            # aggregation transfers (adjoint pair: segment-sum/repeat)
            # for levels whose P band exceeds the HBM budget
            pad = rc_len * AGG - d.shape[0]
            rc = jnp.pad(d, (0, pad)).reshape(rc_len, AGG).sum(axis=1)
        if lv.cperm is not None:
            # the next level lives in its own RCM order (partitioned
            # fine orderings would otherwise leak interface outliers
            # into every coarse band)
            rc = rc[lv.cperm]
        zc = cycle(l + 1, rc)
        if lv.cperm is not None:
            zc = zc[lv.ciperm]
        if lv.P is not None:
            z = z + band_matvec(lv.P, zc)[:r.shape[0]]
            if lv.P_oob is not None:
                z = z.at[lv.P_oob.rows].add(
                    lv.P_oob.vals * zc[lv.P_oob.cols])
        else:
            z = z + jnp.repeat(zc, AGG)[:r.shape[0]]
        # post-smooth the residual with the same smoother (keeps the
        # preconditioner symmetric for CG)
        z = z + smooth(lv, As,
                       r - band_apply(As, lv.dvec, z, lv.oob), l)
        return z

    return cycle(0, r)


#: iterations between true-residual checks inside a band CG pass. The
#: f32 three-term recurrence drifts from the TRUE residual on long
#: passes (measured at 994k DOFs: a 435-iteration pass reported a
#: recurrence metric of 4.9e-5 while the true f64 residual had only
#: contracted to 3.0e-2 -- every iteration past the drift point is
#: wasted). Each check costs one extra operator apply (~2% at 48), and
#: when the recurrence overshoots the truth the pass restarts from the
#: freshly computed residual IN-DEVICE, keeping the momentum loss
#: bounded (an unconditional restart-every-100 costs only ~12% more
#: iterations on the 994k matrix; the triggered restart is gentler).
CG_CHECK_EVERY = 48


def _chunked_pcg(op, prec, invd, b, tol, x0, max_iter,
                 stall_window: int, check_every: int = CG_CHECK_EVERY):
    """Preconditioned CG with drift-guarded chunks.

    Runs up to ``check_every`` recurrence iterations, then recomputes
    the true residual b - A x (one extra apply, ~2%). The pass ends
    when the TRUE metric reaches ``tol``, or when the recurrence has
    reached ``tol`` while the true metric stagnates across checks (the
    f32 floor -- further iterations cannot help), or on the usual
    iteration/stall limits. When the recurrence claims a much better
    norm than the truth while the truth is still contracting, the
    recurrence RESTARTS from the fresh residual in-device -- without
    this, a long pass burns hundreds of wasted iterations (994k: a
    435-iteration pass reported 4.9e-5 while the true residual stood
    at 3.0e-2). Returns the TRUE relative metric. Shared by band_pcg
    and blocktri.bt_pcg; the Jacobi-weighted metric and stall
    semantics match ops/solver.py."""
    import jax
    import jax.numpy as jnp

    res0 = jnp.dot(invd * b, b)
    res0 = jnp.where(res0 == 0.0, 1.0, res0)

    r = b - op(x0)
    z = prec(r)
    p = z
    res = jnp.dot(z, r)
    stop = jnp.dot(invd * r, r)

    def inner_cond(state):
        _, _, _, res, stop, it, best, since, j = state
        return jnp.logical_and(
            jnp.sqrt(jnp.abs(stop) / res0) > tol,
            jnp.logical_and(
                jnp.logical_and(it < max_iter, since < stall_window),
                j < check_every))

    def inner_body(state):
        x, r, p, res, stop, it, best, since, j = state
        u = op(p)
        delta = res / jnp.dot(p, u)
        x = x + delta * p
        r = r - delta * u
        z = prec(r)
        res_new = jnp.dot(z, r)
        stop = jnp.dot(invd * r, r)
        p = z + (res_new / res) * p
        improved = jnp.abs(res_new) < 0.99 * best
        best = jnp.where(improved, jnp.abs(res_new), best)
        since = jnp.where(improved, 0, since + 1)
        return x, r, p, res_new, stop, it + 1, best, since, j + 1

    def outer_cond(state):
        *_, done = state
        return jnp.logical_not(done)

    def outer_body(state):
        x, r, p, res, stop, it, best, since, stop_prev, _done = state
        x, r, p, res, stop, it, best, since, _ = jax.lax.while_loop(
            inner_cond, inner_body,
            (x, r, p, res, stop, it, best, since,
             jnp.array(0, jnp.int32)))
        rec_ok = jnp.sqrt(jnp.abs(stop) / res0) <= tol
        rt = b - op(x)
        stop_t = jnp.dot(invd * rt, rt)
        true_ok = jnp.sqrt(stop_t / res0) <= tol
        # truth no longer improving 2x in norm per check: f32 floor
        stagnant = stop_t > 0.25 * stop_prev
        done = jnp.logical_or(
            jnp.logical_or(true_ok,
                           jnp.logical_and(rec_ok, stagnant)),
            jnp.logical_or(it >= max_iter, since >= stall_window))
        drift = stop_t > 2.25 * jnp.abs(stop)
        restart = jnp.logical_and(jnp.logical_not(done),
                                  jnp.logical_or(drift, rec_ok))

        # On restart the ENTIRE carried stopping state must reset to the
        # truth: returning the stale recurrence `stop` made the restart a
        # no-op (inner_cond saw a <=tol value and ran zero iterations, so
        # the next check read "rec_ok and stagnant" and exited a pass
        # that had done no work), and keeping the drifted `best`/`since`
        # let the stall guard abort the restarted pass within
        # stall_window iterations. The preconditioner apply also lives
        # inside the cond now, so a no-restart check round costs one
        # operator apply, not an apply plus a V-cycle.
        def _do_restart(_):
            z2 = prec(rt)
            res2 = jnp.dot(z2, rt)
            return (rt, z2, res2, stop_t, jnp.abs(res2),
                    jnp.array(0, jnp.int32))

        def _no_restart(_):
            return r, p, res, stop, best, since

        r2, p2, res2, stop2, best2, since2 = jax.lax.cond(
            restart, _do_restart, _no_restart, None)
        return (x, r2, p2, res2, stop2, it, best2, since2, stop_t,
                done)

    state = (x0, r, p, res, stop, jnp.array(0, jnp.int32), jnp.abs(res),
             jnp.array(0, jnp.int32), jnp.array(jnp.inf, res0.dtype),
             jnp.array(False))
    x, r, p, res, stop, it, _, _, stop_t, _ = jax.lax.while_loop(
        outer_cond, outer_body, state)
    return x, jnp.sqrt(stop_t / res0), it


@functools.partial(__import__("jax").jit,
                   static_argnames=("max_iter", "stall_window"))
def band_pcg(amg: BandAMG, b, tol, x0, max_iter, stall_window: int = 120,
             bt=None):
    """CG on the fine band operator with the band V-cycle preconditioner
    (same stopping metric and stagnation guard as ops/solver.py), drift-
    guarded in chunks of CG_CHECK_EVERY iterations (_chunked_pcg).
    ``bt`` optionally upgrades the V-cycle's fine smoother to the
    in-part block-tridiagonal solve (band_vcycle)."""
    lv0 = amg.levels[0]

    def op(x):
        return band_apply(lv0.A, lv0.dvec, x, lv0.oob)

    def prec(r):
        return band_vcycle(amg, r, bt=bt)

    # stopping metric: the JACOBI-weighted residual norm, matching the
    # host refinement driver's metric in ops/solver.py exactly (up to
    # f32 rounding). Stopping on the V-cycle inner product z.r instead
    # would over- or under-shoot the host check by the (unknown)
    # spectral distance between the V-cycle and Jacobi, costing a whole
    # extra ~50-iteration restart pass per solve.
    return _chunked_pcg(op, prec, lv0.invd, b, tol, x0, max_iter,
                        stall_window)


@functools.partial(__import__("jax").jit, static_argnames=("m",))
def band_fgmres(amg: BandAMG, b, m: int = 16):
    """One GMRES(m) cycle, right-preconditioned by the band V-cycle.

    The bf16 fine operator perturbs A by ~4e-3 of its norm -- more than
    the smallest eigenvalues of an ill-conditioned FEM system, so the
    perturbed operator is effectively indefinite and CG diverges (three-
    term recurrences have no residual-minimization safety net). GMRES
    minimizes the residual of the perturbed system, contracting until
    the bf16 floor; the mixed-precision refinement driver then restarts
    it from the true f64 residual, exactly as it restarts CG passes.
    """
    import jax
    import jax.numpy as jnp

    lv0 = amg.levels[0]
    n = b.shape[0]

    def op(x):
        return band_apply(lv0.A, lv0.dvec, x, lv0.oob)

    beta = jnp.linalg.norm(b)
    bsafe = jnp.maximum(beta, 1e-30)
    V = jnp.zeros((m + 1, n), b.dtype).at[0].set(b / bsafe)
    Z = jnp.zeros((m, n), b.dtype)
    H = jnp.zeros((m + 1, m), b.dtype)

    def body(j, carry):
        V, Z, H = carry
        z = band_vcycle(amg, V[j])
        w = op(z)
        mask = jnp.arange(m + 1) <= j
        # classical Gram-Schmidt, two passes (stable and all-matmul)
        h1 = jnp.where(mask, V @ w, 0.0)
        w = w - h1 @ V
        h2 = jnp.where(mask, V @ w, 0.0)
        w = w - h2 @ V
        hcol = h1 + h2
        wn = jnp.linalg.norm(w)
        V = V.at[j + 1].set(w / jnp.maximum(wn, 1e-30))
        Z = Z.at[j].set(z)
        H = H.at[:, j].set(hcol.at[j + 1].add(wn))
        return V, Z, H

    # float32 matmul precision: the default bf16 matmul passes corrupt
    # the Arnoldi basis (measured on the 1M benchmark: the Hessenberg
    # least-squares reports rel 0.045 while the TRUE residual is 0.28 --
    # the computed H stops describing the actual Krylov space). Same
    # fix as band_csym_fgmres.
    with jax.default_matmul_precision("float32"):
        V, Z, H = jax.lax.fori_loop(0, m, body, (V, Z, H))
    e1 = jnp.zeros(m + 1, b.dtype).at[0].set(beta)
    y, _, _, _ = jnp.linalg.lstsq(H, e1)
    x = y @ Z
    rel = jnp.linalg.norm(e1 - H @ y) / bsafe
    return x, rel, jnp.array(m, jnp.int32)


@functools.partial(__import__("jax").jit,
                   static_argnames=("max_iter", "stall_window"))
def band_csym_pcg(amg: BandAMG, Aop: BandMatrix, Ai: BandMatrix, br, bi,
                  tol, max_iter, stall_window: int = 300):
    """Complex-symmetric PCG for (Ar + i Ai) x = b on the dense-band MXU
    engine. ``Aop``/``Ai`` are the bands of the true real/imaginary
    parts; ``amg`` is a hierarchy built from the SHIFTED real matrix
    Ar + diag(|Im diag|) (eddy mass lumped onto the diagonal) -- the
    standard shifted-AMG preconditioner for K + i w M systems; the plain
    real-part V-cycle is not reliably contracting as the eddy term
    grows. A real symmetric preconditioner applied to re/im separately
    keeps the bilinear z.r structure of cspars.cpp:822 intact. All
    traffic is float32 (re, im) pairs -- nothing complex exists even on
    device, so this also sidesteps backends that cannot move complex
    buffers."""
    import jax
    import jax.numpy as jnp

    n = br.shape[0]
    lv0 = amg.levels[0]

    def opc(xr, xi):
        ar_xr = band_matvec(Aop, xr)[:n]
        ar_xi = band_matvec(Aop, xi)[:n]
        ai_xr = band_matvec(Ai, xr)[:n]
        ai_xi = band_matvec(Ai, xi)[:n]
        return ar_xr - ai_xi, ar_xi + ai_xr

    def prec(rr, ri):
        return band_vcycle(amg, rr), band_vcycle(amg, ri)

    def cdot(ar, ai, br_, bi_):
        return (jnp.sum(ar * br_ - ai * bi_),
                jnp.sum(ar * bi_ + ai * br_))

    def cdiv(ar, ai, br_, bi_):
        den = br_ * br_ + bi_ * bi_
        return ((ar * br_ + ai * bi_) / den,
                (ai * br_ - ar * bi_) / den)

    # Jacobi-weighted bilinear norm of b as the reference scale (the
    # host refinement driver uses the same metric)
    invd = lv0.invd
    bb_r = br * br - bi * bi
    bb_i = 2.0 * br * bi
    res0 = jnp.hypot(jnp.sum(invd * bb_r), jnp.sum(invd * bb_i))
    res0 = jnp.where(res0 == 0.0, 1.0, res0)

    rr, ri = br, bi                   # x0 = 0
    zr, zi = prec(rr, ri)
    pr, pi = zr, zi
    res_r, res_i = cdot(zr, zi, rr, ri)

    def stopnorm(rr, ri):
        sr = rr * rr - ri * ri
        si = 2.0 * rr * ri
        return jnp.hypot(jnp.sum(invd * sr), jnp.sum(invd * si))

    stop = stopnorm(rr, ri)

    def cond(st):
        (_, _, _, _, _, _, _, _, stop, it, best, since) = st
        return jnp.logical_and(
            jnp.sqrt(stop / res0) > tol,
            jnp.logical_and(it < max_iter, since < stall_window))

    def body(st):
        (xr, xi, rr, ri, pr, pi, res_r, res_i, stop, it, best,
         since) = st
        ur, ui = opc(pr, pi)
        pap_r, pap_i = cdot(pr, pi, ur, ui)
        dr, di = cdiv(res_r, res_i, pap_r, pap_i)
        xr = xr + dr * pr - di * pi
        xi = xi + dr * pi + di * pr
        rr = rr - (dr * ur - di * ui)
        ri = ri - (dr * ui + di * ur)
        zr, zi = prec(rr, ri)
        rn_r, rn_i = cdot(zr, zi, rr, ri)
        br_, bi_ = cdiv(rn_r, rn_i, res_r, res_i)
        pr, pi = (zr + br_ * pr - bi_ * pi,
                  zi + br_ * pi + bi_ * pr)
        stop = stopnorm(rr, ri)
        mag = jnp.hypot(rn_r, rn_i)
        improved = mag < 0.99 * best
        best = jnp.where(improved, mag, best)
        since = jnp.where(improved, 0, since + 1)
        return (xr, xi, rr, ri, pr, pi, rn_r, rn_i, stop, it + 1, best,
                since)

    st = (jnp.zeros(n, br.dtype), jnp.zeros(n, br.dtype), rr, ri, pr, pi,
          res_r, res_i, stop, jnp.array(0, jnp.int32),
          jnp.hypot(res_r, res_i), jnp.array(0, jnp.int32))
    (xr, xi, rr, ri, pr, pi, res_r, res_i, stop, it, _, _) = \
        jax.lax.while_loop(cond, body, st)
    return xr, xi, jnp.sqrt(stop / res0), it


@functools.partial(__import__("jax").jit, static_argnames=("m",))
def band_csym_fgmres(amg: BandAMG, Aop: BandMatrix, Ai: BandMatrix,
                     br, bi, m: int = 24, bt=None):
    """One complex GMRES(m) cycle for (Ar + i Ai) x = b, right-
    preconditioned by the shifted-real band-AMG V-cycle, expressed in
    (re, im) float32 pairs. GMRES minimizes the residual monotonically,
    which the complex-symmetric CG recurrence does not guarantee (its
    bilinear form has no positivity; per-pass contraction was erratic
    on eddy-current systems). The small (m+1) x m Hessenberg least-
    squares runs in complex on device -- complex values never cross the
    host boundary.

    ``bt`` (optional): a block-tridiagonal factorization of the SAME
    shifted real matrix (ops/blocktri.py) -- a much stronger
    preconditioner than the V-cycle, applied to re/im separately."""
    import jax
    import jax.numpy as jnp

    n = br.shape[0]

    def opc(xr, xi):
        ar_xr = band_matvec(Aop, xr)[:n]
        ar_xi = band_matvec(Aop, xi)[:n]
        ai_xr = band_matvec(Ai, xr)[:n]
        ai_xi = band_matvec(Ai, xi)[:n]
        return ar_xr - ai_xi, ar_xi + ai_xr

    beta = jnp.sqrt(jnp.sum(br * br + bi * bi))
    bsafe = jnp.maximum(beta, 1e-30)
    Vr = jnp.zeros((m + 1, n), br.dtype).at[0].set(br / bsafe)
    Vi = jnp.zeros((m + 1, n), br.dtype).at[0].set(bi / bsafe)
    Zr = jnp.zeros((m, n), br.dtype)
    Zi = jnp.zeros((m, n), br.dtype)
    Hr = jnp.zeros((m + 1, m), br.dtype)
    Hi = jnp.zeros((m + 1, m), br.dtype)

    def body(j, carry):
        Vr, Vi, Zr, Zi, Hr, Hi = carry
        if bt is None:
            zr = band_vcycle(amg, Vr[j])
            zi = band_vcycle(amg, Vi[j])
        else:
            from .blocktri import bt_apply
            zr = bt_apply(bt, Vr[j])
            zi = bt_apply(bt, Vi[j])
        wr, wi = opc(zr, zi)
        mask = jnp.arange(m + 1) <= j
        # Hermitian Gram-Schmidt <v, w> = sum(conj(v) w), two passes,
        # all-matmul
        h1r = jnp.where(mask, Vr @ wr + Vi @ wi, 0.0)
        h1i = jnp.where(mask, Vr @ wi - Vi @ wr, 0.0)
        wr = wr - (h1r @ Vr - h1i @ Vi)
        wi = wi - (h1r @ Vi + h1i @ Vr)
        h2r = jnp.where(mask, Vr @ wr + Vi @ wi, 0.0)
        h2i = jnp.where(mask, Vr @ wi - Vi @ wr, 0.0)
        wr = wr - (h2r @ Vr - h2i @ Vi)
        wi = wi - (h2r @ Vi + h2i @ Vr)
        hcr = h1r + h2r
        hci = h1i + h2i
        wn = jnp.sqrt(jnp.sum(wr * wr + wi * wi))
        wsafe = jnp.maximum(wn, 1e-30)
        Vr = Vr.at[j + 1].set(wr / wsafe)
        Vi = Vi.at[j + 1].set(wi / wsafe)
        Zr = Zr.at[j].set(zr)
        Zi = Zi.at[j].set(zi)
        Hr = Hr.at[:, j].set(hcr.at[j + 1].add(wn))
        Hi = Hi.at[:, j].set(hci)
        return Vr, Vi, Zr, Zi, Hr, Hi

    # float32 matmul precision: the TPU's default bf16 matmul passes are
    # fine for the V-cycle preconditioner but corrupt the Arnoldi basis
    # (the computed Hessenberg stops describing the actual Krylov space
    # and the "minimized" residual diverges from the true one,
    # collapsing the per-cycle contraction)
    with jax.default_matmul_precision("float32"):
        Vr, Vi, Zr, Zi, Hr, Hi = jax.lax.fori_loop(
            0, m, body, (Vr, Vi, Zr, Zi, Hr, Hi))
    H = jax.lax.complex(Hr, Hi)
    e1 = jnp.zeros(m + 1, H.dtype).at[0].set(beta.astype(H.dtype))
    y, _, _, _ = jnp.linalg.lstsq(H, e1)
    yr = jnp.real(y)
    yi = jnp.imag(y)
    xr = yr @ Zr - yi @ Zi
    xi = yr @ Zi + yi @ Zr
    rel = jnp.abs(jnp.linalg.norm(e1 - H @ y)) / bsafe
    return xr, xi, rel.astype(br.dtype), jnp.array(m, jnp.int32)


@functools.partial(__import__("jax").jit,
                   static_argnames=("m", "cycles"))
def band_csym_fgmres_fused(amg: BandAMG, Aop: BandMatrix, Ai: BandMatrix,
                           br, bi, tol, m: int = 24, cycles: int = 8,
                           bt=None):
    """Restarted GMRES(m) for (Ar + i Ai) x = b in ONE device dispatch.

    The mixed-precision refinement driver restarts GMRES cycles from
    the exact f64 residual; on a remote (tunneled) TPU each restart
    pays four host<->device transfers plus a host complex SpMV, which
    dominates the eddy-current solve wall time. This kernel runs up to
    ``cycles`` restarts with the TRUE f32 residual recomputed ON DEVICE
    between cycles (two extra complex band applies per cycle, noise
    next to the m x 4 applies inside the cycle), exiting early once the
    relative l2 residual drops under ``tol``. The driver still measures
    the f64 contract metric (cspars.cpp:300 bilinear form) on host
    afterwards -- only intermediate restarts are fused, the convergence
    guarantee is unchanged."""
    import jax
    import jax.numpy as jnp

    n = br.shape[0]

    def opc(xr, xi):
        ar_xr = band_matvec(Aop, xr)[:n]
        ar_xi = band_matvec(Aop, xi)[:n]
        ai_xr = band_matvec(Ai, xr)[:n]
        ai_xi = band_matvec(Ai, xi)[:n]
        return ar_xr - ai_xi, ar_xi + ai_xr

    b2 = jnp.maximum(jnp.sum(br * br + bi * bi), 1e-30)

    def cond(st):
        _xr, _xi, rn, j, _its = st
        return jnp.logical_and(rn > tol, j < cycles)

    def body(st):
        xr, xi, _rn, j, its = st
        ar, ai_ = opc(xr, xi)
        rcr = br - ar
        rci = bi - ai_
        dr, di, _rel, it = band_csym_fgmres(amg, Aop, Ai, rcr, rci,
                                            m=m, bt=bt)
        xr = xr + dr
        xi = xi + di
        ar2, ai2 = opc(xr, xi)
        r2 = jnp.sum((br - ar2) ** 2 + (bi - ai2) ** 2)
        rn = jnp.sqrt(r2 / b2)
        return xr, xi, rn, j + 1, its + it

    st0 = (jnp.zeros(n, br.dtype), jnp.zeros(n, br.dtype),
           jnp.array(jnp.inf, br.dtype), jnp.array(0, jnp.int32),
           jnp.array(0, jnp.int32))
    xr, xi, rn, _j, its = jax.lax.while_loop(cond, body, st0)
    return xr, xi, rn, its
