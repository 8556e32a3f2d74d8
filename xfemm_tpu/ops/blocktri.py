"""Block-tridiagonal MXU factorization: a near-exact preconditioner.

After the reverse-Cuthill-McKee reordering the FEM matrix has bandwidth
``bw ~ 2 sqrt(N)`` (919 at 248k DOFs); whenever ``bw <= b`` for a block
size ``b`` the matrix is EXACTLY block-tridiagonal with dense ``b x b``
blocks:

    A = [D_0  L_0^T           ]
        [L_0  D_1   L_1^T     ]
        [     L_1   D_2   ... ]

A block-Thomas factorization is then pure dense MXU work -- a
``lax.scan`` of ``b x b`` inversions and matmuls:

    S_0 = D_0;  G_i = L_i S_i^{-1};  S_{i+1} = D_{i+1} - G_i L_i^T

and applying the factor is two scans of ``b``-sized matvecs
(forward ``y_i = r_i - G_{i-1} y_{i-1}``, backward
``x_i = S_i^{-1} y_i - G_i^T x_{i+1}``). In f32 with symmetric Jacobi
scaling one application contracts the residual by ~1e3-1e4 -- far
stronger than a multigrid V-cycle -- so the band-CG that previously
needed ~25-70 V-cycle-preconditioned iterations per solve converges in
a handful, and the factor can stay FROZEN across Newton iterations
(permeability drift degrades it gracefully; the session's staleness
rule triggers a refactor).

This replaces the role of the reference's SSOR preconditioner
(cfemm/libfemm/spars.cpp:197 MultPC) for the band engine; only the
solve tolerance is the contract (spars.cpp:300), so the preconditioner
is free to differ.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from .band import BandMatrix, band_apply

#: supported block sizes: multiples of 128 (MXU tile) up to 2048
#: (beyond that the factor does not fit a single chip's HBM anyway).
#: The finer steps matter: a bandwidth-1037 matrix pays 5.35 GB at the
#: next power of two (2048) but only 3.0 GB at 1152 -- the difference
#: between the strong bt-alone regime fitting the device or not (the
#: heat benchmark's exact case).
BLOCK_SIZES = (256, 384, 512, 640, 768, 896, 1024, 1152, 1280,
               1536, 1792, 2048)

#: pallas bt kernels double-buffer one (1, b, b) block in VMEM; above
#: this size two f32 blocks exceed the ~16 MB VMEM and the apply falls
#: back to the lax.scan path
PALLAS_MAX_BLOCK = 1280


class BTFactor(NamedTuple):
    """Frozen block-tridiagonal factorization of the (Jacobi-scaled)
    operator. ``Sinv`` is (NB, b, b), ``G`` is (NB-1, b, b), ``s`` the
    (npad,) symmetric scaling so that prec(r) = s * apply(s * r)."""
    Sinv: jnp.ndarray
    G: jnp.ndarray
    s: jnp.ndarray


class BTSmoother(NamedTuple):
    """A block-tridiagonal factor in the SMOOTHER role.

    Same fields as BTFactor (``bt_apply`` accepts either), but the
    distinct pytree type tells the solve paths to compose it with the
    band-AMG coarse correction (band.band_vcycle's level-0 smoother)
    instead of using it as the standalone CG preconditioner: it factors
    only the KEPT in-part band of a partitioned ordering, which alone
    degrades like 1/H (measured 33x the iterations on the 250k bench)
    but is an exact per-part solve inside the two-level cycle."""
    Sinv: jnp.ndarray
    G: jnp.ndarray
    s: jnp.ndarray


@jax.tree_util.register_pytree_node_class
class BTCoarse:
    """A block-tridiagonal factor serving as the (near-)exact bottom
    solve of a two-grid band hierarchy, together with the ordering in
    which it was factored. The Galerkin coarse matrix inherits the fine
    RCM ordering, whose bandwidth the prolongator smoothing has widened;
    re-RCM-ing the COARSE matrix recovers a ~2x smaller block size (and
    a ~4x smaller factor), at the price of one gather each way per
    coarse solve. ``perm``/``iperm`` are None when the factor was built
    in hierarchy order. ``n`` (the logical coarse dimension) is static
    aux data -- it sizes the restriction slice under jit."""

    def __init__(self, factor: BTFactor, n: int, perm=None, iperm=None):
        self.factor = factor
        self.n = n
        self.perm = perm
        self.iperm = iperm

    def tree_flatten(self):
        return (self.factor, self.perm, self.iperm), (self.n,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        factor, perm, iperm = children
        return cls(factor, aux[0], perm, iperm)


def bt_coarse_apply(btc: BTCoarse, rc):
    """Near-exact coarse solve in hierarchy ordering (traceable)."""
    rcp = rc if btc.perm is None else rc[btc.perm]
    z = bt_apply(btc.factor, rcp)
    return z if btc.iperm is None else z[btc.iperm]


class BTLayout(NamedTuple):
    """Host scatter maps from permuted-CSR entry order into the D/L
    block buffers (value-only refreshes reuse them)."""
    b: int                    # block size
    NB: int                   # number of blocks
    n: int                    # logical dimension (npad = NB*b)
    keep: np.ndarray          # entries kept (diag + lower blocks)
    tgt_is_L: np.ndarray      # of kept: True -> L, False -> D
    blk: np.ndarray           # of kept: block index into D or L
    rloc: np.ndarray          # of kept: row within block
    cloc: np.ndarray          # of kept: col within block
    rows: np.ndarray          # of kept: global row (for scaling)
    cols: np.ndarray          # of kept: global col
    diag_pos: np.ndarray      # position in the FULL permuted data of
                              # each diagonal entry (n,)


def bandwidth(Ap: sp.csr_matrix) -> int:
    rows = np.repeat(np.arange(Ap.shape[0]), np.diff(Ap.indptr))
    if Ap.nnz == 0:
        return 0
    return int(np.abs(Ap.indices - rows).max())


def pick_block(bw: int) -> int | None:
    for b in BLOCK_SIZES:
        if bw <= b:
            return b
    return None


def factor_bytes(n: int, b: int, itemsize: int = 4) -> int:
    """HBM held by a finished factor (Sinv + G)."""
    NB = (n + b - 1) // b
    return (2 * NB - 1) * b * b * itemsize


def pack_layout(Ap: sp.csr_matrix, b: int) -> BTLayout:
    """Slot of every kept CSR entry of the RCM-permuted matrix in the
    (D, L) block buffers. Upper-block entries (bi == bj - 1) are
    redundant by symmetry and dropped."""
    n = Ap.shape[0]
    NB = (n + b - 1) // b
    rows = np.repeat(np.arange(n), np.diff(Ap.indptr)).astype(np.int64)
    cols = Ap.indices.astype(np.int64)
    bi = rows // b
    bj = cols // b
    assert np.abs(bi - bj).max() <= 1, "matrix is not block-tridiagonal"
    keep = bi >= bj
    bik = bi[keep]
    bjk = bj[keep]
    is_L = bik == bjk + 1
    blk = np.where(is_L, bjk, bik)
    rloc = rows[keep] - bik * b
    cloc = cols[keep] - bjk * b
    dpos = np.nonzero(rows == cols)[0]
    assert dpos.size == n
    return BTLayout(b=b, NB=NB, n=n,
                    keep=np.nonzero(keep)[0].astype(np.int64),
                    tgt_is_L=is_L,
                    blk=blk.astype(np.int32),
                    rloc=rloc.astype(np.int32),
                    cloc=cloc.astype(np.int32),
                    rows=rows[keep].astype(np.int32),
                    cols=cols[keep].astype(np.int32),
                    diag_pos=dpos.astype(np.int64))


class BTDeviceMaps(NamedTuple):
    """Device-resident scatter maps (built once per pattern)."""
    sel: jnp.ndarray          # kept-entry positions in the full data
    d_flat: jnp.ndarray       # of kept: flat index into D (or 0)
    l_flat: jnp.ndarray       # of kept: flat index into L (or 0)
    is_L: jnp.ndarray         # of kept: bool
    rows: jnp.ndarray
    cols: jnp.ndarray
    diag_pos: jnp.ndarray
    pad_diag: jnp.ndarray     # flat indices into D for identity padding


def device_maps(lay: BTLayout) -> BTDeviceMaps:
    b, NB, n = lay.b, lay.NB, lay.n
    d_flat = (lay.blk.astype(np.int64) * b + lay.rloc) * b + lay.cloc
    pad = np.arange(n, NB * b, dtype=np.int64)
    pblk = pad // b
    ploc = pad - pblk * b
    pad_diag = (pblk * b + ploc) * b + ploc
    return BTDeviceMaps(
        sel=jnp.asarray(lay.keep),
        d_flat=jnp.asarray(np.where(lay.tgt_is_L, 0, d_flat)),
        l_flat=jnp.asarray(np.where(lay.tgt_is_L, d_flat, 0)),
        is_L=jnp.asarray(lay.tgt_is_L),
        rows=jnp.asarray(lay.rows),
        cols=jnp.asarray(lay.cols),
        diag_pos=jnp.asarray(lay.diag_pos),
        pad_diag=jnp.asarray(pad_diag))


@functools.partial(jax.jit,
                   static_argnames=("b", "NB", "store_dtype"))
def _fill_and_factor(maps: BTDeviceMaps, data, b: int, NB: int,
                     store_dtype=jnp.float32):
    """Scatter the permuted CSR values into (D, L), symmetric-Jacobi
    scale, and run the block-Thomas factorization -- one dispatch.

    The matmul chain runs at float32 precision (3-pass bf16): the
    factor must resolve the small eigenvalues of an ill-conditioned FEM
    operator, and single-pass bf16 matmuls lose exactly that part of
    the spectrum.  ``store_dtype=bfloat16`` halves the bytes every
    bt_apply streams afterwards, but measured on the 250k bench
    (b=1024, NB=244) it DOUBLES the preconditioned-CG iteration count
    (25 -> 48 its): rounding injected at every one of the ~2*NB
    sequential scan steps compounds, so the cheap bytes lose.  Kept as
    an option for shallow factors; production stores f32."""
    n = maps.diag_pos.shape[0]
    npad = NB * b
    diag = data[maps.diag_pos]
    safe = jnp.where(diag == 0.0, 1.0, diag)
    s_log = jax.lax.rsqrt(jnp.abs(safe).astype(jnp.float32))
    s = jnp.ones(npad, jnp.float32).at[:n].set(s_log)

    vals = data[maps.sel].astype(jnp.float32) \
        * s[maps.rows] * s[maps.cols]
    dvals = jnp.where(maps.is_L, 0.0, vals)
    lvals = jnp.where(maps.is_L, vals, 0.0)
    D = (jnp.zeros(NB * b * b, jnp.float32)
         .at[maps.d_flat].add(dvals)
         .at[maps.pad_diag].add(1.0)
         .reshape(NB, b, b))
    # the diagonal-block scatter only wrote kept (lower-triangle-of-
    # block... no: D blocks carry BOTH triangles since the full CSR is
    # symmetric and in-diagonal-block entries are all kept)
    L = (jnp.zeros(max(NB - 1, 1) * b * b, jnp.float32)
         .at[maps.l_flat].add(lvals)
         .reshape(max(NB - 1, 1), b, b))

    with jax.default_matmul_precision("float32"):
        def step(Sprev, inputs):
            Di, Li = inputs
            Sinv = jnp.linalg.inv(Sprev)
            G = Li @ Sinv
            return Di - G @ Li.T, (Sinv, G)

        Slast, (Sinv, G) = jax.lax.scan(step, D[0], (D[1:], L[:NB - 1]))
        Sinv_last = jnp.linalg.inv(Slast)
    Sinv = jnp.concatenate([Sinv, Sinv_last[None]], 0)
    return BTFactor(Sinv=Sinv.astype(store_dtype),
                    G=G.astype(store_dtype), s=s)


def build_factor(maps: BTDeviceMaps, data_p: np.ndarray, b: int,
                 NB: int, store_dtype=jnp.float32) -> BTFactor:
    """Factor from the permuted CSR values (host array, any dtype)."""
    return _fill_and_factor(maps, jnp.asarray(data_p, jnp.float32),
                            b=b, NB=NB, store_dtype=store_dtype)


@functools.partial(jax.jit, static_argnames=("nb", "b"))
def _fill_blocks(dv, dflat, lv, lflat, pv, pflat, nb: int, b: int):
    D = (jnp.zeros(nb * b * b, jnp.float32).at[dflat].add(dv)
         .at[pflat].add(pv).reshape(nb, b, b))
    L = jnp.zeros(nb * b * b, jnp.float32).at[lflat].add(lv) \
        .reshape(nb, b, b)
    return D, L


@functools.partial(jax.jit, static_argnames=("store",))
def _scan_chunk(Sprev, D, L, store):
    with jax.default_matmul_precision("float32"):
        def step(S, inputs):
            Di, Li = inputs
            Sinv = jnp.linalg.inv(S)
            G = Li @ Sinv
            return Di - G @ Li.T, (Sinv.astype(store), G.astype(store))

        Slast, (Sinv, G) = jax.lax.scan(step, Sprev, (D, L))
    return Slast, Sinv, G


def bt_build_transient_bytes(n: int, b: int) -> int:
    """Device bytes the factor BUILD transiently needs on top of the
    finished factor: the fused one-dispatch build fills full f32 (D, L)
    buffers, the chunked build (factors over 2 GB) bounds the fill to
    ~2 GB of chunks."""
    fb = factor_bytes(n, b)
    return fb if fb <= 2e9 else int(2e9)


def build_factor_chunked(lay: BTLayout, data_p: np.ndarray,
                         store_dtype=jnp.float32,
                         chunk: int | None = None) -> BTFactor:
    """Block-Thomas factor built in CHUNKS of blocks: the one-dispatch
    ``_fill_and_factor`` materializes the full (D, L) buffers next to
    the (Sinv, G) outputs -- a 2x-factor-bytes transient that cannot
    fit beside a 1M-class band hierarchy (b=1024 at 994k: 8.15 GB of
    f32 fill on top of the resident band). Here the host drives
    ceil(NB/chunk) fill+scan dispatches threading the b x b Schur
    carry, so the transient is bounded by one chunk (2 * chunk * b^2
    f32) regardless of NB. Numerics are identical: the scan recurrence
    and its f32 matmul precision are unchanged, chunking only batches
    the sequential steps differently."""
    b, NB, n = lay.b, lay.NB, lay.n
    if chunk is None:
        # bound the per-chunk (D, L) fill to ~1 GB f32
        chunk = max(8, int(1e9 // (b * b * 8)))
    data64 = np.asarray(data_p, np.float64)
    diag = data64[lay.diag_pos]
    safe = np.where(diag == 0.0, 1.0, diag)
    s_host = np.ones(NB * b, np.float32)
    s_host[:n] = (1.0 / np.sqrt(np.abs(safe))).astype(np.float32)
    vals = (data64[lay.keep] * s_host[lay.rows] * s_host[lay.cols]) \
        .astype(np.float32)
    isL = lay.tgt_is_L
    blk = lay.blk.astype(np.int64)
    rloc = lay.rloc.astype(np.int64)
    cloc = lay.cloc.astype(np.int64)
    pad = np.arange(n, NB * b, dtype=np.int64)
    pblk = pad // b
    ploc = pad - pblk * b
    empty = np.zeros(0, np.float32)
    empty_i = np.zeros(0, np.int64)

    # S_0 = D_0; then chunks of scan steps i in [1, NB)
    D0, _ = _fill_blocks(
        vals[(~isL) & (blk == 0)],
        (rloc[(~isL) & (blk == 0)]) * b + cloc[(~isL) & (blk == 0)],
        empty, empty_i,
        jnp.ones(int((pblk == 0).sum()), jnp.float32),
        (pblk[pblk == 0] * 0 + ploc[pblk == 0]) * b + ploc[pblk == 0],
        nb=1, b=b)
    carry = D0[0]
    sinv_parts = []
    g_parts = []
    s0 = 1
    while s0 < NB:
        s1 = min(s0 + chunk, NB)
        # fill D rows [s0, s1) shifted so index i maps to D[i - s0],
        # and L indices [s0-1, s1-1) to L[i - (s0-1)]
        nb = s1 - s0
        dm = (~isL) & (blk >= s0) & (blk < s1)
        dflat = ((blk[dm] - s0) * b + rloc[dm]) * b + cloc[dm]
        lm = isL & (blk >= s0 - 1) & (blk < s1 - 1)
        lflat = ((blk[lm] - (s0 - 1)) * b + rloc[lm]) * b + cloc[lm]
        pm = (pblk >= s0) & (pblk < s1)
        pflat = ((pblk[pm] - s0) * b + ploc[pm]) * b + ploc[pm]
        D, L = _fill_blocks(vals[dm], jnp.asarray(dflat),
                            vals[lm], jnp.asarray(lflat),
                            jnp.ones(int(pm.sum()), jnp.float32),
                            jnp.asarray(pflat), nb=nb, b=b)
        carry, Sinv_c, G_c = _scan_chunk(carry, D, L, store_dtype)
        sinv_parts.append(Sinv_c)
        g_parts.append(G_c)
        s0 = s1
    with jax.default_matmul_precision("float32"):
        Sinv_last = jnp.linalg.inv(carry).astype(store_dtype)
    Sinv = jnp.concatenate(sinv_parts + [Sinv_last[None]], 0) \
        if sinv_parts else Sinv_last[None]
    G = jnp.concatenate(g_parts, 0) if g_parts else \
        jnp.zeros((0, b, b), store_dtype)
    return BTFactor(Sinv=Sinv, G=G, s=jnp.asarray(s_host))


def bt_build(maps_or_lay, vals, b: int, NB: int,
             store_dtype=jnp.float32) -> BTFactor:
    """Build a factor through either path: BTDeviceMaps -> the
    one-dispatch fused fill+factor, BTLayout -> the chunked build
    (large factors whose fill transient would not fit)."""
    if isinstance(maps_or_lay, BTLayout):
        return build_factor_chunked(maps_or_lay, vals,
                                    store_dtype=store_dtype)
    return build_factor(maps_or_lay, vals, b=b, NB=NB,
                        store_dtype=store_dtype)


def _bt_apply_pallas(bt: BTFactor, rs, NB: int, b: int):
    """The two block-Thomas sweeps as sequential pallas grids with the
    carry vector in VMEM scratch: XLA's lax.scan of b x b matvecs
    under-overlaps its HBM reads the same way the band einsum does;
    the pallas pipeline streams Sinv/G at near peak. All values stay
    rank-2 ((1, b) row vectors) for legal Mosaic layouts."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from .pallas_band import INTERPRET

    rb = rs.reshape(NB, 1, b)
    G, Sinv = bt.G, bt.Sinv
    # bf16-stored factors (opt-in) cannot take an fp32 contract
    # precision on the MXU; f32 factors need the 3-pass multiply
    prec = (jax.lax.Precision.HIGHEST if G.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def fwd_kernel(r_ref, g_ref, o_ref, carry):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            carry[:] = jnp.zeros_like(carry)

        g = g_ref[0]
        # y_t = r_t - G_{t-1} y_{t-1}; (G y)_i = y_row @ G^T
        y = r_ref[0] - jax.lax.dot_general(
            carry[:].astype(g.dtype), g,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)
        carry[:] = y
        o_ref[0] = y

    ys = pl.pallas_call(
        fwd_kernel,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, 1, b), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            # t=0 reads G[0] but multiplies a zero carry
            pl.BlockSpec((1, b, b),
                         lambda t: (jnp.maximum(t - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, b), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, 1, b), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, b), jnp.float32)],
        interpret=INTERPRET,
    )(rb, G)

    # backward sweep in two single-matrix kernels: a (1, b, b) block is
    # 4 MB at b=1024 and pallas double-buffers every input -- two
    # matrices per grid step (Sinv_t AND G_t) blow the 16 MB VMEM limit
    def q_kernel(y_ref, s_ref, o_ref):
        s = s_ref[0]
        # q_t = Sinv_t y_t (Sinv symmetric)
        o_ref[0] = jax.lax.dot_general(
            y_ref[0].astype(s.dtype), s,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)

    qs = pl.pallas_call(
        q_kernel,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, 1, b), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, b), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, b), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, 1, b), jnp.float32),
        interpret=INTERPRET,
    )(ys, Sinv)

    def bwd_kernel(q_ref, g_ref, o_ref, carry):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            carry[:] = jnp.zeros_like(carry)

        g = g_ref[0]
        # z_t = q_t - G_t^T z_{t+1}; (G^T z)_j = z_row @ G
        z = q_ref[0] - jax.lax.dot_general(
            carry[:].astype(g.dtype), g,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)
        carry[:] = z
        o_ref[0] = z

    zs = pl.pallas_call(
        bwd_kernel,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, 1, b), lambda k: (NB - 1 - k, 0, 0),
                         memory_space=pltpu.VMEM),
            # k=0 (t = NB-1) has no G_t; zero carry kills the term
            pl.BlockSpec((1, b, b),
                         lambda k: (jnp.minimum(NB - 1 - k, NB - 2), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, b), lambda k: (NB - 1 - k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, 1, b), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, b), jnp.float32)],
        interpret=INTERPRET,
    )(qs, G)
    return zs.reshape(-1)


def bt_apply(bt: BTFactor, r):
    """z ~= A^{-1} r (padded to npad internally; traceable)."""
    from .band import _pallas_enabled
    NB, b, _ = bt.Sinv.shape
    npad = NB * b
    n = r.shape[0]
    rs = jnp.zeros(npad, jnp.float32).at[:n].set(bt.s[:n] * r)
    if _pallas_enabled() and b % 128 == 0 and NB >= 2 \
            and b <= PALLAS_MAX_BLOCK:
        z = _bt_apply_pallas(bt, rs, NB, b)
        return bt.s[:n] * z[:n]
    rb = rs.reshape(NB, b)

    with jax.default_matmul_precision("float32"):
        def fwd(carry, inputs):
            Gi, ri = inputs
            y = ri - Gi @ carry
            return y, y

        _, ys = jax.lax.scan(fwd, rb[0], (bt.G, rb[1:]))
        ys = jnp.concatenate([rb[:1], ys], 0)

        def bwd(carry, inputs):
            Sinv_i, Gi, yi = inputs
            z = Sinv_i @ yi - Gi.T @ carry
            return z, z

        zl = bt.Sinv[-1] @ ys[-1]
        _, zs = jax.lax.scan(bwd, zl, (bt.Sinv[:-1], bt.G, ys[:-1]),
                             reverse=True)
    z = jnp.concatenate([zs, zl[None]], 0).reshape(-1)
    return bt.s[:n] * z[:n]


@functools.partial(jax.jit,
                   static_argnames=("max_iter", "stall_window"))
def bt_pcg(Aop: BandMatrix, dvec, invd, bt: BTFactor, rhs, tol, x0,
           max_iter, stall_window: int = 40, oob=None):
    """CG on the dense-band operator preconditioned by the (possibly
    frozen) block-tridiagonal factor. Stopping metric: Jacobi-weighted
    residual norm relative to ``rhs`` -- identical to band.band_pcg and
    the host refinement driver, so tolerances compose unchanged.
    ``oob`` is the out-of-band COO sidecar of a partitioned ordering
    (band.Sidecar), part of the operator but not the factor. Drift-
    guarded in chunks (band._chunked_pcg): long f32 recurrences report
    converged while the true residual lags orders of magnitude."""
    from .band import _chunked_pcg

    def op(x):
        return band_apply(Aop, dvec, x, oob)

    def prec(r):
        return bt_apply(bt, r)

    return _chunked_pcg(op, prec, invd, rhs, tol, x0, max_iter,
                        stall_window)
