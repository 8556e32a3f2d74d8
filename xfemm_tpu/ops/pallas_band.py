"""Pallas TPU kernels for the dense-band engine's hot loop.

The XLA lowering of ``band.band_matvec`` (K shifted reshapes
concatenated into per-tile windows, then a batched einsum) streams the
multi-GB band at ~130 GB/s on a v5e -- 16% of HBM peak -- because the
window concat materializes and the batched GEMV pipeline under-overlaps
its HBM reads. These kernels exploit the band layout directly: tile
``t`` multiplies the CONTIGUOUS slice ``xpad[(t+base)*cchunk :
(t+base)*cchunk + W]``, so a grid over row tiles with the vector held
whole in VMEM turns the product into a pure double-buffered stream of
the dense band (pallas pipelines the next tile's DMA behind the current
tile's MXU work automatically).

``band_apply_sym_pallas`` additionally fuses the symmetric (triu)
product U x + U^T x - d*x into ONE pass over the band: the XLA path
(band_matvec + band_rmatvec) streams the triu band twice.

Numerics match the XLA path: f32 accumulation regardless of the band's
storage dtype (bf16 bands upcast per tile).

Replaces the role of the reference's linked-list SpMV
(cfemm/libfemm/spars.cpp:167 MultA) on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

#: the vector (padded) must fit VMEM alongside two band tiles; 6 MB of
#: f32 covers ~1.5M DOFs and leaves headroom for double buffering
VMEM_X_MAX = 6 * 2 ** 20


import os

#: run the kernels through the pallas interpreter (CPU testing)
INTERPRET = os.environ.get("XFEMM_TPU_PALLAS_INTERPRET", "") not in ("", "0")


def _pl():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    return pl, pltpu


def band_pallas_ok(bm) -> bool:
    """Kernel eligibility: vector fits VMEM, lane-aligned tiles."""
    NT, R, W = bm.dense.shape
    total = (NT + max(0, bm.shift0) + W // bm.cchunk) * bm.cchunk \
        + max(0, -bm.shift0) * bm.cchunk
    return (R % 8 == 0 and W % 128 == 0 and bm.cchunk % 8 == 0
            and 4 * total <= VMEM_X_MAX)


@functools.partial(jax.jit, static_argnames=("shift0", "cchunk", "ncols"))
def _band_mv_call(dense, x, shift0: int, cchunk: int, ncols: int):
    pl, pltpu = _pl()
    NT, R, W = dense.shape
    K = W // cchunk
    lpad = max(0, -shift0) * cchunk
    total = (NT + max(0, shift0) + K) * cchunk + lpad
    base = shift0 + lpad // cchunk
    xpad = jnp.zeros(total, jnp.float32).at[lpad:lpad + ncols].set(
        x.astype(jnp.float32))

    def kernel(x_ref, d_ref, o_ref):
        t = pl.program_id(0)
        win = x_ref[pl.ds((base + t) * cchunk, W)]
        d = d_ref[0]
        # VPU broadcast-FMA + lane reduce: a (R, 1)-column MXU matvec
        # violates the 128-lane output tiling, and the product is
        # HBM-bound anyway (2 FLOPs per band byte)
        prod = d.astype(jnp.float32) * win.astype(jnp.float32)[None, :]
        o_ref[:] = jnp.sum(prod, axis=1)

    y = pl.pallas_call(
        kernel,
        grid=(NT,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),      # xpad, whole
            pl.BlockSpec((1, R, W), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R,), lambda t: (t,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NT * R,), jnp.float32),
        interpret=INTERPRET,
    )(xpad, dense)
    return y


def band_matvec_pallas(bm, x):
    """Drop-in for ``band.band_matvec`` (returns the (NT*R,) product)."""
    return _band_mv_call(bm.dense, x, bm.shift0, bm.cchunk, bm.ncols)


@functools.partial(jax.jit, static_argnames=("shift0", "cchunk", "ncols"))
def _band_sym_call(dense, dvec, x, shift0: int, cchunk: int, ncols: int):
    """y = U x + U^T x - dvec * x in ONE stream of the triu band.

    The rmatvec contributions of tile t land in the same contiguous
    window positions the matvec reads, so a SEQUENTIAL grid accumulates
    them into a VMEM-resident padded output; successive tiles' windows
    overlap by at most W - cchunk, which the sequential grid handles
    naturally (pallas TPU grids run in order on one core)."""
    pl, pltpu = _pl()
    NT, R, W = dense.shape
    K = W // cchunk
    lpad = max(0, -shift0) * cchunk
    total = (NT + max(0, shift0) + K) * cchunk + lpad
    base = shift0 + lpad // cchunk
    xpad = jnp.zeros(total, jnp.float32).at[lpad:lpad + ncols].set(
        x.astype(jnp.float32))

    def kernel(x_ref, d_ref, yz_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            yz_ref[:] = jnp.zeros_like(yz_ref)

        win = x_ref[pl.ds((base + t) * cchunk, W)]
        d = d_ref[0].astype(jnp.float32)
        # matvec rows of this tile: U_t @ win (VPU broadcast + reduce)
        ymv = jnp.sum(d * win.astype(jnp.float32)[None, :], axis=1)
        # rmatvec: U_t^T @ x_rows(t) scattered into the window slice
        xrow = x_ref[pl.ds(lpad + t * R, R)]
        contrib = jnp.sum(d * xrow.astype(jnp.float32)[:, None], axis=0)
        start = (base + t) * cchunk
        yz_ref[pl.ds(start, W)] += contrib
        yz_ref[pl.ds(lpad + t * R, R)] += ymv

    yz = pl.pallas_call(
        kernel,
        grid=(NT,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, W), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total,), jnp.float32),
        interpret=INTERPRET,
    )(xpad, dense)
    y = yz[lpad:lpad + ncols]
    return y - dvec * x[:ncols].astype(jnp.float32)


def band_apply_sym_pallas(bm, dvec, x):
    """Drop-in for the sym branch of ``band.band_apply`` (n = len(x))."""
    n = x.shape[0]
    return _band_sym_call(bm.dense, dvec, x, bm.shift0, bm.cchunk,
                          bm.ncols)[:n]
