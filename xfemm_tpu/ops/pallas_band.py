"""Pallas TPU kernels for the dense-band engine's hot loop.

The XLA lowering of ``band.band_matvec`` (K shifted reshapes
concatenated into per-tile windows, then a batched einsum) streams the
multi-GB band at ~95 GB/s on a v5e -- 12% of HBM peak (measured in-loop,
20 fused applies at the 250k bench shape 1949x128x2176). These kernels
stream the band through a pallas grid over row tiles with pipelined
block DMA instead.

Layout rules (Mosaic): every block keeps its last two dims either
(8k, 128k)-aligned or equal to the array dims, every in-kernel value
stays rank >= 2, and the per-tile matvec runs on the MXU as a
row-vector matmul (1, W) @ (W, R) -> (1, R) -- 1-D reduction outputs
have no legal vector layout. The band's OVERLAPPING per-tile windows
are materialized by XLA outside the kernel as a (NT, 1, W) tensor: a
few-MB prologue next to the multi-GB band stream.

``band_apply_sym_pallas`` fuses the symmetric (triu) product
U x + U^T x - d*x into ONE pass over the band (the XLA path streams the
triu band twice: matvec + rmatvec); the rmatvec's overlapping window
scatter is returned per-tile and reduced by a K-step XLA epilogue.

Numerics match the XLA path: f32 accumulation regardless of the band's
storage dtype. Replaces the role of the reference's linked-list SpMV
(cfemm/libfemm/spars.cpp:167 MultA) on TPU.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

#: run the kernels through the pallas interpreter (CPU testing)
INTERPRET = os.environ.get("XFEMM_TPU_PALLAS_INTERPRET", "") not in ("", "0")


def _pl():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    return pl, pltpu


def band_pallas_ok(bm) -> bool:
    """Kernel eligibility: lane-aligned tiles and chunks."""
    NT, R, W = bm.dense.shape
    return R % 128 == 0 and bm.cchunk % 128 == 0 and W % bm.cchunk == 0


def _windows(dense_shape, cchunk, shift0, ncols, x):
    """(NT, 1, W) per-tile windows + padded layout constants."""
    NT, R, W = dense_shape
    K = W // cchunk
    lpad = max(0, -shift0) * cchunk
    total = (NT + max(0, shift0) + K) * cchunk + lpad
    base = shift0 + lpad // cchunk
    xpad = jnp.zeros(total, jnp.float32).at[lpad:lpad + ncols].set(
        x.astype(jnp.float32))
    xc = xpad.reshape(-1, cchunk)
    wins = jnp.concatenate(
        [xc[base + s: base + s + NT] for s in range(K)],
        axis=1).reshape(NT, 1, W)
    return wins, xpad, lpad, base, K, total


@functools.partial(jax.jit, static_argnames=("shift0", "cchunk", "ncols"))
def _band_mv_call(dense, x, shift0: int, cchunk: int, ncols: int):
    pl, pltpu = _pl()
    NT, R, W = dense.shape
    wins, _xpad, _lpad, _base, _K, _tot = _windows(
        dense.shape, cchunk, shift0, ncols, x)

    # f32 bands need 3-pass f32 MXU passes (the default single-pass
    # bf16 multiply costs ~4e-3 relative error); bf16 bands (smoothing
    # copies) are single-pass by construction -- Mosaic rejects an fp32
    # contract precision on bf16 operands
    prec = (jax.lax.Precision.HIGHEST if dense.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def kernel(w_ref, d_ref, o_ref):
        d = d_ref[0]                                 # (R, W)
        win = w_ref[0].astype(d.dtype)               # (1, W)
        # row-vector MXU matvec: (1, W) @ (W, R) via contracting W
        o_ref[0] = jax.lax.dot_general(
            win, d, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                          # (1, R)

    y = pl.pallas_call(
        kernel,
        grid=(NT,),
        in_specs=[
            pl.BlockSpec((1, 1, W), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, W), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, R), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NT, 1, R), jnp.float32),
        interpret=INTERPRET,
    )(wins, dense)
    return y.reshape(-1)


def band_matvec_pallas(bm, x):
    """Drop-in for ``band.band_matvec`` (returns the (NT*R,) product)."""
    return _band_mv_call(bm.dense, x, bm.shift0, bm.cchunk, bm.ncols)


@functools.partial(jax.jit, static_argnames=("shift0", "cchunk", "ncols"))
def _band_sym_call(dense, dvec, x, shift0: int, cchunk: int, ncols: int):
    """y = U x + U^T x - dvec * x in ONE stream of the triu band."""
    pl, pltpu = _pl()
    NT, R, W = dense.shape
    wins, xpad, lpad, base, K, total = _windows(
        dense.shape, cchunk, shift0, ncols, x)
    xrows = xpad[lpad:lpad + NT * R].reshape(NT, 1, R)

    prec = (jax.lax.Precision.HIGHEST if dense.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def kernel(w_ref, xr_ref, d_ref, o_ref, c_ref):
        d = d_ref[0]                                 # (R, W)
        win = w_ref[0].astype(d.dtype)               # (1, W)
        o_ref[0] = jax.lax.dot_general(
            win, d, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                          # (1, R)
        xr = xr_ref[0].astype(d.dtype)               # (1, R)
        # rmatvec contribution of this tile: x_rows(t)^T U_t, kept
        # per-tile; the overlapping window accumulation happens in the
        # XLA epilogue (K static shifted adds)
        c_ref[0] = jax.lax.dot_general(
            xr, d, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                          # (1, W)

    y, contrib = pl.pallas_call(
        kernel,
        grid=(NT,),
        in_specs=[
            pl.BlockSpec((1, 1, W), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, R), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, W), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, R), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NT, 1, R), jnp.float32),
            jax.ShapeDtypeStruct((NT, 1, W), jnp.float32),
        ),
        interpret=INTERPRET,
    )(wins, xrows, dense)
    contrib = contrib.reshape(NT, K, cchunk)
    z = jnp.zeros((total // cchunk, cchunk), jnp.float32)
    for s in range(K):
        z = z.at[base + s: base + s + NT].add(contrib[:, s])
    zt = z.reshape(-1)[lpad:lpad + ncols]
    return (y.reshape(-1)[:ncols] + zt
            - dvec * x[:ncols].astype(jnp.float32))


def band_apply_sym_pallas(bm, dvec, x):
    """Drop-in for the sym branch of ``band.band_apply`` (n = len(x))."""
    n = x.shape[0]
    return _band_sym_call(bm.dense, dvec, x, bm.shift0, bm.cchunk,
                          bm.ncols)[:n]
