"""Interpret-mode correctness tests for the pallas TPU kernels.

The CPU suite otherwise never exercises ``ops/pallas_band.py`` or the
pallas block-Thomas apply (``_pallas_enabled`` is False off-accelerator
by default): these tests force the kernels through the pallas
interpreter and pin them against the XLA reference lowerings they
replace. The kernels themselves replace the reference's linked-list
SpMV / SSOR sweeps (cfemm/libfemm/spars.cpp:167,197) on TPU.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from xfemm_tpu.ops import band as band_mod
from xfemm_tpu.ops import blocktri
from xfemm_tpu.ops import pallas_band
from xfemm_tpu.ops.band import BandMatrix


@pytest.fixture(autouse=True)
def _force_pallas_interpret(monkeypatch):
    monkeypatch.setenv("XFEMM_TPU_PALLAS", "1")
    monkeypatch.setattr(pallas_band, "INTERPRET", True)
    band_mod._pallas_enabled.cache_clear()
    yield
    band_mod._pallas_enabled.cache_clear()


def _random_band(rng, NT=3, R=128, K=2, cchunk=128, shift0=-1, frac=0.3):
    W = K * cchunk
    dense = rng.standard_normal((NT, R, W)).astype(np.float32)
    dense *= rng.random((NT, R, W)) < frac
    ncols = NT * R - 17
    bm = BandMatrix(dense=jnp.asarray(dense), shift0=shift0,
                    cchunk=cchunk, ncols=ncols)
    x = rng.standard_normal(ncols).astype(np.float32)
    return bm, jnp.asarray(x)


def _xla_matvec(bm, x):
    band_mod._pallas_enabled.cache_clear()
    import os
    os.environ["XFEMM_TPU_PALLAS"] = "0"
    try:
        return np.asarray(band_mod.band_matvec(bm, x))
    finally:
        os.environ["XFEMM_TPU_PALLAS"] = "1"
        band_mod._pallas_enabled.cache_clear()


def test_band_matvec_pallas_matches_xla():
    rng = np.random.default_rng(0)
    bm, x = _random_band(rng)
    assert pallas_band.band_pallas_ok(bm)
    y_ref = _xla_matvec(bm, x)
    y = np.asarray(pallas_band.band_matvec_pallas(bm, x))
    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-5)


def test_band_matvec_pallas_positive_shift():
    rng = np.random.default_rng(1)
    bm, x = _random_band(rng, NT=4, K=3, shift0=1)
    y_ref = _xla_matvec(bm, x)
    y = np.asarray(pallas_band.band_matvec_pallas(bm, x))
    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-5)


def test_band_matvec_pallas_bf16_band():
    """bf16 smoothing-copy bands run the kernel at DEFAULT precision
    (an fp32 contract precision on bf16 operands is rejected by Mosaic
    -- the round-3 994k V-cycle regression)."""
    rng = np.random.default_rng(7)
    bm, x = _random_band(rng)
    bm16 = band_mod.BandMatrix(dense=bm.dense.astype(jnp.bfloat16),
                               shift0=bm.shift0, cchunk=bm.cchunk,
                               ncols=bm.ncols)
    y_ref = _xla_matvec(bm, x)
    y = np.asarray(pallas_band.band_matvec_pallas(bm16, x))
    # bf16 storage rounds every operand to 8 mantissa bits; bound the
    # error in aggregate, not per element (cancellation amplifies the
    # relative error of near-zero sums)
    scale = np.abs(y_ref).max()
    assert np.abs(y - y_ref).max() / scale < 3e-2


def test_band_apply_sym_pallas_matches_two_pass():
    """Fused U x + U^T x - d x == the XLA matvec+rmatvec two-pass on a
    genuinely symmetric matrix stored triu."""
    rng = np.random.default_rng(2)
    n = 3 * 128 - 9
    A = sp.random(n, n, density=0.002, random_state=3, format="csr",
                  dtype=np.float64)
    A = A + A.T + sp.eye(n) * 4.0
    A = sp.csr_matrix(sp.triu(A))
    layout, dense = band_mod.pack_band(A, row_tile=128, cchunk=128)
    _, _, _, shift0, NT, R, W, ncols = layout
    bm = BandMatrix(dense=jnp.asarray(dense), shift0=shift0,
                    cchunk=128, ncols=ncols)
    if not pallas_band.band_pallas_ok(bm):
        pytest.skip("band not pallas-eligible at this bandwidth")
    dvec = jnp.asarray(A.diagonal().astype(np.float32))
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    y_ref = (_xla_matvec(bm, x)[:n]
             + np.asarray(band_mod.band_rmatvec(bm, x))[:n]
             - np.asarray(dvec) * np.asarray(x))
    y = np.asarray(pallas_band.band_apply_sym_pallas(bm, dvec, x))
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)


def test_bt_apply_pallas_matches_scan():
    rng = np.random.default_rng(4)
    b, NB = 128, 5
    n = NB * b - 23
    Sinv = np.stack([np.eye(b) + 0.01 * rng.standard_normal((b, b))
                     for _ in range(NB)]).astype(np.float32)
    Sinv = (Sinv + Sinv.transpose(0, 2, 1)) / 2
    G = (0.05 * rng.standard_normal((NB - 1, b, b))).astype(np.float32)
    s = (np.abs(rng.standard_normal(NB * b)) + 0.5).astype(np.float32)
    bt = blocktri.BTFactor(Sinv=jnp.asarray(Sinv), G=jnp.asarray(G),
                           s=jnp.asarray(s))
    r = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    import os
    os.environ["XFEMM_TPU_PALLAS"] = "0"
    band_mod._pallas_enabled.cache_clear()
    z_ref = np.asarray(blocktri.bt_apply(bt, r))
    os.environ["XFEMM_TPU_PALLAS"] = "1"
    band_mod._pallas_enabled.cache_clear()
    z = np.asarray(blocktri.bt_apply(bt, r))
    scale = np.abs(z_ref).max() + 1e-30
    np.testing.assert_allclose(z / scale, z_ref / scale,
                               rtol=1e-5, atol=1e-5)
