"""Out-of-band sidecar machinery of the dense-band engine.

A few far-off-diagonal couplings (periodic folds, partitioned
orderings) must not blow the dense band window up to the full matrix
width: ops/band.py::plan_level carves them into a COO Sidecar and
band_apply adds them back. These tests pin the split decision, the
operator parity (band + sidecar == CSR), the value-only refresh path,
and the RCB partition ordering itself.
"""

import numpy as np
import pytest
import scipy.sparse as sp

jax = pytest.importorskip("jax")

from xfemm_tpu.ops import band as band_mod  # noqa: E402


def _banded_spd_with_outliers(n=8000, bw=6, n_far=40, seed=0):
    """SPD matrix: tight band plus a handful of symmetric far couplings
    (the shape periodic folds / partitioned orderings produce)."""
    rng = np.random.default_rng(seed)
    diags = [4.0 * np.ones(n)]
    offsets = [0]
    for k in range(1, bw + 1):
        v = -0.4 / k * np.ones(n - k)
        diags += [v, v]
        offsets += [k, -k]
    A = sp.diags(diags, offsets, format="lil")
    far = rng.choice(n // 2 - 10, size=n_far, replace=False)
    for i in far:
        j = i + n // 2
        A[i, j] = -0.05
        A[j, i] = -0.05
    A = A.tocsr()
    A.sum_duplicates()
    return A


@pytest.mark.parametrize("sym", [False, True])
def test_sidecar_split_and_apply_parity(sym):
    A = _banded_spd_with_outliers()
    n = A.shape[0]
    amg, lay = band_mod.setup_band_amg(
        A.astype(np.float64), sym=sym,
        **({"fine_dtype": None} if sym else {}))
    lv0 = amg.levels[0]
    # the 40 far couplings must land in the sidecar, not the band
    assert lv0.oob is not None
    assert lay.keep_sel is not None and lay.oob_src is not None
    NT, R, W = lv0.A.dense.shape
    assert W < n // 4, "window must track the in-band width"
    x = np.cos(np.arange(n) * 0.37).astype(np.float32)
    import jax.numpy as jnp
    y = np.asarray(band_mod.band_apply(
        lv0.A, lv0.dvec, jnp.asarray(x), lv0.oob))
    ref = A @ x.astype(np.float64)
    assert np.allclose(y, ref, rtol=0, atol=2e-4 * np.abs(ref).max())


def test_sidecar_pcg_solves():
    A = _banded_spd_with_outliers()
    n = A.shape[0]
    amg, lay = band_mod.setup_band_amg(A.astype(np.float64))
    import jax.numpy as jnp
    rng = np.random.default_rng(1)
    xref = rng.standard_normal(n)
    b = A @ xref
    scale = np.abs(b).max()
    x, rel, it = band_mod.band_pcg(
        amg, jnp.asarray((b / scale).astype(np.float32)),
        jnp.asarray(1e-6, jnp.float32), jnp.zeros(n, jnp.float32), 800)
    x = np.asarray(x, np.float64) * scale
    err = np.linalg.norm(x - xref) / np.linalg.norm(xref)
    assert float(rel) <= 1e-6
    assert err < 1e-3, err


def test_sidecar_value_refresh_parity():
    A = _banded_spd_with_outliers()
    n = A.shape[0]
    amg, lay = band_mod.setup_band_amg(A.astype(np.float64), sym=True)
    lv0 = amg.levels[0]
    if lv0.dvec is None:
        pytest.skip("matrix too small for triu storage tier")
    # refresh with scaled values (same pattern) and re-check parity
    A2 = A * 1.7
    A2.sum_duplicates()
    amg2 = band_mod.update_fine_values(amg, lay,
                                       np.ascontiguousarray(A2.data))
    lv = amg2.levels[0]
    import jax.numpy as jnp
    x = np.sin(np.arange(n) * 0.11).astype(np.float32)
    y = np.asarray(band_mod.band_apply(
        lv.A, lv.dvec, jnp.asarray(x), lv.oob))
    ref = A2 @ x.astype(np.float64)
    assert np.allclose(y, ref, rtol=0, atol=2e-4 * np.abs(ref).max())


def test_partitioned_hierarchy_coarse_reorder_pcg():
    """A partition-ordered fine level must not leak interface outliers
    into the coarse Galerkin levels: the next level is rebuilt in its
    own RCM order (BandLevel.cperm) and the V-cycle bridges the
    orderings. PCG through that hierarchy must still solve."""
    m = 160
    n = m * m
    ii, jj = np.meshgrid(np.arange(m), np.arange(m), indexing="ij")
    coords = np.stack([ii.ravel(), jj.ravel()], axis=1).astype(np.float64)
    idx = np.arange(n).reshape(m, m)
    rows = np.concatenate([idx[:-1].ravel(), idx[:, :-1].ravel()])
    cols = np.concatenate([idx[1:].ravel(), idx[:, 1:].ravel()])
    A = sp.coo_matrix((-np.ones(rows.size), (rows, cols)), shape=(n, n))
    A = (A + A.T + sp.diags(4.05 * np.ones(n))).tocsr()
    p = band_mod.partition_order(A, coords,
                                 band_mod.pick_parts(n, min_part=3000))
    Ap = A[p][:, p].tocsr()
    Ap.sum_duplicates()
    amg, lay = band_mod.setup_band_amg(Ap.astype(np.float64))
    lv0 = amg.levels[0]
    assert lv0.oob is not None, "partitioned fine level must split"
    assert lv0.cperm is not None, "coarse level must be re-RCM'd"
    # every level below the fine must be tightly banded
    for lv in amg.levels[1:]:
        NT, R, W = lv.A.dense.shape
        assert W < lv.A.ncols // 2, (W, lv.A.ncols)
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    xref = rng.standard_normal(n)
    b = Ap @ xref
    scale = np.abs(b).max()
    x, rel, it = band_mod.band_pcg(
        amg, jnp.asarray((b / scale).astype(np.float32)),
        jnp.asarray(1e-6, jnp.float32), jnp.zeros(n, jnp.float32), 900)
    err = np.linalg.norm(np.asarray(x, np.float64) * scale - xref) \
        / np.linalg.norm(xref)
    assert float(rel) <= 1e-6, float(rel)
    assert err < 1e-3, err


def test_partition_order_shrinks_band():
    """RCB + in-part RCM: the in-band width after the sidecar split
    must shrink vs global RCM on a 2-D grid Laplacian."""
    m = 160                       # 25.6k-node grid
    n = m * m
    ii, jj = np.meshgrid(np.arange(m), np.arange(m), indexing="ij")
    coords = np.stack([ii.ravel(), jj.ravel()], axis=1).astype(np.float64)
    idx = np.arange(n).reshape(m, m)
    rows = np.concatenate([idx[:-1].ravel(), idx[:, :-1].ravel()])
    cols = np.concatenate([idx[1:].ravel(), idx[:, 1:].ravel()])
    data = -np.ones(rows.size)
    A = sp.coo_matrix((data, (rows, cols)), shape=(n, n))
    A = (A + A.T + sp.diags(4.05 * np.ones(n))).tocsr()

    from scipy.sparse.csgraph import reverse_cuthill_mckee
    p_rcm = np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True))
    parts = band_mod.pick_parts(n, min_part=3000)
    assert parts >= 4
    p_rcb = band_mod.partition_order(A, coords, parts)
    assert np.array_equal(np.sort(p_rcb), np.arange(n))

    def in_band_width(p):
        Ap = A[p][:, p].tocsr()
        r = np.repeat(np.arange(n), np.diff(Ap.indptr))
        dist = np.abs(Ap.indices - r)
        _R, cut, _split = band_mod.plan_level(dist, n, sym=False)
        return cut

    w_rcm = in_band_width(p_rcm)
    w_rcb = in_band_width(p_rcb)
    assert w_rcb < 0.7 * w_rcm, (w_rcb, w_rcm)
