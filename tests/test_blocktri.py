"""Block-tridiagonal MXU factorization (ops/blocktri.py).

Unit-level: the factor of a banded SPD matrix is a near-exact inverse
and bt_pcg converges in a handful of iterations. End-to-end: the band
engine with the factor active (forced on the CPU backend) reproduces
the golden Temp.fem solution through the full Newton loop, exercising
the frozen-factor staleness/refactor path the TPU takes.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from xfemm_tpu.ops import blocktri as bt
from xfemm_tpu.ops import solver
from xfemm_tpu.ops.band import fill_band_device, pack_band_layout


def _banded_spd(n, bw, seed=0, density=0.25):
    rng = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    for i in range(n):
        for j in range(max(0, i - bw), i + 1):
            if i == j or rng.random() < density:
                rows.append(i)
                cols.append(j)
                vals.append(rng.normal())
    A = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    A = A + A.T
    A = (A + sp.diags(np.abs(A).sum(axis=1).A1 + 1.0)).tocsr()
    A.sum_duplicates()
    return A


def test_factor_is_near_exact():
    A = _banded_spd(700, 90)
    assert bt.bandwidth(A) <= 90
    lay = bt.pack_layout(A, 128)
    maps = bt.device_maps(lay)
    f = bt.build_factor(maps, A.data, b=lay.b, NB=lay.NB)
    rng = np.random.default_rng(1)
    x_true = rng.normal(size=A.shape[0])
    rhs = A @ x_true
    z = np.asarray(bt.bt_apply(f, jnp.asarray(rhs, jnp.float32)),
                   np.float64)
    assert np.linalg.norm(z - x_true) < 1e-5 * np.linalg.norm(x_true)


def test_bt_pcg_converges_fast():
    A = _banded_spd(700, 90)
    n = A.shape[0]
    lay = bt.pack_layout(A, 128)
    f = bt.build_factor(bt.device_maps(lay), A.data, b=lay.b, NB=lay.NB)
    layb = pack_band_layout(A, 128, 128)
    Aop = fill_band_device(layb, A.data, 128)
    invd = jnp.asarray(1.0 / A.diagonal(), jnp.float32)
    rng = np.random.default_rng(2)
    x_true = rng.normal(size=n)
    rhs = A @ x_true
    x, rel, it = bt.bt_pcg(Aop, None, invd, f,
                           jnp.asarray(rhs, jnp.float32),
                           jnp.float32(1e-8),
                           jnp.zeros(n, jnp.float32), 50)
    assert int(it) <= 6
    err = np.linalg.norm(np.asarray(x, np.float64) - x_true)
    assert err < 1e-5 * np.linalg.norm(x_true)


def test_frozen_factor_still_preconditions_drifted_operator():
    """Mimics the Newton loop: factor A0, solve with a drifted A1."""
    A0 = _banded_spd(700, 90, seed=3)
    n = A0.shape[0]
    # ~10% multiplicative drift of the values (keeps SPD via diagonal)
    rng = np.random.default_rng(4)
    A1 = A0.copy()
    A1.data = A1.data * (1.0 + 0.1 * rng.random(A1.nnz))
    A1 = (A1 + A1.T) / 2.0
    A1 = (A1 + sp.diags(np.abs(A1).sum(axis=1).A1 * 0.05)).tocsr()
    A1.sum_duplicates()
    lay = bt.pack_layout(A0, 128)
    f = bt.build_factor(bt.device_maps(lay), A0.data, b=lay.b, NB=lay.NB)
    layb = pack_band_layout(A1, 128, 128)
    Aop = fill_band_device(layb, A1.data, 128)
    invd = jnp.asarray(1.0 / A1.diagonal(), jnp.float32)
    x_true = rng.normal(size=n)
    rhs = A1 @ x_true
    x, rel, it = bt.bt_pcg(Aop, None, invd, f,
                           jnp.asarray(rhs, jnp.float32),
                           jnp.float32(1e-7),
                           jnp.zeros(n, jnp.float32), 100)
    assert int(it) <= 30
    err = np.linalg.norm(np.asarray(x, np.float64) - x_true)
    assert err < 1e-4 * np.linalg.norm(x_true)


@pytest.fixture
def forced_band(monkeypatch):
    monkeypatch.setenv("XFEMM_TPU_FORCE_BAND", "1")
    solver.band_platform_ok.cache_clear()
    solver._BAND_CACHE.clear()
    yield
    solver.band_platform_ok.cache_clear()
    solver._BAND_CACHE.clear()


def test_band_bt_engine_matches_golden(fixtures, forced_band):
    """Full nonlinear Newton solve (Temp.fem) through the band engine
    with the block-tridiagonal factor active, vs the reference golden
    .ans -- the same contract as test_magnetostatics, on the TPU code
    path."""
    from scipy.spatial import cKDTree

    from xfemm_tpu.geometry import femfile
    from xfemm_tpu.io import ansfile
    from xfemm_tpu.mesh.meshdata import read_mesh_files
    from xfemm_tpu.models import magnetostatics

    p = femfile.load(str(fixtures / "Temp.fem"))
    mesh = read_mesh_files(str(fixtures / "Temp"))
    sol = magnetostatics.solve(p, mesh)

    g = ansfile.read_ans(str(fixtures / "Temp.ans.golden"))
    tree = cKDTree(mesh.nodes)
    d, idx = tree.query(g.mesh.nodes)
    assert d.max() < 1e-12
    Ag = np.real(g.values)
    scale = np.abs(Ag).max()
    assert np.abs(sol.A[idx] - Ag).max() / scale < 1e-05


def test_chunked_build_matches_fused():
    """build_factor_chunked threads the Schur carry across chunked
    fill+scan dispatches; the factor must match the one-dispatch
    build exactly (same recurrence, same f32 matmul precision)."""
    import scipy.sparse as sp

    m = 700
    T = sp.diags([-1.0, 2.2, -1.0], [-1, 0, 1], (m, m))
    A = (sp.kron(sp.eye(6), T)
         + sp.diags([-0.3, -0.3], [-m, m], (6 * m, 6 * m))).tocsr()
    A.sum_duplicates()
    b = bt.pick_block(bt.bandwidth(A))
    lay = bt.pack_layout(A, b)
    maps = bt.device_maps(lay)
    f1 = bt.build_factor(maps, A.data, b=b, NB=lay.NB)
    f2 = bt.build_factor_chunked(lay, A.data, chunk=2)
    # raw factor entries differ slightly (the chunked build computes
    # its Jacobi scaling on host in f64); the APPLICATION is the
    # contract: both must solve A z = r to f32 accuracy
    from scipy.sparse.linalg import spsolve
    r = np.sin(np.arange(A.shape[0]) * 0.13)
    zref = spsolve(A.tocsc(), r)
    scale = np.abs(zref).max()
    sm = bt.BTSmoother(*f2)     # smoother-role wrapper applies the same
    for f in (f1, sm):
        z = np.asarray(bt.bt_apply(f, r.astype(np.float32)), np.float64)
        assert np.abs(z - zref).max() / scale < 5e-3
