"""Solver-level tests: direct f64 path vs f32 iterative refinement.

On TPU hardware float64 silently truncates to f32, so the production
solve path is mixed-precision refinement (ops/solver.py). These tests
force that path on CPU and check it still meets the reference's
convergence contract (relative preconditioned residual <= Precision,
spars.cpp:300-313) and agrees with the native-f64 solve.
"""

import numpy as np
import pytest

from xfemm_tpu.mesh import mesher
from xfemm_tpu.models import benchprob, magnetostatics
from xfemm_tpu.ops import solver


@pytest.fixture(scope="module")
def small_system():
    p = benchprob.build(1200)
    mesh = mesher.mesh_problem(p)
    return p, mesh


def test_mixed_precision_matches_direct(small_system, monkeypatch):
    p, mesh = small_system
    sol64 = magnetostatics.solve(p, mesh)
    assert sol64.residual <= p.Precision

    monkeypatch.setattr(solver, "device_f64_ok", lambda: False)
    solmx = magnetostatics.solve(p, mesh)
    assert solmx.residual <= p.Precision
    scale = np.abs(sol64.A).max()
    assert np.abs(solmx.A - sol64.A).max() / scale < 1e-7


def test_mixed_precision_fixed_values(monkeypatch):
    # tiny 1-D Laplace chain with inhomogeneous Dirichlet ends
    n = 64
    idx = np.stack([np.arange(n - 1), np.arange(1, n)], axis=1)
    sign = np.ones_like(idx, float)
    mat = np.tile(np.array([[1.0, -1.0], [-1.0, 1.0]]), (n - 1, 1, 1))
    blocks = [solver.ElementBlock(idx=idx, sign=sign, mat=mat)]
    fixed = np.zeros(n, bool)
    fixed[[0, -1]] = True
    vals = np.zeros(n)
    vals[-1] = 2.0

    monkeypatch.setattr(solver, "device_f64_ok", lambda: False)
    x, relres, _ = solver.solve(blocks, np.zeros(n), fixed, vals, 1e-12)
    x = np.asarray(x)
    expect = 2.0 * np.arange(n) / (n - 1)
    assert np.abs(x - expect).max() < 1e-10


def test_band_engine_matches_direct(monkeypatch):
    """The dense-band MXU path (forced on by pretending the device has
    no f64) must reproduce the f64 solve to refinement accuracy."""
    p = benchprob.build(4000)
    mesh = mesher.mesh_problem(p)
    sol64 = magnetostatics.solve(p, mesh)

    monkeypatch.setattr(solver, "device_f64_ok", lambda: False)
    monkeypatch.setattr(solver, "band_platform_ok", lambda: True)
    monkeypatch.setattr(solver, "ROW_TILE_MIN", 64)
    solb = magnetostatics.solve(p, mesh)
    assert solb.residual <= p.Precision
    scale = np.abs(sol64.A).max()
    # both trajectories stop inside the Newton acceptance ball
    # (||dV||/||V|| < 1e-6, the convergence contract), so the two
    # fixed points may legitimately differ by up to that ball
    assert np.abs(solb.A - sol64.A).max() / scale < 1e-6


def _fresh_band_caches(monkeypatch):
    import collections
    monkeypatch.setattr(solver, "_BAND_CACHE", collections.OrderedDict())
    monkeypatch.setattr(solver, "_PATTERN_CACHE", collections.OrderedDict())


def test_band_sym_mode_matches_direct(monkeypatch):
    """Upper-band (symmetric) storage: A x = U x + U^T x - diag x must
    reproduce the full-band solve (memory halving for 1M-class runs)."""
    import xfemm_tpu.ops.band as band

    p = benchprob.build(4000)
    mesh = mesher.mesh_problem(p)
    sol64 = magnetostatics.solve(p, mesh)

    _fresh_band_caches(monkeypatch)
    monkeypatch.setattr(solver, "device_f64_ok", lambda: False)
    monkeypatch.setattr(solver, "band_platform_ok", lambda: True)
    monkeypatch.setattr(solver, "ROW_TILE_MIN", 64)
    monkeypatch.setattr(band, "SYM_MIN_BYTES", 0)
    orig = solver._band_bytes_estimate
    monkeypatch.setattr(
        solver, "_band_bytes_estimate",
        lambda Ap, rt, sym=False, itemsize=4:
            orig(Ap, rt, sym, itemsize) if sym and itemsize == 4 else 1e18)
    solb = magnetostatics.solve(p, mesh)
    assert solb.residual <= p.Precision
    scale = np.abs(sol64.A).max()
    # both trajectories stop inside the Newton acceptance ball
    # (||dV||/||V|| < 1e-6, the convergence contract), so the two
    # fixed points may legitimately differ by up to that ball
    assert np.abs(solb.A - sol64.A).max() / scale < 1e-6


def test_band_sym_bf16_operator(monkeypatch):
    """bf16 fine operator (the 1M-DOF memory mode): the refinement
    driver must still reach the f64 contract, just with more passes."""
    import xfemm_tpu.ops.band as band

    p = benchprob.build(4000)
    mesh = mesher.mesh_problem(p)
    sol64 = magnetostatics.solve(p, mesh)

    _fresh_band_caches(monkeypatch)
    monkeypatch.setattr(solver, "device_f64_ok", lambda: False)
    monkeypatch.setattr(solver, "band_platform_ok", lambda: True)
    monkeypatch.setattr(solver, "ROW_TILE_MIN", 64)
    monkeypatch.setattr(band, "SYM_MIN_BYTES", 0)
    orig = solver._band_bytes_estimate
    monkeypatch.setattr(
        solver, "_band_bytes_estimate",
        lambda Ap, rt, sym=False, itemsize=4:
            orig(Ap, rt, sym, itemsize) if sym and itemsize == 2 else 1e18)
    solb = magnetostatics.solve(p, mesh)
    assert solb.residual <= p.Precision
    scale = np.abs(sol64.A).max()
    # both trajectories stop inside the Newton acceptance ball
    # (||dV||/||V|| < 1e-6, the convergence contract), so the two
    # fixed points may legitimately differ by up to that ball
    assert np.abs(solb.A - sol64.A).max() / scale < 1e-6
    # the band engine must have stayed ENGAGED with a bf16 fine operator
    # (guards against a silent latch-off to the Jacobi fallback, which
    # would make this test vacuous -- the bf16 refinement's first pass
    # legitimately overshoots and must be tolerated, not latched)
    import jax.numpy as jnp
    cached = list(solver._BAND_CACHE.values())
    assert cached, "band hierarchy was never built/cached"
    assert cached[0]["band_amg"].levels[0].A.dense.dtype == jnp.bfloat16


def test_pcg_csym_pairs_matches_complex():
    """The real-(re,im)-pairs complex-symmetric CG (the TPU transfer
    path, which must not move complex buffers) solves the same system
    as the complex-dtype kernel."""
    import numpy as np
    import scipy.sparse as sp
    import jax.numpy as jnp
    from xfemm_tpu.ops import solver as sv

    rng = np.random.default_rng(7)
    n, E, K = 60, 120, 3
    idx = rng.integers(0, n, size=(E, K))
    sign = np.ones((E, K))
    base = rng.standard_normal((E, K, K)) + 1j * rng.standard_normal((E, K, K))
    mat = base + np.swapaxes(base, 1, 2)       # complex symmetric
    for e in range(E):                          # diagonal dominance
        for k in range(K):
            mat[e, k, k] += 6.0 + 2.0j
    blk = sv.ElementBlock(idx=idx, sign=sign, mat=mat)
    fixed = np.zeros(n, bool)

    A = sp.coo_matrix(
        (mat.reshape(E, -1).ravel(),
         (np.broadcast_to(idx[:, :, None], (E, K, K)).ravel(),
          np.broadcast_to(idx[:, None, :], (E, K, K)).ravel())),
        shape=(n, n)).tocsr()
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    x_ref = sp.linalg.spsolve(A.tocsc(), b)

    blocks_ri = ((jnp.asarray(idx), jnp.asarray(sign, jnp.float32),
                  jnp.asarray(mat.real, jnp.float32),
                  jnp.asarray(mat.imag, jnp.float32)),)
    diag = np.asarray(A.diagonal())
    xr, xi, rel, it = sv._pcg_csym_pairs(
        blocks_ri, jnp.asarray(b.real, jnp.float32),
        jnp.asarray(b.imag, jnp.float32),
        jnp.asarray(diag.real, jnp.float32),
        jnp.asarray(diag.imag, jnp.float32),
        jnp.asarray(fixed), jnp.asarray(1e-6, jnp.float32), 2000)
    x = np.asarray(xr, np.float64) + 1j * np.asarray(xi, np.float64)
    err = np.abs(x - x_ref).max() / np.abs(x_ref).max()
    assert err < 1e-4, (err, int(it))


def test_band_csym_pcg_solves_eddy_system():
    """The dense-band complex-symmetric CG with the real-part band-AMG
    V-cycle preconditioner (the TPU AC hot loop) solves K + i*w*M to the
    requested tolerance."""
    import numpy as np
    import scipy.sparse as sp
    import jax.numpy as jnp
    from xfemm_tpu.ops import band as band_mod

    # 2-D 5-point laplacian + i * mass on a 70x70 grid (n = 4900)
    m = 70
    n = m * m
    I_ = sp.eye(m)
    T = sp.diags([-1, 2, -1], [-1, 0, 1], (m, m))
    K = (sp.kron(I_, T) + sp.kron(T, I_)).tocsr()
    M = sp.eye(n) * 0.35
    A = (K + 1j * M).tocsr()
    A.sum_duplicates()

    Ar = sp.csr_matrix((np.ascontiguousarray(A.data.real), A.indices,
                        A.indptr), shape=(n, n))
    Ash = (Ar + sp.diags(np.abs(A.diagonal().imag))).tocsr()
    Ash.sum_duplicates()
    amg, lay = band_mod.setup_band_amg(Ash)
    oplay = band_mod.pack_band_layout(Ar, band_mod.ROW_TILE,
                                      band_mod.ROW_TILE)
    Aop = band_mod.fill_band_device(
        oplay, np.ascontiguousarray(A.data.real), band_mod.ROW_TILE)
    Ai = band_mod.fill_band_device(
        oplay, np.ascontiguousarray(A.data.imag), band_mod.ROW_TILE)
    rng = np.random.default_rng(3)
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    x_ref = sp.linalg.spsolve(A.tocsc(), b)

    xr, xi, rel, it = band_mod.band_csym_pcg(
        amg, Aop, Ai, jnp.asarray(b.real, jnp.float32),
        jnp.asarray(b.imag, jnp.float32),
        jnp.asarray(1e-6, jnp.float32), 2000)
    x = np.asarray(xr, np.float64) + 1j * np.asarray(xi, np.float64)
    err = np.abs(x - x_ref).max() / np.abs(x_ref).max()
    assert err < 1e-3, (err, int(it), float(rel))

    # the fused restarted-GMRES kernel (one dispatch, on-device f32
    # residual recomputation between cycles) must reach the same
    # solution and report an honest final relative residual
    xr, xi, rn, its = band_mod.band_csym_fgmres_fused(
        amg, Aop, Ai, jnp.asarray(b.real, jnp.float32),
        jnp.asarray(b.imag, jnp.float32),
        jnp.asarray(1e-5, jnp.float32), m=24, cycles=8)
    x = np.asarray(xr, np.float64) + 1j * np.asarray(xi, np.float64)
    err = np.abs(x - x_ref).max() / np.abs(x_ref).max()
    assert float(rn) < 1e-4, (float(rn), int(its))
    assert err < 1e-3, (err, int(its))
    r_true = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
    # the device's f32 residual estimate must track the true residual
    assert r_true < 10 * max(float(rn), 1e-6), (r_true, float(rn))
