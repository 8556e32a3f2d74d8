"""Distributed linear-solve backend for the model solvers.

This is the multi-chip analogue of the reference's single call site
``CBigLinProb::PCGSolve`` inside every solver loop (spars.cpp:238, called
from static2d.cpp:948, hsolver.cpp, harmonic2d.cpp:826): the model code
assembles element blocks exactly as for the single-chip path and hands
the linear system here; the session partitions the mesh once, keeps the
partition/jitted-executable/preconditioner across Newton iterations, and
refreshes only the element-matrix VALUES per call.

Design notes (TPU-first):

* The partition is structural (DOF ownership from element connectivity
  and coordinates); Newton only changes matrix values, so repacking is a
  vectorized gather per call.
* The additive-Schwarz AMG + global coarse preconditioner is built from
  the first operator and FROZEN across calls; like the single-chip band
  session, it is rebuilt when CG iteration counts degrade past
  ``refresh_factor`` x the first call's count (the same staleness rule).
* ``shard_map``+``jit`` executables are cached on the session, so a
  rotor sweep or Newton loop traces once.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from . import halo, partition as part


def default_mesh(ndev: int, axis_name: str = "d") -> Mesh:
    devs = jax.devices()
    if len(devs) < ndev:
        raise RuntimeError(
            f"need {ndev} devices, have {len(devs)} "
            f"({[d.platform for d in devs[:4]]}...); on a CPU host set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={ndev} "
            f"and JAX_PLATFORMS=cpu before the first JAX import")
    return Mesh(np.array(devs[:ndev]), (axis_name,))


class DistributedSession:
    """Per-problem distributed solver state (one per pack/mesh)."""

    def __init__(self, ndev: int, mesh: Mesh | None = None,
                 schwarz: bool = True, refresh_factor: float = 3.0):
        self.ndev = int(ndev)
        self.mesh = mesh if mesh is not None else default_mesh(self.ndev)
        self.schwarz = schwarz
        self.refresh_factor = refresh_factor
        self.ps = None            # PartitionedSystem (structure)
        self._sel = None          # per-block element->device packing
        self._solver = None       # jitted distributed PCG
        self._csolver = None      # jitted distributed csym PCG
        self._mv = None           # jitted distributed matvec
        self._amg = None
        self._coarse = None
        self.first_iters = None
        self.last_iters = None
        # sharded band engine (band_dd.py): the fast path
        self._csr_session = None
        self._bdd = None          # BandDDState
        self._bdd_solver = None
        self._bdd_bt = None       # stacked per-part BTFactor
        self._bdd_map = None      # At.data -> Ap.data entry map
        self._bdd_disabled = False
        self._bdd_first = None
        self._bdd_last = None

    # ------------------------------------------------------------------
    def _solve_band_dd(self, blocks, b, fixed_mask, fixed_vals, tol,
                       x0, coords):
        """Sharded band engine solve (band_dd.py): per-device dense band
        + exact local block-Thomas factors, mixed-precision refinement
        against the host f64 CSR (same contract as ops/solver.solve).
        Returns None when the structure is ineligible."""
        from ..ops import solver as solver_mod
        from . import band_dd

        n = int(np.asarray(b).shape[0])
        fixed = np.asarray(fixed_mask, bool)
        fvals = np.asarray(fixed_vals, np.float64)
        if fixed.any() and np.any(fvals[fixed] != 0.0):
            # nonzero Dirichlet needs the blocks' A.g correction; the
            # first-generation path handles it -- keep this path lean
            nonzero_g = True
        else:
            nonzero_g = False
        if self._csr_session is None:
            self._csr_session = solver_mod.Session()
        from ..utils import profiling
        with profiling.phase("dd csr assembly"):
            At = self._csr_session.csr_values(blocks, n, fixed)
        if self._bdd is None and not self._bdd_disabled:
            with profiling.phase("dd band setup"):
                st = band_dd.setup_band_dd(
                    At, np.asarray(coords), self.ndev)
            if st is None:
                self._bdd_disabled = True
                return None
            self._bdd = st
            self._bdd_map = solver_mod._csr_perm_map(
                At, st.Ap_pattern, st.perm, st.iperm)
            self._bdd_solver = band_dd.make_dd_pcg(self.mesh, st)
        if self._bdd is None:
            return None
        st = self._bdd
        Ap = st.Ap_pattern
        Ap.data = At.data[self._bdd_map]

        with profiling.phase("dd band refresh"):
            dense, oob_vals, invd_dev = band_dd.device_values(st, Ap)
        stale = (self._bdd_bt is not None and self._bdd_first is not None
                 and self._bdd_last is not None
                 and self._bdd_last
                 > self.refresh_factor * max(self._bdd_first, 1))
        if self._bdd_bt is None or stale:
            with profiling.phase("dd bt factor"):
                self._bdd_bt = band_dd.build_factors(st, Ap.data)
            self._bdd_first = None

        b64 = np.asarray(b, np.float64)
        g = np.where(fixed, fvals, 0.0)
        if nonzero_g:
            Ag = np.zeros(n)
            for blk_ in blocks:
                idx = np.asarray(blk_.idx)
                sgn = np.asarray(blk_.sign, np.float64)
                mat = np.asarray(blk_.mat, np.float64)
                ge = sgn * g[idx]
                ye = np.einsum("ekl,el->ek", mat, ge)
                np.add.at(Ag, idx.reshape(-1), (sgn * ye).reshape(-1))
            rhs = np.where(fixed, fvals, b64 - Ag)
        else:
            rhs = np.where(fixed, fvals, b64)
        diag64 = np.asarray(At.diagonal())
        diag64[diag64 == 0.0] = 1.0
        invd = 1.0 / diag64
        res0 = float(np.dot(invd * rhs, rhs))
        res0 = res0 if res0 != 0.0 else 1.0
        x = g.copy() if x0 is None else np.where(
            fixed, fvals, np.asarray(x0, np.float64))

        def scatter(v):
            out = np.zeros((st.ndev, st.nloc), np.float32)
            out[st.part_of, st.loc_of] = v[st.perm]
            return jnp.asarray(out)

        it_total = 0
        inner_tol = max(tol, 1e-5)
        metric = None
        for _ in range(12):
            r = rhs - At @ x
            metric = float(np.sqrt(np.dot(invd * r, r) / res0))
            if metric <= tol:
                break
            dx_dev, rr, it = self._bdd_solver(
                dense, st.oob_rows, st.oob_cols, oob_vals,
                self._bdd_bt.Sinv, self._bdd_bt.G, self._bdd_bt.s,
                scatter(r), invd_dev,
                jnp.zeros((st.ndev, st.nloc), jnp.float32),
                jnp.asarray(inner_tol, jnp.float32))
            it_total += int(it)
            dx = np.zeros(n)
            dx[st.perm] = np.asarray(
                dx_dev, np.float64)[st.part_of, st.loc_of]
            x = x + np.where(fixed, 0.0, dx)
            if float(rr) > 0.9 and int(it) >= 60:
                # not contracting: latch the path off and report failure
                self._bdd_disabled = True
                return None
        if metric is None or metric > tol:
            self._bdd_disabled = True
            return None
        if self._bdd_first is None:
            self._bdd_first = it_total
        self._bdd_last = it_total
        return x, metric, it_total

    # ------------------------------------------------------------------
    def _build_structure(self, blocks, nreduced, fixed_mask, fixed_vals,
                         coords):
        np_blocks = [(np.asarray(b.idx), np.asarray(b.sign),
                      np.asarray(b.mat, np.float64)) for b in blocks]
        self.ps = part.partition(np_blocks, nreduced,
                                 np.asarray(fixed_mask),
                                 np.asarray(fixed_vals, np.float64),
                                 coords, self.ndev)
        self._derive_sel(np_blocks)
        self._mv = halo.make_distributed_matvec(self.mesh, self.ps.hmax)

    def _derive_sel(self, np_blocks):
        """Reproduce partition()'s element->slot packing so later calls
        can refresh ``mat`` values without re-partitioning. Stored as
        ONE flat destination index per block (element e of the original
        block lands at row ``dst[e]`` of the (D*emax, K, K) buffer), so
        a value refresh is a single vectorized scatter -- the old
        per-device Python loop was O(devices x blocks) array carves per
        Newton iteration."""
        ps = self.ps
        owner = ps.dof_dev
        self._sel = []
        for (idx, sign, mat), (bidx, bsign, bmat) in zip(np_blocks,
                                                         ps.blocks):
            ed = owner[idx].max(axis=1)
            emax = bmat.shape[1]
            # slot within the owning device = rank among same-device
            # elements in original order (matches partition()'s packing)
            order = np.argsort(ed, kind="stable")
            slot = np.empty(ed.size, np.int64)
            ranks = np.arange(ed.size) - np.searchsorted(
                ed[order], ed[order])
            slot[order] = ranks
            dst = ed.astype(np.int64) * emax + slot
            self._sel.append((dst, emax))

    def _repack_values(self, blocks):
        """New (D, emax, K, K) matrices from this call's block values:
        one vectorized scatter per block."""
        out = []
        for (bidx, bsign, bmat), b, (dst, emax) in zip(
                self.ps.blocks, blocks, self._sel):
            mat = np.asarray(b.mat, np.float64)
            D = bmat.shape[0]
            K = bmat.shape[2]
            new = np.zeros((D * emax, K, K), bmat.dtype)
            new[dst] = mat
            out.append((bidx, bsign, new.reshape(bmat.shape)))
        return out

    # ------------------------------------------------------------------
    def solve(self, blocks, b, fixed_mask, fixed_vals, tol,
              x0=None, coords=None, max_iter: int = 200000):
        """Distributed PCG solve; same contract as ops/solver.solve."""
        nreduced = int(np.asarray(b).shape[0])
        if (coords is not None and not self._bdd_disabled
                and np.shape(coords)[0] == nreduced
                and nreduced > 4 * self.ndev * 128):
            out = self._solve_band_dd(blocks, b, fixed_mask, fixed_vals,
                                      tol, x0, coords)
            if out is not None:
                return out
        if self.ps is None:
            self._build_structure(blocks, nreduced, fixed_mask,
                                  fixed_vals, coords)
        else:
            self.ps.blocks = self._repack_values(blocks)

        ps = self.ps
        da = halo.device_arrays(ps)
        stale = (self._amg is not None and self.first_iters is not None
                 and self.last_iters is not None
                 and self.last_iters
                 > self.refresh_factor * max(self.first_iters, 1))
        if self.schwarz and (self._amg is None or stale):
            from .schwarz import build_global_coarse, build_schwarz_amg
            self._amg = build_schwarz_amg(ps, dtype=np.float64)
            self._coarse = build_global_coarse(ps)
            self._solver = None
            self.first_iters = None
        if self._solver is None:
            self._solver = halo.make_distributed_pcg(
                self.mesh, ps.hmax, max_iter, amg=self._amg,
                coarse=self._coarse)

        # assembled diagonal on host (cheap, avoids re-tracing a one-off
        # device kernel per Newton iteration)
        dh = np.zeros(nreduced)
        for blk in blocks:
            idx = np.asarray(blk.idx)
            dd = np.einsum("ekk->ek", np.asarray(blk.mat, np.float64))
            np.add.at(dh, idx.reshape(-1), dd.reshape(-1))
        dh[np.asarray(fixed_mask)] = 1.0
        dh[dh == 0.0] = 1.0
        diag_np = np.ones((ps.ndev, ps.nmax))
        diag_np[ps.dof_dev, ps.dof_slot] = dh
        diag = jnp.asarray(diag_np)

        g_dev = jnp.asarray(np.where(ps.fixed_mask, ps.fixed_vals, 0.0))
        bg = self._mv(da, g_dev)
        b_dev = jnp.asarray(ps.to_devices(np.asarray(b, np.float64)))
        rhs = jnp.where(da.fixed_mask, da.fixed_vals, b_dev - bg)
        rhs = jnp.where(da.valid, rhs, 0.0)
        if x0 is None:
            x0_dev = g_dev
        else:
            x0_dev = jnp.asarray(ps.to_devices(np.asarray(x0, np.float64)))
            x0_dev = jnp.where(da.fixed_mask, da.fixed_vals, x0_dev)
        x_dev, relres, iters = self._solver(da, rhs, diag, tol, x0_dev)
        it = int(iters)
        if float(relres) > tol and self._amg is not None:
            # the Schwarz-AMG preconditioner is not contracting on this
            # operator (measured: the axisymmetric electrostatic system,
            # whose r-weighted rows span ~12 orders of magnitude with
            # eps0 scaling, defeats the smoothed-aggregation V-cycle):
            # latch it off for this session and re-solve with plain
            # Jacobi CG -- the same runtime fallback the single-chip
            # band engine uses (ops/solver.py)
            self.schwarz = False
            self._amg = None
            self._coarse = None
            self._solver = halo.make_distributed_pcg(
                self.mesh, ps.hmax, max_iter, amg=None, coarse=None)
            x_dev, relres, it2 = self._solver(da, rhs, diag, tol, x0_dev)
            it += int(it2)
            self.first_iters = None
        if self.first_iters is None:
            self.first_iters = it
        self.last_iters = it
        return ps.from_devices(np.asarray(x_dev)), float(relres), it

    # ------------------------------------------------------------------
    def solve_complex(self, blocks, b, fixed_mask, fixed_vals, tol,
                      x0=None, coords=None, max_iter: int = 200000):
        """Distributed complex-symmetric solve on (re, im) pairs
        (cspars.cpp:822 PBCGSolve semantics, parallel/halo.py
        ``_pcg_csym_shard``). ``blocks`` carry complex ``mat``; circuit
        Case-2 bordered rows are not supported here (their dense
        coupling spans every slab) -- callers keep those on the
        single-chip path."""
        nreduced = int(np.asarray(b).shape[0])
        if self.ps is None:
            struct = [type(b0)(idx=b0.idx, sign=b0.sign,
                               mat=np.asarray(b0.mat).real)
                      for b0 in blocks]
            self._build_structure(struct, nreduced, fixed_mask,
                                  np.asarray(fixed_vals).real, coords)
        ps = self.ps
        np_mats = [np.asarray(b0.mat, np.complex128) for b0 in blocks]
        dc_blocks = []
        for (bidx, bsign, _bm), mat, (dst, emax) in zip(
                ps.blocks, np_mats, self._sel):
            D = _bm.shape[0]
            K = _bm.shape[2]
            mre = np.zeros((D * emax, K, K))
            mim = np.zeros_like(mre)
            mre[dst] = mat.real
            mim[dst] = mat.imag
            shape = (D, emax, K, K)
            dc_blocks.append((bidx, bsign, mre.reshape(shape),
                              mim.reshape(shape)))
        dc = halo.DeviceArraysC(
            blocks_idx=tuple(jnp.asarray(b0[0]) for b0 in dc_blocks),
            blocks_sign=tuple(jnp.asarray(b0[1]) for b0 in dc_blocks),
            blocks_mre=tuple(jnp.asarray(b0[2]) for b0 in dc_blocks),
            blocks_mim=tuple(jnp.asarray(b0[3]) for b0 in dc_blocks),
            fixed_mask=jnp.asarray(ps.fixed_mask),
            valid=jnp.asarray(ps.valid))
        if self._csolver is None:
            self._csolver = halo.make_distributed_csym_pcg(
                self.mesh, ps.hmax, max_iter)

        # assembled complex diagonal on host
        dh = np.zeros(nreduced, np.complex128)
        for b0 in blocks:
            idx = np.asarray(b0.idx)
            dd = np.einsum("ekk->ek", np.asarray(b0.mat, np.complex128))
            np.add.at(dh, idx.reshape(-1), dd.reshape(-1))
        fixed = np.asarray(fixed_mask, bool)
        dh[fixed] = 1.0
        dh[dh == 0.0] = 1.0
        dr_ = np.ones((ps.ndev, ps.nmax))
        di_ = np.zeros((ps.ndev, ps.nmax))
        dr_[ps.dof_dev, ps.dof_slot] = dh.real
        di_[ps.dof_dev, ps.dof_slot] = dh.imag

        fvals = np.asarray(fixed_vals, np.complex128)
        g = np.where(fixed, fvals, 0.0)
        # rhs adjustment b - A g on host (g is sparse/fixed-only)
        bg = np.zeros(nreduced, np.complex128)
        for b0 in blocks:
            idx = np.asarray(b0.idx)
            sign = np.asarray(b0.sign, np.float64)
            mat = np.asarray(b0.mat, np.complex128)
            ge = sign * g[idx]
            ye = np.einsum("ekl,el->ek", mat, ge)
            np.add.at(bg, idx.reshape(-1), (sign * ye).reshape(-1))
        rhs = np.where(fixed, fvals, np.asarray(b, np.complex128) - bg)
        br = np.zeros((ps.ndev, ps.nmax))
        bi = np.zeros((ps.ndev, ps.nmax))
        br[ps.dof_dev, ps.dof_slot] = rhs.real
        bi[ps.dof_dev, ps.dof_slot] = rhs.imag
        if x0 is None:
            x0c = g
        else:
            x0c = np.where(fixed, fvals, np.asarray(x0, np.complex128))
        x0r = np.zeros((ps.ndev, ps.nmax))
        x0i = np.zeros((ps.ndev, ps.nmax))
        x0r[ps.dof_dev, ps.dof_slot] = x0c.real
        x0i[ps.dof_dev, ps.dof_slot] = x0c.imag

        xr, xi, relres, iters = self._csolver(
            dc, jnp.asarray(br), jnp.asarray(bi), jnp.asarray(dr_),
            jnp.asarray(di_), tol, jnp.asarray(x0r), jnp.asarray(x0i))
        x = (np.asarray(xr) + 1j * np.asarray(xi))[
            ps.dof_dev, ps.dof_slot]
        return x, float(relres), int(iters)
