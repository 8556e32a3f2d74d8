"""Rotor-sweep checkpoint/resume and warm-started Newton chains.

SURVEY.md section 5's TPU-native checkpoint/resume: the reference has no
mid-sweep persistence (a killed femmcli sweep restarts from zero); here
each sweep point's (value, A) persists to disk, an interrupted sweep
resumes without re-solving completed points, and consecutive points
warm-start from the previous solution.
"""

import numpy as np
import pytest

from xfemm_tpu.geometry import femfile
from xfemm_tpu.mesh import mesher
from xfemm_tpu.models import magnetostatics
from xfemm_tpu.post.fpproc import MagPostProcessor
from xfemm_tpu.utils import sweep as sweep_mod

ANGLES = [0.0, 10.0, 20.0]


def _build_factory(fixtures, calls):
    src = str(fixtures / "TorqueBenchmark.fem")

    def build(deg):
        calls.append(deg)
        p = femfile.load(src)
        # rotate the air-gap element's inner (rotor) side
        for bp in p.lineproplist:
            if bp.is_airgap():
                bp.InnerAngle = deg
        mesh = mesher.mesh_problem(p)
        return p, mesh

    return build


def _torque(sol):
    pp = MagPostProcessor(sol.problem, sol.mesh, sol.A, sol.label_case)
    return pp.gap_dc_torque("AGE")


def test_sweep_checkpoint_resume(tmp_path, fixtures):
    calls = []
    build = _build_factory(fixtures, calls)
    ck = tmp_path / "ck"

    # phase 1: "interrupted" sweep covering only the first two angles
    res1 = sweep_mod.sweep(ANGLES[:2], build, _torque, checkpoint=str(ck))
    assert len(calls) == 2

    # phase 2: resume the full sweep -- completed points come from disk
    calls.clear()
    res2 = sweep_mod.sweep(ANGLES, build, _torque, checkpoint=str(ck))
    assert calls == [ANGLES[2]], "resume must not re-solve done points"
    for a in ANGLES[:2]:
        assert res2[a] == pytest.approx(res1[a], rel=0, abs=0)

    # torques track sin(angle) (the TorqueBenchmark contract)
    for a in ANGLES:
        assert res2[a] == pytest.approx(np.sin(np.radians(a)), abs=2e-3)

    # phase 3: a fully-restarted sweep reproduces everything from disk
    calls.clear()
    res3 = sweep_mod.sweep(ANGLES, build, _torque, checkpoint=str(ck))
    assert calls == []
    assert res3 == res2


def test_sweep_warm_start_cuts_newton_iterations(fixtures):
    calls = []
    build = _build_factory(fixtures, calls)
    iters = {}

    def extract(sol):
        iters[len(iters)] = sol.iterations
        return _torque(sol)

    cold = {}

    def extract_cold(sol):
        cold[len(cold)] = sol.iterations
        return _torque(sol)

    warm_res = sweep_mod.sweep(ANGLES[:2], build, extract, warm_start=True)
    cold_res = sweep_mod.sweep(ANGLES[:2], build, extract_cold,
                               warm_start=False)
    # same physics
    for a in ANGLES[:2]:
        assert warm_res[a] == pytest.approx(cold_res[a], abs=1e-5)
    # the warm-started second angle needs fewer CG iterations
    assert iters[1] < cold[1]
