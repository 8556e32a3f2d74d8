"""CLI smoke tests on a plain CPU backend.

Regression for the round-1 failure where a CPU host without
``JAX_ENABLE_X64`` preset was mistaken for an f32 accelerator and the
TPU-tuned dense-band engine made ``python -m xfemm_tpu solve`` hang for
15+ minutes on a problem the reference fsolver finishes in <1 s
(cfemm/fsolver/fsolver.cpp:1213).  The package must auto-enable x64 on
f64-capable backends and keep the band engine gated to accelerators.
"""

import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env(tmp_path):
    env = dict(os.environ)
    env.pop("JAX_ENABLE_X64", None)
    env.pop("XFEMM_TPU_FORCE_BAND", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # drop any forced virtual device count inherited from conftest
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if not f.startswith("--xla_force_host_platform_device_count")]
    env["XLA_FLAGS"] = " ".join(flags)
    return env


def test_cli_solve_cpu_finishes_fast(tmp_path, fixtures):
    shutil.copy(fixtures / "Temp.fem", tmp_path / "Temp.fem")
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "xfemm_tpu", "solve", "Temp.fem"],
        cwd=tmp_path, env=_clean_env(tmp_path),
        capture_output=True, text=True, timeout=120)
    elapsed = time.time() - t0
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert (tmp_path / "Temp.ans").exists()
    assert elapsed < 60, f"CPU solve took {elapsed:.1f}s (budget 60s)"
