"""Point values and line integrals vs the reference femmcli checks.

Expected values and margins are the reference test suite's own
(cfemm/femmcli/test/femmcli_fpproc.lua:36-48, which validates xfemm
against FEMM 4.2 output at 2-3% margins -- the point sits in a
near-zero-field region where mesh differences dominate).
"""

import numpy as np
import pytest

from xfemm_tpu.geometry import femfile
from xfemm_tpu.mesh.meshdata import read_mesh_files
from xfemm_tpu.models import magnetostatics
from xfemm_tpu.post.fpproc import MagPostProcessor


@pytest.fixture(scope="module")
def temp_post(fixtures):
    p = femfile.load(str(fixtures / "Temp.fem"))
    mesh = read_mesh_files(str(fixtures / "Temp"))
    sol = magnetostatics.solve(p, mesh)
    return MagPostProcessor(p, mesh, sol.A, sol.label_case)


def test_point_values_match_femm42(temp_post):
    pv = temp_post.get_point_values(0.25, 0.0)
    checks = {  # femmcli_fpproc.lua margins (percent)
        "A": (1.245741227364988e-14, 2),
        "B1": (-9.855007421888915e-14, 2),
        "B2": (3.052725906923963e-14, 2),
        "H1": (-7.842365727004682e-08, 2),
        "H2": (2.429282089958189e-08, 2),
        "mu1": (1.0, 2),
        "mu2": (1.0, 2),
    }
    for k, (exp, margin) in checks.items():
        v = complex(pv[k]).real
        assert abs(100 * (v - exp) / exp) <= margin, (k, v, exp)


def test_line_integral_smoke(temp_post):
    # closed square contour inside the domain: net flux ~ 0, length exact
    c = [(0.2, 0.05), (0.3, 0.05), (0.3, 0.15), (0.2, 0.15), (0.2, 0.05)]
    L, S = temp_post.line_integral(2, c)
    assert L == pytest.approx(4 * 0.1 * temp_post.lc, rel=1e-12)
    tot, avg = temp_post.line_integral(0, c)
    assert abs(complex(tot)) < 1e-12
