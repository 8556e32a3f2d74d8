"""Regenerate the shipped material-library data files.

The reference distributes FEMM-format material libraries with its
scripting CLI (cfemm/femmcli/release/{matlib,heatlib,statlib,
condlib}.dat, loaded by cfemm/libfemm/MatlibReader.cpp). The material
property VALUES (B-H curves, conductivities, permittivities, K(T)
curves) are the compatibility contract -- a script that pulls
"M-19 Steel" must get the same magnetics as under the reference -- so
this tool parses a FEMM-format library with our own reader and re-emits
the values in this package's JSON data format
(xfemm_tpu/data/{matlib,heatlib,statlib,condlib}.json).

Usage:
    python tools/make_libraries.py <dir-with-.dat-files> [outdir]

The JSON outputs are committed; this tool only needs to re-run when the
upstream library data changes.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xfemm_tpu.constants import FileType  # noqa: E402
from xfemm_tpu.materials import library  # noqa: E402


def convert(srcdir: str, outdir: str) -> None:
    os.makedirs(outdir, exist_ok=True)
    for stem, ft in [("matlib", FileType.MAGNETICS),
                     ("heatlib", FileType.HEATFLOW),
                     ("statlib", FileType.ELECTROSTATICS)]:
        src = os.path.join(srcdir, stem + ".dat")
        mats = library.load(src, ft)
        out = {"filetype": ft.name.lower(),
               "materials": [library.material_to_dict(m)
                             for m in mats.values()]}
        path = os.path.join(outdir, stem + ".json")
        with open(path, "w") as f:
            json.dump(out, f, indent=0, sort_keys=True)
            f.write("\n")
        print(f"{path}: {len(mats)} materials")

    # condlib.dat is FEMM's current-flow conductor library (the ci_*
    # problem type); xfemm has no current-flow solver, so these two
    # records ship as raw tag dicts for forward compatibility.
    src = os.path.join(srcdir, "condlib.dat")
    if os.path.exists(src):
        mats = library.load_raw(src)
        path = os.path.join(outdir, "condlib.json")
        with open(path, "w") as f:
            json.dump({"filetype": "currentflow", "materials": mats}, f,
                      indent=0, sort_keys=True)
            f.write("\n")
        print(f"{path}: {len(mats)} materials")


if __name__ == "__main__":
    srcdir = sys.argv[1]
    outdir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "xfemm_tpu", "data")
    convert(srcdir, outdir)
