"""FEMM materials-library reader (matlib.dat / heatlib.dat / statlib.dat).

The reference ships tagged-block material libraries with its scripting
CLI (cfemm/femmcli/release/{matlib,heatlib,statlib,condlib}.dat) and
loads entries by name through MatlibReader
(cfemm/libfemm/MatlibReader.cpp). The format is the same <BeginBlock>
record used inside problem files, optionally nested in <BeginFolder>
groups, so this reuses the femfile block parser.
"""

from __future__ import annotations

from ..constants import FileType
from ..geometry.femfile import LineFeed, _parse_block_prop

_FILETYPE_BY_NAME = {
    "matlib": FileType.MAGNETICS,
    "heatlib": FileType.HEATFLOW,
    "statlib": FileType.ELECTROSTATICS,
}


def loads(text: str, filetype: FileType = FileType.MAGNETICS) -> dict:
    """Parse library text into {material name: material}."""
    import io
    out = {}
    lines = LineFeed(io.StringIO(text))
    while True:
        line = lines.next()
        if line is None:
            break
        tok = line.strip().lower()
        if tok.startswith("<beginblock>"):
            mat = _parse_block_prop(lines, filetype)
            out[mat.name] = mat
        # <BeginFolder>/<FolderName>/<EndFolder> lines are grouping only
    return out


def load(path: str, filetype: FileType | None = None) -> dict:
    if filetype is None:
        lower = path.lower()
        filetype = FileType.MAGNETICS
        for key, ft in _FILETYPE_BY_NAME.items():
            if key in lower:
                filetype = ft
                break
    with open(path, encoding="utf-8", errors="replace") as f:
        return loads(f.read(), filetype)
