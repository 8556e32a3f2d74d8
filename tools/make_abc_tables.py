"""Re-emit the asymptotic-boundary-condition coefficient tables.

The reference's default scripting environment (cfemm/femmcli/release/
init.lua, auto-loaded by femmcli/main.cpp:125) ships four triangular
tables of fitted shell permeabilities/permittivities (uAx0/u2D0/uAx1/
u2D1) that parameterize the ``*_makeABC`` open-boundary helper.  The
values are a numerical contract (a script that built its open boundary
with the reference must reproduce the same shell materials here), so
this tool parses them out of the reference file and re-emits them as
JSON for ``xfemm_tpu/scripting/initenv.py`` -- the same treatment the
material libraries get (tools/make_libraries.py).

Usage: python tools/make_abc_tables.py [path-to-init.lua]
"""

from __future__ import annotations

import json
import os
import re
import sys

DEFAULT_SRC = "/root/reference/cfemm/femmcli/release/init.lua"
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "xfemm_tpu", "data", "abc_mu.json")


def parse_tables(text: str) -> dict:
    tables = {}
    for name in ("uAx0", "u2D0", "uAx1", "u2D1"):
        m = re.search(re.escape(name) + r"\s*=\s*\{", text)
        assert m, name
        depth = 1
        i = m.end()
        start = i
        while depth:
            c = text[i]
            if c == "{":
                depth += 1
            elif c == "}":
                depth -= 1
            i += 1
        body = text[start:i - 1]
        rows = []
        for rm in re.finditer(r"\{([^{}]*)\}", body):
            rows.append([float(v) for v in rm.group(1).split(",") if
                         v.strip()])
        assert len(rows) == 12 and all(len(r) == k + 1
                                       for k, r in enumerate(rows)), name
        tables[name] = rows
    return tables


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SRC
    with open(src) as f:
        tables = parse_tables(f.read())
    with open(OUT, "w") as f:
        json.dump(tables, f)
        f.write("\n")
    print(f"wrote {OUT}: " + ", ".join(
        f"{k}[{len(v)}]" for k, v in tables.items()))


if __name__ == "__main__":
    main()
