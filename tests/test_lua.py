"""The femmcli-equivalent Lua scripting layer (xfemm_tpu/scripting/lua.py).

The reference embeds Lua 4.0 for automation (LuaInstance.h:48, 247
mi_*/mo_* registrations in LuaMagneticsCommands.cpp); the reference's
own test scripts (cfemm/femmcli/test/femmcli_*.lua) run unmodified
through this interpreter. These tests cover the language subset and an
end-to-end analysis driven entirely from Lua source.
"""

import pathlib

import numpy as np
import pytest

from xfemm_tpu.scripting import lua

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


def run(src, **kw):
    out = []
    lua.run_string(src, output=out.append, **kw)
    return out


def test_language_core():
    out = run("""
        function fib(n)
            if n < 2 then return n end
            return fib(n-1) + fib(n-2)
        end
        t = {}
        for i = 0, 8 do t[i] = fib(i) end
        s = ""
        i = 0
        while t[i] do s = s .. t[i] .. " "; i = i + 1 end
        print(s)
        local a, b = 1, 2
        a, b = b, a
        print(a .. "," .. b)
        print(format("%05.1f|%d|%s", 3.25, 7, "x"))
        n = 10
        repeat n = n - 3 until n < 0
        print(n)
        if nil then print("no") elseif 2 > 1 then print("cmp") end
        print(strsub("hello", 2, 4), strlen("hello"))
    """, bind_femm=False)
    assert out == ["0 1 1 2 3 5 8 13 21 ", "2,1", "003.2|7|x", "-2",
                   "cmp", "ell\t5"]


def test_lua4_semantics():
    out = run("""
        -- comparisons return 1/nil; division by zero is inf/nan
        print(1 == 1, 1 == 2)
        x = 1/0
        print(x > 1e300)
        y = 0/0
        if y > 0 or y < 0 or y == 0 then print("bad") else print("nan") end
        print(2^10, mod(7, 3), floor(-1.5), ceil(-1.5))
        print(sin(90), cos(0), atan2(1, 0))  -- degrees like femm
    """, bind_femm=False)
    assert out[0] == "1\tnil"
    assert out[1] == "1"
    assert out[2] == "nan"
    assert out[3] == "1024\t1\t-2\t-1"
    assert out[4] == "1\t1\t90"


def test_tables_and_stdlib():
    out = run("""
        t = { 10, 20, x = "y", [99] = 3 }
        print(t[1], t[2], t.x, t[99], getn(t))
        tinsert(t, 30)
        print(t[3], getn(t))
        print(tostring(nil), tostring(12), tonumber("3.5") + 0.5)
    """, bind_femm=False)
    assert out == ["10\t20\ty\t3\t2", "30\t3", "nil\t12\t4"]


def test_end_to_end_torque_script(tmp_path, monkeypatch):
    """A femmcli-style script (same structure as the reference's
    femmcli_TorqueBenchmark.lua) meshes, solves, and evaluates the gap
    torque from Lua source alone."""
    monkeypatch.chdir(tmp_path)
    src = (FIXTURES / "TorqueBenchmark.fem").read_text()
    (tmp_path / "tq.fem").write_text(src)
    out = run("""
        function check(value, expected, marginAbs)
            if abs(value - expected) > marginAbs then
                return 1
            end
            return 0
        end
        open("tq.fem")
        failed = 0
        for deg = 0, 30, 30 do
            mi_modifyboundprop("AGE", 10, deg)
            mi_modifyboundprop("AGE", 11, 0)
            mi_analyze()
            mi_loadsolution()
            tq = mo_gapintegral("AGE", 0)
            failed = failed + check(tq, sin(deg), 0.000042)
        end
        assert(failed == 0)
        write("SUCCESS\\n")
    """)
    assert out[-1] == "SUCCESS"


def test_compatibility_mode_roundtrip():
    """femmcli_compatmode.lua: get/setcompatibilitymode state."""
    from xfemm_tpu.scripting import lua
    out = []
    interp = lua.Interpreter(bind_femm=False, output=out.append)
    interp.run("""
assert(getcompatibilitymode() == 0)
setcompatibilitymode(1.0)
assert(getcompatibilitymode() == 1)
setcompatibilitymode(0.0)
assert(getcompatibilitymode() == 0)
write("SUCCESS\n")
""")
    assert out == ["SUCCESS"]


def test_trace_builtin(capsys):
    """trace()/trace(1) stack backtraces (LuaInstance.cpp:302 luaTrace);
    mirrors femmcli_trace.lua."""
    from xfemm_tpu.scripting import lua
    out = []
    lua.run_string("""
function FUN()
  trace(1)
end
trace()
FUN()
""", bind_femm=False, output=out.append, script_path="t.lua")
    assert any("main [t.lua:0]" in l for l in out)
    assert any("global Lua FUN()" in l for l in out)


def test_trace_calls_hook():
    """--lua-trace-functions equivalent: every call is printed."""
    from xfemm_tpu.scripting import lua
    out = []
    lua.run_string("x = sqrt(4)\nprint(x)", bind_femm=False,
                   output=out.append, trace_calls=True)
    assert any("call global C sqrt()" in l for l in out)


def test_pedantic_mode_warns():
    from xfemm_tpu.scripting import lua
    out = []
    lua.run_string("y = unknown_variable_xyz", bind_femm=False,
                   output=out.append, pedantic=True)
    assert any("undefined variable" in l for l in out)


def test_init_environment_constants():
    """femmcli auto-runs release/init.lua (main.cpp:125): uo/eo, the
    unit constants, AWG and the ABC tables are predefined whenever the
    femm bindings are bound -- no --lua-init flag required."""
    out = run("""
        print(format("%.6e", uo))
        print(format("%.6e", eo))
        assert(Pi == PI); assert(pi == PI)
        assert(inches == 0.0254); assert(Inches == 0.0254)
        assert(cm == 0.01); assert(mils == 0.001*0.0254)
        assert(Gauss == 0.0001); assert(kOersted == 1000*Oersted)
        print(format("%.4f", AWG(20)))
        -- the fitted ABC shell tables are exposed as Lua tables
        assert(uAx0[1][1] > 10); assert(u2D1[12][12] > 0)
        write("SUCCESS\\n")
    """)
    assert out[0] == "1.256637e-06"
    assert out[1] == "8.854188e-12"
    assert abs(float(out[2]) - 8.2514694 * np.exp(-0.115943 * 20)) < 1e-3
    assert out[-1] == "SUCCESS"


def test_init_environment_makeabc():
    """mi_makeABC builds the 7-shell asymptotic open boundary: shell
    materials u1..u7 with the fitted permeabilities (data/abc_mu.json),
    an A=0 outer boundary, and the shell block labels."""
    out = run("""
        newdocument(0)
        mi_probdef(0, "centimeters", "planar", 1e-8, 1, 30)
        mi_drawrectangle(-1, -1, 1, 1)
        mi_makeABC()
        write("DONE\\n")
    """)
    assert out[-1] == "DONE"
    from xfemm_tpu import femm_compat
    p = femm_compat._d().problem
    names = [m.name for m in p.blockproplist]
    assert [f"u{k}" for k in range(1, 8)] == [n for n in names
                                              if n.startswith("u")]
    import json
    import pathlib
    tab = json.loads((pathlib.Path(femm_compat.__file__).parent / "data"
                      / "abc_mu.json").read_text())
    u1 = next(m for m in p.blockproplist if m.name == "u1")
    assert abs(u1.mu_x - tab["u2D0"][6][0]) < 1e-12
    assert abs(u1.mu_y - tab["u2D0"][6][0]) < 1e-12
    assert any(b.name == "A=0" for b in p.lineproplist)
