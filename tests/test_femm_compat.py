"""pyFEMM/femmcli-compatible command layer.

test_torque_benchmark_script mirrors the reference's own
femmcli_TorqueBenchmark.lua line for line (open + mi_modifyboundprop +
mi_analyze + mo_gapintegral against the analytic sin(angle) torque, same
tolerances femmcli_TorqueBenchmark.lua:36-64).
"""

import math

import pytest

import xfemm_tpu.femm_compat as femm


def test_torque_benchmark_script(fixtures):
    femm.opendocument(str(fixtures / "TorqueBenchmark.fem"))
    for deg in (0, 40, 90):
        femm.mi_modifyboundprop("AGE", 10, deg)   # InnerAngle
        femm.mi_modifyboundprop("AGE", 11, 0)     # OuterAngle
        femm._d()._mesh = None
        femm.mi_createmesh()
        femm.mi_analyze()
        femm.mi_loadsolution()
        tq = femm.mo_gapintegral("AGE", 0)
        ref = math.sin(math.radians(deg))
        assert abs(tq - ref) <= 4.2e-5
        if ref:
            assert abs(100 * (tq - ref) / ref) <= 0.006


def test_build_and_point_values():
    femm.newdocument(0)
    femm.mi_probdef(0, "centimeters", "planar", 1e-8, 1, 30)
    femm.mi_addboundprop("A0", BdryFormat=0)
    femm.mi_addmaterial("Air")
    femm.mi_addmaterial("Magnet", mux=1.05, muy=1.05, Hc=400000)
    femm.mi_drawrectangle(-10, -10, 10, 10)
    femm.mi_clearselected()
    for x, y in ((-10, -10), (10, -10), (10, 10), (-10, 10)):
        femm.mi_selectnode(x, y)
    # mark outer rectangle segments with the A=0 boundary
    femm.mi_setsegmentprop("A0")
    femm.mi_drawrectangle(-1, -1, 1, 1)
    femm.mi_addblocklabel(5, 5)
    femm.mi_clearselected()
    femm.mi_selectlabel(5, 5)
    femm.mi_setblockprop("Air")
    femm.mi_addblocklabel(0, 0)
    femm.mi_clearselected()
    femm.mi_selectlabel(0, 0)
    femm.mi_setblockprop("Magnet", magdir=90)
    femm.mi_analyze()
    vals = femm.mo_getpointvalues(0.0, 0.0)
    assert vals is not None
    A, B1, B2 = vals[0], vals[1], vals[2]
    # vertically magnetized magnet: By dominates at the center
    assert abs(B2) > 10 * abs(B1)
    assert 0.05 < abs(B2) < 0.6


def test_antiperiodic_age_torque(fixtures):
    """femmcli_antiperiodicBC_AGE_TorqueBenchmark.lua: the same analytic
    torque contract through an ANTIPERIODIC air-gap element."""
    femm.opendocument(str(fixtures / "AntiperiodicAGE.fem"))
    for deg in (0, 30, 80):
        femm.mi_modifyboundprop("AGE", 10, deg)
        femm.mi_modifyboundprop("AGE", 11, 0)
        femm._d()._mesh = None
        femm.mi_analyze()
        femm.mi_loadsolution()
        tq = femm.mo_gapintegral("AGE", 0)
        ref = math.sin(math.radians(deg))
        assert abs(tq - ref) <= 4.2e-5


def test_heat_document_from_verbs():
    """A heat-flow problem built entirely from the hi_* verb surface
    (LuaHeatflowCommands equivalents): 1-D conduction across a unit
    square, fixed 0 K / 100 K walls, k = 1 -- T(x) = 100 x."""
    femm.hi_newdocument()
    femm.hi_probdef("meters", "planar", 1e-8, 1)
    femm.hi_addnode(0, 0)
    femm.hi_addnode(1, 0)
    femm.hi_addnode(1, 1)
    femm.hi_addnode(0, 1)
    femm.hi_addsegment(0, 0, 1, 0)
    femm.hi_addsegment(1, 0, 1, 1)
    femm.hi_addsegment(1, 1, 0, 1)
    femm.hi_addsegment(0, 1, 0, 0)
    femm.hi_addmaterial("iron", kx=1.0, ky=1.0)
    femm.hi_addboundprop("cold", 0, 0.0)
    femm.hi_addboundprop("hot", 0, 100.0)
    femm.hi_addblocklabel(0.5, 0.5)
    femm.hi_selectlabel(0.5, 0.5)
    femm.hi_setblockprop("iron", 1, 0, 0)
    femm.hi_clearselected()
    femm.hi_selectnode(0, 0)
    femm.hi_selectnode(0, 1)
    femm.hi_setsegmentprop("cold", 0, 1, 0, 0)
    femm.hi_clearselected()
    femm.hi_selectnode(1, 0)
    femm.hi_selectnode(1, 1)
    femm.hi_setsegmentprop("hot", 0, 1, 0, 0)
    femm.hi_clearselected()
    femm.hi_analyze()
    femm.hi_loadsolution()
    for x in (0.25, 0.5, 0.75):
        T = femm.ho_getpointvalues(x, 0.5)[0]
        assert abs(T - 100.0 * x) < 5e-6, (x, T)  # linear ramp: exact up to solver residual


def test_electro_document_from_verbs():
    """Same 1-D check through the ei_* surface: V(x) = 10 x."""
    femm.ei_newdocument()
    femm.ei_probdef("meters", "planar", 1e-8, 1)
    femm.ei_addnode(0, 0)
    femm.ei_addnode(1, 0)
    femm.ei_addnode(1, 1)
    femm.ei_addnode(0, 1)
    femm.ei_addsegment(0, 0, 1, 0)
    femm.ei_addsegment(1, 0, 1, 1)
    femm.ei_addsegment(1, 1, 0, 1)
    femm.ei_addsegment(0, 1, 0, 0)
    femm.ei_addmaterial("diel", ex=4.0, ey=4.0)
    femm.ei_addboundprop("gnd", 0.0, 0, 0, 0, 0)
    femm.ei_addboundprop("live", 10.0, 0, 0, 0, 0)
    femm.ei_addblocklabel(0.5, 0.5)
    femm.ei_selectlabel(0.5, 0.5)
    femm.ei_setblockprop("diel", 1, 0, 0)
    femm.ei_clearselected()
    femm.ei_selectnode(0, 0)
    femm.ei_selectnode(0, 1)
    femm.ei_setsegmentprop("gnd", 0, 1, 0, 0)
    femm.ei_clearselected()
    femm.ei_selectnode(1, 0)
    femm.ei_selectnode(1, 1)
    femm.ei_setsegmentprop("live", 0, 1, 0, 0)
    femm.ei_clearselected()
    femm.ei_analyze()
    femm.ei_loadsolution()
    for x in (0.25, 0.75):
        V = femm.eo_getpointvalues(x, 0.5)[0]
        assert abs(V - 10.0 * x) < 1e-6, (x, V)


def test_contour_and_mesh_accessors(fixtures):
    """mo_addcontour/mo_bendcontour/mo_lineintegral over the session
    contour; mo_getnode/mo_getelement/mo_numnodes (luaGetElement returns
    1-based node ids, centroid, area, group)."""
    femm.opendocument(str(fixtures / "TorqueBenchmark.fem"))
    femm.mi_analyze()
    femm.mi_loadsolution()
    nn = femm.mo_numnodes()
    ne = femm.mo_numelements()
    assert nn > 100 and ne > 100
    assert femm.mo_getnode(1) is not None
    el = femm.mo_getelement(1)
    assert len(el) == 7
    assert 1 <= el[0] <= nn and el[5] > 0
    # closed rectangular contour in the air gap region: B.n integral
    # along a closed loop vanishes (flux conservation)
    femm.mo_clearcontour()
    for x, y in ((-0.5, -0.5), (0.5, -0.5), (0.5, 0.5), (-0.5, 0.5),
                 (-0.5, -0.5)):
        femm.mo_addcontour(x, y)
    L, S = femm.mo_lineintegral(2)    # contour length / surface area (m)
    assert abs(L - 0.04) < 1e-11      # 4 cm in SI like the reference
    # bend: replace last leg by a half-circle arc -> longer contour
    femm.mo_clearcontour()
    femm.mo_addcontour(-0.5, 0.0)
    femm.mo_addcontour(0.5, 0.0)
    femm.mo_bendcontour(180.0, 5.0)
    L2, _ = femm.mo_lineintegral(2)
    ref = math.pi * 0.5 * 0.01        # half-circle of radius 0.5 cm
    assert abs(L2 - ref) / ref < 1e-3


def test_group_select_and_smooth(fixtures):
    femm.opendocument(str(fixtures / "TorqueBenchmark.fem"))
    femm.mi_analyze()
    femm.mi_loadsolution()
    femm.mo_clearblock()
    femm.mo_groupselectblock()        # all blocks
    area = femm.mo_blockintegral(5)
    assert area.real > 0
    femm.mo_smooth("off")
    v1 = femm.mo_getpointvalues(0.0, 0.5)
    femm.mo_smooth("on")
    v2 = femm.mo_getpointvalues(0.0, 0.5)
    assert v1 is not None and v2 is not None


def test_create_radius_seg_seg():
    femm.newdocument(0)
    femm.mi_addnode(0, 0)
    femm.mi_addnode(1, 0)
    femm.mi_addnode(0, 1)
    femm.mi_addsegment(0, 0, 1, 0)
    femm.mi_addsegment(0, 0, 0, 1)
    assert femm.mi_createradius(0, 0, 0.25)
    p = femm._d().problem
    assert len(p.arclist) == 1
    arc = p.arclist[0]
    assert abs(arc.ArcLength - 90.0) < 1e-9
    pts = sorted((round(n.x, 6), round(n.y, 6)) for n in p.nodelist)
    assert (0.0, 0.25) in pts and (0.25, 0.0) in pts
    assert (0.0, 0.0) not in pts


def test_delete_and_modify_props():
    femm.newdocument(0)
    femm.mi_addmaterial("A")
    femm.mi_addmaterial("B")
    femm.mi_addboundprop("bc0")
    femm.mi_addcircprop("c0", 1.0, 1)
    femm.mi_addpointprop("pp0", a=0)
    femm.mi_deletematerial("A")
    p = femm._d().problem
    assert [m.name for m in p.blockproplist] == ["B"]
    femm.mi_deleteboundprop("bc0")
    assert not p.lineproplist
    femm.mi_deletecircuit("c0")
    assert not p.circproplist
    femm.mi_modifypointprop("pp0", 3, 2.5)
    assert complex(p.nodeproplist[0].J).real == 2.5
    femm.mi_deletepointprop("pp0")
    assert not p.nodeproplist


def test_outerspace_and_setprevious():
    femm.newdocument(0)
    femm.mi_defineouterspace(1.0, 10.0, 5.0)
    p = femm._d().problem
    assert (p.extZo, p.extRo, p.extRi) == (1.0, 10.0, 5.0)
    femm.mi_addblocklabel(0, 0)
    femm.mi_selectlabel(0, 0)
    femm.mi_attachouterspace()
    assert p.labellist[0].IsExternal
    femm.mi_detachouterspace()
    assert not p.labellist[0].IsExternal
    femm.mi_attachdefault()
    assert p.labellist[0].IsDefault
    femm.mi_setprevious("prev.ans", 2)
    assert p.PrevSoln == "prev.ans" and p.PrevType == 2


def test_full_verb_parity():
    """Every command the reference femmcli registers (mi_/mo_, hi_/ho_,
    ei_/eo_ -- LuaMagneticsCommands.cpp, LuaHeatflowCommands.cpp,
    LuaElectrostaticsCommands.cpp registration tables) resolves to a
    callable here, functional or documented no-op."""
    import re
    ref_verbs = """
mi_addarc mi_addbhpoint mi_addblocklabel mi_addboundprop mi_addcircprop
mi_addmaterial mi_addnode mi_addpointprop mi_addsegment mi_analyse
mi_analyze mi_attachdefault mi_attachouterspace mi_clearbhpoints
mi_clearselected mi_copyrotate mi_copytranslate mi_createmesh
mi_createradius mi_defineouterspace mi_deleteboundprop mi_deletecircuit
mi_deletematerial mi_deletepointprop mi_deleteselected
mi_deleteselectedarcsegments mi_deleteselectedlabels
mi_deleteselectednodes mi_deleteselectedsegments mi_detachdefault
mi_detachouterspace mi_getboundingbox mi_getmaterial mi_getprobleminfo
mi_gettitle mi_gridsnap mi_maximize mi_minimize mi_mirror
mi_modifyboundprop mi_modifycircprop mi_modifymaterial
mi_modifypointprop mi_moverotate mi_movetranslate mi_probdef
mi_purgemesh mi_readdxf mi_refreshview mi_resize mi_restore
mi_savebitmap mi_savedxf mi_savemetafile mi_saveas mi_scale
mi_selectarcsegment mi_selectcircle mi_selectgroup mi_selectlabel
mi_selectnode mi_selectrectangle mi_selectsegment mi_setarcsegmentprop
mi_setblockprop mi_setcurrent mi_setfocus mi_setgrid mi_setgroup
mi_setnodeprop mi_setprevious mi_setsegmentprop mi_showgrid mi_showmesh
mi_shownames mi_zoom mi_zoomin mi_zoomnatural mi_zoomout
mo_addcontour mo_bendcontour mo_blockintegral mo_clearblock
mo_clearcontour mo_close mo_gapintegral mo_getcircuitproperties
mo_getelement mo_getgapa mo_getgapb mo_getgapharmonics mo_getnode
mo_getpointvalues mo_getprobleminfo mo_gettitle mo_gradient
mo_gridsnap mo_groupselectblock mo_hidecontourplot mo_hidedensityplot
mo_hidegrid mo_hidemesh mo_hidepoints mo_lineintegral mo_makeplot
mo_maximize mo_minimize mo_numelements mo_numnodes mo_reload mo_resize
mo_restore mo_savebitmap mo_savemetafile mo_selectblock mo_selectpoint
mo_setfocus mo_setgrid mo_showcontourplot mo_showdensityplot
mo_showgrid mo_showmesh mo_shownames mo_showpoints mo_showvectorplot
mo_smooth mo_zoom mo_zoomin mo_zoomnatural mo_zoomout
hi_addboundprop hi_addconductorprop hi_addmaterial hi_addpointprop
hi_addtkpoint hi_analyse hi_analyze hi_cleartkpoints hi_copytranslate
hi_createradius hi_deleteboundprop hi_deleteconductor hi_deletematerial
hi_deletepointprop hi_getmaterial hi_loadsolution hi_modifyboundprop
hi_modifyconductorprop hi_modifymaterial hi_modifypointprop hi_probdef
hi_saveas hi_setprevious ho_addcontour ho_bendcontour ho_blockintegral
ho_clearblock ho_clearcontour ho_close ho_getconductorproperties
ho_getelement ho_getnode ho_getpointvalues ho_gettitle
ho_groupselectblock ho_lineintegral ho_numelements ho_numnodes
ho_reload ho_selectblock ho_selectconductor ho_selectpoint ho_smooth
ei_addboundprop ei_addconductorprop ei_addmaterial ei_addpointprop
ei_analyse ei_analyze ei_copytranslate ei_createradius
ei_deleteboundprop ei_deleteconductor ei_deletematerial
ei_deletepointprop ei_getmaterial ei_loadsolution ei_modifyboundprop
ei_modifyconductorprop ei_modifymaterial ei_modifypointprop ei_probdef
ei_saveas eo_addcontour eo_bendcontour eo_blockintegral eo_clearblock
eo_clearcontour eo_close eo_getconductorproperties eo_getelement
eo_getnode eo_getpointvalues eo_gettitle eo_groupselectblock
eo_lineintegral eo_numelements eo_numnodes eo_reload eo_selectblock
eo_selectconductor eo_selectpoint eo_smooth
""".split()
    missing = [v for v in ref_verbs
               if not callable(getattr(femm, v, None))]
    assert not missing, missing
