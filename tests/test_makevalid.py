"""ST_MakeValid (structure semantics) — kernel + SQL surface.

PostGIS/Sedona name, beyond the reference's register (the reference ships
no st_makevalid; its validity surface stops at ST_IsValid/Reason,
c/sedona-geos/src/st_isvalid.rs). Semantics documented in
sedona_db_spark/geometry/makevalid.py: nonzero-winding ring fill, shells
unioned, holes subtracted.
"""

import numpy as np
import pytest

from sedona_db_spark.geometry import algos, wkb
from sedona_db_spark.geometry.makevalid import make_valid
from sedona_db_spark.functions.st import _is_valid

mk = wkb.from_wkt


def _independent_loops(ring):
    """Independent reference decomposition for the fuzz differential:
    exact-Fraction noding (brute-force pairwise segment intersection, no
    snap-rounding, none of the production _Seg machinery) of the closed
    walk, then the stack split into simple loops. Spec under test:
    make_valid(ring) covers a point iff SOME simple sub-loop of the noded
    walk encloses it (the structure/union fill rule)."""
    from fractions import Fraction as Fr

    pts = [(Fr(p[0]), Fr(p[1])) for p in ring[:-1]]
    n = len(pts)
    segs = [(pts[i], pts[(i + 1) % n]) for i in range(n)]
    cuts = [[] for _ in range(n)]
    for i in range(n):
        (ax, ay), (bx, by) = segs[i]
        for j in range(i + 1, n):
            (cx, cy), (dx, dy) = segs[j]
            rx, ry = bx - ax, by - ay
            sx, sy = dx - cx, dy - cy
            den = rx * sy - ry * sx
            qpx, qpy = cx - ax, cy - ay
            if den != 0:
                t = (qpx * sy - qpy * sx) / den
                u = (qpx * ry - qpy * rx) / den
                if 0 <= t <= 1 and 0 <= u <= 1:
                    px, py = ax + t * rx, ay + t * ry
                    cuts[i].append((px, py))
                    cuts[j].append((px, py))
            else:
                # parallel: collinear endpoint projections
                if qpx * ry - qpy * rx == 0:
                    for p in ((cx, cy), (dx, dy)):
                        if min(ax, bx) <= p[0] <= max(ax, bx) and min(ay, by) <= p[1] <= max(ay, by):
                            cuts[i].append(p)
                    for p in ((ax, ay), (bx, by)):
                        if min(cx, dx) <= p[0] <= max(cx, dx) and min(cy, dy) <= p[1] <= max(cy, dy):
                            cuts[j].append(p)
    walk = []
    for i in range(n):
        a, b = segs[i]
        rx, ry = b[0] - a[0], b[1] - a[1]
        ordered = sorted(set(cuts[i] + [a, b]), key=lambda p: (p[0] - a[0]) * rx + (p[1] - a[1]) * ry)
        walk.extend(ordered[:-1])
    walk.append(segs[0][0])
    stack, pos, loops = [], {}, []
    for p in walk:
        if p in pos:
            i = pos[p]
            cyc = stack[i:]
            for v in stack[i + 1:]:
                pos.pop(v, None)
            del stack[i + 1:]
            if len(cyc) >= 3:
                a2 = sum(
                    cyc[k][0] * cyc[(k + 1) % len(cyc)][1] - cyc[(k + 1) % len(cyc)][0] * cyc[k][1]
                    for k in range(len(cyc))
                )
                if a2 != 0:
                    loops.append([(float(x), float(y)) for x, y in cyc])
        else:
            pos[p] = len(stack)
            stack.append(p)
    return loops


def _in_any_loop(px, py, loops):
    for lp in loops:
        inside = False
        n = len(lp)
        for i in range(n):
            x0, y0 = lp[i]
            x1, y1 = lp[(i + 1) % n]
            if (y0 <= py < y1) or (y1 <= py < y0):
                t = (py - y0) / (y1 - y0)
                if x0 + t * (x1 - x0) > px:
                    inside = not inside
        if inside:
            return True
    return False


def _dist_to_segments(px, py, ring):
    d = np.inf
    for i in range(len(ring) - 1):
        ax, ay = ring[i][0], ring[i][1]
        bx, by = ring[i + 1][0], ring[i + 1][1]
        vx, vy = bx - ax, by - ay
        L2 = vx * vx + vy * vy
        t = 0.0 if L2 == 0 else max(0.0, min(1.0, ((px - ax) * vx + (py - ay) * vy) / L2))
        d = min(d, np.hypot(px - (ax + t * vx), py - (ay + t * vy)))
    return d


CASES = [
    ("bowtie", "POLYGON((0 0,2 2,2 0,0 2,0 0))", 2.0, 2),
    ("doubly_wound", "POLYGON((0 0,1 0,1 1,0 1,0 0,1 0,1 1,0 1,0 0))", 1.0, 1),
    ("hole_outside", "POLYGON((0 0,10 0,10 10,0 10,0 0),(20 20,21 20,21 21,20 21,20 20))", 100.0, 1),
    ("hole_crossing", "POLYGON((0 0,10 0,10 10,0 10,0 0),(5 5,15 5,15 8,5 8,5 5))", 85.0, 1),
    ("spike", "POLYGON((0 0,4 0,4 4,6 4,4 4,0 4,0 0))", 16.0, 1),
    ("figure8", "POLYGON((0 0,2 0,2 2,0 2,0 0,-2 0,-2 -2,0 -2,0 0))", 8.0, 2),
    ("nested_shells", "MULTIPOLYGON(((0 0,10 0,10 10,0 10,0 0)),((2 2,4 2,4 4,2 4,2 2)))", 100.0, 1),
    ("overlapping_siblings", "MULTIPOLYGON(((0 0,4 0,4 4,0 4,0 0)),((2 2,6 2,6 6,2 6,2 2)))", 28.0, 1),
]


@pytest.mark.parametrize("name,wkt,area,nparts", CASES, ids=[c[0] for c in CASES])
def test_semantics(name, wkt, area, nparts):
    v = make_valid(mk(wkt))
    assert _is_valid(v), name
    assert algos.area(v) == pytest.approx(area, abs=1e-9)
    assert len(v.polygons()) == nparts


def test_valid_input_bit_stable():
    g = mk("POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))")
    assert wkb.encode(make_valid(g)) == wkb.encode(g)


def test_lineal_and_puntal():
    assert wkb.to_wkt(make_valid(mk("LINESTRING(0 0,0 0,1 1,1 1,2 2)"))) == "LINESTRING (0 0, 1 1, 2 2)"
    assert make_valid(mk("LINESTRING(3 3,3 3)")).is_empty
    p = mk("POINT(1 2)")
    assert wkb.encode(make_valid(p)) == wkb.encode(p)
    mls = make_valid(mk("MULTILINESTRING((0 0,0 0),(1 1,2 2))"))
    assert wkb.to_wkt(mls) == "LINESTRING (1 1, 2 2)"


def test_collection_recurses():
    g = mk("GEOMETRYCOLLECTION(POLYGON((0 0,2 2,2 0,0 2,0 0)),POINT(5 5))")
    v = make_valid(g)
    assert v.type_id == wkb.GEOMETRYCOLLECTION
    assert _is_valid(v)
    assert algos.area(v) == pytest.approx(2.0)


def test_all_collapsed_returns_typed_empty():
    v = make_valid(mk("POLYGON((0 0,1 1,2 2,0 0))"))  # zero-area sliver
    assert v.type_id == wkb.POLYGON and v.is_empty


def test_fuzz_union_fill_differential():
    """Random self-intersecting rings: make_valid output must be valid,
    and membership must equal the independent exact-Fraction reference of
    the structure fill spec (point kept iff enclosed by some simple
    sub-loop of the noded walk), probed away from the linework."""
    rng = np.random.RandomState(42)
    for trial in range(25):
        n = rng.randint(4, 9)
        pts = rng.randint(0, 12, size=(n, 2)).astype(np.float64)
        ring = np.vstack([pts, pts[:1]])
        g = wkb.Geometry(wkb.POLYGON, [ring])
        v = make_valid(g)
        assert _is_valid(v), f"trial {trial}"
        loops = _independent_loops(ring)
        xs, ys = np.meshgrid(np.arange(-0.5, 12.5, 1.0), np.arange(-0.5, 12.5, 1.0))
        xs, ys = xs.ravel(), ys.ravel()
        # keep probes clear of the linework (snap grid is ~1e-11 here)
        far = np.array([_dist_to_segments(x, y, ring) > 1e-6 for x, y in zip(xs, ys)])
        xs, ys = xs[far], ys[far]
        expected = np.array([_in_any_loop(x, y, loops) for x, y in zip(xs, ys)])
        if v.is_empty or not v.polygons():
            assert not expected.any(), f"trial {trial}: fill lost"
            continue
        loc = algos.locate_points_in_geometry(xs, ys, v, boundary=False)
        got = loc != algos.OUTSIDE
        bad = np.where(got != expected)[0]
        assert len(bad) == 0, f"trial {trial}: {[(xs[b], ys[b]) for b in bad[:5]]}"


def test_sql_surface(spark):
    from sedona_db_spark.functions.st import register_all

    register_all(spark)
    row = spark.sql(
        "SELECT ST_IsValid(ST_MakeValid(g)) AS ok, "
        "round(ST_Area(ST_MakeValid(g)), 9) AS a, "
        "ST_NumGeometries(ST_MakeValid(g)) AS n "
        "FROM (SELECT ST_GeomFromWKT('POLYGON((0 0,2 2,2 0,0 2,0 0))') AS g)"
    ).first()
    assert row.ok and row.a == 2.0 and row.n == 2
