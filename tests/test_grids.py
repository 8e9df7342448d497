"""Grid generators: ST_TileEnvelope, ST_SquareGrid, ST_HexagonGrid,
ST_Hexagon, ST_Square."""

import math

import numpy as np
import pytest

from sedona_db_spark.geometry import algos, grids, wkb
from sedona_db_spark.geometry.wkb import Geometry, POLYGON

A = grids.WEBMERC_EXTENT


def box(x0, y0, x1, y1):
    return wkb.from_wkt(
        f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))")


class TestTileEnvelope:
    def test_root_tile(self):
        t = grids.tile_envelope(0, 0, 0)
        c = t.all_coords()
        assert float(np.min(c[:, 0])) == -A and float(np.max(c[:, 0])) == A
        assert algos.area(t) == pytest.approx((2 * A) ** 2)

    def test_z1_quadrants(self):
        # y counts from the north edge: (1, 1, 0) is the NE quadrant
        t = grids.tile_envelope(1, 1, 0)
        c = t.all_coords()
        assert float(np.min(c[:, 0])) == 0.0
        assert float(np.min(c[:, 1])) == 0.0
        assert float(np.max(c[:, 1])) == A

    def test_pyramid_nesting(self):
        parent = grids.tile_envelope(3, 2, 5)
        for dx in (0, 1):
            for dy in (0, 1):
                child = grids.tile_envelope(4, 4 + dx, 10 + dy)
                assert algos.within(child, parent) or algos.covered_by(
                    child, parent)

    def test_area_law(self):
        t = grids.tile_envelope(7, 100, 30)
        assert algos.area(t) == pytest.approx((2 * A / 128) ** 2)

    def test_out_of_range(self):
        with pytest.raises(ValueError):
            grids.tile_envelope(2, 4, 0)
        with pytest.raises(ValueError):
            grids.tile_envelope(-1, 0, 0)


class TestSquareGrid:
    def test_aligned_box_counts(self):
        g = grids.square_grid(1.0, box(2, 3, 6, 5))
        assert len(g.coords) == 4 * 2
        assert algos.area(g) == pytest.approx(8.0)

    def test_unaligned_box(self):
        g = grids.square_grid(1.0, box(0.5, 0.5, 2.5, 1.5))
        # x spans cells 0,1,2; y spans 0,1
        assert len(g.coords) == 6

    def test_cells_cover_envelope(self):
        g = grids.square_grid(2.0, box(1, 1, 7, 5))
        e = algos.envelope(Geometry(
            POLYGON, [g.all_coords()[:, :2][np.lexsort(
                (g.all_coords()[:, 1], g.all_coords()[:, 0]))]]))
        c = g.all_coords()
        assert float(np.min(c[:, 0])) <= 1 and float(np.max(c[:, 0])) >= 7

    def test_bad_size(self):
        with pytest.raises(ValueError):
            grids.square_grid(0.0, box(0, 0, 1, 1))


class TestHexagonGrid:
    def test_cell_area(self):
        h = grids.hexagon(0, 0, 2.0)
        assert algos.area(h) == pytest.approx(1.5 * math.sqrt(3) * 4.0)

    def test_odd_column_offset(self):
        h0 = algos.centroid(grids.hexagon(0, 0, 1.0)).coords[0]
        h1 = algos.centroid(grids.hexagon(1, 0, 1.0)).coords[0]
        assert h1[0] - h0[0] == pytest.approx(1.5)
        assert h1[1] - h0[1] == pytest.approx(math.sqrt(3) / 2)

    def test_grid_covers_box(self):
        b = box(0, 0, 10, 8)
        g = grids.hexagon_grid(1.0, b)
        # every corner of the box falls inside some hexagon
        for (x, y) in [(0, 0), (10, 0), (10, 8), (0, 8), (5, 4)]:
            inside = any(
                algos.locate_points_in_polygon(
                    np.array([x]), np.array([y]), cell)[0] != 0
                for cell in g.coords)
            assert inside, (x, y)

    def test_no_duplicate_cells(self):
        g = grids.hexagon_grid(1.0, box(0, 0, 6, 6))
        keys = {tuple(np.round(algos.centroid(c).coords[0], 9))
                for c in g.coords}
        assert len(keys) == len(g.coords)


@pytest.mark.usefixtures("spark")
class TestSQL:
    def test_sql_surface(self, spark):
        from sedona_db_spark.functions import st

        st.register_all(spark)
        row = spark.sql(
            "SELECT ST_Area(ST_TileEnvelope(1, 0, 0)) AS ta, "
            "ST_NumGeometries(ST_SquareGrid(1.0D, "
            "  ST_MakeEnvelope(2.0D, 3.0D, 6.0D, 5.0D))) AS n, "
            "ST_Area(ST_Hexagon(2.0D, 0, 0)) AS ha, "
            "ST_NumGeometries(ST_HexagonGrid(2.0D, "
            "  ST_MakeEnvelope(0.0D, 0.0D, 8.0D, 8.0D))) AS hn"
        ).collect()[0]
        assert row.ta == pytest.approx(grids.WEBMERC_EXTENT ** 2)
        assert row.n == 8
        assert row.ha == pytest.approx(1.5 * math.sqrt(3) * 4)
        assert row.hn > 0
