"""ST_LineCrossingDirection truth table (PostGIS value set)."""

import pytest

from sedona_db_spark.geometry import wkb
from sedona_db_spark.geometry.lineops import line_crossing_direction as lcd


def G(w):
    return wkb.from_wkt(w)


BASE = G("LINESTRING (0 0, 10 0)")


class TestLCD:
    @pytest.mark.parametrize("l2,want", [
        ("LINESTRING (5 -1, 5 1)", -1),             # single, ends left
        ("LINESTRING (5 1, 5 -1)", 1),              # single, ends right
        ("LINESTRING (0 5, 10 5)", 0),              # parallel, no cross
        ("LINESTRING (2 -1, 2 1, 4 1, 4 -1)", 2),   # L then R: last right
        ("LINESTRING (2 1, 2 -1, 4 -1, 4 1)", -2),  # R then L: last left
        ("LINESTRING (2 -1, 2 1, 4 1, 4 -1, 6 -1, 6 1)", -3),  # L R L
        ("LINESTRING (2 1, 2 -1, 4 -1, 4 1, 6 1, 6 -1)", 3),   # R L R
    ])
    def test_table(self, l2, want):
        assert lcd(BASE, G(l2)) == want

    def test_touch_does_not_count(self):
        # l2 touches the base at (5, 0) and retreats: no crossing
        assert lcd(BASE, G("LINESTRING (5 1, 5 0, 6 1)")) == 0

    def test_crossings_ordered_along_l1(self):
        # same crossings drawn in reverse l2 order: position along l1
        # (not along l2) decides first/last
        assert lcd(BASE, G("LINESTRING (4 -1, 4 1, 2 1, 2 -1)")) == -2

    def test_type_guard(self):
        with pytest.raises(ValueError):
            lcd(BASE, G("POINT (1 1)"))

    def test_sql(self, spark):
        from sedona_db_spark.functions import st

        st.register_all(spark)
        row = spark.sql(
            "SELECT ST_LineCrossingDirection("
            "  ST_GeomFromText('LINESTRING (0 0, 10 0)'), "
            "  ST_GeomFromText('LINESTRING (5 -1, 5 1)')) AS d"
        ).collect()[0]
        assert row.d == -1
