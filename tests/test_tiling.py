"""Quadkey grid tests (pure python)."""

import numpy as np

from sedona_db_spark.tiling import Grid, morton, pick_level_for_envelopes


def test_morton_roundtrip():
    g = Grid(10)
    ix = np.array([0, 1, 5, 1023, 512])
    iy = np.array([0, 1, 700, 1023, 2])
    packed = g.pack(ix, iy)
    ux, uy = g.unpack(packed)
    np.testing.assert_array_equal(ux, ix)
    np.testing.assert_array_equal(uy, iy)


def test_point_cell_is_containing_cell():
    g = Grid(8)
    x = np.array([-180.0, 0.0, 179.999, 12.34])
    y = np.array([-90.0, 0.0, 89.999, -45.6])
    cells = g.cell_of_points(x, y)
    x0, y0, x1, y1 = g.cell_env(cells)
    assert np.all(x0 <= x) and np.all(x < x1 + 1e-9)
    assert np.all(y0 <= y) and np.all(y < y1 + 1e-9)


def test_cover_env_cells_contains_point_cell():
    g = Grid(8)
    cover = set(g.cover_env_cells(10.0, 10.0, 30.0, 20.0))
    inner = g.cell_of_points(np.array([15.0, 29.9]), np.array([12.0, 19.9]))
    assert set(inner) <= cover


def test_zorder_locality():
    """Morton ranges approximate spatial ranges: cells of one parent quad
    form a contiguous id range — the property the 100 TB table's range
    partitioning relies on."""
    g = Grid(4)
    # children of the quad (ix in [0,8), iy in [0,8)) are ids [0, 64)
    ids = sorted(g.pack(np.repeat(np.arange(8), 8), np.tile(np.arange(8), 8)) & ((1 << 58) - 1))
    assert ids == list(range(64))


def test_pick_level():
    # tiny envelopes -> fine grid; huge envelopes -> coarse grid
    lv_small = pick_level_for_envelopes(np.array([0.001]), np.array([0.001]))
    lv_big = pick_level_for_envelopes(np.array([50.0]), np.array([50.0]))
    assert lv_small > lv_big
    assert 2 <= lv_big <= 16 and 2 <= lv_small <= 16


def test_neighbors_within():
    g = Grid(6)
    cells = g.cell_of_points(np.array([0.0]), np.array([0.0]))
    neigh, ok = g.neighbors_within(cells, 1)
    assert neigh.shape == (1, 9)
    assert ok.sum() == 9  # interior cell: all 9 valid
