"""Geo SQL generators: cross-engine exactness and reference parity.

The gate query (sql_ch_dialect_geo) hash-compares Spark vs DuckDB on driver
data; these tests additionally pin the generators against an independent
pure-Python geohash/ray-cast reference on adversarial inputs (boundary
coordinates, polygon vertices/edges), so a bug that broke both engines the
same way would still be caught.
"""

from __future__ import annotations

import duckdb
import pytest

from moosestack_spark.sql.geo import (
    GEOHASH_BASE32,
    geohash_decode_sql,
    geohash_encode_sql,
    great_circle_distance_sql,
    point_in_polygon_sql,
)


def _ref_geohash(lon: float, lat: float, prec: int = 6) -> str:
    """Textbook bisection geohash (independent of the bit-twiddling SQL)."""
    lon_i, lat_i = (-180.0, 180.0), (-90.0, 90.0)
    bits, even = [], True
    while len(bits) < prec * 5:
        if even:
            mid = (lon_i[0] + lon_i[1]) / 2
            bits.append(1 if lon >= mid else 0)
            lon_i = (mid, lon_i[1]) if lon >= mid else (lon_i[0], mid)
        else:
            mid = (lat_i[0] + lat_i[1]) / 2
            bits.append(1 if lat >= mid else 0)
            lat_i = (mid, lat_i[1]) if lat >= mid else (lat_i[0], mid)
        even = not even
    out = []
    for j in range(prec):
        v = 0
        for k in range(5):
            v = v * 2 + bits[j * 5 + k]
        out.append(GEOHASH_BASE32[v])
    return "".join(out)


def _ref_pip(x: float, y: float, poly: list[tuple[int, int]]) -> bool:
    inside = False
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        if (y1 > y) != (y2 > y):
            xi = x1 + (x2 - x1) * (y - y1) / (y2 - y1)
            if x < xi:
                inside = not inside
    return inside


CASES = [
    (-0.1278, 51.5074),
    (2.3522, 48.8566),
    (139.6917, 35.6895),
    (-180.0, -90.0),
    (179.9999, 89.9999),
    (0.0, 0.0),
    (-0.0001, -0.0001),
    (11.25, 5.625),  # exact bisection boundaries
    (-67.5, 45.0),
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


def test_geohash_encode_matches_reference(con):
    for lon, lat in CASES:
        got = con.execute(
            f"SELECT {geohash_encode_sql(repr(lon), repr(lat), 'duckdb')}"
        ).fetchone()[0]
        assert got == _ref_geohash(lon, lat), (lon, lat)


def test_geohash_decode_center_in_cell(con):
    for lon, lat in CASES:
        gh = _ref_geohash(lon, lat)
        dlon = con.execute(
            f"SELECT {geohash_decode_sql(repr(gh), 'lon', 'duckdb')}"
        ).fetchone()[0]
        dlat = con.execute(
            f"SELECT {geohash_decode_sql(repr(gh), 'lat', 'duckdb')}"
        ).fetchone()[0]
        # 6-char cell: 360/2^15 deg lon, 180/2^15 deg lat — center within
        # half a cell of the input
        assert abs(dlon - lon) <= 360.0 / (1 << 15) / 2 + 1e-9, (lon, gh)
        assert abs(dlat - lat) <= 180.0 / (1 << 15) / 2 + 1e-9, (lat, gh)


def test_point_in_polygon_matches_reference(con):
    poly = [(2, 1), (15, 3), (18, 12), (9, 16), (1, 9)]
    for x in range(-1, 21):
        for y in range(-1, 19):
            got = con.execute(
                f"SELECT {point_in_polygon_sql(str(x), str(y), poly)}"
            ).fetchone()[0]
            assert got == _ref_pip(x, y, poly), (x, y)


def test_great_circle_known_distances(con):
    # London -> Paris ~ 343.6 km on the CH sphere radius
    d = con.execute(
        f"SELECT {great_circle_distance_sql('-0.1278', '51.5074', '2.3522', '48.8566')}"
    ).fetchone()[0]
    assert 340_000 < d < 348_000
    # antipodal: half the circumference = pi * R
    d2 = con.execute(
        f"SELECT {great_circle_distance_sql('0.0', '0.0', '180.0', '0.0')}"
    ).fetchone()[0]
    assert abs(d2 - 3.141592653589793 * 6372797.560856) < 1.0
    # zero distance
    d3 = con.execute(
        f"SELECT {great_circle_distance_sql('10.0', '10.0', '10.0', '10.0')}"
    ).fetchone()[0]
    assert d3 == 0.0


def test_translator_accepts_geo_and_search_vocabulary():
    from moosestack_spark.sql.ch_functions import translate_ch_sql

    out = translate_ch_sql(
        "SELECT geohashEncode(lon, lat), greatCircleDistance(a, b, c, d), "
        "multiSearchAny(s, 'x', 'y'), multiSearchFirstIndex(s, 'x', 'y'), "
        "roundBankers(v, 2), roundToExp2(v), roundDuration(v), roundAge(v), "
        "toISOWeek(d), toISOYear(d), monthName(d), "
        "positionCaseInsensitive(s, 'Q'), countSubstrings(s, 'q'), "
        "groupBitmap(u), arrayMap(x -> x + 1, a), arrayFirst(x -> x > 2, a), "
        "toStartOfInterval(d, INTERVAL 15 MINUTE), "
        "formatDateTime(d, '%Y-%m-%d %H:%M:%S'), "
        "arrayReduce('sum', a), arrayReduce('uniqExact', a), "
        "match(s, '^ab'), extractAll(s, '([0-9]+)'), countMatches(s, 'x'), "
        "ngrams(s, 3), timeSlot(d), toUnixTimestamp64Micro(d) FROM t"
    )
    assert "geohashEncode" not in out and "asin" in out and "bround" in out
    assert "count(DISTINCT u)" in out
    assert "transform(a, x -> x + 1)" in out
    assert "timestamp_seconds" in out and "date_format" in out
    assert "aggregate(a, 0L" in out and "size(array_distinct(a))" in out
    assert "RLIKE" in out and "regexp_extract_all" in out
    assert "unix_micros" in out


def test_geohash_encode_property_random_coords(con):
    """The O(1) quantization and the iterative bisection agree except for
    coordinates within float-epsilon of a cell boundary (e.g. a denormal
    -1e-45 from zero rounds into the upper cell under (x+90)/180*2^15 but
    bisects into the lower) — an inherent float-precision boundary
    convention, NOT a cross-engine divergence (both engines quantize
    identically).  The property excludes the epsilon shell."""
    from hypothesis import assume, given, settings
    from hypothesis import strategies as st

    cell_lon, cell_lat = 360.0 / (1 << 15), 180.0 / (1 << 15)

    @settings(max_examples=60, deadline=None)
    @given(
        lon=st.floats(min_value=-180.0, max_value=179.9999999),
        lat=st.floats(min_value=-90.0, max_value=89.9999999),
    )
    def check(lon, lat):
        fr_lon = ((lon + 180.0) / cell_lon) % 1.0
        fr_lat = ((lat + 90.0) / cell_lat) % 1.0
        assume(1e-6 < fr_lon < 1 - 1e-6 and 1e-6 < fr_lat < 1 - 1e-6)
        # wrap in CAST: a 16-digit repr literal parses as DECIMAL(18,16)
        # in DuckDB and overflows in the quantization arithmetic (the gate
        # query feeds DOUBLE columns, where this cannot happen)
        lon_e = f"CAST({lon!r} AS DOUBLE)"
        lat_e = f"CAST({lat!r} AS DOUBLE)"
        got = con.execute(
            f"SELECT {geohash_encode_sql(lon_e, lat_e, 'duckdb')}"
        ).fetchone()[0]
        assert got == _ref_geohash(lon, lat), (lon, lat)

    check()
