"""Geo function family: cross-engine SQL generators.

ClickHouse exposes geohashEncode/geohashDecode, greatCircleDistance /
geoDistance and pointInPolygon as scalar functions
(clickhouse functions/geo/*; reference surface = SQL passthrough, SURVEY.md
§2.9).  Everything here is generated as PLAIN SQL arithmetic so the same
formula runs on Spark (gate query) and DuckDB (oracle) with bit-identical
results:

- geohash: pure integer bit interleaving.  Both engines quantize with the
  same IEEE double ops (add/div/mul/floor are correctly rounded, so the
  binary results match exactly), then all bit plumbing is exact BIGINT
  arithmetic spelled with div/mod (no engine-specific shift builtins).
- great-circle distance: the haversine formula on the ClickHouse sphere
  radius.  sin/cos/asin are NOT correctly-rounded and may differ in the
  last ulp between JVM and libm, so results are surfaced as FLOAT (the
  repo-wide determinism policy for transcendental outputs —
  operators/_determinism.py).
- point-in-polygon: ray casting with the division-free cross-product test;
  on integer coordinates every intermediate is an exact BIGINT, so the
  boolean is hash-stable across engines.

Engine differences are confined to five tokens (integer division, lambda
list map, list constructor, list element extract, substring-position), bound
in _DIALECTS.

Scale: all generated expressions are per-row scalar arithmetic — they run
inside whole-stage codegen with zero exchanges, the same as any built-in.
"""

from __future__ import annotations

GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_BITS = 15  # bits per axis -> 30 bits -> 6 base32 chars
_PREC = 6

_DIALECTS = {
    "spark": {
        "div": "DIV",
        "transform": "transform",
        "list": lambda inner: f"array({inner})",
        # element_at is 1-based in Spark, matching DuckDB list_extract
        "elem": lambda arr, i: f"element_at({arr}, {i})",
        # locate(substr, str) -> 1-based position
        "strpos": lambda s, sub: f"locate({sub}, {s})",
    },
    "duckdb": {
        "div": "//",
        "transform": "list_transform",
        "list": lambda inner: f"[{inner}]",
        "elem": lambda arr, i: f"list_extract({arr}, {i})",
        "strpos": lambda s, sub: f"strpos({s}, {sub})",
    },
}


def _quant(expr: str, lo: float, span: float) -> str:
    """Quantize a coordinate to [0, 2^_BITS - 1] — identical IEEE double ops
    in both engines, so the integer result matches exactly."""
    n = 1 << _BITS
    return (
        f"CAST(LEAST(FLOOR((({expr}) - ({lo!r})) / {span!r} * {float(n)!r}), "
        f"{n - 1}.0) AS BIGINT)"
    )


def _bit(expr: str, bit: int, div: str) -> str:
    """Extract bit `bit` (0 = LSB) of a BIGINT expression."""
    if bit == 0:
        return f"(({expr}) % 2)"
    return f"((({expr}) {div} {1 << bit}) % 2)"


def geohash_encode_sql(lon: str, lat: str, engine: str) -> str:
    """6-character geohash of (lon, lat) as a single SQL expression.

    Standard geohash: alternate bits lon-first, MSB-to-LSB, 5 bits per
    base32 character.  The quantized coords are bound ONCE via a
    single-element list map (the SQL spelling of a let-binding), and the
    interleaved integer is bound the same way for the character lookups —
    without the bindings the quantization expression would be inlined
    30x and the interleave 6x.
    """
    d = _DIALECTS[engine]
    div = d["div"]
    tf = d["transform"]
    mk = d["list"]
    el = lambda arr: d["elem"](arr, 1)  # noqa: E731
    lon_q = _quant(lon, -180.0, 360.0)
    lat_q = _quant(lat, -90.0, 180.0)
    ql, qa = d["elem"]("q", 1), d["elem"]("q", 2)
    # interleave: result bit (29 - 2k) <- lon bit (14 - k); (28 - 2k) <- lat
    terms = []
    for k in range(_BITS):
        terms.append(f"{_bit(ql, _BITS - 1 - k, div)} * {1 << (29 - 2 * k)}")
        terms.append(f"{_bit(qa, _BITS - 1 - k, div)} * {1 << (28 - 2 * k)}")
    interleaved = " + ".join(terms)
    chars = []
    for j in range(_PREC):
        shift = 5 * (_PREC - 1 - j)
        idx = f"((i {div} {1 << shift}) % 32)" if shift else "(i % 32)"
        chars.append(
            f"substring('{GEOHASH_BASE32}', CAST({idx} AS INT) + 1, 1)"
        )
    concat_chars = f"concat({', '.join(chars)})"
    inner = el(f"{tf}({mk(interleaved)}, i -> {concat_chars})")
    return el(f"{tf}({mk(mk(lon_q + ', ' + lat_q))}, q -> {inner})")


def geohash_decode_sql(gh: str, axis: str, engine: str) -> str:
    """Decoded cell-center longitude or latitude of a geohash string.

    The center arithmetic ((q + 0.5) * span / 2^15 + lo) is exact in
    binary floating point (span times a dyadic rational), so the doubles
    match across engines bit-for-bit.
    """
    assert axis in ("lon", "lat")
    d = _DIALECTS[engine]
    div = d["div"]
    # char -> 5-bit value via position in the base32 alphabet
    vals = []
    for j in range(_PREC):
        ch = f"substring({gh}, {j + 1}, 1)"
        pos = d["strpos"](f"'{GEOHASH_BASE32}'", ch)
        vals.append(f"(CAST({pos} AS BIGINT) - 1) * {1 << (5 * (_PREC - 1 - j))}")
    interleaved = " + ".join(vals)
    # deinterleave: lon bit (14 - k) <- result bit (29 - 2k); lat <- (28 - 2k)
    terms = []
    for k in range(_BITS):
        src = (29 - 2 * k) if axis == "lon" else (28 - 2 * k)
        terms.append(f"{_bit('i', src, div)} * {1 << (_BITS - 1 - k)}")
    q = " + ".join(terms)
    lo, span = (-180.0, 360.0) if axis == "lon" else (-90.0, 180.0)
    center = (
        f"(CAST({q} AS DOUBLE) + 0.5) * {span!r} / {float(1 << _BITS)!r}"
        f" + ({lo!r})"
    )
    tf = d["transform"]
    mk = d["list"]
    el = lambda arr: d["elem"](arr, 1)  # noqa: E731
    return el(f"{tf}({mk(interleaved)}, i -> {center})")


# ClickHouse greatCircleDistance sphere radius (meters) — functions/geo/
# distance.cpp uses the mean Earth radius 6372797.560856.
CH_EARTH_RADIUS_M = 6372797.560856


def great_circle_distance_sql(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    """Haversine distance in meters; identical text works in Spark SQL and
    DuckDB (radians/sin/cos/asin/sqrt shared vocabulary).  Callers cast the
    result to FLOAT — the transcendentals inside may differ in the last
    double ulp across libm implementations."""
    dlat = f"sin(radians((({lat2}) - ({lat1})) / 2))"
    dlon = f"sin(radians((({lon2}) - ({lon1})) / 2))"
    h = (
        f"({dlat}) * ({dlat}) + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * ({dlon}) * ({dlon})"
    )
    return f"(2 * {CH_EARTH_RADIUS_M!r} * asin(sqrt({h})))"


def point_in_polygon_sql(x: str, y: str, polygon: list[tuple[int, int]]) -> str:
    """Ray-casting point-in-polygon over a LITERAL polygon with integer
    vertices, unrolled to one crossing test per edge — division-free
    (cross-product comparison), so on integer inputs every intermediate is
    exact BIGINT and the same text evaluates identically in both engines.

    Crossing test for edge (x1,y1)-(x2,y2): the edge straddles the
    horizontal line through y, and the intersection lies strictly right of
    x — compared via sign-adjusted cross product.  Boundary points follow
    the even-odd convention of the classic algorithm.
    """
    edges = []
    n = len(polygon)
    for i in range(n):
        x1, y1 = polygon[i]
        x2, y2 = polygon[(i + 1) % n]
        if y1 == y2:
            continue  # horizontal edge never straddles
        straddle = f"((({y1}) > ({y})) != (({y2}) > ({y})))"
        # x < x1 + (x2-x1)(y-y1)/(y2-y1)  <=>  (x-x1)(y2-y1) < (x2-x1)(y-y1)
        # with the inequality flipped when (y2-y1) < 0
        lhs = f"((({x}) - ({x1})) * ({y2 - y1}))"
        rhs = f"((({x2 - x1})) * (({y}) - ({y1})))"
        cmp_ = f"({lhs} < {rhs})" if y2 > y1 else f"({lhs} > {rhs})"
        edges.append(f"CAST({straddle} AND {cmp_} AS INT)")
    if not edges:
        return "FALSE"
    return f"((({' + '.join(edges)}) % 2) = 1)"
