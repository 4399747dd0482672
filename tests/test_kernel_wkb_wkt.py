"""WKB/WKT round-trip tests (modelled on the reference's test_io.py
round-trip strategy, SURVEY.md §5)."""

import numpy as np
import pytest

from spark_geo.kernel import wkb, wkt
from spark_geo.kernel.geom import Geom, POINT, POLYGON, MULTIPOINT

CASES = [
    "POINT (2 3)",
    "POINT (-1.5 2.25)",
    "LINESTRING (0 0, 1 0, 1 1)",
    "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
    "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))",
    "MULTIPOINT ((0 0), (1 2))",
    "MULTILINESTRING ((0 0, 1 2))",
    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((2 2, 3 2, 3 3, 2 3, 2 2)))",
    "GEOMETRYCOLLECTION (POINT (51 -1), LINESTRING (52 -1, 49 2))",
    "POINT EMPTY",
    "LINESTRING EMPTY",
    "POLYGON EMPTY",
    "GEOMETRYCOLLECTION EMPTY",
]


@pytest.mark.parametrize("s", CASES)
def test_wkt_wkb_roundtrip(s):
    g = wkt.from_wkt(s)
    g2 = wkb.loads(wkb.dumps(g))
    assert wkt.to_wkt(g2) == wkt.to_wkt(g)
    if not g.is_empty:
        assert g2 == g


def test_wkt_output_format():
    assert wkt.to_wkt(wkt.from_wkt("POINT (2 3)")) == "POINT (2 3)"
    assert wkt.to_wkt(Geom.point(1.123456789, 0)) == "POINT (1.123457 0)"


def test_none_passthrough():
    assert wkb.dumps(None) is None
    assert wkb.loads(None) is None
    assert wkt.from_wkt(None) is None
    assert wkt.to_wkt(None) is None


def test_point_z():
    g = wkt.from_wkt("POINT Z (2 3 4)")
    assert g.has_z and g.zs[0] == 4
    g2 = wkb.loads(wkb.dumps(g))
    assert g2.has_z and g2.zs[0] == 4
    assert wkt.to_wkt(g2) == "POINT Z (2 3 4)"


def test_vectorized_point_codec():
    xs = np.array([0.0, 1.5, -2.25, np.nan])
    ys = np.array([0.0, -1.5, 3.5, np.nan])
    enc = wkb.encode_points(xs, ys)
    # NaN pair encodes POINT EMPTY
    assert wkb.loads(enc[3]).is_empty
    dx, dy = wkb.decode_points(enc)
    np.testing.assert_array_equal(dx[:3], xs[:3])
    np.testing.assert_array_equal(dy[:3], ys[:3])
    assert np.isnan(dx[3]) and np.isnan(dy[3])


def test_decode_points_with_nulls_and_slow_path():
    pts = wkb.encode_points([1.0, 2.0], [3.0, 4.0])
    poly = wkb.dumps(wkt.from_wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"))
    arr = np.array([pts[0], None, pts[1], poly], dtype=object)
    x, y = wkb.decode_points(arr)
    assert x[0] == 1.0 and y[2] == 4.0
    assert np.isnan(x[1]) and np.isnan(x[3])


def test_big_endian_read():
    import struct
    be = b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", 2.0, 3.0)
    g = wkb.loads(be)
    assert g.type_id == POINT and tuple(g.coords[0]) == (2.0, 3.0)


def test_ewkb_z_flag_read():
    import struct
    ew = b"\x01" + struct.pack("<I", 1 | 0x80000000) + struct.pack("<ddd", 1, 2, 3)
    g = wkb.loads(ew)
    assert g.has_z and g.zs[0] == 3.0


def test_multipoint_bare_wkt():
    g = wkt.from_wkt("MULTIPOINT (0 0, 1 2)")
    assert g.type_id == MULTIPOINT and len(g.parts) == 2


# -- round 3: to_wkb / to_wkt serialization option tail ---------------------

def test_dumps_ext_byte_order_roundtrip():
    """Big-endian output round-trips through the reader and differs
    from the little-endian bytes only in representation."""
    g = Geom.polygon([(0, 0), (4, 0), (4, 3), (0, 3), (0, 0)],
                     holes=[[(1, 1), (1, 2), (2, 2), (2, 1), (1, 1)]])
    le = wkb.dumps_ext(g, byte_order=1)
    be = wkb.dumps_ext(g, byte_order=0)
    assert le == wkb.dumps(g)           # NDR default == storage encoder
    assert be != le and be[0] == 0x00 and le[0] == 0x01
    g2 = wkb.loads(be)
    assert np.array_equal(g2.rings[0], g.rings[0])
    assert np.array_equal(g2.rings[1], g.rings[1])


def test_dumps_ext_output_dimension_strips_z():
    g = Geom.point(1.5, 2.5, z=9.0)
    flat = wkb.loads(wkb.dumps_ext(g, output_dimension=2))
    assert not flat.has_z and flat.coords[0, 0] == 1.5
    full = wkb.loads(wkb.dumps_ext(g, output_dimension=3))
    assert full.has_z and full.zs[0] == 9.0


def test_dumps_ext_include_srid():
    g = Geom.point(1.0, 2.0)
    g.srid = 4326
    no = wkb.dumps_ext(g, include_srid=False)
    yes = wkb.dumps_ext(g, include_srid=True)
    assert len(yes) == len(no) + 4
    assert wkb.loads(yes).srid == 4326
    assert wkb.loads(no).srid == 0


def test_to_wkt_old_3d():
    g = Geom.point(1.0, 2.0, z=3.0)
    assert wkt.to_wkt(g) == "POINT Z (1 2 3)"
    assert wkt.to_wkt(g, old_3d=True) == "POINT (1 2 3)"
    mp = Geom.multi(MULTIPOINT, [Geom.point(1.0, 2.0, z=3.0)])  # MULTIPOINT
    assert " Z " not in wkt.to_wkt(mp, old_3d=True)
