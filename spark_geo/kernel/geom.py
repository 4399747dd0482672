"""In-memory geometry model for spark_geo's NumPy kernels.

The reference (pygeos) models geometries as opaque GEOS pointers with
an OGC type lattice (reference pygeos/geometry.py:38-49).  Our model is
columnar/NumPy-native: a ``Geom`` holds float64 coordinate arrays plus
nesting (rings / parts).  This is the per-batch in-memory layout the
Arrow-vectorized UDF kernels operate on; geometries at rest are WKB
``BinaryType`` columns (see ``spark_geo.kernel.wkb``).

Type ids follow the reference's lattice exactly so tests can compare:
MISSING=-1, POINT=0, LINESTRING=1, LINEARRING=2, POLYGON=3,
MULTIPOINT=4, MULTILINESTRING=5, MULTIPOLYGON=6, GEOMETRYCOLLECTION=7.
"""

from __future__ import annotations

import numpy as np

MISSING = -1
POINT = 0
LINESTRING = 1
LINEARRING = 2
POLYGON = 3
MULTIPOINT = 4
MULTILINESTRING = 5
MULTIPOLYGON = 6
GEOMETRYCOLLECTION = 7

TYPE_NAMES = {
    POINT: "POINT",
    LINESTRING: "LINESTRING",
    LINEARRING: "LINEARRING",
    POLYGON: "POLYGON",
    MULTIPOINT: "MULTIPOINT",
    MULTILINESTRING: "MULTILINESTRING",
    MULTIPOLYGON: "MULTIPOLYGON",
    GEOMETRYCOLLECTION: "GEOMETRYCOLLECTION",
}

# topological dimension per type (reference pygeos/geometry.py:91-119:
# point-like 0, line-like 1, polygon-like 2; collection = max of parts)
TYPE_DIMENSIONS = {
    POINT: 0,
    LINESTRING: 1,
    LINEARRING: 1,
    POLYGON: 2,
    MULTIPOINT: 0,
    MULTILINESTRING: 1,
    MULTIPOLYGON: 2,
}

_EMPTY_COORDS = np.empty((0, 2), dtype=np.float64)


class Geom:
    """A geometry value: type id + coordinates (+ rings / parts).

    - POINT:                    ``coords`` shape (1, 2); (0, 2) if EMPTY
    - LINESTRING / LINEARRING:  ``coords`` shape (N, 2)
    - POLYGON:                  ``rings`` = [shell, hole, ...] each (N, 2)
    - MULTI* / COLLECTION:      ``parts`` = [Geom, ...]
    """

    __slots__ = ("type_id", "coords", "rings", "parts", "has_z", "zs", "srid")

    def __init__(self, type_id, coords=None, rings=None, parts=None,
                 has_z=False, zs=None, srid=0):
        self.type_id = type_id
        self.coords = coords if coords is not None else _EMPTY_COORDS
        self.rings = rings if rings is not None else []
        self.parts = parts if parts is not None else []
        self.has_z = has_z
        self.zs = zs  # optional (N,) float64 Z values, parallel to coords
        self.srid = srid  # 0 = unset (reference geometry.py:177-235)

    # -- constructors -------------------------------------------------
    @staticmethod
    def point(x, y, z=None):
        if x is None or (isinstance(x, float) and np.isnan(x) and z is None
                         and y is not None and np.isnan(y)):
            # NaN coords => POINT EMPTY (reference creation.py:34-41,
            # NaN->EMPTY on GEOS>=3.10)
            return Geom(POINT)
        c = np.array([[x, y]], dtype=np.float64)
        if z is not None:
            return Geom(POINT, c, has_z=True, zs=np.array([z], np.float64))
        return Geom(POINT, c)

    @staticmethod
    def linestring(coords):
        return Geom(LINESTRING, np.asarray(coords, dtype=np.float64).reshape(-1, 2))

    @staticmethod
    def linearring(coords):
        """Auto-closes the ring like the reference (creation.py:125-176,
        _geometry.pyx:120-133 enforces >=4 coords after closure)."""
        c = np.asarray(coords, dtype=np.float64).reshape(-1, 2)
        if len(c) and not np.array_equal(c[0], c[-1]):
            c = np.vstack([c, c[:1]])
        if 0 < len(c) < 4:
            raise ValueError("linearring requires at least 4 coordinates after closure")
        return Geom(LINEARRING, c)

    @staticmethod
    def polygon(shell, holes=()):
        rings = [np.asarray(shell, dtype=np.float64).reshape(-1, 2)]
        for h in holes:
            if h is None:  # None holes skipped (reference creation.py:178-269)
                continue
            rings.append(np.asarray(h, dtype=np.float64).reshape(-1, 2))
        rings = [_close_ring(r) for r in rings]
        return Geom(POLYGON, rings=rings)

    @staticmethod
    def box(xmin, ymin, xmax, ymax, ccw=True):
        """Rectangle polygon (reference creation.py:271-298); ccw order
        by default, matching GEOSCreateBox semantics."""
        if ccw:
            shell = [(xmax, ymin), (xmax, ymax), (xmin, ymax), (xmin, ymin), (xmax, ymin)]
        else:
            shell = [(xmin, ymin), (xmin, ymax), (xmax, ymax), (xmax, ymin), (xmin, ymin)]
        return Geom(POLYGON, rings=[np.asarray(shell, dtype=np.float64)])

    @staticmethod
    def multi(type_id, parts):
        # None parts skipped (reference creation.py:301-470)
        return Geom(type_id, parts=[p for p in parts if p is not None])

    @staticmethod
    def empty(type_id=GEOMETRYCOLLECTION):
        return Geom(type_id)

    # -- properties ----------------------------------------------------
    @property
    def is_empty(self):
        """EMPTY per type (reference predicates.py:135-159)."""
        if self.type_id == POLYGON:
            return not self.rings or all(len(r) == 0 for r in self.rings)
        if self.type_id in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION):
            return not self.parts or all(p.is_empty for p in self.parts)
        return len(self.coords) == 0

    def all_coords(self):
        """All vertex coordinates as one (N,2) array (for bounds etc.)."""
        if self.type_id == POLYGON:
            if not self.rings:
                return _EMPTY_COORDS
            return np.vstack(self.rings) if self.rings else _EMPTY_COORDS
        if self.parts:
            arrs = [p.all_coords() for p in self.parts]
            arrs = [a for a in arrs if len(a)]
            return np.vstack(arrs) if arrs else _EMPTY_COORDS
        return self.coords

    def num_coordinates(self):
        return int(len(self.all_coords()))

    def dimensions(self):
        """Topological dimension; collection = max over parts; empty
        collection -> -1 like GEOS (reference geometry.py:91-119)."""
        if self.type_id == GEOMETRYCOLLECTION:
            if not self.parts:
                return -1
            return max(p.dimensions() for p in self.parts)
        return TYPE_DIMENSIONS[self.type_id]

    def bounds(self):
        """(xmin, ymin, xmax, ymax); NaN-filled when empty
        (reference measurement.py:76-104)."""
        c = self.all_coords()
        if len(c) == 0:
            return (np.nan, np.nan, np.nan, np.nan)
        return (float(c[:, 0].min()), float(c[:, 1].min()),
                float(c[:, 0].max()), float(c[:, 1].max()))

    def __repr__(self):
        from . import wkt as _wkt
        return f"<Geom {_wkt.to_wkt(self, 6)}>"

    def __eq__(self, other):
        """Structural equality like the reference's GEOSEqualsExact
        tolerance 0 (reference src/pygeom.c:278-285)."""
        if not isinstance(other, Geom):
            return NotImplemented
        if self.type_id != other.type_id:
            return False
        if self.type_id == POLYGON:
            return (len(self.rings) == len(other.rings)
                    and all(np.array_equal(a, b) for a, b in zip(self.rings, other.rings)))
        if self.parts or other.parts:
            return (len(self.parts) == len(other.parts)
                    and all(a == b for a, b in zip(self.parts, other.parts)))
        return np.array_equal(self.coords, other.coords)

    def __hash__(self):
        from . import wkb as _wkb
        return hash(_wkb.dumps(self))


def _close_ring(r):
    if len(r) and not np.array_equal(r[0], r[-1]):
        return np.vstack([r, r[:1]])
    return r
