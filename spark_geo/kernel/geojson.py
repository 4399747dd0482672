"""GeoJSON reader/writer (reference io.py:249-295 to_geojson,
io.py:429-479 from_geojson, GEOS>=3.10 surface).

RFC 7946 geometry objects only (Feature/FeatureCollection unwrap to
their geometries like GEOS does for single features)."""

from __future__ import annotations

import json

import numpy as np

from .geom import (GEOMETRYCOLLECTION, LINESTRING, MULTILINESTRING, MULTIPOINT,
                   MULTIPOLYGON, POINT, POLYGON, Geom)

_TYPES = {
    "Point": POINT, "LineString": LINESTRING, "Polygon": POLYGON,
    "MultiPoint": MULTIPOINT, "MultiLineString": MULTILINESTRING,
    "MultiPolygon": MULTIPOLYGON, "GeometryCollection": GEOMETRYCOLLECTION,
}
_NAMES = {v: k for k, v in _TYPES.items()}


def from_geojson(s: str | None) -> Geom | None:
    if s is None:
        return None
    obj = json.loads(s)
    return _decode(obj)


def _decode(obj) -> Geom:
    t = obj.get("type")
    if t == "Feature":
        return _decode(obj["geometry"])
    if t == "FeatureCollection":
        parts = [_decode(f) for f in obj.get("features", [])]
        return Geom(GEOMETRYCOLLECTION, parts=parts)
    if t not in _TYPES:
        raise ValueError(f"unsupported GeoJSON type {t!r}")
    tid = _TYPES[t]
    if tid == GEOMETRYCOLLECTION:
        return Geom(GEOMETRYCOLLECTION,
                    parts=[_decode(g) for g in obj.get("geometries", [])])
    coords = obj.get("coordinates")
    if coords is None or coords == []:
        return Geom(tid)
    if tid == POINT:
        return Geom.point(*coords[:2])
    if tid == LINESTRING:
        return Geom(LINESTRING, np.asarray([c[:2] for c in coords], dtype=np.float64))
    if tid == POLYGON:
        return Geom(POLYGON, rings=[np.asarray([c[:2] for c in r], dtype=np.float64)
                                    for r in coords])
    if tid == MULTIPOINT:
        return Geom(MULTIPOINT, parts=[Geom.point(*c[:2]) for c in coords])
    if tid == MULTILINESTRING:
        return Geom(MULTILINESTRING, parts=[
            Geom(LINESTRING, np.asarray([c[:2] for c in line], dtype=np.float64))
            for line in coords])
    # MultiPolygon
    return Geom(MULTIPOLYGON, parts=[
        Geom(POLYGON, rings=[np.asarray([c[:2] for c in r], dtype=np.float64)
                             for r in poly])
        for poly in coords])


def to_geojson(g: Geom | None, indent: int | None = None) -> str | None:
    if g is None:
        return None
    return json.dumps(_encode(g), indent=indent)


def _c(v: float):
    f = float(v)
    return int(f) if f.is_integer() else f


def _encode(g: Geom) -> dict:
    from .geom import LINEARRING
    tid = LINESTRING if g.type_id == LINEARRING else g.type_id
    name = _NAMES[tid]
    if tid == GEOMETRYCOLLECTION:
        return {"type": name, "geometries": [_encode(p) for p in g.parts]}
    if tid == POINT:
        if g.is_empty:
            return {"type": name, "coordinates": []}
        return {"type": name, "coordinates": [_c(g.coords[0, 0]), _c(g.coords[0, 1])]}
    if tid == LINESTRING:
        return {"type": name, "coordinates": [[_c(x), _c(y)] for x, y in g.coords]}
    if tid == POLYGON:
        return {"type": name,
                "coordinates": [[[_c(x), _c(y)] for x, y in r] for r in g.rings]}
    if tid == MULTIPOINT:
        return {"type": name,
                "coordinates": [[_c(p.coords[0, 0]), _c(p.coords[0, 1])]
                                for p in g.parts if len(p.coords)]}
    if tid == MULTILINESTRING:
        return {"type": name,
                "coordinates": [[[_c(x), _c(y)] for x, y in p.coords] for p in g.parts]}
    return {"type": name,
            "coordinates": [[[[_c(x), _c(y)] for x, y in r] for r in p.rings]
                            for p in g.parts]}
