"""WKT reader/writer (reference io.py:102-183 to_wkt, io.py:356-388
from_wkt; scalar repr is WKT, src/pygeom.c:200-226).

Output conventions follow the reference's defaults: ``trim=True`` with
``rounding_precision=6`` — trailing zeros trimmed, so ``POINT (2 3)``
not ``POINT (2.000000 3.000000)``.
"""

from __future__ import annotations

import re

import numpy as np

from .geom import (GEOMETRYCOLLECTION, LINEARRING, LINESTRING, MULTILINESTRING,
                   MULTIPOINT, MULTIPOLYGON, POINT, POLYGON, Geom, TYPE_NAMES)

_TYPE_BY_NAME = {
    "POINT": POINT, "LINESTRING": LINESTRING, "LINEARRING": LINEARRING,
    "POLYGON": POLYGON, "MULTIPOINT": MULTIPOINT,
    "MULTILINESTRING": MULTILINESTRING, "MULTIPOLYGON": MULTIPOLYGON,
    "GEOMETRYCOLLECTION": GEOMETRYCOLLECTION,
}

_token_re = re.compile(r"\s*([A-Za-z]+|\(|\)|,|[-+0-9.eE]+)")


def _tokenize(s):
    pos, n = 0, len(s)
    while pos < n:
        m = _token_re.match(s, pos)
        if not m:
            if s[pos:].strip() == "":
                break
            raise ValueError(f"invalid WKT near {s[pos:pos+20]!r}")
        yield m.group(1)
        pos = m.end()


class _Parser:
    def __init__(self, s):
        self.toks = list(_tokenize(s))
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of WKT")
        self.i += 1
        return t

    def expect(self, tok):
        t = self.next()
        if t != tok:
            raise ValueError(f"expected {tok!r}, got {t!r}")

    def parse(self):
        name = self.next().upper()
        if name not in _TYPE_BY_NAME:
            raise ValueError(f"unknown geometry type {name!r}")
        tid = _TYPE_BY_NAME[name]
        has_z = False
        if self.peek() and self.peek().upper() in ("Z", "ZM", "M"):
            has_z = self.next().upper() in ("Z", "ZM")
        if self.peek() and self.peek().upper() == "EMPTY":
            self.next()
            return Geom(tid)
        return self._body(tid, has_z)

    def _coords(self, has_z):
        pts, zs = [], []
        while True:
            x = float(self.next())
            y = float(self.next())
            z = None
            if self.peek() not in (",", ")"):
                z = float(self.next())
                # 4th (M) value possible in ZM
                if self.peek() not in (",", ")"):
                    self.next()
            pts.append((x, y))
            zs.append(z if z is not None else np.nan)
            if self.peek() == ",":
                self.next()
                continue
            break
        c = np.asarray(pts, dtype=np.float64)
        zarr = np.asarray(zs, dtype=np.float64) if has_z else None
        return c, zarr

    def _coords_paren(self, has_z):
        self.expect("(")
        c = self._coords(has_z)
        self.expect(")")
        return c

    def _body(self, tid, has_z):
        if tid == POINT:
            c, z = self._coords_paren(has_z)
            g = Geom(POINT, c)
            if has_z and z is not None:
                g.has_z, g.zs = True, z
            return g
        if tid in (LINESTRING, LINEARRING):
            c, z = self._coords_paren(has_z)
            g = Geom(tid, c)
            if has_z and z is not None:
                g.has_z, g.zs = True, z
            return g
        if tid == POLYGON:
            self.expect("(")
            rings = []
            while True:
                c, _ = self._coords_paren(False)
                rings.append(c)
                if self.peek() == ",":
                    self.next()
                    continue
                break
            self.expect(")")
            return Geom(POLYGON, rings=rings)
        if tid == MULTIPOINT:
            self.expect("(")
            parts = []
            while True:
                if self.peek() == "(":
                    c, z = self._coords_paren(has_z)
                else:  # bare "MULTIPOINT (0 0, 1 2)" form
                    c, z = self._coords_point_bare(has_z)
                p = Geom(POINT, c)
                if has_z and z is not None:
                    p.has_z, p.zs = True, z
                parts.append(p)
                if self.peek() == ",":
                    self.next()
                    continue
                break
            self.expect(")")
            return Geom(MULTIPOINT, parts=parts)
        if tid == MULTILINESTRING:
            self.expect("(")
            parts = []
            while True:
                c, z = self._coords_paren(has_z)
                p = Geom(LINESTRING, c)
                if has_z and z is not None:
                    p.has_z, p.zs = True, z
                parts.append(p)
                if self.peek() == ",":
                    self.next()
                    continue
                break
            self.expect(")")
            return Geom(MULTILINESTRING, parts=parts)
        if tid == MULTIPOLYGON:
            self.expect("(")
            parts = []
            while True:
                parts.append(self._body(POLYGON, False))
                if self.peek() == ",":
                    self.next()
                    continue
                break
            self.expect(")")
            return Geom(MULTIPOLYGON, parts=parts)
        # GEOMETRYCOLLECTION
        self.expect("(")
        parts = []
        while True:
            parts.append(self.parse())
            if self.peek() == ",":
                self.next()
                continue
            break
        self.expect(")")
        return Geom(GEOMETRYCOLLECTION, parts=parts)

    def _coords_point_bare(self, has_z):
        x = float(self.next())
        y = float(self.next())
        z = np.nan
        if self.peek() not in (",", ")"):
            z = float(self.next())
        c = np.array([[x, y]], dtype=np.float64)
        return c, (np.array([z]) if has_z else None)


def from_wkt(s: str | None) -> Geom | None:
    if s is None:
        return None
    return _Parser(s).parse()


def _fmt(v, precision):
    if precision < 0:
        s = repr(float(v))
    else:
        s = f"{v:.{precision}f}"
        if "." in s:
            s = s.rstrip("0").rstrip(".")
    if s == "-0":
        s = "0"
    return s


def to_wkt(g: Geom | None, precision: int = 6,
           old_3d: bool = False) -> str | None:
    """``old_3d=True`` writes Z coordinates WITHOUT the ' Z' type
    marker — 'POINT (1 2 3)' — matching the reference's to_wkt old_3d
    flag (io.py:102-183)."""
    if g is None:
        return None
    s = _wkt(g, precision)
    if old_3d:
        # coordinate text never contains " Z ", so a global replace
        # strips the marker from nested collection parts too
        s = s.replace(" Z ", " ")
    return s


def _coords_str(c, zs, precision):
    if zs is not None:
        return ", ".join(
            f"{_fmt(x, precision)} {_fmt(y, precision)} {_fmt(z, precision)}"
            for (x, y), z in zip(c, zs))
    return ", ".join(f"{_fmt(x, precision)} {_fmt(y, precision)}" for x, y in c)


def _wkt(g, p):
    name = TYPE_NAMES[g.type_id]
    z = " Z" if (g.has_z and g.zs is not None) else ""
    if g.is_empty:
        return f"{name}{z} EMPTY"
    if g.type_id == POINT:
        return f"{name}{z} ({_coords_str(g.coords, g.zs if z else None, p)})"
    if g.type_id in (LINESTRING, LINEARRING):
        return f"{name}{z} ({_coords_str(g.coords, g.zs if z else None, p)})"
    if g.type_id == POLYGON:
        rings = ", ".join(f"({_coords_str(r, None, p)})" for r in g.rings if len(r))
        return f"{name} ({rings})"
    if g.type_id == MULTIPOINT:
        inner = ", ".join(f"({_coords_str(q.coords, None, p)})" for q in g.parts)
        return f"{name}{z} ({inner})"
    if g.type_id == MULTILINESTRING:
        inner = ", ".join(f"({_coords_str(q.coords, None, p)})" for q in g.parts)
        return f"{name} ({inner})"
    if g.type_id == MULTIPOLYGON:
        inner = ", ".join(_wkt(q, p)[len("POLYGON "):] for q in g.parts)
        return f"{name} ({inner})"
    inner = ", ".join(_wkt(q, p) for q in g.parts)
    return f"{name} ({inner})"
