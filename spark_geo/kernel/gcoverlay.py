"""Binary set ops for mixed-dimension GEOMETRYCOLLECTION operands.

The reference REFUSES GeometryCollection operands in overlay (GEOS
raises for them — set_operations.py:79-131 docstrings; the all_types
sweeps in tests/test_set_operations.py expect errors).  spark_geo v4
degraded them to NULL and — worse, per ADVICE r4 — silently dropped
the polygonal content of a mixed GC routed through the lineal
overlay.  This module does strictly better than the reference:
per-dimension dispatch.

Each operand is split into its polygonal / lineal / puntal
components; 2-dim content goes through the Greiner–Hormann overlay
(kernel.overlay), 0/1-dim content through the exact split-and-classify
line overlay (kernel.lineoverlay); results merge with GEOS OverlayNG
result typing (lower-dimension pieces absorbed when covered by a
higher-dimension piece).
"""

from __future__ import annotations

from .geom import (GEOMETRYCOLLECTION, LINEARRING, LINESTRING,
                   MULTILINESTRING, MULTIPOINT, MULTIPOLYGON, POINT,
                   POLYGON, Geom)


def split_by_dim(g: Geom):
    """(polygonal, lineal, puntal) Geoms; each None when g has no
    content of that dimension.  LINEARRING components are treated as
    lineal (their WKT/WKB identity), matching GEOS."""
    polys: list[Geom] = []
    lines: list[Geom] = []
    pts: list[Geom] = []

    def walk(q: Geom):
        if q is None or q.is_empty:
            return
        if q.type_id == POLYGON:
            polys.append(q)
        elif q.type_id in (LINESTRING, LINEARRING):
            lines.append(q)
        elif q.type_id == POINT:
            pts.append(q)
        elif q.type_id in (MULTIPOLYGON, MULTILINESTRING, MULTIPOINT,
                           GEOMETRYCOLLECTION):
            for p in q.parts:
                walk(p)

    walk(g)

    def pack(items, multi_tid):
        if not items:
            return None
        return items[0] if len(items) == 1 else Geom(multi_tid, parts=items)

    return (pack(polys, MULTIPOLYGON), pack(lines, MULTILINESTRING),
            pack(pts, MULTIPOINT))


def _flatten(g: Geom):
    """Top-level simple components of a result geometry."""
    if g is None or g.is_empty:
        return []
    if g.type_id in (MULTIPOLYGON, MULTILINESTRING, MULTIPOINT,
                     GEOMETRYCOLLECTION):
        out = []
        for p in g.parts:
            out.extend(_flatten(p))
        return out
    return [g]


def _merge(parts: list) -> Geom:
    """GEOS result typing over mixed simple components."""
    parts = [p for p in parts if p is not None and not p.is_empty]
    if not parts:
        return Geom(GEOMETRYCOLLECTION)
    if len(parts) == 1:
        return parts[0]
    tids = {p.type_id for p in parts}
    if tids == {POLYGON}:
        return Geom(MULTIPOLYGON, parts=parts)
    if tids <= {LINESTRING, LINEARRING}:
        return Geom(MULTILINESTRING, parts=parts)
    if tids == {POINT}:
        return Geom(MULTIPOINT, parts=parts)
    return Geom(GEOMETRYCOLLECTION, parts=parts)


def gc_overlay(a: Geom | None, b: Geom | None, op: str) -> Geom | None:
    """intersection / difference / symmetric_difference / union where
    at least one operand is a mixed-dimension collection (reference
    set_operations.py:22-312 semantics extended to GC operands, which
    the reference itself refuses)."""
    from . import lineoverlay as LO
    from . import overlay as O

    if a is None or b is None:
        return None

    ap, al, a0 = split_by_dim(a)
    bp, bl, b0 = split_by_dim(b)

    if op == "symmetric_difference":
        left = gc_overlay(a, b, "difference")
        right = gc_overlay(b, a, "difference")
        return _merge(_flatten(left) + _flatten(right))

    if op == "intersection":
        polyparts: list = []
        if ap is not None and bp is not None:
            polyparts = _flatten(O.overlay(ap, bp, "intersection"))
        # any pair with a 0/1-dim side: exact split-and-classify
        lower: list = []
        for lo_a, lo_b in ((al, b), (a0, b), (ap, bl), (ap, b0)):
            if lo_a is not None and lo_b is not None:
                lower.extend(_flatten(LO.line_overlay(lo_a, lo_b,
                                                      "intersection")))
        lower = _dedup(lower)
        # dimensional collapse: lower-dim content covered by a
        # higher-dim result piece is absorbed into it
        out = list(polyparts)
        lineparts = [p for p in lower if p.dimensions() == 1]
        ptparts = [p for p in lower if p.dimensions() == 0]
        if lineparts:
            lg = _merge(lineparts)
            if polyparts:
                lg = LO.line_overlay(lg, _merge(list(polyparts)),
                                     "difference")
            out.extend(_flatten(lg))
        if ptparts:
            pg = _merge(ptparts)
            cover = _merge(list(out))
            if not cover.is_empty:
                pg = LO.line_overlay(pg, cover, "difference")
            out.extend(_flatten(pg))
        return _merge(out)

    if op == "difference":
        polyparts = []
        if ap is not None:
            # lower-dim b content removes no area
            r = O.overlay(ap, bp, "difference") if bp is not None else ap
            polyparts = _flatten(r)
        out = list(polyparts)
        if al is not None:
            lg = LO.line_overlay(al, b, "difference")
            if polyparts:  # dimensional collapse, as in intersection
                lg = LO.line_overlay(lg, _merge(list(polyparts)),
                                     "difference")
            out.extend(_flatten(lg))
        if a0 is not None:
            pg = LO.line_overlay(a0, b, "difference")
            cover = _merge(list(out))
            if not cover.is_empty:
                pg = LO.line_overlay(pg, cover, "difference")
            out.extend(_flatten(pg))
        return _merge(out)

    if op == "union":
        parts = []
        if ap is not None or bp is not None:
            if ap is None:
                parts.extend(_flatten(bp))
            elif bp is None:
                parts.extend(_flatten(ap))
            else:
                parts.extend(_flatten(O.overlay(ap, bp, "union")))
        poly = _merge(list(parts)) if parts else None
        lines = None
        if al is not None or bl is not None:
            lines = al if bl is None else bl if al is None else \
                LO.line_overlay(al, bl, "union")
            if poly is not None:
                lines = LO.line_overlay(lines, poly, "difference")
            parts.extend(_flatten(lines))
        if a0 is not None or b0 is not None:
            pts = a0 if b0 is None else b0 if a0 is None else \
                LO.line_overlay(a0, b0, "union")
            cover = _merge([p for p in parts])
            if not cover.is_empty:
                pts = LO.line_overlay(pts, cover, "difference")
            parts.extend(_flatten(pts))
        return _merge(parts)

    raise ValueError(f"unknown op {op!r}")


def _dedup(parts: list) -> list:
    """Drop exact-duplicate components (the pairwise intersection fan
    can produce the same piece from two component pairs)."""
    out: list = []
    for p in parts:
        if not any(p == q for q in out):
            out.append(p)
    return out
