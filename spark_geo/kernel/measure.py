"""Measurement kernels: area, length, bounds, distance.

Semantics mirror the reference (pygeos/measurement.py): area/length are
0 for empty and NaN for None (measurement.py:35-43, :152-178);
distance is NaN when either operand is None or empty
(measurement.py:48-75); bounds is NaN-filled for None/empty
(measurement.py:76-104).  All kernels are plain NumPy — the Spark
layer calls them per Arrow batch.
"""

from __future__ import annotations

import numpy as np

from .geom import (GEOMETRYCOLLECTION, LINEARRING, LINESTRING, MULTILINESTRING,
                   MULTIPOINT, MULTIPOLYGON, POINT, POLYGON, Geom)

_EMPTY_SEGS = np.empty((0, 4), dtype=np.float64)


def ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area of a closed ring (positive = CCW)."""
    if len(ring) < 3:
        return 0.0
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))


def area(g: Geom | None) -> float:
    """Unsigned area; holes subtract (reference measurement.py:23-47)."""
    if g is None:
        return np.nan
    if g.type_id == POLYGON:
        if not g.rings:
            return 0.0
        a = abs(ring_area(g.rings[0]))
        for h in g.rings[1:]:
            a -= abs(ring_area(h))
        return a
    if g.type_id in (MULTIPOLYGON, GEOMETRYCOLLECTION):
        return float(sum(area(p) for p in g.parts)) if g.parts else 0.0
    return 0.0


def length(g: Geom | None) -> float:
    """Sum of segment lengths; polygons measure their ring perimeters
    (reference measurement.py:152-178)."""
    if g is None:
        return np.nan
    if g.type_id in (LINESTRING, LINEARRING):
        if len(g.coords) < 2:
            return 0.0
        d = np.diff(g.coords, axis=0)
        return float(np.hypot(d[:, 0], d[:, 1]).sum())
    if g.type_id == POLYGON:
        tot = 0.0
        for r in g.rings:
            if len(r) >= 2:
                d = np.diff(r, axis=0)
                tot += float(np.hypot(d[:, 0], d[:, 1]).sum())
        return tot
    if g.parts:
        return float(sum(length(p) for p in g.parts))
    return 0.0


def segments(g: Geom | None) -> np.ndarray:
    """All line segments of g as an (M, 4) array [x1 y1 x2 y2]."""
    if g is None:
        return _EMPTY_SEGS
    if g.type_id in (LINESTRING, LINEARRING):
        c = g.coords
        if len(c) < 2:
            return _EMPTY_SEGS
        return np.hstack([c[:-1], c[1:]])
    if g.type_id == POLYGON:
        out = [np.hstack([r[:-1], r[1:]]) for r in g.rings if len(r) >= 2]
        return np.vstack(out) if out else _EMPTY_SEGS
    if g.parts:
        out = [s for s in (segments(p) for p in g.parts) if len(s)]
        return np.vstack(out) if out else _EMPTY_SEGS
    return _EMPTY_SEGS


def vertices(g: Geom | None) -> np.ndarray:
    if g is None:
        return np.empty((0, 2), dtype=np.float64)
    return g.all_coords()


_CHUNK_CELLS = 1 << 16  # keep (points x segments) temporaries L2-resident


def points_to_segments_dist(xs, ys, segs):
    """Vectorized min distance from P points to M segments -> (P,) array.

    Standard point-to-segment projection, broadcast (P, M) — evaluated
    in cache-sized point chunks so the O(P·M) float64 temporaries stay
    L2-resident instead of streaming through DRAM (this is what lets
    16 parallel workers scale instead of fighting for memory
    bandwidth)."""
    if len(segs) == 0:
        return np.full(len(xs), np.inf)
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    m = len(segs)
    x1, y1, x2, y2 = (segs[:, i][None, :] for i in range(4))
    dx, dy = x2 - x1, y2 - y1
    seg_len2 = dx * dx + dy * dy
    safe_len2 = np.where(seg_len2 == 0, 1, seg_len2)
    out = np.empty(len(xs), dtype=np.float64)
    step = max(1, _CHUNK_CELLS // max(m, 1))
    for s in range(0, len(xs), step):
        px = xs[s:s + step][:, None]
        py = ys[s:s + step][:, None]
        t = ((px - x1) * dx + (py - y1) * dy) / safe_len2
        np.clip(t, 0.0, 1.0, out=t)
        t[np.broadcast_to(seg_len2 == 0, t.shape)] = 0.0
        cx = x1 + t * dx
        cy = y1 + t * dy
        np.hypot(px - cx, py - cy, out=cx)
        out[s:s + step] = cx.min(axis=1)
    return out


def points_to_points_dist(xs, ys, pts):
    if len(pts) == 0:
        return np.full(len(xs), np.inf)
    d = np.hypot(np.asarray(xs)[:, None] - pts[None, :, 0],
                 np.asarray(ys)[:, None] - pts[None, :, 1])
    return d.min(axis=1)


def points_to_geom_dist(xs, ys, g: Geom) -> np.ndarray:
    """Vectorized distance from many points to one geometry.

    0 inside polygons; NaN-safe.  This is the hot kernel behind
    dwithin joins and kNN refine."""
    from . import predicates as P

    n = len(xs)
    if g is None or g.is_empty:
        return np.full(n, np.nan)
    segs = segments(g)
    if len(segs):
        d = points_to_segments_dist(xs, ys, segs)
    else:
        d = points_to_points_dist(xs, ys, vertices(g))
    if g.type_id in (POLYGON, MULTIPOLYGON, GEOMETRYCOLLECTION):
        inside = P.points_covered_by(xs, ys, g)
        d = np.where(inside, 0.0, d)
    return d


def _seg_seg_dist(a: np.ndarray, b: np.ndarray) -> float:
    """Min distance between segment sets a (M,4) and b (N,4)."""
    from . import predicates as P

    if P.any_segments_intersect(a, b):
        return 0.0
    d1 = points_to_segments_dist(a[:, 0], a[:, 1], b).min(initial=np.inf)
    d2 = points_to_segments_dist(a[:, 2], a[:, 3], b).min(initial=np.inf)
    d3 = points_to_segments_dist(b[:, 0], b[:, 1], a).min(initial=np.inf)
    d4 = points_to_segments_dist(b[:, 2], b[:, 3], a).min(initial=np.inf)
    return float(min(d1, d2, d3, d4))


def distance(a: Geom | None, b: Geom | None) -> float:
    """Min distance between two geometries; NaN for None/empty operands
    (reference measurement.py:48-75)."""
    from . import predicates as P

    if a is None or b is None or a.is_empty or b.is_empty:
        return np.nan
    if P.intersects(a, b):
        return 0.0
    sa, sb = segments(a), segments(b)
    va, vb = vertices(a), vertices(b)
    best = np.inf
    if len(sa) and len(sb):
        best = min(best, _seg_seg_dist(sa, sb))
    elif len(sa):
        best = min(best, float(points_to_segments_dist(vb[:, 0], vb[:, 1], sa).min(initial=np.inf)))
    elif len(sb):
        best = min(best, float(points_to_segments_dist(va[:, 0], va[:, 1], sb).min(initial=np.inf)))
    else:
        best = min(best, float(points_to_points_dist(va[:, 0], va[:, 1], vb).min(initial=np.inf)))
    # polygon containment already handled by intersects() above
    return float(best)


def hausdorff_distance(a: Geom | None, b: Geom | None, densify: float | None = None) -> float:
    """Discrete (vertex-to-geometry) Hausdorff distance, optionally
    densified (reference measurement.py:179-217)."""
    if a is None or b is None or a.is_empty or b.is_empty:
        return np.nan
    va, vb = _densified_vertices(a, densify), _densified_vertices(b, densify)
    sa, sb = segments(a), segments(b)
    d_ab = (points_to_segments_dist(va[:, 0], va[:, 1], sb) if len(sb)
            else points_to_points_dist(va[:, 0], va[:, 1], vb)).max(initial=0.0)
    d_ba = (points_to_segments_dist(vb[:, 0], vb[:, 1], sa) if len(sa)
            else points_to_points_dist(vb[:, 0], vb[:, 1], va)).max(initial=0.0)
    return float(max(d_ab, d_ba))


def frechet_distance(a: Geom | None, b: Geom | None, densify: float | None = None) -> float:
    """Discrete Fréchet distance over vertex sequences (reference
    measurement.py:218-259, GEOS>=3.7), optional densify."""
    if a is None or b is None or a.is_empty or b.is_empty:
        return np.nan
    p = _densified_vertices(a, densify)
    q = _densified_vertices(b, densify)
    n, m = len(p), len(q)
    d = np.hypot(p[:, None, 0] - q[None, :, 0], p[:, None, 1] - q[None, :, 1])
    ca = np.full((n, m), np.inf)
    ca[0, 0] = d[0, 0]
    for i in range(1, n):
        ca[i, 0] = max(ca[i - 1, 0], d[i, 0])
    for j in range(1, m):
        ca[0, j] = max(ca[0, j - 1], d[0, j])
    for i in range(1, n):
        prev_row = ca[i - 1]
        row = ca[i]
        for j in range(1, m):
            row[j] = max(min(prev_row[j], prev_row[j - 1], row[j - 1]), d[i, j])
    return float(ca[n - 1, m - 1])


def minimum_clearance(g: Geom | None) -> float:
    """Smallest distance by which a vertex can move to produce an
    invalid geometry (reference measurement.py:260-289, GEOS>=3.6):
    min over (vertex, non-adjacent edge) distances and distinct-vertex
    distances.  inf for geometries with no clearance notion."""
    if g is None:
        return np.nan
    v = vertices(g)
    if len(v) < 2:
        return np.inf
    segs = segments(g)
    best = np.inf
    # distinct vertex pairs
    d = np.hypot(v[:, None, 0] - v[None, :, 0], v[:, None, 1] - v[None, :, 1])
    iu = np.triu_indices(len(v), k=1)
    dd = d[iu]
    dd = dd[dd > 0]
    if len(dd):
        best = min(best, float(dd.min()))
    # vertex to non-incident segments
    for i, (x, y) in enumerate(v):
        if not len(segs):
            break
        incident = ((segs[:, 0] == x) & (segs[:, 1] == y)) | \
                   ((segs[:, 2] == x) & (segs[:, 3] == y))
        others = segs[~incident]
        if len(others):
            dv = points_to_segments_dist([x], [y], others)[0]
            if dv > 0:
                best = min(best, float(dv))
    return best


def minimum_bounding_radius(g: Geom | None) -> float:
    """Radius of the minimum bounding circle (reference
    measurement.py:290-318, GEOS>=3.8) — Welzl's algorithm on vertices."""
    if g is None:
        return np.nan
    pts = vertices(g)
    if len(pts) == 0:
        return 0.0
    c, r = _welzl(np.unique(pts, axis=0))
    return float(r)


def _welzl(pts: np.ndarray):
    # deterministic order (shuffling only matters for worst-case big n)
    def circle2(a, b):
        c = (a + b) / 2
        return c, float(np.hypot(*(a - c)))

    def circle3(a, b, c):
        ax, ay = a; bx, by = b; cx, cy = c
        dd = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
        if dd == 0:
            return None
        ux = ((ax**2 + ay**2) * (by - cy) + (bx**2 + by**2) * (cy - ay)
              + (cx**2 + cy**2) * (ay - by)) / dd
        uy = ((ax**2 + ay**2) * (cx - bx) + (bx**2 + by**2) * (ax - cx)
              + (cx**2 + cy**2) * (bx - ax)) / dd
        ctr = np.array([ux, uy])
        return ctr, float(np.hypot(*(a - ctr)))

    def inside(cr, p):
        return cr is not None and np.hypot(*(p - cr[0])) <= cr[1] * (1 + 1e-12)

    def mb(points, boundary):
        if len(boundary) == 3:
            return circle3(*boundary)
        if not len(points):
            if len(boundary) == 0:
                return (np.zeros(2), 0.0)
            if len(boundary) == 1:
                return (boundary[0], 0.0)
            return circle2(*boundary)
        p = points[0]
        cr = mb(points[1:], boundary)
        if inside(cr, p):
            return cr
        return mb(points[1:], boundary + [p])

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, len(pts) * 2 + 100))
    try:
        cr = mb(list(pts), [])
    finally:
        sys.setrecursionlimit(old)
    return cr if cr is not None else (pts.mean(axis=0), 0.0)


def _densified_vertices(g: Geom, densify: float | None) -> np.ndarray:
    v = vertices(g)
    if densify is None:
        return v
    segs = segments(g)
    if not len(segs):
        return v
    out = [v]
    for x1, y1, x2, y2 in segs:
        L = np.hypot(x2 - x1, y2 - y1)
        n = int(np.ceil(1.0 / densify))
        if n > 1 and L > 0:
            t = np.linspace(0, 1, n + 1)[1:-1]
            out.append(np.column_stack([x1 + t * (x2 - x1), y1 + t * (y2 - y1)]))
    return np.vstack(out)
