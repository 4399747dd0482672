"""Linear referencing kernels (reference pygeos/linear.py, 173 LoC).

- line_interpolate_point(line, distance, normalized) — point at a
  distance along the line; negative distance measures from the end
  (reference linear.py:15-53)
- line_locate_point(line, point, normalized) — distance along the
  line to the projection of the point (reference linear.py:55-89)
- line_merge — join contiguous linestrings of a multilinestring
  (reference linear.py:91-113)
- shortest_line(a, b) — two-point line realizing the min distance
  (reference linear.py:144-173)
"""

from __future__ import annotations

import numpy as np

from .geom import LINESTRING, LINEARRING, MULTILINESTRING, POINT, Geom
from . import measure as M


def line_interpolate_point(line: Geom | None, distance: float,
                           normalized: bool = False) -> Geom | None:
    if line is None:
        return None
    if line.type_id not in (LINESTRING, LINEARRING) or len(line.coords) < 2:
        return Geom(POINT)
    c = line.coords
    seg = np.diff(c, axis=0)
    seglen = np.hypot(seg[:, 0], seg[:, 1])
    total = float(seglen.sum())
    if total == 0:
        return Geom.point(c[0, 0], c[0, 1])
    d = distance * total if normalized else distance
    if d < 0:
        d = total + d  # negative: from the end (linear.py:24-26)
    d = min(max(d, 0.0), total)
    cum = np.concatenate([[0.0], np.cumsum(seglen)])
    i = int(np.searchsorted(cum, d, side="right") - 1)
    i = min(i, len(seg) - 1)
    t = (d - cum[i]) / seglen[i] if seglen[i] > 0 else 0.0
    p = c[i] + t * seg[i]
    return Geom.point(float(p[0]), float(p[1]))


def line_locate_point(line: Geom | None, point: Geom | None,
                      normalized: bool = False) -> float:
    if line is None or point is None:
        return np.nan
    if line.type_id not in (LINESTRING, LINEARRING) or len(line.coords) < 2 \
            or point.is_empty:
        return np.nan
    c = line.coords
    px, py = point.coords[0]
    seg = np.diff(c, axis=0)
    seglen = np.hypot(seg[:, 0], seg[:, 1])
    cum = np.concatenate([[0.0], np.cumsum(seglen)])
    best_d, best_loc = np.inf, 0.0
    for i in range(len(seg)):
        L2 = seglen[i] ** 2
        if L2 == 0:
            t = 0.0
        else:
            t = np.clip(((px - c[i, 0]) * seg[i, 0] + (py - c[i, 1]) * seg[i, 1]) / L2, 0, 1)
        qx, qy = c[i] + t * seg[i]
        dd = np.hypot(px - qx, py - qy)
        if dd < best_d:
            best_d = dd
            best_loc = cum[i] + t * seglen[i]
    total = float(cum[-1])
    return float(best_loc / total) if normalized and total > 0 else float(best_loc)


def line_merge(g: Geom | None) -> Geom | None:
    """Greedy endpoint-matching merge of multilinestring parts."""
    if g is None:
        return None
    if g.type_id in (LINESTRING, LINEARRING):
        return g
    if g.type_id != MULTILINESTRING:
        return g
    chains = [p.coords.copy() for p in g.parts if len(p.coords) >= 2]
    merged = True
    while merged and len(chains) > 1:
        merged = False
        for i in range(len(chains)):
            for j in range(i + 1, len(chains)):
                a, b = chains[i], chains[j]
                if np.array_equal(a[-1], b[0]):
                    chains[i] = np.vstack([a, b[1:]])
                elif np.array_equal(a[-1], b[-1]):
                    chains[i] = np.vstack([a, b[::-1][1:]])
                elif np.array_equal(a[0], b[-1]):
                    chains[i] = np.vstack([b, a[1:]])
                elif np.array_equal(a[0], b[0]):
                    chains[i] = np.vstack([b[::-1], a[1:]])
                else:
                    continue
                chains.pop(j)
                merged = True
                break
            if merged:
                break
    if len(chains) == 1:
        return Geom(LINESTRING, chains[0])
    return Geom(MULTILINESTRING, parts=[Geom(LINESTRING, c) for c in chains])


def shared_paths(a: Geom | None, b: Geom | None) -> Geom | None:
    """Collinear shared segments of two lineal geometries (reference
    linear.py:115-143): GEOMETRYCOLLECTION(MULTILINESTRING same-dir,
    MULTILINESTRING opposite-dir)."""
    from .geom import GEOMETRYCOLLECTION, MULTILINESTRING
    if a is None or b is None:
        return None
    sa, sb = M.segments(a), M.segments(b)
    same, opposite = [], []
    eps = 1e-12
    for x1, y1, x2, y2 in sa:
        dx, dy = x2 - x1, y2 - y1
        L2 = dx * dx + dy * dy
        if L2 == 0:
            continue
        for u1, v1, u2, v2 in sb:
            c1 = dx * (v1 - y1) - dy * (u1 - x1)
            c2 = dx * (v2 - y1) - dy * (u2 - x1)
            if abs(c1) > eps or abs(c2) > eps:
                continue
            t1 = ((u1 - x1) * dx + (v1 - y1) * dy) / L2
            t2 = ((u2 - x1) * dx + (v2 - y1) * dy) / L2
            lo, hi = max(min(t1, t2), 0.0), min(max(t1, t2), 1.0)
            if hi - lo <= eps:
                continue
            p = np.array([[x1 + lo * dx, y1 + lo * dy],
                          [x1 + hi * dx, y1 + hi * dy]])
            (same if t2 > t1 else opposite).append(Geom(LINESTRING, p))
    return Geom(GEOMETRYCOLLECTION, parts=[
        Geom(MULTILINESTRING, parts=same),
        Geom(MULTILINESTRING, parts=opposite)])


def shortest_line(a: Geom | None, b: Geom | None) -> Geom | None:
    """Two-point line realizing distance(a, b) (reference
    linear.py:144-173; ufuncs.c:2002)."""
    if a is None or b is None or a.is_empty or b.is_empty:
        return None
    from . import predicates as P
    if P.intersects(a, b):
        # degenerate: pick a shared point (vertex of a covered by b)
        va = M.vertices(a)
        cov = P._points_covered(va, b)
        if cov.any():
            p = va[np.nonzero(cov)[0][0]]
            return Geom.linestring([p, p])
        vb = M.vertices(b)
        cov = P._points_covered(vb, a)
        if cov.any():
            p = vb[np.nonzero(cov)[0][0]]
            return Geom.linestring([p, p])
    pa, pb = _closest_points(a, b)
    return Geom.linestring([pa, pb])


def _closest_points(a: Geom, b: Geom):
    sa, sb = M.segments(a), M.segments(b)
    va, vb = M.vertices(a), M.vertices(b)
    best = (np.inf, None, None)

    def upd(d, p, q):
        nonlocal best
        if d < best[0]:
            best = (d, p, q)

    def pt_to_segs(pts, segs, swap):
        for x, y in pts:
            for s in segs:
                q = _foot(x, y, s)
                dd = np.hypot(x - q[0], y - q[1])
                if swap:
                    upd(dd, q, (x, y))
                else:
                    upd(dd, (x, y), q)

    if len(sb):
        pt_to_segs(va, sb, swap=False)
    if len(sa):
        pt_to_segs(vb, sa, swap=True)
    if not len(sa) and not len(sb):
        for x, y in va:
            d = np.hypot(vb[:, 0] - x, vb[:, 1] - y)
            i = int(np.argmin(d))
            upd(float(d[i]), (x, y), (vb[i, 0], vb[i, 1]))
    return best[1], best[2]


def _foot(x, y, s):
    x1, y1, x2, y2 = s
    dx, dy = x2 - x1, y2 - y1
    L2 = dx * dx + dy * dy
    t = 0.0 if L2 == 0 else np.clip(((x - x1) * dx + (y - y1) * dy) / L2, 0, 1)
    return (x1 + t * dx, y1 + t * dy)
