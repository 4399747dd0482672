"""Delaunay triangulation + Voronoi diagram (reference
constructive.py:345-383 delaunay_triangles, :781-825 voronoi_polygons).

Bowyer–Watson incremental Delaunay over the input's unique vertices;
Voronoi cells as the dual (circumcenters of incident triangles),
clipped to an expanded envelope like GEOS's extent behavior.
"""

from __future__ import annotations

import numpy as np

from .geom import (GEOMETRYCOLLECTION, LINESTRING, MULTILINESTRING, POINT,
                   POLYGON, Geom)
from . import construct as C
from . import measure as M


def _circumcircle(p1, p2, p3):
    ax, ay = p1
    bx, by = p2
    cx, cy = p3
    d = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if d == 0:
        return None
    ux = ((ax ** 2 + ay ** 2) * (by - cy) + (bx ** 2 + by ** 2) * (cy - ay)
          + (cx ** 2 + cy ** 2) * (ay - by)) / d
    uy = ((ax ** 2 + ay ** 2) * (cx - bx) + (bx ** 2 + by ** 2) * (ax - cx)
          + (cx ** 2 + cy ** 2) * (bx - ax)) / d
    r2 = (ax - ux) ** 2 + (ay - uy) ** 2
    return (ux, uy, r2)


def delaunay(points: np.ndarray):
    """Bowyer–Watson; returns list of index triangles (i, j, k)."""
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return []
    # super-triangle
    cx, cy = pts.mean(axis=0)
    span = max(pts[:, 0].ptp(), pts[:, 1].ptp(), 1.0) * 100
    sp = np.array([[cx - 2 * span, cy - span], [cx + 2 * span, cy - span],
                   [cx, cy + 2 * span]])
    allp = np.vstack([pts, sp])
    tris = [(n, n + 1, n + 2)]
    circ = {(n, n + 1, n + 2): _circumcircle(*allp[[n, n + 1, n + 2]])}
    for i in range(n):
        px, py = allp[i]
        bad = []
        for t in tris:
            cc = circ[t]
            if cc is not None and (px - cc[0]) ** 2 + (py - cc[1]) ** 2 <= cc[2] * (1 + 1e-12):
                bad.append(t)
        # boundary of the bad-triangle cavity
        edge_count = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                key = (min(e), max(e))
                edge_count[key] = edge_count.get(key, 0) + 1
        for t in bad:
            tris.remove(t)
            del circ[t]
        for (a, b), cnt in edge_count.items():
            if cnt == 1:
                nt = (a, b, i)
                tris.append(nt)
                circ[nt] = _circumcircle(*allp[[a, b, i]])
    # drop triangles touching the super-triangle
    return [t for t in tris if max(t) < n]


def delaunay_triangles(g: Geom | None, only_edges: bool = False) -> Geom | None:
    """(reference constructive.py:345-383)."""
    if g is None:
        return None
    pts = np.unique(M.vertices(g), axis=0)
    tris = delaunay(pts)
    if not tris:
        return Geom(GEOMETRYCOLLECTION) if not only_edges else Geom(MULTILINESTRING)
    if only_edges:
        edges = set()
        for a, b, c in tris:
            for e in ((a, b), (b, c), (c, a)):
                edges.add((min(e), max(e)))
        parts = [Geom(LINESTRING, pts[[a, b]]) for a, b in sorted(edges)]
        return Geom(MULTILINESTRING, parts=parts)
    parts = []
    for a, b, c in tris:
        ring = np.vstack([pts[[a, b, c]], pts[[a]]])
        if M.ring_area(ring) < 0:
            ring = ring[::-1]
        parts.append(Geom(POLYGON, rings=[ring]))
    return Geom(GEOMETRYCOLLECTION, parts=parts)


def voronoi_polygons(g: Geom | None, extend_to: Geom | None = None,
                     only_edges: bool = False) -> Geom | None:
    """Voronoi cells as the Delaunay dual, clipped to the (expanded)
    envelope (reference constructive.py:781-825; GEOS clips to a
    diagonal-expanded extent)."""
    if g is None:
        return None
    pts = np.unique(M.vertices(g), axis=0)
    if len(pts) < 2:
        return Geom(GEOMETRYCOLLECTION)
    xmin, ymin = pts.min(axis=0)
    xmax, ymax = pts.max(axis=0)
    dx, dy = max(xmax - xmin, 1.0), max(ymax - ymin, 1.0)
    if extend_to is not None:
        exmin, eymin, exmax, eymax = extend_to.bounds()
    else:
        exmin, eymin = xmin - dx, ymin - dy
        exmax, eymax = xmax + dx, ymax + dy
    # half-plane construction per site (robust for small N)
    big = Geom.box(exmin, eymin, exmax, eymax)
    cells = []
    for i, p in enumerate(pts):
        cell = big
        for j, q in enumerate(pts):
            if i == j:
                continue
            # clip cell by the half-plane closer to p than q: the
            # perpendicular bisector as a large clip polygon
            mid = (p + q) / 2
            d = q - p
            L = np.hypot(*d)
            u = d / L
            v = np.array([-u[1], u[0]])
            far = 10 * (abs(exmax - exmin) + abs(eymax - eymin))
            half = Geom(POLYGON, rings=[np.vstack([
                mid + v * far, mid - v * far,
                mid - v * far - u * far, mid + v * far - u * far,
                mid + v * far])])
            cell = C.intersection(cell, half)
            if cell is None or cell.is_empty:
                break
        if cell is not None and not cell.is_empty:
            cells.append(cell)
    if only_edges:
        edges = [Geom(LINESTRING, r) for c in cells for r in c.rings]
        return Geom(MULTILINESTRING, parts=edges)
    return Geom(GEOMETRYCOLLECTION, parts=cells)
