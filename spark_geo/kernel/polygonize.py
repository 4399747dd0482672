"""Planar-graph polygonization with full noding.

Reference semantics: pygeos/constructive.py:530-640 — ``polygonize``
assembles polygons from fully-noded linework; ``polygonize_full``
additionally returns the leftover linework classified as cut edges,
dangles, and invalid rings.  This kernel goes one step further than
the GEOS contract and NODES crossing input lines first (pairwise
proper-intersection splitting), so un-noded linework polygonizes too.

Algorithm:
1. explode lines to segments, node at pairwise proper intersections;
2. build the planar graph (vertices keyed by rounded coordinates);
3. peel dangles (edges with a free endpoint, iteratively);
4. trace faces with the rightmost-turn half-edge walk (interior kept
   on the left -> bounded faces come out CCW);
5. cycles that traverse an edge in both directions mark those edges as
   CUT edges; they are removed and tracing reruns;
6. CCW cycles become polygon shells; CW cycles strictly contained in a
   shell of another component become its holes (GEOS EdgeRing hole
   assignment); non-simple leftover cycles are INVALID rings.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from .geom import (GEOMETRYCOLLECTION, LINEARRING, LINESTRING,
                   MULTILINESTRING, MULTIPOLYGON, POLYGON, Geom)

_KEY_DECIMALS = 9


def _key(x, y):
    return (round(float(x), _KEY_DECIMALS), round(float(y), _KEY_DECIMALS))


def _segments_of(lines):
    segs = []
    for g in lines:
        if g is None or g.is_empty:
            continue
        parts = g.parts if g.parts else [g]
        for p in parts:
            if p.type_id not in (LINESTRING, LINEARRING) or p.coords is None:
                continue
            c = p.coords
            for i in range(len(c) - 1):
                if not np.array_equal(c[i], c[i + 1]):
                    segs.append((c[i][0], c[i][1], c[i + 1][0], c[i + 1][1]))
    return segs


def _node_segments(segs):
    """Split segments at pairwise proper intersections (planar noding).
    O(n^2) pair sweep — kernel-scale linework, not the dataset."""
    n = len(segs)
    cuts = [[] for _ in range(n)]  # parameter t per segment
    for i in range(n):
        x1, y1, x2, y2 = segs[i]
        for j in range(i + 1, n):
            x3, y3, x4, y4 = segs[j]
            den = (y4 - y3) * (x2 - x1) - (x4 - x3) * (y2 - y1)
            if den == 0:
                continue
            ua = ((x4 - x3) * (y1 - y3) - (y4 - y3) * (x1 - x3)) / den
            ub = ((x2 - x1) * (y1 - y3) - (y2 - y1) * (x1 - x3)) / den
            eps = 1e-12
            if -eps <= ua <= 1 + eps and -eps <= ub <= 1 + eps:
                if eps < ua < 1 - eps:
                    cuts[i].append(ua)
                if eps < ub < 1 - eps:
                    cuts[j].append(ub)
    out = []
    for i, (x1, y1, x2, y2) in enumerate(segs):
        ts = sorted(set([0.0, 1.0] + cuts[i]))
        for a, b in zip(ts[:-1], ts[1:]):
            ax, ay = x1 + a * (x2 - x1), y1 + a * (y2 - y1)
            bx, by = x1 + b * (x2 - x1), y1 + b * (y2 - y1)
            if _key(ax, ay) != _key(bx, by):
                out.append((ax, ay, bx, by))
    return out


class _Graph:
    def __init__(self, segs):
        self.pos = {}            # vertex key -> np.array coords
        self.adj = defaultdict(set)   # vertex key -> set of vertex keys
        for x1, y1, x2, y2 in segs:
            a, b = _key(x1, y1), _key(x2, y2)
            if a == b:
                continue
            self.pos.setdefault(a, np.array([x1, y1], dtype=np.float64))
            self.pos.setdefault(b, np.array([x2, y2], dtype=np.float64))
            self.adj[a].add(b)
            self.adj[b].add(a)

    def peel_dangles(self):
        """Iteratively remove degree-1 edges; returns them as segment
        pairs (the DANGLE output)."""
        dangles = []
        changed = True
        while changed:
            changed = False
            for v in list(self.adj):
                if len(self.adj[v]) == 1:
                    (u,) = self.adj[v]
                    dangles.append((v, u))
                    self.adj[v].discard(u)
                    self.adj[u].discard(v)
                    if not self.adj[v]:
                        del self.adj[v]
                    if u in self.adj and not self.adj[u]:
                        del self.adj[u]
                    changed = True
        return dangles

    def remove_edge(self, a, b):
        self.adj[a].discard(b)
        self.adj[b].discard(a)
        if a in self.adj and not self.adj[a]:
            del self.adj[a]
        if b in self.adj and not self.adj[b]:
            del self.adj[b]

    def _angle(self, a, b):
        d = self.pos[b] - self.pos[a]
        return float(np.arctan2(d[1], d[0]))

    def trace_faces(self):
        """Rightmost-turn half-edge walk: every directed edge belongs
        to exactly one cycle; interiors of bounded faces are traced
        CCW."""
        nxt = {}
        for v in self.adj:
            nbrs = sorted(self.adj[v], key=lambda u: self._angle(v, u))
            # arriving via (u, v): continue with the neighbor that is
            # the next clockwise from the reverse direction
            for u in self.adj[v]:
                rev = self._angle(v, u)
                # pick the neighbor with the largest angle < rev (cyclic)
                best = None
                for w in nbrs:
                    aw = self._angle(v, w)
                    if aw < rev - 1e-15:
                        best = w  # keep increasing; last one < rev wins
                if best is None:
                    best = nbrs[-1]
                nxt[(u, v)] = (v, best)
        cycles = []
        seen = set()
        for he in nxt:
            if he in seen:
                continue
            cyc = []
            cur = he
            while cur not in seen:
                seen.add(cur)
                cyc.append(cur)
                cur = nxt[cur]
            cycles.append(cyc)
        return cycles


def _cycle_ring(cycle, pos):
    pts = [pos[a] for a, _ in cycle]
    pts.append(pts[0])
    return np.asarray(pts, dtype=np.float64)


def _signed_area(ring):
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))


def polygonize_full(lines):
    """Returns (polygons, cut_edges, dangles, invalid_rings) — the
    reference's four outputs (constructive.py:582-640) — each as a
    Geom collection (empty GEOMETRYCOLLECTION when none)."""
    segs = _node_segments(_segments_of(lines))
    g = _Graph(segs)
    dangle_edges = g.peel_dangles()

    cut_edges = []
    for _ in range(8):  # cut removal converges fast; bound the loop
        cycles = g.trace_faces()
        new_cuts = set()
        for cyc in cycles:
            dir_edges = set(cyc)
            for a, b in cyc:
                if (b, a) in dir_edges:
                    new_cuts.add(tuple(sorted((a, b))))
        if not new_cuts:
            break
        for a, b in new_cuts:
            cut_edges.append((a, b))
            g.remove_edge(a, b)
        # cut removal can expose new dangles; keep them in the dangle
        # output (no leftover edge may vanish from all four outputs)
        dangle_edges.extend(g.peel_dangles())
    else:
        cycles = g.trace_faces()

    shells, cw_cycles, invalid = [], [], []
    for cyc in cycles:
        ring = _cycle_ring(cyc, g.pos)
        verts = [c[0] for c in cyc]
        simple = len(set(verts)) == len(verts)
        area = _signed_area(ring)
        if not simple:
            if area > 0:
                invalid.append(ring)
            continue
        if area > 1e-18:
            shells.append(ring)
        elif area < -1e-18:
            cw_cycles.append(ring)

    # hole assignment: a CW component boundary strictly inside a shell
    # becomes that (smallest) shell's hole
    from . import predicates as P
    polys = [[s] for s in shells]
    for cw in cw_cycles:
        px, py = cw[0]
        best, best_area = None, None
        for i, s in enumerate(shells):
            inside, boundary = P.points_in_polygon(
                np.array([px]), np.array([py]), Geom(POLYGON, rings=[s]))
            if inside[0] and not boundary[0]:
                a = abs(_signed_area(s))
                if best is None or a < best_area:
                    best, best_area = i, a
        if best is not None:
            polys[best].append(cw)

    poly_geoms = [Geom(POLYGON, rings=r) for r in polys]
    if not poly_geoms:
        polygons = Geom(GEOMETRYCOLLECTION)
    elif len(poly_geoms) == 1:
        polygons = poly_geoms[0]
    else:
        polygons = Geom(MULTIPOLYGON, parts=poly_geoms)

    def lines_geom(edges):
        if not edges:
            return Geom(GEOMETRYCOLLECTION)
        parts = [Geom.linestring(np.vstack([g.pos[a], g.pos[b]]))
                 for a, b in edges]
        return parts[0] if len(parts) == 1 else Geom(MULTILINESTRING, parts=parts)

    cuts = lines_geom(cut_edges)
    dangles = lines_geom(dangle_edges)
    if not invalid:
        invalids = Geom(GEOMETRYCOLLECTION)
    else:
        rings = [Geom.linestring(r) for r in invalid]
        invalids = rings[0] if len(rings) == 1 else Geom(MULTILINESTRING, parts=rings)
    return polygons, cuts, dangles, invalids


def polygonize(lines):
    """Polygons only (reference constructive.py:530-580), with planar
    noding and hole assignment."""
    return polygonize_full(lines)[0]
