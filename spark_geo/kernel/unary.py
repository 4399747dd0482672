"""Element accessors + unary predicates (reference pygeos/geometry.py
accessors §2.3, pygeos/predicates.py unary set §2.4).

NULL rules follow the reference: predicates on None -> False
(predicates.py:156-158); accessors on None -> None/NaN.
"""

from __future__ import annotations

import numpy as np

from .geom import (GEOMETRYCOLLECTION, LINEARRING, LINESTRING, MULTILINESTRING,
                   MULTIPOINT, MULTIPOLYGON, POINT, POLYGON, Geom)
from . import measure as M
from . import predicates as P


# -- unary predicates ----------------------------------------------------

def is_closed(g: Geom | None) -> bool:
    """First point == last point for lineal geometry (reference
    predicates.py:107-134); False for None/non-lineal."""
    if g is None:
        return False
    if g.type_id == LINEARRING:
        return True
    if g.type_id == LINESTRING:
        return len(g.coords) >= 2 and bool(np.array_equal(g.coords[0], g.coords[-1]))
    if g.type_id == MULTILINESTRING:
        return bool(g.parts) and all(is_closed(p) for p in g.parts)
    return False


def is_ring(g: Geom | None) -> bool:
    """Closed AND simple (reference predicates.py:292-325)."""
    if g is None or g.type_id not in (LINESTRING, LINEARRING):
        return False
    return is_closed(g) and is_simple(g)


def is_ccw(g: Geom | None) -> bool:
    """Counterclockwise orientation of a ring/closed line (reference
    predicates.py:70-106); False for None/unclosed/non-lineal."""
    if g is None or g.type_id not in (LINESTRING, LINEARRING):
        return False
    if not is_closed(g) or len(g.coords) < 4:
        return False
    return M.ring_area(g.coords) > 0


def is_simple(g: Geom | None) -> bool:
    """No self-intersection (reference predicates.py:326-358): lineal
    geometry whose non-adjacent segments don't touch; False for
    None/GEOMETRYCOLLECTION like the reference."""
    if g is None or g.type_id == GEOMETRYCOLLECTION:
        return False
    if g.type_id in (POINT, POLYGON, MULTIPOLYGON):
        return True
    if g.type_id == MULTIPOINT:
        v = M.vertices(g)
        return len(np.unique(v, axis=0)) == len(v)
    segs = M.segments(g)
    return not _has_self_intersection(segs, closed=is_closed(g))


def _has_self_intersection(segs: np.ndarray, closed: bool = False) -> bool:
    n = len(segs)
    if n <= 1:
        return False
    touch, proper = P._seg_cross_matrix(segs, segs)
    if proper.any():
        return True
    # adjacent segments legitimately share an endpoint; mask the
    # diagonal band (and the wrap pair when closed)
    adj = np.eye(n, dtype=bool) | np.eye(n, k=1, dtype=bool) | np.eye(n, k=-1, dtype=bool)
    if closed:
        adj[0, n - 1] = adj[n - 1, 0] = True
    return bool((touch & ~adj).any())


def is_valid(g: Geom | None) -> bool:
    """Validity (reference predicates.py:359-391): ring closure and
    simplicity, hole containment, hole/shell nesting, and OGC
    connected-interior (r4 — a hole or chain of touching holes linking
    two shell contacts disconnects the interior).  True for
    non-polygonal geometries."""
    return is_valid_reason(g) == "Valid Geometry"


def _interior_disconnected(shell: np.ndarray, holes: list) -> bool:
    """OGC connected-interior test (GEOS 'Interior is disconnected';
    reference predicates.py:359-391 delegates to GEOSisValidReason).

    With rings touching only at isolated points (crossings are caught
    by the earlier checks), the interior is disconnected iff the
    bipartite incidence graph — ring nodes on one side, distinct touch
    POINTS on the other, an edge when the point lies on the ring —
    contains a cycle: one hole touching the shell at two points cuts
    the interior in two, as does a chain of touching holes linking two
    shell contacts, while any number of rings meeting at a SINGLE
    shared point leaves it connected (cycle detection via union-find;
    a touch along a shared edge yields >= 2 touch points and is
    reported as disconnection — GEOS labels that case
    self-intersection, invalid either way)."""
    rings = [shell] + holes
    ring_segs = [np.hstack([r[:-1], r[1:]]) for r in rings]
    # touch points: vertex of one ring within EPS of the other ring
    incid: dict[tuple, set] = {}
    for i in range(len(rings)):
        for j in range(i + 1, len(rings)):
            for vi, sj in ((rings[i][:-1], ring_segs[j]),
                           (rings[j][:-1], ring_segs[i])):
                d = M.points_to_segments_dist(vi[:, 0], vi[:, 1], sj)
                for p in vi[d <= 1e-9]:
                    key = (round(float(p[0]), 9), round(float(p[1]), 9))
                    incid.setdefault(key, set()).update((i, j))
    if not incid:
        return False
    # union-find over ring ids (0..R-1) and touch-point nodes
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for key, ring_ids in incid.items():
        pnode = ("p", key)
        for r in ring_ids:
            ra, rb = find(pnode), find(("r", r))
            if ra == rb:
                return True  # second independent path => cycle
            parent[ra] = rb
    return False


def is_valid_reason(g: Geom | None) -> str | None:
    """Text reason (reference predicates.py:392-419); None -> None."""
    if g is None:
        return None
    if g.type_id == POLYGON:
        for k, r in enumerate(g.rings):
            if len(r) == 0:
                continue
            if len(r) < 4:
                return "Too few points in geometry component"
            if not np.array_equal(r[0], r[-1]):
                return "Ring not closed"
            if _has_self_intersection(np.hstack([r[:-1], r[1:]]), closed=True):
                return "Self-intersection"
        for hole in g.rings[1:]:
            if len(hole) >= 4 and len(g.rings[0]) >= 4:
                inside = P.points_covered_by(hole[:-1, 0], hole[:-1, 1],
                                             Geom(POLYGON, rings=[g.rings[0]]))
                if not inside.all():
                    return "Hole lies outside shell"
        # holes must not be nested inside each other
        holes = [h for h in g.rings[1:] if len(h) >= 4]
        for i in range(len(holes)):
            for j in range(len(holes)):
                if i != j and P.covers(Geom(POLYGON, rings=[holes[i]]),
                                       Geom(POLYGON, rings=[holes[j]])):
                    return "Holes are nested"
        if g.rings and len(g.rings[0]) >= 4 and holes and \
                _interior_disconnected(g.rings[0], holes):
            return "Interior is disconnected"
        return "Valid Geometry"
    if g.type_id == MULTIPOLYGON and g.parts:
        for p in g.parts:
            r = is_valid_reason(p)
            if r != "Valid Geometry":
                return r
        # component shells must not be nested / overlap interiors
        # (covers is tested against the FULL holed part, so a shell
        # sitting legitimately inside another part's hole passes)
        kept = [p for p in g.parts if p.rings and len(p.rings[0]) >= 4]
        shells = [Geom(POLYGON, rings=[p.rings[0]]) for p in kept]
        for i in range(len(shells)):
            for j in range(i + 1, len(shells)):
                if P._bbox_disjoint(shells[i], shells[j]):
                    continue
                if P.covers(kept[i], shells[j]) or \
                        P.covers(kept[j], shells[i]):
                    return "Nested shells"
                if P._interiors_intersect(kept[i], kept[j]):
                    return "Self-intersection"
        return "Valid Geometry"
    if g.parts:
        for p in g.parts:
            r = is_valid_reason(p)
            if r != "Valid Geometry":
                return r
        return "Valid Geometry"
    return "Valid Geometry"


def has_z(g: Geom | None) -> bool:
    """(reference predicates.py:39-69)."""
    if g is None:
        return False
    if g.has_z and g.zs is not None:
        return True
    return any(has_z(p) for p in g.parts)


# -- accessors -----------------------------------------------------------

def get_dimensions(g: Geom | None) -> int:
    """Topological dimension; -1 for None/empty collection (reference
    geometry.py:91-121)."""
    if g is None:
        return -1
    return g.dimensions()


def get_coordinate_dimension(g: Geom | None) -> int:
    """2 or 3; -1 for None (reference geometry.py:122-149)."""
    if g is None:
        return -1
    return 3 if has_z(g) else 2


def get_point(g: Geom | None, index: int) -> Geom | None:
    """n-th vertex of a linestring/ring; None for other types or OOB
    (reference geometry.py:322-357); negative index from the end."""
    if g is None or g.type_id not in (LINESTRING, LINEARRING):
        return None
    n = len(g.coords)
    i = index if index >= 0 else n + index
    if not 0 <= i < n:
        return None
    return Geom.point(float(g.coords[i, 0]), float(g.coords[i, 1]))


def get_num_points(g: Geom | None) -> int:
    """Vertex count of a linestring; 0 otherwise (reference
    geometry.py:358-392)."""
    if g is None or g.type_id not in (LINESTRING, LINEARRING):
        return 0
    return int(len(g.coords))


def get_exterior_ring(g: Geom | None) -> Geom | None:
    """(reference geometry.py:394-417)."""
    if g is None or g.type_id != POLYGON or not g.rings or not len(g.rings[0]):
        return None
    return Geom(LINEARRING, g.rings[0].copy())


def get_interior_ring(g: Geom | None, index: int) -> Geom | None:
    """(reference geometry.py:419-446)."""
    if g is None or g.type_id != POLYGON:
        return None
    holes = g.rings[1:]
    i = index if index >= 0 else len(holes) + index
    if not 0 <= i < len(holes):
        return None
    return Geom(LINEARRING, holes[i].copy())


def get_num_interior_rings(g: Geom | None) -> int:
    """(reference geometry.py:448-484)."""
    if g is None or g.type_id != POLYGON:
        return 0
    return max(0, len(g.rings) - 1)


def get_geometry(g: Geom | None, index: int) -> Geom | None:
    """n-th part of a collection (negative ok); non-collections act as
    length-1 collections (reference geometry.py:486-523)."""
    if g is None:
        return None
    parts = g.parts if g.type_id in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON,
                                     GEOMETRYCOLLECTION) else [g]
    i = index if index >= 0 else len(parts) + index
    if not 0 <= i < len(parts):
        return None
    return parts[i]


def get_parts(g: Geom | None) -> list:
    """(reference geometry.py:524-567 / _geometry.pyx:166)."""
    if g is None:
        return []
    if g.type_id in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION):
        return list(g.parts)
    return [] if g.is_empty else [g]


def get_rings(g: Geom | None) -> list:
    """Exterior + interior rings of polygons (reference
    geometry.py:569-624)."""
    if g is None:
        return []
    out = []
    for poly in P._iter_polygons(g):
        for r in poly.rings:
            if len(r):
                out.append(Geom(LINEARRING, r.copy()))
    return out


def _dedup_consecutive(c):
    if len(c) < 2:
        return c
    keep = np.ones(len(c), dtype=bool)
    keep[1:] = np.any(c[1:] != c[:-1], axis=1)
    return c[keep]


def set_precision(g: Geom | None, grid_size: float, mode: str = "valid_output") -> Geom | None:
    """Snap coordinates to a grid (reference geometry.py:699-791).

    Modes match the reference's enum:
    - ``valid_output`` (default): snap, drop consecutive duplicate
      vertices, and remove rings/lines collapsed below the grid
      (polygon ring < 4 distinct points, line < 2) — the output stays
      structurally valid;
    - ``pointwise``: raw per-coordinate snap, collapses preserved
      verbatim;
    - ``keep_collapsed``: like valid_output but collapsed components
      are kept, reduced to their lower-dimensional form (ring -> its
      remaining line/point coordinates)."""
    if g is None or grid_size <= 0:
        return g

    def snap(c):
        return np.round(np.asarray(c, dtype=np.float64) / grid_size) * grid_size

    if mode == "pointwise":
        if g.type_id == POLYGON:
            return Geom(POLYGON, rings=[snap(r) for r in g.rings])
        if g.parts:
            return Geom(g.type_id, parts=[set_precision(p, grid_size, mode)
                                          for p in g.parts])
        out = Geom(g.type_id, snap(g.coords))
        if g.has_z and g.zs is not None:
            out.has_z, out.zs = True, g.zs.copy()
        return out

    if g.parts:
        parts = [set_precision(p, grid_size, mode) for p in g.parts]
        parts = [p for p in parts if p is not None and not p.is_empty]
        if not parts:
            from .geom import GEOMETRYCOLLECTION
            return Geom(GEOMETRYCOLLECTION)
        return parts[0] if len(parts) == 1 else Geom(g.type_id, parts=parts)
    if g.type_id == POLYGON:
        rings = []
        collapsed = []
        for i, r in enumerate(g.rings):
            rr = _dedup_consecutive(snap(r))
            if len(rr) and not np.array_equal(rr[0], rr[-1]):
                rr = np.vstack([rr, rr[:1]])
            if len(rr) >= 4:
                rings.append(rr)
            elif i == 0:
                collapsed = rr[:-1] if len(rr) > 1 and \
                    np.array_equal(rr[0], rr[-1]) else rr
        if not rings or (g.rings and len(_dedup_consecutive(snap(g.rings[0]))) < 4):
            if mode == "keep_collapsed" and len(collapsed):
                if len(collapsed) >= 2:
                    return Geom(LINESTRING, np.asarray(collapsed))
                return Geom(POINT, np.asarray(collapsed))
            return Geom(POLYGON)
        return Geom(POLYGON, rings=rings)
    if g.type_id in (LINESTRING, LINEARRING):
        c = _dedup_consecutive(snap(g.coords))
        if len(c) >= 2:
            return Geom(g.type_id, c)
        if mode == "keep_collapsed" and len(c):
            return Geom(POINT, c)
        return Geom(LINESTRING)
    out = Geom(g.type_id, snap(g.coords))
    if g.has_z and g.zs is not None:
        out.has_z, out.zs = True, g.zs.copy()
    return out


def get_precision(g: Geom | None) -> float | None:
    """Inferred precision grid (reference geometry.py:658-697 returns
    the STORED grid; WKB carries no grid slot, so this engine infers
    the coarsest power-of-10 grid, 1.0 down to 1e-9, that every
    coordinate lies on exactly — 0.0 means 'no grid detected', the
    reference's 'no precision set').  Documented divergence."""
    if g is None:
        return None
    from . import measure as M
    flat = M.vertices(g)
    if flat is None or not len(flat):
        return 0.0
    flat = np.asarray(flat, dtype=np.float64).ravel()
    for k in range(0, 10):
        grid = 10.0 ** (-k)
        q = flat / grid
        if np.allclose(q, np.round(q), rtol=0, atol=1e-9):
            return grid
    return 0.0


def force_3d(g: Geom | None, z: float = 0.0) -> Geom | None:
    """(reference geometry.py:819-848)."""
    if g is None:
        return None
    if g.parts:
        return Geom(g.type_id, parts=[force_3d(p, z) for p in g.parts])
    if g.type_id == POLYGON:
        return g  # rings keep 2D in v1 (WKB writer emits Z for coords only)
    zs = g.zs if (g.has_z and g.zs is not None) else np.full(len(g.coords), z)
    return Geom(g.type_id, g.coords.copy(), has_z=True, zs=zs)
