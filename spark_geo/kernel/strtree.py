"""Packed Sort-Tile-Recursive R-tree — the engine's join index.

Re-creates the reference's STRtree semantics (pygeos/strtree.py,
src/strtree.c) on NumPy envelope arrays:

- build drops None AND empty geometries but preserves original indices
  (reference src/strtree.c:182-201)
- ``query(geom, predicate, distance)``: envelope-overlap candidates,
  then exact refine with the predicate (reference strtree.c:340-418,
  evaluate_predicate :272-327); ``dwithin`` expands the search
  envelope by ±distance first (strtree.c:1165-1188)
- ``query_bulk``: inner-join semantics, None/empty left rows omitted
  (reference strtree.py:152-159)
- ``nearest_all``: ALL equidistant nearest items (reference
  strtree.py:278-355); we traverse best-first and keep every tie —
  the analogue of the reference's 1e-6 distance-inflation trick
  (strtree.c:654-695)
- ``nearest``: deterministic tie-break (lowest index) — documented
  difference from the reference's nondeterminism (strtree.py:235-238)

The tree is a plain picklable object: build once on the driver for the
broadcast side of a spatial join, ``sc.broadcast`` it, deserialize
once per executor (see spark_geo.join).
"""

from __future__ import annotations

import heapq

import numpy as np

from . import measure as M
from . import predicates as P
from .geom import Geom

PREDICATES = {
    None: None,
    "intersects": P.intersects,
    "within": P.within,
    "contains": P.contains,
    "overlaps": P.overlaps,
    "crosses": P.crosses,
    "touches": P.touches,
    "covers": P.covers,
    "covered_by": P.covered_by,
    "contains_properly": P.contains_properly,
}  # id set mirrors reference strtree.py:10-21


class STRtree:
    def __init__(self, geoms, leafsize: int = 10):
        self.leafsize = max(2, int(leafsize))
        self._geoms = list(geoms)
        idx, boxes = [], []
        for i, g in enumerate(self._geoms):
            if g is None or g.is_empty:
                continue  # dropped but index preserved (strtree.c:182-201)
            idx.append(i)
            boxes.append(g.bounds())
        self._idx = np.asarray(idx, dtype=np.int64)
        self._boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        self._build()

    @classmethod
    def from_points(cls, xs, ys, leafsize: int = 10) -> "STRtree":
        """Point-only tree straight from coordinate arrays (r6): no
        Geom objects are created OR pickled into the broadcast — the
        item envelopes are the degenerate per-point boxes.  NaN rows
        are dropped with their index preserved, exactly like None/empty
        geometries in the generic constructor.  ``_geoms`` is None;
        only the vectorized point probe paths may be used."""
        t = cls.__new__(cls)
        t.leafsize = max(2, int(leafsize))
        xs = np.asarray(xs, dtype=np.float64)
        ys = np.asarray(ys, dtype=np.float64)
        keep = ~(np.isnan(xs) | np.isnan(ys))
        t._idx = np.nonzero(keep)[0].astype(np.int64)
        t._boxes = np.column_stack([xs[keep], ys[keep],
                                    xs[keep], ys[keep]])
        t._geoms = None
        t._points_only = True
        t._build()
        return t

    def __len__(self):
        return len(self._idx)  # count of indexed geoms (strtree.py:62)

    # -- STR packing ---------------------------------------------------
    def _build(self):
        n = len(self._idx)
        if n == 0:
            self._levels = []
            return
        cx = (self._boxes[:, 0] + self._boxes[:, 2]) / 2
        cy = (self._boxes[:, 1] + self._boxes[:, 3]) / 2
        order = np.argsort(cx, kind="stable")
        nleaves = int(np.ceil(n / self.leafsize))
        nslices = int(np.ceil(np.sqrt(nleaves)))
        per_slice = int(np.ceil(n / nslices))
        leaf_of = np.empty(n, dtype=np.int64)
        leaf_id = 0
        pos = 0
        for s in range(nslices):
            sl = order[s * per_slice:(s + 1) * per_slice]
            if not len(sl):
                continue
            sl = sl[np.argsort(cy[sl], kind="stable")]
            for k in range(0, len(sl), self.leafsize):
                leaf_of[sl[k:k + self.leafsize]] = leaf_id
                leaf_id += 1
        # level 0: leaves — children = item positions grouped by leaf id
        self._item_order = np.argsort(leaf_of, kind="stable")
        sorted_leaf = leaf_of[self._item_order]
        starts = np.searchsorted(sorted_leaf, np.arange(leaf_id))
        ends = np.searchsorted(sorted_leaf, np.arange(leaf_id), side="right")
        leaf_boxes = np.empty((leaf_id, 4), dtype=np.float64)
        for l in range(leaf_id):
            items = self._item_order[starts[l]:ends[l]]
            bb = self._boxes[items]
            leaf_boxes[l] = (bb[:, 0].min(), bb[:, 1].min(), bb[:, 2].max(), bb[:, 3].max())
        self._leaf_starts, self._leaf_ends = starts, ends
        # upper levels: simple contiguous grouping of node boxes
        levels = [leaf_boxes]
        while len(levels[-1]) > 1:
            prev = levels[-1]
            m = int(np.ceil(len(prev) / self.leafsize))
            nb = np.empty((m, 4), dtype=np.float64)
            for j in range(m):
                bb = prev[j * self.leafsize:(j + 1) * self.leafsize]
                nb[j] = (bb[:, 0].min(), bb[:, 1].min(), bb[:, 2].max(), bb[:, 3].max())
            levels.append(nb)
        self._levels = levels

    # -- envelope query --------------------------------------------------
    def _query_box(self, xmin, ymin, xmax, ymax) -> np.ndarray:
        """Positions (into _idx/_boxes) whose envelope overlaps the box."""
        if not len(self._idx):
            return np.empty(0, dtype=np.int64)
        if len(self._levels) == 1 or len(self._idx) <= 256:
            b = self._boxes
            hit = (b[:, 0] <= xmax) & (b[:, 2] >= xmin) & (b[:, 1] <= ymax) & (b[:, 3] >= ymin)
            return np.nonzero(hit)[0]
        out = []
        top = len(self._levels) - 1
        stack = [(top, j) for j in range(len(self._levels[top]))]
        while stack:
            lvl, j = stack.pop()
            bb = self._levels[lvl][j]
            if bb[0] > xmax or bb[2] < xmin or bb[1] > ymax or bb[3] < ymin:
                continue
            if lvl == 0:
                items = self._item_order[self._leaf_starts[j]:self._leaf_ends[j]]
                b = self._boxes[items]
                hit = (b[:, 0] <= xmax) & (b[:, 2] >= xmin) & (b[:, 1] <= ymax) & (b[:, 3] >= ymin)
                out.append(items[hit])
            else:
                lo = j * self.leafsize
                hi = min((j + 1) * self.leafsize, len(self._levels[lvl - 1]))
                stack.extend((lvl - 1, c) for c in range(lo, hi))
        if not out:
            return np.empty(0, dtype=np.int64)
        return np.concatenate(out)

    # -- public API (reference parity) ----------------------------------
    def query(self, geom: Geom | None, predicate: str | None = None,
              distance: float | None = None) -> np.ndarray:
        """Indices of tree geometries whose envelope overlaps ``geom``,
        optionally refined by an exact predicate (strtree.py:65-133).
        None/empty input -> empty result (strtree.py:110-111)."""
        if geom is None or geom.is_empty:
            return np.empty(0, dtype=np.int64)
        if predicate == "dwithin":
            if distance is None:
                raise ValueError("distance parameter is required with dwithin predicate")
            xmin, ymin, xmax, ymax = geom.bounds()
            pos = self._query_box(xmin - distance, ymin - distance,
                                  xmax + distance, ymax + distance)
            keep = [p for p in pos
                    if P.dwithin(geom, self._geoms[self._idx[p]], distance)]
            return np.sort(self._idx[np.asarray(keep, dtype=np.int64)])
        pos = self._query_box(*geom.bounds())
        if predicate is None:
            return np.sort(self._idx[pos])
        fn = PREDICATES[predicate]
        keep = [p for p in pos if fn(geom, self._geoms[self._idx[p]])]
        return np.sort(self._idx[np.asarray(keep, dtype=np.int64)])

    def query_bulk(self, geoms, predicate: str | None = None,
                   distance: float | None = None) -> np.ndarray:
        """(2, n) [left_index, tree_index] pairs — inner-join semantics,
        None/empty left rows omitted (reference strtree.py:135-228)."""
        lefts, rights = [], []
        for i, g in enumerate(geoms):
            hits = self.query(g, predicate=predicate, distance=distance)
            if len(hits):
                lefts.append(np.full(len(hits), i, dtype=np.int64))
                rights.append(hits)
        if not lefts:
            return np.empty((2, 0), dtype=np.int64)
        return np.vstack([np.concatenate(lefts), np.concatenate(rights)])

    # -- nearest ---------------------------------------------------------
    def _box_min_dist(self, bb, geom_bounds):
        gx0, gy0, gx1, gy1 = geom_bounds
        dx = max(bb[0] - gx1, gx0 - bb[2], 0.0)
        dy = max(bb[1] - gy1, gy0 - bb[3], 0.0)
        return float(np.hypot(dx, dy))

    def nearest_item_distances(self, geom: Geom):
        """Best-first traversal -> (positions, exact distances) of ALL
        minimum-distance items (ties kept, reference strtree.py:278-355)."""
        if geom is None or geom.is_empty or not len(self._idx):
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        gb = geom.bounds()
        best = np.inf
        found: list[tuple[float, int]] = []
        top = len(self._levels) - 1
        heap: list[tuple[float, int, int, int]] = []
        if top == 0 and len(self._levels[0]) == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        for j in range(len(self._levels[top])):
            heapq.heappush(heap, (self._box_min_dist(self._levels[top][j], gb), 1, top, j))
        while heap:
            d, is_node, lvl, j = heapq.heappop(heap)
            if d > best:
                break
            if is_node:
                if lvl == 0:
                    for p in self._item_order[self._leaf_starts[j]:self._leaf_ends[j]]:
                        bd = self._box_min_dist(self._boxes[p], gb)
                        if bd <= best:
                            heapq.heappush(heap, (bd, 0, -1, int(p)))
                else:
                    lo = j * self.leafsize
                    hi = min((j + 1) * self.leafsize, len(self._levels[lvl - 1]))
                    for c in range(lo, hi):
                        bd = self._box_min_dist(self._levels[lvl - 1][c], gb)
                        if bd <= best:
                            heapq.heappush(heap, (bd, 1, lvl - 1, c))
            else:
                ex = M.distance(geom, self._geoms[self._idx[j]])
                if np.isnan(ex):
                    continue
                if ex < best:
                    best = ex
                    found = [(ex, j)]
                elif ex == best:
                    found.append((ex, j))
        if not found:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        pos = np.asarray(sorted(j for _, j in found), dtype=np.int64)
        return pos, np.full(len(pos), best)

    def nearest_all(self, geoms, max_distance: float | None = None,
                    return_distance: bool = False):
        """(2, n) index pairs of all equidistant nearest tree items per
        input (reference strtree.py:278-355); ``max_distance`` caps the
        search (envelope prescreen, strtree.c:941-964)."""
        lefts, rights, dists = [], [], []
        for i, g in enumerate(geoms):
            if g is None or g.is_empty:
                continue
            if max_distance is not None:
                xmin, ymin, xmax, ymax = g.bounds()
                pre = self._query_box(xmin - max_distance, ymin - max_distance,
                                      xmax + max_distance, ymax + max_distance)
                if not len(pre):
                    continue
            pos, dd = self.nearest_item_distances(g)
            if max_distance is not None:
                keep = dd <= max_distance
                pos, dd = pos[keep], dd[keep]
            if len(pos):
                lefts.append(np.full(len(pos), i, dtype=np.int64))
                rights.append(self._idx[pos])
                dists.append(dd)
        if not lefts:
            pairs = np.empty((2, 0), dtype=np.int64)
            return (pairs, np.empty(0)) if return_distance else pairs
        pairs = np.vstack([np.concatenate(lefts), np.concatenate(rights)])
        if return_distance:
            return pairs, np.concatenate(dists)
        return pairs

    def nearest(self, geoms) -> np.ndarray:
        """Single nearest item per input; deterministic lowest-index
        tie-break (the reference's is nondeterministic,
        strtree.py:235-238)."""
        pairs = self.nearest_all(geoms)
        if pairs.shape[1] == 0:
            return pairs
        # keep first (lowest tree index) per left — nearest_all sorts ties
        left, right = pairs
        _, first = np.unique(left, return_index=True)
        return np.vstack([left[first], right[first]])
