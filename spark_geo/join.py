"""Spatial joins — the heart of the engine (SURVEY.md §2.6).

Two physical strategies, both reproducing the reference's
``STRtree.query_bulk`` inner-join semantics (reference
strtree.py:135-228: left rows with None/empty geometry omitted,
candidates from envelope overlap, exact predicate refine with the
probe geometry prepared once):

1. **broadcast** (small right side): build the STRtree once on the
   driver, ``sc.broadcast`` it, probe each left Arrow batch inside
   ``mapInPandas`` — zero shuffle, the Spark analogue of
   query_bulk-per-batch.  Point probes take a fully vectorized
   two-phase path: bbox candidates from the tree, then ONE
   ray-casting PIP call per distinct candidate polygon over all its
   candidate points (the per-batch "prepare once" of
   reference src/strtree.c:286).

2. **cell equi-join** (large ✕ large): both sides keyed by quad-grid
   cells (points: 1 cell; polygons: exploded cover), Catalyst
   sort-merge/broadcast equi-join on cell, exact refine, pair dedup.
   AQE handles runtime skew; pipeline.salt_hot_cells handles
   persistent hot cells explicitly (north_rule).

At 100 TB scale: strategy 1 is the right plan whenever the polygon
layer fits in executor memory (admin boundaries, tile grids — the
common case); it touches each page row exactly once with no exchange.
Strategy 2 is the fallback for billion-polygon right sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from .kernel import cell as K_cell
from .kernel import measure as K_m
from .kernel import predicates as K_p
from .kernel import wkb as K_wkb
from .kernel.strtree import PREDICATES, STRtree
from . import functions as SG

_POINT_FAST_PREDICATES = {"intersects", "within", "covered_by", "dwithin", "touches"}


# ---------------------------------------------------------------------------
# batch-level probe (runs inside the Python worker)
# ---------------------------------------------------------------------------

def _probe_batch_points(tree: STRtree, xs, ys, predicate, distance):
    """Vectorized two-phase probe for point batches.

    Phase 1: per-point envelope candidates from the tree.
    Phase 2: group candidate pairs by tree geometry, one vectorized
    kernel call per geometry (ray-cast PIP / distance)."""
    n = len(xs)
    lefts, rights = [], []
    pad = distance if predicate == "dwithin" else 0.0
    cand_l, cand_r = [], []
    for i in range(n):
        x, y = xs[i], ys[i]
        if np.isnan(x):
            continue
        pos = tree._query_box(x - pad, y - pad, x + pad, y + pad)
        if len(pos):
            cand_l.append(np.full(len(pos), i, dtype=np.int64))
            cand_r.append(pos)
    if not cand_l:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    cl = np.concatenate(cand_l)
    cr = np.concatenate(cand_r)
    if predicate is None:
        return cl, tree._idx[cr]
    order = np.argsort(cr, kind="stable")
    cl, cr = cl[order], cr[order]
    uniq, starts = np.unique(cr, return_index=True)
    ends = np.append(starts[1:], len(cr))
    keep_l, keep_r = [], []
    for u, s, e in zip(uniq, starts, ends):
        g = tree._geoms[tree._idx[u]]
        px, py = xs[cl[s:e]], ys[cl[s:e]]
        if predicate == "dwithin":
            m = K_m.points_to_geom_dist(px, py, g) <= distance
        elif g.type_id in (3, 6, 7) or g.rings or any(
                p.type_id in (3,) for p in g.parts):
            inside, boundary = K_p.points_in_polygon(px, py, g)
            if predicate == "intersects" or predicate == "covered_by":
                m = inside | boundary
            elif predicate == "within":
                m = inside
            elif predicate == "touches":
                m = boundary
            else:
                m = np.zeros(len(px), dtype=bool)
        else:
            segs = K_m.segments(g)
            if len(segs):
                on_line = K_m.points_to_segments_dist(px, py, segs) <= 1e-12
                if predicate in ("intersects", "covered_by"):
                    m = on_line
                elif predicate == "within":
                    bpts = K_p._line_boundary_points(g)
                    m = on_line.copy()
                    if len(bpts):
                        d = np.hypot(px[:, None] - bpts[None, :, 0],
                                     py[:, None] - bpts[None, :, 1])
                        m &= ~(d <= 1e-12).any(axis=1)
                elif predicate == "touches":
                    bpts = K_p._line_boundary_points(g)
                    m = np.zeros(len(px), dtype=bool)
                    if len(bpts):
                        d = np.hypot(px[:, None] - bpts[None, :, 0],
                                     py[:, None] - bpts[None, :, 1])
                        m = (d <= 1e-12).any(axis=1)
                else:
                    m = np.zeros(len(px), dtype=bool)
            else:  # point tree geometry
                gv = K_m.vertices(g)
                d = np.hypot(px[:, None] - gv[None, :, 0], py[:, None] - gv[None, :, 1])
                eq = (d <= 1e-12).any(axis=1)
                m = eq if predicate in ("intersects", "within", "covered_by") else \
                    np.zeros(len(px), dtype=bool)
        hit = np.nonzero(m)[0]
        if len(hit):
            keep_l.append(cl[s:e][hit])
            keep_r.append(np.full(len(hit), tree._idx[u], dtype=np.int64))
    if not keep_l:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(keep_l), np.concatenate(keep_r)


def probe_batch(tree: STRtree, wkbs, predicate=None, distance=None):
    """query_bulk over one Arrow batch of WKB geometries -> (row_pos,
    tree_item_index) arrays.  Point batches go fully vectorized."""
    arr = np.asarray([None if v is None else (v if isinstance(v, bytes) else bytes(v))
                      for v in wkbs], dtype=object)
    xs, ys = K_wkb.decode_points(arr)
    all_points = bool(np.all(np.isnan(xs) == np.array([v is None for v in arr])))
    if all_points and (predicate in _POINT_FAST_PREDICATES or predicate is None):
        return _probe_batch_points(tree, xs, ys, predicate, distance)
    geoms = [None if v is None else K_wkb.loads(v) for v in arr]
    pairs = tree.query_bulk(geoms, predicate=predicate, distance=distance)
    return pairs[0], pairs[1]


# ---------------------------------------------------------------------------
# broadcast STRtree join
# ---------------------------------------------------------------------------

def broadcast_spatial_join(left: DataFrame, right: DataFrame, *,
                           predicate: str = "intersects",
                           left_geom: str = "geom", right_geom: str = "geom",
                           right_id: str = "right_id",
                           distance: float | None = None,
                           leafsize: int = 10) -> DataFrame:
    """Inner spatial join, right side broadcast as an STRtree.

    Output = all left columns + ``right_id``.  Join the result back to
    ``right`` (a broadcast hash join — it is small by construction) to
    attach more right columns."""
    if predicate is not None and predicate != "dwithin" and predicate not in PREDICATES:
        raise ValueError(f"unknown predicate {predicate!r}; one of {sorted(k for k in PREDICATES if k)}")
    rows = right.select(right_id, right_geom).collect()
    ids = np.asarray([r[0] for r in rows], dtype=np.int64)
    geoms = [None if r[1] is None else K_wkb.loads(bytes(r[1])) for r in rows]
    tree = STRtree(geoms, leafsize=leafsize)
    bc = left.sparkSession.sparkContext.broadcast((tree, ids))

    out_schema = T.StructType(left.schema.fields + [T.StructField(right_id, T.LongType())])
    geom_pos = left.columns.index(left_geom)

    def run(batches):
        tree_l, ids_l = bc.value  # deserialized once per worker
        for pdf in batches:
            li, ri = probe_batch(tree_l, pdf.iloc[:, geom_pos].to_numpy(),
                                 predicate=predicate, distance=distance)
            out = pdf.iloc[li].reset_index(drop=True)
            out[right_id] = ids_l[ri]
            yield out

    return left.mapInPandas(run, schema=out_schema)


# ---------------------------------------------------------------------------
# two-phase cell equi-join
# ---------------------------------------------------------------------------

def cell_spatial_join(left: DataFrame, right: DataFrame, *,
                      predicate: str = "intersects",
                      left_geom: str = "geom", right_geom: str = "geom",
                      left_id: str = "left_id", right_id: str = "right_id",
                      res: int = 7, distance: float | None = None,
                      left_is_points: bool = True) -> DataFrame:
    """Large✕large spatial join: coarse cell equi-join (Catalyst
    sort-merge; AQE skew split) + exact refine + pair dedup.

    ``distance`` (dwithin) expands the left cells by k rings with
    k = ceil(d / cell_height) — the cell-grid analogue of the
    reference's bbox expansion (src/strtree.c:1165-1188)."""
    lcell = F.explode(_left_cells(left[left_geom], res, distance, left_is_points)).alias("_cell")
    l = left.select(F.col(left_id).alias("_lid"), F.col(left_geom).alias("_lgeom"), lcell)
    r = right.select(F.col(right_id).alias("_rid"), F.col(right_geom).alias("_rgeom"),
                     F.explode(SG.st_cell_cover(right[right_geom], res)).alias("_cell"))
    cand = l.join(r, "_cell").drop("_cell")
    if not left_is_points or distance is not None:
        cand = cand.dropDuplicates(["_lid", "_rid"])
    if predicate == "dwithin":
        refined = cand.where(SG.st_dwithin(F.col("_lgeom"), F.col("_rgeom"), distance))
    else:
        pred_udf = getattr(SG, f"st_{predicate}")
        refined = cand.where(pred_udf(F.col("_lgeom"), F.col("_rgeom")))
    return refined.select(F.col("_lid").alias(left_id), F.col("_rid").alias(right_id))


def _left_cells(geom_col, res, distance, is_points):
    if distance is None:
        if is_points:
            return F.array(SG.st_cell(geom_col, res))
        return SG.st_cell_cover(geom_col, res)
    # dwithin: expand by k rings
    h = 180.0 / (1 << res)
    k = int(np.ceil(distance / h))

    import pandas as pd  # noqa: F811
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.ArrayType(T.LongType()))
    def _expand(b: pd.Series) -> pd.Series:
        out = []
        for v in b:
            if v is None:
                out.append(None)
                continue
            g = K_wkb.loads(bytes(v))
            base = K_cell.cover_to_res(K_cell.cover(g, res), res)
            cells = set()
            for c in base:
                cells.update(K_cell.k_ring(int(c), k).tolist())
            out.append(sorted(cells))
        return pd.Series(out, dtype=object)

    return _expand(geom_col)


def spatial_join(left: DataFrame, right: DataFrame, *,
                 predicate: str = "intersects",
                 left_geom: str = "geom", right_geom: str = "geom",
                 left_id: str = "left_id", right_id: str = "right_id",
                 strategy: str = "auto", res: int = 7,
                 distance: float | None = None,
                 broadcast_threshold: int = 200_000) -> DataFrame:
    """Plan chooser: broadcast STRtree when the right side is small
    (counted once — at 100 TB the layer cardinality is metadata),
    else the two-phase cell join."""
    if strategy == "auto":
        strategy = "broadcast" if right.count() <= broadcast_threshold else "cell"
    if strategy == "broadcast":
        joined = broadcast_spatial_join(
            left, right, predicate=predicate, left_geom=left_geom,
            right_geom=right_geom, right_id=right_id, distance=distance)
        return joined.select(F.col(left_id), F.col(right_id))
    return cell_spatial_join(
        left, right, predicate=predicate, left_geom=left_geom,
        right_geom=right_geom, left_id=left_id, right_id=right_id,
        res=res, distance=distance)
