"""Raster↔vector tile aggregation (north_star first-class operator;
SURVEY.md §2.11).

- vector → raster: per-cell statistics (``tile_stats``) and polygon
  rasterization with exact per-cell area fractions (``rasterize``),
  built on the clip_by_rect kernel (the reference's tiling fast path,
  constructive.py:278-322).
- raster → vector: cell ids back to box polygons
  (``cells_to_polygons``), per-cell coverage dissolve via
  coverage_union_all semantics.
- multi-resolution rollups: parent-cell re-aggregation
  (``tile_rollup``) — plain Catalyst groupBy on st_cell_parent, so
  partial aggregation (map-side combine) applies.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .kernel import cell as K_cell
from .kernel import construct as K_con
from .kernel import measure as K_m
from .kernel import wkb as K_wkb
from . import functions as SG


def assign_cells(df: DataFrame, lon: str, lat: str, res: int,
                 cell_col: str = "cell") -> DataFrame:
    """Add the quad-grid cell id column (vector -> raster keying)."""
    return df.withColumn(cell_col, SG.st_cell_lonlat(F.col(lon), F.col(lat), res))


def tile_stats(df: DataFrame, cell_col: str = "cell", aggs: list | None = None) -> DataFrame:
    """Per-cell aggregation — a plain Catalyst groupBy: map-side
    partial agg + one shuffle on the cell key."""
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    return df.groupBy(cell_col).agg(*aggs)


def tile_rollup(df: DataFrame, parent_res: int, cell_col: str = "cell",
                aggs: list | None = None) -> DataFrame:
    """Re-aggregate tiles at a coarser resolution (multi-resolution
    rollup ≙ groupBy(st_cell_parent))."""
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    return (df.withColumn("parent_cell", SG.st_cell_parent(F.col(cell_col), parent_res))
            .groupBy("parent_cell").agg(*aggs))


def cells_to_polygons(df: DataFrame, cell_col: str = "cell",
                      geom_col: str = "geom") -> DataFrame:
    """raster -> vector: each cell id becomes its box polygon."""
    return df.withColumn(geom_col, SG.st_cell_boundary(F.col(cell_col)))


RASTERIZE_SCHEMA = T.StructType([
    T.StructField("polygon_id", T.LongType()),
    T.StructField("cell", T.LongType()),
    T.StructField("area_frac", T.DoubleType()),
    T.StructField("clipped_wkb", T.BinaryType()),
])


def rasterize(layer: DataFrame, res: int, id_col: str = "polygon_id",
              geom_col: str = "geom") -> DataFrame:
    """vector -> raster: polygon layer to (cell, area fraction,
    clipped geometry) rows.  Runs as mapInPandas over the layer — each
    polygon is independent, so this scales linearly with layer size
    and needs no shuffle."""
    id_pos = layer.columns.index(id_col)
    geom_pos = layer.columns.index(geom_col)

    def run(batches):
        for pdf in batches:
            out = {"polygon_id": [], "cell": [], "area_frac": [], "clipped_wkb": []}
            for pid, wv in zip(pdf.iloc[:, id_pos], pdf.iloc[:, geom_pos]):
                if wv is None:
                    continue
                g = SG._loads_safe(wv)
                if g is None:
                    continue
                total = K_m.area(g)
                if g.is_empty or total <= 0:
                    continue
                cells = K_cell.cover_to_res(K_cell.cover(g, res), res)
                if not len(cells):
                    continue
                xmin, ymin, xmax, ymax = K_cell.cell_bounds(cells)
                for i, c in enumerate(cells):
                    clipped = K_con.clip_by_rect(g, xmin[i], ymin[i], xmax[i], ymax[i])
                    a = K_m.area(clipped)
                    if a <= 0:
                        continue
                    out["polygon_id"].append(int(pid))
                    out["cell"].append(int(c))
                    out["area_frac"].append(a / total)
                    out["clipped_wkb"].append(K_wkb.dumps(clipped))
            yield pd.DataFrame(out)

    return layer.mapInPandas(run, schema=RASTERIZE_SCHEMA)


def dissolve_tiles(df: DataFrame, group_col: str, geom_col: str = "clipped_wkb") -> DataFrame:
    """Per-group coverage union of tile pieces (coverage_union_all
    semantics, reference set_operations.py:433-471): partial union per
    partition, final union per group — the partial+final aggregation
    pattern the reference applies via one GEOSUnaryUnion
    (set_operations.py:365-388)."""
    def merge(key, pdf):
        geoms = [g for v in pdf[geom_col]
                 if (g := SG._loads_safe(v)) is not None]
        u = K_con.coverage_union_all(geoms)
        return pd.DataFrame({group_col: [key[0]],
                             "geom": [K_wkb.dumps(u)],
                             "area": [K_m.area(u)]})

    schema = T.StructType([
        df.schema[group_col],
        T.StructField("geom", T.BinaryType()),
        T.StructField("area", T.DoubleType()),
    ])
    return df.groupBy(group_col).applyInPandas(merge, schema=schema)
