"""Geometric aggregations (reference pygeos/set_operations.py §2.7:
union_all, coverage_union_all, intersection_all + total_bounds).

Pattern: partial aggregation per partition, final merge per group —
the distributed analogue of the reference's single balanced
GEOSUnaryUnion over a collection (set_operations.py:365-388).
total_bounds is a plain Catalyst aggregate (no UDF at all,
measurement.py:106-148).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from . import functions as SG
from .kernel import construct as K_con
from .kernel import measure as K_m
from .kernel import wkb as K_wkb


def total_bounds(df: DataFrame, geom_col: str = "geom"):
    """Global (xmin, ymin, xmax, ymax) — native min/max aggregate over
    the st_bounds struct; skips NULL geometries like the reference's
    nan-reduce (measurement.py:134-148)."""
    b = df.select(SG.st_bounds(F.col(geom_col)).alias("_b"))
    row = b.agg(F.min("_b.xmin").alias("xmin"), F.min("_b.ymin").alias("ymin"),
                F.max("_b.xmax").alias("xmax"), F.max("_b.ymax").alias("ymax")).first()
    return (row["xmin"], row["ymin"], row["xmax"], row["ymax"])


def _agg_schema(df: DataFrame, group_col: str) -> T.StructType:
    return T.StructType([
        df.schema[group_col],
        T.StructField("geom", T.BinaryType()),
    ])


def union_all(df: DataFrame, group_col: str, geom_col: str = "geom") -> DataFrame:
    """Per-group geometric union (reference set_operations.py:314-399):
    None rows skipped; all-None group -> NULL geometry.  Overlapping
    polygons dissolve through pairwise Greiner-Hormann union folds;
    non-overlapping inputs and mixed types collect into the tightest
    multi-geometry (kernel.construct.union_all)."""
    def merge(key, pdf):
        geoms = [SG._loads_safe(v) for v in pdf[geom_col]]
        u = K_con.union_all(geoms)
        return pd.DataFrame({group_col: [key[0]], "geom": [K_wkb.dumps(u)]})

    return df.select(group_col, geom_col).groupBy(group_col) \
        .applyInPandas(merge, schema=_agg_schema(df, group_col))


def coverage_union_all(df: DataFrame, group_col: str, geom_col: str = "geom") -> DataFrame:
    """Per-group coverage union (reference set_operations.py:433-471) —
    exact for valid non-overlapping coverages (tiles)."""
    def merge(key, pdf):
        geoms = [SG._loads_safe(v) for v in pdf[geom_col]]
        u = K_con.coverage_union_all([g for g in geoms if g is not None])
        return pd.DataFrame({group_col: [key[0]], "geom": [K_wkb.dumps(u)]})

    return df.select(group_col, geom_col).groupBy(group_col) \
        .applyInPandas(merge, schema=_agg_schema(df, group_col))


def intersection_all(df: DataFrame, group_col: str, geom_col: str = "geom") -> DataFrame:
    """Per-group pairwise-fold intersection (reference
    set_operations.py:133-167 ufunc.reduce semantics); polygon operands
    fold through the convex fast path or the general Greiner-Hormann
    overlay (kernel.construct.intersection); unresolvable degeneracies
    degrade the group to NULL."""
    def merge(key, pdf):
        geoms = [SG._loads_safe(v) for v in pdf[geom_col]]
        geoms = [g for g in geoms if g is not None]
        acc = geoms[0] if geoms else None
        try:
            for g in geoms[1:]:
                acc = K_con.intersection(acc, g)
        except (NotImplementedError, RecursionError):
            acc = None
        return pd.DataFrame({group_col: [key[0]], "geom": [K_wkb.dumps(acc)]})

    return df.select(group_col, geom_col).groupBy(group_col) \
        .applyInPandas(merge, schema=_agg_schema(df, group_col))


def symmetric_difference_all(df: DataFrame, group_col: str, geom_col: str = "geom") -> DataFrame:
    """Per-group pairwise-fold symmetric difference (reference
    set_operations.py:223-257 ufunc.reduce semantics): skip None,
    all-None group -> NULL geometry, single element -> itself."""
    def merge(key, pdf):
        geoms = [SG._loads_safe(v) for v in pdf[geom_col]]
        geoms = [g for g in geoms if g is not None]
        acc = geoms[0] if geoms else None
        try:
            for g in geoms[1:]:
                acc = K_con.symmetric_difference(acc, g)
        except (NotImplementedError, RecursionError):
            acc = None
        return pd.DataFrame({group_col: [key[0]], "geom": [K_wkb.dumps(acc)]})

    return df.select(group_col, geom_col).groupBy(group_col) \
        .applyInPandas(merge, schema=_agg_schema(df, group_col))
