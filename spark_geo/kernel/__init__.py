"""NumPy geometry kernels — the per-Arrow-batch compute layer.

No Spark imports here: everything is testable standalone (mirrors the
reference's test strategy of exercising ufuncs on plain arrays,
SURVEY.md §5 step 1).
"""

from .geom import Geom  # noqa: F401
from . import (wkb, wkt, measure, predicates, construct, strtree, cell,  # noqa: F401
               linear, unary)
