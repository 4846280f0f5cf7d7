"""Constant-array literals as single Catalyst nodes.

``F.array(*[F.lit(x) for x in vals])`` builds a CreateArray node with one
child Literal per element. For the 60-64-element constant arrays the
hashing/similarity folds embed (minhash permutation constants, simhash bit
weights, hyperplane components), those wide subtrees are re-walked by every
analyzer/optimizer rule of every query that contains them — measured
~1.1-1.9 s of driver-side PLANNING per ``with_bucket`` call at ANY data
size (plan-only timing, round 12; the guide's §7.3 "planning itself as the
bottleneck" case). Routing the same values through ``F.lit(numpy.ndarray)``
yields ONE ArrayType Literal node carrying the whole array: same values
bit-for-bit (Python int/float -> numpy int64/float64 -> Catalyst
long/double round-trips exactly), ~3x less planning work on the fold-heavy
plans, zero change to executor-side evaluation semantics.

Only worth it for arrays of tens of elements embedded in hot query paths;
short driver-built arrays (probe widths, split percentiles) stay on the
readable inline form.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


def const_long_array(vals: Iterable[int]) -> Column:
    """One ArrayType(LongType) Literal node holding ``vals``."""
    return F.lit(np.asarray(list(vals), dtype=np.int64))


def const_double_array(vals: Iterable[float]) -> Column:
    """One ArrayType(DoubleType) Literal node holding ``vals``."""
    return F.lit(np.asarray(list(vals), dtype=np.float64))
