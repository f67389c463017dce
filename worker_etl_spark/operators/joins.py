"""Join strategy helpers: explicit skew mitigation.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; ``salted_join`` is the explicit form for when a key's fan-out is
known-pathological (one user/id owning a double-digit percent of a 100 TB
fact table) or when AQE is unavailable (streaming joins, some non-shuffle
plans).

Mechanics: the big side gets a deterministic salt in ``[0, salt)`` derived
by hashing its whole row (spreads one hot key over *salt* reducer
partitions); the small side is exploded ``salt``× so every (key, salt)
bucket still finds its match.  Semantics are EXACTLY a plain inner/left
join — the salt never leaves the operator — which is what the q22 oracle
(a plain SQL join) verifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Join *big* to *small* on key columns *on*, spreading each hot key of
    the big side over *salt* shuffle buckets.  Output columns = plain
    ``big.join(small, on, how)``."""
    if salt < 1:
        raise ValueError("salt must be >= 1")
    big_s = big.withColumn(
        _SALT, F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    small_s = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return big_s.join(small_s, [*on, _SALT], how).drop(_SALT)
