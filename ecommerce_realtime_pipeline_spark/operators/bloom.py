"""Bloom-filter semi-join pruning — the scan-side prefilter for joins
whose build side is too big to broadcast as an exact key set but whose
KEY FINGERPRINT fits in kilobytes.

At 100 TB the canonical shape is: fact table (events) semi-joined to a
filtered dimension subset (customers in one segment). Broadcasting the
exact key set works until the subset is tens of millions of keys; a
Bloom filter compresses it to m bits at a bounded false-positive rate
(k=4, m/n≈16 → ~0.24% FP), so the fact scan drops ~all non-matching
rows BEFORE the shuffle/join, and the exact join only pays for matches
plus the FP trickle. Spark's own runtime row-group pruning
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) does this
opportunistically; this operator makes it an explicit, testable plan
step with engine-portable hashing.

Design:
- The filter is ONE ROW: a ``map<bigint, bigint>`` of 64-bit words
  (word_idx → bits), built with a single distinct-positions shuffle and
  ``bit_or``. Probing is O(k) per row — ``element_at`` on the word map
  + shift/mask — all codegen'd expressions, no UDF.
- Hashes are md5-derived (first 8 hex chars → int, one per salt), the
  same engine-portable scheme as the MinHash/SimHash family, and the
  build and probe sides are generated from ONE expression template so
  they can never disagree (a Bloom filter has no false negatives ONLY
  if both sides hash identically).
- Correctness contract: bloom-prune → exact semi-join ≡ plain
  semi-join (false positives are removed by the exact join; false
  negatives are impossible). The driver oracle for
  ``events_bloom_semijoin`` is therefore the PLAIN semi-join SQL — a
  result-invariance proof, same pattern as the salted-join query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default filter geometry: 8192 bits / 4 hashes ≈ 0.24% FP at n=512
#: keys (m/n=16). Size m ~ 16-20 bits per expected key at 100 TB.
BLOOM_M = 8192
BLOOM_K = 4

#: internal name for the 1-row filter column — '_'-prefixed like every
#: other internal column so it can never collide with (or silently
#: shadow) a fact column named "bloom".
BLOOM_COL = "__bloom_filter"


def _hash_sql(key_sql: str, salt: int, m: int) -> str:
    """Engine-portable position hash: first 8 md5 hex chars of
    ``key:salt`` as an integer, mod m. ONE template shared by build and
    probe — identical text on both sides is what guarantees the
    no-false-negative property."""
    return (
        f"pmod(CAST(conv(substr(md5(concat(CAST({key_sql} AS STRING), "
        f"':{salt}')), 1, 8), 16, 10) AS BIGINT), {m}L)"
    )


def bloom_build(
    keys: DataFrame, key_col: str, m: int = BLOOM_M, k: int = BLOOM_K
) -> DataFrame:
    """Build the 1-row Bloom frame ``(bloom: map<bigint,bigint>)`` over
    ``keys[key_col]``: k md5 positions per key → distinct → pack into
    64-bit words with ``bit_or``. One narrow shuffle of ≤ n·k ints,
    then a ≤ m/64-row fold to one row."""
    pos_arr = F.array(*[F.expr(_hash_sql(key_col, i, m)) for i in range(k)])
    pos = keys.select(F.explode(pos_arr).alias("p")).distinct()
    words = (
        pos.selectExpr("p DIV 64 AS w", "shiftleft(1L, CAST(p % 64 AS INT)) AS b")
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("word"))
    )
    return words.agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("w", "word")))
        ).alias(BLOOM_COL)
    )


def bloom_might_contain(
    key_col: str, bloom_col: str = BLOOM_COL, m: int = BLOOM_M, k: int = BLOOM_K
) -> Column:
    """Probe predicate: all k positions set. Pure expressions
    (element_at + shift/mask), codegen'd, O(k) per row."""
    conds = []
    for i in range(k):
        h = _hash_sql(key_col, i, m)
        conds.append(
            f"((shiftright(coalesce(element_at({bloom_col}, ({h}) DIV 64), 0L), "
            f"CAST(({h}) % 64 AS INT)) & 1L) = 1L)"
        )
    return F.expr(" AND ".join(conds))


def bloom_semi_join(
    fact: DataFrame,
    dim_keys: DataFrame,
    fact_key: str,
    dim_key: str,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """Bloom-pruned exact semi-join: prefilter ``fact`` rows through
    the Bloom filter over ``dim_keys[dim_key]``, then exact LEFT SEMI
    join to remove false positives. Result ≡ plain semi-join (proved by
    the invariance oracle); the win is that at scale the Bloom filter
    is kilobytes where the exact key set is gigabytes, and the fact
    scan discards non-matches before any shuffle.

    The exact join carries NO broadcast hint on purpose: in the regime
    this operator exists for, the dim key set is exactly what could
    NOT be broadcast — the FP-removal join is a shuffle join of the
    (bloom-pruned, now small) fact side against the keys, and when the
    keys DO fit, AQE promotes it to a broadcast at runtime on its own.
    Hard-coding the hint would reintroduce the gigabyte broadcast the
    filter replaces.

    The verify step is an INNER join against the DISTINCT key set
    (row-equivalent to a semi-join) rather than a LEFT SEMI, because
    Catalyst's ``PushDownLeftSemiAntiJoin`` rule would push a semi
    join BELOW the bloom probe — running the full-fact shuffle first
    and demoting the filter to dead weight. Inner joins are not
    subject to that rule, so prune-then-join survives optimization
    (pinned in tests on the optimized plan)."""
    bloom = bloom_build(dim_keys, dim_key, m, k)
    pruned = fact.crossJoin(F.broadcast(bloom)).filter(
        bloom_might_contain(fact_key, BLOOM_COL, m, k)
    )
    exact = dim_keys.select(F.col(dim_key).alias(fact_key)).distinct()
    return pruned.drop(BLOOM_COL).join(exact, fact_key, "inner")
