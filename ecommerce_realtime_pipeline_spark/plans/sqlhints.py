"""DuckDB CTE materialization hints for the oracle suite.

DuckDB inlines plain CTEs at every reference site. That is usually
right, but two oracle patterns make inlining catastrophic:

- a CTE referenced from BOTH sides of a self-join (the shingle table
  in every Jaccard oracle) is computed twice;
- a CTE referenced inside a RECURSIVE CTE's recursive term (the edge
  list in the connected-components oracles) is recomputed EVERY
  iteration — the 12 s cluster oracles spent >80% of their time
  re-running the shingle self-join per propagation round.

``AS MATERIALIZED`` pins each CTE to compute-once semantics (identical
results, DuckDB docs: purely an optimizer fence). We apply it to every
CTE in every oracle: at oracle scale (sf0.01) a needlessly-materialized
small CTE costs microseconds, while a re-inlined big one costs seconds
— measured: the 4 cluster oracles 12-14 s → <2 s each, the Jaccard
family ~4.6 s → ~2.5 s.

Skipped: genuinely self-recursive CTEs (MATERIALIZED is invalid there)
and SQL-standard ``WINDOW w AS (...)`` clauses, which share the
``name AS (`` shape but are not CTEs.
"""

from __future__ import annotations

import re

# CTE definition site: identifier + AS + open paren. The identifier is
# captured so we can inspect what precedes it.
_CTE_DEF = re.compile(r"\b(\w+)(\s+AS\s*)\(", re.IGNORECASE)

#: names of genuinely self-recursive CTEs across the oracle suite —
#: the only ones where MATERIALIZED would be rejected. (`reach` is the
#: reachability fixpoint in the connected-components oracles.)
_RECURSIVE_CTES = frozenset({"reach"})


def materialize_ctes(sql: str) -> str:
    """Rewrite every CTE definition ``name AS (`` to
    ``name AS MATERIALIZED (`` except self-recursive CTEs and named
    WINDOW clauses. Idempotent (already-hinted SQL passes through)."""
    out = []
    last = 0
    for m in _CTE_DEF.finditer(sql):
        name = m.group(1)
        prefix = sql[: m.start()].rstrip()
        if (
            name.lower() in _RECURSIVE_CTES
            or name.upper() == "MATERIALIZED"  # already hinted
            or prefix.upper().endswith("WINDOW")  # named window, not CTE
        ):
            continue
        out.append(sql[last : m.end(2)])
        out.append("MATERIALIZED (")
        last = m.end()
    out.append(sql[last:])
    return "".join(out)


def materialize_all(oracles: dict[str, str]) -> dict[str, str]:
    """Apply :func:`materialize_ctes` to every oracle in a dict."""
    return {name: materialize_ctes(sql) for name, sql in oracles.items()}
