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

def _balanced_end(sql: str, open_paren: int) -> int:
    """Index of the ``)`` that closes the paren at ``open_paren``,
    skipping parens inside '...' string literals ('' escapes net out
    cleanly because each quote just toggles the flag)."""
    depth = 0
    i = open_paren
    in_str = False
    while i < len(sql):
        c = sql[i]
        if c == "'":
            in_str = not in_str
        elif not in_str:
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    return i
        i += 1
    return len(sql) - 1


def _string_spans(sql: str) -> list[tuple[int, int]]:
    """Half-open [start, end) spans of '...' string literals, so CTE
    matches whose text merely *looks* like ``name AS (`` but sits
    inside a literal are never rewritten."""
    spans = []
    start = None
    for i, c in enumerate(sql):
        if c == "'":
            if start is None:
                start = i
            else:
                spans.append((start, i + 1))
                start = None
    if start is not None:
        spans.append((start, len(sql)))
    return spans


def _cte_body_self_references(sql: str, name: str, open_paren: int) -> bool:
    """STRUCTURAL recursion check: scan the balanced-paren CTE body
    starting at ``open_paren`` and report whether it mentions its own
    name — the property that makes MATERIALIZED invalid. Detecting it
    (rather than keeping a name list) means a future recursive CTE
    with any name is exempted automatically, and a non-recursive CTE
    that happens to reuse a recursive one's name still gets the hint."""
    end = _balanced_end(sql, open_paren)
    body = sql[open_paren : end + 1]
    return re.search(rf"\b{re.escape(name)}\b", body[1:]) is not None


def materialize_ctes(sql: str) -> str:
    """Rewrite every CTE definition ``name AS (`` to
    ``name AS MATERIALIZED (`` except self-recursive CTEs (detected
    structurally — the body references its own name) and named WINDOW
    clauses — including every comma-continued name in a
    ``WINDOW a AS (...), b AS (...)`` list, not just the first.
    Matches inside '...' string literals are ignored. Idempotent
    (already-hinted SQL passes through)."""
    in_literal = _string_spans(sql)
    out = []
    last = 0
    # end-of-definition position of the previous exempted WINDOW entry:
    # if only ``,`` + whitespace separates it from the next ``name AS (``
    # match, that match is a continued window name, not a CTE.
    window_cont_from: int | None = None
    for m in _CTE_DEF.finditer(sql):
        if any(s <= m.start() < e for s, e in in_literal):
            continue
        name = m.group(1)
        prefix = sql[: m.start()].rstrip()
        is_window = prefix.upper().endswith("WINDOW") or (
            window_cont_from is not None
            and sql[window_cont_from : m.start()].strip() == ","
        )
        if is_window:
            window_cont_from = _balanced_end(sql, m.end() - 1) + 1
            continue
        window_cont_from = None
        if name.upper() == "MATERIALIZED" or _cte_body_self_references(
            sql, name, m.end() - 1
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
