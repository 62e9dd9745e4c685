#!/usr/bin/env python
"""Generate the driver-window rotation for ``__spark_entry__.queries()``.

The external driver verifies the FIRST 50 registered queries each
round, so registration order IS the verification rotation. Rewriting
the dict by hand at 189+ queries is error-prone (round-8 verdict task
7), so this tool derives the order mechanically:

1. Fold every ``CORRECTNESS_r*.json`` into a latest-evidence map
   (query -> last round with a driver row, plus whether it was green).
2. Order the window: never-driver-checked queries FIRST (they need
   evidence most), then everything else OLDEST EVIDENCE FIRST;
   queries named via ``--new`` (registered this round, no evidence by
   construction) are placed at the END of the non-streaming window
   instead of the front, per the verdict's "window tail" placement.
3. Apply the two standing layout constraints inside the window:
   - WARMERS_BEFORE: a dependent never precedes its session-memo
     warmer (ANN artifact reuse keeps the window cheap);
   - streaming/monitoring fixtures close the window, so a wall-budget
     cut costs the fewest rows.
4. The tail (positions 51+) is everything else, oldest evidence
   first, so the NEXT rotation can slice from the top.

WRITES the generated registration-order module
(``ecommerce_realtime_pipeline_spark/plans/_registry_order.py``) that
``__spark_entry__.queries()`` resolves at import time — so a rotation
is a ONE-FILE diff and hand-edits of the 200+-entry ordering are
impossible (round-10 verdict task 8). A per-round evidence summary
goes to stderr. Pass ``--force-window name ...`` to pin specific
queries into the window regardless of age (e.g. rows whose code
changed this round); ``--freeze`` re-emits the CURRENT live order
unchanged (the refactor/migration path, no rotation); ``--stdout``
prints the module instead of writing it."""

from __future__ import annotations

import argparse
import glob
import inspect
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50

#: session-memo warmers: key must precede any of its dependents that
#: share the window (the dependents reuse the warmer's cached ANN
#: artifacts — quantizer cells, PQ codebooks)
WARMERS_BEFORE = {
    "emb_knn_ivf": [
        "emb_knn_ivf_persisted",
        "emb_knn_ivfpq",
        "emb_semdedup",
        "emb_knn_same_label",
        "emb_recall_vs_probes",
        "emb_ann_recall",
    ],
    "emb_pq_codes": ["emb_knn_pq", "emb_knn_ivfpq"],
}

#: fixtures that should CLOSE the window (micro-batch machinery and
#: end-to-end pipelines — the most wall-expensive rows)
_CLOSERS = re.compile(r"^(streaming_|monitoring_|pipeline_)")


def fold_evidence() -> dict[str, tuple[int, bool]]:
    """query -> (latest round with a driver row, green on that row)."""
    out: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r0*(\d+)", path).group(1))
        with open(path) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            green = bool(
                row.get("err") is None
                and row.get("rows_match")
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
            )
            out[name] = (rnd, green)
    return out


#: the five plan modules a registration ref may name (alias -> module)
ALIAS_MODULES = {
    "kpi": "ecommerce_realtime_pipeline_spark.plans.kpi",
    "dq": "ecommerce_realtime_pipeline_spark.plans.dq",
    "llm": "ecommerce_realtime_pipeline_spark.plans.llm",
    "gen": "ecommerce_realtime_pipeline_spark.plans.gen",
    "temporal": "ecommerce_realtime_pipeline_spark.plans.temporal",
}


def registry() -> dict[str, str]:
    """name -> 'module_alias.func' from the live registry."""
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry  # noqa: PLC0415

    alias = {mod: a for a, mod in ALIAS_MODULES.items()}
    out = {}
    for name, fn in entry.queries().items():
        out[name] = f"{alias.get(fn.__module__, fn.__module__)}.{fn.__name__}"
    return out


def validate_ref(ref: str) -> str | None:
    """Reject a ``--register`` ref at WRITE time instead of letting a
    typo ('lllm.foo', 'llm.nonexistent') land in the generated
    ``_registry_order.py`` and only surface as a KeyError the next
    time ``__spark_entry__.queries()`` imports — after the one-file
    diff was already committed (r11 driver ADVICE). Returns an error
    message, or None when the alias is a known plan module and the
    function exists there and is callable."""
    import importlib

    alias, _, func = ref.partition(".")
    mod_name = ALIAS_MODULES.get(alias)
    if mod_name is None:
        return (
            f"unknown module alias {alias!r} (known: "
            f"{sorted(ALIAS_MODULES)})"
        )
    sys.path.insert(0, REPO)
    mod = importlib.import_module(mod_name)
    fn = getattr(mod, func, None)
    if not callable(fn):
        return f"{mod_name} has no callable {func!r}"
    # callable is not enough (r12 ADVICE): imported helpers
    # (`load_table`, `F`), classes, and sibling-module functions are
    # all callable attributes of a plan module — require the ref to
    # resolve to a FUNCTION the aliased module itself defines, so a
    # wrong-but-callable ref fails here, not at driver run time
    if not inspect.isfunction(fn):
        return f"{mod_name}.{func} is not a plain function ({type(fn).__name__})"
    if fn.__module__ != mod_name:
        return (
            f"{mod_name}.{func} is imported from {fn.__module__} — "
            "register the query under its defining module's alias"
        )
    return None


def order_window(names: list[str]) -> list[str]:
    """Apply the in-window layout constraints: closers last, warmers
    before their in-window dependents (stable otherwise)."""
    body = [n for n in names if not _CLOSERS.match(n)]
    closers = [n for n in names if _CLOSERS.match(n)]
    for warmer, deps in WARMERS_BEFORE.items():
        if warmer not in body:
            continue
        first_dep = min(
            (body.index(d) for d in deps if d in body), default=None
        )
        if first_dep is not None and body.index(warmer) > first_dep:
            body.remove(warmer)
            body.insert(first_dep, warmer)
    return body + closers


def plan_rotation(
    ev: dict[str, tuple[int, bool]],
    reg: dict[str, str],
    new: list[str] | tuple[str, ...] = (),
    forced: list[str] | tuple[str, ...] = (),
) -> tuple[list[str], list[str]]:
    """The rotation itself: (window, tail). Never-driver-checked
    queries head the window, then oldest evidence first; ``new``
    names (registered this round) go at the window tail before the
    closers; ``forced`` names are pinned into the window regardless
    of evidence age. Names absent from ``reg`` are ignored (callers
    warn), and ``new`` names are excluded from the aged list so a
    name can never be emitted twice."""
    pos = {n: i for i, n in enumerate(reg)}
    new = [n for n in new if n in reg]
    never = [n for n in reg if n not in ev and n not in new]
    aged = sorted(
        (n for n in reg if n in ev and n not in new),
        key=lambda n: (ev[n][0], pos[n]),
    )
    forced = [n for n in forced if n in reg and n not in new]
    head = never + [n for n in forced if n not in never]
    rest = [n for n in aged if n not in head]
    # clamp at 0: with more never-checked names than WINDOW slots
    # (early rounds), a negative take would NEGATIVE-SLICE rest and
    # silently drag nearly every aged name into the window
    take = max(0, WINDOW - len(head) - len(new))
    window = order_window(head + rest[:take] + new)
    tail = rest[take:]
    return window, tail


def window_summary(
    window: list[str], ev: dict[str, tuple[int, bool]], rnd: int
) -> str:
    """The canonical one-line window composition — emitted into the
    queries() docstring AND recomputed by the registry-matches-live
    test, so the narrative can't drift from the generated order."""
    by_round: dict[int, int] = {}
    for n in window:
        r = ev.get(n, (0, False))[0]
        by_round[r] = by_round.get(r, 0) + 1
    parts = [
        f"{c} never-checked" if r == 0 else f"{c} r{r}-evidence"
        for r, c in sorted(by_round.items())
    ]
    return f"round-{rnd} window: " + " + ".join(parts)


def next_round(ev: dict[str, tuple[int, bool]]) -> int:
    """The round this rotation is FOR: one past the newest folded
    driver artifact (0 evidence files -> round 1)."""
    return max((r for r, _ in ev.values()), default=0) + 1


#: where the generated registration-order module lives
MODULE_PATH = os.path.join(
    REPO, "ecommerce_realtime_pipeline_spark", "plans", "_registry_order.py"
)


def render_module(
    window: list[str],
    tail: list[str],
    ev: dict[str, tuple[int, bool]],
    reg: dict[str, str],
    rnd: int,
) -> str:
    """The full source of ``plans/_registry_order.py``: the ordered
    (name, 'module_alias.function') registration list plus the
    narrative block ``__spark_entry__`` appends to the queries()
    docstring — both derived from the same rotation, so neither can
    drift from the other."""
    summary = window_summary(window, ev, rnd)
    n_never_tail = sum(1 for n in tail if n not in ev)
    tail_desc = (
        f"{len(tail)} driver-green rows"
        if not n_never_tail
        else (
            f"{len(tail)} rows ({len(tail) - n_never_tail} driver-green, "
            f"{n_never_tail} never-checked late registrations)"
        )
    )
    narrative = (
        f"{summary}; tail = {tail_desc}, oldest\n"
        "    evidence first, so the next rotation can slice from the top.\n"
        "    Head of the window: " + ", ".join(window[:3]) + "."
    )
    lines = [
        '"""Driver registration order — GENERATED by',
        "``tools/rotate_window.py``; regenerate, don't hand-edit.",
        "",
        "``__spark_entry__.queries()`` resolves this list at import time,",
        "so registration order (the driver's 50-query sampling window)",
        "lives in exactly one generated file and a rotation is a one-file",
        'diff."""',
        "",
        "from __future__ import annotations",
        "",
        f"#: the driver checks the FIRST {WINDOW} entries each round",
        f"WINDOW = {WINDOW}",
        "",
        "#: generated narrative appended to the queries() docstring (and",
        "#: re-derived by tests/test_rotate_window.py, so it can't drift",
        "#: from the order below)",
        f"NARRATIVE = {narrative!r}",
        "",
        "#: (query name, 'module_alias.function') in driver sampling order",
        "REGISTRY_ORDER: list[tuple[str, str]] = [",
        "    # ---- positions 1-50: THE CHECK WINDOW ----",
    ]
    for n in window:
        r = ev.get(n, (None, None))[0]
        note = f"  # evidence: r{r}" if r else "  # NEW — no driver evidence yet"
        lines.append(f'    ("{n}", "{reg[n]}"),{note}')
    lines.append(
        "    # ---- positions 51+: driver-green tail, oldest evidence first ----"
    )
    for n in tail:
        r = ev.get(n, (None, None))[0]
        note = f"  # evidence: r{r}" if r else "  # NEW — no driver evidence yet"
        lines.append(f'    ("{n}", "{reg[n]}"),{note}')
    lines.append("]")
    return "\n".join(lines) + "\n"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--new", nargs="*", default=[], help="queries registered this round: placed at the window tail (before closers), not the front")
    ap.add_argument("--force-window", nargs="*", default=[], help="pin these into the window regardless of evidence age")
    ap.add_argument("--round", type=int, default=None, help="round number for the docstring block (default: newest CORRECTNESS round + 1)")
    ap.add_argument("--freeze", action="store_true", help="re-emit the CURRENT live order unchanged (migration/no-op path)")
    ap.add_argument("--stdout", action="store_true", help="print the generated module instead of writing it")
    ap.add_argument("--register", nargs="*", default=[], help="NEW registrations as name=alias.func, appended to the registry before planning (registration is generated too, so brand-new plan functions enter here; combine with --freeze for post-rotation dict-tail additions, or with --new for window-tail placement in a rotation)")
    args = ap.parse_args()

    ev = fold_evidence()
    reg = registry()
    for spec in args.register:
        name, _, ref = spec.partition("=")
        if not ref or "." not in ref:
            print(f"ERROR: --register wants name=alias.func, got {spec!r}", file=sys.stderr)
            return 2
        err = validate_ref(ref)
        if err:
            print(f"ERROR: --register {spec!r}: {err}", file=sys.stderr)
            return 2
        if name in reg:
            print(f"WARNING: --register {name} already registered; ignored", file=sys.stderr)
            continue
        reg[name] = ref
    missing = [n for n in ev if n not in reg]
    if missing:
        print(f"WARNING: evidence for unregistered queries: {missing}", file=sys.stderr)
    # --new / --force-window names must exist in the registry (a typo
    # would otherwise silently shrink the window)
    unknown = [n for n in [*args.new, *args.force_window] if n not in reg]
    if unknown:
        print(f"WARNING: not in registry, ignored: {unknown}", file=sys.stderr)
    red = [n for n in reg if n in ev and not ev[n][1]]
    if red:
        print(f"WARNING: latest driver verdict RED for: {red}", file=sys.stderr)

    if args.freeze:
        names = list(reg)
        window, tail = names[:WINDOW], names[WINDOW:]
    else:
        window, tail = plan_rotation(ev, reg, args.new, args.force_window)
    rnd = args.round if args.round is not None else next_round(ev)
    summary = window_summary(window, ev, rnd)
    print(f"window={len(window)} tail={len(tail)} {summary}", file=sys.stderr)

    src = render_module(window, tail, ev, reg, rnd)
    if args.stdout:
        print(src, end="")
    else:
        with open(MODULE_PATH, "w") as fh:
            fh.write(src)
        print(f"wrote {os.path.relpath(MODULE_PATH, REPO)}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
