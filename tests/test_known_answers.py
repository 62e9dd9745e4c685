"""Known-answer tests for the newest analytics on CONSTRUCTED corpora:
the expected rows are computed by hand from the operator's published
definition (a-priori support/confidence/lift; 30-min-gap session
paths), so they catch a shared bug that an oracle replay — which runs
the same expressions in a second engine — cannot."""

from __future__ import annotations

import datetime

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


def _write_lineitem(spark, sf, baskets, parts=None):
    rows = [(ok, pk) for ok, items in baskets for pk in items]
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").coalesce(
        1
    ).write.parquet(f"{sf}/lineitem.parquet")
    if parts is not None:
        spark.createDataFrame(
            parts, "p_partkey long, p_brand string"
        ).coalesce(1).write.parquet(f"{sf}/part.parquet")


def test_market_basket_rules_hand_computed(spark, tmp_path):
    """Brand baskets {B1,B2,B3},{B1,B2,B3},{B1,B2},{B3} (each part
    carries a distinct brand, so brand baskets mirror the part
    baskets): the only support-2 triple is (B1,B2,B3); with 4 orders
    the relative floor max(2, ceil(0.0035*4)) = 2, so it passes and
    its three rotations have hand-computable confidence and lift.
    conf((B1,B3)->B2) = conf((B2,B3)->B1) = 2/2 = 1.0 with lift
    2*4/(2*3) = 1.3333; conf((B1,B2)->B3) = 2/3 = 0.6667 with lift
    2*4/(3*3) = 0.8889. Ordering: conf desc, lift desc, then keys."""
    sf = str(tmp_path)
    _write_lineitem(
        spark,
        sf,
        [(1, [1, 2, 3]), (2, [1, 2, 3]), (3, [1, 2]), (4, [3])],
        parts=[(1, "B1"), (2, "B2"), (3, "B3")],
    )
    rows = [tuple(r) for r in QUERIES["market_basket_rules"](spark, sf).collect()]
    assert rows == [
        ("B1", "B3", "B2", 2, 1.0, 1.3333),
        ("B2", "B3", "B1", 2, 1.0, 1.3333),
        ("B1", "B2", "B3", 2, 0.6667, 0.8889),
    ]


def test_session_path_mining_hand_computed(spark, tmp_path):
    """Constructed journeys: user 1 has a converting
    view>click>purchase session and, 2 h later (> the 30-min gap), a
    lone view; users 2 and 3 each have a non-converting view>click
    session. Expected rollup: view>click n=2 conv 0.0; then the two
    singleton paths tie on n_sessions and order by path asc."""
    sf = str(tmp_path)
    t0 = datetime.datetime(2024, 3, 1, 12, 0, 0)

    def ev(eid, user, minutes, typ):
        return (eid, t0 + datetime.timedelta(minutes=minutes), user, typ, 1.0, "{}")

    rows = [
        ev(1, 1, 0, "view"),
        ev(2, 1, 10, "click"),
        ev(3, 1, 20, "purchase"),
        ev(4, 1, 140, "view"),  # 120 min after the purchase: new session
        ev(5, 2, 0, "view"),
        ev(6, 2, 5, "click"),
        ev(7, 3, 0, "view"),
        ev(8, 3, 29, "click"),  # 29 min gap: SAME session (<= 30 min)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(f"{sf}/events.parquet")
    got = [tuple(r) for r in QUERIES["session_path_mining"](spark, sf).collect()]
    assert got == [
        ("view>click", 2, 0, 0.0),
        ("view", 1, 0, 0.0),
        ("view>click>purchase", 1, 1, 1.0),
    ]


def test_events_key_skew_report_hand_computed(spark, tmp_path):
    """Per-key counts (1, 1, 2, 6): n_keys=4, n_rows=10, p50 = 2nd
    order statistic = 1, p99 = 4th = 6, top share 6/10, and the
    grouped-closed-form Gini 2*33/(4*10) - 5/4 = 0.4 (sum i*x_i = 33
    over the sorted counts)."""
    import datetime

    sf = str(tmp_path)
    t0 = datetime.datetime(2024, 3, 1)
    counts = {10: 1, 20: 1, 30: 2, 40: 6}
    rows = []
    eid = 0
    for user, c in counts.items():
        for _ in range(c):
            eid += 1
            rows.append(
                (eid, t0 + datetime.timedelta(minutes=eid), user, "view", 1.0, "{}")
            )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(f"{sf}/events.parquet")
    got = [tuple(r) for r in QUERIES["events_key_skew_report"](spark, sf).collect()]
    assert got == [(4, 10, 1, 6, 6, 0.6, 0.4)]


def test_revenue_seasonality_hand_computed(spark, tmp_path):
    """Monthly revenue 100/200/300: centered 3-month MA with 2-month
    edge frames gives trend 150/200/250 and seasonal index
    0.6667/1.0/1.2."""
    import datetime
    from decimal import Decimal

    sf = str(tmp_path)
    rows = [
        (1, datetime.date(2024, 1, 15), Decimal("100.00")),
        (2, datetime.date(2024, 2, 15), Decimal("200.00")),
        (3, datetime.date(2024, 3, 15), Decimal("300.00")),
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice decimal(12,2)"
    ).coalesce(1).write.parquet(f"{sf}/orders.parquet")
    got = [tuple(r) for r in QUERIES["revenue_seasonality"](spark, sf).collect()]
    assert got == [
        ("2024-01", 100.0, 150.0, 0.6667),
        ("2024-02", 200.0, 200.0, 1.0),
        ("2024-03", 300.0, 250.0, 1.2),
    ]


def test_docs_token_budget_hand_computed(spark, tmp_path):
    """'hello world' = 2 ws / 2 bpe tokens; 'a1b, c-2!' = 2 ws tokens
    but 8 BPE-ish pre-tokens ([a1b,] -> a|1|b|, and [c-2!] -> c|-|2|!),
    so source 'a' budgets (ws 4, bpe 10, inflation 2.5); source 'b'
    with pure words stays at 1.0."""
    sf = str(tmp_path)
    rows = [
        (1, "hello world", "en", "a", 11),
        (2, "a1b, c-2!", "en", "a", 9),
        (3, "three plain words", "en", "b", 17),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")
    got = [tuple(r) for r in QUERIES["docs_token_budget"](spark, sf).collect()]
    assert got == [
        ("a", 2, 4, 10, 2.5),
        ("b", 1, 3, 3, 1.0),
    ]


def test_docs_zipf_fit_hand_computed(spark, tmp_path):
    """Token counts 12/6/4/3 = 12/rank exactly: the log-log OLS must
    return slope -1, intercept ln(12) = 2.4849, R^2 = 1 over 4
    points — a perfect-Zipf corpus by construction."""
    sf = str(tmp_path)
    text = " ".join(["a"] * 12 + ["b"] * 6 + ["c"] * 4 + ["d"] * 3)
    spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")
    got = [tuple(r) for r in QUERIES["docs_zipf_fit"](spark, sf).collect()]
    assert got == [(4, -1.0, 2.4849, 1.0)]


def test_events_markov_attribution_hand_computed(spark, tmp_path):
    """Two journeys (view->purchase, view->click) give P(view->purchase)
    = P(view->click) = 0.5 and first-touch mass all on view, so
    conv_full = 0.5. Removing click/error/signup changes nothing that
    reaches purchase (effect 0.0); removing view kills the only start
    state, so conversion collapses to 0 (effect 1.0) — exercising both
    removal semantics (inbound transitions AND start-state mass) plus
    the absorbing walk, all hand-checkable."""
    import datetime

    sf = str(tmp_path)
    t0 = datetime.datetime(2024, 5, 1, 9, 0, 0)

    def ev(eid, user, minutes, typ):
        return (eid, t0 + datetime.timedelta(minutes=minutes), user, typ, 1.0, "{}")

    rows = [
        ev(1, 1, 0, "view"),
        ev(2, 1, 5, "purchase"),
        ev(3, 2, 0, "view"),
        ev(4, 2, 5, "click"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(f"{sf}/events.parquet")
    got = [
        tuple(r)
        for r in QUERIES["events_markov_attribution"](spark, sf).collect()
    ]
    assert got == [
        ("click", 0.5, 0.5, 0.0),
        ("error", 0.5, 0.5, 0.0),
        ("signup", 0.5, 0.5, 0.0),
        ("view", 0.5, 0.0, 1.0),
    ]
