"""Unit pins for the round-4 operator additions: edit-distance fuzzy
dedup (pigeonhole blocking semantics), Bloom semi-join (no false
negatives + real pruning), incremental aggregate maintenance (the
retract/add algebra incl. group-moving updates), and fixed-iteration
PageRank (hand-computed graphs + mass conservation)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_realtime_pipeline_spark.operators import bloom as B
from ecommerce_realtime_pipeline_spark.operators import dedup as DD
from ecommerce_realtime_pipeline_spark.operators import graph as G
from ecommerce_realtime_pipeline_spark.operators.normalize import (
    incremental_agg,
    snapshot_diff,
)


# -- edit_distance_pairs ----------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_editdist_substitution_pairs_always_found(spark):
    """Pigeonhole guarantee: ≤ max_dist SUBSTITUTIONS leave at least
    one of the max_dist+1 segments untouched, so the pair must
    surface — and the emitted distance is the exact Levenshtein."""
    base = "abcdefghijklmnopqrstuvwxyz0123456789abcd"  # 40 chars
    mut = list(base)
    mut[0], mut[12], mut[25] = "X", "Y", "Z"  # 3 substitutions
    out = DD.edit_distance_pairs(
        _docs(spark, [(1, base), (2, "".join(mut))]), max_dist=3
    ).collect()
    assert len(out) == 1
    assert (out[0]["doc_a"], out[0]["doc_b"], out[0]["dist"]) == (1, 2, 3)


def test_editdist_exact_dup_distance_zero(spark):
    out = DD.edit_distance_pairs(
        _docs(spark, [(1, "same text here"), (2, "same text here")])
    ).collect()
    assert [(r["doc_a"], r["doc_b"], r["dist"]) for r in out] == [(1, 2, 0)]


def test_editdist_indel_miss_mode_is_the_documented_one(spark):
    """A LEADING insertion shifts every downstream segment — the
    documented candidate-generation miss (same contract as the
    df-cutoff Jaccard blocker: can lose pairs, never distort a
    distance). This pin makes the limitation explicit; the PassJoin
    positional swap named in the docstring would recover it."""
    base = "abcdefghijklmnopqrstuvwxyz0123456789abcd"
    shifted = "Q" + base[:-1]  # distance 2 (insert + tail change), all segments shifted
    out = DD.edit_distance_pairs(_docs(spark, [(1, base), (2, shifted)])).collect()
    assert out == []  # blocked: no segment agrees → candidate never generated


def test_editdist_far_pair_rejected_by_verify(spark):
    """Shared segment (same first 10 chars) generates the candidate,
    but the exact-Levenshtein verify rejects distance > max_dist."""
    a = "shared-seg" + "a" * 30
    b = "shared-seg" + "z" * 30
    out = DD.edit_distance_pairs(_docs(spark, [(1, a), (2, b)])).collect()
    assert out == []


# -- bloom semi-join --------------------------------------------------------


def test_bloom_no_false_negatives_and_prunes(spark, sf_dir):
    """Every true key passes the probe (bloom ∘ exact ≡ exact), and
    the prefilter really prunes: strictly fewer rows pass the bloom
    than exist, and at least as many as truly match."""
    from ecommerce_realtime_pipeline_spark.catalog import load_table

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    keys = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    n_total = events.count()
    n_exact = events.join(
        keys.select(F.col("c_custkey").alias("user_id")).distinct(),
        "user_id",
        "left_semi",
    ).count()
    pruned = events.crossJoin(F.broadcast(B.bloom_build(keys, "c_custkey"))).filter(
        B.bloom_might_contain("user_id")
    )
    n_bloom = pruned.count()
    n_final = B.bloom_semi_join(
        events, keys, fact_key="user_id", dim_key="c_custkey"
    ).count()
    assert n_final == n_exact  # no false negatives, FPs removed
    assert n_exact <= n_bloom < n_total  # superset of matches, real pruning


def test_bloom_probe_filters_before_semi_join(spark, sf_dir):
    """The Bloom probe must sit as a FILTER below the exact LEFT SEMI
    join (prune-then-join), and the exact join carries no hard-coded
    broadcast — at scale the dim keys are precisely what couldn't be
    broadcast (AQE may still promote small cases at runtime)."""
    from ecommerce_realtime_pipeline_spark.catalog import load_table

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    keys = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    joined = B.bloom_semi_join(events, keys, fact_key="user_id", dim_key="c_custkey")
    optimized = joined._jdf.queryExecution().optimizedPlan().toString()
    # inner (not LeftSemi) on purpose: PushDownLeftSemiAntiJoin would
    # hoist a semi join above the probe and kill the pruning
    join_at = optimized.find("Join Inner")
    probe_at = optimized.find("md5")
    assert join_at != -1 and probe_at != -1 and probe_at > join_at, (
        "probe filter must be BELOW (after, in plan text) the exact join"
    )


def test_bloom_semi_join_with_user_bloom_column(spark):
    """A fact frame that already carries a column literally named
    'bloom' must survive intact: the filter rides an internal
    '__bloom_filter' name, so there is no ambiguity and the user's
    column is not dropped."""
    fact = spark.createDataFrame(
        [(1, "keep-a"), (2, "keep-b"), (99, "keep-c")], "k long, bloom string"
    )
    keys = spark.createDataFrame([(1,), (2,)], "dk long")
    out = B.bloom_semi_join(fact, keys, fact_key="k", dim_key="dk")
    rows = {(r["k"], r["bloom"]) for r in out.collect()}
    assert rows == {(1, "keep-a"), (2, "keep-b")}


def test_hist_quantiles_ignores_nulls(spark):
    """NULL values carry no quantile information: estimates over a
    column with NULLs must equal estimates over the same column with
    the NULLs dropped (the window-walk would otherwise count NULL bins
    first and shift every estimate)."""
    from ecommerce_realtime_pipeline_spark.operators import sketch as SK

    vals = [float(i) for i in range(100)]
    with_nulls = spark.createDataFrame(
        [("g", v) for v in vals] + [("g", None)] * 7, "grp string, v double"
    )
    without = spark.createDataFrame([("g", v) for v in vals], "grp string, v double")
    qs = [0.5, 0.9]
    a = sorted(
        (r["q"], r["approx_value"])
        for r in SK.hist_quantiles(with_nulls, "v", ["grp"], qs).collect()
    )
    b = sorted(
        (r["q"], r["approx_value"])
        for r in SK.hist_quantiles(without, "v", ["grp"], qs).collect()
    )
    assert a == b


# -- incremental_agg --------------------------------------------------------


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, grp string, val double")


def test_incremental_agg_group_moving_update(spark):
    """An update that MOVES a row between groups must retract from the
    old group and add to the new one; deletes can empty a group (it
    drops out), inserts can create one."""
    old = _snap(spark, [(1, "a", 10.0), (2, "a", 5.0), (3, "b", 7.0)])
    new = _snap(spark, [(1, "b", 10.0), (2, "a", 6.0), (4, "c", 1.0)])
    diff = snapshot_diff(old, new, ["k"])
    got = {
        r["grp"]: (r["n_rows"], float(r["sum_val"]))
        for r in incremental_agg(old, new, diff, ["k"], "grp", "val").collect()
    }
    # direct recompute over `new`:
    want = {
        r["grp"]: (r["n"], float(r["s"]))
        for r in new.groupBy("grp")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("val").cast("decimal(18,2)")).alias("s"),
        )
        .collect()
    }
    assert got == want
    assert got["b"] == (1, 10.0)  # moved row landed in b; old b row deleted
    assert "c" in got  # insert created a fresh group


def test_incremental_agg_equals_direct_recompute_on_customer(spark, sf_dir):
    from ecommerce_realtime_pipeline_spark.catalog import load_table

    cust = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    new = cust.filter(k % 7 != 0).unionByName(
        cust.filter(k % 11 == 0).withColumn("c_custkey", k + 500_000)
    )
    diff = snapshot_diff(cust, new, ["c_custkey"])
    inc = {
        r["c_mktsegment"]: (r["n_rows"], str(r["sum_val"]))
        for r in incremental_agg(
            cust, new, diff, ["c_custkey"], "c_mktsegment", "c_acctbal"
        ).collect()
    }
    direct = {
        r["c_mktsegment"]: (r["n"], str(r["s"]))
        for r in new.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("s"),
        )
        .collect()
    }
    assert inc == direct


# -- pagerank ---------------------------------------------------------------


def _edges(spark, pairs):
    sym = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(sorted(set(sym)), "src long, dst long")


def test_pagerank_uniform_on_symmetric_cycle(spark):
    """On a vertex-transitive graph (3-cycle) the rank stays uniform
    1/N at every iteration — any deviation means a deg/contribution
    bug."""
    ranks = {
        r["node"]: r["rank"]
        for r in G.pagerank(_edges(spark, [(1, 2), (2, 3), (3, 1)]), iters=3).collect()
    }
    for v in ranks.values():
        assert v == pytest.approx(1.0 / 3.0, abs=1e-12)


def test_pagerank_reliable_checkpoint_mode_matches_local(spark, monkeypatch):
    """ENGINE_CHECKPOINT_MODE=reliable must swap the materialization
    primitive (Dataset.checkpoint to the SparkContext checkpoint dir —
    the executor-loss-safe path a real cluster needs for long
    iterative jobs) with BIT-IDENTICAL results to the default
    localCheckpoint mode, and must actually write checkpoint data."""
    import os

    edges = _edges(spark, [(1, 2), (2, 3), (3, 1), (1, 3)])
    want = sorted(tuple(r) for r in G.pagerank(edges, iters=3).collect())
    monkeypatch.setenv("ENGINE_CHECKPOINT_MODE", "reliable")
    got = sorted(tuple(r) for r in G.pagerank(edges, iters=3).collect())
    assert got == want
    ckpt_dir = spark.sparkContext.getCheckpointDir()
    assert ckpt_dir is not None  # materialize() auto-assigned one
    local = ckpt_dir.removeprefix("file:")
    assert any(os.scandir(local))  # reliable blocks actually on disk


def test_pagerank_star_center_dominates_and_mass_conserved(spark):
    """Star K1,4: the hub must outrank every leaf, leaves are
    symmetric-equal, and (no dangling nodes on a symmetrized edge
    list) total mass stays 1."""
    ranks = {
        r["node"]: r["rank"]
        for r in G.pagerank(
            _edges(spark, [(0, 1), (0, 2), (0, 3), (0, 4)]), iters=3
        ).collect()
    }
    assert ranks[0] > max(ranks[i] for i in (1, 2, 3, 4))
    leaf_vals = {round(ranks[i], 12) for i in (1, 2, 3, 4)}
    assert len(leaf_vals) == 1
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)


# -- Misra-Gries heavy hitters ----------------------------------------------


def test_mg_summary_bounded_and_heavy_key_survives(spark):
    """High-cardinality input with one planted heavy key: summaries
    stay ≤ capacity rows per partition (eviction really happens:
    capacity ≪ distinct keys) and the heavy key survives in some
    partition — the pigeonhole guarantee the exact recount relies on."""
    from ecommerce_realtime_pipeline_spark.operators import sketch as SK

    base = spark.range(0, 20_000).select((F.col("id") % 5000).alias("k"))
    heavy = spark.range(0, 4_000).select(F.lit(-1).cast("long").alias("k"))
    df = base.unionByName(heavy).repartition(4)
    summ = SK.mg_partition_summaries(df, "k", capacity=32).collect()
    assert len(summ) <= 4 * 32
    assert -1 in {r["k"] for r in summ}  # count 4000 > 24000/33 ≈ 727


def test_mg_exact_topk_partitioning_invariant_with_certificate(spark, sf_dir):
    """The full operator returns the TRUE top-k on the planted-skew
    corpus for any partitioning, and the certificate (k-th count >
    N/(capacity+1)) actually holds — the condition under which the
    MG candidate set provably covers the top-k."""
    from ecommerce_realtime_pipeline_spark.catalog import load_table
    from ecommerce_realtime_pipeline_spark.operators import sketch as SK

    events = load_table(spark, sf_dir, "events").select("user_id")
    hot = events.filter(F.col("user_id") < 8)
    corpus = events.unionByName(hot).unionByName(hot).unionByName(hot)
    true_top = [
        (r["user_id"], r["n"])
        for r in corpus.groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "user_id")
        .limit(5)
        .collect()
    ]
    n_total = corpus.count()
    assert true_top[-1][1] > n_total / 65  # the certificate, capacity=64
    for parts in (1, 16):
        got = [
            (r["user_id"], r["n_rows"])
            for r in SK.heavy_hitters_exact(
                corpus.repartition(parts), "user_id", k=5, capacity=64
            ).collect()
        ]
        assert got == true_top, parts


# -- grouped top-k heap path ------------------------------------------------


def test_grouped_topk_heap_equals_window_form(spark, sf_dir):
    """The per-partition-heap scale path must reproduce the window
    form row-for-row (candidates provably cover the true top-k), for
    any partitioning of the aggregated frame."""
    from ecommerce_realtime_pipeline_spark.plans.kpi import (
        top_products_per_nation,
        top_products_per_nation_heap,
    )

    win = sorted(tuple(r) for r in top_products_per_nation(spark, sf_dir).collect())
    heap = sorted(
        tuple(r) for r in top_products_per_nation_heap(spark, sf_dir).collect()
    )
    assert win == heap


def test_grouped_topk_candidates_bounded_and_covering(spark):
    """Candidates per (partition, group) are capped at k and always
    include the group's global top-k rows."""
    from ecommerce_realtime_pipeline_spark.operators.sketch import (
        grouped_topk_candidates,
    )

    df = (
        spark.range(0, 10_000)
        .select(
            (F.col("id") % 7).alias("g"),
            F.col("id").alias("v"),
        )
        .repartition(8)
    )
    cands = grouped_topk_candidates(df, "g", ["v"], [False], 3).collect()
    assert len(cands) <= 8 * 7 * 3
    got = {(r["g"], r["v"]) for r in cands}
    # true top-3 per group: the 3 largest ids congruent to g mod 7
    for g in range(7):
        top = sorted((v for v in range(10_000) if v % 7 == g), reverse=True)[:3]
        for v in top:
            assert (g, v) in got, (g, v)


def test_peel_dense_subgraph_isolates_clique(spark):
    """K4 with a pendant chain: round 1 peels the chain (below-average
    degrees), leaving the clique as the densest round (density 1.5 >
    1.3333); the regular K4 then peels to empty (all degrees equal the
    average), and empty rounds report 0/0/NULL."""
    from ecommerce_realtime_pipeline_spark.operators.graph import (
        peel_dense_subgraph,
    )

    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(k4 + [(4, 5), (5, 6)], "u long, v long")
    rows = {r["round"]: r for r in peel_dense_subgraph(edges, rounds=3).collect()}
    assert (rows[0]["n_nodes"], rows[0]["n_edges"]) == (6, 8)
    assert (rows[1]["n_nodes"], rows[1]["n_edges"]) == (4, 6)
    assert rows[1]["density"] == 1.5
    assert (rows[2]["n_nodes"], rows[2]["n_edges"]) == (0, 0)
    assert rows[2]["density"] is None
    best = max(rows.values(), key=lambda r: r["density"] or -1)
    assert best["round"] == 1


@pytest.mark.parametrize("k,n_bg", [(8, 60), (12, 120)])
def test_peel_recovers_planted_clique(spark, k, n_bg):
    """Planted-community property (beyond the trajectory oracle): a
    K_k clique hidden in a sparse path background must survive the
    first peel EXACTLY — the round-1 stats are the clique's
    (k, k(k-1)/2, (k-1)/2) — and, being (k-1)-regular, peel to empty
    the round after (the documented regular-graph behavior). Pins the
    all-integer keep test d*N > 2*E on a graph where the answer is
    known by construction, not replayed from the same expressions."""
    clique = [
        (i, j) for i in range(k) for j in range(i + 1, k)
    ]
    # background: a path over nodes 1000..1000+n_bg (degrees <= 2,
    # disjoint from the clique)
    path = [(1000 + i, 1000 + i + 1) for i in range(n_bg)]
    edges = spark.createDataFrame(clique + path, "u long, v long")
    rows = {r["round"]: r for r in G.peel_dense_subgraph(edges, rounds=3).collect()}
    n0, e0 = k + n_bg + 1, len(clique) + n_bg
    assert (rows[0]["n_nodes"], rows[0]["n_edges"]) == (n0, e0)
    # round 1: background gone (path degrees 1-2 are <= average), the
    # clique intact — requires (k-1)*N > 2E for clique nodes and
    # 2*N <= 2E for path nodes, true for these parameterizations
    assert (k - 1) * n0 > 2 * e0 and 2 * n0 <= 2 * e0
    assert (rows[1]["n_nodes"], rows[1]["n_edges"]) == (k, k * (k - 1) // 2)
    assert rows[1]["density"] == round((k - 1) / 2, 4)
    # round 2: a regular graph peels to empty
    assert (rows[2]["n_nodes"], rows[2]["n_edges"]) == (0, 0)
    assert rows[2]["density"] is None
