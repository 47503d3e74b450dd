"""Tests for the corpus-preparation and analytics operators added in
round 2's second half: splits, chunking, cleaning, n-grams, outliers,
equi-depth bins, per-group top-k — the edge behaviors the DuckDB
oracle pass doesn't isolate (empty docs, split stability under corpus
growth, chunk reconstruction, boundary membership)."""

from __future__ import annotations

from pyspark.sql import functions as F

from seqdatapipeline_spark.extensions import corpus as cp
from seqdatapipeline_spark.extensions import textstats as tx
from seqdatapipeline_spark.ops import quality as dq
from seqdatapipeline_spark.ops import windows as win


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# -------------------------------------------------------------- dataset_split

def test_dataset_split_ratios_and_stability(spark):
    small = _docs(spark, [(i, "x") for i in range(500)])
    big = _docs(spark, [(i, "x") for i in range(2000)])
    s_small = {r.doc_id: r.split for r in cp.dataset_split(small).collect()}
    s_big = {r.doc_id: r.split for r in cp.dataset_split(big).collect()}
    # growth stability: the first 500 docs keep their assignment
    assert all(s_big[i] == s_small[i] for i in range(500))
    # rough ratio check on the big corpus
    n_train = sum(1 for v in s_big.values() if v == "train")
    assert 0.7 < n_train / 2000 < 0.9
    assert set(s_big.values()) == {"train", "valid", "test"}


def test_dataset_split_custom_ratios(spark):
    d = _docs(spark, [(i, "x") for i in range(300)])
    out = cp.dataset_split(d, ratios=(("a", 50), ("b", 50))).collect()
    assert set(r.split for r in out) == {"a", "b"}


# ------------------------------------------------------------ chunk_documents

def test_chunk_reconstruction_and_overlap(spark):
    text = "".join(chr(97 + i % 26) for i in range(520))
    d = _docs(spark, [(1, text)])
    chunks = sorted(
        cp.chunk_documents(d, size=200, stride=150).collect(),
        key=lambda r: r.chunk_id,
    )
    # chunk k starts at k*150; consecutive chunks overlap by 50 chars
    assert [r.chunk_id for r in chunks] == [0, 1, 2, 3]
    for r in chunks:
        start = r.chunk_id * 150
        assert r.chunk_text == text[start : start + 200]
    assert chunks[0].chunk_text[150:] == chunks[1].chunk_text[:50]
    # concatenating stride-prefixes + the last chunk rebuilds the doc
    rebuilt = "".join(r.chunk_text[:150] for r in chunks[:-1]) + chunks[-1].chunk_text
    assert rebuilt == text


def test_chunk_empty_and_short_docs(spark):
    d = _docs(spark, [(1, ""), (2, "short")])
    out = {r.doc_id: r for r in cp.chunk_documents(d, size=200, stride=150).collect()}
    assert out[1].chunk_text == "" and out[1].chunk_len == 0
    assert out[2].chunk_text == "short" and out[2].chunk_id == 0


# ----------------------------------------------------------------- clean_text

def test_clean_text_strips_markup(spark):
    d = _docs(spark, [(1, "<p>Hello   <b>world</b>&nbsp;&amp;&lt;tag&gt;</p>")])
    r = tx.clean_text(d).collect()[0]
    assert r.clean_text == 'Hello world &<tag>'
    assert r.n_chars_clean == len(r.clean_text)


def test_clean_text_plain_passthrough(spark):
    d = _docs(spark, [(1, "already clean text")])
    assert tx.clean_text(d).collect()[0].clean_text == "already clean text"


# --------------------------------------------------------------- ngram_counts

def test_bigram_counts_and_short_doc_guard(spark):
    d = _docs(spark, [(1, "a b a b c"), (2, "a"), (3, "")])
    out = {r.gram: r.n for r in cp.ngram_counts(d, n=2, top_n=10).collect()}
    # doc 1 bigrams: "a b","b a","a b","b c"; docs 2/3 contribute none
    assert out == {"a b": 2, "b a": 1, "b c": 1}


def test_trigram_counts(spark):
    d = _docs(spark, [(1, "x y z w")])
    out = {r.gram: r.n for r in cp.ngram_counts(d, n=3, top_n=10).collect()}
    assert out == {"x y z": 1, "y z w": 1}


# ------------------------------------------------------------- anomaly_zscore

def test_anomaly_zscore_flags_only_outliers(spark):
    rows = [(i, "a", 10.0) for i in range(20)] + [(99, "a", 1000.0)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = dq.anomaly_zscore(df, "event_type", "value", threshold=2.5).collect()
    assert [r.event_id for r in out] == [99]
    assert out[0].zscore > 2.5


def test_anomaly_zscore_plan_has_no_window(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0)], "event_id long, event_type string, value double"
    )
    plan = dq.anomaly_zscore(df, "event_type", "value")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan


# ------------------------------------------------------------- equidepth_bins

def test_equidepth_bins_are_equal_depth(spark):
    df = spark.range(1000).select(F.col("id").cast("double").alias("v"))
    out = sorted(dq.equidepth_bins(df, "v", n_bins=10).collect(), key=lambda r: r.bin)
    assert len(out) == 10
    assert all(r.n == 100 for r in out)
    # bins tile the value range in order
    for lo, hi in zip(out, out[1:]):
        assert lo.max_v <= hi.min_v


# ------------------------------------------------------------ top_k_per_group

def test_top_k_per_group_rank_and_ties(spark):
    rows = [("s1", 1, 5.0), ("s1", 2, 9.0), ("s1", 3, 9.0), ("s1", 4, 1.0), ("s2", 9, 2.0)]
    df = spark.createDataFrame(rows, "g string, item long, score double")
    out = win.top_k_per_group(df, ["g"], "score", k=2, tiebreak_cols=["item"]).collect()
    got = {(r.g, r.item, r.rank) for r in out}
    # tie on 9.0 broken by item asc; k=2 cuts item 4
    assert got == {("s1", 2, 1), ("s1", 3, 2), ("s2", 9, 1)}


# ------------------------------------------------------------- gap_fill_daily

def test_gap_fill_inserts_zero_days(spark):
    rows = [
        (1, "a", "2024-01-01 10:00:00"),
        (2, "a", "2024-01-04 10:00:00"),  # 2nd and 3rd missing
        (3, "b", "2024-01-02 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = {(r.event_type, str(r.day)): r.n for r in win.gap_fill_daily(df, "event_type", "ts").collect()}
    assert out[("a", "2024-01-01")] == 1
    assert out[("a", "2024-01-02")] == 0
    assert out[("a", "2024-01-03")] == 0
    assert out[("a", "2024-01-04")] == 1
    # key b spans a single day: no fill beyond its own range
    assert [k for k in out if k[0] == "b"] == [("b", "2024-01-02")]


# -------------------------------------------------------- value_change_points

def test_change_points_flag_jumps_only(spark):
    rows = [
        (1, 7, "2024-01-01 00:00:01", 10.0),
        (2, 7, "2024-01-01 00:00:02", 12.0),   # delta 2: quiet
        (3, 7, "2024-01-01 00:00:03", 90.0),   # delta 78: flagged
        (4, 8, "2024-01-01 00:00:04", 500.0),  # first obs per key: never flagged
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = win.value_change_points(df, "user_id", "ts", "value", "event_id", threshold=50.0).collect()
    assert [(r.event_id, r.delta) for r in out] == [(3, 78.0)]


# -------------------------------------------------------------- token_entropy

def test_token_entropy_uniform_beats_skewed(spark):
    import math

    rows = [(1, "u", "a b c d"), (2, "s", "a a a b")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.source: r for r in cp.token_entropy(df).collect()}
    assert out["u"].vocab_size == 4 and out["u"].n_tokens == 4
    assert abs(out["u"].entropy_nats - math.log(4)) < 1e-6
    skewed = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert abs(out["s"].entropy_nats - skewed) < 1e-6
    assert out["u"].entropy_nats > out["s"].entropy_nats


# ----------------------------------------------------------- event_transitions

def test_event_transitions_counts_and_probs(spark):
    rows = [
        (1, 7, "2024-01-01 00:00:01", "view"),
        (2, 7, "2024-01-01 00:00:02", "cart"),
        (3, 7, "2024-01-01 00:00:03", "view"),
        (4, 7, "2024-01-01 00:00:04", "buy"),
        (5, 8, "2024-01-01 00:00:05", "view"),
        (6, 8, "2024-01-01 00:00:06", "cart"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {(r.from_type, r.to_type): (r.n, r.prob) for r in win.event_transitions(df).collect()}
    # user 7: view->cart, cart->view, view->buy; user 8: view->cart
    assert out[("view", "cart")] == (2, 0.666667)
    assert out[("view", "buy")] == (1, 0.333333)
    assert out[("cart", "view")] == (1, 1.0)
    # no cross-user transition (8's first event never follows 7's last)
    assert ("buy", "view") not in out


# --------------------------------------------------------- weekly_active_users

def test_weekly_active_users_window(spark):
    rows = [
        (1, 100, "2024-01-01 10:00:00"),
        (2, 200, "2024-01-03 10:00:00"),
        (3, 100, "2024-01-09 10:00:00"),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = {str(r.day): r.wau for r in win.weekly_active_users(df).collect()}
    # Jan 3..7: both users' activity within trailing 7 days
    assert out["2024-01-03"] == 2
    assert out["2024-01-07"] == 2
    # Jan 8: user 100's Jan-1 visit aged out, user 200's Jan-3 still in
    assert out["2024-01-08"] == 1
    # Jan 9: both 200 (Jan 3) and 100 (Jan 9) active
    assert out["2024-01-09"] == 2


# ---------------------------------------------------------- quantile_normalize

def test_quantile_normalize_aligns_distributions(spark):
    rows = [
        ("s1", 1, 1, 10.0), ("s1", 2, 1, 20.0), ("s1", 3, 1, 30.0),
        ("s2", 4, 1, 100.0), ("s2", 5, 1, 200.0), ("s2", 6, 1, 300.0),
    ]
    df = spark.createDataFrame(
        rows, "l_suppkey string, l_orderkey long, l_linenumber long, l_extendedprice double"
    )
    out = win.quantile_normalize(
        df, "l_suppkey", "l_extendedprice", ["l_orderkey", "l_linenumber"]
    ).collect()
    by_sample = {}
    for r in out:
        by_sample.setdefault(r.l_suppkey, []).append(r.norm_value)
    # after normalization both samples carry the identical distribution
    assert sorted(by_sample["s1"]) == sorted(by_sample["s2"]) == [55.0, 110.0, 165.0]


# ---------------------------------------------------------------- mad_outliers

def test_mad_outliers_robust_to_contamination(spark):
    # 20 inlier values 1..20 plus one huge spike; mean/std z-score at
    # 3.5 would be dragged by the spike, the MAD score flags only it
    rows = [("a", i, float(v)) for i, v in enumerate(list(range(1, 21)) + [1000])]
    df = spark.createDataFrame(rows, "event_type string, event_id long, value double")
    out = dq.mad_outliers(df, "event_type", "value", threshold=3.5).collect()
    assert [r.value for r in out] == [1000.0]
    # median=11, MAD=5 -> 0.6745*989/5
    assert abs(out[0].mod_zscore - round(0.6745 * 989 / 5, 4)) < 1e-9


def test_mad_outliers_groups_are_independent(spark):
    rows = [("a", i, float(i)) for i in range(10)] + [("b", 100, 1e6)]
    df = spark.createDataFrame(rows, "event_type string, event_id long, value double")
    # group b has a single row: absdev=0, MAD=0 -> 0/0 division is
    # null, which must not be flagged (no false positive, no error)
    out = dq.mad_outliers(df, "event_type", "value", threshold=3.5).collect()
    assert out == []


# ------------------------------------------------------------- winsorize_stats

def test_winsorize_clips_tails_only(spark):
    rows = [("g", float(v)) for v in range(1, 100 + 1)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = dq.winsorize_stats(df, "k", "v", p_low=0.05, p_high=0.95).collect()[0]
    # quantile_cont on 1..100: p05 = 5.95, p95 = 95.05
    assert abs(out.p_low - 5.95) < 1e-9 and abs(out.p_high - 95.05) < 1e-9
    assert out.n_clipped_low == 5 and out.n_clipped_high == 5
    assert out.mean_raw == 50.5
    # clipped mean moves toward the center by the clipped tail mass
    exp = (sum(range(6, 96)) + 5 * 5.95 + 5 * 95.05) / 100
    assert abs(out.mean_winsorized - round(exp, 6)) < 1e-9


# ------------------------------------------------------------- top_event_paths

def test_top_event_paths_orders_by_time_not_arrival(spark):
    rows = [
        (1, 3, "c"), (1, 1, "a"), (1, 2, "b"),   # out-of-order input
        (2, 10, "a"), (2, 11, "b"), (2, 12, "c"), (2, 13, "d"),
        (3, 5, "x"), (3, 6, "y"),                # only 2 events: excluded
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_type string") \
        .withColumn("event_id", F.col("ts"))
    out = {r.path: r.n_users for r in win.top_event_paths(df, depth=3).collect()}
    assert out == {"a>b>c": 2}


# ------------------------------------------------------------------ rule_filter

def test_rule_filter_attribution_columns(spark):
    good = " ".join(["the"] + [f"word{i:02d}" for i in range(30)])  # passes all (mean wl ≈ 5.9)
    short = "the tiny one"                                        # fails len
    nostop = " ".join(f"w{i}" for i in range(30))                 # fails stopword
    repeat = " ".join(["the"] * 5 + ["spam"] * 45)                # fails repeat
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, nostop), (4, repeat)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in tx.rule_filter(df).collect()}
    assert out[1].keep == 1
    assert out[2].keep == 0 and out[2].pass_len == 0 and out[2].pass_stopword == 1
    assert out[3].keep == 0 and out[3].pass_stopword == 0 and out[3].pass_len == 1
    assert out[4].keep == 0 and out[4].pass_repeat == 0
    # repeat ratio: 50 words, 2 distinct -> 0.96
    assert abs(out[4].repeat_ratio - 0.96) < 1e-9


# ------------------------------------------------------------------ url tier
def test_url_normalize_behaviors(spark):
    """The canonicalization contract, case by case: host/scheme case,
    default ports, fragments, trailing slashes, tracking params,
    param ORDER, and NULL propagation."""
    from pyspark.sql import functions as F

    from seqdatapipeline_spark.ops import strings as st

    cases = [
        ("HTTP://WWW.Ex.COM:80/A/b/", "http://www.ex.com/A/b"),
        ("https://ex.com:443/x?b=2&a=1", "https://ex.com/x?a=1&b=2"),
        ("https://ex.com/x?utm_source=t&a=1&fbclid=z#frag", "https://ex.com/x?a=1"),
        ("https://ex.com/x?utm_only=1", "https://ex.com/x"),
        ("https://ex.com:8080/x", "https://ex.com:8080/x"),  # non-default port kept
        ("https://ex.com", "https://ex.com"),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i long, u string"
    )
    got = {
        r["i"]: r["n"]
        for r in df.select("i", st.url_normalize(F.col("u")).alias("n")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, cases[i][0], got[i], want)


def test_url_domain_behaviors(spark):
    from pyspark.sql import functions as F

    from seqdatapipeline_spark.ops import strings as st

    cases = [
        ("HTTP://WWW.Ex.COM:80/a", "ex.com"),
        ("https://sub.ex.com/a?q=1", "sub.ex.com"),
        ("https://ex.com#f", "ex.com"),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i long, u string"
    )
    got = {
        r["i"]: r["d"]
        for r in df.select("i", st.url_domain(F.col("u")).alias("d")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, cases[i][0], got[i], want)


def test_dedup_url_collapses_tracking_variants(spark, sf_dir):
    """dedup_url's premise, asserted directly: every raw URL is
    distinct (doc_id rides the tracking param and fragment) while the
    normalized key collapses to the shared resource."""
    import __spark_entry__ as entrymod

    out = entrymod.queries()["dedup_url"](spark, sf_dir)
    rows = out.collect()
    n_docs_total = sum(r["n_docs"] for r in rows)
    assert len(rows) < n_docs_total  # genuine collapse happened
    assert all(r["keep_id"] is not None for r in rows)


def test_quantile_normalize_nulls_match_avg_semantics(spark):
    """The exact-integer rank-mean must keep avg()'s NULL contract:
    NULL measurements are excluded from BOTH numerator and
    denominator (a [10.00, NULL] rank partition means 10.0, not
    5.0)."""
    from seqdatapipeline_spark.ops import windows as win

    rows = [
        ("s1", 1, 10.00),
        ("s1", 2, 20.00),
        ("s2", 1, None),   # rank-1 partner of s1's 10.00
        ("s2", 2, 30.00),
    ]
    df = spark.createDataFrame(rows, "sample string, k long, v double")
    out = win.quantile_normalize(df, "sample", "v", ["k"])
    got = {(r["sample"], r["rank"]): r["norm_value"] for r in out.collect()}
    # NULL sorts first in s2, taking rank 1; the rank-1 mean over
    # values [10.00, NULL] is 10.0 under avg semantics.
    assert got[("s1", 1)] == 10.0, got
    assert got[("s2", 1)] is None or got[("s2", 1)] == 10.0  # NULL row's own mean column
    assert got[("s1", 2)] == 25.0, got  # mean(20, 30)
    assert got[("s2", 2)] == 25.0, got


def test_url_adversarial_corpus_cross_engine_parity(spark):
    """Every entry of the sweep's adversarial URL corpus (userinfo,
    IDN/punycode + IPv6 hosts, %-encoding case, duplicate keys, //
    runs, bare tracking params, schemeless garbage) must normalize
    IDENTICALLY in the Spark op and the DuckDB oracle fragments —
    the URL tier's oracles are built from these shared strings, so a
    divergence here is a latent external red."""
    import importlib.util as iu

    spec = iu.spec_from_file_location(
        "adversarial_sweep", "/root/repo/scripts/adversarial_sweep.py"
    )
    mod = iu.module_from_spec(spec)
    spec.loader.exec_module(mod)
    diverged = mod._sweep_urls(spark)
    assert diverged == [], diverged


def test_keyed_topk_matches_window_form(spark):
    """keyed_topk (salted two-stage exact top-k) must emit exactly the
    rows and ranks of row_number() OVER (PARTITION BY key ORDER BY v)
    <= k, including keys with fewer than k rows."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from seqdatapipeline_spark.ops.aggregates import keyed_topk

    rows = [("hot", i) for i in range(500)] + [("cold", i) for i in range(3)]
    df = spark.createDataFrame(rows, "k string, v long").repartition(8)
    got = {
        (r.k, r.v, r.rank)
        for r in keyed_topk(df, ["k"], "v", k=5, salt_buckets=4).collect()
    }
    w = Window.partitionBy("k").orderBy("v")
    want = {
        (r.k, r.v, r.rank)
        for r in df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .collect()
    }
    assert got == want
    assert len([1 for k, _, _ in got if k == "cold"]) == 3  # under-full key


def test_robots_filter_behaviors(spark):
    """Prefix semantics, allow-by-default for rule-less domains, and
    the broadcast anti-join shape."""
    from pyspark.sql import functions as F

    from seqdatapipeline_spark.extensions.corpus import robots_filter

    pages = spark.createDataFrame(
        [
            (1, "a.com", "/private/x"),   # dropped: prefix match
            (2, "a.com", "/privateer"),   # kept: '/private/' is not a prefix
            (3, "a.com", "/pub/x"),       # kept
            (4, "b.com", "/private/x"),   # kept: no rules for b.com
            (5, "a.com", ""),             # kept: empty path
        ],
        "doc_id long, domain string, path string",
    )
    rules = spark.createDataFrame(
        [("a.com", "/private/")], "domain string, disallow string"
    )
    out = robots_filter(pages, rules)
    assert {r.doc_id for r in out.collect()} == {2, 3, 4, 5}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_robots_filter_directory_root_and_edge_rules(spark):
    """Compliance-tier property sweep (VERDICT r10 item 6): directory-
    root matching on stripped paths, multiple-rule precedence (any
    match drops), empty-disallow = block-whole-domain, and NULL
    domains/paths pass through (no rule can match NULL)."""
    from seqdatapipeline_spark.extensions.corpus import robots_filter

    pages = spark.createDataFrame(
        [
            # a.com: disallow '/de/' (directory) + '' (none here)
            (1, "a.com", "/de/x"),    # dropped: prefix
            (2, "a.com", "/de"),      # dropped: directory-root (stored
            #                           stripped form of '/de/')
            (3, "a.com", "/dex"),     # kept: not a path-segment match
            (4, "a.com", "/fr/x"),    # dropped by the second rule
            (5, "a.com", "/en/x"),    # kept
            # b.com: empty disallow blocks the whole domain (callers
            # encode robots' empty-Disallow-means-allow by omitting
            # the rule; an empty PREFIX can only mean match-all)
            (6, "b.com", "/anything"),  # dropped
            (7, "b.com", ""),           # dropped
            # NULL domain / NULL path: no rule can match, kept
            (8, None, "/de/x"),
            (9, "a.com", None),
        ],
        "doc_id long, domain string, path string",
    )
    rules = spark.createDataFrame(
        [("a.com", "/de/"), ("a.com", "/fr/"), ("b.com", "")],
        "domain string, disallow string",
    )
    kept = {r.doc_id for r in robots_filter(pages, rules).collect()}
    assert kept == {3, 5, 8, 9}


def test_robots_filter_null_rule_rows_match_nothing(spark):
    """A malformed policy row (NULL domain or NULL disallow) must not
    drop any page: NULL never equals a domain and NULL prefixes match
    no path."""
    from seqdatapipeline_spark.extensions.corpus import robots_filter

    pages = spark.createDataFrame(
        [(1, "a.com", "/x"), (2, "b.com", "/y")],
        "doc_id long, domain string, path string",
    )
    rules = spark.createDataFrame(
        [(None, "/x"), ("a.com", None)], "domain string, disallow string"
    )
    kept = {r.doc_id for r in robots_filter(pages, rules).collect()}
    assert kept == {1, 2}


def test_keyed_topk_ties_at_cap_boundary_and_null_keys(spark):
    """Budget-cap edge semantics (VERDICT r10 item 6): duplicate
    order values straddling the cap keep exactly k rows per key with
    deterministic value order, NULL keys form their own group (same
    as the window form's groupBy-NULL semantics), and NULL order
    values are excluded per the documented contract."""
    from pyspark.sql import Window

    from seqdatapipeline_spark.ops.aggregates import keyed_topk

    rows = (
        [("d", 1), ("d", 2), ("d", 2), ("d", 2), ("d", 3)]  # ties at k=3
        + [(None, 5), (None, 4), (None, 6)]                  # NULL key group
        + [("e", None), ("e", 7)]                            # NULL value
    )
    df = spark.createDataFrame(rows, "k string, v long").repartition(5)
    key = lambda t: (t[0] or "", t[1], t[2])  # noqa: E731
    got = sorted(
        [
            (r.k, r.v, r.rank)
            for r in keyed_topk(df, ["k"], "v", k=3, salt_buckets=4).collect()
        ],
        key=key,
    )
    w = Window.partitionBy("k").orderBy("v")
    want = sorted(
        [
            (r.k, r.v, r.rank)
            for r in df.filter(F.col("v").isNotNull())
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 3)
            .collect()
        ],
        key=key,
    )
    assert got == want
    # ties: exactly 3 'd' rows, values [1, 2, 2]
    assert [v for k, v, _ in got if k == "d"] == [1, 2, 2]


def test_url_path_behaviors(spark):
    from pyspark.sql import functions as F

    from seqdatapipeline_spark.ops import strings as st

    cases = [
        ("https://ex.com/a/b/?q=1#f", "/a/b"),
        ("https://ex.com/a%2Fb", "/a%2Fb"),
        ("https://ex.com", ""),
        ("https://ex.com/", ""),
        ("HTTP://EX.COM:80/De/X/", "/De/X"),  # case/port untouched in path
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i long, u string"
    )
    got = {
        r["i"]: r["p"]
        for r in df.select("i", st.url_path(F.col("u")).alias("p")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, cases[i][0], got[i], want)


def test_boilerplate_scrub_behaviors(spark):
    """Viral spans dropped, rare spans kept in order, all-boilerplate
    docs come back empty (not missing)."""
    from seqdatapipeline_spark.extensions.corpus import boilerplate_scrub

    banner = "accept all cookies"
    rows = [(i, f"{banner} unique{i} words here") for i in range(5)]
    rows.append((5, banner))  # all-boilerplate doc
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.clean_text, r.n_dropped_chunks)
        for r in boilerplate_scrub(
            docs, chunk_words=3, max_docs=3
        ).collect()
    }
    assert len(out) == 6
    assert out[5] == ("", 1)  # banner seen in 6 docs > 3 -> dropped
    for i in range(5):
        assert out[i] == (f"unique{i} words here", 1), out[i]
