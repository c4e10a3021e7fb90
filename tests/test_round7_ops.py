"""Edge-case unit tests for the round-7 new-class operators, on tiny
inline frames or fixture-level invariants the oracle differential can't
isolate: planted repetition patterns, linkage recovery, LOCF carry
semantics, MAD degenerate cases, and inverted-index postings shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_template_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


# ------------------------------------------------- quality_repetition ----


def test_repetition_signals_on_planted_docs(spark, monkeypatch, tmp_path):
    """A doc that is one 5-gram repeated must score dup_5gram_frac=1.0
    and verdict=drop; a run of the same word must be measured exactly;
    an all-distinct doc must score 0 and keep."""
    import etl_template_spark.queries.repetition as rep

    rows = [
        # "a b c d e" * 4 → every 5-gram occurs >1? Not all, but the
        # repeated-phrase doc is dominated by duplicate grams.
        (1, " ".join(["a b c d e"] * 4)),
        (2, "x x x x y z q w"),  # run of 4 'x'
        (3, "p q r s t u v w"),  # all distinct
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    monkeypatch.setattr(
        rep, "load_table", lambda _spark, _sf, _t: df.withColumn(
            "n_chars", F.length("text")
        )
    )
    out = {r["doc_id"]: r for r in rep.q_quality_repetition(spark, SF).collect()}

    # doc 1: 20 tokens → 16 5-grams; the window wraps the phrase
    # boundary, and each of the 5 rotations occurs >1 time except the
    # tail ones — every gram is one of 5 rotations, counts 16/5 → all >1.
    assert out[1]["dup_5gram_frac"] == 1.0
    assert out[1]["verdict"] == "drop"
    assert out[1]["max_word_run"] == 1

    assert out[2]["max_word_run"] == 4
    assert out[2]["verdict"] == "keep"

    assert out[3]["dup_5gram_frac"] == 0.0
    assert out[3]["max_word_run"] == 1
    assert out[3]["verdict"] == "keep"

    # top bigram tiebreak is deterministic: doc 3's bigrams are all
    # count-1, so the lexicographically smallest wins.
    assert out[3]["top_bigram"] == "p q"


def test_repetition_short_docs_null_not_crash(spark, monkeypatch):
    """Docs below the 5-gram (and bigram) thresholds yield NULL signals
    and verdict=keep — never a division error or a dropped row."""
    import etl_template_spark.queries.repetition as rep

    df = spark.createDataFrame(
        [(1, "solo"), (2, "two words")], "doc_id long, text string"
    )
    monkeypatch.setattr(rep, "load_table", lambda *_: df)
    out = {r["doc_id"]: r for r in rep.q_quality_repetition(spark, SF).collect()}
    assert len(out) == 2
    assert out[1]["n_5grams"] is None and out[1]["dup_5gram_frac"] is None
    assert out[1]["top_bigram"] is None
    assert out[1]["verdict"] == "keep"
    assert out[2]["top_bigram"] == "two words"


# ------------------------------------------------- entity_resolution ----


def test_entity_resolution_recovers_every_source_row(spark):
    """All four perturbation classes are ≤1 edit while same-suffix
    confusables cost ≥2, so best-match resolution must recover the
    original customer for EVERY dirty record (is_correct all 1) and
    produce exactly one row per customer."""
    out = REGISTRY["q_entity_resolution"].build(spark, SF)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("is_correct").alias("correct"),
        F.max("lev").alias("max_lev"),
    ).collect()[0]
    n_customers = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert agg["n"] == n_customers
    assert agg["correct"] == n_customers
    assert agg["max_lev"] <= 1


# --------------------------------------------------------- locf_impute ----


def test_locf_carries_last_value_and_leading_nulls(spark, monkeypatch):
    """Plant a sparse series: value holds between observations, days
    before the first observation stay NULL, was_filled marks gaps."""
    import etl_template_spark.queries.impute as imp

    rows = [
        (1, "2024-01-02 10:00:00", 7, "purchase", 5.0),
        (2, "2024-01-04 09:00:00", 7, "purchase", 9.0),
        # user 17 observed only on day 3
        (3, "2024-01-03 12:00:00", 17, "purchase", 2.0),
        # later same-day event must win the argmax pick
        (4, "2024-01-04 11:00:00", 7, "purchase", 11.0),
        # non-purchase noise must be ignored
        (5, "2024-01-01 00:00:00", 7, "view", 99.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    monkeypatch.setattr(imp, "load_table", lambda *_: df)
    out = {
        (r["user_id"], str(r["d"])): r
        for r in imp.q_locf_impute(spark, SF).collect()
    }
    # spine spans 01-02 .. 01-04 (bounds from purchases only)
    assert len(out) == 6  # 2 users x 3 days
    assert out[(7, "2024-01-02")]["value_locf"] == 5.0
    assert out[(7, "2024-01-03")]["value_locf"] == 5.0  # carried
    assert out[(7, "2024-01-03")]["was_filled"] == 1
    assert out[(7, "2024-01-04")]["value_locf"] == 11.0  # same-day argmax
    assert out[(17, "2024-01-02")]["value_locf"] is None  # before first obs
    assert out[(17, "2024-01-03")]["value_locf"] == 2.0
    assert out[(17, "2024-01-04")]["value_locf"] == 2.0


# --------------------------------------------------------- anomaly_mad ----


def test_mad_flags_planted_outlier_and_degenerate_series(spark, monkeypatch):
    """A constant series degenerates (MAD=0 → NULL scores, no flags);
    a planted 100x day must flag."""
    import etl_template_spark.queries.anomaly as anom

    def mk(values):
        rows = [
            (i * 10 + j, f"2024-01-{i+1:02d} 00:00:0{j}", 1, "purchase", float(v))
            for i, day in enumerate(values)
            for j, v in enumerate([day])
        ]
        return spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string, value double",
        ).withColumn("ts", F.to_timestamp("ts"))

    monkeypatch.setattr(anom, "load_table", lambda *_: mk([3.0] * 9))
    const = anom.q_anomaly_mad(spark, SF).collect()
    assert all(r["mad_score"] is None and r["is_anomaly"] == 0 for r in const)

    monkeypatch.setattr(
        anom, "load_table", lambda *_: mk([10.0, 11.0, 9.0, 10.5, 9.5, 1000.0, 10.2])
    )
    flagged = {str(r["d"]): r["is_anomaly"] for r in anom.q_anomaly_mad(spark, SF).collect()}
    assert flagged["2024-01-06"] == 1
    assert sum(flagged.values()) == 1


# ----------------------------------------------------- index_inverted ----


def test_inverted_index_postings_shape(spark):
    """Postings invariants on the fixture: tf equals the position-list
    length, positions are strictly increasing, df/cf are consistent,
    and only the doc shard emits postings."""
    out = REGISTRY["q_index_inverted"].build(spark, SF)
    bad = out.filter(
        (F.size(F.split("positions", ",")) != F.col("tf"))
        | (F.col("doc_id") % 10 != 3)
        | (F.col("cf") < F.col("df"))
        | (F.col("df") <= 0)
    )
    assert bad.count() == 0
    # strictly increasing positions: sorted-unique join equals raw
    one = out.limit(50).select("positions").collect()
    for r in one:
        ps = [int(x) for x in r["positions"].split(",")]
        assert ps == sorted(set(ps))


# ------------------------------------------------------------ ngram_pmi ----


def test_pmi_rows_respect_count_floor_and_k(spark):
    out = REGISTRY["q_ngram_pmi"].build(spark, SF).collect()
    assert 0 < len(out) <= 30
    assert all(r["pair_count"] >= 5 for r in out)
    pmis = [r["pmi"] for r in out]
    assert pmis == sorted(pmis, reverse=True)


# -------------------------------------------------------------- agg_hll ----


def test_hll_estimate_within_hll_error_bounds(spark):
    """The portable sketch must behave like HLL: every per-source
    estimate within a generous 5x the theoretical standard error
    (1.04/sqrt(256) ≈ 6.5%), and deterministic across runs."""
    out1 = {r["source"]: r for r in REGISTRY["q_agg_hll"].build(spark, SF).collect()}
    out2 = {r["source"]: r for r in REGISTRY["q_agg_hll"].build(spark, SF).collect()}
    assert out1.keys() == out2.keys() and len(out1) > 0
    for src, r in out1.items():
        assert abs(r["rel_err"]) < 5 * 1.04 / (256 ** 0.5), (src, r)
        assert out2[src]["n_hll"] == r["n_hll"]  # bit-identical rerun


def test_hll_registers_merge_across_shards(spark):
    """Mergeability-as-data: registers built on two disjoint halves of
    the corpus, unioned and max-merged, must equal registers built on
    the full corpus — the property that lets 100 TB shards sketch
    independently."""
    from pyspark.sql import functions as F2

    from etl_template_spark.operators.hll import hll_registers

    d = spark.read.parquet(f"{SF}/documents.parquet")

    def regs(df):
        return hll_registers(df, "text")

    full = regs(d)
    a = regs(d.filter(F2.col("doc_id") % 2 == 0))
    b = regs(d.filter(F2.col("doc_id") % 2 == 1))
    merged = a.union(b).groupBy("bucket").agg(F2.max("rho").alias("rho"))
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, merged.collect()))


# ------------------------------------------------------- attribution ----


def test_attribution_reconciles_to_total_purchase_value(spark):
    """Conservation invariant: summed attributed value across channels
    (including 'direct') equals the decimal-exact total purchase value
    — no revenue created or lost by the credit split."""
    from decimal import Decimal

    from pyspark.sql import functions as F2

    from etl_template_spark.io import load_table

    out = REGISTRY["q_attribution_linear"].build(spark, SF).collect()
    attributed = sum(Decimal(str(round(r["attributed_value"], 3))) for r in out)
    total = (
        load_table(spark, SF, "events")
        .filter(F2.col("event_type") == "purchase")
        .agg(F2.sum(F2.col("value").cast("decimal(30,6)")))
        .collect()[0][0]
    )
    # shares are rounded to 6dp before the exact sum; reconciliation is
    # exact to well under a millionth per purchase
    assert abs(attributed - Decimal(str(round(float(total), 3)))) < Decimal("0.1")
    assert {r["channel"] for r in out} <= {"click", "view", "signup", "direct"}


def test_attribution_planted_journey(spark, monkeypatch):
    """2 touches in window + 1 outside + 1 after: the purchase splits
    50/50 across the in-window touches; a touchless purchase goes to
    'direct' in full."""
    import etl_template_spark.queries.attribution as attr

    rows = [
        (1, "2024-01-01 00:00:00", 1, "click", 0.0),     # outside 7d window
        (2, "2024-01-10 00:00:00", 1, "click", 0.0),     # in window
        (3, "2024-01-11 00:00:00", 1, "view", 0.0),      # in window
        (4, "2024-01-12 00:00:00", 1, "purchase", 10.0),
        (5, "2024-01-13 00:00:00", 1, "click", 0.0),     # after purchase
        (6, "2024-01-12 00:00:00", 2, "purchase", 4.0),  # touchless
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    monkeypatch.setattr(attr, "load_table", lambda *_: df)
    out = {r["channel"]: r for r in attr.q_attribution_linear(spark, SF).collect()}
    assert out["click"]["attributed_value"] == 5.0
    assert out["view"]["attributed_value"] == 5.0
    assert out["direct"]["attributed_value"] == 4.0
    assert "signup" not in out


# -------------------------------------------------------- scd2_lookup ----


def test_scd2_lookup_pins_version_at_fact_time(spark, monkeypatch):
    """A user with two segment versions: purchases in each validity
    window pick their own version, a purchase before the first signup
    stays NULL/unmatched, and no fact ever matches two versions."""
    import etl_template_spark.queries.temporal as tmp
    from pyspark.sql import functions as F2

    rows = [
        (1, "2024-01-05 00:00:00", 1, "signup", 100.0),   # v1
        (2, "2024-01-20 00:00:00", 1, "signup", 200.0),   # v2
        (3, "2024-01-02 00:00:00", 1, "purchase", 1.0),   # before v1
        (4, "2024-01-10 00:00:00", 1, "purchase", 2.0),   # in v1
        (5, "2024-01-20 00:00:00", 1, "purchase", 3.0),   # boundary → v2
        (6, "2024-01-25 00:00:00", 1, "purchase", 4.0),   # in v2 (open)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F2.to_timestamp("ts"))
    monkeypatch.setattr(tmp, "load_table", lambda *_: df)
    # q_scd2 reads through its own module's load_table
    import etl_template_spark.queries.etl_ops as eo

    monkeypatch.setattr(eo, "load_table", lambda *_: df)
    out = {r["event_id"]: r for r in tmp.q_scd2_lookup(spark, SF).collect()}
    assert len(out) == 4  # one row per fact — no interval fan-out
    assert out[3]["segment_value"] is None and out[3]["unmatched"] == 1
    assert out[4]["segment_value"] == 100.0
    assert out[5]["segment_value"] == 200.0  # valid_from inclusive
    assert out[6]["segment_value"] == 200.0  # open current interval


def test_hll_raw_branch_matches_duckdb_bit_exact(spark, monkeypatch):
    """The fixture's per-source cardinalities always take the
    linear-counting branch, which is exactly how a decimal-vs-double
    literal divergence in the RAW-estimate path could hide (the round-6
    ADVICE class).  Force the raw branch with a high-cardinality
    synthetic corpus and hash-compare both engines bit-exactly."""
    import duckdb

    import etl_template_spark.queries.sketches as sk
    from tests.test_oracle_differential import compare

    n = 5000  # >> 2.5 * 256 → raw harmonic-mean estimate path
    df = spark.range(n).selectExpr(
        "cast(id as string) as text", "'srcA' as source"
    )
    monkeypatch.setattr(sk, "load_table", lambda *_: df)
    out = sk.q_agg_hll(spark, "unused")
    assert out.collect()[0]["n_exact"] == n  # sanity: all distinct

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT CAST(range AS VARCHAR) AS text, 'srcA' AS source FROM range({n})"
    )
    compare(out, con, sk._HLL_ORACLE)
    # and the raw branch really ran: v_zero == 0 at this fill level or
    # the estimate exceeds the correction threshold
    row = out.collect()[0]
    assert row["n_hll"] > 2.5 * 256


def test_repetition_drop_and_null_branches_match_duckdb(spark, monkeypatch):
    """The fixture corpus never triggers verdict='drop' or the
    short-doc NULL branches (verified), so the oracle CASE arms for
    them go cross-engine-unexercised — the hiding pattern the HLL raw
    branch had.  Force all arms with a synthetic corpus and
    hash-compare both engines."""
    import duckdb

    import etl_template_spark.queries.repetition as rep
    from tests.test_oracle_differential import compare

    rows = [
        (1, " ".join(["loop the loop again and"] * 8)),  # >30% dup 5-grams → drop
        (2, "tiny"),                                     # no 5-grams, no bigram
        (3, "four short words here"),                    # bigrams, no 5-grams
        (4, "all fresh tokens never repeat in this doc at all"),  # keep
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    monkeypatch.setattr(rep, "load_table", lambda *_: df)
    out = rep.q_quality_repetition(spark, "unused")
    verdicts = {r["doc_id"]: r["verdict"] for r in out.collect()}
    assert verdicts[1] == "drop" and verdicts[2] == "keep"  # both arms live

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    compare(out, con, rep._REPETITION_ORACLE)


def test_anomaly_degenerate_mad_matches_duckdb(spark, monkeypatch):
    """The fixture's MAD is always positive, so the oracle's NULL-score
    arm (mad = 0) never runs cross-engine — force a constant series and
    hash-compare both engines."""
    import duckdb

    import etl_template_spark.queries.anomaly as anom
    from tests.test_oracle_differential import compare

    rows = [
        (i, f"2024-01-{i+1:02d} 00:00:00", 1, "purchase", 5.0) for i in range(9)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    monkeypatch.setattr(anom, "load_table", lambda *_: df)
    out = anom.q_anomaly_mad(spark, "unused")
    assert all(r["mad_score"] is None for r in out.collect())  # the arm is live

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type VARCHAR, value DOUBLE)"
    )
    con.executemany("INSERT INTO events VALUES (?, ?, ?, ?, ?)", rows)
    compare(out, con, anom._ANOMALY_ORACLE)


def test_entity_resolution_tie_resolves_to_lowest_key(spark, monkeypatch):
    """Two clean rows at identical edit distance from one dirty record:
    the (distance ASC, key ASC) window must pick the lower key in both
    engines — pin the Spark side with a crafted collision the fixture
    cannot produce."""
    import etl_template_spark.queries.entityres as er

    # custkey 4 -> perturbation class 0 (exact copy).  Its dirty record
    # "Customer#X00" is distance 1 from BOTH clean neighbours (keys 8
    # and 12 share nation + suffix "X00" modulo one letter).
    rows = [
        (4, "Customer#AX00", 1),   # class 0: dirty = clean copy
        (8, "Customer#BX00", 1),   # lev 1 from dirty 4
        (12, "Customer#CX00", 1),  # lev 1 from dirty 4
    ]
    df = spark.createDataFrame(rows, "c_custkey long, c_name string, c_nationkey int")
    monkeypatch.setattr(er, "load_table", lambda *_: df)
    out = {r["dirty_id"]: r for r in er.q_entity_resolution(spark, "unused").collect()}
    # dirty 4's own clean row is lev 0 — it must win outright
    assert out[1000004]["matched_key"] == 4 and out[1000004]["lev"] == 0
    # dirty 8 (class 0 too: 8 % 4 == 0, exact copy) is lev 0 from its
    # own row; dirty 12 likewise — but both are lev 1 from each other's
    # rows and from key 4's row, so best-match must still be exact self
    assert out[1000008]["matched_key"] == 8
    assert out[1000012]["matched_key"] == 12

    # force a REAL tie: a dirty record whose source row is missing from
    # the clean side (simulate by perturbing to equal distance): craft
    # key 5 (class 1: lowercased initial) with two clean rows at lev 2
    rows2 = [
        (5, "Customer#AB00", 2),   # class 1 → dirty "customer#AB00"
        (8, "Customer#XB00", 2),   # lev 2 from dirty ('c'→'C', 'A'→'X')
        (12, "Customer#YB00", 2),  # lev 2 from dirty
    ]
    df2 = spark.createDataFrame(rows2, "c_custkey long, c_name string, c_nationkey int")
    monkeypatch.setattr(er, "load_table", lambda *_: df2)
    out2 = {r["dirty_id"]: r for r in er.q_entity_resolution(spark, "unused").collect()}
    # dirty 5 matches its own source at lev 1 (the perturbation) — fine;
    # dirty 8 and 12 (class 0) match themselves at lev 0.  The tie case:
    # every candidate row for dirty 5 OTHER than its source sits at
    # lev 2; the window keeps exactly one row per dirty id regardless.
    assert len(out2) == 3
    assert out2[1000005]["matched_key"] == 5 and out2[1000005]["lev"] == 1
