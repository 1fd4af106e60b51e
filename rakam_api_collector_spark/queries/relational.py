"""Declared correctness queries DQ-1..25 (SURVEY.md §2.14).

Each query pins one operator family from the reference inventory
(SURVEY.md §2.1-§2.13) — the ingestion-semantics ones map to real
reference code paths (file:line cited per query), the classic
relational ones pin the Spark-SQL-supplied surface the reference lacks.

Implementation style: declarative DataFrame API so Catalyst owns the
physical plan (pushdown, pruning, join strategy, partial aggregation).
Explicit ``broadcast()`` hints mark dimension tables; everything else is
left to AQE, which is the configuration that survives a 100× scale-up.

Float determinism vs the oracle: double sums are accumulated as
DECIMAL(18,6) (exact, order-independent — both engines agree bit-for-bit)
and only then cast to double and rounded, so hash comparison never
depends on floating-point reduction order across 32 (or 1000) partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rakam_api_collector_spark.tables import load_table, spread


def _dec_sum(col, alias: str, scale: int = 4):
    """Exact decimal sum of a double expr, surfaced as a rounded double."""
    return F.round(F.sum(col.cast("decimal(18,6)")).cast("double"), scale).alias(alias)


# --- §2.3 projections / filters -------------------------------------------

def dq01_projection(spark: SparkSession, sf: str) -> DataFrame:
    """P1 column exclusion (FabricJsonDeserializer.java:78,205-206)."""
    return (load_table(spark, sf, "events")
            .select("event_id", "event_type")
            .orderBy("event_id").limit(100))


def dq02_whitelist(spark: SparkSession, sf: str) -> DataFrame:
    """P2 collection whitelist (KafkaRealTimeWorker.java:103-104,352-354)."""
    return (load_table(spark, sf, "events")
            .filter(F.col("event_type").isin("click", "view"))
            .select("event_id", "event_type")
            .orderBy("event_id").limit(100))


def dq03_late_split(spark: SparkSession, sf: str) -> DataFrame:
    """P3/ST3 event-time real-time vs historical split
    (KafkaRealTimeWorker.java:356-359): day window relative to max ts."""
    events = load_table(spark, sf, "events")
    max_ts = events.agg(F.max("ts").alias("max_ts"))
    return (events.crossJoin(F.broadcast(max_ts))
            .select(F.when(F.col("ts") >= F.col("max_ts") - F.expr("INTERVAL 1 DAY"), "rt")
                    .otherwise("hist").alias("bucket"))
            .groupBy("bucket").agg(F.count("*").alias("n"))
            .orderBy("bucket"))


def dq04_sink_envelope(spark: SparkSession, sf: str) -> DataFrame:
    """P6/K2 sink projection/envelope reshaping
    (connector/s3/S3DatabaseHandler.java:149-221)."""
    return (load_table(spark, sf, "events")
            .select("event_id",
                    F.concat(F.col("event_type"), F.lit(":"),
                             F.col("user_id").cast("string")).alias("env"))
            .orderBy("event_id").limit(100))


# --- §2.4 routing ----------------------------------------------------------

def dq05_route_fanout(spark: SparkSession, sf: str) -> DataFrame:
    """R1 per-collection routing counts
    (JsonMessageEventTransformer.java:36-64)."""
    return (load_table(spark, sf, "events")
            .groupBy("event_type").agg(F.count("*").alias("n"))
            .orderBy("event_type"))


# --- §2.5 aggregations ------------------------------------------------------

def dq06_max_offset(spark: SparkSession, sf: str) -> DataFrame:
    """A1 max-offset per partition (kafka/KafkaUtil.java:81-106)."""
    return (load_table(spark, sf, "events")
            .groupBy((F.col("user_id") % 16).alias("part"))
            .agg(F.max("event_id").alias("max_off"))
            .orderBy("part"))


def dq07_zone_map(spark: SparkSession, sf: str) -> DataFrame:
    """A3 per-column min/max stats (InMemoryOrcStorageManager.java:188-207)."""
    return load_table(spark, sf, "lineitem").agg(
        F.min("l_shipdate").alias("mn"),
        F.max("l_shipdate").alias("mx"),
        F.count("*").alias("n"))


def dq08_hash_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Hash aggregation, TPC-H Q1 shape (absent in reference — §2.5).

    ``spread`` on the high-cardinality order key fans the single-row-
    group local fixture scan out to every core before the decimal
    partial aggregation (guide §2.5 input skew — the partial agg was
    one task); decimal sums are order-independent, so the result is
    partitioning-invariant. Measured 1.54 → 0.82 s at sf0.1 (a no-op
    on a well-laid-out multi-row-group input)."""
    li = spread(load_table(spark, sf, "lineitem")
                .select("l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice", "l_discount", "l_orderkey"),
                "l_orderkey")
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(_dec_sum(F.col("l_quantity"), "sum_qty"),
                 _dec_sum(F.col("l_extendedprice"), "sum_price"),
                 F.round(F.sum(F.col("l_discount").cast("decimal(18,6)")).cast("double")
                         / F.count("*"), 4).alias("avg_disc"),
                 F.count("*").alias("n"))
            .orderBy("l_returnflag", "l_linestatus"))


def dq09_distinct_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct aggregation (§2.5 absent-in-reference surface)."""
    return load_table(spark, sf, "orders").agg(
        F.countDistinct("o_custkey").alias("n"))


def dq10_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Grouping sets / ROLLUP (§2.5)."""
    return (load_table(spark, sf, "orders")
            .rollup("o_orderpriority", "o_orderstatus")
            .agg(F.count("*").alias("n"))
            .orderBy(F.col("o_orderpriority").asc_nulls_first(),
                     F.col("o_orderstatus").asc_nulls_first()))


def dq11_sum_cents(spark: SparkSession, sf: str) -> DataFrame:
    """Exact integer aggregation: count + sum of bigint cents (§2.5)."""
    return load_table(spark, sf, "orders").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("cents"))


# --- §2.6 joins -------------------------------------------------------------

def dq12_join_dim(spark: SparkSession, sf: str) -> DataFrame:
    """Inner equi-join against a broadcast dimension (§2.6)."""
    customer = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    return (customer.join(F.broadcast(nation),
                          customer.c_nationkey == nation.n_nationkey)
            .groupBy("n_name").agg(F.count("*").alias("c"))
            .orderBy("n_name"))


def dq13_multi_join(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-join, TPC-H Q3 shape (§2.6). customer is the small side of
    the first join (broadcast); orders⋈lineitem shuffles on orderkey."""
    customer = load_table(spark, sf, "customer").filter(
        F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf, "orders")
    lineitem = load_table(spark, sf, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (orders.join(F.broadcast(customer),
                        orders.o_custkey == customer.c_custkey)
            .join(lineitem, lineitem.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderkey")
            .agg(_dec_sum(rev, "rev"))
            .orderBy(F.desc("rev"), "o_orderkey").limit(10))


def dq14_semi_anti(spark: SparkSession, sf: str) -> DataFrame:
    """Left semi + left anti join (IN / NOT IN subquery), union-tagged
    by ``side`` (§2.6).

    r12 consolidation of the former dq14_semi_join / dq14_anti_join
    rows (the plan drafted in the registry docstring since r10): both
    join strategies stay live in ONE result — the union asserts the
    semi- and anti-row sets partition customer exactly, and each leg
    still plans as its own join (left_semi / left_anti), so nothing
    the two old rows certified is lost. o_custkey has no nulls, so
    NOT IN and anti-join semantics align."""
    customer = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")

    def leg(how: str, tag: str) -> DataFrame:
        return (customer.join(orders,
                              customer.c_custkey == orders.o_custkey, how)
                .agg(F.count("*").alias("n"))
                .select(F.lit(tag).alias("side"), "n"))

    return leg("left_semi", "semi").unionAll(leg("left_anti", "anti"))


def dq15_outer_join(spark: SparkSession, sf: str) -> DataFrame:
    """Left outer join null handling (§2.6)."""
    customer = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    return (customer.join(orders, customer.c_custkey == orders.o_custkey,
                          "left")
            .filter(F.col("o_orderkey").isNull())
            .agg(F.count("*").alias("n")))


# --- §2.7 window functions ---------------------------------------------------

def dq16_window(spark: SparkSession, sf: str) -> DataFrame:
    """row_number window, top-2 per user (§2.7)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (load_table(spark, sf, "events")
            .select("user_id", "event_id", F.row_number().over(w).alias("rnk"))
            .filter(F.col("rnk") <= 2)
            .orderBy("user_id", "rnk").limit(100))


def dq17_dedup_first(spark: SparkSession, sf: str) -> DataFrame:
    """ST6 dedup semantics: first event per (user, second)
    (Deduplicator.java:26-88, AvroDuplicateHandler.java:82-119)."""
    w = Window.partitionBy("user_id", F.date_trunc("second", F.col("ts"))) \
              .orderBy("event_id")
    return (load_table(spark, sf, "events")
            .select(F.row_number().over(w).alias("rn"))
            .filter(F.col("rn") == 1)
            .agg(F.count("*").alias("n")))


# --- §2.8 sorts / top-k ------------------------------------------------------

def dq18_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition
    heap then driver merge, no full sort (§2.8)."""
    return (load_table(spark, sf, "orders")
            .select("o_orderkey", "o_totalprice")
            .orderBy(F.desc("o_totalprice"), "o_orderkey").limit(20))


def dq19_truncate(spark: SparkSession, sf: str) -> DataFrame:
    """T2 VARCHAR 100-char truncation (FabricJsonDeserializer.java:324-330)."""
    return (load_table(spark, sf, "documents")
            .select("doc_id", F.substring("text", 1, 100).alias("t"))
            .orderBy("doc_id").limit(50))


# --- §2.10 scalar functions ---------------------------------------------------

def dq20_safe_cast(spark: SparkSession, sf: str) -> DataFrame:
    """D6/F1 safe cast (catch→null) (FabricJsonDeserializer.java:313-495)."""
    return (load_table(spark, sf, "events")
            .filter(F.expr("try_cast(props AS double)").isNull())
            .agg(F.count("*").alias("n")))


def dq21_set_ops(spark: SparkSession, sf: str) -> DataFrame:
    """Set operations (§2.9): INTERSECT."""
    customer = load_table(spark, sf, "customer").select("c_nationkey")
    supplier = load_table(spark, sf, "supplier") \
        .select(F.col("s_nationkey").alias("c_nationkey"))
    return customer.intersect(supplier).orderBy("c_nationkey")


def dq22_array_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """F6 map/array functions over the embeddings table (§2.10)."""
    return (load_table(spark, sf, "embeddings")
            .select("vec_id",
                    F.round(F.element_at("embedding", 1).cast("double"), 4)
                    .alias("e0"),
                    F.size("embedding").alias("n_dims"))
            .orderBy("vec_id").limit(50))


def dq23_hash(spark: SparkSession, sf: str) -> DataFrame:
    """F8 xxhash64 checksum (InMemoryOrcStorageManager.java:234-242).
    Hash values are engine-specific; the count of distinct hashes is
    engine-independent (== #distinct inputs, collision-free at this n)."""
    return (load_table(spark, sf, "events")
            .agg(F.countDistinct(F.xxhash64("event_type")).alias("n")))


def dq24_scalars(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar function sample: string/math/date (§2.10)."""
    return (load_table(spark, sf, "events")
            .orderBy("event_id").limit(100)
            .select(F.upper("event_type").alias("et"),
                    F.length("event_type").alias("len"),
                    (F.abs(F.col("value")) > 0.5).alias("big"),
                    F.year("ts").alias("yr")))


def dq25_udf_shape(spark: SparkSession, sf: str) -> DataFrame:
    """§2.13: the computation a pandas UDF would express, in plain ops
    — avg doc length per language (exact int sum → double divide)."""
    return (load_table(spark, sf, "documents")
            .groupBy("lang")
            .agg(F.round(F.sum("n_chars").cast("double") / F.count("*"), 4)
                 .alias("avg_chars"),
                 F.count("*").alias("n"))
            .orderBy("lang"))


def dq26_epoch_conversions(spark: SparkSession, sf: str) -> DataFrame:
    """F2 epoch-day / epoch-millis conversions (KafkaRealTimeWorker.java:333,
    KafkaDecoupleMessage.java:113: dayIndex = epochMillis / 86_400_000)."""
    return (load_table(spark, sf, "events")
            .orderBy("event_id").limit(100)
            .select("event_id",
                    F.unix_millis(F.col("ts").cast("timestamp"))
                    .alias("ep_ms"),
                    (F.unix_millis(F.col("ts").cast("timestamp"))
                     / F.lit(86_400_000))
                    .cast("long").alias("day_idx"),
                    F.datediff(F.to_date("ts"), F.lit("2024-01-01"))
                    .alias("day_diff")))


def dq27_scalar_encode(spark: SparkSession, sf: str) -> DataFrame:
    """F3+F4 scalar encodes in ONE 100-event slice scan — the r16
    consolidation of dq27_json_encode + dq28_date_format (both r15-
    green single-scan scalar rows over the same slice; this row is
    the literal union of their certified outputs, same expressions,
    one SELECT — the llm02_lexical_stats precedent):
    JSON re-encode of a constructed nested struct
    (FabricJsonDeserializer.java:424,442,477: non-scalars inside
    maps/arrays serialize to JSON text) and the sink-side
    BASIC_ISO_DATE / ISO-instant timestamp formats
    (S3DatabaseHandler.java:72,240-243)."""
    ev = load_table(spark, sf, "events").orderBy("event_id").limit(100)
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select(
        "event_id",
        F.to_json(F.struct(k.alias("k"),
                           F.array(k, k + 1).alias("ks"))).alias("js"),
        F.date_format("ts", "yyyyMMdd").alias("basic_iso"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSS")
        .alias("iso_ts"))


def dq29_envelope_parse(spark: SparkSession, sf: str) -> DataFrame:
    """D1/D2-shaped JSON payload extraction as a query: pull a typed
    field out of a JSON-string column with safe-cast semantics and
    aggregate it (the per-record parse the envelope readers do,
    RakamJsonDeserializer.java:107-160)."""
    # spread (r19, guide §2.5): the 100k-row per-event JSON parse ran
    # as ONE task over the one-row-group scan; the long sum/count/
    # min/max aggregate is partitioning-invariant
    ev = spread(load_table(spark, sf, "events"), "event_id")
    k = F.get_json_object("props", "$.k").try_cast("long")
    return (ev.select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.sum("k").alias("k_sum"),
                 F.count("k").alias("k_n"),
                 F.min("k").alias("k_min"),
                 F.max("k").alias("k_max"))
            .orderBy("event_type"))


def dq30_tumbling_window(spark: SparkSession, sf: str) -> DataFrame:
    """ST-family batch shape of the streaming windowed aggregation: the
    same F.window("1 hour") expression drives readStream + watermark in
    streaming/pipeline.py; epoch-aligned tumbling windows match DuckDB's
    time_bucket. Window start surfaced as a formatted string so the
    tz-aware Spark timestamp and naive DuckDB timestamp hash alike."""
    ev = load_table(spark, sf, "events")
    return (ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 _dec_sum(F.col("value"), "val_sum"))
            .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                    .alias("ws"),
                    "event_type", "n", "val_sum")
            .orderBy("ws", "event_type"))


def dq47_sliding_window(spark: SparkSession, sf: str) -> DataFrame:
    """Hopping (sliding) event-time window: 1-hour windows every 15
    minutes — each event lands in 4 overlapping buckets. The same
    F.window(ts, "1 hour", "15 minutes") expression drives streaming
    rate metrics with watermarks; the batch form pins the bucket
    math (epoch-aligned starts, inclusive-exclusive bounds) against a
    generate_series replay in the oracle. Scale shape: the 4× row
    expansion happens map-side inside the window generator, then ONE
    map-side-combine aggregate — never a self-join of shifted copies.
    ``spread`` measured here (r18): 0.52 → 0.98 s REGRESSION — the ×4
    generate + count/decimal-sum partial agg is cheap JVM work, so the
    spread exchange costs more than the single-task map side."""
    ev = load_table(spark, sf, "events")
    return (ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
            .agg(F.count("*").alias("n"),
                 _dec_sum(F.col("value"), "val_sum"))
            .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                    .alias("ws"),
                    "n", "val_sum")
            .orderBy("ws"))


def dq31_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join (operators/temporal.py): each click event picks up the
    latest prior-or-equal view by the same user — one window pass over a
    union, single shuffle on user_id, no range-join explosion. Equal-
    (user_id, ts) view ties resolve to the max event_id INSIDE the as-of
    window (``tie_cols`` — r18): the former row_number pre-dedup was a
    second window with its own (user_id, ts) exchange+sort for the same
    deterministic winner."""
    from rakam_api_collector_spark.operators.temporal import asof_join

    ev = load_table(spark, sf, "events")
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("event_id", "user_id", "ts"))
    views = (ev.filter(F.col("event_type") == "view")
             .select("user_id", "ts",
                     F.col("event_id").alias("view_id"),
                     F.col("value").alias("view_value")))
    return (asof_join(clicks, views, ["user_id"], "ts",
                      ["view_id", "view_value"], tie_cols=["view_id"])
            .select("event_id", "user_id", "view_id",
                    F.round("view_value", 4).alias("view_value"))
            .orderBy("event_id"))


def dq32_salted_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Salted two-phase aggregation (operators/skew.py): event_type is
    the hot-key shape (5 values over the whole table); results are
    identical to a plain GROUP BY — the salt only rebalances phase 1."""
    from rakam_api_collector_spark.operators.skew import salted_agg

    ev = load_table(spark, sf, "events")
    out = salted_agg(
        ev, ["event_type"],
        {"n": (F.count("*"), F.sum("n")),
         "val_sum": (F.sum(F.col("value").cast("decimal(18,6)")),
                     F.sum("val_sum")),
         "mx": (F.max("event_id"), F.max("mx"))},
        salt=16)
    return (out.select("event_type", "n",
                       F.round(F.col("val_sum").cast("double"), 4)
                       .alias("val_sum"), "mx")
            .orderBy("event_type"))


def dq33_percentile(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated percentiles per group — Spark ``percentile``
    and DuckDB ``quantile_cont`` share linear-interpolation semantics."""
    ev = load_table(spark, sf, "events")
    return (ev.groupBy("event_type")
            .agg(F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
                 F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"))
            .orderBy("event_type"))


def dq34_range_join(spark: SparkSession, sf: str) -> DataFrame:
    """Range (band) join via operators/temporal.py:band_join — each
    interval exploded onto covering coarse buckets (broadcast), each
    fact row hashed to ONE bucket, residual BETWEEN map-side. A hash
    probe per row instead of a nested-loop predicate against every
    interval: O(|fact|) not O(|fact|·|bands|), which is what survives
    a 100k-interval dimension at 100 TB."""
    from rakam_api_collector_spark.operators.temporal import band_join

    bands = spark.createDataFrame(
        [(i, i / 10.0, (i + 1) / 10.0) for i in range(10)],
        "band int, lo double, hi double")
    ev = load_table(spark, sf, "events")
    return (band_join(ev, bands, "value", "lo", "hi", bucket_width=0.1)
            .groupBy("band").agg(F.count("*").alias("n"),
                                 _dec_sum(F.col("value"), "val_sum"))
            .orderBy("band"))


def dq35_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) in batch form: lag +
    conditional cumsum over (user, ts) — one shuffle on user_id. The
    streaming form of the same semantics runs applyInPandasWithState
    (streaming/sessions.py); this query pins the session-boundary
    logic against a SQL oracle."""
    ev = load_table(spark, sf, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_sec = F.col("ts").cast("timestamp").cast("long")
    gap = ts_sec - F.lag(ts_sec).over(w)
    sess = (ev.withColumn("_new", F.when(gap.isNull() | (gap > 1800), 1)
                          .otherwise(0))
            .withColumn("session_seq", F.sum("_new").over(w)))
    return (sess.groupBy("user_id", "session_seq")
            .agg(F.count("*").alias("n_events"),
                 F.min("event_id").alias("first_event"),
                 F.max("event_id").alias("last_event"))
            .orderBy("user_id", "session_seq"))


def dq36_approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """HLL++ sketch pinned to a tolerance the oracle can check exactly:
    the output carries the exact distinct count plus a boolean
    ``within_5pct`` comparing the sketch against it — the oracle
    recomputes the exact count and asserts the boolean, so a sketch
    drifting out of tolerance hash-fails the gate.

    Shape: dedup (event_type, user_id) FIRST, then count + HLL over the
    deduped set in one pass. HLL registers are insert-only, so the
    sketch of the set equals the sketch of the multiset — and the plan
    loses the Expand node a mixed distinct/non-distinct aggregate needs,
    meaning the (large, rsd-governed) HLL buffers never ride the
    per-event shuffle: only (event_type, user_id) pairs do. At 100 TB
    that is the difference between shuffling ~KB-sized sketch buffers
    per group per mapper twice and shuffling them once over pre-shrunk
    input."""
    ev = load_table(spark, sf, "events")
    dd = ev.select("event_type", "user_id").distinct()
    return (dd.groupBy("event_type")
            .agg(F.count("*").alias("exact_n"),
                 F.approx_count_distinct("user_id", 0.02).alias("_a"))
            .select("event_type", "exact_n",
                    (F.abs(F.col("_a") - F.col("exact_n"))
                     <= F.col("exact_n") * 0.05).alias("within_5pct"))
            .orderBy("event_type"))


def dq37_hash_split(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic train/test split (operators/sampling.py): md5
    bucket of the key, pure function of the row — reproducible across
    engines and partitionings, which seeded sample() is not."""
    from rakam_api_collector_spark.operators.sampling import hash_split

    orders = load_table(spark, sf, "orders")
    train, test = hash_split(orders, "o_orderkey", frac_pct=10)
    agg = [F.count("*").alias("n"),
           F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
           .alias("cents")]
    return (train.agg(*agg).select(F.lit("train").alias("part"), "*")
            .unionByName(
                test.agg(*agg).select(F.lit("test").alias("part"), "*"))
            .orderBy("part"))


def dq38_cube(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE over (event_type, day) with an explicit grouping-set id.

    Scale shape: Spark plans CUBE as one Expand (4 grouping sets) into a
    single partial+final hash aggregate — one shuffle total, identical
    to the rollup path (dq10); no per-grouping-set re-scan."""
    ev = (load_table(spark, sf, "events")
          .select("event_type", F.to_date("ts").alias("day")))
    return (ev.cube("event_type", "day")
            .agg(F.count("*").alias("n"),
                 (F.grouping("event_type") * 2 + F.grouping("day"))
                 .cast("int").alias("gid"))
            .select("event_type", "day", "n", "gid")
            .orderBy(F.col("gid"), F.col("event_type"), F.col("day")))


def dq44_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit GROUPING SETS ((event_type, day), (event_type), ()) —
    the hand-picked-sets sibling of rollup (dq10) and cube (dq38),
    completing the multi-grouping family.

    Scale shape: identical to CUBE — one Expand over the chosen sets
    into a single partial+final hash aggregate, one shuffle, no
    per-set re-scan; the ``(event_type, day)`` leaf is the dominant
    row volume and the super-aggregates ride the same exchange."""
    ev = (load_table(spark, sf, "events")
          .select("event_type", F.to_date("ts").alias("day"), "value"))
    ev.createOrReplaceTempView("_ev44")
    return spark.sql("""
        SELECT event_type, day,
               count(*) AS n,
               round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4)
                 AS val_sum,
               CAST(grouping(event_type) * 2 + grouping(day)
                    AS INT) AS gid
        FROM _ev44
        GROUP BY GROUPING SETS ((event_type, day), (event_type), ())
        ORDER BY gid, event_type, day
    """)


def dq39_pivot(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot event_type → columns of per-day counts, expressed as
    conditional aggregates over a STATIC value list.

    Deliberately NOT ``df.groupBy(...).pivot(...)``: with a known value
    list, ``pivot`` still plans a pre-aggregate on (day, type) plus a
    ``pivotfirst`` aggregate — two shuffles — and without the list it
    adds a distinct-values discovery job and a data-dependent schema.
    count(CASE WHEN ...) per value is one partial+final aggregate, one
    shuffle, static schema — the pivot plan you want at 100 TB."""
    ev = load_table(spark, sf, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (ev.groupBy(F.to_date("ts").alias("day"))
            .agg(*[F.count(F.when(F.col("event_type") == t, 1)).alias(t)
                   for t in types])
            .orderBy("day"))


def dq45_range_frame(spark: SparkSession, sf: str) -> DataFrame:
    """RANGE-framed moving aggregate — the value-based frame the
    ROWS-framed battery (dq40) doesn't cover: per user, the count and
    exact-decimal sum of events in the trailing 1-hour window of each
    event (RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW over epoch
    seconds). One Window operator, one shuffle on user_id; peer rows
    (equal timestamps) aggregate identically by RANGE semantics, so
    the result is deterministic without a unique tiebreaker."""
    ev = (load_table(spark, sf, "events")
          .select("user_id", "ts", "value",
                  F.unix_timestamp("ts").alias("_sec"))
          .filter(F.col("user_id") % 29 == 0))
    w = (Window.partitionBy("user_id").orderBy("_sec")
         .rangeBetween(-3600, Window.currentRow))
    return (ev.select(
                "user_id", "ts",
                F.count("*").over(w).alias("n_1h"),
                F.round(F.sum(F.col("value").cast("decimal(18,6)"))
                        .over(w).cast("double"), 4).alias("sum_1h"))
            .orderBy("user_id", "ts"))


def dq46_stats_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Statistical aggregates — sample variance/stddev of price and the
    price↔quantity correlation per return flag. Computed from EXACT
    decimal sums (n, Σx, Σx², Σxy) rather than the engines' one-pass
    builtin implementations (``var_samp``/``corr`` use numerically
    stable streaming algorithms whose low-order bits differ per
    engine/partitioning); the decimal route is order-independent and
    bit-identical cross-engine, then one double division at the end.
    Same single-shuffle map-side-combine plan as any hash aggregate.
    ``spread`` parallelizes the decimal partial aggregation over the
    single-row-group fixture scan (guide §2.5 — measured 1.94 → 1.19 s
    at sf0.1; decimal sums are order-independent, so the result is
    partitioning-invariant)."""
    li = spread(load_table(spark, sf, "lineitem")
                .select("l_returnflag", "l_orderkey",
                        F.col("l_extendedprice").cast("decimal(18,6)")
                        .alias("x"),
                        F.col("l_quantity").cast("decimal(18,6)")
                        .alias("y")),
                "l_orderkey")
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"))
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    var = (sxx - sx * sx / n) / (n - 1)
    cov = (sxy - sx * sy / n) / (n - 1)
    vy = (syy - sy * sy / n) / (n - 1)
    return (agg.select(
                "l_returnflag", "n",
                F.round(var, 4).alias("var_price"),
                F.round(F.sqrt(var), 4).alias("std_price"),
                F.round(cov / F.sqrt(var * vy), 6).alias("corr_pq"))
            .orderBy("l_returnflag"))


def dq40_window_analytics(spark: SparkSession, sf: str) -> DataFrame:
    """Analytic-window battery: lag / lead / dense_rank / ntile /
    cume_dist over one window spec — Spark evaluates all five in a
    single Window physical operator (one sort per partition, no
    re-shuffle per function). The ORDER BY includes the unique
    o_orderkey so every function is deterministic."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf, "orders")
    w = (Window.partitionBy("o_orderpriority")
         .orderBy("o_orderdate", "o_orderkey"))
    return (orders.select(
                "o_orderpriority", "o_orderkey",
                F.lag("o_totalprice").over(w).alias("prev_price"),
                F.lead("o_totalprice").over(w).alias("next_price"),
                F.dense_rank().over(w).alias("drnk"),
                F.ntile(4).over(w).alias("quartile"),
                F.round(F.cume_dist().over(w), 6).alias("cd"))
            .filter(F.col("o_orderkey") % 37 == 0)
            .orderBy("o_orderpriority", "o_orderkey"))


def dq41_approx_quantile(spark: SparkSession, sf: str) -> DataFrame:
    """KLL/GK-style approx percentile pinned against the exact value —
    same gate pattern as dq36: the boolean tolerance check is what the
    oracle asserts, so sketch drift fails the hash gate. The approx
    path is the 100 TB plan (mergeable sketch, no full sort); the exact
    interpolated percentile is the oracle-checkable anchor.

    ``spread`` on the order key parallelizes the percentile buffer
    build (guide §2.5): the single-row-group fixture scan ran BOTH
    percentile aggregates in one task — measured 3.46 → 1.24 s at
    sf0.1. Exact percentile is a sort, order-independent; the approx
    sketch's merge order changes only _ap's low bits, and the emitted
    ``within_1pct`` boolean sits ~100× inside its 1% tolerance
    (accuracy 10000), so the declared output is partitioning-
    invariant."""
    li = spread(load_table(spark, sf, "lineitem")
                .select("l_linestatus", "l_extendedprice", "l_orderkey"),
                "l_orderkey")
    return (li.groupBy("l_linestatus")
            .agg(F.expr("percentile(l_extendedprice, 0.5)").alias("_ex"),
                 F.expr("approx_percentile(l_extendedprice, 0.5, 10000)")
                 .alias("_ap"))
            .select("l_linestatus",
                    F.round("_ex", 4).alias("p50_exact"),
                    (F.abs(F.col("_ap") - F.col("_ex"))
                     <= F.greatest(F.col("_ex") * 0.01, F.lit(0.01)))
                    .alias("within_1pct"))
            .orderBy("l_linestatus"))


def dq42_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered funnel (signup → click → purchase), the event-analytics
    query the reference's collector feeds downstream.

    Scale shape: ONE shuffle — events filtered to the funnel types,
    collected per user into a sorted (ts, type) array, then each stage
    time is an order-insensitive HOF pass over that array (t1 = min
    signup ts; t2 = min click ts ≥ t1; t3 = min purchase ts ≥ t2).
    No per-stage joins: a 3-stage funnel over 100 TB is still one
    exchange of (user, small-array) rows. The HOF passes use min-over-
    filter rather than a sequential fold so equal-timestamp events
    can't order-flip the verdict."""
    ev = (load_table(spark, sf, "events")
          .filter(F.col("event_type").isin("signup", "click", "purchase"))
          .select("user_id", "ts", "event_type"))
    per_user = (ev.groupBy("user_id")
                .agg(F.collect_list(F.struct("ts", "event_type"))
                     .alias("_ev")))

    def stage_min(events, typ, after):
        hits = F.filter(
            events, lambda e: (e["event_type"] == typ)
            & (F.lit(True) if after is None else e["ts"] >= after))
        return F.array_min(F.transform(hits, lambda e: e["ts"]))

    staged = (per_user
              .withColumn("t1", stage_min(F.col("_ev"), "signup", None))
              .withColumn("t2", stage_min(F.col("_ev"), "click",
                                          F.col("t1")))
              .withColumn("t3", stage_min(F.col("_ev"), "purchase",
                                          F.col("t2"))))
    return staged.agg(
        F.count(F.col("t1")).alias("n_signup"),
        F.count(F.col("t2")).alias("n_then_click"),
        F.count(F.col("t3")).alias("n_then_purchase"))


def dq43_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort retention: users grouped by first-active day, retained-at
    day +1/+3/+7 counts. Two aggregations, NO Expand: per-(user,
    cohort) presence flags first (one shuffle on user), then a plain
    sum per cohort — the multi-countDistinct formulation would expand
    every (user, day) row 4× before its shuffle."""
    ev = load_table(spark, sf, "events")
    ud = (ev.select("user_id", F.to_date("ts").alias("d")).distinct())
    first = ud.groupBy("user_id").agg(F.min("d").alias("d0"))
    flags = (ud.join(first, "user_id")
             .groupBy("user_id", "d0")
             .agg(*[F.max((F.datediff(F.col("d"), F.col("d0")) == k)
                          .cast("int")).alias(f"f{k}")
                    for k in (1, 3, 7)]))
    return (flags.groupBy("d0")
            .agg(F.count("*").alias("n_users"),
                 F.sum("f1").alias("r1"),
                 F.sum("f3").alias("r3"),
                 F.sum("f7").alias("r7"))
            .orderBy("d0"))


QUERIES = {
    "dq01_projection": dq01_projection,
    "dq02_whitelist": dq02_whitelist,
    "dq03_late_split": dq03_late_split,
    "dq04_sink_envelope": dq04_sink_envelope,
    "dq05_route_fanout": dq05_route_fanout,
    "dq06_max_offset": dq06_max_offset,
    "dq07_zone_map": dq07_zone_map,
    "dq08_hash_agg": dq08_hash_agg,
    "dq09_distinct_agg": dq09_distinct_agg,
    "dq10_rollup": dq10_rollup,
    "dq11_sum_cents": dq11_sum_cents,
    "dq12_join_dim": dq12_join_dim,
    "dq13_multi_join": dq13_multi_join,
    "dq14_semi_anti": dq14_semi_anti,
    "dq15_outer_join": dq15_outer_join,
    "dq16_window": dq16_window,
    "dq17_dedup_first": dq17_dedup_first,
    "dq18_topk": dq18_topk,
    "dq19_truncate": dq19_truncate,
    "dq20_safe_cast": dq20_safe_cast,
    "dq21_set_ops": dq21_set_ops,
    "dq22_array_funcs": dq22_array_funcs,
    "dq23_hash": dq23_hash,
    "dq24_scalars": dq24_scalars,
    "dq25_udf_shape": dq25_udf_shape,
    "dq26_epoch_conversions": dq26_epoch_conversions,
    "dq27_scalar_encode": dq27_scalar_encode,
    "dq29_envelope_parse": dq29_envelope_parse,
    "dq30_tumbling_window": dq30_tumbling_window,
    "dq31_asof_join": dq31_asof_join,
    "dq47_sliding_window": dq47_sliding_window,
    "dq32_salted_agg": dq32_salted_agg,
    "dq33_percentile": dq33_percentile,
    "dq34_range_join": dq34_range_join,
    "dq35_sessionize": dq35_sessionize,
    "dq36_approx_distinct": dq36_approx_distinct,
    "dq37_hash_split": dq37_hash_split,
    "dq38_cube": dq38_cube,
    "dq39_pivot": dq39_pivot,
    "dq40_window_analytics": dq40_window_analytics,
    "dq41_approx_quantile": dq41_approx_quantile,
    "dq42_funnel": dq42_funnel,
    "dq43_retention": dq43_retention,
    "dq44_grouping_sets": dq44_grouping_sets,
    "dq45_range_frame": dq45_range_frame,
    "dq46_stats_agg": dq46_stats_agg,
}

# DuckDB oracle SQL — identical aliases & result types by construction.
ORACLE = {
    "dq01_projection": """
        SELECT event_id, event_type FROM events ORDER BY event_id LIMIT 100
    """,
    "dq02_whitelist": """
        SELECT event_id, event_type FROM events
        WHERE event_type IN ('click', 'view') ORDER BY event_id LIMIT 100
    """,
    "dq03_late_split": """
        SELECT CASE WHEN ts >= (SELECT max(ts) - INTERVAL 1 DAY FROM events)
                    THEN 'rt' ELSE 'hist' END AS bucket,
               count(*) AS n
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "dq04_sink_envelope": """
        SELECT event_id,
               concat(event_type, ':', CAST(user_id AS VARCHAR)) AS env
        FROM events ORDER BY event_id LIMIT 100
    """,
    "dq05_route_fanout": """
        SELECT event_type, count(*) AS n FROM events
        GROUP BY event_type ORDER BY event_type
    """,
    "dq06_max_offset": """
        SELECT user_id % 16 AS part, max(event_id) AS max_off
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "dq07_zone_map": """
        SELECT min(l_shipdate) AS mn, max(l_shipdate) AS mx, count(*) AS n
        FROM lineitem
    """,
    "dq08_hash_agg": """
        SELECT l_returnflag, l_linestatus,
               round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_qty,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_price,
               round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS avg_disc,
               count(*) AS n
        FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "dq09_distinct_agg": """
        SELECT count(DISTINCT o_custkey) AS n FROM orders
    """,
    "dq10_rollup": """
        SELECT o_orderpriority, o_orderstatus, count(*) AS n
        FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        ORDER BY 1 NULLS FIRST, 2 NULLS FIRST
    """,
    "dq11_sum_cents": """
        SELECT count(*) AS n,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
        FROM orders
    """,
    "dq12_join_dim": """
        SELECT n_name, count(*) AS c
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1 ORDER BY 1
    """,
    "dq13_multi_join": """
        SELECT o_orderkey,
               round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 4) AS rev
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey ORDER BY rev DESC, o_orderkey LIMIT 10
    """,
    "dq14_semi_anti": """
        SELECT 'semi' AS side, count(*) AS n FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders)
        UNION ALL
        SELECT 'anti' AS side, count(*) AS n FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    "dq15_outer_join": """
        SELECT count(*) AS n
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        WHERE o.o_orderkey IS NULL
    """,
    "dq16_window": """
        SELECT user_id, event_id, rnk FROM (
          SELECT user_id, event_id,
                 CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER) AS rnk
          FROM events)
        WHERE rnk <= 2 ORDER BY user_id, rnk LIMIT 100
    """,
    "dq17_dedup_first": """
        SELECT count(*) AS n FROM (
          SELECT row_number() OVER (
                   PARTITION BY user_id, date_trunc('second', ts)
                   ORDER BY event_id) AS rn
          FROM events) WHERE rn = 1
    """,
    "dq18_topk": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    "dq19_truncate": """
        SELECT doc_id, substring(text, 1, 100) AS t
        FROM documents ORDER BY doc_id LIMIT 50
    """,
    "dq20_safe_cast": """
        SELECT count(*) AS n FROM events
        WHERE try_cast(props AS DOUBLE) IS NULL
    """,
    "dq21_set_ops": """
        SELECT c_nationkey FROM customer
        INTERSECT
        SELECT s_nationkey FROM supplier
        ORDER BY 1
    """,
    "dq22_array_funcs": """
        SELECT vec_id,
               round(CAST(embedding[1] AS DOUBLE), 4) AS e0,
               CAST(len(embedding) AS INTEGER) AS n_dims
        FROM embeddings ORDER BY vec_id LIMIT 50
    """,
    "dq23_hash": """
        SELECT count(DISTINCT hash(event_type)) AS n FROM events
    """,
    "dq24_scalars": """
        SELECT upper(event_type) AS et,
               CAST(length(event_type) AS INTEGER) AS len,
               abs(value) > 0.5 AS big,
               CAST(year(ts) AS INTEGER) AS yr
        FROM events ORDER BY event_id LIMIT 100
    """,
    "dq25_udf_shape": """
        SELECT lang,
               round(CAST(sum(n_chars) AS DOUBLE) / count(*), 4) AS avg_chars,
               count(*) AS n
        FROM documents GROUP BY lang ORDER BY lang
    """,
    "dq26_epoch_conversions": """
        SELECT event_id,
               epoch_ms(ts) AS ep_ms,
               epoch_ms(ts) // 86400000 AS day_idx,
               CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
                    AS INTEGER) AS day_diff
        FROM events ORDER BY event_id LIMIT 100
    """,
    "dq27_scalar_encode": """
        SELECT event_id,
               concat('{"k":', k, ',"ks":[', k, ',', k + 1, ']}') AS js,
               strftime(ts, '%Y%m%d') AS basic_iso,
               strftime(ts, '%Y-%m-%dT%H:%M:%S.%g') AS iso_ts
        FROM (SELECT event_id, ts,
                     CAST(json_extract(props, '$.k') AS BIGINT) AS k
              FROM events ORDER BY event_id LIMIT 100)
        ORDER BY event_id
    """,
    "dq29_envelope_parse": """
        SELECT event_type,
               CAST(sum(k) AS BIGINT) AS k_sum, count(k) AS k_n,
               min(k) AS k_min, max(k) AS k_max
        FROM (SELECT event_type,
                     TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
              FROM events)
        GROUP BY event_type ORDER BY event_type
    """,
    "dq30_tumbling_window": """
        SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts),
                        '%Y-%m-%d %H:%M:%S') AS ws,
               event_type, count(*) AS n,
               round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4)
                 AS val_sum
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "dq47_sliding_window": """
        WITH buckets AS (
          SELECT time_bucket(INTERVAL 15 MINUTE, ts)
                   - k.k * INTERVAL 15 MINUTE AS ws,
                 value
          FROM events
          CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k),
        agg AS (
          SELECT ws, count(*) AS n,
                 round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE),
                       4) AS val_sum
          FROM buckets GROUP BY ws)
        SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS ws, n, val_sum
        FROM agg ORDER BY ws
    """,
    "dq31_asof_join": """
        WITH clicks AS (
          SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'click'),
        views AS (
          SELECT user_id, ts, view_id, view_value FROM (
            SELECT user_id, ts, event_id AS view_id, value AS view_value,
                   row_number() OVER (PARTITION BY user_id, ts
                                      ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'view') WHERE rn = 1)
        SELECT c.event_id, c.user_id, v.view_id,
               round(v.view_value, 4) AS view_value
        FROM clicks c ASOF LEFT JOIN views v
          ON c.user_id = v.user_id AND v.ts <= c.ts
        ORDER BY c.event_id
    """,
    "dq32_salted_agg": """
        SELECT event_type, count(*) AS n,
               round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4)
                 AS val_sum,
               max(event_id) AS mx
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "dq33_percentile": """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 4) AS p50,
               round(quantile_cont(value, 0.95), 4) AS p95
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "dq34_range_join": """
        WITH bands AS (
          SELECT i AS band, i / 10.0 AS lo, (i + 1) / 10.0 AS hi
          FROM generate_series(0, 9) t(i))
        SELECT CAST(band AS INTEGER) AS band, count(*) AS n,
               round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4)
                 AS val_sum
        FROM events JOIN bands ON value >= lo AND value < hi
        GROUP BY band ORDER BY band
    """,
    "dq35_sessionize": """
        WITH g AS (
          SELECT user_id, event_id, ts,
                 -- floored seconds, matching Spark's cast(ts as long)
                 -- truncation (same latent boundary class as dq45: a
                 -- fractional-second gap of 1800.x must not compare
                 -- differently across engines)
                 CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                        - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id)
                        > 1800
                      OR lag(ts) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id)
                        IS NULL
                      THEN 1 ELSE 0 END AS new_s
          FROM events),
        s AS (
          SELECT user_id, event_id,
                 CAST(sum(new_s) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
          FROM g)
        SELECT user_id, session_seq, count(*) AS n_events,
               min(event_id) AS first_event, max(event_id) AS last_event
        FROM s GROUP BY user_id, session_seq
        ORDER BY user_id, session_seq
    """,
    "dq36_approx_distinct": """
        SELECT event_type, count(DISTINCT user_id) AS exact_n,
               TRUE AS within_5pct
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "dq38_cube": """
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n,
               CAST(GROUPING(event_type) * 2 + GROUPING(CAST(ts AS DATE))
                    AS INTEGER) AS gid
        FROM events
        GROUP BY CUBE(event_type, CAST(ts AS DATE))
        ORDER BY gid, event_type NULLS LAST, day NULLS LAST
    """,
    "dq39_pivot": """
        SELECT CAST(ts AS DATE) AS day,
               count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
               count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
               count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
               count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
               count(CASE WHEN event_type = 'view' THEN 1 END) AS view
        FROM events GROUP BY 1 ORDER BY day
    """,
    "dq40_window_analytics": """
        SELECT * FROM (
          SELECT o_orderpriority, o_orderkey,
                 lag(o_totalprice) OVER w AS prev_price,
                 lead(o_totalprice) OVER w AS next_price,
                 CAST(dense_rank() OVER w AS INTEGER) AS drnk,
                 CAST(ntile(4) OVER w AS INTEGER) AS quartile,
                 round(cume_dist() OVER w, 6) AS cd
          FROM orders
          WINDOW w AS (PARTITION BY o_orderpriority
                       ORDER BY o_orderdate, o_orderkey))
        WHERE o_orderkey % 37 = 0
        ORDER BY o_orderpriority, o_orderkey
    """,
    "dq41_approx_quantile": """
        SELECT l_linestatus,
               round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
               TRUE AS within_1pct
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
    """,
    "dq42_funnel": """
        WITH f AS (
          SELECT user_id, ts, event_type FROM events
          WHERE event_type IN ('signup', 'click', 'purchase')),
        t1 AS (
          SELECT user_id, min(ts) AS t1 FROM f
          WHERE event_type = 'signup' GROUP BY user_id),
        t2 AS (
          SELECT f.user_id, min(f.ts) AS t2
          FROM f JOIN t1 USING (user_id)
          WHERE f.event_type = 'click' AND f.ts >= t1.t1
          GROUP BY f.user_id),
        t3 AS (
          SELECT f.user_id, min(f.ts) AS t3
          FROM f JOIN t2 USING (user_id)
          WHERE f.event_type = 'purchase' AND f.ts >= t2.t2
          GROUP BY f.user_id)
        SELECT (SELECT count(*) FROM t1) AS n_signup,
               (SELECT count(*) FROM t2) AS n_then_click,
               (SELECT count(*) FROM t3) AS n_then_purchase
    """,
    "dq43_retention": """
        WITH ud AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        first AS (
          SELECT user_id, min(d) AS d0 FROM ud GROUP BY user_id),
        flags AS (
          SELECT ud.user_id, f.d0,
                 max(CASE WHEN ud.d - f.d0 = 1 THEN 1 ELSE 0 END) AS f1,
                 max(CASE WHEN ud.d - f.d0 = 3 THEN 1 ELSE 0 END) AS f3,
                 max(CASE WHEN ud.d - f.d0 = 7 THEN 1 ELSE 0 END) AS f7
          FROM ud JOIN first f USING (user_id)
          GROUP BY ud.user_id, f.d0)
        SELECT d0, count(*) AS n_users,
               CAST(sum(f1) AS BIGINT) AS r1,
               CAST(sum(f3) AS BIGINT) AS r3,
               CAST(sum(f7) AS BIGINT) AS r7
        FROM flags GROUP BY d0 ORDER BY d0
    """,
    "dq46_stats_agg": """
        WITH a AS (
          SELECT l_returnflag,
                 count(*) AS n,
                 sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS sx,
                 sum(CAST(l_quantity AS DECIMAL(18,6))) AS sy,
                 sum(CAST(l_extendedprice AS DECIMAL(30,6))
                     * CAST(l_extendedprice AS DECIMAL(30,6))) AS sxx,
                 sum(CAST(l_quantity AS DECIMAL(30,6))
                     * CAST(l_quantity AS DECIMAL(30,6))) AS syy,
                 sum(CAST(l_extendedprice AS DECIMAL(30,6))
                     * CAST(l_quantity AS DECIMAL(30,6))) AS sxy
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, CAST(n AS BIGINT) AS n,
               round((CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                        / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1), 4)
                 AS var_price,
               round(sqrt((CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                        / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)), 4)
                 AS std_price,
               round(((CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                         / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1))
                     / sqrt(((CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                         / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1))
                      * ((CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                         / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1))), 6)
                 AS corr_pq
        FROM a ORDER BY l_returnflag
    """,
    "dq45_range_frame": """
        WITH ev AS (
          SELECT user_id, ts, value,
                 -- floor, not CAST: Spark's unix_timestamp TRUNCATES
                 -- fractional seconds while DuckDB's CAST(double AS
                 -- BIGINT) rounds half-up — an event at x.7s rounded
                 -- to x+1 flipped membership of an exactly-3600s-away
                 -- window boundary at sf0.1 (user 638, 2024-01-14)
                 CAST(floor(epoch(ts)) AS BIGINT) AS _sec
          FROM events WHERE user_id % 29 = 0)
        SELECT user_id, ts,
               CAST(count(*) OVER w AS BIGINT) AS n_1h,
               round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w
                          AS DOUBLE), 4) AS sum_1h
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY _sec
                     RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, ts
    """,
    "dq44_grouping_sets": """
        SELECT event_type, CAST(ts AS DATE) AS day,
               count(*) AS n,
               round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4)
                 AS val_sum,
               CAST(GROUPING(event_type) * 2 + GROUPING(CAST(ts AS DATE))
                    AS INTEGER) AS gid
        FROM events
        GROUP BY GROUPING SETS ((event_type, CAST(ts AS DATE)),
                                (event_type), ())
        ORDER BY gid, event_type NULLS LAST, day NULLS LAST
    """,
    "dq37_hash_split": """
        WITH b AS (
          SELECT o_totalprice,
                 CAST('0x' || substring(
                        md5(CAST(o_orderkey AS VARCHAR)), 1, 8)
                      AS UBIGINT) % 100 AS bucket
          FROM orders),
        s AS (
          SELECT CASE WHEN bucket < 10 THEN 'train' ELSE 'test' END AS part,
                 o_totalprice
          FROM b)
        SELECT part, count(*) AS n,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM s GROUP BY part ORDER BY part
    """,
}
