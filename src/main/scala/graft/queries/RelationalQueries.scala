package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.schemas.Tables
import graft.util.Checkpointer.CheckpointSyntax

/** Relational operator suite (SURVEY.md §2.2–§2.6) over the driver testdata.
  *
  * Oracle-parity discipline: money columns in the testdata carry exactly two
  * decimals, so every float aggregate is computed in exact DECIMAL(12,2)
  * arithmetic and only cast to DOUBLE at the very end — the cast of an exact
  * decimal to double is correctly rounded in both Spark and DuckDB, so results
  * hash-match bit-for-bit regardless of partitioning / accumulation order.
  */
object RelationalQueries {

  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))
  private val one = lit(1).cast(DecimalType(12, 2))

  type Q = (SparkSession, String) => DataFrame

  /** q01 — TPC-H Q1-shaped pricing summary: filter → hash agg (partial+final)
    * → sort. Exercises A1/A5-style grouped aggregation (SURVEY.md §2.4). */
  val q01PricingSummary: Q = (spark, dir) => {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem")
      .filter($"l_shipdate" <= lit("2000-12-01").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(dec($"l_quantity")).cast("double").as("sum_qty"),
        sum(dec($"l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec($"l_extendedprice") * (one - dec($"l_discount"))).cast("double").as("sum_disc_price"),
        sum(dec($"l_extendedprice") * (one - dec($"l_discount")) * (one + dec($"l_tax"))).cast("double").as("sum_charge"),
        (sum(dec($"l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec($"l_extendedprice")).cast("double") / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** q02 — 3-way dim join chain customer⋈nation⋈region (J2-shaped) with
    * broadcast-able dims + grouped agg. */
  val q02RegionRevenue: Q = (spark, dir) => {
    import spark.implicits._
    val customer = Tables.load(spark, dir, "customer")
    val nation = Tables.load(spark, dir, "nation")
    val region = Tables.load(spark, dir, "region")
    val orders = Tables.load(spark, dir, "orders")
    orders
      .join(customer, $"o_custkey" === $"c_custkey")
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(
        sum(dec($"o_totalprice")).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy($"r_name", $"n_name")
  }

  /** q03 — top-k with deterministic tiebreak: plans as TakeOrderedAndProject,
    * no cluster-wide sort (W2, SURVEY.md §2.5). Raw doubles pass through
    * untouched → bit-identical across engines. */
  val q03TopOrders: Q = (spark, dir) => {
    import spark.implicits._
    Tables.load(spark, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(10)
  }

  /** q04 — filter + grouped count (exact longs). */
  val q04PriorityCount: Q = (spark, dir) => {
    import spark.implicits._
    Tables.load(spark, dir, "orders")
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
      .groupBy($"o_orderpriority", $"o_orderstatus")
      .agg(count(lit(1)).as("n"))
      .orderBy($"o_orderpriority", $"o_orderstatus")
  }

  /** q05 — the flagship J1 co-engagement self-join (SURVEY.md §2.3 J1;
    * reference Cypher at project/metrics/community_detection.py:24-27):
    * suppliers are "users", orders are "posts"; weight = co-engaged orders.
    * Equi key (l_orderkey) + theta predicate (u1 < u2) → Catalyst plans a
    * shuffle-hash/sort-merge on the equi key with the `<` as join filter. */
  val q05Coengagement: Q = (spark, dir) => {
    import spark.implicits._
    val e = Tables.load(spark, dir, "lineitem")
      .select($"l_orderkey".as("post"), $"l_suppkey".as("user"))
      .distinct()
    e.as("a").join(e.as("b"),
        $"a.post" === $"b.post" && $"a.user" < $"b.user")
      .groupBy($"a.user".as("u1"), $"b.user".as("u2"))
      .agg(count(lit(1)).as("weight"))
  }

  /** q06 — window functions over the events stream table: row_number + lag
    * with deterministic tiebreak (W3-shaped). */
  val q06WindowRank: Q = (spark, dir) => {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    Tables.load(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .withColumn("prev_value", lag($"value", 1).over(w))
      .select($"event_id", $"user_id", $"rn", $"prev_value")
  }

  /** q07 — sessionization: 30-min-gap sessions via lag + running conditional
    * sum (the standard watermark-free batch formulation). */
  val q07Sessionize: Q = (spark, dir) => {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val withGap = Tables.load(spark, dir, "events")
      .withColumn("prev_ts", lag($"ts", 1).over(w))
      .withColumn("new_session",
        when($"prev_ts".isNull ||
          unix_timestamp($"ts") - unix_timestamp($"prev_ts") > 1800, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum($"new_session").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withGap
      .groupBy($"user_id", $"session_seq")
      .agg(count(lit(1)).as("n_events"))
      .groupBy($"user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        max($"n_events").as("max_session_events"),
        sum($"n_events").as("n_total"))
      .orderBy($"user_id")
  }

  /** q08 — from_json extraction (X11) + tagged aggregation: parse the
    * `props` JSON payload with an explicit schema (no inference — mirrors the
    * declared-schema discipline of SURVEY.md §1.4). */
  val q08JsonExtract: Q = (spark, dir) => {
    import spark.implicits._
    val schema = StructType(Seq(StructField("k", LongType)))
    Tables.load(spark, dir, "events")
      .withColumn("k", from_json($"props", schema).getField("k"))
      .groupBy($"event_type")
      .agg(
        sum($"k").as("sum_k"),
        count($"k").as("n_k"),
        min($"k").as("min_k"),
        max($"k").as("max_k"))
      .orderBy($"event_type")
  }

  /** q09 — anti join (SET1-shaped set difference): customers with no 1995
    * orders. */
  val q09AntiJoin: Q = (spark, dir) => {
    import spark.implicits._
    val customer = Tables.load(spark, dir, "customer")
    val orders95 = Tables.load(spark, dir, "orders")
      .filter($"o_orderdate" < lit("1996-01-01").cast("timestamp"))
    customer
      .join(orders95, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_mktsegment")
  }

  /** q10 — semi join (F6-shaped mutual restriction): suppliers that shipped
    * to at least one order of a BUILDING-segment customer. */
  val q10SemiJoin: Q = (spark, dir) => {
    import spark.implicits._
    val supplier = Tables.load(spark, dir, "supplier")
    val customer = Tables.load(spark, dir, "customer")
      .filter($"c_mktsegment" === "BUILDING")
    val orders = Tables.load(spark, dir, "orders")
      .join(customer, $"o_custkey" === $"c_custkey", "left_semi")
    val li = Tables.load(spark, dir, "lineitem")
      .join(orders, $"l_orderkey" === $"o_orderkey", "left_semi")
    supplier
      .join(li, $"s_suppkey" === $"l_suppkey", "left_semi")
      .select($"s_suppkey", $"s_name")
  }

  /** q11 — null/empty→"unknown" coalescing (F1; reference `clean` at
    * project/neo4j/consumer_user.py:39-41) + distinct (A11). */
  val q11UnknownCoalesce: Q = (spark, dir) => {
    import spark.implicits._
    Tables.load(spark, dir, "part")
      .select(
        coalesce(nullif(trim($"p_brand"), lit("")), lit("unknown")).as("brand"),
        coalesce(nullif(trim($"p_type"), lit("")), lit("unknown")).as("ptype"))
      .distinct()
  }

  /** q12 — SCD-2 interval materialization (M1-shaped, SURVEY.md §2.10):
    * each (user, event_type) observation opens an interval closed by the
    * user's next event; open intervals keep valid_to NULL. Timestamps are
    * surfaced as epoch micros (integer) for engine-portable hashing. */
  val q12Scd2Intervals: Q = (spark, dir) => {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    Tables.load(spark, dir, "events")
      .withColumn("valid_from", $"ts")
      .withColumn("valid_to", lead($"ts", 1).over(w))
      .select(
        $"user_id",
        $"event_type".as("community"),
        (unix_timestamp($"valid_from") * 1000000L +
          (date_format($"valid_from", "SSSSSS")).cast("long")).as("valid_from_us"),
        (unix_timestamp($"valid_to") * 1000000L +
          (date_format($"valid_to", "SSSSSS")).cast("long")).as("valid_to_us"),
        $"event_id")
  }

  /** q13 — degree table of the co-engagement graph (A8): unpivot endpoints
    * via explode + grouped count. */
  val q13Degrees: Q = (spark, dir) => {
    import spark.implicits._
    // degrees over the STORED graph (the reference reads them off Neo4j,
    // not by re-projecting engagements): the session-cached projection is
    // the same salted co-engagement edge set q05 computes — spec'd equal —
    // with node ids = supplier keys, so the oracle is unchanged
    val edges = graft.graph.Projection.supplierGraph(spark, dir)
    edges
      .select(explode(array($"src", $"dst")).as("user"))
      .groupBy($"user")
      .agg(count(lit(1)).as("degree"))
  }

  /** q14 — set ops: market segments present among 1995 buyers INTERSECT
    * segments among high-balance customers, minus an EXCEPT branch (SET1/SET2). */
  val q14SetOps: Q = (spark, dir) => {
    import spark.implicits._
    val customer = Tables.load(spark, dir, "customer")
    val orders = Tables.load(spark, dir, "orders")
    val buyers95 = customer
      .join(orders.filter($"o_orderdate" < lit("1996-01-01").cast("timestamp")),
        $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_mktsegment")
    val rich = customer.filter($"c_acctbal" > 5000).select($"c_mktsegment")
    buyers95.intersect(rich)
  }

  /** q19 — hierarchical subtotals via ROLLUP (free from Catalyst; the
    * reference never needed it, the warehouse layer gets it anyway). */
  val q19Rollup: Q = (spark, dir) => {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem")
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(sum(dec($"l_quantity")).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
  }

  /** q28 — as-of join (temporal point join): each event picks the user's
    * latest order with orderdate ≤ event time. Single-shuffle union+window
    * formulation (see [[graft.operators.AsOfJoin]]); DuckDB's native ASOF
    * JOIN is the oracle. */
  val q28AsOf: Q = (spark, dir) => {
    import spark.implicits._
    val events = Tables.load(spark, dir, "events")
      .select($"event_id", $"user_id", $"ts")
    val orders = Tables.load(spark, dir, "orders")
      .filter($"o_custkey" <= 150)
      .select(($"o_custkey" - 1).as("user_id"), $"o_orderdate".as("ots"), $"o_orderkey")
      .groupBy($"user_id", $"ots")
      .agg(max($"o_orderkey").as("asof_order")) // dedup ties deterministically
    graft.operators.AsOfJoin.asOf(events, orders, "user_id", "ts", "ots",
        payload = Seq("asof_order"))
      .select($"event_id", $"user_id", $"asof_order")
  }

  /** q29 — the same as-of join through the CUSTOM PHYSICAL OPERATOR
    * (AsOfJoinPlan → AsOfJoinStrategy → AsOfJoinExec: co-partitioned
    * sorted merge, graft.plans). Same oracle as q28 — a library-defined
    * SparkPlan under the DuckDB correctness gate. */
  val q29AsOfPlanned: Q = (spark, dir) => {
    import spark.implicits._
    val events = Tables.load(spark, dir, "events")
      .select($"event_id", $"user_id", $"ts")
    val orders = Tables.load(spark, dir, "orders")
      .filter($"o_custkey" <= 150)
      .select(($"o_custkey" - 1).as("user_id"), $"o_orderdate".as("ots"), $"o_orderkey")
      .groupBy($"user_id", $"ots")
      .agg(max($"o_orderkey").as("asof_order"))
    graft.operators.AsOfJoin.asOfPlanned(events, orders, "user_id", "ts", "ots",
        payload = Seq("asof_order"))
      .select($"event_id", $"user_id", $"asof_order")
  }

  /** q54 — tumbling-window aggregation (the batch shape of the streaming
    * windowed agg, ST1/event-time): 1-hour buckets over the events stream
    * table. */
  val q54TumblingWindow: Q = (spark, dir) => {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .groupBy(window($"ts", "1 hour").getField("start").as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(dec($"value")).cast("double").as("sum_value"))
      .select(unix_micros($"bucket").as("bucket_us"), $"n", $"sum_value")
      .orderBy($"bucket_us")
  }

  /** q56 — point-in-time (AS OF) read over the SCD-2 intervals built from
    * the event stream (M1 + Scd2.asOf): which "community" (event_type) was
    * each user in mid-month? */
  val q56Scd2AsOf: Q = (spark, dir) => {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val intervals = Tables.load(spark, dir, "events")
      .select($"user_id", $"event_type".as("community"),
        $"ts".as("valid_from"),
        lead($"ts", 1).over(w).as("valid_to"))
    graft.warehouse.Scd2.asOf(intervals, lit("2024-01-15 00:00:00").cast("timestamp"))
      .select($"user_id", $"community")
      .orderBy($"user_id")
  }

  /** q58 — STRUCTURED STREAMING under the DuckDB oracle: the events table
    * becomes a file-backed JSON topic, a real streaming query (declared
    * schema → watermark → tumbling window agg → complete mode → AvailableNow
    * drain) computes the same hourly buckets as batch q54, and the result
    * must hash-match the same SQL oracle. Streaming execution, batch
    * semantics — ST1/ST3 proven, not just exercised. */
  val q58StreamTumbling: Q = (spark, dir) => {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val topic = s"/tmp/graft_stream/${new java.io.File(dir).getName}/events"
    // the topic is a pure function of the events table — reuse an
    // already-produced one (text write's _SUCCESS marker); the query
    // under measurement is the streaming consumption, not the producer
    val marker = new org.apache.hadoop.fs.Path(topic + "/_SUCCESS")
    if (!marker.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(marker))
      Tables.load(spark, dir, "events")
        .select(to_json(struct($"event_id", $"ts", $"value")).as("value"))
        .coalesce(4)
        .write.mode("overwrite").text(topic)
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampType),
      StructField("value", DoubleType)))
    val agg = spark.readStream.schema(schema).json(topic)
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour").getField("start").as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(dec($"value")).cast("double").as("sum_value"))
      .select(unix_micros($"bucket").as("bucket_us"), $"n", $"sum_value")
    val qname = "graft_stream_tumbling"
    spark.catalog.dropTempView(qname)
    val q = agg.writeStream.format("memory").queryName(qname)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // materialize OUT of the memory sink, then drop its backing view: the
    // complete-mode sink pins every result row in the driver for as long
    // as the view exists — in an N-query benchmark session that residue
    // outlives the query (the round-5 sweep-inflation class). The
    // localCheckpoint hands the rows to block storage under the caller's
    // BlockRelease contract like every other checkpointed result.
    val out = spark.table(qname).orderBy($"bucket_us").cp()
    spark.catalog.dropTempView(qname)
    out
  }

  /** q55 — KMV sketch distinct counts per group (constant state per group
    * vs exact distinct's full-value shuffle — the 100 TB cardinality
    * estimator). Registered through the md5 hash tier
    * ([[graft.functions.KmvSketch.kmv_distinct_md5]]): the k-minimum
    * hashes — and therefore the estimate arithmetic — are reproducible in
    * DuckDB, putting the sketch under the full hash oracle (the q37/q38
    * md5-twin precedent); the fast native-hash tier stays the default and
    * keeps its accuracy-bound spec in KmvSketchSpec. */
  val q55KmvDistinct: Q = (spark, dir) => {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(graft.functions.KmvSketch.kmv_distinct_md5($"l_orderkey", 256).as("approx_orders"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag")
  }

  /** q52 — CSV sink + source round-trip (S10/S11; the reference's
    * `*_clusters.csv` export/import shape, metrics_interface.py:47-50):
    * write with header, read back with an explicit schema, aggregate.
    * The oracle sees the same parquet-derived values — a lossy round-trip
    * would hash-mismatch. */
  val q52CsvRoundtrip: Q = (spark, dir) => {
    import spark.implicits._
    val out = s"/tmp/graft_csv/${new java.io.File(dir).getName}/doc_langs"
    Tables.load(spark, dir, "documents")
      .select($"doc_id", $"lang", $"source")
      .write.mode("overwrite").option("header", "true").csv(out)
    spark.read.option("header", "true")
      .schema("doc_id LONG, lang STRING, source STRING").csv(out)
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n"), min($"doc_id").as("min_doc"), max($"doc_id").as("max_doc"))
  }

  /** q53 — date formatting + monthly revenue (X7/X8). */
  val q53MonthlyRevenue: Q = (spark, dir) => {
    import spark.implicits._
    Tables.load(spark, dir, "orders")
      .groupBy(date_format($"o_orderdate", "yyyy-MM").as("month"))
      .agg(sum(dec($"o_totalprice")).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy($"month")
  }

  /** q91 — Z-ORDER LAYOUT audit ([[graft.operators.ZOrderLayout]]): the
    * multi-dim clustering key for 100 TB file skipping. Both lineitem
    * keys quantize to 8 bits (integer `DIV` — never floor-of-float),
    * interleave into a 16-bit Morton z (codegen'd masked shifts), and the
    * query bins on `z >> 8` — i.e. drops 4 low bits per dim — so EVERY
    * bin is provably a ≤16×16 rectangle in the 256×256 quantized grid.
    * The per-bin (min, max) extents on BOTH dims are the oracled surface:
    * they are exactly the parquet min/max stats a z-ordered file layout
    * would carry, and their boundedness IS the two-sided pruning
    * property. One partial-agg exchange; the layout writer itself
    * (`layoutByZ`: range exchange + in-partition sort) is spec-covered. */
  val q91ZOrder: Q = (spark, dir) => {
    import spark.implicits._
    import graft.operators.ZOrderLayout
    val li = Tables.load(spark, dir, "lineitem")
    val mx = li.agg(max($"l_partkey").as("maxp"), max($"l_suppkey").as("maxs"))
    li.select($"l_partkey", $"l_suppkey")
      .crossJoin(broadcast(mx))
      .select(
        expr("CAST(l_partkey * 256 DIV (maxp + 1) AS BIGINT)").as("px"),
        expr("CAST(l_suppkey * 256 DIV (maxs + 1) AS BIGINT)").as("py"))
      .select($"px", $"py", ZOrderLayout.zValue($"px", $"py", 8).as("z"))
      .groupBy(shiftright($"z", 8).as("bin"))
      .agg(count(lit(1)).as("n"),
        min($"px").as("px_min"), max($"px").as("px_max"),
        min($"py").as("py_min"), max($"py").as("py_max"))
      .select($"bin", $"n", $"px_min", $"px_max", $"py_min", $"py_max",
        (($"px_max" - $"px_min" + 1) * ($"py_max" - $"py_min" + 1)).as("extent"))
  }

  /** q92 — KMV-SAMPLE QUANTILE SKETCH ([[graft.functions.KmvQuantile]]):
    * median/p-tiles of l_extendedprice without the global sort — the k
    * smallest md5 row-key hashes are a uniform sample harvested by ONE
    * TakeOrderedAndProject (per-partition heads, no data shuffle), and
    * the sketch answers every percentile from those k rows. Estimates
    * are VALUES FROM THE DATA selected by integer rank arithmetic — no
    * float op anywhere, so the whole surface replays exactly. */
  val q92KmvQuantiles: Q = (spark, dir) => {
    import spark.implicits._
    import graft.functions.KmvQuantile
    val keyed = Tables.load(spark, dir, "lineitem")
      .select($"l_extendedprice",
        conv(substring(md5(concat(lit("kq:"), $"l_orderkey", lit(":"),
          $"l_linenumber")), 1, 15), 16, 10).cast("long").as("h"))
    KmvQuantile.quantiles(keyed, "h", "l_extendedprice",
      k = 1024, pcts = Seq(1, 5, 10, 25, 50, 75, 90, 95, 99))
  }

  /** q96 — SKETCHED JOIN-SIZE ESTIMATION
    * ([[graft.functions.CmsSketch.joinSizeEstimate]]): |orders ⋈
    * lineitem| estimated from two count-min grids WITHOUT executing the
    * join — min_r Σ_b cmsO(r,b)·cmsL(r,b), the CM inner-product bound.
    * This is the 100 TB optimizer move: broadcast-vs-shuffle decisions
    * from two fixed d×w summaries built by one partial-agg pass each,
    * while the true join (computed here only as the oracle's truth
    * column) would shuffle both tables. Always an overestimate —
    * admissibility is a decidable output column. md5 hash rows ⇒ grids
    * and estimate replay bit-for-bit (q87 discipline). */
  val q96JoinSize: Q = (spark, dir) => {
    import spark.implicits._
    import graft.functions.CmsSketch
    val ok = Tables.load(spark, dir, "orders")
      .select($"o_orderkey".cast("string").as("k"))
    val lk = Tables.load(spark, dir, "lineitem")
      .select($"l_orderkey".cast("string").as("k"))
    val est = CmsSketch.joinSizeEstimate(
      CmsSketch.sketch(ok, "k"), CmsSketch.sketch(lk, "k"))
    val truth = ok.join(lk, "k").agg(count(lit(1)).as("true_join_size"))
    est.crossJoin(truth)
      .select($"est_join_size", $"true_join_size",
        ($"est_join_size" >= $"true_join_size").as("admissible"))
  }

  /** q97 — PER-GROUP HLL (distinct users per event type): the q88
    * sketch composed as a GROUPED aggregate — the realistic production
    * shape ("distinct X per Y" at 100 TB), where the exchange moves
    * ≤ 512 register rows per key per partition instead of user ids.
    * Same integer surface as q88 (registers → integer harmonic
    * denominator → single folded-literal division), per key; exact
    * per-key truth + milli-error alongside. */
  val q97GroupedHll: Q = (spark, dir) => {
    import spark.implicits._
    import graft.functions.HllSketch
    val ev = Tables.load(spark, dir, "events")
      .select($"event_type", $"user_id".cast("string").as("uid"))
      // two consumers (registers, exact truth): scan once
      .cp()
    val s = HllSketch.groupedSummary(
      HllSketch.groupedRegisters(ev, "event_type", "uid"), "event_type")
    val truth = ev.groupBy($"event_type")
      .agg(countDistinct($"uid").as("true_distinct"))
    val r = s.join(truth, "event_type")
      .select($"event_type", $"m", $"v_zero", $"s_harm", $"est_hll",
        $"true_distinct",
        expr("CAST((1000 * abs(est_hll - true_distinct)) DIV true_distinct AS BIGINT)")
          .as("err_milli"),
        $"lc_range")
      .cp()
    graft.util.BlockRelease.release(ev)
    r
  }

  val defs: Map[String, Q] = Map(
    "q97_grouped_hll" -> q97GroupedHll,
    "q96_join_size_sketch" -> q96JoinSize,
    "q91_zorder_layout" -> q91ZOrder,
    "q92_kmv_quantiles" -> q92KmvQuantiles,
    "q19_rollup" -> q19Rollup,
    "q28_asof_join" -> q28AsOf,
    "q29_asof_planned" -> q29AsOfPlanned,
    "q52_csv_roundtrip" -> q52CsvRoundtrip,
    "q53_monthly_revenue" -> q53MonthlyRevenue,
    "q54_tumbling_window" -> q54TumblingWindow,
    "q55_kmv_distinct" -> q55KmvDistinct,
    "q56_scd2_asof" -> q56Scd2AsOf,
    "q58_stream_tumbling" -> q58StreamTumbling,
    "q01_pricing_summary" -> q01PricingSummary,
    "q02_region_revenue" -> q02RegionRevenue,
    "q03_top_orders" -> q03TopOrders,
    "q04_priority_count" -> q04PriorityCount,
    "q05_coengagement" -> q05Coengagement,
    "q06_window_rank" -> q06WindowRank,
    "q07_sessionize" -> q07Sessionize,
    "q08_json_extract" -> q08JsonExtract,
    "q09_anti_join" -> q09AntiJoin,
    "q10_semi_join" -> q10SemiJoin,
    "q11_unknown_coalesce" -> q11UnknownCoalesce,
    "q12_scd2_intervals" -> q12Scd2Intervals,
    "q13_degrees" -> q13Degrees,
    "q14_set_ops" -> q14SetOps)

  /** q91's Morton interleave as literal SQL (generated — the same sum of
    * masked shifts the Spark side builds as Columns). */
  private val zInterleaveSql: String = (0 until 8).map(i =>
    s"(((px >> $i) & 1) << ${2 * i}) + (((py >> $i) & 1) << ${2 * i + 1})")
    .mkString(" + ")

  val oracles: Map[String, String] = Map(
    // q91 — the z-curve re-derived: same integer quantization (// is
    // floor division ≡ Spark DIV on non-negatives), same literal
    // masked-shift interleave, same >>8 tile binning. The per-bin
    // extents ARE the pruning property being oracled.
    "q91_zorder_layout" ->
      s"""WITH mx AS (SELECT max(l_partkey) AS maxp, max(l_suppkey) AS maxs FROM lineitem),
         |q AS (SELECT (l_partkey * 256 // (maxp + 1))::BIGINT AS px,
         |    (l_suppkey * 256 // (maxs + 1))::BIGINT AS py FROM lineitem, mx),
         |z AS (SELECT px, py, ($zInterleaveSql)::BIGINT AS z FROM q),
         |g AS (SELECT z >> 8 AS bin, count(*)::BIGINT AS n,
         |    min(px) AS px_min, max(px) AS px_max,
         |    min(py) AS py_min, max(py) AS py_max
         |  FROM z GROUP BY z >> 8)
         |SELECT bin, n, px_min, px_max, py_min, py_max,
         |  ((px_max - px_min + 1) * (py_max - py_min + 1))::BIGINT AS extent
         |FROM g""".stripMargin,
    // q97 — the per-key HLL re-derived: q88's register/denominator/
    // estimate pipeline grouped by event_type, same integer surface.
    "q97_grouped_hll" ->
      """WITH ev AS (SELECT event_type, user_id::VARCHAR AS uid FROM events),
        |h AS (SELECT event_type,
        |    ('0x' || substr(md5('hll:' || uid), 1, 15))::BIGINT AS h FROM ev),
        |rb AS (SELECT event_type, h >> 51 AS b,
        |    CASE WHEN (h & ((1::BIGINT << 51) - 1)) = 0 THEN 52
        |         ELSE 52 - length(bin(h & ((1::BIGINT << 51) - 1))) END AS rank
        |  FROM h),
        |regs AS (SELECT event_type, b, max(rank) AS reg FROM rb
        |  GROUP BY event_type, b),
        |s AS (SELECT event_type, count(*)::BIGINT AS n_present,
        |    sum(1::BIGINT << (52 - reg))::BIGINT AS s_present FROM regs
        |  GROUP BY event_type),
        |su AS (SELECT event_type, 512::BIGINT AS m,
        |    (512 - n_present)::BIGINT AS v_zero,
        |    (s_present + (512 - n_present) * (1::BIGINT << 52))::BIGINT AS s_harm
        |  FROM s),
        |e AS (SELECT event_type, m, v_zero, s_harm,
        |    floor((0.7213 / (1.0 + 1.079 / 512.0)) * 512.0 * 512.0 *
        |      4503599627370496.0 / CAST(s_harm AS DOUBLE))::BIGINT AS est_hll
        |  FROM su),
        |tr AS (SELECT event_type, count(DISTINCT uid)::BIGINT AS true_distinct
        |  FROM ev GROUP BY event_type)
        |SELECT e.event_type, m, v_zero, s_harm, est_hll, true_distinct,
        |  ((1000 * abs(est_hll - true_distinct)) // true_distinct)::BIGINT AS err_milli,
        |  v_zero > 0 AS lc_range
        |FROM e JOIN tr ON e.event_type = tr.event_type""".stripMargin,
    // q96 — both CMS grids re-derived (q87's hash rows over the key
    // strings), inner product per row, min over rows, true join size
    // from the actual join — admissibility decidable.
    "q96_join_size_sketch" ->
      """WITH ok AS (SELECT o_orderkey::VARCHAR AS k FROM orders),
        |lk AS (SELECT l_orderkey::VARCHAR AS k FROM lineitem),
        |go AS (SELECT rr.r,
        |    ((('0x' || substr(md5('cms:' || k), 1, 15))::BIGINT >> (15 * rr.r)) & 32767) % 512 AS b,
        |    count(*)::BIGINT AS c
        |  FROM ok, range(0, 3) rr(r) GROUP BY 1, 2),
        |gl AS (SELECT rr.r,
        |    ((('0x' || substr(md5('cms:' || k), 1, 15))::BIGINT >> (15 * rr.r)) & 32767) % 512 AS b,
        |    count(*)::BIGINT AS c
        |  FROM lk, range(0, 3) rr(r) GROUP BY 1, 2),
        |ip AS (SELECT go.r, sum(go.c * gl.c)::BIGINT AS ip
        |  FROM go JOIN gl ON go.r = gl.r AND go.b = gl.b GROUP BY go.r),
        |e AS (SELECT min(ip)::BIGINT AS est_join_size FROM ip),
        |tr AS (SELECT count(*)::BIGINT AS true_join_size
        |  FROM ok JOIN lk ON ok.k = lk.k)
        |SELECT est_join_size, true_join_size,
        |  est_join_size >= true_join_size AS admissible
        |FROM e, tr""".stripMargin,
    // q92 — the KMV quantile sample replayed exactly: same md5-prefix
    // u60 row-key hashes, same k smallest, same (value, hash) rank
    // order, same integer ceil(p·n/100) index — estimates are data
    // values, no float arithmetic anywhere.
    "q92_kmv_quantiles" ->
      """WITH h AS (SELECT l_extendedprice,
        |    ('0x' || substr(md5('kq:' || l_orderkey::VARCHAR || ':' ||
        |      l_linenumber::VARCHAR), 1, 15))::BIGINT AS h
        |  FROM lineitem),
        |s AS (SELECT l_extendedprice, h, row_number() OVER (ORDER BY h) AS hr FROM h),
        |smp AS (SELECT l_extendedprice, h FROM s WHERE hr <= 1024),
        |r AS (SELECT l_extendedprice AS v,
        |    row_number() OVER (ORDER BY l_extendedprice, h) AS rn,
        |    count(*) OVER () AS n FROM smp),
        |p AS (SELECT unnest([1, 5, 10, 25, 50, 75, 90, 95, 99]) AS pct)
        |SELECT pct::BIGINT AS pct, rn::BIGINT AS rn, v AS est_value, n::BIGINT AS k
        |FROM r, p WHERE rn = (pct * n + 99) // 100""".stripMargin,
    // q55 — the KMV sketch replayed exactly: same md5-prefix 64-bit
    // hashes (big-endian first 16 hex chars ≡ first 8 digest bytes), same
    // k-th-minimum selection over DISTINCT hashes, same estimate
    // arithmetic in the same op order (unsigned hash → double, / 2^64,
    // 255/u, round). Exact tier (< k distinct → the distinct count) is
    // the CASE's other arm.
    "q55_kmv_distinct" ->
      """WITH h AS (SELECT DISTINCT l_returnflag,
        |    ('0x' || substr(md5(l_orderkey::VARCHAR), 1, 16))::UBIGINT AS h
        |  FROM lineitem),
        |r AS (SELECT l_returnflag, h,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS nd FROM h),
        |g AS (SELECT l_returnflag, max(nd) AS nd,
        |    max(CASE WHEN rn = 256 THEN h END) AS kth FROM r GROUP BY 1),
        |c AS (SELECT l_returnflag, count(*) AS n_rows FROM lineitem GROUP BY 1)
        |SELECT g.l_returnflag,
        |  CASE WHEN g.nd < 256 THEN g.nd
        |    ELSE CAST(round(255.0 / (g.kth::DOUBLE / 18446744073709551616.0)) AS BIGINT)
        |  END AS approx_orders, c.n_rows
        |FROM g JOIN c USING (l_returnflag)
        |ORDER BY l_returnflag""".stripMargin,
    "q28_asof_join" ->
      """WITH o AS (SELECT o_custkey - 1 AS user_id, o_orderdate AS ots,
        |  max(o_orderkey) AS asof_order
        |  FROM orders WHERE o_custkey <= 150 GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, o.asof_order
        |FROM events e ASOF LEFT JOIN o
        |ON e.user_id = o.user_id AND o.ots <= e.ts""".stripMargin,
    "q29_asof_planned" ->
      """WITH o AS (SELECT o_custkey - 1 AS user_id, o_orderdate AS ots,
        |  max(o_orderkey) AS asof_order
        |  FROM orders WHERE o_custkey <= 150 GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, o.asof_order
        |FROM events e ASOF LEFT JOIN o
        |ON e.user_id = o.user_id AND o.ots <= e.ts""".stripMargin,
    "q54_tumbling_window" ->
      """SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS bucket_us,
        |COUNT(*) AS n,
        |CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q58_stream_tumbling" ->
      """SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS bucket_us,
        |COUNT(*) AS n,
        |CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q56_scd2_asof" ->
      """WITH iv AS (SELECT user_id, event_type AS community, ts AS valid_from,
        |  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS valid_to
        |  FROM events)
        |SELECT user_id, community FROM iv
        |WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
        |  AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15 00:00:00')
        |ORDER BY user_id""".stripMargin,
    "q52_csv_roundtrip" ->
      """SELECT lang, source, COUNT(*) AS n, MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        |FROM documents GROUP BY lang, source""".stripMargin,
    "q53_monthly_revenue" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
        |COUNT(*) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q19_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |COUNT(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_region_revenue" ->
      """SELECT r_name, n_name,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
        |COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q03_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q04_priority_count" ->
      """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY o_orderpriority, o_orderstatus ORDER BY o_orderpriority, o_orderstatus""".stripMargin,
    "q05_coengagement" ->
      """WITH e AS (SELECT DISTINCT l_orderkey AS post, l_suppkey AS usr FROM lineitem)
        |SELECT a.usr AS u1, b.usr AS u2, COUNT(*) AS weight
        |FROM e a JOIN e b ON a.post = b.post AND a.usr < b.usr
        |GROUP BY a.usr, b.usr""".stripMargin,
    "q06_window_rank" ->
      """SELECT event_id, user_id,
        |ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn,
        |LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_value
        |FROM events""".stripMargin,
    "q07_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
        |  FROM events
        |), s AS (
        |  SELECT user_id,
        |    CASE WHEN prev_ts IS NULL OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS new_session,
        |    ts, event_id FROM g
        |), r AS (
        |  SELECT user_id,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM s
        |), per AS (
        |  SELECT user_id, session_seq, COUNT(*) AS n_events FROM r GROUP BY user_id, session_seq
        |)
        |SELECT user_id, COUNT(*) AS n_sessions, MAX(n_events) AS max_session_events,
        |  SUM(n_events)::BIGINT AS n_total
        |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q08_json_extract" ->
      """SELECT event_type,
        |SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS sum_k,
        |COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k,
        |MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q09_anti_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderdate < TIMESTAMP '1996-01-01')""".stripMargin,
    "q10_semi_join" ->
      """SELECT s_suppkey, s_name FROM supplier WHERE EXISTS (
        |  SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND EXISTS (
        |    SELECT 1 FROM orders WHERE o_orderkey = l_orderkey AND EXISTS (
        |      SELECT 1 FROM customer WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING')))""".stripMargin,
    "q11_unknown_coalesce" ->
      """SELECT DISTINCT
        |COALESCE(NULLIF(TRIM(p_brand), ''), 'unknown') AS brand,
        |COALESCE(NULLIF(TRIM(p_type), ''), 'unknown') AS ptype
        |FROM part""".stripMargin,
    "q12_scd2_intervals" ->
      """SELECT user_id, event_type AS community,
        |epoch_us(ts) AS valid_from_us,
        |epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)) AS valid_to_us,
        |event_id
        |FROM events""".stripMargin,
    "q13_degrees" ->
      """WITH e AS (SELECT DISTINCT l_orderkey AS post, l_suppkey AS usr FROM lineitem),
        |w AS (SELECT a.usr AS u1, b.usr AS u2 FROM e a JOIN e b
        |  ON a.post = b.post AND a.usr < b.usr GROUP BY a.usr, b.usr),
        |ends AS (SELECT u1 AS usr FROM w UNION ALL SELECT u2 FROM w)
        |SELECT usr AS "user", COUNT(*) AS degree FROM ends GROUP BY usr""".stripMargin,
    "q14_set_ops" ->
      """SELECT c_mktsegment FROM customer WHERE EXISTS
        |  (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderdate < TIMESTAMP '1996-01-01')
        |INTERSECT
        |SELECT c_mktsegment FROM customer WHERE c_acctbal > 5000""".stripMargin)
}
