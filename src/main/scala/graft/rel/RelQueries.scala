package graft.rel

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.plans.AsOfJoin

/** Relational / dataflow core (SURVEY.md §2.B).
  *
  * The reference (cerndb/dist-keras) delegates all of this surface to
  * Spark itself — its examples use plain `select/filter/join/groupBy`
  * (`examples/mnist.py ~L60-90 [H]`, `examples/workflow.ipynb [H]`) — so
  * these queries are written as the idiomatic Catalyst forms we want the
  * optimizer to see: unbroken logical plans, pushdown-friendly filters,
  * explicit broadcast hints for dimension tables, DECIMAL(18,2) money
  * aggregates for cross-engine determinism (SURVEY.md §2 rules 1-6).
  *
  * Determinism conventions shared by every query here:
  *   - total ORDER BY on key columns (driver hash compare is order-sensitive)
  *   - `SUM(CAST(x AS DECIMAL(18,2)))` for money/measure sums
  *   - timestamps compared only after date_trunc / DATE cast
  *   - output column names match the DuckDB oracle exactly
  */
object RelQueries {

  /** Money columns in the testdata are exactly-2-decimal doubles
    * (verified), so the DECIMAL(18,2) cast is lossless; products of two
    * 2-dp values are exactly 4-decimal, so DECIMAL(18,4) is lossless for
    * them (a 2-dp cast of a product would hit round-half ties and
    * diverge between engines). Sums run in exact decimal —
    * order-insensitive under any partitioning — and the final value is
    * emitted as DOUBLE so both engines expose the identical float64. */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def dec4(c: Column): Column = c.cast(DecimalType(18, 4))
  private def sumDec(c: Column): Column = sum(dec(c)).cast("double")
  private def sumDec4(c: Column): Column = sum(dec4(c)).cast("double")

  // ----------------------------------------------------------------- scans

  /** Projection + computed column; Parquet reader must show ReadSchema
    * pruned to the 5 referenced columns. */
  def scanProject(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"),
        dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("double").as("disc_price"))
      // lineitem's (orderkey, linenumber) is non-unique in the testdata,
      // so the ORDER BY covers every output column to be total
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount", "disc_price")

  /** Conjunctive predicates — all pushable to the Parquet scan
    * (PushedFilters non-empty; verified in RelQueriesSpec). */
  def filterQ(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(
        col("l_shipdate").cast("date") >= lit("1996-01-01").cast("date") &&
        col("l_shipdate").cast("date") < lit("1998-01-01").cast("date") &&
        col("l_discount").between(0.03, 0.08) &&
        col("l_quantity") < 30 &&
        col("l_returnflag").isin("A", "R"))
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_discount"), col("l_returnflag"),
        col("l_shipdate").cast("date").cast("timestamp_ntz").as("ship_date"))
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_returnflag", "ship_date")

  // ----------------------------------------------------------------- joins

  /** Fact-to-dim equi join; AQE picks broadcast-hash at this size, SMJ at
    * scale — both correct because the plan stays declarative. */
  def joinInner(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"), "inner")
      .select(col("o_orderkey"), col("c_name"), col("o_totalprice"), col("c_mktsegment"))
      .orderBy("o_orderkey")

  /** Dim-chain with explicit broadcast hints: at 100 TB nation/region are
    * still tiny, so pinning broadcast avoids any chance of a shuffle. */
  def joinBroadcast(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("r_name"))
      .orderBy("c_custkey")

  /** Left outer + count(non-null) — customers with zero orders count 0. */
  def joinLeft(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy("c_custkey")

  /** Left-semi ≡ EXISTS: customers having at least one 'F' order. */
  def joinSemi(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(
        Tables.orders(spark, dir).filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  /** Left-anti ≡ NOT EXISTS: customers with no big-ticket order. The
    * filter is >300000 rather than "no orders at all" because every
    * testdata customer has at least one order — a 0-row anti-join hashes
    * an empty frame and proves only the schema (r14 verdict ask #3);
    * this predicate yields 3/30/308 rows at sf0.001/0.01/0.1. */
  def joinAnti(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  /** Fact-fact join fed from storage-bucketed tables (r11): both sides
    * were written `bucketBy(8, key).sortBy(key)` once, so the
    * SortMergeJoin reads bucket i ⋈ bucket i with ZERO shuffle below the
    * join — the layout-amortized shape for a petabyte fact table joined
    * every night (see [[graft.plans.BucketedTables]]; exchange-free
    * subtree asserted in BucketedJoinSpec). Result ≡ the plain join, so
    * the oracle is the ordinary SQL join — bucketing only moves WHERE
    * the shuffle happens (ingest, not query). */
  def joinBucketed(spark: SparkSession, dir: String): DataFrame =
    graft.plans.BucketedTables.join(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        sumDec4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  /** Equi key + range residual: the partkey equality keeps this a hash
    * join (never a nested-loop cross product) with the price band applied
    * as a post-join filter — the only scalable shape for band joins. */
  def joinRange(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p = broadcast(Tables.part(spark, dir))
    li.join(p,
        col("l_partkey") === col("p_partkey") &&
        (col("l_extendedprice") / col("l_quantity"))
          .between(col("p_retailprice") * 0.9, col("p_retailprice") * 1.1))
      .select(col("l_orderkey"), col("l_linenumber"), col("p_partkey"), col("p_name"))
      .orderBy("l_orderkey", "l_linenumber", "p_partkey")
  }

  /** Bin width (seconds) for [[joinInterval]]'s candidate generation. */
  val intervalBinSecs = 3600L
  /** Deterministic user sample for the interval-join gate key (bounds
    * the demo output; the recipe is sample-free). */
  val intervalUserMod = 23L

  /** Interval-overlap join WITHOUT an equi-key — the temporal/record
    * primitive Spark has no native operator for (a naive formulation
    * is a cross join with a range predicate → BroadcastNestedLoop or
    * cartesian). The scale recipe: explode each interval into the
    * fixed-width BINS it covers, equi-join on bin (hash-shuffled,
    * skew-managed like any other equi-join), DISTINCT the candidate
    * pairs (an interval pair meets once per shared bin), then verify
    * TRUE overlap with the exact predicate — bins only generate
    * candidates, they never decide. Per-row fan-out is
    * interval_length/bin_width, so pathological long intervals are
    * handled by bin-splitting themselves rather than by stalling a
    * nested loop.
    *
    * Fixture semantics: A = each sampled user's daily activity span
    * [first event, last event]; B = each event type's per-hour burst
    * span; output = which bursts each user-day overlapped, with the
    * overlap length. All time math in FLOORED epoch seconds (µs
    * timestamps truncate identically on both engines only under an
    * explicit floor — DuckDB's epoch() keeps the fraction and a bare
    * BIGINT cast would round). */
  def joinInterval(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    // NTZ has no direct long cast; via TIMESTAMP under the UTC session
    // this is the floored epoch second (micros floor-divided)
    val secs = col("ts").cast("timestamp").cast("long")
    val a = ev.filter(pmod(col("user_id"), lit(intervalUserMod)) === 0)
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(min(secs).as("a_start"), max(secs).as("a_end"))
    val b = ev
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(min(secs).as("b_start"), max(secs).as("b_end"))
    val binned = (df: DataFrame, s: String, e: String) => df.withColumn("bin",
      explode(sequence(floor(col(s) / intervalBinSecs).cast("long"),
        floor(col(e) / intervalBinSecs).cast("long"))))
    binned(a, "a_start", "a_end")
      .join(binned(b, "b_start", "b_end"), Seq("bin"))
      .select(col("user_id"), col("d"), col("event_type"), col("h"),
        col("a_start"), col("a_end"), col("b_start"), col("b_end"))
      .distinct()
      .filter(col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
      .select(col("user_id"), col("d").cast("timestamp_ntz").as("d"),
        col("event_type"), col("h"),
        (least(col("a_end"), col("b_end")) -
          greatest(col("a_start"), col("b_start"))).as("overlap_secs"))
      .orderBy("user_id", "d", "event_type", "h")
  }

  /** Keyed backward as-of join (events → latest order of that customer at
    * or before the event time), via the keyed-window construction in
    * [[graft.plans.AsOfJoin]]. Build side pre-aggregated to one row per
    * (custkey, orderdate) for determinism. */
  def joinAsOf(spark: SparkSession, dir: String): DataFrame = {
    val probe = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"))
    val build = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"), col("o_orderdate").as("d"))
      .agg(max(col("o_orderkey")).as("okey"))
      .select(col("o_custkey"), col("d"), col("okey"))
    AsOfJoin.backward(probe, build, "user_id", "o_custkey", "ts", "d")
      .select(col("event_id"), col("user_id"), col("d").cast("timestamp_ntz").as("o_date"), col("okey"))
      .orderBy("event_id")
  }

  // ------------------------------------------------------------ aggregates

  /** TPC-H Q1 shape: partial (map-side) + final hash aggregation over a
    * 6-value grouping domain; DECIMAL sums are order-insensitive so the
    * result is identical under any partitioning. */
  def aggGroupBy(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumDec(col("l_quantity")).as("sum_qty"),
        sumDec(col("l_extendedprice")).as("sum_base"),
        sumDec4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")

  /** count(DISTINCT) — Catalyst plans expand + two-phase agg. */
  def aggDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy(col("c_mktsegment"))
      .agg(
        countDistinct(col("c_nationkey")).as("n_nations"),
        count(lit(1)).as("n"))
      .orderBy("c_mktsegment")

  def aggRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sumDec(col("l_quantity")).as("sum_qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  def aggCube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sumDec(col("o_totalprice")).as("sum_price"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))

  /** Explicit GROUPING SETS ((status),(priority),()) via the Spark 4
    * Dataset `groupingSets` API (Catalyst plans a single Expand). The
    * earlier temp-view + SQL-string form was the one piece of
    * session-global mutable state in the query library — the declarative
    * call produces the identical plan with no shared session state. */
  def aggGroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq.empty),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sumDec(col("o_totalprice")).as("sum_price"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))

  // --------------------------------------------------------------- windows

  /** Ranking trio per customer; (totalprice DESC, orderkey) is a total
    * order so row_number/rank/dense_rank are all deterministic. */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rk"),
        dense_rank().over(w).as("drk"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Running DECIMAL sum + lag/lead over a unique (date, pk) order. */
  def windowFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").cast("timestamp_ntz").as("o_date"),
        sum(dec(col("o_totalprice")))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running"),
        lag(col("o_orderkey"), 1).over(w).as("prev_okey"),
        lead(col("o_orderkey"), 1).over(w).as("next_okey"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  /** Top-k per group via the custom bounded-heap operator
    * [[graft.plans.TopK]] (O(n log k), no per-group sort buffer — see
    * TopKPerGroup.scala); the rank column is computed afterwards by a
    * window over only the k×groups surviving rows. */
  def topkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    graft.plans.TopK.perGroup(
        Tables.orders(spark, dir)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
        Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
      .withColumn("rn", row_number().over(w))
      .orderBy("o_custkey", "rn")
  }

  /** Reference window-rank formulation (kept as the semantic spec the
    * custom operator is tested against in TopKPerGroupSpec). */
  def topkPerGroupWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  /** Global top-10 — Spark plans TakeOrderedAndProject (per-partition
    * heap + driver merge), no full sort at scale. */
  def sortLimit(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  // ------------------------------------------------------------- set ops

  def unionAll(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.filter(col("o_orderstatus") === "O")
      .select(col("o_orderkey").as("okey"), lit("open").as("tag"))
      .unionByName(
        o.filter(col("o_totalprice") > 400000)
          .select(col("o_orderkey").as("okey"), lit("big").as("tag")))
      .orderBy("okey", "tag")
  }

  def intersectQ(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
      .intersect(Tables.orders(spark, dir).select(col("o_custkey").as("c_custkey")))
      .orderBy("c_custkey")

  /** Customers who never placed a 1-URGENT order. The urgency filter
    * keeps the result non-empty at every SF (18/203/1986 rows at
    * sf0.001/0.01/0.1) — the unfiltered version is 0 rows because every
    * customer has orders, and a hash over an empty frame proves nothing
    * (r14 verdict ask #3). */
  def exceptQ(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey"))
      .except(Tables.orders(spark, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("c_custkey")))
      .orderBy("c_custkey")

  // ------------------------------------------------------- scalar families

  /** String function family — every expression codegen'd builtin. */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("up_name"),
        lower(col("p_brand")).as("lo_brand"),
        substring(col("p_type"), 1, 4).as("ty4"),
        length(col("p_name")).as("name_len"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), lit(" "), lit("_")).as("name_us"),
        element_at(split(col("p_name"), " "), 1).as("first_word"),
        lpad(col("p_size").cast("string"), 4, "0").as("size4"),
        col("p_name").like("%red%").as("is_red"))
      .orderBy("p_partkey")

  /** Date/time family. Day-of-week mapping pinned: Spark `weekday`
    * (Mon=0) ≡ DuckDB `isodow - 1` (SURVEY.md §2 q_date_funcs note). */
  def dateFuncs(spark: SparkSession, dir: String): DataFrame = {
    val d = col("o_orderdate").cast("date")
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        year(d).as("y"),
        month(d).as("m"),
        dayofmonth(d).as("dom"),
        date_trunc("month", d).cast("timestamp_ntz").as("month_start"),
        datediff(d, lit("1995-01-01").cast("date")).as("days_since"),
        date_add(d, 30).cast("timestamp_ntz").as("d_plus30"),
        weekday(d).as("dow"))
      .orderBy("o_orderkey")
  }

  /** Math + conditional family. floor/ceil/abs/pow/sqrt are exact or
    * correctly-rounded IEEE (bit-identical across engines); only ln is
    * libm-dependent, hence ROUND(,6). */
  def mathFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        floor(col("l_extendedprice")).as("price_floor"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        abs(col("l_discount") - 0.05).as("disc_dev"),
        pow(col("l_quantity"), 2.0).as("qty_sq"),
        sqrt(col("l_extendedprice")).as("price_sqrt"),
        round(log(col("l_extendedprice")), 6).as("price_ln"),
        when(col("l_discount") < 0.03, "low")
          .when(col("l_discount") < 0.06, "mid")
          .otherwise("high").as("disc_tier"))
      .orderBy("l_orderkey", "l_linenumber", "price_floor", "price_ceil",
        "disc_dev", "qty_sq", "price_sqrt", "price_ln", "disc_tier")

  /** Regex family — patterns kept to the common Java/RE2 subset so both
    * engines agree. */
  def regexFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "([a-z]+) ([a-z]+)", 2).as("second_word"),
        regexp_extract(col("p_type"), "^([A-Z]+)", 1).as("type_head"),
        size(regexp_extract_all(col("p_name"), lit("[aeiou]"), lit(0))).as("n_vowels"),
        col("p_name").rlike("^(red|blue)").as("is_primary_color"))
      .orderBy("p_partkey")

  /** Conditional/null-handling family. */
  def conditionalFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        coalesce(nullif(col("o_orderstatus"), lit("P")), lit("PENDING")).as("status_norm"),
        greatest(col("o_totalprice"), lit(100000.0)).as("price_floor100k"),
        least(col("o_totalprice"), lit(400000.0)).as("price_cap400k"),
        when(col("o_totalprice").isNull, -1.0).otherwise(col("o_totalprice")).as("price_nn"))
      .orderBy("o_orderkey")

  /** JSON family: path extraction (get_json_object) and full schema
    * parse (from_json → struct) — the parsed struct stays columnar, so
    * repeated field access costs one parse, not one per field. */
  def jsonFuncs(spark: SparkSession, dir: String): DataFrame = {
    val parsed = from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType))))
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        parsed.getField("k").as("k_parsed"))
      .filter(col("k") > 50)
      .orderBy("event_id")
  }

  /** Array/HOF family over float embeddings; folds are sequential in
    * array order (Spark `aggregate` HOF ≡ DuckDB `list_aggregate`),
    * elements cast to DOUBLE before arithmetic (FIXTURES.md hazard 3).
    * Array intermediates (slice/transform/sort_array) are unpacked to
    * scalar columns at the end: raw array outputs crash the driver's
    * pandas sort (round-1 verdict). */
  def arrayFuncs(spark: SparkSession, dir: String): DataFrame = {
    val first4 = transform(
      slice(col("embedding"), 1, 4), x => round(x.cast("double"), 6))
    val sorted4 = sort_array(first4)
    Tables.embeddings(spark, dir)
      .select(
        col("vec_id"),
        size(col("embedding")).as("n"),
        element_at(first4, 1).as("e1"),
        element_at(first4, 2).as("e2"),
        element_at(first4, 3).as("e3"),
        element_at(first4, 4).as("e4"),
        round(array_max(col("embedding")).cast("double"), 6).as("mx"),
        round(array_min(col("embedding")).cast("double"), 6).as("mn"),
        round(
          aggregate(col("embedding"), lit(0.0), (acc, x) => acc + x.cast("double")),
          6).as("sm"),
        element_at(sorted4, 1).as("s1"),
        element_at(sorted4, 2).as("s2"),
        element_at(sorted4, 3).as("s3"),
        element_at(sorted4, 4).as("s4"))
      .orderBy("vec_id")
  }

  // ------------------------------------------------ subqueries / temporal

  /** TPC-H Q17 shape, written as the decorrelated join form Catalyst
    * would produce anyway (pre-aggregate per partkey, then join+filter).
    * l_quantity is integral so AVG is exact and the comparison is
    * deterministic under any summation order. */
  def subqueryScalar(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val avgQ = li.groupBy(col("l_partkey"))
      .agg(avg(col("l_quantity")).as("aq"))
    li.join(avgQ, "l_partkey")
      .filter(col("l_quantity") < col("aq") * 0.5)
      .agg(
        sumDec(col("l_extendedprice")).as("total"),
        count(lit(1)).as("n"))
  }

  /** Pivot: wide-format aggregation (groupBy().pivot() plans a single
    * aggregate with one conditional sum per pivot value — no join). */
  def pivotQ(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum(dec(col("l_quantity"))).cast("double"))
      .orderBy("l_returnflag")

  /** Unpivot/melt: wide → long via Dataset.unpivot (Expand, no union of
    * scans — one pass regardless of how many measures melt). */
  def unpivotQ(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_discount"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_discount")),
        "metric", "value")
      .orderBy("l_orderkey", "l_linenumber", "metric", "value")

  /** Exact interpolated percentiles (both engines define quantiles as
    * linear interpolation at (n-1)p — Spark `percentile` ≡ DuckDB
    * `quantile_cont`). Integral quantities make results exact. */
  def percentileQ(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.9)").as("p90"),
        expr("percentile(l_quantity, 0.99)").as("p99"))
      .orderBy("l_returnflag")

  /** HLL approximate distinct, made oracle-checkable: the sketch value
    * itself is not SQL-reproducible (DuckDB's HLL differs), so the output
    * carries the EXACT distinct count (which DuckDB recomputes) plus an
    * int flag asserting |approx − exact| ≤ 5%·exact — the 5% property
    * the spec used to check privately is now part of the hashed result,
    * so a sketch regression fails the oracle gate. The exact side exists
    * only for the gate; at 100 TB the production call is the plain
    * approx_count_distinct (fixed-size sketch, one pass, mergeable),
    * documented here rather than re-keyed. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        // rsd 0.02 (not the 0.05 default): the flag asserts a 5% bound,
        // and a sketch whose *standard deviation* is 5% breaches it
        // routinely (measured: |err| > 5% at cardinality 1500). 2%
        // rsd = 2^12 registers — still a fixed-size mergeable sketch
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n"))
      .select(
        col("event_type"), col("exact_users"), col("n"),
        (abs(col("approx_users") - col("exact_users"))
          <= col("exact_users") * lit(0.05)).cast("int").as("within_5pct"))
      .orderBy("event_type")

  /** Approximate percentile under the oracle, by the q_approx_distinct
    * device: at 100 TB an exact percentile needs a full sort (or the
    * two-pass exact `percentile`), while `approx_percentile` is a
    * fixed-size mergeable GK sketch with a HARD rank-error contract
    * (≤ 1/accuracy, independent of partitioning/merge order — which is
    * why the flag is stable where the sketch VALUE is not). Output =
    * the exact p50/p95 (DuckDB recomputes via quantile_cont, the
    * q_percentile-proven interpolation parity) + int flags asserting the
    * sketch landed inside the exact ±1% rank window — 10× looser than
    * the sketch's 1/1000 contract, so the flag pins the property without
    * flaking. */
  def approxPercentile(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        // ONE exact-percentile aggregate with an array of points — eight
        // scalar percentile() calls each buffer the group independently
        // (measured 6.8 s vs 1.4 s for this key at sf0.1)
        expr("percentile(l_extendedprice, array(0.49, 0.5, 0.51, 0.94, 0.95, 0.96))").as("ex"),
        expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)").as("ap"))
      .select(
        col("l_returnflag"),
        col("ex")(1).as("p50"), col("ex")(4).as("p95"),
        (col("ap")(0) >= col("ex")(0) && col("ap")(0) <= col("ex")(2)).cast("int").as("ok50"),
        (col("ap")(1) >= col("ex")(3) && col("ap")(1) <= col("ex")(5)).cast("int").as("ok95"))
      .orderBy("l_returnflag")

  // ------------------------------------------- time windows (batch equiv)

  /** Tumbling 1-hour window — the batch-equivalent of the Structured
    * Streaming query in graft.stream.StreamOps (same grouping result). */
  def windowTumbling(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        date_trunc("hour", col("ts")).as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sumDec(col("value")).as("sum_value"))
      .orderBy("hour", "event_type")

  /** Sliding window (1 h / 30 min): each event lands in exactly 2
    * epoch-aligned buckets — `window()` is a Catalyst Expand, no UDF. */
  def windowSliding(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"), col("n"))
      .orderBy("wstart")

  /** Session windows (30-min gap) per user. `session_window` keeps state
    * per user — at scale this shuffles once by user_id, identical to the
    * streaming state-store layout. New session starts at ts >= prev_end
    * (half-open [start, last+gap) windows). */
  def windowSession(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("session_start"))
      .select(col("user_id"), col("session_start"), col("n_events"))
      .orderBy("user_id", "session_start")

  /** q_dedup_latest — latest-record-per-key compaction (the CDC/upsert
    * materialization every changelog consumer runs): keep the newest
    * event per (user_id, event_type), ties broken by event_id so the
    * order is total and the result deterministic. One hash shuffle on
    * the key, rank inside the partition — at 100 TB this is the same
    * exchange a groupBy needs, and AQE handles skewed keys. */
  def dedupLatest(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"), col("value"))
      .orderBy("user_id", "event_type")
  }

  /** q_scd2_history — the slowly-changing-dimension (type 2) builder
    * q_dedup_latest's compaction throws away: instead of keeping ONLY
    * the newest record per key, keep every record as a validity
    * interval [valid_from, valid_to) with the current row open-ended
    * (null valid_to) and an is_current flag — the changelog → history
    * table materialization every warehouse runs nightly. valid_to =
    * lead(ts) over the same (user_id, event_type) key ordered by
    * (ts, event_id) (total order, deterministic under ties).
    *
    * Scale: ONE hash exchange on the key + an in-partition sort — the
    * exact q_dedup_latest shape; no self-join (the lag/lead formulation
    * replaces the classic ts-between self-join, which shuffles twice
    * and breaks on duplicate timestamps). */
  def scd2History(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("value"), col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy("user_id", "event_type", "valid_from", "event_id")
  }

  /** q_scd2_join — the point-in-time (temporal) dimension join that
    * consumes [[scd2History]]'s validity intervals: every purchase
    * event is attributed to the signup VERSION active at purchase time
    * (`valid_from <= ts < valid_to`, open-ended current rows). This is
    * the classic warehouse PIT join — fact rows must see the dimension
    * as it WAS, not as it is.
    *
    * Scale shape: an equi-join on the entity key (user_id) with the
    * interval predicate as a join filter — per-key version counts are
    * bounded, so the join fans out per key by history depth, never by
    * fact volume × dim volume. Intervals half-open partition each
    * key's timeline, so every probe matches AT MOST one version (no
    * dedup needed, asserted in the spec). One hash exchange per side.
    * At 100 TB both sides hash-partition by user_id; a broadcast is
    * wrong here (the dimension history is fact-scale wide), which is
    * exactly why this key exists next to q_join_broadcast. */
  def scd2Join(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val dim = Tables.events(spark, dir)
      .filter(col("event_type") === "signup")
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_id").as("version_id"),
        col("value").as("version_value"), col("ts").as("valid_from"), col("valid_to"))
    val fact = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    fact.join(dim, Seq("user_id"))
      .filter(col("ts") >= col("valid_from") &&
        (col("valid_to").isNull || col("ts") < col("valid_to")))
      .select(col("user_id"), col("event_id"), col("ts"),
        dec(col("value")).cast("double").as("purchase_value"),
        col("version_id"),
        dec(col("version_value")).cast("double").as("version_value"))
      .orderBy("user_id", "event_id")
  }

  /** q_mad — median absolute deviation per user: the robust dispersion
    * estimate (breakdown point 50%) that pairs with q_rolling_median
    * the way stddev pairs with the mean; outlier gates at 100 TB use
    * MAD because one corrupt value cannot move it. Two exact grouped
    * percentiles: per-user median, join back (keyed, bounded 1 row per
    * user), then the median of absolute deviations — both aggregates
    * hash-partition on user_id, nothing global. Deviations are rounded
    * BEFORE the second median so both engines aggregate identical
    * values; interpolation parity is the proven quantile_cont
    * equivalence. */
  def mad(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(col("user_id"), col("value"))
    val med = e.groupBy(col("user_id"))
      .agg(round(expr("percentile(value, 0.5)"), 6).as("med"),
        count(lit(1)).as("n"))
    e.join(med, "user_id")
      .select(col("user_id"), col("med"), col("n"),
        round(abs(col("value") - col("med")), 6).as("adev"))
      .groupBy(col("user_id"))
      .agg(first(col("med")).as("med"), first(col("n")).as("n"),
        round(expr("percentile(adev, 0.5)"), 6).as("mad"))
      .orderBy("user_id")
  }

  /** q_anomaly_zscore — rolling z-score anomaly flags over the event
    * stream: each event scored against the mean/stddev of its user's
    * TRAILING 20 events (current row excluded — scoring a point against
    * a window that contains it dampens the signal), flagged when
    * |x − μ| > 3σ. The ops-monitoring shape: one keyed window, no
    * self-join, no global pass.
    *
    * Determinism devices: population stddev from the two DECIMAL power
    * sums in ONE fixed expression order (the q_stats_moments device —
    * built-in stddev folds floats in partition order); z rounded to
    * 6 dp; windows ordered by (ts, event_id) so frames are total. */
  def anomalyZscore(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-20, -1)
    val vDec = col("value").cast(DecimalType(18, 2))
    val v2Dec = (vDec * vDec).cast(DecimalType(30, 8))
    val n = count(lit(1)).over(w).cast("double")
    val sx = sum(vDec).over(w).cast("double")
    val sxx = sum(v2Dec).over(w).cast("double")
    Tables.events(spark, dir)
      .withColumn("n_prior", count(lit(1)).over(w))
      .withColumn("mu", sx / n)
      // greatest(·, 0): an all-equal window cancels to a tiny NEGATIVE
      // var in float — sqrt would go NaN, and NaN comparison semantics
      // differ across engines (Spark orders NaN largest)
      .withColumn("var", greatest((sxx - sx * sx / n) / n, lit(0.0)))
      .filter(col("n_prior") >= 10)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("value"), round(col("mu"), 6).as("mu"),
        (abs(col("value") - col("mu")) > lit(3.0) * sqrt(col("var")))
          .as("is_anomaly"))
      .orderBy("user_id", "event_id")
  }

  /** q_window_range — VALUE-based window frame (RANGE BETWEEN), the
    * frame kind q_window_frame's ROWS cannot express: each order's
    * trailing-30-day revenue per customer — the frame holds every row
    * whose ORDER-BY VALUE is within 2 592 000 s, however many rows that
    * is (ties on a date all share one frame, so the DECIMAL sum is
    * well-defined without a tiebreak). Ordering key is epoch seconds —
    * a numeric RANGE both engines implement identically. */
  def windowRange(spark: SparkSession, dir: String): DataFrame = {
    val t = col("o_orderdate").cast("date").cast("timestamp").cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(t)
      .rangeBetween(-30L * 86400, 0)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), t.as("t"),
        sum(dec(col("o_totalprice"))).over(w).cast("double").as("trailing30"))
      .orderBy("o_custkey", "t", "o_orderkey")
  }

  /** q_arg_minmax — argmin/argmax aggregates (`max_by`/`min_by`,
    * DuckDB `arg_max`/`arg_min`): the price of each customer's first
    * and latest order, keyed on the UNIQUE o_orderkey so the answer is
    * total-order deterministic (max_by over a tied ordering value is
    * engine-dependent — never oracle that). One hash aggregation;
    * avoids the window-rank detour entirely (no sort, no rank, one
    * combiner-friendly agg — the cheapest "top-1 per group" there is). */
  def argMinMax(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(
        min_by(col("o_totalprice"), col("o_orderkey")).as("first_price"),
        max_by(col("o_totalprice"), col("o_orderkey")).as("latest_price"),
        min(col("o_orderkey")).as("first_okey"),
        max(col("o_orderkey")).as("latest_okey"))
      .orderBy("o_custkey")

  /** q_join_null_safe — null-safe equality join (`<=>` /
    * `IS NOT DISTINCT FROM`): NULL keys match each other instead of
    * silently dropping, the classic outer-ETL trap (a plain equi-join
    * discards every NULL-keyed row; a COALESCE sentinel risks
    * colliding with real values). Keys here are o_orderstatus with 'P'
    * nulled out, so the NULL group is real and populated. Same hash
    * shuffle as a plain equi-join — null-safe equality is still a
    * deterministic partitioning key (all NULLs co-locate). */
  def joinNullSafe(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), nullif(col("o_orderstatus"), lit("P")).as("k"))
    val dim = o.groupBy(col("k").as("dk")).agg(count(lit(1)).as("n_in_group"))
    o.join(dim, col("k") <=> col("dk"))
      .select(col("o_orderkey"), col("k"), col("n_in_group"))
      .orderBy("o_orderkey")
  }

  /** q_histogram — fixed-width histogram of order totals (20 x 30k
    * buckets, outliers clamped into the edge buckets): the first plot
    * every data-profiling pass draws. One two-phase hash aggregation;
    * the shuffle carries 20 rows. floor() is pinned on both engines
    * (DuckDB CAST would round); width/bounds are literals so the bucket
    * function is engine-identical. */
  val histBuckets = 20
  val histWidth = 30000.0

  def histogramQ(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        least(greatest(floor(col("o_totalprice") / histWidth), lit(0L)),
          lit(histBuckets - 1L)).as("bucket"),
        col("o_totalprice"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sumDec(col("o_totalprice")).as("sum_price"))
      .orderBy("bucket")

  /** q_profile — per-column summary statistics (count / nulls /
    * distinct / min / max / decimal-exact mean) over lineitem's numeric
    * measures, computed in ONE pass: unpivot to (column, value) rows —
    * a Catalyst Expand, no extra scan per column — then a single
    * grouped aggregation. The profile a pipeline runs before trusting a
    * new 100 TB drop; the shuffle carries one row per (column, agg). */
  def profileQ(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    Tables.lineitem(spark, dir)
      .select(cols.map(col): _*)
      .unpivot(Array.empty, cols.map(col).toArray, "col_name", "value")
      .groupBy(col("col_name"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col("value")).as("n_distinct"),
        min(col("value")).as("mn"),
        max(col("value")).as("mx"),
        round(sumDec(col("value")) / count(col("value")), 6).as("mean"))
      .orderBy("col_name")
  }

  /** q_stats_moments — single-pass moment statistics (mean / variance /
    * stddev / correlation) per group, the way they are actually computed
    * at 100 TB: ONE hash aggregation collecting the raw moments
    * (Σx, Σy, Σx², Σy², Σxy — five combiner-friendly sums, no second
    * pass, no window), then closed-form population formulas over the
    * collected sums. Naive float moment sums are addition-order-
    * dependent (different partitionings → different doubles → different
    * hashes), so every moment is summed as DECIMAL — exact, so the
    * derived doubles are bit-identical on any engine and any partition
    * count. The derived-expression chain is written in one fixed order,
    * mirrored token for token in the oracle SQL. */
  def statsMoments(spark: SparkSession, dir: String): DataFrame = {
    val x = dec4(col("l_quantity"))
    val y = dec4(col("l_extendedprice"))
    def prod(a: Column, b: Column): Column = (a * b).cast(DecimalType(30, 8))
    val nd = col("n").cast("double")
    val varX = (col("sxx") - col("sx") * col("sx") / nd) / nd
    val varY = (col("syy") - col("sy") * col("sy") / nd) / nd
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast("double").as("sx"),
        sum(y).cast("double").as("sy"),
        sum(prod(x, x)).cast("double").as("sxx"),
        sum(prod(y, y)).cast("double").as("syy"),
        sum(prod(x, y)).cast("double").as("sxy"))
      .select(
        col("l_returnflag"), col("n"),
        round(col("sx") / nd, 6).as("mean_qty"),
        round(varX, 6).as("var_qty"),
        round(sqrt(varX), 6).as("std_qty"),
        round(((col("sxy") - col("sx") * col("sy") / nd) / nd) / sqrt(varX * varY), 6)
          .as("corr_qty_price"))
      .orderBy("l_returnflag")
  }

  /** q_window_ntile — distribution window functions (NTILE /
    * PERCENT_RANK / CUME_DIST): the quantile-bucketing shape behind
    * per-group calibration and leaderboard percentiles. Ordering key
    * includes the UNIQUE o_orderkey so ties cannot make CUME_DIST
    * engine-dependent. One hash exchange on the partition key + an
    * in-partition sort — the same cost as any keyed window; never a
    * global order. */
  def windowNtile(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cdist"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q_join_full — FULL OUTER join with unmatched rows on BOTH sides:
    * per-customer open-order ('O') aggregates vs the high-balance
    * customer roster. Left-only rows = active customers with a low
    * balance; right-only = rich customers with no open orders. The
    * null-padded sides are the whole point (a training-data asset
    * reconciliation: "what is in A, in B, in both"). Single hash
    * shuffle on the (shared) key; no broadcast — full outer cannot
    * broadcast either side, so the plan IS the scale plan. */
  def joinFull(spark: SparkSession, dir: String): DataFrame = {
    val open = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "O")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_open"), sumDec(col("o_totalprice")).as("open_total"))
    val rich = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 5000)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    open.join(rich, open("o_custkey") === rich("c_custkey"), "full_outer")
      .select(
        coalesce(col("o_custkey"), col("c_custkey")).as("custkey"),
        col("n_open"), col("open_total"), col("c_name"), col("c_acctbal"))
      .orderBy("custkey")
  }

  /** q_agg_collect — order-insensitive list/set aggregation: the
    * grouped-concatenation shape behind per-entity feature rollups
    * (all statuses a customer ever had, the distinct priority set).
    * `sort_array(collect_list)` makes the result independent of
    * partitioning/merge order — collect_list alone is NOT
    * deterministic under a shuffle, which is exactly why the sorted
    * form is the only one an oracle can see. */
  def aggCollect(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(
        concat_ws(",", sort_array(collect_list(col("o_orderstatus")))).as("statuses"),
        concat_ws(",", sort_array(collect_set(col("o_orderpriority")))).as("prio_set"),
        count(lit(1)).as("n"))
      .orderBy("o_custkey")

  /** q_agg_multi_distinct — several COUNT(DISTINCT) over different
    * columns in one aggregate: Catalyst rewrites this to a single
    * Expand (one pass over lineitem, rows replicated per distinct
    * clause) + two-level aggregation — not one scan per distinct
    * column, which is what a naive engine does and what kills it at
    * 100 TB. PlanRegressionSpec pins the Expand. */
  def aggMultiDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_linestatus"))
      .agg(
        countDistinct(col("l_partkey")).as("nd_part"),
        countDistinct(col("l_suppkey")).as("nd_supp"),
        countDistinct(col("l_returnflag")).as("nd_flag"),
        count(lit(1)).as("n"))
      .orderBy("l_linestatus")

  /** q_subquery_exists — correlated EXISTS + NOT EXISTS, the classic
    * decorrelation pair: customers with at least one big-ticket order
    * (>400k) and no completed ('F') order. Spark-first form is the
    * decorrelated one — a left-semi then a left-anti hash join, each
    * one shuffle on the shared key (both auto-broadcast when the
    * filtered order sets are small; at 100 TB they degrade gracefully
    * to shuffled hash joins). The oracle states it as EXISTS/NOT
    * EXISTS and DuckDB performs the same decorrelation. */
  def subqueryExists(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val big = orders.filter(col("o_totalprice") > 400000).select(col("o_custkey"))
    val done = orders.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    Tables.customer(spark, dir)
      .join(big, col("c_custkey") === big("o_custkey"), "left_semi")
      .join(done, col("c_custkey") === done("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy("c_custkey")
  }

  /** Edit-distance threshold for [[joinFuzzy]] (shared with the oracle). */
  val fuzzyMaxDist = 2

  /** Fuzzy self-join (record linkage): part-name pairs within
    * Levenshtein distance ≤ [[fuzzyMaxDist]] — the entity-resolution
    * primitive (catalog dedup, noisy-source linkage) that exact and
    * shingle dedup both miss (a 2-char typo changes most shingles of a
    * short string).
    *
    * Scale shape, in order: (1) DISTINCT names first — linkage runs on
    * the entity vocabulary, never the row stream (identical names would
    * otherwise pair quadratically); (2) a BLOCKING key (the name's
    * second token) turns the all-pairs O(V²) comparison into per-block
    * equi-join candidates — the standard record-linkage device; at
    * 100 TB the block key comes from a domain attribute (phonetic code,
    * sorted-token prefix) and hot blocks get the capped-LSH treatment;
    * (3) `levenshtein` — codegen'd Catalyst expression, O(len²) per
    * candidate only. Row counts per name are joined back so survivors
    * carry their support. The `a < b` canonical ordering emits each
    * pair once. */
  /** Entity vocabulary for the record-linkage keys: distinct part
    * names with their row support and the blocking key ([[joinFuzzy]]'s
    * step 1-2; shared verbatim with [[survivorship]]). */
  private def fuzzyVocabOf(parts: DataFrame): DataFrame =
    parts
      .groupBy(col("p_name")).agg(count(lit(1)).as("n"))
      .select(col("p_name"), col("n"),
        split_part(col("p_name"), lit(" "), lit(2)).as("blk"))

  def joinFuzzy(spark: SparkSession, dir: String): DataFrame = {
    val nm = fuzzyVocabOf(Tables.part(spark, dir))
    val a = nm.select(col("p_name").as("name_a"), col("n").as("n_a"), col("blk"))
    val b = nm.select(col("p_name").as("name_b"), col("n").as("n_b"), col("blk"))
    a.join(b, Seq("blk"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= fuzzyMaxDist)
      .select(col("name_a"), col("name_b"), col("dist"),
        col("n_a"), col("n_b"))
      .orderBy("name_a", "name_b")
  }

  /** Golden-record election (survivorship) — the step AFTER
    * [[joinFuzzy]] in entity resolution: fuzzy pairs only SAY two
    * variants co-refer; a catalog still needs ONE canonical record per
    * entity. Variants are clustered by connected components over the
    * linkage graph (typo chains a→b→c must land in one cluster even
    * when levenshtein(a,c) exceeds the pair threshold — pairwise
    * output alone cannot express that), then each cluster elects its
    * golden name by the most-supported-variant rule (max row support,
    * ties to the lexicographically smallest name). Output: one row per
    * MERGED entity (singleton names are not survivorship's business).
    *
    * Scale shape: the linkage part is [[joinFuzzy]]'s (vocab agg +
    * blocked equi-join); clustering is the checkpointed min-label CC
    * core (graph/ConnectedComponents.scala) over hash-derived 60-bit
    * node ids — edges are variant pairs, so the iterated set is the
    * touched vocabulary, not the row stream; election is one keyed agg
    * + one bounded window over cluster members. Nothing here ever
    * rescans `part` after the vocab agg.
    *
    * Determinism: node ids are md5-derived ([[graft.text.TextOps.baseHash60]]),
    * so cluster labels (min id) and the recursive-CTE oracle agree
    * exactly; the election sort key (n DESC, p_name) is a total order. */
  def survivorship(spark: SparkSession, dir: String): DataFrame =
    survivorshipOf(Tables.part(spark, dir))

  /** [[survivorship]] over any frame with a `p_name` column. */
  def survivorshipOf(parts: DataFrame): DataFrame = {
    val nm = fuzzyVocabOf(parts)
      .withColumn("id", graft.text.TextOps.baseHash60(col("p_name")))
    val a = nm.select(col("p_name").as("name_a"), col("id").as("src"), col("blk"))
    val b = nm.select(col("p_name").as("name_b"), col("id").as("dst"), col("blk"))
    val edges = a.join(b, Seq("blk"))
      .filter(col("name_a") < col("name_b") &&
        levenshtein(col("name_a"), col("name_b")) <= fuzzyMaxDist)
      .select(col("src"), col("dst"))
    val labels = graft.graph.ConnectedComponents.run(edges, nm.select(col("id")))
    val mem = labels.join(nm, Seq("id"))
      .select(col("lbl"), col("p_name"), col("n"))
    val ag = mem.groupBy(col("lbl"))
      .agg(min(col("p_name")).as("cluster_name"),
        count(lit(1)).as("n_variants"),
        sum(col("n")).as("support_total"))
      .filter(col("n_variants") > 1)
    val g = mem
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lbl")).orderBy(col("n").desc, col("p_name"))))
      .filter(col("rn") === 1)
      .select(col("lbl"), col("p_name").as("golden_name"),
        col("n").as("support_golden"))
    ag.join(g, Seq("lbl"))
      .select(col("cluster_name"), col("golden_name"), col("n_variants"),
        col("support_total"), col("support_golden"))
      .orderBy("cluster_name")
  }

  /** q_hll_merge — mergeable-sketch algebra: per-source HLL sketches of
    * distinct content digests, then the CORPUS estimate computed by
    * unioning the 20 source sketches (`hll_union_agg`) — never
    * re-scanning the data. This is the property that makes HLL the
    * 100 TB distinct-count tool: per-partition/per-day sketches persist
    * tiny (2^12 registers) and roll up associatively, so "distinct over
    * any source subset" is a sketch union, not a rescan.
    *
    * Oracle device = q_approx_distinct's exact+bound-flag: output the
    * exact distinct (DuckDB recomputes it) plus an int flag asserting
    * the sketch estimate landed within 5% — lgK=12 gives ~1.6% standard
    * error, same margin reasoning as approxDistinct's rsd choice. The
    * merged row proves the union path end-to-end against the exact
    * corpus-wide distinct. */
  def hllMerge(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("source"), md5(col("text")).as("h"))
    val per = d.groupBy(col("source")).agg(
      expr("hll_sketch_agg(h, 12)").as("sk"),
      count_distinct(col("h")).as("exact_distinct"),
      count(lit(1)).as("n_docs"))
    def flag(est: Column, exact: Column): Column =
      (abs(est - exact) <= exact * lit(0.05)).cast("int")
    val perOut = per.select(
      col("source"), col("exact_distinct"), col("n_docs"),
      flag(expr("hll_sketch_estimate(sk)"), col("exact_distinct")).as("within_5pct"))
    // merged row: estimate ONLY from the unioned per-source sketches;
    // the exact corpus distinct is a separate 1-row agg (broadcast)
    val merged = per.agg(
      expr("hll_sketch_estimate(hll_union_agg(sk, true))").as("est_all"),
      sum(col("n_docs")).as("n_docs"))
    val exactAll = d.agg(count_distinct(col("h")).as("exact_distinct"))
    val mergedOut = merged.crossJoin(broadcast(exactAll)).select(
      lit("__all__").as("source"), col("exact_distinct"), col("n_docs"),
      flag(col("est_all"), col("exact_distinct")).as("within_5pct"))
    perOut.unionAll(mergedOut).orderBy("source")
  }

  /** Trailing window width for the rolling median (events). */
  val rollingMedianWindow = 20

  /** q_rolling_median — exact rolling median of event value over a
    * trailing [[rollingMedianWindow]]-event keyed frame: the
    * outlier-robust twin of q_anomaly_zscore's rolling mean (one wild
    * value shifts a mean by 1/n but leaves the median untouched —
    * which is why monitoring baselines prefer it). Runs as a windowed
    * exact `percentile` aggregate: ONE hash exchange on user_id, then
    * a bounded 20-row frame per row — no global sort, no state beyond
    * the frame. Interpolation parity (avg of the two middle values) is
    * the q_percentile-proven quantile_cont equivalence; ROUND(,6) on
    * top. Ordering ties broken by the unique event_id. */
  def rollingMedian(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-(rollingMedianWindow - 1), Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("med", round(expr("percentile(value, 0.5)").over(w), 6))
      .withColumn("dev", round(col("value") - col("med"), 6))
      .select(col("user_id"), col("event_id"), col("med"), col("dev"))
      .orderBy("user_id", "event_id")
  }

  /** k-anonymity threshold. */
  val kAnonK = 5L

  /** q_k_anonymity — privacy audit over quasi-identifiers: every
    * (nation, segment, balance-sign) equivalence class with its size
    * and an at-risk flag for classes smaller than k — rows in such a
    * class are re-identifiable by their QI combination alone, and a
    * release pipeline must suppress or generalize them. The
    * data-governance gate a training-data engine runs BEFORE export
    * (the PII scrub removes direct identifiers; this catches the
    * indirect ones). QI choice measured to bite at every SF (98/76/2
    * at-risk classes at sf0.001/0.01/0.1).
    *
    * Scale shape: one map-side-combined aggregate over the QI tuple —
    * class count bounded by the QI domain, not the data — plus a
    * one-row risk summary cross (bounded). */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val classes = Tables.customer(spark, dir)
      .select(col("c_nationkey"), col("c_mktsegment"),
        when(col("c_acctbal") < 0, lit("neg")).otherwise(lit("pos")).as("bal_sign"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_sign"))
      .agg(count(lit(1)).as("class_size"))
    classes
      .select(col("c_nationkey"), col("c_mktsegment"), col("bal_sign"),
        col("class_size"), (col("class_size") < kAnonK).cast("int").as("at_risk"))
      .orderBy("c_nationkey", "c_mktsegment", "bal_sign")
  }

  /** Minimum pair support for q_cooccur_lift. 2 keeps the output
    * healthy at every SF (433/63/2 pairs at support 3 across
    * sf0.001/0.01/0.1 — larger catalogs dilute pair counts; support 2
    * yields 2324/3445/3573, measured). */
  val cooccurMinSupport = 2L

  /** q_cooccur_lift — market-basket co-occurrence with lift scoring:
    * part pairs appearing in the same order, kept above a support
    * floor, scored by lift = N·c(a,b) / (c(a)·c(b)) — >1 means the
    * pair co-occurs more than independence predicts. The
    * recommendation/affinity operator: triangles (q_triangle_count)
    * measure the graph's SHAPE; this scores individual edges for
    * serving.
    *
    * Scale shape: the pair explosion is the same id-ordered self-join
    * as the co-order graph (per-order fanout C(k,2), bounded by basket
    * size, never by catalog size); margins c(a) are a part-keyed agg
    * joined back keyed; N is a one-row broadcast. The support floor
    * prunes the long tail BEFORE the margin joins, so the scored frame
    * is small. Lift divides exact BIGINT counts then ROUND(,6) — the
    * established cross-engine device. */
  def cooccurLift(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val margins = li.groupBy(col("p")).agg(count(lit(1)).as("c"))
    val nOrders = li.select(col("o")).distinct().agg(count(lit(1)).as("n_orders"))
    val pairs = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("pa"), col("b.p").as("pb"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= cooccurMinSupport)
    pairs
      .join(margins.select(col("p").as("pa"), col("c").as("c_a")), "pa")
      .join(margins.select(col("p").as("pb"), col("c").as("c_b")), "pb")
      .crossJoin(broadcast(nOrders))
      .select(col("pa"), col("pb"), col("c_ab"), col("c_a"), col("c_b"),
        round(col("c_ab").cast("double") * col("n_orders").cast("double") /
          (col("c_a").cast("double") * col("c_b").cast("double")), 6).as("lift"))
      .orderBy("pa", "pb")
  }

  /** q_winsorized_mean — robust per-group means after GLOBAL p05/p95
    * clipping of order totals: the outlier-taming mean that keeps every
    * row (vs q_quality_tails, which DROPS the tails; vs [[mad]], which
    * only measures dispersion) — clip at the corpus percentiles, then
    * average per priority group. The standard recipe for KPI means a
    * single fat-finger order would otherwise own.
    *
    * Scale shape: ONE exact-percentile aggregate (GK sketch at 100 TB)
    * broadcast over a per-row codegen clip, then a map-side-combined
    * group agg; clipped values are ROUND(,6)→DECIMAL so group folds
    * are order-proof (the clip result inherits the percentile's
    * interpolated double). */
  def winsorizedMean(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("category"), col("o_totalprice"))
    val cuts = o.agg(
      percentile(col("o_totalprice"), lit(0.05)).as("p05"),
      percentile(col("o_totalprice"), lit(0.95)).as("p95"))
    val clipped = round(least(greatest(col("o_totalprice"), col("p05")), col("p95")), 6)
      .cast(DecimalType(18, 6))
    o.crossJoin(broadcast(cuts))
      .select(col("category"), dec(col("o_totalprice")).as("raw"), clipped.as("w"))
      .groupBy(col("category"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("raw")).cast("double") / count(lit(1)).cast("double"), 6)
          .as("mean_raw"),
        round(sum(col("w")).cast("double") / count(lit(1)).cast("double"), 6)
          .as("mean_winsorized"))
      .orderBy("category")
  }

  /** Chronological cut and result size for [[trending]]. The cut is a
    * FIXED literal (mid-range of the 1995–2001 ship dates) so the key
    * needs no anchor scan; both halves are non-empty at every SF. */
  val trendCutDate = "1998-05-01"
  val trendTopK = 25

  /** q_trending — frequency-shift risers: parts whose shipment count
    * grew most between the early and late halves of the timeline,
    * scored by the add-1-smoothed ratio (late+1)/(early+1) — the
    * trending-topics shape (momentum detection over any keyed count:
    * products, queries, n-grams). Smoothing keeps new arrivals finite
    * and mutes one-hit noise.
    *
    * Scale shape: ONE map-side-combined conditional aggregate per part
    * key (both halves in the same pass — no self-join of two period
    * scans), then TakeOrdered for the top-k. */
  def trending(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit(trendCutDate).cast("date")
    val late = (col("l_shipdate").cast("date") >= cut).cast("long")
    Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(sum(lit(1L) - late).as("n_early"), sum(late).as("n_late"))
      .select(col("l_partkey"), col("n_early"), col("n_late"),
        round((col("n_late").cast("double") + lit(1.0)) /
          (col("n_early").cast("double") + lit(1.0)), 6).as("rise"))
      .orderBy(col("rise").desc, col("l_partkey"))
      .limit(trendTopK)
  }

  /** q_graph_jaccard — neighbor-set Jaccard similarity over the part
    * co-order graph: J(a,b) = |orders(a) ∩ orders(b)| / |orders(a) ∪
    * orders(b)| for every co-ordered part pair with min support — the
    * link-prediction / item-similarity normalization next to
    * [[cooccurLift]]'s independence ratio (lift rewards rare
    * coincidences, Jaccard rewards shared NEIGHBORHOODS; recommenders
    * ship both). Same plan family: the distinct incidence list joined
    * on the order key with a support filter, margins joined back keyed
    * — never an all-pairs product; hot parts at 100 TB get the df-cap
    * treatment the shingle joins use.
    */
  def graphJaccard(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val deg = li.groupBy(col("p")).agg(count(lit(1)).as("d"))
    val pairs = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("pa"), col("b.p").as("pb"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= cooccurMinSupport)
    pairs
      .join(deg.select(col("p").as("pa"), col("d").as("deg_a")), "pa")
      .join(deg.select(col("p").as("pb"), col("d").as("deg_b")), "pb")
      .select(col("pa"), col("pb"), col("c_ab"), col("deg_a"), col("deg_b"),
        round(col("c_ab").cast("double") /
          (col("deg_a") + col("deg_b") - col("c_ab")).cast("double"), 6)
          .as("jaccard"))
      .orderBy("pa", "pb")
  }

  /** q_weighted_median — weight-aware quantiles: per return-flag, the
    * quantity-weighted median of extended price (each row counts
    * `l_quantity` times — "median unit shipped", not "median line
    * item"). The estimator [[percentileExact]]/q_mad cannot express:
    * row-weighted order statistics are what importance-weighted
    * corpora (q_dsir_weights, q_soft_dedup output) need downstream.
    * Lower weighted median: the smallest value whose cumulative weight
    * reaches half the total.
    *
    * Scale shape: the corpus pass ends at the (flag, value) aggregate
    * (bounded by the value domain — the q_auc_exact device); one keyed
    * cumulative window over that frame; the threshold comparison
    * 2·cumw ≥ W is pure BIGINT (no halves, no floats) so both engines
    * pick the identical value. */
  def weightedMedian(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(
      col("l_returnflag").as("flag"),
      round(col("l_extendedprice") * 100).cast("long").as("cents"),
      col("l_quantity").cast("long").as("wt"))
    val g = li.groupBy(col("flag"), col("cents")).agg(sum(col("wt")).as("w"))
    val win = Window.partitionBy(col("flag")).orderBy(col("cents"))
    val tot = g.groupBy(col("flag")).agg(sum(col("w")).as("w_total"))
    g.withColumn("cw", sum(col("w")).over(win))
      .join(tot, Seq("flag"))
      .filter(lit(2L) * col("cw") >= col("w_total"))
      .groupBy(col("flag"), col("w_total"))
      .agg(min(col("cents")).as("med_cents"))
      .select(col("flag"), col("w_total"),
        round(col("med_cents").cast("double") / lit(100.0), 2)
          .as("weighted_median"))
      .orderBy("flag")
  }

  /** q_skyline — 2-d Pareto frontier over part (maximize p_size,
    * minimize p_retailprice): the multi-criteria shortlist operator
    * (cheapest-per-capability). A part survives iff no other part is
    * ≥ size AND ≤ price with at least one strict — the textbook
    * dominance definition, which the oracle states verbatim as
    * NOT EXISTS.
    *
    * The O(n²) dominance join is avoided entirely: collapse to the
    * per-size price minimum (≤ |distinct sizes| rows — BOUNDED by the
    * attribute domain, not the data), sweep that tiny frame once with a
    * running-min window ordered by size descending (a point survives
    * iff its per-size min price is strictly below every larger size's
    * best price), then semi-join the surviving (size, price) frontier
    * back to the full table broadcast-style to recover ties. At 100 TB
    * the only wide work is the groupBy(size) map-side-combined
    * aggregate; the single-partition window runs over ≤ 50 rows.
    * Equal (size, price) twins dominate neither way, so both stay —
    * the back-join keeps them naturally. */
  def skyline(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_name"), col("p_size"),
        dec(col("p_retailprice")).as("price"))
    val perSize = p.groupBy(col("p_size")).agg(min(col("price")).as("min_price"))
    val sweep = Window.orderBy(col("p_size").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = perSize
      .withColumn("best_larger", min(col("min_price")).over(sweep))
      .filter(col("best_larger").isNull || col("min_price") < col("best_larger"))
      .select(col("p_size").as("f_size"), col("min_price").as("f_price"))
    p.join(broadcast(frontier),
        col("p_size") === col("f_size") && col("price") === col("f_price"))
      // frontier equality join stays exact-DECIMAL; only the OUTPUT cell
      // ships as double (float64 parity with the oracle's pandas bridge)
      .select(col("p_partkey"), col("p_name"), col("p_size"),
        col("price").cast("double").as("price"))
      .orderBy("p_partkey")
  }

  /** RFM quantile buckets (the classic quintile scoring). */
  val rfmBuckets = 5

  /** q_rfm — recency/frequency/monetary customer segmentation: per
    * customer, days since last order (vs the corpus-wide anchor = max
    * order date, so the key is reproducible without wall-clock),
    * order count, and lifetime spend, each scored into quintiles
    * (5 = most recent / most frequent / highest spend). The marketing
    * segmentation every behavioral pipeline ships; composes with
    * q_cohort (acquisition view) and q_retention_curve (decay view).
    *
    * Scale shape: ONE map-side-combined aggregate over orders reduces
    * the corpus to a narrow per-customer frame; the anchor is a one-row
    * broadcast cross (the in-plan scalar device). The three quintile
    * scores are [[ScalableRank.rangeNtile]] devices (r14) — range-
    * bucketed exact NTILE, bit-identical to the naive unpartitioned
    * window but never a single-reducer sort over ALL customers at
    * 100 TB. Ties inside an order are totally broken by custkey, so
    * scores are deterministic on both engines. */
  def rfm(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderdate").cast("date").as("d"),
        dec(col("o_totalprice")).as("tp"))
    val anchor = o.agg(max(col("d")).as("anchor"))
    val base = o.groupBy(col("o_custkey"))
      .agg(max(col("d")).as("last_d"), count(lit(1)).as("frequency"),
        sum(col("tp")).as("monetary"))
      .crossJoin(broadcast(anchor))
      .select(col("o_custkey"),
        datediff(col("anchor"), col("last_d")).as("recency_days"),
        col("frequency"), col("monetary"))
    // three chained devices; each bucket key tracks its order's primary
    // direction (negated for the DESC recency sort). Each device
    // checkpoints its keyed input internally, so the chain never
    // re-derives the orders aggregate (an unbroken lazy chain would
    // recompute it 3³ times — measured 6× slower)
    val s1 = ScalableRank.rangeNtile(base, -col("recency_days"),
      Seq(col("recency_days").desc, col("o_custkey")), rfmBuckets, "r_score")
    val s2 = ScalableRank.rangeNtile(s1, col("frequency"),
      Seq(col("frequency"), col("o_custkey")), rfmBuckets, "f_score")
    val s3 = ScalableRank.rangeNtile(s2, col("monetary"),
      Seq(col("monetary"), col("o_custkey")), rfmBuckets, "m_score")
    s3.select(col("o_custkey"), col("recency_days"), col("frequency"),
        round(col("monetary").cast("double"), 2).as("monetary"),
        col("r_score"), col("f_score"), col("m_score"))
      .orderBy("o_custkey")
  }

  /** q_dq_audit — declarative data-quality gate (the dbt-test/Deequ
    * class): one row per constraint with row/violation counts and a
    * pass flag. Checks uniqueness (lineitem's (l_orderkey,
    * l_linenumber) "PK" — genuinely violated in this corpus, so the
    * audit BITES), referential integrity (lineitem→orders,
    * orders→customer — clean, which is the invariant worth shipping),
    * domain checks (non-negative balance — bites; discount range —
    * clean), freshness (orders past the cutoff — bites), and
    * non-emptiness (documents.text — clean). The release gate a
    * training-data pipeline runs between ingest and export, next to
    * [[kAnonymity]]'s privacy gate and q_split_leakage's split gate.
    *
    * Scale shape: every check is either ONE map-side-combined
    * conditional aggregate over its table (count + violation sum in
    * the same pass) or ONE keyed left join against a distinct parent
    * key set (narrow key streams, never payloads); the union is
    * |constraints| one-row frames. Nothing global, nothing quadratic. */
  def dqAudit(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val d = Tables.documents(spark, dir)
    def shape(name: String, table: String, df: DataFrame): DataFrame =
      df.select(lit(name).as("check_name"), lit(table).as("table_name"),
        col("n_rows"), col("n_violations"),
        (col("n_violations") === 0L).cast("int").as("pass"))
    def vio(cond: Column): Column = sum(cond.cast("long")).as("n_violations")
    val pk = li.agg(count(lit(1)).as("n_rows"),
      (count(lit(1)) - count_distinct(col("l_orderkey"), col("l_linenumber")))
        .as("n_violations"))
    val fkLiO = li.select(col("l_orderkey"))
      .join(o.select(col("o_orderkey")).distinct(),
        col("l_orderkey") === col("o_orderkey"), "left")
      .agg(count(lit(1)).as("n_rows"), vio(col("o_orderkey").isNull))
    val fkOC = o.select(col("o_custkey"))
      .join(c.select(col("c_custkey")).distinct(),
        col("o_custkey") === col("c_custkey"), "left")
      .agg(count(lit(1)).as("n_rows"), vio(col("c_custkey").isNull))
    val bal = c.agg(count(lit(1)).as("n_rows"), vio(col("c_acctbal") < 0))
    val disc = li.agg(count(lit(1)).as("n_rows"),
      vio(!col("l_discount").between(0.0, 0.1)))
    val fresh = o.agg(count(lit(1)).as("n_rows"),
      vio(col("o_orderdate").cast("date") > lit("2001-01-01").cast("date")))
    val txt = d.agg(count(lit(1)).as("n_rows"),
      vio(col("text").isNull || length(col("text")) === 0))
    shape("pk_unique_lineitem", "lineitem", pk)
      .unionAll(shape("fk_lineitem_orders", "lineitem", fkLiO))
      .unionAll(shape("fk_orders_customer", "orders", fkOC))
      .unionAll(shape("nonneg_c_acctbal", "customer", bal))
      .unionAll(shape("range_l_discount", "lineitem", disc))
      .unionAll(shape("fresh_o_orderdate", "orders", fresh))
      .unionAll(shape("nonempty_text", "documents", txt))
      .orderBy("check_name")
  }

  /** Price-bin width for [[mutualInfo]]'s Y axis. */
  val miBinWidth = 50000
  val miBins = 10

  /** q_mutual_info — mutual information between a categorical feature
    * (order priority) and the binned target (total price): the
    * dependence screen that catches what [[corrMatrix]] cannot —
    * Pearson sees only LINEAR relations between numerics, MI sees any
    * statistical dependence between any pair of discrete views, which
    * is the feature-relevance question as a training pipeline actually
    * asks it. Output: the full (x, y) contingency grid with per-cell
    * PMI terms, plus the MI total.
    *
    * Scale shape: ONE map-side-combined aggregate collapses the corpus
    * to the ≤ |X|·|Y| grid; margins and totals are derived FROM the
    * grid (tiny re-aggs, broadcast back) — the corpus is scanned once.
    * Terms are ROUND(,9)→DECIMAL so the grid fold is order-proof; empty
    * cells contribute 0 by absence (the 0·ln0 convention). */
  def mutualInfo(spark: SparkSession, dir: String): DataFrame = {
    val grid = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("x"),
        least(floor(col("o_totalprice") / miBinWidth), lit((miBins - 1).toLong))
          .cast("int").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("n_xy"))
    val mx = grid.groupBy(col("x")).agg(sum(col("n_xy")).as("n_x"))
    val my = grid.groupBy(col("y")).agg(sum(col("n_xy")).as("n_y"))
    val nT = grid.agg(sum(col("n_xy")).as("n_total"))
    val nd = col("n_total").cast("double")
    val pmi = log(col("n_xy").cast("double") * nd /
      (col("n_x").cast("double") * col("n_y").cast("double")))
    val terms = grid.join(broadcast(mx), "x").join(broadcast(my), "y")
      .crossJoin(broadcast(nT))
      .select(col("x"), col("y"), col("n_xy"), col("n_x"), col("n_y"),
        round(pmi, 6).as("pmi"),
        round((col("n_xy").cast("double") / nd) * pmi, 9)
          .cast(DecimalType(18, 9)).as("term"))
    val total = terms.agg(round(sum(col("term")).cast("double"), 6).as("mi_total"))
    terms
      .select(col("x"), col("y"), col("n_xy"), col("pmi"),
        col("term").cast("double").as("mi_term"))
      .crossJoin(broadcast(total))
      .orderBy("x", "y")
  }

  /** Laplace scale for [[dpCounts]] (b = 1/ε, ε = 0.5 per count,
    * sensitivity 1). */
  val dpEps = 0.5

  /** q_dp_counts — differentially-private release counts: per-nation
    * customer counts with Laplace(1/ε) noise whose "randomness" is
    * hash-derived (the content-addressed determinism of the Sampling
    * module: reproducible across runs, engines, partitionings — and
    * oracle-checkable, which true randomness never is). The OTHER
    * privacy gate next to [[kAnonymity]]: k-anonymity audits the
    * quasi-identifier classes you keep, DP noise protects the
    * aggregate counts you publish. The true count is emitted ONLY for
    * the gate (the q_approx_distinct device) — a production release
    * ships the noisy column alone.
    *
    * Scale shape: one map-side-combined keyed count, then per-row
    * codegen noise — the inverse-CDF ln is the only transcendental,
    * ROUND(,6)-pinned on both engines. */
  def dpCounts(spark: SparkSession, dir: String): DataFrame = {
    val b = 1.0 / dpEps
    val counts = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_true"))
    // u in (0,1): integer hash uniform at 1e-6 resolution, +0.5 offset
    // keeps the inverse CDF off both singularities
    val u = (pmod(graft.text.TextOps.baseHash60(
        concat(lit("dp:"), col("c_nationkey").cast("string"))), lit(1000000L))
      .cast("double") + lit(0.5)) / lit(1000000.0)
    val centered = u - lit(0.5)
    val noise = -lit(b) * signum(centered) *
      log(lit(1.0) - lit(2.0) * abs(centered))
    counts
      .select(col("c_nationkey"), col("n_true"),
        round(noise, 6).as("noise"),
        round(col("n_true").cast("double") + noise, 6).as("n_noisy"))
      .orderBy("c_nationkey")
  }

  /** q_benford — first-digit (Benford) audit over order totals: per
    * leading digit 1–9, observed count and frequency vs the Benford
    * expectation log10(1 + 1/d), with the chi-square contribution —
    * the forensic-accounting screen for fabricated or truncated
    * numeric columns (synthetic data rarely follows Benford, and the
    * audit SHOWS that rather than assuming it). The digit is read from
    * the DECIMAL(18,2) string form — both engines print the same
    * canonical decimal, where log10/pow on the raw double would be
    * last-ulp fragile.
    *
    * Scale shape: one per-row codegen digit extraction into a
    * map-side-combined 9-row aggregate; the total is derived from
    * those 9 rows and crossed back as a one-row broadcast. The
    * chi-square terms are computed from the ROUNDED frequencies so
    * the arithmetic is engine-identical. */
  def benford(spark: SparkSession, dir: String): DataFrame = {
    val digits = Tables.orders(spark, dir)
      .select(substring(dec(col("o_totalprice")).cast("string"), 1, 1)
        .cast("int").as("digit"))
      .filter(col("digit").between(1, 9))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = digits.agg(sum(col("n")).as("n_total"))
    val obs = round(col("n").cast("double") / col("n_total").cast("double"), 6)
    val exp = round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 6)
    digits.crossJoin(broadcast(total))
      .select(col("digit"), col("n"), obs.as("obs_freq"), exp.as("benford_freq"),
        round(col("n_total").cast("double") * (obs - exp) * (obs - exp) / exp, 6)
          .as("chi2_term"))
      .orderBy("digit")
  }

  /** q_corr_matrix — the pairwise Pearson correlation matrix over the
    * lineitem measures (quantity, price, discount, tax): the feature-
    * correlation screen run before training (collinear features waste
    * model capacity and destabilize linear fits) and the
    * multi-variable generalization of q_stats_moments' single grouped
    * pair. All 4 variable sums, 4 squares, and 6 cross products are
    * computed in ONE map-side-combined aggregate pass as exact DECIMAL
    * power sums (the established device: addition order cannot wiggle
    * them); the 6 output rows are then EXPLODED from a literal struct
    * array over the one-row sums frame — no per-pair rescan, no union
    * of six aggregate subtrees. At 100 TB this is one corpus pass
    * shuffling a single 15-column row. */
  def corrMatrix(spark: SparkSession, dir: String): DataFrame = {
    val vars = Seq(
      "discount" -> dec4(col("l_discount")),
      "price" -> dec4(col("l_extendedprice")),
      "quantity" -> dec4(col("l_quantity")),
      "tax" -> dec4(col("l_tax")))
    def prod(a: Column, b: Column): Column = (a * b).cast(DecimalType(30, 8))
    val sumAggs = vars.map { case (nm, c) => sum(c).cast("double").as(s"s_$nm") }
    val prodAggs = for {
      i <- vars.indices; j <- i until vars.size
    } yield sum(prod(vars(i)._2, vars(j)._2)).cast("double")
      .as(s"s_${vars(i)._1}_${vars(j)._1}")
    val aggs = (count(lit(1)).as("n") +: sumAggs) ++ prodAggs
    val sums = Tables.lineitem(spark, dir).agg(aggs.head, aggs.tail: _*)
    val nd = col("n").cast("double")
    def ss(a: String, b: String): Column =
      col(s"s_${a}_$b") - col(s"s_$a") * col(s"s_$b") / nd
    val pairs = for {
      i <- vars.indices; j <- (i + 1) until vars.size
    } yield {
      val (a, b) = (vars(i)._1, vars(j)._1)
      struct(lit(a).as("var_a"), lit(b).as("var_b"),
        round(ss(a, b) / nd, 6).as("cov"),
        round(ss(a, b) / sqrt(ss(a, a) * ss(b, b)), 6).as("corr"))
    }
    sums.select(col("n"), explode(array(pairs: _*)).as("p"))
      .select(col("p.var_a").as("var_a"), col("p.var_b").as("var_b"),
        col("n"), col("p.cov").as("cov"), col("p.corr").as("corr"))
      .orderBy("var_a", "var_b")
  }

  /** Bin width for [[woeIv]]'s quantity discretization (l_quantity is
    * 1..50, so width 10 gives 5 bins). */
  val woeBinWidth = 10

  /** q_woe_iv — weight-of-evidence encoding + information value of the
    * binned quantity feature against the returns label (the
    * credit-scoring standard next to [[targetEncoding]]: WOE gives each
    * bin a log-odds score on the TARGET scale, IV = Σ (pos%−neg%)·WOE
    * summarizes the whole feature's predictive power — the number a
    * feature-selection pass ranks by). The +0.5 Laplace adjustment is
    * the standard "adjusted WOE" that keeps pure bins finite.
    *
    * Scale shape: ONE corpus pass ends at the feature-domain histogram
    * (≤ 5 bins here — the q_decision_stump device); totals are window
    * sums over that tiny frame; each bin's WOE/IV term is a one-shot
    * double chain ROUND(,9), and IV's cross-bin sum runs in
    * DECIMAL(18,9) so it is addition-order-proof. */
  def woeIv(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(
      floor((col("l_quantity") - 1) / woeBinWidth).cast("int").as("bin"),
      when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
    val hist = li.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      .withColumn("neg", col("n") - col("pos"))
    val wAll = Window.partitionBy()
    val m = hist
      .withColumn("p", sum(col("pos")).over(wAll))
      .withColumn("q", sum(col("neg")).over(wAll))
    def nd(c: Column) = c.cast("double")
    val posShare = (nd(col("pos")) + lit(0.5)) / nd(col("p"))
    val negShare = (nd(col("neg")) + lit(0.5)) / nd(col("q"))
    val woe = round(log(posShare / negShare), 9)
    val ivTerm = round((posShare - negShare) * woe, 9)
      .cast(DecimalType(18, 9))
    val scored = m.select(col("bin"), col("n"), col("pos"), col("neg"),
      woe.as("woe"), ivTerm.as("iv_term"))
    scored
      .withColumn("iv", round(sum(col("iv_term")).over(Window.partitionBy())
        .cast("double"), 9))
      .select(col("bin"), col("n"), col("pos"), col("neg"), col("woe"),
        round(col("iv_term").cast("double"), 9).as("iv_term"), col("iv"))
      .orderBy("bin")
  }

  /** Smoothing pseudo-count for [[targetEncoding]] (the m in the
    * empirical-Bayes shrinkage toward the global prior). */
  val teSmoothing = 10.0

  /** q_target_encoding — smoothed leave-one-out mean-target encoding:
    * each order's priority category is replaced by the mean total
    * price of the OTHER orders in that category, shrunk toward the
    * global mean by [[teSmoothing]] pseudo-observations —
    * enc = (sum_cat − y + m·prior) / (n_cat − 1 + m). The feature-
    * engineering step that turns a high-cardinality categorical into
    * one dense column WITHOUT leaking the row's own target (the
    * leave-one-out term) — a training-data op q_string_index/q_onehot
    * deliberately don't cover.
    *
    * Scale shape: category stats are ONE map-side-combined aggregate
    * (≤ |categories| rows, broadcast back); the prior is a one-row
    * broadcast cross; the encode itself is per-row codegen arithmetic.
    * Determinism: sums are DECIMAL-exact before the single double
    * division; the expression tree is mirrored term for term in the
    * oracle so IEEE evaluation is identical. */
  def targetEncoding(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority").as("category"),
        col("o_totalprice"))
    val catStats = o.groupBy(col("category"))
      .agg(count(lit(1)).as("n_cat"), sum(dec(col("o_totalprice"))).as("sum_cat"))
    val prior = o.agg((sum(dec(col("o_totalprice"))).cast("double") /
      count(lit(1)).cast("double")).as("prior"))
    o.join(broadcast(catStats), "category")
      .crossJoin(broadcast(prior))
      .select(col("o_orderkey"), col("category"),
        round((col("sum_cat").cast("double") - col("o_totalprice") +
            lit(teSmoothing) * col("prior")) /
          (col("n_cat").cast("double") - lit(1.0) + lit(teSmoothing)), 6)
          .as("te"))
      .orderBy("o_orderkey", "category")
  }
}
