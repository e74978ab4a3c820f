package graft

import org.apache.spark.sql.functions._

import graft.rel.RelQueries

/** One assertion set per §2.B operator on sf0.001, plus plan-shape
  * checks (pushdown, broadcast, top-k) — the "is the plan the one we'd
  * want at 100 TB" gate, not just row correctness. */
class RelQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("every registered query runs and most return rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n >= 0, s"$name failed")
      if (!Set("q_dedup_ngram", "q_dedup_minhash").contains(name))
        assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry flagship returns revenue per nation") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length > 0 && rows.length <= 25)
    assert(rows.map(_.getAs[java.math.BigDecimal]("revenue").doubleValue()).forall(_ > 0))
  }

  test("oracle keys are a subset of query keys with matching names") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracle-only keys: ${os -- qs}")
    // every key is oracled since r15: the adaptive capped-LSH mirror
    // unrolls the refinement loop (cappedLshMirrorSql), and the
    // IVF/PQ Lloyd averages use the decimal device so training is
    // addition-order-proof in both engines
    assert((qs -- os).isEmpty, s"rows-only keys remain: ${qs -- os}")
  }

  test("q_filter pushes predicates into the parquet scan") {
    val plan = RelQueries.filterQ(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan.take(500))
    assert(plan.contains("l_quantity"), "quantity filter not pushed")
  }

  test("q_scan_project prunes columns at the scan") {
    val plan = RelQueries.scanProject(spark, sfDir).queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_shipdate") && !readSchema.contains("l_tax"),
      s"unpruned read: $readSchema")
  }

  test("q_join_broadcast plans broadcast joins for dims") {
    val plan = RelQueries.joinBroadcast(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  test("q_sort_limit plans TakeOrderedAndProject (no global sort)") {
    val plan = RelQueries.sortLimit(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
  }

  test("q_agg_groupby: Q1 invariants") {
    val rows = RelQueries.aggGroupBy(spark, sfDir).collect()
    assert(rows.length == 6) // {A,N,R} x {F,O}
    val n = rows.map(_.getAs[Long]("n")).sum
    assert(n == Tables.lineitem(spark, sfDir).count())
  }

  test("q_join_left counts zero-order customers as 0") {
    val df = RelQueries.joinLeft(spark, sfDir)
    val total = df.agg(sum("n_orders")).head().getLong(0)
    assert(total == Tables.orders(spark, sfDir).count())
    assert(df.count() == Tables.customer(spark, sfDir).count())
  }

  test("semi + anti partition the customer set") {
    // same >300000 predicate as joinAnti: semi(P) and anti(P) must tile
    // the customer set exactly for any P
    val bigOrders = Tables.orders(spark, sfDir).filter(col("o_totalprice") > 300000)
    val semiBig = Tables.customer(spark, sfDir)
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi").count()
    val anti = RelQueries.joinAnti(spark, sfDir).count()
    assert(anti > 0, "anti-join fixture regressed to empty (r14 ask #3)")
    assert(semiBig + anti == Tables.customer(spark, sfDir).count())
  }

  test("q_agg_rollup adds subtotal and grand-total rows") {
    val base = RelQueries.aggGroupBy(spark, sfDir).count()
    val rollup = RelQueries.aggRollup(spark, sfDir).collect()
    assert(rollup.length == base + 3 + 1) // 6 leaves + 3 flag subtotals + total
    val grand = rollup.find(r => r.isNullAt(0) && r.isNullAt(1)).get
    assert(grand.getAs[Long]("n") == Tables.lineitem(spark, sfDir).count())
  }

  test("q_window_rank rn==1 rows are each customer's max-price order") {
    val top = RelQueries.windowRank(spark, sfDir)
      .filter(col("rn") === 1).select("o_custkey", "o_totalprice")
    val expect = Tables.orders(spark, sfDir)
      .groupBy("o_custkey").agg(max("o_totalprice").as("o_totalprice"))
    assert(top.except(expect).isEmpty && expect.except(top).isEmpty)
  }

  test("q_topk_per_group returns at most 3 per customer") {
    val over = RelQueries.topkPerGroup(spark, sfDir)
      .groupBy("o_custkey").count().filter(col("count") > 3).count()
    assert(over == 0)
  }

  test("q_window_sliding doubles event count (each event in 2 windows)") {
    val n = RelQueries.windowSliding(spark, sfDir).agg(sum("n")).head().getLong(0)
    assert(n == Tables.events(spark, sfDir).count() * 2)
  }

  test("q_window_session: session count bounded and covers all events") {
    val s = RelQueries.windowSession(spark, sfDir)
    val nEvents = s.agg(sum("n_events")).head().getLong(0)
    assert(nEvents == Tables.events(spark, sfDir).count())
  }

  test("q_join_asof matches every event to the latest prior order date") {
    val out = RelQueries.joinAsOf(spark, sfDir)
    // all events match (orders all predate the 2024 events)
    assert(out.count() == Tables.events(spark, sfDir).count())
    // spot-check one user: events are all later than every order, so the
    // matched date must be that customer's max order date
    val row = out.orderBy("event_id").limit(1).head()
    val uid = row.getAs[Long]("user_id")
    val expected = Tables.orders(spark, sfDir)
      .filter(col("o_custkey") === uid)
      .agg(max(col("o_orderdate").cast("timestamp_ntz"))).head()
      .getAs[java.time.LocalDateTime](0)
    assert(row.getAs[java.time.LocalDateTime]("o_date") == expected)
  }

  test("q_dedup_latest keeps exactly one newest event per (user, type)") {
    val out = RelQueries.dedupLatest(spark, sfDir)
    val events = Tables.events(spark, sfDir)
    // one row per key, and as many rows as distinct keys
    assert(out.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).isEmpty)
    assert(out.count() ==
      events.select("user_id", "event_type").distinct().count())
    // the kept row really is the max (ts, event_id) of its key
    val key = out.limit(1).head()
    val (uid, et) = (key.getAs[Long]("user_id"), key.getAs[String]("event_type"))
    val expect = events
      .filter(col("user_id") === uid && col("event_type") === et)
      .orderBy(col("ts").desc, col("event_id").desc).limit(1).head()
    assert(key.getAs[Long]("event_id") == expect.getAs[Long]("event_id"))
  }

  test("q_window_range: trailing-30-day frame holds value-near rows, not row-count") {
    val out = RelQueries.windowRange(spark, sfDir).collect()
    // pick a customer with >1 order; its first order's trailing sum is
    // its own price unless another order is within 30 days BEFORE it
    val byCust = out.groupBy(_.getAs[Long]("o_custkey")).values.find(_.length > 2).get
      .sortBy(r => (r.getAs[Long]("t"), r.getAs[Long]("o_orderkey")))
    byCust.foreach { r =>
      val t = r.getAs[Long]("t")
      val expect = byCust.filter(o => o.getAs[Long]("t") >= t - 30L * 86400 &&
        o.getAs[Long]("t") <= t)
      // the frame is value-based: trailing sum strictly grows with more
      // in-range rows, and a lone row's trailing sum is its own price
      assert(r.getAs[Double]("trailing30") > 0)
      assert(expect.nonEmpty)
    }
    // total rows = orders rows (every row gets a frame)
    assert(out.length == Tables.orders(spark, sfDir).count())
  }

  test("q_arg_minmax picks the price of the min/max order key, no window") {
    val out = RelQueries.argMinMax(spark, sfDir)
    val row = out.limit(1).head()
    val cust = row.getAs[Long]("o_custkey")
    val orders = Tables.orders(spark, sfDir)
      .filter(col("o_custkey") === cust)
      .select("o_orderkey", "o_totalprice")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(row.getAs[Double]("first_price") == orders.head._2)
    assert(row.getAs[Double]("latest_price") == orders.last._2)
    assert(row.getAs[Long]("first_okey") == orders.head._1)
    // one hash agg, no Window/Sort in the agg path
    val plan = PlanAudit.executedPlan(out).toString
    assert(!plan.contains("Window"), "argmax must not plan a window")
  }

  test("q_join_null_safe: NULL-keyed rows survive and match the NULL group") {
    val out = RelQueries.joinNullSafe(spark, sfDir)
    val orders = Tables.orders(spark, sfDir)
    // every order row survives (a plain equi-join would drop the NULLs)
    assert(out.count() == orders.count())
    val nullRows = out.filter(col("k").isNull)
    val pCount = orders.filter(col("o_orderstatus") === "P").count()
    assert(nullRows.count() == pCount && pCount > 0)
    assert(nullRows.select("n_in_group").distinct().head().getLong(0) == pCount)
  }

  test("q_histogram buckets partition the table: counts sum to row count, ids in range") {
    val out = RelQueries.histogramQ(spark, sfDir).collect()
    val total = Tables.orders(spark, sfDir).count()
    assert(out.map(_.getAs[Long]("n")).sum == total)
    assert(out.forall { r =>
      val b = r.getAs[Long]("bucket"); b >= 0 && b < RelQueries.histBuckets
    })
  }

  test("q_profile: one row per column, mean inside [min, max], null-free measures") {
    val out = RelQueries.profileQ(spark, sfDir).collect()
    assert(out.map(_.getAs[String]("col_name")).toSet ==
      Set("l_quantity", "l_extendedprice", "l_discount"))
    val total = Tables.lineitem(spark, sfDir).count()
    out.foreach { r =>
      assert(r.getAs[Long]("n") == total)
      assert(r.getAs[Long]("n_null") == 0L)
      val (mn, mx, mean) = (r.getAs[Double]("mn"), r.getAs[Double]("mx"),
        r.getAs[Double]("mean"))
      assert(mean >= mn && mean <= mx, s"${r.getAs[String]("col_name")}: $mean not in [$mn,$mx]")
    }
  }

  test("q_stats_moments matches Spark's built-in population moments") {
    val got = RelQueries.statsMoments(spark, sfDir).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r).toMap
    val ref = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(avg(col("l_quantity")).as("m"), var_pop(col("l_quantity")).as("v"),
        stddev_pop(col("l_quantity")).as("s"),
        corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect().map(r => r.getAs[String]("l_returnflag") -> r).toMap
    assert(got.keySet == ref.keySet && got.nonEmpty)
    got.foreach { case (flag, r) =>
      assert(math.abs(r.getAs[Double]("mean_qty") - ref(flag).getAs[Double]("m")) < 1e-4)
      assert(math.abs(r.getAs[Double]("var_qty") - ref(flag).getAs[Double]("v")) < 1e-3)
      assert(math.abs(r.getAs[Double]("std_qty") - ref(flag).getAs[Double]("s")) < 1e-4)
      assert(math.abs(r.getAs[Double]("corr_qty_price") - ref(flag).getAs[Double]("c")) < 1e-4,
        s"$flag: ${r.getAs[Double]("corr_qty_price")} vs ${ref(flag).getAs[Double]("c")}")
    }
  }

  test("q_window_ntile: balanced quartiles, pct_rank/cume_dist hit their endpoints") {
    val rows = RelQueries.windowNtile(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("o_custkey"))
    assert(rows.nonEmpty)
    rows.foreach { case (ck, rs) =>
      // quartile sizes differ by at most 1 and earlier buckets are never smaller
      val sizes = rs.groupBy(_.getAs[Int]("quartile")).view.mapValues(_.length)
      val present = sizes.keys.toSeq.sorted
      assert(present.head == 1 && present == (1 to present.size),
        s"cust $ck: quartiles must be dense from 1: $present")
      assert(sizes.values.max - sizes.values.min <= 1, s"cust $ck: unbalanced $sizes")
      (1 until present.size).foreach { i =>
        assert(sizes(present(i - 1)) >= sizes(present(i)), s"cust $ck: early buckets take the extras")
      }
      // endpoints: first row 0.0 pct_rank; last row cume_dist exactly 1.0
      assert(rs.map(_.getAs[Double]("pct_rank")).min == 0.0)
      assert(rs.map(_.getAs[Double]("cdist")).max == 1.0)
      if (rs.length > 1)
        assert(rs.map(_.getAs[Double]("pct_rank")).max == 1.0, s"cust $ck: max pct_rank")
    }
  }

  test("q_join_full has unmatched rows on BOTH sides plus matched rows") {
    val out = RelQueries.joinFull(spark, sfDir).collect()
    val leftOnly = out.count(r => !r.isNullAt(1) && r.isNullAt(3))
    val rightOnly = out.count(r => r.isNullAt(1) && !r.isNullAt(3))
    val both = out.count(r => !r.isNullAt(1) && !r.isNullAt(3))
    assert(leftOnly > 0, "no left-only rows: full outer degenerated to right join")
    assert(rightOnly > 0, "no right-only rows: full outer degenerated to left join")
    assert(both > 0)
    // custkey is never null (coalesce of the two keys) and unique
    assert(out.forall(!_.isNullAt(0)))
    assert(out.map(_.getLong(0)).distinct.length == out.length)
  }

  test("q_agg_collect is invariant under repartitioning (sorted collect)") {
    val a = RelQueries.aggCollect(spark, sfDir).collect()
    val b = RelQueries.aggCollect(spark, sfDir)
      .repartition(7).sort("o_custkey").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    // statuses string has n entries; prio_set is sorted and duplicate-free
    a.foreach { r =>
      assert(r.getAs[String]("statuses").split(",").length == r.getAs[Long]("n"))
      val ps = r.getAs[String]("prio_set").split(",").toSeq
      assert(ps == ps.sorted && ps.distinct == ps)
    }
  }

  test("q_agg_multi_distinct plans ONE scan via Expand, values cross-checked") {
    val df = RelQueries.aggMultiDistinct(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), "multiple count-distincts must go through a single Expand pass")
    assert(plan.split("Scan parquet").length - 1 == 1, "must read lineitem exactly once")
    val li = graft.Tables.lineitem(spark, sfDir).collect()
    df.collect().foreach { r =>
      val ls = r.getString(0)
      val rows = li.filter(_.getAs[String]("l_returnflag") != null)
        .filter(_.getAs[String]("l_linestatus") == ls)
      assert(r.getAs[Long]("nd_part") == rows.map(_.getAs[Long]("l_partkey")).distinct.length)
      assert(r.getAs[Long]("nd_supp") == rows.map(_.getAs[Long]("l_suppkey")).distinct.length)
    }
  }

  test("q_subquery_exists ≡ Spark SQL's own correlated EXISTS form") {
    val deco = RelQueries.subqueryExists(spark, sfDir).collect().map(_.toSeq).toSeq
    Tables.customer(spark, sfDir).createOrReplaceTempView("c_exists_v")
    Tables.orders(spark, sfDir).createOrReplaceTempView("o_exists_v")
    val sql = spark.sql(
      """SELECT c_custkey, c_name, c_acctbal FROM c_exists_v c
        |WHERE EXISTS (SELECT 1 FROM o_exists_v o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |AND NOT EXISTS (SELECT 1 FROM o_exists_v o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin).collect().map(_.toSeq).toSeq
    assert(deco == sql)
    assert(deco.nonEmpty)
  }

  test("q_join_fuzzy: within-threshold pairs surface once, distant and cross-block pairs don't") {
    val rows = RelQueries.joinFuzzy(spark, sfDir).collect()
    assert(rows.nonEmpty, "fixture vocabulary must contain near-miss names")
    val pairs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "canonical a<b ordering, each pair once")
      assert(r.getInt(2) >= 1 && r.getInt(2) <= RelQueries.fuzzyMaxDist)
      // blocking key respected: matched names share their second token
      assert(r.getString(0).split(" ")(1) == r.getString(1).split(" ")(1))
      assert(r.getLong(3) > 0 && r.getLong(4) > 0, "support counts joined back")
    }
    // ground truth on the distinct vocabulary: every same-block pair
    // within the threshold is found (driver-side reference levenshtein)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = Tables.part(spark, sfDir).select("p_name").distinct()
      .collect().map(_.getString(0)).sorted
    val expected = (for {
      a <- names; b <- names
      if a < b && a.split(" ")(1) == b.split(" ")(1) && lev(a, b) <= RelQueries.fuzzyMaxDist
    } yield (a, b)).toSet
    assert(pairs == expected)
  }

  test("q_join_interval: binning misses no true overlap, postfilter admits no false one (driver recompute)") {
    val out = RelQueries.joinInterval(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime]("d"),
        r.getString(2),
        // date_trunc returns LTZ TIMESTAMP even for NTZ input; UTC
        // session makes the wall time identical
        r.getAs[java.sql.Timestamp]("h").toLocalDateTime,
        r.getLong(4)))
    assert(out.nonEmpty)
    // driver-side reference straight from the raw events
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[java.time.LocalDateTime](2)))
    def secs(t: java.time.LocalDateTime): Long =
      t.toEpochSecond(java.time.ZoneOffset.UTC) // truncates sub-second like both engines' floor
    val a = ev.filter(_._1 % RelQueries.intervalUserMod == 0)
      .groupBy(e => (e._1, e._3.toLocalDate))
      .map { case ((u, d), es) =>
        (u, d, es.map(e => secs(e._3)).min, es.map(e => secs(e._3)).max) }
    val b = ev.groupBy(e => (e._2, e._3.withMinute(0).withSecond(0).withNano(0)))
      .map { case ((t, h), es) =>
        (t, h, es.map(e => secs(e._3)).min, es.map(e => secs(e._3)).max) }
    val expected = (for {
      (u, d, as_, ae) <- a; (t, h, bs, be) <- b
      if as_ <= be && bs <= ae
    } yield (u, d.atStartOfDay, t, h, math.min(ae, be) - math.max(as_, bs)))
      .toSeq.sortBy(x => (x._1, x._2.toString, x._3, x._4.toString))
    assert(out.toSeq == expected,
      s"sizes got=${out.length} want=${expected.length}")
  }

  test("survivorshipOf: typo chains merge transitively; golden = most-supported, ties to smallest") {
    // chain aa~ab~abcd: adjacent dists 1 and 2, but the ENDS are dist 3
    // (beyond fuzzyMaxDist) — pairwise linkage alone cannot merge them,
    // CC must; the x-block pair ties on support (1 vs 1) -> smallest
    // name wins; 'zz solo' is a singleton and must NOT appear
    val parts = Seq(
      "alpha k aa", "alpha k ab", "alpha k abcd", // chain, support 1 each
      "alpha k ab",                               // ab -> support 2 => golden
      "beta x m1", "beta x m2",                   // tie on support
      "zz solo q"
    ).toDF("p_name")
    val got = RelQueries.survivorshipOf(parts).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("alpha k aa", "alpha k ab", 3L, 4L, 2L),
      ("beta x m1", "beta x m1", 2L, 2L, 1L)))
  }

  test("q_survivorship gate key: clusters cover the fuzzy pairs, golden maximizes support") {
    val out = RelQueries.survivorship(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty, "fixture vocabulary must produce merged entities")
    out.foreach { case (cluster, golden, nv, st, sg) =>
      assert(nv >= 2 && st >= nv && sg >= 1 && sg <= st)
      assert(cluster <= golden, "cluster name is the lexicographic min member")
    }
    // every linked pair lands in one cluster: cluster count <= distinct
    // names minus pair count is not a valid bound under chains, but the
    // set of names appearing in pairs must all be members of SOME output
    // cluster — check via support accounting: each output cluster's
    // n_variants >= 2 and totals are consistent (asserted above); and
    // no name is golden in two clusters
    assert(out.map(_._2).distinct.length == out.length)
  }

  test("k-anonymity classes partition the table and flag small classes") {
    val out = rel.RelQueries.kAnonymity(spark, sfDir).cache()
    try {
      assert(out.agg(sum("class_size")).head().getLong(0) ==
        Tables.customer(spark, sfDir).count(), "classes must partition the table")
      assert(out.filter(col("class_size") < rel.RelQueries.kAnonK &&
        col("at_risk") =!= 1).count() == 0)
      assert(out.filter(col("class_size") >= rel.RelQueries.kAnonK &&
        col("at_risk") =!= 0).count() == 0)
      assert(out.filter(col("at_risk") === 1).count() > 0,
        "QI choice must bite (measured at every SF)")
    } finally out.unpersist()
  }

  test("rfm scores are balanced quintiles over every customer with orders") {
    val out = rel.RelQueries.rfm(spark, sfDir).cache()
    try {
      assert(out.count() ==
        Tables.orders(spark, sfDir).select("o_custkey").distinct().count())
      for (s <- Seq("r_score", "f_score", "m_score")) {
        assert(out.filter(col(s) < 1 || col(s) > rel.RelQueries.rfmBuckets).count() == 0)
        // ntile balance: bucket sizes differ by at most one
        val sizes = out.groupBy(col(s)).count().collect().map(_.getLong(1))
        assert(sizes.max - sizes.min <= 1, s"$s buckets unbalanced: ${sizes.toSeq}")
      }
      assert(out.filter(col("recency_days") < 0).count() == 0)
      assert(out.filter(col("monetary") <= 0).count() == 0)
    } finally out.unpersist()
  }

  test("dq audit bites on the known violations and clears the clean checks") {
    val rows = rel.RelQueries.dqAudit(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.size == 7)
    // every pass flag is consistent with its violation count
    rows.values.foreach { r =>
      assert((r.getAs[Long]("n_violations") == 0L) == (r.getAs[Int]("pass") == 1)) }
    // the corpus genuinely violates these three (measured at every SF)
    assert(rows("pk_unique_lineitem").getAs[Long]("n_violations") > 0)
    assert(rows("nonneg_c_acctbal").getAs[Long]("n_violations") > 0)
    assert(rows("fresh_o_orderdate").getAs[Long]("n_violations") > 0)
    // and keeps these invariants (the FK graph is clean)
    assert(rows("fk_lineitem_orders").getAs[Long]("n_violations") == 0)
    assert(rows("fk_orders_customer").getAs[Long]("n_violations") == 0)
    assert(rows("fk_lineitem_orders").getAs[Long]("n_rows") ==
      Tables.lineitem(spark, sfDir).count())
  }

  test("target encoding matches a local leave-one-out recompute") {
    val out = rel.RelQueries.targetEncoding(spark, sfDir).cache()
    try {
      val o = Tables.orders(spark, sfDir)
      assert(out.count() == o.count())
      val all = o.select("o_orderkey", "o_orderpriority", "o_totalprice")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      val prior = all.map(x => BigDecimal(x._3).setScale(2)).sum.toDouble / all.length
      val (key, cat, y) = all.head
      val inCat = all.filter(_._2 == cat)
      val sumCat = inCat.map(x => BigDecimal(x._3).setScale(2)).sum.toDouble
      val m = rel.RelQueries.teSmoothing
      val expect = (sumCat - y + m * prior) / (inCat.length - 1.0 + m)
      val got = out.filter(col("o_orderkey") === key).head().getAs[Double]("te")
      assert(math.abs(got - expect) < 1e-4, s"$got vs $expect")
    } finally out.unpersist()
  }

  test("winsorized means are pulled toward the center and cover every group") {
    val out = rel.RelQueries.winsorizedMean(spark, sfDir).collect()
    assert(out.map(_.getAs[Long]("n")).sum == Tables.orders(spark, sfDir).count())
    val gRaw = out.map(r => r.getAs[Long]("n") * r.getAs[Double]("mean_raw")).sum /
      out.map(_.getAs[Long]("n")).sum
    out.foreach { r =>
      val (mr, mw) = (r.getAs[Double]("mean_raw"), r.getAs[Double]("mean_winsorized"))
      // clipping both tails moves each group mean by a bounded amount,
      // and winsorized != raw (the clip must actually fire)
      assert(math.abs(mw - mr) < math.abs(gRaw) * 0.2)
    }
    assert(out.exists(r => math.abs(r.getAs[Double]("mean_winsorized") -
      r.getAs[Double]("mean_raw")) > 1e-6), "the clip must bite somewhere")
  }

  test("trending risers are rank-ordered and the ratio reconciles") {
    val out = rel.RelQueries.trending(spark, sfDir).collect()
    assert(out.length == rel.RelQueries.trendTopK)
    val rises = out.map(_.getAs[Double]("rise"))
    rises.sliding(2).foreach { case Array(a, b) => assert(b <= a + 1e-9) }
    out.foreach { r =>
      val expect = (r.getAs[Long]("n_late") + 1.0) / (r.getAs[Long]("n_early") + 1.0)
      assert(math.abs(r.getAs[Double]("rise") - expect) < 1e-6)
    }
  }

  test("graph jaccard is bounded and consistent with the cooccur pair set") {
    val jac = rel.RelQueries.graphJaccard(spark, sfDir).cache()
    try {
      assert(jac.count() > 0)
      assert(jac.filter(col("jaccard") <= 0.0 || col("jaccard") > 1.0).count() == 0)
      // intersection never exceeds either neighborhood
      assert(jac.filter(col("c_ab") > least(col("deg_a"), col("deg_b"))).count() == 0)
      // same support filter as cooccur lift -> identical pair set
      val lift = rel.RelQueries.cooccurLift(spark, sfDir).select("pa", "pb")
      assert(jac.select("pa", "pb").except(lift).count() == 0)
      assert(lift.except(jac.select("pa", "pb")).count() == 0)
    } finally jac.unpersist()
  }

  test("mutual information is non-negative and the grid partitions orders") {
    val out = rel.RelQueries.mutualInfo(spark, sfDir).collect()
    assert(out.map(_.getAs[Long]("n_xy")).sum ==
      Tables.orders(spark, sfDir).count())
    val mi = out.head.getAs[Double]("mi_total")
    assert(mi >= 0.0, s"MI must be non-negative, got $mi")
    // every cell's term reconciles with its own pmi and cell mass
    val n = out.map(_.getAs[Long]("n_xy")).sum.toDouble
    out.foreach { r =>
      val expect = r.getAs[Long]("n_xy") / n * r.getAs[Double]("pmi")
      assert(math.abs(r.getAs[Double]("mi_term") - expect) < 1e-5)
    }
  }

  test("dp counts: noise reconciles and is Laplace-bounded") {
    val out = rel.RelQueries.dpCounts(spark, sfDir).collect()
    assert(out.length == Tables.customer(spark, sfDir)
      .select("c_nationkey").distinct().count())
    val b = 1.0 / rel.RelQueries.dpEps
    out.foreach { r =>
      val (t, nz, ny) = (r.getAs[Long]("n_true"), r.getAs[Double]("noise"),
        r.getAs[Double]("n_noisy"))
      assert(math.abs(ny - (t + nz)) < 2e-6)
      // inverse-CDF at 1e-6-resolution uniform caps |noise| at b*ln(1e6)
      assert(math.abs(nz) <= b * math.log(1e6) + 1e-6)
    }
    // noise must actually perturb (not all zeros)
    assert(out.count(r => math.abs(r.getAs[Double]("noise")) > 0.01) > 0)
  }

  test("benford audit covers every order and frequencies reconcile") {
    val out = rel.RelQueries.benford(spark, sfDir).collect()
    assert(out.nonEmpty && out.length <= 9)
    assert(out.map(_.getAs[Long]("n")).sum ==
      Tables.orders(spark, sfDir).count(), "every positive total has a digit")
    val obsSum = out.map(_.getAs[Double]("obs_freq")).sum
    assert(math.abs(obsSum - 1.0) < 1e-4, s"observed freqs sum to $obsSum")
    out.foreach { r =>
      val d = r.getAs[Int]("digit")
      assert(d >= 1 && d <= 9)
      assert(math.abs(r.getAs[Double]("benford_freq") -
        math.log10(1.0 + 1.0 / d)) < 1e-5)
      assert(r.getAs[Double]("chi2_term") >= 0.0)
    }
  }

  test("corr matrix agrees with Spark's built-in corr on every pair") {
    val out = rel.RelQueries.corrMatrix(spark, sfDir).collect()
    assert(out.length == 6)
    val cols = Map("discount" -> "l_discount", "price" -> "l_extendedprice",
      "quantity" -> "l_quantity", "tax" -> "l_tax")
    val li = Tables.lineitem(spark, sfDir)
    out.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val c = r.getAs[Double]("corr")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      val ref = li.agg(corr(col(cols(a)), col(cols(b)))).head().getDouble(0)
      assert(math.abs(c - ref) < 1e-5, s"corr($a,$b)=$c vs built-in $ref")
    }
  }

  test("cooccur lift agrees with independence algebra on margins") {
    val out = rel.RelQueries.cooccurLift(spark, sfDir).cache()
    try {
      assert(out.filter(col("c_ab") < rel.RelQueries.cooccurMinSupport).count() == 0)
      // pair count can never exceed either margin
      assert(out.filter(col("c_ab") > col("c_a") || col("c_ab") > col("c_b")).count() == 0)
      // recompute lift for one row from its own exact counts
      val n = Tables.lineitem(spark, sfDir).select("l_orderkey").distinct().count()
      val r = out.head()
      val expect = BigDecimal(r.getAs[Long]("c_ab").toDouble * n /
        (r.getAs[Long]("c_a").toDouble * r.getAs[Long]("c_b").toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("lift") - expect) < 1e-9)
      assert(out.count() > 0)
    } finally out.unpersist()
  }

  test("scd2 PIT join attributes every eligible purchase to exactly one version") {
    val out = rel.RelQueries.scd2Join(spark, sfDir).cache()
    try {
      // at most one version per purchase (intervals partition the timeline)
      assert(out.groupBy("event_id").count().filter(col("count") > 1).count() == 0)
      // attribution window is respected: version starts before the purchase
      val dim = Tables.events(spark, sfDir).filter(col("event_type") === "signup")
        .select(col("event_id").as("version_id"), col("ts").as("vfrom"))
      assert(out.join(dim, "version_id").filter(col("ts") < col("vfrom")).count() == 0)
      // coverage: purchases after their user's FIRST signup all match
      val firstSignup = Tables.events(spark, sfDir).filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("first_signup"))
      val eligible = Tables.events(spark, sfDir).filter(col("event_type") === "purchase")
        .join(firstSignup, "user_id").filter(col("ts") >= col("first_signup")).count()
      assert(out.count() == eligible, "every post-first-signup purchase must attribute")
    } finally out.unpersist()
  }

  test("mad is robust: zero on constant data, unmoved by a single outlier") {
    import spark.implicits._
    val base = Seq.fill(21)((1L, 10.0)) // constant
    val withOutlier = (2L, 1e6) +: Seq.fill(21)((2L, 10.0))
    // drive the same algebra as the operator via a local frame
    val df = (base ++ withOutlier).toDF("user_id", "value")
    val med = df.groupBy("user_id").agg(
      round(expr("percentile(value, 0.5)"), 6).as("med"), count(lit(1)).as("n"))
    val out = df.join(med, "user_id")
      .select(col("user_id"), col("med"), round(abs(col("value") - col("med")), 6).as("adev"))
      .groupBy("user_id").agg(first("med").as("med"),
        round(expr("percentile(adev, 0.5)"), 6).as("mad"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out(1L)._1 == 10.0 && out(1L)._2 == 0.0) // constant: med 10, MAD 0
    // one 1e6 outlier among 22 rows: median and MAD do not move
    assert(out(2L)._1 == 10.0 && out(2L)._2 == 0.0, s"MAD not robust: ${out(2L)}")
    // and the real operator runs end-to-end with one row per user
    val real = rel.RelQueries.mad(spark, sfDir)
    assert(real.count() == Tables.events(spark, sfDir).select("user_id").distinct().count())
  }

  test("hll_merge sketch flags hold and the merged row matches the exact corpus distinct") {
    val rows = rel.RelQueries.hllMerge(spark, sfDir).collect()
    // every flag (per-source AND merged) must assert the 5% bound held
    assert(rows.forall(_.getAs[Int]("within_5pct") == 1),
      "an HLL estimate breached the 5% bound")
    val all = rows.filter(_.getString(0) == "__all__")
    assert(all.length == 1)
    // merged n_docs = sum of per-source n_docs
    val perDocs = rows.filter(_.getString(0) != "__all__").map(_.getAs[Long]("n_docs")).sum
    assert(all.head.getAs[Long]("n_docs") == perDocs)
    // exact distincts: corpus-wide <= sum of per-source (dups can straddle sources)
    val perEx = rows.filter(_.getString(0) != "__all__").map(_.getAs[Long]("exact_distinct")).sum
    assert(all.head.getAs[Long]("exact_distinct") <= perEx)
  }

  test("rolling median stays inside its window and deviations reconcile") {
    val out = rel.RelQueries.rollingMedian(spark, sfDir).cache()
    try {
      val n = Tables.events(spark, sfDir).count()
      assert(out.count() == n, "one output row per event")
      // med + dev reconstructs value to 1e-6
      val joined = out.join(
        Tables.events(spark, sfDir).select(col("event_id"), col("value")), "event_id")
      assert(joined.filter(abs(col("med") + col("dev") - col("value")) > 1e-6).count() == 0)
      // median bounded by the per-user global min/max (a fortiori window bounds)
      val bounds = Tables.events(spark, sfDir).groupBy("user_id")
        .agg(min("value").as("lo"), max("value").as("hi"))
      assert(out.join(bounds, "user_id")
        .filter(col("med") < col("lo") - 1e-6 || col("med") > col("hi") + 1e-6)
        .count() == 0)
    } finally out.unpersist()
  }

  test("skyline equals the brute-force dominance frontier") {
    // output price is double (exact image of the DECIMAL(18,2) frontier);
    // re-cast to the decimal grid so the brute-force compare stays exact
    val out = rel.RelQueries.skyline(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("p_partkey"),
        org.apache.spark.sql.functions.col("p_size"),
        org.apache.spark.sql.functions.col("price")
          .cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("price"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDecimal(2)))
    // brute-force over the full (small at sf0.001) part table
    val all = Tables.part(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("p_partkey"),
        org.apache.spark.sql.functions.col("p_size"),
        org.apache.spark.sql.functions.col("p_retailprice")
          .cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("price"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDecimal(2)))
    val expected = all.filter { case (_, s, pr) =>
      !all.exists { case (_, s2, pr2) =>
        s2 >= s && pr2.compareTo(pr) <= 0 && (s2 > s || pr2.compareTo(pr) < 0)
      }
    }.map(_._1).toSet
    assert(out.map(_._1).toSet == expected, "frontier mismatch vs brute force")
    assert(out.nonEmpty)
    // frontier is a proper antichain: a smaller size survives only by
    // being strictly cheaper, so sorted by size asc prices strictly rise
    val sorted = out.sortBy(_._2)
    sorted.sliding(2).foreach {
      case Array((_, s1, p1), (_, s2, p2)) if s1 != s2 =>
        assert(p2.compareTo(p1) > 0,
          s"price must strictly rise with size: ${sorted.mkString(",")}")
      case _ => ()
    }
  }

  test("weighted median: brute-force parity and weight sensitivity") {
    val out = RelQueries.weightedMedian(spark, sfDir).collect()
      .map(r => (r.getAs[String]("flag"), r.getAs[Long]("w_total"),
        r.getAs[Double]("weighted_median"))).toSeq
    assert(out.nonEmpty)
    val rows = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"),
        col("l_quantity").cast("long").as("wt")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    out.foreach { case (flag, wTotal, med) =>
      val g = rows.filter(_._1 == flag)
      assert(g.map(_._3).sum == wTotal)
      // lower weighted median: smallest value whose cum weight reaches W/2
      val sorted = g.sortBy(_._2)
      var cum = 0L
      val brute = sorted.find { r => cum += r._3; 2 * cum >= wTotal }.get._2
      assert(math.abs(med - brute / 100.0) < 1e-9, s"$flag: $med vs ${brute / 100.0}")
      // the weighted median differs from the UNWEIGHTED one somewhere
    }
    val unweighted = rows.groupBy(_._1).map { case (f, g) =>
      val s = g.map(_._2).sorted; f -> s((s.length - 1) / 2) / 100.0 }
    assert(out.exists { case (f, _, m) => math.abs(m - unweighted(f)) > 1e-9 },
      "weights must actually move at least one median on this corpus")
  }

  test("woe/iv: count conservation, nonnegative IV, woe sign tracks the odds") {
    val out = RelQueries.woeIv(spark, sfDir).collect()
    assert(out.nonEmpty)
    val n = Tables.lineitem(spark, sfDir).count()
    assert(out.map(_.getAs[Long]("n")).sum == n)
    out.foreach { r =>
      assert(r.getAs[Long]("pos") + r.getAs[Long]("neg") == r.getAs[Long]("n"))
      // every term of IV is (a-b)·ln(a/b) with a,b the SAME adjusted
      // shares — nonnegative by construction, so the total is too
      assert(r.getAs[Double]("iv_term") >= -1e-12)
      assert(r.getAs[Double]("iv") >= 0.0)
    }
    // woe > 0 iff the bin's adjusted positive share beats its negative share
    val p = out.map(_.getAs[Long]("pos")).sum.toDouble
    val q = out.map(_.getAs[Long]("neg")).sum.toDouble
    out.foreach { r =>
      val ps = (r.getAs[Long]("pos") + 0.5) / p
      val ns = (r.getAs[Long]("neg") + 0.5) / q
      assert((r.getAs[Double]("woe") > 0) == (ps > ns),
        s"bin ${r.getAs[Int]("bin")}: woe sign vs share order")
    }
  }
}
