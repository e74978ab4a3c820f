package graft

import org.apache.spark.sql.functions._

import graft.rel.TimeSeries

class TimeSeriesSpec extends SparkSpec {

  test("gapFill emits a complete per-user day spine with zero-fill") {
    val out = TimeSeries.gapFill(spark, sfDir).cache()
    try {
      val e = Tables.events(spark, sfDir)
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      val nDays = e.agg(
        (datediff(max(col("day")), min(col("day"))) + 1).as("nd"))
        .head().getAs[Int]("nd")
      // every user carries exactly the full spine
      val perUser = out.groupBy("user_id").count().select("count").distinct().collect()
      assert(perUser.length == 1 && perUser.head.getLong(0) == nDays.toLong,
        s"expected uniform $nDays-day spines, got ${perUser.mkString(",")}")
      // zero-filled rows exist (the spine is denser than the raw events)
      assert(out.filter(col("n") === 0).count() > 0)
      // per-user event totals survive the densify
      val sums = out.groupBy("user_id").agg(sum("n").as("total"))
      val raw = e.groupBy("user_id").agg(count(lit(1)).as("raw"))
      assert(sums.join(raw, "user_id").filter(col("total") =!= col("raw")).count() == 0)
      // cum_n is the running prefix sum: last value per user == total
      val last = out.groupBy("user_id").agg(max(struct(col("day"), col("cum_n"))).as("m"))
        .select(col("user_id"), col("m.cum_n").as("last_cum"))
      assert(last.join(sums, "user_id").filter(col("last_cum") =!= col("total")).count() == 0)
    } finally out.unpersist()
  }

  test("funnel stages are monotone non-increasing and anchored at distinct users") {
    val rows = TimeSeries.funnel(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("0_all", "1_view", "2_click", "3_purchase"))
    val counts = rows.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"funnel not monotone: ${counts.mkString(",")}")
    val nUsers = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(counts.head == nUsers)
    assert(counts(1) > 0, "test data has view events; stage 1 must be non-empty")
  }

  test("cohort offset-0 cell equals the cohort size and offsets are non-negative") {
    val out = TimeSeries.cohort(spark, sfDir).cache()
    try {
      assert(out.filter(col("month_offset") < 0).count() == 0)
      // at offset 0 every cohort member is active by definition
      val first = Tables.orders(spark, sfDir)
        .select(col("o_custkey"),
          date_trunc("month", col("o_orderdate").cast("date")).as("m"))
        .groupBy("o_custkey").agg(min(col("m")).as("cohort_month"))
        .groupBy("cohort_month").agg(count(lit(1)).as("size"))
      val zero = out.filter(col("month_offset") === 0)
        .select(col("cohort_month"), col("n_customers"))
      assert(zero.join(first, "cohort_month")
        .filter(col("n_customers") =!= col("size")).count() == 0)
      // retention never exceeds the cohort size at any offset
      assert(out.join(first, "cohort_month")
        .filter(col("n_customers") > col("size")).count() == 0)
    } finally out.unpersist()
  }

  test("sessionize partitions every event into exactly one session and respects the gap") {
    val out = TimeSeries.sessionize(spark, sfDir).cache()
    try {
      // session event counts sum to the raw event count (a partition of events)
      val nEvents = Tables.events(spark, sfDir).count()
      assert(out.agg(sum("n_events")).head().getLong(0) == nEvents)
      // durations are non-negative and single-event sessions have zero duration
      assert(out.filter(col("duration_us") < 0).count() == 0)
      assert(out.filter(col("n_events") === 1 && col("duration_us") =!= 0).count() == 0)
      // consecutive sessions of one user are separated by MORE than the gap
      val gapUs = TimeSeries.sessionGapHours.toLong * 3600L * 1000000L
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("session_idx")
      val gaps = out
        .withColumn("prev_end", lag(unix_micros(col("session_end").cast("timestamp")), 1).over(w))
        .filter(col("prev_end").isNotNull)
        .filter(unix_micros(col("session_start").cast("timestamp")) - col("prev_end") <= gapUs)
      assert(gaps.count() == 0, "adjacent sessions must be > gap apart")
      // session ids are dense 1..k per user
      val dense = out.groupBy("user_id")
        .agg(min("session_idx").as("lo"), max("session_idx").as("hi"), count(lit(1)).as("k"))
        .filter(col("lo") =!= 1 || col("hi") =!= col("k"))
      assert(dense.count() == 0, "session_idx must be dense per user")
    } finally out.unpersist()
  }

  test("markov transition probabilities row-normalize to 1 and counts cover all gaps") {
    val out = TimeSeries.markovTransitions(spark, sfDir).cache()
    try {
      // each prev_type row sums to ~1.0 (6-dp rounding slack per cell)
      val rows = out.groupBy("prev_type").agg(sum("prob").as("p"), count(lit(1)).as("k")).collect()
      rows.foreach { r =>
        assert(math.abs(r.getDouble(1) - 1.0) <= r.getLong(2) * 1e-6,
          s"row ${r.getString(0)} sums to ${r.getDouble(1)}")
      }
      // total transitions = events - distinct users (one lag-null per user)
      val e = Tables.events(spark, sfDir)
      val expected = e.count() - e.select("user_id").distinct().count()
      assert(out.agg(sum("n")).head().getLong(0) == expected)
    } finally out.unpersist()
  }

  test("islands are maximal same-type runs above the cutoff") {
    val out = TimeSeries.islands(spark, sfDir).cache()
    try {
      assert(out.filter(col("run_len") < TimeSeries.islandMinRun).count() == 0)
      assert(out.filter(col("run_end") < col("run_start")).count() == 0)
      // recompute one user's runs imperatively and compare
      val someUser = out.select("user_id").head().getLong(0)
      val seq = Tables.events(spark, sfDir).filter(col("user_id") === someUser)
        .select("ts", "event_id", "event_type")
        .collect().sortBy(r => (
          r.getAs[java.time.LocalDateTime](0)
            .toInstant(java.time.ZoneOffset.UTC).toEpochMilli,
          r.getLong(1)))
        .map(_.getString(2))
      val runs = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
      seq.foreach { t =>
        if (runs.nonEmpty && runs.last._1 == t) runs(runs.length - 1) = (t, runs.last._2 + 1)
        else runs += ((t, 1))
      }
      val expected = runs.filter(_._2 >= TimeSeries.islandMinRun).toSeq
      val got = out.filter(col("user_id") === someUser)
        .orderBy("run_start").collect()
        .map(r => (r.getString(1), r.getLong(4).toInt)).toSeq
      assert(got == expected, s"user $someUser: got $got expected $expected")
    } finally out.unpersist()
  }

  test("timeToConvert counts converted users once and buckets are sane") {
    val out = TimeSeries.timeToConvert(spark, sfDir).cache()
    try {
      assert(out.filter(col("hours_bucket") < 0).count() == 0)
      // total converted users = users with a purchase after their first view
      val e = Tables.events(spark, sfDir)
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t_view"))
      val converted = e.filter(col("event_type") === "purchase")
        .join(v, "user_id").filter(col("ts") > col("t_view"))
        .select("user_id").distinct().count()
      assert(out.agg(sum("n_users")).head().getLong(0) == converted)
    } finally out.unpersist()
  }

  test("retention curve is monotone non-increasing from all users to a positive tail") {
    val rows = TimeSeries.retentionCurve(spark, sfDir).collect()
    val n = Tables.events(spark, sfDir).select("user_id").distinct().count()
    // the smallest observed span's suffix sum covers everyone (the
    // curve is sampled at observed spans; offset 0 appears only if some
    // user's span is 0)
    assert(rows.head.getLong(1) == n && rows.head.getDouble(2) == 1.0)
    val surv = rows.map(_.getLong(1))
    assert(surv.zip(surv.tail).forall { case (a, b) => a >= b }, "must be non-increasing")
    assert(rows.forall(r => r.getDouble(2) > 0 && r.getDouble(2) <= 1.0))
  }

  test("cusum telescopes to ~zero at each user's last event and flags are consistent") {
    val out = TimeSeries.cusum(spark, sfDir).cache()
    try {
      // sum of deviations over the FULL series is zero by construction:
      // the last cusum_n per user must be exactly 0.00
      val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
        .orderBy(col("event_id").desc)
      val last = out.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      assert(last.filter(col("cusum_n") =!= 0).count() == 0,
        "CUSUM must telescope to exactly zero at the series end")
      // flags exist both ways at this k (drift-heavy synthetic values)
      assert(out.filter(col("flag") === 0).count() > 0)
      // re-run determinism (window + decimal accumulation)
      val again = TimeSeries.cusum(spark, sfDir)
      assert(out.exceptAll(again).count() == 0)
    } finally out.unpersist()
  }

  test("attribution credit conserves: total credit = purchases with any touch") {
    val out = TimeSeries.attribution(spark, sfDir).collect()
    assert(out.map(_.getString(0)).toSet.subsetOf(Set("view", "click")))
    // every purchase with >= 1 touch distributes exactly 1 unit of credit
    val look = expr(s"interval ${TimeSeries.attributionWindowHours} hours")
    val e = Tables.events(spark, sfDir)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val t = e.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("ts").as("t_ts"))
    val touched = p.join(t, Seq("user_id"))
      .filter(col("t_ts") < col("p_ts") && col("t_ts") >= col("p_ts") - look)
      .select("p_id").distinct().count()
    val totalCredit = out.map(_.getAs[Double]("credit")).sum
    assert(math.abs(totalCredit - touched) < 0.01,
      s"credit $totalCredit must equal touched purchases $touched")
  }

  test("trend slope matches a local per-user regression") {
    val out = TimeSeries.trendPerUser(spark, sfDir).cache()
    try {
      assert(out.count() ==
        Tables.events(spark, sfDir).select("user_id").distinct().count())
      // recompute one user locally
      val uid = out.select("user_id").head().getLong(0)
      val rows = Tables.events(spark, sfDir).filter(col("user_id") === uid)
        .select(unix_micros(col("ts").cast("timestamp")).as("us"), col("value"))
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val t0 = rows.map(_._1).min
      val pts = rows.map { case (us, v) =>
        (math.rint((us - t0) / 3600e6 * 1e6) / 1e6, math.rint(v * 100) / 100) }
      val n = pts.length.toDouble
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val expect = (sxy - sx * sy / n) / (sxx - sx * sx / n)
      val got = out.filter(col("user_id") === uid).head().getAs[Double]("slope_per_hour")
      assert(math.abs(got - expect) < 1e-4, s"$got vs $expect")
    } finally out.unpersist()
  }

  test("funnel paths cover every user with a full prefix") {
    val out = TimeSeries.funnelPaths(spark, sfDir).cache()
    try {
      val complete = Tables.events(spark, sfDir)
        .groupBy("user_id").count()
        .filter(col("count") >= TimeSeries.pathLen).count()
      assert(out.agg(sum("n_users")).head().getLong(0) == complete)
      // paths have exactly pathLen steps
      assert(out.filter(
        size(split(col("path"), ">")) =!= TimeSeries.pathLen).count() == 0)
    } finally out.unpersist()
  }

  test("abTest arms cover all events and t statistic is finite") {
    val r = TimeSeries.abTest(spark, sfDir).head()
    val nEvents = Tables.events(spark, sfDir).count()
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == nEvents)
    assert(r.getAs[Long]("n_a") > 0 && r.getAs[Long]("n_b") > 0,
      "both arms must be populated by the hash split")
    assert(!r.getAs[Double]("t_stat").isNaN && !r.getAs[Double]("t_stat").isInfinite)
    // Welch df lies between min(n)-1 and n_a+n_b-2
    val df = r.getAs[Double]("welch_df")
    val lo = math.min(r.getAs[Long]("n_a"), r.getAs[Long]("n_b")).toDouble - 1
    assert(df >= lo - 1e-6 && df <= (nEvents - 2).toDouble + 1e-6, s"df=$df out of range")
  }

  test("fano dispersion: every user present, totals conserved, brute parity") {
    val rows = TimeSeries.fanoDispersion(spark, sfDir).collect()
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.get(1).toString))
    assert(rows.length == ev.map(_._1).distinct.length)
    assert(rows.map(_.getAs[Long]("n_events")).sum == ev.length.toLong)
    val nDays = rows.map(_.getAs[Long]("n_days")).distinct
    assert(nDays.length == 1, "shared global day spine")
    val allDays = ev.map(_._2).distinct.sorted
    // dense fixture: every spine day has at least one corpus event, so
    // the observed-day set IS the spine (guards the brute loop below)
    assert(allDays.length.toLong == nDays.head)
    rows.take(5).foreach { r =>
      val uid = r.getAs[Long]("user_id")
      val byDay = ev.filter(_._1 == uid).groupBy(_._2).map(_._2.size)
      val xs = allDays.map(d =>
        ev.count(e => e._1 == uid && e._2 == d).toDouble)
      val mean = xs.sum / xs.length
      val varP = xs.map(x => (x - mean) * (x - mean)).sum / xs.length
      assert(math.abs(r.getAs[Double]("fano") - varP / mean) < 1e-4,
        s"user $uid: ${r.getAs[Double]("fano")} vs ${varP / mean}")
      assert(byDay.sum.toLong == r.getAs[Long]("n_events"))
    }
  }

  test("srm check: chi2 recomputes from the emitted counts, flag consistent, arms partition users") {
    val r = TimeSeries.srmCheck(spark, sfDir).head()
    val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    val nUsers = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(na + nb == nUsers && na > 0 && nb > 0)
    val e = (na + nb).toDouble / 2.0
    val chi2 = math.pow(na - e, 2) / e + math.pow(nb - e, 2) / e
    assert(math.abs(r.getAs[Double]("chi2") - chi2) < 1e-6)
    assert(r.getAs[Boolean]("srm_detected") == (r.getAs[Double]("chi2") > TimeSeries.srmChi2Crit))
  }

  test("did: cells partition events and the estimate recomputes from cell means") {
    val r = TimeSeries.did(spark, sfDir).head()
    val total = Seq("n_a_pre", "n_a_post", "n_b_pre", "n_b_post")
      .map(r.getAs[Long]).sum
    assert(total == Tables.events(spark, sfDir).count())
    val did = (r.getAs[Double]("mean_b_post") - r.getAs[Double]("mean_b_pre")) -
      (r.getAs[Double]("mean_a_post") - r.getAs[Double]("mean_a_pre"))
    assert(math.abs(r.getAs[Double]("did") - did) < 1e-5)
  }

  test("theil: decomposition identity holds and matches the direct one-group Theil") {
    val rows = TimeSeries.theilIndex(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Double]("theil_total")).distinct
    assert(total.length == 1)
    assert(math.abs(rows.map(r =>
      r.getAs[Double]("t_between_term") +
        r.getAs[Double]("spend_share") * r.getAs[Double]("t_within")).sum
      - total.head) < 1e-4, "within+between must reassemble the total")
    // direct population Theil over collected spends
    val spends = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .collect().map(_.getAs[Long]("cents").toDouble)
    val mean = spends.sum / spends.length
    val direct = spends.map(x => (x / spends.sum) * math.log(x / mean)).sum
    assert(math.abs(total.head - direct) < 1e-4, s"${total.head} vs direct $direct")
    assert(rows.forall(_.getAs[Double]("t_within") >= 0.0),
      "within-group Theil is non-negative")
  }

  test("gini matches the brute-force mean-absolute-difference definition") {
    val out = TimeSeries.gini(spark, sfDir).head()
    val g = out.getAs[Double]("gini")
    assert(g >= 0.0 && g < 1.0)
    // Gini = Σᵢⱼ|xᵢ−xⱼ| / (2n²·x̄), computed directly on the collected spends
    val spends = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .collect().map(_.getAs[Long]("cents"))
    val n = spends.length.toDouble
    val mean = spends.map(_.toDouble).sum / n
    val mad = (for (a <- spends; b <- spends) yield math.abs(a - b).toDouble).sum
    val brute = mad / (2.0 * n * n * mean)
    // the rank-weighted identity is algebraically EQUAL to the
    // all-pairs form (Σᵢⱼ|xᵢ−xⱼ| = 4Σᵢi·x₍ᵢ₎ − 2(n+1)Σx) — assert both
    val exactIdentity = {
      val sorted = spends.sorted
      val iw = sorted.zipWithIndex.map { case (x, i) => (i + 1).toDouble * x }.sum
      (2.0 * iw - (n + 1) * sorted.map(_.toDouble).sum) / (n * sorted.map(_.toDouble).sum)
    }
    assert(math.abs(g - exactIdentity) < 1e-6, s"$g vs identity $exactIdentity")
    assert(math.abs(g - brute) < 1e-9, s"$g vs brute $brute")
  }

  test("survival KM: curve starts below 1, never increases, at-risk counts telescope") {
    val rows = TimeSeries.survivalKm(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val surv = rows.map(_.getAs[Double]("survival"))
    assert(surv.forall(s => s >= 0.0 && s <= 1.0))
    assert(surv.zip(surv.tail).forall { case (a, b) => b <= a + 1e-9 },
      "survival must be non-increasing")
    val nRisk = rows.map(_.getAs[Long]("n_risk"))
    assert(nRisk.zip(nRisk.tail).forall { case (a, b) => b < a },
      "at-risk set must strictly shrink across event times")
    // first at-risk set is the full user population
    val nUsers = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(nRisk.head <= nUsers &&
      nRisk.head >= nUsers - rows.map(_.getAs[Long]("d_converted")).sum,
      s"first at-risk ${nRisk.head} vs $nUsers users")
    assert(rows.head.getAs[Long]("n_risk") == nUsers,
      "t=min row must hold every user at risk")
  }

  test("acf: full lag grid, r_k in [-1,1], and lag-0 normalization is exact") {
    val rows = TimeSeries.acf(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("lag_h")).toSeq == (1 to TimeSeries.acfMaxLagHours),
      "every lag must be present exactly once, in order")
    val nh = rows.map(_.getAs[Long]("n_hours")).distinct
    assert(nh.length == 1 && nh.head > TimeSeries.acfMaxLagHours,
      "spine length constant and longer than the max lag")
    rows.foreach { r =>
      val v = r.getAs[Double]("r_k")
      assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9, s"lag ${r.getAs[Int]("lag_h")}: $v")
    }
  }

  test("seasonal anomalies: ranked head is non-empty, sorted by |z|, flag ≡ |z|>3") {
    val out = TimeSeries.anomalySeasonal(spark, sfDir).collect()
    assert(out.nonEmpty && out.length <= 100)
    val zs = out.map(r => math.abs(r.getAs[Double]("z")))
    assert(zs.zip(zs.tail).forall { case (a, b) => a >= b }, "not sorted by |z| desc")
    out.foreach(r => assert(
      r.getAs[Boolean]("is_anomaly") == (math.abs(r.getAs[Double]("z")) > 3.0)))
  }

  test("growth accounting: identities hold and new users total distinct users") {
    val out = TimeSeries.growthAccounting(spark, sfDir).collect()
      .sortBy(_.getAs[java.sql.Date]("wk").getTime)
    out.foreach { r =>
      assert(r.getAs[Long]("n_active") == r.getAs[Long]("n_new") +
        r.getAs[Long]("n_retained") + r.getAs[Long]("n_resurrected"))
      assert(r.getAs[Long]("n_churned_from_prev") >= 0L)
    }
    assert(out.map(_.getAs[Long]("n_new")).sum ==
      Tables.events(spark, sfDir).select("user_id").distinct().count())
    // first week: everyone is new, nobody churned from a prior week
    assert(out.head.getAs[Long]("n_new") == out.head.getAs[Long]("n_active"))
    assert(out.head.getAs[Long]("n_churned_from_prev") == 0L)
  }

  test("mde is positive and reconciles with its own relative form") {
    val r = TimeSeries.mde(spark, sfDir).head()
    val (abs0, rel0, m) = (r.getAs[Double]("mde_abs"), r.getAs[Double]("mde_rel"),
      r.getAs[Double]("mean_a"))
    assert(abs0 > 0.0 && rel0 > 0.0)
    assert(math.abs(rel0 - abs0 / m) < 1e-5)
  }

  test("path conversion: purchase-starting paths convert at exactly 1") {
    val out = TimeSeries.pathConversion(spark, sfDir).collect()
    out.foreach { r =>
      val rate = r.getAs[Double]("conversion_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      // a 'purchase' inside the 3-step prefix implies the user converted
      if (r.getString(0).split(">").contains("purchase"))
        assert(rate == 1.0, s"path ${r.getString(0)} rate $rate")
    }
    // path population matches funnel_paths' user totals
    val fp = TimeSeries.funnelPaths(spark, sfDir)
      .agg(sum("n_users")).head().getLong(0)
    assert(out.map(_.getAs[Long]("n_users")).sum == fp)
  }

  test("cuped preserves arm means in expectation and reduces variance") {
    val out = TimeSeries.cuped(spark, sfDir).collect()
    assert(out.length == 2)
    val vr = out.head.getAs[Double]("var_reduction")
    assert(vr >= 0.0 && vr <= 1.0, s"variance reduction $vr outside [0,1]")
    // theta identical on both rows (a global scalar)
    assert(out.map(_.getAs[Double]("theta")).distinct.length == 1)
    // the adjustment is mean-preserving ACROSS arms: the n-weighted mean
    // of adjusted Y equals that of raw Y (sum theta*(x - gmx) = 0)
    val wRaw = out.map(r => r.getAs[Long]("n") * r.getAs[Double]("mean_y")).sum
    val wAdj = out.map(r => r.getAs[Long]("n") * r.getAs[Double]("mean_y_adj")).sum
    assert(math.abs(wRaw - wAdj) / math.abs(wRaw) < 1e-4,
      s"adjustment must be mean-preserving: $wRaw vs $wAdj")
  }

  test("twap stays inside the user's value range and matches a local fold") {
    val out = TimeSeries.twap(spark, sfDir).cache()
    try {
      val uid = out.select("user_id").head().getLong(0)
      val rows = Tables.events(spark, sfDir).filter(col("user_id") === uid)
        .select(unix_micros(col("ts").cast("timestamp")), col("event_id"), col("value"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(r => (r._1, r._2))
      val cents = rows.map(r => math.rint(r._3 * 100).toLong)
      val dts = rows.sliding(2).map { case Array(a, b) => b._1 - a._1 }.toArray
      val expect = dts.zip(cents).map { case (dt, c) => c * dt }.sum.toDouble /
        (100.0 * dts.sum)
      val r = out.filter(col("user_id") === uid).head()
      assert(math.abs(r.getAs[Double]("twap") - expect) < 1e-5)
      assert(r.getAs[Long]("n_intervals") == rows.length - 1)
      val (lo, hi) = (rows.map(_._3).min, rows.map(_._3).max)
      assert(r.getAs[Double]("twap") >= lo - 1e-9 && r.getAs[Double]("twap") <= hi + 1e-9)
    } finally out.unpersist()
  }

  test("user entropy is bounded by ln(n_types) and covers every user") {
    val out = TimeSeries.userEntropy(spark, sfDir).collect()
    assert(out.length ==
      Tables.events(spark, sfDir).select("user_id").distinct().count())
    out.foreach { r =>
      val (h, k) = (r.getAs[Double]("entropy"), r.getAs[Long]("n_types"))
      assert(h >= -1e-9 && h <= math.log(k.toDouble) + 1e-6,
        s"entropy $h outside [0, ln($k)]")
    }
  }

  test("lateness audit is internally consistent and bites on this corpus") {
    val r = TimeSeries.latenessAudit(spark, sfDir).head()
    assert(r.getAs[Long]("n_events") == Tables.events(spark, sfDir).count())
    val (n, nl) = (r.getAs[Long]("n_events"), r.getAs[Long]("n_late"))
    assert(math.abs(r.getAs[Double]("frac_late") - nl.toDouble / n) < 1e-6)
    // event_id order is not ts order in this corpus, so lateness exists
    assert(nl > 0, "the audit must bite (events arrive out of ts order)")
    val (p50, p95, mx) = (r.getAs[Double]("p50_late_us"),
      r.getAs[Double]("p95_late_us"), r.getAs[Long]("max_late_us"))
    assert(p50 <= p95 + 1e-9 && p95 <= mx + 1e-9)
  }

  test("ema matches a local truncated-kernel recompute for one user") {
    val out = TimeSeries.emaSmoothing(spark, sfDir).cache()
    try {
      assert(out.count() == Tables.events(spark, sfDir).count())
      val uid = out.select("user_id").head().getLong(0)
      val rows = Tables.events(spark, sfDir).filter(col("user_id") === uid)
        .select(unix_micros(col("ts").cast("timestamp")), col("event_id"), col("value"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(r => (r._1, r._2))
      val a = TimeSeries.emaAlpha
      val expect = rows.indices.map { t =>
        val ks = (0 until TimeSeries.emaLags).filter(_ <= t)
        val num = ks.map(k => math.pow(a, k) * rows(t - k)._3).sum
        val den = ks.map(k => math.pow(a, k)).sum
        rows(t)._2 -> num / den
      }.toMap
      val got = out.filter(col("user_id") === uid)
        .select("event_id", "ema").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // first event's EMA is its own value
      assert(math.abs(got(rows.head._2) - rows.head._3) < 1e-6)
      expect.foreach { case (eid, e) =>
        assert(math.abs(got(eid) - e) < 1e-5, s"event $eid: ${got(eid)} vs $e") }
    } finally out.unpersist()
  }

  test("seasonal profile covers every event and deviations average out") {
    val out = TimeSeries.seasonalProfile(spark, sfDir).collect()
    assert(out.length <= 168)
    assert(out.map(_.getAs[Long]("n")).sum == Tables.events(spark, sfDir).count())
    out.foreach { r =>
      val (dow, hod) = (r.getAs[Int]("dow"), r.getAs[Int]("hod"))
      assert(dow >= 0 && dow <= 6 && hod >= 0 && hod <= 23)
    }
    // count-weighted mean deviation is ~0 by construction of the grid
    val wdev = out.map(r => r.getAs[Long]("n") * r.getAs[Double]("dev_from_global")).sum
    val n = out.map(_.getAs[Long]("n")).sum
    assert(math.abs(wdev / n) < 1e-5, s"weighted mean dev ${wdev / n}")
  }

  test("welch t-test: arms cover all users, df within Welch bounds") {
    val r = TimeSeries.welchTtest(spark, sfDir).head()
    val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    assert(na + nb ==
      Tables.events(spark, sfDir).select("user_id").distinct().count())
    val df = r.getAs[Double]("df_welch")
    // Welch df lies in [min(n)-1, n_a+n_b-2]
    assert(df >= math.min(na, nb) - 1 - 1e-6 && df <= na + nb - 2 + 1e-6,
      s"df $df outside [${math.min(na, nb) - 1}, ${na + nb - 2}]")
    assert(r.getAs[Boolean]("significant") ==
      (math.abs(r.getAs[Double]("t_stat")) > TimeSeries.welchCrit))
  }

  test("chi2 independence: nonnegative stat, V in [0,1], dof consistent") {
    val r = TimeSeries.chi2Independence(spark, sfDir).head()
    assert(r.getAs[Long]("n") == Tables.events(spark, sfDir).count())
    val (rr, cc) = (r.getAs[Int]("n_rows"), r.getAs[Int]("n_cols"))
    assert(r.getAs[Int]("dof") == (rr - 1) * (cc - 1))
    assert(r.getAs[Double]("chi2") >= 0.0)
    val v = r.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0, s"Cramer's V $v outside [0,1]")
  }

  test("ols regression passes through the centroid, r2 in [0,1]") {
    val out = TimeSeries.olsRegression(spark, sfDir).collect()
    assert(out.nonEmpty)
    val stats = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(avg(col("l_quantity")).as("mx"),
        avg(col("l_extendedprice")).as("my"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    out.foreach { r =>
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0, s"r2 $r2")
      val (mx, my) = stats(r.getAs[String]("flag"))
      val fit = r.getAs[Double]("intercept") + r.getAs[Double]("slope") * mx
      assert(math.abs(fit - my) < math.abs(my) * 1e-3 + 1e-2,
        s"centroid: fit $fit vs mean_y $my")
    }
  }

  test("ols multi: centroid identity, r2 in [0,1] and >= the univariate fit") {
    val out = TimeSeries.olsMulti(spark, sfDir).collect()
      .map(r => r.getAs[String]("flag") -> r).toMap
    assert(out.nonEmpty)
    val uni = TimeSeries.olsRegression(spark, sfDir).collect()
      .map(r => r.getAs[String]("flag") -> r.getAs[Double]("r2")).toMap
    val stats = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(avg(col("l_quantity")).as("mq"),
        avg(round(col("l_discount") * 100)).as("md"),
        avg(col("l_extendedprice")).as("my"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    out.foreach { case (flag, r) =>
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0, s"$flag r2 $r2")
      // adding a feature can never reduce the least-squares fit
      assert(r2 >= uni(flag) - 1e-6, s"$flag: multi $r2 < uni ${uni(flag)}")
      val (mq, md, my) = stats(flag)
      val fit = r.getAs[Double]("b0") + r.getAs[Double]("b1") * mq +
        r.getAs[Double]("b2") * md
      assert(math.abs(fit - my) < math.abs(my) * 1e-3 + 1e-2,
        s"$flag centroid: fit $fit vs mean_y $my")
    }
  }

  test("nn match: every treated user matched to the nearest control by pre-spend") {
    val out = TimeSeries.nnMatch(spark, sfDir).collect()
    assert(out.nonEmpty)
    import graft.text.Sampling
    val users = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(sum(when(col("ts").cast("timestamp") <
          lit(TimeSeries.cupedCutDate).cast("timestamp"),
          col("value").cast("decimal(18,2)")).otherwise(lit(0).cast("decimal(18,2)")))
        .as("pre"))
      .select(col("user_id"),
        Sampling.splitAssign(col("user_id"), Seq("T" -> 0.5, "C" -> 0.5)).as("arm"),
        col("pre").cast("double").as("pre"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val nTreated = users.count(_._2 == "T")
    assert(out.length == nTreated, s"${out.length} matched vs $nTreated treated")
    val controls = users.filter(_._2 == "C")
    val ctrlIds = controls.map(_._1).toSet
    out.take(50).foreach { r =>
      val cid = r.getAs[Long]("ctrl_id")
      assert(ctrlIds.contains(cid), s"matched id $cid is not a control")
      // the matched distance is the true minimum over all controls
      val bruteMin = controls.map(c => math.abs(c._3 - r.getAs[Double]("pre"))).min
      assert(math.abs(r.getAs[Double]("delta_pre") - bruteMin) < 1e-9,
        s"user ${r.getAs[Long]("user_id")}: delta ${r.getAs[Double]("delta_pre")} vs brute $bruteMin")
    }
  }

  test("propensity strata: quintiles partition users, pooled ATT is the treated-weighted mean") {
    val out = TimeSeries.propensityStrata(spark, sfDir).collect()
    assert(out.length == 5, s"${out.length} strata")
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(out.map(r => r.getAs[Long]("n_t") + r.getAs[Long]("n_c")).sum == users)
    val withC = out.filter(r => !r.isNullAt(r.fieldIndex("att_stratum")))
    assert(withC.nonEmpty, "at least one stratum must carry both arms")
    // pooled = Σ att_s·n_t / Σ n_t over strata that have controls
    val num = withC.map(r => r.getAs[Double]("att_stratum") * r.getAs[Long]("n_t")).sum
    val den = withC.map(_.getAs[Long]("n_t")).sum.toDouble
    assert(math.abs(out.head.getAs[Double]("att_pooled") - num / den) < 1e-6)
    // the pooled column is constant across rows
    assert(out.map(_.getAs[Double]("att_pooled")).distinct.length == 1)
  }

  test("ridge grid: shrinkage monotone in lambda, exactly one best") {
    val out = TimeSeries.ridgeGrid(spark, sfDir).collect()
    assert(out.length == TimeSeries.ridgeLambdas.length)
    assert(out.map(_.getAs[Int]("is_best")).sum == 1, "exactly one best")
    // |slope| shrinks monotonically as the penalty grows
    val byLam = out.sortBy(_.getAs[Double]("lambda"))
    val slopes = byLam.map(r => math.abs(r.getAs[Double]("slope")))
    slopes.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + 1e-9, s"shrinkage not monotone: $a -> $b")
    }
    byLam.foreach(r => assert(r.getAs[Double]("rmse_val") >= 0.0))
  }

  test("conformal interval: coverage at or above the nominal level on the calibration split") {
    val r = TimeSeries.conformalInterval(spark, sfDir).head()
    assert(r.getAs[Long]("n_val") > 0)
    assert(r.getAs[Double]("q90_resid") > 0.0)
    // the 90th-percentile width must cover >= ~90% of calibration
    // residuals by construction (exact percentile, interpolated)
    val cov = r.getAs[Double]("coverage")
    assert(cov >= 0.899 && cov <= 1.0, s"coverage $cov")
  }

  test("decision stump: exhaustive split search beats or ties the parent") {
    val r = TimeSeries.decisionStump(spark, sfDir).head()
    val n = Tables.lineitem(spark, sfDir).count()
    assert(r.getAs[Long]("n_left") + r.getAs[Long]("n_right") == n)
    assert(r.getAs[Long]("pos_left") <= r.getAs[Long]("n_left"))
    assert(r.getAs[Long]("pos_right") <= r.getAs[Long]("n_right"))
    // weighted child Gini never exceeds the parent's (concavity)
    assert(r.getAs[Double]("gain") >= -1e-9, s"gain ${r.getAs[Double]("gain")}")
    assert(r.getAs[Double]("impurity") >= 0.0 && r.getAs[Double]("impurity") <= 0.5)
  }
}
