package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Temporal-join semantics on the sf0.001 fixture. */
class RelationalSpec extends SparkSpec {

  test("asof join: matched view is the latest at-or-before the purchase") {
    val out = Relational.q28AsofJoin(spark, sfDir)
    assert(out.count() > 0)
    // every matched view is not in the future
    assert(out.where(col("asof_view_ts") > col("ts")).count() === 0)
    // a purchase with NO prior-or-equal view must be null-matched
    val ev = graft.sources.Tables.events(spark, sfDir)
    val firstView = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("first_view_ts"))
    val j = out.join(firstView, Seq("user_id"), "left")
    assert(j.where(col("asof_view_ts").isNull &&
      col("first_view_ts").isNotNull && col("first_view_ts") <= col("ts"))
      .count() === 0)
    assert(j.where(col("asof_view_ts").isNotNull &&
      (col("first_view_ts").isNull || col("first_view_ts") > col("ts")))
      .count() === 0)
  }

  test("asof join: no view after the match but at-or-before the purchase") {
    val out = Relational.q28AsofJoin(spark, sfDir)
      .where(col("asof_view_ts").isNotNull)
    val views = graft.sources.Tables.events(spark, sfDir)
      .where(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("vts"))
    // there is no view strictly between the matched one and the purchase
    val gap = out.join(views, Seq("user_id"))
      .where(col("vts") > col("asof_view_ts") && col("vts") <= col("ts"))
    assert(gap.count() === 0)
  }

  test("range join keeps zero-activity purchases with count 0 and null sum") {
    val out = Relational.q29RangeJoin(spark, sfDir)
    val purchases = graft.sources.Tables.events(spark, sfDir)
      .where(col("event_type") === "purchase")
    assert(out.count() === purchases.count())
    val zeros = out.where(col("n_prior_views") === 0)
    assert(zeros.where(col("prior_view_value").isNotNull).count() === 0)
  }

  // Sketch queries are not hash-comparable against DuckDB (the sketch
  // values are implementation-specific), so their semantics are pinned
  // here instead: the approximation must sit within its documented
  // error bound of the exact twin (q21/q32).

  test("q22 HLL approx distinct within rsd bound of q21 exact (sketch semantics)") {
    val exact = Relational.q21CountDistinct(spark, sfDir)
      .select(col("l_returnflag"), col("n_orders")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Relational.q22ApproxDistinct(spark, sfDir)
      .select(col("l_returnflag"), col("approx_orders")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (flag, a) =>
      val e = exact(flag).toDouble
      // rsd 0.01 requested; allow 5 sigma
      assert(math.abs(a - e) / e <= 0.05, s"$flag: approx $a vs exact $e")
    }
  }

  test("q35 approx quantiles within rank-error bound of q32-style exact (sketch semantics)") {
    val exact = Relational.q32Percentile(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    // exact twins on the SAME column q35 sketches
    val exactPrice = graft.sources.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5)").as("median"),
        expr("percentile(l_extendedprice, 0.99)").as("p99"),
        expr("min(l_extendedprice)").as("lo"),
        expr("max(l_extendedprice)").as("hi"))
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = Relational.q35ApproxQuantile(spark, sfDir).collect()
    assert(approx.nonEmpty && approx.length === exact.size)
    approx.foreach { r =>
      val flag = r.getString(0)
      val e = exactPrice(flag)
      val (lo, hi) = (e.getAs[Double]("lo"), e.getAs[Double]("hi"))
      val med = r.getAs[Double]("approx_median")
      val p99 = r.getAs[Double]("approx_p99")
      // any quantile estimate lies inside the data range...
      assert(med >= lo && med <= hi)
      assert(p99 >= lo && p99 <= hi && p99 >= med)
      // ...and within a loose relative band of the exact value
      // (accuracy=1000 → rank error ≤ 0.1%; values are well spread)
      assert(math.abs(med - e.getAs[Double]("median")) /
        e.getAs[Double]("median") <= 0.05, s"$flag median")
      assert(math.abs(p99 - e.getAs[Double]("p99")) /
        e.getAs[Double]("p99") <= 0.05, s"$flag p99")
    }
  }

  test("q38 funnel: stage matches an order-respecting driver recompute") {
    val out = Relational.q38Funnel(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val code = Map("view" -> 1L, "click" -> 2L, "purchase" -> 3L)
    val ev = graft.sources.Tables.events(spark, sfDir)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_type")).collect()
    val expected = ev.groupBy(_.getLong(0)).map { case (u, rows) =>
      val encs = rows.map { r =>
        val t = r.getTimestamp(1).toInstant
        (t.getEpochSecond * 1000000L + t.getNano / 1000L) * 8L +
          code(r.getString(2))
      }.sorted
      u -> encs.foldLeft(0L) { (acc, x) =>
        if (acc == 0L && x % 8 == 1) 1L
        else if (acc == 1L && x % 8 == 2) 2L
        else if (acc == 2L && x % 8 == 3) 3L
        else acc
      }
    }
    assert(out === expected)
    // the order constraint has teeth: some user must be mid-funnel
    // (stage > 0 but < 3) or the fixture would prove nothing
    assert(out.values.exists(s => s > 0L && s < 3L) ||
      out.values.forall(_ == 3L))
  }

  test("q39 retention: offset-0 cells cover every user exactly once") {
    val rows = Relational.q39Retention(spark, sfDir).collect()
    assert(rows.forall(_.getAs[Long]("day_offset") >= 0L))
    // each user contributes to its cohort's offset-0 cell (first-activity
    // day is itself an activity day), so the offset-0 column sums to the
    // distinct-user total
    val day0 = rows.filter(_.getAs[Long]("day_offset") == 0L)
      .map(_.getAs[Long]("n_users")).sum
    val totalUsers = graft.sources.Tables.events(spark, sfDir)
      .select(countDistinct(col("user_id"))).head().getLong(0)
    assert(day0 === totalUsers)
  }

  test("q40 grouping sets: exactly the two single-column sets, partitioned totals") {
    val li = graft.sources.Tables.lineitem(spark, sfDir)
    val out = Relational.q40GroupingSets(spark, sfDir).collect()
    // gid 1 = group by returnflag (linestatus grouped away), gid 2 = the reverse
    assert(out.map(_.getAs[Long]("gid")).toSet === Set(1L, 2L))
    val byFlag = out.filter(_.getAs[Long]("gid") == 1L)
    val byStatus = out.filter(_.getAs[Long]("gid") == 2L)
    assert(byFlag.forall(r => r.getAs[String]("l_linestatus") == null))
    assert(byStatus.forall(r => r.getAs[String]("l_returnflag") == null))
    assert(byFlag.length === li.select("l_returnflag").distinct().count())
    assert(byStatus.length === li.select("l_linestatus").distinct().count())
    // each set partitions the input, so each set's counts sum to the total
    val total = li.count()
    assert(byFlag.map(_.getAs[Long]("n")).sum === total)
    assert(byStatus.map(_.getAs[Long]("n")).sum === total)
  }

  test("q41 exists subquery: decorrelated to semi+anti joins, semantics hold") {
    val df = Relational.q41ExistsSubquery(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected a semi join in:\n$plan")
    assert(plan.contains("LeftAnti"), s"expected an anti join in:\n$plan")
    val got = df.select("p_partkey").collect().map(_.getLong(0)).toSet
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .where(col("l_quantity") >= 49)
    val haveHigh = li.select("l_partkey").distinct()
      .collect().map(_.getLong(0)).toSet
    val haveHighReturned = li.where(col("l_returnflag") === "R")
      .select("l_partkey").distinct().collect().map(_.getLong(0)).toSet
    assert(got === (haveHigh -- haveHighReturned))
  }

  test("q43 lateral top-n equals the window top-n computed directly") {
    val out = Relational.q43LateralTopN(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_name").asc)
    val expected = graft.sources.Tables.customer(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .join(graft.sources.Tables.nation(spark, sfDir),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_name"), col("c_acctbal")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(out === expected)
    assert(out.nonEmpty)
  }

  test("q42 rank family: quartiles balanced, ratios bounded, row count preserved") {
    val out = Relational.q42RankFamily(spark, sfDir)
    val orders = graft.sources.Tables.orders(spark, sfDir)
    assert(out.count() === orders.count())
    val rows = out.collect()
    assert(rows.forall(r => (1L to 4L).contains(r.getAs[Long]("quartile"))))
    assert(rows.forall { r =>
      val p = r.getAs[Double]("pct_rank"); p >= 0.0 && p <= 1.0
    })
    assert(rows.forall { r =>
      val c = r.getAs[Double]("cume"); c > 0.0 && c <= 1.0
    })
    // ntile balance: within each priority, bucket sizes differ by at most 1
    rows.groupBy(_.getAs[String]("o_orderpriority")).foreach { case (_, rs) =>
      val sizes = rs.groupBy(_.getAs[Long]("quartile")).values.map(_.length)
      assert(sizes.max - sizes.min <= 1)
      // the full order makes every row its own peer group: max cume is 1.0
      assert(rs.map(_.getAs[Double]("cume")).max === 1.0)
    }
  }

  /** Driver-side mirror of the md5-device 60-bit hash (rotLong r = 0):
    * first 15 hex chars of the digest as a long.
    */
  private def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(d.take(15), 16)
  }

  test("q49 weighted sample: exact driver recompute of the replicated-unit keys") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val expected = ev.map { case (t, id, v) =>
      val w = math.max(1L,
        math.min(Relational.WsCap, 1L + math.floor(v / 64.0).toLong))
      val key = (1L to w).map(r => h60(s"$id:$r")).min
      (t, id, w, key)
    }.groupBy(_._1).map { case (t, rows) =>
      t -> rows.sortBy(r => (r._4, r._2)).take(Relational.WsK)
        .zipWithIndex.map { case ((_, id, w, key), i) => (i + 1L, id, w, key) }
    }
    val out = Relational.q49WeightedSample(spark, sfDir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .groupBy(_._1).map { case (t, rs) => t -> rs.map(_._2).sortBy(_._1).toSeq }
    assert(out.keySet === expected.keySet)
    expected.foreach { case (t, rows) => assert(out(t) === rows.toSeq, s"type $t") }
    // weights actually spread (the quantizer isn't degenerate on the fixture)
    assert(expected.values.flatten.map(_._3).toSet.size > 1)
  }

  test("q50 sample quantiles: exact driver recompute; merge = union + re-take bottom k") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val expected = ev.groupBy(_._1).map { case (t, rows) =>
      val smp = rows.sortBy(r => (h60(r._2.toString), r._2))
        .take(Relational.SqK).map(_._3).sorted
      val m = smp.length
      def q(num: Int, den: Int) = smp((m - 1) * num / den)
      t -> ((m.toLong, smp.head, q(1, 4), q(1, 2), q(3, 4), smp.last))
    }
    val out = Relational.q50SampleQuantiles(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    assert(out === expected)
    // mergeability: bottom-k of a union == bottom-k of (bottom-k ∪ bottom-k)
    val (left, right) = ev.partition(_._2 % 2 == 0)
    def bottomK(rows: Array[(String, Long, Double)]) =
      rows.sortBy(r => (h60(r._2.toString), r._2)).take(Relational.SqK)
    val merged = bottomK((bottomK(left) ++ bottomK(right)).toArray)
    assert(merged.toSeq === bottomK(ev).toSeq)
  }

  test("evt_rolling_distinct: window counts match a driver recompute; HLL twin agrees at sketch precision") {
    val obs = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val byType = obs.groupBy(_._1)
    val expected = byType.toSeq.flatMap { case (t, rows) =>
      val days = rows.map(_._2).distinct
      days.map { d =>
        val users = rows.filter { case (_, od, _) =>
          !od.isAfter(d) && !od.isBefore(d.minusDays(Relational.RollingDays - 1L))
        }.map(_._3).distinct
        (t, d.toString) -> users.size.toLong
      }
    }.toMap
    val out = Relational.evtRollingDistinct(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> r.getLong(2)).toMap
    assert(out === expected)
    // windows are supersets of single days: every window count >= that
    // day's distinct count, and <= the type's total distinct users
    val dayCounts = obs.groupBy(r => (r._1, r._2.toString))
      .map { case (k, v) => k -> v.map(_._3).distinct.size.toLong }
    out.foreach { case (k, n) => assert(n >= dayCounts(k)) }
    // the HLL twin: the query emits transcendental-free ingredients
    // (raw estimate + zero-register count — the hash-checkable form);
    // the CONSUMER applies the standard small-range linear-counting
    // correction m·ln(m/V), which is what's accuracy-bound at these
    // tiny per-window cardinalities
    val m = (1 << Relational.HllP).toDouble
    val est = Relational.evtRollingDistinctHll(spark, sfDir).collect()
      .map { r =>
        val raw = r.getAs[Double]("hll_est")
        val v = r.getAs[Long]("hll_zero").toDouble
        val corrected =
          if (raw <= 2.5 * m && v > 0) m * math.log(m / v) else raw
        (r.getString(0), r.getDate(1).toString) -> corrected
      }.toMap
    assert(est.keySet === out.keySet)
    est.foreach { case (k, e) =>
      val exact = out(k).toDouble
      assert(math.abs(e - exact) / exact < 0.15, s"$k: est $e vs exact $exact")
    }
  }

  test("q52 pagination: page 2 window, WindowGroupLimit bound, driver recompute") {
    val cust = graft.sources.Tables.customer(spark, sfDir)
      .select(col("c_nationkey").cast("long"), col("c_custkey").cast("long"),
        col("c_acctbal")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = cust.groupBy(_._1).toSeq.flatMap { case (nk, rows) =>
      rows.sortBy(r => (-r._3, r._2))
        .slice(Relational.PageFrom, Relational.PageFrom + Relational.PageSize)
        .zipWithIndex.map { case ((_, ck, _), i) =>
          (nk, ck) -> (Relational.PageFrom + i + 1L) }
    }.toMap
    val df = Relational.q52Pagination(spark, sfDir)
    val out = df.select(col("c_nationkey").cast("long"),
        col("c_custkey").cast("long"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === expected)
    // nations with ≤ PageFrom customers have no page 2 — absent, not padded
    val small = cust.groupBy(_._1).filter(_._2.length <= Relational.PageFrom).keys
    small.foreach(nk => assert(!out.keys.exists(_._1 == nk)))
    // the rank ≤ from+size bound still gets the partial WindowGroupLimit
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.split("\n").exists(l =>
      l.contains("WindowGroupLimit") && l.contains("Partial")), p.take(800))
  }

  test("evt_anomaly: integer-space flag matches a driver recompute of the z² rule") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_type"), to_date(col("ts")).as("day")).collect()
      .map(r => (r.getString(0), r.getDate(1).toString))
    val daily = ev.groupBy(identity).map { case ((t, d), v) => (t, d, v.size.toLong) }
    val expected = daily.groupBy(_._1).flatMap { case (_, cells) =>
      val d = cells.size.toLong
      val s = cells.map(_._3).sum
      val ss = cells.map(c => c._3 * c._3).sum
      cells.map { case (t, day, n) =>
        (t, day) -> ((n, s.toDouble / d,
          (d * n - s) * (d * n - s) > 4L * (d * ss - s * s)))
      }
    }.toMap
    val out = Relational.evtAnomaly(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    assert(out === expected)
    // both branches of the flag are exercised on the fixture
    assert(out.values.exists(_._3) || out.values.forall(!_._3))
  }

  test("evt_paths: top paths match a driver recompute of the capped session strings") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type")).collect()
      .map { r =>
        val t = r.getTimestamp(1)
        // full microsecond precision: getTime alone truncates to millis
        val micros = math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
        (r.getLong(0), micros, r.getLong(2), r.getString(3))
      }
    val cap = Relational.PathMaxLen
    val paths = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      // 30-minute gap rule
      val sessions = ordered.foldLeft(Vector.empty[Vector[(Long, String)]]) {
        case (acc, (_, ts, _, t)) =>
          if (acc.nonEmpty && ts - acc.last.last._1 <= 30L * 60 * 1000000L)
            acc.init :+ (acc.last :+ (ts, t))
          else acc :+ Vector((ts, t))
      }
      sessions.map { s =>
        val p = s.take(cap).map(_._2).mkString(">") +
          (if (s.size > cap) ">…" else "")
        (p, s.size.toLong)
      }
    }
    val expected = paths.groupBy(_._1)
      .map { case (p, v) => (p, v.size.toLong, v.map(_._2).sum) }.toSeq
      .sortBy(r => (-r._2, r._1)).take(Relational.PathTopK)
    val out = Relational.evtPaths(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out === expected)
  }

  test("evt_date_histogram: dense calendar frame, zero fill, conserved totals") {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val out = Relational.evtDateHistogram(spark, sfDir).collect()
    val types = ev.select(col("event_type")).distinct().count()
    val days = ev.select(to_date(col("ts"))).distinct().count()
    val span = ev.agg(datediff(max(to_date(col("ts"))), min(to_date(col("ts")))))
      .head().getInt(0) + 1L
    // every (type, day-in-span) cell exists — including days with no
    // events of that type (zero-filled), span ≥ observed distinct days
    assert(out.length.toLong === types * span && span >= days)
    assert(out.map(_.getAs[Long]("n")).sum === ev.count())
    // a zero cell exists or every cell is populated; if zero, its sum is 0.0
    out.filter(_.getAs[Long]("n") == 0L)
      .foreach(r => assert(r.getAs[Double]("value_sum") === 0.0))
  }

  test("q51 percentile ranks: monotone in the threshold, exact driver recompute") {
    val orders = graft.sources.Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"), col("o_totalprice")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val expected = orders.groupBy(_._1).map { case (p, rows) =>
      val n = rows.length
      val prs = Relational.PrThresholds.map(t =>
        rows.count(_._2 <= t).toDouble / n)
      p -> ((n.toLong, prs))
    }
    val out = Relational.q51PercentileRanks(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), Relational.PrThresholds.map(t => r.getAs[Double](s"pr_${t / 1000}k")))))
      .toMap
    assert(out === expected)
    out.values.foreach { case (_, prs) =>
      assert(prs === prs.sorted, "ranks must be monotone in the threshold")
    }
  }

  test("evt_transitions: kernel rows normalize; counts match a driver recompute") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val seq0 = rows.sortBy(r => (r._2, r._3)).map(_._4)
      seq0.zip(seq0.tail)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val out = Relational.evtTransitions(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out.map { case (k, v) => k -> v._1 } === expected)
    // each prev row of the kernel sums to probability 1 (one IEEE sum of
    // exact ratios per row — tolerance only for the final fold)
    out.groupBy(_._1._1).values.foreach { rs =>
      assert(math.abs(rs.map(_._2._2).sum - 1.0) < 1e-9)
    }
  }

  private def pctl(xs: Seq[Double], p: Double): Double = {
    // Spark `percentile` exact interpolation: index p·(n−1), linear
    val s = xs.sorted
    val pos = p * (s.length - 1)
    val lo = pos.toInt
    val frac = pos - lo
    if (lo + 1 < s.length) s(lo) + frac * (s(lo + 1) - s(lo)) else s(lo)
  }

  test("q55 MAD: median and deviation median match a driver recompute") {
    val rows = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_quantity")).collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    val got = Relational.q55Mad(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .toMap
    assert(got.keySet === rows.map(_._1).toSet)
    rows.groupBy(_._1).foreach { case (g, xs) =>
      val q = xs.map(_._2).toSeq
      val med = pctl(q, 0.5)
      val mad = pctl(q.map(x => math.abs(x - med)), 0.5)
      assert(got(g)._3 === q.length.toLong, s"n for $g")
      assert(math.abs(got(g)._1 - med) < 1e-9, s"median for $g")
      assert(math.abs(got(g)._2 - mad) < 1e-9, s"mad for $g")
    }
  }

  test("q56 extended stats: exact integer moments match a driver recompute") {
    val rows = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_quantity")).collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    val got = Relational.q56ExtendedStats(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    rows.groupBy(_._1).foreach { case (g, xs) =>
      val q = xs.map(_._2.toLong)
      val n = q.length.toLong
      val s = q.sum
      val ss = q.map(x => x * x).sum
      val varp = (n * ss - s * s).toDouble / (n.toDouble * n.toDouble)
      val r = got(g)
      assert(r.getAs[Long]("n") === n)
      assert(r.getAs[Double]("min_q") === q.min.toDouble)
      assert(r.getAs[Double]("max_q") === q.max.toDouble)
      assert(r.getAs[Double]("sum_q") === s.toDouble)
      assert(r.getAs[Double]("sum_sq") === ss.toDouble)
      assert(r.getAs[Double]("variance_pop") === varp, s"variance for $g")
      assert(r.getAs[Double]("std_pop") === math.sqrt(varp))
    }
  }

  test("pipeline aggs: delta/moving-average/cumsum recompute from the daily counters") {
    val daily = graft.sources.Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val got = Relational.evtPipelineAggs(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        ((Option(r.get(3)).map(_.asInstanceOf[Long]), r.getDouble(4), r.getLong(5))))
      .toMap
    daily.groupBy(_._1).foreach { case (t, rows) =>
      val ordered = rows.sortBy(_._2)
      ordered.zipWithIndex.foreach { case ((_, day, n), i) =>
        val (delta, ma7, cum) = got((t, day))
        assert(delta === (if (i == 0) None else Some(n - ordered(i - 1)._3)),
          s"delta $t $day")
        val win = ordered.slice(math.max(0, i - 6), i + 1).map(_._3)
        assert(ma7 === win.sum.toDouble / win.length.toDouble, s"ma7 $t $day")
        assert(cum === ordered.take(i + 1).map(_._3).sum, s"cum $t $day")
      }
    }
  }

  test("q57 KMV set algebra: exhaustive sketches make the estimate exact; gauges recompute") {
    val rows = Relational.q57KmvJaccard(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // exact gauge recompute from the raw table
    val du = graft.sources.Tables.events(spark, sfDir)
      .where(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id")).distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val sets = du.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      val inter = (sets(a) & sets(b)).size.toLong
      val union = (sets(a) | sets(b)).size.toLong
      assert(r.getAs[Long]("n_inter_exact") === inter, s"inter $a/$b")
      assert(r.getAs[Long]("n_union_exact") === union, s"union $a/$b")
      assert(r.getAs[Double]("jaccard_exact") === inter.toDouble / union.toDouble)
      // sf0.001 unions (~30 users) are far below K=256: the union
      // sketch is EXHAUSTIVE, so the estimator must be exactly the
      // true Jaccard — the small-set-exactness property of KMV
      assert(r.getAs[Long]("k_used") === union)
      assert(r.getAs[Long]("k_used") < Relational.KmvK)
      assert(r.getAs[Double]("jaccard_est") === r.getAs[Double]("jaccard_exact"),
        s"exhaustive sketch must be exact for $a/$b")
    }
  }

  test("q54 composite agg: page strictly after the cursor, key-ordered, counts exact") {
    val rows = Relational.q54CompositeAgg(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows.nonEmpty && rows.length <= Relational.CompositePageSize)
    // every group is strictly AFTER the after-key (the composite
    // cursor's exclusive semantics)...
    assert(rows.forall { case (n, s, _) =>
      n > Relational.CompositeAfterNation ||
        (n == Relational.CompositeAfterNation &&
          s > Relational.CompositeAfterSegment) })
    // ...in key-tuple order
    assert(rows === rows.sortBy(t => (t._1, t._2)))
    // group counts match a driver recompute over the raw table, and the
    // page holds the FIRST qualifying groups (nothing skipped)
    val cust = graft.sources.Tables.customer(spark, sfDir)
      .select(col("c_nationkey"), col("c_mktsegment")).collect()
      .map(r => (r.getInt(0), r.getString(1)))
    val counts = cust.groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.foreach { case (n, s, c) => assert(c === counts((n, s)), s"group ($n,$s)") }
    val expectedKeys = counts.keys.toSeq
      .filter { case (n, s) =>
        n > Relational.CompositeAfterNation ||
          (n == Relational.CompositeAfterNation &&
            s > Relational.CompositeAfterSegment) }
      .sorted.take(Relational.CompositePageSize)
    assert(rows.map(t => (t._1, t._2)) === expectedKeys)
  }

  test("q59 matrix stats: diagonal corr exactly 1, off-diagonals match a driver Pearson") {
    val out = Relational.q59MatrixStats(spark, sfDir).collect()
      .map(r => (r.getAs[String]("field_x"), r.getAs[String]("field_y")) -> r).toMap
    assert(out.size === 6)
    // corr(x,x) = num/sqrt(num·num) must be EXACTLY 1.0 (positive variance)
    for (f <- Seq("quantity", "extendedprice", "discount"))
      assert(out((f, f)).getAs[Double]("corr") === 1.0, s"diag $f")
    // off-diagonal vs a driver float recompute (approx — the operator is
    // exact-integer, the reference here is a plain double loop)
    val vals = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    def pearson(xs: Seq[Double], ys: Seq[Double]): Double = {
      val n = xs.size.toDouble
      val (mx, my) = (xs.sum / n, ys.sum / n)
      val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum / n
      val vx = xs.map(x => (x - mx) * (x - mx)).sum / n
      val vy = ys.map(y => (y - my) * (y - my)).sum / n
      cov / math.sqrt(vx * vy)
    }
    val want = pearson(vals.map(_._1).toSeq, vals.map(_._2).toSeq)
    val got = out(("quantity", "extendedprice")).getAs[Double]("corr")
    assert(math.abs(got - want) < 1e-9, s"corr q/p: $got vs $want")
    // cov descaling: cov_pop(quantity, discount) vs driver recompute
    val covWant = {
      val xs = vals.map(_._1); val ys = vals.map(_._3)
      val n = xs.length.toDouble
      val (mx, my) = (xs.sum / n, ys.sum / n)
      xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum / n
    }
    val covGot = out(("quantity", "discount")).getAs[Double]("cov_pop")
    assert(math.abs(covGot - covWant) < 1e-9, s"cov q/d: $covGot vs $covWant")
  }

  test("q61 t-test: Welch statistic and df match a driver recompute") {
    val out = Relational.q61TTest(spark, sfDir).collect()
      .map(r => r.getAs[String]("l_linestatus") -> r).toMap
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_linestatus"), col("l_returnflag"), col("l_extendedprice"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    for ((ls, row) <- out) {
      val r = li.collect { case (`ls`, "R", x) => x }
      val a = li.collect { case (`ls`, "A", x) => x }
      def mean(v: Seq[Double]) = v.sum / v.size
      def svar(v: Seq[Double]) = {
        val m = mean(v); v.map(x => (x - m) * (x - m)).sum / (v.size - 1)
      }
      val se2 = svar(r) / r.size + svar(a) / a.size
      val tWant = (mean(r) - mean(a)) / math.sqrt(se2)
      val dfWant = se2 * se2 /
        (math.pow(svar(r) / r.size, 2) / (r.size - 1) +
          math.pow(svar(a) / a.size, 2) / (a.size - 1))
      assert(row.getAs[Long]("n_r") === r.size.toLong)
      assert(row.getAs[Long]("n_a") === a.size.toLong)
      assert(math.abs(row.getAs[Double]("t_stat") - tWant) < 1e-6, s"t at $ls")
      assert(math.abs(row.getAs[Double]("welch_df") - dfWant) < 1e-4, s"df at $ls")
    }
  }

  test("evt_change_point: a planted step lands the split on the step boundary") {
    val s = spark; import s.implicits._
    // type "step": 3 days at 2 events/day then 3 days at 10/day — the
    // max normalized mean-shift split is exactly the step boundary
    // (day 3), mean_before 2, mean_after 10.
    val rows = for {
      (day, perDay) <- Seq(1 -> 2, 2 -> 2, 3 -> 2, 4 -> 10, 5 -> 10, 6 -> 10)
      i <- 0 until perDay
    } yield (day.toLong * 100 + i, java.sql.Timestamp.valueOf(f"2024-01-0$day 0$i:00:00"),
      1L, "step", 1.0, "{}")
    val dir = tempTableDir("events",
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val out = Relational.evtChangePoint(spark, dir).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[java.sql.Date]("change_day").toString === "2024-01-03")
    assert(r.getAs[Double]("mean_before") === 2.0)
    assert(r.getAs[Double]("mean_after") === 10.0)
    assert(r.getAs[Double]("shift") === 8.0)
  }

  test("evt_change_point: argmax matches a driver brute-force over real daily series") {
    val daily = graft.sources.Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val out = Relational.evtChangePoint(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[java.sql.Date]("change_day").toString).toMap
    for ((tpe, rows) <- daily.groupBy(_._1)) {
      val series = rows.sortBy(_._2).map(r => (r._2, r._3))
      val total = series.map(_._2).sum
      val best = (1 until series.length).map { d =>
        val s = series.take(d).map(_._2).sum
        val stat = math.abs((series.length - d).toDouble * s - d.toDouble * (total - s)) /
          (d.toDouble * (series.length - d).toDouble)
        (stat, series(d - 1)._1)
      }.sortBy { case (stat, day) => (-stat, day) }.head._2
      assert(out(tpe) === best, s"argmax split for $tpe")
    }
  }

  test("q63 adjacency matrix: filter and pair counts match a driver recompute") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"), hour(col("ts")).as("h"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getInt(2)))
    def ui(t: (String, Double, Int)) = t._1 == "click" || t._1 == "view"
    def hv(t: (String, Double, Int)) = t._2 > Relational.AdjHighValue
    def mo(t: (String, Double, Int)) = t._3 < 12
    val out = Relational.q63AdjacencyMatrix(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("ui") === ev.count(ui).toLong)
    assert(out("high_value") === ev.count(hv).toLong)
    assert(out("morning") === ev.count(mo).toLong)
    assert(out("high_value&ui") === ev.count(t => ui(t) && hv(t)).toLong)
    assert(out("morning&ui") === ev.count(t => ui(t) && mo(t)).toLong)
    assert(out("high_value&morning") === ev.count(t => hv(t) && mo(t)).toLong)
    // structural: every intersection is bounded by both of its filters
    assert(out("high_value&ui") <= math.min(out("high_value"), out("ui")))
  }

  test("evt_downsample: bucket identity, boundary assignment, and summary stats") {
    val s = spark; import s.implicits._
    // Two events inside one 6h bucket, one exactly ON the next boundary
    // (06:00:00 → second bucket — floor semantics).
    val rows = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 1L, "t", 10.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 05:59:59"), 1L, "t", 20.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 06:00:00"), 1L, "t", 7.5, "{}"))
    val dir = tempTableDir("events",
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val out = Relational.evtDownsample(spark, dir).collect()
      .map(r => r.getAs[Long]("bucket_epoch") -> r).toMap
    assert(out.size === 2)
    assert(out.keySet.forall(_ % Relational.DownsampleSeconds === 0))
    val b0 = out(1704067200L) // 2024-01-01 00:00 UTC
    assert(b0.getAs[Long]("n") === 2L)
    assert(b0.getAs[Double]("v_min") === 10.0)
    assert(b0.getAs[Double]("v_max") === 20.0)
    assert(b0.getAs[Double]("v_sum") === 30.0)
    assert(b0.getAs[Double]("v_avg") === 15.0)
    val b1 = out(1704067200L + Relational.DownsampleSeconds)
    assert(b1.getAs[Long]("n") === 1L)
    assert(b1.getAs[Double]("v_sum") === 7.5)
  }

  test("q60 string stats: grid entropy is 0 for a one-char alphabet, 1 for a balanced pair") {
    val s = spark; import s.implicits._
    // "aaaa": one char, entropy 0. "abababab": two chars at 4+4 of N=8 —
    // grid entropy = flog2(8) − flog2(4) = 1 exactly.
    val df = Seq(
      (1L, "aaaa", "mono", "spec", 4L),
      (2L, "abababab", "duo", "spec", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tempTableDir("documents", df)
    val out = Relational.q60StringStats(spark, dir).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    assert(out("mono").getAs[Double]("entropy_bits") === 0.0)
    assert(out("mono").getAs[Long]("n_distinct_chars") === 1L)
    assert(out("duo").getAs[Double]("entropy_bits") === 1.0)
    assert(out("duo").getAs[Long]("n_chars") === 8L)
    assert(out("duo").getAs[Long]("min_len") === 8L)
    assert(out("duo").getAs[Double]("avg_len") === 8.0)
  }

  test("q64 auto_date_histogram: interval election picks the smallest rung within target") {
    val s = spark; import s.implicits._
    // 101-second span: 1s rung → 101 buckets > 40; 5s rung → 21 ≤ 40.
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = (0 to 100).map(i =>
      (i.toLong, new java.sql.Timestamp(base + i * 1000L), 1L, "t", 1.0, "{}"))
    val dir = tempTableDir("events",
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val out = Relational.q64AutoDateHistogram(spark, dir).collect()
    assert(out.forall(_.getAs[Long]("interval_sec") === 5L))
    assert(out.length === 21)
    assert(out.map(_.getAs[Long]("n")).sum === 101L)
    assert(out.forall(r => r.getAs[Long]("bucket_start") % 5L === 0L))
    // every bucket holds exactly the events whose epoch floors into it
    val full = out.filter(_.getAs[Long]("n") === 5L)
    assert(full.length === 20) // last bucket has the lone 101st event
  }

  test("q65 diversified_sampler: per-value cap limits a dominant key") {
    val s = spark; import s.implicits._
    // One shard (ids ≡ 0 mod 8). User 1 owns 5 events, user 2 owns 1:
    // max_docs_per_value=2 keeps 2-of-5 + 1 → sample of 3.
    val rows = (0 until 5).map(i =>
      (i * 8L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 1L, "t", 1.0, "{}")) :+
      (40L, java.sql.Timestamp.valueOf("2024-01-01 02:00:00"), 2L, "t", 1.0, "{}")
    val dir = tempTableDir("events",
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val out = Relational.q65DiversifiedSampler(spark, dir).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("doc_count") === 3L)
    assert(out.head.getAs[Long]("n_users") === 2L)
  }

  test("evt_interpolate: interior gaps lerp exactly, edges degrade to LOCF/backfill") {
    val s = spark; import s.implicits._
    // Observations at hour 0 (10.00) and hour 3 (40.00); hours 1-2 are
    // gaps. Exact lerp: h1 → 20.0, h2 → 30.0; LOCF carries 10.0.
    val rows = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:30:00"), 1L, "t", 10.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 03:15:00"), 1L, "t", 40.0, "{}"))
    val dir = tempTableDir("events",
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val out = Relational.evtInterpolate(spark, dir).collect()
      .map(r => r.getAs[Long]("bucket_epoch") -> r).toMap
    assert(out.size === 4)
    val h0 = 1704067200L
    assert(out(h0).getAs[Double]("v_interp") === 10.0)
    assert(out(h0 + 3600).getAs[Double]("v_interp") === 20.0)
    assert(out(h0 + 7200).getAs[Double]("v_interp") === 30.0)
    assert(out(h0 + 10800).getAs[Double]("v_interp") === 40.0)
    assert(out(h0 + 3600).getAs[Double]("v_locf") === 10.0)
    assert(out(h0 + 7200).getAs[Double]("v_locf") === 10.0)
    assert(out(h0 + 3600).getAs[Long]("n") === 0L)
    // leading-gap backfill: drop the first observation's hour by
    // shifting the span — simulate with an observation only at h3
    val rows2 = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:30:00"), 1L, "a", 10.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 03:15:00"), 1L, "b", 40.0, "{}"))
    val dir2 = tempTableDir("events",
      rows2.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val out2 = Relational.evtInterpolate(spark, dir2).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("bucket_epoch")) -> r).toMap
    // type b has no observation before h3: leading cells backfill 40.0
    assert(out2(("b", h0)).getAs[Double]("v_locf") === 40.0)
    assert(out2(("b", h0)).getAs[Double]("v_interp") === 40.0)
    // type a has nothing after h0: trailing cells carry 10.0 forward
    assert(out2(("a", h0 + 10800)).getAs[Double]("v_interp") === 10.0)
  }

  test("evt_bucket_pipeline: script/selector/sort replay over daily buckets") {
    val R = operators.Relational
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(to_date(col("ts")).as("day"), col("event_type")).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getString(1)))
    val daily = ev.groupBy(_._1).map { case (d, es) =>
      (d, es.length.toLong, es.count(_._2 == "purchase").toLong)
    }.toSeq
    val want = daily.filter(_._2 >= R.BsMinDocs)
      .map { case (d, n, p) => (d, n, p, (p * 1099511627776L) / n) }
      .sortBy { case (d, _, _, g) => (-g, d.toEpochDay) }
      .take(R.BsTopN)
    val got = R.evtBucketPipeline(spark, sfDir).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === want)
    got.zip(R.evtBucketPipeline(spark, sfDir).collect()).foreach { case ((_, _, _, g), r) =>
      assert(r.getDouble(4) === g.toDouble / 1099511627776.0)
    }
    // the selector would drop something on a thinned fixture
    val thin = daily.count(_._2 < R.BsMinDocs)
    assert(got.size <= R.BsTopN)
    assert(thin >= 0) // informational; floor exercised by construction when thin > 0
  }

  test("evt_moving_median: trailing-window lower median replays from daily sums") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(to_date(col("ts")).as("day"), col("value")).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getDouble(1)))
    val daily = ev.groupBy(_._1).map { case (d, vs) =>
      d -> vs.map(v => BigDecimal(v._2).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
    }
    val rows = operators.Relational.evtMovingMedian(spark, sfDir).collect()
      .map(r => r.getDate(0).toLocalDate -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(rows.keySet === daily.keySet)
    daily.keys.foreach { d =>
      val win = daily.filter { case (d2, _) =>
        !d2.isAfter(d) && !d2.isBefore(d.minusDays(operators.Relational.MmWindow - 1))
      }.values.toSeq.sorted
      assert(rows(d)._1 === win.length.toLong, s"$d window size")
      assert(rows(d)._2 === win((win.length - 1) / 2), s"$d median")
    }
    // windows genuinely span multiple days somewhere
    assert(rows.values.exists(_._1 > 1L))
  }

  test("evt_random_sampler: md5-rotation gate and scale-ups replay exactly") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(id: Long): Long = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select("event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val kept = ev.filter(e => h60(e._1) % operators.Relational.RsMod == 0)
    assert(kept.nonEmpty && kept.length < ev.length)
    val rows = operators.Relational.evtRandomSampler(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val want = kept.groupBy(_._2).map { case (t, es) =>
      val s = es.map(e =>
        BigDecimal(e._3).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      t -> ((es.length.toLong, es.length.toLong * operators.Relational.RsMod,
        s, s * operators.Relational.RsMod.toDouble))
    }
    assert(rows === want)
  }

  test("evt_range_agg: bucket membership replays; configured buckets survive empty") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val values = ev.select("value").collect().map(_.getDouble(0))
    val rows = operators.Relational.evtRangeAgg(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getDouble(4)))).toMap
    assert(rows.keySet ===
      operators.Relational.RangeBuckets.map(_._1).toSet)
    operators.Relational.RangeBuckets.foreach { case (k, lo, hi) =>
      val in = values.filter(v => lo.forall(v >= _) && hi.forall(v < _))
      val s = in.map(v =>
        BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      assert(rows(k) === ((in.length.toLong, s)), s"bucket $k")
    }
    // all-low fixture: upper buckets must still be emitted, zero-filled
    val low = tempTableDir("events", ev.withColumn("value", lit(1.0d)))
    val zf = operators.Relational.evtRangeAgg(spark, low).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(zf("*-50.0") === values.length.toLong)
    assert(zf("50.0-150.0") === 0L && zf("150.0-*") === 0L)
  }

  test("evt_filters_agg: conditional buckets replay; other catches the rest") {
    val evs = spark.read.parquet(s"$sfDir/events.parquet")
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    def dec(vs: Seq[Double]) = vs.map(v =>
      BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val isView = (e: (String, Double)) => e._1 == "view"
    val isBig = (e: (String, Double)) => e._1 == "purchase" && e._2 > 100.0
    val rows = operators.Relational.evtFiltersAgg(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(rows.keySet === Set("views", "big_purchases", "other"))
    assert(rows("views") ===
      ((evs.count(isView).toLong, dec(evs.filter(isView).map(_._2)))))
    assert(rows("big_purchases") ===
      ((evs.count(isBig).toLong, dec(evs.filter(isBig).map(_._2)))))
    val other = evs.filterNot(e => isView(e) || isBig(e))
    assert(rows("other") === ((other.length.toLong, dec(other.map(_._2)))))
    assert(rows.values.map(_._1).sum === evs.length.toLong)
  }

  test("q66 weighted_avg: exact decimal replay") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    def d2(v: Double) = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val rows = operators.Relational.q66WeightedAvg(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    li.groupBy(_._1).foreach { case (f, es) =>
      val w = es.map(e => d2(e._2)).sum.toDouble
      val p = es.map(e => d2(e._3) * d2(e._2)).sum.toDouble
      assert(rows(f)._1 === w, s"$f weight_sum")
      assert(rows(f)._2 === p, s"$f wprice_sum")
      assert(rows(f)._3 === p / w, s"$f weighted avg")
    }
  }

  test("evt_variable_width_histogram: single-linkage boundary replay from raw values") {
    import operators.Relational.{VwBuckets, VwCells, VwScale}
    val rows = operators.Relational.evtVariableWidthHistogram(spark, sfDir)
      .collect().sortBy(_.getLong(0))
    val values = spark.read.parquet(s"$sfDir/events.parquet")
      .select("value").where(col("value").isNotNull)
      .collect().map(_.getDouble(0))
    // driver replay of the whole clustering: quantize, cut the B-1
    // largest gaps (ties -> lower cell), aggregate
    val vmin = values.min; val vmax = values.max
    def cellOf(v: Double): Long =
      if (vmax == vmin) 0L
      else math.min(VwCells - 1L, math.floor((v - vmin) / (vmax - vmin) * VwCells).toLong)
    val byCell = values.groupBy(cellOf).toSeq.sortBy(_._1)
    val cellIds = byCell.map(_._1)
    val gaps = cellIds.zip(cellIds.drop(1)).map { case (a, b) => (b, b - a) }
    val boundaries = gaps.sortBy { case (c, g) => (-g, c) }
      .take(VwBuckets - 1).map(_._1).toSet
    val expected = byCell.foldLeft(Vector.empty[Vector[(Long, Array[Double])]]) {
      case (acc, (c, vs)) =>
        if (acc.isEmpty || boundaries.contains(c)) acc :+ Vector((c, vs))
        else acc.init :+ (acc.last :+ ((c, vs)))
    }
    assert(rows.length === expected.length)
    assert(rows.length === math.min(VwBuckets, cellIds.length))
    rows.zip(expected).foreach { case (r, cluster) =>
      val vs = cluster.flatMap(_._2)
      assert(r.getDouble(1) === vs.min, "min_value")
      assert(r.getDouble(2) === vs.max, "max_value")
      assert(r.getLong(4) === vs.length.toLong, "doc_count")
      val gsum = vs.map(v => math.floor(v * VwScale).toLong).sum
      assert(r.getDouble(3) === gsum.toDouble / (VwScale.toDouble * vs.length),
        "centroid")
    }
    // buckets tile the axis in order: max of bucket i < min of bucket i+1
    rows.zip(rows.drop(1)).foreach { case (a, b) =>
      assert(a.getDouble(2) < b.getDouble(1), "buckets must not overlap")
    }
  }

  test("evt_value_histogram: dense frame, conservation, exact per-bucket recompute") {
    val rows = operators.Relational.evtValueHistogram(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val values = spark.read.parquet(s"$sfDir/events.parquet")
      .select("value").collect().map(_.getDouble(0))
    // dense: every bucket id between min and max present, bounds exact
    val ids = values.map(v => math.floor(v / operators.Relational.VhInterval).toLong)
    assert(rows.keySet === (ids.min to ids.max).toSet)
    rows.foreach { case (id, (lo, _, _)) => assert(lo === id * 25.0) }
    // conservation + exact per-bucket recompute (decimal-summed values)
    assert(rows.values.map(_._2).sum === values.length.toLong)
    val want = ids.zip(values).groupBy(_._1).map { case (id, vs) =>
      id -> ((vs.length.toLong,
        vs.map(p => BigDecimal(p._2).setScale(2, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble))
    }
    want.foreach { case (id, (n, s)) =>
      assert(rows(id)._2 === n, s"bucket $id count")
      assert(rows(id)._3 === s, s"bucket $id sum")
    }
    // zero-filled buckets (if any) carry exactly (0, 0.0)
    rows.filterNot(r => want.contains(r._1)).foreach { case (id, (_, n, s)) =>
      assert(n === 0L && s === 0.0, s"bucket $id zero-fill")
    }
  }

  test("q67 boxplot: quartiles, fences, and whiskers replay exactly") {
    // the interpolation both engines use at frac ∈ {0, .25, .5, .75}
    def pct(sorted: Array[Long], f: Double): Double = {
      val pos = (sorted.length - 1) * f
      val lo = pos.toInt
      val frac = pos - lo
      if (frac == 0.0) sorted(lo).toDouble
      else sorted(lo) + (sorted(lo + 1) - sorted(lo)) * frac
    }
    val cents = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    val rows = operators.Relational.q67Boxplot(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    cents.groupBy(_._1).foreach { case (p, es) =>
      val s = es.map(_._2).sorted
      val (q1, q2, q3) = (pct(s, 0.25), pct(s, 0.5), pct(s, 0.75))
      val lo = q1 - 1.5 * (q3 - q1)
      val hi = q3 + 1.5 * (q3 - q1)
      val r = rows(p)
      assert(r.getLong(1) === s.length.toLong, s"$p n")
      assert(r.getDouble(2) === s.head.toDouble / 100.0, s"$p min")
      assert(r.getDouble(3) === q1 / 100.0, s"$p q1")
      assert(r.getDouble(4) === q2 / 100.0, s"$p median")
      assert(r.getDouble(5) === q3 / 100.0, s"$p q3")
      assert(r.getDouble(6) === s.last.toDouble / 100.0, s"$p max")
      assert(r.getDouble(7) === s.filter(_ >= lo).min.toDouble / 100.0, s"$p lw")
      assert(r.getDouble(8) === s.filter(_ <= hi).max.toDouble / 100.0, s"$p uw")
      // whiskers sit inside the box-extremes envelope
      assert(r.getDouble(7) >= r.getDouble(2) && r.getDouble(7) <= r.getDouble(3))
      assert(r.getDouble(8) <= r.getDouble(6) && r.getDouble(8) >= r.getDouble(5))
    }
  }

  test("q68 multi_terms: top composite buckets by count with full tiebreak") {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_custkey", "o_orderpriority").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val seg = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val want = o.map { case (ck, pr) => (seg(ck), pr) }
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case ((s, p), n) => (-n, s, p) }
      .take(operators.Relational.MultiTermsK)
    val got = operators.Relational.q68MultiTerms(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    assert(got.toSeq === want.map { case (k, n) => (k, n) })
  }

  test("q69 top_metrics: exactly the latest row per type, tiebreak on id") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("event_type", "unix_micros(ts) AS t", "event_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = operators.Relational.q69TopMetrics(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val want = ev.groupBy(_._1).map { case (t, es) =>
      t -> es.maxBy(e => (e._2, e._3))._3
    }
    assert(got === want)
  }

  test("evt_serial_diff: lag-7 differences replay; first lag buckets are NULL") {
    val daily = graft.sources.Tables.events(spark, sfDir)
      .groupBy(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.expr("CAST(ts AS DATE)").as("day"))
      .count().collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val got = operators.Relational.evtSerialDiff(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getDate(1).toString),
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    val lag = operators.Relational.SerialDiffLag
    daily.groupBy(_._1).foreach { case (t, ds) =>
      val ordered = ds.sortBy(_._2)
      ordered.zipWithIndex.foreach { case ((_, day, n), i) =>
        val want = if (i < lag) None else Some(n - ordered(i - lag)._3)
        assert(got((t, day)) === ((n, want)), s"$t $day")
      }
    }
  }

  test("evt_sibling_aggs: bucket extremes, mean, total and exact p50 replay") {
    val daily = graft.sources.Tables.events(spark, sfDir)
      .groupBy(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.expr("CAST(ts AS DATE)").as("day"))
      .count().collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val got = operators.Relational.evtSiblingAggs(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getDate(1).toString, r.getLong(2),
        r.getDate(3).toString, r.getLong(4), r.getDouble(5), r.getLong(6),
        r.getLong(7), r.getLong(8)))).toMap
    daily.groupBy(_._1).foreach { case (t, ds) =>
      val mx = ds.minBy(d => (-d._3, d._2))
      val mn = ds.minBy(d => (d._3, d._2))
      val ns = ds.map(_._3).sorted
      val want = (mx._2, mx._3, mn._2, mn._3,
        ds.map(_._3).sum.toDouble / ds.length, ds.map(_._3).sum,
        ds.length.toLong, ns((ns.length - 1) / 2))
      assert(got(t) === want, s"$t")
    }
  }

  test("q75 top_hits: each bucket carries doc_count and exactly its k best full rows") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("event_type", "event_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val got = operators.Relational.q75TopHits(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byType = ev.groupBy(_._1)
    byType.foreach { case (t, es) =>
      val rows = got.filter(_._1 == t).sortBy(_._3)
      assert(rows.forall(_._2 === es.length.toLong), s"$t doc_count")
      val want = es.sortBy(e => (-e._3, e._2))
        .take(operators.Relational.TopHitsK).map(_._2)
      assert(rows.map(_._4).toSeq === want.toSeq, s"$t hit ids")
      assert(rows.map(_._3).toSeq ===
        (1L to want.length).toSeq, s"$t hit ranks")
    }
    assert(got.length ===
      byType.values.map(es =>
        math.min(operators.Relational.TopHitsK, es.length)).sum)
  }

  test("q70 frequent_pairs: support and lift replay on brand baskets") {
    val brand = spark.read.parquet(s"$sfDir/part.parquet")
      .select("p_partkey", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val items = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), brand(r.getLong(1)))).distinct
    val nBaskets = items.map(_._1).distinct.length.toLong
    val sup = items.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairSup = items.groupBy(_._1).toSeq.flatMap { case (_, is) =>
      val bs = is.map(_._2).sorted
      for (i <- bs.indices; j <- (i + 1) until bs.length) yield (bs(i), bs(j))
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = operators.Relational.q70FrequentPairs(spark, sfDir).collect()
    assert(got.length === math.min(operators.Relational.FpTopK, pairSup.size))
    // returned pairs are the top-k under (support desc, a asc, b asc)
    val want = pairSup.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }
      .take(operators.Relational.FpTopK)
    assert(got.map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toSeq
      === want)
    got.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(r.getLong(3) === sup(a), s"support_a $a")
      assert(r.getLong(4) === sup(b), s"support_b $b")
      assert(r.getLong(5) === nBaskets)
      assert(r.getDouble(6) ===
        (pairSup((a, b)) * nBaskets).toDouble / (sup(a) * sup(b)).toDouble)
    }
  }

  test("q76 frequent_triples: brute-force itemset enumeration replay") {
    import operators.Relational.{FpTopK, FtMinSupport}
    val brand = spark.read.parquet(s"$sfDir/part.parquet")
      .select("p_partkey", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val items = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), brand(r.getLong(1)))).distinct
    val nBaskets = items.map(_._1).distinct.length.toLong
    // blind C(k,3) enumeration — the oriented chain must agree with it
    val tripSup = items.groupBy(_._1).toSeq.flatMap { case (_, is) =>
      val bs = is.map(_._2).sorted
      for (i <- bs.indices; j <- (i + 1) until bs.length;
           l <- (j + 1) until bs.length)
        yield s"${bs(i)}|${bs(j)}|${bs(l)}"
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
      .filter(_._2 >= FtMinSupport)
    val want = tripSup.toSeq.sortBy { case (k, n) => (-n, k) }.take(FpTopK)
    val got = operators.Relational.q76FrequentTriples(spark, sfDir).collect()
    assert(got.length === math.min(FpTopK, tripSup.size))
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq === want)
    got.foreach { r =>
      assert(r.getLong(2) === nBaskets)
      assert(r.getDouble(3) === r.getLong(1).toDouble / nBaskets.toDouble)
    }
  }

  test("evt_ewma: dyadic fold equals the classic ewma recursion exactly") {
    val cents = graft.sources.Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long")
        .as("cents"))
      .collect().map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    val got = operators.Relational.evtEwma(spark, sfDir).collect()
      .map(r => r.getDate(0).toLocalDate -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got.keySet === cents.keySet)
    cents.keys.foreach { d =>
      val window = (0 until operators.Relational.EwmaWindow)
        .map(k => d.minusDays(k.toLong)).filter(cents.contains).sorted
      assert(got(d)._1 === window.length.toLong, s"$d n_window")
      // ES's MovingFunctions.ewma recursion, run in double: every step
      // is a halving (exact in binary) + an exact small-int add, so it
      // must equal the integer fold BIT FOR BIT after the one /100
      var avg = cents(window.head).toDouble
      window.tail.foreach(w => avg = cents(w).toDouble / 2.0 + avg / 2.0)
      assert(got(d)._2 === avg / 100.0, s"$d ewma")
    }
  }

  test("q71 nested_agg: parent/child/reverse_nested counts replay") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_orderstatus", "o_orderpriority").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .filter(_._2 == "F")
    val kids = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .filter(_._2 > 25.0)
      .groupBy(_._1)
    def d2(v: Double) = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val got = operators.Relational.q71NestedAgg(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    orders.groupBy(_._3).foreach { case (p, os) =>
      val r = got(p)
      assert(r.getLong(1) === os.length.toLong, s"$p parents")
      assert(r.getLong(2) ===
        os.map(o => kids.get(o._1).map(_.length).getOrElse(0)).sum.toLong,
        s"$p children")
      assert(r.getDouble(3) ===
        os.flatMap(o => kids.get(o._1).toSeq.flatten.map(k => d2(k._3)))
          .sum.toDouble, s"$p price")
      assert(r.getLong(4) ===
        os.count(o => kids.contains(o._1)).toLong, s"$p reverse_nested")
    }
  }

  test("q72 rate_agg: calendar-day normalization replays") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("event_type",
        "CAST(date_trunc('month', ts) AS DATE) AS m", "value").collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getDouble(2)))
    val got = operators.Relational.q72RateAgg(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate) -> r).toMap
    assert(got.keySet === ev.map(e => (e._1, e._2)).toSet)
    ev.groupBy(e => (e._1, e._2)).foreach { case (k, es) =>
      val r = got(k)
      val days = k._2.lengthOfMonth().toLong
      assert(r.getLong(2) === es.length.toLong)
      assert(r.getLong(4) === days, s"$k days")
      assert(r.getDouble(5) === es.length.toDouble / days.toDouble, s"$k rate")
    }
  }

  test("q73 bucket_sort: the from/size page of value-ranked buckets") {
    import operators.{Relational => R}
    val daily = graft.sources.Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n")).collect()
    val got = R.q73BucketSort(spark, sfDir).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(3), r.getDouble(2)))
    assert(got.length === math.min(R.BsSize, math.max(0, daily.length - R.BsFrom)))
    // ranks are exactly the requested page and value_sum is non-increasing
    assert(got.map(_._2).sorted.toSeq ===
      ((R.BsFrom + 1).toLong to (R.BsFrom + got.length).toLong).toSeq)
    val byRank = got.sortBy(_._2).map(_._3)
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
  }

  test("evt_ip_range / evt_ip_prefix: integer address space replay") {
    import operators.{Relational => R}
    // replay the md5 address derivation
    val ips = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 15), 16, 10) AS BIGINT) % 4294967296 AS ip")
      .collect().map(_.getLong(0))
    val bounds = (Seq(0L) ++ R.IpRangeEdges) :+ 4294967296L
    val rows = R.evtIpRange(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet === bounds.sliding(2).zipWithIndex.map(_._2.toLong).toSet)
    // conservation + per-range membership
    assert(rows.values.map(_.getLong(3)).sum === ips.length.toLong)
    bounds.sliding(2).zipWithIndex.foreach { case (Seq(lo, hi), i) =>
      val r = rows(i.toLong)
      assert(r.getLong(3) === ips.count(ip => ip >= lo && ip < hi).toLong, s"range $i")
      // dotted quads render the integer bounds
      def quad(v: Long) =
        s"${v / 16777216}.${v / 65536 % 256}.${v / 256 % 256}.${v % 256}"
      assert(r.getString(1) === quad(lo) && r.getString(2) === quad(hi - 1))
    }
    // /8 prefixes: counts replay and the page is fully tiebroken
    val nets = ips.map(_ / 16777216L)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val want = nets.toSeq.sortBy { case (n, c) => (-c, n) }.take(R.IpPrefixTopK)
    val got = R.evtIpPrefix(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq === want)
    R.evtIpPrefix(spark, sfDir).collect().foreach(r =>
      assert(r.getString(0) === s"${r.getLong(1)}.0.0.0/8"))
  }

  test("q74 terms_partition: the shards tile the term space exactly") {
    import operators.{Relational => R}
    val words = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("explode(split(text, ' ')) AS term").collect()
      .map(_.getString(0))
    val full = words.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = R.q74TermsPartition(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // correct counts within the partition
    got.foreach { case (t, c) => assert(full(t) === c, t) }
    // the union of ALL partitions is exactly the full term set, disjoint
    val shards = (0 until R.TpNumPartitions).map { p =>
      graft.sources.Tables.documents(spark, sfDir)
        .selectExpr("explode(split(text, ' ')) AS term")
        .where(expr("CAST(conv(substring(md5(term), 1, 15), 16, 10) AS BIGINT)")
          % R.TpNumPartitions === p)
        .groupBy("term").count().collect().map(_.getString(0)).toSet
    }
    assert(shards.map(_.size).sum === full.keySet.size, "disjoint tiling")
    assert(shards.reduce(_ ++ _) === full.keySet, "complete tiling")
    assert(shards(R.TpPartition) === got.keySet)
  }

  test("evt_cumulative_cardinality: running first-seen sum equals per-day prefix distinct") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("CAST(ts AS DATE) AS d", "user_id").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val got = operators.Relational.evtCumulativeCardinality(spark, sfDir)
      .collect()
      .map(r => r.getDate(0).toLocalDate ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val days = ev.map(_._1).distinct.sorted
    assert(got.keySet === days.toSet)
    days.foreach { d =>
      // the DEFINITION, computed the expensive way: distinct users in
      // the full prefix up to day d
      val prefix = ev.filter(!_._1.isAfter(d)).map(_._2).distinct.length.toLong
      assert(got(d)._3 === prefix, s"$d cumulative")
      assert(got(d)._1 === ev.count(_._1 == d).toLong, s"$d doc_count")
    }
    // monotone non-decreasing, ends at the corpus distinct-user count
    val curve = days.map(got(_)._3)
    assert(curve.zip(curve.tail).forall { case (a, b) => a <= b })
    assert(curve.last === ev.map(_._2).distinct.length.toLong)
  }

  test("evt_bucket_script: per-bucket conversion replays; empty-view buckets null out") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("CAST(ts AS DATE) AS d", "event_type").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getString(1)))
    val got = operators.Relational.evtBucketScript(spark, sfDir).collect()
      .map(r => r.getDate(0).toLocalDate -> r).toMap
    assert(got.keySet === ev.map(_._1).toSet)
    ev.groupBy(_._1).foreach { case (d, es) =>
      val (p, v) = (es.count(_._2 == "purchase").toLong,
        es.count(_._2 == "view").toLong)
      val r = got(d)
      assert(r.getLong(1) === p && r.getLong(2) === v, s"$d counts")
      if (v > 0) assert(r.getDouble(4) === p.toDouble / v.toDouble, s"$d conv")
      else assert(r.isNullAt(4), s"$d null conversion")
    }
  }

  test("evt_anomaly_dow: flags judge against the weekday cohort, exactly") {
    val daily = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("event_type", "CAST(ts AS DATE) AS d").collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .map { case ((t, d), n) => (t, d, d.getDayOfWeek.getValue - 1, n) }
    val got = operators.Relational.evtAnomalyDow(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(5)))).toMap
    assert(got.keySet === daily.map(e => (e._1, e._2)).toSet)
    daily.groupBy(e => (e._1, e._3)).foreach { case (_, cohort) =>
      val d = cohort.length.toLong
      val s = cohort.map(_._4).sum
      val ss = cohort.map(x => BigInt(x._4) * BigInt(x._4)).sum
      cohort.foreach { case (t, day, dow, n) =>
        val (gDow, gN, flag) = got((t, day))
        assert(gDow === dow.toLong && gN === n, s"($t,$day)")
        val lhs = (BigInt(d) * BigInt(n) - BigInt(s)).pow(2)
        val rhs = BigInt(4) * (BigInt(d) * ss - BigInt(s) * BigInt(s))
        assert(flag === (lhs > rhs), s"($t,$day) flag")
      }
    }
  }

  test("evt_categorize: digit runs collapse to stable templates") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select("event_type", "props").collect()
      .map(r => (r.getString(0) + " " + r.getString(1)).replaceAll("[0-9]+", "#"))
    val want = ev.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = operators.Relational.evtCategorize(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet === want.keySet)
    got.foreach(r => assert(r.getLong(1) === want(r.getString(0))))
    // sorted by count desc then template asc
    val order = got.map(r => (-r.getLong(1), r.getString(0)))
    assert(order.toSeq === order.sorted.toSeq)
    // masking collapsed every digit
    got.foreach(r => assert(!r.getString(0).exists(_.isDigit)))
  }
}
