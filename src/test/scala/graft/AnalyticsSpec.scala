package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Properties of the retrieval / event-analytics pack
  * (queries/AnalyticsQueries.scala) that the DuckDB oracle cannot
  * state: cross-surface equivalence (indexed vs scan-side BM25),
  * session-gap invariants, sampler determinism and budget adherence,
  * and the Z-order locality bound.
  */
class AnalyticsSpec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  test("q284 proration: allocations sum exactly to each pool, bumps bounded") {
    val rows = run("q284_proration").collect()
    assert(rows.length == 5)
    // The Hamilton invariant: no priority class carries any residual.
    rows.foreach { r =>
      assert(r.getAs[Long]("resid_total") == 0L,
        s"${r.getAs[String]("prio")}: resid ${r.getAs[Long]("resid_total")}")
      assert(r.getAs[Long]("n_bumped") <= r.getAs[Long]("n_lines"))
    }
    // Cross-check the grand total against an independent pool recount
    // over orders that have at least one lineitem.
    val o = graft.sources.Tables.orders(spark, sfDir)
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey")).distinct()
    val pools = o.join(li, col("o_orderkey") === col("l_orderkey"))
      .select(expr("cast(round(o_totalprice * 100, 0) as long) div 10").as("p"))
      .agg(sum("p")).collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("alloc_total")).sum == pools)
  }

  test("q287 IND discovery: declared FKs hold, err consistent with missing") {
    val rows = run("q287_ind_discovery").collect()
    assert(rows.length == 10)
    val byPair = rows.map(r => r.getAs[String]("pair") -> r).toMap
    // The generator's real FK edges must be discovered as holding INDs.
    Seq("c_nationkey<n_nationkey", "s_nationkey<n_nationkey",
      "n_regionkey<r_regionkey", "o_custkey<c_custkey",
      "l_orderkey<o_orderkey", "l_partkey<p_partkey",
      "l_suppkey<s_suppkey").foreach { p =>
      assert(byPair(p).getAs[Int]("holds") == 1, s"$p should hold")
      assert(byPair(p).getAs[Long]("n_missing") == 0L)
    }
    rows.foreach { r =>
      assert((r.getAs[Int]("holds") == 1) == (r.getAs[Long]("n_missing") == 0L))
      assert(r.getAs[Long]("n_missing") <= r.getAs[Long]("n_lhs"))
    }
  }

  test("q288 l-diversity: members partition the customer table") {
    val rows = run("q288_l_diversity").collect()
    val total = rows.map(_.getAs[Long]("n_members")).sum
    assert(total == graft.sources.Tables.customer(spark, sfDir).count())
    rows.foreach { r =>
      assert((r.getAs[Long]("l") < 3L) == (r.getAs[Int]("violates") == 1))
    }
  }

  test("q297 IVM: carve is a real split and the maintained view covers the join") {
    val o = graft.sources.Tables.orders(spark, sfDir)
    val li = graft.sources.Tables.lineitem(spark, sfDir)
    val full = o.join(li, col("o_orderkey") === col("l_orderkey")).count()
    val rows = run("q297_ivm_join_delta").collect()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == full,
      "maintained view row count != full join")
    // The md5 carve must produce a genuine two-sided split (~1/8).
    val frac = o.filter(substring(md5(concat(lit("ivmo:"),
        col("o_orderkey").cast("string"))), 1, 1).isin("0", "1")).count()
      .toDouble / o.count()
    assert(frac > 0.05 && frac < 0.25, s"delta fraction $frac out of range")
  }

  test("q298 Markov attribution: removal only hurts, shares normalize") {
    val rows = run("q298_markov_attribution").collect()
    assert(rows.map(_.getAs[String]("channel")).toSeq.sorted ==
      Seq("click", "error", "signup", "view"))
    val base = rows.head.getAs[Long]("conv_base9")
    assert(base > 0L && base <= 1000000000L)
    rows.foreach { r =>
      assert(r.getAs[Long]("conv_base9") == base)
      // absorbing a channel to NULL cannot raise conversion (up to the
      // 1-unit truncation wobble the clamp absorbs)
      assert(r.getAs[Long]("conv_removed9") <= base + 1L)
      assert(r.getAs[Long]("re9") >= 0L)
    }
    val shares = rows.map(_.getAs[Long]("share9")).sum
    assert(shares >= 1000000000L - 4L && shares <= 1000000000L,
      s"shares sum $shares not within rounding of 1e9")
  }

  test("q268 WoW growth recomputes from the weekly cells") {
    val rows = run("q268_wow_growth").collect()
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      val sorted = rs.sortBy(_.getAs[java.sql.Date]("wk").getTime)
      assert(sorted.head.isNullAt(sorted.head.fieldIndex("prev")),
        s"$t: first week must have no prior")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("prev") == a.getAs[Long]("cents"),
            s"$t: prev chain broken")
          if (a.getAs[Long]("cents") != 0L)
            assert(b.getAs[Double]("wow_growth") ==
              (b.getAs[Long]("cents") - a.getAs[Long]("cents")).toDouble /
                a.getAs[Long]("cents"))
        case _ =>
      }
    }
  }

  test("q269 freshness audit matches per-table recounts") {
    val rows = run("q269_freshness_audit").collect()
      .map(r => r.getAs[String]("table_name") -> r).toMap
    assert(rows.keySet == Set("events", "orders", "lineitem"))
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("ts")).collect().map(_.getTimestamp(0).getTime)
    val wm = ev.max
    assert(rows("events").getAs[java.sql.Timestamp]("watermark").getTime == wm)
    assert(rows("events").getAs[Long]("n_rows") == ev.length.toLong)
    assert(rows("events").getAs[Long]("n_last_24h") ==
      ev.count(t => t / 1000 >= wm / 1000 - 86400).toLong)
  }

  test("q270 Jain index agrees with q241's 16-node loads and its bounds") {
    val r = run("q270_jain_fairness").collect().head
    val loads = run("q241_rendezvous_hash").collect()
      .map(_.getAs[Long]("load16")).filter(_ > 0)
    val sx = loads.sum; val sxx = loads.map(x => x * x).sum
    assert(r.getAs[Long]("sx") == sx && r.getAs[Long]("sxx") == sxx)
    val jain = r.getAs[Double]("jain")
    assert(jain == sx.toDouble * sx / (loads.length * sxx.toDouble))
    assert(jain > 1.0 / loads.length && jain <= 1.0)
    // Hash placement over >> n keys should be reasonably even.
    assert(jain > 0.8, s"HRW placement unexpectedly skewed: $jain")
  }

  test("q271 streak distribution matches a brute-force per-user scan") {
    val rows = run("q271_activity_streaks").collect()
    val days = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
          .cast("long").as("d"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val best = days.groupBy(_._1).toSeq.map { case (_, ds) =>
      val sorted = ds.map(_._2).sorted
      var run = 1L; var bst = 1L
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          if (b == a + 1) { run += 1; bst = math.max(bst, run) }
          else run = 1L
        case _ =>
      }
      bst
    }
    val dist = best.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(rows.map(_.getAs[Long]("n_users")).sum == best.size.toLong)
    rows.foreach { r =>
      assert(dist(r.getAs[Long]("best_streak")) == r.getAs[Long]("n_users"),
        s"streak ${r.getAs[Long]("best_streak")} count drifted")
    }
  }

  test("q266 KWIC snippets are true windows around the first term hit") {
    val rows = run("q266_kwic_snippets").collect()
    assert(rows.nonEmpty)
    val texts = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val text = texts(r.getAs[Long]("doc_id"))
      val pos = r.getAs[Int]("pos")
      assert(pos == text.indexOf("vector") + 1, "pos must be first hit, 1-based")
      val start = math.max(pos - 20, 1) - 1
      val expected = text.substring(start,
        math.min(start + 50, text.length))
      assert(r.getAs[String]("snippet") == expected)
      assert(r.getAs[String]("snippet").contains("vector") ||
        text.length < start + 6, "window must show the term")
    }
  }

  test("q263 trigram supports match a local sequence scan") {
    val rows = run("q263_event_trigrams").collect()
    assert(rows.length == 20)
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getString(3)))
    val counts = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      es.sortBy(e => (e._2, e._3)).map(_._4).sliding(3)
        .filter(_.length == 3).map(_.mkString(">"))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.foreach { r =>
      assert(counts(r.getAs[String]("pattern")) == r.getAs[Long]("support"),
        s"${r.getAs[String]("pattern")} support drifted")
    }
    // Top-20 really is the top: no unlisted pattern beats the listed min.
    val minListed = rows.map(_.getAs[Long]("support")).min
    val listed = rows.map(_.getAs[String]("pattern")).toSet
    assert(counts.filterNot(p => listed(p._1)).values
      .forall(_ <= minListed))
  }

  test("q264 MAD medians and outlier count match a local recount") {
    val r = run("q264_mad_outliers").collect().head
    val cents = graft.sources.Tables.orders(spark, sfDir)
      .select(floor(col("o_totalprice") * 100 + 0.5).cast("long").as("v"))
      .collect().map(_.getLong(0)).sorted
    val n = cents.length
    def lowerMedian(xs: Array[Long]): Long = {
      // smallest value whose cumulative count doubles to ≥ n.
      xs((xs.length - 1) / 2)
    }
    val med = lowerMedian(cents)
    assert(r.getAs[Long]("med") == med)
    val mad = lowerMedian(cents.map(v => math.abs(v - med)).sorted)
    assert(r.getAs[Long]("mad") == mad)
    val out = cents.count(v => math.abs(v - med) * 10000L > 44478L * mad)
    assert(r.getAs[Long]("n_outliers") == out.toLong)
    assert(r.getAs[Long]("n_rows") == n.toLong)
  }

  test("q265 LTV curves accumulate correctly and normalize by cohort size") {
    val rows = run("q265_cohort_ltv").collect()
    assert(rows.nonEmpty)
    val sizes = graft.sources.Tables.events(spark, sfDir)
      .filter(col("event_type") === "signup")
      .groupBy("user_id")
      .agg(date_trunc("week", min("ts")).cast("date").as("cw"))
      .groupBy("cw").count().collect()
      .map(r => r.getAs[java.sql.Date]("cw").toString -> r.getAs[Long]("count"))
      .toMap
    rows.groupBy(_.getAs[java.sql.Date]("cohort_week").toString)
      .foreach { case (cw, rs) =>
        val sorted = rs.sortBy(_.getAs[Long]("wk"))
        var cum = 0L
        sorted.foreach { r =>
          cum += r.getAs[Long]("rev")
          assert(r.getAs[Long]("cum_rev") == cum, s"$cw: cum drifted")
          assert(r.getAs[Double]("ltv_per_user") ==
            cum.toDouble / sizes(cw), s"$cw: normalization drifted")
        }
      }
  }

  test("q258 winback counts match a local per-user gap scan") {
    val rows = run("q258_winback").collect()
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._2.getTime, e._3))
      sorted.sliding(2).collect {
        case Array(a, b)
          if (b._2.getTime - a._2.getTime) / 1000 >= 172800 => b
      }
    }
    assert(rows.map(_.getAs[Long]("n_winbacks")).sum == expected.size.toLong,
      "total winbacks drifted from the local gap scan")
    val perDay = expected.groupBy(e => e._2.getTime / 86400000L).view
      .mapValues(_.size.toLong).toMap
    rows.foreach { r =>
      val day = r.getAs[java.sql.Date]("return_day").toLocalDate.toEpochDay
      assert(r.getAs[Long]("n_winbacks") == perDay(day),
        s"day $day winback count drifted")
    }
  }

  test("q259 k-anonymity audit matches a local group-size recount") {
    val r = run("q259_k_anonymity").collect().head
    val sizes = graft.sources.Tables.customer(spark, sfDir)
      .groupBy("c_nationkey", "c_mktsegment").count()
      .collect().map(_.getAs[Long]("count"))
    assert(r.getAs[Long]("n_groups") == sizes.length.toLong)
    assert(r.getAs[Long]("n_violating_groups") == sizes.count(_ < 5).toLong)
    assert(r.getAs[Long]("n_risk_rows") == sizes.filter(_ < 5).sum)
    assert(r.getAs[Long]("min_group_size") == sizes.min)
    assert(r.getAs[Long]("n_rows") == sizes.sum)
  }

  test("q253 NDCG: ideal dominates the BM25 ranking and both are positive") {
    val r = run("q253_ndcg").collect().head
    val dcg = r.getAs[Long]("dcg9"); val idcg = r.getAs[Long]("idcg9")
    assert(dcg > 0L && idcg > 0L)
    assert(idcg >= dcg, "ideal ranking must dominate any other ranking")
    val ndcg = r.getAs[Double]("ndcg")
    assert(ndcg > 0.0 && ndcg <= 1.0)
    assert(ndcg == dcg.toDouble / idcg.toDouble)
  }

  test("q254 business-day formula agrees with a brute-force weekday count") {
    // Independent check of the closed form over a span of date pairs.
    // Convention: B(b) − B(a) counts business days in [a, b) — the
    // order day counts if it is a weekday, the ship day does not.
    val anchor = java.time.LocalDate.of(1990, 1, 1) // a Monday
    def bruteBdays(a: java.time.LocalDate, b: java.time.LocalDate): Long =
      Iterator.iterate(a)(_.plusDays(1))
        .takeWhile(_.isBefore(b))
        .count(d => d.getDayOfWeek.getValue <= 5).toLong
    def closed(d: java.time.LocalDate): Long = {
      val n = java.time.temporal.ChronoUnit.DAYS.between(anchor, d)
      5 * (n / 7) + math.min(n % 7, 5)
    }
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val a = anchor.plusDays(rng.nextInt(4000).toLong)
      val b = a.plusDays(rng.nextInt(400).toLong)
      assert(closed(b) - closed(a) == bruteBdays(a, b),
        s"closed form drifted for $a -> $b")
    }
    val rows = run("q254_business_days").collect()
    val li = graft.sources.Tables.lineitem(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_items")).sum == li)
    // The synthetic generator does not enforce ship ≥ order, so
    // negative leads are legitimate data; the anchor keeps BOTH n's
    // non-negative, which is all the div/mod portability needs.
    assert(rows.map(_.getAs[Long]("bdays")).distinct.length == rows.length)
  }

  test("q252 column profile matches independent per-column recounts") {
    val rows = run("q252_column_profile").collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    assert(rows.size == 6)
    val o = graft.sources.Tables.orders(spark, sfDir)
    val n = o.count()
    val checks: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      ("o_orderkey", col("o_orderkey")),
      ("o_totalprice_cents", floor(col("o_totalprice") * 100 + 0.5)
        .cast("long")),
      ("o_orderpriority", col("o_orderpriority")))
    checks.foreach { case (name, c) =>
      val r = rows(name)
      assert(r.getAs[Long]("n_rows") == n)
      assert(r.getAs[Long]("n_nulls") == o.filter(c.isNull).count())
      assert(r.getAs[Long]("n_distinct") == o.select(c).distinct().count())
      val mm = o.agg(min(c).cast("string"), max(c).cast("string"))
        .collect().head
      assert(r.getAs[String]("min_str") == mm.getString(0))
      assert(r.getAs[String]("max_str") == mm.getString(1))
    }
  }

  test("q247 Kaplan-Meier matches a local brute-force survival recount") {
    val rows = run("q247_kaplan_meier").collect()
    assert(rows.nonEmpty)
    // Local subject table from raw events.
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
    val dayMs = 86400000L
    def day(t: java.sql.Timestamp) = t.getTime / dayMs
    val maxDay = ev.map(e => day(e._3)).max
    val subjects = ev.filter(_._2 == "signup").groupBy(_._1).toSeq.map {
      case (u, ss) =>
        val s0 = ss.map(_._3).minBy(_.getTime)
        val p = ev.filter(e => e._1 == u && e._2 == "purchase" &&
          !e._3.before(s0)).map(_._3)
        if (p.nonEmpty) (day(p.minBy(_.getTime)) - day(s0), 1L)
        else (maxDay - day(s0), 0L)
    }
    val n = subjects.size.toLong
    val byT = subjects.groupBy(_._1).view
      .mapValues(v => (v.count(_._2 == 1L).toLong, v.count(_._2 == 0L).toLong))
      .toMap
    var exited = 0L
    var logS = 0L
    val ts = byT.keys.toSeq.sorted
    val expected = ts.map { t =>
      val (d, c) = byT(t)
      val risk = n - exited
      exited += d + c
      if (d > 0 && d < risk)
        logS += math.floor(math.log((risk - d).toDouble / risk) * 1e9 + 0.5)
          .toLong
      else if (d > 0)
        logS += -50000000000L // the query's documented S=0 sentinel
      (t, risk, d, c, logS)
    }
    val got = rows.map(r => (r.getAs[Long]("t"), r.getAs[Long]("n_risk"),
      r.getAs[Long]("d"), r.getAs[Long]("c"), r.getAs[Long]("log_s9"))).toSeq
    assert(got == expected, "KM table drifted from the local recount")
    // Survival is monotone nonincreasing.
    assert(rows.map(_.getAs[Long]("log_s9")).sliding(2)
      .forall(p => p.length < 2 || p(1) <= p(0)))
  }

  test("q246 integrity audit: harness schema is referentially clean with true totals") {
    val rows = run("q246_fk_integrity").collect()
    assert(rows.length == 4)
    val li = graft.sources.Tables.lineitem(spark, sfDir).count()
    val ord = graft.sources.Tables.orders(spark, sfDir).count()
    rows.foreach { r =>
      val rel = r.getAs[String]("relation")
      val expTotal = if (rel.startsWith("lineitem")) li else ord
      assert(r.getAs[Long]("n_rows") == expTotal, s"$rel total drifted")
      // True FK edges are clean in the harness data; the reverse
      // (childless orders) is an inventory stat, recounted below.
      if (rel != "orders-without-lineitem")
        assert(r.getAs[Long]("n_orphans") == 0L,
          s"$rel: harness data must be referentially clean")
    }
    val childless = graft.sources.Tables.orders(spark, sfDir)
      .join(graft.sources.Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("o_orderkey")).distinct(),
        Seq("o_orderkey"), "left_anti").count()
    assert(rows.find(_.getAs[String]("relation") == "orders-without-lineitem")
      .get.getAs[Long]("n_orphans") == childless)
  }

  test("q240 compaction groups conserve bytes, stay near-target, and tile the calendar") {
    val rows = run("q240_compaction_plan").collect()
    assert(rows.length > 1, "fixture must produce multiple output groups")
    val files = graft.sources.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_shipdate").cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
      .collect()
    val totalBytes = files.map(_.getAs[Long]("n") * 100L).sum
    val maxFile = files.map(_.getAs[Long]("n") * 100L).max
    assert(rows.map(_.getAs[Long]("total_bytes")).sum == totalBytes,
      "planner must conserve total bytes")
    // Start-offset rule bound: a group closes within one file of target.
    rows.foreach { r =>
      assert(r.getAs[Long]("total_bytes") <= 262144L + maxFile,
        s"group ${r.getAs[Long]("grp")} exceeds target + one file")
    }
    // Contiguous, ordered date ranges.
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[java.sql.Date]("last_day").before(
          b.getAs[java.sql.Date]("first_day")),
          "group date ranges must not interleave")
      case _ =>
    }
  }

  test("q241 rendezvous: loads partition the keys and only the new node gains") {
    val rows = run("q241_rendezvous_hash").collect()
    assert(rows.length == 17)
    val nKeys = graft.sources.Tables.customer(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("load16")).sum == nKeys)
    assert(rows.map(_.getAs[Long]("load17")).sum == nKeys)
    rows.foreach { r =>
      val node = r.getAs[Long]("node")
      if (node < 16)
        assert(r.getAs[Long]("moved_in") == 0L,
          s"HRW minimal disruption violated: node $node gained keys")
      else {
        assert(r.getAs[Long]("load16") == 0L)
        assert(r.getAs[Long]("moved_in") == r.getAs[Long]("load17"),
          "every key on the new node must be a moved key")
      }
    }
  }

  test("q235 z-test counts partition the user-days and z matches a local recount") {
    val r = run("q235_ab_ztest").collect().head
    val na = r.getAs[Long]("n_a"); val ca = r.getAs[Long]("c_a")
    val nb = r.getAs[Long]("n_b"); val cb = r.getAs[Long]("c_b")
    val userDays = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts").cast("date").as("day")).distinct().count()
    assert(na + nb == userDays, s"arms ${na + nb} != user-days $userDays")
    assert(ca <= na && cb <= nb && ca > 0 && cb > 0)
    // Conversion must not saturate — the fixture property that keeps
    // the pooled se nonzero at every SF (ANSI faults se = 0 loudly).
    assert(ca < na || cb < nb, "conversion saturated: se would be 0")
    val pa = ca.toDouble / na; val pb = cb.toDouble / nb
    val pp = (ca + cb).toDouble / (na + nb)
    val z = (pa - pb) / math.sqrt(pp * (1.0 - pp) * (1.0 / na + 1.0 / nb))
    assert(r.getAs[Double]("z") == z, s"z ${r.getAs[Double]("z")} != local $z")
  }

  test("q236 HDR buckets bracket the true exact percentiles within the 5-bit bound") {
    val rows = run("q236_hdr_histogram").collect()
    assert(rows.map(_.getAs[Long]("pct")).toSeq == Seq(50L, 90L, 95L, 99L))
    val cents = graft.sources.Tables.orders(spark, sfDir)
      .select(floor(col("o_totalprice") * 100 + 0.5).cast("long").as("v"))
      .collect().map(_.getLong(0)).sorted
    val n = cents.length.toLong
    var prevLo = -1L
    rows.foreach { r =>
      val pct = r.getAs[Long]("pct")
      val lo = r.getAs[Long]("lo_bound"); val hi = r.getAs[Long]("hi_bound")
      assert(lo >= prevLo, "bucket lower bounds must be monotone in pct")
      prevLo = lo
      // True order statistic at the same integer rank rule cum·100 ≥ pct·n.
      val rank = ((pct * n + 99) / 100).toInt // ceil(pct·n/100)
      val truth = cents(rank - 1)
      assert(truth >= lo && truth <= hi,
        s"p$pct: true order stat $truth outside bucket [$lo, $hi]")
      // ≤ 16 sub-buckets per octave ⇒ ≤ 2^(e-5) wide ⇒ ≤ ~3.2% of lo.
      assert(hi - lo + 1 <= math.max(lo / 16, 1),
        s"p$pct: bucket width ${hi - lo + 1} exceeds the 5-bit bound")
    }
  }

  test("q134 indexed BM25 returns exactly q126's scan-side result") {
    // Same scores by construction (shared contribution helper) — but
    // this asserts the INDEX path end-to-end: build, bucket-pruned
    // fetch, postings-derived df. Any drift between the stored
    // postings and a fresh tokenization breaks this, not just the
    // oracle.
    val scan = run("q126_bm25").collect().toSeq
    val indexed = run("q134_bm25_indexed").collect().toSeq
    assert(indexed == scan)
  }

  test("q211 delta postings: top token's encoding reconstructs from a direct recount") {
    val rows = run("q211_postings_delta").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs"); val blocks = r.getAs[Long]("n_blocks")
      val delta = r.getAs[Long]("delta_bits"); val raw = r.getAs[Long]("raw_bits")
      assert(raw == n * 64 && blocks >= 1L && blocks <= n)
      assert(delta >= n, "every posting costs at least one bit")
      assert(delta < raw, "gap encoding must beat raw 64-bit ids")
      val pct = r.getAs[Int]("pct_saved")
      assert(pct.toLong == (raw - delta) * 100 / raw && pct >= 0 && pct < 100)
    }
    // independent scala-side recount of the highest-df token's blocks
    val top = rows.head
    val tok = top.getAs[String]("token")
    val ids = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(graft.ops.Text.tokens(col("text"))).as("t"))
      .filter(col("t") === tok).select("doc_id").distinct()
      .collect().map(_.getLong(0)).sorted
    assert(ids.length.toLong == top.getAs[Long]("n_docs"))
    val byBlock = ids.groupBy(_ / 4096)
    val bits = byBlock.values.map { blk =>
      val b = blk.sorted
      val gaps = b.head +: b.sliding(2).collect { case Array(x, y) => y - x }.toSeq
      gaps.map(g => java.lang.Long.toBinaryString(g).length.toLong).sum
    }.sum
    assert(top.getAs[Long]("delta_bits") == bits)
    assert(top.getAs[Long]("n_blocks") == byBlock.size.toLong)
  }

  test("q231 PSI: bins partition the stream, terms nonnegative, no false drift alarm") {
    val rows = run("q231_psi_drift").collect()
    assert(rows.map(_.getAs[Long]("bin")).sorted.sameElements(0L to 9L))
    val nEvents = graft.sources.Tables.events(spark, sfDir).count()
    assert(rows.map(r => r.getAs[Long]("c_base") + r.getAs[Long]("c_curr")).sum
      == nEvents)
    // every PSI term is (p-q)·ln(p/q) ≥ 0 by construction
    rows.foreach(r => assert(r.getAs[Long]("term9") >= 0L))
    // the stream is stationary: total PSI must sit far below the 0.1
    // "investigate" threshold — a false alarm here means the binning
    // or smoothing is broken
    assert(rows.map(_.getAs[Long]("term9")).sum < 100000000L)
  }

  test("q227 Benford: digit table partitions the orders count with nonnegative terms") {
    val rows = run("q227_benford_audit").collect()
    assert(rows.map(_.getAs[Long]("digit")).sorted.sameElements(1L to 9L))
    val nOrders = graft.sources.Tables.orders(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("observed")).sum == nOrders,
      "observed digit counts must partition the table")
    rows.foreach { r =>
      assert(r.getAs[Long]("term9") >= 0L)
      assert(r.getAs[Long]("e9") > 0L)
    }
  }

  test("q224 incremental agg: the merged state equals a direct recompute") {
    // the oracle proves this against DuckDB; the spec proves it against
    // Spark's own one-pass aggregate (merge law, same engine)
    val merged = run("q224_incremental_agg")
    val direct = graft.sources.Tables.orders(spark, sfDir)
      .groupBy("o_custkey")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_orders"))
    assert(merged.count() == direct.count())
    val j = merged.join(direct.withColumnRenamed("n_orders", "dn"), "o_custkey")
    assert(j.filter(col("n_orders") =!= col("dn")).count() == 0,
      "merged per-key counts diverge from the one-pass recompute")
  }

  test("q225 z-order: both layouts see every matching row; z prunes at least as well") {
    val rows = run("q225_zorder_audit").collect()
      .map(r => r.getAs[String]("layout") -> r).toMap
    val z = rows("zorder"); val lin = rows("linear")
    // same predicate, same data: matching rows identical
    assert(z.getAs[Long]("rows_matching") == lin.getAs[Long]("rows_matching"))
    // no false negatives: a scanned superset must cover the matches
    assert(z.getAs[Long]("rows_scanned") >= z.getAs[Long]("rows_matching"))
    assert(lin.getAs[Long]("rows_scanned") >= lin.getAs[Long]("rows_matching"))
    assert(z.getAs[Long]("n_files") == lin.getAs[Long]("n_files"))
    // the point of the layout: the interleaved key prunes no worse
    // (strictly better on this 2-D box at every tested SF)
    assert(z.getAs[Long]("files_scanned") <= lin.getAs[Long]("files_scanned"),
      "z-order scanned more files than the linear layout")
  }

  test("q217 CDC fold: counts reconcile with an aggregate-shaped independent replay") {
    val r = run("q217_cdc_fold").collect().head
    // re-derive the latest op per key with max(struct(...)) — a
    // different plan shape (aggregate argmax vs ranking window) over
    // the same replay order, so a window/tie-break defect can't agree
    val opHex = substring(md5(concat(lit("op:"),
      col("event_id").cast("string"))), 1, 1)
    val last = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"),
        when(opHex < "2", "D").when(opHex < "7", "I").otherwise("U").as("op"))
      .groupBy("user_id")
      .agg(max(struct(col("ts"), col("event_id"), col("op"))).as("m"))
      .select(col("user_id"), col("m.op").as("op"))
    assert(r.getAs[Long]("n_keys") == last.count())
    assert(r.getAs[Long]("n_alive") == last.filter(col("op") =!= "D").count())
    assert(r.getAs[Long]("n_alive") + r.getAs[Long]("n_tombstoned") ==
      r.getAs[Long]("n_keys"))
    assert(r.getAs[Long]("alive_cents") > 0L)
  }

  test("sessionization respects the 30-minute gap invariant") {
    // Within a session, consecutive events gap <= 30 min; the first
    // event of session k+1 comes > 30 min after the LAST event of
    // session k. Recheck from raw events against q130's output.
    val sessions = run("q130_sessionize")
    // s_start of next session > s_end of previous + 30 min, per user.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("session_idx")
    val bad = sessions
      .withColumn("prev_end", lag("s_end", 1).over(w))
      .filter(col("prev_end").isNotNull &&
        col("s_start") <= col("prev_end") + expr("INTERVAL 30 MINUTES"))
      .count()
    assert(bad == 0L, s"$bad session starts within 30 min of the previous session's end")

    // Sessions partition the events exactly: per-user event counts match.
    val fromSessions = sessions.groupBy("user_id")
      .agg(sum("n_events").as("n")).orderBy("user_id").collect().toSeq
    val fromRaw = graft.sources.Tables.events(spark, sfDir)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .orderBy("user_id").collect().toSeq
    assert(fromSessions == fromRaw)
  }

  test("temperature sampler is deterministic and lands near its budget") {
    val a = run("q135_temperature_sample").collect().toSeq
    val b = run("q135_temperature_sample").collect().toSeq
    assert(a == b, "hash-acceptance sampling must be rerun-stable")
    val kept = a.map(_.getAs[Long]("n_kept")).sum
    val target = a.map(_.getAs[Long]("n_target")).sum
    // Bernoulli acceptance: kept ~ Binomial(n, r); at 500 docs the
    // relative deviation stays well inside 25%.
    assert(kept > target * 0.75 && kept < target * 1.25,
      s"kept $kept vs target $target — acceptance hashing is off")
    for (r <- a)
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
  }

  test("z-order buckets bound BOTH dimensions (the clustering property)") {
    // 64 buckets over a 16-bit z fix the top 3 bits of each dimension:
    // every bucket's x-range and y-range is <= 31. A linear
    // (x-then-y) layout bounds only x; this is the property that lets
    // min/max stats prune scans on EITHER column.
    val rows = run("q136_zorder_layout").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (xr, yr) = (r.getAs[Long]("max_x") - r.getAs[Long]("min_x"),
        r.getAs[Long]("max_y") - r.getAs[Long]("min_y"))
      assert(xr <= 31 && yr <= 31,
        s"zbucket ${r.getAs[Long]("zbucket")} spans x=$xr y=$yr (> 31)")
    }
  }

  test("funnel stages are monotonically non-increasing") {
    val ns = run("q128_event_funnel").orderBy("stage")
      .collect().map(_.getAs[Long]("n_users")).toSeq
    assert(ns.size == 3 && ns == ns.sorted.reverse,
      s"funnel stage counts must not grow: $ns")
  }

  test("SCD2 intervals tile each user's timeline without overlap") {
    val iv = run("q131_scd2")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("valid_from")
    // Each interval closes exactly where the next opens; the last is
    // open (2200-01-01 sentinel — within pandas datetime64[ns] range,
    // unlike 9999-12-31, which the driver's hash path renders as NaT).
    val bad = iv.withColumn("next_from", lead("valid_from", 1).over(w))
      .filter(col("next_from").isNotNull && !(col("valid_to") === col("next_from")))
      .count()
    assert(bad == 0L, s"$bad SCD2 intervals do not close at the next open")
    val openPerUser = iv.filter(col("valid_to") === lit("2200-01-01 00:00:00").cast("timestamp"))
      .groupBy("user_id").count().filter(col("count") =!= 1).count()
    assert(openPerUser == 0L, "every user must have exactly one open interval")
  }

  test("q177 peak concurrency matches a local interval sweep") {
    // Re-derive the peak from q130's registered session intervals with
    // a plain in-memory sweep — independent of the two-phase
    // running-sum plan under test.
    val sess = run("q130_sessionize").collect().map(r =>
      (r.getAs[java.sql.Timestamp]("s_start").getTime,
        r.getAs[java.sql.Timestamp]("s_end").getTime))
    // starts before ends at equal time: inclusive-interval overlap
    val points = sess.flatMap { case (a, b) => Seq((a, 0, 1), (b, 1, -1)) }
      .sortBy(p => (p._1, p._2))
    val peaks = points.scanLeft(0) { case (acc, (_, _, d)) => acc + d }.tail
    val row = run("q177_peak_concurrency").collect().head
    assert(row.getAs[Long]("n_sessions") == sess.length.toLong)
    assert(row.getAs[Long]("peak") == peaks.max.toLong,
      s"engine peak ${row.getAs[Long]("peak")} vs local ${peaks.max}")
  }
}
