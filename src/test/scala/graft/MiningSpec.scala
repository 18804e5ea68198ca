package graft

import org.apache.spark.sql.functions._

/** Properties of the mining/statistics pack (queries/MiningQueries.scala)
  * the DuckDB oracle cannot state: brute-force re-derivations in local
  * Scala, algebraic invariants (row-stochasticity, partition-of-total,
  * bounds), and blocking-completeness for the fuzzy matcher.
  */
class MiningSpec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  test("q219 KS: D is a valid sup-distance and λ follows from it") {
    val r = run("q219_ks_test").collect().head
    val n1 = r.getAs[Long]("n1"); val n2 = r.getAs[Long]("n2")
    val d = r.getAs[Double]("d_stat")
    assert(n1 > 0 && n2 > 0)
    assert(d >= 0.0 && d <= 1.0, s"D = $d out of [0,1]")
    assert(r.getAs[Long]("d_num") == math.round(d * n1 * n2))
    val lam = r.getAs[Double]("ks_lambda")
    assert(lam >= 0.0 && lam.isFinite)
  }

  test("q220 Mann-Whitney: U within range, tie term positive, z finite") {
    val r = run("q220_mann_whitney").collect().head
    val na = r.getAs[Long]("n_a"); val nb = r.getAs[Long]("n_b")
    val u2 = r.getAs[Long]("u2")
    // doubled U ∈ [0, 2·na·nb]
    assert(u2 >= 0 && u2 <= 2 * na * nb)
    // 50 quantity levels share ~60k rows: ties are guaranteed
    assert(r.getAs[Double]("tie_term") > 0.0)
    assert(r.getAs[Double]("z").isFinite)
  }

  test("q282 Kruskal-Wallis: totals partition the fact, H >= 0, ties raise H") {
    val r = run("q282_kruskal_wallis").collect().head
    val n = graft.sources.Tables.lineitem(spark, sfDir).count()
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_n") + r.getAs[Long]("n_r") == n)
    val h9 = r.getAs[Long]("h9"); val hc9 = r.getAs[Long]("hc9")
    assert(h9 >= 0L, s"H = $h9 negative")
    // C = 1 − Σ(t³−t)/(N³−N) < 1 with 50 levels over ~n rows, so the
    // tie-corrected statistic strictly dominates the raw one.
    assert(hc9 >= h9, s"tie correction lowered H: $hc9 < $h9")
  }

  test("q283 ANOVA F: matches a brute-force per-group recomputation") {
    val r = run("q283_anova_f").collect().head
    val o = graft.sources.Tables.orders(spark, sfDir)
      .select(col("o_orderpriority").as("g"),
        graft.functions.Exact.cents(col("o_totalprice")).as("x"))
      .collect().map(row => (row.getString(0), row.getLong(1)))
    val groups = o.groupBy(_._1).map { case (_, xs) => xs.map(_._2.toDouble) }
    val n = o.length.toDouble
    val mean = o.map(_._2.toDouble).sum / n
    val ssb = groups.map(g => g.length * math.pow(g.sum / g.length - mean, 2)).sum
    val ssw = groups.map(g => { val m = g.sum / g.length; g.map(x => math.pow(x - m, 2)).sum }).sum
    val f = (ssb / 4.0) / (ssw / (n - 5.0))
    assert(r.getAs[Long]("n") == o.length)
    val fQ = r.getAs[Long]("f9") / 1e9
    assert(math.abs(fQ - f) <= 1e-4 * math.max(1.0, math.abs(f)),
      s"engine F $fQ vs brute-force $f")
  }

  test("q285 HITS: 15 per side, normalized units, descending within side") {
    val rows = run("q285_hits").collect()
    val bySide = rows.groupBy(_.getAs[String]("side"))
    assert(bySide.keySet == Set("auth", "hub"))
    bySide.foreach { case (side, rs) =>
      assert(rs.length == 15, s"$side has ${rs.length} rows")
      val scores = rs.map(_.getAs[Long]("s9"))
      assert(scores.forall(v => v > 0L && v <= 1000000000L),
        s"$side scores outside (0, 1e9]: ${scores.mkString(",")}")
      // L1 normalization: the top-15 slice can't exceed the whole mass.
      assert(scores.sum <= 1000000000L)
    }
  }

  test("q286 BOM rollup matches a local recursive climb") {
    val parts = graft.sources.Tables.part(spark, sfDir)
      .select("p_partkey").collect().map(_.getLong(0))
    val present = parts.toSet
    // Local one-step recursion with the engine's root semantics: the
    // climb only continues through ancestors that EXIST as parts — a
    // gap in the keyspace is a root (review-pinned contract).
    val climbed = parts.filter(_ >= 10L).map { p =>
      var cur = p; var q = 1L; var d = 0L
      var continue = true
      while (continue) {
        q *= (cur % 5) + 1; cur /= 10; d += 1
        continue = cur >= 10L && present.contains(cur)
      }
      (cur, q, d)
    }
    val expect = climbed.groupBy(_._1).map { case (root, xs) =>
      root -> (xs.length.toLong, xs.map(_._2).sum, xs.map(_._3).max)
    }
    val rows = run("q286_bom_rollup").collect()
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val (n, usage, depth) = expect(r.getAs[Long]("root"))
      assert(r.getAs[Long]("n_desc") == n)
      assert(r.getAs[Long]("total_usage") == usage)
      assert(r.getAs[Long]("max_depth") == depth)
    }
  }

  test("q293 lagged xcorr: 15 lags, overlap shrinks with |lag|, corr bounded") {
    val rows = run("q293_lagged_xcorr").collect()
      .map(r => (r.getAs[Int]("lag"), r.getAs[Long]("n_days"),
        r.getAs[Long]("corr9"))).sortBy(_._1)
    assert(rows.length == 15)
    val n0 = rows.find(_._1 == 0).get._2
    rows.foreach { case (lag, n, c9) =>
      assert(n == n0 - math.abs(lag), s"lag $lag overlap $n != ${n0 - math.abs(lag)}")
      assert(math.abs(c9) <= 1000000000L, s"lag $lag corr out of [-1,1]")
    }
  }

  test("q294 Kendall tau-b matches a local contingency recount") {
    val r = run("q294_kendall_tau").collect().head
    val cells = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_quantity").cast("long"),
        graft.functions.Exact.cents(col("l_discount")))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
    var conc = BigInt(0); var disc = BigInt(0)
    for (((q1, d1), c1) <- cells; ((q2, d2), c2) <- cells
         if q1 < q2 || (q1 == q2 && d1 < d2)) {
      if (q1 < q2 && d1 < d2) conc += BigInt(c1) * c2
      else if (q1 < q2 && d1 > d2) disc += BigInt(c1) * c2
    }
    assert(BigInt(r.getAs[Double]("conc").toLong) == conc)
    assert(BigInt(r.getAs[Double]("disc").toLong) == disc)
    assert(math.abs(r.getAs[Long]("tau9")) <= 1000000000L)
  }

  test("q295 Pettitt: K matches a local U-statistic scan, reject consistent") {
    val r = run("q295_pettitt").collect().head
    val daily = graft.sources.Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum(floor(col("value") * lit(1e4) + lit(0.5)).cast("long")).as("x"))
      .collect().map(x => (x.getDate(0).toLocalDate, x.getLong(1)))
      .sortBy(_._1.toEpochDay)
    val xs = daily.map(_._2)
    val us = (1 until xs.length).map { t =>
      var u = 0L
      for (i <- 0 until t; j <- t until xs.length)
        u += java.lang.Long.signum(xs(j) - xs(i))
      (daily(t - 1)._1, math.abs(u))
    }
    val k = us.map(_._2).max
    assert(r.getAs[Long]("k") == k, s"engine K ${r.getAs[Long]("k")} vs local $k")
    val cp = us.filter(_._2 == k).minBy(_._1.toEpochDay)._1
    assert(r.getAs[java.sql.Date]("cp_day").toLocalDate == cp)
    assert((r.getAs[Long]("p9") <= 50000000L) == (r.getAs[Int]("reject") == 1))
  }

  test("q299 BH-FDR: p-values valid, step-up set is a prefix of the ranking") {
    val rows = run("q299_bh_fdr").collect().sortBy(_.getAs[Long]("rank"))
    assert(rows.length == 25)
    rows.foreach { r =>
      val p9 = r.getAs[Long]("p9")
      assert(p9 >= 0L && p9 <= 2000000000L, s"p out of [0,2]: $p9")
    }
    val ps = rows.map(_.getAs[Long]("p9"))
    assert(ps.zip(ps.tail).forall { case (a, b) => a <= b }, "rank not by p")
    // Discoveries must be exactly ranks 1..k* — a prefix.
    val disc = rows.map(_.getAs[Int]("discovered"))
    assert(disc.zip(disc.tail).forall { case (a, b) => a >= b },
      "discovered set is not a rank prefix")
    // Every discovery satisfies its own BH bound.
    rows.filter(_.getAs[Int]("discovered") == 1).foreach { r =>
      assert(r.getAs[Long]("p9") * 25 <= r.getAs[Long]("rank") * 50000000L)
    }
  }

  test("q300 conformal: splits partition orders, coverage near target") {
    val r = run("q300_conformal").collect().head
    val nOrders = graft.sources.Tables.orders(spark, sfDir)
      .join(graft.sources.Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey")).distinct(),
        col("o_orderkey") === col("l_orderkey")).count()
    assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_cal") +
      r.getAs[Long]("n_test") == nOrders)
    // The conformal guarantee: coverage ≥ 1−α in expectation; allow the
    // finite-sample wobble band.
    val cov = r.getAs[Long]("cov9") / 1e9
    assert(cov >= 0.87 && cov <= 0.95, s"coverage $cov far from 0.9")
    assert(r.getAs[Long]("qhat_cents") > 0L)
  }

  test("q301 info gain: IG non-negative and rank consistent") {
    val rows = run("q301_info_gain").collect().sortBy(_.getAs[Long]("rank"))
    assert(rows.length == 4)
    val igs = rows.map(_.getAs[Long]("ig9"))
    assert(igs.zip(igs.tail).forall { case (a, b) => a >= b }, "not ranked by IG")
    // H(L) − H(L|F) ≥ 0 up to the per-cell quantization (±1 unit/cell,
    // ≤ 36 cells + 3 label cells).
    igs.foreach(ig => assert(ig >= -64L, s"IG meaningfully negative: $ig"))
    // All branches share the same label entropy.
    assert(rows.map(_.getAs[Long]("hl9")).distinct.length == 1)
  }

  test("q255 RFM: quintiles partition customers into near-equal fifths") {
    val rows = run("q255_rfm_segments").collect()
    val n = graft.sources.Tables.orders(spark, sfDir)
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == n,
      "segments must partition the customer population")
    for (dim <- Seq("r", "f", "m")) {
      val marg = rows.groupBy(_.getAs[Long](dim)).view
        .mapValues(_.map(_.getAs[Long]("n_customers")).sum).toMap
      assert(marg.keySet.subsetOf(Set(1L, 2L, 3L, 4L, 5L)))
      // The integer rule yields fifths of size floor/ceil(n/5).
      marg.values.foreach(sz =>
        assert(sz == n / 5 || sz == n / 5 + 1,
          s"$dim quintile size $sz not a fifth of $n"))
    }
  }

  test("q256 seasonal-naive backtest matches a local error recount") {
    val r = run("q256_snaive_backtest").collect().head
    val daily = graft.sources.Tables.events(spark, sfDir)
      .select(datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
          .cast("long").as("x"),
        floor(col("value") * 100 + 0.5).cast("long").as("c"))
      .groupBy("x").agg(sum("c").as("y"))
      .collect().map(row => row.getAs[Long]("x") -> row.getAs[Long]("y"))
      .sortBy(_._1)
    val series = daily.toMap
    val evals = daily.filter { case (x, _) => series.contains(x - 7) }
      .map { case (x, y) => (math.abs(y - series(x - 7)), y) }
    assert(r.getAs[Long]("n_eval") == evals.length.toLong)
    assert(r.getAs[Long]("ae_sum") == evals.map(_._1).sum)
    assert(r.getAs[Double]("mae") ==
      evals.map(_._1).sum.toDouble / evals.length)
  }

  test("q262 Mann-Kendall matches a local recount and agrees in sign with Theil-Sen") {
    val r = run("q262_mann_kendall").collect().head
    val daily = graft.sources.Tables.events(spark, sfDir)
      .select(datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
          .cast("long").as("x"),
        floor(col("value") * 100 + 0.5).cast("long").as("c"))
      .groupBy("x").agg(sum("c").as("y"))
      .collect().map(row => (row.getAs[Long]("x"), row.getAs[Long]("y")))
      .sortBy(_._1)
    val sLocal = (for {
      (a, ia) <- daily.zipWithIndex; b <- daily.drop(ia + 1)
    } yield math.signum((b._2 - a._2).toDouble).toLong).sum
    assert(r.getAs[Long]("s") == sLocal)
    val n = daily.length.toLong
    val ties = daily.groupBy(_._2).map(_._2.size.toLong)
      .map(t => t * (t - 1) * (2 * t + 5)).sum
    assert(r.getAs[Long]("n") == n && r.getAs[Long]("tie_term") == ties)
    val varS = (n * (n - 1) * (2 * n + 5) - ties).toDouble / 18.0
    val zLocal =
      if (sLocal > 0) (sLocal - 1).toDouble / math.sqrt(varS)
      else if (sLocal < 0) (sLocal + 1).toDouble / math.sqrt(varS)
      else 0.0
    assert(r.getAs[Double]("z") == zLocal)
    // MK direction must agree with the Theil-Sen slope sign when the
    // trend is nonzero.
    val ts = run("q249_theil_sen").collect().head.getAs[Double]("ts_slope")
    if (sLocal != 0) assert(math.signum(ts) == math.signum(sLocal.toDouble)
      || ts == 0.0)
  }

  test("q249 Theil-Sen slope matches a local all-pairs median recount") {
    val r = run("q249_theil_sen").collect().head
    val daily = graft.sources.Tables.events(spark, sfDir)
      .select(datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
          .cast("long").as("x"),
        floor(col("value") * 100 + 0.5).cast("long").as("c"))
      .groupBy("x").agg(sum("c").as("y"))
      .collect().map(row => (row.getAs[Long]("x"), row.getAs[Long]("y")))
      .sortBy(_._1)
    val slopes = (for {
      (a, ia) <- daily.zipWithIndex; (b, ib) <- daily.zipWithIndex
      if a._1 < b._1
    } yield ((b._2 - a._2).toDouble / (b._1 - a._1), a._1, b._1))
      .sortBy(s => (s._1, s._2, s._3)).map(_._1)
    val n = slopes.length
    assert(r.getAs[Long]("n_pairs") == n.toLong)
    val mids = Seq(slopes((n + 1) / 2 - 1), slopes((n + 2) / 2 - 1))
    val expected = mids.sum / mids.length.toDouble
    assert(r.getAs[Double]("ts_slope") == expected,
      s"slope ${r.getAs[Double]("ts_slope")} != local $expected")
  }

  test("q250 STL-lite components reconstruct the series exactly") {
    val rows = run("q250_stl_lite").collect()
    assert(rows.nonEmpty)
    val daily = graft.sources.Tables.events(spark, sfDir)
      .select(datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
          .cast("long").as("x"),
        floor(col("value") * 100 + 0.5).cast("long").as("c"))
      .groupBy("x").agg(sum("c").as("y"))
      .collect().map(row => row.getAs[Long]("x") -> row.getAs[Long]("y")).toMap
    rows.foreach { r =>
      val x = r.getAs[Long]("x")
      // The decomposition identity: y·1000 = trend + seasonal + residual.
      assert(r.getAs[Long]("t3") + r.getAs[Long]("s3") +
        r.getAs[Long]("resid3") == daily(x) * 1000L,
        s"day $x: components do not reconstruct the series")
      // Trend stays inside the series envelope (it is a mean).
      assert(r.getAs[Long]("t3") >= daily.values.min * 1000L &&
        r.getAs[Long]("t3") <= daily.values.max * 1000L)
    }
  }

  test("q251 ABC classes conserve revenue and respect the share thresholds") {
    val rows = run("q251_abc_classification").collect()
    assert(rows.map(_.getAs[String]("abc_class")).toSeq == Seq("A", "B", "C"))
    val rev = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("c"))
      .groupBy("l_partkey").agg(sum("c").as("rev"))
      .collect().map(_.getAs[Long]("rev"))
    val total = rev.sum
    val maxPart = rev.max
    assert(rows.map(_.getAs[Long]("class_rev")).sum == total,
      "classes must conserve total revenue")
    assert(rows.map(_.getAs[Long]("n_parts")).sum == rev.length.toLong)
    val aRev = rows(0).getAs[Long]("class_rev")
    // A closes within one part of the 80 % boundary (inclusive rule).
    assert(BigInt(aRev) * 100 <= BigInt(total) * 80 + BigInt(maxPart) * 100,
      "A exceeds the 80 % boundary by more than one part")
    assert(BigInt(aRev + rows(1).getAs[Long]("class_rev")) * 100 <=
      BigInt(total) * 95 + BigInt(maxPart) * 100)
  }

  test("q248 link prediction: pairs are non-edges with bounded AA evidence") {
    val rows = run("q248_link_prediction").collect()
    assert(rows.length == 20)
    val edges = graft.queries.MiningQueries.copurchaseEdgesForSpec(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"))).toSet
    val termMin = math.floor(1e9 / math.log(50.0) + 0.5).toLong
    val termMax = math.floor(1e9 / math.log(2.0) + 0.5).toLong
    var prev = Long.MaxValue
    rows.foreach { r =>
      val x = r.getAs[Long]("x"); val y = r.getAs[Long]("y")
      val cn = r.getAs[Long]("cn"); val aa = r.getAs[Long]("aa9")
      assert(x < y, "pair ordering contract")
      assert(!edges.contains((x, y)), s"($x,$y) is an existing edge")
      assert(cn >= 1L)
      assert(aa >= cn * termMin && aa <= cn * termMax,
        s"($x,$y): aa9 $aa outside [$cn*$termMin, $cn*$termMax]")
      assert(aa <= prev, "output must be ranked by aa9 desc")
      prev = aa
    }
  }

  test("q245 grouped OLS matches a local exact-moment recount per group") {
    val rows = run("q245_grouped_trend").collect()
    assert(rows.length >= 2)
    val daily = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_type").as("t"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
          .cast("long").as("x"),
        floor(col("value") * 100 + 0.5).cast("long").as("c"))
      .groupBy("t", "x").agg(sum("c").as("y"))
      .collect().map(r => (r.getAs[String]("t"), r.getAs[Long]("x"),
        r.getAs[Long]("y")))
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val pts = daily.filter(_._1 == t)
      val n = pts.length.toLong
      val sx = pts.map(_._2).sum; val sy = pts.map(_._3).sum
      val sxy = pts.map(p => BigInt(p._2) * p._3).sum
      val sxx = pts.map(p => BigInt(p._2) * p._2).sum
      val slope = (BigInt(n) * sxy - BigInt(sx) * BigInt(sy)).toDouble /
        (BigInt(n) * sxx - BigInt(sx) * BigInt(sx)).toDouble
      val intercept = (sy.toDouble - slope * sx.toDouble) / n.toDouble
      assert(r.getAs[Long]("n_days") == n)
      assert(r.getAs[Double]("slope") == slope, s"$t slope drifted")
      assert(r.getAs[Double]("intercept") == intercept, s"$t intercept drifted")
    }
  }

  test("q239 quantile normalization: monotone, support-preserving, ECDF-matching") {
    val rows = run("q239_quantile_normalize").collect()
    assert(rows.nonEmpty)
    val pooled = graft.sources.Tables.events(spark, sfDir)
      .select(floor(col("value") * 100 + 0.5).cast("long").as("v"))
      .collect().map(_.getLong(0)).sorted
    val support = pooled.toSet
    val np = pooled.length.toLong
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (t, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("v"))
      // Monotone map into the pooled support, topping out at the max.
      var prev = Long.MinValue
      var cum = 0L
      val nt = rs.map(_.getAs[Long]("cnt")).sum
      sorted.foreach { r =>
        val nv = r.getAs[Long]("norm_v")
        assert(nv >= prev, s"$t: normalization not monotone")
        prev = nv
        assert(support.contains(nv), s"$t: $nv not in pooled support")
        // The defining property: norm_v is the pooled order statistic
        // at this row's within-type quantile — smallest pooled w with
        // pcum·nt ≥ cum·np, recounted from the raw pooled sample.
        cum += r.getAs[Long]("cnt")
        val rank = ((BigInt(cum) * np + nt - 1) / nt).toInt // ceil
        assert(nv == pooled(rank - 1),
          s"$t v=${r.getAs[Long]("v")}: norm $nv != pooled stat ${pooled(rank - 1)}")
      }
      assert(sorted.last.getAs[Long]("norm_v") == pooled.last,
        s"$t: max value must map to the pooled max")
    }
  }

  test("q233 ACF matches a local brute-force recount and is Cauchy-Schwarz bounded") {
    val rows = run("q233_acf").collect()
    assert(rows.length == 7)
    // Local recount from the raw events.
    val daily = graft.sources.Tables.events(spark, sfDir)
      .select(datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
          .as("d"),
        floor(col("value") * 100 + 0.5).cast("long").as("c"))
      .groupBy("d").agg(sum("c").as("x"))
      .collect().map(r => r.getAs[Int]("d") -> r.getAs[Long]("x"))
      .sortBy(_._1)
    val n = daily.length
    val sx = daily.map(_._2).sum
    val y = daily.map { case (d, x) => d -> (BigInt(n) * x - sx) }.toMap
    val den = y.values.map(v => v * v).sum
    rows.foreach { r =>
      val k = r.getAs[Long]("lag").toInt
      val num = y.collect { case (d, v) if y.contains(d + k) => v * y(d + k) }.sum
      val expected = num.toDouble / den.toDouble
      val got = r.getAs[Double]("acf")
      assert(got == expected, s"lag $k: $got != local $expected")
      assert(math.abs(got) <= 1.0, s"lag $k: |acf| > 1")
    }
  }

  test("q234 CUSUM telescopes to zero at the last day and flags exactly one peak") {
    val rows = run("q234_cusum_changepoint").collect()
    assert(rows.nonEmpty)
    // S_n = Σ(x_i − x̄) over the whole series is identically zero.
    assert(rows.last.getAs[Double]("cusum") == 0.0,
      s"final CUSUM ${rows.last.getAs[Double]("cusum")} != 0")
    assert(rows.map(_.getAs[Long]("is_peak")).sum == 1L,
      "peak flag must mark exactly one day")
    val peakAbs = rows.filter(_.getAs[Long]("is_peak") == 1L)
      .head.getAs[Double]("cusum").abs
    assert(rows.forall(r => r.getAs[Double]("cusum").abs <= peakAbs),
      "flagged peak is not the max |CUSUM|")
  }

  test("q221 Spearman: chars-vs-tokens correlation is strongly positive and ≤ 1") {
    val r = run("q221_spearman").collect().head
    val rho = r.getAs[Double]("rho")
    // longer documents have more tokens by construction; midrank
    // Pearson must see it
    assert(rho > 0.5 && rho <= 1.0, s"rho = $rho")
  }

  test("q222 Bradley-Terry: strengths renormalized and ordered by the planted ladder") {
    val rows = run("q222_bradley_terry").collect()
    assert(rows.length == 5)
    val s = rows.map(r => r.getAs[String]("player") -> r.getAs[Long]("strength6")).toMap
    // renormalization: Σs = 5e6 up to per-player half-up rounding
    val tot = s.values.sum
    assert(math.abs(tot - 5000000L) <= 5, s"sum of strengths $tot drifted")
    // the win threshold plants strength DESCENDING in alphabetical
    // rank (click beats everyone most often)
    val ladder = rows.sortBy(_.getAs[String]("player")).map(_.getAs[Long]("strength6"))
    assert(ladder.sameElements(ladder.sortBy(-_)),
      s"strengths ${ladder.mkString(",")} not monotone in the planted ladder")
    // every player plays and wins at least once (connected MM)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_games") > 0 && r.getAs[Long]("n_wins") > 0)
    }
  }

  test("q228 median-of-means: 32 buckets, estimate brackets the plain mean on a clean fixture") {
    val r = run("q228_median_of_means").collect().head
    assert(r.getAs[Long]("n_groups") == 32L)
    val mom = r.getAs[Double]("median_of_means")
    val mean = r.getAs[Double]("overall_mean")
    assert(mom > 0 && mean > 0)
    // outlier-free fixture: the two robust/plain centers agree within
    // a few percent (bucket SE, not a fixed constant)
    assert(math.abs(mom - mean) / mean < 0.05,
      s"median-of-means $mom far from plain mean $mean on clean data")
  }

  test("q212 bootstrap: point mean recounts exactly; CI brackets it with positive width") {
    val r = run("q212_bootstrap_ci").collect().head
    assert(r.getAs[Long]("n_resamples") == 100L)
    val point = r.getAs[Double]("point_mean")
    val lo = r.getAs[Double]("ci_lo"); val hi = r.getAs[Double]("ci_hi")
    // the b = -1 identity sample must equal a direct unweighted mean
    val agg = graft.sources.Tables.orders(spark, sfDir)
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("s"),
        count(lit(1)).as("n")).collect().head
    val direct = agg.getAs[Long]("s").toDouble / agg.getAs[Long]("n") / 100.0
    assert(point == direct, "identity-sample sentinel diverged from the plain mean")
    // the bootstrap distribution of the mean is centered on the point
    // estimate; the 95% band must bracket it with nonzero width well
    // under the estimate itself (SE ≈ sd/√n)
    assert(lo < point && point < hi, s"CI [$lo, $hi] must bracket $point")
    assert(hi - lo > 0.0 && hi - lo < point)
  }

  test("q139 basket pair support matches a brute-force recount") {
    // Recompute pair supports by materializing baskets locally —
    // independent of the join-based generator's plan.
    val items = graft.sources.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = items.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size)
      .filter(_._2 >= 3).toMap
    val got = run("q139_basket_pairs").collect()
      .map(r => ((r.getAs[Long]("part1"), r.getAs[Long]("part2")),
        r.getAs[Long]("support"))).toMap
    // q139 truncates at 100 rows; every returned pair must carry the
    // brute-force support, and no qualifying pair may be missing when
    // fewer than 100 qualify.
    got.foreach { case (k, sup) => assert(brute(k) == sup, s"support mismatch at $k") }
    if (got.size < 100) assert(got.keySet == brute.keySet)
  }

  test("q143 two-step transition matrix rows sum to ~1") {
    // Each P row sums to 1e9 within |row| half-up quanta, so each P²
    // row sums to 1e18 within ~|states|·1e9·quanta — far below 1e12.
    val rows = run("q143_markov_transitions").collect()
    val sums = rows.groupBy(_.getAs[String]("a"))
      .view.mapValues(_.map(_.getAs[Long]("p2_18")).sum)
    sums.foreach { case (a, s) =>
      assert(math.abs(s - 1000000000000000000L) < 1000000000000L,
        s"row $a of P^2 sums to $s, not ~1e18")
    }
  }

  test("q144 outliers match a brute-force z-score recount") {
    val counts = graft.sources.Tables.events(spark, sfDir)
      .groupBy("event_type", "user_id").agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val brute = counts.groupBy(_._1).toSeq.flatMap { case (et, xs) =>
      val n = xs.length.toDouble
      val sx = xs.map(_._3).sum
      val qx = xs.map(v => v._3 * v._3).sum
      xs.flatMap { case (_, uid, x) =>
        val z = (n * x - sx) / math.sqrt(n * qx - sx.toDouble * sx)
        val z9 = math.floor(z * 1e9 + 0.5).toLong
        if (math.abs(z9) > 2500000000L) Some((et, uid, x, z9)) else None
      }
    }.toSet
    val got = run("q144_zscore_outliers").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("user_id"),
        r.getAs[Long]("x"), r.getAs[Long]("z9"))).toSet
    assert(got == brute)
  }

  test("q145 histogram partitions the orders table exactly") {
    val hist = run("q145_price_histogram").collect()
    val bins = hist.map(_.getAs[Long]("bin"))
    assert(bins.forall(b => b >= 0 && b <= 15), "bin out of range")
    val total = hist.map(_.getAs[Long]("n")).sum
    val orders = graft.sources.Tables.orders(spark, sfDir).count()
    assert(total == orders, s"histogram covers $total of $orders orders")
  }

  test("q142 first-char blocking loses no qualifying pair") {
    // Levenshtein <= 4 on these names never crosses a first-character
    // block... unless it substitutes the first char. Verify against an
    // UNBLOCKED brute force so the blocking assumption itself is under
    // test, not assumed.
    val names = graft.sources.Tables.part(spark, sfDir)
      .select("p_name").distinct().collect().map(_.getString(0)).sorted
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = d(0); d(0) = j
        for (i <- 1 to a.length) {
          val t = d(i)
          d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      d(a.length)
    }
    val brute = (for {
      i <- names.indices; j <- (i + 1) until names.length
      if names(i)(0) == names(j)(0) && lev(names(i), names(j)) <= 4
    } yield (names(i), names(j))).toSet
    val got = run("q142_fuzzy_name_pairs").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == brute)
  }

  test("q148 TWAP stays inside each user's value envelope") {
    // A time-weighted average can never leave [min, max] of the values
    // it averages (weights are non-negative); quantization shifts it by
    // at most one 1e-9 unit.
    val vals = graft.sources.Tables.events(spark, sfDir)
      .groupBy("user_id").agg(
        min(floor(col("value") * lit(1e4) + lit(0.5)).cast("long")).as("lo4"),
        max(floor(col("value") * lit(1e4) + lit(0.5)).cast("long")).as("hi4"))
    val joined = run("q148_twap").join(vals, "user_id")
      .filter(col("twap9") < col("lo4") * lit(100000L) - lit(1) ||
        col("twap9") > col("hi4") * lit(100000L) + lit(1))
      .count()
    assert(joined == 0L, s"$joined users with TWAP outside the value envelope")
  }

  test("q149 prefix filter loses no qualifying pair (vs local brute force)") {
    // Independent ground truth: rebuild the fixture's shingle sets
    // locally and enumerate ALL pairs — the completeness guarantee is
    // the whole point of the prefix filter, so test it against an
    // oracle that never saw the candidate join.
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 200).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def shingles(text: String): Set[String] = {
      val t = text.split(" ").filter(_.nonEmpty)
      (0 to t.length - 3).map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}").toSet
    }
    val corpus = docs.map { case (id, t) => (id, shingles(t)) } ++
      docs.map { case (id, t) =>
        (id + 100000, shingles(t.split(" ").filter(_.nonEmpty).drop(1).mkString(" ")))
      }
    val brute = (for {
      i <- corpus.indices; j <- corpus.indices
      if corpus(i)._1 < corpus(j)._1
      un = (corpus(i)._2 ++ corpus(j)._2).size if un > 0
      in = (corpus(i)._2 & corpus(j)._2).size
      if in.toDouble / un >= 0.8
    } yield (corpus(i)._1, corpus(j)._1)).toSet
    val got = run("q149_prefix_setjoin").collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(got == brute,
      s"missing=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
  }

  test("q152 weighted sample is rerun-stable with ascending keys") {
    val a = run("q152_weighted_sample").collect().toSeq
    val b = run("q152_weighted_sample").collect().toSeq
    assert(a == b, "hash-keyed sampling must be deterministic")
    val keys = a.map(_.getAs[Long]("key15"))
    assert(keys == keys.sorted, "top-k must come back in key order")
    assert(a.map(_.getAs[Long]("doc_id")).distinct.size == a.size)
  }

  test("q153 chi-square matches a local recount within quantization slack") {
    val row = run("q153_chi_square").collect().head
    val cells = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_type"), (unix_date(col("ts").cast("date")) % 7).as("dow"))
      .groupBy("event_type", "dow").agg(count(lit(1)).as("o"))
      .collect().map(r => ((r.getString(0), r.getInt(1)), r.getLong(2))).toMap
    val types = cells.keys.map(_._1).toSeq.distinct
    val dows = cells.keys.map(_._2).toSeq.distinct
    val rt = types.map(t => t -> cells.collect { case ((a, _), o) if a == t => o }.sum).toMap
    val ct = dows.map(d => d -> cells.collect { case ((_, b), o) if b == d => o }.sum).toMap
    val n = cells.values.sum.toDouble
    val chi2 = (for (t <- types; d <- dows) yield {
      val e = rt(t) * ct(d) / n
      val o = cells.getOrElse((t, d), 0L)
      (o - e) * (o - e) / e
    }).sum
    assert(row.getAs[Long]("n_cells") == types.size.toLong * dows.size)
    // Per-cell half-up quantization slack: ±0.5e-9 per cell.
    assert(math.abs(row.getAs[Long]("chi2_9") - chi2 * 1e9) <= cells.size + 1,
      s"chi2_9=${row.getAs[Long]("chi2_9")} vs local ${chi2 * 1e9}")
  }

  test("q154 stationary vector conserves mass and is P-invariant") {
    val v = run("q154_markov_stationary").collect()
      .map(r => (r.getAs[String]("a"), r.getAs[Long]("v9"))).toMap
    val mass = v.values.sum
    assert(math.abs(mass - 1000000000L) < 1000L,
      s"stationary mass $mass drifted from 1e9")
    // One more application of P moves no state by more than a few
    // quanta per matrix entry — the fixed-point criterion.
    val events = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).getTime * 1000 + r.getTimestamp(2).getNanos / 1000 % 1000,
        r.getLong(3)))
    val trans = events.groupBy(_._1).values.toSeq.flatMap { es =>
      val o = es.sortBy(e => (e._3, e._4)).map(_._2)
      o.zip(o.drop(1))
    }
    val byA = trans.groupBy(_._1)
    val p9 = byA.flatMap { case (a, ts0) =>
      val tot = ts0.size.toDouble
      ts0.groupBy(_._2).map { case (b, xs) =>
        (a, b) -> math.floor(xs.size / tot * 1e9 + 0.5).toLong
      }
    }
    val applied = v.keys.map { c =>
      c -> v.toSeq.map { case (a, va) =>
        va * p9.getOrElse((a, c), 0L)
      }.sum
    }.toMap.map { case (c, s) => c -> (s + 500000000L) / 1000000000L }
    v.foreach { case (a, va) =>
      assert(math.abs(applied(a) - va) <= 50000L,
        s"state $a moved ${math.abs(applied(a) - va)} quanta under one more P step")
    }
  }

  test("q146 argmax pack key is injective over the customer table") {
    // The packed ordering value v = bal2*1e7 + custkey is unique iff
    // custkey < 1e7 — assert the data invariant the determinism
    // argument rests on.
    val over = graft.sources.Tables.customer(spark, sfDir)
      .filter(col("c_custkey") >= 10000000L).count()
    assert(over == 0L, "custkey >= 1e7 would break the argmax tie-pack")
  }

  test("q155 sole-failing suppliers match a brute-force order scan") {
    // Re-derive (order → sole failing supplier) locally from raw
    // lines — independent of the aggregate-collapse rewrite.
    val lines = graft.sources.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_returnflag")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val brute = lines.groupBy(_._1).values.flatMap { ls =>
      val supps = ls.map(_._2).distinct
      val failing = ls.filter(_._3 == "R").map(_._2).distinct
      if (supps.size >= 2 && failing.size == 1) Some(failing.head) else None
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = run("q155_waiting_supplier").collect()
      .map(r => r.getAs[Long]("s_suppkey") -> r.getAs[Long]("numwait")).toMap
    got.foreach { case (s, w) =>
      assert(brute(s) == w, s"numwait mismatch for supplier $s") }
    if (got.size < 20) assert(got.keySet == brute.keySet)
  }

  test("q159 PageRank conserves bounded mass and ranks within [base, 1]") {
    // Integer truncation only ever LOSES mass: total ≤ 1e9, and each
    // rank is at least the teleport base and below the whole mass.
    val rows = run("q159_pagerank").collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("r9")).sum
    assert(total <= 1000000000L + rows.length,
      s"top-25 mass $total exceeds the unit budget")
    // Recover n (co-purchase node count) independently to pin the
    // teleport floor (15·(1e9 div n)) div 100 — a dropped or mis-scaled
    // teleport term would fall below it.
    val items = graft.sources.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = items.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).collect { case (pair, c) if c.size >= 2 => pair }
      .flatMap(p => Seq(p._1, p._2)).toSet.size
    val base = (15L * (1000000000L / n)) / 100L
    rows.foreach { r =>
      val v = r.getAs[Long]("r9")
      assert(v >= base && v < 1000000000L,
        s"rank $v outside [teleport base $base, 1e9)")
    }
  }

  test("q161 Gini is in [0,1) and zero on a constant distribution") {
    val rows = run("q161_gini").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getAs[Long]("gini9")
      assert(g >= 0L && g < 1000000000L,
        s"nation ${r.getAs[Int]("c_nationkey")}: gini9 $g outside [0,1e9)")
    }
    // Constant positive balances ⇒ Gini exactly 0 under the same
    // formula: (2Σi·x − (n+1)Σx) = x(2·n(n+1)/2 − (n+1)n) = 0.
    import spark.implicits._
    val const = (1 to 100).map(i => (0, 500L, i.toLong))
      .toDF("c_nationkey", "bal2", "c_custkey")
    val (ranked, _) = graft.ops.ScalableRank.rowNumbered(
      const, Seq("c_nationkey"), Seq(col("bal2"), col("c_custkey")), buckets = 8)
    val g = ranked.groupBy("c_nationkey")
      .agg(sum(col("rn") * col("bal2")).as("iwx"), sum("bal2").as("sx"),
        count(lit(1)).as("n"))
      .select((lit(2) * col("iwx") - (col("n") + 1) * col("sx")).as("num"))
      .collect().head.getLong(0)
    assert(g == 0L, s"constant distribution must have zero Gini numerator, got $g")
  }

  test("q163 EWMA equals the value on constant series and stays in the envelope") {
    // Envelope: a weighted average of window values can't leave
    // [min, max] of the user's values (weights are positive, sum = den).
    val rows = run("q163_ewma").collect()
    assert(rows.nonEmpty)
    val vals = graft.sources.Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(min("value").as("lo"), max("value").as("hi"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    rows.foreach { r =>
      val (lo, hi) = vals(r.getAs[Long]("user_id"))
      val e = r.getAs[Double]("ewma")
      assert(e >= lo - 1e-4 && e <= hi + 1e-4,
        s"ewma $e escapes [$lo, $hi] for user ${r.getAs[Long]("user_id")}")
    }
    // Constant series: num/den telescopes to exactly v for any length.
    import spark.implicits._
    val const = (1 to 45).map(i => (1L, i.toLong,
      java.sql.Timestamp.valueOf(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"), 7.25))
      .toDF("user_id", "event_id", "ts", "value")
    const.createOrReplaceTempView("q163_const")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-19, 0)
    val out = const
      .select(col("user_id"), col("event_id"), col("ts"),
        floor(col("value") * lit(1e4) + lit(0.5)).cast("long").as("v4"))
      .withColumn("vals", collect_list("v4").over(w))
      .select(expr("aggregate(transform(vals, (v, i) -> v * shiftleft(CAST(1 AS BIGINT), i)), " +
        "CAST(0 AS BIGINT), (acc, x) -> acc + x)").cast("double")
        ./(expr("shiftleft(CAST(1 AS BIGINT), size(vals)) - 1").cast("double"))
        ./(lit(1e4)).as("ewma"))
      .collect().map(_.getDouble(0))
    out.foreach(e => assert(e == 7.25, s"constant-series EWMA drifted: $e"))
  }

  test("q164 winsorized mean sits inside independently computed [p10, p90] clip bounds") {
    // A mean of values clamped to [lo, hi] must itself lie in [lo, hi]
    // — and the raw mean generally does NOT sit in so tight a band, so
    // an unclipped (or mis-clipped) q164 fails this. Bounds re-derived
    // locally with the exact Percentile formula (pos = p·(n−1), linear
    // blend of the bracketing order statistics).
    def pct(sorted: Array[Double], p: Double): Double = {
      val pos = p * (sorted.length - 1)
      val lo = sorted(math.floor(pos).toInt)
      val hi = sorted(math.ceil(pos).toInt)
      if (pos == math.floor(pos)) lo
      else (math.ceil(pos) - pos) * lo + (pos - math.floor(pos)) * hi
    }
    val byFlag = graft.sources.Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_quantity")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val rows = run("q164_winsorized_mean").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val f = r.getAs[String]("l_returnflag")
      val wm = r.getAs[Double]("wmean")
      val (lo, hi) = (pct(byFlag(f), 0.1), pct(byFlag(f), 0.9))
      assert(wm >= lo - 1e-9 && wm <= hi + 1e-9,
        s"flag $f: winsorized mean $wm escapes clip bounds [$lo, $hi]")
      // The clamp must actually bite on this data: the raw mean and
      // the winsorized mean may only coincide if nothing was clipped.
      val raw = byFlag(f).sum / byFlag(f).length
      val clippedShare = byFlag(f).count(v => v < lo || v > hi).toDouble /
        byFlag(f).length
      if (clippedShare > 0.05)
        assert(math.abs(wm - raw) > 1e-12 ||
          byFlag(f).forall(v => v >= lo && v <= hi),
          s"flag $f: ${100 * clippedShare}%% of rows clip but wmean == raw mean")
    }
  }

  test("q168's five doubling rounds cover the part hierarchy's depth with headroom") {
    // Pointer jumping resolves chains up to 2^rounds; the max depth of
    // parent(k) = k div 2 is floor(log2(maxkey)) + 1. Assert the data
    // invariant the round count rests on (with one spare round).
    val maxKey = graft.sources.Tables.part(spark, sfDir)
      .agg(max("p_partkey")).collect().head.getLong(0)
    val maxDepth = 63 - java.lang.Long.numberOfLeadingZeros(maxKey) + 1
    assert(maxDepth <= 16,
      s"max depth $maxDepth exceeds 2^4 — five rounds would still cover " +
        "2^5 = 32 but the spare-round headroom is gone; bump q168's rounds")
    // And the histogram partitions the part table exactly.
    val rows = run("q168_closure_depth").collect()
    val total = rows.map(_.getAs[Long]("n_parts")).sum
    val nParts = graft.sources.Tables.part(spark, sfDir).count()
    assert(total === nParts, s"depth histogram covers $total of $nParts parts")
  }

  test("q174 coefficients satisfy the least-squares orthogonality conditions") {
    // The defining property of OLS: residuals are orthogonal to the
    // design columns (1, x1, x2). Recompute residual sums locally from
    // raw rows with the engine's coefficients; relative error vs the
    // response scale must be negligible.
    val bs = run("q174_ols_two_features").collect()
      .map(r => r.getAs[String]("flag") ->
        (r.getAs[Long]("b0_9") / 1e9, r.getAs[Long]("b1_9") / 1e9,
          r.getAs[Long]("b2_9") / 1e9)).toMap
    val rows = graft.sources.Tables.lineitem(spark, sfDir).select(
      col("l_returnflag"), col("l_quantity").cast("long"),
      floor(col("l_discount") * lit(100) + lit(0.5)).cast("long"),
      floor(col("l_extendedprice") * lit(100) + lit(0.5)).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (flag, rs) =>
      val (b0, b1, b2) = bs(flag)
      var r0 = 0.0; var r1 = 0.0; var r2 = 0.0; var sy = 0.0
      rs.foreach { case (_, x1, x2, y) =>
        val e = y - b0 - b1 * x1 - b2 * x2
        r0 += e; r1 += e * x1; r2 += e * x2; sy += math.abs(y.toDouble)
      }
      // Scale-relative: quantized coefficients shift residual sums by
      // up to ~1e-9·Σ|x·x| — far below 1e-5 of the response mass.
      assert(math.abs(r0) / sy < 1e-5, s"$flag: Σe = $r0 vs mass $sy")
      assert(math.abs(r1) / (sy * 50) < 1e-5, s"$flag: Σe·x1 = $r1")
      assert(math.abs(r2) / (sy * 10) < 1e-5, s"$flag: Σe·x2 = $r2")
    }
  }

  test("q166 z statistic matches a local Welch recount") {
    val row = run("q166_ab_lift").collect().head
    val perUser = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), floor(col("value") * lit(100) + lit(0.5))
        .cast("long").as("v2"))
      .groupBy("user_id")
      .agg(expr("sum(v2) div count(1)").as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def md5Hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val byArm = perUser.groupBy { case (u, _) =>
      if (Integer.parseInt(md5Hex(s"ab:$u").substring(0, 1), 16) % 2 == 0) "A" else "B" }
    def stats(a: String) = {
      val xs = byArm(a).map(_._2.toDouble)
      val n = xs.length
      val m = xs.sum / n
      val v = xs.map(x => (x - m) * (x - m)).sum / (n - 1)
      (n, m, v)
    }
    val (na, ma, va) = stats("A"); val (nb, mb, vb) = stats("B")
    val z = (mb - ma) / math.sqrt(va / na + vb / nb)
    assert(row.getAs[Long]("na") == na && row.getAs[Long]("nb") == nb)
    assert(math.abs(row.getAs[Double]("z") - z) < 1e-6,
      s"z mismatch: engine ${row.getAs[Double]("z")} vs local $z")
  }

  test("q178 triangle count matches an unoriented brute-force recount") {
    // Recompute locally from the same support ≥ 2 edge set: adjacency
    // sets, each triangle found once at its smallest-id corner —
    // independent of the degree-orientation trick under test.
    val items = graft.sources.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = items.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size)
      .filter(_._2 >= 2).keys.toSet
    val adj = edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val bruteTri = edges.toSeq.map { case (u, v) =>
      (adj(u) & adj(v)).count(w => w > v) // u < v < w once per triangle
    }.sum
    val bruteWedges = adj.values.map(n => n.size.toLong * (n.size - 1) / 2).sum
    val row = run("q178_triangles").collect().head
    assert(row.getAs[Long]("n_edges") == edges.size.toLong)
    assert(row.getAs[Long]("n_triangles") == bruteTri.toLong,
      s"oriented count ${row.getAs[Long]("n_triangles")} vs brute $bruteTri")
    assert(row.getAs[Long]("n_wedges") == bruteWedges)
  }

  test("q184 peel trace matches a local in-memory peel, monotone") {
    val items = graft.sources.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var edges = items.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size)
      .filter(_._2 >= 2).keys.toSet
    val trace = (1 to 4).map { _ =>
      val deg = edges.toSeq.flatMap { case (u, v) => Seq(u, v) }
        .groupBy(identity).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= 3).keySet
      edges = edges.filter { case (u, v) => keep(u) && keep(v) }
      val nodes = edges.flatMap { case (u, v) => Seq(u, v) }
      (nodes.size.toLong, edges.size.toLong)
    }
    val got = run("q184_kcore_peel").collect()
      .sortBy(_.getAs[Long]("round"))
      .map(r => (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges")))
    assert(got.toSeq == trace, s"engine trace ${got.toSeq} vs local $trace")
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._1 <= a._1 && b._2 <= a._2, "peel must shrink monotonically")
      case _ =>
    }
  }

  test("q185 recovers the planted batch-effect direction") {
    val got = run("q185_pca_power").collect()
      .sortBy(_.getAs[Number]("dim").longValue)
      .map(_.getAs[Long]("pc1_9").toDouble)
    val d = graft.queries.MiningQueries.PcaDirection
    val dot = got.zip(d).map { case (a, b) => a * b }.sum
    val cos = math.abs(dot) /
      (math.sqrt(got.map(x => x * x).sum) * math.sqrt(d.map(x => x * x).sum))
    assert(cos >= 0.97, s"|cos(PC1, planted)| = $cos < 0.97")
  }

  test("q182 bins partition each flag exactly with ordered value ranges") {
    val bins = run("q182_equidepth_bins").collect()
      .groupBy(_.getAs[String]("l_returnflag"))
    val totals = graft.sources.Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((flag, rows) <- bins) {
      val sorted = rows.sortBy(_.getAs[Long]("bin"))
      assert(sorted.map(_.getAs[Long]("n_rows")).sum == totals(flag),
        s"$flag: bin depths must sum to the flag's row count")
      // Value ranges must be disjoint and ordered: each bin starts
      // strictly above the previous bin's max (edges are inclusive
      // upper bounds).
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("v_max") < b.getAs[Double]("v_min"),
            s"$flag: bins ${a.getAs[Long]("bin")}/${b.getAs[Long]("bin")} overlap")
        case _ =>
      }
    }
  }

  test("iterative queries keep checkpoint-cut, bounded lineage") {
    // The iterative family (power iteration, transitive closure, k-core
    // peel) hand-manages lazy localCheckpoints so each round plans on
    // top of a LogicalRDD cut instead of re-inlining the previous
    // round's full lineage (3 references/round -> 3^rounds growth in
    // q184's shape). This gate makes the discipline load-bearing: if a
    // future edit drops a cut, the final plan re-acquires the base
    // scans (file leaves multiply by the round count) and the node
    // count blows past the bound — both asserted here, so the
    // regression fails CI instead of surfacing as an sf1 blowup.
    val iterative = Seq(
      "q154_markov_stationary", // 8 Markov power steps over cut P
      "q159_pagerank",          // 4 rank steps over the cut edge list
      "q168_closure_depth",     // 5 doubling rounds, cut per round
      "q184_kcore_peel",        // 4 peel rounds, cut per round
      "q185_pca_power")         // 10 power steps, cut per step
    for (name <- iterative) {
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.optimizedPlan
      val nodes = plan.collect { case n => n }
      val cuts = nodes.count(
        _.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD])
      val scans = nodes.count {
        case _: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          true
        case _: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
          true
        case _ => false
      }
      info(s"$name: ${nodes.length} nodes, $cuts cuts, $scans scans")
      assert(cuts >= 1,
        s"$name: no LogicalRDD in the final plan — the checkpoint cut " +
        "was removed")
      // Every base-table scan must sit BEHIND a cut: a file leaf in the
      // final plan means some round's lineage reaches past its
      // checkpoint back to the raw tables, and the scan replays once
      // per downstream reference.
      assert(scans == 0,
        s"$name: $scans file-scan leaves in the final plan — lineage " +
        "reaches past the checkpoint to the base tables")
      // Linear-in-rounds headroom (measured 4-73 nodes today): an
      // uncut multiplicative shape (3^4 edge-list references in q184
      // alone) lands in the thousands.
      assert(nodes.length <= 350,
        s"$name: optimized plan has ${nodes.length} nodes — lineage is " +
        "growing faster than linear in the round count")
    }
  }

  test("q320 DBSCAN: local brute-force recount of the core/border/noise trichotomy") {
    import java.security.MessageDigest
    val rows = run("q320_dbscan_grid").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(rows.nonEmpty)
    // Replay the planted plane locally (same md5 coordinate rule).
    def coord(tag: String, k: Long): Long = {
      val h = MessageDigest.getInstance("MD5")
        .digest(s"$tag$k".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(5)
      java.lang.Long.parseLong(h, 16) % 1000000L
    }
    val pts = rows.map(_._1).map(k => k -> (coord("cx:", k), coord("cy:", k))).toMap
    def d2(a: Long, b: Long): Long = {
      val (ax, ay) = pts(a); val (bx, by) = pts(b)
      (ax - bx) * (ax - bx) + (ay - by) * (ay - by)
    }
    val eps2 = 30000L * 30000L
    val ids = pts.keySet.toSeq
    val nbrs = ids.map(a => a -> ids.filter(b => d2(a, b) <= eps2)).toMap
    val core = ids.filter(a => nbrs(a).size >= 4).toSet
    // Components over core-core edges by union-find.
    val parent = scala.collection.mutable.Map(core.toSeq.map(c => c -> c): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    for (a <- core; b <- nbrs(a) if core(b) && a < b) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val lbl = core.map(c => c -> find(c)).toMap
    val expect = ids.map { a =>
      if (core(a)) (a, "core", lbl(a))
      else {
        val coreNbrs = nbrs(a).filter(b => core(b) && b != a)
        if (coreNbrs.nonEmpty) (a, "border", coreNbrs.map(lbl).min)
        else (a, "noise", -1L)
      }
    }.toSet
    assert(rows.toSet === expect)
    // The fixture must exercise all three roles at this SF or above.
    val roles = rows.map(_._2).toSet
    assert(roles.contains("noise"))
  }

  test("q326 time-series similarity equals the dense brute-force distance ranking") {
    // The norm+dot identity and the shared-day candidate space must
    // reproduce the DENSE squared Euclidean ranking computed naively:
    // materialize every user's full daily vector locally (zeros
    // included), compute all probe×candidate distances, and compare
    // the complete top-10 lists. (On this fixture every user pair
    // shares a day, so the inverted-index pruning contract drops
    // nothing — the full top-10 SET EQUALITY below subsumes the
    // pruning check: a single dropped candidate would perturb some
    // probe's ranked list and fail the assert.)
    import org.apache.spark.sql.functions._
    val daily = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .groupBy("user_id", "day").agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getLong(0), r.get(1).toString, r.getLong(2)))
    val days = daily.map(_._2).distinct.sorted
    val vecs = daily.groupBy(_._1).map { case (u, rows) =>
      val m = rows.map(r => r._2 -> r._3).toMap
      u -> days.map(d => m.getOrElse(d, 0L))
    }
    val probes = vecs.keys.filter(_ < 16L).toSeq.sorted
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val expect = probes.flatMap { p =>
      vecs.keys.filter(_ != p).toSeq
        .map(c => (c, d2(vecs(p), vecs(c))))
        .sortBy { case (c, d) => (d, c) }
        .take(10).zipWithIndex
        .map { case ((c, d), i) => (p, i + 1, c, d) }
    }.toSet
    val got = SparkEntry.queries("q326_ts_similarity")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === expect)
  }

  test("Iterate: cut keeps multiply-referenced fixpoint plans linear, values exact") {
    // The shared round-runner behind q159/q222/q285/Dedup (round-12
    // verdict #7). The step references the state TWICE (a self-join) —
    // the shape whose uncut plan doubles per round. Six rounds of
    // v ← v + v must (a) compute 2^6 exactly under the cut discipline,
    // (b) leave a single-leaf plan (the last checkpoint), while the
    // uncut composition computes the same values with an exponentially
    // wider tree — pinning that the cut is the thing doing the work.
    import spark.implicits._
    import graft.ops.Iterate
    val init = Seq((1L, 1L), (2L, 1L)).toDF("k", "v")
    def step(st: org.apache.spark.sql.DataFrame, @annotation.unused r: Int) =
      st.join(st.select(col("k"), col("v").as("v2")), "k")
        .select(col("k"), (col("v") + col("v2")).as("v"))
    val cutRes = Iterate.rounds(init, 6, cutEvery = 1, resetEvery = 3)(step)
    assert(cutRes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(1L -> 64L, 2L -> 64L))
    assert(cutRes.queryExecution.optimizedPlan.collectLeaves().size === 1,
      "cut rounds must end in a single materialized leaf")
    val uncut = Iterate.rounds(init, 6, cutEvery = 0)(step)
    assert(uncut.queryExecution.optimizedPlan.collectLeaves().size === 64,
      "the doubling step without cuts re-embeds the history 2^rounds times")
    assert(uncut.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(1L -> 64L, 2L -> 64L))
  }

  test("Iterate.renorm: total reads the cut raw table, division is exact") {
    import spark.implicits._
    import graft.ops.Iterate
    val raw = Seq(("a", 30L), ("b", 70L)).toDF("k", "raw")
    val out = Iterate.renorm(raw, round = 1)(_.agg(sum("raw").as("t"))) {
      (rc, tot) => rc.crossJoin(tot)
        .select(col("k"), expr("(raw * 1000) div t").as("m"))
    }
    assert(out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("a" -> 300L, "b" -> 700L))
    // Both consumers (the 1-row total and the division) read the SAME
    // checkpointed leaf — the raw plan appears once, materialized.
    val leaves = out.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.size === 2, s"expected cut-raw + its reuse, got:\n$leaves")
    // statsReset preserves rows and schema.
    val reset = Iterate.statsReset(raw)
    assert(reset.schema === raw.schema)
    assert(reset.collect().toSet === raw.collect().toSet)
  }
}
