package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.ScalableRank

/** ops/ScalableRank: the two-phase range-bucketed ranking must be
  * VALUE-identical to the textbook one-shuffle window at every bucket
  * count — boundaries may split a part key, split a tie run, or leave
  * buckets empty, and none of it may show in the output.
  */
class ScalableRankSpec extends SparkSpec {

  import spark.implicits._

  // Skewed synthetic input: one hot key (70%), duplicate order values
  // (forced tie runs that straddle bucket boundaries), a key with a
  // single row (n=1 edge), in scrambled insertion order.
  private lazy val df = {
    val rows = (1 to 700).map(i => ("hot", (i % 13).toDouble, i)) ++
      (1 to 280).map(i => ("warm", (i % 7).toDouble, 1000 + i)) ++
      Seq(("lone", 42.0, 9999))
    rows.toDF("k", "v", "id").repartition(7)
  }

  private def oneShuffleRanks = {
    val w = Window.partitionBy("k").orderBy(col("v").asc, col("id").asc)
    df.select(col("k"), col("id"), row_number().over(w).cast("long").as("rn"))
  }

  for (buckets <- Seq(1, 5, 64)) {
    test(s"two-phase rank at buckets=$buckets equals the one-shuffle window") {
      val (ranked, stats) = ScalableRank.rowNumbered(
        df, Seq("k"), Seq(col("v").asc, col("id").asc), buckets)
      val twoPhase = ranked.select("k", "id", "rn")
      assert(twoPhase.except(oneShuffleRanks).isEmpty &&
        oneShuffleRanks.except(twoPhase).isEmpty,
        s"rank mismatch at buckets=$buckets")
      val n = stats.as[(String, Long)].collect().toMap
      assert(n == Map("hot" -> 700L, "warm" -> 280L, "lone" -> 1L))
    }
  }

  test("tie-semantics rank/dense_rank via aggregation equals the native window") {
    // The q106 shape: rank = min(rn) per peer group (partial-aggregated
    // groupBy, safe under any tie multiplicity), dense_rank = row_number
    // over the distinct value table. The synthetic df's v = i % 13
    // forces ~54-row peer groups that straddle bucket boundaries.
    val (ranked, _) = ScalableRank.rowNumbered(
      df, Seq("k"), Seq(col("v").asc, col("id").asc), buckets = 8)
    val valRanks = ranked.groupBy("k", "v").agg(min("rn").as("rnk"))
      .withColumn("drnk", row_number().over(
        Window.partitionBy("k").orderBy("v")).cast("long"))
    val twoPhase = ranked.join(broadcast(valRanks), Seq("k", "v"))
      .select("k", "id", "rnk", "drnk")
    val w = Window.partitionBy("k").orderBy("v")
    val native = df.select(col("k"), col("id"),
      rank().over(w).cast("long").as("rnk"),
      dense_rank().over(w).cast("long").as("drnk"))
    assert(twoPhase.except(native).isEmpty && native.except(twoPhase).isEmpty,
      "tie-semantics ranks diverge from the native window")
  }

  test("ranks are a 1..n permutation within every part key") {
    val (ranked, _) = ScalableRank.rowNumbered(
      df, Seq("k"), Seq(col("v").asc, col("id").asc), buckets = 8)
    val bad = ranked.groupBy("k")
      .agg(count(lit(1)).as("n"), min("rn").as("lo"), max("rn").as("hi"),
        countDistinct("rn").as("d"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n") || col("d") =!= col("n"))
    assert(bad.isEmpty, "rn is not a dense 1..n permutation per key")
  }

  for (buckets <- Seq(1, 5, 64)) {
    test(s"two-phase running sum at buckets=$buckets equals the one-shuffle window") {
      // q80's shape: integral value column, LONG partial sums — must be
      // value-identical to the single-window prefix sum at any bucket
      // count (boundaries splitting tie runs / part keys included).
      val vals = df.withColumn("t", (col("id") % 37).cast("int"))
        .select("k", "id", "t")
      val twoPhase = ScalableRank.runningSummed(
          vals, Seq("k"), Seq(col("id").asc), "t", buckets, run = "cum")
        .select("k", "id", "cum")
      val w = Window.partitionBy("k").orderBy(col("id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val oneShuffle = vals.select(col("k"), col("id"),
        sum(col("t").cast("long")).over(w).as("cum"))
      assert(twoPhase.except(oneShuffle).isEmpty &&
        oneShuffle.except(twoPhase).isEmpty,
        s"running sum mismatch at buckets=$buckets")
    }
  }

  for (buckets <- Seq(1, 5, 64)) {
    test(s"multi-column two-phase running sum at buckets=$buckets equals the one-shuffle windows") {
      // q277's shape: BOTH cum columns from ONE pass over ONE range
      // exchange. The chained alternative (runningSummed twice) is
      // nondeterministic — the duplicated range exchanges of the
      // second call's two branches can sample different boundaries
      // and disagree (found when q277's KS statistic changed between
      // two actions on the same plan) — so this variant exists and
      // must stay value-identical to the reference windows.
      val vals = df.withColumn("t", (col("id") % 37).cast("int"))
        .withColumn("u", (col("id") % 11).cast("int"))
        .select("k", "id", "t", "u")
      val twoPhase = ScalableRank.runningSummedAll(
          vals, Seq("k"), Seq(col("id").asc), Seq("t", "u"), buckets,
          runs = Seq("ct", "cu"))
        .select("k", "id", "ct", "cu")
      val w = Window.partitionBy("k").orderBy(col("id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val oneShuffle = vals.select(col("k"), col("id"),
        sum(col("t").cast("long")).over(w).as("ct"),
        sum(col("u").cast("long")).over(w).as("cu"))
      assert(twoPhase.except(oneShuffle).isEmpty &&
        oneShuffle.except(twoPhase).isEmpty,
        s"multi running sum mismatch at buckets=$buckets")
    }
  }

  for (buckets <- Seq(1, 4, 32)) {
    test(s"two-phase exclusive running max at buckets=$buckets equals the one-shuffle window") {
      // Same fixture: hot key, tie runs straddling boundaries, n=1 key.
      val vals = df.select(col("k"), col("id"), col("v"))
      val twoPhase = ScalableRank.runningMaxed(
          vals, Seq("k"), Seq(col("id").asc), "v", buckets)
        .select("k", "id", "runmax")
      val w = Window.partitionBy("k").orderBy(col("id").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val oneShuffle = vals.select(col("k"), col("id"),
        max("v").over(w).as("runmax"))
      // except() treats NULL = NULL, so the first-row NULL legs compare.
      assert(twoPhase.except(oneShuffle).isEmpty &&
        oneShuffle.except(twoPhase).isEmpty,
        s"running max mismatch at buckets=$buckets")
      // Exclusive contract: exactly one NULL per part key (its first row).
      val nulls = twoPhase.filter(col("runmax").isNull)
        .groupBy("k").count().as[(String, Long)].collect().toMap
      assert(nulls.values.forall(_ == 1L) && nulls.size == 3, s"nulls: $nulls")
    }
  }

  test("global (no part key) two-phase rank is a 1..n permutation") {
    // q114's shape: empty partCols — one global order, range-bucketed.
    val keyed = df.select(col("id"), col("v"))
    val (ranked, stats) = ScalableRank.rowNumbered(
      keyed, Seq.empty, Seq(col("v").asc, col("id").asc), buckets = 8, rn = "pos")
    val n = keyed.count()
    val got = ranked.agg(
      count(lit(1)).as("c"), min("pos").as("lo"), max("pos").as("hi"),
      countDistinct("pos").as("d")).as[(Long, Long, Long, Long)].head()
    assert(got == ((n, 1L, n, n)), s"global rank not a permutation: $got")
    assert(stats.as[Long].head() == n)
    // And the order agrees with the one-shuffle global window.
    val w = Window.orderBy(col("v").asc, col("id").asc)
    val native = keyed.select(col("id"), row_number().over(w).cast("long").as("pos"))
    val twoPhase = ranked.select("id", "pos")
    assert(twoPhase.except(native).isEmpty && native.except(twoPhase).isEmpty)
  }

  for (q <- Seq("q103_percentile_2pass", "q104_percentile_counts")) {
    test(s"$q is bit-identical to q77's built-in percentile()") {
      // The whole point of the scalable percentiles: same bits as
      // percentile() with per-task memory bounded (by the range bucket
      // for q103, by distinct values for q104), never by the group.
      // Exact double equality — both blend formulas were chosen to
      // match Percentile.getPercentile ulp-for-ulp.
      val scalable = SparkEntry.queries(q)(spark, sfDir)
        .as[(String, Double, Double)].collect().sortBy(_._1)
      val builtin = SparkEntry.queries("q77_percentile_demo_bounded")(spark, sfDir)
        .as[(String, Double, Double)].collect().sortBy(_._1)
      assert(scalable.sameElements(builtin),
        s"$q ${scalable.mkString(",")} != builtin ${builtin.mkString(",")}")
    }
  }
}
