package graft

import org.apache.spark.sql.functions._
import graft.functions.JaroWinkler
import org.apache.spark.unsafe.types.UTF8String

/** functions/JaroWinkler: the native 1e-6-quantized Jaro-Winkler must
  * reproduce the published reference values of the standard formula
  * (window max/2−1, t = ⌊tc/2⌋, boost > 0.7, prefix 0.1·min(4)) —
  * the same parameterization DuckDB's jaro_winkler_similarity uses,
  * which is what lets q238's oracle replay the scores bit-identically.
  */
class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Long =
    JaroWinkler.jw6(UTF8String.fromString(a), UTF8String.fromString(b))

  test("published reference pairs land on their textbook values") {
    // MARTHA/MARHTA: jaro = 17/18, prefix 3 → 0.961111…
    assert(jw("MARTHA", "MARHTA") == 961111L)
    // DWAYNE/DUANE: jaro = 0.82222…, prefix 1 → 0.84
    assert(jw("DWAYNE", "DUANE") == 840000L)
    // DIXON/DICKSONX: jaro = 0.76666…, prefix 2 → 0.813333…
    assert(jw("DIXON", "DICKSONX") == 813333L)
  }

  test("identity, disjoint, and empty-string edges") {
    assert(jw("graft", "graft") == 1000000L)
    assert(jw("abc", "xyz") == 0L)
    assert(jw("", "") == 1000000L)
    assert(jw("abc", "") == 0L)
    assert(jw("", "abc") == 0L)
    // Sub-threshold jaro gets NO winkler boost even with a common
    // prefix: ab/ax → jaro = 2/3 + ... wait — m=1 ('a'), l1=l2=2:
    // jaro = (1/2 + 1/2 + 1)/3 = 2/3 < 0.7 → stays 666667.
    assert(jw("ab", "ax") == 666667L)
  }

  test("symmetry over corpus name pairs") {
    val names = graft.sources.Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 50)
      .select(substring(col("text"), 1, 20).as("n"))
      .collect().map(_.getString(0))
    for (a <- names.take(10); b <- names.take(10))
      assert(jw(a, b) == jw(b, a), s"asymmetric on ($a, $b)")
  }

  test("the SQL registration evaluates inside whole-stage codegen") {
    import spark.implicits._
    val df = spark.range(3)
      .select(
        when(col("id") === 0, "MARTHA").when(col("id") === 1, "DWAYNE")
          .otherwise("same").as("a"),
        when(col("id") === 0, "MARHTA").when(col("id") === 1, "DUANE")
          .otherwise("same").as("b"))
      .select(call_function("graft_jaro_winkler", col("a"), col("b")).as("s"))
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project"),
      "expected the expression inside a WholeStageCodegen span")
    assert(df.as[Long].collect().toSeq == Seq(961111L, 840000L, 1000000L))
  }

  test("q238 linkage: every corrupted record still clears the 0.86 gate vs its twin") {
    // The fixture's correctness floor: a single interior deletion on
    // the ≥ 10-char constructed names cannot push Jaro-Winkler below
    // 0.86 (measured floor 0.8657 on the shortest 13-char names), so the true (clean, dirty) twin of EVERY record is always
    // a candidate the threshold keeps — the recall half the top-50
    // output alone can't witness.
    val toks = graft.ops.Text.tokens(col("text"))
    val rows = graft.sources.Tables.documents(spark, sfDir)
      .select(concat(array_join(slice(toks, 1, 3), " "), lit(" id"),
        pmod(col("doc_id"), lit(997))).as("name"))
      .collect().map(_.getString(0))
    rows.foreach { n =>
      val d = n.charAt(0) + n.substring(2)
      assert(jw(n, d) >= 860000L, s"twin pair below gate: '$n' vs '$d' = ${jw(n, d)}")
    }
    val out = SparkEntry.queries("q238_jw_linkage")(spark, sfDir).collect()
    assert(out.nonEmpty && out.forall(_.getAs[Long]("jw6") >= 860000L))
    val scores = out.map(_.getAs[Long]("jw6")).toSeq
    assert(scores == scores.sorted.reverse, "top-50 not sorted by score")
  }
}
