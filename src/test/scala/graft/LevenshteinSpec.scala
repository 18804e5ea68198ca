package graft

import org.apache.spark.sql.functions._
import graft.functions.BoundedLevenshtein
import org.apache.spark.unsafe.types.UTF8String

/** functions/BoundedLevenshtein: the banded DP must agree with the full
  * DP on every pair with distance ≤ k and saturate to exactly k+1
  * otherwise — that equivalence is what lets q142 swap the built-in for
  * the O(k·len) version without moving a single output bit.
  */
class LevenshteinSpec extends SparkSpec {

  /** Textbook full DP — the independent reference. */
  private def full(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prevDiag = dp(0)
      dp(0) = j
      for (i <- 1 to a.length) {
        val t = dp(i)
        dp(i) = math.min(
          math.min(dp(i) + 1, dp(i - 1) + 1),
          prevDiag + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prevDiag = t
      }
    }
    dp(a.length)
  }

  private def banded(a: String, b: String, k: Int): Int =
    BoundedLevenshtein.banded(
      UTF8String.fromString(a), UTF8String.fromString(b), k)

  test("banded equals full DP below the bound and saturates to k+1 above it") {
    val rng = new scala.util.Random(42)
    val alphabet = "abcde"
    def word(n: Int) = Array.fill(n)(alphabet(rng.nextInt(alphabet.length))).mkString
    for (_ <- 1 to 2000) {
      val a = word(rng.nextInt(14))
      val b = word(rng.nextInt(14))
      val k = rng.nextInt(6)
      val expected = math.min(full(a, b), k + 1)
      val got = banded(a, b, k)
      assert(got == expected, s"banded('$a','$b',$k) = $got, full says $expected")
    }
  }

  test("edit-shaped perturbations land at their exact distance") {
    // Hand-built pairs at known distances, including band boundaries.
    val cases = Seq(
      ("kitten", "sitting", 3), ("flaw", "lawn", 2), ("", "", 0),
      ("abc", "", 3), ("", "abcd", 4), ("same", "same", 0),
      ("abcdef", "abXdef", 1), ("abcdef", "Xabcdef", 1),
      ("abcdef", "bcdef", 1), ("abcdef", "abcdefgh", 2))
    for ((a, b, d) <- cases; k <- 0 to 5) {
      val expected = math.min(d, k + 1)
      assert(banded(a, b, k) == expected,
        s"banded('$a','$b',$k) != $expected")
    }
  }

  test("length gate rejects without touching characters") {
    assert(banded("a" * 100, "a" * 200, 4) == 5)
    assert(banded("", "abcdefgh", 3) == 4)
  }

  test("the SQL registration evaluates inside whole-stage codegen") {
    import spark.implicits._
    // A Seq.toDF would be folded by ConvertToLocalRelation and run the
    // INTERPRETED eval; spark.range keeps a physical plan so the
    // generated code (doGenCode's static call) actually executes.
    val df = spark.range(3)
      .select(
        when(col("id") === 0, "kitten").when(col("id") === 1, "abc")
          .otherwise("abc").as("a"),
        when(col("id") === 0, "sitting").when(col("id") === 1, "abc")
          .otherwise("zzzzzz").as("b"))
      .select(call_function("graft_lev_bounded",
        col("a"), col("b"), lit(3)).as("d"))
    // The `*(n)` prefix is the plan-string marker for a
    // WholeStageCodegen span containing the Project.
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project"),
      "expected the expression inside a WholeStageCodegen span")
    assert(df.as[Int].collect().toSeq == Seq(3, 0, 4))
  }

  test("q142 on the bounded DP matches the built-in levenshtein filter") {
    val names = graft.sources.Tables.part(spark, sfDir)
      .select("p_name").distinct()
    val pairs = names.as("a").join(names.as("b"),
      substring(col("a.p_name"), 1, 1) === substring(col("b.p_name"), 1, 1) &&
        col("a.p_name") < col("b.p_name"))
    val viaBuiltin = pairs
      .select(col("a.p_name").as("n1"), col("b.p_name").as("n2"),
        levenshtein(col("a.p_name"), col("b.p_name")).as("d"))
      .filter(col("d") <= 4)
    val viaBanded = pairs
      .select(col("a.p_name").as("n1"), col("b.p_name").as("n2"),
        call_function("graft_lev_bounded",
          col("a.p_name"), col("b.p_name"), lit(4)).as("d"))
      .filter(col("d") <= 4)
    assert(viaBuiltin.except(viaBanded).isEmpty &&
      viaBanded.except(viaBuiltin).isEmpty)
  }
}
