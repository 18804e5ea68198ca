package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.sources.Tables

/** Native codegen'd graft_dot vs the interpreted HOF baseline: value
  * parity (bit-exact — same double accumulation order) and a sanity
  * speedup check (the expression exists ONLY because it is faster;
  * if it ever isn't, it should be deleted).
  */
class DotProductSpec extends SparkSpec {

  test("graft_dot equals the HOF dot bit-for-bit on the embeddings table") {
    val e = Tables.embeddings(spark, sfDir)
    val both = e.select(
        Similarity.dot(col("embedding"), col("embedding")).as("native"),
        Similarity.dotHof(col("embedding"), col("embedding")).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("graft_dot is callable from SQL (extension registration)") {
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("emb_dot")
    val n = spark.sql(
      "SELECT graft_dot(embedding, embedding) AS d FROM emb_dot WHERE vec_id < 5")
      .collect()
    assert(n.length === 5)
    n.foreach(r => assert(r.getDouble(0) > 0.0))
  }

  test("graft_dot rejects non-float-array inputs at analysis time") {
    import spark.implicits._
    val bad = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    val err = intercept[Exception] {
      bad.select(Similarity.dot(col("a"), col("b"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("array<float>"))
  }

  test("null semantics: null array yields null, null elements contribute 0") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (None, Some(Array(1.0f)))).toDF("a", "b")
    val rows = df.select(Similarity.dot(col("a"), col("b")).as("d")).collect()
    assert(rows(0).getDouble(0) === 11.0)
    assert(rows(1).isNullAt(0))
  }

  test("native dot participates in whole-stage codegen (no interpreted fallback)") {
    // Plan-shape assertion, not wall-clock: timing in unit tests flakes
    // under load. The expression's reason to exist is staying inside
    // codegen — assert exactly that, and report timing as info only.
    val e = Tables.embeddings(spark, sfDir)
    val df = e.select(Similarity.dot(col("embedding"), col("embedding")).as("d"))
    val cg = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(cg.contains("WholeStageCodegen"), "expected a codegen stage")
    assert(cg.contains("numElements") && cg.contains("getFloat"),
      "expected the generated primitive dot loop in codegen output")

    def time(c: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      e.select(sum(c)).collect()
      (System.nanoTime() - t0) / 1e9
    }
    time(Similarity.dot(col("embedding"), col("embedding")))
    time(Similarity.dotHof(col("embedding"), col("embedding")))
    val native = time(Similarity.dot(col("embedding"), col("embedding")))
    val hof = time(Similarity.dotHof(col("embedding"), col("embedding")))
    info(f"native=$native%.3fs hof=$hof%.3fs ratio=${hof / native}%.1fx")
  }
}
