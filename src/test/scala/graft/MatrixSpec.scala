package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.ops.Matrix
import graft.sources.Generator

/** Property tests for the COO matmul — the engine-side descendant of the
  * reference's serial oracle (`checking.c:95-106`), extended to the
  * non-square shapes the reference silently breaks on (stride bug
  * `program.c:104-108`, reducer range heuristic `program.c:381-393`).
  */
class MatrixSpec extends SparkSpec {

  /** Plain-Scala triple-loop oracle (the role of serialMultiplication). */
  private def serial(a: Array[Array[Int]], b: Array[Array[Int]]): Array[Array[Long]] = {
    val (l, m, n) = (a.length, b.length, b.headOption.map(_.length).getOrElse(0))
    val c = Array.ofDim[Long](l, n)
    for (i <- 0 until l; k <- 0 until n; j <- 0 until m)
      c(i)(k) += a(i)(j).toLong * b(j)(k)
    c
  }

  private def toCoo(m: Array[Array[Int]], in: String, jn: String) = {
    val rows = for (i <- m.indices; j <- m(i).indices)
      yield Row(i, j, m(i)(j))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 2),
      StructType(Seq(StructField(in, IntegerType), StructField(jn, IntegerType),
        StructField("v", IntegerType))))
  }

  test("matmul matches the serial triple-loop oracle on arbitrary non-square shapes") {
    // Seeded property sweep (plain loop: scalatestplus isn't on the
    // offline classpath). Shapes include 1×n, n×1, and L≠M≠N — the
    // cases the reference's square-only assumptions break on.
    for (seed <- 0 until 20) {
      val rnd = new scala.util.Random(seed)
      val (l, m, n) = (1 + rnd.nextInt(8), 1 + rnd.nextInt(8), 1 + rnd.nextInt(8))
      val a = Array.fill(l, m)(rnd.nextInt(19) - 9)
      val b = Array.fill(m, n)(rnd.nextInt(19) - 9)
      val expect = serial(a, b)
      val got = Matrix.matmul(toCoo(a, "i", "j"), toCoo(b, "j", "k"))
        .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
      for (i <- 0 until l; k <- 0 until n)
        assert(got.getOrElse((i, k), 0L) === expect(i)(k),
          s"C[$i][$k] for shapes ${l}x$m ⋈ ${m}x$n seed=$seed")
      assert(got.size === l * n)
    }
  }

  test("blocked matmul equals row-level matmul on dense inputs, ragged tiles included") {
    for (seed <- 0 until 8) {
      val rnd = new scala.util.Random(100 + seed)
      val (l, m, n) = (1 + rnd.nextInt(12), 1 + rnd.nextInt(12), 1 + rnd.nextInt(12))
      val t = 1 + rnd.nextInt(5) // tile sizes that rarely divide the dims
      val a = Array.fill(l, m)(rnd.nextInt(19) - 9)
      val b = Array.fill(m, n)(rnd.nextInt(19) - 9)
      val expect = serial(a, b)
      val got = Matrix.matmulBlocked(toCoo(a, "i", "j"), toCoo(b, "j", "k"), t)
        .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
      assert(got.size === l * n, s"shapes ${l}x$m ⋈ ${m}x$n t=$t seed=$seed")
      for (i <- 0 until l; k <- 0 until n)
        assert(got((i, k)) === expect(i)(k),
          s"C[$i][$k] shapes ${l}x$m ⋈ ${m}x$n t=$t seed=$seed")
    }
  }

  test("identity matrix is a right identity") {
    val rnd = new scala.util.Random(7)
    val a = Array.fill(5, 4)(rnd.nextInt(10))
    val idRows = for (j <- 0 until 4) yield Array.tabulate(4)(k => if (j == k) 1 else 0)
    val got = Matrix.matmul(toCoo(a, "i", "j"), toCoo(idRows.toArray, "j", "k"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    for (i <- 0 until 5; j <- 0 until 4)
      assert(got((i, j)) === a(i)(j).toLong)
  }

  test("empty inputs produce an empty product") {
    val empty = toCoo(Array.empty[Array[Int]], "i", "j")
    val b = toCoo(Array(Array(1, 2)), "j", "k")
    assert(Matrix.matmul(empty, b).count() === 0)
  }

  test("binary ingest round-trips multiple files, non-square shapes and negative values") {
    import graft.sources.BinaryMatrix
    val dir = java.nio.file.Files.createTempDirectory("graft_bin_spec").toString
    try {
      // Two files with DIFFERENT shapes in one directory — per-file dims
      // from each filename — plus negative and extreme int32 values to
      // pin the little-endian two's-complement decode.
      val a = Array(-5, 0, 7, Int.MaxValue, Int.MinValue, 42) // 2×3
      val b = Array(1, -1, 100, -100, 0, 9)                   // 3×2
      BinaryMatrix.write(dir, 2, 3, tag = 1)(id => a(id.toInt))
      BinaryMatrix.write(dir, 3, 2, tag = 2)(id => b(id.toInt))
      val got = BinaryMatrix.readCoo(spark, dir)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
      assert(got.length === 12)
      val cells = got.groupBy(identity).map { case (k, v) => (k, v.length) }
      // 2×3 file: row-major a; 3×2 file: row-major b. (i,j,v) triples
      // may coincide across files, so compare as a multiset.
      val expect = (a.zipWithIndex.map { case (v, id) => (id / 3, id % 3, v) } ++
        b.zipWithIndex.map { case (v, id) => (id / 2, id % 2, v) })
        .groupBy(identity).map { case (k, v) => (k, v.length) }
      assert(cells === expect)
      // clear() removes both fixtures → empty scan-side directory.
      BinaryMatrix.clear(dir)
      assert(!java.nio.file.Files.list(java.nio.file.Paths.get(dir))
        .iterator().hasNext)
    } finally {
      BinaryMatrix.clear(dir)
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir))
    }
  }

  test("generator matches its own SQL-side formula (spot check)") {
    // Generator.cooMatrix and Generator.cooMatrixSql must describe the
    // same matrix — this is what makes q16/q18's oracle valid.
    val df = Generator.cooMatrix(spark, rows = 6, cols = 5, seed = 3)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getInt(2))).toMap
    for (i <- 0 until 6; j <- 0 until 5) {
      val id = i.toLong * 5 + j
      val expect = (((id * 73 + 17 + 3) % 97) % 10).toInt
      assert(df((i, j)) === expect)
    }
  }
}
