package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed matrix multiply over coordinate (COO) relations — the
  * reference's entire job (`program.c:479-514`) as one declarative plan.
  *
  * The reference implements `C = A × B` as: map emits two tagged string
  * KV pairs per (i,j,k) (`program.c:184-222`), gather-to-rank-0 shuffle
  * (`program.c:224-296`), linear-scan group-by-key (`program.c:298-311`),
  * and a per-key positional-pairing reducer (`program.c:415-445`). All of
  * that is the semantic content of
  * `SELECT a.i, b.k, SUM(a.v*b.v) FROM A JOIN B ON a.j = b.j GROUP BY i,k`
  * (SURVEY.md §2.1), which is exactly what [[matmul]] declares. Catalyst
  * picks the physical join (sort-merge / shuffled-hash / broadcast when a
  * side is small), the aggregation is partial+final hash agg (the honest
  * version of the reference's rank-0-only "combiner"), and the shuffle
  * moves each `j`-slice / `(i,k)`-group exactly once — vs the reference's
  * gather-everything-then-rebroadcast-everything (`program.c:247-288`).
  *
  * Unlike the reference, correctness does not depend on A/B value
  * adjacency in shuffle order (`program.c:427-435` — SURVEY.md §2.1 bug
  * list), and non-square shapes work (`program.c:104-108` stride bug).
  *
  * Scale: for dense L×M ⋈ M×N this shuffles O(L·M + M·N) rows once and
  * aggregates O(L·N) keys — no step materializes the O(L·M·N)
  * intermediate the reference's string-pair emit does (32 MB of strings
  * for two 4 KB inputs; BASELINE.md). For the 100 TB path the same plan
  * holds: shuffle on `j` is hash-partitioned, AQE splits skewed `j`
  * slices, and a genuinely small side broadcasts.
  */
object Matrix {

  /** `A(i,j,v) × B(j,k,v)` → `C(i,k,v)`. Duplicate (i,j) entries are
    * summed into the product, matching the SQL semantics. */
  def matmul(a: DataFrame, b: DataFrame): DataFrame = {
    val l = a.select(col("i"), col("j"), col("v").as("av"))
    val r = b.select(col("j"), col("k"), col("v").as("bv"))
    l.join(r, "j")
      .groupBy("i", "k")
      .agg(sum(col("av").cast("long") * col("bv")).as("v"))
  }

  /** A dense tile of a matrix: block coordinates + row-major cells.
    * `rows`/`cols` are the tile's logical extent (ragged at the matrix
    * edge when the dimension doesn't divide by the tile size).
    */
  case class Tile(bi: Int, bj: Int, rows: Int, cols: Int, cells: Array[Long])

  /** Blocked (tiled) matmul for DENSE matrices — the 100 TB scale path.
    *
    * The row-level [[matmul]] is optimal in shuffle volume
    * (O(|A|+|B|)) but its join OUTPUT is one row per (i,j,k) triple —
    * O(L·M·N) rows flowing through partial aggregation. Tiling with
    * side `t` groups cells into t×t dense blocks first; the join then
    * matches (L/t)·(M/t)·(N/t) tile PAIRS, each multiplied locally as a
    * dense t×t kernel — the per-triple cost drops from a shuffled-row
    * aggregation step to a cache-friendly primitive multiply-add, and
    * the aggregation input shrinks by a factor of t (tile partials vs
    * cell partials). This is the standard SUMMA-style layout (public
    * Spark MLlib BlockMatrix uses the same shape).
    *
    * Semantics caveat (why "DENSE"): SQL join semantics emit a C(i,k)
    * row only when some j matches; the blocked kernel emits every cell
    * of a matched tile pair. For dense inputs (every cell present, as
    * the reference's matrices are — `filecreation.c:7-17`) the two
    * coincide exactly, zeros included. For genuinely sparse data use
    * [[matmul]].
    *
    * Typed Dataset + mapGroups/flatMap is deliberate here: the tile
    * kernel is genuine per-partition imperative logic (a triple loop
    * over primitive arrays), the case SURVEY.md §2.1's mapping reserves
    * the typed API for.
    */
  def matmulBlocked(a: DataFrame, b: DataFrame, t: Int): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._

    def tilesOf(df: DataFrame, rName: String, cName: String): Dataset[Tile] =
      df.select(col(rName).cast("int").as("r"), col(cName).cast("int").as("c"),
          col("v").cast("long").as("v"))
        .as[(Int, Int, Long)]
        .groupByKey { case (r, c, _) => (r / t, c / t) }
        .mapGroups { (key: (Int, Int), cells: Iterator[(Int, Int, Long)]) =>
          val (br, bc) = key
          val buf = cells.toArray
          val rows = buf.map(_._1 % t).max + 1
          val cols = buf.map(_._2 % t).max + 1
          val arr = new Array[Long](rows * cols)
          buf.foreach { case (r, c, v) => arr((r % t) * cols + (c % t)) += v }
          Tile(br, bc, rows, cols, arr)
        }

    val aTiles = tilesOf(a, "i", "j")
    val bTiles = tilesOf(b, "j", "k")

    // Shuffle key = the inner block index: each A-tile meets each
    // B-tile of its block-column exactly once.
    val partials = aTiles.joinWith(bTiles, aTiles("bj") === bTiles("bi"))
      .map { case (ta, tb) =>
        // Enforce the documented dense-only contract: with missing
        // cells the inferred tile extents can disagree and the kernel
        // below would index out of bounds or misalign rows.
        require(ta.cols == tb.rows,
          s"matmulBlocked requires dense input: A-tile (${ta.bi},${ta.bj}) " +
            s"has ${ta.cols} cols but B-tile (${tb.bi},${tb.bj}) has " +
            s"${tb.rows} rows — use Matrix.matmul for sparse matrices")
        // dense t×t kernel: C_tile += A_tile × B_tile
        val out = new Array[Long](ta.rows * tb.cols)
        var i = 0
        while (i < ta.rows) {
          var j = 0
          while (j < ta.cols) {
            val av = ta.cells(i * ta.cols + j)
            if (av != 0L) {
              var k = 0
              while (k < tb.cols) {
                out(i * tb.cols + k) += av * tb.cells(j * tb.cols + k)
                k += 1
              }
            }
            j += 1
          }
          i += 1
        }
        Tile(ta.bi, tb.bj, ta.rows, tb.cols, out)
      }

    partials
      .groupByKey(p => (p.bi, p.bj))
      .reduceGroups { (x, y) =>
        // Same dense-only contract as the kernel above: sparse misuse can
        // make two partials of one (bi,bj) infer different extents, and a
        // longer y would otherwise be silently truncated to sum.length.
        require(x.rows == y.rows && x.cols == y.cols,
          s"matmulBlocked requires dense input: partial C-tiles (${x.bi},${x.bj}) " +
            s"disagree on extent (${x.rows}x${x.cols} vs ${y.rows}x${y.cols}) " +
            "— use Matrix.matmul for sparse matrices")
        val sum = x.cells.clone()
        var i = 0
        while (i < sum.length) { sum(i) += y.cells(i); i += 1 }
        Tile(x.bi, x.bj, x.rows, x.cols, sum)
      }
      .map(_._2)
      .flatMap { tile =>
        for (r <- 0 until tile.rows; c <- 0 until tile.cols)
          yield (tile.bi * t + r, tile.bj * t + c, tile.cells(r * tile.cols + c))
      }
      .toDF("i", "k", "v")
  }
}
