package graft.ops

import org.apache.spark.sql.DataFrame
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
}
