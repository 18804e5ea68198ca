package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Registry-wide output-domain guard for driver-hash portability.
  *
  * Round 8 proved the local DuckDB `--exact` sweep under-approximates
  * the driver's gate: q131's 9999-12-31 open-interval sentinel was
  * bit-exact in both engines yet failed the driver's hash compare,
  * because the driver stringifies through pandas `datetime64[ns]`
  * (valid range ~1677-09-21 .. 2262-04-11) and the out-of-range value
  * rendered as NaT on one side. This spec closes the CLASS, not the
  * instance: every registered query's output must stay inside the
  * portable value domain, so no future query can re-introduce it.
  *
  * Checks, per query, in ONE distributed aggregation pass:
  *  - every top-level Timestamp/Date column value lies in
  *    [1678-01-01, 2262-01-01) — comfortably inside the ns range on
  *    both sides (all registered queries emit ts >= 1992 harness data
  *    or the 2200-01-01 SCD2 sentinel);
  *  - for queries the driver hash-compares (those with an oracleSql
  *    entry): every Double/Float value is finite — NaN/Inf stringify
  *    engine-dependently, so a query that can emit them would fail the
  *    hash gate on the first input that produces one. Rows-only
  *    queries (the declared approx/sketch set) are exempt — they are
  *    never hashed.
  *
  * Deliberately NOT checked: round(v, 9)-idempotency. Many green
  * queries hash-match on raw doubles because the oracle SQL replays
  * the identical arithmetic (cosine scores, ratios); requiring
  * verify-skill quantization everywhere would flag ~20 queries the
  * driver itself passes. Quantization stays a per-query judgment made
  * with the `--exact` three-SF sweep; this spec guards only the value
  * classes that are unconditionally unportable.
  */
class OutputDomainSpec extends SparkSpec {

  private val tsLo = "1678-01-01 00:00:00"
  private val tsHi = "2262-01-01 00:00:00"

  /** Violation-count columns for one query's schema; empty if the
    * schema has no temporal/float columns to guard. */
  private def violationCols(schema: StructType, checkFloats: Boolean): Seq[Column] =
    schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case TimestampType | TimestampNTZType =>
          Some(sum(when(col(f.name).isNotNull &&
            (col(f.name) < lit(tsLo).cast(f.dataType) ||
              col(f.name) >= lit(tsHi).cast(f.dataType)), 1L).otherwise(0L))
            .as(s"ts_range:${f.name}"))
        case DateType =>
          Some(sum(when(col(f.name).isNotNull &&
            (col(f.name) < lit("1678-01-01").cast(DateType) ||
              col(f.name) >= lit("2262-01-01").cast(DateType)), 1L).otherwise(0L))
            .as(s"date_range:${f.name}"))
        case DoubleType | FloatType if checkFloats =>
          val v = col(f.name).cast(DoubleType)
          Some(sum(when(col(f.name).isNotNull &&
            (isnan(v) || v === Double.PositiveInfinity ||
              v === Double.NegativeInfinity),
            1L).otherwise(0L))
            .as(s"float_finite:${f.name}"))
        case _ => None
      }
    }

  /** True if the type contains TIMESTAMP_NTZ at any nesting depth —
    * reuses the scan-layer rewrite so the guard and the normalization
    * can never disagree on what counts as NTZ. */
  private def containsNtz(dt: DataType): Boolean =
    graft.sources.Tables.replaceNtz(dt) != dt

  test("every registered query's output stays inside the portable hash domain") {
    val hashed = SparkEntry.oracleSql.keySet
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    val ntzBad = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val df = fn(spark, sfDir)
      // NTZ schema gate folded into this same single instantiation pass
      // (round-9 driver regression class — see the base-table test below).
      val ntz = df.schema.fields.filter(f => containsNtz(f.dataType)).map(_.name)
      if (ntz.nonEmpty) ntzBad += s"$name: ${ntz.mkString(",")}"
      val checks = violationCols(df.schema, checkFloats = hashed.contains(name))
      if (checks.nonEmpty) {
        val row = df.agg(checks.head, checks.tail: _*).collect().head
        checks.indices.foreach { i =>
          // sum over zero rows is null — no rows, no violations
          val n = if (row.isNullAt(i)) 0L else row.getLong(i)
          if (n > 0L)
            failures += s"$name ${row.schema.fields(i).name} ($n values)"
        }
      }
    }
    assert(failures.isEmpty,
      s"out-of-domain output values (driver hash would diverge):\n  " +
        failures.mkString("\n  "))
    assert(ntzBad.isEmpty,
      s"query outputs expose NTZ columns:\n  ${ntzBad.mkString("\n  ")}")
  }

  /** Round-9 driver regression guard: a testdata regeneration switched
    * the parquet timestamps to isAdjustedToUTC=false, which Spark 4
    * infers as TIMESTAMP_NTZ — breaking `unix_micros` (q148), integer
    * casts (q87) and streaming watermarks at the driver while every
    * local run on the older encoding stayed green. `Tables.load` now
    * normalizes NTZ → TimestampType at the scan (UTC session zone makes
    * the cast a pure reinterpretation); these checks pin that contract
    * so neither a new table nor a new query can reintroduce NTZ.
    */
  test("base tables never expose TIMESTAMP_NTZ (any nesting depth)") {
    // Query outputs are checked in the portable-hash-domain test above,
    // inside its single instantiation pass over the registry.
    for (t <- graft.sources.Tables.names) {
      val ntz = graft.sources.Tables.load(spark, sfDir, t)
        .schema.fields.filter(f => containsNtz(f.dataType)).map(_.name)
      assert(ntz.isEmpty, s"table $t exposes NTZ columns: ${ntz.mkString(",")}")
    }
    assert(graft.sources.Tables.events(spark, sfDir).schema("ts").dataType == TimestampType)
  }
}
