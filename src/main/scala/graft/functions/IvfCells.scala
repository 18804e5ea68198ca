package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native centroid-assignment expressions for the IVF / hyperplane-LSH
  * ANN operators ([[graft.ops.Similarity]]).
  *
  * Why these exist (the round-5 scale defect): cell assignment used to
  * be a `greatest()` chain over `nLists` struct expressions, each
  * embedding a full centroid vector as its own `typedLit` plan literal.
  * At nLists=4 that is fine; at the 4k–64k lists a 100 TB IVF needs,
  * the plan carries nLists separate literal nodes and an nLists-deep
  * expression tree — an analyzer/codegen blow-up long before data cost
  * matters. Each expression here instead holds the WHOLE centroid
  * matrix as constructor data (extracted once from a single foldable
  * array-of-array literal at registration, see [[IvfCells]]): the plan
  * gains exactly one expression node of constant size regardless of
  * nLists, and the per-row work is one flat primitive loop.
  *
  * Bit parity contract (q67/q95/q56 are oracle-checked): the arithmetic
  * replays the old chain exactly — dot = Σ (double)eᵢ·(double)cᵢ
  * left-to-right skipping null elements ([[DotProduct]] semantics),
  * cos = 0 when either norm is 0, denom = normE·normC in that order,
  * argmax ties break toward the HIGHER centroid id (the old
  * `greatest()` struct ordering, and the oracle's
  * `ORDER BY ccos DESC, cid DESC`). Finite inputs never produce ±0.0
  * disagreements (a `+=` accumulation starting at 0.0 cannot yield
  * -0.0) or NaN (the zero-norm guard), so `Double.compare` is exact.
  */
object IvfCells {

  /** Evaluates a foldable ARRAY<ARRAY<FLOAT>> literal (e.g. `typedLit`
    * of `Array[Array[Float]]`) into a Scala matrix at analysis time. */
  def evalFloatMatrix(e: Expression, who: String): Array[Array[Float]] = {
    val ok = e.foldable && (e.dataType match {
      case ArrayType(ArrayType(FloatType, _), _) => true
      case _ => false
    })
    require(ok, s"$who must be a foldable ARRAY<ARRAY<FLOAT>> literal, " +
      s"got ${e.dataType.simpleString}")
    val ad = e.eval(null).asInstanceOf[ArrayData]
    require(ad != null && ad.numElements() > 0, s"$who must be non-empty")
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toFloatArray())
  }

  /** Evaluates a foldable ARRAY<BIGINT> literal into an Array[Long]. */
  def evalLongArray(e: Expression, who: String): Array[Long] = {
    val ok = e.foldable && (e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    require(ok, s"$who must be a foldable ARRAY<BIGINT> literal, " +
      s"got ${e.dataType.simpleString}")
    val ad = e.eval(null).asInstanceOf[ArrayData]
    require(ad != null && ad.numElements() > 0, s"$who must be non-empty")
    ad.toLongArray()
  }

  def evalIntLiteral(e: Expression, who: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$who must be an integer literal, got $other")
  }

  /** Shared interpreted scoring: cosine of `e` against every row of the
    * flattened centroid matrix, identical accumulation order to the
    * codegen'd loop in [[BestCell.doGenCode]]. */
  private[functions] def cosineScores(
      e: ArrayData, flat: Array[Float], norms: Array[Double], dim: Int): Array[Double] = {
    val elen = e.numElements()
    var ne = 0.0
    var i = 0
    while (i < elen) {
      if (!e.isNullAt(i)) { val v = e.getFloat(i).toDouble; ne += v * v }
      i += 1
    }
    ne = math.sqrt(ne)
    val n = norms.length
    val out = new Array[Double](n)
    val m = math.min(elen, dim)
    var c = 0
    while (c < n) {
      var dt = 0.0
      val off = c * dim
      var j = 0
      while (j < m) {
        if (!e.isNullAt(j)) dt += e.getFloat(j).toDouble * flat(off + j).toDouble
        j += 1
      }
      val dn = ne * norms(c)
      out(c) = if (dn == 0.0) 0.0 else dt / dn
      c += 1
    }
    out
  }

  /** Content (not reference) comparison for the expression case classes
    * below: Scala case-class equality compares Array fields by eq, so
    * two semantically identical nodes built from separate typedLit calls
    * would never satisfy semanticEquals — blocking subexpression
    * elimination and plan dedup. Conservative-only, but free to fix. */
  private[functions] def matEquals(a: Array[Array[Float]], b: Array[Array[Float]]): Boolean =
    java.util.Arrays.deepEquals(a.asInstanceOf[Array[AnyRef]], b.asInstanceOf[Array[AnyRef]])

  private[functions] def matHash(a: Array[Array[Float]]): Int =
    java.util.Arrays.deepHashCode(a.asInstanceOf[Array[AnyRef]])

  private[functions] def centroidNorms(cents: Array[Array[Float]]): Array[Double] =
    cents.map { v =>
      var acc = 0.0
      var i = 0
      while (i < v.length) { acc += v(i).toDouble * v(i).toDouble; i += 1 }
      math.sqrt(acc)
    }
}

/** Base for the matrix-holding assignment expressions: input validation
  * and the precomputed flat matrix / norms (recomputed lazily after
  * serialization to executors — the case-class fields are the source of
  * truth, the flats are derived caches). */
sealed trait IvfMatrixExpression extends UnaryExpression {
  def cents: Array[Array[Float]]

  protected val dim: Int = cents.head.length
  require(cents.forall(_.length == dim),
    s"$prettyName centroid rows must share one dimension, got " +
      cents.map(_.length).distinct.mkString(","))

  @transient protected lazy val flat: Array[Float] = {
    val out = new Array[Float](cents.length * dim)
    var c = 0
    while (c < cents.length) {
      System.arraycopy(cents(c), 0, out, c * dim, dim)
      c += 1
    }
    out
  }
  @transient protected lazy val norms: Array[Double] = IvfCells.centroidNorms(cents)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${other.simpleString}")
  }
}

/** `graft_best_cell(emb, cents, cids)` → BIGINT: the centroid id with
  * the maximum cosine against `emb` (ties → higher id). One plan node
  * and one fused primitive loop for ANY nLists — the scale-safe
  * replacement for the per-centroid `greatest()` chain. Fully
  * codegen'd: the matrix rides along as a reference object, not as
  * generated source, so nLists never widens the compiled method.
  */
case class BestCell(child: Expression, cents: Array[Array[Float]], cids: Array[Long])
  extends IvfMatrixExpression {
  require(cids.length == cents.length,
    s"graft_best_cell got ${cents.length} centroids but ${cids.length} ids")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_best_cell"

  override def nullSafeEval(input: Any): Any = {
    val cos = IvfCells.cosineScores(input.asInstanceOf[ArrayData], flat, norms, dim)
    var best = 0
    var c = 1
    while (c < cos.length) {
      val cmp = java.lang.Double.compare(cos(c), cos(best))
      if (cmp > 0 || (cmp == 0 && cids(c) > cids(best))) best = c
      c += 1
    }
    cids(best)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("graftBcFlat", flat, "float[]")
    val normRef = ctx.addReferenceObj("graftBcNorms", norms, "double[]")
    val cidRef = ctx.addReferenceObj("graftBcCids", cids, "long[]")
    nullSafeCodeGen(ctx, ev, e => {
      val elen = ctx.freshName("elen")
      val ne = ctx.freshName("ne")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val off = ctx.freshName("off")
      val dt = ctx.freshName("dt")
      val dn = ctx.freshName("dn")
      val cs = ctx.freshName("cs")
      val bc = ctx.freshName("bestCos")
      val bi = ctx.freshName("bestId")
      val cmp = ctx.freshName("cmp")
      val v = ctx.freshName("v")
      s"""
         |int $elen = $e.numElements();
         |double $ne = 0.0;
         |for (int $i = 0; $i < $elen; $i++) {
         |  if (!$e.isNullAt($i)) {
         |    double $v = (double) $e.getFloat($i);
         |    $ne += $v * $v;
         |  }
         |}
         |$ne = java.lang.Math.sqrt($ne);
         |int $m = java.lang.Math.min($elen, $dim);
         |double $bc = 0.0;
         |long $bi = 0L;
         |for (int $c = 0; $c < ${cids.length}; $c++) {
         |  double $dt = 0.0;
         |  int $off = $c * $dim;
         |  for (int $j = 0; $j < $m; $j++) {
         |    if (!$e.isNullAt($j)) {
         |      $dt += (double) $e.getFloat($j) * (double) $flatRef[$off + $j];
         |    }
         |  }
         |  double $dn = $ne * $normRef[$c];
         |  double $cs = ($dn == 0.0) ? 0.0 : $dt / $dn;
         |  int $cmp = java.lang.Double.compare($cs, $bc);
         |  if ($c == 0 || $cmp > 0 || ($cmp == 0 && $cidRef[$c] > $bi)) {
         |    $bc = $cs;
         |    $bi = $cidRef[$c];
         |  }
         |}
         |${ev.value} = $bi;
       """.stripMargin
    })
  }

  override def equals(o: Any): Boolean = o match {
    case b: BestCell => child == b.child && IvfCells.matEquals(cents, b.cents) &&
      java.util.Arrays.equals(cids, b.cids)
    case _ => false
  }
  // Cached: Expression.hashCode is hit repeatedly by ExpressionSet /
  // canonicalization maps, and deep-hashing a 256×64 matrix per call
  // would tax exactly the machinery content-equality enables.
  @transient private lazy val cachedHash: Int = java.util.Objects.hash(
    child, Integer.valueOf(IvfCells.matHash(cents)),
    Integer.valueOf(java.util.Arrays.hashCode(cids)))
  override def hashCode(): Int = cachedHash

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_top_cells(emb, cents, cids, p)` → ARRAY<BIGINT>: the top-`p`
  * centroid ids by (cosine DESC, id DESC) — rank 1 equals
  * [[BestCell]]. The multi-probe IVF surface: probes explode their p
  * nearest cells so recall climbs at bounded candidate cost, while
  * candidates keep their single [[BestCell]] assignment (each candidate
  * lives in exactly one inverted list, so probing p distinct cells
  * never duplicates a (probe, candidate) pair). CodegenFallback is
  * fine here: this runs on the probe side only (few rows), and the
  * inner loop is already primitive.
  */
case class TopCells(child: Expression, cents: Array[Array[Float]], cids: Array[Long],
                    nProbe: Int)
  extends IvfMatrixExpression with CodegenFallback {
  require(cids.length == cents.length,
    s"graft_top_cells got ${cents.length} centroids but ${cids.length} ids")
  require(nProbe >= 1, s"graft_top_cells nProbe must be >= 1, got $nProbe")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_top_cells"

  override def nullSafeEval(input: Any): Any = {
    val cos = IvfCells.cosineScores(input.asInstanceOf[ArrayData], flat, norms, dim)
    val order = Array.range(0, cos.length).sortWith { (a, b) =>
      val cmp = java.lang.Double.compare(cos(a), cos(b))
      if (cmp != 0) cmp > 0 else cids(a) > cids(b)
    }
    new GenericArrayData(order.take(math.min(nProbe, cos.length)).map(cids(_)))
  }

  override def equals(o: Any): Boolean = o match {
    case t: TopCells => child == t.child && nProbe == t.nProbe &&
      IvfCells.matEquals(cents, t.cents) && java.util.Arrays.equals(cids, t.cids)
    case _ => false
  }
  @transient private lazy val cachedHash: Int = java.util.Objects.hash(
    child, Integer.valueOf(nProbe), Integer.valueOf(IvfCells.matHash(cents)),
    Integer.valueOf(java.util.Arrays.hashCode(cids)))
  override def hashCode(): Int = cachedHash

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_lsh_bucket(emb, planes)` → BIGINT: the hyperplane sign
  * pattern packed into a long — bit p is set iff dot(emb, planes[p])
  * ≥ 0. Replaces the per-plane literal `when()` chain for the same
  * plan-size reason as [[BestCell]]; dot semantics identical to
  * [[DotProduct]] (nPlanes ≤ 64 by construction — bits of a LONG).
  */
case class LshBucketBits(child: Expression, cents: Array[Array[Float]])
  extends IvfMatrixExpression {
  require(cents.length <= 64,
    s"graft_lsh_bucket supports at most 64 planes, got ${cents.length}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lsh_bucket"

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    val elen = e.numElements()
    val m = math.min(elen, dim)
    var bucket = 0L
    var p = 0
    while (p < cents.length) {
      var dt = 0.0
      val off = p * dim
      var j = 0
      while (j < m) {
        if (!e.isNullAt(j)) dt += e.getFloat(j).toDouble * flat(off + j).toDouble
        j += 1
      }
      if (dt >= 0.0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("graftLshFlat", flat, "float[]")
    nullSafeCodeGen(ctx, ev, e => {
      val elen = ctx.freshName("elen")
      val m = ctx.freshName("m")
      val bucket = ctx.freshName("bucket")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val off = ctx.freshName("off")
      val dt = ctx.freshName("dt")
      s"""
         |int $elen = $e.numElements();
         |int $m = java.lang.Math.min($elen, $dim);
         |long $bucket = 0L;
         |for (int $p = 0; $p < ${cents.length}; $p++) {
         |  double $dt = 0.0;
         |  int $off = $p * $dim;
         |  for (int $j = 0; $j < $m; $j++) {
         |    if (!$e.isNullAt($j)) {
         |      $dt += (double) $e.getFloat($j) * (double) $flatRef[$off + $j];
         |    }
         |  }
         |  if ($dt >= 0.0) $bucket |= (1L << $p);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })
  }

  override def equals(o: Any): Boolean = o match {
    case l: LshBucketBits => child == l.child && IvfCells.matEquals(cents, l.cents)
    case _ => false
  }
  @transient private lazy val cachedHash: Int =
    java.util.Objects.hash(child, Integer.valueOf(IvfCells.matHash(cents)))
  override def hashCode(): Int = cachedHash

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
