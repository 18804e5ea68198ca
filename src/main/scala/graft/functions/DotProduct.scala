package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native codegen'd dot product over two `ARRAY<FLOAT>` columns.
  *
  * This is the one custom Catalyst expression in the engine, justified
  * per SURVEY.md §4.3's escape-hatch rule ("codegen'd dot-product
  * Expression if array-UDF similarity search is too slow"): the
  * higher-order-function formulation (`aggregate(zip_with(...))`,
  * [[graft.ops.Similarity.dotHof]]) evaluates INTERPRETED — per-element
  * lambda dispatch outside whole-stage codegen — which profiling showed
  * dominating the similarity hot path. This expression compiles to a
  * tight primitive loop inside the generated code (`DotProductSpec`
  * asserts the speedup and value parity).
  *
  * Semantics: Σ (double)aᵢ·(double)bᵢ over min(|a|,|b|) elements —
  * cast-before-multiply in double, left-to-right, matching both the HOF
  * baseline and the DuckDB oracle's `list_dot_product` on equal-length
  * inputs. Null array → null (BinaryExpression null semantics); null
  * ELEMENTS are treated as 0 contribution.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  // Manual type check (ExpectsInputTypes' AbstractDataType is
  // private[sql] in Spark 4): both inputs must be ARRAY<FLOAT>.
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires two ARRAY<FLOAT> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
         |    $acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** SparkSessionExtensions installer: registers `graft_dot` in the
  * function registry so it is callable from SQL and via
  * `call_function("graft_dot", a, b)` — the supported public route to a
  * custom expression (no Column internals). Wired into every session by
  * [[graft.Engine.builder]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // SQL MERGE front: MERGE INTO graft_tx.`<root>` plans onto
    // TxTable.mergeInto (graft.plans.GraftMergeRule, q365).
    ext.injectResolutionRule(session =>
      graft.plans.GraftMergeRule(session.asInstanceOf[org.apache.spark.sql.SparkSession]))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_dot takes exactly 2 arguments")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "minhash_sig takes (shingles, numHashes)")
        val k = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"minhash_sig numHashes must be an integer literal, got $other")
        }
        MinHashSig(children.head, k)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[Shingles].getName, "graft_shingles"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_shingles takes (tokens, n)")
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_shingles n must be an integer literal, got $other")
        }
        Shingles(children.head, n)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[Winnow].getName, "graft_winnow"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_winnow takes (hashes, w)")
        val w = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_winnow w must be an integer literal, got $other")
        }
        Winnow(children.head, w)
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "simhash64 takes (tokens)")
        SimHash64(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_lev_bounded"),
      new ExpressionInfo(classOf[BoundedLevenshtein].getName, "graft_lev_bounded"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "graft_lev_bounded takes (a, b, k)")
        val k = children(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_lev_bounded k must be an integer literal, got $other")
        }
        BoundedLevenshtein(children.head, children(1), k)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_jaro_winkler takes (a, b)")
        JaroWinkler(children.head, children(1))
      }))
    // ANN assignment expressions (IvfCells.scala): the centroid/plane
    // matrix arrives as ONE foldable array-of-array literal and is
    // folded into the expression at analysis time — the plan holds a
    // single constant-size node however many lists the index has.
    ext.injectFunction((
      new FunctionIdentifier("graft_best_cell"),
      new ExpressionInfo(classOf[BestCell].getName, "graft_best_cell"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "graft_best_cell takes (emb, cents, cids)")
        BestCell(children.head,
          IvfCells.evalFloatMatrix(children(1), "graft_best_cell cents"),
          IvfCells.evalLongArray(children(2), "graft_best_cell cids"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_top_cells"),
      new ExpressionInfo(classOf[TopCells].getName, "graft_top_cells"),
      (children: Seq[Expression]) => {
        require(children.size == 4, "graft_top_cells takes (emb, cents, cids, p)")
        TopCells(children.head,
          IvfCells.evalFloatMatrix(children(1), "graft_top_cells cents"),
          IvfCells.evalLongArray(children(2), "graft_top_cells cids"),
          IvfCells.evalIntLiteral(children(3), "graft_top_cells p"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_lsh_bucket"),
      new ExpressionInfo(classOf[LshBucketBits].getName, "graft_lsh_bucket"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_lsh_bucket takes (emb, planes)")
        LshBucketBits(children.head,
          IvfCells.evalFloatMatrix(children(1), "graft_lsh_bucket planes"))
      }))
  }
}
