package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the vector hot path.
  *
  * `zip_with + aggregate` allocates a 64-element struct array per row
  * pair — ruinous inside an O(n^2) similarity join. This expression
  * whole-stage-codegens to a primitive double loop (no allocation), and
  * sums in index order, so its result is bit-identical to the in-order
  * fold the DuckDB oracle uses (list_dot_product) — INCLUDING the
  * fold's null semantics: zip_with pads unequal-length arrays with null
  * and `s + null` poisons the fold, so a length mismatch or a null
  * element yields NULL here too. That makes the DotProductRewrite
  * optimizer rule result-identical for every input, not just the
  * well-formed ones. The element null checks are only emitted when the
  * array types admit nulls, so the containsNull=false hot path stays a
  * branch-free primitive loop.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  private def elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  })

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires two array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val checkNulls = elementsNullable
    var s = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val nullCheck = if (elementsNullable)
        s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
      else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $s;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Native per-vector scalar-quantization statistics:
  * struct(mn, mx, qsum, max_err) for min/max int8 encoding — the x16
  * hot path. Two primitive passes over the array (min/max, then
  * quantize), no per-element allocation, one output row.
  *
  * WHY NATIVE (round 6): the declarative spelling is
  * `aggregate(transform(v, ...))` + `array_max(transform(v, ...))` —
  * higher-order functions, which never enter whole-stage codegen and
  * run on the shared interpreted dispatch that round 5 measured going
  * megamorphic in long-lived JVMs (see MinHashSigs). x16 was the last
  * gated hot path still on that dispatch (BASELINE.md design rule).
  *
  * Field semantics are bit-identical to the declarative chain on the
  * oracle (x16's CTE) for every input, including nulls:
  *   - mn/mx: array_min/array_max — null elements skipped, null when
  *     no non-null element exists (incl. the empty array);
  *   - rng (internal): 1.0 when mx = mn, else mx - mn;
  *   - qsum: aggregate(transform(v, x -> floor(((x-mn)/rng)*255)),
  *     0L, s+x) — 0 for the EMPTY array (the fold's init), but NULL
  *     when any element is null (s + null poisons the fold);
  *   - max_err: array_max over abs(x - (mn + floor(...)*rng/255)) —
  *     null elements skipped, null when nothing remains.
  * All comparisons use the same total order as array_min/array_max
  * (NaN greatest, -0.0 < 0.0). QuantizeStatsSpec pins parity against
  * the declarative chain row-by-row.
  */
case class QuantizeStats(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_quantize_stats requires array<double>, got ${other.catalogString}")
  }

  override def dataType: DataType = QuantizeStats.schema
  override def prettyName: String = "graft_quantize_stats"

  override def nullSafeEval(input: Any): Any =
    QuantizeStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.QuantizeStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): QuantizeStats =
    copy(child = newChild)
}

object QuantizeStats {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  val schema: StructType = StructType(Seq(
    StructField("mn", DoubleType, nullable = true),
    StructField("mx", DoubleType, nullable = true),
    StructField("qsum", LongType, nullable = true),
    StructField("max_err", DoubleType, nullable = true)))

  /** Never returns null: a non-null array always has a stats row (the
    * empty array's is (null, null, 0, null), matching the fold init). */
  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    var mn = 0.0
    var mx = 0.0
    var seen = false
    var anyNull = false
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) anyNull = true
      else {
        val x = arr.getDouble(i)
        if (!seen) { mn = x; mx = x; seen = true }
        else {
          if (java.lang.Double.compare(x, mn) < 0) mn = x
          if (java.lang.Double.compare(x, mx) > 0) mx = x
        }
      }
      i += 1
    }
    var qsum = 0L
    var maxErr = 0.0
    var errSeen = false
    if (seen) {
      val rng = if (mx == mn) 1.0 else mx - mn
      i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val x = arr.getDouble(i)
          val q = math.floor((x - mn) / rng * 255)
          qsum += q.toLong
          val err = math.abs(x - (mn + q * rng / 255))
          if (!errSeen || java.lang.Double.compare(err, maxErr) > 0) {
            maxErr = err; errSeen = true
          }
        }
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](
      if (seen) java.lang.Double.valueOf(mn) else null,
      if (seen) java.lang.Double.valueOf(mx) else null,
      if (anyNull || (!seen && n > 0)) null else java.lang.Long.valueOf(qsum),
      if (errSeen) java.lang.Double.valueOf(maxErr) else null))
  }
}

object VectorExpressions {
  /** Codegen'd in-order dot product of two array<double> columns. */
  def dotNative(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Codegen'd struct(mn, mx, qsum, max_err) quantization stats. */
  def quantizeStats(v: Column): Column =
    Bridge.column(QuantizeStats(Bridge.expression(v)))
}
