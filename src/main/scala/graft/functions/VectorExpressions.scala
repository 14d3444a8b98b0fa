package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

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

/** Nearest-centroid assignment against a TRAINED codebook carried as a
  * plan REFERENCE OBJECT — the cell-assignment hot path of the whole
  * IVF family (KMeans.assignCell/assignCells delegate here).
  *
  * WHY NATIVE (round 9): the former spelling unrolled the K centroids
  * into one literal expression tree — K structs, each holding a
  * 64-dim literal-array dot product — and at K = scaledK(2000) = 64
  * the single generated method blew past janino's 64 KB bytecode
  * limit ("Code grows beyond 64 KB"), dropping the whole stage to
  * interpreted eval. The fallback is correct but slow, and the blowup
  * GROWS with K — the corpus-scaled capacity rule guarantees bigger K
  * at bigger corpora, so the literal form was structurally wrong at
  * scale. Here the codebook rides along as `double[][]` via
  * ctx.addReferenceObj and the argmin is a primitive loop in a static
  * helper invoked from whole-stage codegen: compact generated code at
  * ANY K, no fallback, no per-row allocation at nprobe = 1, and the
  * K self-dots (cc terms) are precomputed once per plan instead of
  * re-evaluated per row.
  *
  * BIT-IDENTICAL to the literal form and the oracle's replay: vc
  * folds in index order (DotProduct / list_dot_product order), cc is
  * the same in-order self-dot, score = cc - 2.0*vc in the same op
  * order, and ties break to the smaller cid (strict-less keeps the
  * earlier centroid; the insertion sort shifts only on strict-greater,
  * reproducing sort_array's (score, cid) ascending order). A null
  * element or a centroid/vector length mismatch yields NULL — the
  * poisoned-fold rule DotProduct documents.
  */
case class NearestCells(child: Expression, cent: Array[Array[Double]], nprobe: Int)
    extends UnaryExpression {
  require(cent.nonEmpty && nprobe >= 1 && nprobe <= cent.length,
    s"nprobe $nprobe out of range for ${cent.length} centroids")

  private lazy val ccs: Array[Double] = NearestCells.selfDots(cent)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_cells requires array<double>, got ${other.catalogString}")
  }

  override def dataType: DataType =
    if (nprobe == 1) LongType else ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_nearest_cells"
  // keep the codebook out of explain output — K x dims doubles
  override def stringArgs: Iterator[Any] =
    Iterator(child, s"K=${cent.length}", s"nprobe=$nprobe")

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (nprobe == 1) {
      val r = NearestCells.nearest(v, cent, ccs)
      if (r < 0) null else java.lang.Long.valueOf(r)
    } else NearestCells.nearestN(v, cent, ccs, nprobe)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centRef = ctx.addReferenceObj("cent", cent, "double[][]")
    val ccsRef = ctx.addReferenceObj("ccs", ccs, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("cellRes")
      if (nprobe == 1)
        s"""long $r = graft.functions.NearestCells.nearest($c, $centRef, $ccsRef);
           |if ($r < 0) { ${ev.isNull} = true; } else { ${ev.value} = $r; }""".stripMargin
      else
        s"""org.apache.spark.sql.catalyst.util.ArrayData $r =
           |  graft.functions.NearestCells.nearestN($c, $centRef, $ccsRef, $nprobe);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

object NearestCells {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  /** In-order self-dots — the cc terms, one per centroid, same fold
    * order as the per-row vc loop. */
  def selfDots(cent: Array[Array[Double]]): Array[Double] =
    cent.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    }

  /** argmin_j (ccs(j) - 2*v·cent(j)), ties to smaller j; -1 signals
    * NULL (null element or length mismatch). */
  def nearest(v: ArrayData, cent: Array[Array[Double]], ccs: Array[Double]): Long = {
    val n = v.numElements()
    var best = -1L
    var bestS = Double.PositiveInfinity
    var j = 0
    while (j < cent.length) {
      val c = cent(j)
      if (c.length != n) return -1L
      var vc = 0.0
      var d = 0
      while (d < n) {
        if (v.isNullAt(d)) return -1L
        vc += v.getDouble(d) * c(d)
        d += 1
      }
      val s = ccs(j) - 2.0 * vc
      if (s < bestS) { bestS = s; best = j }
      j += 1
    }
    best
  }

  /** The np nearest cell ids ascending by (score, cid) — a bounded
    * insertion sort (np <= 4 in every consumer); null on null element
    * or length mismatch. */
  def nearestN(v: ArrayData, cent: Array[Array[Double]], ccs: Array[Double],
      np: Int): ArrayData = {
    val n = v.numElements()
    val ts = new Array[Double](np)
    val tj = new Array[Long](np)
    var filled = 0
    var j = 0
    while (j < cent.length) {
      val c = cent(j)
      if (c.length != n) return null
      var vc = 0.0
      var d = 0
      while (d < n) {
        if (v.isNullAt(d)) return null
        vc += v.getDouble(d) * c(d)
        d += 1
      }
      val s = ccs(j) - 2.0 * vc
      if (filled < np) {
        var p = filled
        while (p > 0 && ts(p - 1) > s) { ts(p) = ts(p - 1); tj(p) = tj(p - 1); p -= 1 }
        ts(p) = s; tj(p) = j
        filled += 1
      } else if (s < ts(np - 1)) {
        var p = np - 1
        while (p > 0 && ts(p - 1) > s) { ts(p) = ts(p - 1); tj(p) = tj(p - 1); p -= 1 }
        ts(p) = s; tj(p) = j
      }
      j += 1
    }
    new GenericArrayData(tj)
  }
}

object VectorExpressions {
  /** Codegen'd in-order dot product of two array<double> columns. */
  def dotNative(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Codegen'd struct(mn, mx, qsum, max_err) quantization stats. */
  def quantizeStats(v: Column): Column =
    Bridge.column(QuantizeStats(Bridge.expression(v)))

  /** Codegen'd nearest-cell assignment against a reference-object
    * codebook (see [[NearestCells]]). */
  def nearestCell(v: Column, cent: Seq[Array[Double]]): Column =
    Bridge.column(NearestCells(Bridge.expression(v), cent.toArray, 1))

  /** The nprobe nearest cells, ascending (score, cid). */
  def nearestCells(v: Column, cent: Seq[Array[Double]], nprobe: Int): Column =
    Bridge.column(NearestCells(Bridge.expression(v), cent.toArray, nprobe))
}
