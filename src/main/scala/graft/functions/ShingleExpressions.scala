package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing a document's SORTED DISTINCT
  * n-gram shingle-hash set in one primitive pass.
  *
  * The declarative spelling — explode a position sequence, take an
  * O(pos) `substring` per position, fold 9 `ascii(substring(...))`
  * calls per shingle, shuffle (doc_id, h) rows into a `collect_set` —
  * amplifies a ~300-byte document into ~300 rows and ~3000 UTF8String
  * allocations just to build a per-doc array. This expression walks the
  * code-point array once (O(len·n) integer ops, zero allocation per
  * shingle), sorts, dedupes, and returns the array — same hash bits as
  * `MinHash.shingleHash` (base-31 fold over code points; min/intersect
  * consumers are set-semantics, so dedup order is immaterial), with no
  * row amplification and no shuffle. At 100 TB this turns the dedup
  * family's dominant stage into a pure map over the corpus.
  */
case class ShingleHashSet(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1 && n <= 12, s"gram length must be in [1, 12] (int64 fold bound), got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_set requires a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_set"

  override def nullSafeEval(input: Any): Any =
    ShingleHashSet.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashSet.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashSet =
    copy(child = newChild)
}

object ShingleHashSet {
  /** Shared by interpreted eval and generated code. The walk is over
    * Unicode CODE POINTS (codePoints() handles surrogate pairs), and
    * DuckDB's ascii()/substr()/length() are equally code-point
    * functions (ascii('é')=233, ascii('😀')=128512 — verified, and
    * x69's non-ASCII fixture GATES the parity cross-engine), so the
    * bits match the SQL fold for ALL text — not just ASCII — provided
    * the fold stays inside int64. Exact headroom by gram length
    * (bound cp_max·(31^n−1)/30 < 2^63):
    *   n ≤ 9  → every Unicode code point (≤ 0x10FFFF): ≈ 9.8e17 ✓
    *   n = 10 → BMP only (cp ≤ 0xFFFF): ≈ 1.8e18 ✓; a supplementary
    *            code point overflows — the JVM wraps silently where
    *            DuckDB raises, so 10-grams over emoji-bearing text
    *            lose cross-engine parity
    *   n ≥ 11 → ASCII only (n = 12: 127·(31^12−1)/30 ≈ 3.3e18 ✓)
    * Every shipped consumer uses n ≤ 9 (l2: 5, x2/x52/x21: 9), so the
    * full-Unicode guarantee covers the whole dedup family. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val m = cps.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](m)
    var pos = 0
    while (pos < m) {
      var acc = cps(pos).toLong
      var i = 1
      while (i < n) { acc = acc * 31 + cps(pos + i); i += 1 }
      hs(pos) = acc
      pos += 1
    }
    java.util.Arrays.sort(hs)
    var w = 1
    var r = 1
    while (r < m) {
      if (hs(r) != hs(w - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, w))
  }
}

/** Native 32-bit SimHash of pre-lowercased text: whitespace-tokenize,
  * hash each token's first 8 characters right-padded with spaces
  * (base-31 fold over code points, mod 2^32 — `tokenHash32`'s exact
  * bits), accumulate a signed count per bit, emit the sign vector as a
  * long. One pass per document; the declarative form explodes ~50
  * token rows per doc and runs a 32-column signed-sum aggregation just
  * to fold them back. NULL for token-less input — mirroring the
  * declarative pipeline, where a doc with no tokens never reaches the
  * aggregation and so has no simhash row. */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any =
    SimHash32.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boxed = ctx.freshName("boxed")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |Object $boxed = graft.functions.SimHash32.compute($c);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $boxed).longValue(); }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SimHash32 {
  /** Returns java.lang.Long (null when the text has no tokens). */
  def compute(s: UTF8String): java.lang.Long = {
    val toks = s.toString.split("\\s+")
    val counts = new Array[Int](32)
    var any = false
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      if (tok.nonEmpty) {
        any = true
        var acc = 0L
        var i = 0
        var ci = 0 // char index walking code points
        while (i < 8) {
          val cp =
            if (ci < tok.length) { val c = tok.codePointAt(ci); ci += Character.charCount(c); c }
            else 32 // rpad with spaces
          acc = acc * 31 + cp
          i += 1
        }
        val h = acc % 4294967296L
        var b = 0
        while (b < 32) {
          counts(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      t += 1
    }
    if (!any) return null
    var sh = 0L
    var b = 0
    while (b < 32) {
      if (counts(b) > 0) sh |= 1L << b
      b += 1
    }
    java.lang.Long.valueOf(sh)
  }
}

/** Native 16-lane MinHash signature of a shingle-hash array: one pass
  * over the array computing all 16 `min((h mod P) * a_i + b_i mod P)`
  * lanes — bit-identical to the declarative
  * `array_min(transform(hs, h -> ...))` fold per seed.
  *
  * WHY NATIVE (measured, round 5): higher-order functions like
  * `transform` never participate in whole-stage codegen — they run on
  * Spark's interpreted Expression.eval path, whose SHARED dispatch
  * sites (ArrayTransform.eval calling an arbitrary lambda) go
  * megamorphic as a long-lived JVM evaluates many distinct lambdas.
  * Once HotSpot deoptimizes those paths, the SAME 16-fold projection
  * that costs ~15 CPU-s early in a bench suite costs ~78 CPU-s late in
  * it (event-log stage profile, BASELINE.md round-5 notes) — a 5x
  * bimodality no amount of cache hygiene fixes. A codegen'd single
  * pass is immune to interpreter-profile pollution, touches each
  * element once instead of 16 times, and allocates one result array
  * per row. NULL for an empty set — matching `array_min(transform([]))`
  * = null per lane (`element_at` on a null array is null per lane).
  * NULL ELEMENTS are skipped (ADVICE r5): `transform` maps a null
  * shingle hash to a null lane value and `array_min` skips nulls, so
  * skipping the slot is the declarative semantics — previously
  * `getLong` read such slots as 0 and silently diverged. An array with
  * no non-null element behaves like the empty one (NULL signature —
  * the one documented divergence from the declarative form, whose 16
  * per-lane nulls can't live in this containsNull=false result).
  */
case class MinHashSigs(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sigs requires array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sigs"

  override def nullSafeEval(input: Any): Any =
    MinHashSigs.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boxed = ctx.freshName("boxed")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |Object $boxed = graft.functions.MinHashSigs.compute($c);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $boxed; }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashSigs {
  val P = 2147483647L

  /** The canonical 16 deterministic (a, b) seed pairs — small primes,
    * literal, never random (FIXTURES.md determinism contract). Owned
    * here so the native expression, the DataFrame pipeline
    * (graft.llm.MinHash.seeds) and the oracle SQL all read one list. */
  val SEEDS: Seq[(Long, Long)] = Seq(
    (10007L, 3L), (10037L, 7L), (10039L, 11L), (10061L, 13L),
    (10067L, 17L), (10069L, 19L), (10079L, 23L), (10091L, 29L),
    (10093L, 31L), (10099L, 37L), (10103L, 41L), (10111L, 43L),
    (10133L, 47L), (10139L, 53L), (10141L, 59L), (10151L, 61L))

  private val A = SEEDS.map(_._1).toArray
  private val B = SEEDS.map(_._2).toArray

  /** Returns null for an empty array (no shingles → no signature);
    * headroom: h mod P < 2^31, * a < 2^45, + b — no overflow. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(16)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val hm = arr.getLong(i) % P
        var j = 0
        while (j < 16) {
          val v = (hm * A(j) + B(j)) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) return null
    new GenericArrayData(mins)
  }
}

/** Native whitespace tokenizer: the array of maximal runs of
  * non-whitespace characters — bit-identical to the declarative
  * `filter(split(s, "\\s+"), t -> t <> '')` (Java regex `\s` is the
  * six ASCII whitespace chars unless UNICODE_CHARACTER_CLASS is set,
  * so a run of non-ASCII whitespace like U+00A0 is part of a token in
  * both spellings — WsTokensSpec pins this).
  *
  * WHY NATIVE: `filter` is a higher-order function, so the declarative
  * spelling runs on the shared interpreted eval dispatch that round 5
  * measured degrading 5x in long-lived JVMs (see MinHashSigs). The
  * tokenizer feeds TEN gated queries (l4/x4/x5/x6/x14/x17/x20/x22/
  * x25/x26) — the widest single interpreted surface in the engine —
  * and the native form also skips the regex machinery and the
  * intermediate empty-string entries entirely.
  */
case class WsTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ws_tokens requires a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_ws_tokens"

  override def nullSafeEval(input: Any): Any =
    WsTokens.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WsTokens.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): WsTokens =
    copy(child = newChild)
}

object WsTokens {
  /** Java regex \s without UNICODE_CHARACTER_CLASS: exactly these six. */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    val len = str.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < len) {
      while (i < len && isWs(str.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(str.charAt(i))) i += 1
      if (i > start) out += UTF8String.fromString(str.substring(start, i))
    }
    new GenericArrayData(out.toArray)
  }
}

/** Native token n-grams: the array of space-joined runs of n adjacent
  * tokens — bit-identical to the declarative
  * `transform(sequence(1, size(toks)-n+1), i -> concat_ws(' ',
  * slice(toks, i, n)))` whenever size(toks) >= n. For shorter inputs
  * this returns the EMPTY array, where the unguarded declarative form
  * would feed a DESCENDING `sequence(1, 0)` into slice; every caller
  * guards `size >= n`, and TokenNgramsSpec pins both facts.
  *
  * WHY NATIVE: the transform+slice+concat_ws lambda chain is the
  * dominant per-row cost of the n-gram queries (x20 bigrams, x22
  * decontamination 8-grams, x25 repetition 3-grams) and runs on the
  * interpreted HOF path that round 5 measured degrading 5x in
  * long-lived JVMs (see MinHashSigs). One pass, one UTF8String concat
  * per position, inside whole-stage codegen.
  */
case class TokenNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram length must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_token_ngrams requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_token_ngrams"

  override def nullSafeEval(input: Any): Any =
    TokenNgrams.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenNgrams.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): TokenNgrams =
    copy(child = newChild)
}

object TokenNgrams {
  private val SEP = UTF8String.fromString(" ")

  def compute(arr: ArrayData, n: Int): ArrayData = {
    val sz = arr.numElements()
    val m = sz - n + 1
    if (m <= 0) return new GenericArrayData(new Array[Any](0))
    val toks = new Array[UTF8String](sz)
    var i = 0
    while (i < sz) { toks(i) = arr.getUTF8String(i); i += 1 }
    val out = new Array[Any](m)
    val parts = new Array[UTF8String](n)
    var p = 0
    while (p < m) {
      System.arraycopy(toks, p, parts, 0, n)
      out(p) = UTF8String.concatWs(SEP, parts: _*)
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** Native greedy BPE pair merge: one left-to-right pass over the token
  * array replacing each adjacent (a, b) occurrence with the merged
  * symbol, where a consumed token cannot start another match — exactly
  * the reference BPE trainer's re-tokenization (Sennrich et al. 2016).
  * `[a, b, a, b]` merges to `[ab, ab]` and `[a, a, a]` (pair (a, a))
  * to `[aa, a]`. The previous x30 spelling — non-overlapping string
  * replace over the space-joined symbols — under-merged pairs that
  * share only the delimiter space (`' a b a b '` matched once because
  * the match consumed the middle space, yielding `ab a b`); ADVICE r6
  * flagged the divergence, and this expression replaces it with the
  * faithful array pass on both engines (the oracle states the same
  * scan as a candidate-chain parity formula — see BpeQueries).
  *
  * The merge pair and its fused form are plan literals (one merge rule
  * per training round), carried as constructor params like
  * TokenNgrams' n and installed as codegen references.
  */
case class PairMerge(child: Expression, a: String, b: String, merged: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pair_merge requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_pair_merge"

  private lazy val aU = UTF8String.fromString(a)
  private lazy val bU = UTF8String.fromString(b)
  private lazy val mU = UTF8String.fromString(merged)

  override def nullSafeEval(input: Any): Any =
    PairMerge.compute(input.asInstanceOf[ArrayData], aU, bU, mU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("pmA", aU, classOf[UTF8String].getName)
    val bRef = ctx.addReferenceObj("pmB", bU, classOf[UTF8String].getName)
    val mRef = ctx.addReferenceObj("pmM", mU, classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PairMerge.compute($c, $aRef, $bRef, $mRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): PairMerge =
    copy(child = newChild)
}

object PairMerge {
  def compute(arr: ArrayData, a: UTF8String, b: UTF8String,
      merged: UTF8String): ArrayData = {
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    i = 0
    while (i < n) {
      if (i + 1 < n && toks(i).equals(a) && toks(i + 1).equals(b)) {
        out += merged
        i += 2
      } else {
        out += toks(i)
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** Native count of the common elements of two SORTED DISTINCT
  * array<bigint> columns — `size(array_intersect(a, b))` for exactly
  * the arrays [[ShingleHashSet]] produces, without materializing the
  * intersection. `array_intersect` builds a per-call hash set of one
  * side plus an output array the caller immediately reduces to its
  * size; the exact-verify joins of x2/x52 run that once per candidate
  * pair over full shingle-set arrays — the dominant per-pair term of
  * the containment row (VERDICT r14 item 4). This expression is one
  * merge walk over the two sorted arrays: O(|a|+|b|) long comparisons,
  * ZERO allocation, inside whole-stage codegen, and it exits as soon
  * as either side is exhausted (the "early exit" a hash-set intersect
  * cannot take). REQUIRES both inputs sorted ascending and distinct
  * with no null elements — ShingleHashSet's documented output
  * contract; SortedIntersectCountSpec pins bit parity against
  * size(array_intersect) on such inputs.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_sorted_intersect_count requires two array<bigint> arguments, " +
          s"got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedIntersectCount.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Merge walk over two sorted-ascending distinct long arrays. */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1L; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }
}

object ShingleExpressions {
  /** Sorted distinct n-gram shingle-hash array of a string column. */
  def shingleSet(text: Column, n: Int): Column =
    Bridge.column(ShingleHashSet(Bridge.expression(text), n))

  /** Space-joined n-grams of adjacent tokens of an array<string> column. */
  def tokenNgrams(toks: Column, n: Int): Column =
    Bridge.column(TokenNgrams(Bridge.expression(toks), n))

  /** Greedy left-to-right BPE merge of adjacent (a, b) into merged. */
  def pairMerge(toks: Column, a: String, b: String, merged: String): Column =
    Bridge.column(PairMerge(Bridge.expression(toks), a, b, merged))

  /** Whitespace tokens (maximal non-\s runs) of a string column. */
  def wsTokens(text: Column): Column =
    Bridge.column(WsTokens(Bridge.expression(text)))

  /** Native 32-bit simhash of a (pre-lowercased) string column. */
  def simhash32(text: Column): Column =
    Bridge.column(SimHash32(Bridge.expression(text)))

  /** 16-lane minhash signature array of a shingle-hash array column. */
  def minhashSigs(hs: Column): Column =
    Bridge.column(MinHashSigs(Bridge.expression(hs)))

  /** |a ∩ b| of two sorted-distinct array<bigint> columns (no
    * intersection array materialized — see [[SortedIntersectCount]]). */
  def sortedIntersectCount(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCount(Bridge.expression(a), Bridge.expression(b)))
}
