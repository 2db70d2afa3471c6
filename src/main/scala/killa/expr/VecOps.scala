package killa.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst vector kernels for the ANN / quantization family.
  *
  * The similarity math previously ran through `aggregate(zip_with(...))`
  * higher-order functions. Those are CodegenFallback in Spark: every array
  * element allocates lambda-variable boxes and evaluates an interpreted
  * expression tree, and a cosine costs THREE such traversals (dot, ‖a‖, ‖b‖).
  * On pair-join stages (near-dup verify, brute-force / rescore top-k) that
  * interpreted fold was the dominant per-row cost of the whole ANN family.
  *
  * Each expression here is the BIT-IDENTICAL twin of the HOF form it
  * replaces — same element casts, same ascending-index accumulation order,
  * same null semantics (documented per op, pinned by Round6Spec equality
  * properties over randomized vectors including null elements, mismatched
  * lengths, empty and zero vectors):
  *
  *  - [[DotProduct]]  ≡ aggregate(zip_with(a, b, (x,y) => x.cast(D)*y.cast(D)), 0.0, +)
  *  - [[CosineSim]]   ≡ DotProduct(a,b) / (sqrt(DotProduct(a,a)) * sqrt(DotProduct(b,b)))
  *  - [[DotCodes]]    ≡ aggregate(zip_with(a, b, _*_), 0L, acc + coalesce(x, 0L))
  *  - [[HammingLanes]]≡ aggregate(zip_with(a, b, bit_count(a^b).cast(L)), 0L, acc + coalesce)
  *
  * doGenCode emits one static call, so the surrounding stage keeps
  * whole-stage codegen and the loop runs over the columnar ArrayData with
  * primitive accumulators — no per-element boxing.
  */
object VecOps {
  /** Element accessor dispatch code for a numeric array element type. */
  def typeCode(dt: DataType): Int = dt match {
    case FloatType => 0
    case DoubleType => 1
    case LongType => 2
    case IntegerType => 3
    case other => throw new IllegalArgumentException(
      s"VecOps: unsupported array element type $other")
  }

  @inline private def elem(v: ArrayData, i: Int, t: Int): Double = t match {
    case 0 => v.getFloat(i).toDouble
    case 1 => v.getDouble(i)
    case 2 => v.getLong(i).toDouble
    case _ => v.getInt(i).toDouble
  }

  @inline private def elemL(v: ArrayData, i: Int, t: Int): Long = t match {
    case 2 => v.getLong(i)
    case 3 => v.getInt(i).toLong
    case t0 => throw new IllegalArgumentException(s"VecOps: integer op on element type code $t0")
  }

  /** Ordered-fold dot product. Null contract of the HOF form: zip_with pads
    * the shorter array with null and `acc + null` poisons the fold, so a
    * length mismatch or ANY null element yields NULL.
    */
  def dot(a: ArrayData, b: ArrayData, ta: Int, tb: Int): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += elem(a, i, ta) * elem(b, i, tb)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** One-pass cosine — dot, ‖a‖² and ‖b‖² accumulate in the same ascending
    * index order as three independent folds would, so every sum (and hence
    * the final IEEE divide) is bit-identical to the composed HOF form.
    * Same NULL contract as [[dot]] (any norm's fold is over the same
    * elements, so one null check covers all three folds).
    */
  def cosine(a: ArrayData, b: ArrayData, ta: Int, tb: Int): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dp = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = elem(a, i, ta)
      val y = elem(b, i, tb)
      dp += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dp / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** Integer code dot (int8 phase-1 ranking): null elements and the
    * padded tail of a length mismatch contribute 0 (the HOF form's
    * `coalesce(x, 0L)`), so the fold runs over the common prefix. Codes are
    * bounded (|x| ≤ 127), so the long accumulation cannot overflow where
    * the ANSI HOF form would have thrown.
    */
  def dotCodes(a: ArrayData, b: ArrayData, ta: Int, tb: Int): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) acc += elemL(a, i, ta) * elemL(b, i, tb)
      i += 1
    }
    acc
  }

  /** Σ popcount(aᵢ ^ bᵢ) over packed sign-bit lanes — same
    * skip-null/pad-zero contract as [[dotCodes]].
    */
  def hammingLanes(a: ArrayData, b: ArrayData, ta: Int, tb: Int): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i))
        acc += java.lang.Long.bitCount(elemL(a, i, ta) ^ elemL(b, i, tb)).toLong
      i += 1
    }
    acc
  }
}

/** Shared shape of the four binary vector kernels: resolve element-type
  * dispatch codes lazily (children are unresolved at construction), emit one
  * static call from generated code.
  */
sealed abstract class VecBinaryExpression extends BinaryExpression {
  @transient protected lazy val ta: Int =
    VecOps.typeCode(left.dataType.asInstanceOf[ArrayType].elementType)
  @transient protected lazy val tb: Int =
    VecOps.typeCode(right.dataType.asInstanceOf[ArrayType].elementType)

  protected def staticCall: String

  /** Boxed-result kernels (dot/cosine) need explicit null plumbing. */
  protected def genBoxedDouble(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName: the same kernel can appear several times in one
      // whole-stage span (e.g. cosine in both a projection and a filter) —
      // a fixed local name would collide and kick the stage to interpreted
      val r = ctx.freshName("killaVecR")
      s"""
         |java.lang.Double $r = $staticCall($a, $b, $ta, $tb);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.doubleValue();
         |}
       """.stripMargin
    })
}

/** Native ordered-fold dot product (see [[VecOps.dot]]). */
case class DotProduct(left: Expression, right: Expression) extends VecBinaryExpression {
  override def dataType: DataType = DoubleType
  // null beyond child nulls: length mismatch / null elements (HOF contract)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"
  protected def staticCall: String = "killa.expr.VecOps.dot"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], ta, tb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    genBoxedDouble(ctx, ev)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** Native one-pass cosine similarity (see [[VecOps.cosine]]). */
case class CosineSim(left: Expression, right: Expression) extends VecBinaryExpression {
  override def dataType: DataType = DoubleType
  // null beyond child nulls: length mismatch / null elements (HOF contract)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_cosine"
  protected def staticCall: String = "killa.expr.VecOps.cosine"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], ta, tb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    genBoxedDouble(ctx, ev)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** Native int8-code dot (see [[VecOps.dotCodes]]). */
case class DotCodes(left: Expression, right: Expression) extends VecBinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_dot_codes"
  protected def staticCall: String = "killa.expr.VecOps.dotCodes"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dotCodes(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], ta, tb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"killa.expr.VecOps.dotCodes($a, $b, $ta, $tb)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotCodes =
    copy(left = l, right = r)
}

/** Native packed-lane hamming distance (see [[VecOps.hammingLanes]]). */
case class HammingLanes(left: Expression, right: Expression) extends VecBinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_hamming_lanes"
  protected def staticCall: String = "killa.expr.VecOps.hammingLanes"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.hammingLanes(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], ta, tb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"killa.expr.VecOps.hammingLanes($a, $b, $ta, $tb)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HammingLanes =
    copy(left = l, right = r)
}

object VecExprs {
  import org.apache.spark.sql.killashim.Shim

  def dotCol(a: Column, b: Column): Column =
    Shim.toColumn(DotProduct(Shim.toExpression(a), Shim.toExpression(b)))

  def cosineCol(a: Column, b: Column): Column =
    Shim.toColumn(CosineSim(Shim.toExpression(a), Shim.toExpression(b)))

  def dotCodesCol(a: Column, b: Column): Column =
    Shim.toColumn(DotCodes(Shim.toExpression(a), Shim.toExpression(b)))

  def hammingLanesCol(a: Column, b: Column): Column =
    Shim.toColumn(HammingLanes(Shim.toExpression(a), Shim.toExpression(b)))
}

/** Native whitespace tokenizer: array of the non-empty runs between single
  * spaces (0x20) of a string column — the codegen twin of
  * `filter(split(text, " ", -1), t => length(t) > 0)`. The HOF `filter` is
  * CodegenFallback (interpreted per element, boxed lambda variables), and
  * tokenization is the per-row hot loop of every index build and every
  * tokenize-derived query. Byte-level scan is UTF-8-safe (0x20 never occurs
  * inside a multi-byte sequence); tokens are zero-copy slices of the row's
  * byte array. Null text → null (split's contract); "" → empty array.
  * Semantics pinned by TokenizerSpec's column ≡ scala property.
  */
case class WsTokens(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ws_tokens"

  protected override def nullSafeEval(input: Any): Any =
    WsTokens.tokens(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"killa.expr.WsTokens.tokens($c)")

  override protected def withNewChildInternal(newChild: Expression): WsTokens =
    copy(child = newChild)
}

object WsTokens {
  def tokens(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[org.apache.spark.unsafe.types.UTF8String](8)
    var i = 0
    while (i < n) {
      while (i < n && bytes(i) == 0x20) i += 1
      val start = i
      while (i < n && bytes(i) != 0x20) i += 1
      if (i > start)
        out.add(org.apache.spark.unsafe.types.UTF8String.fromBytes(bytes, start, i - start))
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  def tokensCol(c: Column): Column = {
    import org.apache.spark.sql.killashim.Shim
    Shim.toColumn(WsTokens(Shim.toExpression(c)))
  }
}
