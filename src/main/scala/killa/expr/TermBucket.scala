package killa.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{lit, pmod}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import killa.util.Hashing

/** Native Catalyst expression: FNV-1a 64-bit hash of a string column.
  *
  * Replaces a Scala UDF on the index-build hot path (every forward row gets
  * a term bucket) so the whole stage stays in generated code — a UDF would
  * break the codegen span and add per-row closure dispatch. `doGenCode`
  * emits a direct static call; interpreted eval matches bit-for-bit, and
  * both match the driver-side [[Hashing.termBucket]] used for bucket
  * pruning at query time (one hash family end to end).
  */
case class Fnv1a64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "fnv1a64"

  protected override def nullSafeEval(input: Any): Any =
    Fnv1a64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"killa.expr.Fnv1a64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Fnv1a64 =
    copy(child = newChild)
}

/** Native Catalyst expression: splitmix64(input ^ salt) — one MinHash
  * permutation step as generated code. Java long arithmetic wraps on
  * overflow, which the algorithm requires; a Column-level multiply would
  * THROW under Spark's default ANSI mode, and a UDF would break the codegen
  * span of the signature aggregation (Dedup.minhashLshPairs).
  */
case class Splitmix64Xor(child: Expression, salt: Long) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "splitmix64_xor"

  protected override def nullSafeEval(input: Any): Any =
    Hashing.splitmix64(input.asInstanceOf[Long] ^ salt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"killa.util.Hashing.splitmix64($c ^ ${salt}L)")

  override protected def withNewChildInternal(newChild: Expression): Splitmix64Xor =
    copy(child = newChild)
}

object Splitmix64Xor {
  /** h → j-th MinHash permutation value: splitmix64(h ^ GOLDEN·(j+1)) —
    * bit-identical to the scalar family Dedup used from round 1.
    */
  def minhashCol(h: Column, j: Int): Column = {
    import org.apache.spark.sql.killashim.Shim
    Shim.toColumn(Splitmix64Xor(Shim.toExpression(h), 0x9e3779b97f4a7c15L * (j + 1)))
  }
}

object Fnv1a64 {
  /** Static entry the generated code calls; operates on the UTF8String's
    * bytes directly (no java.lang.String materialization per row).
    */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def fnv1a64(c: Column): Column = {
    import org.apache.spark.sql.killashim.Shim
    Shim.toColumn(Fnv1a64(Shim.toExpression(c)))
  }

  /** Make fnv1a64 / term_bucket callable from SQL text too. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.killashim.Shim.registerFunction(spark, "fnv1a64",
      exprs => Fnv1a64(exprs.head))
  }

  /** term → bucket in [0, nb): pmod(fnv1a64(term), nb), matching
    * [[killa.util.Hashing.termBucket]] exactly.
    */
  def termBucketCol(c: Column, nb: Int): Column = pmod(fnv1a64(c), lit(nb.toLong)).cast("int")
}
