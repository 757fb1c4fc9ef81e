package graft.functions

import graft.core.{Bm25, LenByte}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the engine's scalar kernels — preferred
  * over Scala UDFs because they participate in whole-stage codegen
  * (`doGenCode` emits straight-line Java into the generated stage, no
  * boxing/closure dispatch).
  *
  * - [[LenByteEncode]]: the reference's lossy 1-byte doc-length code (F4,
  *   `utils.h:301-329`) as `int -> int` bit arithmetic.
  * - [[Bm25Idf]]: `ln(1 + (N - df + 0.5)/(df + 0.5))` (F5, `scoring.h:21-25`).
  *
  * Registered for SQL via [[GraftExtensions]]
  * (`SparkSession.builder.withExtensions(new GraftExtensions)`), or use the
  * [[functions]] Column wrappers directly.
  */
case class LenByteEncode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_len_byte requires BIGINT, got ${child.dataType.simpleString}")
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any = LenByte.encode(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val nb = ctx.freshName("numBits")
      val sh = ctx.freshName("shift")
      s"""
         |long v = $c & 0xffffffffL;
         |int $nb = 64 - java.lang.Long.numberOfLeadingZeros(v);
         |if ($nb < 4) {
         |  ${ev.value} = (int) v;
         |} else {
         |  int $sh = $nb - 4;
         |  ${ev.value} = (int) (((((v >>> $sh) & 0x07L) | ((long)($sh + 1) << 3)) & 0xffL));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LenByteEncode =
    copy(child = newChild)
}

/** encode∘decode of the 1-byte length code — the lossy length BM25 actually
  * scores with (`utils.h:301-329` + `doc_length_store.h:110`). */
case class LenByteLossy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_len_lossy requires BIGINT, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = LenByte.lossy(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val nb = ctx.freshName("numBits")
      val sh = ctx.freshName("shift")
      val code = ctx.freshName("code")
      val bits = ctx.freshName("bits")
      val sh2 = ctx.freshName("shift2")
      s"""
         |long v = $c & 0xffffffffL;
         |int $nb = 64 - java.lang.Long.numberOfLeadingZeros(v);
         |int $code;
         |if ($nb < 4) {
         |  $code = (int) v;
         |} else {
         |  int $sh = $nb - 4;
         |  $code = (int) ((((v >>> $sh) & 0x07L) | ((long)($sh + 1) << 3)) & 0xffL);
         |}
         |int $bits = $code & 0x07;
         |int $sh2 = (($code & 0xff) >>> 3) - 1;
         |${ev.value} = ($sh2 == -1) ? (long) $bits
         |  : (((long)($bits | 0x08)) << $sh2) & 0xffffffffL;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LenByteLossy =
    copy(child = newChild)
}

case class Bm25Idf(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "graft_bm25_idf requires (BIGINT, BIGINT)")
  override def dataType: DataType = DoubleType
  override def nullSafeEval(n: Any, df: Any): Any =
    Bm25.idf(n.asInstanceOf[Long], df.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (n, df) =>
      s"${ev.value} = java.lang.Math.log(1.0d + ($n - $df + 0.5d) / ($df + 0.5d));")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Bm25Idf =
    copy(left = l, right = r)
}

/** Exact int64 dot product of two `array<bigint>` columns — the embedding
  * similarity kernel. A codegen'd while-loop over `ArrayData`; the
  * higher-order `aggregate(zip_with(...))` equivalent is interpreted
  * per-element (observed ~50x slower on all-pairs cosine workloads). */
case class LongArrayDot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_long_dot requires (ARRAY<BIGINT>, ARRAY<BIGINT>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): LongArrayDot =
    copy(left = l, right = r)
}

/** Column wrappers. `len_byte`/`bm25_idf` go via the public `call_function`
  * API — requires [[GraftFunctions.register]] (or [[GraftExtensions]]) on
  * the session; `long_dot` wraps its expression directly (no registration
  * needed — usable from pure-Column code like [[graft.ops.Similarity]]). */
object functions {
  import org.apache.spark.sql.functions.call_function
  import org.apache.spark.sql.graft.ColumnBridge
  def len_byte(c: Column): Column = call_function("graft_len_byte", c)
  def bm25_idf(nDocs: Column, df: Column): Column =
    call_function("graft_bm25_idf", nDocs, df)
  def long_dot(a: Column, b: Column): Column =
    ColumnBridge.column(LongArrayDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def len_lossy(c: Column): Column =
    ColumnBridge.column(LenByteLossy(ColumnBridge.expression(c)))
}

/** SQL-side registration: `graft_len_byte(len)`, `graft_bm25_idf(n, df)`,
  * `graft_long_dot(a, b)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_len_byte"),
        new ExpressionInfo(classOf[LenByteEncode].getName, "graft_len_byte"),
        (args: Seq[Expression]) => LenByteEncode(args.head)))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_bm25_idf"),
        new ExpressionInfo(classOf[Bm25Idf].getName, "graft_bm25_idf"),
        (args: Seq[Expression]) => Bm25Idf(args(0), args(1))))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_long_dot"),
        new ExpressionInfo(classOf[LongArrayDot].getName, "graft_long_dot"),
        (args: Seq[Expression]) => LongArrayDot(args(0), args(1))))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_len_lossy"),
        new ExpressionInfo(classOf[LenByteLossy].getName, "graft_len_lossy"),
        (args: Seq[Expression]) => LenByteLossy(args.head)))
  }
}

/** Imperative registration for an existing session (tests, REPL). */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_len_byte", args => LenByteEncode(args.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bm25_idf", args => Bm25Idf(args(0), args(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_long_dot", args => LongArrayDot(args(0), args(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_len_lossy", args => LenByteLossy(args.head), "built-in")
  }
}
