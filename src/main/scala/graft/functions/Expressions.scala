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

/** Symmetric max-abs int8 quantization of an `array<bigint>` vector:
  * q_j = round(v_j · 127 / max|v|) ∈ [−127, 127] (zero vector unchanged).
  * One codegen'd pass; the Column-HOF equivalent
  * (`array_max(transform(abs))` + `transform(round(...))`) is three
  * interpreted passes per row. Rounding is HALF-AWAY-FROM-ZERO (SQL
  * `round` in Spark and DuckDB alike) — NOT `Math.round`, whose
  * floor(x+0.5) sends −2.5 to −2 while both engines send it to −3. */
case class Int8Quantize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_int8 requires ARRAY<BIGINT>, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = v.numElements()
    var s = 0L
    var i = 0
    while (i < n) { val x = math.abs(v.getLong(i)); if (x > s) s = x; i += 1 }
    val out = new Array[Long](n)
    i = 0
    if (s == 0L) while (i < n) { out(i) = v.getLong(i); i += 1 }
    else while (i < n) {
      val d = v.getLong(i) * 127.0 / s
      out(i) = (if (d >= 0) math.floor(d + 0.5) else math.ceil(d - 0.5)).toLong
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("maxAbs")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $x = java.lang.Math.abs($a.getLong($i));
         |  if ($x > $s) $s = $x;
         |}
         |long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  double d = $a.getLong($i) * 127.0d / ($s == 0L ? 1L : $s);
         |  $out[$i] = ($s == 0L) ? $a.getLong($i)
         |    : (long) (d >= 0 ? java.lang.Math.floor(d + 0.5d)
         |                     : java.lang.Math.ceil(d - 0.5d));
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Int8Quantize =
    copy(child = newChild)
}

/** Slot-ordered deterministic score sum over `array<struct<slot:int,
  * v:double>>`: sorts the (unique-slot) entries by slot ascending and adds
  * left to right — bitwise-identical to the reference's per-slot scoring
  * loop (`scoring.h:133-142`) regardless of the order `collect_list`
  * delivered them in.
  *
  * This replaces the previous N-column `sum(when(slot = i, v))` pivot in
  * the batched search aggregations: the pivot costs N aggregate buffers per
  * row (N = the WIDEST query's slot count — 64 for a capped prefix
  * expansion — paid by every row of every query in the batch; measured 2x
  * on the bench query log), while a list collect is O(1) per row and this
  * expression's sort+sum runs once per GROUP over ≤N entries. Skipping
  * absent slots is exact: partial scores are strictly positive, and
  * `x + 0.0 == x` bitwise for positive x, so dropping the `coalesce(_, 0)`
  * terms of the pivot form cannot change the sum. */
case class SlotOrderedSum(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(s: StructType, _) if s.length == 2 &&
        s(0).dataType == IntegerType && s(1).dataType == DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_slot_sum requires ARRAY<STRUCT<INT, DOUBLE>>, got ${other.simpleString}")
    }
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val slots = new Array[Int](n)
    val vals = new Array[Double](n)
    var i = 0
    while (i < n) {
      val s = arr.getStruct(i, 2)
      slots(i) = s.getInt(0)
      vals(i) = s.getDouble(1)
      i += 1
    }
    var j = 1
    while (j < n) { // insertion sort by slot (n <= query width)
      val ks = slots(j); val kv = vals(j)
      var m = j - 1
      while (m >= 0 && slots(m) > ks) {
        slots(m + 1) = slots(m); vals(m + 1) = vals(m); m -= 1
      }
      slots(m + 1) = ks; vals(m + 1) = kv
      j += 1
    }
    var acc = 0.0
    i = 0
    while (i < n) { acc += vals(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val slots = ctx.freshName("slots")
      val vals = ctx.freshName("vals")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val ks = ctx.freshName("ks")
      val kv = ctx.freshName("kv")
      val acc = ctx.freshName("acc")
      val row = ctx.freshName("row")
      s"""
         |int $n = $a.numElements();
         |int[] $slots = new int[$n];
         |double[] $vals = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  org.apache.spark.sql.catalyst.InternalRow $row = $a.getStruct($i, 2);
         |  $slots[$i] = $row.getInt(0);
         |  $vals[$i] = $row.getDouble(1);
         |}
         |for (int $j = 1; $j < $n; $j++) {
         |  int $ks = $slots[$j]; double $kv = $vals[$j];
         |  int $m = $j - 1;
         |  while ($m >= 0 && $slots[$m] > $ks) {
         |    $slots[$m + 1] = $slots[$m]; $vals[$m + 1] = $vals[$m]; $m--;
         |  }
         |  $slots[$m + 1] = $ks; $vals[$m + 1] = $kv;
         |}
         |double $acc = 0.0d;
         |for (int $i = 0; $i < $n; $i++) { $acc += $vals[$i]; }
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SlotOrderedSum =
    copy(child = newChild)
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
  /** [[LenByteEncode]] wrapped directly (registration-free) — for engine
    * code like [[graft.index.Integrity]] that runs on arbitrary sessions. */
  def len_code(c: Column): Column =
    ColumnBridge.column(LenByteEncode(ColumnBridge.expression(c)))
  def slot_sum(c: Column): Column =
    ColumnBridge.column(SlotOrderedSum(ColumnBridge.expression(c)))
  def int8(c: Column): Column =
    ColumnBridge.column(Int8Quantize(ColumnBridge.expression(c)))
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
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_slot_sum"),
        new ExpressionInfo(classOf[SlotOrderedSum].getName, "graft_slot_sum"),
        (args: Seq[Expression]) => SlotOrderedSum(args.head)))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_match"),
        new ExpressionInfo(classOf[graft.plans.GraftMatch].getName, "graft_match"),
        (args: Seq[Expression]) => graft.plans.GraftMatch(args(0), args(1), args(2))))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_phrase"),
        new ExpressionInfo(classOf[graft.plans.GraftPhrase].getName, "graft_phrase"),
        (args: Seq[Expression]) => graft.plans.GraftPhrase(args(0), args(1), args(2))))
    // index-aware acceleration: rewrite graft_match filters into posting-list
    // semi-joins when an IndexCatalog entry covers them (graft.plans)
    ext.injectOptimizerRule(s => graft.plans.IndexSemiJoinRule(s))
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
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_slot_sum", args => SlotOrderedSum(args.head), "built-in")
  }
}
