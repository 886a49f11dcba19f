package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native Catalyst expression for the float-embedding dot product.
  *
  * Why a custom Expression (the only one in the engine): Spark's
  * higher-order array functions (`zip_with` + `aggregate`) don't
  * participate in whole-stage codegen — every pair evaluation walks
  * an interpreted lambda tree, measured ~10× slower than primitive
  * loops on the O(n²) similarity joins. This expression generates a
  * tight float loop inside the surrounding codegen stage.
  *
  * Semantics match Similarity.dot exactly: per-element float→double
  * promotion, sequential left-to-right summation (cross-engine
  * reproducible). Null elements are not expected in embedding arrays
  * (loader-enforced); a null INPUT array yields null (NullIntolerant
  * via BinaryExpression's default nullable handling).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"vec_dot expects two ARRAY<FLOAT> arguments, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

/** Codegen'd intersection size of two SORTED ARRAY<BIGINT> columns
  * (two-pointer merge, no allocation). Built for set-similarity
  * verification: a document's shingle-hash set rides a broadcast as
  * one sorted array, and exact Jaccard for a candidate pair becomes
  * one primitive loop INSIDE the join's codegen stage — no
  * per-candidate join fan-out over exploded shingle rows. Sortedness
  * is the caller's contract (use sort_array); unsorted inputs give
  * undefined counts.
  */
case class SortedLongIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"sorted_intersect expects two ARRAY<BIGINT> arguments, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersect =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect"
}

object VecExpressions {
  private val registered = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]())

  /** Register the custom expressions in the session's function
    * registry (idempotent per session) — Spark 4 constructs Columns
    * through the registry, not from raw Expressions.
    */
  def ensureRegistered(spark: SparkSession): Unit =
    if (registered.add(spark.sessionState.toString)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "vec_dot", exprs => FloatVecDot(exprs(0), exprs(1)), "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "sorted_intersect",
        exprs => SortedLongIntersect(exprs(0), exprs(1)), "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "bloom_might_contain",
        exprs => org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
    }

  def sortedIntersect(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    call_function("sorted_intersect", a, b)
  }

  def vecDot(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    call_function("vec_dot", a, b)
  }

  def vecNorm(spark: SparkSession, a: Column): Column = {
    ensureRegistered(spark)
    org.apache.spark.sql.functions.sqrt(call_function("vec_dot", a, a))
  }

  /** Codegen'd Bloom-filter membership probe — Spark's own
    * `BloomFilterMightContain` (the predicate its runtime row-group
    * filtering injects), exposed for map-side pre-filters against a
    * serialized `org.apache.spark.util.sketch.BloomFilter`. `filter`
    * must be a foldable BINARY (e.g. `lit(bytes)`), `value` a LONG.
    */
  def bloomMightContain(spark: SparkSession, filter: Column,
      value: Column): Column = {
    ensureRegistered(spark)
    call_function("bloom_might_contain", filter, value)
  }
}
