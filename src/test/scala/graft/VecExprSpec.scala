package graft

import org.apache.spark.sql.functions._
import graft.functions.{Similarity, VecExpressions}

class VecExprSpec extends SparkSpec {
  import spark.implicits._

  test("FloatVecDot matches the higher-order-function dot exactly") {
    val emb = graft.sources.Tables.embeddings(spark, sf).limit(200)
    val both = emb.select(
      VecExpressions.vecDot(spark, col("embedding"), col("embedding")).as("native"),
      Similarity.dot(col("embedding"), col("embedding")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("FloatVecDot participates in whole-stage codegen") {
    val emb = graft.sources.Tables.embeddings(spark, sf).limit(10)
    val df = emb.select(
      VecExpressions.vecDot(spark, col("embedding"), col("embedding")).as("d"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan) // codegen stage marker
  }

  test("interpreted (non-codegen) eval path agrees too") {
    val r = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
      .select(VecExpressions.vecDot(spark, col("a"), col("b")))
      .head.getDouble(0)
    assert(r == 32.0)
  }

  test("type check rejects non-float arrays") {
    val bad = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(VecExpressions.vecDot(spark, col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("vec_dot")
      || e.getMessage.contains("ARRAY<FLOAT>"), e.getMessage)
  }

  test("sorted_intersect: two-pointer merge counts exactly") {
    val rows = Seq(
      (Seq(1L, 3L, 5L, 7L), Seq(3L, 4L, 5L, 9L), 2),   // {3,5}
      (Seq(1L, 2L), Seq(3L, 4L), 0),                   // disjoint
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L), 3),           // identical
      (Seq.empty[Long], Seq(1L), 0))                   // empty side
    rows.foreach { case (a, b, want) =>
      val got = Seq((a, b)).toDF("a", "b")
        .select(VecExpressions.sortedIntersect(spark, col("a"), col("b")))
        .head.getInt(0)
      assert(got === want, s"$a ∩ $b")
    }
  }

  test("sorted_intersect stays inside whole-stage codegen") {
    // LocalTableScan never codegens — drive from a codegen'd range
    val df = spark.range(10).select(VecExpressions.sortedIntersect(spark,
      sequence(lit(1L), col("id") + 1), sequence(lit(2L), col("id") + 2)).as("c"))
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("*(1)"))
  }

  test("GraftExtensions injects the SQL functions at session build") {
    // applying the extensions class to a fresh SparkSessionExtensions
    // must register both builders without error
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    // and the same builders resolve through SQL on a live session
    graft.functions.VecExpressions.ensureRegistered(spark)
    val d = spark.sql(
      "SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").head.getDouble(0)
    assert(d === 11.0)
    val c = spark.sql(
      "SELECT sorted_intersect(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS c")
      .head.getInt(0)
    assert(c === 2)
  }
}
