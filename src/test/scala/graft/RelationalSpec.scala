package graft

import graft.operators.RelationalQueries

class RelationalSpec extends SparkSpec {

  test("every relational query runs and returns rows at sf0.001") {
    RelationalQueries.all.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every relational query has an oracle") {
    assert(RelationalQueries.oracles.keySet == RelationalQueries.all.keySet)
  }

  test("a1_agg groups are the 3 returnflag/linestatus combos of TPC-H") {
    val rows = RelationalQueries.all("a1_agg")(spark, sf).collect()
    assert(rows.length >= 3)
    val cnts = rows.map(_.getAs[Long]("cnt"))
    assert(cnts.forall(_ > 0))
  }

  test("w1_topk is sorted desc by totalprice") {
    val prices = RelationalQueries.all("w1_topk")(spark, sf)
      .collect().map(_.getAs[Double]("o_totalprice"))
    assert(prices.length == 10)
    assert(prices.sliding(2).forall { case Array(a, b) => a >= b })
  }

  test("a10 percentile interpolation matches quantile_cont rank math") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    // linear interpolation at rank p·(n−1): p=.25 over {1,2,3,4} →
    // rank .75 → 1.75; p=.5 → 2.5; p=.9 → rank 2.7 → 3.7 — the same
    // rule DuckDB's quantile_cont applies, which is why the driver
    // oracle can hash-match an "exotic" aggregate at all
    val r = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
      .agg(expr("percentile(x, 0.25)"), expr("percentile(x, 0.5)"),
        expr("percentile(x, 0.9)")).head()
    assert(r.getDouble(0) == 1.75 && r.getDouble(1) == 2.5)
    assert(math.abs(r.getDouble(2) - 3.7) < 1e-12)
  }

  test("a11 pivot has the fixed priority schema, no discovery pass") {
    val df = RelationalQueries.all("a11_pivot")(spark, sf)
    assert(df.columns.toSeq == Seq("o_orderstatus", "p_urgent", "p_high",
      "p_medium", "p_notspec", "p_low"))
    // explicit value list ⇒ single aggregate, no separate
    // distinct-collect job: the plan has exactly one Aggregate
    val aggs = df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.nonEmpty && aggs.size <= 2) // pivot lowers to ≤2 aggs
  }

  test("events loader yields TimestampType ts despite NANOS parquet") {
    import org.apache.spark.sql.types.TimestampType
    val ev = graft.sources.Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.count() > 0)
  }
}
