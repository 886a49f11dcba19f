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

  test("events loader yields TimestampType ts despite NANOS parquet") {
    import org.apache.spark.sql.types.TimestampType
    val ev = graft.sources.Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.count() > 0)
  }
}
