package graft

import org.apache.spark.sql.functions._
import graft.graph.GraphStore
import graft.gql.GqlExecutor
import graft.model.PropValue

/** FIXTURES §3: the full PropValue union — heterogeneous Vec, Null,
  * NaN, coercions (graph/core/src/lib.rs:107-120, :183-189,
  * :257-263).
  */
class PropValueSpec extends SparkSpec {

  lazy val store: GraphStore = GraphStore.fromTuples(spark,
    Seq((1L, "T", Seq(
      "name" -> "Alice",
      "age" -> 30,
      "score" -> 95.5,
      "active" -> true,
      "tags" -> Seq("engineer", 1),
      "nil" -> null,
      "nan" -> Double.NaN))),
    Nil)

  test("variant kinds round-trip") {
    val row = store.vertices.select(
      PropValue.asString(col("props")("name")),
      PropValue.asLong(col("props")("age")),
      PropValue.asDouble(col("props")("score")),
      PropValue.asBool(col("props")("active"))).head()
    assert(row.getString(0) == "Alice")
    assert(row.getLong(1) == 30L)
    assert(row.getDouble(2) == 95.5)
    assert(row.getBoolean(3))
  }

  test("heterogeneous vec preserves elements and kinds") {
    val arr = store.vertices.select(col("props")("tags")("arr")).head().getSeq[org.apache.spark.sql.Row](0)
    assert(arr.length == 2)
    assert(arr(0).getAs[String]("s") == "engineer")
    assert(arr(1).getAs[Long]("i") == 1L)
  }

  test("int→float coercion: age compares against float literals") {
    val r = GqlExecutor.run(store, "MATCH (v:T) WHERE v.age > 29.5 RETURN v").df
    assert(r.count() == 1)
  }

  test("null prop comparisons are false, not errors (3-valued logic)") {
    val eq = GqlExecutor.run(store, "MATCH (v:T) WHERE v.nil = 1 RETURN v").df
    assert(eq.count() == 0)
    val neq = GqlExecutor.run(store, "MATCH (v:T) WHERE v.nil != 1 RETURN v").df
    assert(neq.count() == 0) // reference: None ordering → predicate false
  }

  test("NaN groups as equal in aggregation keys (canonical-NaN intent)") {
    import spark.implicits._
    val df = Seq(Double.NaN, Double.NaN, 1.0).toDF("x")
    val groups = df.groupBy("x").count().collect()
    assert(groups.length == 2) // both NaNs in one group
  }

  test("render formats scalars like the reference Display") {
    val row = store.vertices.select(
      PropValue.render(col("props")("name")),
      PropValue.render(col("props")("age")),
      PropValue.render(col("props")("active")),
      PropValue.render(col("props")("nil"))).head()
    assert(row.getString(0) == "Alice")
    assert(row.getString(1) == "30")
    assert(row.getString(2) == "true")
    assert(row.isNullAt(3))
  }
}
