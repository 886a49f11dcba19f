package graft.views

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.graph.GraphStore

/** V9: the SQL view path. The reference validates SQL view
  * definitions with sqlparser-rs and whitelists FROM tables
  * (graph/views/src/sql_parser.rs:49-168, table check :135-139);
  * here `spark.sql` supplies the full parser/planner and we keep the
  * catalog whitelist as the safety check. Unlike the reference, there
  * is no DISTINCT/LIMIT/complex-FROM rejection — Catalyst handles
  * all of it, which strictly supersedes the reference's validator.
  */
object SqlViews {

  val allowedTables: Set[String] = Set("vertices", "edges", "changes")

  /** Register a GraphStore's frames under the whitelisted names. */
  def registerGraph(store: GraphStore): Unit = {
    store.vertices.createOrReplaceTempView("vertices")
    store.edges.createOrReplaceTempView("edges")
    store.changes.createOrReplaceTempView("changes")
  }

  /** Parse-check table references against the whitelist, then run.
    * Table names are extracted from the analyzed-before-execution
    * logical plan, not regexes, so aliases/subqueries are covered.
    */
  def runSqlView(spark: SparkSession, sql: String): DataFrame = {
    val plan = spark.sessionState.sqlParser.parsePlan(sql)
    val referenced = plan.collect {
      case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
        r.tableName.toLowerCase
    }.toSet
    val illegal = referenced -- allowedTables
    require(illegal.isEmpty,
      s"SQL view may only read ${allowedTables.mkString("/")}; found $illegal")
    spark.sql(sql)
  }
}
