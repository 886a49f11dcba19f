package graft.gql

import org.apache.spark.sql.DataFrame
import graft.graph.GraphStore
import graft.views.Views
import graft.views.Views._
import Ast._

/** §3.2 front door — the reference's register → route → serve loop
  * (graph/views/src/query_router.rs + demo flows): a GQL query is
  * parsed, classified into the router's QueryPattern taxonomy, and
  * offered to the view catalog; a registered view with a qualifying
  * match score serves its materialized data (freshness is the
  * refresh policy's job, V2), anything else falls through to direct
  * execution via GqlExecutor. The router never inspects data — the
  * classify/score/route decision is driver-side metadata, and the
  * served answer is whatever DataFrame the view maintains.
  */
object RoutedGql {

  /** Result + provenance: which view served it (None = executed). */
  case class Routed(df: DataFrame, store: GraphStore, servedBy: Option[String])

  /** GQL statement → router QueryPattern (the GQL-side analogue of
    * analyze_query, query_router.rs:96-180):
    * - any RETURN aggregate → Aggregation (typed by the first
    *   aggregate function, as the reference types by aggregate_type)
    * - pattern with edges → EdgeTraversal
    * - single-node scans and everything else → the SQL catch-all
    *   (score 50, routable only to SqlQuery views).
    * CREATE/DELETE are writes — never routed.
    */
  def classify(stmt: Statement, raw: String): Option[QueryPattern] = stmt match {
    case m: MatchStatement =>
      // unwrap AS aliases: `RETURN count(c) AS cnt` must classify the
      // same as `RETURN count(c)` or it routes past the agg views
      val agg = m.ret.collectFirst {
        case ReturnAggregate(f, _, _, _) => f
        case ReturnAliased(ReturnAggregate(f, _, _, _), _) => f
      }
      Some(agg match {
        case Some(f) => AggPattern(f)
        case None if m.pattern.exists(_.edges.nonEmpty) ||
            m.optional.nonEmpty || m.pre.nonEmpty =>
          TraversalPattern("expand")
        case None => SqlPattern(raw)
      })
    case _ => None
  }

  def run(store: GraphStore, catalog: ViewCatalog, query: String): Routed =
    GqlParser.parse(query) match {
      case Left(err) => throw new IllegalArgumentException(err)
      case Right(stmt) =>
        val router = new Views.QueryRouter(catalog)
        val hit = for {
          pattern <- classify(stmt, query)
          name <- router.route(pattern)
          df <- catalog.dataOf(name)
        } yield Routed(df, store, Some(name))
        hit.getOrElse {
          val r = GqlExecutor.execute(store, stmt)
          Routed(r.df, r.store, None)
        }
    }
}
