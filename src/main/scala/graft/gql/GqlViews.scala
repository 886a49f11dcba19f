package graft.gql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

import graft.graph.GraphStore
import graft.model.PropValue
import graft.views.Views
import graft.views.Views.{Analytics, EventDriven, ViewCatalog, ViewDefn}
import Ast._

/** GQL front door for V5c pattern views — the reference registers
  * views by QUERY (view_registry.rs register flows); here a MATCH
  * chain string IS the view definition: labels become the chain's
  * label filters, inline props blocks become the per-position
  * equality predicates the incremental machinery maintains under
  * prop updates, and the stored definition travels in the catalog's
  * ViewDefn params — stateless, re-derived at each refresh, so saved
  * catalogs round-trip.
  *
  * Accepted shapes: a single linear chain of LABELED nodes and
  * single-hop edges — outgoing `->` or undirected `-` per position
  * (undirected maintains the symmetrized bag E ∪ Eᵀ, the executor's
  * own orientation-union semantics), e.g.
  * `MATCH (a:Customer {mktsegment: "BUILDING"})-[:located_in {w: 1}]->(b:Nation)`,
  * a single BOUNDED var-length segment
  * `MATCH (a:Nation)-[:feeds*2..3]->(b:Nation)` (maintained by walk
  * counting — Views.refreshVarLengthPatternView), or a single
  * UNBOUNDED segment `MATCH (a:N)-[:dep*1..]->(b:N)` (maintained as a
  * transitive-closure reachability view, semi-naive insertion + DRed
  * deletion — Views.refreshReachabilityView; the UNDIRECTED form
  * `-[:dep*m..]-` is connected-component membership, maintained as an
  * incremental O(V) label state — r12,
  * Views.refreshUndirectedReachView), all with NO RETURN
  * (the view's rows are the bound id tuple / the distinct endpoint
  * pairs). Var-length segments may also COMPOSE with further hops
  * (`(a:N)-[:link*1..2]->(b:N)-[:owns]->(c:M)` — r10,
  * Views.refreshComposedChainView: per-segment counting sub-states
  * whose membership deltas fold through the chain; since r11 an
  * UNBOUNDED `*1..` segment composes the same way, its sub-state
  * being the closure maintained by the reachability fold). Single-hop views
  * may carry a cross-variable WHERE
  * (`... WHERE a.score > b.score` — r10,
  * Views.refreshWherePatternView: tuple-level net compare over the
  * touched-edge set, prop-flip windows included); chains may carry a
  * WHERE whose top-level AND conjuncts each bind within one hop
  * window (`(a)-[e1]->(b)-[e2]->(c) WHERE a.x > b.y AND b.z < c.w`
  * — r11, Views.refreshWhereChainView: each conjunct predicates its
  * hop's relation, maintained by the same net compare per hop).
  * Cross-position WHERE conjuncts (`a.x > c.y`), OPTIONAL/WITH
  * segments, incoming `<-` edges (flip the chain), unlabeled
  * positions, and null prop values reject with remedies: each is
  * either ambiguous as a maintained row set, has an exact rewrite,
  * or is outside the incremental contract.
  */
object GqlViews {

  private[gql] case class PatternDef(vertexLabels: Seq[String],
      edgeLabels: Seq[String], vertexPreds: Seq[Option[Column]],
      edgePreds: Seq[Option[Column]],
      ranges: Seq[Option[(Int, Int)]] = Nil,
      undirectedHops: Seq[Boolean] = Nil,
      where: Option[Expr] = None,
      nodeVars: Seq[Option[String]] = Nil,
      edgeVars: Seq[Option[String]] = Nil,
      // chain WHERE only (r11): conjuncts of `where` regrouped per
      // hop window — hopWheres(j) binds within (node j, edge j,
      // node j+1); empty for single-hop definitions
      hopWheres: Seq[Option[Expr]] = Nil)

  private def propsPred(props: Map[String, GqlValue]): Option[Column] = {
    props.foreach {
      case (k, GqlNull) => throw new IllegalArgumentException(
        s"pattern view cannot use null property '$k' — null never " +
          "matches, so the view would be permanently empty; omit the key")
      case _ => ()
    }
    if (props.isEmpty) None
    else Some(props.map { case (k, v) =>
      PropValue.compare(col("props")(k), v match {
        case GqlString(s) => s
        case GqlInt(i) => i
        case GqlFloat(d) => d
        case GqlBool(b) => b
        case GqlNull => null // unreachable (rejected above)
      }, "=")
    }.reduce(_ && _))
  }

  private[gql] def parseDef(gql: String): PatternDef = {
    // the pattern IS the whole definition — the maintained rows are
    // the bound id tuple, so a projection would be dead syntax.
    // Detected by AST, not substring: a raw-text 'return' scan would
    // falsely reject labels like (a:ReturnItem) or prop values like
    // {note: "no returns"}. A definition carrying its own RETURN
    // parses standalone as a MATCH with return items — reject THAT.
    GqlParser.parse(gql) match {
      case Right(m: MatchStatement) if m.ret.nonEmpty =>
        throw new IllegalArgumentException(
          "a pattern-view definition is a MATCH chain only (no RETURN " +
            "— the view's rows are the chain's id tuple)")
      case _ => () // no trailing RETURN: fall through to the real parse
    }
    GqlParser.parse(s"$gql RETURN count(*)") match {
      case Left(err) => throw new IllegalArgumentException(err)
      case Right(m: MatchStatement) =>
        require(m.pre.isEmpty && m.optional.isEmpty &&
            m.leadingUnwinds.isEmpty,
          "pattern views are a single MATCH chain (no WITH/OPTIONAL/UNWIND)")
        val p = m.pattern.getOrElse(throw new IllegalArgumentException(
          "pattern views need a MATCH pattern"))
        require(p.edges.nonEmpty,
          "pattern views need at least one edge (register a Lookup view " +
            "for a bare node set)")
        require(!p.shortest, "shortestPath(...) is a query, not a view shape")
        p.edges.foreach { e =>
          // undirected hops maintain the symmetrized bag E ∪ Eᵀ at
          // every position (single-hop, chain, and var-length alike —
          // the executor's own Undirected orientation-union
          // semantics); INCOMING stays rejected because `<-` has an
          // exact zero-cost rewrite (flip the chain), so maintaining
          // a second orientation convention would only fork the
          // state contract
          require(e.direction != Incoming,
            "pattern-view edges cannot point <- ; flip the chain " +
              "(the reversed -> definition maintains the same rows)")
          // var-length segments compose with further hops — BOUNDED
          // ones by counting sub-states (r10), UNBOUNDED *1.. ones by
          // closure sub-states (r11); refreshComposedChainView folds
          // both membership deltas through the chain
          require(e.label.isDefined,
            "pattern-view edges need a label (an unlabeled edge would " +
              "mix every edge type into one maintained set)")
          if (e.range.isDefined) require(e.props.isEmpty,
            "edge props cannot predicate a var-length segment (each hop " +
              "is unbound); use a single-hop view for edge predicates")
          // *0 lower bounds reject HERE, not at first refresh —
          // register() is the eager-validation contract (the executor's
          // own *0.. expansion starts at one hop anyway)
          e.range.foreach(r => require(r._1 >= 1,
            "var-length view ranges start at *1 — a *0 lower bound " +
              "adds only identity pairs, which the executor's own " +
              "expansion does not emit; register *1.. / *1..n"))
          // an INVERTED range (*5..3) is empty by construction —
          // reject it here with the other eager checks rather than
          // letting requireHops throw at first refresh
          e.range.foreach(r => require(r._1 <= r._2,
            s"var-length view range *${r._1}..${r._2} is inverted " +
              "(min > max) and matches nothing"))
          // UNBOUNDED ranges (parser-carried as Int.MaxValue) route to
          // the reachability maintainer (semi-naive + DRed) for *1..,
          // or the walk ⋈ closure composition for *m.. (r11 — a
          // length-≥m walk is an (m−1)-hop walk followed by
          // reachability, so the counting sub-states compose); the
          // shapes neither can serve reject with remedies
          if (e.range.exists(_._2 == Int.MaxValue)) {
            if (e.direction == Undirected) {
              // undirected unbounded reachability IS connected-
              // component membership, maintained as an incremental
              // label state (r12, Views.refreshUndirectedReachView);
              // every lower bound m serves the same rows (a connected
              // pair has walks of every sufficiently large length —
              // bounce on any incident edge to pad by 2), so *m..
              // needs no walk factor and no hop cap. Composition
              // stays rejected: a component merge changes
              // O(|compA|·|compB|) PAIRS, so pair-level membership
              // ops (what a chain fold consumes) are quadratic where
              // the label state itself is linear.
              require(p.edges.size == 1,
                "an undirected unbounded segment cannot compose with " +
                  "further hops — a component merge implies " +
                  "quadratically many pair-level ops for the chain " +
                  "fold to consume; register the -[*..]- segment as " +
                  "its own view and join downstream")
            } else
              require(e.range.get._1 <= 6,
                "lower-bounded reach views maintain *m.. for m <= 6 (the " +
                  "walk factor inherits the bounded family's hop cap); " +
                  "register a smaller bound and filter downstream")
          } else e.range.foreach { r =>
            // bounded ranges inherit the same hop cap the refresh
            // enforces (requireHops) — validated HERE so a *1..7
            // registration fails eagerly like *0 and *8.. do, not at
            // first refresh
            require(r._2 <= 6,
              "var-length views maintain hop ranges within [1, 6], " +
                s"got *${r._1}..${r._2} — each refresh folds one delta " +
                "level per length; register *m..6 and filter, or an " +
                "unbounded *m.. reach view if you need all lengths")
          }
        }
        p.nodes.foreach(n => require(n.label.isDefined,
          "every pattern-view node needs a label"))
        // cross-variable WHERE: single-hop views maintain ANY
        // per-row expression by tuple-level net compare (r10,
        // refreshWherePatternView); chains maintain WHEREs whose
        // top-level AND conjuncts each bind within ONE hop window
        // (node j, edge j, node j+1) — each conjunct then predicates
        // one hop's relation and its delta stays per-hop-bounded
        // (r11, refreshWhereChainView). A conjunct spanning
        // non-adjacent positions has no per-hop relation (a prop
        // flip could retest every tuple through the variable — the
        // multiplied frontier), so it rejects; remedy in message.
        var hopWheres: Seq[Option[Expr]] = Nil
        m.where.foreach { w =>
          require(p.edges.forall(e => e.range.isEmpty &&
              e.direction == Outgoing),
            "WHERE views maintain directed single-hop positions only " +
              "(no var-length or undirected hops under WHERE) — split " +
              "those segments into their own views and join " +
              "downstream, or move per-position equality tests into " +
              "inline props blocks")
          val declared = p.nodes.flatMap(_.variable) ++
            p.edges.flatMap(_.variable)
          require(declared.size == declared.toSet.size,
            "pattern-view WHERE needs distinct variable names — a " +
              "repeated variable would make the props columns " +
              "ambiguous; rename one binding")
          val vars = declared.toSet
          def walkW(x: Expr): Unit = x match {
            case PropRef(v, _) => require(vars.contains(v),
              s"WHERE references undeclared variable '$v'")
            case Literal(_) => ()
            case Comparison(l, _, r) => walkW(l); walkW(r)
            case And(l, r) => walkW(l); walkW(r)
            case Or(l, r) => walkW(l); walkW(r)
            case Not(e) => walkW(e)
            case In(l, _) => walkW(l)
            case Contains(l, r) => walkW(l); walkW(r)
            case Like(l, _) => walkW(l)
            case StartsWith(l, r) => walkW(l); walkW(r)
            case EndsWith(l, r) => walkW(l); walkW(r)
            case Arith(l, _, r) => walkW(l); walkW(r)
            case StrFunc(_, args) => args.foreach(walkW)
            case IsNull(e, _) => walkW(e)
            case other => throw new IllegalArgumentException(
              s"pattern-view WHERE cannot use $other — only " +
                "deterministic per-row expressions over the bound " +
                "variables' properties are maintainable (no pattern " +
                "predicates, no alias references)")
          }
          walkW(w)
          if (p.edges.size > 1) {
            // regroup conjuncts per hop window; validated above, so
            // the collector's catch-all cannot hide an unknown shape
            def varsOf(x: Expr): Set[String] = x match {
              case PropRef(v, _) => Set(v)
              case Comparison(l, _, r) => varsOf(l) ++ varsOf(r)
              case And(l, r) => varsOf(l) ++ varsOf(r)
              case Or(l, r) => varsOf(l) ++ varsOf(r)
              case Not(e) => varsOf(e)
              case In(l, _) => varsOf(l)
              case Contains(l, r) => varsOf(l) ++ varsOf(r)
              case Like(l, _) => varsOf(l)
              case StartsWith(l, r) => varsOf(l) ++ varsOf(r)
              case EndsWith(l, r) => varsOf(l) ++ varsOf(r)
              case Arith(l, _, r) => varsOf(l) ++ varsOf(r)
              case StrFunc(_, args) =>
                args.foldLeft(Set.empty[String])(_ ++ varsOf(_))
              case IsNull(e, _) => varsOf(e)
              case _ => Set.empty
            }
            def conjs(x: Expr): Seq[Expr] = x match {
              case And(l, r) => conjs(l) ++ conjs(r)
              case other => Seq(other)
            }
            val assigned = Array.fill[List[Expr]](p.edges.size)(Nil)
            conjs(w).foreach { c =>
              val vs = varsOf(c)
              val windows = (0 until p.edges.size).filter { j =>
                vs.subsetOf(Set(p.nodes(j).variable,
                  p.edges(j).variable, p.nodes(j + 1).variable).flatten)
              }
              require(windows.nonEmpty,
                s"chain WHERE conjunct over ${vs.mkString("{", ", ", "}")} " +
                  "spans non-adjacent positions — each top-level AND " +
                  "conjunct must bind within one hop window (a node, " +
                  "its edge, and the next node); for the cross-position " +
                  "form split the chain into single-hop WHERE views " +
                  "and join downstream")
              assigned(windows.head) ::= c
            }
            hopWheres = assigned.toSeq.map(
              _.reverse.reduceOption(And(_, _)))
          }
        }
        PatternDef(p.nodes.map(_.label.get), p.edges.map(_.label.get),
          p.nodes.map(n => propsPred(n.props)),
          p.edges.map(e => propsPred(e.props)),
          p.edges.map(_.range),
          p.edges.map(_.direction == Undirected),
          m.where,
          p.nodes.map(_.variable),
          p.edges.map(_.variable),
          hopWheres)
      case Right(other) => throw new IllegalArgumentException(
        s"pattern views are defined by a MATCH chain, not $other")
    }
  }

  /** Validate `gql` and register the view (Analytics/graph_traversal,
    * so TraversalPattern queries route to it). The definition string
    * itself is the stored contract.
    */
  def register(catalog: ViewCatalog, name: String, gql: String): Unit = {
    parseDef(gql) // validate eagerly — a bad definition fails HERE
    catalog.register(ViewDefn(name,
      Analytics("graph_traversal", Map("pattern" -> gql)),
      EventDriven(0), Seq("vertices", "edges")))
  }

  /** Incrementally refresh a GQL-registered pattern view through the
    * change feed between two store versions (first call bootstraps).
    * Returns the view rows ((src, dst) for single-hop, c0..ck for
    * chains — the same contract as the Views-level refreshers).
    */
  def refresh(catalog: ViewCatalog, name: String,
      oldStore: GraphStore, newStore: GraphStore): DataFrame = {
    val gql = catalog.get(name) match {
      case Some(ViewDefn(_, Analytics("graph_traversal", params), _, _))
          if params.contains("pattern") => params("pattern")
      case _ => throw new IllegalArgumentException(
        s"view '$name' is not a registered GQL pattern view")
    }
    val d = parseDef(gql)
    if (d.where.isDefined) {
      // column-name contract with GqlExecutor.whereCol: a PropRef
      // over variable v compiles to column `v__props` (anon
      // positions get placeholder names — nothing can reference them)
      def ncol(i: Int) =
        s"${d.nodeVars(i).getOrElse(s"__anon_n$i")}__props"
      def ecol(j: Int) =
        s"${d.edgeVars(j).getOrElse(s"__anon_e$j")}__props"
      if (d.edgeLabels.size == 1)
        return Views.refreshWherePatternView(catalog, name,
          oldStore, newStore,
          d.vertexLabels(0), d.edgeLabels(0), d.vertexLabels(1),
          ncol(0), ecol(0), ncol(1),
          GqlExecutor.whereCol(d.where.get),
          d.vertexPreds(0), d.vertexPreds(1), d.edgePreds(0))
      return Views.refreshWhereChainView(catalog, name,
        oldStore, newStore, d.vertexLabels, d.edgeLabels,
        d.vertexLabels.indices.map(ncol), d.edgeLabels.indices.map(ecol),
        d.hopWheres.map(_.map(GqlExecutor.whereCol)),
        d.vertexPreds, d.edgePreds)
    }
    if (d.edgeLabels.size == 1) d.ranges.head match {
      case Some((_, Int.MaxValue)) if d.undirectedHops.head =>
        // any lower bound serves the same same-component pairs
        // (walks pad by 2 through any incident edge)
        Views.refreshUndirectedReachView(catalog, name, oldStore, newStore,
          d.vertexLabels(0), d.edgeLabels(0), d.vertexLabels(1),
          d.vertexPreds(0), d.vertexPreds(1))
      case Some((1, Int.MaxValue)) =>
        Views.refreshReachabilityView(catalog, name, oldStore, newStore,
          d.vertexLabels(0), d.edgeLabels(0), d.vertexLabels(1),
          d.vertexPreds(0), d.vertexPreds(1))
      case Some((minHops, Int.MaxValue)) =>
        Views.refreshLowerBoundedReachView(catalog, name,
          oldStore, newStore,
          d.vertexLabels(0), d.edgeLabels(0), d.vertexLabels(1),
          minHops, d.vertexPreds(0), d.vertexPreds(1))
      case Some((minHops, maxHops)) =>
        Views.refreshVarLengthPatternView(catalog, name, oldStore, newStore,
          d.vertexLabels(0), d.edgeLabels(0), d.vertexLabels(1),
          minHops, maxHops, d.vertexPreds(0), d.vertexPreds(1),
          d.undirectedHops.head)
      case None =>
        Views.refreshPatternView(catalog, name, oldStore, newStore,
          d.vertexLabels(0), d.edgeLabels(0), d.vertexLabels(1),
          d.vertexPreds(0), d.vertexPreds(1), d.edgePreds(0),
          d.undirectedHops.head)
    }
    else if (d.ranges.exists(_.isDefined))
      Views.refreshComposedChainView(catalog, name, oldStore, newStore,
        d.vertexLabels, d.edgeLabels, d.ranges, d.vertexPreds,
        d.edgePreds, d.undirectedHops)
    else
      Views.refreshPatternChainView(catalog, name, oldStore, newStore,
        d.vertexLabels, d.edgeLabels, d.vertexPreds, d.edgePreds,
        d.undirectedHops)
  }
}
