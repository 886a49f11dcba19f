package graft.gql

/** AST for the reference's Cypher-like GQL
  * (grammar graph/query/src/gql.pest; AST graph/query/src/lib.rs:238-340).
  *
  * Surface: linear-chain patterns `(a:L {k: v})-[e:l]->(b)`, WHERE
  * with {=, !=, <, <=, >, >=} comparisons over literals and var.prop
  * plus AND/OR, RETURN of `*` | var | var.prop, and CREATE / DELETE /
  * MATCH-DELETE statements. Values: string, number (Int64 when
  * integral else Float64, lib.rs:66-88), boolean, null.
  */
object Ast {

  sealed trait GqlValue
  case class GqlString(v: String) extends GqlValue
  case class GqlInt(v: Long) extends GqlValue
  case class GqlFloat(v: Double) extends GqlValue
  case class GqlBool(v: Boolean) extends GqlValue
  case object GqlNull extends GqlValue

  sealed trait Direction
  case object Outgoing extends Direction
  case object Incoming extends Direction
  case object Undirected extends Direction

  case class NodePattern(
      variable: Option[String],
      label: Option[String],
      props: Map[String, GqlValue])

  /** `range` is a graft extension: `-[:l*1..3]->` matches paths of
    * 1-3 edges (distinct endpoint pairs; intermediate nodes unbound).
    * The reference grammar has linear single-hop chains only.
    */
  case class EdgePattern(
      variable: Option[String],
      label: Option[String],
      props: Map[String, GqlValue],
      direction: Direction,
      range: Option[(Int, Int)] = None)

  /** Linear chain: nodes(0) -edges(0)- nodes(1) -edges(1)- …
    *
    * `shortest` (graft extension, Cypher `shortestPath(...)`): the
    * pattern must be a single (possibly var-length) edge between two
    * nodes; the match binds, per (a, b) endpoint pair, only the
    * MINIMUM-hop connection (BFS, `Algorithms.sssp`) instead of every
    * path — the reference exposes the same capability at its storage
    * API (graph/storage/src/lib.rs:834-871) but not in its grammar.
    */
  case class GraphPattern(nodes: Seq[NodePattern], edges: Seq[EdgePattern],
      shortest: Boolean = false) {
    require(nodes.nonEmpty && edges.length == nodes.length - 1)
  }

  sealed trait Expr
  case class PropRef(variable: String, prop: String) extends Expr
  case class Literal(v: GqlValue) extends Expr
  case class Comparison(left: Expr, op: String, right: Expr) extends Expr
  case class And(l: Expr, r: Expr) extends Expr
  case class Or(l: Expr, r: Expr) extends Expr
  /** Extensions beyond the reference grammar (its WHERE has no NOT,
    * IN, or CONTAINS — graph/query/src/lib.rs:238-251); semantics
    * follow Cypher/SQL three-valued logic.
    */
  case class Not(e: Expr) extends Expr
  case class In(left: Expr, values: Seq[GqlValue]) extends Expr
  case class Contains(left: Expr, right: Expr) extends Expr
  /** SQL-style pattern match (`%` any run, `_` one char). */
  case class Like(left: Expr, pattern: String) extends Expr
  /** Cypher string predicates: literal prefix/suffix match (no
    * wildcards — the pattern-free complements of LIKE).
    */
  case class StartsWith(left: Expr, right: Expr) extends Expr
  case class EndsWith(left: Expr, right: Expr) extends Expr
  /** Arithmetic over operands in WHERE (graft extension): `+ - * / %`
    * with `* / %` binding tighter, both left-associative, NO
    * parentheses (the paren token is taken by boolean grouping and
    * pattern predicates — restructure via WITH when precedence isn't
    * enough). Everything computes on the NUMERIC view (int→float
    * coerced, like sum/avg); a non-numeric operand views as NULL and
    * the enclosing comparison filters the row. Division/modulo by
    * zero is NULL (not an ANSI failure), same filtered outcome.
    */
  case class Arith(left: Expr, op: String, right: Expr) extends Expr
  /** Scalar string function call (graft extension, Cypher):
    * `toLower/toUpper/trim/replace/substring` yield STRINGS (usable
    * wherever a string operand is — comparisons, CONTAINS/STARTS/
    * ENDS WITH sides, RETURN under AS, nested in each other);
    * `size` yields an INT (usable in arithmetic and numeric
    * comparisons). A non-string input views as NULL, the same
    * cross-kind 3VL every other string operator here applies.
    * `substring` is 0-indexed with an optional length (Cypher), int
    * literals only; `replace` is literal (non-regex) replacement.
    */
  case class StrFunc(name: String, args: Seq[Expr]) extends Expr

  /** Generic CASE (graft extension, Cypher): `CASE WHEN pred THEN
    * value ... [ELSE value] END`, usable as a RETURN expression
    * (under AS, including as an implicit grouping key). Predicates
    * are WHERE-shaped over properties/literals (no WITH-alias refs,
    * no pattern predicates — both reject with the reason); values
    * are literals, properties, or arithmetic. The result is a
    * PropValue VARIANT so heterogeneous THEN kinds unify; a missing
    * ELSE yields NULL, as in Cypher.
    */
  case class CaseExpr(branches: Seq[(Expr, Expr)],
      default: Option[Expr]) extends Expr
  /** `x IS [NOT] NULL` (graft extension, Cypher/SQL): a property is
    * NULL when absent OR explicitly stored as null; after an OPTIONAL
    * MATCH the statement-final WHERE sees unmatched rows' NULL
    * bindings, so `sp.name IS NULL` is the Cypher anti-join idiom.
    */
  case class IsNull(e: Expr, negated: Boolean) extends Expr
  /** Bare-name reference to a WITH alias (`WHERE cnt > 2` after
    * `WITH c, count(o) AS cnt`) — a graft extension like WITH itself;
    * reserved words are excluded at the parser so the pre-WITH
    * rejection surface is unchanged. Aliases hold MATERIALIZED Spark
    * values (counts, projected props), so comparisons use plain
    * column semantics, not the PropValue variant coercion table.
    */
  case class VarRef(name: String) extends Expr
  /** Pattern predicate (Cypher existential): `WHERE (a)-[:f]->(b)`
    * keeps a binding row iff the pattern (sharing ≥1 variable with
    * the bound set) has a match; `NOT (pattern)` keeps rows with no
    * match. Executes as a SEMI/ANTI join, never a Column — so it must
    * appear as a TOP-LEVEL conjunct of the WHERE (possibly under
    * NOT); inside OR or comparisons it is rejected with the reason.
    * The pattern needs ≥1 edge (a bare `(a)` is a parenthesized
    * expression, not a predicate).
    */
  case class PatternPred(pattern: GraphPattern) extends Expr

  sealed trait ReturnItem
  case object ReturnAll extends ReturnItem
  case class ReturnVariable(variable: String) extends ReturnItem
  case class ReturnProperty(variable: String, prop: String) extends ReturnItem
  /** graft extension: aggregate over the binding set — count(v),
    * count(*), sum/avg/min/max(v.prop). Non-aggregate return items
    * become implicit grouping keys (Cypher-style).
    */
  case class ReturnAggregate(func: String, variable: Option[String],
      prop: Option[String],
      /** `count(DISTINCT x)` / `collect(DISTINCT x)` (Cypher): the
        * aggregate sees each distinct value once. Parses only for
        * count/collect — DISTINCT under sum/avg/min/max is rejected
        * (min/max are no-ops, DISTINCT-sum/avg is a smell Cypher
        * itself allows but nothing here needs).
        */
      distinct: Boolean = false) extends ReturnItem
  /** graft extension (Cypher path functions): `length(p)` /
    * `nodes(p)` over a bound path variable.
    */
  case class ReturnPathFunc(func: String, variable: String) extends ReturnItem
  /** graft extension (Cypher `RETURN expr AS alias`): an arithmetic
    * expression or literal return item — only ever constructed
    * inside [[ReturnAliased]] (Cypher requires expressions to be
    * aliased). Arithmetic reads properties and literals (the WHERE
    * numeric-view rules); WITH-alias refs inside RETURN arithmetic
    * are rejected — project the computation through WITH instead.
    */
  case class ReturnExpr(expr: Expr) extends ReturnItem
  /** `item AS alias` — renames the output column; on a bare variable
    * it renames the SCALAR alias only (a binding triplet has no
    * single column to rename and rejects with that reason).
    */
  case class ReturnAliased(item: ReturnItem, alias: String) extends ReturnItem

  /** `ref` is a PropRef (`v.prop`) or — after a WITH pipeline — a
    * VarRef alias name (`ORDER BY cnt DESC`).
    */
  case class OrderItem(ref: Expr, ascending: Boolean)

  /** One `WITH` projection item (graft extension, Cypher semantics):
    * a pass-through variable (`a`, optionally `a AS b`), a property
    * projection (`a.name AS n` — alias REQUIRED, as in Cypher), or an
    * aggregate (`count(b) AS cnt` — alias required). Non-aggregate
    * items become implicit grouping keys when any aggregate is
    * present, exactly like RETURN.
    */
  case class WithItem(item: ReturnItem, alias: Option[String])

  /** `UNWIND source AS alias` (graft extension, Cypher semantics):
    * one output row per list element, the element bound to `alias`.
    * `source` is a LITERAL list (`[1, 2, 3]` — may be empty, which
    * yields zero rows like Cypher) or the NAME of a list-valued WITH
    * alias (a `collect(...)` result). An empty or NULL list removes
    * the row — Cypher's UNWIND-null contract, and exactly what
    * `explode` does. Property values are scalars in this model, so
    * `UNWIND v.prop` has nothing to unwind and does not parse.
    */
  case class UnwindItem(source: Either[Seq[GqlValue], String],
      alias: String)

  /** One `MATCH ... [WHERE ...] WITH [DISTINCT] items [ORDER BY ...
    * LIMIT n] [WHERE ...]` pipeline segment preceding the final MATCH
    * (Cypher WITH composition). The post-WITH WHERE filters the
    * PROJECTED frame (aggregate aliases in scope — SQL HAVING's
    * role), and per Cypher it applies AFTER ORDER BY/LIMIT. ORDER BY
    * keys are `var.prop` or alias names; a mid-pipeline ORDER BY
    * without LIMIT is REJECTED at execution — downstream joins don't
    * preserve row order, so it could only mislead (with LIMIT it's
    * the per-stage top-k, a TakeOrdered). Segments carry plain linear
    * patterns: shortestPath, OPTIONAL MATCH, and path variables stay
    * final-MATCH-only.
    */
  case class MatchSegment(pattern: GraphPattern, where: Option[Expr],
      withItems: Seq[WithItem], withWhere: Option[Expr],
      distinct: Boolean = false,
      orderBy: Seq[(Expr, Boolean)] = Nil,
      limit: Option[Long] = None,
      /** UNWINDs applied AFTER this segment's WITH (and its WHERE) —
        * `WITH n, collect(s.name) AS names UNWIND names AS nm`.
        */
      unwinds: Seq[UnwindItem] = Nil)

  sealed trait Statement
  /** ORDER BY / LIMIT are graft extensions — the reference grammar
    * has neither (SURVEY W4: no grammar rule, SQL validator rejects
    * LIMIT) but they are free on Spark.
    */
  /** `optional` (graft extension, Cypher semantics): each OPTIONAL
    * MATCH chain left-joins onto the bindings through its shared
    * variables — unmatched rows keep NULL bindings. `distinct`
    * dedups the projected rows (RETURN DISTINCT). `pathVar`
    * (extension, Cypher `p = (...)`) binds the matched node sequence;
    * with a var-length segment the match enumerates one row PER PATH
    * (simple paths — no vertex revisits) instead of per distinct
    * endpoint pair.
    */
  /** `pattern = None` is the `MATCH ... WITH ... RETURN` form — the
    * pipeline ends at a WITH projection with no re-match (Cypher's
    * most common aggregate shape); the parser only produces it with
    * `pre` nonempty, and optional/pathVar stay full-form-only.
    */
  case class MatchStatement(
      pattern: Option[GraphPattern],
      where: Option[Expr],
      ret: Seq[ReturnItem],
      orderBy: Seq[OrderItem] = Nil,
      limit: Option[Long] = None,
      optional: Seq[GraphPattern] = Nil,
      distinct: Boolean = false,
      pathVar: Option[String] = None,
      pre: Seq[MatchSegment] = Nil,
      /** Cypher SKIP n — rows dropped AFTER ORDER BY, before LIMIT. */
      skip: Option[Long] = None,
      /** Leading `UNWIND [..] AS x` clauses BEFORE the first MATCH —
        * literal lists only (no aliases are in scope yet); the
        * following MATCH cross-composes each element against its
        * matches (the one sanctioned cartesian: the list side is a
        * tiny literal, broadcast by construction). A statement may
        * also be just `UNWIND ... RETURN ...` with no MATCH at all.
        */
      leadingUnwinds: Seq[UnwindItem] = Nil) extends Statement
  case class CreateStatement(pattern: GraphPattern) extends Statement
  /** `<match-query> UNION [ALL] <match-query> ...` (graft extension,
    * Cypher): parts must project the SAME column names (alias with AS
    * to align); UNION dedups rows, UNION ALL keeps bags, and mixing
    * the two forms in one statement is rejected like Cypher does.
    * Read-only parts — a DELETE/SET inside a union rejects.
    */
  case class UnionStatement(parts: Seq[MatchStatement],
      distinct: Boolean) extends Statement
  /** `MERGE (n:Label {props}) [ON CREATE SET ...] [ON MATCH SET ...]`
    * (graft extension, Cypher): match-or-create for a SINGLE node
    * pattern. If any vertex matches label+props, ON MATCH SET applies
    * to every match (Cypher binds all rows); otherwise the node is
    * created and ON CREATE SET applies to it alone. Multi-node /
    * edge MERGE rejects with the remedy (its partial-match semantics
    * — create the whole pattern when ANY part is unmatched — is a
    * well-known Cypher footgun; compose MATCH + CREATE explicitly).
    * SET items reuse SetItem validation (own-property reads only).
    */
  case class MergeStatement(node: NodePattern,
      onCreate: Seq[SetItem], onMatch: Seq[SetItem]) extends Statement
  /** `MERGE (a...)-[e:label {props}]->(b...) [ON CREATE SET ...]
    * [ON MATCH SET ...]` (graft extension, Cypher): match-or-create
    * for a relationship between BOUND endpoints — the idempotent
    * edge-ingest twin of CREATE's edge chaining. Both endpoint
    * patterns must match at least one EXISTING vertex; an endpoint
    * matching nothing REJECTS with the remedy instead of silently
    * creating it (Cypher's whole-pattern-create-on-any-miss footgun).
    * Per Cypher pair semantics, every (a, b) endpoint pair lacking an
    * edge of the pattern's label gets one created; pairs that already
    * have it take ON MATCH. Edge pattern props are parser-rejected
    * (the store keys ONE edge per (src, dst, label), so props are not
    * identity — a props-mismatch "create" would silently clobber the
    * stored edge; set props via ON CREATE/ON MATCH instead). SET
    * items target the edge variable only, reading only the edge's own
    * props (the same determinism discipline as vertex SET).
    * Undirected and variable-length edge patterns reject (ambiguous
    * creation).
    */
  case class MergeRelStatement(src: NodePattern, edge: EdgePattern,
      dst: NodePattern, onCreate: Seq[SetItem],
      onMatch: Seq[SetItem]) extends Statement
  /** One `SET v.prop = value` assignment (graft extension, Cypher
    * semantics): value is a literal, a property of the SAME variable
    * (`SET v.x = v.y` — variant copy, kind preserved), or arithmetic
    * over them (numeric view). Restricting the value to the target's
    * OWN properties keeps the per-vertex result row-independent —
    * cross-variable reads (`SET a.x = b.y`) would make the outcome
    * depend on which binding row wins, Cypher's documented
    * last-write-wins nondeterminism, and are rejected with that
    * reason. A NULL value (literal null / missing source prop /
    * non-numeric arithmetic) REMOVES the property, as in Cypher.
    */
  case class SetItem(variable: String, prop: String, value: Expr)
  /** `MATCH ... [WHERE ...] SET/REMOVE ...` (graft extension):
    * updates the matched vertices' property maps through the store's
    * update_vertex_props op (change-feed logged). Clauses apply in
    * written order per vertex. Vertex variables only — edge identity
    * is (src,dst,label), which the binding frame does not carry; a
    * SET on an edge variable rejects with the updateEdgeProps remedy.
    */
  case class SetStatement(pattern: GraphPattern, where: Option[Expr],
      /** Written-order SET (Left) / REMOVE (Right: var, prop) items —
        * order matters when a prop is set then removed or vice versa.
        */
      ops: Seq[Either[SetItem, (String, String)]]) extends Statement
  /** DELETE var — with an optional MATCH pattern+WHERE scoping it
    * (executor.rs:569-615).
    */
  case class DeleteStatement(
      pattern: Option[GraphPattern],
      where: Option[Expr],
      variable: String) extends Statement
}
