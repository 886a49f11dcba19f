package graft.gql

import scala.util.parsing.combinator.RegexParsers
import Ast._

/** Recursive-descent GQL parser (scala-parser-combinators, shipped in
  * /opt/spark/jars).
  *
  * Mirrors the reference grammar (graph/query/src/gql.pest, 44 lines)
  * with the parser-side extensions its Rust code adds on top: `<-`
  * incoming edges (lib.rs:466-475) and `>=`/`<=` (lib.rs:218-225).
  * Beyond the reference: full AND/OR nesting with parentheses (the
  * reference keeps only the first expression, lib.rs:535-554 — a
  * limitation, not a semantic we preserve).
  */
object GqlParser extends RegexParsers {

  override val whiteSpace = """\s+""".r

  private def kw(s: String): Parser[String] = s"(?i)$s\\b".r

  private def ident: Parser[String] = """[A-Za-z_][A-Za-z0-9_]*""".r

  private def stringLit: Parser[String] =
    "\"" ~> """[^"]*""".r <~ "\""

  private def number: Parser[GqlValue] =
    """-?\d+\.\d+""".r ^^ (s => GqlFloat(s.toDouble)) |
      """-?\d+""".r ^^ (s => GqlInt(s.toLong))

  private def value: Parser[GqlValue] =
    stringLit ^^ GqlString.apply |
      number |
      kw("true") ^^ (_ => GqlBool(true)) |
      kw("false") ^^ (_ => GqlBool(false)) |
      kw("null") ^^ (_ => GqlNull)

  private def propsBlock: Parser[Map[String, GqlValue]] =
    "{" ~> repsep(ident ~ (":" ~> value), ",") <~ "}" ^^ {
      pairs => pairs.map { case k ~ v => k -> v }.toMap
    }

  private def node: Parser[NodePattern] =
    "(" ~> opt(ident) ~ opt(":" ~> ident) ~ opt(propsBlock) <~ ")" ^^ {
      case v ~ l ~ p => NodePattern(v, l, p.getOrElse(Map.empty))
    }

  /** `*1..3` | `*..3` | `*2..` | `*`. Open-ended ranges carry
    * Int.MaxValue so downstream consumers can tell `*1..` from
    * `*1..10`: the EXECUTOR caps expansion at
    * [[GqlExecutor.VarLenCap]] (10 hops, the pre-r10 behavior), while
    * pattern-view registration routes a true `*1..` to the maintained
    * reachability view.
    */
  private def lengthRange: Parser[(Int, Int)] =
    "*" ~> opt("""\d+""".r) ~ opt(".." ~> opt("""\d+""".r)) ^^ {
      case lo ~ hi =>
        val min = lo.map(_.toInt).getOrElse(1)
        val max = hi match {
          case Some(Some(h)) => h.toInt
          case Some(None) => Int.MaxValue
          case None => lo.map(_.toInt).getOrElse(Int.MaxValue)
        }
        (min, max)
    }

  private def edgeBody: Parser[(Option[String], Option[String], Map[String, GqlValue], Option[(Int, Int)])] =
    "[" ~> opt(ident) ~ opt(":" ~> ident) ~ opt(lengthRange) ~ opt(propsBlock) <~ "]" ^^ {
      case v ~ l ~ r ~ p => (v, l, p.getOrElse(Map.empty), r)
    }

  /** -[..]-> outgoing, <-[..]- incoming, -[..]- undirected. */
  private def edge: Parser[EdgePattern] =
    "<-" ~> edgeBody <~ "-" ^^ { case (v, l, p, r) => EdgePattern(v, l, p, Incoming, r) } |
      "-" ~> edgeBody ~ ("->" | "-") ^^ {
        case (v, l, p, r) ~ "->" => EdgePattern(v, l, p, Outgoing, r)
        case (v, l, p, r) ~ _ => EdgePattern(v, l, p, Undirected, r)
      }

  private def pattern: Parser[GraphPattern] =
    node ~ rep(edge ~ node) ^^ { case first ~ rest =>
      GraphPattern(first +: rest.map(_._2), rest.map(_._1))
    }

  /** `shortestPath((a)-[*..3]->(b))` — Cypher-style wrapper; the
    * inner pattern must be exactly two nodes and one edge (checked
    * in the executor, which owns the error message).
    */
  private def shortestPat: Parser[GraphPattern] =
    kw("shortestPath") ~> "(" ~> pattern <~ ")" ^^ (_.copy(shortest = true))

  private def matchPat: Parser[GraphPattern] = shortestPat | pattern

  private def propRef: Parser[PropRef] =
    ident ~ ("." ~> ident) ^^ { case v ~ p => PropRef(v, p) }

  /** Words that may not be bare value references — keeps every
    * pre-WITH rejection (`WHERE NOT RETURN ...`, `WHERE CONTAINS
    * "x"`) rejecting exactly as before VarRef existed.
    */
  private val reserved = Set(
    "return", "match", "where", "and", "or", "not", "with", "order",
    "by", "limit", "delete", "create", "optional", "contains",
    "starts", "ends", "like", "in", "as", "asc", "desc", "true",
    "false", "null", "distinct", "count", "sum", "avg", "min", "max",
    "length", "nodes", "shortestpath", "skip", "collect", "unwind",
    "is", "set", "remove", "case", "when", "then", "else", "end")

  /** Bare alias reference (`cnt` after `WITH ... count(o) AS cnt`). */
  private def bareRef: Parser[Expr] =
    ident ^? ({ case s if !reserved(s.toLowerCase) => VarRef(s) },
      s => s"reserved word '$s' cannot be a value reference")

  /** String-function call. Names are NOT reserved (Cypher lets them
    * be identifiers); the parser commits only on `name(` and
    * otherwise backtracks into propRef/bareRef. Arity is validated
    * here so a wrong call fails the parse with the remedy, not an
    * executor throw mid-plan.
    */
  private def strFunc: Parser[Expr] =
    (kw("toLower") | kw("toUpper") | kw("trim") | kw("substring") |
      kw("replace") | kw("size")) ~ ("(" ~> rep1sep(operand, ",") <~ ")") ^? ({
      case f ~ args if strFuncArity(f.toLowerCase, args) =>
        StrFunc(f.toLowerCase, args)
    }, { case f ~ args =>
      s"${f.toLowerCase} does not take ${args.length} argument(s) — " +
        "toLower/toUpper/trim/size take 1, replace takes 3, " +
        "substring takes a string plus 1-2 int literals"
    })

  private def strFuncArity(f: String, args: Seq[Expr]): Boolean = f match {
    case "tolower" | "toupper" | "trim" | "size" => args.length == 1
    case "replace" => args.length == 3
    case "substring" =>
      (args.length == 2 || args.length == 3) &&
        args.tail.forall { case Literal(GqlInt(_)) => true; case _ => false }
  }

  private def operand: Parser[Expr] =
    strFunc | propRef | value ^^ Literal.apply | bareRef

  private def cmpOp: Parser[String] = ">=" | "<=" | "!=" | "=" | ">" | "<"

  /** Arithmetic (extension): `* / %` over `+ -`, left-associative,
    * parenthesis-free (the paren is boolean grouping / pattern
    * predicates). `-` as a binary op never collides with negative
    * literals: the literal only wins when it STARTS an operand.
    */
  private def arithTerm: Parser[Expr] =
    operand ~ rep(("*" | "/" | "%") ~ operand) ^^ { case f ~ rest =>
      rest.foldLeft(f) { case (l, op ~ r) => Arith(l, op, r) }
    }

  private def arith: Parser[Expr] =
    arithTerm ~ rep(("+" | "-") ~ arithTerm) ^^ { case f ~ rest =>
      rest.foldLeft(f) { case (l, op ~ r) => Arith(l, op, r) }
    }

  /** Cypher-style literal list for IN: `[v, v, ...]`, at least one
    * element (`IN []` is always-false noise — rejected, like Cypher
    * rejects a bare `IN`).
    */
  private def valueList: Parser[Seq[GqlValue]] =
    "[" ~> rep1sep(value, ",") <~ "]"

  private def comparison: Parser[Expr] =
    arith ~ opt(
      cmpOp ~ arith ^^ { case op ~ r => (l: Expr) => Comparison(l, op, r) } |
        kw("is") ~> opt(kw("not")) <~ kw("null") ^^ {
          n => (l: Expr) => IsNull(l, n.isDefined) } |
        kw("in") ~> valueList ^^ { vs => (l: Expr) => In(l, vs) } |
        kw("contains") ~> operand ^^ { r => (l: Expr) => Contains(l, r) } |
        kw("starts") ~ kw("with") ~> operand ^^ { r => (l: Expr) => StartsWith(l, r) } |
        kw("ends") ~ kw("with") ~> operand ^^ { r => (l: Expr) => EndsWith(l, r) } |
        kw("like") ~> stringLit ^^ { pat => (l: Expr) => Like(l, pat) }) ^^ {
      case l ~ Some(mk) => mk(l)
      case l ~ None => l // bare var.prop truthiness (executor.rs:387-391)
    }

  /** Pattern predicate: a chain with at least one edge — `(a)-[:f]->
    * (b)`. Tried before the parenthesized-expression alternative;
    * a bare `(x)` fails the rep1 and backtracks into `( expr )`.
    */
  private def patternPred: Parser[Expr] =
    node ~ rep1(edge ~ node) ^^ { case first ~ rest =>
      PatternPred(GraphPattern(first +: rest.map(_._2), rest.map(_._1)))
    }

  /** NOT binds tighter than AND/OR and nests (`NOT NOT x.p`). */
  private def primary: Parser[Expr] =
    kw("not") ~> primary ^^ Not.apply |
      patternPred |
      "(" ~> expr <~ ")" | comparison

  private def andExpr: Parser[Expr] =
    primary ~ rep(kw("and") ~> primary) ^^ {
      case first ~ rest => rest.foldLeft(first)(And.apply)
    }

  private def expr: Parser[Expr] =
    andExpr ~ rep(kw("or") ~> andExpr) ^^ {
      case first ~ rest => rest.foldLeft(first)(Or.apply)
    }

  private def aggFunc: Parser[String] =
    kw("count") | kw("sum") | kw("avg") | kw("min") | kw("max") |
      kw("collect")

  private def returnAgg: Parser[ReturnItem] =
    aggFunc ~ ("(" ~> opt(kw("distinct")) ~ ("*" ^^ (_ => (None, None)) |
      propRef ^^ (p => (Some(p.variable), Some(p.prop))) |
      ident ^^ (v => (Some(v), None))) <~ ")") ^? ({
      case f ~ (d ~ ((v, p)))
          if d.isEmpty || Set("count", "collect")(f.toLowerCase) =>
        ReturnAggregate(f.toLowerCase, v, p, d.isDefined)
    }, {
      case f ~ _ => s"DISTINCT inside ${f.toLowerCase}(...) is only " +
        "supported for count/collect"
    })

  /** length/nodes take a PATH variable; id/labels take a node
    * variable; type takes an EDGE variable (graft extension, Cypher —
    * `labels(n)` returns the single label as a STRING, not a
    * 1-element list: the store is single-label, and the scalar form
    * keeps it comparable/groupable without list machinery; `type(e)`
    * is the stored edge label, NULL over a var-length segment, whose
    * hops may mix labels).
    */
  private def returnPathFunc: Parser[ReturnItem] =
    (kw("length") | kw("nodes") | kw("id") | kw("labels") |
      kw("type")) ~
      ("(" ~> ident <~ ")") ^^ {
      case f ~ v => ReturnPathFunc(f.toLowerCase, v)
    }

  private def aliasIdent: Parser[String] =
    ident ^? ({ case s if !reserved(s.toLowerCase) => s },
      s => s"reserved word '$s' cannot be an alias")

  /** `CASE WHEN pred THEN value ... [ELSE value] END` — the generic
    * Cypher form; predicates are full WHERE expressions, values are
    * arithmetic-level (property / literal / arith).
    */
  private def caseExpr: Parser[Expr] =
    kw("case") ~> rep1(
      (kw("when") ~> expr) ~ (kw("then") ~> arith) ^^ {
        case p ~ v => (p, v) }) ~
      opt(kw("else") ~> arith) <~ kw("end") ^^ {
      case bs ~ d => CaseExpr(bs, d)
    }

  /** `coalesce(a, b, ...)` (graft extension, Cypher): first non-null
    * argument. DESUGARED to the CASE machinery — `CASE WHEN a IS NOT
    * NULL THEN a ... ELSE last END` — so it inherits CASE's variant
    * output, grouping-key capability, and placement (RETURN under
    * AS). Arguments are operand-level (properties / literals).
    */
  private def coalesceExpr: Parser[Expr] =
    kw("coalesce") ~> ("(" ~> rep1sep(operand, ",") <~ ")") ^? ({
      case args if args.length >= 2 =>
        CaseExpr(args.init.map(a => (IsNull(a, true), a)),
          Some(args.last))
    }, _ => "coalesce takes at least two arguments")

  /** `RETURN item [AS alias]` (AS is a graft extension): aggregates,
    * path funcs, properties, and bare variables may alias; a genuine
    * arithmetic expression or literal MUST alias (Cypher's
    * "expression in RETURN must be aliased"). The trailing bare
    * `ident` fallback keeps pre-extension queries parsing even where
    * `arith` rejects (reserved-word variables never existed, but the
    * alternative is free).
    */
  private def returnItem: Parser[ReturnItem] =
    "*" ^^ (_ => ReturnAll) |
      (returnPathFunc | returnAgg) ~ opt(kw("as") ~> aliasIdent) ^^ {
        case i ~ None => i
        case i ~ Some(a) => ReturnAliased(i, a)
      } |
      (caseExpr | coalesceExpr) ~ (kw("as") ~> aliasIdent) ^^ {
        case c ~ a => ReturnAliased(ReturnExpr(c), a)
      } |
      arith ~ opt(kw("as") ~> aliasIdent) ^? ({
        case (p: PropRef) ~ None => ReturnProperty(p.variable, p.prop)
        case (p: PropRef) ~ Some(a) =>
          ReturnAliased(ReturnProperty(p.variable, p.prop), a)
        case VarRef(v) ~ None => ReturnVariable(v)
        case VarRef(v) ~ Some(a) => ReturnAliased(ReturnVariable(v), a)
        case (x: Arith) ~ Some(a) => ReturnAliased(ReturnExpr(x), a)
        case (f: StrFunc) ~ Some(a) => ReturnAliased(ReturnExpr(f), a)
        case Literal(v) ~ Some(a) => ReturnAliased(ReturnExpr(Literal(v)), a)
      }, {
        case (_: Arith) ~ None => "expressions in RETURN require AS <alias>"
        case (_: StrFunc) ~ None => "expressions in RETURN require AS <alias>"
        case Literal(_) ~ None => "literals in RETURN require AS <alias>"
        case other ~ _ => s"cannot RETURN $other"
      }) |
      ident ^^ ReturnVariable.apply

  private def orderItem: Parser[OrderItem] =
    (propRef | bareRef) ~ opt(kw("asc") | kw("desc")) ^^ {
      case r ~ dir => OrderItem(r, !dir.exists(_.equalsIgnoreCase("desc")))
    }

  /** `[ORDER BY ...] [SKIP n] [LIMIT n]` — Cypher subclause order. */
  private def orderLimit: Parser[(Seq[OrderItem], Option[Long], Option[Long])] =
    opt(kw("order") ~> kw("by") ~> rep1sep(orderItem, ",")) ~
      opt(kw("skip") ~> """\d+""".r) ~
      opt(kw("limit") ~> """\d+""".r) ^^ {
      case ob ~ sk ~ lim =>
        (ob.getOrElse(Nil), sk.map(_.toLong), lim.map(_.toLong))
    }

  private def optionalMatch: Parser[GraphPattern] =
    kw("optional") ~> kw("match") ~> pattern

  /** `UNWIND [v, ...] AS x` | `UNWIND alias AS x`. The literal list
    * MAY be empty (`UNWIND [] AS x` = zero rows, Cypher) — unlike
    * IN's valueList, whose empty form is rejected noise.
    */
  private def unwindClause: Parser[UnwindItem] =
    kw("unwind") ~> (
      ("[" ~> repsep(value, ",") <~ "]") ^^ (vs => Left(vs): Either[Seq[GqlValue], String]) |
        bareRef ^^ { case VarRef(n) => Right(n): Either[Seq[GqlValue], String]
                     case other => throw new MatchError(other) }) ~
      (kw("as") ~> aliasIdent) ^^ { case src ~ a => UnwindItem(src, a) }

  /** One WITH projection item. Aliases are REQUIRED for aggregates
    * and property projections (Cypher's "expression in WITH must be
    * aliased"), optional for variable pass-through (`a` or
    * `a AS b`).
    */
  private def withItem: Parser[WithItem] =
    returnAgg ~ (kw("as") ~> ident) ^^ {
      case a ~ al => WithItem(a, Some(al)) } |
      propRef ~ (kw("as") ~> ident) ^^ {
        case p ~ al => WithItem(ReturnProperty(p.variable, p.prop), Some(al)) } |
      ident ~ opt(kw("as") ~> ident) ^^ {
        case v ~ al => WithItem(ReturnVariable(v), al) }

  /** `MATCH <pattern> [WHERE e] WITH <items> [WHERE e]` — a pipeline
    * segment (graft extension, Cypher WITH). A final MATCH without
    * WITH fails this parser at `kw("with")` and backtracks into the
    * tail rule, so plain single-MATCH queries parse exactly as
    * before. Segment patterns are plain chains: shortestPath / path
    * vars / OPTIONAL MATCH stay on the final MATCH only.
    */
  /** ORDER BY key inside WITH: a property ref or a bare alias. */
  private def withOrderItem: Parser[(Expr, Boolean)] =
    (propRef | bareRef) ~ opt(kw("asc") | kw("desc")) ^^ {
      case r ~ d => (r, !d.exists(_.equalsIgnoreCase("desc")))
    }

  private def matchSegment: Parser[MatchSegment] =
    kw("match") ~> pattern ~ opt(kw("where") ~> expr) ~
      (kw("with") ~> opt(kw("distinct")) ~ rep1sep(withItem, ",")) ~
      opt(kw("order") ~> kw("by") ~> rep1sep(withOrderItem, ",")) ~
      opt(kw("limit") ~> """\d+""".r) ~
      opt(kw("where") ~> expr) ~
      rep(unwindClause) ^^ {
      case p ~ w ~ (dist ~ items) ~ ob ~ lim ~ hw ~ uw =>
        MatchSegment(p, w, items, hw, dist.isDefined,
          ob.getOrElse(Nil), lim.map(_.toLong), uw)
    }

  private type RetClause =
    (Boolean, Seq[ReturnItem], (Seq[OrderItem], Option[Long], Option[Long]))

  private def retClause: Parser[RetClause] =
    kw("return") ~> opt(kw("distinct")) ~ rep1sep(returnItem, ",") ~ orderLimit ^^
      (x => (x._1._1.isDefined, x._1._2, x._2))

  private case class FullTail(pathVar: Option[String], pat: GraphPattern,
      opts: Seq[GraphPattern], where: Option[Expr],
      end: Either[RetClause, String])

  private def fullTail: Parser[FullTail] =
    kw("match") ~> opt(ident <~ "=") ~ matchPat ~ rep(optionalMatch) ~
      opt(kw("where") ~> expr) ~
      (retClause ^^ (Left(_): Either[RetClause, String]) |
        // DETACH DELETE accepted as a synonym: this store's DELETE
        // already cascades incident edges (the reference's semantics,
        // executor.rs:569-615), which is exactly Cypher's DETACH
        (opt(kw("detach")) ~> kw("delete") ~> ident)
          ^^ (Right(_): Either[RetClause, String])) ^^ {
      case pv ~ p ~ opts ~ w ~ end => FullTail(pv, p, opts, w, end)
    }

  /** The statement tail is a full MATCH ... RETURN/DELETE, or — with
    * at least one WITH segment carried — a bare RETURN (the
    * `MATCH ... WITH ... RETURN` form, Cypher's most common
    * aggregate shape).
    */
  private def matchOrDelete: Parser[Statement] =
    rep(unwindClause) ~ rep(matchSegment) ~
      (fullTail ^^ (Left(_): Either[FullTail, RetClause]) |
        retClause ^^ (Right(_): Either[FullTail, RetClause])) ^? ({
      case uw ~ segs ~ Left(FullTail(pv, p, opts, w, Left((dist, items, (ob, sk, lim))))) =>
        MatchStatement(Some(p), w, items, ob, lim, opts, dist, pv, segs, sk, uw)
      case uw ~ segs ~ Left(FullTail(_, p, _, w, Right(v)))
          if segs.isEmpty && uw.isEmpty =>
        DeleteStatement(Some(p), w, v)
      case uw ~ segs ~ Right((dist, items, (ob, sk, lim)))
          if segs.nonEmpty || uw.nonEmpty =>
        MatchStatement(None, None, items, ob, lim, Nil, dist, None, segs, sk, uw)
    }, {
      case _ ~ _ ~ Right(_) => "RETURN requires a preceding MATCH or UNWIND"
      case _ => "UNWIND/WITH clauses cannot precede DELETE"
    })

  /** `MATCH p [WHERE e] (SET items | REMOVE items)+` — property
    * mutation. Tried AFTER matchOrDelete, whose fullTail fails at the
    * missing RETURN/DELETE and backtracks cleanly.
    */
  private def setItem: Parser[SetItem] =
    propRef ~ ("=" ~> arith) ^^ { case p ~ v => SetItem(p.variable, p.prop, v) }

  /** `SET v += {a: 1, b: "x"}` (Cypher merge-props): pure sugar —
    * expands at parse time to one per-key SetItem, so the executor's
    * sequential fold applies unchanged (a null value removes the key,
    * Cypher's += null-entry semantics). The whole-map REPLACE form
    * `SET v = {…}` is deliberately NOT a query surface: it silently
    * clears every unlisted key — the data-loss form belongs behind
    * the store's explicit updateVertexProps REPLACE API, not a query.
    */
  private def setMerge: Parser[Seq[SetItem]] =
    (ident <~ "+=") ~ propsBlock ^^ { case v ~ props =>
      props.toSeq.map { case (k, value) =>
        SetItem(v, k, Literal(value)) }
    }

  private def setClause: Parser[Seq[Either[SetItem, (String, String)]]] =
    kw("set") ~> rep1sep(
      setMerge | setItem ^^ (Seq(_)), ",") ^^ (_.flatten.map(Left(_))) |
      kw("remove") ~> rep1sep(propRef, ",") ^^
        (_.map(p => Right((p.variable, p.prop))))

  private def setStmt: Parser[Statement] =
    kw("match") ~> pattern ~ opt(kw("where") ~> expr) ~ rep1(setClause) ^^ {
      case p ~ w ~ clauses => SetStatement(p, w, clauses.flatten)
    }

  private def createStmt: Parser[Statement] =
    kw("create") ~> pattern ^^ CreateStatement.apply

  /** `MERGE (n...) [ON CREATE SET items] [ON MATCH SET items]` —
    * clause order free, each at most once (Cypher). Two forms:
    * single-node match-or-create, and single-DIRECTED-edge
    * match-or-create between bound endpoints (see
    * Ast.MergeRelStatement). Longer chains, undirected edges, and
    * variable-length edges fail the parse with the remedy.
    */
  private def mergeStmt: Parser[Statement] = {
    val onClause: Parser[(String, Seq[SetItem])] =
      kw("on") ~> (kw("create") | kw("match")) ~
        (kw("set") ~> rep1sep(setItem, ",")) ^^ {
        case k ~ items => (k.toLowerCase, items)
      }
    kw("merge") ~> pattern ~ rep(onClause) ^? ({
      case p ~ cs if p.edges.isEmpty && p.nodes.size == 1 &&
          cs.map(_._1).distinct.size == cs.size =>
        val m = cs.toMap
        MergeStatement(p.nodes.head,
          m.getOrElse("create", Nil), m.getOrElse("match", Nil))
      case p ~ cs if p.edges.size == 1 && p.nodes.size == 2 &&
          p.edges.head.direction != Undirected &&
          p.edges.head.range.isEmpty && p.edges.head.props.isEmpty &&
          cs.map(_._1).distinct.size == cs.size =>
        val m = cs.toMap
        MergeRelStatement(p.nodes.head, p.edges.head, p.nodes(1),
          m.getOrElse("create", Nil), m.getOrElse("match", Nil))
    }, {
      case p ~ _ if p.edges.size == 1 &&
          p.edges.head.direction == Undirected =>
        "MERGE of an undirected relationship is ambiguous (which way " +
          "would the create point?) — write the direction explicitly"
      case p ~ _ if p.edges.size == 1 && p.edges.head.range.isDefined =>
        "cannot MERGE a variable-length pattern — merge one edge"
      case p ~ _ if p.edges.size == 1 && p.edges.head.props.nonEmpty =>
        "edge pattern props cannot participate in MERGE — the store " +
          "keys one edge per (src, dst, label), so props are not " +
          "identity; set them with ON CREATE SET / ON MATCH SET"
      case p ~ cs if p.edges.size > 1 || p.nodes.size > 2 =>
        "MERGE supports a single node or a single relationship — " +
          "merge longer chains by composing MATCH + MERGE per hop " +
          "(Cypher's partial-match pattern MERGE creates the WHOLE " +
          "pattern when any part is unmatched, a semantics footgun)"
      case _ ~ cs =>
        "duplicate ON CREATE / ON MATCH clause"
    })
  }

  private def deleteStmt: Parser[Statement] =
    opt(kw("detach")) ~> kw("delete") ~> ident ^^
      (v => DeleteStatement(None, None, v))

  /** `<q> UNION [ALL] <q> ...` — read-only MATCH parts, one
    * consistent UNION form per statement (Cypher).
    */
  private def unionStmt: Parser[Statement] =
    matchOrDelete ~ rep1((kw("union") ~> opt(kw("all"))) ~ matchOrDelete) ^? ({
      case (first: MatchStatement) ~ rest
          if rest.forall(_._2.isInstanceOf[MatchStatement]) &&
            rest.map(_._1.isDefined).distinct.size == 1 =>
        UnionStatement(
          first +: rest.map(_._2.asInstanceOf[MatchStatement]),
          distinct = rest.head._1.isEmpty)
    }, {
      case _ ~ rest if rest.map(_._1.isDefined).distinct.size > 1 =>
        "cannot mix UNION and UNION ALL in one statement (Cypher)"
      case _ => "UNION combines read-only MATCH ... RETURN queries"
    })

  private def statement: Parser[Statement] =
    unionStmt | matchOrDelete | setStmt | mergeStmt | createStmt |
      deleteStmt

  def parse(input: String): Either[String, Statement] =
    parseAll(statement, input) match {
      case Success(stmt, _) => Right(stmt)
      case NoSuccess(msg, next) =>
        Left(s"GQL parse error at ${next.pos.line}:${next.pos.column}: $msg")
      case other => Left(s"GQL parse error: $other")
    }
}
