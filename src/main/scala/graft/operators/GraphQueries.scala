package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.GraphStore
import graft.gql.GqlExecutor
import graft.model.PropValue

/** Graph operator pack: GQL statements executed against the TPC-H
  * property-graph projection (GraphStore.fromTpch), plus the direct
  * traversal APIs (J2-J4, G12, A9).
  *
  * Every oracle recomputes the same answer from the RAW TPC-H tables
  * in DuckDB — the graph projection is deterministic, so parity here
  * proves the whole parser → translator → join-plan path.
  */
object GraphQueries {

  private def g(s: SparkSession, dir: String): GraphStore =
    GraphStore.fromTpch(s, dir)

  private def str(c: org.apache.spark.sql.Column) = PropValue.asString(c)
  private def dbl(c: org.apache.spark.sql.Column) = PropValue.asDouble(c)

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1: full vertex scan — label histogram over the whole vertex
    // set (the projection itself is the scan under test).
    "s1_vertex_scan" -> ((s, dir) => {
      g(s, dir).vertices.groupBy("label")
        .agg(count(lit(1)).as("cnt")).orderBy("label")
    }),

    // S2: full edge scan.
    "s2_edge_scan" -> ((s, dir) => {
      g(s, dir).edges.groupBy("label")
        .agg(count(lit(1)).as("cnt")).orderBy("label")
    }),

    // S4: point edge lookup by (src, dst, label) — the EdgeKey get.
    // Probe nation 0 → region 0 (the nation table is constant across
    // scale factors).
    "s4_edge_lookup" -> ((s, dir) => {
      g(s, dir).edgesBetween(GraphStore.NationOff, GraphStore.RegionOff,
        Some("in_region"))
        .select("src", "dst", "label")
    }),

    // J2: 1-hop traversal — out-neighbors of customer 1 via placed.
    "j2_one_hop" -> ((s, dir) => {
      val st = g(s, dir)
      st.outNeighbors(
        st.vertices.filter(col("id") === GraphStore.CustomerOff + 1),
        Some("placed"))
        .select(col("id")).orderBy("id")
    }),

    // P1+P3: node-pattern filter + WHERE comparison.
    "gql_p1_node_filter" -> ((s, dir) => {
      val r = GqlExecutor.run(g(s, dir),
        """MATCH (c:Customer) WHERE c.acctbal > 5000.0 RETURN c.name""").df
      r.select(str(col("c_name")).as("name")).orderBy("name")
    }),

    // P1: property-equality inside the node pattern.
    "gql_p1_props_pattern" -> ((s, dir) => {
      val r = GqlExecutor.run(g(s, dir),
        """MATCH (c:Customer {mktsegment: "BUILDING"}) RETURN c.name""").df
      r.select(str(col("c_name")).as("name")).orderBy("name")
    }),

    // P3: AND/OR precedence (AND binds tighter).
    "gql_p3_and_or" -> ((s, dir) => {
      val r = GqlExecutor.run(g(s, dir),
        """MATCH (c:Customer) WHERE c.acctbal > 9000.0 OR c.mktsegment = "MACHINERY" AND c.acctbal < 0.0 RETURN c.name, c.acctbal""").df
      r.select(str(col("c_name")).as("name"),
        round(dbl(col("c_acctbal")), 4).as("acctbal")).orderBy("name")
    }),

    // P3 extensions (round 7): NOT / IN / CONTAINS in WHERE — the
    // reference grammar has none of the three (lib.rs:238-251);
    // semantics are Cypher/SQL three-valued logic, pinned here
    // against the DuckDB oracle's NOT / IN / LIKE.
    "gql_where_not_in" -> ((s, dir) => {
      val r = GqlExecutor.run(g(s, dir),
        """MATCH (c:Customer) WHERE c.mktsegment IN ["BUILDING", "MACHINERY"] AND NOT c.acctbal < 0.0 AND c.name CONTAINS "0001" RETURN c.name, c.mktsegment""").df
      r.select(str(col("c_name")).as("name"),
        str(col("c_mktsegment")).as("mktsegment")).orderBy("name")
    }),

    // P3 extension: SQL-style LIKE (the last named miss in the
    // reference's WHERE beside NOT/IN — lib.rs:238-251), pinned
    // against DuckDB's own LIKE.
    "gql_where_like" -> ((s, dir) => {
      val r = GqlExecutor.run(g(s, dir),
        """MATCH (c:Customer) WHERE c.name LIKE "%00001_" AND NOT c.mktsegment = "BUILDING" RETURN c.name, c.mktsegment""").df
      r.select(str(col("c_name")).as("name"),
        str(col("c_mktsegment")).as("mktsegment")).orderBy("name")
    }),

    // P3 extension: Cypher STARTS WITH / ENDS WITH (the pattern-free
    // string predicates beside CONTAINS/LIKE), pinned against
    // DuckDB prefix/suffix LIKE.
    "gql_where_prefix" -> ((s, dir) => {
      val r = GqlExecutor.run(g(s, dir),
        """MATCH (c:Customer) WHERE c.name STARTS WITH "Customer#00000001" OR (c.name ENDS WITH "5" AND c.mktsegment = "AUTOMOBILE") RETURN c.name, c.mktsegment""").df
      r.select(str(col("c_name")).as("name"),
        str(col("c_mktsegment")).as("mktsegment")).orderBy("name")
    }),

    // J1: single-hop pattern expansion.
    "gql_j1_expand" -> ((s, dir) => {
      val r = GqlExecutor.run(g(s, dir),
        """MATCH (c:Customer)-[:placed]->(o:Order) WHERE o.totalprice > 300000.0 RETURN c.name, o.totalprice""").df
      r.select(str(col("c_name")).as("name"),
        round(dbl(col("o_totalprice")), 4).as("totalprice"))
        .orderBy("name", "totalprice")
    }),

    // J1 multi-hop: customer → order → part chain.
    "gql_j1_two_hop" -> ((s, dir) => {
      val r = GqlExecutor.run(g(s, dir),
        """MATCH (c:Customer)-[:placed]->(o:Order)-[:contains]->(p:Part) WHERE p.size > 45 RETURN c.name, p.name""").df
      r.select(str(col("c_name")).as("c_name"), str(col("p_name")).as("p_name"))
        .orderBy("c_name", "p_name")
    }),

    // J1 incoming direction: (n)<-[:located_in]-(s).
    "gql_j1_incoming" -> ((s, dir) => {
      val r = GqlExecutor.run(g(s, dir),
        """MATCH (n:Nation)<-[:located_in]-(sp:Supplier) RETURN n.name, sp.name""").df
      r.select(str(col("n_name")).as("n_name"), str(col("sp_name")).as("s_name"))
        .orderBy("n_name", "s_name")
    }),

    // J3: 2-hop traversal API from a start vertex (dedup, excludes
    // start) — storage lib.rs:802-830 semantics.
    "j3_two_hop" -> ((s, dir) => {
      g(s, dir).twoHop(GraphStore.CustomerOff + 1)
        .orderBy("id")
    }),

    // J4/A9: in-degree stats — orders per supplier via supplied_by
    // edges (the follower-statistics view shape,
    // social_network_platform.rs:211-228).
    "a9_in_degree" -> ((s, dir) => {
      val st = g(s, dir)
      st.edges.filter(col("label") === "supplied_by")
        .groupBy(col("dst"))
        .agg(count(lit(1)).as("in_degree"))
        .select((col("dst") - GraphStore.SupplierOff).as("suppkey"), col("in_degree"))
        .orderBy("suppkey")
    }),

    // G12: common neighbors — supplier pairs counted by shared
    // orders (e1 ⋈ e2 self-join, groupBy pair).
    "g12_common_neighbors" -> ((s, dir) => {
      val e = g(s, dir).edges.filter(col("label") === "supplied_by")
        .select(col("src").as("order_id"), col("dst").as("supp_id"))
      val a = e.select(col("order_id"), col("supp_id").as("s1"))
      val b = e.select(col("order_id").as("order_id2"), col("supp_id").as("s2"))
      a.join(b, col("order_id") === col("order_id2") && col("s1") < col("s2"))
        .groupBy("s1", "s2").agg(count(lit(1)).as("common_orders"))
        .select((col("s1") - GraphStore.SupplierOff).as("suppkey1"),
          (col("s2") - GraphStore.SupplierOff).as("suppkey2"),
          col("common_orders"))
        .orderBy("suppkey1", "suppkey2")
    }),

    // RETURN-aggregate extension: per-nation customer stats straight
    // from GQL (implicit grouping on n.name).
    "gql_return_agg" -> ((s, dir) => {
      val r = GqlExecutor.run(g(s, dir),
        """MATCH (n:Nation)<-[:located_in]-(c:Customer) RETURN n.name, count(c), sum(c.acctbal), min(c.acctbal), max(c.acctbal)""").df
      r.select(str(col("n_name")).as("name"),
        col("count_c").as("cnt"),
        round(col("sum_c_acctbal"), 4).as("sum_acctbal"),
        round(col("min_c_acctbal"), 4).as("min_acctbal"),
        round(col("max_c_acctbal"), 4).as("max_acctbal"))
        .orderBy("name")
    }),

    // collect() list aggregate (round 8): suppliers per nation as a
    // SORTED name list (deterministic order — the documented
    // divergence from Cypher's arbitrary order), flattened to a
    // comma string for the oracle compare.
    "gql_collect" -> ((s, dir) => {
      val r = GqlExecutor.run(g(s, dir),
        "MATCH (n:Nation)<-[:located_in]-(sp:Supplier) RETURN n.name, collect(sp.name)").df
      r.select(str(col("n_name")).as("name"),
        array_join(transform(col("collect_sp_name"),
          e => graft.model.PropValue.asString(e)), ",").as("snames"))
        .orderBy("name")
    }),

    // Pattern predicates (round 8, Cypher existentials): EXISTS and
    // NOT EXISTS as LEFT SEMI / LEFT ANTI joins — rich customers with
    // at least one order, excluding those located in FRANCE. Pinned
    // against DuckDB's own EXISTS / NOT EXISTS.
    "gql_exists" -> ((s, dir) => {
      val r = GqlExecutor.run(g(s, dir),
        "MATCH (c:Customer) WHERE c.acctbal > 9000.0 AND " +
          "(c)-[:placed]->(o:Order) AND " +
          "NOT (c)-[:located_in]->(:Nation {name: \"FRANCE\"}) " +
          "RETURN c.name, c.acctbal").df
      r.select(str(col("c_name")).as("name"),
        round(dbl(col("c_acctbal")), 4).as("acctbal")).orderBy("name")
    }),

    // WITH / multi-MATCH composition (round 8, Cypher WITH): aggregate
    // per customer, filter on the alias (SQL HAVING's role), then
    // RE-match the survivors' nation — the executor carries the
    // binding triplet + alias scalar through an inner join on vertex
    // identity. Full DuckDB value oracle (CTE + HAVING + joins).
    "gql_with_agg" -> ((s, dir) => {
      val r = GqlExecutor.run(g(s, dir),
        "MATCH (c:Customer)-[:placed]->(o:Order) WITH c, count(o) AS cnt " +
          "WHERE cnt > 15 MATCH (c)-[:located_in]->(n:Nation) " +
          "RETURN n.name, c.name, cnt").df
      r.select(str(col("n_name")).as("nation"), str(col("c_name")).as("name"),
        col("cnt")).orderBy("name")
    }),

    // WITH ORDER BY/LIMIT + the direct WITH...RETURN form (round 8):
    // per-customer order counts, top-5 by count (ties broken by
    // name), no re-match — Cypher's most common aggregate shape. The
    // ORDER BY/LIMIT inside WITH is the per-stage top-k (TakeOrdered
    // in the plan, never a global sort of the full aggregate).
    "gql_with_topk" -> ((s, dir) => {
      val r = GqlExecutor.run(g(s, dir),
        "MATCH (c:Customer)-[:placed]->(o:Order) WITH c, count(o) AS cnt " +
          "ORDER BY cnt DESC, c.name ASC LIMIT 5 RETURN c.name, cnt").df
      r.select(str(col("c_name")).as("name"), col("cnt")).orderBy("name")
    }),

    // WHERE arithmetic (round 8): * binds over -, both sides on the
    // numeric view — the filter computes INSIDE the scan-side codegen
    // stage, before the join and the aggregate.
    "gql_arith" -> ((s, dir) => {
      val r = GqlExecutor.run(g(s, dir),
        "MATCH (c:Customer)-[:placed]->(o:Order) " +
          "WHERE o.totalprice - c.acctbal * 10.0 > 400000.0 " +
          "RETURN c.name, count(o)").df
      r.select(str(col("c_name")).as("name"), col("count_o").as("cnt"))
        .orderBy("name")
    }),

    // IS NULL after OPTIONAL MATCH (round 8): the Cypher anti-join
    // idiom — nations with NO supplier survive the left join with a
    // NULL binding and the final WHERE keeps exactly those.
    "gql_is_null" -> ((s, dir) => {
      val r = GqlExecutor.run(g(s, dir),
        "MATCH (n:Nation) OPTIONAL MATCH (n)<-[:located_in]-(sp:Supplier) " +
          "WHERE sp.name IS NULL RETURN n.name").df
      r.select(str(col("n_name")).as("name")).orderBy("name")
    }),

    // count(DISTINCT) (round 8, Cypher): distinct-value aggregation
    // beside the plain count — Spark's count_distinct is the partial-
    // aggregated two-phase form, never a pre-distinct shuffle.
    "gql_count_distinct" -> ((s, dir) => {
      val r = GqlExecutor.run(g(s, dir),
        "MATCH (n:Nation)<-[:located_in]-(c:Customer) " +
          "RETURN n.name, count(DISTINCT c.mktsegment), count(c)").df
      r.select(str(col("n_name")).as("name"),
        col("count_distinct_c_mktsegment").as("segs"),
        col("count_c").as("cnt")).orderBy("name")
    }),

    // UNWIND (round 8, Cypher): a leading literal list cross-composes
    // against the MATCH (broadcast by construction), the element
    // alias drives WHERE (variant-vs-property compare) and grouping.
    "gql_unwind" -> ((s, dir) => {
      val r = GqlExecutor.run(g(s, dir),
        "UNWIND [\"BUILDING\", \"MACHINERY\"] AS seg MATCH (c:Customer) " +
          "WHERE c.mktsegment = seg RETURN seg, count(c)").df
      r.select(str(col("seg")).as("seg"), col("count_c").as("cnt"))
        .orderBy("seg")
    }),

    // UNWIND over a collect() alias: the round trip back to one row
    // per element — pinned against the plain join it must equal.
    "gql_unwind_collect" -> ((s, dir) => {
      val r = GqlExecutor.run(g(s, dir),
        "MATCH (n:Nation)<-[:located_in]-(sp:Supplier) " +
          "WITH n, collect(sp.name) AS names UNWIND names AS nm " +
          "RETURN n.name, nm").df
      r.select(str(col("n_name")).as("name"), str(col("nm")).as("sname"))
        .orderBy("name", "sname")
    }),

    // OPTIONAL MATCH extension (Cypher left-join semantics): nations
    // keep a row even with no supplier — most nations at this scale
    // have none, so the null-padding is load-bearing, not vacuous.
    "gql_optional_match" -> ((s, dir) => {
      val r = GqlExecutor.run(g(s, dir),
        "MATCH (n:Nation) OPTIONAL MATCH (n)<-[:located_in]-(sp:Supplier) RETURN n.name, sp.name").df
      // null-free output: engines disagree on NULL sort order
      // (Spark NULLS FIRST, DuckDB NULLS LAST) — the unmatched marker
      // is an empty string on both sides
      r.select(str(col("n_name")).as("name"),
        coalesce(str(col("sp_name")), lit("")).as("sp_name"))
        .orderBy("name", "sp_name")
    }),

    // RETURN DISTINCT extension: nations having at least one
    // customer, each exactly once despite the per-customer fan-out.
    "gql_return_distinct" -> ((s, dir) => {
      val r = GqlExecutor.run(g(s, dir),
        "MATCH (n:Nation)<-[:located_in]-(c:Customer) RETURN DISTINCT n.name").df
      r.select(str(col("n_name")).as("name")).orderBy("name")
    }),

    // P4 reference semantics: bare `RETURN c` explodes every vertex
    // property into `c.<key>` columns (executor.rs:492-500) — read
    // back through the dotted names and compare values per column.
    "gql_return_var" -> ((s, dir) => {
      val r = GqlExecutor.run(g(s, dir),
        "MATCH (c:Customer) WHERE c.acctbal < 0.0 RETURN c").df
      r.select(str(col("`c.name`")).as("name"),
        round(dbl(col("`c.acctbal`")), 4).as("acctbal"),
        str(col("`c.mktsegment`")).as("mktsegment"),
        dbl(col("`c.nationkey`")).cast("long").as("nationkey"))
        .orderBy("name")
    }),

    // Variable-length path extension: undirected 2-hop through the
    // located_in star = customers sharing customer 1's nation
    // (including the start — the c→nation→c path is a valid walk).
    "gql_varlength" -> ((s, dir) => {
      val r = GqlExecutor.run(g(s, dir),
        """MATCH (c:Customer {name: "Customer#000000001"})-[:located_in*2..2]-(d:Customer) RETURN d.name""").df
      r.select(str(col("d_name")).as("name")).orderBy("name")
    }),

    // Path variables (extension): bind the matched node sequence,
    // return Cypher path functions. Var-length + path var = one row
    // per SIMPLE path; nodes(p) renders the id sequence, so the
    // oracle reconstructs the exact paths from the TPC-H id offsets.
    "gql_path_vars" -> ((s, dir) => {
      val r = GqlExecutor.run(g(s, dir),
        """MATCH p = (c:Customer {name: "Customer#000000001"})-[:located_in*1..2]-(d) RETURN length(p), nodes(p), d.name""").df
      r.select(col("length_p"), col("nodes_p"), str(col("d_name")).as("name"))
        .orderBy("nodes_p")
    }),

    // shortestPath clause (extension; the reference exposes BFS at
    // its storage API — lib.rs:834-871 — but not in the grammar):
    // min-hop connection from one customer to every Supplier within
    // 3 undirected hops, via Algorithms.sssp. All hits land at hop 2
    // (co-located in the customer's nation, or supplying one of its
    // orders): the TPC-H graph is multipartite, so odd-length
    // customer→supplier paths don't exist. The oracle is a genuine
    // recursive-CTE BFS over the same 6-label edge set, min hops per
    // vertex — it does NOT bake in the hop-2 argument.
    "gql_shortest_path" -> ((s, dir) => {
      val r = GqlExecutor.run(g(s, dir),
        """MATCH p = shortestPath((c:Customer {name: "Customer#000000001"})-[*..3]-(s:Supplier)) RETURN s.name, length(p)""").df
      r.select(str(col("s_name")).as("name"), col("length_p").as("hops"))
        .orderBy("name")
    }),

    // GQL write path end-to-end: MATCH-DELETE mutates a fresh copy of
    // the store (cascading incident edges), CREATE appends; the final
    // counts are recomputed relationally by the oracle. Exercises
    // executor.rs:522-615 semantics at scale.
    "gql_mutation_counts" -> ((s, dir) => {
      val base = GraphStore.fromTpch(s, dir)
      val afterDelete = GqlExecutor.run(base,
        "MATCH (c:Customer) WHERE c.acctbal < -900.0 DELETE c").store
      val afterCreate = GqlExecutor.run(afterDelete,
        """CREATE (x:Hub {name: "hub"})-[:links]->(y:Hub {name: "spoke"})""").store
      val vCounts = afterCreate.vertices.groupBy("label")
        .agg(count(lit(1)).as("cnt"))
      val eCounts = afterCreate.edges.groupBy("label")
        .agg(count(lit(1)).as("cnt"))
      vCounts.select(concat(lit("v:"), col("label")).as("kind"), col("cnt"))
        .unionByName(eCounts.select(concat(lit("e:"), col("label")).as("kind"), col("cnt")))
        .orderBy("kind")
    }),

    // CASE in RETURN (round 8, Cypher): branch bucketing as an
    // implicit grouping key — the whole when-chain evaluates inside
    // the aggregate's input projection, one pass.
    "gql_case" -> ((s, dir) => {
      val r = GqlExecutor.run(g(s, dir),
        "MATCH (c:Customer) RETURN CASE WHEN c.acctbal > 5000.0 THEN " +
          "\"high\" WHEN c.acctbal > 0.0 THEN \"mid\" ELSE \"low\" END " +
          "AS tier, count(c) AS cnt").df
      r.select(str(col("tier")).as("tier"), col("cnt")).orderBy("tier")
    }),

    // coalesce (round 8, Cypher): projection defaults over props
    // REMOVEd by a prior mutation — desugars to the CASE machinery,
    // so it groups beside aggregates like any expression key.
    "gql_coalesce" -> ((s, dir) => {
      val base = GraphStore.fromTpch(s, dir)
      val removed = GqlExecutor.run(base,
        "MATCH (c:Customer) WHERE c.acctbal < 0.0 " +
          "REMOVE c.mktsegment").store
      val r = GqlExecutor.run(removed,
        "MATCH (c:Customer) RETURN coalesce(c.mktsegment, " +
          "\"UNKNOWN\") AS seg, count(c) AS cnt").df
      r.select(str(col("seg")).as("seg"), col("cnt")).orderBy("seg")
    }),

    // UNION (round 8, Cypher): two read queries aligned by AS
    // aliases; the distinct form dedups across parts. Spark lowers
    // it to a plain unionByName + HashAggregate — the parts' scans
    // stay independently pushed/pruned.
    "gql_union" -> ((s, dir) => {
      val r = GqlExecutor.run(g(s, dir),
        "MATCH (c:Customer) WHERE c.acctbal > 9900.0 RETURN c.name AS " +
          "name UNION MATCH (p:Supplier) WHERE p.acctbal > 9900.0 " +
          "RETURN p.name AS name").df
      r.select(str(col("name")).as("name")).orderBy("name")
    }),

    // id()/labels() (round 8, Cypher): labels(v) as an implicit
    // grouping key over an UNLABELED full scan (S1 through GQL), and
    // id(v) pinning the library's documented offset id scheme.
    // type(e) (round 9, Cypher): the stored edge label off the edge
    // binding — grouped as an implicit key like labels(v); Order
    // out-edges split into contains (order→part) and supplied_by
    // (order→supplier).
    "gql_type" -> ((s, dir) => {
      GqlExecutor.run(g(s, dir),
        "MATCH (o:Order)-[e]->(x) RETURN type(e) AS rel, count(*) AS cnt").df
        .orderBy("rel")
    }),

    "gql_labels" -> ((s, dir) => {
      val r = GqlExecutor.run(g(s, dir),
        "MATCH (v) RETURN labels(v) AS kind, count(v) AS cnt").df
      val ids = GqlExecutor.run(g(s, dir),
        "MATCH (n:Nation) RETURN id(n) AS vid").df
        .agg(min(col("vid")).as("min_nation_id"),
          count(lit(1)).as("nations"))
      r.crossJoin(ids).orderBy("kind")
    }),

    // MERGE (round 8, Cypher match-or-create): a match-all merge
    // applies ON MATCH to every nation; an unmatched merge creates
    // with ON CREATE; the idempotent re-merge matches the created
    // node (no duplicate) and leaves its create-time props intact.
    "gql_merge" -> ((s, dir) => {
      val base = GraphStore.fromTpch(s, dir)
      val m1 = GqlExecutor.run(base,
        "MERGE (n:Nation) ON MATCH SET n.audited = 1 " +
          "ON CREATE SET n.audited = 0").store
      val m2 = GqlExecutor.run(m1,
        "MERGE (n:Nation {name: \"ATLANTIS\"}) ON MATCH SET n.seen = 1 " +
          "ON CREATE SET n.audited = 0").store
      val m3 = GqlExecutor.run(m2,
        "MERGE (n:Nation {name: \"ATLANTIS\"}) ON MATCH SET n.seen = 1 " +
          "ON CREATE SET n.audited = 9").store
      m3.vertices.filter(col("label") === "Nation")
        .select(str(col("props")("name")).as("name"),
          PropValue.asLong(col("props")("audited")).as("audited"),
          coalesce(PropValue.asLong(col("props")("seen")), lit(-1L))
            .as("seen"))
        .orderBy("name")
    }),

    // Relationship MERGE (round 9, Cypher match-or-create for an
    // edge between BOUND endpoints — the idempotent edge-ingest
    // form): merging Nation×{ASIA} in_region pairs applies ON MATCH
    // to the nations already in ASIA and bulk-creates the missing
    // edges with ON CREATE folded into the insert (one anti-join →
    // one addEdges, no per-pair loop); the idempotent re-merge
    // matches everything (no duplicate, ON CREATE quiet).
    "gql_merge_rel" -> ((s, dir) => {
      val base = GraphStore.fromTpch(s, dir)
      val m1 = GqlExecutor.run(base,
        "MERGE (n:Nation)-[e:in_region]->(r:Region {name: \"ASIA\"}) " +
          "ON MATCH SET e.checked = 1 ON CREATE SET e.fresh = 1").store
      val m2 = GqlExecutor.run(m1,
        "MERGE (n:Nation)-[e:in_region]->(r:Region {name: \"ASIA\"}) " +
          "ON MATCH SET e.seen = 1 ON CREATE SET e.fresh = 9").store
      val nations = m2.vertices.filter(col("label") === "Nation")
        .select(col("id").as("src"), str(col("props")("name")).as("name"))
      val asia = m2.vertices.filter(col("label") === "Region")
        .filter(PropValue.compare(col("props")("name"), "ASIA", "="))
        .select(col("id").as("dst"))
      m2.edges.filter(col("label") === "in_region")
        .join(asia, Seq("dst"), "left_semi")
        .join(nations, Seq("src"))
        .select(col("name"),
          coalesce(PropValue.asLong(col("props")("fresh")), lit(-1L))
            .as("fresh"),
          coalesce(PropValue.asLong(col("props")("checked")), lit(-1L))
            .as("checked"),
          PropValue.asLong(col("props")("seen")).as("seen"))
        .orderBy("name")
    }),

    // String functions (round 8, Cypher): toLower/substring as an
    // implicit grouping key, size+replace in WHERE — the whole call
    // tree evaluates inside the scan's codegen stage, no UDF.
    "gql_strfuncs" -> ((s, dir) => {
      val r = GqlExecutor.run(g(s, dir),
        "MATCH (c:Customer) WHERE size(replace(c.name, \"Customer#\", " +
          "\"\")) = 9 AND toUpper(c.mktsegment) != \"MACHINERY\" " +
          "RETURN substring(toLower(c.mktsegment), 0, 4) AS pre, " +
          "count(c) AS cnt").df
      r.orderBy("pre")
    }),

    // RETURN AS + expression items (round 8, Cypher): aliased output
    // columns and a computed projection — the expression evaluates
    // inside the same codegen stage as the join output.
    "gql_return_expr" -> ((s, dir) => {
      val r = GqlExecutor.run(g(s, dir),
        "MATCH (c:Customer)-[:placed]->(o:Order) WHERE c.acctbal > 9000.0 " +
          "RETURN c.name AS name, o.totalprice * 0.9 AS discounted").df
      r.select(str(col("name")).as("name"),
        round(col("discounted"), 4).as("discounted"))
        .orderBy("name", "discounted")
    }),

    // GQL SET/REMOVE (round 8): arithmetic raise on the matched
    // segment, then a REMOVE keyed on the POST-SET value — the
    // read-back regroups the mutated store, every step recomputable
    // from raw TPC-H.
    "gql_set" -> ((s, dir) => {
      val base = GraphStore.fromTpch(s, dir)
      val afterSet = GqlExecutor.run(base,
        "MATCH (c:Customer) WHERE c.mktsegment = \"BUILDING\" " +
          "SET c.acctbal = c.acctbal * 1.1").store
      val afterRemove = GqlExecutor.run(afterSet,
        "MATCH (c:Customer) WHERE c.acctbal < 0.0 REMOVE c.mktsegment").store
      afterRemove.vertices.filter(col("label") === "Customer")
        .select(
          coalesce(str(col("props")("mktsegment")), lit("(none)")).as("seg"),
          dbl(col("props")("acctbal")).as("bal"))
        .groupBy("seg")
        .agg(count(lit(1)).as("cnt"), round(sum("bal"), 4).as("bal"))
        .orderBy("seg")
    }),

    // X1: the full mutation-op surface (remove_edge +
    // update_vertex_props / update_edge_props, matching the
    // reference's GraphOperation enum, storage/src/lib.rs:49-72):
    // remove region-0 membership edges, zero out BUILDING customers'
    // props, stamp quantity=999 onto the contains edges of the first
    // 100 orders — then read back counts/sums AND the change-feed
    // op tallies, all recomputable from raw TPC-H in DuckDB.
    "x1_mutation_ops" -> ((s, dir) => {
      val base = GraphStore.fromTpch(s, dir)
      val dropKeys = base.edges.filter(col("label") === "in_region" &&
        col("dst") === GraphStore.RegionOff)
        .select("src", "dst", "label")
      val s1 = base.removeEdges(dropKeys)
      val vUpd = base.vertices.filter(col("label") === "Customer" &&
        PropValue.compare(col("props")("mktsegment"), "BUILDING", "="))
        .select(col("id"), map(lit("flagged"), GraphStore.pv(true)).as("props"))
      val s2 = s1.updateVertexProps(vUpd)
      val eUpd = base.edges.filter(col("label") === "contains" &&
        col("src") < GraphStore.OrderOff + 100L)
        .select(col("src"), col("dst"), col("label"),
          map(lit("quantity"), GraphStore.pv(999.0)).as("props"))
      val s3 = s2.updateEdgeProps(eUpd)
      val acctbalSum = s3.vertices.filter(col("label") === "Customer")
        .agg(round(sum(dbl(col("props")("acctbal"))), 2).cast("double").as("val"))
        .select(lit("v:acctbal_sum").as("kind"), col("val"))
      val inRegion = s3.edges.filter(col("label") === "in_region")
        .agg(count(lit(1)).cast("double").as("val"))
        .select(lit("e:in_region").as("kind"), col("val"))
      val q999 = s3.edges.filter(col("label") === "contains" &&
        PropValue.compare(col("props")("quantity"), 999.0, "="))
        .agg(count(lit(1)).cast("double").as("val"))
        .select(lit("e:quantity999").as("kind"), col("val"))
      val feed = s3.changes.groupBy("op")
        .agg(count(lit(1)).cast("double").as("val"))
        .select(concat(lit("ch:"), col("op")).as("kind"), col("val"))
      acctbalSum.unionByName(inRegion).unionByName(q999).unionByName(feed)
        .orderBy("kind")
    }),

    // A8: degree centrality — max total degree / (2·(n−1)) over the
    // located_in/in_region membership subgraph
    // (incremental_engine.rs:1288-1326).
    "a8_degree_centrality" -> ((s, dir) => {
      val st = g(s, dir)
      val e = st.edges.filter(col("label").isin("located_in", "in_region"))
      val touched = e.select(col("src").as("id"))
        .unionByName(e.select(col("dst").as("id")))
      val degrees = touched.groupBy("id").agg(count(lit(1)).as("degree"))
      val n = degrees.agg(count(lit(1)).as("n"), max(col("degree")).as("max_degree"))
      n.select(round(col("max_degree").cast("double")
        / (lit(2.0) * (col("n") - 1).cast("double")), 6).as("degree_centrality"))
    })
  )

  val oracles: Map[String, String] = Map(
    "s1_vertex_scan" ->
      """SELECT label, COUNT(*) AS cnt FROM (
           SELECT 'Customer' AS label FROM customer
           UNION ALL SELECT 'Supplier' FROM supplier
           UNION ALL SELECT 'Part' FROM part
           UNION ALL SELECT 'Order' FROM orders
           UNION ALL SELECT 'Nation' FROM nation
           UNION ALL SELECT 'Region' FROM region)
         GROUP BY label ORDER BY label""",
    "s2_edge_scan" ->
      """SELECT label, COUNT(*) AS cnt FROM (
           SELECT 'placed' AS label FROM orders
           UNION ALL SELECT 'contains'
             FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
           UNION ALL SELECT 'supplied_by'
             FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
           UNION ALL SELECT 'located_in' FROM customer
           UNION ALL SELECT 'located_in' FROM supplier
           UNION ALL SELECT 'in_region' FROM nation)
         GROUP BY label ORDER BY label""",
    "s4_edge_lookup" ->
      """SELECT CAST(2000000000 AS BIGINT) AS src,
                CAST(1000000000 AS BIGINT) AS dst,
                'in_region' AS label
         FROM nation WHERE n_nationkey = 0 AND n_regionkey = 0""",
    "j2_one_hop" ->
      """SELECT o_orderkey + 6000000000 AS id FROM orders
         WHERE o_custkey = 1 ORDER BY id""",
    "gql_p1_node_filter" ->
      "SELECT c_name AS name FROM customer WHERE c_acctbal > 5000.0 ORDER BY name",
    "gql_p1_props_pattern" ->
      "SELECT c_name AS name FROM customer WHERE c_mktsegment = 'BUILDING' ORDER BY name",
    "gql_p3_and_or" ->
      """SELECT c_name AS name, ROUND(c_acctbal, 4) AS acctbal FROM customer
         WHERE c_acctbal > 9000.0 OR (c_mktsegment = 'MACHINERY' AND c_acctbal < 0.0)
         ORDER BY name""",
    "gql_where_not_in" ->
      """SELECT c_name AS name, c_mktsegment AS mktsegment FROM customer
         WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
           AND NOT (c_acctbal < 0.0) AND c_name LIKE '%0001%'
         ORDER BY name""",
    "gql_where_like" ->
      """SELECT c_name AS name, c_mktsegment AS mktsegment FROM customer
         WHERE c_name LIKE '%00001_' AND NOT (c_mktsegment = 'BUILDING')
         ORDER BY name""",
    "gql_where_prefix" ->
      """SELECT c_name AS name, c_mktsegment AS mktsegment FROM customer
         WHERE c_name LIKE 'Customer#00000001%'
            OR (c_name LIKE '%5' AND c_mktsegment = 'AUTOMOBILE')
         ORDER BY name""",
    "gql_j1_expand" ->
      """SELECT c_name AS name, ROUND(o_totalprice, 4) AS totalprice
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE o_totalprice > 300000.0 ORDER BY name, totalprice""",
    "gql_j1_two_hop" ->
      """SELECT c_name, p_name
         FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) li
         JOIN orders   ON li.l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN part     ON li.l_partkey = p_partkey
         WHERE p_size > 45 ORDER BY c_name, p_name""",
    "gql_j1_incoming" ->
      """SELECT n_name, s_name
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
         ORDER BY n_name, s_name""",
    "j3_two_hop" ->
      """SELECT DISTINCT x.id FROM (
           SELECT li.l_partkey + 5000000000 AS id
           FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) li
           JOIN orders ON li.l_orderkey = o_orderkey WHERE o_custkey = 1
           UNION
           SELECT li.l_suppkey + 4000000000 AS id
           FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) li
           JOIN orders ON li.l_orderkey = o_orderkey WHERE o_custkey = 1
           UNION
           SELECT n.n_regionkey + 1000000000 AS id
           FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
           WHERE c.c_custkey = 1
         ) x WHERE x.id <> 3000000001 ORDER BY x.id""",
    "a9_in_degree" ->
      """SELECT l_suppkey AS suppkey, COUNT(*) AS in_degree
         FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
         GROUP BY l_suppkey ORDER BY suppkey""",
    "g12_common_neighbors" ->
      """SELECT a.l_suppkey AS suppkey1, b.l_suppkey AS suppkey2,
                COUNT(*) AS common_orders
         FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) a
         JOIN (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) b
           ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
         GROUP BY 1, 2 ORDER BY suppkey1, suppkey2""",
    "gql_return_agg" ->
      """SELECT n_name AS name, COUNT(*) AS cnt,
                ROUND(SUM(c_acctbal), 4) AS sum_acctbal,
                ROUND(MIN(c_acctbal), 4) AS min_acctbal,
                ROUND(MAX(c_acctbal), 4) AS max_acctbal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY name""",
    "gql_collect" ->
      """SELECT n_name AS name,
                array_to_string(list_sort(list(s_name)), ',') AS snames
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
         GROUP BY n_name ORDER BY name""",
    "gql_exists" ->
      """SELECT c_name AS name, ROUND(c_acctbal, 4) AS acctbal FROM customer
         WHERE c_acctbal > 9000.0
           AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
           AND NOT EXISTS (SELECT 1 FROM nation
                           WHERE n_nationkey = c_nationkey
                             AND n_name = 'FRANCE')
         ORDER BY name""",
    "gql_with_agg" ->
      """WITH co AS (SELECT o_custkey, COUNT(*) AS cnt FROM orders
                     GROUP BY 1 HAVING COUNT(*) > 15)
         SELECT n_name AS nation, c_name AS name, cnt
         FROM co JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         ORDER BY name""",
    "gql_with_topk" ->
      """SELECT name, cnt FROM (
           SELECT c_name AS name, COUNT(*) AS cnt
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY c_name ORDER BY cnt DESC, c_name ASC LIMIT 5)
         ORDER BY name""",
    "gql_arith" ->
      """SELECT c_name AS name, COUNT(*) AS cnt
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE o_totalprice - c_acctbal * 10.0 > 400000.0
         GROUP BY c_name ORDER BY name""",
    "gql_is_null" ->
      """SELECT n_name AS name FROM nation
         WHERE n_nationkey NOT IN (SELECT s_nationkey FROM supplier)
         ORDER BY name""",
    "gql_count_distinct" ->
      """SELECT n_name AS name, COUNT(DISTINCT c_mktsegment) AS segs,
                COUNT(*) AS cnt
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY name""",
    "gql_unwind" ->
      """SELECT seg, COUNT(*) AS cnt
         FROM (SELECT 'BUILDING' AS seg UNION ALL SELECT 'MACHINERY') t
         JOIN customer ON c_mktsegment = seg
         GROUP BY seg ORDER BY seg""",
    "gql_unwind_collect" ->
      """SELECT n_name AS name, s_name AS sname
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
         ORDER BY name, sname""",
    "gql_varlength" ->
      """SELECT c2.c_name AS name
         FROM customer c1 JOIN customer c2 ON c1.c_nationkey = c2.c_nationkey
         WHERE c1.c_name = 'Customer#000000001' ORDER BY name""",
    // Recursive-CTE BFS over the full 6-label undirected edge set:
    // min hops per vertex from the seed customer, restricted to
    // suppliers within 3 hops — the genuine shortest-path reference,
    // no baked-in assumptions about which hop count wins.
    "gql_shortest_path" ->
      """WITH RECURSIVE seed AS (
           SELECT c_custkey + 3000000000 AS id FROM customer
           WHERE c_name = 'Customer#000000001'),
         ed AS (
           SELECT o_custkey + 3000000000 AS src, o_orderkey + 6000000000 AS dst FROM orders
           UNION ALL
           SELECT l_orderkey + 6000000000, l_partkey + 5000000000 FROM lineitem
           UNION ALL
           SELECT l_orderkey + 6000000000, l_suppkey + 4000000000 FROM lineitem
           UNION ALL
           SELECT c_custkey + 3000000000, c_nationkey + 2000000000 FROM customer
           UNION ALL
           SELECT s_suppkey + 4000000000, s_nationkey + 2000000000 FROM supplier
           UNION ALL
           SELECT n_nationkey + 2000000000, n_regionkey + 1000000000 FROM nation),
         sym AS (SELECT src, dst FROM ed UNION SELECT dst, src FROM ed),
         bfs(id, d) AS (
           SELECT id, 0 FROM seed
           UNION
           SELECT sym.dst, b.d + 1 FROM bfs b JOIN sym ON sym.src = b.id
           WHERE b.d < 3),
         md AS (SELECT id, MIN(d) AS hops FROM bfs GROUP BY id)
         SELECT s_name AS name, CAST(md.hops AS INTEGER) AS hops
         FROM md JOIN supplier ON md.id = s_suppkey + 4000000000
         WHERE md.hops >= 1
         ORDER BY name""",
    // Path ids from the disjoint TPC-H id offsets (GraphStore:
    // customer +3e9, nation +2e9, supplier +4e9). 1 hop reaches the
    // nation; 2 undirected hops fan back out to every other
    // customer/supplier located in it (simple paths — never back to
    // the seed customer).
    "gql_path_vars" ->
      """WITH c1 AS (SELECT c_custkey, c_nationkey FROM customer
                     WHERE c_name = 'Customer#000000001')
         SELECT * FROM (
           SELECT CAST(1 AS INTEGER) AS length_p,
                  CAST(3000000000 + c_custkey AS VARCHAR) || '->' ||
                  CAST(2000000000 + c_nationkey AS VARCHAR) AS nodes_p,
                  n_name AS name
           FROM c1 JOIN nation ON n_nationkey = c_nationkey
           UNION ALL
           SELECT CAST(2 AS INTEGER),
                  CAST(3000000000 + c1.c_custkey AS VARCHAR) || '->' ||
                  CAST(2000000000 + c1.c_nationkey AS VARCHAR) || '->' ||
                  CAST(3000000000 + c2.c_custkey AS VARCHAR),
                  c2.c_name
           FROM c1 JOIN customer c2 ON c2.c_nationkey = c1.c_nationkey
                                   AND c2.c_custkey <> c1.c_custkey
           UNION ALL
           SELECT CAST(2 AS INTEGER),
                  CAST(3000000000 + c1.c_custkey AS VARCHAR) || '->' ||
                  CAST(2000000000 + c1.c_nationkey AS VARCHAR) || '->' ||
                  CAST(4000000000 + s.s_suppkey AS VARCHAR),
                  s.s_name
           FROM c1 JOIN supplier s ON s.s_nationkey = c1.c_nationkey
         ) ORDER BY nodes_p""",
    "gql_case" ->
      """SELECT CASE WHEN c_acctbal > 5000.0 THEN 'high'
                     WHEN c_acctbal > 0.0 THEN 'mid'
                     ELSE 'low' END AS tier, COUNT(*) AS cnt
         FROM customer GROUP BY tier ORDER BY tier""",
    "gql_coalesce" ->
      """SELECT CASE WHEN c_acctbal < 0.0 THEN 'UNKNOWN'
                     ELSE c_mktsegment END AS seg, COUNT(*) AS cnt
         FROM customer GROUP BY seg ORDER BY seg""",
    "gql_union" ->
      """SELECT c_name AS name FROM customer WHERE c_acctbal > 9900.0
         UNION
         SELECT s_name FROM supplier WHERE s_acctbal > 9900.0
         ORDER BY name""",
    "gql_type" ->
      """SELECT 'contains' AS rel, COUNT(*) AS cnt
         FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
         UNION ALL
         SELECT 'supplied_by' AS rel, COUNT(*) AS cnt
         FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
         ORDER BY rel""",
    "gql_labels" ->
      """WITH counts(kind, cnt) AS (
           SELECT 'Customer', COUNT(*) FROM customer UNION ALL
           SELECT 'Supplier', COUNT(*) FROM supplier UNION ALL
           SELECT 'Part', COUNT(*) FROM part UNION ALL
           SELECT 'Order', COUNT(*) FROM orders UNION ALL
           SELECT 'Nation', COUNT(*) FROM nation UNION ALL
           SELECT 'Region', COUNT(*) FROM region)
         SELECT kind, cnt,
                (SELECT MIN(n_nationkey) + 2000000000 FROM nation)
                  AS min_nation_id,
                (SELECT COUNT(*) FROM nation) AS nations
         FROM counts ORDER BY kind""",
    "gql_merge" ->
      """SELECT n_name AS name, CAST(1 AS BIGINT) AS audited,
                CAST(-1 AS BIGINT) AS seen FROM nation
         UNION ALL
         SELECT 'ATLANTIS', 0, 1
         ORDER BY name""",
    "gql_merge_rel" ->
      """SELECT n_name AS name,
                CASE WHEN r.r_name = 'ASIA' THEN CAST(-1 AS BIGINT)
                     ELSE CAST(1 AS BIGINT) END AS fresh,
                CASE WHEN r.r_name = 'ASIA' THEN CAST(1 AS BIGINT)
                     ELSE CAST(-1 AS BIGINT) END AS checked,
                CAST(1 AS BIGINT) AS seen
         FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
         ORDER BY name""",
    "gql_strfuncs" ->
      """SELECT substring(lower(c_mktsegment), 1, 4) AS pre,
                COUNT(*) AS cnt
         FROM customer
         WHERE length(replace(c_name, 'Customer#', '')) = 9
           AND upper(c_mktsegment) <> 'MACHINERY'
         GROUP BY pre ORDER BY pre""",
    "gql_return_expr" ->
      """SELECT c_name AS name, ROUND(o_totalprice * 0.9, 4) AS discounted
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE c_acctbal > 9000.0 ORDER BY name, discounted""",
    "gql_set" ->
      """WITH c2 AS (
           SELECT CASE WHEN c_mktsegment = 'BUILDING'
                       THEN c_acctbal * 1.1 ELSE c_acctbal END AS bal,
                  c_mktsegment AS seg0
           FROM customer),
         c3 AS (SELECT bal,
                  CASE WHEN bal < 0.0 THEN '(none)' ELSE seg0 END AS seg
                FROM c2)
         SELECT seg, COUNT(*) AS cnt, ROUND(SUM(bal), 4) AS bal
         FROM c3 GROUP BY seg ORDER BY seg""",
    "gql_mutation_counts" ->
      """WITH kept AS (SELECT c_custkey FROM customer WHERE NOT (c_acctbal < -900.0))
         SELECT kind, cnt FROM (
           SELECT 'v:Customer' AS kind, COUNT(*) AS cnt FROM kept
           UNION ALL SELECT 'v:Supplier', COUNT(*) FROM supplier
           UNION ALL SELECT 'v:Part', COUNT(*) FROM part
           UNION ALL SELECT 'v:Order', COUNT(*) FROM orders
           UNION ALL SELECT 'v:Nation', COUNT(*) FROM nation
           UNION ALL SELECT 'v:Region', COUNT(*) FROM region
           UNION ALL SELECT 'v:Hub', CAST(2 AS BIGINT)
           UNION ALL SELECT 'e:placed', COUNT(*) FROM orders
             WHERE o_custkey IN (SELECT c_custkey FROM kept)
           UNION ALL SELECT 'e:contains', COUNT(*)
             FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
           UNION ALL SELECT 'e:supplied_by', COUNT(*)
             FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
           UNION ALL SELECT 'e:located_in',
             (SELECT COUNT(*) FROM kept) + (SELECT COUNT(*) FROM supplier)
           UNION ALL SELECT 'e:in_region', COUNT(*) FROM nation
           UNION ALL SELECT 'e:links', CAST(1 AS BIGINT)
         ) ORDER BY kind""",
    "gql_optional_match" ->
      """SELECT n_name AS name, COALESCE(s_name, '') AS sp_name
         FROM nation LEFT JOIN supplier ON s_nationkey = n_nationkey
         ORDER BY name, sp_name""",
    "gql_return_distinct" ->
      """SELECT DISTINCT n_name AS name
         FROM nation JOIN customer ON c_nationkey = n_nationkey
         ORDER BY name""",
    "gql_return_var" ->
      """SELECT c_name AS name, ROUND(c_acctbal, 4) AS acctbal,
                c_mktsegment AS mktsegment,
                CAST(c_nationkey AS BIGINT) AS nationkey
         FROM customer WHERE c_acctbal < 0.0 ORDER BY name""",
    "x1_mutation_ops" ->
      """SELECT kind, val FROM (
           SELECT 'v:acctbal_sum' AS kind,
             ROUND(SUM(CASE WHEN c_mktsegment <> 'BUILDING'
               THEN c_acctbal END), 2) AS val FROM customer
           UNION ALL SELECT 'e:in_region',
             CAST(COUNT(*) AS DOUBLE) FROM nation WHERE n_regionkey <> 0
           UNION ALL SELECT 'e:quantity999', CAST(COUNT(*) AS DOUBLE)
             FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
                   WHERE l_orderkey < 100)
           UNION ALL SELECT 'ch:remove_edge',
             CAST(COUNT(*) AS DOUBLE) FROM nation WHERE n_regionkey = 0
           UNION ALL SELECT 'ch:update_vertex_props',
             CAST(COUNT(*) AS DOUBLE) FROM customer
             WHERE c_mktsegment = 'BUILDING'
           UNION ALL SELECT 'ch:update_edge_props', CAST(COUNT(*) AS DOUBLE)
             FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
                   WHERE l_orderkey < 100)
         ) ORDER BY kind""",
    "a8_degree_centrality" ->
      """WITH e AS (
           SELECT c_custkey + 3000000000 AS src, c_nationkey + 2000000000 AS dst FROM customer
           UNION ALL
           SELECT s_suppkey + 4000000000, s_nationkey + 2000000000 FROM supplier
           UNION ALL
           SELECT n_nationkey + 2000000000, n_regionkey + 1000000000 FROM nation),
         touched AS (SELECT src AS id FROM e UNION ALL SELECT dst FROM e),
         degrees AS (SELECT id, COUNT(*) AS degree FROM touched GROUP BY id)
         SELECT ROUND(CAST(MAX(degree) AS DOUBLE)
                / (2.0 * (COUNT(*) - 1)), 6) AS degree_centrality
         FROM degrees"""
  )
}
