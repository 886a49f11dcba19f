package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.{Layout, Sampling, VecExpressions}

/** Property tests for the invariant-heavy scalar primitives. Inputs
  * come from scalacheck generators (fixed seed — failures reproduce),
  * but each property evaluates as ONE DataFrame job over the whole
  * generated batch, not one job per case, so the suite stays fast.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(42L))

  test("property: zorder key bit-exactly interleaves and is invertible") {
    val pairs = sample(Gen.zip(Gen.choose(0L, 255L), Gen.choose(0L, 255L)), 500)
    val df = pairs.toDF("x", "y")
      .withColumn("z", Layout.zorderKey(Seq(col("x"), col("y")), 8))
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.foreach { case (x, y, z) =>
      // reference interleave in plain Scala
      var expect = 0L
      for (i <- 0 until 8) {
        expect |= ((x >> i) & 1L) << (2 * i)
        expect |= ((y >> i) & 1L) << (2 * i + 1)
      }
      assert(z == expect, s"($x,$y)")
      // invertible: de-interleaving recovers both dims
      var (rx, ry) = (0L, 0L)
      for (i <- 0 until 8) {
        rx |= ((z >> (2 * i)) & 1L) << i
        ry |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert(rx == x && ry == y, s"($x,$y) -> $z")
    }
  }

  test("property: sorted_intersect equals set-intersection cardinality") {
    val gSet = Gen.listOf(Gen.choose(-50L, 50L)).map(_.distinct.sorted)
    val cases = sample(Gen.zip(gSet, gSet), 300)
      .filter { case (a, b) => a.nonEmpty && b.nonEmpty }
    val df = cases.toDF("a", "b")
      .withColumn("n", VecExpressions.sortedIntersect(spark, col("a"), col("b")))
    df.collect().foreach { r =>
      val a = r.getSeq[Long](0).toSet
      val b = r.getSeq[Long](1).toSet
      assert(r.getInt(2) == (a & b).size, s"$a ∩ $b")
    }
  }

  test("property: id hash / mix key stay in range for ANY non-negative id") {
    // includes the > 3.47e9 ids that overflowed the pre-round-5 recipe
    val ids = sample(Gen.oneOf(Gen.choose(0L, 10000L),
      Gen.choose(3L << 30, Long.MaxValue)), 500)
    val df = ids.toDF("id")
      .withColumn("h", Sampling.idHash(col("id")))
    df.collect().foreach { r =>
      val h = r.getLong(1)
      assert(h >= 0 && h < Sampling.Denominator, s"id=${r.getLong(0)} h=$h")
    }
    // deterministic: same ids, same hashes, any partitioning
    val again = ids.toDF("id").repartition(7)
      .withColumn("h", Sampling.idHash(col("id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val first = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == first)
  }

  test("property: multiSourceBfs equals a reference BFS on random graphs") {
    // one random directed graph (25 vertices, ~60 edges) + seed set;
    // the DataFrame frontier loop must agree with a plain-Scala BFS
    // on every (source, vertex) min-hop pair, at a binding hop cap
    val vN = 25
    val edges = sample(
      Gen.zip(Gen.choose(1L, vN.toLong), Gen.choose(1L, vN.toLong)), 60)
      .filter { case (a, b) => a != b }.distinct
    val seeds = sample(Gen.choose(1L, vN.toLong), 6).distinct
    val maxHops = 4
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    def refBfs(s: Long): Map[Long, Int] = {
      var dist = Map(s -> 0)
      var frontier = Seq(s)
      for (h <- 1 to maxHops) {
        frontier = frontier.flatMap(v => adj.getOrElse(v, Nil))
          .distinct.filterNot(dist.contains)
        frontier.foreach(v => dist += v -> h)
      }
      dist
    }
    val expect = seeds.flatMap(s =>
      refBfs(s).map { case (v, d) => (s, v) -> d }).toMap
    val got = graft.algorithms.Algorithms.multiSourceBfs(
        edges.toDF("src", "dst"), seeds.toDF("id"), maxHops)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got == expect)
  }

  /** Reference SCC: textbook recursive Tarjan in plain Scala (fine at
    * this graph size), components labeled by their min member id —
    * the same convention `stronglyConnectedComponents` emits.
    */
  private def tarjanScc(vs: Seq[Long], es: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = es.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val idx = scala.collection.mutable.Map.empty[Long, Int]
    val low = scala.collection.mutable.Map.empty[Long, Int]
    val onStack = scala.collection.mutable.Set.empty[Long]
    val stack = scala.collection.mutable.Stack.empty[Long]
    var next = 0
    var comps = List.empty[List[Long]]
    def strong(v: Long): Unit = {
      idx(v) = next; low(v) = next; next += 1
      stack.push(v); onStack += v
      for (w <- adj.getOrElse(v, Nil)) {
        if (!idx.contains(w)) { strong(w); low(v) = math.min(low(v), low(w)) }
        else if (onStack(w)) low(v) = math.min(low(v), idx(w))
      }
      if (low(v) == idx(v)) {
        var comp = List.empty[Long]
        var w = -1L
        while (w != v) { w = stack.pop(); onStack -= w; comp ::= w }
        comps ::= comp
      }
    }
    vs.foreach(v => if (!idx.contains(v)) strong(v))
    comps.flatMap { c => val m = c.min; c.map(_ -> m) }.toMap
  }

  test("property: SCC equals Tarjan on random graphs") {
    // random directed graph with planted cycles: base edges plus the
    // reverse of every third one (guarantees non-trivial SCCs without
    // collapsing everything into one), across three seeds
    for (seed <- Seq(42L, 43L, 44L)) {
      val vN = 22
      val base = Gen.listOfN(70,
          Gen.zip(Gen.choose(1L, vN.toLong), Gen.choose(1L, vN.toLong)))
        .pureApply(Gen.Parameters.default, Seed(seed))
        .filter { case (a, b) => a != b }.distinct
      val es = (base ++ base.zipWithIndex.collect {
        case ((a, b), i) if i % 3 == 0 => (b, a)
      }).distinct
      val vs = (1L to vN.toLong)
      val expect = tarjanScc(vs, es)
      val got = graft.algorithms.Algorithms.stronglyConnectedComponents(
          vs.toDF("id"), es.toDF("src", "dst"), numIter = 50)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, s"seed=$seed")
    }
  }

  test("SCC numIter cap: best-effort labels, logged, never silent-wrong peeled rows") {
    // a singleton-SCC chain 1→2→…→10 peels exactly ONE vertex per
    // outer round (each round's sole root is the current min id), so
    // numIter = 3 forces the cap path: peeled {1,2,3} keep exact
    // labels, and the unpeeled tail keeps the LAST round's forward
    // fixpoint — computed on remaining = {3..10} before 3 was peeled,
    // so every leftover carries the merged best-effort label 3
    val chain = (1L until 10L).map(v => (v, v + 1))
    val vs = (1L to 10L).toDF("id")
    val capped = graft.algorithms.Algorithms.stronglyConnectedComponents(
        vs, chain.toDF("src", "dst"), numIter = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped.keySet == (1L to 10L).toSet)
    (1L to 3L).foreach(v => assert(capped(v) == v, s"peeled $v"))
    (4L to 10L).foreach(v => assert(capped(v) == 3L, s"unpeeled $v"))
    // with the cap lifted the same input matches Tarjan exactly
    val full = graft.algorithms.Algorithms.stronglyConnectedComponents(
        vs, chain.toDF("src", "dst"), numIter = 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full == tarjanScc(1L to 10L, chain))
  }

  test("property: normalizeDim clamps any long into [0, 2^bits), order-preserving") {
    val cases = sample(Gen.choose(-100000L, 100000L), 400).distinct.sorted
    val df = cases.toDF("v")
      .withColumn("b", Layout.normalizeDim(col("v"), -1000L, 1000L, 8))
    val rows = df.orderBy("v").collect().map(r => (r.getLong(0), r.getLong(1)))
    rows.foreach { case (v, b) =>
      assert(b >= 0 && b < 256, s"v=$v b=$b")
    }
    // monotone: sorting by the value never decreases the bucket
    rows.sliding(2).foreach {
      case Array((v1, b1), (v2, b2)) => assert(b1 <= b2, s"$v1->$b1, $v2->$b2")
      case _ =>
    }
  }
}
