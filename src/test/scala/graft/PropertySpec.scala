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
