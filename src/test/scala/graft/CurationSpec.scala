package graft

import org.apache.spark.sql.functions._

import graft.algorithms.Algorithms
import graft.functions.{Curation, EmbeddingOps}
import graft.sources.Tables

class CurationSpec extends SparkSpec {
  import spark.implicits._

  /** The production deterministic-order hash (Curation.scala:73,
    * Sampling.scala:38) — mod BEFORE multiply, so expected values
    * stay right for ids past 1e9+7 too. Tests must share the exact
    * formula, not a for-small-ids-equivalent one.
    */
  private def detHash(id: Long): Long =
    ((id % 1000000007L) * 2654435761L) % 1000000007L

  // ---- domainTopK ---------------------------------------------------

  test("domainTopK keeps k per stratum with deterministic ties") {
    val df = Seq(
      (1L, "a", 0.9), (2L, "a", 0.9), (3L, "a", 0.5),
      (4L, "b", 0.1)
    ).toDF("id", "src", "score")
    val out = Curation.domainTopK(df, "src", "id", "score", 2)
      .select("src", "rank", "id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    // tie at 0.9 broken by id asc; id 3 (rank 3) dropped
    assert(out == Set(("a", 1, 1L), ("a", 2, 2L), ("b", 1, 4L)))
  }

  // ---- corpusDrift ----------------------------------------------------

  test("corpusDrift: identical snapshots read exactly 0; disjoint vocab " +
    "reads high; symmetric") {
    val a = Seq((1L, "alpha beta gamma delta"), (2L, "beta gamma epsilon"))
      .toDF("doc_id", "text")
    val same = Curation.corpusDrift(a, a, "doc_id", "text",
      buckets = 16, alpha = 0.01).head()
    assert(same.getDouble(2) == 0.0)
    val b = Seq((3L, "zeta eta theta iota"), (4L, "eta theta kappa"))
      .toDF("doc_id", "text")
    val diff = Curation.corpusDrift(a, b, "doc_id", "text",
      buckets = 16, alpha = 0.01).head()
    assert(diff.getDouble(2) > 0.5, s"disjoint vocab: ${diff.getDouble(2)}")
    val rev = Curation.corpusDrift(b, a, "doc_id", "text",
      buckets = 16, alpha = 0.01).head()
    assert(rev.getDouble(2) == diff.getDouble(2), "JS is symmetric")
  }

  test("corpusDrift: quantized output matches a dense all-buckets JS " +
    "and includes the untouched-bucket correction when totals differ") {
    // n_a ≫ n_b so the untouched-bucket floors α/(n_a+αB) vs
    // α/(n_b+αB) differ materially — the r10 ADVICE case the old
    // touched-only sum silently dropped
    val bigText = (0 to 1000).map(i => "w" + (i % 37)).mkString(" ")
    val a = Seq((1L, bigText)).toDF("doc_id", "text")
    val b = Seq((2L, "alpha beta kappa")).toDF("doc_id", "text")
    val B = 4096
    def prof(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      graft.functions.TextFunctions.shingleRows(df, "doc_id", "text", 2)
        .select((conv(substring(md5(col("s")), 1, 8), 16, 10)
          .cast("long") % B).as("bk"))
        .groupBy("bk").agg(count(lit(1)).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pa = prof(a); val pb = prof(b)
    val na = pa.values.sum.toDouble; val nb = pb.values.sum.toDouble
    assert(na != nb && pa.size + pb.size < B, "fixture precondition")
    def jsTerm(p: Double, q: Double): Double = {
      val m = (p + q) / 2
      p * math.log(p / m) / math.log(2) / 2 +
        q * math.log(q / m) / math.log(2) / 2
    }
    // dense reference: ALL B buckets, plain (unquantized) double sum
    val dense = (0 until B).map { k =>
      jsTerm((pa.getOrElse(k.toLong, 0L) + 1.0) / (na + B),
        (pb.getOrElse(k.toLong, 0L) + 1.0) / (nb + B))
    }.sum
    val touchedOnly = (pa.keySet ++ pb.keySet).toSeq.map { k =>
      jsTerm((pa.getOrElse(k, 0L) + 1.0) / (na + B),
        (pb.getOrElse(k, 0L) + 1.0) / (nb + B))
    }.sum
    val out = Curation.corpusDrift(a, b, "doc_id", "text").head()
    assert(out.getLong(0).toDouble == na && out.getLong(1).toDouble == nb)
    val js = out.getDouble(2)
    // quantization bias ≤ B·0.5e-9 + 0.5e-6 presentation rounding
    assert(math.abs(js - dense) < 5e-6,
      s"dense=$dense quantized=$js")
    assert(dense - touchedOnly > 1e-3,
      s"fixture must make the correction material: dense=$dense " +
        s"touchedOnly=$touchedOnly")
    assert(js - touchedOnly > 1e-3,
      "output must include the untouched-bucket correction")
    // untouchedCorrection=false reproduces the original touched-only
    // definition (the series an existing drift monitor's recorded
    // history was captured under — pipe_corpus_drift keeps this one)
    val legacy = Curation.corpusDrift(a, b, "doc_id", "text",
      untouchedCorrection = false).head().getDouble(2)
    assert(math.abs(legacy - touchedOnly) < 5e-6,
      s"touched-only=$touchedOnly legacy=$legacy")
    assert(js - legacy > 1e-3,
      "the two definitions must differ by the closed-form term here")
  }

  test("corpusDriftTv: exact-rational BigInt reference reproduced bit " +
    "for bit; identical snapshots read 0; symmetric") {
    val bigText = (0 to 1000).map(i => "w" + (i % 37)).mkString(" ")
    val a = Seq((1L, bigText)).toDF("doc_id", "text")
    val b = Seq((2L, "alpha beta kappa")).toDF("doc_id", "text")
    val B = 4096
    def prof(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      graft.functions.TextFunctions.shingleRows(df, "doc_id", "text", 2)
        .select((conv(substring(md5(col("s")), 1, 8), 16, 10)
          .cast("long") % B).as("bk"))
        .groupBy("bk").agg(count(lit(1)).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pa = prof(a); val pb = prof(b)
    val na = pa.values.sum; val nb = pb.values.sum
    // dense all-buckets integer-exact reference
    val s = (0 until B).map { k =>
      ((BigInt(pa.getOrElse(k.toLong, 0L)) + 1) * (BigInt(nb) + B) -
        (BigInt(pb.getOrElse(k.toLong, 0L)) + 1) * (BigInt(na) + B)).abs
    }.sum
    val dd = (BigInt(na) + B) * (BigInt(nb) + B)
    val expected = ((s * 1000000 + dd) / (dd * 2)).toLong
    val out = Curation.corpusDriftTv(a, b, "doc_id", "text").head()
    assert(out.getLong(0) == na && out.getLong(1) == nb)
    assert(out.getLong(2) == expected,
      s"tv_units=${out.getLong(2)} expected=$expected")
    // sanity: the rational statistic tracks the float TV to 1e-6
    val tvFloat = (0 until B).map { k =>
      math.abs((pa.getOrElse(k.toLong, 0L) + 1.0) / (na.toDouble + B) -
        (pb.getOrElse(k.toLong, 0L) + 1.0) / (nb.toDouble + B))
    }.sum / 2
    assert(math.abs(expected / 1e6 - tvFloat) < 2e-6)
    val same = Curation.corpusDriftTv(a, a, "doc_id", "text").head()
    assert(same.getLong(2) == 0L)
    val rev = Curation.corpusDriftTv(b, a, "doc_id", "text").head()
    assert(rev.getLong(2) == out.getLong(2), "TV is symmetric")
  }

  test("drift probes d/e: raw components and typed finals reproduce " +
    "the shipping drift values bit for bit") {
    // the r14 bisect probes exist to decompose the SHIPPING rows, so
    // their columns must be derivable from / identical to the
    // shipping outputs on the same side-tagged input
    val bigText = (0 to 1000).map(i => "w" + (i % 37)).mkString(" ")
    val joint = Seq((1L, bigText, true), (2L, "alpha beta kappa", false))
      .toDF("doc_id", "text", "__sa")
    val terms = Curation.driftProbeTerms(joint, "doc_id", "text").head()
    val units = Curation.driftProbeUnits(joint, "doc_id", "text").head()
    val tv = Curation.corpusDriftTvJoint(joint, "doc_id", "text").head()
    val jsFull = Curation.corpusDriftJoint(joint, "doc_id", "text").head()
    val jsNc = Curation.corpusDriftJoint(joint, "doc_id", "text",
      untouchedCorrection = false).head()
    // totals agree across every emitter
    assert(terms.getLong(0) == tv.getLong(0) &&
      terms.getLong(1) == tv.getLong(1))
    assert(units.getLong(0) == tv.getLong(0))
    // probe e's shipping-typed TV value IS the shipping value, and its
    // string/decimal variants render the same integer
    assert(units.getLong(2) == tv.getLong(2), "tv_units (long)")
    assert(units.getString(3) == tv.getLong(2).toString, "tv_units_str")
    // probe d's components recombine into probe e's finals:
    // s_full = st + (B - touched)·|nb - na|; tv = (s·1e6 + dd) div 2dd
    val bI = BigInt(4096)
    val naI = BigInt(terms.getLong(0)); val nbI = BigInt(terms.getLong(1))
    val st = BigInt(terms.getString(4))
    val sFull = st + (bI - terms.getLong(2)) * (nbI - naI).abs
    assert(units.getString(4) == sFull.toString, "tv_s recombines")
    val dd = (naI + bI) * (nbI + bI)
    assert(units.getString(5) == dd.toString, "tv_dd")
    assert(((sFull * 1000000 + dd) / (dd * 2)).toLong == tv.getLong(2))
    // JS: probe d's su is the uncorrected unit sum; probe e's two
    // presentations equal the two shipping js_bits values
    assert(units.getLong(7) == terms.getLong(3), "js_units_nc == su")
    assert(units.getDouble(8) == jsFull.getDouble(2), "js_bits_full")
    assert(units.getDouble(9) == jsNc.getDouble(2), "js_bits_nc")
  }

  // ---- lmPerplexity --------------------------------------------------

  test("lmPerplexity: hand-computed add-alpha bits; fluency orders " +
    "reference-like above scrambled; OOV floor exact") {
    // reference "the cat sat": c2 = {the cat: 1, cat sat: 1},
    // c1 = {the: 1, cat: 1}, V = 3 distinct unigrams + 1 = 4
    val ref = Seq(Tuple1("the cat sat")).toDF("text")
    val docs = Seq(
      (1L, "the cat"),      // seen bigram: (1+.4)/(1+.4*4) = 1.4/2.6
      (2L, "dog runs"),     // fully OOV:   (0+.4)/(0+.4*4) = 0.25
      (3L, "the cat sat"),  // two seen bigrams — most reference-like
      (4L, "sat cat the")   // scrambled: all three-word bigrams unseen
    ).toDF("doc_id", "text")
    val out = Curation.lmPerplexity(docs, "doc_id", "text", ref, "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val bits1 = BigDecimal(-math.log(1.4 / 2.6) / math.log(2))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == (1L, bits1))
    assert(out(2L) == (1L, 2.0), "fully-OOV bigram is exactly 2 bits " +
      "under alpha=0.4, V=4: -log2(0.25)")
    // the exact reference sentence is all-seen bigrams — same
    // per-bigram bits as doc 1 (n=2 though); the scrambled version
    // of the SAME words scores strictly higher
    assert(out(3L) == (2L, bits1))
    assert(out(4L)._2 > out(3L)._2 && out(4L)._2 > out(1L)._2)
    // <2-word docs take the whole-text-shingle OOV floor, n=1
    val tiny = Curation.lmPerplexity(
      Seq((9L, "word")).toDF("doc_id", "text"), "doc_id", "text",
      ref, "text").collect()
    assert(tiny.head.getLong(1) == 1L)
  }

  // ---- tfIdfTopTerms ------------------------------------------------

  test("tfIdfTopTerms scores rare repeated terms above ubiquitous ones") {
    val df = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "banana date")
    ).toDF("doc_id", "text")
    val out = Curation.tfIdfTopTerms(df, "doc_id", "text", 2)
      .filter(col("id") === 1L).orderBy("rank")
      .select("term", "tfidf").collect()
    // banana is in every doc → idf = ln(1) = 0; apple: tf=2, df=1
    assert(out(0).getString(0) == "apple")
    assert(math.abs(out(0).getDouble(1) - 2.0 * math.log(3.0)) < 1e-3)
    assert(out(1).getDouble(1) == 0.0) // banana
  }

  // ---- packSequences ------------------------------------------------

  test("packSequences: per-shard running totals open packs at the budget") {
    val docs = (0L until 40L).map(i => (i, "w " * 100)).toDF("doc_id", "text")
    val out = Curation.packSequences(docs, "doc_id", "text",
      budget = 250, nShards = 4).collect()
    assert(out.length == 40)
    // deterministic: recompute each shard's expected packing in scala
    val rows = out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("shard"),
      r.getAs[Long]("n_tokens"), r.getAs[Long]("cum_tokens"),
      r.getAs[Long]("pack_id")))
    rows.groupBy(_._2).foreach { case (_, shardRows) =>
      val byOrder = shardRows.sortBy(r =>
        (detHash(r._1), r._1))
      var cum = 0L
      byOrder.foreach { r =>
        cum += r._3
        assert(r._4 == cum, s"cum_tokens mismatch for doc ${r._1}")
        assert(r._5 == (cum - 1) / 250, s"pack_id mismatch for doc ${r._1}")
      }
    }
    // shard assignment is the documented hash, not partition-dependent
    assert(rows.forall(r => r._2 == detHash(r._1) % 4))
  }

  test("packSequences plan has no global single-partition window") {
    val docs = (0L until 10L).map(i => (i, "a b c")).toDF("doc_id", "text")
    val plan = Curation.packSequences(docs, "doc_id", "text", 512, 8)
      .queryExecution.optimizedPlan.toString()
    // the window must partition by shard; an empty partitionBy would
    // show as 'windowspecdefinition(' with no partition columns
    assert(plan.contains("windowspecdefinition(shard"),
      s"expected shard-partitioned window, got:\n$plan")
  }

  // ---- redactPatterns -----------------------------------------------

  test("chunkDocuments: stride windows cover every token, overlap = chunk - stride") {
    val docs = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")),
      (2L, "single"), (3L, "   "))
      .toDF("doc_id", "text")
    val chunks = Curation.chunkDocuments(docs, "doc_id", "text",
        chunkTokens = 4, strideTokens = 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
      .sortBy(c => (c._1, c._2))
    // 10 tokens, C=4, S=3 → starts 0,3,6,9; lengths 4,4,4,1
    val d1 = chunks.filter(_._1 == 1L)
    assert(d1.map(c => (c._2, c._3, c._4)).toSeq ==
      Seq((0, 0, 4), (1, 3, 4), (2, 6, 4), (3, 9, 1)))
    assert(d1.head._5 == "w1 w2 w3 w4")
    assert(d1.last._5 == "w10")
    // consecutive chunks overlap by chunk − stride = 1 token
    assert(d1(0)._5.split(" ").last == d1(1)._5.split(" ").head)
    // a short doc yields one chunk; a whitespace-only doc yields none
    assert(chunks.filter(_._1 == 2L).map(c => (c._2, c._4, c._5)).toSeq ==
      Seq((0, 1, "single")))
    assert(!chunks.exists(_._1 == 3L))
  }

  test("redactPatterns applies classes sequentially and counts matches") {
    val df = Seq((1L, "spark sparkle xylophones ok")).toDF("id", "text")
    val out = Curation.redactPatterns(df, "id", "text",
      Seq("sp" -> "\\bsp[a-z]+\\b", "long" -> "\\b[a-z]{6,}\\b")).head()
    // counts are over the ORIGINAL text, not the partially-redacted one
    assert(out.getAs[Int]("n_sp") == 2) // spark, sparkle
    assert(out.getAs[Int]("n_long") == 2) // sparkle, xylophones
    // replacement IS sequential: both sp-words redact first, so the
    // long-word pass sees placeholders, and 'xylophones' still redacts
    val expected = "<sp> <sp> <long> ok".length
    assert(out.getAs[Int]("redacted_len") == expected)
  }

  // ---- quantizeInt8Stats --------------------------------------------

  test("quantizeInt8Stats: scale is max|x|/127, max_err bounded by scale/2") {
    val df = Seq((1L, Array(1.0f, -0.5f, 0.25f)), (2L, Array(0.1f, 0.2f, -0.4f)))
      .toDF("vec_id", "embedding")
    val out = EmbeddingOps.quantizeInt8Stats(df, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    assert(math.abs(out(0).getAs[Double]("scale") - 1.0 / 127) < 1e-6)
    out.foreach { r =>
      assert(r.getAs[Double]("max_err") <= r.getAs[Double]("scale") / 2 + 1e-9)
    }
  }

  // ---- labelCentroids / centroidOutliers -----------------------------

  test("labelCentroids averages coordinate-wise per label") {
    val df = Seq(
      (1L, 0, Array(1.0f, 3.0f)), (2L, 0, Array(3.0f, 5.0f)),
      (3L, 1, Array(10.0f, 10.0f))
    ).toDF("vec_id", "label", "embedding")
    val cents = EmbeddingOps.labelCentroids(df, "label", "embedding")
      .orderBy("label", "pos").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
    assert(cents.toSeq == Seq((0, 0, 2.0, 2L), (0, 1, 4.0, 2L),
      (1, 0, 10.0, 1L), (1, 1, 10.0, 1L)))
  }

  test("centroidOutliers ranks by distance to own-label centroid") {
    val df = Seq(
      (1L, 0, Array(0.0f, 0.0f)), (2L, 0, Array(0.0f, 2.0f)),
      (3L, 0, Array(0.0f, 100.0f))
    ).toDF("vec_id", "label", "embedding")
    val top = EmbeddingOps.centroidOutliers(df, "vec_id", "label",
      "embedding", 1).head()
    assert(top.getAs[Long]("vec_id") == 3L)
  }

  // ---- DataFrame-native SCC ------------------------------------------

  test("scc: two cycles joined by a one-way bridge stay separate") {
    val vs = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    // cycle {1,2}, bridge 2->3, cycle {3,4}; 5 isolated
    val es = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (4L, 3L))
      .toDF("src", "dst")
    val scc = Algorithms.stronglyConnectedComponents(vs, es, 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scc(1L) == scc(2L))
    assert(scc(3L) == scc(4L))
    assert(scc(1L) != scc(3L))
    assert(scc(5L) == 5L)
    // min-member labels
    assert(scc(1L) == 1L && scc(3L) == 3L)
  }

  test("scc: long path DAG decomposes into singletons") {
    val vs = (1L to 6L).toDF("id")
    val es = (1L to 5L).map(i => (i, i + 1)).toDF("src", "dst")
    val scc = Algorithms.stronglyConnectedComponents(vs, es, 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scc == (1L to 6L).map(i => i -> i).toMap)
  }

  test("scc: strongly connected ring collapses to one component") {
    val vs = (0L to 4L).toDF("id")
    val es = (0L to 4L).map(i => (i, (i + 1) % 5)).toDF("src", "dst")
    val scc = Algorithms.stronglyConnectedComponents(vs, es, 10)
      .collect().map(r => r.getLong(1)).toSet
    assert(scc == Set(0L))
  }

  // ---- incremental dedup ----------------------------------------------

  test("minHashNewVsCorpusPairs finds only cross-boundary pairs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"), // dup of 1
      (3L, "completely different text with other words entirely here"),
      (10L, "the quick brown fox jumps over the lazy dog tonight"), // new dup
      (11L, "nothing like anything else in this corpus at all")
    ).toDF("doc_id", "text")
    val out = graft.functions.Dedup.minHashNewVsCorpusPairs(
        docs.filter(col("doc_id") >= 10), docs.filter(col("doc_id") < 10),
        "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    TransientCache.releaseAll()
    // 10 pairs with corpus dups 1 and 2; the corpus-internal 1-2 pair
    // and the new-batch-only combinations never appear
    assert(out == Set((1L, 10L), (2L, 10L)))
  }

  // ---- index-backed incremental dedup ----------------------------------

  test("minHashIndexPairs through a saved parquet index matches recompute") {
    val docs = Tables.documents(spark, sf)
    val newB = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val direct = graft.functions.Dedup.minHashNewVsCorpusPairs(
        newB, corpus, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    TransientCache.releaseAll()
    val dir = java.nio.file.Files.createTempDirectory("mh_index").toString
    graft.functions.Dedup.buildMinHashIndex(corpus, "text", "doc_id")
      .write.mode("overwrite").parquet(dir)
    val viaIndex = graft.functions.Dedup.minHashIndexPairs(
        newB, spark.read.parquet(dir), "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    TransientCache.releaseAll()
    assert(viaIndex == direct && direct.nonEmpty)
  }

  test("batchwise index folding reproduces the full-corpus dedup answer") {
    // the invariant a daily-ingest pipeline relies on: pairs(full) ==
    // Σ batches [ pairs(within batch) + pairs(batch vs index-so-far) ]
    val docs = Tables.documents(spark, sf)
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)), r.getDouble(2))).toSet
    val full = canon(graft.functions.Dedup.minHashDedupPairsExact(
      docs, "text", "doc_id"))
    TransientCache.releaseAll()
    val batches = Seq(
      docs.filter(col("doc_id") % 3 === 0),
      docs.filter(col("doc_id") % 3 === 1),
      docs.filter(col("doc_id") % 3 === 2))
    var index: Option[org.apache.spark.sql.DataFrame] = None
    var acc = Set.empty[(Long, Long, Double)]
    batches.foreach { b =>
      acc ++= canon(graft.functions.Dedup.minHashDedupPairsExact(
        b, "text", "doc_id"))
      index.foreach { ix =>
        acc ++= canon(graft.functions.Dedup.minHashIndexPairs(
          b, ix, "text", "doc_id"))
      }
      val bIdx = graft.functions.Dedup.buildMinHashIndex(b, "text", "doc_id")
        .localCheckpoint()
      index = Some(index.map(_.unionByName(bIdx)).getOrElse(bIdx))
      TransientCache.releaseAll()
    }
    assert(acc == full && full.nonEmpty)
  }

  // ---- quality-aware survivor resolution -------------------------------

  test("resolveDupClustersByScore keeps the best-scoring cluster member") {
    val scored = Seq(
      (1L, 0.2), (2L, 0.9), (3L, 0.9), (4L, 0.5) // 4 untouched
    ).toDF("doc_id", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("ida", "idb")
      .withColumn("jaccard", lit(1.0))
    val out = graft.functions.Dedup.resolveDupClustersByScore(
        scored, "doc_id", "quality", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    TransientCache.releaseAll()
    // cluster {1,2,3}: 2 and 3 tie at 0.9 → lowest id (2) survives
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 4L))
  }

  test("resolveDupClusters: forced-SMJ CC (broadcastRows=0) matches broadcast path") {
    val docs = (1L to 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("ida", "idb")
    def resolve(br: Long) = graft.functions.Dedup.resolveDupClusters(
        docs, "doc_id", pairs, broadcastRows = br)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bcast = resolve(graft.algorithms.Algorithms.DefaultBroadcastRows)
    val smj = resolve(0L)
    assert(smj == bcast)
    assert(bcast == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L))
  }

  // ---- token-budget sampling --------------------------------------------

  test("tokenBudgetSample keeps hash-ordered docs up to the stratum budget") {
    val docs = (0L until 20L).map(i =>
      (i, if (i < 10) "a" else "b", "w " * 10)).toDF("doc_id", "src", "text")
    val out = graft.functions.Curation.tokenBudgetSample(
        docs, "src", "doc_id", "text", budget = 35L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    // each doc is 10 tokens → exactly 3 docs per stratum fit 35
    val byStratum = out.groupBy(_._2)
    assert(byStratum.keySet == Set("a", "b"))
    byStratum.values.foreach { rows =>
      assert(rows.length == 3)
      assert(rows.map(_._3).max <= 35L)
      // kept docs are the 3 lowest in deterministic hash order
      val ids = rows.map(_._1).toSet
      val expected = rows.map(_._1).headOption.map { _ =>
        // recompute: sort the stratum's ids by the documented hash
        val stratumIds = (0L until 20L).filter(i =>
          (if (i < 10) "a" else "b") == rows.head._2)
        stratumIds.sortBy(i => (detHash(i), i)).take(3).toSet
      }.get
      assert(ids == expected)
    }
  }

  // ---- z-order layout --------------------------------------------------

  test("zorderKey interleaves bits per the Morton reference") {
    def mortonRef(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 255L), (170L, 85L))
      .toDF("x", "y")
    val got = df.select(col("x"), col("y"),
        graft.functions.Layout.zorderKey(Seq(col("x"), col("y")), 8).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == mortonRef(r.getLong(0), r.getLong(1), 8))
    }
  }

  test("zorderLayout clusters both dimensions, not just the leading one") {
    // a 32×32 grid; z-sorted neighbors must stay close in BOTH dims
    val grid = (for { x <- 0L until 32L; y <- 0L until 32L } yield (x, y))
      .toDF("x", "y")
    val key = graft.functions.Layout.zorderKey(Seq(col("x"), col("y")), 5)
    val z = graft.functions.Layout.zorderLayout(grid, key, 4)
    // within each output partition, the y-range must be much narrower
    // than the full domain (a plain x-sort would leave it at 0..31 in
    // every partition)
    val spans = z.withColumn("pid", spark_partition_id())
      .groupBy("pid").agg((max("y") - min("y")).as("yspan"),
        (max("x") - min("x")).as("xspan"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(spans.forall { case (ys, xs) => ys <= 16 && xs <= 16 },
      s"z-order partitions should bound both dims, got ${spans.mkString(",")}")
  }

  test("normalizeDim maps a range onto [0, 2^bits) with clamping") {
    val df = Seq(0L, 500L, 999L, 1500L).toDF("v")
    val out = df.select(graft.functions.Layout
        .normalizeDim(col("v"), 0L, 999L, 8).as("n"))
      .collect().map(_.getLong(0))
    assert(out(0) == 0L && out(1) == 128L && out(2) == 255L)
    assert(out(3) == 255L) // beyond-max clamps
  }

  // ---- DSIR importance resampling --------------------------------------

  test("dsirSelect ranks target-like docs first and is deterministic") {
    // two dialects: 'alpha beta' docs vs 'gamma delta' docs; target
    // is the alpha dialect, so alpha docs must fill the selection
    val alpha = (1L to 6L).map(i =>
      (i, s"alpha beta alpha beta gamma", "en"))
    val beta = (7L to 12L).map(i =>
      (i, s"gamma delta gamma delta epsilon", "en"))
    val raw = (alpha ++ beta).toDF("doc_id", "text", "lang")
    val target = raw.filter(col("doc_id") <= 3)
    val sel = Curation.dsirSelect(raw, target, "doc_id", "text", k = 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(sel.map(_._1).toSet == (1L to 6L).toSet,
      s"expected the alpha dialect, got ${sel.toSeq}")
    // every target-dialect doc outranks every off-dialect doc (the
    // absolute SIGN is not meaningful here: Laplace-1 over 4096
    // buckets dwarfs these fixture counts and pulls both models
    // toward uniform — ordering is the resampling contract)
    val all = Curation.dsirSelect(raw, target, "doc_id", "text", k = 12)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert((1L to 6L).forall(i => (7L to 12L).forall(j => all(i) > all(j))))
    // identical docs score identically; reruns are bit-stable
    assert(all(1L) == all(2L))
    val rerun = Curation.dsirSelect(raw, target, "doc_id", "text", k = 12)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rerun == all)
  }

  test("dsirSelect smoothing keeps unseen-in-target buckets finite") {
    // the raw-only dialect shares no bigram with the target: its
    // weight must be finite (Laplace floor), not -inf
    val raw = Seq((1L, "zeta eta zeta"), (2L, "theta iota theta"))
      .toDF("doc_id", "text")
    val target = raw.filter(col("doc_id") === 1L)
    val all = Curation.dsirSelect(raw, target, "doc_id", "text", k = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(all.size == 2 && all.values.forall(v => !v.isInfinite))
    assert(all(1L) > all(2L))
  }

  // ---- leakage-free split -----------------------------------------------

  test("leakFreeSplit: near-dup clusters never straddle splits; naive split would leak") {
    import graft.functions.{Curation, Sampling}
    // clusters {1,5,12} (naive buckets train/val/test — the leaky
    // fixture) and {19, 24} (test/val); 200 singletons for spread
    val ids = (Seq(1L, 5L, 12L, 19L, 24L) ++ (100L to 299L)).map(Tuple1(_))
    val docs = ids.toDF("doc_id")
    val pairs = Seq((1L, 5L), (5L, 12L), (19L, 24L)).toDF("ida", "idb")
    val out = Curation.leakFreeSplit(docs, "doc_id", pairs,
      Seq(("train", 8), ("val", 1), ("test", 1)))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == ids.size)
    // cluster members share their split — every near-dup pair co-located
    assert(out(1L) == out(5L) && out(5L) == out(12L))
    assert(out(19L) == out(24L))
    // the test is not vacuous: hashing MEMBER ids (the naive split)
    // disagrees within at least one cluster, so cluster-hashing is
    // load-bearing, not coincidence
    def naive(id: Long): Long = ((id % 1000000007L) * 2654435761L) % 10000L
    def bucket(h: Long): String =
      if (h < 8000) "train" else if (h < 9000) "val" else "test"
    val naiveLeaks = Seq(Seq(1L, 5L, 12L), Seq(19L, 24L))
      .exists(c => c.map(id => bucket(naive(id))).distinct.size > 1)
    assert(naiveLeaks, "fixture ids must demonstrate the naive-split leak")
    // all three splits materialize on the singleton mass, and the
    // split of a singleton is exactly the hash of its own id
    assert(out.values.toSet == Set("train", "val", "test"))
    (100L to 299L).foreach { id =>
      assert(out(id) == bucket(naive(id)), s"singleton $id split drift")
    }
    // determinism
    val rerun = Curation.leakFreeSplit(docs, "doc_id", pairs,
      Seq(("train", 8), ("val", 1), ("test", 1)))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rerun == out)
  }

  // ---- driver-contract wiring ------------------------------------------

  test("every SparkEntry query has exactly one oracle and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q == o, s"queries without oracle: ${(q -- o).toSeq.sorted}; " +
      s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  // ---- evt_funnel equivalence ----------------------------------------

  test("evt_funnel counts only first-click conversions inside the window") {
    import graft.operators.CurationQueries
    val out = CurationQueries.all("evt_funnel")(spark, sf)
    val rows = out.collect()
    assert(rows.forall(_.getAs[Long]("delay_us") >= 0))
    assert(rows.forall(_.getAs[Long]("delay_us") <= 3600L * 1000000L))
  }
}
