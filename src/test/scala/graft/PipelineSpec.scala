package graft

import org.apache.spark.sql.functions._
import graft.functions.{Dedup, Similarity, TextFunctions}
import graft.multimodal.Multimodal

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox leaps over the lazy dog"), // near dup of 1
    (4L, "completely different content about spark engines"),
    (5L, "  The  QUICK brown fox jumps over the lazy dog ")) // dup modulo case/ws
    .toDF("doc_id", "text")

  test("exact dedup groups normalized duplicates") {
    val r = Dedup.exactDedup(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1,2,5 collapse (case/whitespace-insensitive); 3 and 4 stand alone
    assert(r == Map(1L -> 3L, 3L -> 1L, 4L -> 1L))
  }

  test("minhash est_jaccard is 1.0 for identical docs, high for near-dups") {
    // 16 bands × 2 rows: band-collision miss probability ~4e-7 at
    // J=0.78, so the near-dup pair is reliably surfaced (the 8×4
    // production config trades that recall for fewer candidates).
    val pairs = Dedup.minHashDedupPairs(docs, "text", "doc_id",
      numHashes = 32, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs.contains(1L -> 3L)) // 8/10 shared unigrams
    assert(!pairs.exists { case ((a, b), _) => b == 4L || a == 4L })
  }

  test("simhash: identical docs have hamming 0; near-dups small") {
    val pairs = Dedup.simHashDedupPairs(docs, "text", "doc_id", maxDistance = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 2L)) == 0)
    assert(pairs((1L, 3L)) <= 16)
  }

  test("ngram jaccard: exact dup = 1.0, near dup in (0,1)") {
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      shingleSize = 2, threshold = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs((1L, 3L)) > 0.5 && pairs((1L, 3L)) < 1.0)
  }

  test("cosine: orthogonal 0, identical 1") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (2L, Seq(2.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 0), 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(top.head == ((2L, 1.0, 1))) // identical direction first
    assert(top(1)._2 == 0.0)
  }

  test("lsh ann recall vs brute force on real embeddings is reasonable") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(emb, queries, 5, tables = 8, bits = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // Deterministic (hash-seeded planes): observed 0.36 at 8×6 on
    // this data; the bound guards against regressions, not chance.
    assert(recall >= 0.3, s"LSH recall too low: $recall")
  }

  test("text functions: tokens, langid, quality bounds") {
    val r = docs.select(
      TextFunctions.tokenCount(col("text")).as("t"),
      TextFunctions.langId(col("text")).as("l"),
      TextFunctions.qualityScore(col("text")).as("q")).collect()
    assert(r.head.getInt(0) == 9)
    assert(r.head.getString(1) == "en")
    assert(r.forall(row => row.getDouble(2) >= 0.0 && row.getDouble(2) <= 1.0))
  }

  test("multimodal stub decode: deterministic meta from payload bytes") {
    val withBin = docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
    val meta = Multimodal.decodeMeta(withBin, "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getLong(4))).toMap
    val len1 = "the quick brown fox jumps over the lazy dog".length
    assert(meta(1L) == ((32 + len1 % 32, 32 + (len1 / 32) % 32, len1.toLong)))
    val feats = Multimodal.extractFeatures(withBin, "doc_id", "payload").collect()
    assert(feats.forall(_.getSeq[Double](1).sum > 0.99)) // L1-normalized histogram
  }
}
