package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Dedup, Similarity, TextFunctions}
import graft.multimodal.Multimodal
import graft.sources.Tables

/** Training-data pipeline pack: dedup, similarity search, text
  * analysis, multimodal plumbing — the beyond-reference operator set
  * a 100 TB corpus pipeline needs (builder brief; SURVEY §7 M8).
  *
  * Oracle strategy: everything whose math is engine-reproducible gets
  * a DuckDB value-parity oracle (exact dedup groups, n-gram Jaccard,
  * double-precision cosine top-k, quality/langid scoring, stub
  * decode). Hash-seeded operators (MinHash, SimHash, hyperplane LSH)
  * are rows-only here — their semantics are covered by unit tests
  * with hand-checkable inputs.
  */
object PipelineQueries {

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: normalized-text fingerprint groups.
    "dedup_exact" -> ((s, dir) => {
      Dedup.exactDedup(Tables.documents(s, dir), "text", "doc_id")
        .orderBy("doc_id")
    }),

    // MinHash+LSH near-dup candidates (32 hashes, 8 bands, unigram
    // shingles — word-set similarity).
    "dedup_minhash_lsh" -> ((s, dir) => {
      Dedup.minHashDedupPairs(Tables.documents(s, dir), "text", "doc_id",
        numHashes = 32, bands = 8, threshold = 0.8)
        .orderBy("ida", "idb")
    }),

    // SimHash near-dups: 16-bit chunk candidates, Hamming ≤ 10.
    "dedup_simhash" -> ((s, dir) => {
      Dedup.simHashDedupPairs(Tables.documents(s, dir), "text", "doc_id",
        maxDistance = 10)
        .orderBy("ida", "idb")
    }),

    // Exact bigram Jaccard pairs ≥ 0.3.
    "dedup_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(Tables.documents(s, dir), "text", "doc_id",
        shingleSize = 2, threshold = 0.3)
        .orderBy("ida", "idb")
    }),

    // Embedding near-dup pairs: exact cosine ≥ 0.4.
    "dedup_embedding" -> ((s, dir) => {
      Similarity.embeddingDedupPairs(Tables.embeddings(s, dir), 0.4)
        .orderBy("ida", "idb")
    }),

    // Brute-force cosine top-10 for the first 10 vectors.
    "ann_cosine_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), 10)
        .orderBy("query_id", "rank")
    }),

    // LSH-bucketed ANN (4 tables × 8-bit hyperplane signatures) —
    // the scale path; recall measured against brute force in tests.
    "ann_lsh_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10), 10)
        .orderBy("query_id", "rank")
    }),

    // Token/char/word-length stats.
    "text_stats" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      d.select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"),
        TextFunctions.subwordCount(col("text")).as("n_subwords"),
        TextFunctions.charCount(col("text")).as("n_chars"),
        round(TextFunctions.meanWordLength(col("text")), 4).as("mean_word_len"))
        .orderBy("doc_id")
    }),

    // Composite quality score.
    "text_quality" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"),
          TextFunctions.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    }),

    // Marker-based language ID.
    "text_langid" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), TextFunctions.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")
    }),

    // Fingerprint injectivity: distinct fingerprints == distinct
    // normalized texts.
    "text_fingerprint" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(TextFunctions.fingerprint(col("text")).as("fp"))
        .agg(count_distinct(col("fp")).as("distinct_docs"))
    }),

    // Multimodal: binary payload column → batched stub decode →
    // typed metadata (real plumbing, fake codec).
    "mm_decode_meta" -> ((s, dir) => {
      val withBin = Tables.documents(s, dir)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      Multimodal.decodeMeta(withBin, "doc_id", "payload")
        .orderBy("id")
    })
  )

  private val normText = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

  private val cosExpr: String =
    """list_sum(list_transform(range(1, len(cv)+1),
         i -> CAST(cv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))
       / (SQRT(list_sum(list_transform(range(1, len(cv)+1),
            i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE))))
        * SQRT(list_sum(list_transform(range(1, len(qv)+1),
            i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))))"""

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      s"""SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_count
          FROM documents GROUP BY $normText ORDER BY doc_id""",
    "dedup_ngram_jaccard" ->
      s"""WITH t AS (
            SELECT doc_id, list_distinct(
              CASE WHEN len(w) >= 2
                THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
                ELSE [array_to_string(w, ' ')] END) AS bg
            FROM (SELECT doc_id, string_split($normText, ' ') AS w FROM documents)),
          ex AS (SELECT doc_id, len(bg) AS n, unnest(bg) AS s FROM t),
          j AS (SELECT a.doc_id AS ida, b.doc_id AS idb, COUNT(*) AS inter,
                       FIRST(a.n) AS na, FIRST(b.n) AS nb
                FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
          SELECT ida, idb,
                 ROUND(CAST(inter AS DOUBLE) / (na + nb - inter), 4) AS jaccard
          FROM j
          WHERE ROUND(CAST(inter AS DOUBLE) / (na + nb - inter), 4) >= 0.3
          ORDER BY ida, idb""",
    "dedup_embedding" ->
      s"""WITH p AS (
            SELECT a.vec_id AS ida, b.vec_id AS idb,
                   a.embedding AS cv, b.embedding AS qv
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
          SELECT ida, idb, ROUND($cosExpr, 6) AS cosine
          FROM p WHERE ROUND($cosExpr, 6) >= 0.4
          ORDER BY ida, idb""",
    "ann_cosine_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                     FROM embeddings WHERE vec_id < 10),
          c AS (SELECT vec_id AS corpus_id, embedding AS cv FROM embeddings),
          sc AS (SELECT query_id, corpus_id, ROUND($cosExpr, 4) AS cosine
                 FROM c CROSS JOIN q WHERE corpus_id <> query_id),
          r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, corpus_id ASC) AS INTEGER) AS rank
                FROM sc)
          SELECT query_id, corpus_id, cosine, rank FROM r
          WHERE rank <= 10 ORDER BY query_id, rank""",
    "text_stats" ->
      """SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]{1,4}|\d|[^\sA-Za-z\d]')) AS INTEGER) AS n_subwords,
           CAST(length(text) AS INTEGER) AS n_chars,
           ROUND(CAST(list_sum(list_transform(string_split_regex(trim(text), '\s+'),
                 w -> length(w))) AS DOUBLE)
             / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE), 4)
             AS mean_word_len
         FROM documents ORDER BY doc_id""",
    "text_quality" ->
      """WITH c AS (
           SELECT doc_id,
             LEAST(CAST(length(text) AS DOUBLE) / 500.0, 1.0) AS len_score,
             CASE WHEN len(string_split_regex(lower(trim(text)), '\s+')) > 0
               THEN CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                 x -> x IN ('the','a','an','and','or','of','to','in','is','it',
                            'that','was','for','on','with','as','at','by'))) AS DOUBLE)
                 / CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS DOUBLE)
               ELSE 0.0 END AS stop_ratio,
             CASE WHEN length(text) > 0
               THEN CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE)
                 / CAST(length(text) AS DOUBLE) ELSE 0.0 END AS punct_ratio,
             CASE WHEN length(text) > 0
               THEN CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE)
                 / CAST(length(text) AS DOUBLE) ELSE 0.0 END AS upper_ratio
           FROM documents)
         SELECT doc_id,
           ROUND(len_score * 0.3 + LEAST(stop_ratio * 4.0, 1.0) * 0.3
             + GREATEST(0.0, 1.0 - punct_ratio * 5.0) * 0.2
             + GREATEST(0.0, 1.0 - upper_ratio * 3.0) * 0.2, 6) AS quality
         FROM c ORDER BY doc_id""",
    "text_langid" ->
      """WITH s AS (
           SELECT doc_id, ' ' || lower(text) || ' ' AS p FROM documents),
         sc AS (
           SELECT doc_id,
             (CASE WHEN contains(p, ' der ') THEN 1 ELSE 0 END +
              CASE WHEN contains(p, ' die ') THEN 1 ELSE 0 END +
              CASE WHEN contains(p, ' und ') THEN 1 ELSE 0 END +
              CASE WHEN contains(p, ' das ') THEN 1 ELSE 0 END +
              CASE WHEN contains(p, ' ist ') THEN 1 ELSE 0 END +
              CASE WHEN contains(p, ' nicht ') THEN 1 ELSE 0 END) AS s_de,
             (CASE WHEN contains(p, ' the ') THEN 1 ELSE 0 END +
              CASE WHEN contains(p, ' and ') THEN 1 ELSE 0 END +
              CASE WHEN contains(p, ' of ') THEN 1 ELSE 0 END +
              CASE WHEN contains(p, ' to ') THEN 1 ELSE 0 END +
              CASE WHEN contains(p, ' is ') THEN 1 ELSE 0 END +
              CASE WHEN contains(p, ' that ') THEN 1 ELSE 0 END) AS s_en,
             (CASE WHEN contains(p, ' el ') THEN 1 ELSE 0 END +
              CASE WHEN contains(p, ' la ') THEN 1 ELSE 0 END +
              CASE WHEN contains(p, ' de ') THEN 1 ELSE 0 END +
              CASE WHEN contains(p, ' que ') THEN 1 ELSE 0 END +
              CASE WHEN contains(p, ' los ') THEN 1 ELSE 0 END +
              CASE WHEN contains(p, ' es ') THEN 1 ELSE 0 END) AS s_es,
             (CASE WHEN contains(p, ' le ') THEN 1 ELSE 0 END +
              CASE WHEN contains(p, ' la ') THEN 1 ELSE 0 END +
              CASE WHEN contains(p, ' et ') THEN 1 ELSE 0 END +
              CASE WHEN contains(p, ' les ') THEN 1 ELSE 0 END +
              CASE WHEN contains(p, ' des ') THEN 1 ELSE 0 END +
              CASE WHEN contains(p, ' est ') THEN 1 ELSE 0 END) AS s_fr
           FROM s)
         SELECT doc_id,
           CASE WHEN GREATEST(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                WHEN s_de = GREATEST(s_de, s_en, s_es, s_fr) THEN 'de'
                WHEN s_en = GREATEST(s_de, s_en, s_es, s_fr) THEN 'en'
                WHEN s_es = GREATEST(s_de, s_en, s_es, s_fr) THEN 'es'
                ELSE 'fr' END AS lang_pred
         FROM sc ORDER BY doc_id""",
    "text_fingerprint" ->
      s"SELECT COUNT(DISTINCT $normText) AS distinct_docs FROM documents",
    "mm_decode_meta" ->
      """SELECT doc_id AS id,
           CAST(32 + strlen(text) % 32 AS INTEGER) AS width,
           CAST(32 + (strlen(text) // 32) % 32 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels,
           CAST(strlen(text) AS BIGINT) AS n_bytes
         FROM documents ORDER BY id"""
  )
}
