package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{DedupOps, IvfIndex, MultimodalOps, SimilarityOps, TextOps}
import graft.runtime.Sources

/** [EXT] charter queries: dedup / similarity / text analysis over the
  * `documents` and `embeddings` fixtures, JSON extraction over
  * `events.props` (SURVEY §0(c), §7 ext/).
  *
  * Oracle-backed where DuckDB can express the same computation
  * deterministically; the MinHash/SimHash/LSH queries are registered
  * WITHOUT oracles (hash-function internals aren't portable SQL) and are
  * instead property-tested against their exact counterparts in
  * `graft.ext.ExtOpsSpec` (LSH precision is 1.0 by construction — every
  * candidate is verified exactly — so the specs check recall).
  *
  * Pairwise queries run on the deterministic `doc_id % 10 = 0` subset:
  * the fixture corpus has a ~60-word vocabulary, making every doc
  * collide with every doc in a token index — the O(n²) worst case that
  * real Zipfian corpora don't exhibit (see DedupOps scale notes).
  */
object ExtQueries {

  type Q = (SparkSession, String) => DataFrame

  private def docsSub(s: SparkSession, dir: String): DataFrame =
    Sources(s, dir).documents.filter(col("doc_id") % 10 === 0)

  // One persisted IVF index per (session-lifetime, sf dir): trained and
  // saved ONCE, so q_ext_knn_ivf_probe times the load→probe path alone —
  // the number that matters at scale — instead of retraining per call.
  // Dirs are bounded by the number of distinct sfDirs and reclaimed at
  // exit. The monitor guards only the map (the shutdown hook and cache
  // hits never wait on a training job); the temp dir is registered BEFORE
  // training so a JVM exit mid-train still reclaims it, and a failed
  // train deregisters and deletes. Under concurrent first calls the first
  // registration wins — callers of the losing thread may briefly see a
  // path whose training is still in flight, a non-issue for the
  // sequential Verify/Bench harness this cache serves.
  private val ivfIndexDirs = scala.collection.mutable.LinkedHashMap[String, String]()
  private lazy val ivfCleanup = sys.addShutdownHook {
    ivfIndexDirs.synchronized(ivfIndexDirs.values.toList)
      .foreach(d => graft.runtime.Fs.deleteRecursive(java.nio.file.Paths.get(d)))
  }

  private def ivfIndexPath(s: SparkSession, dir: String): String =
    ivfIndexDirs.synchronized(ivfIndexDirs.get(dir)).getOrElse {
      ivfCleanup
      val p = java.nio.file.Files.createTempDirectory("graft_ivfidx_").toString
      val winner = ivfIndexDirs.synchronized {
        ivfIndexDirs.getOrElseUpdate(dir, p)
      }
      if (winner != p) {
        graft.runtime.Fs.deleteRecursive(java.nio.file.Paths.get(p))
        winner
      } else {
        try {
          IvfIndex.train(Sources(s, dir).embeddings, nlist = 16).save(p)
          p
        } catch {
          case e: Throwable =>
            ivfIndexDirs.synchronized(ivfIndexDirs.remove(dir))
            graft.runtime.Fs.deleteRecursive(java.nio.file.Paths.get(p))
            throw e
        }
      }
    }

  val queries: Map[String, Q] = Map(
    "q_ext_text_features" -> ((s, dir) =>
      Sources(s, dir).documents.select(
        col("doc_id"),
        TextOps.tokenCount(col("text")).as("token_count"),
        TextOps.bpeTokenCount(col("text")).as("bpe_tokens"),
        TextOps.stopwordRatio(col("text")).as("stopword_ratio"),
        TextOps.punctRatio(col("text")).as("punct_ratio"),
        TextOps.qualityScore(col("text")).as("quality"),
        TextOps.fingerprint(col("text")).as("fp"))),
    "q_ext_langid" -> ((s, dir) =>
      Sources(s, dir).documents.select(
        col("doc_id"), col("lang"), TextOps.langId(col("text")).as("lang_pred"))),
    "q_ext_exact_dedup" -> ((s, dir) =>
      DedupOps.exactDupGroups(Sources(s, dir).documents)),
    // the dedup APPLICATIONS: the corpus a training pipeline consumes.
    // Exact: keep the lowest id per content fingerprint. Near-dup: drop
    // the higher id of every verified Jaccard pair (greedy one-pass).
    // The fixture corpus has no exact duplicates, so the exact gate
    // PLANTS them (every 7th doc re-appears under a shifted id) — the
    // keep-lowest policy is then observable, not vacuous: output must be
    // exactly the original rows, never a planted id.
    "q_ext_dedup_corpus" -> ((s, dir) => {
      val docs = Sources(s, dir).documents.select("doc_id", "lang", "text")
      val planted = docs.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000)
      DedupOps.dedupExact(docs.unionByName(planted))
        .select(col("doc_id"), col("lang"), md5(col("text")).as("content_md5"))
    }),
    "q_ext_dedup_neardup_corpus" -> ((s, dir) => {
      val docs = docsSub(s, dir)
      DedupOps.removeNearDups(docs, DedupOps.jaccardPairs(docs, 0.9))
        .select(col("doc_id"), col("lang"), md5(col("text")).as("content_md5"))
    }),
    "q_ext_jaccard_pairs" -> ((s, dir) =>
      DedupOps.jaccardPairs(docsSub(s, dir), 0.9)),
    "q_ext_minhash_neardup" -> ((s, dir) =>
      DedupOps.minHashNearDupPairs(docsSub(s, dir), 0.9)),
    "q_ext_simhash_neardup" -> ((s, dir) =>
      DedupOps.simHashNearDupPairs(docsSub(s, dir), maxDist = 3)),
    "q_ext_knn_brute" -> ((s, dir) => {
      val e = Sources(s, dir).embeddings
      SimilarityOps.bruteForceTopK(e, e.filter(col("vec_id") < 20), k = 3)
    }),
    "q_ext_cosine_pairs" -> ((s, dir) =>
      SimilarityOps.cosinePairs(Sources(s, dir).embeddings, 0.35)),
    "q_ext_knn_lsh" -> ((s, dir) =>
      SimilarityOps.lshCosinePairs(Sources(s, dir).embeddings, 0.35)),
    // nprobe = nlist probes every cell, so IVF is EXACT top-k by
    // construction and hash-matches the brute-force DuckDB oracle; the
    // approx (nprobe < nlist) path keeps its recall spec in ExtOpsSpec.
    "q_ext_knn_ivf" -> ((s, dir) => {
      val e = Sources(s, dir).embeddings
      SimilarityOps.ivfTopK(e, e.filter(col("vec_id") < 20), k = 3, nlist = 16, nprobe = 16)
    }),
    // The lifecycle path under the same exact-mode oracle: the session's
    // persisted index is loaded and probed with NO train and NO corpus
    // reshuffle (plan asserted in ExtOpsSpec) — its bench time is the
    // repeat-query probe cost.
    "q_ext_knn_ivf_probe" -> ((s, dir) => {
      val idx = IvfIndex.load(s, ivfIndexPath(s, dir))
      idx.topK(Sources(s, dir).embeddings.filter(col("vec_id") < 20),
        k = 3, nprobe = idx.nlist)
    }),
    "q_ext_json_extract" -> ((s, dir) =>
      Sources(s, dir).events
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("bigint").as("k"))
        .filter(col("k") > 50)),
    "q_ext_media_meta" -> ((s, dir) =>
      MultimodalOps.withFakeMedia(Sources(s, dir).documents).select(
        col("doc_id"),
        md5(col("media")).as("media_md5"),
        length(col("media")).as("media_bytes"),
        col("media_meta.format").as("format"),
        col("media_meta.width").as("width"),
        col("media_meta.height").as("height"))),
    "q_ext_media_features" -> ((s, dir) =>
      MultimodalOps.decodeFeatures(
        MultimodalOps.withFakeMedia(Sources(s, dir).documents))
        .select(col("doc_id"), col("media_bytes"),
          round(element_at(col("features"), 1), 6).as("bin0"),
          round(element_at(col("features"), 3), 6).as("bin2"),
          round(element_at(col("features"), 8), 6).as("bin7"))),
    // frame sampler gate: 4 evenly-spaced 64-byte slices per blob,
    // fingerprinted as md5 over the '|'-joined hex of each frame — a
    // scalar digest the DuckDB oracle reproduces by slicing hex(blob)
    // (2 hex chars = 1 byte, so byte offsets double and multibyte text
    // can't skew a character-based substring).
    // hex(frame) is COALESCEd to '' so a NULL blob (4 NULL slices) joins
    // to "|||" exactly like the oracle's empty-hex slices — concat_ws
    // would otherwise SKIP the nulls and hash "" instead.
    "q_ext_media_frames" -> ((s, dir) =>
      MultimodalOps.sampleFrames(
        MultimodalOps.withFakeMedia(Sources(s, dir).documents), n = 4)
        .select(col("doc_id"),
          size(col("frames")).as("n_frames"),
          md5(concat_ws("|",
            transform(col("frames"), f => coalesce(hex(f), lit(""))))).as("frames_md5"))),
    // resize gate: metadata must carry the target dims and the payload the
    // stride-k decimation (k = area ratio from the ORIGINAL metadata dims,
    // which the fixture derives from doc_id — letting DuckDB reproduce the
    // stride without reading the struct). Digest = md5 over hex, as above.
    "q_ext_media_resize" -> ((s, dir) =>
      MultimodalOps.resizeStub(
        MultimodalOps.withFakeMedia(Sources(s, dir).documents), targetW = 64, targetH = 64)
        .select(col("doc_id"),
          col("media_meta.width").as("width"),
          col("media_meta.height").as("height"),
          length(col("media")).as("resized_bytes"),
          md5(hex(col("media"))).as("resized_md5"))),
  )

  // ---- DuckDB mirrors ------------------------------------------------------

  private val toksSql = """regexp_split_to_array(trim(text), '\s+')"""
  private val dtoksSql = s"list_distinct($toksSql)"

  private val stopRatioSql =
    s"""CAST(len(list_filter($toksSql, t -> t IN ('the','a','an','of','and','to','in','is','it','that'))) AS DOUBLE) / len($toksSql)"""

  private val punctRatioSql =
    """CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()\-]', '', 'g')) AS DOUBLE) / length(text)"""

  private def markerScore(words: Seq[String]): String =
    s"len(list_intersect($dtoksSql, [${words.map(w => s"'$w'").mkString(",")}]))"

  // Shared by the Jaccard pairs oracle and the near-dup-corpus oracle:
  // the docsSub → tokenize → size → shared-count CTE block, written once
  // so a tokenization or threshold tweak cannot desynchronize them.
  private val jaccardCtes =
    s"""docs AS (SELECT * FROM documents WHERE doc_id % 10 = 0),
      |tok AS (SELECT doc_id, unnest($dtoksSql) AS t FROM docs),
      |sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
      |shared AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS s
      |  FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id < b.doc_id GROUP BY 1, 2
      |)""".stripMargin

  // Shared by q_ext_knn_brute AND both IVF queries: at nprobe = nlist IVF
  // probes every cell, so all three compute the identical exact top-3.
  private val knnExactSql =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |scored AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
      |         list_cosine_similarity(q.v, c.v) AS sim
      |  FROM (SELECT * FROM e WHERE vec_id < 20) q
      |  JOIN e c ON q.vec_id != c.vec_id
      |),
      |ranked AS (
      |  SELECT query_id, corpus_id, sim,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, corpus_id) AS rank
      |  FROM scored
      |)
      |SELECT query_id, corpus_id, sim, rank FROM ranked WHERE rank <= 3""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_ext_text_features" ->
      (s"""SELECT doc_id,
         |  len($toksSql) AS token_count,
         |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS bpe_tokens,
         |  $stopRatioSql AS stopword_ratio,
         |  $punctRatioSql AS punct_ratio,
         |  0.5 * least(1.0, CAST(len($toksSql) AS DOUBLE) / 100.0)
         |    + 0.3 * (CASE WHEN $stopRatioSql BETWEEN 0.05 AND 0.6 THEN 1.0 ELSE 0.0 END)
         |    + 0.2 * (1.0 - $punctRatioSql) AS quality,
         |  md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
         |FROM documents""".stripMargin),
    "q_ext_langid" ->
      (s"""SELECT doc_id, lang,
         |  CASE
         |    WHEN position('的' IN text) > 0 OR position('是' IN text) > 0
         |         OR position('了' IN text) > 0 THEN 'zh'
         |    WHEN ${markerScore(Seq("the", "and", "of", "to", "a"))} >= ${markerScore(Seq("der", "die", "und", "ist", "das"))}
         |     AND ${markerScore(Seq("the", "and", "of", "to", "a"))} >= ${markerScore(Seq("le", "la", "et", "les", "des"))}
         |     AND ${markerScore(Seq("the", "and", "of", "to", "a"))} >= ${markerScore(Seq("el", "que", "los", "por", "una"))}
         |     AND ${markerScore(Seq("the", "and", "of", "to", "a"))} > 0 THEN 'en'
         |    WHEN ${markerScore(Seq("der", "die", "und", "ist", "das"))} >= ${markerScore(Seq("le", "la", "et", "les", "des"))}
         |     AND ${markerScore(Seq("der", "die", "und", "ist", "das"))} >= ${markerScore(Seq("el", "que", "los", "por", "una"))}
         |     AND ${markerScore(Seq("der", "die", "und", "ist", "das"))} > 0 THEN 'de'
         |    WHEN ${markerScore(Seq("le", "la", "et", "les", "des"))} >= ${markerScore(Seq("el", "que", "los", "por", "una"))}
         |     AND ${markerScore(Seq("le", "la", "et", "les", "des"))} > 0 THEN 'fr'
         |    WHEN ${markerScore(Seq("el", "que", "los", "por", "una"))} > 0 THEN 'es'
         |    ELSE 'und'
         |  END AS lang_pred
         |FROM documents""".stripMargin),
    "q_ext_exact_dedup" ->
      ("""SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
         |  min(doc_id) AS keep_id, count(*) AS n
         |FROM documents GROUP BY 1""".stripMargin),
    "q_ext_dedup_corpus" ->
      ("""WITH all_docs AS (
         |  SELECT doc_id, lang, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, lang, text FROM documents WHERE doc_id % 7 = 0
         |)
         |SELECT doc_id, lang, md5(text) AS content_md5 FROM (
         |  SELECT doc_id, lang, text, ROW_NUMBER() OVER (
         |    PARTITION BY md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
         |    ORDER BY doc_id) AS rn
         |  FROM all_docs
         |) WHERE rn = 1""".stripMargin),
    "q_ext_dedup_neardup_corpus" ->
      (s"""WITH $jaccardCtes,
         |drops AS (
         |  SELECT DISTINCT doc_b FROM shared
         |  JOIN sizes sa ON doc_a = sa.doc_id
         |  JOIN sizes sb ON doc_b = sb.doc_id
         |  WHERE CAST(s AS DOUBLE) / (sa.n + sb.n - s) >= 0.9
         |)
         |SELECT doc_id, lang, md5(text) AS content_md5 FROM docs
         |WHERE doc_id NOT IN (SELECT doc_b FROM drops)""".stripMargin),
    "q_ext_jaccard_pairs" ->
      (s"""WITH $jaccardCtes
         |SELECT doc_a, doc_b, CAST(s AS DOUBLE) / (sa.n + sb.n - s) AS jaccard
         |FROM shared
         |JOIN sizes sa ON doc_a = sa.doc_id
         |JOIN sizes sb ON doc_b = sb.doc_id
         |WHERE CAST(s AS DOUBLE) / (sa.n + sb.n - s) >= 0.9""".stripMargin),
    "q_ext_knn_brute" -> knnExactSql,
    "q_ext_knn_ivf" -> knnExactSql,
    "q_ext_knn_ivf_probe" -> knnExactSql,
    "q_ext_cosine_pairs" ->
      ("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |       list_cosine_similarity(a.v, b.v) AS sim
         |FROM e a JOIN e b ON a.vec_id < b.vec_id
         |WHERE list_cosine_similarity(a.v, b.v) >= 0.35""".stripMargin),
    "q_ext_json_extract" ->
      ("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
         |FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50""".stripMargin),
    "q_ext_media_meta" ->
      ("""SELECT doc_id,
         |  md5(text) AS media_md5,
         |  octet_length(CAST(text AS BLOB)) AS media_bytes,
         |  (['jpeg','png','wav'])[CAST(doc_id % 3 + 1 AS INT)] AS format,
         |  CAST((doc_id % 8 + 1) * 64 AS INT) AS width,
         |  CAST((doc_id % 6 + 1) * 64 AS INT) AS height
         |FROM documents""".stripMargin),
    // The stub decoder's 16-bin byte histogram bins each byte by its HIGH
    // NIBBLE (bin = byte div 16, since 256/16 bins of width 16) — which in
    // SQL is the first hex digit of each byte pair in hex(blob). DuckDB
    // counts matching odd-position hex chars per bin; deterministic integer
    // math, so the partition-local decode path gets a real oracle. The blob
    // is COALESCEd to empty so a NULL text yields n=0 / bins 0.0 exactly
    // like the Spark stub (fakeDecodeFeatures returns 0L + zeros on NULL).
    "q_ext_media_features" ->
      ("""WITH h AS (
         |  SELECT doc_id, hex(COALESCE(CAST(text AS BLOB), ''::BLOB)) AS hx,
         |         octet_length(COALESCE(CAST(text AS BLOB), ''::BLOB)) AS n
         |  FROM documents
         |)
         |SELECT doc_id, n AS media_bytes,
         |  round(CASE WHEN n = 0 THEN 0.0 ELSE
         |    CAST(len(list_filter(range(n), i -> substr(hx, CAST(2*i+1 AS INT), 1) = '0')) AS DOUBLE) / n END, 6) AS bin0,
         |  round(CASE WHEN n = 0 THEN 0.0 ELSE
         |    CAST(len(list_filter(range(n), i -> substr(hx, CAST(2*i+1 AS INT), 1) = '2')) AS DOUBLE) / n END, 6) AS bin2,
         |  round(CASE WHEN n = 0 THEN 0.0 ELSE
         |    CAST(len(list_filter(range(n), i -> substr(hx, CAST(2*i+1 AS INT), 1) = '7')) AS DOUBLE) / n END, 6) AS bin7
         |FROM h""".stripMargin),
    // sampleFrames slices bytes at offset floor(len*i/n), width 64; on the
    // hex string that is substr(hx, 2*floor(n*i/4)+1, 128). floor (not a
    // bare INT cast) mirrors Spark's truncating double→int cast — DuckDB's
    // cast rounds to nearest.
    "q_ext_media_frames" ->
      ("""WITH m AS (
         |  SELECT doc_id, hex(COALESCE(CAST(text AS BLOB), ''::BLOB)) AS hx,
         |         octet_length(COALESCE(CAST(text AS BLOB), ''::BLOB)) AS n
         |  FROM documents
         |)
         |SELECT doc_id, 4 AS n_frames,
         |  md5(list_aggregate(
         |    list_transform(range(4),
         |      i -> substr(hx, 2 * CAST(floor(n * i / 4) AS INT) + 1, 128)),
         |    'string_agg', '|')) AS frames_md5
         |FROM m""".stripMargin),
    // resizeStub keeps bytes at indices 0, k, 2k, … (k = (w/64)*(h/64)
    // from the doc_id-derived fixture dims), i.e. ceil(n/k) bytes; on the
    // hex string that is the 2-char slice at 2·k·i. string_agg of an empty
    // list is NULL — COALESCE to '' to match Spark's md5 of an empty hex.
    "q_ext_media_resize" ->
      ("""WITH m AS (
         |  SELECT doc_id, hex(COALESCE(CAST(text AS BLOB), ''::BLOB)) AS hx,
         |         octet_length(COALESCE(CAST(text AS BLOB), ''::BLOB)) AS n,
         |         CAST((doc_id % 8 + 1) * (doc_id % 6 + 1) AS BIGINT) AS k
         |  FROM documents
         |)
         |SELECT doc_id, 64 AS width, 64 AS height,
         |  CAST((n + k - 1) // k AS INT) AS resized_bytes,
         |  md5(COALESCE(list_aggregate(
         |    list_transform(range((n + k - 1) // k),
         |      i -> substr(hx, CAST(2 * k * i AS INT) + 1, 2)),
         |    'string_agg', ''), '')) AS resized_md5
         |FROM m""".stripMargin),
    // q_ext_minhash_neardup / q_ext_simhash_neardup / q_ext_knn_lsh:
    // intentionally no oracle (non-portable hash internals); see
    // ExtOpsSpec property tests against the exact counterparts.
  )
}
