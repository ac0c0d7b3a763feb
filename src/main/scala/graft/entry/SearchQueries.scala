package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.GraftSession
import graft.ext.Search

/** Corpus retrieval operators over `documents`: BM25 ranked scoring
  * (rational-idf variant — see [[graft.ext.Search.bm25]] for why the
  * logarithm is dropped) and inverted-index conjunctive search.
  *
  * The scale contracts under test: BM25 never shuffles the corpus
  * (in-scan per-term tf + one broadcast stats row); conjunctive search
  * touches only the asked-for terms' postings.
  */
object SearchQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    GraftSession.table(s, dir, "documents")

  private val queryTerms = Seq("window", "customer", "scan")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Top-20 BM25 docs for a 3-term query. Every score component is
    // +/x/÷ over exact counts in a pinned fold order, so the DOUBLE
    // scores hash-match the oracle bit for bit.
    "q85_bm25" -> ((s, dir) => {
      Search.bm25(docs(s, dir), "doc_id", "text", queryTerms)
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(20)
    }),

    // Conjunctive (AND) search: docs containing all three terms, via the
    // posting table. total_tf is the crude rank signal.
    "q86_keyword_search" -> ((s, dir) => {
      Search.conjunctive(
          Search.buildPostings(docs(s, dir), "doc_id", "text"), queryTerms)
        .orderBy("doc_id")
    }),

    // Exact phrase search over the positional index: docs containing
    // "the table" as consecutive tokens, with match counts. One pruned
    // index scan feeds the position-chain joins — work ∝ the phrase
    // words' postings, never the corpus.
    "q106_phrase_search" -> ((s, dir) => {
      Search.phraseSearch(
          Search.buildPositionalPostings(docs(s, dir), "doc_id", "text"),
          Seq("the", "table"))
        .orderBy("doc_id")
    }),

    // Hybrid retrieval with reciprocal-rank fusion (the lexical+dense
    // RAG combiner): BM25's top-50 for the 3-term query fused with the
    // top-50 cosine neighbors of query vector 0 (embeddings and
    // documents share the 0..N-1 id space). Each list is a TakeOrdered
    // prefix (global ranks without a global window); contributions are
    // floor(1e9/(60+rank)) — exact integer RRF, so the fused order
    // replays bit-for-bit. Docs on one list only fuse with NULL rank.
    "q219_rrf_hybrid" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val lex = Search.bm25(docs(s, dir), "doc_id", "text", queryTerms)
        .orderBy(col("score").desc, col("doc_id").asc).limit(50)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id").asc)))
        .select("doc_id", "rank")
      val e = GraftSession.table(s, dir, "embeddings")
      val den = graft.ext.Similarity.bruteForceTopK(e,
          e.filter(col("vec_id") === 0), "vec_id", "embedding", k = 50)
        .select(col("n_id").as("doc_id"), col("rank"))
      Search.rrfFuse(Seq("bm25" -> lex, "dense" -> den),
          "doc_id", "rank")
        .orderBy(col("rrf_e9").desc, col("doc_id").asc).limit(20)
        .select("doc_id", "rank_bm25", "rank_dense", "rrf_e9")
    }),

    // Top-20 SMART nnc.ntc cosine docs for a 3-term query — the
    // vector-space complement of q85's probabilistic ranking. Document
    // norm is an exact integer computed in-scan; same zero-corpus-
    // shuffle contract as BM25.
    "q104_vsm_topk" -> ((s, dir) => {
      Search.vsmCosine(docs(s, dir), "doc_id", "text",
          Seq("join", "table", "fast"))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(20)
    }))

  // tf per term is len(list_filter(...)) — the in-scan counting the
  // Spark side does with size(filter(tokens, _ == term)); all BM25
  // arithmetic below mirrors Search.bm25's fold order token for token
  // (left-assoc, same literals: 2.5 = k1+1, 1.5 = k1, 0.25 = 1-b,
  // 0.75 = b — every one exactly representable, so no folding drift).
  val oracleSql: Map[String, String] = Map(
    "q85_bm25" ->
      """WITH t AS (SELECT doc_id,
        |  len(string_split_regex(text,'\s+')) AS dl,
        |  len(list_filter(string_split_regex(text,'\s+'), x -> x = 'window')) AS tf1,
        |  len(list_filter(string_split_regex(text,'\s+'), x -> x = 'customer')) AS tf2,
        |  len(list_filter(string_split_regex(text,'\s+'), x -> x = 'scan')) AS tf3
        | FROM documents),
        |st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, CAST(SUM(dl) AS DOUBLE) AS sumdl,
        |  CAST(SUM(CASE WHEN tf1>0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
        |  CAST(SUM(CASE WHEN tf2>0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2,
        |  CAST(SUM(CASE WHEN tf3>0 THEN 1 ELSE 0 END) AS DOUBLE) AS df3
        | FROM t),
        |sc AS (SELECT doc_id, dl, tf1, tf2, tf3,
        |  (n - df1 + 0.5)/(df1 + 0.5) * (CAST(tf1 AS DOUBLE) * 2.5)
        |    / (CAST(tf1 AS DOUBLE) + 1.5*(0.25 + 0.75*(CAST(dl AS DOUBLE)/(sumdl/n))))
        |  + (n - df2 + 0.5)/(df2 + 0.5) * (CAST(tf2 AS DOUBLE) * 2.5)
        |    / (CAST(tf2 AS DOUBLE) + 1.5*(0.25 + 0.75*(CAST(dl AS DOUBLE)/(sumdl/n))))
        |  + (n - df3 + 0.5)/(df3 + 0.5) * (CAST(tf3 AS DOUBLE) * 2.5)
        |    / (CAST(tf3 AS DOUBLE) + 1.5*(0.25 + 0.75*(CAST(dl AS DOUBLE)/(sumdl/n)))) AS score
        | FROM t, st)
        |SELECT doc_id, dl, tf1, tf2, tf3, score FROM sc WHERE score > 0
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    // q85's BM25 score CTEs verbatim for the lexical ranks, the q40
    // cosine device for the dense ranks (vec 0 as the query), then
    // exact integer RRF: 1e9//(60+rank), NULL-rank systems contribute
    // 0 via COALESCE — the FULL OUTER JOIN is the union-of-lists fuse
    "q219_rrf_hybrid" ->
      """WITH t AS (SELECT doc_id,
        |  len(string_split_regex(text,'\s+')) AS dl,
        |  len(list_filter(string_split_regex(text,'\s+'), x -> x = 'window')) AS tf1,
        |  len(list_filter(string_split_regex(text,'\s+'), x -> x = 'customer')) AS tf2,
        |  len(list_filter(string_split_regex(text,'\s+'), x -> x = 'scan')) AS tf3
        | FROM documents),
        |st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, CAST(SUM(dl) AS DOUBLE) AS sumdl,
        |  CAST(SUM(CASE WHEN tf1>0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
        |  CAST(SUM(CASE WHEN tf2>0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2,
        |  CAST(SUM(CASE WHEN tf3>0 THEN 1 ELSE 0 END) AS DOUBLE) AS df3
        | FROM t),
        |sc AS (SELECT doc_id,
        |  (n - df1 + 0.5)/(df1 + 0.5) * (CAST(tf1 AS DOUBLE) * 2.5)
        |    / (CAST(tf1 AS DOUBLE) + 1.5*(0.25 + 0.75*(CAST(dl AS DOUBLE)/(sumdl/n))))
        |  + (n - df2 + 0.5)/(df2 + 0.5) * (CAST(tf2 AS DOUBLE) * 2.5)
        |    / (CAST(tf2 AS DOUBLE) + 1.5*(0.25 + 0.75*(CAST(dl AS DOUBLE)/(sumdl/n))))
        |  + (n - df3 + 0.5)/(df3 + 0.5) * (CAST(tf3 AS DOUBLE) * 2.5)
        |    / (CAST(tf3 AS DOUBLE) + 1.5*(0.25 + 0.75*(CAST(dl AS DOUBLE)/(sumdl/n)))) AS score
        | FROM t, st),
        |lex AS (SELECT doc_id,
        |    CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank_bm25
        |  FROM sc WHERE score > 0 ORDER BY score DESC, doc_id LIMIT 50),
        |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        |dsc AS (SELECT vec_id AS doc_id,
        |    list_cosine_similarity(qv, embedding::DOUBLE[]) AS cos
        |  FROM embeddings, q WHERE vec_id <> 0),
        |den AS (SELECT doc_id,
        |    CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS BIGINT) AS rank_dense
        |  FROM dsc ORDER BY cos DESC, doc_id LIMIT 50),
        |fused AS (SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
        |    rank_bm25, rank_dense,
        |    COALESCE(1000000000 // (60 + rank_bm25), 0)
        |      + COALESCE(1000000000 // (60 + rank_dense), 0) AS rrf_e9
        |  FROM lex l FULL OUTER JOIN den d ON l.doc_id = d.doc_id)
        |SELECT doc_id, rank_bm25, rank_dense, rrf_e9 FROM fused
        |ORDER BY rrf_e9 DESC, doc_id LIMIT 20""".stripMargin,
    "q86_keyword_search" ->
      """WITH p AS (SELECT doc_id, unnest(string_split_regex(text,'\s+')) AS term FROM documents),
        |pt AS (SELECT term, doc_id, COUNT(*) AS tf FROM p GROUP BY 1,2)
        |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS total_tf FROM pt
        |WHERE term IN ('window','customer','scan')
        |GROUP BY doc_id HAVING COUNT(DISTINCT term) = 3 ORDER BY doc_id""".stripMargin,
    // q106: consecutive-token check straight over the token array —
    // count i where t[i]='the' AND t[i+1]='table'.
    "q106_phrase_search" ->
      """WITH t AS (SELECT doc_id, string_split_regex(text,'\s+') AS t FROM documents),
        |m AS (SELECT doc_id,
        |        len(list_filter(generate_series(1, len(t) - 1),
        |          i -> t[i] = 'the' AND t[i+1] = 'table')) AS n_matches
        |      FROM t)
        |SELECT doc_id, n_matches FROM m WHERE n_matches > 0
        |ORDER BY doc_id""".stripMargin,
    // q104 mirrors Search.vsmCosine's fold order exactly: numerator
    // terms are tf·(idf quotient) with the quotient parenthesized
    // (tf*(a/b), not (tf*a)/b — different roundings), the doc norm is
    // √ of an exact integer Σtf² over the doc's distinct terms, and the
    // query norm folds idf² in term order.
    "q104_vsm_topk" ->
      """WITH t AS (SELECT doc_id,
        |  list_sum(list_transform(
        |    list_transform(list_distinct(string_split_regex(text,'\s+')),
        |      u -> len(list_filter(string_split_regex(text,'\s+'), x -> x = u))),
        |    c -> c*c)) AS normsq,
        |  len(list_filter(string_split_regex(text,'\s+'), x -> x = 'join')) AS tf1,
        |  len(list_filter(string_split_regex(text,'\s+'), x -> x = 'table')) AS tf2,
        |  len(list_filter(string_split_regex(text,'\s+'), x -> x = 'fast')) AS tf3
        | FROM documents),
        |st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        |  CAST(SUM(CASE WHEN tf1>0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
        |  CAST(SUM(CASE WHEN tf2>0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2,
        |  CAST(SUM(CASE WHEN tf3>0 THEN 1 ELSE 0 END) AS DOUBLE) AS df3
        | FROM t),
        |sc AS (SELECT doc_id, tf1, tf2, tf3,
        |  (CAST(tf1 AS DOUBLE) * ((n - df1 + 0.5)/(df1 + 0.5))
        |   + CAST(tf2 AS DOUBLE) * ((n - df2 + 0.5)/(df2 + 0.5))
        |   + CAST(tf3 AS DOUBLE) * ((n - df3 + 0.5)/(df3 + 0.5)))
        |  / (sqrt(CAST(normsq AS DOUBLE)) *
        |     sqrt(((n - df1 + 0.5)/(df1 + 0.5)) * ((n - df1 + 0.5)/(df1 + 0.5))
        |        + ((n - df2 + 0.5)/(df2 + 0.5)) * ((n - df2 + 0.5)/(df2 + 0.5))
        |        + ((n - df3 + 0.5)/(df3 + 0.5)) * ((n - df3 + 0.5)/(df3 + 0.5)))) AS score
        | FROM t, st)
        |SELECT doc_id, tf1, tf2, tf3, score FROM sc WHERE score > 0
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin)
}
