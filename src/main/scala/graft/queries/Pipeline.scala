package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline wave 2 (SURVEY §2.12 depth): chunking, TF-IDF,
  * stratified sampling, and embedding clustering — the curation steps that
  * sit between the round-3 dedup/quality layer and a tokenizer.
  *
  * Scale posture: chunking and scoring are per-row narrow transforms (no
  * shuffle); TF-IDF shuffles on (doc, token) and token only; sampling is a
  * pushed-down filter on a hash; k-means touches the corpus only through
  * broadcast-centroid joins.
  */
object Pipeline {

  private val ChunkSize = 32
  private val ChunkStride = 24

  /** Whitespace tokens of the lowercased text — the single tokenizer
    * definition every scorer in this file builds on. */
  private[graft] def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(split(trim(lower(col("text"))), """\s+""")).as("token"))

  /** Deterministic uniform in [0,1) from an integer key — the sampling
    * coin s02/x01 flip (s01 uses the sha2-substring coin, documented
    * there): multiplicative hash, xor-fold, second multiply,
    * all mod 2³² (exact in longs; the final division by 2³² is exact in
    * doubles). One definition with its SQL twin below so a future change
    * to the hash can never drift between the sampling queries, and between
    * Spark and the oracle. Assumes non-negative keys (Spark's `pmod` and
    * DuckDB's `%` disagree on negatives).
    *
    * The key pre-reduces mod 2³¹ BEFORE the first multiply: the product
    * of an unreduced 10-digit key (ScaleProbe's replica-tagged ids) with
    * the Knuth constant overflows a long, which ANSI mode (Spark 4
    * default) raises on; 2³¹·2654435761 < 2⁶³ is overflow-free for every
    * key. Identity for all fixture ids (< 2³¹), so every oracle output
    * is unchanged — the same reduction appears in the SQL twin. */
  private[graft] def hashUniform(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val k = pmod(key, lit(2147483648L))
    val h1 = pmod(k * lit(2654435761L), lit(4294967296L))
    val h2 = pmod(
      h1.bitwiseXOR((h1 / 65536L).cast("long")) * lit(1000000007L),
      lit(4294967296L))
    h2.cast("double") / lit(4294967296.0)
  }

  /** DuckDB twin of [[hashUniform]] over column `key`. */
  private[graft] def hashUniformSql(key: String): String =
    s"""((xor((($key % 2147483648) * 2654435761) % 4294967296,
              ((($key % 2147483648) * 2654435761) % 4294967296) // 65536)
          * 1000000007) % 4294967296) / 4294967296.0"""

  /** Shared term-statistics frames: per-(doc, token) counts `tf(n)`,
    * document lengths `dlen`, document frequencies `dfreq(df)`. One
    * definition so TF-IDF, BM25, and the scaling probe can never drift. */
  private[graft] def termStats(docs: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val tf = tokens(docs).groupBy("doc_id", "token").agg(count(lit(1)).as("n"))
    val dlen = tf.groupBy("doc_id").agg(sum("n").as("dlen"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    (tf, dlen, dfreq)
  }

  /** Overlapping token chunking (size 32, stride 24) — the context-window
    * packing step. Chunk count per doc is ⌈(n−size)/stride⌉+1 (min 1), so
    * every token lands in ≥1 chunk and consecutive chunks overlap by
    * size−stride tokens. Pure per-row compute: tokenize → explode chunk
    * indices → slice; the only wide op is the final presentation sort.
    */
  val c01DocChunks = Q(
    "c01_doc_chunks",
    (s, dir) => {
      val toks = split(trim(col("text")), """\s+""")
      val sz = size(toks)
      val nChunks = when(sz <= ChunkSize, lit(1L))
        .otherwise(ceil((sz - ChunkSize) / lit(ChunkStride.toDouble)) + 1)
      Tables.documents(s, dir)
        .select(col("doc_id"), toks.as("toks"),
          explode(sequence(lit(0L), nChunks - 1)).as("chunk_idx"))
        .select(
          col("doc_id"),
          col("chunk_idx").cast("int").as("chunk_idx"),
          slice(col("toks"), (col("chunk_idx") * ChunkStride + 1).cast("int"), lit(ChunkSize)).as("ctoks"))
        .select(
          col("doc_id"), col("chunk_idx"),
          size(col("ctoks")).as("n_tokens"),
          array_join(col("ctoks"), " ").as("chunk"))
        .orderBy("doc_id", "chunk_idx")
    },
    Some(s"""WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks,
        len(regexp_split_to_array(trim(text), '\\s+')) AS sz
      FROM documents),
    x AS (
      SELECT doc_id, toks,
        unnest(generate_series(0,
          CASE WHEN sz <= $ChunkSize THEN 0
               ELSE CAST(ceil((sz - $ChunkSize) / ${ChunkStride.toDouble}) AS BIGINT) END)) AS ci
      FROM t)
    SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
      CAST(len(toks[(ci*$ChunkStride + 1):(ci*$ChunkStride + $ChunkSize)]) AS INT) AS n_tokens,
      array_to_string(toks[(ci*$ChunkStride + 1):(ci*$ChunkStride + $ChunkSize)], ' ') AS chunk
    FROM x ORDER BY doc_id, chunk_idx"""))

  /** Per-document top-3 terms by TF-IDF. tf = n/doclen, idf smoothed
    * ln((N+1)/(df+1)). All inputs are integer counts, so the double formula
    * is a fixed op sequence; ranking runs on the ROUNDED score (libm `ln`
    * may differ in the last ulp between engines — ranking on raw doubles
    * could tie-break differently) with the term as tiebreaker.
    *
    * Shuffles: one on (doc, token), one on token (document frequency), one
    * broadcast scalar (corpus size) — the classic two-pass TF-IDF, no
    * driver-side vocabulary.
    */
  val c02TfidfTopTerms = Q(
    "c02_tfidf_top_terms",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val (tf, dlen, dfreq) = termStats(docs)
      val nDocs = docs.agg(count(lit(1)).as("nd"))
      val scored = tf
        .join(dlen, "doc_id")
        .join(dfreq, "token")
        .crossJoin(broadcast(nDocs))
        .withColumn("tfidf",
          round((col("n") / col("dlen")) * log((col("nd") + 1.0) / (col("df") + 1.0)), 6))
      val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("token"))
      scored
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("rk"), col("token"), col("tfidf"))
        .orderBy("doc_id", "rk")
    },
    Some("""WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
      FROM documents),
    tf AS (SELECT doc_id, token, count(*) AS n FROM tok GROUP BY doc_id, token),
    dlen AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS dlen FROM tf GROUP BY doc_id),
    dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
    nd AS (SELECT count(*) AS nd FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token,
        round((tf.n / dlen.dlen) * ln((nd.nd + 1.0) / (dfreq.df + 1.0)), 6) AS tfidf
      FROM tf JOIN dlen USING (doc_id) JOIN dfreq USING (token), nd),
    r AS (
      SELECT doc_id, token, tfidf,
        CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS INT) AS rk
      FROM scored)
    SELECT doc_id, rk, token, tfidf FROM r WHERE rk <= 3 ORDER BY doc_id, rk"""))

  /** Per-document top-3 terms by BM25 (k1=1.2, b=0.75) — the retrieval-side
    * twin of [[c02TfidfTopTerms]], sharing its shuffle structure (one
    * shuffle on (doc, token), one on token, two broadcast scalars). Like
    * c02, ranking runs on the ROUNDED score with the term as tiebreaker so
    * last-ulp `ln` differences between engines can't reorder ranks.
    */
  val c03Bm25TopTerms = Q(
    "c03_bm25_top_terms",
    (s, dir) => {
      val k1 = 1.2
      val b = 0.75
      val docs = Tables.documents(s, dir)
      val (tf, dlen, dfreq) = termStats(docs)
      val stats = docs.agg(count(lit(1)).as("nd"))
        .crossJoin(dlen.agg(sum("dlen").as("toklen")))
        .withColumn("avgdl", col("toklen") / col("nd"))
      val idf = log(lit(1.0) + (col("nd") - col("df") + 0.5) / (col("df") + 0.5))
      // k1+1 written as the literal 2.2: the double parsed from "2.2" and
      // the double sum 1.2+1.0 differ in the last ulp, and the oracle SQL
      // can only parse literals.
      val score = idf * (col("n") * lit(2.2)) /
        (col("n") + lit(k1) * (lit(1 - b) + lit(b) * col("dlen") / col("avgdl")))
      val scored = tf
        .join(dlen, "doc_id")
        .join(dfreq, "token")
        .crossJoin(broadcast(stats))
        .withColumn("bm25", round(score, 6))
      val w = Window.partitionBy("doc_id").orderBy(col("bm25").desc, col("token"))
      scored
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("rk"), col("token"), col("bm25"))
        .orderBy("doc_id", "rk")
    },
    Some("""WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
      FROM documents),
    tf AS (SELECT doc_id, token, count(*) AS n FROM tok GROUP BY doc_id, token),
    dlen AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS dlen FROM tf GROUP BY doc_id),
    dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
    st AS (
      SELECT (SELECT count(*) FROM documents) AS nd,
        (SELECT CAST(sum(dlen) AS BIGINT) FROM dlen) AS toklen),
    scored AS (
      SELECT tf.doc_id, tf.token,
        round(
          ln(1.0 + (st.nd - dfreq.df + 0.5) / (dfreq.df + 0.5))
          * (tf.n * CAST(2.2 AS DOUBLE)) /
          (tf.n + CAST(1.2 AS DOUBLE) *
            (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dlen.dlen / (st.toklen / st.nd))), 6) AS bm25
      FROM tf JOIN dlen USING (doc_id) JOIN dfreq USING (token), st),
    r AS (
      SELECT doc_id, token, bm25,
        CAST(row_number() OVER (PARTITION BY doc_id ORDER BY bm25 DESC, token) AS INT) AS rk
      FROM scored)
    SELECT doc_id, rk, token, bm25 FROM r WHERE rk <= 3 ORDER BY doc_id, rk"""))

  /** Unigram cross-entropy per document — the cheap perplexity proxy used
    * for LM-based quality filtering: score = mean over doc tokens of
    * −ln(count(token)/total_tokens) under the corpus unigram distribution.
    * High score ⇒ rare-token-heavy (noise, code, boilerplate exhaust).
    *
    * Same two shuffles as TF-IDF (token frequency, then back on doc). The
    * per-doc mean sums each −ln(p) through a DECIMAL cast: the cast is
    * per-value deterministic, making the sum order-free; engine `ln`
    * differences (≤1 ulp ≈ 1e-16) survive the cast as ≤1e-15 per term,
    * absorbed by the final round(…, 6).
    */
  val c04UnigramXent = Q(
    "c04_unigram_xent",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val tok = tokens(docs)
      val tcount = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
      val total = tcount.agg(sum("cnt").as("total"))
      tok
        .join(tcount, "token")
        .crossJoin(broadcast(total))
        .withColumn("surprise", -log(col("cnt") / col("total")))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_tokens"),
          round(sum(col("surprise").cast("decimal(28,15)")).cast("double") / count(lit(1)), 6)
            .as("xent"))
        .orderBy("doc_id")
    },
    Some("""WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
      FROM documents),
    tc AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
    t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM tc)
    SELECT doc_id, count(*) AS n_tokens,
      round(CAST(sum(CAST(-ln(tc.cnt / t.total) AS DECIMAL(28,15))) AS DOUBLE)
        / count(*), 6) AS xent
    FROM tok JOIN tc USING (token), t
    GROUP BY doc_id ORDER BY doc_id"""))

  /** Deterministic stratified sampling: per-language rates driven by the
    * first hex char of a salted SHA-256 of the stable id (en 4/16, zh 12/16,
    * others 8/16). A seeded `sample()` is partition-layout-dependent; a
    * content hash is reproducible on any cluster shape AND pushes down as a
    * plain filter — the scan prunes before any shuffle.
    */
  val s01StratifiedSample = Q(
    "s01_stratified_sample",
    (s, dir) => {
      val h1 = substring(sha2(concat(lit("graft-s01:"), col("doc_id").cast("string")), 256), 1, 1)
      val keep = when(col("lang") === "en", h1 <= "3")
        .when(col("lang") === "zh", h1 <= "b")
        .otherwise(h1 <= "7")
      Tables.documents(s, dir)
        .withColumn("bucket", h1)
        .filter(keep)
        .select(col("doc_id"), col("lang"), col("bucket"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, lang,
      substring(sha256('graft-s01:' || CAST(doc_id AS VARCHAR)), 1, 1) AS bucket
    FROM documents
    WHERE CASE
      WHEN lang = 'en' THEN substring(sha256('graft-s01:' || CAST(doc_id AS VARCHAR)), 1, 1) <= '3'
      WHEN lang = 'zh' THEN substring(sha256('graft-s01:' || CAST(doc_id AS VARCHAR)), 1, 1) <= 'b'
      ELSE substring(sha256('graft-s01:' || CAST(doc_id AS VARCHAR)), 1, 1) <= '7' END
    ORDER BY doc_id"""))

  /** Sequence packing, concat-and-split flavor: documents concatenate into
    * one global token stream (doc_id order) that is cut every 512 tokens —
    * the packing step between chunking and a trainer. Each document gets
    * its stream offset (an exclusive prefix sum), the sequence it starts
    * in, the sequence its last token lands in, and how many sequence
    * boundaries cut it.
    *
    * The prefix sum is the textbook two-level parallel form — a global
    * `Window.orderBy` would move every row to ONE task. Level 1: exclusive
    * sums within doc-id buckets (parallel windows). Level 2: each bucket's
    * base offset = total tokens of all earlier buckets, computed on the
    * tiny bucket-totals frame with a non-equi self-join (rows = #buckets,
    * bounded by data/bucketSize — no unpartitioned window anywhere) and
    * broadcast back. No iterative packing loop (greedy FFD) is needed for
    * the concat-and-split semantics every large pretraining pipeline uses.
    */
  val p01SequencePacking = Q(
    "p01_sequence_packing",
    (s, dir) => {
      val nTok = size(split(trim(col("text")), """\s+"""))
      // All id/offset arithmetic stays in Long via `div` (same convention
      // as Tables.events): a double round-trip through `/` would lose
      // exactness above 2^53 total tokens — precisely the scale this
      // query's two-level structure exists for. Truncation == floor here
      // since every operand is non-negative.
      val base = Tables.documents(s, dir)
        .select(col("doc_id"), nTok.cast("long").as("n_tokens"),
          expr("doc_id div 1000").as("bkt"))
      val wIn = Window.partitionBy("bkt").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val withLocal = base
        .withColumn("local_off", coalesce(sum("n_tokens").over(wIn), lit(0L)))
      val bktTotals = base.groupBy("bkt").agg(sum("n_tokens").as("bkt_tok"))
      val bktOffsets = bktTotals.as("a")
        .join(bktTotals.as("b"), col("b.bkt") < col("a.bkt"), "left")
        .groupBy(col("a.bkt").as("bkt"))
        .agg(coalesce(sum(col("b.bkt_tok")), lit(0L)).as("bkt_off"))
      withLocal
        .join(broadcast(bktOffsets), "bkt")
        .withColumn("offset", col("local_off") + col("bkt_off"))
        .select(
          col("doc_id"), col("n_tokens").cast("int").as("n_tokens"), col("offset"),
          expr("offset div 512").as("seq_start"),
          expr("(offset + n_tokens - 1) div 512").as("seq_end"))
        .withColumn("n_splits", (col("seq_end") - col("seq_start")).cast("int"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (
      SELECT doc_id,
        CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
      FROM documents),
    o AS (
      SELECT doc_id, n_tokens,
        CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS "offset"
      FROM t)
    SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens, "offset",
      CAST(floor("offset" / 512.0) AS BIGINT) AS seq_start,
      CAST(floor(("offset" + n_tokens - 1) / 512.0) AS BIGINT) AS seq_end,
      CAST(floor(("offset" + n_tokens - 1) / 512.0)
         - floor("offset" / 512.0) AS INT) AS n_splits
    FROM o ORDER BY doc_id"""))

  /** Nearest-centroid assignment (k-means E-step) against the 8 lowest-id
    * vectors as fixed centroids — corpus ⨯ broadcast(centroids), argmin
    * Euclidean distance. Argmin runs on the ROUNDED distance (DuckDB's
    * `list_distance` may differ from our fold in the last ulp), cluster id
    * as tiebreak.
    */
  val k01KmeansAssign = Q(
    "k01_kmeans_assign",
    (s, dir) => {
      val c = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val cents = c.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cluster"), col("emb").as("cvec"))
      c.crossJoin(broadcast(cents))
        .withColumn("dist", round(sqrt(graft.operators.KMeans.sqDist(col("emb"), col("cvec"))), 6))
        .groupBy("vec_id")
        .agg(min(struct(col("dist"), col("cluster"))).as("_m"))
        .select(col("vec_id"), col("_m.cluster").as("cluster"), col("_m.dist").as("dist"))
        .orderBy("vec_id")
    },
    Some("""WITH cents AS (
      SELECT CAST(vec_id AS INT) AS cluster, CAST(embedding AS DOUBLE[]) AS cvec
      FROM embeddings WHERE vec_id < 8),
    d AS (
      SELECT e.vec_id, c.cluster,
        round(list_distance(CAST(e.embedding AS DOUBLE[]), c.cvec), 6) AS dist,
        row_number() OVER (PARTITION BY e.vec_id
          ORDER BY round(list_distance(CAST(e.embedding AS DOUBLE[]), c.cvec), 6), c.cluster) AS rn
      FROM embeddings e, cents c)
    SELECT vec_id, cluster, dist FROM d WHERE rn = 1 ORDER BY vec_id"""))

  /** Full Lloyd's k-means (k=8, 3 iterations) over the embedding corpus —
    * cluster sizes and exact-decimal inertia, oracle-checked by UNROLLING
    * the three iterations as CTE layers (assignment → exact-decimal means,
    * ×3, then the final assignment). The unroll is hash-exact because every
    * step of [[graft.operators.KMeans.fit]] is deterministic cross-engine:
    * the distance fold is left-to-right (DuckDB `list_reduce` with a `+`
    * lambda reproduces Spark's `aggregate(…, 0.0, +)` bit-for-bit — adding
    * the 0.0 seed is exact), means are order-free decimal sums, and
    * argmin ties break on (d2, cluster) both sides.
    */
  val k02KmeansClusters = Q(
    "k02_kmeans_clusters",
    (s, dir) => {
      val vecs = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      graft.operators.KMeans.fit(vecs, "vec_id", "emb", k = 8, iters = 3)
        .groupBy("cluster")
        .agg(
          count(lit(1)).as("n_points"),
          round(sum(col("dist2").cast("decimal(28,10)")).cast("double"), 6).as("inertia"))
        .orderBy("cluster")
    },
    Some(KMeansOracle.sql(k = 8, iters = 3)))

  /** Diversity sampling via cluster quotas: the 3 corpus vectors closest
    * to each k01 centroid — the curation step that balances a training mix
    * across embedding-space regions instead of sampling globally. Rank runs
    * on the ROUNDED distance (same cross-engine discipline as k01) inside a
    * per-cluster window; at scale the window shuffles on k keys with
    * per-partition top-k pruning (WindowGroupLimit).
    */
  val k03ClusterDiverseSample = Q(
    "k03_cluster_diverse_sample",
    (s, dir) => {
      val c = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val cents = c.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cluster"), col("emb").as("cvec"))
      val assigned = c.crossJoin(broadcast(cents))
        .withColumn("dist",
          round(sqrt(graft.operators.KMeans.sqDist(col("emb"), col("cvec"))), 6))
        .groupBy("vec_id")
        .agg(min(struct(col("dist"), col("cluster"))).as("_m"))
        .select(col("vec_id"), col("_m.cluster").as("cluster"), col("_m.dist").as("dist"))
      val w = Window.partitionBy("cluster").orderBy(col("dist"), col("vec_id"))
      assigned
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("cluster"), col("rk"), col("vec_id"), col("dist"))
        .orderBy("cluster", "rk")
    },
    Some("""WITH cents AS (
      SELECT CAST(vec_id AS INT) AS cluster, CAST(embedding AS DOUBLE[]) AS cvec
      FROM embeddings WHERE vec_id < 8),
    d AS (
      SELECT e.vec_id, c.cluster,
        round(list_distance(CAST(e.embedding AS DOUBLE[]), c.cvec), 6) AS dist,
        row_number() OVER (PARTITION BY e.vec_id
          ORDER BY round(list_distance(CAST(e.embedding AS DOUBLE[]), c.cvec), 6), c.cluster) AS rn
      FROM embeddings e, cents c),
    a AS (SELECT vec_id, cluster, dist FROM d WHERE rn = 1),
    r AS (
      SELECT cluster, vec_id, dist,
        CAST(row_number() OVER (PARTITION BY cluster ORDER BY dist, vec_id) AS INT) AS rk
      FROM a)
    SELECT cluster, rk, vec_id, dist FROM r WHERE rk <= 3 ORDER BY cluster, rk"""))

  /** The curation funnel end-to-end: near-dup dedup (keep the canonical
    * cluster member) → quality gate (composite score ≥ 0.5) → language
    * routing → per-language doc/token budget — the ONE summary a
    * training-mix owner asks of a corpus, composed from the same shared
    * expressions the individual stage queries (n06, d04, d05) are
    * oracle-pinned on. Everything after the dedup anti-join is row-local;
    * the final aggregate shuffles 5 language keys. */
  val p02CurationFunnel = Q(
    "p02_curation_funnel",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val drops = NearDup.dropIds(docs)
      docs.join(drops, docs("doc_id") === drops("id"), "left_anti")
        .filter(TextOps.qualityScore(col("text")) >= 0.5)
        .select(
          TextOps.predictedLang(col("text")).as("lang"),
          TextOps.tokenCount(col("text")).as("n_tokens"))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("sum_tokens"))
        .orderBy("lang")
    },
    Some {
      val scoreCols = TextOps.langMarkers.map { case (l, re) =>
        s"CAST(length(regexp_extract_all(lower(text), '$re')) AS INT) AS s_$l"
      }.mkString(",\n          ")
      val stopRe = TextOps.stopRe
      s"""WITH RECURSIVE ${NearDup.reachCtesSql},
    ${NearDup.dropsCteSql},
    feat AS (
      SELECT doc_id,
        (CAST(length(regexp_extract_all(lower(text), '$stopRe')) AS DOUBLE)
           / greatest(length(regexp_split_to_array(trim(text), '\\s+')), 1)) * 0.4
        + least(1.0, CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) / 100.0) * 0.3
        + (1.0 - least(1.0, (CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS DOUBLE)
             / greatest(length(text), 1)) * 5.0)) * 0.3 AS quality,
        CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS INT) AS n_tokens,
        CASE
          WHEN s_zh > greatest(s_de, s_en, s_es, s_fr) THEN 'zh'
          WHEN s_fr > greatest(s_de, s_en, s_es) THEN 'fr'
          WHEN s_es > greatest(s_de, s_en) THEN 'es'
          WHEN s_en > s_de THEN 'en'
          ELSE 'de' END AS lang
      FROM (SELECT doc_id, text,
          $scoreCols
        FROM documents))
    SELECT lang, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
    FROM feat
    WHERE quality >= 0.5 AND doc_id NOT IN (SELECT id FROM drops)
    GROUP BY lang ORDER BY lang"""
    })

  /** Deterministic weighted sampling (probability-proportional-to-size
    * Poisson design): each order is kept with inclusion probability
    * p = min(1, n_target · w / W), w = its price, W = total price — so
    * high-value orders are near-certain and the expected sample size is
    * ~n_target regardless of table size. The per-row coin is a
    * multiplicative integer hash of the key (mod 2³²; the final division
    * by 2³² is exact in doubles), so the sample is reproducible in any
    * engine with 64-bit integers — no RNG state, no seed coordination
    * across executors, and the filter is a narrow row-local predicate
    * under a single broadcast scalar W. `p_incl` is emitted because
    * 1/p is exactly the Horvitz–Thompson reweight a downstream unbiased
    * estimator needs.
    */
  val s02WeightedSample = Q(
    "s02_weighted_sample",
    (s, dir) => {
      val orders = Tables.orders(s, dir)
      val tot = orders.agg(Q.dsum(col("o_totalprice")).as("w_total"))
      orders.crossJoin(broadcast(tot))
        .withColumn("u", hashUniform(col("o_orderkey")))
        .withColumn("p_incl",
          least(lit(1.0), lit(200.0) * col("o_totalprice") / col("w_total")))
        .filter(col("u") < col("p_incl"))
        .select(col("o_orderkey"), col("o_totalprice"), col("p_incl"))
        .orderBy("o_orderkey")
    },
    Some(s"""WITH tot AS (
        SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
          AS w_total FROM orders),
      h AS (
        SELECT o_orderkey, o_totalprice, w_total,
          ${Pipeline.hashUniformSql("o_orderkey")} AS u,
          least(1.0, 200.0 * o_totalprice / w_total) AS p_incl
        FROM orders, tot)
      SELECT o_orderkey, o_totalprice, p_incl
      FROM h WHERE u < p_incl
      ORDER BY o_orderkey"""))

  /** Training-mix rebalancing: sample the corpus so every language gets an
    * equal share of a 30%-of-corpus TOKEN budget — the "data mixing" step
    * that turns an as-crawled distribution (this fixture is ~50% English by
    * tokens) into a target distribution. Differs from s01 (fixed fraction
    * per stratum) and s02 (weight-proportional): here the acceptance rate
    * is a FUNCTION OF GROUP STATISTICS, p_l = min(1, budget·share / T_l),
    * so over-represented languages are downsampled exactly as hard as
    * needed and under-represented ones pass through whole.
    *
    * Shape: one narrow pass for token counts, a |languages|-row aggregate
    * for the per-language totals (its own rollup supplies the corpus total
    * AND the language count — no second corpus scan), broadcast back, then
    * a row-local deterministic hash coin ([[hashUniform]]) — no shuffle of
    * the corpus at any point, which is the property a 100 TB mix job needs.
    * `p_incl` is emitted for downstream Horvitz–Thompson reweighting.
    */
  val x01MixtureRebalance = Q(
    "x01_mixture_rebalance",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
      val perLang = docs.groupBy("lang")
        .agg(sum(col("n_tokens")).as("lang_tokens"))
      val totals = perLang.agg(
        sum(col("lang_tokens")).as("total_tokens"),
        count(lit(1)).as("n_langs"))
      docs
        .join(broadcast(perLang), "lang")
        .crossJoin(broadcast(totals))
        .withColumn("u", hashUniform(col("doc_id")))
        .withColumn("p_incl",
          least(lit(1.0),
            lit(0.3) * col("total_tokens") / col("n_langs") / col("lang_tokens")))
        .filter(col("u") < col("p_incl"))
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          round(col("p_incl"), 6).as("p_incl"))
        .orderBy("doc_id")
    },
    Some(s"""WITH d AS (
        SELECT doc_id, lang,
          CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
            AS n_tokens
        FROM documents),
      per_lang AS (
        SELECT lang, sum(n_tokens) AS lang_tokens FROM d GROUP BY lang),
      tot AS (
        SELECT sum(lang_tokens) AS total_tokens, count(*) AS n_langs
        FROM per_lang),
      h AS (
        SELECT d.doc_id, d.lang, d.n_tokens,
          ${Pipeline.hashUniformSql("d.doc_id")} AS u,
          least(1.0, CAST(0.3 AS DOUBLE) * total_tokens / n_langs / lang_tokens)
            AS p_incl
        FROM d JOIN per_lang USING (lang), tot)
      SELECT doc_id, lang, n_tokens, round(p_incl, 6) AS p_incl
      FROM h WHERE u < p_incl
      ORDER BY doc_id"""))

  /** Temperature-based mixture sampling (α-sampling, the multilingual
    * training-mix knob: sample languages with probability ∝ p_l^α,
    * α = 0.5, so low-resource languages are upsampled relative to the
    * crawl distribution without x01's hard equal-share target). The
    * per-language acceptance rate is p_l = min(1, T·q_l / tok_l) with
    * q_l = √tok_l / Σ√tok_m and T a 30%-of-corpus token budget — between
    * as-crawled (α=1) and x01's uniform (α=0).
    *
    * Same 100 TB shape as x01: one narrow token-count pass, a
    * |languages|-row aggregate, broadcast back, row-local hash coin — the
    * corpus never shuffles. Determinism detail: √tok_l is exact IEEE
    * (correctly-rounded sqrt of an exact integer-valued double), and the
    * Σ√tok_m denominator folds in SORTED LANGUAGE ORDER over the
    * model-sized collected list (`array_sort` + `aggregate`) — a plain
    * relational SUM of doubles has nondeterministic addend order and
    * could hash-diverge from the oracle's `list(s ORDER BY lang)` fold. */
  val x02TemperatureSample = Q(
    "x02_temperature_sample",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
      val perLang = docs.groupBy("lang")
        .agg(sum(col("n_tokens")).as("lang_tokens"))
        .withColumn("s", sqrt(col("lang_tokens").cast("double")))
      val totals = perLang.agg(
        sum(col("lang_tokens")).as("total_tokens"),
        aggregate(
          array_sort(collect_list(struct(col("lang"), col("s")))),
          lit(0.0), (acc, x) => acc + x.getField("s")).as("denom"))
      docs
        .join(broadcast(perLang), "lang")
        .crossJoin(broadcast(totals))
        .withColumn("u", hashUniform(col("doc_id")))
        .withColumn("p_incl",
          least(lit(1.0),
            lit(0.3) * col("total_tokens") * col("s") / col("denom")
              / col("lang_tokens")))
        .filter(col("u") < col("p_incl"))
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          round(col("p_incl"), 6).as("p_incl"))
        .orderBy("doc_id")
    },
    Some(s"""WITH d AS (
        SELECT doc_id, lang,
          CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
            AS n_tokens
        FROM documents),
      per_lang AS (
        SELECT lang, sum(n_tokens) AS lang_tokens,
          sqrt(CAST(sum(n_tokens) AS DOUBLE)) AS sq
        FROM d GROUP BY lang),
      tot AS (
        SELECT sum(lang_tokens) AS total_tokens,
          list_reduce(list(sq ORDER BY lang), (a, b) -> a + b) AS denom
        FROM per_lang),
      h AS (
        SELECT d.doc_id, d.lang, d.n_tokens,
          ${Pipeline.hashUniformSql("d.doc_id")} AS u,
          least(1.0, CAST(0.3 AS DOUBLE) * total_tokens * sq / denom / lang_tokens)
            AS p_incl
        FROM d JOIN per_lang USING (lang), tot)
      SELECT doc_id, lang, n_tokens, round(p_incl, 6) AS p_incl
      FROM h WHERE u < p_incl
      ORDER BY doc_id"""))

  /** The END-TO-END curation pipeline as ONE composed query — the
    * flagship "LLM data pipeline" demo: every stage is an
    * already-oracle-pinned operator, composed in the order a production
    * curation run executes them:
    *
    *   1. whole-document near-dup dedup (n06's drop rule: LSH pairs →
    *      connected components → keep each cluster's minimum id);
    *   2. duplicated-SPAN removal over the SURVIVORS (d19's island cut —
    *      spans are re-derived on the deduped corpus, where dropped
    *      documents no longer witness duplication);
    *   3. quality + language gating ON THE CLEANED TEXT (d04's score ≥
    *      0.5, d05's language id — scrubbing first means boilerplate
    *      spans can no longer prop up a document's stopword ratio);
    *   4. temperature mixture sampling of what remains (x02's α = 0.5
    *      rates over the gated survivors' kept-token mass).
    *
    * Output: the selected training rows (doc_id, lang, n_tokens, p_incl).
    *
    * Composition shape: stages 1–2 are the two shuffling operators
    * (band-bucket join + gram-keyed df aggregate), stage 3 is row-local,
    * stage 4 adds one |languages|-row aggregate broadcast back — no
    * corpus shuffle after stage 2. The gated frame is persisted for its
    * two consumers (the per-language totals and the row-local coin);
    * every stage reuses the SAME shared expressions its standalone query
    * pins (NearDup.dropIds, TextOps.dupSpanRemoval / qualityScore /
    * predictedLang / tokenCount, [[hashUniform]]), so the composed
    * oracle is the stages' oracle SQL composed as CTE layers. */
  /** The p03 pipeline body over an arbitrary `(doc_id, text)` frame —
    * shared with [[graft.ScaleProbe]] so the scaling probe times exactly
    * the registered composition. */
  def curationPipeline(docs: DataFrame, span: Boolean = true): DataFrame = {
    val drops = NearDup.dropIds(docs)
    val survivors = docs
      .join(drops, docs("doc_id") === drops("id"), "left_anti")
      .select("doc_id", "text")
    // `span = false` is the probe shape ([[graft.CurationProbe]]): the
    // same funnel without the duplicated-span cut.
    val cleaned =
      if (span) TextOps.dupSpanRemoval(survivors)
      else survivors.withColumn("cleaned_text", col("text"))
    val gated = cleaned
      .filter(TextOps.qualityScore(col("cleaned_text")) >= 0.5)
      .select(
        col("doc_id"),
        TextOps.predictedLang(col("cleaned_text")).as("lang"),
        TextOps.tokenCount(col("cleaned_text")).cast("long").as("n_tokens"))
      .persist()
    val perLang = gated.groupBy("lang")
      .agg(sum(col("n_tokens")).as("lang_tokens"))
      .withColumn("s", sqrt(col("lang_tokens").cast("double")))
    val totals = perLang.agg(
      sum(col("lang_tokens")).as("total_tokens"),
      aggregate(
        array_sort(collect_list(struct(col("lang"), col("s")))),
        lit(0.0), (acc, x) => acc + x.getField("s")).as("denom"))
    gated
      .join(broadcast(perLang), "lang")
      .crossJoin(broadcast(totals))
      .withColumn("u", hashUniform(col("doc_id")))
      .withColumn("p_incl",
        least(lit(1.0),
          lit(0.3) * col("total_tokens") * col("s") / col("denom")
            / col("lang_tokens")))
      .filter(col("u") < col("p_incl"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        round(col("p_incl"), 6).as("p_incl"))
  }

  val p03CurationPipeline = Q(
    "p03_curation_pipeline",
    (s, dir) => curationPipeline(
      Tables.documents(s, dir).select("doc_id", "text")).orderBy("doc_id"),
    Some {
      val scoreCols = TextOps.langMarkers.map { case (l, re) =>
        s"CAST(length(regexp_extract_all(lower(ctext), '$re')) AS INT) AS s_$l"
      }.mkString(",\n          ")
      val stopRe = TextOps.stopRe
      s"""WITH RECURSIVE ${NearDup.reachCtesSql},
      ${NearDup.dropsCteSql},
      surv AS (
        SELECT doc_id, text FROM documents
        WHERE doc_id NOT IN (SELECT id FROM drops)),
      ${TextOps.dupSpanCtesSql("surv")},
      cleaned AS (
        SELECT t.doc_id, coalesce(keptl.cleaned, '') AS ctext
        FROM t LEFT JOIN keptl USING (doc_id)),
      feat AS (
        SELECT doc_id,
          (CAST(length(regexp_extract_all(lower(ctext), '$stopRe')) AS DOUBLE)
             / greatest(length(regexp_split_to_array(trim(ctext), '\\s+')), 1)) * 0.4
          + least(1.0, CAST(length(regexp_split_to_array(trim(ctext), '\\s+')) AS DOUBLE) / 100.0) * 0.3
          + (1.0 - least(1.0, (CAST(length(ctext) - length(regexp_replace(ctext, '[.!?,;:]', '', 'g')) AS DOUBLE)
               / greatest(length(ctext), 1)) * 5.0)) * 0.3 AS quality,
          CAST(length(regexp_split_to_array(trim(ctext), '\\s+')) AS BIGINT) AS n_tokens,
          CASE
            WHEN s_zh > greatest(s_de, s_en, s_es, s_fr) THEN 'zh'
            WHEN s_fr > greatest(s_de, s_en, s_es) THEN 'fr'
            WHEN s_es > greatest(s_de, s_en) THEN 'es'
            WHEN s_en > s_de THEN 'en'
            ELSE 'de' END AS lang
        FROM (SELECT doc_id, ctext,
            $scoreCols
          FROM cleaned)),
      gated AS (SELECT doc_id, lang, n_tokens FROM feat WHERE quality >= 0.5),
      per_lang AS (
        SELECT lang, sum(n_tokens) AS lang_tokens,
          sqrt(CAST(sum(n_tokens) AS DOUBLE)) AS sq
        FROM gated GROUP BY lang),
      tot AS (
        SELECT sum(lang_tokens) AS total_tokens,
          list_reduce(list(sq ORDER BY lang), (a, b) -> a + b) AS denom
        FROM per_lang),
      h AS (
        SELECT g.doc_id, g.lang, g.n_tokens,
          ${Pipeline.hashUniformSql("g.doc_id")} AS u,
          least(1.0, CAST(0.3 AS DOUBLE) * total_tokens * sq / denom / lang_tokens)
            AS p_incl
        FROM gated g JOIN per_lang USING (lang), tot)
      SELECT doc_id, lang, n_tokens, round(p_incl, 6) AS p_incl
      FROM h WHERE u < p_incl
      ORDER BY doc_id"""
    })

  /** CURATION OVER CHANGES, spec-driven (the declarative plane's
    * incremental flagship): the documents corpus lands in a versioned
    * catalog table across TWO commits; a YAML spec with
    * `source: {changes: true, max_versions_per_trigger: 1}` streams the
    * table's `.changes` relation one commit per trigger — each trigger
    * reads only the new commit's files — maintains the accumulated mirror
    * exactly-once, and refreshes the sink with p03's stages recomputed
    * over it. After catch-up the sink must be ROW-IDENTICAL to the batch
    * p03 pipeline on the same corpus (same oracle), proving commit slicing
    * never leaks into the published result. (Two commits, not more: each
    * trigger's refresh recomputes corpus-level curation over the mirror,
    * so the gate's cost is ~1.5× p03 — the slicing-independence claim
    * needs at least two triggers, and more would only re-prove it at
    * linear extra bench cost.) */
  /** The 2-commit documents source p04/p05/p06 ALL stream from — built
    * once per warehouse (idempotent: a live table with exactly commits
    * v1, v2 is reused, anything else rebuilds). The three gates differ in
    * ENGINE (full-refresh / incremental / capped-incremental), not in
    * input, so re-ingesting the corpus per gate was pure bench
    * scaffolding cost (round-14 verdict #8). */
  private[queries] def ensureSharedDocsSrc(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val src = "graft_snap.pipe.docs_src_shared"
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.pipe")
    val k = graft.sources.SnapshotStore.keyOf(
      "graft_snap", Seq("pipe", "docs_src_shared"))
    if (graft.sources.SnapshotStore.resolve(k)
        .exists(_.snapshots.map(_.version) == Vector(1L, 2L))) return src
    s.sql(s"DROP TABLE IF EXISTS $src")
    s.sql(s"CREATE TABLE $src (doc_id BIGINT, text STRING)")
    val docs = Tables.documents(s, dir)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    (0 to 1).foreach(i =>
      docs.filter(col("doc_id") % 2 === i).writeTo(src).append())
    src
  }

  val p04ChangesCuration = Q(
    "p04_changes_curation",
    (s, dir) => {
      val sink = "graft_snap.pipe.docs_curated"
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.pipe")
      Seq(sink, s"${sink}_mirror").foreach(t =>
        s.sql(s"DROP TABLE IF EXISTS $t"))
      val src = ensureSharedDocsSrc(s, dir)
      val spec = graft.catalog.PipelineSpec.fromYaml(
        s"""pipeline: changes_curation
           |source:
           |  table: $src
           |  changes: true
           |  max_versions_per_trigger: 1
           |steps:
           |  - op: near_dup_drop
           |  - op: span_removal
           |  - op: quality_gate
           |    min_score: 0.5
           |  - op: lang_id
           |  - op: token_count
           |  - op: temperature_mix
           |sink:
           |  table: $sink
           |""".stripMargin)
      val ckpt = s"${System.getProperty("java.io.tmpdir")}/graft-p04-ckpt-" +
        java.util.UUID.randomUUID
      new PipelineRunner(s).runChanges(spec, ckpt).awaitTermination()
      s.table(sink)
        .selectExpr("doc_id", "lang", "n_tokens", "round(p_incl, 6) AS p_incl")
        .orderBy("doc_id")
    },
    p03CurationPipeline.oracle)

  /** INCREMENTAL curation over changes (`refresh: incremental` —
    * [[IncrementalCuration]]): the same corpus lands across THREE commits,
    * each trigger does O(changed)-shaped work — LSH-probes the batch
    * against the persisted signature store, updates maintained connected
    * components / gram index / per-language aggregates, restates only the
    * batch + flip-affected docs — and the published sink must STILL match
    * p03's batch oracle exactly (same oracle as p04's full-recompute
    * path). This is the 100 TB-honest shape: the full path re-runs the
    * whole text pipeline over the whole mirror per trigger; this one
    * re-runs it over the delta. */
  val p05IncrementalCuration = Q(
    "p05_incremental_curation",
    (s, dir) => {
      val sink = "graft_snap.pipe.docs_curated5"
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.pipe")
      // TWO commits (the shared source), one per trigger: the cheapest
      // shape that still exercises CROSS-trigger maintenance (store probe
      // against trigger 1's signatures, gram flips, maintained-aggregate
      // deltas, kept->dropped retraction); IncrementalCurationSuite pins
      // 3- and 2-slice runs identical.
      val src = ensureSharedDocsSrc(s, dir)
      val spec = graft.catalog.PipelineSpec.fromYaml(
        s"""pipeline: incremental_curation
           |source:
           |  table: $src
           |  changes: true
           |  max_versions_per_trigger: 1
           |  refresh: incremental
           |steps:
           |  - op: near_dup_drop
           |  - op: span_removal
           |  - op: quality_gate
           |    min_score: 0.5
           |  - op: lang_id
           |  - op: token_count
           |  - op: select
           |    cols: doc_id, lang, n_tokens
           |  - op: temperature_mix
           |sink:
           |  table: $sink
           |""".stripMargin)
      val ckpt = s"${System.getProperty("java.io.tmpdir")}/graft-p05-ckpt-" +
        java.util.UUID.randomUUID
      new PipelineRunner(s).runChanges(spec, ckpt).awaitTermination()
      s.table(sink)
        .selectExpr("doc_id", "lang", "n_tokens", "round(p_incl, 6) AS p_incl")
        .orderBy("doc_id")
    },
    p03CurationPipeline.oracle)

  /** p05 with the CAPPED span-gram index (`gram_cap`,
    * [[IncrementalCuration]]'s sticky-saturation design): once a gram's
    * distinct-doc count reaches the cap its (gram, doc_id) pairs leave
    * the index permanently, bounding the state table by
    * `distinct grams × cap` instead of total gram occurrences — the
    * decomposable answer to p05's honestly-documented gram-volume-sized
    * index. Counts stay exact and the rare saturated flip re-derives
    * holders from the kept corpus, so the OUTPUT is identical: this gate
    * shares p03's oracle verbatim, exactly like p05.
    * IncrementalCurationSuite pins the binding-cap semantics (saturated
    * down-flip via retractions, eviction invariants);
    * `graft.GramCapProbe` measures the index staying bounded under
    * verbatim-duplicated corpus growth while the uncapped index grows
    * linearly. */
  val p06CappedCuration = Q(
    "p06_capped_curation",
    (s, dir) => {
      val sink = "graft_snap.pipe.docs_curated6"
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_snap.pipe")
      // The SHARED source, consumed in ONE AvailableNow trigger (no
      // max_versions_per_trigger): p06's oracle claim is the CAPPED
      // engine's output identity on the full corpus — cross-trigger
      // saturation/fallback mechanics are IncrementalCurationSuite's
      // job (saturated down-flip case), so re-running p05's two-trigger
      // ingest here was duplicated gate scaffolding (round-14 verdict #8).
      val src = ensureSharedDocsSrc(s, dir)
      val spec = graft.catalog.PipelineSpec.fromYaml(
        s"""pipeline: capped_curation
           |source:
           |  table: $src
           |  changes: true
           |  refresh: incremental
           |steps:
           |  - op: near_dup_drop
           |  - op: span_removal
           |    gram_cap: 8
           |  - op: quality_gate
           |    min_score: 0.5
           |  - op: lang_id
           |  - op: token_count
           |  - op: select
           |    cols: doc_id, lang, n_tokens
           |  - op: temperature_mix
           |sink:
           |  table: $sink
           |""".stripMargin)
      val ckpt = s"${System.getProperty("java.io.tmpdir")}/graft-p06-ckpt-" +
        java.util.UUID.randomUUID
      new PipelineRunner(s).runChanges(spec, ckpt).awaitTermination()
      s.table(sink)
        .selectExpr("doc_id", "lang", "n_tokens", "round(p_incl, 6) AS p_incl")
        .orderBy("doc_id")
    },
    p03CurationPipeline.oracle)

  val all: Seq[Q] = Seq(
    c01DocChunks, c02TfidfTopTerms, c03Bm25TopTerms, c04UnigramXent,
    p01SequencePacking, p02CurationFunnel, p03CurationPipeline,
    p04ChangesCuration, p05IncrementalCuration, p06CappedCuration,
    s01StratifiedSample, s02WeightedSample, x01MixtureRebalance,
    x02TemperatureSample, k01KmeansAssign, k02KmeansClusters,
    k03ClusterDiverseSample)
}
