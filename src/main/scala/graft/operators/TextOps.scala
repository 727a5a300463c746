package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Text-analysis and deduplication operators for large-scale training-data
  * pipelines, over the `documents` table.
  *
  * Everything is built from codegen'd built-in expressions and
  * higher-order array functions — no UDFs — so whole-stage codegen spans
  * the full pipeline and the operators scale linearly with partitions.
  *
  * Cross-engine determinism: the only hash used is `md5` (identical in
  * Spark and DuckDB), and all folds are over exact integers, so every
  * operator here is DuckDB-oracle checkable.
  */
object TextOps {

  /** Whitespace tokenization shared by all text operators. */
  private val words: Column = split(col("text"), " ")

  private def withWords(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).withColumn("words", words)

  /** Token counting: whitespace tokens plus a BPE-ish subword estimate
    * (≈ 4 chars per subword piece, the usual budget heuristic).
    */
  def tokens(spark: SparkSession, dir: String): DataFrame =
    withWords(spark, dir).select(
      col("doc_id"),
      size(col("words")).cast("long").as("n_tokens_ws"),
      expr("aggregate(words, 0L, (acc, w) -> acc + CAST(ceil(length(w) / 4.0) AS LONG))")
        .as("n_tokens_bpe")
    )

  /** Quality scoring: length / vocabulary-diversity / stopword signals.
    * All ratios are exact-integer divisions evaluated in double — bit-
    * identical across engines.
    */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    val stop = "array('the','a','of','and','to','in','is','it','on','for')"
    withWords(spark, dir).select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      size(col("words")).cast("long").as("n_words"),
      (size(array_distinct(col("words"))).cast("double") /
        size(col("words"))).as("uniq_ratio"),
      (expr(s"size(filter(words, w -> array_contains($stop, w)))").cast("double") /
        size(col("words"))).as("stopword_ratio"),
      (length(col("text")).cast("double") / size(col("words"))).as("avg_token_len")
    )
  }

  /** Language identification via per-language stopword scoring with a
    * deterministic priority tiebreak — the n-gram-heuristic family of
    * langid, reduced to word unigrams (the fixture text is synthetic).
    */
  def langid(spark: SparkSession, dir: String): DataFrame = {
    def score(list: String): Column =
      expr(s"size(filter(words, w -> array_contains(array($list), w)))").cast("long")
    val en = score("'the','a','of','and','to','is'")
    val es = score("'el','la','de','y','que','en'")
    val de = score("'der','die','und','das','ist','ein'")
    val fr = score("'le','les','et','des','un','une'")
    withWords(spark, dir).select(
      col("doc_id"), col("lang"),
      en.as("score_en"), es.as("score_es"), de.as("score_de"), fr.as("score_fr"),
      when(en >= es && en >= de && en >= fr, lit("en"))
        .when(es >= de && es >= fr, lit("es"))
        .when(de >= fr, lit("de"))
        .otherwise(lit("fr")).as("lang_pred")
    )
  }

  /** Document fingerprinting: md5 over the sorted distinct vocabulary —
    * an order-insensitive content fingerprint (the hash analog of the
    * reference's EAN identity keys, SURVEY.md P5).
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    withWords(spark, dir).select(
      col("doc_id"),
      md5(concat_ws(" ", sort_array(array_distinct(col("words")))))
        .as("fingerprint")
    )

  /** Exact deduplication: hash-groupBy on content, keep the smallest
    * doc_id as canonical. One shuffle on the md5 key; at 100 TB the
    * 128-bit key shuffles instead of the document text.
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("canonical_doc_id"),
        count(lit(1)).as("n_copies"))

  /** 3-word shingles (guarded for short docs: <3 words → empty). */
  private val shingles: Column = when(size(col("words")) >= 3,
    expr("transform(sequence(0, size(words) - 3), i -> concat_ws(' ', slice(words, i + 1, 3)))"))
    .otherwise(expr("CAST(array() AS array<string>)"))

  private def withShingles(spark: SparkSession, dir: String): DataFrame =
    withWords(spark, dir).withColumn("shingles", shingles)

  /** MinHash signatures: NUM_HASHES independent permutations simulated
    * by seed-prefixed md5; signature element s = min hash under seed s.
    * md5-as-string min is identical in both engines (ASCII hex compare).
    */
  val NumHashes = 9
  val BandSize = 3 // 3 bands of 3 → LSH threshold ≈ (1/3)^(1/3) ≈ 0.69

  def minhashSignatures(spark: SparkSession, dir: String): DataFrame =
    withShingles(spark, dir)
      .where(size(col("shingles")) > 0)
      .select(col("doc_id"),
        expr(s"""transform(sequence(0, ${NumHashes - 1}),
                 s -> array_min(transform(shingles, sg -> md5(concat(CAST(s AS STRING), ':', sg)))))""")
          .as("sig"))

  /** MinHash exposed as a query: doc_id + signature, serialized to a
    * '|'-joined scalar (array-typed outputs crash the driver's compare;
    * see Assets.edgeList). The array form stays internal ([[minhashSignatures]]).
    */
  def minhash(spark: SparkSession, dir: String): DataFrame =
    minhashSignatures(spark, dir)
      .select(col("doc_id"), concat_ws("|", col("sig")).as("sig"))

  /** MinHash + LSH near-duplicate candidate pairs: band the signature,
    * bucket-join on (band index, band key), estimate Jaccard from
    * signature agreement. The join is on band hashes — never a cross
    * join — so candidate generation is O(collisions), the scale path
    * for dedup at 100 TB.
    */
  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sigs = minhashSignatures(spark, dir)
    val nBands = NumHashes / BandSize
    val bands = sigs.select(
      col("doc_id"), col("sig"),
      posexplode(expr(
        s"""transform(sequence(0, ${nBands - 1}),
            b -> concat_ws('', slice(sig, b * $BandSize + 1, $BandSize)))"""))
        .as(Seq("band_idx", "band_key")))
    val a = bands.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"),
      col("band_idx"), col("band_key"))
    val b = bands.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"),
      col("band_idx"), col("band_key"))
    a.join(b, Seq("band_idx", "band_key"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (expr(s"size(filter(sequence(1, $NumHashes), i -> sig_a[i - 1] = sig_b[i - 1]))")
          .cast("double") / NumHashes).as("est_jaccard"))
      .distinct()
  }

  /** Exact n-gram Jaccard over LSH candidate pairs: verify candidates
    * with true shingle-set overlap. Composes the LSH prefilter (cheap,
    * approximate) with exact verification (expensive, only on
    * candidates) — the canonical two-stage dedup at scale.
    */
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val pairs = dedupMinhashLsh(spark, dir).select(col("doc_a"), col("doc_b"))
    val sh = withShingles(spark, dir)
      .select(col("doc_id"), array_distinct(col("shingles")).as("sh"))
    pairs
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) -
            size(array_intersect(col("sh_a"), col("sh_b")))))
          .as("jaccard"))
  }

  /** SimHash: 32-bit locality-sensitive fingerprint. Bit j is the sign
    * of the sum over tokens of ±1 from bit j of md5(token) (one bit per
    * hex digit). Near-duplicates share most bits; grouping by simhash
    * clusters exact-ish duplicates without any join.
    */
  def simhash(spark: SparkSession, dir: String): DataFrame =
    withWords(spark, dir)
      // Hoist md5 out of the 32-iteration bit loop: common-subexpression
      // elimination does not cross higher-order lambdas, so inlining
      // md5(w) would cost 32 digests per word per row.
      .withColumn("wh", expr("transform(words, w -> md5(w))"))
      .select(
        col("doc_id"),
        expr("""concat_ws('', transform(sequence(0, 31), j ->
                 CASE WHEN aggregate(wh, 0,
                   (acc, h) -> acc + 2 * ((instr('0123456789abcdef',
                      substring(h, j + 1, 1)) - 1) % 2) - 1) > 0
                 THEN '1' ELSE '0' END))""").as("simhash")
      )

  /** SimHash duplicate clusters: identical fingerprints bucketed. */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    simhash(spark, dir)
      .groupBy(col("simhash"))
      .agg(min(col("doc_id")).as("canonical_doc_id"),
        count(lit(1)).as("cluster_size"))
      .where(col("cluster_size") > 1)
}
