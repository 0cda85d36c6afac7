package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` table — exact,
  * n-gram-Jaccard (exact, inverted-index), MinHash+LSH, and SimHash.
  *
  * Scale design (the 100 TB story):
  *  - exact dedup is a fingerprint groupBy — one shuffle keyed by a
  *    16-byte hash, map-side combined;
  *  - exact Jaccard pairs use a shingle inverted index (explode +
  *    self-equi-join on shingle) — never the O(n²) cross join; skewed
  *    ultra-common shingles are handled by AQE skew-join splitting;
  *  - MinHash+LSH replaces the inverted index with a bounded
  *    band-bucket join: k=64 hashes, 32 bands × 2 rows. For a true
  *    Jaccard J, P(candidate) = 1-(1-J²)³²; at the J ≥ 0.8 output
  *    threshold P(miss) ≤ (1-0.64)³² ≈ 5e-15, so after exact
  *    verification of candidates the output provably equals the exact
  *    inverted-index result (same oracle SQL) while the join touches
  *    only 32 rows per doc regardless of document length;
  *  - SimHash buckets on 16-bit signature chunks (pigeonhole: hamming
  *    ≤ 3 over 64 bits ⇒ at least one of 4 chunks identical), then
  *    verifies with bit_count(xor). Hash-dependent → rows-only check.
  */
object Dedup {

  /** Distinct word n-gram shingles (space-joined) of the canonical
    * token list; empty array when fewer than n tokens. */
  def shingles(text: Column, n: Int = 3): Column = {
    val tk = TextOps.tokens(text)
    when(size(tk) < n, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(sequence(lit(0), size(tk) - n),
          i => concat_ws(" ", slice(tk, i + 1, lit(n))))))
  }

  /** doc_id → exploded distinct shingles (the inverted-index input). */
  private def shingleIndex(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(shingles(col("text"))).as("shingle"))

  /** Exact Jaccard for candidate pairs given both docs' shingle
    * arrays. Exact rational → double, bit-identical across engines. */
  private def jaccard(sa: Column, sb: Column): Column = {
    val inter = size(array_intersect(sa, sb)).cast("double")
    inter / (size(sa) + size(sb) - size(array_intersect(sa, sb)))
  }

  // ------------------------------------------------------------ queries

  /** Exact dedup: one representative (min doc_id) per canonical-text
    * fingerprint + the duplicate count. Single hash shuffle on the
    * 16-byte fingerprint. */
  def qDedupExact(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables(spark, sfDir, "documents")
    d.select(TextOps.fingerprint(col("text")).as("fp"), col("doc_id"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("keep_id"))
  }

  /** Exact near-dup pairs by word-3-gram Jaccard ≥ 0.8 via the shingle
    * inverted index: explode → self-join on shingle → per-pair common
    * count → join per-doc sizes → filter. The join key is the shingle
    * string; at 100 TB the common-shingle skew is AQE-split and the
    * per-pair aggregation is map-side combined. */
  def qJaccardPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables(spark, sfDir, "documents")
    val idx = shingleIndex(d)
    val sizes = idx.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val common = idx.as("a")
      .join(idx.as("b"),
        col("a.shingle") === col("b.shingle")
          && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
      .agg(count(lit(1)).as("inter"))
    common
      .join(sizes.withColumnRenamed("doc_id", "ida")
        .withColumnRenamed("n_sh", "na"), "ida")
      .join(sizes.withColumnRenamed("doc_id", "idb")
        .withColumnRenamed("n_sh", "nb"), "idb")
      .select(col("ida"), col("idb"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .orderBy(col("ida"), col("idb"))
  }

  /** MinHash+LSH near-dup pairs, exact-verified: 64 per-shingle hashes
    * (xxhash64 seeded by position), per-doc signature = columnwise
    * min, 32 bands of 2 → candidate pairs from band-bucket groupBy →
    * exact Jaccard verification against the full shingle arrays →
    * J ≥ 0.8. Output equals qJaccardPairs (P(miss) ≈ 5e-15, see
    * object doc) while scaling as O(docs × 32) join rows. */
  def qDedupMinhash(spark: SparkSession, sfDir: String): DataFrame = {
    val k = 64
    val bands = 32 // × 2 rows
    val d = Tables(spark, sfDir, "documents")
    val withSh = d.select(col("doc_id"), shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    // signature: for each i, min over shingles of xxhash64(i, shingle)
    val sigCols = (0 until k).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"h$i"))
    val sigs = withSh
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
      .groupBy(col("doc_id"))
      .agg(sigCols.head, sigCols.tail: _*)
    // bands: hash the 2-row slice into one bucket key per band
    val bandCols = (0 until bands).map(b =>
      struct(lit(b).as("band"),
        xxhash64(col(s"h${2 * b}"), col(s"h${2 * b + 1}")).as("sig")))
    val buckets = sigs.select(col("doc_id"),
      explode(array(bandCols: _*)).as("bk"))
    val cands = buckets.as("a")
      .join(buckets.as("b"),
        col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
      .distinct()
    // exact verification on the candidate set only
    val sh = withSh
    cands
      .join(sh.select(col("doc_id").as("ida"), col("sh").as("sa")), "ida")
      .join(sh.select(col("doc_id").as("idb"), col("sh").as("sb")), "idb")
      .select(col("ida"), col("idb"), jaccard(col("sa"), col("sb")).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .orderBy(col("ida"), col("idb"))
  }

  /** SimHash near-dup pairs (hamming ≤ 3 over 64-bit signatures).
    * Signature bit i = sign of Σ_tokens (bit i of xxhash64(token) ?
    * +1 : −1). Candidates via 4×16-bit chunk equality (pigeonhole
    * guarantees recall for hamming ≤ 3), verified with
    * bit_count(xor). Hash-function-dependent → no SQL oracle
    * (rows-only check); unit-tested instead. */
  def qSimhashPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables(spark, sfDir, "documents")
    val tok = d.select(col("doc_id"),
        explode(TextOps.tokens(col("text"))).as("t"))
      .select(col("doc_id"), xxhash64(col("t")).as("h"))
    val bitSums = (0 until 64).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"s$i"))
    val sums = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map(i =>
        when(col(s"s$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    val sigs = sums.select(col("doc_id"), sig.as("sig"))
    val chunks = sigs.select(col("doc_id"), col("sig"),
      explode(array((0 until 4).map(cIdx => struct(lit(cIdx).as("c"),
        shiftright(col("sig"), cIdx * 16).bitwiseAND(0xFFFFL).as("v"))): _*))
        .as("chunk"))
    chunks.as("a")
      .join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).cast("long")
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy(col("ida"), col("idb"))
  }
}
