package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-out join utilities — the two techniques from the 100 TB
  * playbook that aren't automatic: co-located bucketed joins (no
  * shuffle at read time) and salting for skewed keys (when AQE's
  * skew-join splitting isn't enough, e.g. a single hot key inside one
  * partition of a non-AQE stage).
  */
object Scale {

  /** Persist `df` bucketed+sorted by `key` into the session catalog.
    * Two tables bucketed by the same key with the same bucket count
    * join WITHOUT any Exchange — at 100 TB this turns the nightly
    * fact⋈fact join from a full shuffle of both sides into a local
    * merge per bucket. Bucket count rule of thumb: total size /
    * target partition size (128–512 MB), rounded to a power of two
    * so future 2× re-bucketing can reuse files. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Skew-proof equi-join of a huge, skewed `big` side with a small
    * (but not broadcastable) `small` side: big rows get a uniform
    * salt in [0, buckets); the small side is replicated once per
    * salt value, so one hot key spreads over `buckets` reducers.
    * Row-level results are identical to `big.join(small, key)` —
    * the salt only changes the shuffle distribution. The salt uses
    * rand(seed): per-row determinism is irrelevant to correctness,
    * only the partition assignment moves. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      buckets: Int, seed: Long = 42L): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      (rand(seed) * buckets).cast("int"))
    val expandedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(expandedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
