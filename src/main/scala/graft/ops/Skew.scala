package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Skew mitigation: salted joins. When one join key carries a hot
  * fraction of a 100 TB fact table, the plain hash join sends the
  * whole hot key to ONE reducer; salting splits it across
  * `saltBuckets` reducers by extending the key with a deterministic
  * salt on the large side and replicating the small side once per
  * salt value. AQE's skew-join handles many cases at runtime; the
  * explicit form is for the cases it cannot see (e.g. a skewed
  * aggregation feeding the join, or non-AQE engines).
  */
object Skew {

  /** Deterministic salt in [0, saltBuckets): derived from a secondary
    * column so replays and retries salt identically (no rand()).
    * Null inputs need no special case: Spark hash expressions are
    * non-nullable (a null child folds into the seed), so a null
    * saltBy value already lands in a real bucket — the coalesce is
    * belt-and-braces for a future non-hash salt derivation, not a
    * behavior change.
    */
  def salt(c: Column, saltBuckets: Int): Column =
    coalesce(pmod(xxhash64(c), lit(saltBuckets.toLong)), lit(0L))
      .cast(IntegerType)

  /** Inner equi-join of a skewed large side against a small dim,
    * salted: large.key extended with salt(saltBy), dim replicated
    * `saltBuckets` times. Row-identical to the plain join; shuffle of
    * the hot key spreads over saltBuckets reducers.
    */
  def saltedJoin(large: DataFrame, dim: DataFrame, key: String,
                 saltBy: String, saltBuckets: Int = 8): DataFrame = {
    val salted = large.withColumn("__salt",
      salt(col(saltBy), saltBuckets))
    val replicated = dim
      .withColumn("__salt",
        explode(sequence(lit(0), lit(saltBuckets - 1))))
      .withColumn("__salt", col("__salt").cast(IntegerType))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
