package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Model-evaluation metrics computed exactly at corpus scale — the
  * missing member next to the recall gates (Similarity), confusion
  * matrix (langid_confusion), and drift tests (drift_chi2): does a
  * SCORE actually rank a LABEL?
  */
object Eval {

  /** Exact Mann-Whitney AUC of an integer score against a binary
    * label: P(score_pos > score_neg) + ½·P(tie), via the rank-sum
    * identity with midrank tie handling — the textbook AUC, not a
    * sampled or binned estimate.
    *
    * Shape: one hash aggregate collapses rows to SCORE GROUPS
    * (n, n_pos per distinct score), and the rank arithmetic runs on
    * that collapsed frame — an unpartitioned window, but over groups,
    * not rows, so it is bounded by score cardinality: for a
    * bounded-range integer score (length, cents, quantized model
    * score) that is thousands of rows regardless of corpus size. For
    * a high-cardinality score, quantize first — binned AUC is the
    * standard practice at that point anyway. All ranks are folded at
    * 2× scale so midranks (the .5s) stay in BIGINT: with
    * 2·midrank = first_rank + last_rank per group,
    * AUC = (Σ_pos 2·midrank − n_pos·(n_pos+1)) / (2·n_pos·n_neg)
    * — exact integers until the single final division.
    */
  def rankAuc(df: DataFrame, scoreCol: String,
              isPos: org.apache.spark.sql.Column): DataFrame = {
    val groups = df
      .select(col(scoreCol).cast(LongType).as("s"),
        when(isPos, 1L).otherwise(0L).as("p"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("n"), sum(col("p")).as("np"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    groups
      .withColumn("endRank", sum(col("n")).over(w))
      // 2·midrank = start + end = (end − n + 1) + end
      .withColumn("mid2", col("endRank") * 2L - col("n") + 1L)
      .agg(sum(col("np") * col("mid2")).as("sum2r"),
        sum(col("np")).as("n_pos"),
        sum(col("n") - col("np")).as("n_neg"))
      .where(col("n_pos") > 0L && col("n_neg") > 0L)
      .select(col("n_pos"), col("n_neg"),
        ((col("sum2r") - col("n_pos") * (col("n_pos") + 1L))
          .cast(DoubleType) /
          (col("n_pos") * col("n_neg") * 2L).cast(DoubleType))
          .as("auc"))
  }
}
