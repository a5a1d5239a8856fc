package graft.ops

import org.apache.spark.sql.DataFrame

/** Input-parallelism floor for operators whose per-row map work
  * (shingling, minhash permutations, bloom probes) dwarfs the scan.
  *
  * A small parquet file arrives as ONE scan partition (row-group
  * granularity bounds splitting), and Spark then runs the whole
  * pre-shuffle kernel chain in a single task no matter how many cores
  * the cluster has — measured on the sf0.1 fixtures this serialized
  * 6 s of a 7 s LSH query and ~1 s of the bloom decontamination pass.
  *
  * `floor` round-robin-repartitions ONLY when the frame's planned
  * parallelism is materially below the session default: at corpus
  * scale inputs already carry thousands of scan partitions and this
  * is a no-op — no shuffle is added. The check costs one physical
  * planning of the frame (no job).
  */
object Parallelism {
  private[ops] def floor(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 <= target) df.repartition(target)
    else df
  }
}
