package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming maintenance for the persisted text index — the
  * [[AnnStream.indexMaintainStream]] twin for keyword retrieval: each
  * micro-batch's document adds/deletes fold into the
  * [[graft.sources.TextIndexStore]] changelog under the batchId as
  * seq. Exactly-once under epoch replay: both writers overwrite their
  * own batchId-keyed subdirectory, so a recovered epoch rewrites the
  * same files. Within one batch a delete beats an add for the same id
  * (tombstones kill appends at or below their seq — the store's
  * documented algebra); a later batch's re-add resurrects.
  */
object TextIndexStream {

  def maintainStream(deltas: DataFrame, dir: String, idCol: String,
                     textCol: String, opCol: String,
                     checkpointLocation: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    deltas.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val adds = batch.filter(col(opCol) === "add")
        val dels = batch.filter(col(opCol) === "del")
        if (!adds.isEmpty)
          graft.sources.TextIndexStore.append(adds, idCol, textCol,
            dir, batchId)
        if (!dels.isEmpty)
          graft.sources.TextIndexStore.tombstone(dels, idCol, dir,
            batchId)
        ()
      }
      .start()
}
