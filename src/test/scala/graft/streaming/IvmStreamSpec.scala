package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.Relational

case class CdcRow(user_id: Long, op: String, old_cents: Option[Long],
                  new_cents: Option[Long])

/** Exactly-once streaming view maintenance: generation-per-batch disk
  * protocol, replay idempotence, crash-window overwrite, and
  * stream == batch equivalence of the folded summary.
  */
class IvmStreamSpec extends SparkSuite {

  private implicit val cdcEnc: org.apache.spark.sql.Encoder[CdcRow] =
    org.apache.spark.sql.Encoders.product[CdcRow]

  private def summaryOf(df: DataFrame): Map[Long, (Long, Long)] =
    df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("applier folds generations, skips replayed batch ids, " +
    "overwrites a crashed half-apply") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("ivm_gen")
    val a = new IvmApplier(s, dir, "user_id")
    assert(summaryOf(a.latestSummary()).isEmpty)

    val b0 = Seq[(Long, String, Option[Long], Option[Long])](
      (1L, "I", None, Some(100L)), (2L, "I", None, Some(50L)))
      .toDF("user_id", "op", "old_cents", "new_cents")
    a.apply(b0, 0L)
    assert(summaryOf(a.latestSummary()) ==
      Map(1L -> ((1L, 100L)), 2L -> ((1L, 50L))))

    // replayed epoch: foreachBatch re-delivers batch 0 after a crash
    // between sink work and checkpoint commit — must be a whole no-op
    a.apply(b0, 0L)
    assert(summaryOf(a.latestSummary()) ==
      Map(1L -> ((1L, 100L)), 2L -> ((1L, 50L))),
      "replay must not double-fold")

    val b1 = Seq[(Long, String, Option[Long], Option[Long])](
        (1L, "U", Some(100L), Some(140L)), (2L, "D", Some(50L), None),
        (3L, "I", None, Some(7L)))
      .toDF("user_id", "op", "old_cents", "new_cents")
    a.apply(b1, 1L)
    assert(summaryOf(a.latestSummary()) ==
      Map(1L -> ((1L, 140L)), 3L -> ((1L, 7L))))

    // crash window: a generation written but never marked is invisible
    // and the replay deterministically overwrites it
    Relational.maintainAggregate(a.latestSummary(),
        Seq[(Long, String, Option[Long], Option[Long])]((9L, "I", None, Some(1L)))
          .toDF("user_id", "op", "old_cents", "new_cents"), "user_id")
      .write.mode("overwrite").parquet(s"$dir/gen=2")
    assert(summaryOf(a.latestSummary()) ==
      Map(1L -> ((1L, 140L)), 3L -> ((1L, 7L))),
      "unmarked generation must be invisible")
    val b2 = Seq[(Long, String, Option[Long], Option[Long])](
      (3L, "U", Some(7L), Some(9L)))
      .toDF("user_id", "op", "old_cents", "new_cents")
    a.apply(b2, 2L)
    assert(summaryOf(a.latestSummary()) ==
      Map(1L -> ((1L, 140L)), 3L -> ((1L, 9L))))

    assert(a.pruneGenerations(keep = 1) == 2)
    assert(summaryOf(a.latestSummary()) ==
      Map(1L -> ((1L, 140L)), 3L -> ((1L, 9L))),
      "pruning old generations never touches the latest")
  }

  test("streamed fold equals the batch fold across micro-batches " +
    "and a restart")(withRocksDB {
    val s = spark
    import s.implicits._
    val dir = tmpDir("ivm_stream")
    val ckpt = tmpDir("ivm_ckpt")
    val rows = Seq(
      CdcRow(1L, "I", None, Some(10L)), CdcRow(2L, "I", None, Some(20L)),
      CdcRow(1L, "U", Some(10L), Some(15L)),
      CdcRow(3L, "I", None, Some(30L)), CdcRow(2L, "D", Some(20L), None),
      CdcRow(4L, "I", None, Some(5L)), CdcRow(1L, "U", Some(15L), Some(40L)))
    val input = MemoryStream[CdcRow](cdcEnc, s)
    def run() = input.toDF()
      .writeStream
      .foreachBatch(IvmStream.sink(s, dir, "user_id"))
      .option("checkpointLocation", ckpt).start()

    val q1 = run()
    input.addData(rows.take(3))
    q1.processAllAvailable()
    q1.stop()
    // restart: the query resumes from the checkpoint; remaining rows
    // arrive across two more triggers
    input.addData(rows.slice(3, 5))
    val q2 = run()
    q2.processAllAvailable()
    input.addData(rows.drop(5))
    q2.processAllAvailable()
    q2.stop()

    val want = summaryOf(Relational.maintainAggregate(
      new IvmApplier(s, tmpDir("ivm_empty"), "user_id").latestSummary(),
      rows.toDF(), "user_id"))
    val got = summaryOf(new IvmApplier(s, dir, "user_id").latestSummary())
    assert(got == want, s"stream=$got batch=$want")
    assert(got == Map(1L -> ((1L, 40L)), 3L -> ((1L, 30L)),
      4L -> ((1L, 5L))))
  })
}
