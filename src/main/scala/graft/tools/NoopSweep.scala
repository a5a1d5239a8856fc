package graft.tools

import org.apache.spark.sql.SparkSession

/** Registry-wide bench-fidelity sweep (the r13 NoopProbe, made
  * systematic): for EVERY registered query, time a noop-sink write
  * (evaluates every output column — what Verify pays) against a
  * count() (what Bench times). A row whose count is far below its
  * noop is a row whose kernels the bench is NOT measuring: count()'s
  * column pruning can eliminate a unique-key left join and the whole
  * expression pipeline under it (r13 found span_dedup benching 0.30 s
  * counted vs 31 s evaluated). Such rows need the evaluation-barrier
  * idiom (a trailing always-true filter on a computed column) so a
  * kernel regression can never hide from the committed bench.
  *
  * Writes one JSON line per row {name, noop, count, ratio} plus a
  * summary; flag rule: noop / max(count, 0.05) > 2 AND the absolute
  * gap exceeds 0.2 s (sub-tenth-second rows are all noise at this
  * granularity).
  *
  * Usage: NoopSweep [sfDir] [outFile]
  */
object NoopSweep {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("noop_sweep.json")
    // bench conditions: sidecar materialization off (Bench sets the
    // same flag — the sweep judges the BENCH's fidelity)
    System.setProperty("graft.ivf.cells.skipWrite", "true")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    val rows = graft.SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        try {
          // warm once (JIT + shuffle files), then min of 2 per mode
          fn(spark, d).write.mode("overwrite").format("noop").save()
          val noop = (1 to 2).map(_ => time {
            fn(spark, d).write.mode("overwrite").format("noop").save()
          }).min
          val cnt = (1 to 2).map(_ => time { fn(spark, d).count() }).min
          val ratio = noop / math.max(cnt, 0.05)
          val flagged = ratio > 2.0 && (noop - cnt) > 0.2
          println(f"[sweep] $name%-28s noop=$noop%7.3f count=$cnt%7.3f " +
            f"ratio=$ratio%6.2f ${if (flagged) "FLAG" else ""}")
          (name, noop, cnt, ratio, flagged, "")
        } catch {
          case e: Throwable =>
            println(s"[sweep] $name ERROR ${e.getMessage}")
            (name, -1.0, -1.0, -1.0, false, String.valueOf(e.getMessage))
        }
    }
    val flaggedNames = rows.filter(_._5).map(_._1)
    val json = new StringBuilder
    json.append("{\"sf\":\"").append(d).append("\",\"rows\":[")
    json.append(rows.map { case (n, no, c, r, f, err) =>
      if (err.nonEmpty)
        s"""{"name":"$n","error":"${err.replace('"', '\'')}"}"""
      else
        f"""{"name":"$n","noop":$no%.3f,"count":$c%.3f,"ratio":$r%.2f,"flag":$f}"""
    }.mkString(","))
    json.append("],\"flagged\":[")
    json.append(flaggedNames.map(n => s""""$n"""").mkString(","))
    json.append("]}")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.toString.getBytes("UTF-8"))
    println(s"[sweep] flagged: ${flaggedNames.mkString(", ")}")
    println(s"[sweep] wrote $out")
    spark.stop()
  }
}
