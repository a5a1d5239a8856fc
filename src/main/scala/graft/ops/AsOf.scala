package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark has no built-in for: a merge-based
  * as-of join and a bucketed time-proximity (range) join.
  *
  * Both are composed from Spark primitives (SURVEY §4 custom tier (a))
  * rather than a theta join: the naive inequality-join form of either
  * operator explodes to |left|×|right| comparisons per key and plans as
  * a nested-loop join — the bucketed/merge forms below keep the work
  * proportional to rows + true matches and plan as one equi-shuffle.
  */
object AsOf extends org.apache.spark.internal.Logging {

  /** As-of join (inclusive): for every `probe` row, the single latest
    * `build` row with the same `key` and `build.buildTs <= probe.probeTs`,
    * or nulls when no earlier build row exists (left-join semantics).
    *
    * Shape: tag both sides, union them, and take one window pass per
    * key ordered by (ts, side, tie) carrying a running
    * last-non-null of the build payload — the classic merge as-of.
    * Cost at any scale: ONE shuffle on `key` plus a per-key sort;
    * running state is a single carried struct per row. The
    * inequality-join alternative (`probe.ts >= build.ts` in the join
    * condition) is O(|build|×|probe|) per key and is exactly the plan
    * shape PlanQualitySpec bans (nested-loop).
    *
    * Determinism: build rows are tie-broken by `buildTie` (the largest
    * wins, matching `row_number() ... ORDER BY ts DESC, tie DESC = 1`);
    * at equal timestamps build sorts before probe, making the boundary
    * inclusive. Probe rows at equal timestamps all observe the same
    * carried value, so their relative order is immaterial.
    *
    * Column contract: `build` and `probe` share ONLY `key`; all other
    * column names must be disjoint (both sides' non-key columns appear
    * in the output under their own names).
    *
    * Nulls: a build row with a null timestamp or null key is dropped —
    * unordered rows must never win an as-of, and join semantics never
    * match a null key (the window's partitionBy would otherwise group
    * all null keys together and "match" them). Null-ts or null-key
    * probe rows enrich as unmatched (left semantics) rather than
    * failing the query.
    */
  def asofJoin(build: DataFrame, probe: DataFrame, key: String,
               buildTs: String, probeTs: String,
               buildTie: String): DataFrame = {
    val carryCols = build.columns.filterNot(_ == key).toSeq
    val probeCols = probe.columns.filterNot(_ == key).toSeq
    val carryT = build.select(struct(carryCols.map(col): _*).as("s"))
      .schema("s").dataType
    val probeT = probe.select(struct(probeCols.map(col): _*).as("s"))
      .schema("s").dataType
    val b = build.filter(col(buildTs).isNotNull && col(key).isNotNull).select(
      col(key), col(buildTs).as("__ts"), lit(0).as("__side"),
      col(buildTie).cast("long").as("__tie"),
      struct(carryCols.map(col): _*).as("__carry"),
      lit(null).cast(probeT).as("__probe"))
    val p = probe.select(
      col(key), col(probeTs).as("__ts"), lit(1).as("__side"),
      lit(Long.MaxValue).as("__tie"),
      lit(null).cast(carryT).as("__carry"),
      struct(probeCols.map(col): _*).as("__probe"))
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.unionByName(p)
      .withColumn("__match", last(col("__carry"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col(key) +:
        (probeCols.map(c => col("__probe." + c).as(c)) ++
          carryCols.map(c => col("__match." + c).as(c))): _*)
  }

  /** Forward as-of join (inclusive): for every `probe` row, the single
    * EARLIEST `build` row with the same `key` and
    * `build.buildTs >= probe.probeTs` — the "next quote/price after
    * the order" direction; nulls when no later build row exists.
    *
    * The mirror of `asofJoin`: same one-shuffle merge shape, with the
    * window frame flipped to (currentRow, unboundedFollowing) and a
    * `first(ignoreNulls)` carry. Ordering (ts, side, tie) puts probe
    * rows BEFORE build rows at equal timestamps, so the boundary is
    * inclusive; builds at equal timestamps tie-break by SMALLEST
    * `buildTie` (matching `row_number() ... ORDER BY ts ASC, tie ASC
    * = 1`).
    *
    * Nulls (the asofJoin:41-46 policy, forward twin): null-ts/null-key
    * build rows are dropped; null-ts/null-key probe rows are routed
    * AROUND the merge and emitted unmatched — in an ascending sort
    * they would otherwise land before every build row and the forward
    * frame would hand them the first build of the whole key.
    */
  def asofJoinForward(build: DataFrame, probe: DataFrame, key: String,
                      buildTs: String, probeTs: String,
                      buildTie: String): DataFrame = {
    val carryCols = build.columns.filterNot(_ == key).toSeq
    val probeCols = probe.columns.filterNot(_ == key).toSeq
    val carryT = build.select(struct(carryCols.map(col): _*).as("s"))
      .schema("s").dataType
    val probeT = probe.select(struct(probeCols.map(col): _*).as("s"))
      .schema("s").dataType
    val b = build.filter(col(buildTs).isNotNull && col(key).isNotNull)
      .select(
        col(key), col(buildTs).as("__ts"), lit(1).as("__side"),
        col(buildTie).cast("long").as("__tie"),
        struct(carryCols.map(col): _*).as("__carry"),
        lit(null).cast(probeT).as("__probe"))
    val p = probe.filter(col(probeTs).isNotNull && col(key).isNotNull)
      .select(
        col(key), col(probeTs).as("__ts"), lit(0).as("__side"),
        lit(Long.MinValue).as("__tie"),
        lit(null).cast(carryT).as("__carry"),
        struct(probeCols.map(col): _*).as("__probe"))
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val matched = b.unionByName(p)
      .withColumn("__match",
        first(col("__carry"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(col(key) +:
        (probeCols.map(c => col("__probe." + c).as(c)) ++
          carryCols.map(c => col("__match." + c).as(c))): _*)
    val carryFields = carryT
      .asInstanceOf[org.apache.spark.sql.types.StructType].fields
    val unmatched = probe
      .filter(col(probeTs).isNull || col(key).isNull)
      .select(col(key) +: (probeCols.map(col) ++
        carryFields.toSeq.map(f =>
          lit(null).cast(f.dataType).as(f.name))): _*)
    matched.unionByName(unmatched)
  }

  /** Time-proximity self range-join: for every row, the number of OTHER
    * rows (any key) within ±`windowSec` seconds — rows with no neighbor
    * report 0.
    *
    * Shape: bucket timestamps into `windowSec`-wide integer buckets;
    * the probe side explodes into its bucket and both adjacent buckets,
    * equi-joins on the bucket, then post-filters the exact |Δt| bound.
    * Any pair within the window spans at most one bucket boundary, so
    * every true pair is produced exactly once (the probe's three
    * exploded buckets are distinct). Cost: 3× row replication + an
    * equi-shuffle whose matching work is proportional to true bucket
    * co-residency — vs |n|² comparisons for the inequality self-join
    * the DuckDB oracle runs.
    *
    * Hot buckets (burst traffic) are the skew risk at scale: one
    * reducer receives a whole burst's bucket. Mitigation is WIRED IN:
    * one map-side-combined pre-aggregation counts rows per bucket, and
    * buckets above `hotBucketThreshold` take the salted path
    * (`Skew.saltedJoin`: build rows split across `saltBuckets`
    * reducers by a deterministic id-hash salt, probe rows replicated
    * per salt) while the cold majority joins plain — the explicit
    * two-path skew join, paying replication only where the burst is.
    * Every pair still meets exactly once: a build row holds ONE salt,
    * and hot/cold route by the same literal bucket set on both sides
    * (resolved at plan-build time, so the no-burst common case keeps
    * the plain single-join plan). `idCol` must be unique: self-pairs
    * are excluded by id equality.
    *
    * NOTE — eager census: for a BATCH input this call runs one small
    * Spark job BEFORE returning (the hot-bucket count over `ev`), so
    * plan composition is not fully lazy here and `ev` is scanned
    * twice per call (once by the census — map-side combined, (id, ts)
    * columns only — and once by the returned plan). Callers for whom
    * the extra scan matters should pass a cached or checkpointed
    * `ev`; streaming inputs skip the census entirely.
    */
  /** NEAREST as-of join: for every probe row, the single build row
    * with the same key minimizing |buildTs − probeTs| — the third
    * member of the temporal-join family ([[asofJoin]] = latest at or
    * before, [[asofJoinForward]] = earliest at or after): sensor
    * alignment, "closest quote to the trade", nearest-snapshot
    * enrichment, where direction doesn't matter but distance does.
    *
    * Composed from the two PROVEN one-shuffle merge kernels — one
    * backward pass, one forward pass, then a probe-id-keyed decision
    * join picking the smaller |Δt| (exact integer micros; tie → the
    * BACKWARD match, the "no peeking into the future unless strictly
    * closer" convention). Each pass is the documented merge shape (no
    * inequality join anywhere); the decision join is key-parallel.
    * `probeId` must be unique per probe row. Output: probe columns,
    * matched build columns, `direction` ('backward'/'forward'/null),
    * `delta_us`.
    */
  def asofJoinNearest(build: DataFrame, probe: DataFrame, key: String,
                      buildTs: String, probeTs: String,
                      buildTie: String, probeId: String): DataFrame = {
    val carry = build.columns.filterNot(_ == key).toSeq
    val back = asofJoin(build, probe, key, buildTs, probeTs, buildTie)
      .select(col(probeId).as("__pid") +:
        carry.map(c => col(c).as(s"__b_$c")): _*)
    val fwd = asofJoinForward(build, probe, key, buildTs, probeTs,
        buildTie)
      .select(col(probeId).as("__pid") +:
        carry.map(c => col(c).as(s"__f_$c")): _*)
    val db = unix_micros(col(probeTs)) - unix_micros(col(s"__b_$buildTs"))
    val df_ = unix_micros(col(s"__f_$buildTs")) - unix_micros(col(probeTs))
    val useBack = col(s"__f_$buildTs").isNull ||
      (col(s"__b_$buildTs").isNotNull && db <= df_)
    probe
      .join(back, col(probeId) === back("__pid"), "left")
      .drop("__pid")
      .join(fwd, col(probeId) === fwd("__pid"), "left")
      .drop("__pid")
      .select(probe.columns.map(col) ++
        carry.map(c => when(useBack, col(s"__b_$c"))
          .otherwise(col(s"__f_$c")).as(c)) :+
        when(col(s"__b_$buildTs").isNull && col(s"__f_$buildTs").isNull,
          lit(null).cast("string"))
          .when(useBack, lit("backward")).otherwise(lit("forward"))
          .as("direction") :+
        when(useBack, db).otherwise(df_).as("delta_us"): _*)
  }

  def timeProximityCount(ev: DataFrame, idCol: String, tsCol: String,
                         windowSec: Int,
                         hotBucketThreshold: Long = 4000000L,
                         saltBuckets: Int = 8): DataFrame = {
    require(windowSec > 0,
      s"windowSec must be positive (got $windowSec): a 0-width bucket " +
        "divides by zero; for simultaneous-only pairing use windowSec=1 " +
        "and an exact-equality post-filter")
    val w = windowSec * 1000000L
    val base = ev.select(col(idCol), unix_micros(col(tsCol)).as("__us"))
    // integer floor-division bucketing (µs are nonneg; SQL `div` avoids
    // the double rounding a `/`+floor chain risks near boundaries)
    val bucket = expr(s"__us div ${w}L")
    val build = base.select(col(idCol).as("__bid"),
      col("__us").as("__bus"), bucket.as("__bucket"))
    val probe = base.select(col(idCol), col("__us"),
      explode(array(bucket - 1, bucket, bucket + 1)).as("__bucket"))
    // hot-bucket census, resolved at PLAN-BUILD time (the
    // trainCentroids discipline): #hot <= n/threshold by definition,
    // so the collected id set is tiny, and the COMMON case — no hot
    // bucket — keeps the plain single-join plan with zero overhead.
    // The two-path split only enters the plan when a burst exists.
    val hotIds: Seq[Long] =
      if (saltBuckets <= 1 || ev.isStreaming) Seq.empty
      else {
        // hottest-first so a cap (defensive; #hot <= n/threshold, so
        // reaching it means a degenerate threshold) drops the LEAST
        // hot buckets deterministically, and the drop is logged
        val hot = base.groupBy(bucket.as("__bucket"))
          .agg(count(lit(1)).as("__bn"))
          .filter(col("__bn") > hotBucketThreshold)
          .orderBy(col("__bn").desc, col("__bucket"))
          .limit(10001)
          .collect().map(_.getLong(0)).toSeq
        if (hot.size > 10000)
          logWarning("timeProximityCount: over 10000 hot buckets — " +
            "salting only the hottest 10000; raise hotBucketThreshold")
        hot.take(10000)
      }
    val joined =
      if (hotIds.isEmpty) probe.join(build, Seq("__bucket"))
      else {
        // routing both sides by the SAME literal set keeps the two
        // paths disjoint and exhaustive
        val isHot = col("__bucket").isin(hotIds: _*)
        val cold = probe.filter(!isHot).join(build.filter(!isHot),
          Seq("__bucket"))
        val hotJ = Skew.saltedJoin(build.filter(isHot),
          probe.filter(isHot),
          "__bucket", saltBy = "__bid", saltBuckets = saltBuckets)
        cold.unionByName(hotJ)
      }
    val counts = joined
      .filter(col("__bid") =!= col(idCol) &&
        abs(col("__bus") - col("__us")) <= w)
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_concurrent"))
    base.select(col(idCol)).join(counts, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_concurrent"), lit(0L)).as("n_concurrent"))
  }

  /** General two-sided interval overlap join (closed intervals): every
    * (a, b) pair with `a.start <= b.end AND b.start <= a.end`, each
    * produced exactly once.
    *
    * Both sides explode into the `bucketSec`-wide buckets their
    * interval covers and equi-join on the bucket. A pair may share
    * many buckets, so it is emitted only in the FIRST bucket both
    * intervals cover — `greatest(bucket(a.start), bucket(b.start))`,
    * which overlap guarantees both sides contain — eliminating the
    * post-join `distinct` the naive bucketing pays (a full extra
    * shuffle of the matched stream). Explode factor is
    * interval-length/bucketSec + 1: pick `bucketSec` near the typical
    * interval length. Cost: one equi-shuffle proportional to covered
    * buckets, vs the |a|×|b| inequality (nested-loop) join the DuckDB
    * oracle runs.
    *
    * Column contract: interval bounds are timestamp columns; the two
    * sides' column names must be disjoint.
    *
    * Nulls and malformed intervals (the asofJoin:41-46 discipline): a
    * row with a null start or end, or with end < start (an empty
    * closed interval), is DROPPED from its side — an unbounded or
    * empty interval has no well-defined overlap set, and the
    * alternative (letting `sequence(null, …)` null out the explode)
    * silently produced the same drop for nulls while an inverted
    * interval could still leak pathological matches. The filter makes
    * the policy explicit, uniform, and testable: only well-formed
    * closed intervals participate.
    */
  /** Point-in-time join (the feature-store-correctness join of
    * Feast/Tecton): each fact row joins the SCD2 dimension VERSION
    * that was valid at the fact's timestamp — so training features
    * can never leak a future dimension update into a past example.
    *
    * `versions` is [[graft.ops.Relational.scdType2]] output (or any
    * frame with `valid_from` + `version_n` tiling each key's
    * timeline). Because versions tile time, "valid at ts" ≡ "latest
    * version with valid_from ≤ ts" — so this is ONE backward as-of
    * join (merge-shaped, one shuffle on the key), never an interval
    * range join: at equal valid_from the higher version_n wins (the
    * tie a zero-length superseded version must lose), and facts
    * before a key's first version emit with null feature columns.
    * The DuckDB oracle runs the interval formulation
    * (valid_from ≤ ts < valid_to) and hash-matches — the equivalence
    * proof that the merge shape is the right plan.
    */
  def pointInTimeJoin(versions: DataFrame, facts: DataFrame,
                      key: String, factTs: String): DataFrame =
    asofJoin(versions.drop("valid_to", "is_current"), facts, key,
      "valid_from", factTs, "version_n")

  def intervalJoin(a: DataFrame, b: DataFrame,
                   aStart: String, aEnd: String,
                   bStart: String, bEnd: String,
                   bucketSec: Long = 3600L): DataFrame = {
    val w = bucketSec * 1000000L
    def wellFormed(df: DataFrame, s: String, e: String) =
      df.filter(col(s).isNotNull && col(e).isNotNull && col(s) <= col(e))
    def buckets(s: String, e: String) =
      sequence(expr(s"unix_micros($s) div ${w}L"),
        expr(s"unix_micros($e) div ${w}L"))
    val ae = wellFormed(a, aStart, aEnd)
      .withColumn("__a_sb", expr(s"unix_micros($aStart) div ${w}L"))
      .withColumn("__bucket", explode(buckets(aStart, aEnd)))
    val be = wellFormed(b, bStart, bEnd)
      .withColumn("__b_sb", expr(s"unix_micros($bStart) div ${w}L"))
      .withColumn("__bucket", explode(buckets(bStart, bEnd)))
    ae.join(be, Seq("__bucket"))
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd) &&
        col("__bucket") === greatest(col("__a_sb"), col("__b_sb")))
      .drop("__bucket", "__a_sb", "__b_sb")
  }
}
