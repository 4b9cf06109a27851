package graft

import java.util.concurrent.{Executors, TimeUnit}

/** Shared-context CONCURRENT drain of the whole streaming family
  * (VERDICT r18 item 6): the sequential Bench sum is bounded below by
  * real per-row work — the per-micro-batch durationMs breakdown
  * (SPARK_GRAFT_STREAM_DBG=1) shows ~70% of each row is addBatch
  * (state-store inserts/eviction over 100–200k events) and
  * per-batch incremental re-planning, with only ~0.3 s/row of
  * start/stop lifecycle (q_stream_file_sink, the near-empty row, IS
  * ~0.3 s) — so the honest floor-cut is CONCURRENCY, not more knob
  * turning: a deployment draining N independent streaming jobs
  * co-schedules them on one SparkContext instead of serializing.
  *
  * Mechanics: each stream row runs on its own `spark.newSession()`
  * CLONE — shared SparkContext (one executor pool, one scheduler:
  * the "shared session" in the verdict's sense) but a private
  * SQLConf, so StreamRun's per-query shuffle-partition override
  * stays query-scoped instead of racing (its scaladoc's
  * single-thread assumption is exactly what the clone removes).
  * State isolation is structural, not promised: every query gets its
  * own checkpoint dir, state-store instances, and uniquely-named
  * memory sink, same as the sequential path — nothing is weakened.
  *
  * Prints ONE JSON line: sequential-sum reference (from the per-row
  * Bench contract, measured here the same way), fleet wall-clock,
  * and the speedup. Exits nonzero if any row fails or the fleet's
  * row set differs from the sequential set's results (count-level
  * check; value parity stays the Verify gate's job).
  *
  * Usage: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain
  * graft.StreamFleet"` (SPARK_GRAFT_FLEET_THREADS overrides the
  * default 8). */
object StreamFleet {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val threads = sys.env.get("SPARK_GRAFT_FLEET_THREADS")
      .flatMap(s => scala.util.Try(s.trim.toInt).toOption).getOrElse(8)
    val spark = Sessions.local("graft-streamfleet")
    val names = SparkEntry.queries.keys.filter(_.startsWith("q_stream"))
      .toSeq.sorted
    // warm EVERY row once untimed (fixture cache, codegen, per-row
    // memoized intermediates) so the sequential and fleet passes
    // below run at the same temperature — a cold sequential pass vs
    // a warm fleet pass measured 4.98×, flattered by ~2× of pure
    // warmup asymmetry
    names.foreach(n =>
      SparkEntry.queries(n)(spark.newSession(), sfDir).count())

    // sequential reference: the Bench contract's shape (one row at a
    // time, same session-clone mechanics so ONLY concurrency differs)
    val calib0 = Bench.calibMs()
    val seqT0 = System.nanoTime()
    val seqCounts = names.map { n =>
      n -> SparkEntry.queries(n)(spark.newSession(), sfDir).count()
    }.toMap
    val seqSec = (System.nanoTime() - seqT0) / 1e9

    val pool = Executors.newFixedThreadPool(threads)
    val fleetT0 = System.nanoTime()
    val futures = names.map { n =>
      n -> pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long =
          SparkEntry.queries(n)(spark.newSession(), sfDir).count()
      })
    }
    var anyErr = false
    val fleetCounts = futures.map { case (n, f) =>
      n -> (try f.get()
      catch { case e: Throwable =>
        System.err.println(s"[fleet] ERR $n: ${e.getMessage}")
        anyErr = true; -1L
      })
    }.toMap
    val fleetSec = (System.nanoTime() - fleetT0) / 1e9
    pool.shutdown()
    pool.awaitTermination(10, TimeUnit.SECONDS)
    val calib1 = Bench.calibMs()

    val mismatches = names.filter(n => seqCounts(n) != fleetCounts(n))
    mismatches.foreach(n => System.err.println(
      s"[fleet] COUNT MISMATCH $n: seq=${seqCounts(n)} " +
        s"fleet=${fleetCounts(n)}"))
    def r(s: Double) = BigDecimal(s).setScale(2,
      BigDecimal.RoundingMode.HALF_UP).toString
    println(s"""{"metric":"stream_fleet","n_rows":${names.size},""" +
      s""""threads":$threads,"calib_ms":[$calib0,$calib1],""" +
      s""""seq_sum_sec":${r(seqSec)},"fleet_wall_sec":${r(fleetSec)},""" +
      s""""speedup":${r(seqSec / math.max(fleetSec, 1e-9))},""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
    if (anyErr || mismatches.nonEmpty) sys.exit(5)
  }
}
