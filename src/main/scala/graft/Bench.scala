package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // same TZ as Verify: window/bucket boundaries on event timestamps
      // are session-TZ-dependent — the bench must time the SAME plans
      // the correctness gate verifies
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // managed (bucketed) tables land in tmp, never in the repo tree
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse")
      .getOrCreate()
    // ERROR, not WARN: executor-thread WARNs land on stderr interleaved
    // with stdout in the harness capture and can push the result line out
    // of its 2000-char tail window
    spark.sparkContext.setLogLevel("ERROR")
    // surface fixture schema drift up front with one named diff (see
    // Tables.validate), then continue: per-query errors land in the
    // explicit `errored` list, and the stderr report explains them
    try Tables.validate(spark, sfDir)
    catch { case e: IllegalStateException =>
      System.err.println(s"[bench] SCHEMA CONTRACT: ${e.getMessage}")
    }
    // warm the session (codegen, FileSourceStrategy, shuffle machinery)
    // so the first measured query doesn't absorb ~4s of infra startup
    spark.range(1000).selectExpr("sum(id)").collect()
    SparkEntry.queries.headOption.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // Median-of-3 per query: single-run timing on a shared box produced a
    // spurious 1.5x total in one round (untouched queries "regressing" 7x
    // from environment noise alone). Three runs with a per-query median is
    // robust to a one-off GC pause / CPU steal spike while keeping the
    // bench under ~4 minutes at sf0.1.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val sampled = SparkEntry.queries.map { case (name, fn) =>
      // noop sink forces FULL evaluation of every projected column and
      // keeps the final sort — count() would let Catalyst prune the
      // projection and drop the ORDER BY, timing a near-empty plan
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); None }
        finally
          // cache hygiene: queries that persist() an internal stage
          // (pqTopK's slice table, the crawl flagship's survivors) hand
          // the cache entry's lifetime to the caller — the harness IS
          // that caller, and dropping it here keeps one query's cached
          // tables from occupying executor memory (or worse, serving)
          // during the next query's timing
          spark.catalog.clearCache()
      }
      name -> times
    }
    // errored queries are carried as an explicit name list, never as a
    // sentinel inside the timing map — `value` always equals the sum of
    // the detail file's `queries` map (the stdout line's map is a
    // labeled slowest-30 slice; see its own comment below)
    val errored = sampled.collect { case (name, ts) if ts.isEmpty => name }
    val results = sampled.collect { case (name, times) if times.nonEmpty =>
      name -> times.sorted.apply(times.size / 2)
    }
    def fmt(v: Double): String = f"$v%.3f"
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // Regression gate: diff this run's per-query medians against the
    // PREVIOUS round's full detail artifact (committed BENCH_DETAIL.json
    // by default — read it BEFORE this run overwrites the file; override
    // with SPARK_GRAFT_PREV_BENCH). A query is flagged when it is both
    // >1.5x its previous median AND >0.5s absolutely slower — the
    // absolute floor keeps sub-second noise-band queries from crying
    // wolf. Flags land in-artifact (a `regressions` key on BOTH output
    // lines) so a regression surfaces at bench time, not at judge time.
    val prevPath = sys.env.getOrElse("SPARK_GRAFT_PREV_BENCH",
      "BENCH_DETAIL.json")
    val prevMedians: Map[String, Double] = try {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(prevPath)), "UTF-8")
      // a previous artifact from a DIFFERENT scale factor would
      // mass-flag bogus regressions (every sf0.1 median beats an
      // sf0.01 one by >1.5x) — compare like with like or not at all
      val prevSf = """"sf":"([^"]*)"""".r.findFirstMatchIn(txt)
        .map(_.group(1))
      if (!prevSf.contains(sfDir)) {
        if (prevSf.isDefined)
          System.err.println(s"[bench] regression gate skipped: previous " +
            s"artifact is ${prevSf.get}, this run is $sfDir")
        Map.empty
      } else {
        val key = "\"queries\":{"
        val seg = txt.indexOf(key)
        if (seg < 0) Map.empty
        else {
          val start = seg + key.length
          val body = txt.substring(start, txt.indexOf("}", start))
          """"([A-Za-z0-9_]+)":([0-9.eE+\-]+)""".r.findAllMatchIn(body)
            .map(m => m.group(1) -> m.group(2).toDouble).toMap
        }
      }
    } catch { case _: Throwable => Map.empty }
    val regressions = results.toSeq
      .flatMap { case (n, cur) => prevMedians.get(n)
        .filter(p => cur > p * 1.5 && cur - p > 0.5)
        .map(p => (n, p, cur)) }
      .sortBy { case (_, p, c) => p - c }
    regressions.foreach { case (n, p, c) =>
      System.err.println(s"[bench] REGRESSION $n: ${fmt(p)} -> ${fmt(c)}") }
    val regressionsJson = regressions.take(10)
      .map { case (n, p, c) => "\"" + n + "\":[" + fmt(p) + "," + fmt(c) + "]" }
      .mkString("{", ",", "}")
    // Full per-query detail goes to a file; the printed line stays under
    // the harness's 2000-char output-tail window (a full 65+-entry map is
    // ~2.9 KB and gets truncated mid-line, so the driver can't parse it).
    // The line reports the total over ALL queries plus the slowest 30.
    // The detail file carries ALL raw samples, not just the median: a
    // contaminated run (external CPU steal on a shared box) shows up as
    // min << median right in the artifact, so a slow headline number is
    // self-diagnosing without a re-run.
    val fullQs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val samplesJson = sampled.map { case (k, ts) =>
      "\"" + k + "\":[" + ts.map(fmt).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val erroredJson = errored.map("\"" + _ + "\"").mkString("[", ",", "]")
    // n_queries kept for round-over-round artifact compatibility (every
    // BENCH_r0*.json carries it; semantics unchanged: declared count);
    // invariants: n_timed == |detail queries map|; n_declared ==
    // n_timed + |errored|; detail value == sum(detail queries map)
    val counts = s""""n_queries":${sampled.size},"n_declared":${sampled.size},"n_timed":${results.size},"errored":$erroredJson"""
    val detail =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec",$counts,"regressions":$regressionsJson,"queries":$fullQs,"samples":$samplesJson,"sf":"$sfDir"}"""
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_DETAIL.json"),
      (detail + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] detail write failed: ${e.getMessage}") }
    // stdout keeps the driver-contract `queries` key but labels its scope
    // explicitly: it is the slowest-30 slice, NOT the set `value` sums —
    // the complete timed map lives in BENCH_DETAIL.json
    val slowest = results.toSeq.sortBy(-_._2).take(30)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec",$counts,"regressions":$regressionsJson,"queries_scope":"slowest_30_of_timed","queries":$slowest,"sf":"$sfDir"}""")
    spark.stop()
  }
}
