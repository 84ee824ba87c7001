package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def hashed(n: Int, group: String) =
    (1 to n).map(i => (group, s"$group-tok-$i")).toDF("g", "t")
      .select(col("g"), TextAnalysis.tokenHash31(col("t")).as("h"))

  test("exact below k; estimate within 20% above k") {
    val df = hashed(40, "small").union(hashed(5000, "big"))
    val got = Sketches.kmvDistinct(df, Seq("g"), "h", 256)
      .select("g", "est_distinct").as[(String, Double)].collect().toMap
    assert(got("small") == 40.0)
    assert(math.abs(got("big") - 5000) / 5000.0 < 0.2, s"est=${got("big")}")
  }

  test("partition independence: same estimate at any parallelism") {
    val df = hashed(3000, "g")
    val ests = Seq(1, 3, 16).map { p =>
      Sketches.kmvDistinct(df.repartition(p), Seq("g"), "h", 128)
        .select("est_distinct").as[Double].head()
    }
    assert(ests.distinct.size == 1)
  }

  test("aggregator matches the DataFrame form and merges losslessly") {
    val vals = hashed(2000, "g").select("h").as[Long].collect()
    val k = 64
    val wantKth = vals.distinct.sorted.take(k).last
    val agg = new Sketches.KmvAggregator(k)
    // split into chunks, reduce each, merge in arbitrary order
    val chunks = vals.grouped(137).toSeq
    val sketches = chunks.map(c => c.foldLeft(agg.zero)(agg.reduce))
    val merged = scala.util.Random.shuffle(sketches)
      .foldLeft(agg.zero)(agg.merge)
    assert(merged.values.last == wantKth)
    val dfEst = Sketches.kmvDistinct(hashed(2000, "g"), Seq("g"), "h", k)
      .select("est_distinct").as[Double].head()
    assert(agg.finish(merged) == dfEst)
  }

  test("KmvBuf: the mutable buffer reproduces the immutable Kmv fold " +
    "exactly, and the shared zero is never mutated") {
    val agg = new Sketches.KmvAggregator(16)
    val z = agg.zero
    val vals = Seq.tabulate(500)(i => (i * 2654435761L) % 2147483647L)
    val buf = vals.foldLeft(z)(agg.reduce)
    val imm = vals.foldLeft(Sketches.Kmv(16, Vector.empty))(_ insert _)
    assert(buf.values == imm.values, s"${buf.values} vs ${imm.values}")
    assert(agg.finish(buf) == imm.estimate)
    // the zero seeded that fold and must still be empty (copy-on-first-
    // write) — two further folds from the SAME zero stay independent
    assert(z.n == 0 && z.arr.isEmpty, "zero must survive folds unmutated")
    val b1 = Seq(5L, 1L, 9L).foldLeft(z)(agg.reduce)
    val b2 = Seq(7L, 3L).foldLeft(z)(agg.reduce)
    assert(b1.values == Seq(1L, 5L, 9L) && b2.values == Seq(3L, 7L),
      s"${b1.values} / ${b2.values}")
  }

  test("streaming: sketch accumulates across micro-batches (mergeable state)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val kmvUdaf = udaf(new Sketches.KmvAggregator(32))
    val q = mem.toDF().toDF("g", "h")
      .groupBy("g").agg(kmvUdaf(col("h")).as("est"))
      .writeStream.format("memory").queryName("kmv_out")
      .outputMode("complete").start()
    try {
      val hs = hashed(500, "g").select("h").as[Long].collect()
      mem.addData(hs.take(250).map(("g", _)).toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(hs.drop(250).map(("g", _)).toIndexedSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("kmv_out").select("est").as[Double].head()
      val batch = Sketches.kmvDistinct(hashed(500, "g"), Seq("g"), "h", 32)
        .select("est_distinct").as[Double].head()
      assert(streamed == batch) // incremental state == one-shot bottom-k
    } finally q.stop()
  }

  test("set algebra: exact Jaccard/intersection below k, close above") {
    def sketchOf(tokens: Seq[String], k: Int = 256): Sketches.Kmv =
      tokens.toDF("t").select(TextAnalysis.tokenHash31(col("t")))
        .as[Long].collect()
        .foldLeft(Sketches.Kmv(k, Vector.empty))(_ insert _)
    // small sets (both fit under k): estimates are EXACT
    val a = sketchOf((1 to 30).map(i => s"tok-$i"))
    val b = sketchOf((21 to 50).map(i => s"tok-$i"))
    assert(a.jaccardEstimate(b) == 10.0 / 50.0)
    assert(a.intersectionEstimate(b) == 10.0)
    assert(a.jaccardEstimate(b) == b.jaccardEstimate(a), "symmetric")
    // disjoint and identical edge cases
    val c = sketchOf((100 to 120).map(i => s"other-$i"))
    assert(a.jaccardEstimate(c) == 0.0)
    assert(a.jaccardEstimate(a) == 1.0)
    assert(Sketches.Kmv(16, Vector.empty)
      .jaccardEstimate(Sketches.Kmv(16, Vector.empty)) == 0.0)
    // large overlapping sets (beyond k): estimate within tolerance
    val big1 = sketchOf((1 to 2000).map(i => s"big-$i"), k = 128)
    val big2 = sketchOf((1001 to 3000).map(i => s"big-$i"), k = 128)
    val trueJ = 1000.0 / 3000.0
    val estJ = big1.jaccardEstimate(big2)
    assert(math.abs(estJ - trueJ) < 0.15, s"J est $estJ vs $trueJ")
    val estI = big1.intersectionEstimate(big2)
    assert(math.abs(estI - 1000.0) / 1000.0 < 0.5, s"∩ est $estI vs 1000")
  }

  test("duplicate values do not perturb the sketch") {
    val agg = new Sketches.KmvAggregator(8)
    val a = Seq(5L, 3L, 9L, 3L, 5L, 1L).foldLeft(agg.zero)(agg.reduce)
    val b = Seq(1L, 3L, 5L, 9L).foldLeft(agg.zero)(agg.reduce)
    assert(a == b)
  }

  private def rowHash(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).take(8)
      .map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % 2147483647L
  }

  test("quantile sketch: exact below k, nearest-rank semantics") {
    val agg = new Sketches.QuantileSketchAggregator(64)
    val rows = (1 to 50).map(i => (rowHash(s"id-$i"), i.toDouble))
    val s = rows.foldLeft(agg.zero)(agg.reduce)
    assert(s.vals.size == 50, "below k keeps every row")
    assert(s.quantile(0.5) == 25.0)   // ceil(0.5*50)-1 = idx 24
    assert(s.quantile(0.0) == 1.0 && s.quantile(1.0) == 50.0)
  }

  test("quantile sketch: merge law — any split reduces to the whole") {
    val agg = new Sketches.QuantileSketchAggregator(16)
    val rows = (1 to 200).map(i => (rowHash(s"doc-$i"), (i * 7 % 101).toDouble))
    val whole = rows.foldLeft(agg.zero)(agg.reduce)
    val (l, r) = rows.splitAt(67)
    val split = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(whole == split, "bottom-k of union == merge of bottom-ks")
    val rev = rows.reverse.foldLeft(agg.zero)(agg.reduce)
    assert(whole == rev, "arrival order must not matter")
  }

  test("quantile sketch tracks the exact median on the fixture corpus") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
    val pairs = docs.select(
      graft.ext.TextAnalysis.tokenHash31(col("doc_id").cast("string")),
      col("n_chars").cast("double")).as[(Long, Double)]
    val agg = new Sketches.QuantileSketchAggregator(256)
    val sketch = pairs.select(
      agg.toColumn.name("s")).as[Sketches.QuantileSample].collect().head
    val exact = docs.selectExpr("percentile(n_chars, 0.5)")
      .as[Double].collect().head
    val est = sketch.quantile(0.5)
    assert(math.abs(est - exact) / exact < 0.15,
      s"median est $est vs exact $exact")
  }

  test("count-min: estimates never undercount, exact when rows agree, " +
    "aggregator == DataFrame build") {
    val items = Seq.tabulate(2000)(i => (i % 37).toLong * 104729L)
    val df = items.toDF("h")
    val truth = items.groupBy(identity).map { case (h, xs) =>
      h -> xs.size.toLong }
    val cells = Sketches.cmsCounters(df, "h", d = 4, w = 64)
      .as[(Long, Long, Long)].collect()
      .map { case (j, i, c) => (j, i) -> c }.toMap
    // rebuild a Cms from the DataFrame cells and compare to the typed
    // aggregator over the same stream
    val viaAgg = df.as[Long].select(
      new Sketches.CmsAggregator(4, 64).toColumn.name("s"))
      .as[Sketches.Cms].collect().head
    val viaDf = Sketches.Cms(4, 64,
      Vector.tabulate(4 * 64)(k =>
        cells.getOrElse((k / 64.toLong, k % 64.toLong), 0L)))
    assert(viaAgg == viaDf, "aggregator and DataFrame builds must agree")
    for ((h, n) <- truth) {
      val est = viaAgg.estimate(h)
      assert(est >= n, s"CMS must never undercount: h=$h true=$n est=$est")
    }
    // row-agreement: with 37 distinct items in w=64 columns some row
    // may collide, but the MIN across 4 independent rows is exact here
    assert(truth.forall { case (h, n) => viaAgg.estimate(h) == n },
      "4x64 sketch should resolve 37 distinct items exactly")
    // merge law: split the stream, merge the halves
    val (l, r) = items.splitAt(997)
    val merged = l.foldLeft(new Sketches.CmsAggregator(4, 64).zero)(_.add(_))
      .merge(r.foldLeft(new Sketches.CmsAggregator(4, 64).zero)(_.add(_)))
    assert(merged == viaAgg, "merge of split halves must equal the whole")
  }

  test("joinKeyOverlap: exact set algebra below k; multiplicity on " +
    "either side never biases the estimate") {
    import spark.implicits._
    // A = 1..10, B = 6..20: |A∩B| = 5, |A∪B| = 20 — under k, so the
    // estimates are EXACT
    val a = (1 to 10).map(_.toLong).toDF("ka")
    // row multiplicity must not matter: repeat every B key 3x
    val b = (6 to 20).flatMap(v => Seq.fill(3)(v.toLong)).toDF("kb")
    val got = Sketches.joinKeyOverlap(a, "ka", b, "kb", k = 64)
      .as[(Long, Long, Long, Double, Double, Double)].collect().head
    assert(got._1 == 20L && got._3 == 5L, got.toString)
    assert(got._4 == 5.0 / 20 && got._5 == 20.0, got.toString)
    assert(got._6 == 5.0 / 20 * 20.0, "intersection = jaccard x union")
    // disjoint sides: zero overlap, union still counts both
    val c = (100 to 104).map(_.toLong).toDF("kc")
    val dj = Sketches.joinKeyOverlap(a, "ka", c, "kc", k = 64)
      .as[(Long, Long, Long, Double, Double, Double)].collect().head
    assert(dj._3 == 0L && dj._4 == 0.0 && dj._6 == 0.0, dj.toString)
  }
}
