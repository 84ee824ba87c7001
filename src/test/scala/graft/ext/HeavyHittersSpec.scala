package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("guarantee: items above n/capacity always survive the sketch") {
    // 10k rows: "hot" appears 3000 times (30%), the rest spread thin
    val rnd = new scala.util.Random(7)
    val data = Seq.fill(3000)("hot") ++
      (1 to 7000).map(_ => s"cold${rnd.nextInt(2000)}")
    val ds = spark.sparkContext.parallelize(data, 8).toDS()
    val agg = new HeavyHitters(capacity = 50).toColumn
    val result = ds.select(agg).collect()(0)
    val items = result.map(_._1).toSet
    assert(items.contains("hot"), s"heavy hitter lost: $items")
    // undercount bounded by n/capacity
    val est = result.toMap.apply("hot")
    assert(est >= 3000 - 10000 / 50 && est <= 3000, s"estimate $est")
  }

  test("tokens of the fixture corpus: all true heavy tokens found") {
    val toks = graft.Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("t")).as[String]
    val n = toks.count()
    val exact = toks.groupBy("t").count()
      .filter(col("count") > n / 30).as[(String, Long)].collect().toMap
    val sketch = toks.select(new HeavyHitters(30).toColumn).collect()(0)
      .map(_._1).toSet
    assert(exact.keySet.subsetOf(sketch),
      s"missing: ${exact.keySet.diff(sketch)}")
  }

  test("streaming: sketch state carries the guarantee across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Int, String)]
    val agg = new HeavyHitters(capacity = 40).toColumn
    val q = mem.toDS().groupByKey(_._1).mapValues(_._2).agg(agg)
      .writeStream.format("memory").queryName("hh_out")
      .outputMode("complete").start()
    try {
      val rnd = new scala.util.Random(13)
      def misc(n: Int) = (1 to n).map(_ => (1, s"cold${rnd.nextInt(500)}"))
      mem.addData(Seq.fill(600)((1, "hot")) ++ misc(400): _*)
      q.processAllAvailable()
      mem.addData(Seq.fill(400)((1, "hot")) ++ misc(600): _*)
      q.processAllAvailable()
      val sketch = spark.table("hh_out").as[(Int, Seq[(String, Long)])]
        .collect().head._2
      // n=2000, capacity=40: anything with true freq > 50 must survive,
      // estimates undercount by at most n/capacity
      assert(sketch.head._1 == "hot")
      assert(sketch.head._2 >= 1000L - 2000L / 40)
    } finally q.stop()
  }

  test("merge of two full disjoint buffers prunes back to capacity") {
    val hh = new HeavyHitters(8)
    val b1 = (1 to 8).map(i => s"a$i" -> 5L).toMap
    val b2 = (1 to 8).map(i => s"b$i" -> 5L).toMap
    assert(hh.merge(b1, b2).size <= 8)
  }
}
