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

  test("merge of two full disjoint buffers prunes back to capacity") {
    val hh = new HeavyHitters(8)
    val b1 = (1 to 8).map(i => s"a$i" -> 5L).toMap
    val b2 = (1 to 8).map(i => s"b$i" -> 5L).toMap
    assert(hh.merge(b1, b2).size <= 8)
  }
}
