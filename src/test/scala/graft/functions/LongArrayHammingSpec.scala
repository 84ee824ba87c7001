package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LongArrayHammingSpec extends SparkSpec {
  import spark.implicits._

  test("differential vs the built-in bit_count(xor) composition") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 300).map { _ =>
      (Seq.fill(4)(rnd.nextLong()), Seq.fill(4)(rnd.nextLong()))
    }.toDF("a", "b")
    val diff = rows.select(
      LongArrayHamming(col("a"), col("b")).as("got"),
      expr("""CAST(bit_count(a[0] ^ b[0]) + bit_count(a[1] ^ b[1])
             |+ bit_count(a[2] ^ b[2]) + bit_count(a[3] ^ b[3]) AS BIGINT)"""
        .stripMargin).as("want"))
      .filter(col("got") =!= col("want"))
    assert(diff.count() == 0)
  }

  test("identity, disjoint prefix, null element") {
    val got = Seq(
      (Seq(5L, 7L), Seq(5L, 7L)),        // identical -> 0
      (Seq(0L), Seq(-1L, 123L)),         // common prefix only -> 64
      (Seq(1L, 3L), Seq(1L))             // shorter right -> prefix of 1
    ).toDF("a", "b")
      .select(LongArrayHamming(col("a"), col("b"))).as[Long]
      .collect().toSeq
    assert(got == Seq(0L, 64L, 0L))
    val withNull = Seq((Seq(Some(1L), None), Seq(Some(1L), Some(2L))))
      .toDF("a", "b")
      .select(LongArrayHamming(col("a"), col("b"))).as[Option[Long]]
      .collect().head
    assert(withNull.isEmpty, "null signature word must null the distance")
  }

  test("available from SQL and codegen-fused") {
    graft.GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT long_array_hamming(array(0L), array(15L)) AS h"
    ).collect()(0).getLong(0)
    assert(got == 4L)
  }
}
