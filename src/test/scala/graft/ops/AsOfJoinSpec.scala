package graft.ops

import graft.SparkSpec

import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Int) = new Timestamp(s * 1000L)

  val left = Seq(
    (1L, "u1", t(10)), (2L, "u1", t(20)), (3L, "u1", t(5)),
    (4L, "u2", t(10)), (5L, "u3", t(10))
  ).toDF("id", "k", "ts")

  val right = Seq(
    ("u1", t(8), 100.0), ("u1", t(15), 200.0),
    ("u2", t(10), 300.0)                      // exactly simultaneous
  ).toDF("k", "ts", "v")

  lazy val out = AsOfJoin.leftAsOf(left, right, Seq("k"), "ts", Seq("v"))
    .select("id", "asof_v").as[(Long, Option[Double])].collect().toMap

  test("picks the most recent right row at or before the left ts") {
    assert(out(1L).contains(100.0))   // t10 -> t8
    assert(out(2L).contains(200.0))   // t20 -> t15
  }

  test("left row before any right row gets null (left-join semantics)") {
    assert(out(3L).isEmpty)           // t5, first purchase at t8
  }

  test("simultaneous right row IS visible (>= semantics)") {
    assert(out(4L).contains(300.0))   // both at t10
  }

  test("key with no right rows at all gets null") {
    assert(out(5L).isEmpty)           // u3 has no purchases
  }

  test("as-of ts column is carried alongside the value") {
    val ts = AsOfJoin.leftAsOf(left, right, Seq("k"), "ts", Seq("v"))
      .select("id", "asof_ts").as[(Long, Option[Timestamp])].collect().toMap
    assert(ts(2L).contains(t(15)) && ts(3L).isEmpty)
  }
}
