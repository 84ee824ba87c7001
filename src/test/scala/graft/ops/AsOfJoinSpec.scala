package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

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

  test("differential: leftAsOf equals naive range-join argmax on random data") {
    val rnd = new scala.util.Random(42)
    val lftRows = (1 to 300).map(i =>
      (i.toLong, s"k${rnd.nextInt(8)}", t(rnd.nextInt(1000))))
    val rgtRows = (1 to 150).map(i =>
      (s"k${rnd.nextInt(10)}", t(rnd.nextInt(1000)), i.toDouble))
      .distinct
    // unique (k, ts) on the right so the as-of row is well-defined
    val rgtUnique = rgtRows.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val l = lftRows.toDF("id", "k", "ts")
    val r = rgtUnique.toDF("k", "ts", "v")
    val got = AsOfJoin.leftAsOf(l, r, Seq("k"), "ts", Seq("v"))
      .select("id", "asof_v").as[(Long, Option[Double])].collect().toMap
    // naive: for each left row, the right row with max ts <= left ts
    val rightByKey = rgtUnique.groupBy(_._1)
    val want = lftRows.map { case (id, k, ts) =>
      id -> rightByKey.getOrElse(k, Seq.empty)
        .filter(!_._2.after(ts))
        .sortBy(_._2.getTime).lastOption.map(_._3)
    }.toMap
    assert(got == want)
  }

  test("forward: earliest right at-or-after, differential vs naive") {
    val rnd = new scala.util.Random(59)
    val l2 = (1 to 200).map(i =>
      (i.toLong, s"u${rnd.nextInt(5)}", t(rnd.nextInt(500)))).toDF("id", "k", "ts")
    val r2 = (1 to 100).map(i =>
      (s"u${rnd.nextInt(5)}", t(rnd.nextInt(500) + 1), rnd.nextInt(1000).toDouble))
      .toDF("k", "ts", "v") // ranges overlap: equal left/right ts DO occur,
      // exercising the inclusive >= path (both sides use min-struct ties)
    val got = AsOfJoin.leftAsOfForward(l2, r2, Seq("k"), "ts", Seq("v"))
      .select("id", "asof_ts", "asof_v")
      .as[(Long, Option[Timestamp], Option[Double])].collect().toSet
    val naive = l2.as("l").join(r2.as("r"),
        col("l.k") === col("r.k") && col("r.ts") >= col("l.ts"), "left")
      .groupBy(col("l.id").as("id"))
      .agg(min(struct(col("r.ts"), col("r.v"))).as("m"))
      .select(col("id"), col("m.ts").as("asof_ts"), col("m.v").as("asof_v"))
      .as[(Long, Option[Timestamp], Option[Double])].collect().toSet
    assert(got == naive)
  }

  test("forward: left row with NULL timestamp matches nothing") {
    val l2 = Seq((1L, "u", None: Option[Timestamp]), (2L, "u", Some(t(5))))
      .toDF("id", "k", "ts")
    val r2 = Seq(("u", t(10), 5.0)).toDF("k", "ts", "v")
    val got = AsOfJoin.leftAsOfForward(l2, r2, Seq("k"), "ts", Seq("v"))
      .select("id", "asof_v").as[(Long, Option[Double])].collect().toMap
    // rightTs >= NULL is undefined: the null-ts left row must stay
    // unmatched (it would grab the whole partition under desc nulls-last)
    assert(got == Map(1L -> None, 2L -> Some(5.0)))
  }

  test("forward: right row at exactly leftTs matches (inclusive)") {
    val l2 = Seq((1L, "u", t(30))).toDF("id", "k", "ts")
    val r2 = Seq(("u", t(30), 7.0), ("u", t(40), 9.0)).toDF("k", "ts", "v")
    val v = AsOfJoin.leftAsOfForward(l2, r2, Seq("k"), "ts", Seq("v"))
      .select("asof_v").as[Double].head()
    assert(v == 7.0)
  }

  test("right rows with NULL timestamp never match (rightTs <= leftTs undefined)") {
    val l2 = Seq((1L, "u", t(30))).toDF("id", "k", "ts")
    val r2 = Seq(("u", None: Option[Timestamp], 99.0), ("u", Some(t(10)), 5.0))
      .toDF("k", "ts", "v")
    val row = AsOfJoin.leftAsOf(l2, r2, Seq("k"), "ts", Seq("v"))
      .select("asof_v").as[Option[Double]].collect()(0)
    // the null-ts row must NOT be forward-filled; t10 wins
    assert(row.contains(5.0))
  }

  test("right row with null value is carried atomically (no column mixing)") {
    val l2 = Seq((1L, "u", t(30))).toDF("id", "k", "ts")
    val r2 = Seq(("u", t(10), Some(5.0)), ("u", t(20), None: Option[Double]))
      .toDF("k", "ts", "v")
    val row = AsOfJoin.leftAsOf(l2, r2, Seq("k"), "ts", Seq("v"))
      .select("asof_ts", "asof_v")
      .as[(Option[java.sql.Timestamp], Option[Double])].collect()(0)
    // most recent right row is (t20, null) — both fields from THAT row
    assert(row._1.contains(t(20)) && row._2.isEmpty, row.toString)
  }
}
