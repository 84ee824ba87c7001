package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NearestCodeSpec extends SparkSpec {
  import spark.implicits._

  /** The join-shaped assignment NearestCode replaces — the differential
    * reference: explode candidates, exact |v-c|² = |v|²+|c|²-2·v·c,
    * min-(d2, label) struct. */
  private def joinShaped(vecs: Seq[(Long, Seq[Long])],
      books: Seq[(Long, Long, Seq[Long])]): Map[Long, (Long, Long)] = {
    val out = scala.collection.mutable.Map[Long, (Long, Long)]()
    for ((id, v) <- vecs) {
      var best: Option[(Long, Long)] = None // (d2, label)
      for ((g, l, c) <- books if g == 0L) {
        val n = math.min(v.length, c.length)
        val vn = v.map(x => x * x).sum
        val cn = c.map(x => x * x).sum
        val dot = (0 until n).map(i => v(i) * c(i)).sum
        val d2 = vn + cn - 2 * dot
        val cand = (d2, l)
        if (best.isEmpty ||
          Ordering[(Long, Long)].lt(cand, best.get)) best = Some(cand)
      }
      best.foreach { case (d2, l) => out(id) = (l, d2) }
    }
    out.toMap
  }

  test("exact argmin, smallest-label ties, ragged prefixes — matches " +
    "the join-shaped reference") {
    val books = Seq(
      (0L, 0L, Seq(0L, 0L)), (0L, 1L, Seq(10L, 10L)),
      (0L, 2L, Seq(10L, 10L)), // duplicate codeword: tie -> label 1
      (0L, 3L, Seq(-5L, 7L, 9L))) // ragged: longer than the vectors
    val vecs = Seq((1L, Seq(1L, 1L)), (2L, Seq(9L, 9L)),
      (3L, Seq(10L, 10L)), (4L, Seq(-4L, 6L)))
    val want = joinShaped(vecs, books)
    val got = vecs.toDF("id", "q")
      .select(col("id"), NearestCode(col("q"), lit(0L), books).as("b"))
      .select(col("id"), col("b.assigned"), col("b.dist2"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == want, s"got $got want $want")
    // the duplicate-codeword tie really goes to the smaller label
    assert(got(3L)._1 == 1L)
  }

  test("per-group dispatch and hostile group ids null out, never throw") {
    val books = Seq(
      (0L, 0L, Seq(0L)), (0L, 1L, Seq(100L)),
      (2L, 7L, Seq(50L))) // group 1 intentionally empty
    val rows = Seq(
      (1L, Seq(10L), 0L),   // group 0 -> label 0
      (2L, Seq(60L), 2L),   // group 2 -> label 7
      (3L, Seq(60L), 1L),   // empty group -> null
      (4L, Seq(60L), 99L),  // out of range -> null
      (5L, Seq(60L), -3L),  // negative -> null
      (6L, Seq(60L), 2147483648L),  // > Int.MaxValue: must null, not
                                    // crash on a wrapped int index
      (7L, Seq(60L), 4294967296L))  // exact 2^32: truncates to int 0 —
                                    // must null, not score group 0
      .toDF("id", "q", "g")
    val got = rows
      .select(col("id"), NearestCode(col("q"), col("g"), books).as("b"))
      .select(col("id"), col("b.assigned"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == Map(1L -> Some(0L), 2L -> Some(7L), 3L -> None,
      4L -> None, 5L -> None, 6L -> None, 7L -> None), got.toString)
  }

  test("out-of-contract input types are rejected at analysis, not at " +
    "runtime (codegen/interpreted would diverge on them)") {
    val books = Seq((0L, 0L, Seq(1L)))
    // int group: codegen would work, interpreted eval would CCE
    val intGroup = Seq((1L, Seq(1L), 2)).toDF("id", "q", "g")
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      intGroup.select(NearestCode(col("q"), col("g"), books)).collect()
    }
    assert(e1.getMessage.contains("nearest_code"), e1.getMessage)
    // array<int> vec: ArrayData.getLong would silently read garbage
    val intVec = Seq((1L, Seq(1, 2), 0L)).toDF("id", "q", "g")
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      intVec.select(NearestCode(col("q"), col("g"), books)).collect()
    }
    assert(e2.getMessage.contains("nearest_code"), e2.getMessage)
    // the in-contract shape still analyzes (the check is not over-strict)
    val ok = Seq((1L, Seq(1L), 0L)).toDF("id", "q", "g")
      .select(NearestCode(col("q"), col("g"), books).as("b"))
      .select(col("b.assigned")).as[Long].collect()
    assert(ok.toSeq == Seq(0L))
  }

  test("interpreted eval agrees with codegen (the fallback contract)") {
    val books = Seq((0L, 0L, Seq(1L, 2L)), (0L, 5L, Seq(3L, 4L)))
    val vecs = (0L until 50L).map(i => (i, Seq(i % 7, i % 5))).toDF("id", "q")
    val viaCodegen = vecs
      .select(col("id"), NearestCode(col("q"), lit(0L), books).as("b"))
      .select(col("id"), col("b.assigned")).as[(Long, Long)]
      .collect().toMap
    // force the interpreted path through the expression's eval
    import org.apache.spark.sql.graftx.ColumnBridge
    val expr = ColumnBridge
      .expression(NearestCode(col("q"), lit(0L), books))
    val interp = (0L until 50L).map { i =>
      val row = org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          Array(i % 7, i % 5)), 0L)
      val boundExpr = expr match {
        case nc: NearestCode => nc.copy(
          left = org.apache.spark.sql.catalyst.expressions.BoundReference(
            0, org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.LongType), nullable = false),
          right = org.apache.spark.sql.catalyst.expressions.BoundReference(
            1, org.apache.spark.sql.types.LongType, nullable = false))
      }
      i -> boundExpr.eval(row)
        .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow].getLong(0)
    }.toMap
    assert(interp == viaCodegen)
  }
}
