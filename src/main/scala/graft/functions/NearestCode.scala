package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** `nearest_code(vec, group)` — exact-integer nearest-codeword argmin
  * against a PLAN-EMBEDDED codebook: for the row's `group` (a PQ
  * subspace id, or 0 for a single coarse codebook) find the codeword
  * minimizing |v-c|² = |v|² + |c|² - 2·v·c over exact longs, ties to
  * the smallest codeword label. Returns struct(assigned, dist2).
  *
  * This is the k-means/PQ ASSIGNMENT step as ONE codegen'd projection.
  * The join-shaped alternative (explode slices × broadcast codebook →
  * k rows per input row → min-struct hash aggregate) materializes and
  * re-aggregates k× the corpus per pass; at k=64 codewords that is a
  * 64× row blowup through an exchange-adjacent aggregate on every
  * Lloyd round and every encode. Here the codebook — bounded model
  * state, m·k·(dims/m) longs — travels as a literal reference object
  * inside whole-stage codegen, the same discipline as broadcasting it
  * but with zero join machinery: the scan stays map-only, the argmin
  * loop is branch-light primitive arithmetic, and the per-centroid
  * norms are precomputed once at plan construction.
  *
  * Exactness contract (matches the join path bit-for-bit): |v|² is
  * summed over the FULL input array, the dot over the common prefix
  * with each codeword — the documented ragged-length caveat of the
  * assignment identity is reproduced, not silently changed. Codewords
  * are iterated in ascending label order with a strict `<` compare, so
  * equal-distance ties keep the smallest label exactly like
  * `min(struct(d2, label))`. A null array element nulls the result
  * (SQL-style, same as [[LongArrayDot]]); an out-of-range or empty
  * group nulls it too (callers never produce one — fail soft, not
  * loudly, under hostile group values).
  */
case class NearestCode(left: Expression, right: Expression,
    labels: Seq[Seq[Long]], cents: Seq[Seq[Seq[Long]]])
    extends BinaryExpression {

  // analysis-time contract: both eval paths index the vector with
  // ArrayData.getLong and cast the group to Long, so an array<int> vec
  // or int group would diverge between codegen and interpreted eval
  // (garbage reads vs ClassCastException) — reject mismatches at
  // analysis instead (AbstractDataType/ExpectsInputTypes is not public
  // API in Spark 4, so the check is spelled out)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"nearest_code requires (array<bigint>, bigint), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  require(labels.length == cents.length &&
    labels.zip(cents).forall { case (l, c) => l.length == c.length },
    "nearest_code: per-group labels and codewords must align")

  override def dataType: DataType = StructType(Seq(
    StructField("assigned", LongType, nullable = false),
    StructField("dist2", LongType, nullable = false)))
  override def prettyName: String = "nearest_code"
  override def nullable: Boolean = true

  // primitive mirrors of the (structurally comparable) Seq model, built
  // once per plan: codewords, labels, and per-codeword norms |c|²
  @transient private lazy val labArr: Array[Array[Long]] =
    labels.map(_.toArray).toArray
  @transient private lazy val centArr: Array[Array[Array[Long]]] =
    cents.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val normArr: Array[Array[Long]] =
    centArr.map(_.map(c => c.foldLeft(0L)((s, v) => s + v * v)))

  override def nullSafeEval(a: Any, g: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val gi = g.asInstanceOf[Long]
    if (gi < 0L || gi >= labArr.length || labArr(gi.toInt).length == 0)
      return null
    val na = v.numElements()
    var vn = 0L
    var i = 0
    while (i < na) {
      if (v.isNullAt(i)) return null
      val x = v.getLong(i); vn += x * x; i += 1
    }
    val cg = centArr(gi.toInt); val cn = normArr(gi.toInt)
    val lb = labArr(gi.toInt)
    var bestD = Long.MaxValue; var bestL = 0L; var first = true
    var j = 0
    while (j < cg.length) {
      val c = cg(j)
      val n = math.min(na, c.length)
      var dot = 0L; var t = 0
      while (t < n) { dot += v.getLong(t) * c(t); t += 1 }
      val d2 = vn + cn(j) - 2L * dot
      if (first || d2 < bestD) { bestD = d2; bestL = lb(j); first = false }
      j += 1
    }
    new GenericInternalRow(Array[Any](bestL, bestD))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, g) => {
      val lab = ctx.addReferenceObj("ncLabels", labArr, "long[][]")
      val cen = ctx.addReferenceObj("ncCents", centArr, "long[][][]")
      val nrm = ctx.addReferenceObj("ncNorms", normArr, "long[][]")
      val gi = ctx.freshName("gi")
      val na = ctx.freshName("na")
      val vn = ctx.freshName("vn")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val cg = ctx.freshName("cg")
      val cw = ctx.freshName("cw")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val d2 = ctx.freshName("d2")
      val bestD = ctx.freshName("bestD")
      val bestL = ctx.freshName("bestL")
      val first = ctx.freshName("first")
      val x = ctx.freshName("x")
      s"""
         |// range-check the FULL long before truncating: a group id in
         |// [2^31, 2^32) must null out, not index with a wrapped int
         |if ($g < 0L || $g >= (long) $lab.length) {
         |  ${ev.isNull} = true;
         |}
         |int $gi = ${ev.isNull} ? 0 : (int) $g;
         |if (!${ev.isNull} && $lab[$gi].length == 0) {
         |  ${ev.isNull} = true;
         |}
         |if (!${ev.isNull}) {
         |  int $na = $a.numElements();
         |  long $vn = 0L;
         |  for (int $i = 0; $i < $na; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $x = $a.getLong($i);
         |    $vn += $x * $x;
         |  }
         |  if (!${ev.isNull}) {
         |    long[][] $cg = $cen[$gi];
         |    long $bestD = Long.MAX_VALUE; long $bestL = 0L;
         |    boolean $first = true;
         |    for (int $j = 0; $j < $cg.length; $j++) {
         |      long[] $cw = $cg[$j];
         |      int $n = Math.min($na, $cw.length);
         |      long $dot = 0L;
         |      for (int $t = 0; $t < $n; $t++) {
         |        $dot += $a.getLong($t) * $cw[$t];
         |      }
         |      long $d2 = $vn + $nrm[$gi][$j] - 2L * $dot;
         |      if ($first || $d2 < $bestD) {
         |        $bestD = $d2; $bestL = $lab[$gi][$j]; $first = false;
         |      }
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.expressions
         |      .GenericInternalRow(new Object[]{$bestL, $bestD});
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NearestCode {
  import org.apache.spark.sql.graftx.ColumnBridge

  /** Column form over a driver-local codebook `(group, label, codeword)`
    * — groups must be dense 0..maxGroup (PQ subspace ids are; the
    * coarse case passes group 0). Labels are sorted ascending per group
    * here, which is what makes the strict-`<` scan reproduce the
    * min-struct tie-break. */
  def apply(vec: Column, group: Column,
      books: Seq[(Long, Long, Seq[Long])]): Column = {
    require(books.nonEmpty, "nearest_code: empty codebook")
    val byGroup = books.groupBy(_._1)
    val maxG = byGroup.keys.max
    require(maxG < 4096, s"nearest_code: group ids must be small ($maxG)")
    val groups = (0L to maxG).map(g =>
      byGroup.getOrElse(g, Nil).sortBy(_._2))
    val labels = groups.map(_.map(_._2))
    val cents = groups.map(_.map(_._3))
    ColumnBridge.column(NearestCode(
      ColumnBridge.expression(vec), ColumnBridge.expression(group),
      labels, cents))
  }
}
