package graft.ops

import graft.functions.PathFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The rename-mapping projection (SURVEY.md §2.3 X6 + §2.5 A2): given a
  * matched file catalog, compute each file's destination path.
  *
  * Numbering semantics differ per reference entry point:
  *  - upload/download regex branch: every match is numbered 1..n
  *    (`upload_file.py:215-220`, `download_file.py:215-219`) —
  *    [[Numbering.Always]];
  *  - move regex branch: `None` when exactly one match, else 1..n
  *    (`move_file.py:130-136`) — [[Numbering.UnlessSingle]];
  *  - exact branch anywhere: no numbering — [[Numbering.Never]].
  *
  * Numbering only ever AFFECTS an explicitly provided destination name
  * (`upload_file.py:94-102`: without one, the basename is used and the
  * number ignored).
  *
  * Ordering: the reference numbers files in listing order (glob/REST
  * order). The engine defines the spec as order-by-`path` so results are
  * deterministic under any partitioning (SURVEY.md §2.5 A3).
  *
  * Scale note: the global ordinal is a total order, so Spark plans the
  * `row_number` window as a single-partition exchange. That is fine for
  * rename manifests (bounded by match count); the ordinal is only computed
  * at all when an explicit destination name requires enumeration.
  */
object RenamePlan {

  sealed trait Numbering
  object Numbering {
    case object Always extends Numbering
    case object UnlessSingle extends Numbering
    case object Never extends Numbering
  }

  /** Adds `file_number` and `dest_path` to a catalog DataFrame.
    *
    * @param catalog   must contain `pathCol` (source full path / name)
    * @param destFolder raw destination folder (cleaned here, X1)
    * @param destName   optional explicit destination file name
    */
  def planify(
      catalog: DataFrame,
      destFolder: String,
      destName: Option[String],
      numbering: Numbering,
      pathCol: String = "path"): DataFrame = {
    val p = col(pathCol)
    val fileNumber = numbering match {
      case Numbering.Never => lit(null).cast("int")
      case Numbering.Always =>
        row_number().over(Window.orderBy(p))
      case Numbering.UnlessSingle =>
        when(count(lit(1)).over(Window.partitionBy()) === 1, lit(null).cast("int"))
          .otherwise(row_number().over(Window.orderBy(p)))
    }
    catalog
      .withColumn("file_number", fileNumber)
      .withColumn("dest_path",
        destFullPathCol(
          lit(destFolder),
          destName.map(lit).getOrElse(lit(null).cast("string")),
          p,
          col("file_number")))
  }
}
