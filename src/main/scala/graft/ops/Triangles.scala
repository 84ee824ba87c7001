package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed triangle counting over an undirected edge list.
  *
  * The classic orientation trick (Suri & Vassilvitskii, WWW'11 — the
  * "MapReduce clustering-coefficient" construction): direct every edge
  * from its (degree, id)-smaller endpoint to the larger, which turns the
  * graph into a DAG where every triangle {x,y,z} survives as exactly one
  * wedge x→y, x→z closed by y→z. Counting is then
  *
  *  1. wedge enumeration — a self-join of the directed edges on their
  *     source (fan-out bounded by the max OUT-degree, which the
  *     degree-orientation caps at O(√m) on any graph — this is what
  *     makes the join survive scale-free degree skew: the celebrity
  *     node's 10^8 undirected neighbours become in-edges, not a 10^16
  *     wedge explosion), and
  *  2. closure — an equi-join of the wedges against the directed edge
  *     set on (v, w).
  *
  * Three keyed shuffles total (degree agg, wedge join, closure join) —
  * no iteration, no cartesian anywhere. All tie-breaks are total
  * ((deg, id) lexicographic), so results are deterministic under any
  * partitioning and a SQL oracle replays them exactly.
  */
object Triangles {

  /** Directed (src, dst) edges under the (degree, id) total order.
    * Input must be unique undirected pairs without self-loops. */
  private def orient(edges: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    val e = edges.select(col(aCol).as("a"), col(bCol).as("b"))
    val deg = e.select(col("a").as("u"))
      .union(e.select(col("b").as("u")))
      .groupBy("u").agg(count(lit(1)).as("d"))
    def key(d: String, v: String) =
      struct(col(d).as("kd"), col(v).as("kv"))
    e.join(deg.withColumnsRenamed(Map("u" -> "a", "d" -> "da")), Seq("a"))
      .join(deg.withColumnsRenamed(Map("u" -> "b", "d" -> "db")), Seq("b"))
      .select(
        when(key("da", "a") < key("db", "b"),
          col("a")).otherwise(col("b")).as("src"),
        when(key("da", "a") < key("db", "b"),
          col("b")).otherwise(col("a")).as("dst"),
        when(key("da", "a") < key("db", "b"),
          key("db", "b")).otherwise(key("da", "a")).as("dstKey"))
  }

  /** All triangles, one row each: (x, y, z) with x→y, x→z, y→z in the
    * degree orientation. */
  def triangles(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val dir = orient(edges, aCol, bCol)
    val e1 = dir.select(col("src").as("x"), col("dst").as("y"),
      col("dstKey").as("yk"))
    val e2 = dir.select(col("src").as("x"), col("dst").as("z"),
      col("dstKey").as("zk"))
    val wedges = e1.join(e2, Seq("x")).filter(col("yk") < col("zk"))
      .select("x", "y", "z")
    val closing = dir.select(col("src").as("y"), col("dst").as("z"))
    wedges.join(closing, Seq("y", "z")).select("x", "y", "z")
  }

  /** Per-vertex triangle participation (each triangle credits all three
    * corners) — the numerator of the local clustering coefficient.
    * Vertices on no triangle are absent; left-join the node set to
    * zero-fill. Returns (node, n_triangles). */
  def perVertex(edges: DataFrame, aCol: String, bCol: String): DataFrame =
    triangles(edges, aCol, bCol)
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
}
