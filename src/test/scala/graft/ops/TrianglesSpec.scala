package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  test("K4: four triangles, every vertex on three") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)).toDF("a", "b")
    assert(Triangles.triangles(edges, "a", "b").count() == 4)
    val pv = Triangles.perVertex(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(pv == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), pv.toString)
  }

  test("triangle-free graphs: square and star count zero") {
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("a", "b")
    assert(Triangles.triangles(square, "a", "b").count() == 0)
    // the star is the degree-skew shape the orientation defuses: the hub
    // gets only IN-edges, so no wedge ever forms at it
    val star = (2L to 40L).map(v => (1L, v)).toDF("a", "b")
    assert(Triangles.triangles(star, "a", "b").count() == 0)
  }

  test("differential vs naive id-ordered 3-way join on a hash graph") {
    // deterministic pseudo-random graph: edge (u,v), u<v<60, kept when
    // a hash of the pair clears a threshold
    val nodes = spark.range(60).toDF("u")
    val edges = nodes.crossJoin(nodes.withColumnRenamed("u", "v"))
      .filter(col("u") < col("v"))
      .filter(abs(hash(col("u") * 1000 + col("v"))) % 5 === 0)
      .select(col("u").as("a"), col("v").as("b")).cache()
    val naive = edges.select(col("a").as("x"), col("b").as("y"))
      .join(edges.select(col("a").as("y"), col("b").as("z")), Seq("y"))
      .join(edges.select(col("a").as("x"), col("b").as("z")),
        Seq("x", "z"))
      .count()
    assert(Triangles.triangles(edges, "a", "b").count() == naive,
      s"degree-oriented count must equal the naive id-ordered count")
    // per-vertex credits sum to 3 * total
    val credits = Triangles.perVertex(edges, "a", "b")
      .agg(sum("n_triangles")).as[Long].collect().head
    assert(credits == 3 * naive)
  }

  test("partition independence") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L),
      (3L, 5L), (1L, 5L)).toDF("a", "b")
    val one = Triangles.perVertex(edges.coalesce(1), "a", "b")
      .as[(Long, Long)].collect().toMap
    val many = Triangles.perVertex(edges.repartition(7), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(one == many)
  }

  test("count-only path == explode of materialized triangle rows, " +
    "broadcast and shuffle-hash closures identical") {
    // pseudo-random graph, dense enough for shared triangles
    val edges = (for {
      i <- 1L to 60L; j <- (i + 1) to 60L
      if (i * 31 + j * 17) % 5 == 0
    } yield (i, j)).toDF("a", "b")
    val fromRows = Triangles.triangles(edges, "a", "b")
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").count()
      .as[(Long, Long)].collect().toMap
    val fused = Triangles.perVertex(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    val fusedSH = Triangles
      .perVertex(edges, "a", "b", broadcastClosure = false)
      .as[(Long, Long)].collect().toMap
    assert(fused == fromRows, "fused count-only must equal row explode")
    assert(fusedSH == fromRows, "shuffle-hash closure must match")
    assert(fused.nonEmpty)
  }

  test("count-only plan never sorts or exchanges the wedge stream " +
    "(single stage up to the partial count)") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("a", "b")
    val plan = PlanChecks.executedPlan(
      Triangles.perVertex(edges, "a", "b"))
    // everything after the wedge join must be broadcast — the only
    // SortMergeJoin ever acceptable here would sort Θ(triangles) rows
    assert(!plan.contains("SortMergeJoin"),
      s"wedge/closure joins must not sort the wedge stream\n$plan")
  }
}
