package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Test vectors are ground truth from CPython `os.path` / `re` (generated
  * with the exact reference expressions from `upload_file.py:61-144`).
  */
class PathFunctionsSpec extends SparkSpec {

  /** Deterministic scalacheck sampling (scalatestplus isn't in the offline
    * cache, so property tests drive Gen directly). */
  def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  // X1 clean_folder_name — python: strip('/') then normpath
  val cleanVectors = Seq(
    "" -> "", "/" -> "", "a" -> "a", "/a//b/" -> "a/b", "a/./b" -> "a/b",
    "a/../b" -> "b", "a/b/" -> "a/b", "//a/b" -> "a/b", "a//b//c" -> "a/b/c",
    "./a" -> "a", "a/." -> "a", ".." -> "..", "a/b/../../c" -> "c",
    "../a" -> "../a")

  test("PathAlg.cleanFolderName matches CPython") {
    cleanVectors.foreach { case (in, want) =>
      assert(PathAlg.cleanFolderName(in) == want, s"input '$in'")
    }
  }

  val normVectors = Seq(
    "" -> ".", "/" -> "/", "a" -> "a", "/a//b/" -> "/a/b", "a/./b" -> "a/b",
    "a/../b" -> "b", "//a/b" -> "//a/b", "a//b//c" -> "a/b/c",
    "a/b/../../c" -> "c", "../a" -> "../a", ".." -> "..")

  test("PathAlg.normpath matches CPython os.path.normpath") {
    normVectors.foreach { case (in, want) =>
      assert(PathAlg.normpath(in) == want, s"input '$in'")
    }
  }

  // X4 enumerate — python re.sub(r'\.', f'_{n}.', name, 1)
  val enumVectors = Seq(
    ("a.tar.gz", 2) -> "a_2.tar.gz", ("data", 2) -> "data_2",
    ("a.b", 2) -> "a_2.b", (".hidden", 2) -> "_2.hidden",
    ("a.", 2) -> "a_2.", ("x.y.z.w", 2) -> "x_2.y.z.w",
    ("a.tar.gz", 1) -> "a_1.tar.gz")

  test("PathAlg.enumerateDestinationFileName matches CPython re.sub") {
    enumVectors.foreach { case ((n, k), want) =>
      assert(PathAlg.enumerateDestinationFileName(n, k) == want, s"input '$n'")
    }
  }

  // X2 combine — double-normpath'd
  val combineVectors = Seq(
    ("", "f") -> "f", ("a", "f") -> "a/f", ("a/b", "f.txt") -> "a/b/f.txt",
    ("a//b", "f") -> "a/b/f", ("", "") -> ".")

  test("PathAlg.combineFolderAndFileName matches CPython") {
    combineVectors.foreach { case ((f, n), want) =>
      assert(PathAlg.combineFolderAndFileName(f, n) == want, s"input ($f,$n)")
    }
  }

  test("PathAlg.basename matches CPython os.path.basename") {
    assert(PathAlg.basename("a/b/c.txt") == "c.txt")
    assert(PathAlg.basename("c.txt") == "c.txt")
    assert(PathAlg.basename("a/b/") == "")
  }

  // X5 priority chain incl. the no-dest-name => number ignored quirk
  test("PathAlg.determineDestinationFileName priority chain") {
    assert(PathAlg.determineDestinationFileName(
      "a/b/src.csv", Some("out.csv"), Some(3)) == "out_3.csv")
    assert(PathAlg.determineDestinationFileName(
      "a/b/src.csv", Some("out.csv"), None) == "out.csv")
    assert(PathAlg.determineDestinationFileName(
      "a/b/src.csv", None, Some(3)) == "src.csv") // number IGNORED
    assert(PathAlg.determineDestinationFileName(
      "a/b/src.csv", None, None) == "src.csv")
  }

  // ---- Column layer agrees with the scalar layer (Spark round-trip) ----

  private def colRoundTrip(
      inputs: Seq[String], f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[String] = {
    import spark.implicits._
    inputs.toDF("s").select(f(col("s")).as("r")).collect().map(_.getString(0)).toSeq
  }

  test("cleanFolderNameCol agrees with PathAlg on dot-free paths") {
    // Column layer documents no `..` support; test the rest
    val ins = cleanVectors.map(_._1).filterNot(_.contains(".."))
    val got = colRoundTrip(ins, PathFunctions.cleanFolderNameCol)
    ins.zip(got).foreach { case (in, g) =>
      assert(g == PathAlg.cleanFolderName(in), s"input '$in'")
    }
  }

  test("enumerateNameCol agrees with PathAlg") {
    import spark.implicits._
    enumVectors.foreach { case ((n, k), want) =>
      val got = Seq(n).toDF("s")
        .select(PathFunctions.enumerateNameCol(col("s"), lit(k)).as("r"))
        .collect()(0).getString(0)
      assert(got == want, s"input '$n'")
    }
  }

  test("basenameCol agrees with PathAlg") {
    val ins = Seq("a/b/c.txt", "c.txt", "a/b/", "x/y.tar.gz")
    val got = colRoundTrip(ins, PathFunctions.basenameCol)
    ins.zip(got).foreach { case (in, g) =>
      assert(g == PathAlg.basename(in), s"input '$in'")
    }
  }

  test("property: column clean == scalar clean on slash-word paths") {
    val seg = Gen.oneOf(Gen.alphaNumStr.suchThat(_.nonEmpty), Gen.const("x"),
      Gen.const("."))
    val pathGen = for {
      n <- Gen.choose(0, 5)
      segs <- Gen.listOfN(n, seg)
      lead <- Gen.oneOf("", "/", "//")
      trail <- Gen.oneOf("", "/")
    } yield lead + segs.mkString("/") + trail
    val paths = samples(pathGen, 200)
    assert(paths.size > 100)
    val got = colRoundTrip(paths, PathFunctions.cleanFolderNameCol)
    paths.zip(got).foreach { case (in, g) =>
      assert(g == PathAlg.cleanFolderName(in), s"input '$in'")
    }
  }

  test("property: clean is idempotent") {
    samples(Gen.asciiPrintableStr, 300).foreach { s =>
      val once = PathAlg.cleanFolderName(s)
      assert(PathAlg.cleanFolderName(once) == once, s"input '$s'")
    }
  }
}
