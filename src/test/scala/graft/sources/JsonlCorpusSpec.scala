package graft.sources

import graft.SparkSpec

import java.nio.file.Files

class JsonlCorpusSpec extends SparkSpec {

  private def write(lines: Seq[String]): String = {
    val dir = specTempDir("graft-jsonl")
    Files.write(dir.resolve("part-0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  test("well-formed lines load typed, malformed lines quarantine raw") {
    val path = write(Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s0"}""",
      """{"doc_id": 2, "text": "zwei", "lang": "de", "source": "s1"}""",
      """{"doc_id": 3, "text": "truncated...""", // malformed JSON
      """not json at all""",
      """{"text": "no identity", "lang": "en", "source": "s0"}""")) // no doc_id
    val loaded = JsonlCorpus.load(spark, path)
    val (ok, bad) = JsonlCorpus.stats(loaded)
    assert(ok == 2 && bad == 3, s"ok=$ok bad=$bad")
    val ids = loaded.corpus.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(Array(1L, 2L)))
    // the quarantine preserves raw lines for replay
    val raws = loaded.quarantine.collect().map(_.getString(0))
    assert(raws.exists(_.contains("truncated")), raws.mkString("|"))
    assert(raws.exists(_ == "not json at all"), raws.mkString("|"))
    assert(raws.exists(_.contains("no identity")), raws.mkString("|"))
  }

  test("every input line lands on exactly one side") {
    val rnd = new scala.util.Random(11)
    val lines = (1 to 200).map { i =>
      if (rnd.nextInt(4) == 0) s"broken line $i"
      else s"""{"doc_id": $i, "text": "doc $i", "lang": "en", "source": "s"}"""
    }
    val loaded = JsonlCorpus.load(spark, write(lines))
    val (ok, bad) = JsonlCorpus.stats(loaded)
    assert(ok + bad == 200, s"ok=$ok bad=$bad")
    assert(ok == lines.count(_.startsWith("{")))
  }

  test("reserved quarantine column is rejected loudly") {
    import org.apache.spark.sql.types._
    val bad = new StructType()
      .add("doc_id", LongType).add("_corrupt_record", StringType)
    val e = intercept[IllegalArgumentException] {
      JsonlCorpus.load(spark, "/tmp/never-read", bad)
    }
    assert(e.getMessage.contains("reserved"))
  }
}
