package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-pipeline step that flags
  * corpus documents overlapping an evaluation/benchmark set: any doc
  * sharing word n-grams with a benchmark document leaks eval data into
  * training. Standard practice is n-gram overlap (n≈8-13 for real
  * corpora; the dial is a parameter).
  *
  * Scale shape: the benchmark side is structurally tiny relative to the
  * corpus (eval suites are thousands of docs; the corpus is billions), so
  * its distinct shingle set is BROADCAST — the corpus-side shingle
  * explosion then joins map-side with no shuffle of corpus data at all;
  * the only shuffle is the per-doc hit aggregation, keyed on doc id.
  */
object Decontamination {

  /** Per-document n-gram overlap against `bench`: (id, n_sh, n_hits,
    * contamination = n_hits / n_sh) for corpus docs with >= 1 hit.
    * Shingles are DISTINCT ordered word n-grams ([[Dedup.shingles]]). */
  def ngramHits(
      corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 5): DataFrame = {
    val benchShingles = bench
      .select(explode(Dedup.shingles(col(benchTextCol), n)).as("shingle"))
      .distinct()
    corpus
      .select(col(idCol), Dedup.shingles(col(textCol), n).as("__sh"))
      .withColumn("n_sh", size(col("__sh")).cast("long"))
      .select(col(idCol), col("n_sh"), explode(col("__sh")).as("shingle"))
      .join(broadcast(benchShingles), Seq("shingle"))
      .groupBy(col(idCol), col("n_sh"))
      .agg(count(lit(1)).as("n_hits"))
      .withColumn("contamination",
        col("n_hits").cast("double") / col("n_sh"))
  }
}
