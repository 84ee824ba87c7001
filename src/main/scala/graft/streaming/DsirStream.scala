package graft.streaming

import graft.ext.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Streaming maintenance of the DSIR raw-corpus feature distribution —
  * the statistics half of importance resampling kept fresh as the crawl
  * grows, without ever re-scanning history.
  *
  * The whole trick is that the DSIR count table is HASH-BOUNDED: every
  * document's unigram+bigram bag folds into `buckets` ids
  * ([[TextAnalysis.dsirFeatures]]), so a micro-batch contributes at
  * most `buckets` (f, cnt) rows and the accumulated store stays
  * `buckets × nBatches` rows of exact integers — mergeable by SUM in
  * any order, tiny at any corpus size. Scoring reads the merged table
  * through [[TextAnalysis.dsirScoreAgainstCounts]], which reproduces
  * the batch [[TextAnalysis.dsirWeights]] bit for bit on the same
  * corpus (spec-pinned differential).
  *
  * Crash safety is the store-layout contract shared with
  * [[AnnStream.indexBatches]] / [[CorpusStream.langIdGateBatches]]:
  * rows land in a `batch_id` partition under DYNAMIC partition
  * overwrite, so a replayed micro-batch rewrites exactly its own
  * partition and double-counting is impossible.
  */
object DsirStream {

  /** Start the count-maintenance stream: each micro-batch's hashed
    * feature counts land in `storeDir/batch_id=N/`.
    *
    * Every `compactEvery` batches (0 disables) the accumulated
    * partitions fold physically ([[StoreCompaction]] park-aside swap):
    * counts are mergeable by SUM in any order, so compaction is the
    * EXACT per-bucket sum of all `batch_id < current` partitions,
    * re-stamped as one `batch_id = current-1` partition — at most
    * `buckets` rows, and [[readCounts]]' merge is unchanged by
    * construction. A crashed first attempt's own partition is excluded
    * and dropped; the replay rewrites it (see [[StoreCompaction]]). */
  def countBatches(docs: DataFrame, storeDir: String,
      checkpointDir: String, textCol: String = "text",
      buckets: Int = 256, compactEvery: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        StoreCompaction.recoverParked(spark, storeDir)
        if (StoreCompaction.due(batchId, compactEvery))
          StoreCompaction.swapRewrite(spark, storeDir)(
            dir => readStoreRaw(spark, dir),
            all => all.filter(col("batch_id") < batchId)
              .groupBy("f").agg(sum("cnt").as("cnt"))
              .withColumn("batch_id", lit(batchId - 1)),
            (df, dir) => df.write.mode("overwrite")
              .partitionBy("batch_id").parquet(dir))
        batch
          .select(explode(
            TextAnalysis.dsirFeatures(col(textCol), buckets)).as("f"))
          .groupBy("f").agg(count(lit(1)).as("cnt"))
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(storeDir)
        ()
      }
      .start()

  /** Merged raw-count table (f, rcnt) from the store — exact integer
    * sums across batch partitions, the shape
    * [[TextAnalysis.dsirScoreAgainstCounts]] consumes. Explicit schema
    * keeps `f`/`batch_id` LongType (partition-dir inference would
    * int-ify). */
  def readCounts(spark: SparkSession, storeDir: String): DataFrame =
    readStoreRaw(spark, storeDir)
      .groupBy("f").agg(sum("cnt").as("rcnt"))

  /** The store in its physical row shape, explicit schema (shared by
    * [[readCounts]] and the compaction fold). */
  private def readStoreRaw(spark: SparkSession, storeDir: String): DataFrame =
    spark.read.schema(StructType(Seq(
        StructField("f", LongType), StructField("cnt", LongType),
        StructField("batch_id", LongType))))
      .parquet(storeDir)
}
