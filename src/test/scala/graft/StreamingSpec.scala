package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.KgPipeline
import graft.streaming.IncrementalKg
import graft.synth.Synth

/** Structured Streaming incremental append: a parquet-backed transcript
  * stream driven synchronously (AvailableNow + awaitTermination) must emit
  * exactly the batch pipeline's triples.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming triples == batch triples on the same transcripts") {
    val nEnts = 150L; val mProps = 15L
    val ents = Synth.entityDump(spark, nEnts)
    val props = Synth.propertyDump(spark, mProps)
    val dict = KgPipeline.dictionary(
      graft.index.EntityIndexBuilder.build(ents), ents,
      graft.index.PropertyIndexBuilder.build(props), props)

    val transcripts = Synth.transcripts(spark, 15, 5, nEnts, mProps)
    val srcDir = Files.createTempDirectory("stream-src").toString
    transcripts.write.mode("overwrite").parquet(srcDir)

    val stream = spark.readStream
      .schema(transcripts.schema)
      .parquet(srcDir)
    val outDir = Files.createTempDirectory("stream-out").toString
    val ckDir = Files.createTempDirectory("stream-ck").toString
    val q = IncrementalKg.triplesStream(stream, dict, outDir, "kgstream", ckDir)
    q.awaitTermination(120000)

    val got = spark.read.parquet(outDir)
      .select("subj", "pred", "obj", "conv_id", "turn_idx")
      .collect().map(_.toString).toSet
    val want = graft.pipeline.Triples.extract(
      graft.pipeline.Mentions.detectFast(transcripts, dict))
      .select("subj", "pred", "obj", "conv_id", "turn_idx")
      .collect().map(_.toString).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("watermarked windowed mention rates run on a stream") {
    val nEnts = 100L
    val ents = Synth.entityDump(spark, nEnts)
    val props = Synth.propertyDump(spark, 10)
    val dict = KgPipeline.dictionary(
      graft.index.EntityIndexBuilder.build(ents), ents,
      graft.index.PropertyIndexBuilder.build(props), props)
    val transcripts = Synth.transcripts(spark, 10, 4, nEnts, 10)
    val srcDir = Files.createTempDirectory("stream-src2").toString
    transcripts.write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream.schema(transcripts.schema).parquet(srcDir)
    val agg = IncrementalKg.mentionRates(stream, dict)
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("rates")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // append mode only emits closed windows; with AvailableNow the watermark
    // advances at the final batch — accept either emitted rows or a clean run
    assert(q.exception.isEmpty)
  }
}
