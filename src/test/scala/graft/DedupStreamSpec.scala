package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.streaming.EventStream
import graft.multimodal.Multimodal

class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "s1", "spark table join fast"),
    (2L, "s1", "fast join table spark"),      // same token set as 1
    (3L, "s1", "completely different words here"),
    (4L, "s2", "spark table join fast extra"))
    .toDF("doc_id", "source", "text")

  test("exact dedup groups identical normalized token sets") {
    val got = Dedup.exactGroups(docs, "doc_id", "text")
      .select("keep_id", "group_size").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("minhash LSH finds the identical pair with estimate 1.0") {
    val got = Dedup.minhashLsh(docs, "doc_id", "text", k = 12, bands = 6,
      threshold = 0.9).as[(Long, Long, Double)].collect().toSet
    assert(got.contains((1L, 2L, 1.0)))
  }

  test("simhash of identical token multisets collide (hamming 0)") {
    val got = Dedup.simhashPairs(docs, "doc_id", "text", "source", maxDist = 0)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("pigeonhole simhash pairs equal the all-pairs sweep on real data") {
    // brute-force twin of Dedup.simhashPairs' candidate generation: the
    // pigeonhole chunk bucketing must reproduce the full within-block
    // hamming join exactly, at every maxDist (incl. 5, where 16 % 6 != 0
    // exercises the uneven chunk widths)
    val corpus = Tables.load(spark, sf, "documents")
    val sh = Dedup.simhash16(
      corpus.select(col("doc_id").as("id"), col("text")), "id", "text")
      .join(corpus.select(col("doc_id").as("id"), col("source").as("blk")), "id")
    for (maxDist <- Seq(0, 3, 5)) {
      val brute = sh.select(col("blk"), col("id").as("a_id"), col("simhash").as("a_sh"))
        .join(sh.select(col("blk"), col("id").as("b_id"), col("simhash").as("b_sh")), "blk")
        .filter(col("a_id") < col("b_id") &&
          bit_count(col("a_sh").bitwiseXOR(col("b_sh"))) <= maxDist)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      val got = Dedup.simhashPairs(corpus, "doc_id", "text", "source", maxDist)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      assert(got == brute, s"maxDist=$maxDist")
    }
  }

  test("prefix-filtered ngram Jaccard equals the all-pairs sweep on real data") {
    import graft.text.TextFunctions
    val corpus = Tables.load(spark, sf, "documents")
    val g = corpus.select(col("source").as("blk"), col("doc_id").as("id"),
      array_distinct(TextFunctions.charShingles(col("text"), 3)).as("grams"))
    val brute = g.select(col("blk"), col("id").as("a_id"), col("grams").as("a_g"))
      .join(g.select(col("blk"), col("id").as("b_id"), col("grams").as("b_g")), "blk")
      .filter(col("a_id") < col("b_id"))
      .withColumn("sim", TextFunctions.jaccardSim(col("a_g"), col("b_g")))
      .filter(col("sim") >= 0.6)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val got = Dedup.ngramJaccard(corpus, "doc_id", "text", "source", 3, 0.6)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got == brute && got.nonEmpty)
  }

  test("embedding near-dup finds only close pairs") {
    val emb = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.99f, 0.01f)),
      (3L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val got = Dedup.embeddingNearDup(emb, 0.9)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("prefix-filtered Jaccard join equals the exact block join") {
    import graft.semantic.SimilarityJoins
    val corpus = Tables.load(spark, sf, "documents")
    for ((blk, t, sw) <- Seq(("source", 0.7, false), ("lang", 0.8, true))) {
      val exact = SimilarityJoins.tokenJaccardJoin(corpus, blk, "text", t,
        stopworded = sw)
        .select("blk", "a_id", "b_id", "sim").as[(String, Long, Long, Double)]
        .collect().toSet
      val pref = SimilarityJoins.prefixJaccardJoin(corpus, blk, "text", t,
        stopworded = sw)
        .select("blk", "a_id", "b_id", "sim").as[(String, Long, Long, Double)]
        .collect().toSet
      assert(pref == exact, s"blk=$blk t=$t stopworded=$sw")
      assert(pref.nonEmpty)
    }
  }

  test("IVF-blocked near-dup is an exact-verified subset of the full sweep") {
    val emb = Tables.load(spark, sf, "embeddings")
    val full = Dedup.embeddingNearDup(emb, 0.35)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val blocked = Dedup.embeddingNearDupBlocked(emb, 0.35, probes = 2)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(blocked.nonEmpty)
    assert(blocked.subsetOf(full)) // exact verify: no false positives
    // identical vectors always share their nearest cell → always recalled
    val withDup = emb.limit(1)
      .select(lit(-1L).as("vec_id"), col("embedding"), col("label"))
      .unionByName(emb)
    val gotDup = Dedup.embeddingNearDupBlocked(withDup, 0.999, probes = 2)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(gotDup.exists(_._1 == -1L))
  }

  test("streaming windowed aggregation matches the batch equivalent") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val batchDf = Tables.load(spark, sf, "events")
      .select(col("ts"), col("event_type"), col("value"))
    val dir = java.nio.file.Files.createTempDirectory("evstream").toString
    batchDf.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(schema).parquet(dir)
    val agg = EventStream.windowedCounts(stream, "1 hour", "1 hour", "10 minutes")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("winout").start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.sql(
      """SELECT CAST(unix_timestamp(window.start) AS LONG) ws, event_type, cnt
        |FROM winout""".stripMargin)
      .as[(Long, String, Long)].collect().toSet
    val batch = EventStream.tumblingBatch(batchDf, 3600L)
      .select(col("window_start"), col("event_type"), col("cnt"))
      .as[(Long, String, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming sessionization matches batch twin on a bounded feed") {
    val evs = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("sec"))
      .as[EventStream.Ev]
    // batch twin
    val batch = EventStream.sessionizeBatch(Tables.load(spark, sf, "events"), 1800L)
      .select(col("user_id"), col("n_events"), col("duration_sec"))
      .as[(Long, Long, Long)].collect().sorted
    // stateful path (single micro-batch: all closed sessions must agree;
    // the trailing open session per user is not emitted, so compare the
    // closed prefix via multiset inclusion + count arithmetic)
    val streamed = EventStream.sessionizeStream(evs, 1800L)
      .select(col("user_id"), col("n_events"), col("duration_sec"))
      .as[(Long, Long, Long)].collect().sorted
    val batchSet = batch.groupBy(identity).map { case (k, v) => k -> v.size }
    val streamSet = streamed.groupBy(identity).map { case (k, v) => k -> v.size }
    // every emitted (closed) session appears in the batch result
    streamSet.foreach { case (k, n) =>
      assert(batchSet.getOrElse(k, 0) >= n, s"session $k missing from batch")
    }
    // exactly one trailing session per user remains unemitted
    val users = batch.map(_._1).distinct.length
    assert(batch.length - streamed.length == users)
  }

  test("foreachBatch streaming ingestion produces the batch pipeline's nodes") {
    import org.apache.spark.sql.types._
    val docsDf = Seq(
      (1L, "spark is fast. tables join quickly", "s1"),
      (2L, "fast is spark. quickly join tables", "s2"),
      (3L, "another doc entirely. with more text", "s1"))
      .toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("ingstream").toString
    docsDf.write.mode("overwrite").parquet(dir)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("source", StringType)))
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val q = spark.readStream.schema(schema).parquet(dir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val r = graft.pipeline.Ingestion.ingest(batch.sparkSession, batch)
        seen.addAndGet(r.nodes.count()): Unit
      }
      .start()
    q.processAllAvailable(); q.stop()
    val batchNodes = graft.pipeline.Ingestion.ingest(spark, docsDf).nodes.count()
    assert(seen.get() === batchNodes)
    assert(batchNodes > 0)
  }

  test("prefixPairs keeps pairs whose Jaccard equals the threshold exactly") {
    // FP-boundary regression: t=0.8 with |A|=28 ⊂ |B|=35 gives
    // J = 28/35 = 0.8 EXACTLY, but 0.8 is not double-representable —
    // lit(0.8)*35 = 28.000000000000004, so un-relaxed length/positional/
    // prefix bounds all flip on the equality and silently drop the pair
    // a >=-threshold caller (Dedup.ngramJaccard) must keep.
    val toksA = (1 to 28).map(i => f"t$i%02d")
    val toksB = (1 to 35).map(i => f"t$i%02d")
    val tokenized = Seq(("blk", 1L, toksA), ("blk", 2L, toksB))
      .toDF("blk", "id", "toks")
    val got = graft.semantic.SimilarityJoins.prefixPairs(tokenized, 0.8)
      .filter(col("sim") >= 0.8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("PriorityBatcher incremental flushes equal the batch twin's batches") {
    val evs = Tables.load(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("priority"), col("interval_bucket"), col("n_events"),
        col("batch_start_sec"), col("batch_end_sec"), col("sum_value"))
      .as[(Int, Long, Long, Long, Long, Double)].collect().toSeq
    val expected = key(EventStream.eventBatches(evs, 10, 3600L))
      .groupBy(identity).view.mapValues(_.size).toMap

    // ts-ordered delivery in 7 micro-batches (the event feed's order)
    val flushes = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, Long, Long, Long, Double)]
    var nFlushes = 0
    val pb = new EventStream.PriorityBatcher(10, 3600L,
      b => { flushes ++= key(b); nFlushes += 1 })
    val rows = evs.orderBy(col("ts"), col("event_id")).collect()
    rows.grouped((rows.length / 7) + 1).foreach { chunk =>
      pb.processBatch(spark.createDataFrame(
        spark.sparkContext.parallelize(chunk.toIndexedSeq), evs.schema))
    }
    pb.close()

    // contents parity: every flushed batch is a batch-twin batch and the
    // multisets agree exactly (batch_seq labels restart per flush, so
    // they are excluded from the key by construction)
    val got = flushes.groupBy(identity).view.mapValues(_.size).toMap
    assert(got == expected)
    // the stream actually flushed incrementally, not one blob at close()
    assert(nFlushes > 2, s"expected incremental flushes, got $nFlushes")
  }

  test("PriorityBatcher persists flushed batches to a parquet sink") {
    // the reference's _persist_event_batch (event_system.py:887-smallest
    // persistence handler): batches append to durable storage as they
    // flush; the handler is just a DataFrame sink — fully distributed
    val dir = java.nio.file.Files.createTempDirectory("evpersist").toString
    val evs = Tables.load(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val pb = new EventStream.PriorityBatcher(10, 3600L,
      b => b.write.mode("append").parquet(s"$dir/batches"))
    evs.orderBy(col("ts"), col("event_id")).collect()
      .grouped(400).foreach { chunk =>
        pb.processBatch(spark.createDataFrame(
          spark.sparkContext.parallelize(chunk.toIndexedSeq), evs.schema))
      }
    pb.close()
    val persisted = spark.read.parquet(s"$dir/batches")
    val expected = EventStream.eventBatches(evs, 10, 3600L)
    assert(persisted.count() === expected.count())
    assert(persisted.agg(sum("n_events")).head().getLong(0) === evs.count())
  }

  test("PriorityBatcher routes failed flushes to the dead-letter sink") {
    val evs = Tables.load(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .limit(200)
    var delivered = 0L
    var deadLettered = 0L
    var calls = 0
    val pb = new EventStream.PriorityBatcher(10, 3600L,
      handler = b => {
        calls += 1
        if (calls == 1) sys.error("sink down") // first flush fails
        delivered += b.count()
      },
      deadLetter = Some(b => deadLettered += b.count()))
    evs.orderBy(col("ts"), col("event_id")).collect().grouped(100).foreach { c =>
      pb.processBatch(spark.createDataFrame(
        spark.sparkContext.parallelize(c.toIndexedSeq), evs.schema))
    }
    pb.close()
    val total = EventStream.eventBatches(evs, 10, 3600L).count()
    assert(deadLettered > 0)              // the failed flush landed in the DLQ
    assert(delivered + deadLettered === total) // nothing lost, nothing doubled
  }

  test("multimodal stub pipeline computes byte statistics per item") {
    val media = Multimodal.synthesize(
      Seq((7L, "abc", 3L)).toDF("doc_id", "text", "n_chars"))
      .select(col("doc_id").as("docId"), col("payload"), col("meta"))
      .as[Multimodal.MediaRow]
    val f = Multimodal.extractFeatures(media).collect()(0)
    assert(f.docId == 7L && f.nBytes == 3)
    assert(math.abs(f.brightness - (97 + 98 + 99) / 3.0 / 255.0) < 1e-12)
  }

  test("phash16: exact integer bit rule, short payloads hash to 0, " +
      "near-identical payloads land within hamming 3") {
    // 16 bytes, one per block: blocks above the mean set their bit
    val asc = Array.tabulate(16)(i => (i * 16).toByte)
    val h = Multimodal.phash16(asc)
    // mean = 120; blocks 8..15 (values 128..240) exceed it
    assert(h == 0xFF00, f"ascending ramp hashes high half: got $h%04x")
    assert(Multimodal.phash16(Array[Byte](1, 2, 3)) == 0,
      "payloads under 16 bytes carry no hash")
    // flipping one block's bytes moves exactly that bit
    val mut = asc.clone(); mut(15) = 0
    val hm = Multimodal.phash16(mut)
    assert(Integer.bitCount(h ^ hm) <= 3,
      s"single-block edit stays within hamming 3: ${h ^ hm}")
    // determinism across calls
    assert(Multimodal.phash16(asc) == h)
  }
}
