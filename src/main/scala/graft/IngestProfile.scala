package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev main: attributes the ingestion-artifact build cost (the
  * BENCH_RESULT `ingest_*` rows) to its internal legs, so optimization
  * targets the measured dominant step instead of a guess — the round-12
  * verdict's item 4 surface (at sf2 the four builds cost ~740 s vs the
  * whole headline query set's ~400 s).
  *
  * Usage: runMain graft.IngestProfile [sfDir] [leg,leg,...] — prints
  * one `[profile] <leg> <secs>` line per leg (stderr) and a compact
  * JSON summary (stdout). Read-only; builds the same artifacts the
  * bench warm-up builds, in the same order. The optional leg filter
  * runs a subset — a filtered leg absorbs its skipped dependencies'
  * build cost (artifacts resolve on demand), so filtered timings are
  * upper bounds.
  */
object IngestProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ingest-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // A/B knob: let AQE start shuffles wide and coalesce by size, so
    // per-partition volume stays bounded as the scale factor grows
    // (the fixed-32 layout is the super-linear-ingest suspect)
    sys.env.get("SPARK_GRAFT_INIT_PARTS").foreach(p => b.config(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum", p))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.quietAuditedWarnings()
    val only = args.lift(1).map(_.split(",").map(_.trim).toSet)
    val out = scala.collection.mutable.LinkedHashMap[String, Double]()
    def time(name: String)(body: => Unit): Unit = {
      if (only.exists(!_.contains(name))) return
      val t0 = System.nanoTime(); body
      val t = (System.nanoTime() - t0) / 1e9
      out(name) = t
      System.err.println(f"[profile] $name%-28s $t%8.2f s")
    }
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())

    // kgraph family
    time("kgraph_base") {
      graft.graph.KGraph.materialized(spark, sfDir).count()
    }
    time("kgraph_oriented_x3") {
      Seq(graft.graph.GraphOps.Incoming, graft.graph.GraphOps.Outgoing,
        graft.graph.GraphOps.Both).foreach(d =>
        graft.graph.KGraph.orientedMaterialized(spark, sfDir, d).count())
    }
    time("kgraph_canonical") {
      graft.graph.KGraph.canonicalMaterialized(spark, sfDir).count()
    }
    time("kgraph_rank_index") {
      graft.graph.KGraph.rankEdgesMaterialized(spark, sfDir).count()
      graft.graph.KGraph.nodeSetMaterialized(spark, sfDir).count()
    }
    // dedup family, leg by leg (the internal steps of
    // DedupIndex.candidatePairs / simhashPairs)
    val docs = Tables.load(spark, sfDir, "documents")
    time("dedup_minhash_sigs") {
      import graft.engine.Lineage.LineageOps
      docs.select(col("doc_id"),
        graft.text.TextFunctions.minhashSignature(col("text"),
          graft.dedup.DedupIndex.K).as("sig"))
        .truncateLineage().count()
    }
    // candidate generation alone (band bucket join + pair distinct,
    // no signature scoring): attributes dedup_pairs_total between the
    // candidate sweep and the estimate joins
    time("dedup_cand_only") {
      import graft.dedup.DedupIndex.{K, Bands}
      val sig = graft.dedup.DedupIndex.signatures(spark, sfDir)
        .select(col("id"), col("sig"))
      val r = K / Bands
      val banded = sig.select(col("id"),
        posexplode(expr(
          s"transform(sequence(0, ${Bands - 1}), b -> " +
            s"xxhash64(concat_ws('#', cast(b as string), slice(sig, b * $r + 1, $r))))"))
          .as(Seq("band", "bucket")))
        .select(col("id"), col("bucket"))
      banded.select(col("bucket"), col("id").as("a_id"))
        .join(banded.select(col("bucket"), col("id").as("b_id")), "bucket")
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"))
        .distinct()
        .count(): Unit
    }
    time("dedup_pairs_total") {
      graft.dedup.DedupIndex.candidatePairs(spark, sfDir).count()
    }
    time("dedup_clusters") {
      graft.dedup.DedupIndex.clusters(spark, sfDir).count()
    }
    time("dedup_simhash_pairs") {
      graft.dedup.DedupIndex.simhashPairs(spark, sfDir).count()
    }
    // graph projections + censuses
    time("copurchase_canon") {
      graft.queries.GraphAnalyticsQueries.copurchaseCanon(spark, sfDir)
        .count()
    }
    time("census_copurchase") {
      graft.queries.GraphAnalyticsQueries.copurchaseSupport(spark, sfDir)
        .count()
    }
    time("census_kgraph") {
      graft.graph.KGraph.supportMaterialized(spark, sfDir).count()
    }
    val json = out.map { case (k, v) => s""""$k":${f"$v%.2f"}""" }
      .mkString("{", ",", "}")
    try spark.stop() catch { case _: Throwable => }
    println(s"""{"metric":"ingest_profile","sf":"$sfDir","legs":$json}""")
  }
}
