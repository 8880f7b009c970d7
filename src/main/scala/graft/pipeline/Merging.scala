package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

/** Node-data merge helpers beyond the aggregate rules in
  * MutationQueries.q52 (ratings→max, tags→set-union, sources→"; "-union):
  * the reference's `extra_metadata` DEEP merge
  * (ingestion/merging.py `_deep_merge_dicts`, asserted by
  * tests/test_merging.py:24-110) — nested dicts merge recursively, the
  * NEW side wins for scalar/array conflicts.
  *
  * JSON is parsed with Jackson (already on Spark's classpath) inside a
  * typed Dataset map — an ingest-time operation over one row per merge
  * group, not a hot query path. Output keys are sorted for
  * determinism. */
object Merging {

  private val mapper = new ObjectMapper()

  /** Recursive dict merge, `b` precedence (merging.py _deep_merge_dicts):
    * keys only in `a` survive, keys only in `b` are added, keys in both
    * merge recursively when BOTH sides are objects, otherwise `b` wins.
    * Non-object or unparseable inputs: `b` if it parses, else `a`. */
  def deepMergeJson(a: String, b: String): String = {
    def parse(s: String): Option[JsonNode] =
      try Option(mapper.readTree(s)) catch { case _: Exception => None }
    def merge(x: JsonNode, y: JsonNode): JsonNode = (x, y) match {
      case (xo: ObjectNode, yo: ObjectNode) =>
        val out = mapper.createObjectNode()
        val keys = (xo.fieldNames().asScala() ++ yo.fieldNames().asScala())
          .distinct.sorted
        keys.foreach { k =>
          (Option(xo.get(k)), Option(yo.get(k))) match {
            case (Some(xv), Some(yv)) => out.set[JsonNode](k, merge(xv, yv))
            case (Some(xv), None) => out.set[JsonNode](k, xv)
            case (None, yv) => out.set[JsonNode](k, yv.orNull)
          }
          ()
        }
        out
      case (_, yv) => yv // b precedence for non-object conflicts
    }
    (parse(a), parse(b)) match {
      case (Some(x), Some(y)) => mapper.writeValueAsString(merge(x, y))
      case (_, Some(y)) => mapper.writeValueAsString(y)
      case (Some(x), None) => mapper.writeValueAsString(x)
      case _ => a
    }
  }

  // Iterator ergonomics for Jackson's java.util.Iterator
  private implicit class JIter[T](private val it: java.util.Iterator[T]) {
    def asScala(): Seq[T] = {
      val b = Seq.newBuilder[T]
      while (it.hasNext) b += it.next()
      b.result()
    }
  }

  /** Per-group metadata merge: fold each group's JSON metadata strings
    * in (orderCol) ascending order through `deepMergeJson`, so later
    * entries take precedence exactly like the reference's
    * merge-into-existing sequence. Returns (keyCol, merged_metadata). */
  def mergeGroupMetadata(df: DataFrame, keyCol: String, orderCol: String,
      jsonCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string").as("k"),
        col(orderCol).cast("long").as("o"), col(jsonCol).as("j"))
      .groupBy(col("k"))
      .agg(array_sort(collect_list(struct(col("o"), col("j")))).as("ordered"))
      .select(col("k"),
        expr("transform(ordered, p -> p.j)").as("jsons"))
      .as[(String, Seq[String])]
      .map { case (k, jsons) =>
        (k, jsons.reduceLeft(deepMergeJson))
      }
      .toDF(keyCol, "merged_metadata")
  }
}
