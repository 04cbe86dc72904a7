package graft.etl

import org.json4s._
import org.json4s.jackson.JsonMethods

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The OpenSearch `_bulk` wire body parsed into the engine's CDC
  * batch shape — the write protocol the reference's ingestion
  * pipeline speaks to its OpenSearch sink
  * (custom_resource.py:319's Data Prepper pipeline flushes batched
  * `_bulk` requests; the engine-side contract it feeds is the same
  * `_doc_id`/`_action`/`_seq` frame [[CdcMerge]] consumes, so a bulk
  * body, a DynamoDB stream and a `_delete_by_query` all apply through
  * ONE merge implementation).
  *
  * Body grammar: newline-delimited JSON — an action line
  * (`{"index": {"_id": ...}}` | `{"create": {...}}` |
  * `{"delete": {...}}`), where `index`/`create` consume the NEXT line
  * as the document source. `_seq` is the body's item order
  * (OpenSearch applies bulk items in order per key; LWW resolves the
  * rest), offset by `startSeq` so successive bodies stay monotonic.
  *
  * Fail-loud contract (each a silent-corruption risk):
  *  - `update` is rejected: it is a partial-document read-modify-write;
  *    the LWW merge contract is whole-document — send `index`.
  *  - `_id` is required: OpenSearch auto-ids are nondeterministic.
  *  - ids must be homogeneously numeric or string — a mixed body would
  *    make Spark's JSON reader silently promote keys to strings.
  *  - source docs must not carry the reserved `_doc_id`/`_action`/
  *    `_seq`/`_deleted` columns.
  *
  * Scale: the parse is driver-side — bulk bodies are request-sized by
  * protocol (the sink flushes bounded batches); the OUTPUT is a
  * DataFrame (payload columns typed by Spark's JSON reader like any
  * ingest), and everything downstream (the merge, the touched-bucket
  * index maintenance) is the existing distributed path.
  */
object BulkBody {

  private val reserved = Set("_doc_id", "_action", "_seq", "_deleted")

  def parse(spark: SparkSession, body: String, startSeq: Long = 0L): DataFrame = {
    def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)
    val lines = body.split("\n").map(_.trim).filter(_.nonEmpty)
    if (lines.isEmpty) fail("_bulk body is empty")

    def parseLine(s: String): JObject = JsonMethods.parse(s) match {
      case o: JObject => o
      case other => fail(s"_bulk line must be a JSON object: $s")
    }
    def idOf(meta: JValue, action: String): JValue = meta match {
      case JObject(fields) =>
        val m = fields.toMap
        m.keySet.diff(Set("_id")).foreach(k =>
          fail(s"unsupported _bulk $action option '$k'"))
        m.getOrElse("_id", fail(s"_bulk $action needs _id " +
          "(auto-generated ids are nondeterministic)"))
      case other => fail(s"_bulk $action metadata must be an object: " +
        JsonMethods.compact(JsonMethods.render(other)))
    }

    // walk the action/source line pairs
    val items = scala.collection.mutable.ArrayBuffer.empty[(JValue, String, Option[JObject])]
    var i = 0
    while (i < lines.length) {
      val JObject(af) = parseLine(lines(i))
      af match {
        case List((action @ ("index" | "create"), meta)) =>
          val id = idOf(meta, action)
          if (i + 1 >= lines.length)
            fail(s"_bulk $action at line ${i + 1} has no source line")
          val src = parseLine(lines(i + 1))
          src.obj.foreach { case (k, _) =>
            if (reserved(k))
              fail(s"_bulk source carries reserved column '$k'")
          }
          items += ((id, "upsert", Some(src)))
          i += 2
        case List(("delete", meta)) =>
          items += ((idOf(meta, "delete"), "delete", None))
          i += 1
        case List(("update", _)) =>
          fail("_bulk update is a partial-document read-modify-write; " +
            "the whole-document LWW contract needs index")
        case other =>
          fail(s"_bulk action line must be one index|create|delete " +
            s"object, got: ${lines(i)}")
      }
    }

    // id homogeneity: a mixed body would silently promote to strings
    val numeric = items.map(_._1).map {
      case _: JInt    => true
      case _: JString => false
      case other => fail(s"_bulk _id must be an integer or string: " +
        JsonMethods.compact(JsonMethods.render(other)))
    }
    if (numeric.distinct.size > 1)
      fail("_bulk body mixes numeric and string _id values")

    val jsonLines: Seq[String] = items.zipWithIndex.map {
      case ((id, action, src), idx) =>
        val meta = List(
          "_doc_id" -> id,
          "_action" -> JString(action),
          "_seq"    -> JInt(BigInt(startSeq + idx)))
        JsonMethods.compact(JsonMethods.render(
          JObject(meta ++ src.map(_.obj).getOrElse(Nil))))
    }.toSeq
    import spark.implicits._
    spark.read.json(spark.createDataset(jsonLines))
  }
}
