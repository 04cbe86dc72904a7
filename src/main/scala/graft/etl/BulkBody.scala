package graft.etl

import org.json4s._
import org.json4s.jackson.JsonMethods

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The OpenSearch `_bulk` wire body parsed into the engine's CDC
  * batch shape — the write protocol the reference's ingestion
  * pipeline speaks to its OpenSearch sink
  * (custom_resource.py:319's Data Prepper pipeline flushes batched
  * `_bulk` requests; the engine-side contract it feeds is the same
  * `_doc_id`/`_action`/`_seq` frame [[CdcMerge]] consumes, so a bulk
  * body, a DynamoDB stream and a `_delete_by_query` all apply through
  * ONE merge implementation — the action surface of
  * custom_resource.py:350-351).
  *
  * Body grammar: newline-delimited JSON — an action line
  * (`{"index": {"_id": ...}}` | `{"create": {...}}` |
  * `{"delete": {...}}` | `{"update": {...}}`), where `index`/`create`
  * consume the NEXT line as the document source and `update` consumes
  * the NEXT line as `{"doc": {partial}}`. `_seq` is the body's item
  * order (OpenSearch applies bulk items in order per key; LWW
  * resolves the rest), offset by `startSeq` so successive bodies stay
  * monotonic.
  *
  * `update` is a partial-document READ-MODIFY-WRITE, so it cannot be
  * a pure body transform: [[applyBulk]] resolves each update ON THE
  * DRIVER against the current state (bulk bodies are request-sized by
  * protocol, so the touched-key point read is a bounded collect — the
  * same class as the engine's other wire-metadata reads) into a
  * whole-document upsert at the update's own `_seq`, folding the body
  * in order (an update sees the effect of earlier items in the same
  * body), then applies through the unchanged whole-document LWW
  * merge. Replay is idempotent: re-applying the same body re-reads
  * the already-merged state and re-derives the same documents, and
  * `_seq` LWW keeps any newer interleaved writes winning. [[parse]]
  * (the state-free form) still rejects `update` — it has no state to
  * read.
  *
  * Fail-loud contract (each a silent-corruption risk):
  *  - `update` of a missing or deleted document fails loud (the
  *    OpenSearch document_missing_exception, made all-or-nothing —
  *    per-item partial failure would be a silently half-applied body).
  *  - an explicit JSON null inside an update's partial doc fails loud:
  *    the column merge is coalesce(new, old), which cannot distinguish
  *    "absent" from "set to null" — send a whole-document `index`.
  *  - update options beyond `doc` (script, upsert, doc_as_upsert)
  *    fail loud.
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
  * index maintenance) is the existing distributed path. The update
  * resolution adds ONE semi-join point read of the touched keys —
  * O(body), never O(target).
  */
object BulkBody {

  private val reserved = Set("_doc_id", "_action", "_seq", "_deleted")

  private def bad(msg: String): Nothing = throw new IllegalArgumentException(msg)

  /** One parsed body item: id, action ∈ upsert|delete|update, source
    * (whole doc for upsert, partial doc for update, none for delete).
    */
  private final case class Item(id: JValue, action: String, src: Option[JObject])

  private def walk(body: String, allowUpdate: Boolean): Seq[Item] = {
    val lines = body.split("\n").map(_.trim).filter(_.nonEmpty)
    if (lines.isEmpty) bad("_bulk body is empty")

    def parseLine(s: String): JObject = JsonMethods.parse(s) match {
      case o: JObject => o
      case _          => bad(s"_bulk line must be a JSON object: $s")
    }
    def idOf(meta: JValue, action: String): JValue = meta match {
      case JObject(fields) =>
        val m = fields.toMap
        m.keySet.diff(Set("_id")).foreach(k =>
          bad(s"unsupported _bulk $action option '$k'"))
        m.getOrElse("_id", bad(s"_bulk $action needs _id " +
          "(auto-generated ids are nondeterministic)"))
      case other => bad(s"_bulk $action metadata must be an object: " +
        JsonMethods.compact(JsonMethods.render(other)))
    }
    def checkReserved(src: JObject): JObject = {
      src.obj.foreach { case (k, _) =>
        if (reserved(k)) bad(s"_bulk source carries reserved column '$k'")
      }
      src
    }

    val items = scala.collection.mutable.ArrayBuffer.empty[Item]
    var i = 0
    while (i < lines.length) {
      val JObject(af) = parseLine(lines(i))
      af match {
        case List((action @ ("index" | "create"), meta)) =>
          val id = idOf(meta, action)
          if (i + 1 >= lines.length)
            bad(s"_bulk $action at line ${i + 1} has no source line")
          items += Item(id, "upsert", Some(checkReserved(parseLine(lines(i + 1)))))
          i += 2
        case List(("delete", meta)) =>
          items += Item(idOf(meta, "delete"), "delete", None)
          i += 1
        case List(("update", meta)) =>
          if (!allowUpdate)
            bad("_bulk update is a partial-document read-modify-write; " +
              "apply the body through applyBulk (which reads current " +
              "state), or send a whole-document index")
          val id = idOf(meta, "update")
          if (i + 1 >= lines.length)
            bad(s"_bulk update at line ${i + 1} has no source line")
          val src = parseLine(lines(i + 1))
          val sm = src.obj.toMap
          sm.keySet.diff(Set("doc")).foreach(k =>
            bad(s"unsupported _bulk update body option '$k' (the engine " +
              "serves the partial-document `doc` form; script/upsert/" +
              "doc_as_upsert are out of scope)"))
          val partial = sm.get("doc") match {
            case Some(o: JObject) => checkReserved(o)
            case _ => bad("_bulk update source must be {\"doc\": {…}}")
          }
          if (partial.obj.isEmpty) bad("_bulk update doc is empty")
          partial.obj.foreach {
            case (k, JNull) => bad(s"_bulk update doc sets '$k' to null: " +
              "the column merge is coalesce(new, old), which cannot " +
              "distinguish absent from null - send a whole-document index")
            case _ => ()
          }
          items += Item(id, "update", Some(partial))
          i += 2
        case _ =>
          bad(s"_bulk action line must be one index|create|delete|update " +
            s"object, got: ${lines(i)}")
      }
    }

    // id homogeneity: a mixed body would silently promote to strings
    val numeric = items.map(_.id).map {
      case _: JInt    => true
      case _: JString => false
      case other => bad(s"_bulk _id must be an integer or string: " +
        JsonMethods.compact(JsonMethods.render(other)))
    }
    if (numeric.distinct.size > 1)
      bad("_bulk body mixes numeric and string _id values")
    items.toSeq
  }

  private def toFrame(spark: SparkSession, items: Seq[Item],
      startSeq: Long): DataFrame = {
    val jsonLines: Seq[String] = items.zipWithIndex.map {
      case (Item(id, action, src), idx) =>
        val meta = List(
          "_doc_id" -> id,
          "_action" -> JString(action),
          "_seq"    -> JInt(BigInt(startSeq + idx)))
        JsonMethods.compact(JsonMethods.render(
          JObject(meta ++ src.map(_.obj).getOrElse(Nil))))
    }
    import spark.implicits._
    spark.read.json(spark.createDataset(jsonLines))
  }

  /** State-free parse: index/create/delete only (update needs state —
    * use [[applyBulk]]).
    */
  def parse(spark: SparkSession, body: String, startSeq: Long = 0L): DataFrame =
    toFrame(spark, walk(body, allowUpdate = false), startSeq)

  /** Apply a bulk body — including partial-document `update` actions —
    * to a CDC state frame (`_doc_id`, `_seq`, `_deleted` + payload),
    * returning the new state. Updates resolve on the driver: the
    * touched keys' live documents are point-read (bounded by body
    * size), the body folds in order (later items see earlier ones),
    * and each update becomes a whole-document upsert at its own
    * `_seq` — so the distributed merge stays the ONE whole-document
    * LWW implementation.
    */
  def applyBulk(spark: SparkSession, state: DataFrame, body: String,
      startSeq: Long): DataFrame = {
    val items = walk(body, allowUpdate = true)
    val updateIds: Seq[JValue] = items.collect {
      case Item(id, "update", _) => id
    }
    if (updateIds.isEmpty)
      return CdcMerge.applyBatch(state, toFrame(spark, items, startSeq))

    // The update path round-trips touched documents through JSON
    // (toJSON point read → merged doc → spark.read.json), so payload
    // types that JSON cannot represent losslessly would come back
    // RETYPED — and unionByName would then silently widen the WHOLE
    // state column (a timestamp column becoming string with two
    // different renderings, say). Fail loud instead: the bulk-update
    // arm serves JSON-native payloads; anything else updates by
    // whole-document `index` (or the typed CDC stream).
    {
      import org.apache.spark.sql.types._
      def jsonNative(dt: DataType): Boolean = dt match {
        case LongType | DoubleType | StringType | BooleanType => true
        case ArrayType(e, _)  => jsonNative(e)
        case StructType(fs)   => fs.forall(f2 => jsonNative(f2.dataType))
        case _                => false
      }
      state.schema.fields
        .filterNot(f2 => Set("_doc_id", "_seq", "_deleted")(f2.name))
        .foreach { f2 =>
          if (!jsonNative(f2.dataType))
            bad(s"_bulk update cannot serve a state with payload column " +
              s"'${f2.name}: ${f2.dataType.simpleString}' - the partial-" +
              "document merge round-trips documents through JSON, which " +
              "would silently retype it (JSON-native payloads only: " +
              "bigint/double/string/boolean and arrays/structs of those; " +
              "send a whole-document index instead)")
        }
    }

    def idKey(v: JValue): String = v match {
      case JInt(i)    => i.toString
      case JString(s) => s
      case other      => bad(s"_bulk _id: ${JsonMethods.compact(JsonMethods.render(other))}")
    }
    // point-read the touched keys' live docs: a bounded collect —
    // bulk bodies are request-sized by protocol
    val keyVals: Seq[Any] = updateIds.map {
      case JInt(i)    => i.toLong
      case JString(s) => s
      case _          => bad("unreachable")
    }
    val current: Map[String, JObject] = state
      .filter(!col("_deleted"))
      .filter(col("_doc_id").isin(keyVals: _*))
      .drop("_seq", "_deleted")
      .toJSON.collect()
      .map { s =>
        val JObject(fields) = JsonMethods.parse(s)
        val m = fields.toMap
        val id = m("_doc_id") match {
          case JInt(i)     => i.toString
          case JString(v)  => v
          case JDouble(d)  => // Spark toJSON renders integral longs plainly;
            // a double id would be a schema the id-homogeneity rule
            // already forbids — defensive only
            if (d == d.floor) d.toLong.toString else d.toString
          case other => bad(s"state _doc_id: ${JsonMethods.compact(JsonMethods.render(other))}")
        }
        id -> JObject(fields.filterNot(_._1 == "_doc_id"))
      }.toMap

    // fold the body in order: updates see earlier same-body items
    val live = scala.collection.mutable.Map[String, Option[JObject]]()
    def baseOf(k: String): Option[JObject] =
      live.getOrElse(k, current.get(k))
    val resolved: Seq[Item] = items.map {
      case it @ Item(id, "upsert", Some(src)) =>
        live(idKey(id)) = Some(src); it
      case it @ Item(id, "delete", None) =>
        live(idKey(id)) = None; it
      case Item(id, "update", Some(partial)) =>
        val k = idKey(id)
        val base = baseOf(k).getOrElse(bad(
          s"_bulk update of missing or deleted document _id=$k " +
            "(document_missing - send index to create)"))
        // column merge: partial fields override, the rest carry over —
        // coalesce(new, old) per touched column, LWW per _seq
        val merged = JObject(
          base.obj.filterNot { case (bk, _) =>
            partial.obj.exists(_._1 == bk) } ++ partial.obj)
        live(k) = Some(merged)
        Item(id, "upsert", Some(merged))
      case other => bad(s"unreachable item shape: $other")
    }
    CdcMerge.applyBatch(state, toFrame(spark, resolved, startSeq))
  }
}
