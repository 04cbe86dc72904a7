package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DynamoDB typed-attribute-value ("DDB-JSON") decoding — operator T1
  * of SURVEY.md §2.3.
  *
  * Every attribute of an exported item is a 1-entry map `{tag: value}`
  * with tags S/N/BOOL/NULL/B/SS/NS/BS/L/M (reference corpus:
  * /root/reference/assets/dynamodb-data/table-data.json:3-5 for S,
  * :100-106 for N-as-string, :96-97 for BOOL, and the empty `__id: {}`
  * placeholder at :33 that the reference strips before writing,
  * assets/custom_resource.py:146-147).
  *
  * Decoding is a per-row `Column` composition (struct field access +
  * coalesce/cast) — fully codegen'd, no UDF, no shuffle: at 100 TB this
  * is a map-only pass fused into the scan.
  */
object DdbJson {

  /** Decoded nesting depth for `L`/`M`. DynamoDB itself caps nesting at
    * 32 levels; real single-table items rarely exceed 3–4. Levels past
    * the cap read as null (the raw JSON still holds them — re-read with
    * `attrValueSchemaAt(moreDepth)` recovers deeper trees losslessly).
    */
  val maxNestingDepth = 4

  /** Envelope for one typed attribute value, recursive to `depth`:
    * `L` is an array of typed values, `M` a map of them (the full
    * DDB-JSON encoding — items nest routinely in single-table designs).
    */
  def attrValueSchemaAt(depth: Int): StructType = {
    val scalars = Seq(
      StructField("S", StringType),
      StructField("N", StringType), // DynamoDB numbers are arbitrary-precision strings
      StructField("BOOL", BooleanType),
      StructField("NULL", BooleanType),
      StructField("B", StringType), // base64
      StructField("SS", ArrayType(StringType)),
      StructField("NS", ArrayType(StringType)),
      StructField("BS", ArrayType(StringType)))
    val nested =
      if (depth <= 0) Nil
      else Seq(
        StructField("L", ArrayType(attrValueSchemaAt(depth - 1))),
        StructField("M", MapType(StringType, attrValueSchemaAt(depth - 1))))
    StructType(scalars ++ nested)
  }

  val attrValueSchema: StructType = attrValueSchemaAt(maxNestingDepth)

  /** A raw item: attribute name → typed value. */
  val itemSchema: MapType = MapType(StringType, attrValueSchema)

  /** DynamoDB S3 export line format: `{"Item": {…typed attrs…}}`.
    * `_corrupt` captures unparseable lines (PERMISSIVE mode) so they
    * reach the DLQ instead of vanishing — the S6 contract.
    */
  val exportLineSchema: StructType =
    StructType(Seq(
      StructField("Item", itemSchema),
      StructField("_corrupt", StringType)))

  /** Change-stream event (harness shape of a DynamoDB Streams record
    * with NEW_IMAGE view, table-attributes.json:74-77): op kind, key
    * images, new image, and a monotonic sequence for per-key ordering.
    */
  val changeEventSchema: StructType = StructType(Seq(
    StructField("eventName", StringType), // INSERT | MODIFY | REMOVE
    StructField("Keys", itemSchema),
    StructField("NewImage", itemSchema),
    StructField("SequenceNumber", LongType),
    StructField("ApproximateCreationDateTime", LongType))) // epoch seconds

  /** Batch read of a DynamoDB S3 export (S1): JSON-lines of Item
    * envelopes. Explicit schema — no inference pass over 100 TB.
    *
    * Two layouts:
    *  - harness/flat: plain JSON-lines files at `path`;
    *  - real PITR export: `AWSDynamoDB/<exportId>/manifest-files.json`
    *    naming gzipped data files under `data/` (the prefix the
    *    reference points its pipeline at, custom_resource.py:333-336).
    *    The manifest governs — partial/aborted uploads sitting next to
    *    listed files are not read. Gzip is handled by the codec layer;
    *    the manifest itself is tiny metadata (one line per data file),
    *    so driver-side resolution is not a scale concern.
    */
  def readExport(spark: SparkSession, path: String): DataFrame = {
    val dataPaths = exportDataFiles(spark, path).getOrElse(Seq(path))
    spark.read.schema(exportLineSchema)
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(dataPaths: _*)
      .select(col("Item").as("item"), col("_corrupt"))
      // corrupt lines (truncated upload, stray log text) carry the raw
      // line in _corrupt and flow to the DLQ; only rows with neither a
      // parsed item nor raw text (valid JSON of a foreign shape) drop
      .filter(col("item").isNotNull || col("_corrupt").isNotNull)
  }

  /** Resolve a PITR export's manifest (at `path` or one level under
    * `path/AWSDynamoDB/<id>/`) to its data-file paths; None = no
    * manifest, read `path` as flat JSON lines. Uses the Hadoop FS API,
    * so the same resolution works against object stores on a cluster.
    */
  private def exportDataFiles(spark: SparkSession, path: String): Option[Seq[String]] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return None
    val direct = new Path(root, "manifest-files.json")
    val nested = fs.globStatus(new Path(root, "AWSDynamoDB/*/manifest-files.json"))
    val manifest =
      if (fs.exists(direct)) Some(direct)
      else Option(nested).toSeq.flatten.headOption.map(_.getPath)
    manifest.map { mf =>
      val keys = spark.read
        .schema(StructType(Seq(StructField("dataFileS3Key", StringType))))
        .json(mf.toString)
        .collect().map(_.getString(0)).filter(_ != null).toSeq
      keys.map { k =>
        // keys are bucket-relative ("AWSDynamoDB/<id>/data/x.json.gz");
        // resolve against the export root, else against the manifest dir
        val atRoot = new Path(root, k)
        if (fs.exists(atRoot)) atRoot.toString
        else new Path(mf.getParent, k.split("/").takeRight(2).mkString("/")).toString
      }
    }
  }

  /** True iff a typed value carries no tag at all (the `__id: {}`
    * dirty-data case) — P4 cleanup drops these.
    */
  private def isEmptyAttr(v: Column): Column =
    v.getField("S").isNull && v.getField("N").isNull &&
      v.getField("BOOL").isNull && v.getField("NULL").isNull &&
      v.getField("B").isNull && v.getField("SS").isNull &&
      v.getField("NS").isNull && v.getField("BS").isNull &&
      v.getField("L").isNull && v.getField("M").isNull

  /** P4: strip attributes whose typed value is empty (generalizes the
    * reference's `del item['__id']`, custom_resource.py:146-147).
    */
  def dropEmptyAttrs(item: Column): Column =
    map_filter(item, (_, v) => !isEmptyAttr(v))

  /** Decode an attribute to its natural string form: S as-is, N's
    * digits, BOOL as true/false. (Per-entity schemas then cast.) */
  def attrString(item: Column, name: String): Column = {
    val v = item.getItem(name)
    coalesce(v.getField("S"), v.getField("N"), v.getField("BOOL").cast("string"))
  }

  /** Decode a numeric attribute. DynamoDB `N` is an arbitrary-precision
    * decimal string; lenient: falls back to a numeric-looking `S`
    * (the dataset's `number` field is N on flights but S on assignments
    * — table-data.json:106 vs the assignment item at :376-419).
    */
  def attrDecimal(item: Column, name: String): Column = {
    val v = item.getItem(name)
    coalesce(v.getField("N"), v.getField("S")).cast(DecimalType(38, 18))
  }

  def attrLong(item: Column, name: String): Column =
    attrDecimal(item, name).cast("long")

  def attrBool(item: Column, name: String): Column =
    item.getItem(name).getField("BOOL")

  def attrTimestamp(item: Column, name: String): Column =
    to_timestamp(attrString(item, name)) // ISO-8601 like "2021-08-01T23:59:59"

  def attrStringArray(item: Column, name: String): Column = {
    val v = item.getItem(name)
    coalesce(v.getField("SS"), parseStringifiedList(v.getField("S")))
  }

  /** Parse the corpus's stringified collections — `"[wheelchair, vegan]"`
    * (table-data.json:715) and `"{DEN, SFO}"` (:271) — into arrays.
    * Empty list `"[]"` → empty array; non-list strings → null.
    */
  def parseStringifiedList(s: Column): Column =
    when(s.rlike("^[\\[{].*[\\]}]$"),
      filter(
        split(regexp_replace(s, "^[\\[{]\\s*|\\s*[\\]}]$", ""), ",\\s*"),
        t => t =!= ""))

  /** JSON-quote a string column, escaping via `to_json` of a 1-element
    * array (`["a\"b"]` minus the brackets) — no hand-rolled escaper.
    */
  private def jsonStr(c: Column): Column = {
    val arr = to_json(array(c))
    when(c.isNotNull, arr.substr(lit(2), length(arr) - 2))
  }

  private def jsonArr(elems: Column): Column =
    when(elems.isNotNull,
      concat(lit("["), array_join(elems, ",", "null"), lit("]")))

  /** Render one typed value as plain (untyped) JSON text — the document
    * shape the reference actually indexes (Data Prepper strips the type
    * tags before the bulk write, custom_resource.py:344-356). Recursive
    * over `L`/`M` to `depth`; an empty/undecodable attr renders null.
    *
    * Uses HOF `transform` on the nested branches (interpreted, not
    * codegen'd) — linear per value, so still a map-only decode pass;
    * the scalar fast paths stay in codegen.
    */
  def plainJson(v: Column, depth: Int = maxNestingDepth): Column = {
    val scalars = Seq(
      jsonStr(v.getField("S")),
      v.getField("N"), // raw JSON number text, precision preserved
      when(v.getField("BOOL").isNotNull, v.getField("BOOL").cast("string")),
      when(v.getField("NULL") === true, lit("null")),
      jsonStr(v.getField("B")),
      jsonArr(transform(v.getField("SS"), jsonStr(_))),
      jsonArr(v.getField("NS")),
      jsonArr(transform(v.getField("BS"), jsonStr(_))))
    val nested =
      if (depth <= 0) Nil
      else Seq(
        jsonArr(transform(v.getField("L"), e => plainJson(e, depth - 1))),
        when(v.getField("M").isNotNull,
          concat(lit("{"),
            array_join(
              transform(map_entries(v.getField("M")), e =>
                concat(jsonStr(e.getField("key")), lit(":"),
                  coalesce(plainJson(e.getField("value"), depth - 1), lit("null")))),
              ","),
            lit("}"))))
    coalesce(scalars ++ nested: _*)
  }

  /** Render a whole item as one untyped JSON document (what the sink
    * indexes): `{"PK":"LAX","price":42.5,"meta":{"tags":["a"]}}`.
    */
  def itemPlainJson(item: Column): Column =
    when(item.isNotNull,
      concat(lit("{"),
        array_join(
          transform(map_entries(item), e =>
            concat(jsonStr(e.getField("key")), lit(":"),
              coalesce(plainJson(e.getField("value")), lit("null")))),
          ","),
        lit("}")))

  /** T2: stable document id = PK + "#" + SK (the pipeline's
    * `getMetadata("primary_key")`, custom_resource.py:350).
    */
  def docId(pk: Column, sk: Column): Column = concat_ws("#", pk, sk)

  /** T3: stream event kind → sink action (`opensearch_action`,
    * custom_resource.py:351): REMOVE → delete, INSERT/MODIFY → upsert.
    */
  def action(eventName: Column): Column =
    when(eventName === "REMOVE", lit("delete")).otherwise(lit("upsert"))

  /** Decode the generic columns every routed entity carries; a
    * `_corrupt` column (raw text of unparseable lines) passes through
    * so the DLQ can record it.
    */
  def decodeCommon(df: DataFrame): DataFrame = {
    val item = dropEmptyAttrs(col("item"))
    val corrupt =
      if (df.columns.contains("_corrupt")) Seq(col("_corrupt")) else Nil
    df.select(Seq(
      attrString(item, "PK").as("PK"),
      attrString(item, "SK").as("SK"),
      attrString(item, "type").as("type"),
      item.as("item")) ++ corrupt: _*)
      .withColumn("_doc_id", docId(col("PK"), col("SK")))
  }
}
