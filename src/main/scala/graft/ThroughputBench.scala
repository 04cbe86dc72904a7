package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.etl.{DdbJson, IngestPipeline}
import graft.streaming.CdcStream

/** Measures the two BASELINE.md targets that are rates, not latencies:
  *
  *   - **ingest throughput** — the full batch path (S1→T1→P1→S5:
  *     export read, typed-attribute decode, route, per-entity sorted
  *     parquet write + DLQ) over a generated reference-shaped export,
  *     reported as items/s;
  *   - **CDC merge throughput** — the REAL streaming loop
  *     ([[CdcStream.start]]: file source → decode → `foreachBatch`
  *     keyed LWW merge with checkpointing), fed one epoch file at a
  *     time, reported as events/s end-to-end (includes source-file
  *     production and snapshot rewrite per epoch — the whole loop a
  *     deployment pays, not just the merge kernel).
  *
  * Item/event shapes follow the reference's single-table airline
  * design with freshly made-up values (the [[graft.etl.Fixtures]]
  * doctrine); generation is distributed (ingest) or bounded per epoch
  * (CDC) and generation of the ingest corpus is NOT inside the timed
  * window.
  *
  *   - **streamed-index throughput** — the reference's ACTUAL program
  *     shape end-to-end ([[graft.streaming.StreamingSearchIndex]]):
  *     one CDC file stream drives BOTH the BM25 text index and the
  *     IVF vector index per micro-batch (bootstrap build on the first
  *     epoch, touched-partition merges thereafter), reported as
  *     events/s over the whole loop plus the per-epoch p95 — the
  *     number that tells a deployment what steady-state maintenance
  *     costs, not just the one-time build.
  *
  *   - **fractional-touch streamed-index throughput** — the same text
  *     maintenance loop in the LARGE-VOCABULARY regime the 100 TB
  *     claim rests on: a 50k-word vocabulary over 512 term buckets,
  *     run TWICE at identical bucket count and event rate — once with
  *     epochs drawing 4000 distinct words (~every bucket touched, the
  *     control) and once with 40 (<10% touched, the production
  *     regime) — so the per-epoch cost difference isolates the
  *     touched fraction from everything else (bucket count, batch
  *     size, fixed micro-batch overhead). Touched buckets are
  *     measured with the engine's own hash, not assumed.
  *
  *   - **concurrent serving** — N worker threads firing mixed
  *     `_search` (BM25-indexed + table-path bool/agg) and `_msearch`
  *     requests with per-request parameter variation against the
  *     maintained index (the dashboard fan-in shape), at N ∈
  *     {1, 8, 32}: requests/s + p95 request latency — the row that
  *     exposes driver-side compile contention before a deployment
  *     does.
  *
  * Usage: `runMain graft.ThroughputBench [items] [epochs] [eventsPerEpoch]
  * [sidxEpochs] [sidxPerEpoch] [fracEpochs] [fracPerEpoch] [servReqs]`;
  * prints one JSON line and writes `throughput_last.json`.
  */
object ThroughputBench {

  /** Reference-shaped items, ~50/50 fare/flight plus a 1/1000 DLQ
    * ration (missing PK → undecodable, must land in the DLQ without
    * stalling the pipeline). Generated via one distributed projection.
    */
  private def writeExport(spark: SparkSession, dir: String, items: Long): Unit =
    spark.range(items).select(
      when(col("id") % 1000 === 999,
        // malformed: no PK — exercises the decode DLQ path at rate
        lit("""{"Item": {"SK": {"S": "orphan#1"}, "type": {"S": "fare"}, "__id": {}}}"""))
      .when(col("id") % 2 === 0, format_string(
        """{"Item": {"PK": {"S": "O%1$d"}, "SK": {"S": "D%1$d#2023-05-07T23:59:59#nonstop"}, "type": {"S": "fare"}, "origin": {"S": "O%1$d"}, "dest": {"S": "D%1$d"}, "start": {"S": "2023-05-01T00:00:00"}, "end": {"S": "2023-05-07T23:59:59"}, "class": {"S": "nonstop"}, "GSI1PK": {"S": "D%1$d"}, "GSI1SK": {"S": "O%1$d#2023-05-01T00:00:00"}, "__id": {}}}""",
        col("id")))
      .otherwise(format_string(
        """{"Item": {"PK": {"S": "O%1$d"}, "SK": {"S": "O%1$d#2023-05-02T09:15:00#%2$d#1"}, "type": {"S": "flight"}, "origin": {"S": "O%1$d"}, "dest": {"S": "D%1$d"}, "depart": {"S": "2023-05-02T09:15:00"}, "arrive": {"S": "2023-05-02T11:45:00"}, "number": {"N": "%2$d"}, "segId": {"N": "1"}, "GSI2PK": {"S": "%2$d"}, "GSI2SK": {"S": "1"}, "__id": {}}}""",
        col("id"), col("id") % 900))
      .as("value"))
      .repartition(32)
      .write.mode("overwrite").text(dir)

  /** One epoch of change events as a JSON-lines file: `n` events over
    * `keys` distinct doc ids (so LWW actually overwrites), ~1/20
    * REMOVE, sequence numbers globally increasing.
    */
  private def writeEpochFile(dir: String, epoch: Int, n: Int, keys: Int): Unit = {
    val sb = new StringBuilder(n * 220)
    var i = 0
    while (i < n) {
      val k = (epoch * 31 + i) % keys
      val seq = epoch.toLong * n + i
      val name = if (i % 20 == 19) "REMOVE" else "MODIFY"
      sb.append(s"""{"eventName": "$name", "Keys": {"PK": {"S": "K$k"}, "SK": {"S": "S$k"}}, """)
      sb.append(s""""NewImage": {"PK": {"S": "K$k"}, "SK": {"S": "S$k"}, "type": {"S": "fare"}, "class": {"S": "v$epoch"}}, """)
      sb.append(s""""SequenceNumber": $seq, "ApproximateCreationDateTime": ${1700000000L + seq}}""")
      sb.append('\n')
      i += 1
    }
    // the stream is already tailing `dir`: a partially-flushed file a
    // trigger happens to list would be consumed truncated and never
    // re-read — write outside the watched dir and move in atomically
    val tmp = Files.createTempFile("tput_epoch", ".json")
    Files.writeString(tmp, sb.toString)
    Files.move(tmp, Paths.get(dir, f"epoch-$epoch%05d.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** One epoch of search-index CDC as a JSON-lines file: upserts with
    * a bounded-vocabulary text (~12 tokens of a 97-word vocabulary —
    * realistic term-bucket touch behavior) and a 16-dim embedding,
    * ~1/20 deletes after the bootstrap epoch, `_seq` globally
    * increasing. Same atomic-move discipline as [[writeEpochFile]].
    */
  private def writeSidxEpochFile(dir: String, epoch: Int, n: Int, keys: Int): Unit = {
    val sb = new StringBuilder(n * 300)
    var i = 0
    while (i < n) {
      val k = (epoch * 131 + i) % keys
      val seq = epoch.toLong * n + i
      val del = epoch > 0 && i % 20 == 19
      val text = (0 until 12).map(j => s"w${(k * 7 + j * 13) % 97}").mkString(" ")
      val emb = (0 until 16).map(d => ((k * 31 + d * 17) % 13 - 6) / 6.0)
        .mkString("[", ",", "]")
      sb.append(s"""{"doc_id": $k, "text": "$text", "embedding": $emb, """)
      sb.append(s""""_action": "${if (del) "delete" else "upsert"}", "_seq": $seq}""")
      sb.append('\n')
      i += 1
    }
    val tmp = Files.createTempFile("tput_sidx", ".json")
    Files.writeString(tmp, sb.toString)
    Files.move(tmp, Paths.get(dir, f"epoch-$epoch%05d.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** The large-vocabulary variant of [[writeSidxEpochFile]]: each
    * epoch's documents draw ~12 tokens from a WINDOW of
    * `wordsPerEpoch` words sliding through a `vocab`-word vocabulary,
    * so an epoch's term set (and therefore its touched term buckets)
    * is a small fraction of the index's partitions — the regime a
    * production stream actually runs in (a micro-batch does not
    * mention the whole language).
    */
  private def writeFracEpochFile(dir: String, epoch: Int, n: Int, keys: Int,
      vocab: Int, wordsPerEpoch: Int): Unit = {
    val sb = new StringBuilder(n * 220)
    var i = 0
    while (i < n) {
      val k = (epoch * 131 + i) % keys
      val seq = epoch.toLong * n + i
      val del = epoch > 0 && i % 20 == 19
      val text = (0 until 12)
        .map(j => s"w${(epoch * wordsPerEpoch + (k * 7 + j * 13) % wordsPerEpoch) % vocab}")
        .mkString(" ")
      sb.append(s"""{"doc_id": $k, "text": "$text", """)
      sb.append(s""""_action": "${if (del) "delete" else "upsert"}", "_seq": $seq}""")
      sb.append('\n')
      i += 1
    }
    val tmp = Files.createTempFile("tput_frac", ".json")
    Files.writeString(tmp, sb.toString)
    Files.move(tmp, Paths.get(dir, f"epoch-$epoch%05d.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  def main(args: Array[String]): Unit = {
    val items = args.headOption.map(_.toLong).getOrElse(320000L)
    val epochs = args.lift(1).map(_.toInt).getOrElse(20)
    val perEpoch = args.lift(2).map(_.toInt).getOrElse(10000)
    val sidxEpochs = args.lift(3).map(_.toInt).getOrElse(10)
    val sidxPerEpoch = args.lift(4).map(_.toInt).getOrElse(2000)
    // zero epochs would crash in the p95 (sorted(-1)) AFTER the whole
    // streamed-index setup ran — reject the shape up front
    require(sidxEpochs >= 1 && sidxPerEpoch >= 1,
      s"sidxEpochs/sidxPerEpoch must be >= 1 (got $sidxEpochs/$sidxPerEpoch)")
    val spark = GraftSession.get()
    def tmp(p: String) = Files.createTempDirectory(p).toString

    // ---- ingest: decode + route + write, generation untimed ----
    val exportDir = tmp("tput_export")
    writeExport(spark, exportDir, items)
    val outDir = tmp("tput_out")
    val t0 = System.nanoTime()
    IngestPipeline.materialize(
      IngestPipeline.fromRaw(DdbJson.readExport(spark, exportDir)), outDir)
    val ingestSec = (System.nanoTime() - t0) / 1e9
    // the write must account for every input line: entities + dlq
    val written =
      spark.read.parquet(s"$outDir/fare").count() +
      spark.read.parquet(s"$outDir/flight").count() +
      spark.read.parquet(s"$outDir/dlq").count()
    require(written == items, s"ingest lost rows: $written of $items")

    // ---- CDC: the real stream loop, one epoch file per micro-batch ----
    val eventsDir = tmp("tput_events")
    val targetDir = tmp("tput_target")
    val ckpt = tmp("tput_ckpt")
    val q = CdcStream.start(spark, eventsDir, targetDir, ckpt)
    val t1 = System.nanoTime()
    var e = 0
    while (e < epochs) {
      writeEpochFile(eventsDir, e, perEpoch, keys = 5000)
      q.processAllAvailable()
      e += 1
    }
    val cdcSec = (System.nanoTime() - t1) / 1e9
    q.stop()
    val live = CdcStream.readSnapshot(spark, targetDir).map(_.count()).getOrElse(0L)
    require(live > 0 && live <= 5000, s"merge produced $live live keys")

    // ---- streamed indexes: one CDC stream drives BM25 + IVF ----
    import graft.streaming.StreamingSearchIndex
    val sidxEvents = tmp("tput_sidx_events")
    val sidxTextDir = tmp("tput_sidx_text")
    val sidxVecDir = tmp("tput_sidx_vec")
    val cdc = spark.readStream
      .schema("doc_id LONG, text STRING, embedding ARRAY<FLOAT>, " +
        "_action STRING, _seq LONG")
      .json(sidxEvents)
    val qt = StreamingSearchIndex.startText(
      cdc.select(col("doc_id"), col("text"), col("_action"), col("_seq")),
      "doc_id", "text", sidxTextDir, tmp("tput_sidx_ckpt_t"))
    val qv = StreamingSearchIndex.startVectors(
      cdc.select(col("doc_id"), col("embedding"), col("_action"), col("_seq")),
      "doc_id", "embedding", sidxVecDir, tmp("tput_sidx_ckpt_v"),
      p = graft.operators.IvfIndex.Params(nlist = 16, nprobe = 4))
    val epochSecs = new Array[Double](sidxEpochs)
    val t2 = System.nanoTime()
    var se = 0
    while (se < sidxEpochs) {
      val e0 = System.nanoTime()
      writeSidxEpochFile(sidxEvents, se, sidxPerEpoch, keys = 3000)
      qt.processAllAvailable()
      qv.processAllAvailable()
      epochSecs(se) = (System.nanoTime() - e0) / 1e9
      se += 1
    }
    val sidxSec = (System.nanoTime() - t2) / 1e9
    qt.stop(); qv.stop()
    // the loop must leave both layouts live and serveable
    val textDocs = spark.read.parquet(s"$sidxTextDir/docs")
      .select(col("doc_id")).distinct().count()
    val vecIds = spark.read.parquet(s"$sidxVecDir/data")
      .select(col("id")).distinct().count()
    require(textDocs > 0 && textDocs <= 3000, s"text index holds $textDocs docs")
    require(vecIds > 0 && vecIds <= 3000, s"vector index holds $vecIds ids")
    val sorted = epochSecs.sorted
    val p95 = sorted(math.min(sorted.length - 1,
      math.ceil(0.95 * sorted.length).toInt - 1))

    // ---- fractional-touch regime: 50k vocab over 512 term buckets ----
    // TWO phases at the SAME bucket count, differing ONLY in how many
    // distinct words an epoch draws (4000 → ~every bucket touched;
    // 40 → <10% touched) — a like-for-like isolation of the
    // touched-fraction effect (comparing against the canonical 64-
    // bucket sidx row would conflate bucket count with touch).
    val fracEpochs = args.lift(5).map(_.toInt).getOrElse(8)
    val fracPerEpoch = args.lift(6).map(_.toInt).getOrElse(2000)
    require(fracEpochs >= 1 && fracPerEpoch >= 1,
      s"fracEpochs/fracPerEpoch must be >= 1 (got $fracEpochs/$fracPerEpoch)")
    val (fracVocab, fracNb) = (50000, 512)
    val fracKeys = 3000
    // measured with the engine's own term hash over the words the
    // epoch files ACTUALLY emit (the same (k*7+j*13)%wpe draw as
    // writeFracEpochFile), never the assumed sliding window — with a
    // non-default fracPerEpoch the emitted term set can be a strict
    // subset of the window, and the guards must measure the real
    // event stream
    def touchedMean(wordsPerEpoch: Int): Double =
      (0 until fracEpochs).map { e2 =>
        val words = (0 until fracPerEpoch).flatMap { i =>
          val k = (e2 * 131 + i) % fracKeys
          (0 until 12).map(j =>
            s"w${(e2 * wordsPerEpoch + (k * 7 + j * 13) % wordsPerEpoch) % fracVocab}")
        }.distinct
        spark.createDataFrame(words.map(Tuple1(_))).toDF("term")
          .select(pmod(hash(col("term")), lit(fracNb)).as("b"))
          .distinct().count()
      }.sum.toDouble / fracEpochs
    def runFracPhase(wordsPerEpoch: Int): (Double, Double, Double) = {
      val events = tmp("tput_frac_events")
      val textDir = tmp("tput_frac_text")
      val cdcF = spark.readStream
        .schema("doc_id LONG, text STRING, _action STRING, _seq LONG")
        .json(events)
      val qf = StreamingSearchIndex.startText(
        cdcF, "doc_id", "text", textDir, tmp("tput_frac_ckpt"),
        buckets = fracNb)
      val secs = new Array[Double](fracEpochs)
      val t0f = System.nanoTime()
      var fe = 0
      while (fe < fracEpochs) {
        val e0 = System.nanoTime()
        writeFracEpochFile(events, fe, fracPerEpoch, keys = fracKeys,
          vocab = fracVocab, wordsPerEpoch = wordsPerEpoch)
        qf.processAllAvailable()
        secs(fe) = (System.nanoTime() - e0) / 1e9
        fe += 1
      }
      val total = (System.nanoTime() - t0f) / 1e9
      qf.stop()
      val docs = spark.read.parquet(s"$textDir/docs")
        .select(col("doc_id")).distinct().count()
      require(docs > 0 && docs <= 3000, s"frac index holds $docs docs")
      val sortedF = secs.sorted
      val p95f = sortedF(math.min(sortedF.length - 1,
        math.ceil(0.95 * sortedF.length).toInt - 1))
      (total, p95f, touchedMean(wordsPerEpoch))
    }
    // full-touch control first (4000 words/epoch ≈ all 512 buckets),
    // then the low-touch regime the 100 TB claim is about
    val (fullSec, fullP95, fullTouched) = runFracPhase(4000)
    val (fracSec, fp95, lowTouched) = runFracPhase(40)
    require(lowTouched / fracNb < 0.10,
      f"fractional-touch config touches ${lowTouched / fracNb}%.3f of buckets " +
        "- not the <10% regime this measurement exists for")
    require(fullTouched / fracNb > 0.90,
      f"full-touch control touches only ${fullTouched / fracNb}%.3f of buckets " +
        "- not a valid all-touch baseline")

    // ---- concurrent serving: the dashboard fan-in shape ----
    // Every rate above is single-stream; a real dashboard fires many
    // requests AT ONCE. N worker threads drain a shared queue of
    // `servReqs` mixed requests — BM25-served `_search` against the
    // maintained index, a bool+agg `_search` on the table path, and a
    // two-body `_msearch` — each with per-request parameter variation
    // (no two compiles identical, so driver-side compile contention is
    // actually exercised, not cached away). Reported per concurrency
    // level N ∈ {1, 8, 32}: requests/s and p95 request latency. The
    // corpus is written to parquet and read back (requests pay a real
    // scan, not a cached local relation); the index is built once
    // (the maintained-index serving shape).
    val servReqs = args.lift(7).map(_.toInt).getOrElse(48)
    require(servReqs >= 3, s"servReqs must be >= 3 (got $servReqs)")
    val servSrcDir = tmp("tput_serve_src")
    spark.range(4000).select(
      col("id").as("doc_id"),
      expr("array_join(transform(sequence(0, 11), j -> " +
        "concat('w', CAST((id * 7 + j * 13) % 97 AS STRING))), ' ')")
        .as("text"),
      (col("id") % 997).as("n_chars"))
      .write.mode("overwrite").parquet(servSrcDir)
    val servTable = spark.read.parquet(servSrcDir)
    val servIdx = tmp("tput_serve_idx")
    graft.etl.SearchIndex.build(servTable, "doc_id", "text", servIdx)
    import graft.search.QueryDsl
    def oneRequest(i: Int): Unit = (i % 3) match {
      case 0 =>
        QueryDsl.searchIndexed(spark, servIdx,
          s"""{"query": {"match": {"text": {"query":
             |  "w${i % 97} w${(i * 13 + 5) % 97} w${(i * 29 + 11) % 97}",
             |  "similarity": "bm25"}}}, "size": 10}""".stripMargin).collect()
      case 1 =>
        QueryDsl.search(servTable,
          s"""{"query": {"bool": {
             |  "must": [{"range": {"n_chars": {"gte": ${i % 500}}}},
             |           {"match": {"text": "w${i % 97}"}}]}},
             |"aggs": {"bands": {"histogram":
             |  {"field": "n_chars", "interval": ${50 + i % 7}}}}}""".stripMargin)
          .collect()
      case _ =>
        QueryDsl.msearch(servTable, Seq(
          s"""{"query": {"term": {"text": "w${i % 97}"}}}""",
          s"""{"query": {"range": {"n_chars": {"lte": ${100 + i % 300}}}},
             |"size": 5, "_source": ["doc_id", "score"]}""".stripMargin))
          .collect()
    }
    // warm each shape once (class loading / first-plan costs are not
    // what this measures)
    (0 until 3).foreach(oneRequest)
    def runLevel(n: Int): (Double, Double) = {
      val lat = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Double]()
      val next = new java.util.concurrent.atomic.AtomicInteger(0)
      val failed = new java.util.concurrent.atomic.AtomicInteger(0)
      val t0s = System.nanoTime()
      val workers = (0 until n).map { _ =>
        new Thread(() => {
          var i = next.getAndIncrement()
          while (i < servReqs) {
            val s0 = System.nanoTime()
            try oneRequest(i)
            catch { case _: Throwable => failed.incrementAndGet() }
            lat.add((System.nanoTime() - s0) / 1e9)
            i = next.getAndIncrement()
          }
        })
      }
      workers.foreach(_.start()); workers.foreach(_.join())
      require(failed.get() == 0, s"$n-way serving had ${failed.get()} failures")
      val total = (System.nanoTime() - t0s) / 1e9
      val ls = lat.toArray(Array.empty[java.lang.Double])
        .map(_.doubleValue).sorted
      val p95s = ls(math.min(ls.length - 1,
        math.ceil(0.95 * ls.length).toInt - 1))
      (servReqs / total, p95s)
    }
    val (rps1, p95s1) = runLevel(1)
    val (rps8, p95s8) = runLevel(8)
    val (rps32, p95s32) = runLevel(32)

    // gated N=32 (VERDICT r12 #8): the ungated 32-way row shows the
    // saturation pathology — 8→32 threads buys no throughput and
    // inflates p95 ~8×, because excess requests queue INSIDE Spark's
    // scheduler. The ServingGate holds admission at the measured knee
    // (8 in flight) with an equal-depth wait queue; excess attempts
    // REJECT immediately (the 429 contract, counted) and the client
    // retries after a short backoff. The latency sample is the SERVED
    // attempt — bounded queueing (≤ one service time at queue=permits)
    // plus service — so overload degrades into a visible rejected
    // count instead of tail blow-up.
    def runLevelGated(n: Int, gate: graft.search.ServingGate)
        : (Double, Double, Double, Long) = {
      val lat = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Double]()
      // end-to-end clock INCLUDING 429-backoff retries (r14, ADVICE:
      // the served-attempt sample alone understates client-perceived
      // latency under sustained overload; both are emitted)
      val e2e = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Double]()
      val next = new java.util.concurrent.atomic.AtomicInteger(0)
      val failed = new java.util.concurrent.atomic.AtomicInteger(0)
      val t0s = System.nanoTime()
      val workers = (0 until n).map { _ =>
        new Thread(() => {
          var i = next.getAndIncrement()
          while (i < servReqs) {
            var done = false
            val r0 = System.nanoTime()
            while (!done) {
              val s0 = System.nanoTime()
              val admitted = gate {
                try oneRequest(i)
                catch { case _: Throwable => failed.incrementAndGet() }
              }
              admitted match {
                case Some(_) =>
                  lat.add((System.nanoTime() - s0) / 1e9); done = true
                case None => Thread.sleep(20)
              }
            }
            e2e.add((System.nanoTime() - r0) / 1e9)
            i = next.getAndIncrement()
          }
        })
      }
      workers.foreach(_.start()); workers.foreach(_.join())
      require(failed.get() == 0,
        s"gated $n-way serving had ${failed.get()} failures")
      val total = (System.nanoTime() - t0s) / 1e9
      def p95Of(q: java.util.concurrent.ConcurrentLinkedQueue[java.lang.Double]) = {
        val ls = q.toArray(Array.empty[java.lang.Double])
          .map(_.doubleValue).sorted
        ls(math.min(ls.length - 1, math.ceil(0.95 * ls.length).toInt - 1))
      }
      (servReqs / total, p95Of(lat), p95Of(e2e), gate.rejected)
    }
    val gatePermits = 8; val gateQueue = 8
    val (rps32g, p95s32g, p95e32g, rej32g) =
      runLevelGated(32, new graft.search.ServingGate(gatePermits, gateQueue))

    val json =
      s"""{"metric":"throughput","ingest_items":$items,""" +
      s""""ingest_sec":${f"$ingestSec%.2f"},""" +
      s""""ingest_items_per_sec":${(items / ingestSec).toLong},""" +
      s""""cdc_events":${epochs.toLong * perEpoch},"cdc_epochs":$epochs,""" +
      s""""cdc_sec":${f"$cdcSec%.2f"},""" +
      s""""cdc_events_per_sec":${(epochs.toLong * perEpoch / cdcSec).toLong},""" +
      s""""cdc_live_keys":$live,""" +
      s""""sidx_events":${sidxEpochs.toLong * sidxPerEpoch},""" +
      s""""sidx_epochs":$sidxEpochs,""" +
      s""""sidx_sec":${f"$sidxSec%.2f"},""" +
      s""""sidx_events_per_sec":${(sidxEpochs.toLong * sidxPerEpoch / sidxSec).toLong},""" +
      s""""sidx_epoch_p95_sec":${f"$p95%.2f"},""" +
      s""""sidx_text_docs":$textDocs,"sidx_vec_ids":$vecIds,""" +
      s""""frac_events":${fracEpochs.toLong * fracPerEpoch},""" +
      s""""frac_epochs":$fracEpochs,"frac_nb":$fracNb,""" +
      s""""frac_full_sec":${f"$fullSec%.2f"},""" +
      s""""frac_full_epoch_p95_sec":${f"$fullP95%.2f"},""" +
      s""""frac_full_touched_fraction":${f"${fullTouched / fracNb}%.4f"},""" +
      s""""frac_low_sec":${f"$fracSec%.2f"},""" +
      s""""frac_low_epoch_p95_sec":${f"$fp95%.2f"},""" +
      s""""frac_low_touched_fraction":${f"${lowTouched / fracNb}%.4f"},""" +
      s""""frac_low_vs_full":${f"${fracSec / fullSec}%.3f"},""" +
      s""""serve_reqs":$servReqs,""" +
      s""""serve_n1_rps":${f"$rps1%.2f"},"serve_n1_p95_sec":${f"$p95s1%.3f"},""" +
      s""""serve_n8_rps":${f"$rps8%.2f"},"serve_n8_p95_sec":${f"$p95s8%.3f"},""" +
      s""""serve_n32_rps":${f"$rps32%.2f"},"serve_n32_p95_sec":${f"$p95s32%.3f"},""" +
      s""""serve_gate_permits":$gatePermits,"serve_gate_queue":$gateQueue,""" +
      s""""serve_n32_gated_rps":${f"$rps32g%.2f"},""" +
      s""""serve_n32_gated_p95_sec":${f"$p95s32g%.3f"},""" +
      s""""serve_n32_gated_e2e_p95_sec":${f"$p95e32g%.3f"},""" +
      s""""serve_n32_gated_rejected":$rej32g}"""
    println(json)
    Files.writeString(Paths.get("throughput_last.json"), json + "\n")
    spark.stop()
  }
}
