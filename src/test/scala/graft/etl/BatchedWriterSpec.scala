package graft.etl

import java.util.concurrent.ConcurrentLinkedQueue

import graft.SparkSpec
import graft.sources.Tables

/** Task closures are serialized even in local mode, so captured
  * collections become copies; the JVM-singleton holder below is shared
  * because local-mode executors live in the driver JVM.
  */
object BatchedWriterSpec {
  val sizes = new ConcurrentLinkedQueue[Int]()
  val ids = new ConcurrentLinkedQueue[Long]()
}

class BatchedWriterSpec extends SparkSpec {

  test("chunks are capped at chunkSize and cover every row exactly once") {
    import BatchedWriterSpec._
    sizes.clear(); ids.clear()
    val df = Tables.load(spark, sf(), "customer").select("c_custkey")
    BatchedWriter.writeInChunks(df, chunkSize = 25) { chunk =>
      sizes.add(chunk.size)
      chunk.foreach(r => ids.add(r.getLong(0)))
    }
    import scala.jdk.CollectionConverters._
    assert(sizes.asScala.forall(_ <= 25))
    assert(sizes.asScala.sum === df.count())
    assert(ids.asScala.toSet.size === df.count()) // no dup, no loss
  }
}
