package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge to the cached RDD behind a `localCheckpoint`ed DataFrame
  * (`LogicalRDD` is sql-private). An iterative trainer that
  * checkpoints every round MUST free the previous round's blocks or
  * it hoards k corpus-sized caches — `Dataset.unpersist` does not
  * reach a checkpoint's storage, only this handle does.
  */
object RddBridge {
  def checkpointedRdd(df: DataFrame): Option[RDD[_]] =
    df.queryExecution.analyzed.collectFirst { case l: LogicalRDD => l.rdd }
}
