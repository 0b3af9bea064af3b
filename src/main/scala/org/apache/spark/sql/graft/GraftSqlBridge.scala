package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The two `private[sql]` doorways a custom logical operator needs:
  * build a DataFrame from a hand-constructed [[LogicalPlan]] and read
  * a DataFrame's analyzed plan back out. Living inside
  * `org.apache.spark.sql` is the standard extension-library idiom for
  * reaching them (Spark offers no public equivalent of
  * `Dataset.ofRows`); nothing else from the private surface is
  * touched.
  */
object GraftSqlBridge {

  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzedPlan(df: org.apache.spark.sql.DataFrame): LogicalPlan =
    df.queryExecution.analyzed
}
