package graft.dataset

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** R5 `_balance_dict` (dataset_builder.py:441-496): oversample every
  * minority category up to the max category count.
  *
  * The reference uses seeded `np.random.choice(replace=True)`; we keep
  * the contract (seed-stable, exact counts, every original row kept at
  * least once) with a deterministic construction: rows are ranked by
  * rand(seed) within their category and cycled — row at rank rn of a
  * category with cnt members gets floor((max-rn)/cnt)+1 copies, which
  * sums exactly to max. Never applied to a test split by the caller
  * (dataset_builder.py:644-646).
  *
  * Scale: one window over the category partitioning + a broadcast of
  * the single max count — no driver-side loop, no skewed shuffle
  * beyond the category key itself.
  */
object Balancer {

  def balance(df: DataFrame, categoryCol: String, seed: Long = 0L): DataFrame = {
    val w = Window.partitionBy(categoryCol).orderBy(col("__r"))
    val counted = df
      .withColumn("__r", rand(seed))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy(categoryCol)))
      .drop("__r")
    val maxCnt = counted.agg(max(col("__cnt")).as("__max_cnt"))
    counted
      .crossJoin(broadcast(maxCnt))
      .withColumn("__copies", floor((col("__max_cnt") - col("__rn")) / col("__cnt")) + 1)
      .withColumn("__copy", explode(sequence(lit(1L), col("__copies"))))
      .drop("__rn", "__cnt", "__max_cnt", "__copies", "__copy")
  }
}
