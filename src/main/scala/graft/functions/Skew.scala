package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY.md §4: "skewed keys ->
  * salting or AQE skew-join"). AQE's runtime skew-join splitting
  * covers sort-merge joins; explicit salting is the tool when one key
  * dominates so badly that even split partitions funnel one executor,
  * or when the join is not AQE-eligible.
  *
  * `saltedJoin`: the big side gets a uniform random salt in
  * [0, salts); the small side is replicated `salts` times; the join
  * key becomes (key, salt) so a hot key's rows spread over `salts`
  * tasks. Exact same rows as the unsalted join, shuffle balanced.
  */
object Skew {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salts > 1, "salts must be > 1")
    val saltedBig = big.withColumn("__salt",
      (rand(42) * salts).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-stage distinct count for a skewed group key: partial distinct
    * per (key, salt-of-value), then merge — bounds any single task's
    * hash set to ~1/salts of the hot key's values.
    */
  def saltedCountDistinct(df: DataFrame, keyCol: String, valueCol: String,
                          salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(hash(col(valueCol)), lit(salts)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(countDistinct(col(valueCol)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum("__partial").as("n_distinct"))
}
