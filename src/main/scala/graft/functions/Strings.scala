package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** W5 `sorted_nicely` (misc_utils.py:35-38) and friends: natural
  * (alphanumeric-aware) ordering for file/FOV names, as both a local
  * utility and a sortable column key.
  */
object Strings {

  /** Natural-sort key: every digit run zero-padded to width 12, so
    * lexicographic order == natural order ("fov2" < "fov10").
    */
  def naturalKey(s: String): String =
    "\\d+".r.replaceAllIn(s, m => f"${BigInt(m.matched)}%012d")

  def sortedNicely(xs: Seq[String]): Seq[String] = xs.sortBy(naturalKey)

  /** Column form (UDF; the key is tiny relative to row payloads). */
  def naturalKeyCol(c: Column): Column = {
    val f = udf((s: String) => if (s == null) null else naturalKey(s))
    f(c)
  }
}
