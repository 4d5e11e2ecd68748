package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 maintenance (Kimball SCD2, the
  * standard warehouse dimension history pattern): applying a change
  * batch to a versioned dimension closes the affected current rows
  * (sets their `valid_to`) and inserts the new versions, so every key
  * keeps its full attribute history with half-open validity
  * `[valid_from, valid_to)`.
  *
  * The whole apply is ONE key-equality join between the dimension's
  * CURRENT rows and the change batch (plus pass-throughs unioned in)
  * — no window, no per-key loop; Catalyst broadcasts the batch when
  * stats allow, which is the production shape (dim >> daily changes).
  * Attribute comparison is null-safe, so a change row that matches
  * the current attributes exactly is a NO-OP (idempotent re-apply of
  * the same batch changes nothing).
  *
  * Validity bounds are exact long micros (`valid_to` NULL = open).
  */
object Scd2 {

  /** Apply `changes` to `dim`.
    *
    * @param dim      current SCD2 state:
    *                 `(key, attrs…, valid_from, valid_to, is_current)`
    * @param changes  `(key, attrs…, change_micros)` — at most ONE row
    *                 per key (pre-aggregate the latest change first)
    * @param keyCol   business key
    * @param attrCols tracked attributes (same names in both inputs)
    * @return the new full state, same schema as `dim`
    */
  def applyChanges(dim: DataFrame, changes: DataFrame, keyCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "scd2: no tracked attributes")
    val ch = changes.select(
      (col(keyCol).as("__s2_k") +: col("change_micros").as("__s2_ts")
        +: attrCols.map(a => col(a).as(s"__s2_$a"))): _*)
    val sameAttrs = attrCols.map(a => col(a) <=> col(s"__s2_$a"))
      .reduce(_ && _)
    val history = dim.filter(!col("is_current"))
    val current = dim.filter(col("is_current"))
    val joined = current.join(broadcast(ch),
      col(keyCol) === col("__s2_k"), "left_outer")
    // current rows: untouched (no change or identical attrs) pass;
    // genuinely changed rows close at the change timestamp
    val unchanged = joined
      .filter(col("__s2_k").isNull || sameAttrs)
      .select(dim.columns.map(col): _*)
    val closed = joined
      .filter(col("__s2_k").isNotNull && !sameAttrs)
      .select(dim.columns.map {
        case "valid_to" => col("__s2_ts").as("valid_to")
        case "is_current" => lit(false).as("is_current")
        case c => col(c)
      }: _*)
    // new versions: changed keys + keys the dimension has never seen
    val newVersions = ch.join(
        current.select(col(keyCol).as("__s2_ck"),
          struct(attrCols.map(col): _*).as("__s2_cur")),
        col("__s2_k") === col("__s2_ck"), "left_outer")
      .filter(col("__s2_ck").isNull ||
        !(struct(attrCols.map(a => col(s"__s2_$a").as(a)): _*) <=>
          col("__s2_cur")))
      .select(dim.columns.map {
        case `keyCol` => col("__s2_k").as(keyCol)
        case "valid_from" => col("__s2_ts").as("valid_from")
        case "valid_to" => lit(null).cast("long").as("valid_to")
        case "is_current" => lit(true).as("is_current")
        case a => col(s"__s2_$a").as(a)
      }: _*)
    history.unionByName(unchanged).unionByName(closed)
      .unionByName(newVersions)
  }
}
