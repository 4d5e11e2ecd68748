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
  * — no window, no per-key loop; Catalyst/AQE broadcasts the batch
  * when stats allow, which is the production shape (dim >> daily
  * changes). Callers that KNOW the batch is small can force the hint
  * with `hintBroadcast = true`; the default leaves strategy choice to
  * the optimizer so an unexpectedly large batch degrades to a shuffle
  * join instead of a driver OOM.
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
      attrCols: Seq[String], hintBroadcast: Boolean = false): DataFrame = {
    require(attrCols.nonEmpty, "scd2: no tracked attributes")
    val ch0 = changes.select(
      (col(keyCol).as("__s2_k") +: col("change_micros").as("__s2_ts")
        +: attrCols.map(a => col(a).as(s"__s2_$a"))): _*)
    val ch = if (hintBroadcast) broadcast(ch0) else ch0
    val sameAttrs = attrCols.map(a => col(a) <=> col(s"__s2_$a"))
      .reduce(_ && _)
    val history = dim.filter(!col("is_current"))
    val current = dim.filter(col("is_current"))
    val joined = current.join(ch,
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

  /** Bitemporal fact lookup: join each fact row to the dimension
    * VERSION that was valid at the fact's event time — the
    * "nationality the customer had when the order was placed"
    * question SCD2 history exists to answer. The half-open validity
    * `[valid_from, valid_to)` makes the version unique per
    * (key, instant), so this is an ordinary equi-join on the key with
    * a residual range predicate; the dimension (keys × versions) is
    * usually broadcast-sized in the production shape — set
    * `hintBroadcast = true` to force the hint, otherwise AQE/stats
    * decide and an oversized dimension degrades to a shuffle join on
    * the key instead of a driver OOM. Facts whose key or instant
    * resolves to no version keep a NULL dimension payload (left
    * outer).
    *
    * @param dim          SCD2 state (`applyChanges` output shape)
    * @param facts        fact rows
    * @param keyCol       join key (same name both sides)
    * @param factTsMicros fact event time, long micros
    * @return facts plus the dimension's non-key attribute columns
    */
  def lookupAt(dim: DataFrame, facts: DataFrame, keyCol: String,
      factTsMicros: org.apache.spark.sql.Column,
      hintBroadcast: Boolean = false): DataFrame = {
    val d0 = dim.columns.foldLeft(dim)((df, c) =>
      df.withColumnRenamed(c, s"__s2l_$c"))
    val d = if (hintBroadcast) broadcast(d0) else d0
    val ts = factTsMicros
    facts.join(d,
      facts(keyCol) === d(s"__s2l_$keyCol") &&
        ts >= d("__s2l_valid_from") &&
        (d("__s2l_valid_to").isNull || ts < d("__s2l_valid_to")),
      "left_outer")
      .drop(s"__s2l_$keyCol", "__s2l_valid_from", "__s2l_valid_to",
        "__s2l_is_current")
      .withColumnsRenamed(dim.columns
        .filterNot(Set(keyCol, "valid_from", "valid_to", "is_current"))
        .map(c => s"__s2l_$c" -> c).toMap)
  }
}
