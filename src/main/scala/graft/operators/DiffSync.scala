package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dimension diff-sync — the reference's per-snapshot maintenance of
  * `powa_databases` (powa--5.2.0.sql:3731-3796):
  *
  *   - missing entities: LEFT JOIN … WHERE dim.oid IS NULL → INSERT
  *     (:3746-3753)
  *   - renamed entities: inner join WHERE src.name != dim.name → UPDATE
  *     (:3758-3769)
  *   - dropped entities: dim LEFT JOIN src WHERE src.oid IS NULL AND
  *     dropped IS NULL → stamp dropped = now() (:3774-3786)
  *
  * On an append-oriented stack this is a full-outer-join rewrite of the
  * (small) dimension table — the dependency-free choice of SURVEY.md §7.3.
  * Dimensions are tiny relative to facts, so the rewrite broadcasts.
  */
object DiffSync {

  /** Merge a source snapshot into a dimension.
    *
    * @param dim  current dimension: (srvid, key, name, dropped)
    * @param src  fresh source scan: (srvid, key, name)
    * @param ts   the snapshot timestamp to stamp on drops
    * @return     the new dimension with the same schema
    */
  def sync(
      dim: DataFrame,
      src: DataFrame,
      keyCols: Seq[String],
      nameCol: String,
      droppedCol: String,
      ts: Column): DataFrame = {
    val d = dim.select(
      dim.columns.map(c => col(c).as(s"d_$c")).toSeq: _*)
    val s = src.select(
      src.columns.map(c => col(c).as(s"s_$c")).toSeq: _*)
    val joinCond = keyCols
      .map(k => col(s"d_$k") <=> col(s"s_$k"))
      .reduce(_ && _)
    val joined = d.join(s, joinCond, "full_outer")

    val key0 = keyCols.head
    val inDim = col(s"d_$key0").isNotNull
    val inSrc = col(s"s_$key0").isNotNull

    val outKeyCols = keyCols.map(k =>
      coalesce(col(s"d_$k"), col(s"s_$k")).as(k))
    // renamed → take the source name (:3758-3769); new → source name;
    // dropped → keep the dim name.
    val outName = coalesce(col(s"s_$nameCol"), col(s"d_$nameCol")).as(nameCol)
    // dropped semantics: stamp first disappearance, clear on reappearance
    // (reference re-inserts reappearing oids as new rows; single-row-per-key
    // with a cleared stamp is the equivalent on a keyed dimension).
    val outDropped = when(inSrc, lit(null).cast("timestamp"))
      .otherwise(coalesce(col(s"d_$droppedCol"), ts))
      .as(droppedCol)

    joined.select(outKeyCols :+ outName :+ outDropped: _*)
  }

  /** Missing-entity detection alone (anti-join + append) — the INSERT arm,
    * also used for `powa_statements` missing-statement capture
    * (powa--5.2.0.sql:4032-4044). */
  def missing(src: DataFrame, dim: DataFrame, keyCols: Seq[String]): DataFrame =
    src.join(dim, keyCols, "left_anti")

  /** MRU touch — `UPDATE … SET last_present_ts = now()` for entities seen
    * in this snapshot (powa--5.2.0.sql:4025-4031), as a join-rewrite:
    * rows present in `seen` get their `last_present_ts` replaced by `ts`.
    */
  def mruTouch(
      dim: DataFrame,
      seen: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      ts: Column): DataFrame = {
    val seenKeys = seen.select(keyCols.map(col): _*).distinct()
      .withColumn("__seen", lit(true))
    dim.join(seenKeys, keyCols, "left")
      .withColumn(tsCol, when(col("__seen"), ts).otherwise(col(tsCol)))
      .drop("__seen")
  }
}
