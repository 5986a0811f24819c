package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** pg_qualstats source normalization (`powa_qualstats_src`,
  * powa--5.2.0.sql:6984-7102):
  *
  *   - qual identity is `coalesce(uniquequalid, uniquequalnodeid)` (:7030);
  *   - only single-sided quals survive:
  *     `(lrelid IS NULL) != (rrelid IS NULL)` (:7062);
  *   - per-qual constants aggregate ordered by position:
  *     `array_agg(constvalue ORDER BY constant_position)` (:7035);
  *   - the qual shape aggregates as
  *     `array_agg(ROW(relid, attnum, opno, eval_type))` (:7036);
  *   - rows must reference a known statement: semi-join against the
  *     union-dedup of live pgss queryids and the `powa_statements`
  *     dimension (:7070-7080).
  */
object QualstatsSource {

  /** Single-sided-qual predicate (:7062) — boolean XOR of null tests. */
  def singleSided(lrelid: Column, rrelid: Column): Column =
    lrelid.isNull =!= rrelid.isNull

  /** Normalize raw per-qual-node rows into per-qual rows with ordered
    * constvalues and qual-shape arrays.
    *
    * @param raw columns: ts, uniquequalid?, uniquequalnodeid, dbid, userid,
    *            qualnodeid, lrelid?, rrelid?, relid, attnum, opno,
    *            eval_type, queryid, constvalue, constant_position,
    *            occurences, execution_count, nbfiltered,
    *            mean_err_estimate_ratio, mean_err_estimate_num
    * @param knownStatements (queryid, dbid, userid) identities — the
    *            union-dedup of live pgss and the statements dimension
    */
  def normalize(raw: DataFrame, knownStatements: DataFrame): DataFrame = {
    val qualId = coalesce(col("uniquequalid"), col("uniquequalnodeid"))
    raw
      .filter(singleSided(col("lrelid"), col("rrelid")))
      .withColumn("qualid", qualId)
      .join(knownStatements.select("queryid", "dbid", "userid").distinct(),
        Seq("queryid", "dbid", "userid"), "left_semi")
      .groupBy(col("srvid"), col("ts"), col("qualid"), col("queryid"),
        col("dbid"), col("userid"))
      .agg(
        // array_agg(constvalue ORDER BY constant_position) (:7035):
        // collect position-tagged structs, sort, strip the tag
        transform(
          array_sort(collect_list(
            struct(col("constant_position").as("p"), col("constvalue").as("v")))),
          x => x.getField("v")).as("constvalues"),
        // array_agg(ROW(relid, attnum, opno, eval_type)) (:7036)
        array_sort(collect_set(struct(col("relid"), col("attnum"),
          col("opno"), col("eval_type")))).as("quals"),
        sum(col("occurences")).as("occurences"),
        sum(col("execution_count")).as("execution_count"),
        sum(col("nbfiltered")).as("nbfiltered"),
        avg(col("mean_err_estimate_ratio")).as("mean_err_estimate_ratio"),
        avg(col("mean_err_estimate_num")).as("mean_err_estimate_num"))
  }

  /** The queryid-dimension union-dedup (:7070-7080): live source ∪
    * statements dimension, deduplicated. */
  def knownStatements(livePgss: DataFrame, dim: DataFrame): DataFrame =
    livePgss.select("queryid", "dbid", "userid")
      .union(dim.select("queryid", "dbid", "userid"))
      .distinct()
}
