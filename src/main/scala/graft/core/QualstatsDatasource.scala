package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.spec.Specs

/** The `powa_qualstats` datasource with its quals dimension. The staging
  * rows are the *normalized* per-qual output of
  * `graft.sources.QualstatsSource.normalize` (remote collectors run the
  * normalization query source on the monitored side, powa--5.2.0.sql:
  * 3102-3117): per (qualid, queryid, dbid, userid) metric sums plus the
  * `quals` shape array and ordered `constvalues`.
  *
  * Snapshot maintains two extra structures besides the generic metric
  * records (:7104-7207):
  *   - the quals dimension (`powa_qualstats_quals`, :3139-3147):
  *     missing (srvid, qualid, queryid, dbid, userid, quals[]) rows are
  *     inserted (anti-join, `array_agg(DISTINCT …)` — :7126-7143);
  *   - per-qual constvalues rows (`powa_qualstats_constvalues_history_
  *     current`, :3160-3178) — kept in a `constvalues` tier, the input
  *     to the top-K ranking operator (TopK.multiTopK).
  */
final class QualstatsDatasource extends GenericDatasource(Specs.qualstats) {
  import GenericDatasource._

  val Constvalues = "constvalues"

  private val qualStruct = ArrayType(StructType(Seq(
    StructField("relid", LongType), StructField("attnum", IntegerType),
    StructField("opno", LongType), StructField("eval_type", StringType))))

  /** staging = generic staging + quals shape + ordered constvalues. */
  val stagingFull: StructType = StructType(spec.stagingSchema.fields ++ Seq(
    StructField("quals", qualStruct),
    StructField("constvalues", ArrayType(StringType))))

  val dimSchema: StructType = StructType(Seq(
    StructField("qualid", LongType), StructField("queryid", LongType),
    StructField("dbid", LongType), StructField("userid", LongType),
    StructField("quals", qualStruct)))

  def readDim(store: Store, srvid: Int): DataFrame =
    store.read(name, Dim, dimSchema)
      .filter(col("srvid") === srvid).drop("srvid")

  override def snapshot(store: Store, srvid: Int,
      now: java.sql.Timestamp): Long = {
    val staged = store.read(name, Staging, stagingFull)
      .filter(col("srvid") === srvid).cache()
    try {
      val n = staged.count()
      if (n > 0) {
        val idKeys = Seq("qualid", "queryid", "dbid", "userid")
        // missing quals → dimension insert (:7126-7143)
        val dim = readDim(store, srvid)
        val missing = staged.select(
            col("qualid"), col("queryid"), col("dbid"), col("userid"),
            col("quals"))
          .join(dim, idKeys, "left_anti")
          .dropDuplicates(idKeys)
        store.overwritePartition(name, Dim, srvid,
          dim.unionByName(missing).withColumn("srvid", lit(srvid)))

        // per-qual metric records → generic current tier (:7144-7153)
        store.append(name, Current, staged.select(
          col("srvid") +: spec.keyNames.map(col) :+
            struct(col("ts") +: spec.counterCols.map(c => col(c.name)): _*)
              .as("record"): _*))

        // constvalues rows → their own tier, input of the top-K operator
        store.append(name, Constvalues, staged.select(
          col("srvid"), col("qualid"), col("queryid"), col("dbid"),
          col("userid"), col("ts"), col("constvalues"),
          col("occurences"), col("execution_count"), col("nbfiltered"),
          col("mean_err_estimate_ratio"), col("mean_err_estimate_num")))

        store.dropPartition(name, Staging, srvid)
      }
      n
    } finally staged.unpersist()
  }

  override def reset(store: Store, srvid: Int): Unit = {
    super.reset(store, srvid)
    store.dropPartition(name, Constvalues, srvid)
  }
}
