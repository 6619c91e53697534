package graft.sources

import org.apache.spark.sql.SparkSession
import graft.engine.Tables

/** SQL-first access: registers every test table as a temp view (and the
  * custom functions), so `spark.sql("SELECT ... FROM lineitem ...")` works
  * exactly like the DataFrame API — one engine, both dialects.
  */
object Views {
  val tableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def register(spark: SparkSession, dir: String): Unit = {
    Seq(
      "region" -> Tables.region _, "nation" -> Tables.nation _,
      "customer" -> Tables.customer _, "supplier" -> Tables.supplier _,
      "part" -> Tables.part _, "orders" -> Tables.orders _,
      "lineitem" -> Tables.lineitem _, "events" -> Tables.events _,
      "documents" -> Tables.documents _, "embeddings" -> Tables.embeddings _
    ).foreach { case (name, reader) =>
      reader(spark, dir).createOrReplaceTempView(name)
    }
    graft.functions.GraftExtensions.register(spark)
  }
}
