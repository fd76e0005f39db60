package graft

/** Scratch probe — will be deleted before round end. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    import spark.implicits._
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    ev.printSchema()
    ev.orderBy("event_id").show(3, false)
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    li.printSchema()
    import org.apache.spark.sql.functions._
    li.select(min($"l_shipdate"), max($"l_shipdate")).show(false)
    val part = spark.read.parquet("/root/testdata/sf0.01/part.parquet")
    part.select(min($"p_retailprice"), max($"p_retailprice")).show(false)
    spark.stop()
  }
}
