package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileQ70 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](l: String)(f: => A): A = { val t0=System.nanoTime; val r=f
      println(f"[prof] $l%-30s ${(System.nanoTime-t0)/1e9}%.2f s"); r }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val h = docs.select(explode(functions.TextHash.tokens(col("text"))).as("tok"))
      .withColumn("h", functions.GraftExpressions.strHash(col("tok"))).select("h")
    def mixCol(d: Int) = operators.Sketches.mix31((col("h") + d * 54321L).bitwiseAND(2147483647L)) % 4096
    t("A explode plain structs"){ h.select(explode(array((0 until 4).map(d =>
      struct(lit(d.toLong).as("d"), (col("h") % 4096).as("bucket"))): _*)).as("c"))
      .write.mode("overwrite").format("noop").save() }
    t("B 4 mix cols no explode"){ h.select((0 until 4).map(d => mixCol(d).as(s"b$d")): _*)
      .write.mode("overwrite").format("noop").save() }
    t("C explode mix structs"){ h.select(explode(array((0 until 4).map(d =>
      struct(lit(d.toLong).as("d"), mixCol(d).as("bucket"))): _*)).as("c"))
      .write.mode("overwrite").format("noop").save() }
    t("D explode mix plain-arr"){ h.select(posexplode(array((0 until 4).map(d =>
      mixCol(d)): _*)).as(Seq("d","bucket")))
      .write.mode("overwrite").format("noop").save() }
    t("E repartition then C"){ h.repartition(32).select(explode(array((0 until 4).map(d =>
      struct(lit(d.toLong).as("d"), mixCol(d).as("bucket"))): _*)).as("c"))
      .write.mode("overwrite").format("noop").save() }
    spark.stop()
  }
}
