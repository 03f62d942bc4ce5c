import graft._
import graft.operators._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object Diag2 {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"$name%-28s ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(Some("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Warehouse(spark, "/root/testdata/sf0.1").loadTable("documents")
    val grams = docs.select(col("doc_id").cast("long").as("id"),
      transform(Dedup.wordShingles(col("text"), 3), x => xxhash64(x)).as("g"))
      .filter(size(col("g")) > 0)
    t("warmup scan")(docs.count())
    val gp = grams.persist(); t("grams persist")(gp.count())
    val exploded = gp.select(col("id"), explode(col("g")).as("gram"))
    val freq = exploded.groupBy("gram").agg(count(lit(1)).as("gram_df"))
    val byDoc = Window.partitionBy("id")
    val prefixes = exploded.join(freq, "gram")
      .withColumn("sz", count(lit(1)).over(byDoc))
      .withColumn("rk", row_number().over(byDoc.orderBy(col("gram_df"), col("gram"))))
      .filter(col("rk") <= col("sz") - ceil(lit(0.7) * col("sz")) + 1)
      .select("id", "gram")
    val pp = prefixes.persist(); t("prefixes")(println("  prefix rows=" + pp.count()))
    val cand = pp.select(col("id").as("id_a"), col("gram"))
      .join(pp.select(col("id").as("id_b"), col("gram")), "gram")
      .filter(col("id_a") < col("id_b")).select("id_a","id_b").distinct()
    val cp = cand.persist(); t("candidates")(println("  cand=" + cp.count()))
    val inter = size(array_intersect(col("g_a"), col("g_b")))
    val out = cp.join(gp.select(col("id").as("id_a"), col("g").as("g_a")), "id_a")
      .join(gp.select(col("id").as("id_b"), col("g").as("g_b")), "id_b")
      .withColumn("inter", inter)
      .withColumn("jaccard", col("inter").cast("double") / (size(col("g_a")) + size(col("g_b")) - col("inter")))
      .filter(col("jaccard") >= 0.7)
    t("verify")(println("  pairs=" + out.count()))
    spark.stop()
  }
}
