package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway-style profiler for Lda.fit convergence (kept, per repo
  * convention, beside the other micro tools).
  */
object LdaMicro {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val sports = Seq("goal", "team", "match", "score", "league")
    val cooking = Seq("oven", "dough", "spice", "simmer", "whisk")
    val rows = for {
      d <- 0 until 40
      vocab = if (d < 20) sports else cooking
      (w, i) <- vocab.zipWithIndex
    } yield (s"d$d", w, ((d + i) % 4 + 1).toDouble)
    val df = rows.toDF("doc", "word", "cnt")
    val m = graft.text.Lda.fit(df, "doc", "word", "cnt", k = 3, iters = 12)
    println("OBJ " + m.objective.mkString(", "))
    m.theta.orderBy("doc").show(5, false)
    m.phi.orderBy("word").show(12, false)
  }
}
