package graft
import org.apache.spark.sql.SparkSession
/** DIAGNOSTIC TOOL, not product surface: dumps formatted physical plans of
  * flagship queries for plan review (the `.explain("formatted")` audit the
  * build discipline requires per operator). Not part of the library API and
  * not benchmarked; kept because plan audits recur every round. */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val defaults = Seq("q01_pricing_summary", "q02_region_revenue",
      "q03_top_orders", "q05_coengagement", "q20_cosine_top5",
      "q22_centroids", "q10_semi_join", "q29_asof_planned")
    val qs = if (args.nonEmpty) args.toSeq else defaults
    qs.foreach {
      case "topk_audit" =>
        // q93's hot aggregation, pre-checkpoint: does TopKByScore get
        // map-side partial aggregation (the reason it exists)?
        import org.apache.spark.sql.functions._
        println("\n===== topk_audit (q93 aggregation, pre-checkpoint) =====")
        spark.range(100000)
          .select((col("id") % 64).as("anchor_id"),
            (col("id") * 31 % 997).as("dot"), col("id").as("neg_id"))
          .groupBy(col("anchor_id"))
          .agg(graft.functions.TopKByScore(col("dot"), col("neg_id"), 5).as("top"))
          .explain("formatted")
      case q =>
        println(s"\n===== $q =====")
        SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
