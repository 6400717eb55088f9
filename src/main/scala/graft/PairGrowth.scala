package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Workload decomposition behind SCALE.md's second-decade table: for each
  * pair-producing dedup family, the TRUE output size and the candidate
  * volume at a given SF dir. A super-linear wall-clock row is only a
  * defect if time grows faster than the operator's real workload — when
  * the corpus decade itself multiplies duplication (the derived sf1 adds
  * 9 salted near-twins per doc, a realistic web profile), output-bound
  * operators are CORRECTLY super-linear in corpus bytes while staying
  * linear in pairs. This main prints the numbers that separate the two.
  *
  * Usage: tools/run.sh graft.PairGrowth <sfDir>
  */
object PairGrowth {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val nDocs = docs.count()
    // candidate volume of the plain postings self-join at the tfidf df
    // window: sum over windowed shingles of C(df,2)
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
    val cap = math.min(0.1 * nDocs, 10000.0)
    val cand = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= cap)
      .agg(sum((col("df") * (col("df") - 1) / 2).cast("long")).as("cand"))
      .first().getLong(0)
    val jacc = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5).count()
    val tfidf = Dedup.tfidfPairs(docs, "doc_id", "text", 3, 0.1, 10000, 0.4).count()
    println(s"""{"dir":"$dir","n_docs":$nDocs,"tfidf_window_candidates":$cand,""" +
      s""""jaccard_pairs_out":$jacc,"tfidf_pairs_out":$tfidf}""")
    spark.stop()
  }
}
