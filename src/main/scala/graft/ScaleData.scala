package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: generate a scratch ~sf1 corpus (10× the sf0.1 fixtures)
  * for the scale-substantiation runs — `documents` and `embeddings`
  * only (the tables the heavy dedup/graph/similarity family reads).
  * Deterministic (hash-derived content, no RNG state), same schema and
  * shape statistics as the driver fixtures (TESTDATA.md): ~54 tokens
  * per doc from the same-size vocabulary, 20 sources, 5 langs, 64-dim
  * float embeddings in [-1, 1], 10 labels. Content is synthesized, not
  * replicated from the fixtures: replication would make every doc a
  * 10-way exact duplicate and quadratically inflate the LSH buckets —
  * measuring THAT would benchmark the data, not the plan.
  *
  * Usage: runMain graft.ScaleData /root/repo/tools/sf1 [scale]
  * (scale multiplies the sf0.1 row counts; default 10 ≈ sf1.)
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/root/repo/tools/sf1")
    val scale = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val vocab = Seq("spark", "line", "column", "order", "small", "sort",
      "fast", "value", "scan", "batch", "part", "query", "agg", "table",
      "hash", "key", "group", "filter", "stream", "slow", "customer",
      "vector", "join", "shuffle", "page", "row", "index", "cache",
      "merge", "split", "read", "write", "plan", "stage", "task",
      "block", "file", "disk", "node", "core")
    val vocabCol = array(vocab.map(lit): _*)

    val nDocs = 5000L * scale
    val docs = spark.range(nDocs).toDF("doc_id")
      .withColumn("n_toks", (abs(xxhash64(col("doc_id"), lit("len"))) % 70 + 20).cast("int"))
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(0), col("n_toks") - 1), i =>
          element_at(vocabCol,
            (abs(xxhash64(col("doc_id"), i, lit("tok"))) % vocab.size + 1).cast("int")))))
      .withColumn("lang", element_at(array(Seq("en", "de", "fr", "ja", "zh").map(lit): _*),
        (abs(xxhash64(col("doc_id"), lit("lang"))) % 5 + 1).cast("int")))
      .withColumn("source", concat(lit("src"), col("doc_id") % 20))
      .withColumn("n_chars", length(col("text")))
      .drop("n_toks")
    docs.repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")

    val nVecs = 2000L * scale
    val emb = spark.range(nVecs).toDF("vec_id")
      .withColumn("embedding",
        transform(sequence(lit(0), lit(63)), d =>
          ((abs(xxhash64(col("vec_id"), d, lit("emb"))) % 20001).cast("double")
            / 10000.0 - 1.0).cast("float")))
      .withColumn("label", (abs(xxhash64(col("vec_id"), lit("lab"))) % 10).cast("int"))
    emb.repartition(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    println(s"wrote $nDocs docs + $nVecs vecs to $out")
    spark.stop()
  }
}
