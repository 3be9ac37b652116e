package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Deduplication operators for large-scale training-data pipelines —
  * the capability layer the reference lacks entirely (its ingest is
  * append-only and re-runs duplicate rows, `/root/reference/src/main.rs:117,146`).
  *
  * Scale stance (100 TB): every variant is expressed as hash/band keys
  * + shuffle-friendly groupBy/join — never an unbanded cross join, no
  * driver-side state. All signature math uses built-in higher-order
  * array functions (transform/aggregate/zip_with), which evaluate
  * per-row inside codegen with zero extra shuffles: the only shuffles
  * are the final candidate-pair groupBy/joins on band keys.
  */
object Dedup {

  /** Whitespace tokens, lowercased. */
  private def tokens(c: Column): Column = split(lower(c), "\\s+")

  /** Word 3-gram shingles (the unit for MinHash and Jaccard). Docs with
    * <3 tokens shingle to the whole text so they still get a signature. */
  private def shingles(toks: Column): Column =
    when(size(toks) >= 3,
      transform(sequence(lit(0), size(toks) - 3), i =>
        concat_ws(" ",
          element_at(toks, i + 1), element_at(toks, i + 2), element_at(toks, i + 3))))
      .otherwise(array(concat_ws(" ", toks)))

  private val NumHashes = 32 // MinHash signature length
  private val Bands = 8      // LSH bands → rows per band r = 32/8 = 4

  /** doc_id + minhash signature (array of 32 longs). Signature is
    * computed entirely in array space — one narrow projection, no
    * explode, no shuffle. */
  private def minhashSignatures(docs: DataFrame): DataFrame = {
    val sh = shingles(tokens(col("text")))
    val sig = array((0 until NumHashes).map { seed =>
      array_min(transform(sh, s => xxhash64(s, lit(seed))))
    }: _*)
    docs.select(col("doc_id"), sig.as("sig"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact dedup: hash-groupBy on content digest; keeper = min doc_id.
    // One shuffle on the digest; at 100 TB this is the canonical
    // "dedup by content hash" pass (digest is 128-bit so collisions
    // are negligible; the group carries no text, only ids).
    "d01_dedup_exact" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("keep_id")),

    // MinHash + LSH fuzzy dedup: shingle → 32 minhashes → 8 bands →
    // band-bucket self-join → signature-overlap estimate. The join key
    // is (band_idx, band_hash), so candidate generation is linear in
    // bucket sizes, never all-pairs. AQE skew-join splits hot buckets.
    "d02_dedup_minhash" -> ((s, d) => {
      val sigs = minhashSignatures(Tables.documents(s, d))
      val r = NumHashes / Bands
      val banded = sigs.select(col("doc_id"), col("sig"),
        posexplode(array((0 until Bands).map { b =>
          xxhash64((col("sig")(b * r) +: (1 until r).map(i => col("sig")(b * r + i))): _*)
        }: _*)).as(Seq("band_idx", "band_hash")))
      val a = banded.select(col("band_idx"), col("band_hash"),
        col("doc_id").as("doc_a"), col("sig").as("sig_a"))
      val b = banded.select(col("band_idx"), col("band_hash"),
        col("doc_id").as("doc_b"), col("sig").as("sig_b"))
      a.join(b, Seq("band_idx", "band_hash"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
            identity_bool => identity_bool)).cast(DoubleType) / NumHashes)
            .as("est_jaccard"))
        .distinct()
        .orderBy("doc_a", "doc_b")
    }),

    // SimHash near-dup: 64-bit fingerprint from token hashes, pairs at
    // hamming distance ≤ 3 found via the 4×16-bit chunk pigeonhole
    // (≤3 flipped bits → at least one chunk identical), so the join is
    // again on small equality keys, not all-pairs.
    "d03_dedup_simhash" -> ((s, d) => {
      val toks = array_distinct(tokens(col("text")))
      val hashes = transform(toks, t => xxhash64(t))
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), hashes.as("hashes"))
        // 64 per-bit vote counters (+1 if bit set, -1 otherwise), summed
        // over token hashes entirely in array space (SQL lambdas because
        // shift amounts are lambda variables, which the Scala shiftright
        // overload can't take).
        .withColumn("bitsum", expr(
          "aggregate(hashes, array_repeat(0L, 64), " +
            "(acc, h) -> zip_with(acc, transform(sequence(0, 63), " +
            "i -> IF((shiftright(h, i) & 1) = 1, 1L, -1L)), (x, y) -> x + y))"))
        .withColumn("fp", expr(
          "aggregate(sequence(0, 63), 0L, " +
            "(acc, i) -> acc + IF(element_at(bitsum, i + 1) > 0, shiftleft(1L, i), 0L))"))
        .select("doc_id", "fp")
      val chunked = docs.select(col("doc_id"), col("fp"),
        posexplode(array((0 until 4).map(i =>
          shiftrightunsigned(col("fp"), i * 16).bitwiseAND(lit(0xFFFFL))): _*))
          .as(Seq("chunk_idx", "chunk")))
      val a = chunked.select(col("chunk_idx"), col("chunk"),
        col("doc_id").as("doc_a"), col("fp").as("fp_a"))
      val b = chunked.select(col("chunk_idx"), col("chunk"),
        col("doc_id").as("doc_b"), col("fp").as("fp_b"))
      a.join(b, Seq("chunk_idx", "chunk"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
        .filter(col("hamming") <= 3)
        .distinct()
        .orderBy("doc_a", "doc_b")
    }),

    // Exact n-gram Jaccard over a bounded candidate window (same
    // source, nearby ids) — the oracle-checkable exact-math variant;
    // the unbounded-scale variant is d02 (LSH generates candidates).
    "d04_ngram_jaccard" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          array_distinct(shingles(tokens(col("text")))).as("grams"),
          size(tokens(col("text"))).as("n_toks"))
        .filter(col("n_toks") >= 3)
      val a = docs.select(col("source"), col("doc_id").as("doc_a"), col("grams").as("ga"))
      val b = docs.select(col("source"), col("doc_id").as("doc_b"), col("grams").as("gb"))
      a.join(b, Seq("source"))
        .filter(col("doc_b") > col("doc_a") && col("doc_b") <= col("doc_a") + 50)
        .withColumn("jac_raw",
          size(array_intersect(col("ga"), col("gb"))).cast(DoubleType) /
            size(array_union(col("ga"), col("gb"))).cast(DoubleType))
        .filter(col("jac_raw") > 0.1) // filter on raw, not rounded, to mirror the oracle
        .select(col("source"), col("doc_a"), col("doc_b"),
          round(col("jac_raw"), 6).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    }),

    // Embedding-cosine near-dup: same-label banding bounds the pair
    // space; exact double-precision cosine on the candidates. At scale
    // the band key would be an LSH bucket (see s02) instead of label.
    "d05_embedding_neardup" -> ((s, d) => {
      val dbl = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"),
          transform(col("embedding"), x => x.cast(DoubleType)).as("v"))
      val a = dbl.select(col("label"), col("vec_id").as("id_a"), col("v").as("va"))
      val b = dbl.select(col("label"), col("vec_id").as("id_b"), col("v").as("vb"))
      a.join(b, Seq("label"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("cos", Similarity.cosine(col("va"), col("vb")))
        .filter(col("cos") > 0.3)
        .select(col("label"), col("id_a"), col("id_b"), round(col("cos"), 6).as("cos_sim"))
        .orderBy("id_a", "id_b")
    })
  )

  val oracle: Map[String, String] = Map(
    "d01_dedup_exact" -> """
      SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      FROM documents GROUP BY md5(text) ORDER BY keep_id""",

    "d04_ngram_jaccard" -> """
      WITH t AS (
        SELECT doc_id, source,
          string_split_regex(lower(text), '\s+') AS toks
        FROM documents),
      g AS (
        SELECT doc_id, source,
          list_distinct(list_transform(range(1, len(toks) - 1),
            i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS grams
        FROM t WHERE len(toks) >= 3)
      SELECT a.source AS source, a.doc_id AS doc_a, b.doc_id AS doc_b,
        ROUND(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
              CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE), 6) AS jaccard
      FROM g a JOIN g b ON a.source = b.source
        AND b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 50
      WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
            CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE) > 0.1
      ORDER BY doc_a, doc_b""",

    "d05_embedding_neardup" -> """
      WITH e AS (
        SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings)
      SELECT a.label AS label, a.vec_id AS id_a, b.vec_id AS id_b,
        ROUND(
          list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) /
          (SQRT(list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * a.v[i]))) *
           SQRT(list_sum(list_transform(range(1, len(b.v) + 1), i -> b.v[i] * b.v[i])))), 6) AS cos_sim
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) /
            (SQRT(list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * a.v[i]))) *
             SQRT(list_sum(list_transform(range(1, len(b.v) + 1), i -> b.v[i] * b.v[i])))) > 0.3
      ORDER BY id_a, id_b"""
  )
}
