package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators._

/** Operator-level invariants at sf0.001 (fast); exact value parity vs
  * DuckDB is the driver's Verify gate — these specs assert semantic
  * properties that the oracle can't (idempotence, bounds, recall).
  */
class OperatorsSpec extends AnyFunSuite {
  lazy val s = TestSpark.spark
  val d = TestSpark.sf0001

  test("entry smoke: flagship query returns rows") {
    assert(SparkEntry.entry(s).count() > 0)
  }

  test("every registered query runs and every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("q01 groups by (returnflag, linestatus) with positive aggregates") {
    val rows = Relational.queries("q01_pricing_summary")(s, d).collect()
    assert(rows.length === 6)
    assert(rows.forall(r => r.getAs[Double]("sum_qty") > 0))
  }

  test("q02 top-k is ordered descending") {
    val prices = Relational.queries("q02_topk_orders")(s, d)
      .collect().map(_.getAs[Double]("o_totalprice"))
    assert(prices.length === 10)
    assert(prices.sameElements(prices.sorted.reverse))
  }

  test("q07 anti-join: counts exactly the customers without urgent orders") {
    val noUrgent = Relational.queries("q07_customers_no_orders")(s, d)
      .agg(coalesce(sum("n_customers"), lit(0L))).collect()(0).getLong(0)
    val c = Tables.customer(s, d).count()
    val withUrgent = Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_semi").count()
    assert(noUrgent === c - withUrgent)
    assert(noUrgent > 0, "q07 must be non-vacuous at the test SF")
  }

  test("d01 exact dedup partitions the corpus: copies sum to total docs") {
    val out = Dedup.queries("d01_dedup_exact")(s, d)
    val total = out.agg(sum("n_copies")).collect()(0).getLong(0)
    assert(total === Tables.documents(s, d).count())
  }

  test("d01 dedup is idempotent: dedup of kept docs keeps them all") {
    val kept = Dedup.queries("d01_dedup_exact")(s, d).select(col("keep_id"))
    val docs = Tables.documents(s, d)
    val keptDocs = docs.join(kept, docs("doc_id") === kept("keep_id"), "left_semi")
    val again = keptDocs.groupBy(md5(col("text"))).agg(count(lit(1)).as("n"))
    assert(again.filter(col("n") > 1).count() === 0)
  }

  test("d02 minhash estimates are valid jaccard fractions over candidate pairs") {
    val rows = Dedup.queries("d02_dedup_minhash")(s, d).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val j = r.getAs[Double]("est_jaccard"); j >= 0.0 && j <= 1.0 &&
        r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b")
    })
  }

  test("d03 simhash pairs respect the hamming threshold") {
    val rows = Dedup.queries("d03_dedup_simhash")(s, d).collect()
    assert(rows.forall(_.getAs[Int]("hamming") <= 3))
  }

  test("s01 exact top-k: 5 neighbors per query, ranked by descending cosine") {
    val rows = Similarity.queries("s01_cosine_topk")(s, d).collect()
    assert(rows.length === 50)
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, g) =>
      val sims = g.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("cos_sim"))
      assert(sims.sameElements(sims.sorted.reverse))
    }
  }

  test("s02 ANN returns a subset ranking consistent with exact search") {
    val exact = Similarity.queries("s01_cosine_topk")(s, d).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ann = Similarity.queries("s02_ann_lsh_topk")(s, d).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    // deterministic planes -> deterministic recall; just require signal.
    val recall = ann.intersect(exact).size.toDouble / exact.size
    assert(recall > 0.0, s"ANN recall collapsed to zero (|ann|=${ann.size})")
  }

  test("s03 IVF ANN: 5 results per query, deterministic, nonzero recall") {
    val exact = Similarity.queries("s01_cosine_topk")(s, d).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    val run1 = Similarity.queries("s03_ann_ivf")(s, d).collect()
    val run2 = Similarity.queries("s03_ann_ivf")(s, d).collect()
    assert(run1.map(_.toString).toSeq == run2.map(_.toString).toSeq,
      "IVF results must be reproducible (deterministic centroids)")
    val perQuery = run1.groupBy(_.getAs[Long]("q_id"))
    assert(perQuery.forall(_._2.length == 5))
    val ann = run1.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = ann.intersect(exact).size.toDouble / exact.size
    assert(recall > 0.0, s"IVF recall collapsed to zero (|ann|=${ann.size})")
  }

  test("s06 quantized top-k: int8 path recovers >=80% of float-exact neighbors") {
    val exact = Similarity.queries("s01_cosine_topk")(s, d).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    val quant = Similarity.queries("s06_quantized_topk")(s, d).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    // deterministic quantization → deterministic recall; measured
    // 49/50 at sf0.01 — int8 loses only boundary-tie neighbors.
    val recall = quant.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"quantized recall $recall below int8 floor")
  }

  test("s07 PQ top-k: 5 per query, deterministic, high recall after re-rank") {
    val exact = Similarity.queries("s01_cosine_topk")(s, d).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    val run1 = Similarity.queries("s07_pq_topk")(s, d).collect()
    val run2 = Similarity.queries("s07_pq_topk")(s, d).collect()
    assert(run1.map(_.toString).toSeq == run2.map(_.toString).toSeq,
      "PQ results must be reproducible (deterministic codebooks)")
    assert(run1.groupBy(_.getAs[Long]("q_id")).forall(_._2.length == 5))
    val ann = run1.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    // 50-candidate exact re-rank over a 64×-compressed shortlist:
    // measured 50/50 at sf0.01 and sf0.001 — leave drift headroom
    val recall = ann.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"PQ recall $recall collapsed")
  }

  test("s09 PCA top-k: 5 per query, reproducible, nonzero recall") {
    val exact = Similarity.queries("s01_cosine_topk")(s, d).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    val run1 = Similarity.queries("s09_pca_topk")(s, d).collect()
    val run2 = Similarity.queries("s09_pca_topk")(s, d).collect()
    assert(run1.map(_.toString).toSeq == run2.map(_.toString).toSeq,
      "PCA results must be reproducible (deterministic fit on fixed sample)")
    assert(run1.groupBy(_.getAs[Long]("q_id")).forall(_._2.length == 5))
    val ann = run1.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    // flat-spectrum fixture = the floor case: top-16 components carry
    // ~25% of variance; measured 33/50 at sf0.01 — require it nonzero
    // here, the s10 gate carries the ≥25/50 floor
    assert(ann.intersect(exact).nonEmpty, "PCA recall collapsed to zero")
  }

  test("c14 bloom decontamination: no false negatives, FP bound holds") {
    val row = Corpus.queries("c14_bloom_decontaminate")(s, d).head()
    assert(row.getAs[Long]("n_corpus_docs") > 0)
    assert(row.getAs[Long]("n_false_neg") === 0L,
      "a Bloom filter can never miss an inserted gram")
    assert(row.getAs[Long]("fp_ok") === 1L, "doc-level FP rate above bound")
    // exact contamination must agree with c08's per-doc verdicts
    val c08 = Corpus.queries("c08_decontaminate")(s, d).collect()
    assert(row.getAs[Long]("n_contaminated") ===
      c08.count(_.getAs[Long]("contaminated") == 1L).toLong)
  }

  test("t09 LM filter drops about a decile, never the best-scored docs") {
    val rows = TextAnalysis.queries("t09_lm_quality_filter")(s, d).collect()
    val dropped = rows.filter(_.getAs[Long]("lm_keep") == 0L)
    val frac = dropped.length.toDouble / rows.length
    // exact 10th-percentile threshold: the dropped mass sits near 10%
    // (ties and the rounded cutoff move it a little, never a lot)
    assert(frac >= 0.02 && frac <= 0.25, s"dropped fraction $frac")
    val maxDropped = dropped.map(_.getAs[Double]("bigram_logprob")).maxOption
    val maxAll = rows.map(_.getAs[Double]("bigram_logprob")).max
    maxDropped.foreach(md => assert(md < maxAll,
      "filter dropped the best-scored doc"))
  }

  test("t02 quality metrics are bounded") {
    val rows = TextAnalysis.queries("t02_quality_score")(s, d).collect()
    assert(rows.forall { r =>
      val sr = r.getAs[Double]("stop_ratio"); sr >= 0 && sr <= 1 &&
        r.getAs[Double]("quality_score") <= 1.0
    })
  }

  test("m04 blockhash is deterministic and locality-sensitive; gate passes") {
    val payload = ("the quick brown fox " * 20).getBytes("UTF-8")
    assert(Multimodal.blockHash(payload) === Multimodal.blockHash(payload.clone()))
    assert(Multimodal.blockHash(Array.emptyByteArray) === 0L)
    // a 1-byte ±1 edit perturbs at most its window + boundary bits:
    // hamming stays small, the property the pigeonhole join keys on
    val edited = payload.clone(); edited(7) = (edited(7) ^ 0x01).toByte
    val ham = java.lang.Long.bitCount(
      Multimodal.blockHash(payload) ^ Multimodal.blockHash(edited))
    assert(ham <= 3, s"1-byte edit moved $ham bits")
    val row = Multimodal.queries("m04_phash_twin_recall")(s, d).head()
    assert(row.getAs[Long]("n_twins") > 0)
    assert(row.getAs[Long]("recall_ok") === 1L)
  }

  test("m02 media features: one row per doc, stub decode is deterministic") {
    val out = Multimodal.queries("m02_media_features")(s, d)
    assert(out.count() === Tables.documents(s, d).count())
    val (w1, h1, b1) = Multimodal.fakeDecode("hello world".getBytes("UTF-8"))
    val (w2, h2, b2) = Multimodal.fakeDecode("hello world".getBytes("UTF-8"))
    assert((w1, h1, b1) === (w2, h2, b2))
    assert(w1 >= 1 && w1 <= 640 && h1 >= 1 && h1 <= 480)
  }

  test("t10 tokenizer apply: vocab words are 1 token / 0 OOV, counts bounded") {
    val rows = TextAnalysis.queries("t10_tokenizer_apply")(s, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rate = r.getAs[Double]("oov_rate")
      assert(rate >= 0.0 && rate <= 1.0, s"oov_rate $rate outside [0,1]")
      // subword tokens can only SPLIT words, never merge across them:
      // token count >= whitespace word count is impossible to assert
      // without re-splitting, but n_tokens >= 1 always holds
      assert(r.getAs[Long]("n_tokens") >= 1L)
    }
  }

  test("t17 BPE trainer: 10 ranked merges, argmax counts non-increasing, " +
      "later rounds consume earlier merged symbols") {
    val rows = TextAnalysis.queries("t17_bpe_trainer")(s, d)
      .orderBy("merge_rank").collect()
    assert(rows.map(_.getAs[Long]("merge_rank")).toSeq === (1L to 10L))
    val counts = rows.map(_.getAs[Long]("n_pair"))
    assert(counts.forall(_ > 0L))
    // each round's argmax is bounded by the previous round's (new
    // pairs inherit at most the merged pair's count; survivors kept
    // theirs) — a shuffled or re-counted-from-scratch trainer breaks
    // this
    counts.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"argmax counts not non-increasing: $a then $b") }
    // the loop is REALLY iterative: some later merge pairs a
    // multi-char symbol only an earlier round can have produced —
    // round 1 pairs are single chars by construction, so this fails
    // if the trainer degrades to one round's statistic
    val halves = rows.flatMap(_.getAs[String]("pair").split(" ", 2))
    assert(halves.exists(_.length > 1),
      s"no merge consumed an earlier merged symbol: ${rows.map(_.getString(1)).mkString(", ")}")
  }

  test("t11 quality classifier: held-out AUC gate passes with headroom") {
    val r = TextAnalysis.queries("t11_quality_classifier")(s, d).head()
    assert(r.getAs[Long]("n_test") > 0L)
    val nPos = r.getAs[Long]("n_pos")
    assert(nPos > 0L && nPos < r.getAs[Long]("n_test"),
      "degenerate label split — AUC undefined")
    assert(r.getAs[Long]("auc_ok") === 1L, "held-out AUC fell below the 0.85 gate")
  }

  test("d11 span coverage: bounds hold, the drop verdict is integer-exact, " +
    "and coverage matches an in-memory reference implementation") {
    val rows = Dedup.queries("d11_span_coverage")(s, d).collect()
    assert(rows.length === Tables.documents(s, d).count())
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens"); val c = r.getAs[Long]("n_covered")
      assert(c >= 0 && c <= n, s"coverage $c outside [0, $n]")
      assert(math.abs(r.getAs[Double]("dup_frac") - c.toDouble / n) < 1e-5)
      assert(r.getAs[Boolean]("drop_doc") === (2 * c > n))
    }
    // independent in-memory reference implementation over the same
    // fixture: sliding 5-token windows, repeated = seen in >=2 docs,
    // coverage = distinct positions under any repeated occurrence
    val texts = Tables.documents(s, d).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split("\\s+").toSeq)
    val spans = texts.flatMap { case (id, toks) =>
      toks.sliding(5).zipWithIndex.collect {
        case (w, i) if w.length == 5 => (id, i, w.mkString(" ")) } }
    val repeatedSpans = spans.groupBy(_._3)
      .filter(_._2.map(_._1).distinct.length >= 2).keySet
    val expCovered = spans.filter(t => repeatedSpans(t._3)).groupBy(_._1)
      .map { case (id, ss) =>
        id -> ss.flatMap(t => t._2 until t._2 + 5).distinct.length.toLong }
    assert(expCovered.nonEmpty, "fixture should contain cross-doc repeated spans")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_covered") ===
        expCovered.getOrElse(r.getAs[Long]("doc_id"), 0L),
        s"doc ${r.getAs[Long]("doc_id")} coverage mismatch vs reference")
    }
  }

  test("c15 BM25: 5 ranked results per query, scores positive and descending") {
    val rows = SparkEntry.queries("c15_bm25_topk")(s, d).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rs) =>
      assert(rs.length === 5, s"query $q returned ${rs.length} results")
      val scores = rs.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("score"))
      assert(scores.forall(_ > 0.0), s"query $q has non-positive BM25 score")
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"query $q scores not descending")
      // a query doc never retrieves itself: the corpus excludes it
      assert(!rs.exists(_.getAs[Long]("doc_id") === q))
    }
  }

  test("c16 leakage-safe split: every doc lands in exactly one split and " +
      "zero near-dup edges cross splits") {
    val rows = SparkEntry.queries("c16_leakage_safe_split")(s, d).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total === graft.Tables.documents(s, d).count())
    assert(rows.forall(_.getAs[Long]("n_cross_edges") === 0L),
      "a near-dup edge crossed splits — the leakage guard is broken")
    assert(rows.map(_.getAs[String]("split")).toSet.subsetOf(
      Set("train", "valid", "test")))
  }

  test("c17 shrinkage pulls every source's score toward the corpus mean, " +
      "never past it") {
    val rows = SparkEntry.queries("c17_source_prior")(s, d).collect()
    val mu = rows.map(r => r.getAs[Double]("raw_mean") * r.getAs[Long]("n_docs")).sum /
      rows.map(_.getAs[Long]("n_docs")).sum
    rows.foreach { r =>
      val raw = r.getAs[Double]("raw_mean"); val shr = r.getAs[Double]("shrunk_mean")
      // shrunk lies strictly between raw and mu (or equals both when raw == mu)
      assert((shr - raw) * (mu - raw) >= 0.0, s"${r.getAs[String]("source")}: shrunk moved away from mu")
      assert(math.abs(shr - mu) <= math.abs(raw - mu) + 1e-9,
        s"${r.getAs[String]("source")}: shrunk overshot the corpus mean")
    }
  }

  test("s12 k-NN graph: 3 ranked neighbors per node, no self-edges, " +
      "cosines descending within a node") {
    val rows = SparkEntry.queries("s12_knn_graph")(s, d).collect()
    val byN = rows.groupBy(_.getAs[Long]("vec_id"))
    assert(byN.nonEmpty)
    byN.foreach { case (n, rs) =>
      assert(rs.length === 3, s"node $n has ${rs.length} edges")
      assert(!rs.exists(_.getAs[Long]("neighbor_id") === n), s"node $n self-edge")
      val cs = rs.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("cos_sim"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("s14 radius search agrees with the exact scan: every returned pair " +
      "clears the radius and no s01 top-pair above it is missed") {
    val radius = SparkEntry.queries("s14_radius_search")(s, d).collect()
    assert(radius.forall(_.getAs[Double]("cos_sim") > 0.35))
    // s01's exact top-5 pairs above the radius must all appear
    val exactAbove = SparkEntry.queries("s01_cosine_topk")(s, d).collect()
      .filter(_.getAs[Double]("cos_sim") > 0.35)
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    val got = radius.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(exactAbove.subsetOf(got),
      s"radius search missed exact pairs: ${exactAbove -- got}")
  }

  test("a07 histogram quantile estimates are monotone in q and inside the " +
      "value range; all bound gates pass") {
    val rows = SparkEntry.queries("a07_histogram_quantiles")(s, d)
      .orderBy("q").collect()
    assert(rows.length === 3)
    assert(rows.forall(_.getAs[Long]("within_ok") === 1L))
    val ests = rows.map(_.getAs[Double]("est"))
    assert(ests.zip(ests.tail).forall { case (a, b) => a <= b },
      "quantile estimates not monotone in q")
  }

  test("m06 byte entropy is bounded by log2(distinct) and by 8 bits") {
    val rows = SparkEntry.queries("m06_byte_entropy")(s, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy"); val k = r.getAs[Long]("n_distinct")
      assert(h >= 0.0 && h <= 8.0 + 1e-9)
      assert(h <= math.log(k.toDouble) / math.log(2.0) + 1e-6,
        s"doc ${r.getAs[Long]("doc_id")}: H=$h exceeds log2($k)")
    }
  }

  test("m07 scene cuts: cut count is bounded by frames-1 and max_delta " +
      "is consistent with the cut threshold") {
    val rows = SparkEntry.queries("m07_scene_cuts")(s, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val f = r.getAs[Long]("n_frames"); val cuts = r.getAs[Long]("n_cuts")
      val mx = r.getAs[Double]("max_delta")
      assert(cuts <= math.max(f - 1, 0L))
      if (cuts > 0) assert(mx > 5.0, "cuts recorded but max delta under threshold")
      if (mx <= 5.0) assert(cuts === 0L)
    }
  }

  test("s15 MaxSim: 5 ranked results per query, scores in [-8, 8] and " +
      "descending, no self-retrieval") {
    val rows = SparkEntry.queries("s15_maxsim_topk")(s, d).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size === 10)
    byQ.foreach { case (q, rs) =>
      assert(rs.length === 5)
      assert(!rs.exists(_.getAs[Long]("neighbor_id") === q))
      val ms = rs.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("maxsim"))
      // sum of 8 per-token maxima, each a cosine in [-1, 1]
      assert(ms.forall(m => m >= -8.0 && m <= 8.0))
      assert(ms.zip(ms.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q55 sweep: per-day peak concurrency is positive, bounded by the " +
      "day's session count, and n_sessions sums to the view-event count") {
    val rows = SparkEntry.queries("q55_max_concurrency")(s, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mc = r.getAs[Long]("max_concurrent"); val n = r.getAs[Long]("n_sessions")
      assert(mc >= 1L && mc <= n)
    }
    val totalSessions = rows.map(_.getAs[Long]("n_sessions")).sum
    val nViews = graft.Tables.events(s, d)
      .filter(col("event_type") === "view").count()
    assert(totalSessions === nViews)
  }
}
