package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.Checkpoint.TruncateOps

/** Text-analysis operators over the `documents` table: language ID,
  * quality scoring, token counting, content fingerprinting. All
  * per-row scalar pipelines built from codegen'd built-ins — they
  * parallelize embarrassingly (no shuffle except final ordering /
  * aggregation), which is exactly what a 100 TB text-cleaning pass
  * needs.
  */
object TextAnalysis {

  /** Language-ID markers. The four space-delimited languages score by
    * whole-token equality; zh (no word spaces) scores by per-token
    * marker-character occurrences. Scoring runs as conditional sums
    * over exploded tokens — each token is split exactly once and every
    * per-token expression (In, length/replace on ≤ word-sized strings)
    * is codegen'd. The earlier whole-document formulations measured:
    * 14 × length(replace(document)) scans ≈ 3.9 s at sf0.1 (each
    * replace allocates a document-sized copy), one regex alternation
    * pass per language ≈ 5.6 s (Java NFA alternation is slower than
    * the allocating scans); this shape ≈ scan speed like t06. */
  private val TokenMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "es" -> Seq("el", "la", "de"),
    "fr" -> Seq("le", "et", "les"),
    "de" -> Seq("der", "und", "die"))

  private val ZhMarkers = Seq("的", "是")

  private val StopWords = Seq("the", "a", "of", "and", "to", "in")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Language ID (n-gram/marker heuristic) → confusion matrix against
    // the labeled `lang` column. Deterministic argmax with fixed
    // precedence (en,es,fr,de,zh). Pure per-row projection — split
    // once, count each marker word as size(toks)−size(array_remove)
    // (codegen'd array ops over a ~50-element pointer array, no lambda
    // HOF, no document-sized string allocation) — then the 25-row
    // confusion aggregate. No shuffle before that aggregate, so at
    // 100 TB this runs at scan speed like t03.
    "t01_langid" -> ((s, d) => {
      val toks = split(lower(col("text")), "\\s+")
      val wordScores = TokenMarkers.map { case (l, ws) =>
        s"s_$l" -> size(filter(toks, t => t.isInCollection(ws)))
      }
      // zh markers are caseless single chars — count them on the raw
      // text (lower() can change string LENGTH for some codepoints,
      // which would skew a length-difference count).
      val zhScore = "s_zh" -> ZhMarkers.map(m =>
        length(col("text")) - length(replace(col("text"), lit(m), lit(""))))
        .reduce(_ + _)
      val scored = Tables.documents(s, d)
        .withColumns((wordScores :+ zhScore).toMap)
      val Seq(en, es, fr, de, zh) =
        (TokenMarkers.map(_._1) :+ "zh").map(l => col(s"s_$l"))
      val all = greatest(en, es, fr, de, zh)
      val pred = when(all === 0, "und")
        .when(en === all, "en").when(es === all, "es")
        .when(fr === all, "fr").when(de === all, "de")
        .otherwise("zh")
      scored.withColumn("pred_lang", pred)
        .groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "pred_lang")
    }),

    // Quality scoring: token stats, stopword ratio, length prior.
    "t02_quality_score" -> ((s, d) => {
      val toks = split(lower(col("text")), "\\s+")
      Tables.documents(s, d)
        .withColumn("n_tokens", size(toks))
        .withColumn("n_stop",
          size(filter(toks, t => t.isInCollection(StopWords))))
        .withColumn("avg_token_len",
          length(regexp_replace(col("text"), " ", "")).cast(DoubleType) / col("n_tokens"))
        .withColumn("stop_ratio", col("n_stop").cast(DoubleType) / col("n_tokens"))
        .withColumn("quality_score",
          round(col("stop_ratio") * 0.5 + least(col("n_tokens").cast(DoubleType) / lit(100.0), lit(1.0)) * 0.5, 6))
        .select(col("doc_id"), col("n_tokens"), col("n_stop"),
          round(col("avg_token_len"), 6).as("avg_token_len"),
          round(col("stop_ratio"), 6).as("stop_ratio"), col("quality_score"))
        .orderBy("doc_id")
    }),

    // Token counting: whitespace tokens vs BPE-ish regex tokens
    // (letter runs / digit runs / single other chars).
    "t03_token_count" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(lower(col("text")), "\\s+")).as("ws_tokens"),
          size(regexp_extract_all(lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
            .as("re_tokens"),
          length(col("text")).as("n_chars_computed"),
          col("n_chars"))
        .orderBy("doc_id")),

    // Document fingerprinting: full-content digest + 60-bit numeric
    // fingerprint + min/max shingle hashes (rolling-hash style, the
    // building block of winnowing).
    //
    // Row-based like t06/Dedup.shingleRows — the array formulation
    // (transform(sequence)/element_at over an inlined split) is the
    // interpreted-HOF O(tokens²) shape that measurably runs 100×
    // slow when HotSpot drops the interpreter tree from its compile
    // queue. Here: split once per doc via posexplode, trigrams via
    // two window leads, min/max in a hash aggregate, then an
    // equi-join back to the slim per-doc digest projection (both
    // sides keyed on doc_id; the window shuffle already clustered
    // the gram side). Short docs (<3 tokens) produce no trigram
    // rows and fall back to hashing the whole lowered text.
    "t04_fingerprint" -> ((s, d) => {
      val gramHash = (g: Column) =>
        conv(substring(md5(g), 1, 15), 16, 10).cast(LongType)
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val docs = Tables.documents(s, d)
      val shingleAgg = docs
        .select(col("doc_id"), posexplode(split(lower(col("text")), "\\s+")).as(Seq("pos", "tok")))
        .withColumn("t1", lead("tok", 1).over(w))
        .withColumn("t2", lead("tok", 2).over(w))
        .filter(col("t2").isNotNull)
        .select(col("doc_id"),
          gramHash(concat_ws(" ", col("tok"), col("t1"), col("t2"))).as("gh"))
        .groupBy("doc_id")
        .agg(min(col("gh")).as("min_gh"), max(col("gh")).as("max_gh"))
      docs
        .select(col("doc_id"), lower(col("text")).as("lt"),
          md5(col("text")).as("content_md5"),
          conv(substring(md5(col("text")), 1, 15), 16, 10).cast(LongType).as("fp60"))
        .join(shingleAgg, Seq("doc_id"), "left_outer")
        .select(col("doc_id"), col("content_md5"), col("fp60"),
          coalesce(col("min_gh"), gramHash(col("lt"))).as("min_shingle_hash"),
          coalesce(col("max_gh"), gramHash(col("lt"))).as("max_shingle_hash"))
        .orderBy("doc_id")
    }),

    // t05: PII redaction — the standard pre-training scrub pass.
    // The corpus is synthetic and PII-free, so each doc first gets a
    // deterministic email + phone appended (keyed off doc_id), then
    // the redactor masks them; n_emails/n_phones prove the patterns
    // matched. Pure per-row regexp pipeline: codegen'd, no shuffle
    // except the final order — at 100 TB this runs at scan speed.
    // Patterns stay in the class-subset where Java regex and RE2
    // (DuckDB) agree.
    "t05_pii_redact" -> ((s, d) => {
      val dirty = concat(col("text"),
        lit(" contact user"), col("doc_id"), lit("@mail.example.com or +1-555-"),
        lpad((col("doc_id") % 10000).cast(StringType), 4, "0"), lit(" now"))
      val emailRe = "[a-z0-9._%-]+@[a-z0-9.-]+\\.[a-z][a-z]+"
      val phoneRe = "\\+[0-9][0-9-]+[0-9]"
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(regexp_extract_all(dirty, lit(emailRe), lit(0))).as("n_emails"),
          size(regexp_extract_all(dirty, lit(phoneRe), lit(0))).as("n_phones"),
          regexp_replace(regexp_replace(dirty, emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>").as("redacted"))
        .orderBy("doc_id")
    }),

    // t06: corpus bigram top-k — the n-gram frequency pass used for
    // contamination checks and LM-corpus stats. posexplode the split
    // ONCE per doc, pair adjacent words with a window lead, then
    // hash-aggregate → global top-50 (TakeOrdered, no full sort).
    //
    // Deliberately row-based, mirroring Dedup.shingleRows: the array
    // formulation (filter(toks)/transform(sequence)/element_at) runs
    // on Spark's INTERPRETED HigherOrderFunction path, and once
    // CollapseProject inlines `toks`, every element access re-runs
    // the regex split — O(words²) splits per doc, all on the scan's
    // single input partition. Measured: the interpreted tree ran 4 s
    // when HotSpot kept it compiled and 475 s when it didn't (jstack:
    // UTF8String.split under ArrayFilter.eval/ArrayTransform.eval,
    // one thread hot). This shape evaluates split once per doc and
    // every per-row expression is codegen'd; the window shuffle on
    // doc_id also spreads the pairing across all cores.
    // The count-desc order carries the bigram itself as tiebreak, so
    // rank-50 boundary ties resolve identically everywhere.
    "t06_ngram_topk" -> ((s, d) => {
      val w = Window.partitionBy("doc_id").orderBy("pos")
      Tables.documents(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .filter(length(col("tok")) > 0)
        .withColumn("tok2", lead("tok", 1).over(w))
        .filter(col("tok2").isNotNull)
        .groupBy(concat_ws(" ", col("tok"), col("tok2")).as("bigram"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(50)
    }),

    // t07: token-entropy quality proxy — Shannon entropy of the
    // per-doc token distribution, H = log2(N) − Σ n·log2(n) / N.
    // Low entropy flags degenerate/repetitive documents that c01's
    // coarse dup-token fraction misses (e.g. two tokens alternating).
    // Shape: explode once → two hash aggregates keyed on doc_id — a
    // scan-speed pipeline with no window, no HOF lambda (the t06
    // lesson), shuffling only (doc_id, tok, count) rows.
    "t07_token_entropy" -> ((s, d) => {
      val counts = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("n"))
      counts.groupBy("doc_id")
        .agg(sum(col("n")).as("n_tokens"),
          count(lit(1)).as("n_distinct"),
          round(log2(sum(col("n"))) -
            sum(col("n").cast(DoubleType) * log2(col("n"))) /
              sum(col("n")).cast(DoubleType), 6).as("entropy"))
        .orderBy("doc_id")
    }),

    // t08: bigram-LM fluency score — the KenLM-style quality signal
    // every corpus pipeline runs (public recipe: CCNet/Gopher filter
    // on LM perplexity): train bigram counts ON the corpus itself,
    // score each doc by its mean ln P(w2|w1) = ln(c(w1,w2)/c(w1)).
    // Low scores flag token salads; high scores flag boilerplate.
    // Shape: one explode + lead window builds bigram rows; TWO count
    // aggregates (the "model") re-join the bigram rows by key —
    // corpus-count tables are post-aggregate intermediates, so the
    // joins are hinted shuffle_hash (never a mis-broadcast of a
    // vocabulary² relation, which for real text is billions of rows).
    "t08_bigram_logprob" -> ((s, d) => bigramScores(s, d).orderBy("doc_id")),

    // t09: quality FILTER on the t08 fluency score — the CCNet-style
    // "drop the worst decile by LM score" pass a corpus pipeline runs
    // right after scoring. The cutoff is a data-derived quantile, NOT
    // a global rank: one exact-percentile aggregate reduces the score
    // column to a single broadcast row, so there is no global sort and
    // no single-partition window anywhere (`row_number() OVER (ORDER
    // BY score)` would funnel every doc row through one task). At
    // 100 TB the only change is percentile → approx_percentile (the
    // t-digest sketch); the plan shape — linear score pass, 1-row
    // reduce, broadcast compare — is already the scale shape. The
    // threshold is rounded to 2 decimals so the Spark and DuckDB
    // interpolation arithmetic can never disagree in the last ulp.
    "t09_lm_quality_filter" -> ((s, d) => {
      import graft.Checkpoint.TruncateOps
      // two consumers (threshold agg + final projection) — truncate so
      // the bigram-LM pipeline runs once, not twice
      val sc = bigramScores(s, d).truncatedLazy
      val thr = sc.agg(
        round(expr("percentile(bigram_logprob, 0.10)"), 2).as("thr"))
      sc.crossJoin(broadcast(thr))
        .select(col("doc_id"), col("n_bigrams"), col("bigram_logprob"),
          when(col("bigram_logprob") > col("thr"), 1L).otherwise(0L)
            .as("lm_keep"))
        .orderBy("doc_id")
    }),

    // t10: tokenizer APPLY — the subword-vocab application pass every
    // LLM pipeline runs to size its corpus (per-doc token count, OOV
    // rate) under a trained vocab. The vocab is the REAL trained
    // merge table: the 10 subword symbols t17's iterative BPE loop
    // produces (r13 verdict item 5 — previously a frequency-ranked
    // word list no actual BPE emits). Apply = greedy longest-prefix
    // match per word with single-char fallback, each fallback
    // counting as one OOV token — the WordPiece greedy-match shape
    // over BPE-trained symbols.
    //
    // Scale shape: segmentation runs once per DISTINCT word (Heaps'-
    // law bounded — the distinct-word table grows ~√corpus, not with
    // the token stream) with the vocab broadcast; results re-join the
    // per-(doc, word) counts under a shuffle_hash hint (the t08
    // convention — a corpus-scale distinct-word table must never be
    // mis-broadcast). The greedy loop is the one justified
    // row-function here: a data-dependent while-loop over a broadcast
    // table has no Catalyst builtin. |V|=50 makes a linear scan of
    // the longest-first array optimal; a production 30k-merge vocab
    // swaps in a trie without touching the plan. Oracle replays the
    // exact greedy match as a DuckDB recursive CTE.
    "t10_tokenizer_apply" -> ((s, d) => {
      import s.implicits._
      val wc = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(split(lower(col("text")), "\\s+")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("doc_id", "word").agg(count(lit(1)).as("cnt"))
      // trained merge table: the 10 BPE symbols from t17's trainer
      // (bounded driver list — the a06 class), broadcast to every
      // executor. Longest-first order makes the FIRST prefix hit the
      // longest (two same-length distinct strings can't both prefix
      // one rest).
      val vocab = bpeMerges(s, d).map(_._2.replace(" ", "")).distinct
        .sortBy(t => (-t.length, t)).toArray
      val bc = s.sparkContext.broadcast(vocab)
      val seg = wc.select("word").distinct().as[String]
        .mapPartitions { it =>
          val v = bc.value
          it.map { w =>
            var rest = w; var toks = 0L; var oov = 0L
            while (rest.nonEmpty) {
              v.find(rest.startsWith) match {
                case Some(m) => rest = rest.substring(m.length)
                case None    => rest = rest.substring(1); oov += 1
              }
              toks += 1
            }
            (w, toks, oov)
          }
        }.toDF("word", "n_toks", "oov")
      wc.join(seg.hint("shuffle_hash"), Seq("word"))
        .groupBy("doc_id")
        .agg(sum(col("n_toks") * col("cnt")).as("n_tokens"),
          round(sum(col("oov") * col("cnt")).cast(DoubleType) /
            sum(col("n_toks") * col("cnt")).cast(DoubleType), 6).as("oov_rate"))
        .orderBy("doc_id")
    }),

    // t11: quality-classifier INFERENCE — the CCNet/fastText half of
    // the quality stack: a logistic regression trained to reproduce a
    // reference quality signal from cheap distributional features,
    // then run over the corpus. Teacher labels: the t02 heuristic
    // score thresholded at its corpus median (the "reference corpus"
    // stand-in); features: the t08 LM fluency score plus t07-family
    // distributional stats (bigram count, distinct-token ratio, token
    // count). Train on the ¾ split, hold out doc_id %4 == 0, and gate
    // on test AUC — the s08-style structural gate: n_test and n_pos
    // are SQL-exact (the label derivation is deterministic), auc_ok
    // pins AUC ≥ 0.85, far under the measured 0.9995 (sf0.01 held-out
    // slice) so only a real train/score regression trips it (LBFGS
    // float noise cannot).
    //
    // Scale shape: feature build is the t08 pipeline + narrow
    // projections; the fit is Spark ML's distributed LBFGS over the
    // train split (gradient treeAggregate — one pass per iteration,
    // nothing driver-sized except the 4-dim coefficient vector);
    // scoring is model.transform = a broadcast dot product per row,
    // narrow and shuffle-free. The AUC rank-sum runs over the
    // HELD-OUT slice only — eval slices are sampled in production,
    // so the single-partition row_number is bounded by design, the
    // same class as t09's 1-row percentile reduce.
    "t11_quality_classifier" -> ((s, d) => {
      import org.apache.spark.ml.classification.LogisticRegression
      import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
      val toks = split(lower(col("text")), "\\s+")
      val q = Tables.documents(s, d)
        .withColumn("n_tokens", size(toks))
        .withColumn("n_stop",
          size(filter(toks, t => t.isInCollection(StopWords))))
        .withColumn("n_distinct", size(array_distinct(toks)))
        .withColumn("quality_score", round(
          (col("n_stop").cast(DoubleType) / col("n_tokens")) * 0.5 +
            least(col("n_tokens").cast(DoubleType) / lit(100.0),
              lit(1.0)) * 0.5, 6))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          col("quality_score"))
      import graft.Checkpoint.TruncateOps
      // population = docs with >=1 bigram (the t08 join), so the
      // median, labels and split all agree with the SQL oracle.
      // Eagerly truncated: THREE consumers re-read it (the threshold
      // aggregate, the LBFGS fit, the test-slice transform) and
      // without the cut each one re-runs the whole t08 bigram
      // pipeline — measured 5.45 s → the truncated base pays it once.
      val data0 = q.join(bigramScores(s, d), Seq("doc_id")).truncated
      val thr = data0.agg(
        round(expr("percentile(quality_score, 0.5)"), 2).as("thr"))
      val data = data0.crossJoin(broadcast(thr))
        .select(col("doc_id"),
          when(col("quality_score") > col("thr"), 1.0).otherwise(0.0)
            .as("label"),
          array_to_vector(array(
            col("bigram_logprob"),
            col("n_bigrams").cast(DoubleType),
            col("n_distinct").cast(DoubleType) / col("n_tokens"),
            col("n_tokens").cast(DoubleType))).as("features"))
      val test = data.filter(col("doc_id") % 4 === 0)
      val model = new LogisticRegression()
        .setMaxIter(50).setRegParam(0.01)
        .setFeaturesCol("features").setLabelCol("label")
        .fit(data.filter(col("doc_id") % 4 =!= 0))
      val scored = model.transform(test)
        .select(col("doc_id"), col("label"),
          vector_to_array(col("probability")).getItem(1).as("prob"))
      // Mann-Whitney AUC from the rank sum of positives
      val ranked = scored.withColumn("r", row_number().over(
        Window.orderBy(col("prob"), col("doc_id"))).cast(DoubleType))
      ranked.agg(
          count(lit(1)).as("n_test"),
          sum(col("label")).cast(LongType).as("n_pos"),
          sum(col("label") * col("r")).as("prs"))
        .select(col("n_test"), col("n_pos"),
          ((col("prs") - col("n_pos") * (col("n_pos") + 1) / 2) /
            (col("n_pos") * (col("n_test") - col("n_pos")))).as("auc"))
        .select(col("n_test"), col("n_pos"),
          when(col("auc") >= 0.85, 1L).otherwise(0L).as("auc_ok"))
    }),

    // t12: BPE pair-count TRAINING step — the counting half of byte-
    // pair encoding (t10 applies a trained vocab; this trains it):
    // count adjacent character pairs across the corpus, weighted by
    // word frequency, and emit the top-20 merge candidates — exactly
    // the statistic each BPE merge iteration recomputes. Shape:
    // pair extraction runs over DISTINCT words only (the t10 Heaps'-
    // law argument) with each word's corpus frequency as the weight,
    // so the explode is vocabulary-sized, not token-stream-sized; the
    // count-desc order carries the pair as tiebreak (the t06 rank-
    // boundary convention).
    "t12_bpe_pair_counts" -> ((s, d) => {
      val words = Tables.documents(s, d)
        .select(explode(split(lower(col("text")), "\\s+")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word").agg(count(lit(1)).as("n"))
      words.filter(length(col("word")) >= 2)
        .select(col("n"), explode(expr(
          "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))
          .as("pair"))
        .groupBy("pair").agg(sum(col("n")).as("n_pair"))
        .orderBy(col("n_pair").desc, col("pair"))
        .limit(20)
    }),

    // t13: TF-IDF KEYWORD EXTRACTION — top-3 distinguishing terms per
    // document, the per-doc summarization/tagging primitive (and the
    // classic tf·idf definition BM25 generalizes — cf. c15, which
    // ranks DOCS for a query; this ranks TERMS for a doc). Shapes:
    // postings tf = one (doc, term) aggregate; df = one (term)
    // aggregate over the unique postings; idf joins BACK onto the
    // postings keyed on term (the standard second pass — both sides
    // hash-partition on term, no broadcast needed or wanted: df is
    // vocab-sized); the corpus doc count attaches as a 1-row
    // broadcast. Per-doc top-3 via the bounded TopKRows heap keyed by
    // doc_id — map-side, ≤3 rows per doc cross the shuffle, no
    // per-doc sort. Ranks compare the 6-dp ROUNDED score (c15's
    // cross-engine rule), tie-broken on the term string (ASCII
    // fixture ⇒ byte order ≡ lexical in both engines).
    "t13_keyword_extract" -> ((s, d) => {
      val tf = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(split(lower(col("text")), "\\s+")).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .truncatedLazy // feeds n_docs, df and the score join
      val nDocs = tf.groupBy("doc_id").agg(count(lit(1)).as("nt"))
        .agg(count(lit(1)).cast(DoubleType).as("n_docs"))
      val df = tf.groupBy("term").agg(count(lit(1)).cast(DoubleType).as("df"))
      tf.join(df.hint("shuffle_hash"), Seq("term"))
        .crossJoin(broadcast(nDocs)) // 1-row corpus size, c06 class
        .withColumn("score",
          round(col("tf").cast(DoubleType) * log(col("n_docs") / col("df")), 6))
        .groupBy("doc_id")
        .agg(graft.functions.TopKRows.topk(
          struct((-col("score")).as("ns"), col("term").as("term"),
            col("score").as("score")), 3).as("top"))
        .select(col("doc_id"), posexplode(col("top")).as(Seq("pos", "e")))
        .select(col("doc_id"), (col("pos") + 1).as("rk"),
          col("e.term").as("term"), col("e.score").as("score"))
        .orderBy("doc_id", "rk")
    }),

    // t14: PII REDACTION + PSEUDONYMIZATION — the privacy scrub every
    // released pretraining corpus runs (Dolma/FineWeb mask emails,
    // phones, IPs; CCNet hashes identifiers). Two legs over the
    // customer quasi-identifiers, both pure per-row projections:
    //   - pattern redaction: digit runs ≥6 (account/ID shapes — the
    //     one PII pattern the synthetic fixtures carry; the regex is
    //     a config constant, the email/phone/IP alternatives slot into
    //     the same regexp_replace) replaced with a [ID] placeholder,
    //     plus the per-row hit count;
    //   - salted pseudonymization: md5(name || salt) — referential
    //     integrity preserved (same input → same token, so joins on
    //     the pseudonym still work downstream) without the raw value.
    // Scale shape: zero shuffle before the output sort — codegen'd
    // regex + digest per row, scan speed at 100 TB like t03. The
    // regex is RE2-safe (no lookaround) so the oracle replays it
    // byte-identically. Complements t05 (which DETECTS — match counts
    // per class for audit dashboards) with the REWRITE leg: masked
    // text + join-stable pseudonyms, the shape the redacted corpus
    // actually ships in.
    "t14_pii_redact" -> ((s, d) => {
      val idRun = "[0-9]{6,}"
      Tables.customer(s, d)
        .select(col("c_custkey"),
          regexp_replace(col("c_name"), idRun, "[ID]").as("masked_name"),
          md5(concat(col("c_name"), lit("|graft-pii-v1"))).as("pseudonym"),
          size(regexp_extract_all(col("c_name"), lit(idRun), lit(0)))
            .cast(LongType).as("pii_hits"))
        .orderBy("c_custkey")
    }),

    // t15: REPETITION SIGNALS — the Gopher/Dolma repetition rules
    // (Rae et al. 2021 §A1.1: drop docs whose duplicate-line /
    // top-n-gram fraction exceeds a band), in the token form the
    // newline-free fixture supports: duplicate-token fraction
    // (1 − |distinct|/|tokens|) and top-bigram fraction (occurrences
    // of the most frequent bigram × 2 / |tokens|). ONE scan: the
    // per-doc scalars (n_tokens, n_distinct — computed narrow from
    // the single split() array) ride the bigram explode as grouping
    // keys, so no second documents pass and no self-join; bigrams
    // build via the t08 arrays_zip slice pairing (narrow, codegen'd,
    // never the O(tokens²) interpreted-HOF shape). Docs with <2
    // tokens have no bigram and are excluded by definition (a
    // repetition signal needs ≥2 tokens) — the oracle applies the
    // same len ≥ 2 guard. Both fractions are ratios of exact integers
    // rounded at 6dp — hash-exact in any engine. The keep flag uses
    // corpus-calibrated cuts so both classes appear in the fixture;
    // real pipelines tune the same two thresholds.
    "t15_repetition_signals" -> ((s, d) => {
      val toks = split(lower(col("text")), "\\s+")
      val nPairs = greatest(size(toks) - 1, lit(0))
      Tables.documents(s, d)
        .select(col("doc_id"), size(toks).as("n_tokens"),
          size(array_distinct(toks)).as("n_distinct"),
          explode(arrays_zip(
            slice(toks, lit(1), nPairs), slice(toks, lit(2), nPairs))).as("p"))
        .groupBy(col("doc_id"), col("n_tokens"), col("n_distinct"),
          col("p.0").as("w1"), col("p.1").as("w2"))
        .agg(count(lit(1)).as("n"))
        .groupBy("doc_id", "n_tokens", "n_distinct")
        .agg(max(col("n")).as("top_bigram_n"))
        .select(col("doc_id"), col("n_tokens").cast(LongType).as("n_tokens"),
          col("n_distinct").cast(LongType).as("n_distinct"),
          round(lit(1.0) - col("n_distinct").cast(DoubleType) /
            col("n_tokens").cast(DoubleType), 6).as("dup_token_frac"),
          col("top_bigram_n"),
          round(col("top_bigram_n").cast(DoubleType) * 2.0 /
            col("n_tokens").cast(DoubleType), 6).as("top_bigram_frac"))
        .withColumn("keep",
          (col("dup_token_frac") <= 0.62 && col("top_bigram_frac") <= 0.2)
            .cast(LongType))
        .orderBy("doc_id")
    }),

    // t16: POWER-LAW DIAGNOSTICS — the corpus-health check run before
    // committing a crawl to training: does term frequency follow Zipf
    // (rank-frequency slope ≈ −1 on natural text; a flat slope means
    // synthetic/templated content, a cliff means boilerplate), and
    // does the type inventory grow by Heaps' law V(n) ≈ K·n^β
    // (β ≈ 0.4–0.6 on natural text; saturation means a closed
    // vocabulary)? Both exponents come from OLS over log-log points —
    // run DISTRIBUTED as sufficient statistics, never a driver fit.
    // The fixture's unigram vocabulary is closed (31 types), so the
    // Heaps leg measures type growth where this corpus actually has
    // it: word-trigram types (the d04 shingle space) — exactly the
    // move a real pipeline makes when diagnosing phrase-level
    // diversity under a fixed word list. Cross-engine float contract
    // (the c18/q55 discipline): regression inputs are 6dp-ROUNDED
    // ln() points — rounding collapses the JVM-vs-libm 1-ulp log
    // divergence BEFORE any sum — and every Σ is an ordered pairwise
    // window sum over a BOUNDED relation (≤256 Zipf ranks by fixed
    // cap, 32 Heaps checkpoints by construction), so both engines
    // accumulate bit-identically. Scale shapes: term counts are one
    // vocab-bounded hash aggregate; trigram first-seen is d17's
    // persistable min(doc_id) index; per-bucket token mass aggregates
    // the corpus to 32 rows; everything past the two scans is
    // Heaps'-bounded or constant-sized.
    "t16_zipf_heaps" -> ((s, d) => {
      val toksCol = split(lower(col("text")), "\\s+")
      // ---- Zipf leg: top-256 unigram (rank, frequency) points
      val zipfPts = Tables.documents(s, d)
        .select(explode(toksCol).as("term"))
        .groupBy("term").agg(count(lit(1)).as("cnt"))
        // Top-256 FIRST via a distributed TakeOrderedAndProject (the
        // c06 shape) — each partition keeps its local 256, the driver
        // merges; the rank window then sees exactly 256 rows instead
        // of sorting the whole unigram vocabulary (O(10^8-10^9) types
        // on a noisy crawl) through one empty-partition window.
        .orderBy(col("cnt").desc, col("term")).limit(256)
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("cnt").desc, col("term")))) // 256 rows max
        .select(round(log(col("rnk").cast(DoubleType)), 6).as("x"),
          round(log(col("cnt").cast(DoubleType)), 6).as("y"))
      // ---- Heaps leg: trigram types vs tokens at 32 doc-id buckets
      val perDoc = Tables.documents(s, d)
        .select(col("doc_id"), size(toksCol).cast(LongType).as("n_tokens"))
      val mx = perDoc.agg(max(col("doc_id")).as("mx"))
      val bucketTokens = perDoc.crossJoin(broadcast(mx))
        .withColumn("bucket", expr("doc_id * 32 div (mx + 1)"))
        .groupBy("bucket").agg(sum(col("n_tokens")).as("bucket_tokens"))
      val newTypes = Tables.documents(s, d)
        .select(col("doc_id"), toksCol.as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(toks) - 3)," +
            " i -> concat_ws(' ', slice(toks, i + 1, 3)))")).as("gram"))
        .groupBy("gram").agg(min(col("doc_id")).as("first_doc"))
        .crossJoin(broadcast(mx))
        .withColumn("bucket", expr("first_doc * 32 div (mx + 1)"))
        .groupBy("bucket").agg(count(lit(1)).as("new_types"))
      val wb = Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val heapsPts = bucketTokens
        .join(newTypes, Seq("bucket"), "left_outer")
        .withColumn("cum_tokens", sum(col("bucket_tokens")).over(wb))
        .withColumn("cum_types",
          sum(coalesce(col("new_types"), lit(0L))).over(wb))
        .select(round(log(col("cum_tokens").cast(DoubleType)), 6).as("x"),
          round(log(col("cum_types").cast(DoubleType)), 6).as("y"))
      // ---- shared OLS via ordered-window sufficient statistics
      def fit(pts: DataFrame, label: String): DataFrame = {
        val wAll = Window.orderBy("x", "y")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val dn = col("n") * col("sxx") - col("sx") * col("sx")
        val nm = col("n") * col("sxy") - col("sx") * col("sy")
        pts.select(
            count(lit(1)).over(wAll).cast(DoubleType).as("n"),
            sum(col("x")).over(wAll).as("sx"),
            sum(col("y")).over(wAll).as("sy"),
            sum(col("x") * col("y")).over(wAll).as("sxy"),
            sum(col("x") * col("x")).over(wAll).as("sxx"),
            sum(col("y") * col("y")).over(wAll).as("syy"))
          .distinct() // every row carries the same totals
          .select(lit(label).as("metric"),
            col("n").cast(LongType).as("n_points"),
            round(nm / dn, 6).as("slope"),
            round((col("sy") - nm / dn * col("sx")) / col("n"), 6)
              .as("intercept"),
            round((nm * nm) /
              (dn * (col("n") * col("syy") - col("sy") * col("sy"))), 6)
              .as("r2"))
      }
      fit(heapsPts, "heaps_trigram")
        .unionByName(fit(zipfPts, "zipf_unigram"))
        .orderBy("metric")
    }),

    // t17: ITERATIVE BPE TRAINER (r13 verdict item 5) — the real
    // Sennrich loop, not one round's statistic: 10 unrolled merge
    // rounds (the s20 constant-N greedy precedent), each taking the
    // weighted argmax adjacent-symbol pair over the Heaps-bounded
    // distinct-word table, rewriting every word's symbol sequence,
    // and recounting — t12 is exactly round 1's pair table; this is
    // the trainer that PRODUCES a merge list (and t10 now applies
    // it). Output: the 10 merges in training order with their counts.
    // See [[trainBpe]] for the shape and the cross-engine rewrite
    // convention; the DuckDB oracle replays all 10 rounds as an
    // unrolled CTE chain (the t10 recursive-CTE convention), argmax
    // and rewrite re-derived independently in SQL.
    "t17_bpe_trainer" -> ((s, d) => {
      import s.implicits._
      bpeMerges(s, d).toDF("merge_rank", "pair", "n_pair")
        .orderBy("merge_rank")
    })
  )

  /** 10-round BPE training per call — t17 emits it, t10 applies it.
    * Deliberately NOT memoized: a module-level result cache keyed on
    * the fixture dir would make repeat bench draws (and any second
    * caller in one JVM) measure a map lookup instead of the
    * computation — every invocation must compute from the parquet
    * inputs. */
  private[graft] def bpeMerges(s: SparkSession, d: String): Seq[(Long, String, Long)] =
    trainBpe(s, d)

  /** The 10-round iterative BPE merge loop (Sennrich et al. 2016,
    * arXiv:1508.07909 — the algorithm every LLM tokenizer pipeline
    * trains with). State: each distinct word as a symbol sequence,
    * encoded as a single-space-separated, space-padded string
    * (" h e l l o "); per round the weighted pair table is one
    * explode + hash aggregate over the distinct-word table (Heaps'
    * law: vocabulary-sized, never token-stream-sized — the t10/t12
    * scale argument), the argmax is a 1-row driver read (count desc,
    * pair asc — deterministic), and the rewrite is 6 chained
    * codegen'd `replace(s, " a b ", " ab ")` passes. SIX because one
    * leftmost-resume pass misses every other occurrence in an
    * overlapping chain ("a b a b": the match consumes the next
    * occurrence's leading space); each pass at least halves the
    * remaining chain, and fixture words are far shorter than 2^6 —
    * the fixed count keeps the computation engine-replayable (the
    * DuckDB oracle applies the same 6 passes, so both engines reach
    * the same fixed point by the same route). The per-round
    * `.truncated` keeps the 10-round plan flat instead of 60 nested
    * replaces deep. At 100 TB the pair table and rewrite shuffle the
    * vocabulary, not the corpus: the corpus is scanned ONCE to build
    * word counts. */
  private def trainBpe(s: SparkSession, d: String): Seq[(Long, String, Long)] = {
    import graft.Checkpoint.TruncateOps
    val wn = Tables.documents(s, d)
      .select(explode(split(lower(col("text")), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))
    // LAZY truncation (the connectedComponents one-job-per-round
    // precedent): each round's argmax job scans every partition of
    // `syms` anyway, so the blocks pin inside that job instead of a
    // dedicated materialization job per round — and the final round's
    // rewrite, which no job ever reads, is never materialized at all
    var syms = wn.withColumn("s",
      concat(lit(" "), regexp_replace(col("word"), "(.)", "$1 "))).truncatedLazy
    val out = Seq.newBuilder[(Long, String, Long)]
    for (k <- 1 to 10) {
      val nPairs = size(col("arr")) - 1
      val best = syms
        .withColumn("arr", split(trim(col("s")), " "))
        .select(col("n"), explode(arrays_zip(
          slice(col("arr"), lit(1), nPairs),
          slice(col("arr"), lit(2), nPairs))).as("p"))
        .select(col("n"),
          concat(col("p.0"), lit(" "), col("p.1")).as("pair"))
        .groupBy("pair").agg(sum(col("n")).as("np"))
        .orderBy(col("np").desc, col("pair")).limit(1).head()
      val pair = best.getString(0)
      out += ((k.toLong, pair, best.getLong(1)))
      var c: Column = col("s")
      for (_ <- 1 to 6)
        c = replace(c, lit(s" $pair "), lit(s" ${pair.replace(" ", "")} "))
      syms = syms.withColumn("s", c).truncatedLazy
    }
    out.result()
  }

  /** Per-doc mean bigram log-probability (the t08 body, unsorted —
    * shared by t08 and the t09 quality filter).
    *
    * Bigram construction is NARROW: arrays_zip of two slices of the
    * one split() array pairs adjacent tokens with zero shuffle.
    * Slice/ArraysZip are regular codegen'd expressions — NOT the
    * interpreted HigherOrderFunction path whose per-element re-split
    * made the original t06 array form O(words²) (see t06; here split
    * re-evaluates a constant ~5× per doc, not per token). This
    * replaces the previous posexplode + window-lead pairing, whose
    * doc_id shuffle + sort of every token row was the query's dominant
    * stage (gen-sf1: 5.3 s of the 5.7 s total; the narrow build does
    * the same 2.68 M bigrams in ~0.5 s).
    *
    * `bi` feeds THREE consumers (both count aggregates and the join
    * probe), so it is lazily truncated: the bigram rows pin inside the
    * first aggregate's job and the other two consumers re-read blocks
    * instead of re-running the scan+explode. */
  private def bigramScores(s: SparkSession, d: String): DataFrame = {
    import graft.Checkpoint.TruncateOps
    val toks = split(lower(col("text")), "\\s+")
    val nPairs = greatest(size(toks) - 1, lit(0))
    val bi = Tables.documents(s, d)
      .select(col("doc_id"), explode(arrays_zip(
        slice(toks, lit(1), nPairs), slice(toks, lit(2), nPairs))).as("p"))
      .select(col("doc_id"), col("p.0").as("w1"), col("p.1").as("w2"))
      .truncatedLazy
    val c2 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("n2"))
    val c1 = bi.groupBy("w1").agg(count(lit(1)).as("n1"))
    bi.join(c2.hint("shuffle_hash"), Seq("w1", "w2"))
      .join(c1.hint("shuffle_hash"), Seq("w1"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log(col("n2").cast(DoubleType) / col("n1").cast(DoubleType))), 6)
          .as("bigram_logprob"))
  }

  val oracle: Map[String, String] = {
    // token-membership counts mirror size(filter(toks, in marker set))
    val wordScoreCols = TokenMarkers.map { case (l, ws) =>
      s"len(list_filter(toks, x -> x IN (${ws.map(w => s"'$w'").mkString(",")}))) AS s_$l"
    }.mkString(", ")
    val zhScoreCol = ZhMarkers.map(m =>
      s"(length(text) - length(replace(text, '$m', '')))").mkString(" + ")
    // t17's unrolled replay: 10 rounds of (adjacent-pair count →
    // argmax → 6-pass padded-string rewrite), each round its own CTE
    // trio (p/b/s), re-deriving in SQL exactly what trainBpe computes
    // — the argmax is data-dependent, so the oracle computes it too
    // rather than receiving literals. Assumes `wn(word, n)` in scope.
    val bpeChain: String = {
      def rep(e: String): String =
        s"replace($e, ' ' || b.pair || ' ', ' ' || replace(b.pair, ' ', '') || ' ')"
      val rounds = (1 to 10).map { k =>
        val prev = if (k == 1) "s0" else s"s${k - 1}"
        val r6 = (1 to 6).foldLeft("t.s")((e, _) => rep(e))
        s"""p$k AS (
          SELECT pair, SUM(n) AS np FROM (
            SELECT n, unnest(list_transform(range(1, len(arr)),
              i -> arr[i] || ' ' || arr[i + 1])) AS pair
            FROM (SELECT n, string_split(trim(s), ' ') AS arr FROM $prev))
          GROUP BY 1),
        b$k AS (SELECT pair, np FROM p$k ORDER BY np DESC, pair LIMIT 1),
        s$k AS (SELECT t.word, t.n, $r6 AS s FROM $prev t, b$k b)"""
      }.mkString(",\n        ")
      s"""s0 AS (SELECT word, n,
          ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS s FROM wn),
        $rounds"""
    }
    val bpeRanks = (1 to 10).map(k =>
      s"SELECT CAST($k AS BIGINT) AS merge_rank, pair, " +
        s"CAST(np AS BIGINT) AS n_pair FROM b$k").mkString("\n          UNION ALL ")
    Map(
      "t01_langid" -> s"""
        WITH t AS (
          SELECT lang, string_split_regex(lower(text), '\\s+') AS toks, text
          FROM documents),
        scored AS (
          SELECT lang, $wordScoreCols, $zhScoreCol AS s_zh FROM t),
        pred AS (
          SELECT lang, CASE
            WHEN greatest(s_en, s_es, s_fr, s_de, s_zh) = 0 THEN 'und'
            WHEN s_en = greatest(s_en, s_es, s_fr, s_de, s_zh) THEN 'en'
            WHEN s_es = greatest(s_en, s_es, s_fr, s_de, s_zh) THEN 'es'
            WHEN s_fr = greatest(s_en, s_es, s_fr, s_de, s_zh) THEN 'fr'
            WHEN s_de = greatest(s_en, s_es, s_fr, s_de, s_zh) THEN 'de'
            ELSE 'zh' END AS pred_lang
          FROM scored)
        SELECT lang, pred_lang, COUNT(*) AS n_docs
        FROM pred GROUP BY lang, pred_lang ORDER BY lang, pred_lang""",

      "t02_quality_score" -> s"""
        WITH t AS (
          SELECT doc_id, text,
            string_split_regex(lower(text), '\\s+') AS toks
          FROM documents),
        c AS (
          SELECT doc_id, text, len(toks) AS n_tokens,
            len(list_filter(toks, x -> x IN (${StopWords.map(w => s"'$w'").mkString(",")}))) AS n_stop
          FROM t)
        SELECT doc_id, n_tokens, n_stop,
          ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE) / n_tokens, 6) AS avg_token_len,
          ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stop_ratio,
          ROUND((CAST(n_stop AS DOUBLE) / n_tokens) * 0.5 +
                least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5, 6) AS quality_score
        FROM c ORDER BY doc_id""",

      "t03_token_count" -> """
        SELECT doc_id,
          len(string_split_regex(lower(text), '\s+')) AS ws_tokens,
          len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS re_tokens,
          length(text) AS n_chars_computed,
          n_chars
        FROM documents ORDER BY doc_id""",

      "t04_fingerprint" -> """
        WITH t AS (
          SELECT doc_id, text, md5(text) AS content_md5,
            string_split_regex(lower(text), '\s+') AS toks
          FROM documents),
        g AS (
          SELECT doc_id, content_md5,
            CASE WHEN len(toks) >= 3
              THEN list_transform(range(1, len(toks) - 1),
                     i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
              ELSE [lower(text)] END AS grams
          FROM t)
        SELECT doc_id, content_md5,
          CAST(concat('0x', substr(content_md5, 1, 15)) AS BIGINT) AS fp60,
          list_aggregate(list_transform(grams,
            x -> CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)), 'min') AS min_shingle_hash,
          list_aggregate(list_transform(grams,
            x -> CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)), 'max') AS max_shingle_hash
        FROM g ORDER BY doc_id""",

      "t05_pii_redact" -> """
        WITH dirty AS (
          SELECT doc_id,
            concat(text, ' contact user', doc_id, '@mail.example.com or +1-555-',
                   lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'), ' now') AS t
          FROM documents)
        SELECT doc_id,
          CAST(len(regexp_extract_all(t, '[a-z0-9._%-]+@[a-z0-9.-]+\.[a-z][a-z]+')) AS INT) AS n_emails,
          CAST(len(regexp_extract_all(t, '\+[0-9][0-9-]+[0-9]')) AS INT) AS n_phones,
          regexp_replace(regexp_replace(t, '[a-z0-9._%-]+@[a-z0-9.-]+\.[a-z][a-z]+', '<EMAIL>', 'g'),
            '\+[0-9][0-9-]+[0-9]', '<PHONE>', 'g') AS redacted
        FROM dirty ORDER BY doc_id""",

      "t06_ngram_topk" -> """
        WITH toks AS (
          SELECT list_filter(string_split(text, ' '), x -> x <> '') AS w
          FROM documents),
        bi AS (
          SELECT unnest(CASE WHEN len(w) >= 2
            THEN list_transform(range(1, len(w)), i -> concat_ws(' ', w[i], w[i+1]))
            ELSE [] END) AS bigram
          FROM toks)
        SELECT bigram, COUNT(*) AS n FROM bi
        GROUP BY bigram ORDER BY n DESC, bigram LIMIT 50""",

      "t07_token_entropy" -> """
        WITH tok AS (
          SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
          FROM documents),
        c AS (SELECT doc_id, tok, COUNT(*) AS n FROM tok GROUP BY 1, 2)
        SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_tokens,
          COUNT(*) AS n_distinct,
          ROUND(log2(SUM(n)) - SUM(n * log2(n)) / SUM(n), 6) AS entropy
        FROM c GROUP BY doc_id ORDER BY doc_id""",

      // bigram key is the joined string (tokens are \s+-split so they
      // contain no spaces — the pair is recoverable by split_part)
      "t08_bigram_logprob" -> """
        WITH t AS (
          SELECT doc_id, string_split_regex(lower(text), '\s+') AS w
          FROM documents),
        bi AS (
          SELECT doc_id, unnest(CASE WHEN len(w) >= 2
            THEN list_transform(range(1, len(w)), i -> concat_ws(' ', w[i], w[i+1]))
            ELSE [] END) AS bg
          FROM t),
        c2 AS (SELECT bg, COUNT(*) AS n2 FROM bi GROUP BY bg),
        c1 AS (SELECT split_part(bg, ' ', 1) AS w1, COUNT(*) AS n1 FROM bi GROUP BY 1)
        SELECT doc_id, COUNT(*) AS n_bigrams,
          ROUND(AVG(ln(CAST(n2 AS DOUBLE) / n1)), 6) AS bigram_logprob
        FROM bi
        JOIN c2 USING (bg)
        JOIN c1 ON split_part(bi.bg, ' ', 1) = c1.w1
        GROUP BY doc_id ORDER BY doc_id""",

      // t09: quantile_cont mirrors Spark's exact `percentile` (same
      // linear interpolation at rank p*(n-1)); both operate on the
      // identical rounded-6 scores and the threshold is re-rounded to
      // 2 decimals, so the keep flag cannot split on ulp noise
      "t09_lm_quality_filter" -> """
        WITH t AS (
          SELECT doc_id, string_split_regex(lower(text), '\s+') AS w
          FROM documents),
        bi AS (
          SELECT doc_id, unnest(CASE WHEN len(w) >= 2
            THEN list_transform(range(1, len(w)), i -> concat_ws(' ', w[i], w[i+1]))
            ELSE [] END) AS bg
          FROM t),
        c2 AS (SELECT bg, COUNT(*) AS n2 FROM bi GROUP BY bg),
        c1 AS (SELECT split_part(bg, ' ', 1) AS w1, COUNT(*) AS n1 FROM bi GROUP BY 1),
        scored AS (
          SELECT doc_id, COUNT(*) AS n_bigrams,
            ROUND(AVG(ln(CAST(n2 AS DOUBLE) / n1)), 6) AS bigram_logprob
          FROM bi
          JOIN c2 USING (bg)
          JOIN c1 ON split_part(bi.bg, ' ', 1) = c1.w1
          GROUP BY doc_id),
        thr AS (
          SELECT ROUND(quantile_cont(bigram_logprob, 0.10), 2) AS thr
          FROM scored)
        SELECT doc_id, n_bigrams, bigram_logprob,
          CASE WHEN bigram_logprob > thr THEN 1 ELSE 0 END AS lm_keep
        FROM scored, thr ORDER BY doc_id""",

      // t10: the recursive CTE replays the exact greedy longest-prefix
      // match — per step, the longest vocab prefix of `rest` (unique:
      // two distinct same-length strings can't both prefix one rest)
      // is consumed, else one char falls back as OOV; terminal rows
      // (rest = '') carry each distinct word's segmentation. The
      // vocab is the 10 BPE symbols from the t17 replay chain —
      // re-trained in SQL, not received as literals.
      "t10_tokenizer_apply" -> s"""
        WITH RECURSIVE
        words AS (
          SELECT doc_id, w AS word FROM (
            SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS w
            FROM documents)
          WHERE w <> ''),
        wc AS (SELECT doc_id, word, COUNT(*) AS cnt FROM words GROUP BY 1, 2),
        wn AS (SELECT word, SUM(cnt) AS n FROM wc GROUP BY 1),
        $bpeChain,
        vocab AS (
          SELECT DISTINCT replace(pair, ' ', '') AS tok FROM (
            ${(1 to 10).map(k => s"SELECT pair FROM b$k").mkString(" UNION ALL ")})),
        dw AS (SELECT DISTINCT word FROM wc),
        r AS (
          SELECT word, word AS rest,
            CAST(0 AS BIGINT) AS toks, CAST(0 AS BIGINT) AS oov
          FROM dw
          UNION ALL
          SELECT word,
            substr(rest, 1 + CASE WHEN m IS NULL THEN 1 ELSE length(m) END),
            toks + 1,
            oov + CASE WHEN m IS NULL THEN 1 ELSE 0 END
          FROM (
            SELECT word, rest, toks, oov,
              (SELECT max_by(tok, length(tok)) FROM vocab v
                WHERE starts_with(rest, v.tok)) AS m
            FROM r WHERE rest <> '') t),
        seg AS (SELECT word, toks AS n_toks, oov FROM r WHERE rest = '')
        SELECT w.doc_id,
          CAST(SUM(s.n_toks * w.cnt) AS BIGINT) AS n_tokens,
          ROUND(CAST(SUM(s.oov * w.cnt) AS DOUBLE) /
            SUM(s.n_toks * w.cnt), 6) AS oov_rate
        FROM wc w JOIN seg s USING (word)
        GROUP BY 1 ORDER BY 1""",

      // t11 gate: n_test/n_pos are exact — population (docs with ≥1
      // bigram), teacher label (t02 score > rounded median) and the
      // %4 hold-out split are all SQL-expressible; auc_ok is the
      // pinned structural constant (the s08 convention — AUC itself
      // is LBFGS-dependent and not SQL-expressible)
      "t11_quality_classifier" -> s"""
        WITH t AS (
          SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w
          FROM documents),
        q AS (
          SELECT doc_id,
            ROUND((CAST(len(list_filter(w, x -> x IN
                (${StopWords.map(w => s"'$w'").mkString(",")}))) AS DOUBLE)
                / len(w)) * 0.5 +
              least(CAST(len(w) AS DOUBLE) / 100.0, 1.0) * 0.5, 6)
              AS quality_score
          FROM t WHERE len(w) >= 2),
        thr AS (SELECT ROUND(quantile_cont(quality_score, 0.5), 2) AS thr FROM q),
        lab AS (
          SELECT doc_id,
            CASE WHEN quality_score > thr THEN 1 ELSE 0 END AS label
          FROM q, thr)
        SELECT COUNT(*) AS n_test, CAST(SUM(label) AS BIGINT) AS n_pos,
          CAST(1 AS BIGINT) AS auc_ok
        FROM lab WHERE doc_id % 4 = 0""",

      "t12_bpe_pair_counts" -> """
        WITH words AS (
          SELECT w AS word FROM (
            SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
            FROM documents)
          WHERE w <> ''),
        wn AS (SELECT word, COUNT(*) AS n FROM words GROUP BY 1),
        pairs AS (
          SELECT n, unnest(list_transform(range(1, length(word)),
            i -> substr(word, i, 2))) AS pair
          FROM wn WHERE length(word) >= 2)
        SELECT pair, CAST(SUM(n) AS BIGINT) AS n_pair
        FROM pairs GROUP BY 1
        ORDER BY n_pair DESC, pair LIMIT 20""",

      "t13_keyword_extract" -> """
        WITH tok AS (
          SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
          FROM documents),
        tt AS (SELECT doc_id, term FROM tok WHERE len(term) > 0),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tt GROUP BY 1, 2),
        n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM tf),
        df AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
        scored AS (
          SELECT tf.doc_id, tf.term,
            ROUND(CAST(tf.tf AS DOUBLE) * ln(n.n_docs / df.df), 6) AS score
          FROM tf JOIN df USING (term) CROSS JOIN n),
        ranked AS (
          SELECT doc_id, term, score,
            ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY score DESC, term) AS rk
          FROM scored)
        SELECT doc_id, CAST(rk AS INT) AS rk, term, score
        FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk""",

      // DuckDB regexp_replace needs the explicit 'g' flag (Spark
      // replaces all matches by default); the pattern itself is
      // RE2-safe so both engines see identical matches.
      "t14_pii_redact" -> """
        SELECT c_custkey,
          regexp_replace(c_name, '[0-9]{6,}', '[ID]', 'g') AS masked_name,
          md5(c_name || '|graft-pii-v1') AS pseudonym,
          CAST(len(regexp_extract_all(c_name, '[0-9]{6,}')) AS BIGINT)
            AS pii_hits
        FROM customer ORDER BY c_custkey""",

      "t15_repetition_signals" -> """
        WITH t AS (
          SELECT doc_id, string_split_regex(lower(text), '\s+') AS w
          FROM documents),
        base AS (
          SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
            CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct, w
          FROM t WHERE len(w) >= 2),
        bi AS (
          SELECT doc_id, n_tokens, n_distinct,
            unnest(list_transform(range(1, len(w)),
              i -> w[i] || ' ' || w[i + 1])) AS bg
          FROM base),
        cnt AS (
          SELECT doc_id, n_tokens, n_distinct, bg, COUNT(*) AS n
          FROM bi GROUP BY 1, 2, 3, 4),
        top AS (
          SELECT doc_id, n_tokens, n_distinct,
            CAST(MAX(n) AS BIGINT) AS top_bigram_n
          FROM cnt GROUP BY 1, 2, 3)
        SELECT doc_id, n_tokens, n_distinct,
          ROUND(1.0 - CAST(n_distinct AS DOUBLE) / n_tokens, 6)
            AS dup_token_frac,
          top_bigram_n,
          ROUND(CAST(top_bigram_n AS DOUBLE) * 2.0 / n_tokens, 6)
            AS top_bigram_frac,
          CASE WHEN ROUND(1.0 - CAST(n_distinct AS DOUBLE) / n_tokens, 6)
                 <= 0.62
                AND ROUND(CAST(top_bigram_n AS DOUBLE) * 2.0 / n_tokens, 6)
                 <= 0.2
            THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS keep
        FROM top ORDER BY doc_id""",

      // t16: full replay — 6dp-rounded ln points (rounding collapses
      // the libm-vs-JVM 1-ulp log divergence before any sum), ordered
      // pairwise window sums for every Σ, identical OLS closed form
      "t16_zipf_heaps" -> """
        WITH tok AS (
          SELECT doc_id, unnest(string_split_regex(lower(text), '\s+'))
            AS term
          FROM documents),
        zc AS (SELECT term, COUNT(*) AS cnt FROM tok GROUP BY term),
        zr AS (
          SELECT ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS rnk, cnt
          FROM zc),
        zp AS (
          SELECT ROUND(ln(CAST(rnk AS DOUBLE)), 6) AS x,
                 ROUND(ln(CAST(cnt AS DOUBLE)), 6) AS y
          FROM zr WHERE rnk <= 256),
        t AS (
          SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
          FROM documents),
        pd AS (
          SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM t),
        mx AS (SELECT MAX(doc_id) AS mx FROM pd),
        bt AS (
          SELECT doc_id * 32 // (mx + 1) AS bucket,
                 CAST(SUM(n_tokens) AS BIGINT) AS bucket_tokens
          FROM pd, mx GROUP BY 1),
        g AS (
          SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
            i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS gram
          FROM t WHERE len(toks) >= 3),
        fs AS (SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY gram),
        nt AS (
          SELECT first_doc * 32 // (mx + 1) AS bucket,
                 CAST(COUNT(*) AS BIGINT) AS new_types
          FROM fs, mx GROUP BY 1),
        hc AS (
          SELECT bt.bucket,
            SUM(bucket_tokens) OVER (ORDER BY bt.bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS cum_tokens,
            SUM(COALESCE(new_types, 0)) OVER (ORDER BY bt.bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS cum_types
          FROM bt LEFT JOIN nt ON bt.bucket = nt.bucket),
        hp AS (
          SELECT ROUND(ln(CAST(cum_tokens AS DOUBLE)), 6) AS x,
                 ROUND(ln(CAST(cum_types AS DOUBLE)), 6) AS y
          FROM hc),
        fz AS (
          SELECT DISTINCT CAST(COUNT(*) OVER w AS DOUBLE) AS n,
            SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
            SUM(x*y) OVER w AS sxy, SUM(x*x) OVER w AS sxx,
            SUM(y*y) OVER w AS syy
          FROM zp WINDOW w AS (ORDER BY x, y
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
        fh AS (
          SELECT DISTINCT CAST(COUNT(*) OVER w AS DOUBLE) AS n,
            SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
            SUM(x*y) OVER w AS sxy, SUM(x*x) OVER w AS sxx,
            SUM(y*y) OVER w AS syy
          FROM hp WINDOW w AS (ORDER BY x, y
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        SELECT 'heaps_trigram' AS metric, CAST(n AS BIGINT) AS n_points,
          ROUND((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope,
          ROUND((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n, 6)
            AS intercept,
          ROUND(((n*sxy - sx*sy) * (n*sxy - sx*sy)) /
            ((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) AS r2
        FROM fh
        UNION ALL
        SELECT 'zipf_unigram' AS metric, CAST(n AS BIGINT) AS n_points,
          ROUND((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope,
          ROUND((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n, 6)
            AS intercept,
          ROUND(((n*sxy - sx*sy) * (n*sxy - sx*sy)) /
            ((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) AS r2
        FROM fz
        ORDER BY metric""",

      // t17: the full 10-round trainer replayed as the unrolled CTE
      // chain (argmax and 6-pass rewrite re-derived per round)
      "t17_bpe_trainer" -> s"""
        WITH words AS (
          SELECT w AS word FROM (
            SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w
            FROM documents)
          WHERE w <> ''),
        wn AS (SELECT word, COUNT(*) AS n FROM words GROUP BY 1),
        $bpeChain
        SELECT merge_rank, pair, n_pair FROM (
          $bpeRanks)
        ORDER BY merge_rank"""
    )
  }
}
