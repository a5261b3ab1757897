package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Large-scale training-data pipeline operators over the documents and
  * embeddings tables — exact dedup, MinHash+LSH near-dup, SimHash,
  * fingerprinting, token/quality/language stats, and ANN (brute-force +
  * IVF-style bucketed) — built from native `functions._` (codegen'd; no
  * UDFs in any hot path). Where an op is SQL-expressible with identical
  * semantics in DuckDB, `oracleSql` carries the oracle.
  */
object TrainingOps {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Feeds.table(spark, dir, "documents.parquet") // size-guarded shared decode

  private def embeddings(spark: SparkSession, dir: String): DataFrame =
    Feeds.table(spark, dir, "embeddings.parquet") // size-guarded shared decode

  /** ASCII word tokens, lowercased — semantics shared with the DuckDB oracle
    * (regexp_extract_all on lower()).
    */
  private val toks: Column = expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")

  // ---- exact dedup: hash-groupBy on content ----
  val exactDup: (SparkSession, String) => DataFrame = (spark, dir) =>
    docs(spark, dir)
      .groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .orderBy("h")

  // ---- token counting ----
  val tokenStats: (SparkSession, String) => DataFrame = (spark, dir) =>
    docs(spark, dir)
      .withColumn("toks", toks)
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
        expr("aggregate(transform(toks, w -> length(w)), 0, (a, b) -> a + b)")
          .cast("long").as("n_token_chars"))
      .orderBy("doc_id")

  // ---- per-doc corpus-hapax SHINGLE census: how much of each document
  //      is made of 3-token shingles that occur EXACTLY ONCE in the whole
  //      corpus — the novelty/noise signal a filtering pipeline reads
  //      next to TTR (high hapax share = genuinely novel text or OCR
  //      junk; near-zero = boilerplate). The unit is the [[novelty]]
  //      shingle (same transform/slice construction — one definition of
  //      "shingle" across the two ops), counted by OCCURRENCE, not
  //      distinct: hapax = corpus occurrence count 1, so its single
  //      occurrence sits in one doc with c = 1 and count(*) over the
  //      semi-join IS the occurrence count. WORD-level hapax is
  //      degenerate on this synthetic corpus (the small vocabulary
  //      repeats every token; zero hapax at every sf — the typeAffinity
  //      lesson), while the shingle space is sparse enough to carry a
  //      real tail (~57% of shingle types corpus-wide). decile =
  //      (n_hapax * 10) div n_sh in 0..10 (10 = all-hapax), sentinel 11
  //      for docs under 3 tokens (no shingles — the repNgramStats
  //      contract, but kept in the census rather than dropped). Scale
  //      shape: the (doc, shingle) tf frame is map-side combinable;
  //      corpus counts are ONE shingle-keyed rollup of tf partials
  //      (never raw occurrences); hapax membership is a shingle-keyed
  //      semi-join (NOT broadcast — the hapax set is about half the
  //      shingle vocabulary, far too big to ship); the census is
  //      doc-bounded then decile-bounded. ----
  val docHapax: (SparkSession, String) => DataFrame = (spark, dir) => {
    val base = docsSpread(spark, dir)
      .withColumn("ts", toks)
      .select(col("doc_id"), col("ts"))
      .localCheckpoint(true) // feeds both the explode and the n_sh frame
    val tf = base.filter(size(col("ts")) >= 3)
      .select(col("doc_id"),
        explode(expr("transform(sequence(1, size(ts) - 2), i -> concat_ws(' ', slice(ts, i, 3)))")).as("s"))
      .groupBy("doc_id", "s").agg(count(lit(1)).as("c"))
    val hap = tf.groupBy("s").agg(sum("c").as("f"))
      .filter(col("f") === 1L).select("s")
    val perDoc = tf.join(hap, Seq("s"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("h"))
    base.select(col("doc_id"),
        greatest(size(col("ts")) - 2, lit(0)).cast("long").as("n_sh"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_sh"),
        coalesce(col("h"), lit(0L)).as("n_hapax"))
      .withColumn("decile",
        when(col("n_sh") === 0L, lit(11L))
          .otherwise(expr("(n_hapax * 10) div n_sh")))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("doc_sum"),
        sum("n_hapax").as("hapax_sum"), sum("n_sh").as("sh_sum"))
      .orderBy("decile")
  }

  /** TOKEN BURSTINESS census (Church & Gale 1995): per token TYPE, the
    * ratio of total occurrences to document frequency — b_x1000 =
    * (tf * 1000) div df >= 1000, exactly 1000 for tokens that never
    * repeat within a document ("sprinkled" function-word behavior), high
    * for content words that CLUMP where they appear — the lexical
    * statistic behind every adaptive-LM cache and topical-term detector.
    * Types fold by the binary-digit-count bucket of the EXCESS
    * (b - 999, so non-repeating types land in bucket 0) with n_tokens
    * (type count), tf/df checksums and b_max. Plan: one
    * map-side-combinable (doc, token) rollup (the explode ships partial
    * counts, never raw text), one token-keyed fold over the
    * vocabulary-sized table, a bucket-bounded census — the
    * [[sourceSimpson]] plan genus on the type axis.
    */
  val tokenBurstiness: (SparkSession, String) => DataFrame = (spark, dir) =>
    docs(spark, dir).withColumn("toks", toks)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("tok").agg(sum("c").as("tf"), count(lit(1)).as("df"))
      .select(expr("(tf * 1000) div df").as("b"), col("tf"), col("df"))
      .groupBy((length(bin(col("b") - 999L)) - 1).cast("long").as("b_bucket"))
      .agg(count(lit(1)).as("n_tokens"), sum("tf").as("tf_sum"),
        sum("df").as("df_sum"), max("b").as("b_max"))
      .orderBy("b_bucket")

  /** SENTENCE-LENGTH census — the words-per-sentence distribution behind
    * every readability score (Flesch's W/S term, kept integer-exact and
    * libm-free): text splits on '[.!?]+' runs (Java regex and RE2 agree
    * on this class), each fragment re-tokenizes with the shared
    * '[a-z0-9]+' contract, and fragments with ZERO tokens drop on both
    * sides (stated — leading/trailing splits and punctuation-only
    * fragments vanish identically, which makes the engine/oracle
    * empty-handling differences moot by construction). Sentences fold by
    * the binary-digit-count bucket of their token count with
    * n_sentences, token and doc-id checksums. Plan: one narrow explode
    * and one bucket-bounded map-side-combinable fold — no joins at all.
    */
  val sentenceCensus: (SparkSession, String) => DataFrame = (spark, dir) =>
    docs(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), "[.!?]+")).as("sent"))
      .select(col("doc_id"),
        size(expr("regexp_extract_all(lower(sent), '[a-z0-9]+', 0)"))
          .cast("long").as("wps"))
      .filter(col("wps") >= 1L)
      .groupBy((length(bin(col("wps"))) - 1).cast("long").as("wps_bucket"))
      .agg(count(lit(1)).as("n_sentences"), sum("wps").as("tok_sum"),
        sum("doc_id").as("doc_sum"), max("wps").as("wps_max"))
      .orderBy("wps_bucket")

  /** FLESCH READING-EASE band census — the classic readability score
    * kept integer-exact in milli-units: fre_m = 206835
    * - (1015*W) div S - (84600*Syl) div W, where W = tokens (shared
    * '[a-z0-9]+' contract), S = sentences (fragments of the '[.!?]+'
    * split that contain at least one token character — the
    * [[sentenceCensus]] contract restated as a lambda filter, no
    * explode), and Syl = the vowel-run syllable proxy
    * (count of '[aeiou]+' matches; every vowel lives inside a token so
    * whole-text runs equal the per-token sum by construction). Both
    * divisions are over positive integers, so Spark's truncating div
    * and DuckDB's flooring // agree; fre_m itself may go negative but
    * is never divided. Docs fold into Flesch's published bands
    * (>=90 very easy .. <0 clamped into band 0) via CASE compares —
    * no negative division anywhere. Plan: ONE narrow projection per
    * doc (three regexp aggregates, no explode, no join) and a
    * six-key fold — entirely map-side-combinable.
    */
  val readability: (SparkSession, String) => DataFrame = (spark, dir) =>
    docs(spark, dir)
      .select(col("doc_id"),
        size(filter(split(col("text"), "[.!?]+"),
          s => lower(s).rlike("[a-z0-9]"))).cast("long").as("s_cnt"),
        size(toks).cast("long").as("w"),
        size(expr("regexp_extract_all(lower(text), '[aeiou]+', 0)"))
          .cast("long").as("syl"))
      .filter(col("w") >= 1L && col("s_cnt") >= 1L)
      .withColumn("fre_m",
        lit(206835L) - expr("(1015 * w) div s_cnt") - expr("(84600 * syl) div w"))
      .groupBy(when(col("fre_m") >= 90000L, 5L)
        .when(col("fre_m") >= 70000L, 4L).when(col("fre_m") >= 50000L, 3L)
        .when(col("fre_m") >= 30000L, 2L).when(col("fre_m") >= 0L, 1L)
        .otherwise(0L).as("band"))
      .agg(count(lit(1)).as("n_docs"), min("fre_m").as("fre_min"),
        max("fre_m").as("fre_max"), sum("w").as("w_sum"),
        sum("s_cnt").as("s_sum"), sum("syl").as("syl_sum"))
      .orderBy("band")

  /** YULE'S K vocabulary-richness census — the repeat-rate statistic
    * K = 10^4 * (S2 - S1) / S1^2 over each document's token frequency
    * spectrum (S1 = token count N, S2 = sum of squared type counts),
    * kept exact: yk = (10000 * (s2 - n)) div (n * n) >= 0 since
    * S2 >= N termwise. K is length-insensitive where TTR is not — the
    * standard lexical-diversity signal next to a quality gate. Docs
    * with n < 2 drop (stated — K needs a possible repeat). Fold by
    * binary digit count of yk + 1 (yk = 0 = all-distinct docs land in
    * bucket 0) with n/s2 checksums. Plan: the [[tokenBurstiness]]
    * (doc, token) map-side-combinable rollup folded per doc instead of
    * per type — one explode, no joins, bucket-bounded output.
    */
  val yuleK: (SparkSession, String) => DataFrame = (spark, dir) =>
    docs(spark, dir).withColumn("toks", toks)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(sum("c").as("n"), sum(col("c") * col("c")).as("s2"))
      .filter(col("n") >= 2L)
      .select(expr("(10000 * (s2 - n)) div (n * n)").as("yk"),
        col("n"), col("s2"))
      .groupBy((length(bin(col("yk") + 1L)) - 1).cast("long").as("yk_bucket"))
      .agg(count(lit(1)).as("n_docs"), min("yk").as("yk_min"),
        max("yk").as("yk_max"), sum("n").as("n_sum"), sum("s2").as("s2_sum"))
      .orderBy("yk_bucket")

  // ---- quality scoring: integer-exact signals ----
  val qualityScore: (SparkSession, String) => DataFrame = (spark, dir) =>
    docs(spark, dir)
      .withColumn("toks", toks)
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(col("toks")).cast("long").as("n_tokens"),
        regexp_count(col("text"), lit("[.!?]")).cast("long").as("n_sentence_punct"),
        regexp_count(col("text"), lit("[0-9]")).cast("long").as("n_digits"),
        (size(array_distinct(col("toks"))) * 1000L / greatest(size(col("toks")), lit(1)))
          .cast("long").as("ttr_x1000"))
      .orderBy("doc_id")

  // ---- PII / pattern scrub census: the per-source risk scan a pipeline
  //      runs BEFORE deciding what needs redaction ----
  /** Per-source pattern census over the raw text: digit characters, '@'
    * characters, 'http' link hits and email-shaped bigrams
    * (`[a-z0-9]@[a-z0-9]`, a deliberately narrow marker — full address
    * grammars differ across regex engines; this class-literal pattern is
    * identical in Java regex and RE2), plus the integer digit ratio per
    * 1000 chars. One narrow per-row scan + one map-side-combinable
    * source-keyed aggregate — nothing wider than the source registry ever
    * shuffles. The oracle counts the same patterns via
    * len(regexp_extract_all); counts are engine-independent because every
    * pattern is a single-char class or a literal.
    */
  val scrubCensus: (SparkSession, String) => DataFrame = (spark, dir) =>
    docs(spark, dir)
      .select(col("source"),
        length(col("text")).cast("long").as("nc"),
        regexp_count(col("text"), lit("[0-9]")).cast("long").as("digits"),
        regexp_count(col("text"), lit("@")).cast("long").as("ats"),
        regexp_count(col("text"), lit("http")).cast("long").as("urls"),
        regexp_count(col("text"), lit("[a-z0-9]@[a-z0-9]")).cast("long").as("emailish"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("nc").as("total_chars"),
        sum("digits").as("digit_chars"), sum("ats").as("at_chars"),
        sum("urls").as("url_hits"), sum("emailish").as("email_hits"))
      .select(col("source"), col("n_docs"), col("total_chars"),
        col("digit_chars"), col("at_chars"), col("url_hits"), col("email_hits"),
        expr("(digit_chars * 1000L) div total_chars").as("digit_ratio_x1000"))
      .orderBy("source")

  // ---- language id: marker-token voting (heuristic; engine-only) ----
  val langId: (SparkSession, String) => DataFrame = (spark, dir) => {
    val markers = Map(
      "en" -> Seq("the", "and", "of", "fast", "table"),
      "fr" -> Seq("le", "la", "et", "des", "une"),
      "de" -> Seq("der", "und", "die", "nicht", "ein"),
      "es" -> Seq("el", "y", "los", "una", "que"),
      "zh" -> Seq("de", "shi", "le", "zai", "he"))
    val scored = docs(spark, dir).withColumn("toks", toks)
    val scoreCols = markers.toSeq.sortBy(_._1).map { case (lang, ws) =>
      val hits = ws.map(w => size(filter(col("toks"), t => t === w))).reduce(_ + _)
      struct(hits.cast("long").as("score"), lit(lang).as("lang"))
    }
    scored.select(col("doc_id"), col("lang").as("lang_given"),
        greatest(scoreCols: _*).getField("lang").as("lang_pred"))
      .withColumn("agree", col("lang_pred") === col("lang_given"))
      .orderBy("doc_id")
  }

  // ---- per-source corpus stats: one rollup pass, map-side combinable ----
  /** Corpus composition by (source, lang) with source subtotals and a grand
    * total in ONE rollup aggregation. Subtotal rows are relabeled '(all)'
    * via grouping() — NOT coalesce — so a genuine NULL (or literal
    * '(all)') leaf value can never collide with a subtotal row. This is
    * the shape a pipeline dashboards per-crawl: counts, volume, id
    * watermark.
    */
  val sourceStats: (SparkSession, String) => DataFrame = (spark, dir) =>
    docs(spark, dir)
      .rollup("source", "lang")
      .agg(grouping(col("source")).as("gs"), grouping(col("lang")).as("gl"),
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"))
      .select(when(col("gs") === 1, lit("(all)")).otherwise(col("source")).as("source"),
        when(col("gl") === 1, lit("(all)")).otherwise(col("lang")).as("lang"),
        col("n_docs"), col("sum_chars"), col("min_doc"))
      .orderBy("source", "lang")

  // ---- top-k terms per source: exact heavy-hitters over the corpus ----

  /** Bounded partial-top-k count aggregator: keeps the k largest count
    * values (with multiplicity) per group — map-side combinable, state
    * O(k) per group. `finish` returns the k-th largest count seen (or
    * Long.MinValue when the group has fewer than k rows): the per-group
    * CANDIDATE CUTOFF — every row that can rank <= k under (count DESC,
    * any tiebreak) has n >= cutoff, and the candidate set is at most
    * k + (the cutoff count-class's population) rows.
    */
  /** Buffer: counts sorted DESCENDING, length <= k. reduce() runs once per
    * vocabulary row on the map-side combine path, so it is allocation-free
    * except when the row actually enters the top-k (one shift-insert into
    * the primitive array); sub-cutoff rows cost one comparison.
    */
  private final class KthLargestCount(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Long], Long] {
    def zero: Array[Long] = Array.emptyLongArray
    def reduce(b: Array[Long], n: Long): Array[Long] = {
      if (b.length >= k && n <= b(b.length - 1)) return b
      val out = new Array[Long](math.min(b.length + 1, k))
      var i = 0
      while (i < b.length && b(i) >= n) { out(i) = b(i); i += 1 }
      if (i < out.length) {
        out(i) = n
        var j = i + 1
        while (j < out.length) { out(j) = b(j - 1); j += 1 }
      }
      out
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var o = 0
      while (o < out.length) {
        if (j >= b.length || (i < a.length && a(i) >= b(j))) { out(o) = a(i); i += 1 }
        else { out(o) = b(j); j += 1 }
        o += 1
      }
      out
    }
    def finish(b: Array[Long]): Long = if (b.length < k) Long.MinValue else b(k - 1)
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
  }

  /** [[KthLargestCount]] mirrored to the k-th SMALLEST value — the KMV
    * sketch fold: buffer = the k smallest values seen, ASCENDING, length
    * <= k; map-side combinable, O(k) state per group. `finish` returns the
    * k-th smallest (Long.MaxValue when the group has fewer than k rows —
    * a sentinel the caller filters on via the exact count).
    */
  private final class KthSmallestValue(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Long], Long] {
    def zero: Array[Long] = Array.emptyLongArray
    def reduce(b: Array[Long], n: Long): Array[Long] = {
      if (b.length >= k && n >= b(b.length - 1)) return b
      val out = new Array[Long](math.min(b.length + 1, k))
      var i = 0
      while (i < b.length && b(i) <= n) { out(i) = b(i); i += 1 }
      if (i < out.length) {
        out(i) = n
        var j = i + 1
        while (j < out.length) { out(j) = b(j - 1); j += 1 }
      }
      out
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var o = 0
      while (o < out.length) {
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { out(o) = a(i); i += 1 }
        else { out(o) = b(j); j += 1 }
        o += 1
      }
      out
    }
    def finish(b: Array[Long]): Long = if (b.length < k) Long.MaxValue else b(k - 1)
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
  }

  /** The k most frequent tokens per source, exactly, with a fully
    * deterministic rank (count DESC, token ASC — no sketch, no tie
    * ambiguity). Scale shape: the heavy reduction is the map-side
    * combinable (source, token) groupBy — the explode never shuffles raw
    * tokens, only partial counts. The rank window then sees only the
    * CANDIDATES per source (≤ k + one count-class), not the source's whole
    * vocabulary: a bounded O(k)-state aggregator (same two-pass selection
    * idea as StatsOps.topEvents) finds each source's k-th largest count,
    * and rows below that cutoff — which can never rank ≤ k — are filtered
    * before the window. Both branches reuse the ONE (source, token)
    * shuffle (identical exchange, deduped by ReuseExchange); the cutoff
    * frame is one row per source and broadcasts at any corpus size.
    */
  val topTerms: (SparkSession, String) => DataFrame = (spark, dir) => {
    val k = 10
    val counts = docsSpread(spark, dir)
      .select(col("source"), explode(toks).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("n"))
    val cutoffs = counts.groupBy("source")
      .agg(udaf(new KthLargestCount(k)).apply(col("n")).as("cut"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("n").desc, col("tok").asc)
    counts.join(broadcast(cutoffs), "source")
      .filter(col("n") >= col("cut"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("source"), col("rank"), col("tok"), col("n"))
      .orderBy("source", "rank")
  }

  /** Zipf HEAD COVERAGE per source — what fraction of a source's token
    * mass its top-10 term types carry (boilerplate-heavy sources
    * concentrate; natural text spreads into the tail): composes the
    * [[topTerms]] selection VERBATIM (one definition of the top-10
    * contract, engine-side reuse mirrored by the oracle's shared CTE
    * shape) with the per-source occurrence totals;
    * head_x1000 = head_n * 1000 div n_tokens, all integers. Sources with
    * fewer than 10 term types report their full vocabulary as the head
    * (stated contract). Plan: the totals reduce map-side from the same
    * scan shape; the head side is the bounded 10-rows-per-source
    * topTerms output — the join is registry-sized.
    */
  val headCoverage: (SparkSession, String) => DataFrame = (spark, dir) => {
    val totals = docs(spark, dir)
      .select(col("source"), explode(toks).as("tok"))
      .groupBy("source").agg(count(lit(1)).as("n_tokens"))
    topTerms(spark, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_head_terms"), sum("n").as("head_n"))
      .join(totals, "source")
      .select(col("source"), col("n_tokens"), col("n_head_terms"), col("head_n"),
        expr("(head_n * 1000L) div n_tokens").as("head_x1000"))
      .orderBy("source")
  }

  /** Per-label embedding ENERGY census — the cheap health check a vector
    * pipeline runs before ANN indexing (collapsed or exploded embeddings
    * show up as degenerate norms): per vector, the exact integer energy
    * e = sum over dims of floor(x_i * 2^10)^2 (per-dim quantization
    * BEFORE squaring — the repo's quantize-then-integer rule, so the fold
    * is order-free and engine/oracle agree exactly); per label: count,
    * e_sum, e_min, e_max. One narrow higher-order `aggregate` over the
    * array column (never an explode — the raw floats don't shuffle), one
    * map-side-combinable groupBy on the label registry.
    */
  val embEnergy: (SparkSession, String) => DataFrame = (spark, dir) =>
    embeddings(spark, dir)
      .select(col("label"),
        expr("aggregate(embedding, 0L, (acc, x) -> acc + " +
          "cast(floor(x * 1024.0d) as bigint) * cast(floor(x * 1024.0d) as bigint))").as("e"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"), sum("e").as("e_sum"),
        min("e").as("e_min"), max("e").as("e_max"))
      .orderBy("label")

  /** JOHNSON-LINDENSTRAUSS DISTORTION census — the audit run before
    * trusting any random-projection index (sign-LSH, random-projection
    * trees): project every embedding onto k = 8 dimensions with a
    * deterministic +-1 sign matrix ENTIRELY IN THE INTEGER DOMAIN
    * (per-coordinate quantization qx = floor(x * 2^10) first — the
    * [[embEnergy]] convention — then p_j = sum_i s(i,j) * qx_i with
    * s(i,j) = +1 iff the first hex char of md5("j:i") is in 0..7, an
    * unbiased deterministic bit both engines compute identically), and
    * census the norm-preservation ratio rq = (sum_j p_j^2 * 1000) div
    * (8 * sum_i qx_i^2) — E[sum p_j^2] = k * |qx|^2 for +-1 signs, so a
    * JL-faithful projection reads ~1000; the bucket histogram's spread IS
    * the distortion (Achlioptas 2003's database-friendly projection,
    * audited without a single float). Fold per rq div 100 bucket with
    * n_vecs, vec_id checksum, rq sum + min/max. Scale shape: ONE narrow
    * posexplode, all 8 projections as map-side-combinable sums in ONE
    * vec_id rollup (the sign is an arithmetic function of (i, j) — no
    * matrix is materialized, let alone shuffled), census fold on a
    * handful of keys. Long headroom: |qx_i| < 2^11ish, |p_j| < 64 * 2^11
    * = 2^17, p_j^2 * 1000 < 2^44.
    */
  val embJlDistortion: (SparkSession, String) => DataFrame = (spark, dir) => {
    val d = embeddings(spark, dir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "x")))
      .select(col("vec_id"), col("i"),
        expr("cast(floor(x * 1024.0d) as bigint)").as("q"))
    def proj(j: Int) = sum(expr(
      s"case when substring(md5(concat('$j:', cast(i as string))), 1, 1) " +
        "in ('0','1','2','3','4','5','6','7') then q else -q end")).as(s"p$j")
    val aggs = sum(expr("q * q")).as("nrm2") +: (0 until 8).map(proj)
    d.groupBy("vec_id")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("vec_id"),
        expr("((((p0*p0 + p1*p1) + (p2*p2 + p3*p3)) + ((p4*p4 + p5*p5) + " +
          "(p6*p6 + p7*p7))) * 1000) div greatest(8 * nrm2, 1)").as("rq"))
      .groupBy(expr("rq div 100").as("rq_bucket"))
      .agg(count(lit(1)).as("n_vecs"), sum("vec_id").as("vid_sum"),
        sum("rq").as("rq_sum"), min("rq").as("rq_min"), max("rq").as("rq_max"))
      .orderBy("rq_bucket")
  }

  /** Per-DIMENSION embedding health census — the first diagnostic an
    * embedding pipeline reads before trusting a space: per dimension the
    * count, quantized sum / sum-of-squares / min / max (q = floor(x *
    * 1024), a power-of-2 multiplier so the float->double product is
    * EXACT and Spark/DuckDB floor the same value), and the truncated
    * population variance var_q = (n*S2 - S1^2) div n^2 in q^2 units —
    * dead dimensions read var_q = 0, dominant ones stick out, and a
    * mean offset shows in s1 without a single float crossing the
    * compare. The variance product widens through decimal(38,0) (n*S2
    * overflows a Long past ~1.5M vectors; decimal carries ~10^12
    * vectors x 2^22 q^2 with room) and truncates back to BIGINT —
    * numerator >= 0 termwise (Cauchy-Schwarz), so truncating div ==
    * floor on both sides. Plan: ONE narrow posexplode to (dim, q)
    * partials, entirely map-side-combinable into a dims-sized table —
    * no join, no window, output = 64 rows at any corpus size.
    */
  val embDimStats: (SparkSession, String) => DataFrame = (spark, dir) =>
    embeddings(spark, dir)
      .select(posexplode(col("embedding")).as(Seq("i", "x")))
      .select(col("i").cast("long").as("dim"),
        expr("cast(floor(x * 1024.0d) as bigint)").as("q"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"), sum("q").as("s1"),
        sum(expr("q * q")).as("s2"), min("q").as("q_min"), max("q").as("q_max"))
      .select(col("dim"), col("n"), col("s1"), col("s2"), col("q_min"),
        col("q_max"),
        expr("cast((cast(n as decimal(38,0)) * s2 - cast(s1 as decimal(38,0)) * s1)" +
          " div (cast(n as decimal(38,0)) * n) as bigint)").as("var_q"))
      .orderBy("dim")

  /** Per-label SEPARATION MATRIX over the embedding space — the
    * cluster-quality diagnostic an embedding pipeline reads before
    * trusting labels for stratification: off-diagonal rows (a < b) carry
    * the exact squared distance between the two labels' quantized
    * centroids (centroid = per-dim sum(q) div n, truncated); diagonal
    * rows carry the mean within-label squared distance to the own
    * centroid (sum div n) — the within/between contrast without a single
    * float. Plan: one narrow posexplode to (label, dim, q) partials
    * (map-side combinable to the k x dims centroid table, which is
    * broadcast back); the matrix itself is a k^2-bounded self-join.
    */
  val embSeparation: (SparkSession, String) => DataFrame = (spark, dir) => {
    val d = embeddings(spark, dir)
      .select(col("label").cast("long").as("label"),
        posexplode(col("embedding")).as(Seq("i", "x")))
      .select(col("label"), col("i"),
        expr("cast(floor(x * 1024.0d) as bigint)").as("q"))
    val c = d.groupBy("label", "i")
      .agg(expr("sum(q) div count(1)").as("c"), count(lit(1)).as("n"))
    val m = c.select(col("label").as("la"), col("i"), col("c").as("ca"))
      .join(c.select(col("label").as("lb"), col("i"), col("c").as("cb")), "i")
      .filter(col("la") < col("lb"))
      .groupBy("la", "lb")
      .agg(sum(expr("(ca - cb) * (ca - cb)")).as("d2"))
    val diag = d.join(broadcast(c), Seq("label", "i"))
      .groupBy("label")
      .agg(expr("sum((q - c) * (q - c)) div max(n)").as("d2"))
      .select(col("label").as("la"), col("label").as("lb"), col("d2"))
    m.unionByName(diag)
      .select(col("la").as("label_a"), col("lb").as("label_b"), col("d2"))
      .orderBy("label_a", "label_b")
  }

  /** Label-pair HAMMING-DISTANCE matrix over 16-bit sign-LSH sketches —
    * the binarized companion of [[embSeparation]] (how separable the
    * labels remain after the embedding collapses to a 16-bit code, i.e.
    * whether an LSH/bit-sliced index can stand in for float vectors).
    * The trick that makes an ALL-PAIRS statistic linear: the total
    * Hamming distance over every cross-label vector pair decomposes
    * per bit position b into cA_b*(nB - cB_b) + (nA - cA_b)*cB_b (set
    * bits in A against unset in B and vice versa), so one scan builds
    * the per-(label, bit) count table and the pair matrix is an O(L^2)
    * fold over an L-row frame — no vector pair is ever materialized.
    * Intra-label rows count each unordered pair once:
    * sum_b cA_b*(nA - cA_b) over nA*(nA-1)/2 pairs. Codes come from the
    * [[bucketed]] sign fold at 16 seeded planes (seed 11 — independent of
    * the IVF family's 4). Pair arithmetic rides decimal(38,0) and lands
    * as BIGINT (the loud-overflow posture: outputs bound the contract —
    * ham_sum <= 16 * n_pairs). The L x L join is a label-cardinality
    * nested loop by construction — L is a label-vocabulary constant,
    * never data-sized.
    */
  private[graft] val HammingBits = 16
  private[graft] val HammingPlanes: Array[Array[Double]] = ivfPlanes(HammingBits, seed = 11)

  val embHamming: (SparkSession, String) => DataFrame = (spark, dir) => {
    val codes = embeddings(spark, dir)
      .select(col("label").cast("long").as("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("planes", typedLit(HammingPlanes.map(_.toSeq).toSeq))
      .withColumn("code",
        expr("aggregate(transform(planes, p -> if(aggregate(zip_with(p, v, (x, y) -> x * y), 0D, (acc, d) -> acc + d) >= 0D, 1, 0)), 0, (acc, b) -> acc * 2 + b)").cast("long"))
      .select("label", "code")
    val bitCols = (0 until HammingBits).map(b =>
      sum(expr(s"(code >> $b) & 1")).cast("decimal(38,0)").as(s"c$b"))
    val lc = codes.groupBy("label")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"), bitCols: _*)
    val aSide = lc.select(col("label").as("label_a") +: col("n").as("na") +:
      (0 until HammingBits).map(b => col(s"c$b").as(s"a$b")): _*)
    val bSide = lc.select(col("label").as("label_b") +: col("n").as("nb") +:
      (0 until HammingBits).map(b => col(s"c$b").as(s"b$b")): _*)
    val interSum = (0 until HammingBits)
      .map(k => s"(a$k * (nb - b$k) + (na - a$k) * b$k)").mkString(" + ")
    val intraSum = (0 until HammingBits)
      .map(k => s"(a$k * (na - a$k))").mkString(" + ")
    aSide.join(bSide, col("label_a") <= col("label_b"))
      .select(col("label_a"), col("label_b"),
        when(col("label_a") === col("label_b"),
          expr("(na * (na - 1)) div 2").cast("decimal(38,0)"))
          .otherwise(expr("na * nb").cast("decimal(38,0)")).cast("long").as("n_pairs"),
        when(col("label_a") === col("label_b"), expr(intraSum))
          .otherwise(expr(interSum)).cast("long").as("ham_sum"))
      .withColumn("mean_hx1000", expr("(ham_sum * 1000) div greatest(n_pairs, 1)"))
      .orderBy("label_a", "label_b")
  }

  /** Characteristic terms per document — the TF-IDF idea with an
    * INTEGER-EXACT score: score = (tf * 1_000_000) div df (tf = term count
    * in the doc, df = number of docs containing the term). Monotone in
    * tf/df exactly like tf*idf for ranking purposes, but no log/float ever
    * crosses the engine/oracle compare; ties break (score DESC, token
    * ASC). Scale shape: tf is the map-side-combinable (doc, token)
    * groupBy; df aggregates the vocabulary-sized tf table; the join is
    * TOKEN-KEYED — at contract scale df fits the broadcast threshold and
    * Catalyst broadcasts it (plan-asserted in TrainingOpsTextSpec), while
    * a web-scale vocabulary exceeds any broadcast limit and the same plan
    * degrades gracefully to a token-keyed shuffle equi-join (never a
    * nested-loop/cartesian); the rank window partitions per doc over at
    * most |doc vocabulary| rows.
    */
  val charTerms: (SparkSession, String) => DataFrame = (spark, dir) => {
    val k = 3
    val tf = docsSpread(spark, dir)
      .select(col("doc_id"), explode(toks).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("tok").asc)
    tf.join(df, "tok")
      .withColumn("score", expr("(tf * 1000000L) div df"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("tok"), col("tf"), col("df"), col("score"))
      .orderBy("doc_id", "rank")
  }

  /** Fixed probe query terms for [[bm25]], shared verbatim with the
    * oracle SQL (the StopWords convention).
    */
  private val Bm25Terms = Seq("spark", "join", "merge", "vector", "window")

  /** BM25 retrieval scoring — the search-engine ranking function, made
    * INTEGER-EXACT by clearing the textbook fractions: with k1 = 6/5 and
    * b = 3/4, tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) over avgdl = S/N
    * multiplies out to core = 22*tf*S / (10*tf*S + 3*S + 9*dl*N) — every
    * operand a corpus integer (S = total tokens, N = docs, dl = doc
    * length), evaluated as one truncating decimal(38,0) division at 10^6
    * scale. The log-free idf companion is the probabilistic quotient
    * (N - df + 0.5)/(df + 0.5) = (2(N-df)+1)/(2df+1), same fixed point.
    * Final score = (core_x1e6 * idf_x1e6) div 10^6; top-5 docs per probe
    * term, ties (score DESC, doc_id ASC). Scale shape: the token stream
    * filters to the 5 probe terms BEFORE any shuffle (tf is a tiny
    * term-keyed groupBy over candidates only); dl is one narrow per-doc
    * size(); N/S is a single-row aggregate cross-joined in; df
    * re-aggregates the candidate tf frame; the rank window partitions per
    * term over that term's candidate docs only — the fact table is
    * scanned twice (dl + tf) and nothing vocabulary-sized shuffles.
    */
  val bm25: (SparkSession, String) => DataFrame = (spark, dir) => {
    val base = docsSpread(spark, dir).select(col("doc_id"), toks.as("tk"))
    val dl = base.select(col("doc_id"), size(col("tk")).cast("long").as("dl"))
    val tot = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("s_tokens"))
    val tf = base
      .select(col("doc_id"), explode(col("tk")).as("term"))
      .filter(col("term").isInCollection(Bm25Terms))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("term").orderBy(col("score").desc, col("doc_id").asc)
    tf.join(dl, "doc_id")
      .join(broadcast(dfq), "term")
      .crossJoin(broadcast(tot))
      .withColumn("core_x1e6",
        expr("""cast(cast(22 as decimal(38,0)) * tf * s_tokens * 1000000
               | div (cast(10 as decimal(38,0)) * tf * s_tokens
               |      + cast(3 as decimal(38,0)) * s_tokens
               |      + cast(9 as decimal(38,0)) * dl * n_docs) as long)""".stripMargin))
      .withColumn("idf_x1e6", expr("((2 * (n_docs - df) + 1) * 1000000L) div (2 * df + 1)"))
      .withColumn("score", expr("(core_x1e6 * idf_x1e6) div 1000000"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("term"), col("rank"), col("doc_id"), col("tf"), col("dl"),
        col("df"), col("core_x1e6"), col("idf_x1e6"), col("score"))
      .orderBy("term", "rank")
  }

  /** Chi-square keyword extraction per source — the classic
    * feature-selection statistic over the 2x2 document-frequency
    * contingency table (a = source docs containing the token, b = other
    * docs containing it, c = source docs without, d = others without):
    * chi2 = N*(ad - bc)^2 / ((a+b)(c+d)(a+c)(b+d)), emitted as the
    * truncating decimal(38,0) fixed point chi2_x1e6. Presence is
    * per-doc-DISTINCT tokens (a contingency table counts documents, not
    * occurrences). Top-3 tokens per source by (chi2 DESC, token ASC)
    * among tokens with a >= 3. PER-DOMAIN SCORING CONTRACT (the
    * collocations convention): the numerator N*(ad-bc)^2*10^6 is bounded
    * by N^5*10^6, so decimal(38,0) is exact for corpora up to ~10^6 docs
    * — beyond that, rescale the fixed point or bucket the corpus. Scale
    * shape: one distinct (doc, source, token) pass, then everything
    * re-aggregates vocabulary-sized frames; the per-source rank window
    * sees that source's vocabulary (the charTerms posture — honest, not
    * hidden; a web-scale caller pre-filters by df).
    */
  val chiTerms: (SparkSession, String) => DataFrame = (spark, dir) => {
    val pres = docsSpread(spark, dir)
      .select(col("source"), col("doc_id"), explode(toks).as("tok"))
      .distinct()
    val a = pres.groupBy("source", "tok").agg(count(lit(1)).as("a"))
    val dfTot = a.groupBy("tok").agg(sum(col("a")).as("df_t"))
    val nSrc = docsSpread(spark, dir).groupBy("source").agg(count(lit(1)).as("n_s"))
    val nAll = docsSpread(spark, dir).agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("chi2_x1e6").desc, col("tok").asc)
    a.join(dfTot, "tok")
      .join(broadcast(nSrc), "source")
      .crossJoin(broadcast(nAll))
      // a >= 3 is the support floor; df_t < n_docs drops corpus-universal
      // tokens, whose contingency column (c+d) is empty — chi2 is
      // undefined there (zero divisor under ANSI) and they separate
      // nothing anyway
      .filter(col("a") >= 3 && col("df_t") < col("n_docs"))
      .withColumn("bq", expr("df_t - a"))
      .withColumn("cq", expr("n_s - a"))
      .withColumn("dq", expr("n_docs - df_t - n_s + a"))
      .withColumn("chi2_x1e6",
        expr("""cast(cast(n_docs as decimal(38,0))
               |  * (cast(a as decimal(38,0)) * dq - cast(bq as decimal(38,0)) * cq)
               |  * (cast(a as decimal(38,0)) * dq - cast(bq as decimal(38,0)) * cq)
               |  * 1000000
               | div (cast(df_t as decimal(38,0)) * (cq + dq)
               |      * n_s * (bq + dq)) as long)""".stripMargin))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("source"), col("rank"), col("tok"), col("a"), col("df_t"),
        col("chi2_x1e6"))
      .orderBy("source", "rank")
  }

  // ---- document chunking: fixed token windows for sequence packing ----

  /** Split each document into overlapping token chunks (size 50, stride
    * 40 — the standard sliding-window prep for fixed-context training),
    * with a deterministic per-chunk fingerprint. Chunk count is pure
    * integer arithmetic (1 + (n-50+39) div 40 for n > 50, operands
    * positive so truncating and floor division agree); the chunk text is
    * the space-joined token slice and its md5 crosses the oracle compare
    * as a string — no float anywhere. One narrow explode per doc; nothing
    * shuffles before the trailing orderBy, which is PRESENTATION-ONLY for
    * the contract harness (a scale caller takes the frame before it).
    */
  val chunkDocs: (SparkSession, String) => DataFrame = (spark, dir) =>
    docs(spark, dir)
      .withColumn("toks", toks)
      .withColumn("n", size(col("toks")))
      .filter(col("n") > 0)
      .withColumn("nch", expr("CASE WHEN n <= 50 THEN 1 ELSE 1 + (n - 50 + 39) div 40 END"))
      .withColumn("chunk_idx", explode(expr("sequence(0L, nch - 1)")))
      .select(col("doc_id"), col("chunk_idx"),
        expr("slice(toks, cast(chunk_idx * 40 + 1 as int), 50)").as("chunk"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("chunk")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("chunk"))).as("fp"))
      .orderBy("doc_id", "chunk_idx")

  /** ZIPF RANK-MASS census — the direct rank-frequency readout (the
    * DUAL of [[tokenSpectrum]]'s count-of-counts): token types rank by
    * occurrence count descending (ties by token ascending — total,
    * deterministic), ranks fold by binary digit count, and each bucket
    * carries its type count, occurrence MASS, and count extremes — the
    * head-vs-tail mass curve a corpus skew read starts from, log-free.
    * Plan: one map-side-combinable token rollup; the rank window sees
    * the VOCABULARY-sized table only (the topTerms contract — vocab,
    * never corpus), partitioned by a non-foldable constant key (the
    * topEvents pmod idiom) so the bounded single partition doesn't trip
    * WindowExec's unpartitioned-window warning in the gate log.
    */
  val zipfRanks: (SparkSession, String) => DataFrame = (spark, dir) => {
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(length(col("tok")), lit(1)))
      .orderBy(col("c").desc, col("tok").asc)
    docs(spark, dir).select(explode(toks).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .withColumn("rank", row_number().over(win).cast("long"))
      .groupBy((length(bin(col("rank"))) - 1).cast("long").as("rank_bucket"))
      .agg(count(lit(1)).as("n_types"), sum("c").as("mass"),
        max("c").as("c_max"), min("c").as("c_min"))
      .orderBy("rank_bucket")
  }

  /** MOVING-AVERAGE TTR census (Covington & McFall's MATTR windows) —
    * the lexical-diversity statistic that fixes plain TTR's length
    * sensitivity by scoring fixed 50-token windows at stride 25: per
    * complete window, ttr_x1000 = distinct_types * 20 (the *1000 div 50
    * collapsed — exact by construction), folded per decile with window
    * counts and doc/type-mass checksums. Docs under 50 tokens carry no
    * complete window and DROP (stated). Complementary to [[yuleK]]
    * (whole-doc repeat rate) — this reads LOCAL diversity, the signal
    * that catches mid-document boilerplate runs a global statistic
    * averages away. Plan: entirely NARROW until the final fold — the
    * window enumeration is a per-row sequence explode and the distinct
    * count is array arithmetic on a slice (no (doc, window, token)
    * shuffle ever materializes), then one decile-keyed
    * map-side-combinable census. The explode's fan-out is n/25 rows per
    * doc — linear in corpus tokens with a 1/25 constant.
    */
  val mattr: (SparkSession, String) => DataFrame = (spark, dir) =>
    docs(spark, dir)
      .withColumn("toks", toks)
      .withColumn("n", size(col("toks")).cast("long"))
      .filter(col("n") >= 50L)
      .withColumn("w", explode(expr("sequence(0L, (n - 50) div 25)")))
      .select(col("doc_id"),
        (size(array_distinct(expr("slice(toks, cast(w * 25 + 1 as int), 50)")))
          .cast("long") * 20L).as("ttr"))
      .groupBy(expr("ttr div 100").as("ttr_decile"))
      .agg(count(lit(1)).as("n_windows"), sum("doc_id").as("doc_sum"),
        min("ttr").as("ttr_min"), max("ttr").as("ttr_max"),
        sum("ttr").as("ttr_sum"))
      .orderBy("ttr_decile")

  // ---- MinHash signatures: word 3-gram shingles, 16 md5-derived hashes ----
  private val NumHashes = 16

  // ---- quality signals: stopword ratio + repeated-n-gram fraction ----

  /** Fixed lowercase stopword list shared verbatim with the oracle SQL. */
  private val StopWords = Seq("the", "of", "and", "to", "in", "a", "is",
    "that", "it", "for", "on", "as", "with", "was", "at", "by", "an", "be",
    "this", "are")

  /** Stopword ratio per document — the classic fluency signal (a natural-
    * language doc carries a stable fraction of function words; lists and
    * boilerplate don't). Integer-exact: counts and a *1000 div ratio, no
    * floats. Narrow per-row expressions, no shuffle before the
    * presentation sort.
    */
  val stopwordStats: (SparkSession, String) => DataFrame = (spark, dir) => {
    val inList = StopWords.map(w => s"'$w'").mkString(", ")
    docs(spark, dir)
      .withColumn("toks", toks)
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        expr(s"size(filter(toks, t -> t IN ($inList)))").cast("long").as("n_stop"))
      .withColumn("stop_x1000",
        expr("(n_stop * 1000L) div greatest(n_tokens, 1L)"))
      .orderBy("doc_id")
  }

  /** Repeated-3-gram fraction per document — the Gopher-style repetition
    * rule (heavily duplicated n-grams mark low-quality/boilerplate text).
    * rep_x1000 = (n_shingles - n_distinct) * 1000 div max(n_shingles, 1),
    * all integers; docs under 3 tokens have zero shingles and report 0.
    */
  val repNgramStats: (SparkSession, String) => DataFrame = (spark, dir) =>
    docs(spark, dir)
      .withColumn("toks", toks)
      .withColumn("shingles",
        when(size(col("toks")) < 3, array().cast("array<string>"))
          .otherwise(expr("transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', slice(toks, i, 3)))")))
      .select(col("doc_id"),
        size(col("shingles")).cast("long").as("n_shingles"),
        size(array_distinct(col("shingles"))).cast("long").as("n_distinct"))
      .withColumn("rep_x1000",
        expr("((n_shingles - n_distinct) * 1000L) div greatest(n_shingles, 1L)"))
      .orderBy("doc_id")

  /** RAKE KEYPHRASE extraction per document — the classic stopword-
    * delimited keyphrase scorer (Rose et al.), integer-exact end to end:
    * phrases are MAXIMAL runs of non-stopword tokens (the shared
    * [[StopWords]] list delimits, the shared `toks` contract tokenizes);
    * within each document, word degree = sum of the lengths of the
    * phrases each occurrence sits in (self included, duplicates counted
    * per occurrence — a stated contract), word freq = occurrence count,
    * word score = (degree * 10^6) div freq (one truncating division —
    * the only non-sum), and a phrase's score is the sum of its member
    * occurrences' word scores. Emitted per document: the TOP phrase by
    * (score DESC, phrase ASC) — a total tie-break realized as ONE
    * lexicographic struct min over (-score, phrase, len); duplicate
    * phrase instances tie with identical payloads, so the winner row is
    * deterministic either way — plus the phrase count. Documents whose
    * tokens are all stopwords (no phrase) drop on both sides. Plan: one
    * doc_id exchange serves the position window, the segment window,
    * the per-(doc, token) rollup, AND the phrase regroup (every key is
    * doc-prefixed); per-phrase collect_list is bounded by document
    * length — the same per-doc-bounded contract as chunking. Long-safe
    * while every document stays under ~3M tokens (degree < n_doc_toks,
    * degree * 10^6 < 2^63).
    */
  val keyphrase: (SparkSession, String) => DataFrame = (spark, dir) => {
    val inList = StopWords.map(w => s"'$w'").mkString(", ")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val tok = docsSpread(spark, dir)
      .select(col("doc_id"), posexplode(toks).as(Seq("pos", "tok")))
      .withColumn("stop", expr(s"tok IN ($inList)"))
      .withColumn("seg", sum(when(col("stop"), 1L).otherwise(0L)).over(w))
      .filter(!col("stop"))
      .withColumn("plen", count(lit(1)).over(Window.partitionBy("doc_id", "seg")))
    val wordScores = tok.groupBy("doc_id", "tok")
      .agg(sum("plen").as("deg"), count(lit(1)).as("freq"))
      .select(col("doc_id"), col("tok"), expr("(deg * 1000000L) div freq").as("wscore"))
    tok.join(wordScores, Seq("doc_id", "tok"))
      .groupBy("doc_id", "seg")
      .agg(sum("wscore").as("score"), count(lit(1)).as("plen2"),
        expr("array_join(transform(sort_array(collect_list(struct(pos, tok))), x -> x.tok), ' ')")
          .as("phrase"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_phrases"),
        min(struct((-col("score")).as("ns"), col("phrase").as("p"),
          col("plen2").as("l"))).as("b"))
      .select(col("doc_id"), col("n_phrases"), col("b.p").as("phrase"),
        col("b.l").as("phrase_len"), (-col("b.ns")).as("score_x1e6"))
      .orderBy("doc_id")
  }

  /** Composite quality GATE — the keep/drop decision an ingestion pipeline
    * actually runs, composed from the individual signals above with a
    * DETERMINISTIC verdict precedence (first failing rule names the
    * verdict): too_short (n_tokens < 20), then low_stopword (stop ratio
    * < 60/1000), then repetitive (repeated-3-gram fraction > 20/1000),
    * else keep. Every compare is integer (the *1000 div ratios), so no
    * tolerance sits near a cut line. Output is the per-(source, verdict)
    * census (n_docs + token volume) — the dashboard a filtering run
    * reports; one map-side-combinable groupBy after narrow per-row
    * expressions. Cutoffs are this corpus's contract constants, shared
    * verbatim with the oracle (a production run would configure them).
    */
  val qualityGate: (SparkSession, String) => DataFrame = (spark, dir) => {
    val inList = StopWords.map(w => s"'$w'").mkString(", ")
    docs(spark, dir)
      .withColumn("toks", toks)
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("stop_x1000",
        expr(s"(size(filter(toks, t -> t IN ($inList))) * 1000L) div greatest(size(toks), 1)"))
      .withColumn("shingles",
        when(size(col("toks")) < 3, array().cast("array<string>"))
          .otherwise(expr("transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', slice(toks, i, 3)))")))
      .withColumn("rep_x1000",
        expr("((size(shingles) - size(array_distinct(shingles))) * 1000L) div greatest(size(shingles), 1)"))
      .withColumn("verdict",
        when(col("n_tokens") < 20L, "too_short")
          .when(col("stop_x1000") < 60L, "low_stopword")
          .when(col("rep_x1000") > 20L, "repetitive")
          .otherwise("keep"))
      .groupBy("source", "verdict")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tok_sum"))
      .orderBy("source", "verdict")
  }

  /** Cross-source vocabulary overlap — the corpus-similarity matrix a
    * mixing pipeline reads before weighting sources: for every unordered
    * source pair, the EXACT Jaccard of their vocabularies as the integer
    * (|A n B| * 10^6) div |A u B| (the q_doc_char_terms div idiom — no
    * float crosses the compare), alongside both raw sizes. Plan: distinct
    * (source, token) pairs once (one shuffle), then a token-keyed
    * self-join whose volume is sum over tokens of C(sources-containing,
    * 2) — bounded by vocabulary x sources^2, fine wherever the source
    * list is a real crawl registry (hundreds); pairs sharing nothing are
    * absent by construction (inner join), the documented contract.
    */
  val sourceOverlap: (SparkSession, String) => DataFrame = (spark, dir) => {
    val st = docs(spark, dir)
      .select(col("source"), explode(toks).as("tok")).distinct()
    val sizes = st.groupBy("source").agg(count(lit(1)).as("n"))
    st.as("a").join(st.as("b"),
        col("a.tok") === col("b.tok") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(sizes.select(col("source").as("src_a"), col("n").as("n_a")), "src_a")
      .join(sizes.select(col("source").as("src_b"), col("n").as("n_b")), "src_b")
      .select(col("src_a"), col("src_b"), col("n_common"), col("n_a"), col("n_b"),
        expr("(n_common * 1000000L) div ((n_a + n_b) - n_common)").as("jac_x1e6"))
      .orderBy("src_a", "src_b")
  }

  /** Simpson lexical diversity per source — the probability that two
    * tokens drawn without replacement are the same type, as the EXACT
    * RATIONAL (num, den) = (sum n_i*(n_i-1), N*(N-1)) over the source's
    * token counts, plus the (num * 10^6) div den fixed-point index (the
    * q_doc_char_terms div idiom — no float/log ever crosses the compare;
    * this is why Simpson rather than Shannon entropy carries the
    * "diversity" contract: entropy's log is libm-rounded, Simpson is pure
    * integer arithmetic). Low index = diverse vocabulary; boilerplate
    * sources pile mass on few types and score high. Scale shape: ONE
    * map-side-combinable (source, token) groupBy (the explode never
    * shuffles raw text, only partial counts), then a source-keyed fold
    * over the vocabulary-sized count table. LOUD BOUND: the index
    * numerator needs num * 10^6 < 2^63 (num <= N^2), fine to ~3e6 tokens
    * per source; a web-scale source drops the 10^6 scale or compares
    * rationals cross-multiplied (ANSI makes an overflow loud, never a
    * wrap) — the collocations-score contract genus.
    */
  val simpson: (SparkSession, String) => DataFrame = (spark, dir) =>
    docs(spark, dir)
      .select(col("source"), explode(toks).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("n"))
      .groupBy("source")
      .agg(sum(col("n")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(expr("n * (n - 1L)")).as("num"))
      .select(col("source"), col("n_tokens"), col("n_types"), col("num"),
        expr("(num * 1000000L) div (n_tokens * (n_tokens - 1L))").as("simpson_x1e6"))
      .orderBy("source")

  /** KMV (k-minimum-values) distinct sketch per source — the theta-sketch
    * primitive: the k smallest md5-derived 60-bit hash values of the
    * source's DISTINCT token set estimate its cardinality as
    * est = (k-1) * 2^60 div hv_k (the k-th smallest value). Everything on
    * the compare is a deterministic integer — the hash is the repo's
    * standard conv(substring(md5, 1, 15)) 60-bit truncation, dedup is on
    * the HASH value (so a truncation collision cannot diverge the two
    * sides), and the estimate is one integer div ((k-1) * 2^60 < 2^63 for
    * k = 8). The exact count rides alongside, so the contract row itself
    * documents the sketch's error. Scale shape: ONE distinct pass over
    * (source, hv) — map-side combinable — then a bounded O(k)-state
    * aggregator (the topTerms KthLargestCount mirrored to k-th SMALLEST)
    * folds each source's sketch: no window ever sees the vocabulary, and
    * sketch state is k longs per source at any corpus size — the whole
    * point of KMV at 100 TB. Sources with fewer than k distinct values
    * are absent by contract (their exact count is already the answer).
    */
  val kmvSketch: (SparkSession, String) => DataFrame = (spark, dir) => {
    val k = 8
    val hv = expr("cast(conv(substring(md5(concat('kmv#', tok)), 1, 15), 16, 10) as bigint)")
    docs(spark, dir)
      .select(col("source"), explode(toks).as("tok"))
      .select(col("source"), hv.as("hv")).distinct()
      .groupBy("source")
      .agg(count(lit(1)).as("n_exact"),
        udaf(new KthSmallestValue(k)).apply(col("hv")).as("kth_hv"))
      .filter(col("n_exact") >= k)
      .select(col("source"), col("n_exact"), col("kth_hv"),
        expr(s"(${k - 1}L * 1152921504606846976L) div kth_hv").as("kmv_est"))
      .orderBy("source")
  }

  /** Bloom-filter membership accounting — the third sketch family member
    * (HLL = distinct, KMV = theta, Bloom = membership): the eval split's
    * vocabulary (the q_doc_decontam doc_id % 7 probe convention) builds an
    * m = 4096-bit filter with k = 3 md5-derived positions per token, and
    * every training-split (source, token) probes it. A token is
    * bloom-positive iff ALL its positions are set — formulated
    * COLLISION-SAFELY as "no position missing" (a token whose two hash
    * positions collide still probes correctly) via one anti-join against
    * the set-bit table. The contract output is the per-source census a
    * production filter report shows: distinct tokens checked,
    * bloom-positives, true members, and false positives (bloom has no
    * false negatives, so n_false_pos = n_bloom - n_true >= 0 by theorem —
    * the spec asserts it). Scale shape: the bit table is <= m rows at ANY
    * corpus size (broadcast forever); the train side is one distinct pass;
    * both anti/semi joins are token-keyed equi-joins. Everything integer,
    * everything deterministic.
    */
  val bloomCheck: (SparkSession, String) => DataFrame = (spark, dir) => {
    val m = 4096
    def pos(i: Int) =
      expr(s"cast(conv(substring(md5(concat('bloom$i#', tok)), 1, 15), 16, 10) as bigint) % $m")
    val st = docs(spark, dir)
      .select(col("doc_id"), col("source"), explode(toks).as("tok"))
    val evalVocab = st.filter(col("doc_id") % 7 === 0).select("tok").distinct()
    val bits = evalVocab
      .select(explode(array(pos(0), pos(1), pos(2))).as("p")).distinct()
    val train = st.filter(col("doc_id") % 7 =!= 0)
      .select(col("source"), col("tok")).distinct()
    val missing = train
      .select(col("source"), col("tok"), explode(array(pos(0), pos(1), pos(2))).as("p"))
      .join(broadcast(bits), Seq("p"), "left_anti")
      .select("source", "tok").distinct()
    val base = train.groupBy("source").agg(count(lit(1)).as("n_tokens"))
    val bloom = train.join(missing, Seq("source", "tok"), "left_anti")
      .groupBy("source").agg(count(lit(1)).as("n_bloom_hits"))
    val tru = train.join(evalVocab, Seq("tok"), "left_semi")
      .groupBy("source").agg(count(lit(1)).as("n_true_hits"))
    base.join(bloom, Seq("source"), "left").join(tru, Seq("source"), "left")
      .na.fill(0L, Seq("n_bloom_hits", "n_true_hits"))
      .select(col("source"), col("n_tokens"), col("n_bloom_hits"), col("n_true_hits"),
        (col("n_bloom_hits") - col("n_true_hits")).as("n_false_pos"))
      .orderBy("source")
  }

  /** Corpus token-frequency spectrum (count-of-counts): for each occurrence
    * count, how many distinct vocabulary types occur exactly that often —
    * the classic Zipf diagnostic for corpus health (a natural corpus has a
    * long hapax tail; boilerplate piles mass on a few high counts). Pure
    * integers. Scale shape: the token groupBy is the one real shuffle and
    * is map-side combinable; the second groupBy runs over the (tiny)
    * distinct-count domain.
    */
  val tokenSpectrum: (SparkSession, String) => DataFrame = (spark, dir) =>
    docs(spark, dir)
      .select(explode(toks).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("freq"))
      .groupBy("freq").agg(count(lit(1)).as("n_types"))
      .select(col("freq").cast("long").as("freq"),
        col("n_types").cast("long").as("n_types"))
      .orderBy("freq")

  /** Bigram collocations — adjacent word pairs ranked by an INTEGER-EXACT
    * PMI-style association score: score = ((n_ab * n_total) * 10^6) div
    * (c1 * c2), monotone in the PMI ratio p(ab)/(p(a)p(b)) (n_total = total
    * corpus tokens; c1/c2 = unigram occurrence counts), min support
    * n_ab >= 3. No log/float crosses the compare; ties are impossible to
    * under-order because (w1, w2) is unique. Scale shape: bigram extraction
    * is one narrow explode; both count tables are map-side-combinable
    * groupBys; the two unigram joins are token-keyed equi-joins (broadcast
    * at contract scale, shuffle at web scale); n_total rides a one-row
    * broadcast. LOUD BOUND: the score numerator needs
    * n_ab * n_total * 10^6 < 2^63 — fine to ~3e6 corpus tokens per scored
    * domain; a web-scale corpus scores per-source or drops the 10^6 scale
    * (same documented-contract genus as StatsOps' O(range) histogram).
    */
  val collocations: (SparkSession, String) => DataFrame = (spark, dir) => {
    val t = docsSpread(spark, dir).select(toks.as("toks"))
    val uni = t.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val big = t.filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 1), " +
          "i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 3)
    val n = uni.agg(sum(col("c")).as("n_total"))
    big
      .join(uni.select(col("tok").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("tok").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("n_ab").cast("long").as("n_ab"),
        col("c1").cast("long").as("c1"), col("c2").cast("long").as("c2"),
        expr("((n_ab * n_total) * 1000000L) div (c1 * c2)").as("score"))
      .orderBy(col("score").desc, col("w1"), col("w2"))
  }

  // ---- decontamination: eval-set n-gram overlap flagging ----

  /** Benchmark decontamination — the standard training-prep step: flag
    * every training document sharing a long exact token span with the
    * eval/benchmark set. The contract probe set is the deterministic
    * doc_id % 7 == 0 slice (a stand-in for a real benchmark suite); the
    * overlap unit is the word 5-GRAM — long enough that a hit means real
    * contamination, not shared phrasing (the 3-gram shingles of the
    * near-dup family are deliberately looser). Output per contaminated
    * doc: n_shared (distinct shared 5-grams) and n_hits (total train-side
    * occurrences of shared grams) — both exact integers.
    *
    * Scale shape: one narrow explode per side; the eval side collapses to
    * DISTINCT grams — a benchmark suite is small by nature, so Catalyst
    * broadcasts it at contract scale, and a giant eval set degrades to a
    * gram-keyed shuffle equi-join (never a cross product); the per-doc
    * aggregation is the only other shuffle. countDistinct is exact.
    */
  val decontam: (SparkSession, String) => DataFrame = (spark, dir) => {
    // the gram frame feeds BOTH the eval side and the train side: without
    // materialization each branch re-runs the tokenize + 5-gram explode
    // (the plan's two scans of one subtree — guide §2.4)
    val grams = docsSpread(spark, dir)
      .withColumn("toks", toks)
      .withColumn("grams",
        when(size(col("toks")) < 5, array().cast("array<string>"))
          .otherwise(expr("transform(sequence(1, size(toks) - 4), i -> concat_ws(' ', slice(toks, i, 5)))")))
      .select(col("doc_id"), explode(col("grams")).as("g"))
      .localCheckpoint(true)
    val eval = grams.filter(col("doc_id") % 7 === 0).select("g").distinct()
    grams.filter(col("doc_id") % 7 =!= 0)
      .join(eval, "g")
      .groupBy("doc_id")
      .agg(countDistinct(col("g")).as("n_shared"), count(lit(1)).as("n_hits"))
      .orderBy("doc_id")
  }

  /** The documents table spread across the cores and MATERIALIZED — the
    * parquet is a single split at contract scale, so a tokenize/explode
    * directly over the scan runs as ONE task, and a bare repartition
    * does not fix it (Catalyst pushes the deterministic projection back
    * below the round-robin exchange; measured as a 6 s single-task gram
    * explode). [[Feeds.table]] now provides exactly this (size-guarded
    * spread + checkpoint), so this is an alias kept for the call sites'
    * intent.
    */
  private def docsSpread(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)

  private def shingled(spark: SparkSession, dir: String): DataFrame =
    docsSpread(spark, dir)
      .withColumn("toks", toks)
      .withColumn("shingles",
        when(size(col("toks")) < 3, array().cast("array<string>"))
          .otherwise(expr("transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', slice(toks, i, 3)))")))
      .select(col("doc_id"), explode(col("shingles")).as("s"))

  /** Distinct (doc_id, shingle) pairs — the set-semantics frame shared by
    * the MinHash signatures, the Jaccard/containment scorers and the
    * prefix-filter join. One explode+distinct per (session, dir) via
    * Feeds.shared instead of one per consumer query (guide §2.4 /
    * verdict item #1).
    */
  private def shingledDistinct(spark: SparkSession, dir: String): DataFrame =
    Feeds.shared(spark, dir, "shingles_distinct") { shingled(spark, dir).distinct() }

  /** All 16 per-doc minima in ONE aggregate (map-side partial combine) and
    * explode back to (doc_id, seed, minhash) — the identical table to the
    * former seeds-crossJoin plan with 16x fewer shuffled rows. Hashes run
    * over the DISTINCT shingle set ([[shingledDistinct]]): min over a set
    * equals min over the occurrence multiset, so the signature table is
    * unchanged while the md5 count drops to 16 x distinct pairs — and the
    * whole table is a shared feed (ten LSH consumers, one build).
    */
  private def minhashSigs(spark: SparkSession, dir: String): DataFrame =
    Feeds.shared(spark, dir, "minhash_sigs") {
      val mins = (0 until NumHashes).map(i =>
        min(md5(concat(lit(s"$i:"), col("s")))).as(s"m$i"))
      shingledDistinct(spark, dir)
        .groupBy("doc_id")
        .agg(mins.head, mins.tail: _*)
        .select(col("doc_id"), explode(array((0 until NumHashes).map(i =>
          struct(lit(i.toLong).as("seed"), col(s"m$i").as("minhash"))): _*)).as("x"))
        .select(col("doc_id"), col("x.seed").as("seed"), col("x.minhash").as("minhash"))
    }

  val minhashSignatures: (SparkSession, String) => DataFrame = (spark, dir) =>
    minhashSigs(spark, dir).orderBy("doc_id", "seed")

  // ---- LSH near-dup pairs: 4 bands x 4 rows over the signatures ----
  /** Band-bucketed candidate pairs (doc_a < doc_b), the LSH join shared by
    * minhashDupPairs and the pruned jaccardPairs: docs collide iff one
    * 4-row band of their signatures matches exactly — a key-equality join,
    * never all-pairs.
    */
  private def bandCandidates(spark: SparkSession, dir: String): DataFrame =
    Feeds.shared(spark, dir, "lsh_cand") {
      val bands = minhashSigs(spark, dir)
        .groupBy(col("doc_id"), (col("seed") / 4).cast("int").as("band"))
        .agg(array_join(sort_array(collect_list(
          concat(lpad(col("seed").cast("string"), 2, "0"), lit(":"), col("minhash")))), ",").as("bkey"))
      val a = bands.select(col("doc_id").as("doc_a"), col("band"), col("bkey"))
      val b = bands.select(col("doc_id").as("doc_b"), col("band"), col("bkey"))
      a.join(b, Seq("band", "bkey"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
    }

  val minhashDupPairs: (SparkSession, String) => DataFrame = (spark, dir) =>
    bandCandidates(spark, dir).orderBy("doc_a", "doc_b")

  // ---- duplicate clusters: connected components over the LSH pair graph ----

  /** Backstop on hash-min rounds. Rounds needed = component diameter; LSH
    * duplicate clusters are unions of band-bucket cliques, so real corpora
    * converge in a handful of rounds — hitting this cap is a loud failure,
    * not a truncation.
    */
  private val MaxCcRounds = 50

  /** Connected components of an undirected pair graph (`doc_a < doc_b`
    * rows) by hash-min label propagation: every round each node adopts the
    * minimum label among itself and its neighbors; the fixpoint label is
    * the component's minimum doc id. Each round is ONE shuffle (a groupBy
    * on doc_id) plus an edge join, and convergence is read off a monotone
    * fingerprint — labels only ever decrease, so the global label sum
    * strictly decreases until the fixpoint — one scalar aggregate per
    * round, no per-round diff join, nothing wide collected. Edges are
    * cached once; each round's labels replace (and unpersist) the last.
    */
  private[graft] def connectedComponents(cand: DataFrame): DataFrame = {
    // Each round's labels feed the next round TWICE (self union + the edge
    // join), so without lineage truncation the logical plan doubles per
    // round — eager localCheckpoint makes every round a constant-size plan
    // over a materialized leaf, and each round's blocks are unpersisted as
    // soon as the next round materializes. (A fault-tolerant deployment
    // would point setCheckpointDir at reliable storage and use
    // checkpoint() instead.)
    //
    // Round structure (r06 optimization): hash-min neighbor propagation
    // PLUS a pointer-jumping shortcut (lbl' = lbl[lbl]) per round — the
    // standard shortcutting that turns diameter-bound convergence into
    // O(log diameter) rounds (a long tile-contracted chain needed ~1 round
    // per hop before). Both steps only ever DECREASE labels and only move
    // within the component, so the fixpoint — and the emitted labels — are
    // unchanged; the monotone label-sum fingerprint still detects it. All
    // rounds run at a shuffle partition count derived from the measured
    // edge count (Feeds.withLoopPartitions) instead of the session-wide
    // setting — each round's frames are a few narrow longs, and with AQE
    // coalescing off every tiny round otherwise pays a full task wave.
    val spark = cand.sparkSession
    val edges = cand.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(cand.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint(true)
    Feeds.withLoopPartitions(spark, edges.count()) {
      def fingerprint(labels: DataFrame): Option[java.math.BigDecimal] =
        Option(labels.agg(sum(col("cluster_id").cast("decimal(38,0)"))).head.getDecimal(0))
      // round 0 fused into initialization: min(self, direct neighbors)
      var labels = edges.groupBy(col("src").as("doc_id"))
        .agg(min(col("dst")).as("nmin"))
        .select(col("doc_id"), least(col("doc_id"), col("nmin")).as("cluster_id"))
        .localCheckpoint(true)
      var sig = fingerprint(labels)
      var rounds = 0
      var converged = sig.isEmpty // no edges -> no nodes -> already done
      while (!converged && rounds < MaxCcRounds) {
        val msgs = edges.join(labels, edges("src") === labels("doc_id"))
          .select(col("dst").as("doc_id"), col("cluster_id"))
        val half = labels.select("doc_id", "cluster_id").unionByName(msgs)
          .groupBy("doc_id").agg(min("cluster_id").as("cluster_id"))
          .localCheckpoint(true)
        // pointer jump: adopt the label OF the label when one exists —
        // lbl[lbl] <= lbl always (labels never exceed their node's id).
        // The lookup side is its own checkpoint (not half.as("b")): a
        // self-join of one checkpointed frame leaves join-key metadata
        // referencing deduplicated attributes, which trips the NEXT
        // round's union-constraint rewrite in Catalyst.
        val lookup = half.select(col("doc_id").as("ld"), col("cluster_id").as("lc"))
          .localCheckpoint(true)
        val next = half
          .join(lookup, half("cluster_id") === lookup("ld"), "left")
          .select(half("doc_id").as("doc_id"),
            least(half("cluster_id"), coalesce(col("lc"), half("cluster_id")))
              .as("cluster_id"))
          .localCheckpoint(true)
        val nextSig = fingerprint(next) // materializes next's checkpoint
        labels.unpersist(blocking = false) // round R-1's blocks are dead now
        half.unpersist(blocking = false)
        lookup.unpersist(blocking = false)
        labels = next
        converged = nextSig == sig
        sig = nextSig
        rounds += 1
      }
      edges.unpersist(blocking = false)
      require(converged, s"connectedComponents: no fixpoint after $MaxCcRounds rounds")
      labels
    }
  }

  /** Near-duplicate clusters: connected components over the MinHash-LSH
    * candidate pairs, labeled by the cluster's minimum doc id, with the
    * cluster size attached. Docs in no candidate pair are singletons by
    * definition and are omitted. The canonical dedup keep-list is
    * `doc_id == cluster_id` plus every omitted doc.
    */
  /** Hash-min component labels of the LSH candidate graph — the shared
    * feed behind dupClusters / clusterMix / keepList (one label-
    * propagation loop per session instead of three).
    */
  private def lshCc(spark: SparkSession, dir: String): DataFrame =
    Feeds.shared(spark, dir, "lsh_cc") {
      connectedComponents(bandCandidates(spark, dir))
    }

  val dupClusters: (SparkSession, String) => DataFrame = (spark, dir) => {
    val cc = lshCc(spark, dir)
    val sz = cc.groupBy("cluster_id").agg(count(lit(1)).as("csize"))
    cc.join(sz, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("csize"))
      .orderBy("doc_id")
  }

  /** Per-dup-cluster SOURCE MIX — does a near-dup family live inside one
    * source (internal boilerplate, deduplicate freely) or span sources
    * (syndicated/scraped content, where dropping "duplicates" changes the
    * source mix a training run was weighted for)? Over the hash-min
    * connected components of the LSH candidate graph: n_docs, n_sources,
    * and the exact Simpson concentration same_src_x1e6 = (sum over
    * sources of n_i*(n_i-1)) * 10^6 div (N*(N-1)) — the probability two
    * random docs of the cluster share a source (10^6 = single-source).
    * Every cluster has N >= 2 by construction (components of a pair
    * graph), so the denominator never vanishes. Plan: the CC labeling's
    * rounds are the dominant cost (diameter-bounded); the mix itself is
    * one doc-keyed join to the doc registry + two map-side-combinable
    * groupBys over (cluster, source) counts.
    */
  val clusterMix: (SparkSession, String) => DataFrame = (spark, dir) => {
    val cc = lshCc(spark, dir)
    val bySrc = cc.join(docs(spark, dir).select(col("doc_id"), col("source")), "doc_id")
      .groupBy("cluster_id", "source")
      .agg(count(lit(1)).as("ns"))
    bySrc.groupBy("cluster_id")
      .agg(sum("ns").as("n_docs"),
        count(lit(1)).as("n_sources"),
        sum(expr("ns * (ns - 1)")).as("pairs_same"))
      .select(col("cluster_id"), col("n_docs"), col("n_sources"),
        expr("(pairs_same * 1000000L) div (n_docs * (n_docs - 1))").as("same_src_x1e6"))
      .orderBy("cluster_id")
  }

  // ---- multi-source BFS level census over the LSH pair graph ----

  /** Backstop on BFS rounds: rounds needed = the seed set's eccentricity
    * within reachable components; LSH duplicate components are unions of
    * band-bucket cliques (tiny diameters), so hitting this cap is a loud
    * failure, never a silent truncation of the census.
    */
  private val MaxBfsRounds = 12

  /** Level-synchronous multi-source BFS over an undirected pair graph
    * (`doc_a < doc_b` rows): seeds are the graph nodes with
    * doc_id % 5 == 0, and each round expands the frontier by one
    * src-keyed edge join plus one anti-join against the visited set (the
    * standard distributed-BFS bookkeeping — frontier and visited are the
    * ONLY state, both doc-keyed), with eager lineage truncation per round
    * (the connectedComponents posture: each round's frames feed the next
    * twice). Emits one row per NONEMPTY level — (level, n_docs, id_sum) —
    * plus level -1 for graph nodes in components no seed can reach.
    * Rounds are capped at [[MaxBfsRounds]] (= the oracle's chained-CTE
    * depth); a deeper graph raises rather than truncating.
    */
  private[graft] def bfsLevels(cand: DataFrame): DataFrame = {
    val edges = cand.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(cand.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint(true)
    Feeds.withLoopPartitions(cand.sparkSession, edges.count()) {
    val nodes = edges.select(col("src").as("doc_id")).distinct().localCheckpoint(true)
    val seeds = nodes.filter(col("doc_id") % 5 === 0).localCheckpoint(true)
    val tagged = scala.collection.mutable.ArrayBuffer[DataFrame](
      seeds.select(col("doc_id"), lit(0L).as("level")))
    var visited = seeds
    var frontier = seeds
    var n = frontier.count()
    var round = 0
    while (n > 0 && round < MaxBfsRounds) {
      val nbrs = edges
        .join(frontier.select(col("doc_id").as("f")), edges("src") === col("f"), "left_semi")
        .select(col("dst").as("doc_id")).distinct()
      val next = nbrs.join(visited, Seq("doc_id"), "left_anti").localCheckpoint(true)
      round += 1
      n = next.count()
      if (n > 0) {
        tagged += next.select(col("doc_id"), lit(round.toLong).as("level"))
        visited = visited.unionByName(next).localCheckpoint(true)
      }
      frontier = next
    }
    require(n == 0, s"bfsLevels: frontier still live after $MaxBfsRounds rounds")
    val unreached = nodes.join(visited, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit(-1L).as("level"))
    tagged.reduce(_ unionByName _).unionByName(unreached)
      .groupBy("level")
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("id_sum"))
      .orderBy("level")
    } // withLoopPartitions
  }

  /** q_doc_bfs_levels: the BFS distance-from-seed census over the MinHash
    * LSH candidate graph — how much of the duplicate structure a seeded
    * crawl reaches per hop, and how much is in seed-free components
    * (level -1). Oracle: the same level sets as chained NON-recursive
    * CTEs over the q_doc_kcore cand construction — per level one
    * neighbor gather minus the running visited union, the independent
    * formulation of the engine's frontier/anti-join rounds.
    */
  val docBfsLevels: (SparkSession, String) => DataFrame = (spark, dir) =>
    bfsLevels(bandCandidates(spark, dir))

  // ---- integer-exact PageRank over the LSH duplicate pair graph ----

  /** PageRank, 3 unrolled iterations, ENTIRELY in integer arithmetic so
    * the fixpoint trajectory is bit-identical everywhere: pr_0 = 10^6 per
    * node; pr_{k+1} = 150000 + (85 * sum over neighbors of
    * (pr_k div deg)) div 100 — damping 0.85 as exact integer floor
    * divisions (a float PageRank could never hash-match an oracle; the
    * truncation error is part of the operator's DEFINED semantics).
    * Graph = the undirected LSH candidate pair graph (every node has
    * degree >= 1, so no dangling-mass term). Each iteration is one
    * edge join + one groupBy — the standard message-passing round, with
    * a FIXED 3-round unroll (no driver loop state, plan growth bounded);
    * the oracle unrolls the same three rounds as CTEs over the
    * q_doc_dup_clusters candidate construction.
    */
  val pagerank: (SparkSession, String) => DataFrame = (spark, dir) => {
    val cand = bandCandidates(spark, dir)
    val edges = cand.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(cand.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = deg.select(col("src").as("doc_id"), col("deg"))
    var pr = nodes.withColumn("pr", lit(1000000L))
    for (_ <- 1 to 3) {
      val msgs = edges.join(pr, edges("src") === pr("doc_id"))
        .select(col("dst").as("doc_id"), expr("pr div deg").as("m"))
        .groupBy("doc_id").agg(sum("m").as("msum"))
      pr = nodes.join(msgs, Seq("doc_id"), "left")
        .select(col("doc_id"), col("deg"),
          (lit(150000L) + expr("85 * coalesce(msum, 0L) div 100")).as("pr"))
    }
    pr.select(col("doc_id"), col("deg"), col("pr")).orderBy("doc_id")
  }

  // ---- k-core peeling census over the LSH duplicate pair graph ----

  /** 2-CORE PEELING census, 3 unrolled rounds — the robustness filter a
    * dedup report runs before trusting cluster structure (degree-1
    * pendants are usually borderline LSH hits; the 2-core is the part of
    * the graph where every doc has >= 2 independent collision witnesses).
    * Round r: drop every node of current degree < 2, keep an edge iff
    * BOTH endpoints survive; emit (round, n_nodes, n_edges) for rounds
    * 0..3 — the peeling curve (a FIXED round count like pagerank's: full
    * convergence is a diameter-bounded fixpoint this census deliberately
    * truncates, stated contract). Each round is one map-side-combinable
    * degree count + two semi-joins on the edge keys; rounds run EAGERLY
    * over localCheckpoint'd edge frames (the connectedComponents lineage
    * idiom — a lazy unroll would re-derive the LSH candidate chain once
    * per lineage branch, 2^rounds times), and the census itself is a
    * rounds-bounded 4-row driver collect. The oracle unrolls the same
    * rounds as HAVING >= 2 CTEs over the shared candidate construction.
    */
  val kcore: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val cand = bandCandidates(spark, dir)
    var edges = cand.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(cand.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint(true)
    Feeds.withLoopPartitions(spark, edges.count()) {
    val stats = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    for (r <- 0 to 3) {
      val row = edges.agg(countDistinct(col("src")), expr("count(1) div 2")).head()
      stats += ((r.toLong, row.getLong(0), row.getLong(1)))
      if (r < 3) {
        val keep = edges.groupBy("src").agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= 2).select(col("src").as("kid"))
        val next = edges.join(keep, col("src") === col("kid"), "left_semi")
          .join(keep, col("dst") === col("kid"), "left_semi")
          .localCheckpoint(true)
        edges.unpersist(blocking = false)
        edges = next
      }
    }
    edges.unpersist(blocking = false)
    stats.toSeq.toDF("round", "n_nodes", "n_edges").orderBy("round")
    } // withLoopPartitions
  }

  // ---- exact triangle counting over the LSH duplicate pair graph ----

  /** Per-doc triangle count + local clustering coefficient over the
    * undirected LSH candidate pair graph — the graph-shape statistic that
    * separates "one giant template cluster" from "many small near-dup
    * families" in a dedup report. Exact, via the DEGREE-ORDERED
    * ORIENTATION formulation (the standard distributed plan): each
    * undirected edge is directed from the lower (deg, id) endpoint to the
    * higher, every wedge is built at its lowest-ranked corner (one
    * self-join of the oriented edge list on src), and a wedge closes into
    * a triangle iff its (dst1, dst2) pair is itself an oriented edge (one
    * more equi-join). Each triangle is found EXACTLY once — at its
    * minimum-rank corner — and the orientation caps out-degree at
    * O(sqrt(m)), so wedge volume is sum outdeg^2 <= m^1.5, never the
    * unoriented sum deg^2 a hub would explode. Clustering coefficient is
    * emitted exact fixed-point: cc_x1e6 = (2 * n_tri * 10^6) div
    * (deg * (deg - 1)), 0 when deg < 2 (stated contract). The oracle
    * brute-forces the three-way a < b < c join over the same cand CTE —
    * the independent quadratic formulation of the engine's oriented
    * wedges.
    */
  val triangles: (SparkSession, String) => DataFrame = (spark, dir) => {
    val cand = bandCandidates(spark, dir)
    val both = cand.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(cand.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    val deg = both.groupBy("src").agg(count(lit(1)).as("deg"))
      .select(col("src").as("doc_id"), col("deg"))
    // orient by (deg, id): u -> v iff (deg_u, u) < (deg_v, v)
    val withDeg = cand
      .join(deg.select(col("doc_id").as("doc_a"), col("deg").as("da")), "doc_a")
      .join(deg.select(col("doc_id").as("doc_b"), col("deg").as("db")), "doc_b")
    val oriented = withDeg.select(
      when(col("da") < col("db") || (col("da") === col("db") && col("doc_a") < col("doc_b")),
        col("doc_a")).otherwise(col("doc_b")).as("u"),
      when(col("da") < col("db") || (col("da") === col("db") && col("doc_a") < col("doc_b")),
        col("doc_b")).otherwise(col("doc_a")).as("v"))
    val e1 = oriented.select(col("u"), col("v").as("v1"))
    val e2 = oriented.select(col("u"), col("v").as("v2"))
    val wedges = e1.join(e2, "u").filter(col("v1") < col("v2"))
    val closing = oriented.select(col("u").as("cu"), col("v").as("cv"))
    val tris = wedges.join(closing,
      // the closing edge's orientation between v1 and v2 is unknown a
      // priori — match either direction (exactly one can exist)
      (col("cu") === col("v1") && col("cv") === col("v2")) ||
        (col("cu") === col("v2") && col("cv") === col("v1")))
      .select(col("u"), col("v1"), col("v2"))
    val corner = tris.select(col("u").as("doc_id"))
      .union(tris.select(col("v1").as("doc_id")))
      .union(tris.select(col("v2").as("doc_id")))
    val triCnt = corner.groupBy("doc_id").agg(count(lit(1)).as("n_tri"))
    deg.join(triCnt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(col("deg") < 2, lit(0L)).otherwise(
          expr("2 * coalesce(n_tri, 0L) * 1000000 div (deg * (deg - 1))")).as("cc_x1e6"))
      .orderBy("doc_id")
  }

  /** Per-doc shingle NOVELTY — the contamination/redundancy curve a corpus
    * ingestion run reads before deciding how much of a new source to keep:
    * over the distinct word-3-gram shingles of each doc (set semantics —
    * vocabulary novelty, not occurrence counts), a shingle is NOVEL to the
    * doc iff the doc is its first occurrence corpus-wide (minimum doc_id —
    * ingestion order, the stated convention). Emitted per doc: distinct
    * shingle count, novel count, and novelty_x1000 = n_novel * 1000 div
    * n_shingles. Docs under 3 tokens have no shingles and are omitted (the
    * repNgramStats contract). Plan: one (doc_id, shingle) distinct, one
    * map-side-combinable min per shingle, one shingle-keyed equi-join
    * back, one doc groupBy — every stage keyed and linear, nothing
    * all-pairs, no driver state.
    */
  val novelty: (SparkSession, String) => DataFrame = (spark, dir) => {
    val sh = docsSpread(spark, dir)
      .withColumn("toks", toks)
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        explode(expr("transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', slice(toks, i, 3)))")).as("s"))
      .distinct()
    val first = sh.groupBy("s").agg(min("doc_id").as("first_doc"))
    sh.join(first, "s")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty_x1000", expr("(n_novel * 1000L) div n_shingles"))
      .orderBy("doc_id")
  }

  /** Degree ASSORTATIVITY of the LSH candidate-pair graph — one number
    * answering "do heavy near-dup hubs link to other hubs (template
    * farms) or to leaves (hub-and-spoke mirror sites)". For a SYMMETRIC
    * edge list the Pearson correlation of endpoint degrees loses its
    * square root (Sx = Sy, Sxx = Syy), so the statistic is EXACTLY
    * rational: r = (M*Sxy - Sx^2) / (M*Sxx - Sx^2) over the M ordered
    * edges — emitted as assort_x1e6 = num * 10^6 div den, all
    * decimal(38,0) intermediates (degree products at web scale exceed
    * Long), BIGINT out. Pearson's affine invariance makes full-degree vs
    * Newman's excess-degree the SAME r — stated so the convention is
    * pinned. A degree-regular graph has den = 0 and fails LOUDLY in the
    * ANSI zero-divide (r is undefined there), the stated contract. Plan:
    * degree table joined twice along the oriented edge list (doc-keyed
    * equi-joins), one global 4-column aggregate — no all-pairs anywhere.
    */
  val assortativity: (SparkSession, String) => DataFrame = (spark, dir) => {
    val dec = "decimal(38,0)"
    val cand = bandCandidates(spark, dir)
    val both = cand.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(cand.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    val deg = both.groupBy("src").agg(count(lit(1)).as("deg"))
    both
      .join(deg.select(col("src"), col("deg").as("du")), "src")
      .join(deg.select(col("src").as("dst"), col("deg").as("dv")), "dst")
      .agg(count(lit(1)).as("n_edges"),
        sum(col("du").cast(dec)).as("sx"),
        sum((col("du").cast(dec) * col("du"))).as("sxx"),
        sum((col("du").cast(dec) * col("dv"))).as("sxy"))
      .select(col("n_edges"),
        expr("cast(sx as bigint)").as("deg_sum"),
        expr("((n_edges * sxy - sx * sx) * 1000000) div (n_edges * sxx - sx * sx)")
          .as("assort_x1e6"))
  }

  /** Lexicographic-neighbour LONGEST COMMON PREFIX — the template-prefix
    * detector behind prefix-dedup passes (boilerplate headers, scraped
    * navigation chrome): sort all docs by (text, doc_id) and report, per
    * doc, its successor and their common prefix length CAPPED AT 64 chars
    * (the stated contract — a bounded compare, so the operator never
    * scans two full documents; i is also clamped to both lengths, so
    * equal short texts report their true length, not the cap). The
    * GLOBAL sort is realized distributively by [[neighborPairs]]: a
    * sampled RANGE repartition on (text, doc_id) — balanced regardless
    * of prefix concentration — one lead window per range bucket, and the
    * per-bucket boundary pairs (bucket max -> next bucket's min)
    * stitched with a window over the one-row-per-bucket extremes table —
    * single-partition but bounded by the partition count, never by data
    * size (the topEvents pmod idiom keeps the plan warning-free). The
    * corpus's lexicographic maximum has no successor and is omitted. The oracle is
    * the direct global formulation — lead() over ORDER BY (text, doc_id)
    * with LCP as the MINIMUM FIRST-MISMATCH position (vs the engine's
    * count-of-agreeing-prefixes fold).
    */
  val lcpNeighbors: (SparkSession, String) => DataFrame = (spark, dir) => {
    val lcpExpr = "size(filter(sequence(1, 64), i -> " +
      "i <= least(length(text), length(nt)) and substring(text, 1, i) = substring(nt, 1, i)))"
    neighborPairs(spark, dir)
      .select(col("doc_id"), col("next_doc"), expr(lcpExpr).cast("long").as("lcp64"))
      .orderBy("doc_id")
  }

  /** The distributed lexicographic-successor frame shared by
    * [[lcpNeighbors]] and [[editNeighbors]]: one (doc_id, text,
    * next_doc, nt) row per doc in (text, doc_id) order except the global
    * maximum.
    *
    * r06 (verdict item #2): the global sort is realized by a SAMPLED
    * RANGE repartition on (text, doc_id) — buckets are the range
    * partition ids, balanced by sampling REGARDLESS of how text mass
    * concentrates (the former substring(text, 1, 4) buckets collapse to
    * one hot partition on template-heavy corpora — the classic skewed-key
    * full-shuffle). Successors within a bucket come from one lead window
    * per bucket; range partitions are ordered (every key in partition i
    * precedes every key in partition i+1) and (text, doc_id) is a total
    * order, so the cross-bucket successor is exactly "bucket max ->
    * next nonempty bucket's min", stitched over the one-row-per-bucket
    * extremes table (single-partition but bounded by the partition
    * COUNT, never by data size). The emitted successor frame is
    * identical to the global sort's for ANY partitioning, so the range
    * bounds' sampling seed never reaches the result.
    */
  private def neighborPairs(spark: SparkSession, dir: String): DataFrame = {
    val parts = math.max(4, spark.sparkContext.defaultParallelism * 2)
    val base = docs(spark, dir)
      .select(col("doc_id"), col("text"))
      .repartitionByRange(parts, col("text"), col("doc_id"))
      .withColumn("bk", spark_partition_id())
    val wB = Window.partitionBy("bk").orderBy(col("text"), col("doc_id"))
    val within = base
      .withColumn("nt", lead("text", 1).over(wB))
      .withColumn("nd", lead("doc_id", 1).over(wB))
      .withColumn("rn", row_number().over(wB))
    val inner = within.filter(col("nt").isNotNull)
      .select(col("doc_id"), col("text"), col("nd").as("next_doc"), col("nt"))
    // bucket extremes: one row per bucket; lead over the bounded bucket
    // list pairs each bucket's max with the NEXT bucket's min
    val maxRows = within.filter(col("nt").isNull)
      .select(col("bk"), col("doc_id"), col("text"))
    val minRows = within.filter(col("rn") === 1)
      .select(col("bk").as("nbk"), col("doc_id").as("next_doc"), col("text").as("nt"))
    // int bucket ids order by range-partition position (the topEvents pmod
    // idiom keeps the one-partition window warning-free)
    val wG = Window.partitionBy(pmod(col("bk"), lit(1))).orderBy("bk")
    val boundary = maxRows
      .withColumn("nbk", lead("bk", 1).over(wG))
      .filter(col("nbk").isNotNull)
      .join(minRows, "nbk")
      .select(col("doc_id"), col("text"), col("next_doc"), col("nt"))
    inner.union(boundary)
  }

  /** Lexicographic-neighbour EDIT DISTANCE — the near-duplicate grader
    * beside [[lcpNeighbors]]'s prefix detector: two docs can share a
    * long prefix yet diverge wholly after it (LCP alone over-flags), or
    * differ in their first character yet be one edit apart (LCP alone
    * under-flags); the Levenshtein distance of the 64-char prefixes
    * separates the cases. The cap is the SAME bounded-compare contract
    * as lcp64 — the operator never scans two full documents, so the
    * per-pair cost is O(64^2) regardless of doc length (the property
    * that keeps it runnable on a 100 TB corpus), and `levenshtein` is a
    * codegen'd built-in on both sides of the compare (Spark and DuckDB
    * agree exactly on this ASCII corpus; both count single-character
    * insert/delete/substitute edits). Pairs come from the SAME
    * distributed successor frame — adjacent docs in the global (text,
    * doc_id) order, where prefix-near duplicates provably land next to
    * each other.
    */
  val editNeighbors: (SparkSession, String) => DataFrame = (spark, dir) =>
    neighborPairs(spark, dir)
      .select(col("doc_id"), col("next_doc"),
        levenshtein(substring(col("text"), 1, 64), substring(col("nt"), 1, 64))
          .cast("long").as("edit64"))
      .orderBy("doc_id")

  /** Pairwise SOURCE DISTRIBUTION DISTANCE — exact total variation
    * between per-source unigram distributions, the statistic a corpus-
    * mixing pipeline weighs sources by (TV chosen over KL/JS precisely
    * because no log crosses the compare — the Simpson-over-entropy
    * contract again): TV(P1, P2) = (1/2) * sum_t |p1(t) - p2(t)|
    * = sum_t |c1*N2 - c2*N1| / (2*N1*N2), an EXACT integer before the
    * one truncating division. The union-of-supports sum DECOMPOSES over
    * the inner join only: tokens present in both contribute
    * |c1*N2 - c2*N1|; tokens private to one side contribute their whole
    * mass cross-scaled, i.e. (N1 - S1b)*N2 + (N2 - S2b)*N1 where S1b/S2b
    * are the shared-token masses — so the engine never materializes the
    * full pair x vocabulary grid (the oracle DOES, as the independent
    * gather formulation). Scale shape: one map-side-combinable
    * (source, token) groupBy; the self-join volume is
    * sum-over-tokens C(sources-with-token, 2), bounded by the
    * registry-sized source list; every sum rides decimal(38,0) since
    * c*N overflows BIGINT on a web-scale corpus. Pairs sharing no token
    * (TV exactly 1) still surface via the registry cross frame.
    */
  val sourceTv: (SparkSession, String) => DataFrame = (spark, dir) => {
    val dec = "decimal(38,0)"
    val counts = docs(spark, dir)
      .select(col("source"), explode(toks).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
    val totals = counts.groupBy("source").agg(sum(col("c")).as("n"))
    val cn = counts.join(totals, "source")
    val shared = cn.as("a").join(cn.as("b"),
        col("a.tok") === col("b.tok") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(sum(abs(col("a.c").cast(dec) * col("b.n") - col("b.c").cast(dec) * col("a.n")))
          .as("both_term"),
        sum(col("a.c").cast(dec)).as("s1b"),
        sum(col("b.c").cast(dec)).as("s2b"))
    val pairs = broadcast(totals.select(col("source").as("src_a"), col("n").cast(dec).as("n_a")))
      .crossJoin(broadcast(totals.select(col("source").as("src_b"), col("n").cast(dec).as("n_b"))))
      .filter(col("src_a") < col("src_b"))
    pairs.join(shared, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"),
        col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"),
        ((coalesce(col("both_term"), lit(0L).cast(dec))
          + (col("n_a") - coalesce(col("s1b"), lit(0L).cast(dec))) * col("n_b")
          + (col("n_b") - coalesce(col("s2b"), lit(0L).cast(dec))) * col("n_a"))
          * lit(1000000L)).as("num"),
        (lit(2L).cast(dec) * col("n_a") * col("n_b")).as("den"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        expr("cast(num div den as bigint)").as("tv_x1e6"))
      .orderBy("src_a", "src_b")
  }

  // ---- deterministic stratified sampling: stable splits from a hash ----

  /** Per-language keep rates in percent (en downsampled, the rest at half).
    * Shared verbatim with the DuckDB oracle's CASE.
    */
  private val SampleRatePct = Seq("de" -> 50, "en" -> 20, "es" -> 50, "fr" -> 50, "zh" -> 50)

  /** Deterministic stratified sample: a doc's bucket in [0, 100) is an
    * md5-derived hash of its id (never a random() — reruns, retries and
    * late-arriving partitions must agree on membership), kept when below
    * its language's rate. Narrow (filter only, no shuffle); the same hash
    * with a different literal salt yields disjoint stable splits.
    */
  val stratifiedSample: (SparkSession, String) => DataFrame = (spark, dir) => {
    val bucket = conv(substring(md5(concat(lit("sample#"), col("doc_id").cast("string"))), 1, 15), 16, 10)
      .cast("long") % 100
    val rate = SampleRatePct.foldRight(lit(0): Column) { case ((l, r), acc) =>
      when(col("lang") === l, lit(r)).otherwise(acc)
    }
    docs(spark, dir)
      .withColumn("bucket", bucket)
      .filter(col("bucket") < rate)
      .select(col("doc_id"), col("lang"), col("bucket"))
      .orderBy("doc_id")
  }

  // ---- SimHash (64-bit, token unigrams, md5-derived bits; engine-only) ----
  val simhash: (SparkSession, String) => DataFrame = (spark, dir) => {
    // per token: take the first 16 hex chars of md5(token) as a 64-bit word;
    // simhash bit b = sign of sum over tokens of (bit set ? +1 : -1)
    val tokenBits = docs(spark, dir)
      .select(col("doc_id"), explode(toks).as("t"))
      .withColumn("h", conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long"))
    val bits = (0 until 60).map { b =>
      sum(when(col("h").bitwiseAND(lit(1L << b)) =!= 0L, 1).otherwise(-1)).as(s"b$b")
    }
    val agg = tokenBits.groupBy("doc_id").agg(bits.head, bits.tail: _*)
    val sim = (0 until 60).map(b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(0L)).reduce(_ + _)
    agg.select(col("doc_id"), sim.as("simhash")).orderBy("doc_id")
  }

  // ---- document fingerprint: md5 of whitespace-normalized lowercase text ----
  val fingerprint: (SparkSession, String) => DataFrame = (spark, dir) =>
    docs(spark, dir)
      .select(col("doc_id"),
        md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fp"))
      .orderBy("doc_id")

  // ---- ANN: brute-force cosine top-k (exact baseline) ----
  val annTopK: (SparkSession, String) => DataFrame = (spark, dir) => {
    val e = embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(expr("aggregate(v, 0D, (acc, x) -> acc + x * x)")))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qn"))
    val joined = broadcast(q).crossJoin(e)
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim",
        expr("aggregate(zip_with(qv, v, (x, y) -> x * y), 0D, (acc, p) -> acc + p)") /
          (col("qn") * col("norm")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
    joined.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  // ---- ANN scale path: LSH sign-bucketed (IVF-style probe of one bucket) ----

  /** Seeded Gaussian hyperplanes shared by the engine plan and the DuckDB
    * oracle (the oracle inlines the exact f64 constants — Double.toString
    * round-trips, so both sides bucket on bit-identical dot products).
    */
  private[graft] def ivfPlanes(nPlanes: Int, dim: Int = 64,
                               seed: Long = 7): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** The default IVF configuration (4 planes, 16 buckets). */
  private[graft] val IvfPlanes: Array[Array[Double]] = ivfPlanes(4)

  /** The query's own bucket plus every bucket at Hamming distance 1
    * (sign-LSH neighbors often sit just across one hyperplane).
    */
  private[graft] def hamming1Probes(nPlanes: Int): Array[Int] =
    (0 +: (0 until nPlanes).map(1 << _)).toArray

  /** Embeddings with sign-LSH bucket + norm for the given hyperplanes;
    * the bucket fold (acc * 2 + signBit, planes in order) and the dot
    * products are left folds — semantics replicated verbatim by the
    * DuckDB oracle and by ANN tests at alternate configurations.
    */
  private def bucketed(spark: SparkSession, dir: String,
                       planes: Array[Array[Double]]): DataFrame =
    embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("planes", typedLit(planes.map(_.toSeq).toSeq))
      .withColumn("bucket",
        expr("aggregate(transform(planes, p -> if(aggregate(zip_with(p, v, (x, y) -> x * y), 0D, (acc, d) -> acc + d) >= 0D, 1, 0)), 0, (acc, b) -> acc * 2 + b)"))
      .drop("planes")
      .withColumn("norm", sqrt(expr("aggregate(v, 0D, (acc, x) -> acc + x * x)")))

  /** IVF-style ANN at an explicit (planes, probe set) configuration. */
  private[graft] def annIvfTopKWith(spark: SparkSession, dir: String,
                                    planes: Array[Array[Double]],
                                    probes: Array[Int]): DataFrame = {
    val e = bucketed(spark, dir, planes)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("bucket").as("qbucket"), col("norm").as("qn"))
      .withColumn("flip", explode(lit(probes)))
      .withColumn("qbucket", expr("int(qbucket) ^ flip"))
      .drop("flip")
    val joined = broadcast(q).join(e, col("bucket") === col("qbucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim",
        expr("aggregate(zip_with(qv, v, (x, y) -> x * y), 0D, (acc, p) -> acc + p)") /
          (col("qn") * col("norm")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
    joined.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  val annIvfTopK: (SparkSession, String) => DataFrame = (spark, dir) =>
    annIvfTopKWith(spark, dir, IvfPlanes, hamming1Probes(IvfPlanes.length))

  /** n-gram Jaccard near-dup pairs. CONTRACT: MinHash-band candidate pairs
    * (a key-equality LSH join — no hot-shingle self-join blowup), scored
    * with the exact integer Jaccard (x1000, floor) over their distinct
    * shingle sets, thresholded — the standard scale-safe dedup operator,
    * and exactly what the DuckDB oracle replicates (same banding, same
    * scores). In the near-dup regime (J >= 0.9, where a 4x4 band collision
    * is near-certain) the output coincides with the unpruned full
    * self-join's — asserted against jaccardPairsExact in
    * TrainingOpsScaleSpec; at moderate J the LSH recall curve applies, by
    * design.
    */
  val jaccardPairs: (SparkSession, String) => DataFrame = (spark, dir) =>
    jaccardOf(spark, bandCandidates(spark, dir), dir)

  /** Exact Jaccard for the given candidate (doc_a < doc_b) pairs,
    * thresholded at jaccard_x1000 >= thresh.
    */
  private def jaccardOf(spark: SparkSession, cand: DataFrame, dir: String,
                        thresh: Int = 100): DataFrame = {
    val sh = shingledDistinct(spark, dir)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = cand
      .join(sh.as("a"), col("a.doc_id") === col("doc_a"))
      .join(sh.as("b"), col("b.doc_id") === col("doc_b") && col("a.s") === col("b.s"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sza"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "szb"), "doc_b")
      .withColumn("jaccard_x1000", expr("(inter * 1000) div (sza + szb - inter)"))
      .filter(col("jaccard_x1000") >= thresh)
      .select("doc_a", "doc_b", "jaccard_x1000")
      .orderBy("doc_a", "doc_b")
  }

  /** CONTAINMENT census over the LSH candidate pairs — the quote/subset
    * detector Jaccard structurally misses: a document fully contained in
    * a 10x larger one has Jaccard ~0.09 but max-containment C = |A n B| /
    * min(|A|, |B|) = 1.0 (Broder's second resemblance measure — THE
    * signal for excerpt/boilerplate-wrapping dedup in training corpora).
    * Pairs come from the SAME band-bucketed LSH join [[jaccardPairs]]
    * rides (stated recall < 1, lossy by contract exactly like it);
    * per pair cont_x1000 = (inter * 1000) div least(sza, szb) in
    * [1, 1000] over distinct-shingle sets, folded per containment decile
    * with n_pairs, inter_sum, least-size sum and cont_max — the decile
    * histogram separates near-identical pairs (decile 10) from shared-
    * boilerplate pairs (middle) at one glance. Scale shape: identical to
    * jaccardPairs — the shingle intersect is an equi-join ON the
    * candidate pairs (never all-pairs), sizes are one map-side-combinable
    * rollup, and the final fold has <= 11 keys.
    */
  val containmentCensus: (SparkSession, String) => DataFrame = (spark, dir) =>
    containmentOf(spark, bandCandidates(spark, dir), dir)

  /** The containment decile fold for an explicit (doc_a < doc_b) candidate
    * set — [[jaccardOf]]'s genus; lets specs pin the mid deciles with
    * crafted pairs independent of the LSH collision behavior.
    */
  private[graft] def containmentOf(spark: SparkSession, cand: DataFrame,
                                   dir: String): DataFrame = {
    val sh = shingledDistinct(spark, dir)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    cand
      .join(sh.as("a"), col("a.doc_id") === col("doc_a"))
      .join(sh.as("b"), col("b.doc_id") === col("doc_b") && col("a.s") === col("b.s"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sza"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "szb"), "doc_b")
      .select(col("inter"), least(col("sza"), col("szb")).as("lsz"),
        expr("(inter * 1000) div least(sza, szb)").as("cont_x1000"))
      .groupBy(expr("cont_x1000 div 100").as("cont_decile"))
      .agg(count(lit(1)).as("n_pairs"), sum("inter").as("inter_sum"),
        sum("lsz").as("lsz_sum"), max("cont_x1000").as("cont_max"))
      .orderBy("cont_decile")
  }

  /** Cross-source SHINGLE-CONTAINMENT matrix — [[sourceOverlap]]'s
    * phrase-level sibling: distinct 3-token shingles per source (phrasing,
    * not vocabulary — shared words are unavoidable, shared shingles mean
    * copied text), then per source pair BOTH the Jaccard and the
    * max-containment at x10^6 — the cross-source contamination dashboard
    * (a small source fully excerpted inside a big one reads containment
    * 10^6 while its Jaccard stays noise-level). Scale shape: one
    * map-side-combinable (source, shingle) distinct, the common-shingle
    * count is a shingle-keyed equi-join (sources^2 output rows — tiny),
    * sizes one rollup; nothing broadcast (the shingle vocabulary is
    * corpus-sized).
    */
  val sourceContainment: (SparkSession, String) => DataFrame = (spark, dir) => {
    // r06: (source, shingle) derives from the shared shingledDistinct feed
    // (one tokenize pass per session instead of a private one), and the
    // shingle-keyed SELF-JOIN became one groupBy emitting each shingle's
    // ordered source-pair combinations — same (src_a < src_b, n_common)
    // multiset (sort_array and `<` share Spark's binary UTF8 ordering),
    // one shuffle instead of a two-sided join, and per-shingle fan-out
    // bounded by sources^2 exactly as before
    val st = shingledDistinct(spark, dir)
      .join(docs(spark, dir).select(col("doc_id"), col("source")), "doc_id")
      .select(col("source"), col("s")).distinct()
      .localCheckpoint(true) // feeds the sizes rollup + the pair fan-out
    val sizes = st.groupBy("source").agg(count(lit(1)).as("n"))
    st.groupBy("s").agg(sort_array(collect_set(col("source"))).as("ss"))
      .select(explode(expr(
        "flatten(transform(ss, (a, i) -> transform(slice(ss, i + 2, size(ss)), " +
          "b -> struct(a AS src_a, b AS src_b))))")).as("p"))
      .groupBy(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(sizes.select(col("source").as("src_a"), col("n").as("n_a")), "src_a")
      .join(sizes.select(col("source").as("src_b"), col("n").as("n_b")), "src_b")
      .select(col("src_a"), col("src_b"), col("n_common"), col("n_a"), col("n_b"),
        expr("(n_common * 1000000L) div ((n_a + n_b) - n_common)").as("jac_x1e6"),
        expr("(n_common * 1000000L) div least(n_a, n_b)").as("cont_x1e6"))
      .orderBy("src_a", "src_b")
  }

  /** The unpruned full shingle self-join (reference plan for the recall
    * assertion; not wired as a contract query).
    */
  private[graft] def jaccardPairsExact(spark: SparkSession, dir: String,
                                       thresh: Int = 100): DataFrame = {
    val sh = shingledDistinct(spark, dir)
    val cand = sh.as("a")
      .join(sh.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    jaccardOf(spark, cand, dir, thresh)
  }

  /** EXACT set-similarity self-join by PREFIX FILTERING (the
    * AllPairs/PPJoin family) — unlike the MinHash-LSH pipeline above this
    * is LOSSLESS: every shingle-set pair with Jaccard >= 0.5 is found,
    * with no probabilistic recall caveat. The classic prefix lemma does
    * the pruning: order the vocabulary by (df ASC, shingle ASC)
    * (rare-first — the order that shrinks candidate lists most) and keep,
    * per doc of set size z, only the first p = z - ceil(t*z) + 1 tokens;
    * any pair meeting the threshold MUST collide on at least one prefix
    * token (overlap >= ceil(t * max(|A|, |B|)), and each side's own
    * ceil(t*z) is <= that, so both prefixes reach past the worst-case
    * miss — SetSimSpec asserts equality with the unpruned exact join).
    * Scale shape: df is a map-side-combinable shingle groupBy; the df
    * join back is shingle-keyed; the per-doc sort is a LOCAL array sort
    * (no global ranking pass — any consistent total order satisfies the
    * lemma, and (df, shingle) needs no dense integer ranks); the
    * candidate join is equi on rare prefix tokens; verification is the
    * same intersect-count equi-join jaccardPairs uses. The oracle is the
    * independent brute-force formulation (full shingle self-join), so a
    * prefix bug that DROPS a pair fails the gate.
    */
  private[graft] val SetSimThreshX1000 = 500

  val setsimPairs: (SparkSession, String) => DataFrame = (spark, dir) =>
    // shared feed: q_doc_setsim is also the ground-truth side of
    // q_doc_lsh_recall — one prefix-filtered exact join per session
    Feeds.shared(spark, dir, "setsim_pairs") { setsimPairsBuild(spark, dir) }

  private def setsimPairsBuild(spark: SparkSession, dir: String): DataFrame = {
    val t = SetSimThreshX1000
    val sh = shingledDistinct(spark, dir)
    val df = sh.groupBy("s").agg(count(lit(1)).as("df"))
    val prefix = sh.join(df, "s")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("s")))).as("ord"))
      .select(col("doc_id"), explode(expr(
        s"slice(ord, 1, int(size(ord) - ((${t}L * size(ord) + 999L) div 1000L) + 1L))")).as("p"))
      .select(col("doc_id"), col("p.s").as("s"))
    val cand = prefix.as("a")
      .join(prefix.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    jaccardOf(spark, cand, dir, t)
  }

  /** LSH RECALL AUDIT — the number a MinHash-LSH deployment must publish:
    * of the pairs a LOSSLESS join finds at Jaccard >= 0.5
    * ([[setsimPairs]], the prefix-filtered exact self-join), how many does
    * the 4x4 band scheme ([[bandCandidates]]) actually surface?
    * One left join between two pair sets already bounded by the dedup
    * candidate volume, folded to a single audit row
    * (n_exact, n_found, recall_x1000). The engine's own exact join is the
    * ground truth here; the ORACLE recomputes BOTH sides independently
    * (brute-force all-pairs exact + the band replication), so a recall
    * bug in either engine pipeline fails the gate.
    */
  val lshRecall: (SparkSession, String) => DataFrame = (spark, dir) => {
    val exact = setsimPairs(spark, dir).select("doc_a", "doc_b")
    val found = bandCandidates(spark, dir).withColumn("hit", lit(1L))
    exact.join(found, Seq("doc_a", "doc_b"), "left")
      .agg(count(lit(1)).as("n_exact"), sum(coalesce(col("hit"), lit(0L))).as("n_found"))
      .select(col("n_exact"), col("n_found"),
        expr("(n_found * 1000) div greatest(n_exact, 1)").as("recall_x1000"))
  }

  /** ONE FULL LLOYD ITERATION convergence census — the signal a k-means
    * driver loop checks each round: after the float-domain E-step
    * ([[kmeansAssignments]]) and an integer-domain M-step (per-(centroid,
    * dim) mean, quantized at 2^10 — the embSeparation centroid
    * convention), re-assign every vector against the UPDATED centroids
    * entirely in integers (d2 = sum of (qx - cq)^2 over quantized
    * coordinates; packed argmin d2 * 8 + cid, in-Long by the 2^10 bound)
    * and report per centroid: population before, movers out, population
    * after, and the post-update quantized distortion sum. Scale shape:
    * the updated codebook is 8 x 64 rows broadcast back; the re-score
    * join fans each (vector, dim) row across 8 centroids — the same
    * documented footprint as the E-step's crossJoin(broadcast(cents)) —
    * and only (vec, cid) integer partials shuffle.
    */
  val kmeansIterate: (SparkSession, String) => DataFrame = (spark, dir) => {
    val e = vectors(spark, dir)
    val a1 = kmeansAssignments(e).select(col("vec_id"), col("centroid_id").as("c1"))
    val q = e.select(col("vec_id"), posexplode(col("v")).as(Seq("i", "x")))
      .select(col("vec_id"), col("i"), floor(col("x") * 1024.0).cast("long").as("qx"))
      .localCheckpoint(true) // feeds the M-step rollup AND the re-score join
    val cents2 = a1.join(q, "vec_id")
      .groupBy(col("c1").as("cid"), col("i"))
      .agg(expr("sum(qx) div count(1)").as("cq"))
    val a2 = q.join(broadcast(cents2), "i")
      .groupBy("vec_id", "cid")
      .agg(sum((col("qx") - col("cq")) * (col("qx") - col("cq"))).as("d2"))
      .select(col("vec_id"), (col("d2") * 8L + col("cid")).as("pk"))
      .groupBy("vec_id").agg(min(col("pk")).as("pmin"))
      .select(col("vec_id"), (col("pmin") % 8L).as("c2"), expr("pmin div 8").as("qd2"))
    val moved = a1.join(a2, "vec_id")
    val before = moved.groupBy(col("c1").as("centroid_id"))
      .agg(count(lit(1)).as("n_before"),
        sum(when(col("c2") =!= col("c1"), 1L).otherwise(0L)).as("n_moved_out"))
    val after = moved.groupBy(col("c2").as("centroid_id"))
      .agg(count(lit(1)).as("n_after"), sum(col("qd2")).as("qd2_sum"))
    before.join(after, Seq("centroid_id"), "full")
      .na.fill(0L, Seq("n_before", "n_moved_out", "n_after", "qd2_sum"))
      .orderBy("centroid_id")
  }

  /** Embedding-cosine near-duplicate pairs. The exact/approximate boundary
    * is a PARAMETER, not a comment:
    *
    *  - mode = "exact" (default, the q_emb_near_dup contract): a BLOCKED
    *    exact self-join — vectors hash into B blocks and every unordered
    *    block pair (ba <= bb) becomes one balanced key-equality join
    *    partition of O((n/B)^2) work, so there is no
    *    BroadcastNestedLoopJoin, no driver-sized broadcast of the vector
    *    table, and no single-task cartesian; B scales with the cluster.
    *    Total work is still O(n^2), so exact mode REJECTS inputs above
    *    `maxExactVectors` (default 1e7 ~ 10^14 dot products, the practical
    *    ceiling for an exact sweep) instead of silently launching an
    *    unfinishable job. Sign-LSH pruning cannot replace it at this
    *    threshold: the measured similarity distribution is a continuum
    *    through the 0.45 cut (hundreds of pairs in (0.30, 0.45), near-dups
    *    only up to 0.51), so no hyperplane scheme separates them with
    *    recall 1.
    *  - mode = "approx": sign-LSH bucketed candidates (IvfPlanes +
    *    Hamming<=1 multi-probe) scored exactly and thresholded — linear-ish
    *    work at any scale, recall < 1 BY CONTRACT (pairs whose buckets
    *    differ in >= 2 sign bits are missed; measured ~0.5-0.8 at
    *    threshold 0.45 on this data). Use it when the input exceeds the
    *    exact ceiling and a stated-recall dedup is acceptable.
    */
  def embNearDupMode(spark: SparkSession, dir: String, mode: String = "exact",
                     maxExactVectors: Long = 10L * 1000 * 1000,
                     threshold: Double = 0.45): DataFrame = mode match {
    case "exact" =>
      val n = embeddings(spark, dir).count()
      require(n <= maxExactVectors,
        s"embNearDup exact mode is O(n^2) total work: $n vectors > maxExactVectors=" +
          s"$maxExactVectors. Use mode=approx (sign-LSH candidates, recall < 1) " +
          "or raise maxExactVectors explicitly.")
      val B = 8
      val e = embeddings(spark, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("norm", sqrt(expr("aggregate(v, 0D, (acc, x) -> acc + x * x)")))
      val blockPairs = spark.range(B.toLong * B)
        .select((col("id") / B).cast("int").as("ba"), (col("id") % B).cast("int").as("bb"))
        .filter(col("ba") <= col("bb"))
      val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"), col("norm").as("na"))
        .withColumn("ba", pmod(col("vec_a"), lit(B)).cast("int"))
        .join(broadcast(blockPairs), Seq("ba"))
      val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("norm").as("nb"))
        .withColumn("bb", pmod(col("vec_b"), lit(B)).cast("int"))
        .join(broadcast(blockPairs), Seq("bb"))
      // each unordered block pair meets exactly once; same-block pairs arrive
      // in both orders and keep only the ascending one
      a.join(b, Seq("ba", "bb"))
        .filter(col("vec_a") =!= col("vec_b"))
        .filter(col("ba") =!= col("bb") || col("vec_a") < col("vec_b"))
        .withColumn("sim",
          expr("aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (acc, p) -> acc + p)") /
            (col("na") * col("nb")))
        .filter(col("sim") > threshold)
        .select(least(col("vec_a"), col("vec_b")).as("vec_a"),
          greatest(col("vec_a"), col("vec_b")).as("vec_b"))
        .orderBy("vec_a", "vec_b")
    case "approx" =>
      val e = bucketed(spark, dir, IvfPlanes)
      val probes = hamming1Probes(IvfPlanes.length)
      val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"),
          col("norm").as("na"), col("bucket").as("ba"))
        .withColumn("flip", explode(lit(probes)))
        .withColumn("probe", expr("int(ba) ^ flip"))
        .drop("flip")
      val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"),
        col("norm").as("nb"), col("bucket").as("probe"))
      // a given (a, b) matches via at most one flip (the probe set holds
      // distinct xor masks) but in both (a, b)/(b, a) directions -> the
      // ascending filter + distinct
      a.join(b, Seq("probe"))
        .filter(col("vec_a") < col("vec_b"))
        .withColumn("sim",
          expr("aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (acc, p) -> acc + p)") /
            (col("na") * col("nb")))
        .filter(col("sim") > threshold)
        .select("vec_a", "vec_b").distinct()
        .orderBy("vec_a", "vec_b")
    case other =>
      throw new IllegalArgumentException(s"embNearDup mode must be exact|approx, got $other")
  }

  /** The q_emb_near_dup contract entry: exact mode at the default ceiling. */
  val embNearDup: (SparkSession, String) => DataFrame = (spark, dir) =>
    embNearDupMode(spark, dir)

  /** Winnowing fingerprints: md5-derived 60-bit hash per 3-gram shingle,
    * window-min over 4 consecutive shingles (the classic rolling
    * fingerprint selection), per-doc exact-integer summary.
    */
  val winnowFingerprints: (SparkSession, String) => DataFrame = (spark, dir) => {
    val sh = docs(spark, dir)
      .withColumn("toks", toks)
      .withColumn("shingles",
        when(size(col("toks")) < 3, array().cast("array<string>"))
          .otherwise(expr("transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', slice(toks, i, 3)))")))
      .select(col("doc_id"), posexplode(col("shingles")).as(Seq("pos", "s")))
      .withColumn("hv", expr("cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
    sh.withColumn("fp", min("hv").over(w))
      .groupBy("doc_id")
      .agg(countDistinct("fp").as("n_fps"), min("fp").as("min_fp"), max("fp").as("max_fp"))
      .orderBy("doc_id")
  }

  /** Recall of the IVF-bucketed ANN vs the exact brute force, per query
    * vector (recall_x100 as an exact integer) — a distributed self-check of
    * the approximate path's quality.
    */
  val annRecall: (SparkSession, String) => DataFrame = (spark, dir) => {
    val exact = annTopK(spark, dir).select(col("query_id"), col("neighbor_id"))
    val approx = annIvfTopK(spark, dir).select(col("query_id"), col("neighbor_id"))
    exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
      .join(exact.groupBy("query_id").agg(count(lit(1)).as("k")), Seq("query_id"), "right")
      .na.fill(0L, Seq("hits"))
      .select(col("query_id"), (col("hits") * 100L / col("k")).cast("long").as("recall_x100"))
      .orderBy("query_id")
  }

  /** Shared CTE chain for the ANN oracles at an explicit configuration:
    * per-vector norm + sign-LSH bucket (the same fold order as the engine
    * plan), query side exploded over the multi-probe flips, and the
    * bucketed top-10 ranking.
    */
  private[graft] def ivfCtesFor(planes: Array[Array[Double]],
                                probes: Array[Int]): String = {
    val np = planes.length
    val planesSql = planes.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    val flips = probes.map(p => s"($p)").mkString(",")
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |p AS (SELECT $planesSql::DOUBLE[][] AS ps),
       |n AS (SELECT vec_id, v,
       |        sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
       |        list_sum(list_transform(range(1, ${np + 1}), i ->
       |          CASE WHEN list_sum(list_transform(range(1, 65), j -> ps[i][j] * v[j])) >= 0.0
       |               THEN (1 << ($np - i)) ELSE 0 END))::INT AS bucket
       |      FROM e CROSS JOIN p),
       |qp AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn,
       |              xor(bucket, f.flip)::INT AS qbucket
       |       FROM n CROSS JOIN (VALUES $flips) f(flip)
       |       WHERE vec_id < 10),
       |apprR AS (SELECT qp.query_id, n.vec_id AS neighbor_id,
       |            row_number() OVER (PARTITION BY qp.query_id ORDER BY
       |              list_sum(list_transform(range(1, 65), i -> qv[i] * v[i])) / (qn * nrm) DESC,
       |              n.vec_id) AS rank
       |          FROM qp JOIN n ON n.bucket = qp.qbucket
       |          WHERE n.vec_id != qp.query_id)""".stripMargin
  }

  private def ivfCtes: String = ivfCtesFor(IvfPlanes, hamming1Probes(IvfPlanes.length))

  // ---- dedup keep-list: the actual dedup step over the cluster labels ----

  /** The canonical near-duplicate KEEP-LIST — the step every dedup
    * pipeline actually executes after clustering: keep a document iff it
    * is in no LSH candidate pair at all (keep_reason 'unique') or it is
    * its cluster's representative (minimum doc id — doc_id == cluster_id,
    * keep_reason 'rep'); every other cluster member drops. Composes
    * [[dupClusters]]' connected components with one left join against the
    * corpus — the label table is cluster-member-sized (bounded by the
    * candidate-pair graph, typically a tiny corpus fraction), so the join
    * broadcasts at contract scale and degrades to a doc_id equi-join at
    * web scale.
    */
  val keepList: (SparkSession, String) => DataFrame = (spark, dir) => {
    val cc = lshCc(spark, dir)
    docs(spark, dir).select(col("doc_id"))
      .join(cc, Seq("doc_id"), "left")
      .filter(col("cluster_id").isNull || col("doc_id") === col("cluster_id"))
      .select(col("doc_id"),
        when(col("cluster_id").isNull, "unique").otherwise("rep").as("keep_reason"))
      .orderBy("doc_id")
  }

  // ---- k-means assignment step (Lloyd E-step), packed integer argmin ----

  /** One exact k-means ASSIGNMENT step (the Lloyd E-step) over the
    * embeddings: the 8 centroids are the vectors with vec_id < 8 (a
    * deterministic seed — never a random init; reruns agree), each vector
    * finds its nearest centroid by squared L2 distance, and the argmin
    * runs ENTIRELY in the integer domain after per-pair quantization:
    * packed = floor(d2 * 2^20) * 16 + cid, nearest = MIN(packed) — ties
    * on equal quantized distance resolve to the smallest centroid id with
    * no float compare anywhere near the argmin (the D8 packed-argmax
    * idiom, transplanted to ML). d2 is the sequential fold
    * aggregate(zip_with(cv, v, (x,y) -> (x-y)*(x-y)), 0D, +), mirrored by
    * the oracle's list_sum/list_transform (the q_emb_near_dup idiom).
    * Output is the per-centroid assignment summary (n_vecs + quantized
    * inertia sum/extrema) — the convergence row a full Lloyd loop
    * iterates on. Scale shape: the centroid table is k rows BROADCAST;
    * after the distance map only (vec_id, packed) longs shuffle to the
    * argmin. Long headroom: qd < 2^32 at this value range, so the inertia
    * sum is overflow-free to ~2^31 vectors per centroid (beyond that,
    * widen the sum to decimal).
    */
  /** Typed embedding vectors (f32 -> f64 widening is exact) — shared by
    * the k-means steps.
    */
  private def vectors(spark: SparkSession, dir: String): DataFrame =
    embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Per-vector nearest-centroid assignment (vec_id, centroid_id, qd) —
    * the shared E-step core of [[kmeansAssign]] and [[kmeansUpdate]].
    */
  private def kmeansAssignments(e: DataFrame): DataFrame = {
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val d2 = expr("aggregate(zip_with(cv, v, (x, y) -> (x - y) * (x - y)), 0D, (acc, p) -> acc + p)")
    e.crossJoin(broadcast(cents))
      .select(col("vec_id"),
        (floor(d2 * 1048576.0).cast("long") * 16L + col("cid")).as("pk"))
      .groupBy("vec_id").agg(min("pk").as("pmin"))
      .select(col("vec_id"), (col("pmin") % 16L).as("centroid_id"),
        expr("pmin div 16").as("qd"))
  }

  val kmeansAssign: (SparkSession, String) => DataFrame = (spark, dir) =>
    kmeansAssignments(vectors(spark, dir))
      .groupBy("centroid_id")
      .agg(count(lit(1)).as("n_vecs"), sum(col("qd")).as("qd_sum"),
        min(col("qd")).as("qd_min"), max(col("qd")).as("qd_max"))
      .orderBy("centroid_id")

  /** SIMPLIFIED-SILHOUETTE census — the per-vector clustering-quality
    * score every k-means dashboard reads, in exact integers: with qa =
    * quantized squared distance to the ASSIGNED (nearest) centroid and
    * qb = the second-nearest, silq = ((qb - qa) * 1000) div
    * greatest(qa, qb, 1) in [0, 1000] (the simplified silhouette of
    * Hruschka et al. — centroid distances instead of the O(n^2)
    * all-pairs mean, WITH the squared-distance convention stated; 1000 =
    * perfectly separated, 0 = on the midline). Both distances come from
    * the SAME packed-argmin frame as [[kmeansAssign]] (pk = qd * 16 +
    * cid, unique per centroid because the low bits differ): sort the
    * vector's 8 packed keys and read slots 0 and 1 — ties on qd break to
    * the smaller cid exactly like kmeansAssign, zero float compares.
    * Fold: per (assigned centroid, silq decile) with n_vecs, vec_id
    * checksum, silq sum + max. Scale shape: the centroid table is
    * constant-sized and explicitly broadcast, the 8-key sort is per-row
    * work inside one vec_id rollup, and the census fold is map-side
    * combinable on <= 8 * 11 keys.
    */
  val kmeansSilhouette: (SparkSession, String) => DataFrame = (spark, dir) => {
    val e = vectors(spark, dir)
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val d2 = expr("aggregate(zip_with(cv, v, (x, y) -> (x - y) * (x - y)), 0D, (acc, p) -> acc + p)")
    e.crossJoin(broadcast(cents))
      .select(col("vec_id"),
        (floor(d2 * 1048576.0).cast("long") * 16L + col("cid")).as("pk"))
      .groupBy("vec_id").agg(sort_array(collect_list(col("pk"))).as("pks"))
      .select(col("vec_id"),
        expr("pks[0] % 16").as("centroid_id"),
        expr("pks[0] div 16").as("qa"),
        expr("pks[1] div 16").as("qb"))
      .select(col("vec_id"), col("centroid_id"),
        expr("((qb - qa) * 1000) div greatest(qa, qb, 1L)").as("silq"))
      .groupBy(col("centroid_id"), expr("silq div 100").as("sil_decile"))
      .agg(count(lit(1)).as("n_vecs"), sum("vec_id").as("vid_sum"),
        sum("silq").as("silq_sum"), max("silq").as("silq_max"))
      .orderBy("centroid_id", "sil_decile")
  }

  /** PRODUCT-QUANTIZATION assignment census (the PQ/IVF-PQ compression
    * step every billion-vector ANN index actually runs): the 64-dim
    * vector splits into M = 4 contiguous 16-dim subspaces, each subspace
    * has its own 8-centroid codebook (deterministically seeded from the
    * vec_id < 8 vectors' slices — the [[kmeansAssign]] convention, so
    * reruns agree), and each vector picks its nearest sub-centroid per
    * subspace by the same packed-argmin idiom (pk = floor(d2 * 2^20) * 8
    * + cid, min — ties to the smallest centroid id with zero float
    * compares on the argmin path). Output is the per-(subspace, centroid)
    * census with the quantized distortion sums — the codebook-balance /
    * reconstruction-error dashboard. Scale shape: the codebook is
    * constant-sized (M * 8 slices) and explicitly broadcast; per vector
    * the M sub-distances come from ONE narrow posexplode (vectors never
    * self-join); the argmin groupBy keys on (vec_id, subspace) and the
    * census groupBy is map-side combinable on 32 keys.
    */
  private[graft] val PqSubspaces = 4
  private[graft] val PqSubDim = 16

  /** Quantized per-subspace distances of `e`'s vectors against the
    * vec_id < 8 codebook: (vec_id, subspace, cid, qd) — the shared core of
    * [[pqAssign]] (argmin over cid) and [[annPqRecall]] (the query-side
    * ADC lookup table).
    */
  private def pqSubDists(e: DataFrame): DataFrame = {
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val d2s = expr(
      s"""transform(sequence(0, ${PqSubspaces - 1}), m ->
         |  aggregate(zip_with(slice(cv, m * $PqSubDim + 1, $PqSubDim),
         |                     slice(v, m * $PqSubDim + 1, $PqSubDim),
         |    (x, y) -> (x - y) * (x - y)), 0D, (acc, p) -> acc + p))""".stripMargin)
    e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"), posexplode(d2s).as(Seq("m", "d2")))
      .select(col("vec_id"), col("m").cast("long").as("subspace"), col("cid"),
        floor(col("d2") * 1048576.0).cast("long").as("qd"))
  }

  /** Per-(vector, subspace) PQ code: the packed argmin over [[pqSubDists]]. */
  private def pqCodes(e: DataFrame): DataFrame =
    pqSubDists(e)
      .select(col("vec_id"), col("subspace"), (col("qd") * 8L + col("cid")).as("pk"))
      .groupBy("vec_id", "subspace").agg(min("pk").as("pmin"))
      .select(col("vec_id"), col("subspace"),
        (col("pmin") % 8L).as("cid"), expr("pmin div 8").as("qd"))

  val pqAssign: (SparkSession, String) => DataFrame = (spark, dir) =>
    pqCodes(vectors(spark, dir))
      .groupBy(col("subspace"), col("cid").as("centroid_id"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("qd")).as("qd_sum"),
        min(col("qd")).as("qd_min"), max(col("qd")).as("qd_max"))
      .orderBy("subspace", "centroid_id")

  /** PQ-ADC RECALL harness — the evaluation every PQ deployment runs
    * before trusting compressed search: for the 10 contract queries
    * (vec_id < 10), rank the corpus by the ASYMMETRIC DISTANCE
    * approximation (adc(q, v) = sum over subspaces of the quantized
    * distance from q's subvector to v's ASSIGNED sub-centroid — the FAISS
    * ADC table lookup, here an integer sum of [[pqSubDists]] rows keyed by
    * v's [[pqCodes]]) and report how many of the exact quantized-L2
    * top-10 neighbors the PQ top-10 retains (recall_x100). Every ranking
    * key is an exact integer (floor(d2 * 2^20), ties to the smaller
    * vec_id), so engine and oracle agree bit for bit. Scale shape: the
    * ADC table is queries x M x 8 rows (broadcast by construction); the
    * candidate scoring joins codes (N x M rows) against it — linear in N
    * per query like every documented query-batch baseline here; the exact
    * side is the same 10-broadcast-queries brute scan q_ann_topk uses;
    * both rankings window per query (10 bounded partitions). A production
    * index would IVF-prune candidates first (q_ann_ivf_topk) — this
    * operator is the RECALL MEASUREMENT, deliberately unpruned so the
    * number it reports is the compression loss alone.
    */
  val annPqRecall: (SparkSession, String) => DataFrame = (spark, dir) => {
    val e = vectors(spark, dir)
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    // ADC lookup table: quantized sub-distance from each QUERY subvector
    // to each codebook centroid
    val adc = pqSubDists(queries.select(col("query_id").as("vec_id"), col("qv").as("v")))
      .select(col("vec_id").as("query_id"), col("subspace"), col("cid"), col("qd"))
    val wApprox = Window.partitionBy("query_id")
      .orderBy(col("adist").asc, col("vec_id").asc)
    val approx = pqCodes(e).select("vec_id", "subspace", "cid")
      .join(broadcast(adc), Seq("subspace", "cid"))
      .groupBy("query_id", "vec_id").agg(sum(col("qd")).as("adist"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("rank", row_number().over(wApprox))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
    val wExact = Window.partitionBy("query_id")
      .orderBy(col("qd2").asc, col("vec_id").asc)
    val exact = e.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("qd2", floor(
        expr("aggregate(zip_with(qv, v, (x, y) -> (x - y) * (x - y)), 0D, (acc, p) -> acc + p)")
          * 1048576.0).cast("long"))
      .withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
    approx.join(exact, Seq("query_id", "neighbor_id"))
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
      .join(queries.select("query_id"), Seq("query_id"), "right")
      .na.fill(0L, Seq("hits"))
      .select(col("query_id"), (col("hits") * 10L).as("recall_x100"))
      .orderBy("query_id")
  }

  /** Language-ID CONFUSION MATRIX — the classifier evaluation over
    * [[langId]]'s marker-vote predictions vs the declared lang column:
    * per (lang_given, lang_pred), the doc count. One map-side-combinable
    * groupBy over the langId frame.
    */
  val langConfusion: (SparkSession, String) => DataFrame = (spark, dir) =>
    langId(spark, dir)
      .groupBy("lang_given", "lang_pred")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang_given", "lang_pred")

  /** POST-DEDUP corpus census — the composition a dedup pipeline reports
    * after applying [[keepList]]: per source, how many docs (and how much
    * token volume) survive vs drop. One left join of the corpus against
    * the keep table (cluster-member-bounded, same shape note as
    * keepList) and a map-side-combinable source rollup; the verdict
    * census mirrors q_doc_quality_gate's dashboard contract.
    */
  val dedupCensus: (SparkSession, String) => DataFrame = (spark, dir) =>
    docs(spark, dir)
      .withColumn("n_tokens", size(toks).cast("long"))
      .join(keepList(spark, dir).select(col("doc_id"), col("keep_reason")),
        Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep_reason").isNotNull, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep_reason").isNotNull, col("n_tokens")).otherwise(0L))
          .as("kept_tokens"),
        sum(when(col("keep_reason").isNull, col("n_tokens")).otherwise(0L))
          .as("dropped_tokens"))
      .orderBy("source")

  /** The k-means UPDATE step (Lloyd M-step) in exact integers: per
    * (centroid, dimension), the assigned-vector count and the sum of
    * per-coordinate quantized values floor(x * 2^20) — order-free integer
    * sums (a float mean would be combine-order dependent and could never
    * hash-match an oracle); the caller derives the new centroid as
    * qsum / (n * 2^20) at whatever precision it wants. Composes the
    * E-step: assignments are the same packed-argmin pipeline as
    * [[kmeansAssign]]; the coordinate explode shuffles only
    * (centroid, dim, q) integers, never vectors.
    */
  val kmeansUpdate: (SparkSession, String) => DataFrame = (spark, dir) => {
    val e = vectors(spark, dir)
    kmeansAssignments(e).select("vec_id", "centroid_id")
      .join(e, "vec_id")
      .select(col("centroid_id"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("centroid_id"), col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(floor(col("x") * 1048576.0).cast("long")).as("qsum"))
      .orderBy("centroid_id", "dim")
  }

  // ---- per-document LM fluency score from corpus bigram statistics ----

  /** Per-document bigram "language-model" fluency score — the composition
    * query over [[collocations]]: every adjacent token pair of a document
    * looks up the corpus-level INTEGER-EXACT PMI-style score
    * ((n_ab * n_total) * 10^6 div (c1 * c2), support >= 3), and the doc
    * aggregates occurrence-weighted integer sums — documents made of
    * common collocations score high, word salad scores low, so this is
    * the cheap statistical stand-in for LM-perplexity quality filtering.
    * Scale shape: the score table is vocabulary-pair-sized — broadcast at
    * contract scale, a pair-keyed shuffle equi-join at web scale; after
    * the join only (doc_id, score) rows aggregate. Docs with fewer than 2
    * tokens have no pairs and are absent by contract (mirrored by the
    * oracle's empty range()).
    */
  val docLmScore: (SparkSession, String) => DataFrame = (spark, dir) => {
    val scores = collocations(spark, dir).select(col("w1"), col("w2"), col("score"))
    val pairs = docs(spark, dir).select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 1), " +
          "i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    pairs.join(scores, Seq("w1", "w2"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("score").isNotNull, 1L).otherwise(0L)).as("n_scored"),
        coalesce(sum(col("score")), lit(0L)).as("qscore_sum"))
      .orderBy("doc_id")
  }

  // ---- token runs: within-doc burstiness (adjacent repetition) ----

  /** Longest same-token run and run count per document — the adjacent-
    * repetition burstiness signal (a degenerate doc repeats one token in
    * long runs; clean prose stays near max_run = 1). Pure integer fold
    * over the in-order token sequence with higher-order Column functions —
    * entirely NARROW (zero shuffle, no window, no explode): runs are
    * counted as boundary positions (pos 1, or token != predecessor), and
    * the max run by a left fold carrying (current run, best run). The
    * oracle runs the textbook gaps-and-islands window formulation — an
    * independent algorithm over the same sequence.
    */
  val tokenRuns: (SparkSession, String) => DataFrame = (spark, dir) =>
    docs(spark, dir)
      .withColumn("ws", split(col("text"), " "))
      .select(col("doc_id"), size(col("ws")).cast("long").as("n_tokens"),
        when(size(col("ws")) <= 1, size(col("ws")).cast("long"))
          .otherwise(expr(
            "1L + size(filter(sequence(2, size(ws)), i -> element_at(ws, i) != element_at(ws, i - 1)))"))
          .as("n_runs"),
        when(size(col("ws")) <= 1, size(col("ws")).cast("long"))
          .otherwise(expr(
            """aggregate(sequence(2, size(ws)),
              |  named_struct('cur', 1L, 'best', 1L),
              |  (acc, i) -> named_struct(
              |    'cur', if(element_at(ws, i) = element_at(ws, i - 1), acc.cur + 1L, 1L),
              |    'best', greatest(acc.best,
              |      if(element_at(ws, i) = element_at(ws, i - 1), acc.cur + 1L, 1L))),
              |  acc -> acc.best)""".stripMargin))
          .as("max_run"))
      .orderBy("doc_id")

  // ---- vocabulary growth: Heaps-law curve over deterministic shards ----

  /** Heaps-law vocabulary growth over deterministic corpus shards: docs
    * hash into 10 stable shards (md5-derived, never a random() — the
    * stratifiedSample idiom, so reruns and late partitions agree), a
    * token's FIRST shard is the minimum shard it appears in, and shard k's
    * new_tokens counts the tokens first seen there; cum_vocab is the
    * vocabulary size after ingesting shards 0..k in order — the empirical
    * Heaps curve. Scale shape: tokens reduce map-side to (token, min
    * shard) — the one shuffle carries the VOCABULARY, never raw token
    * occurrences; the growth curve is a 10-row frame (constant-bounded
    * window on a non-foldable constant partition key, the
    * StatsOps.topEvents idiom, so no unpartitioned-window warning).
    */
  val vocabGrowth: (SparkSession, String) => DataFrame = (spark, dir) => {
    val shard = conv(substring(md5(concat(lit("shard#"), col("doc_id").cast("string"))), 1, 15), 16, 10)
      .cast("long") % 10
    val perShard = docs(spark, dir)
      .select(shard.as("shard"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(min("shard").as("first_shard"))
      .groupBy("first_shard").agg(count(lit(1)).as("new_tokens"))
    val wSpec = Window.partitionBy(pmod(col("shard"), lit(1L))).orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spark.range(10).select(col("id").as("shard"))
      .join(perShard, col("shard") === col("first_shard"), "left")
      .select(col("shard"), coalesce(col("new_tokens"), lit(0L)).as("new_tokens"))
      .withColumn("cum_vocab", sum(col("new_tokens")).over(wSpec))
      .orderBy("shard")
  }

  // ---- sequence packing: greedy fill of fixed-capacity token bins ----

  /** Packing capacity in tokens — small enough that bins hold a handful
    * of contract-corpus docs (avg ~55 tokens), shared with the oracle.
    */
  private val PackCap = 256L

  /** Greedy sequence packing: per source, docs in doc_id order fill
    * fixed-capacity token bins — a doc that would overflow the open bin
    * starts the next one; an oversized doc (> capacity) gets a bin of its
    * own. This is the LLM-pretraining batch-packing step (no document
    * splitting), inherently a SEQUENTIAL scan per source — parallel
    * across sources, and implemented as the streaming secondary-sort
    * idiom rather than a group materialization: repartition by source,
    * sortWithinPartitions (source, doc_id), one mapPartitions pass with
    * O(1) state (open-bin fill + counters), so a source's doc list never
    * sits in memory. Emits per (source, bin): doc/token counts and the
    * doc_id span. Token counts are [[toks]] sizes — exact integers; the
    * oracle replays the same greedy rule as a recursive CTE (an
    * independent formulation: row-linked recursion vs streamed scan).
    */
  val packDocs: (SparkSession, String) => DataFrame = (spark, dir) => {
    import spark.implicits._
    val cap = PackCap
    docs(spark, dir)
      .select(col("source"), col("doc_id"), size(toks).cast("long").as("tok"))
      .repartition(col("source"))
      .sortWithinPartitions("source", "doc_id")
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        var src: String = null
        var bin = 0L
        var fill = 0L
        it.map { case (s, id, tok) =>
          if (s != src) { src = s; bin = 1L; fill = tok }
          else if (fill + tok > cap) { bin += 1L; fill = tok }
          else fill += tok
          (s, bin, id, tok)
        }
      }
      .toDF("source", "bin", "doc_id", "tok")
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("tok").as("tok_sum"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("source", "bin")
  }

  // ---- skyline: per-source Pareto front on (n_tokens, n_distinct) ----

  /** Per-source skyline (Pareto front, maximize both): a doc survives iff
    * no same-source doc dominates it (>= on both of n_tokens/n_distinct,
    * > on at least one; exact-tie twins both survive). The classic
    * quadratic definition collapses to two WINDOW passes because the
    * criteria are integers: a doc survives iff its n_distinct equals the
    * max within its (source, n_tokens) group AND strictly exceeds the max
    * over same-source docs with strictly larger n_tokens — the latter a
    * RANGE frame to offset -1 on descending n_tokens, which excludes
    * ties exactly (integer order values). Both windows key on source (no
    * global anything, no self-join); per-source work is linear. The
    * oracle runs the independent quadratic NOT-EXISTS dominance test.
    */
  val skyline: (SparkSession, String) => DataFrame = (spark, dir) => {
    val t = docs(spark, dir)
      .withColumn("ws", toks)
      .select(col("source"), col("doc_id"),
        size(col("ws")).cast("long").as("n_tokens"),
        size(array_distinct(col("ws"))).cast("long").as("n_distinct"))
    val gy = max("n_distinct").over(Window.partitionBy("source", "n_tokens"))
    val m = max("n_distinct").over(
      Window.partitionBy("source").orderBy(col("n_tokens").desc)
        .rangeBetween(Window.unboundedPreceding, -1))
    t.withColumn("gy", gy).withColumn("m", m)
      .filter(col("n_distinct") === col("gy")
        && (col("m").isNull || col("n_distinct") > col("m")))
      .select("source", "doc_id", "n_tokens", "n_distinct")
      .orderBy("source", "doc_id")
  }

  // BFS level-set chain for the q_doc_bfs_levels oracle: per level k,
  // l{k} = the e0-neighbors of l{k-1} not yet in the running visited
  // union v{k-1}; every set MATERIALIZED (each is referenced twice by the
  // next level — inlined CTEs would re-plan the upstream pipeline 2^k
  // times, the getis lesson). Depth 12 = the engine's MaxBfsRounds.
  private def bfsChainCte: String = (1 to MaxBfsRounds).map { k =>
    s"""l$k AS MATERIALIZED (SELECT DISTINCT e.dst AS doc_id FROM e0 e
       |  JOIN l${k - 1} f ON e.src = f.doc_id
       |  WHERE e.dst NOT IN (SELECT doc_id FROM v${k - 1})),
       |v$k AS MATERIALIZED (SELECT doc_id FROM v${k - 1}
       |  UNION SELECT doc_id FROM l$k)""".stripMargin
  }.mkString(",\n")

  private def bfsLevelUnion: String = (0 to MaxBfsRounds)
    .map(k => s"SELECT $k AS level, doc_id FROM l$k").mkString("\n  UNION ALL ")

  /** DuckDB oracles for the SQL-expressible subset. */
  val oracleSql: Map[String, String] = Map(
    // BFS distance census: the engine's frontier rounds re-expressed as
    // the chained level-set CTEs over the q_doc_kcore cand construction,
    // unreached = the node set minus the final visited union
    "q_doc_bfs_levels" ->
      s"""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
         |sh AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
         |       FROM t, unnest(range(1, len(ws) - 1)) AS u(i)),
         |seeds AS (SELECT unnest(range(0, 16)) AS seed),
         |sigs AS (SELECT doc_id, seed, min(md5(seed::VARCHAR || ':' || s)) AS minhash
         |         FROM sh CROSS JOIN seeds GROUP BY 1, 2),
         |bands AS (SELECT doc_id, (seed // 4)::INT AS band,
         |                 string_agg(lpad(seed::VARCHAR, 2, '0') || ':' || minhash, ',' ORDER BY seed) AS bkey
         |          FROM sigs GROUP BY 1, 2),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM bands a JOIN bands b
         |           ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
         |e0 AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM cand
         |      UNION ALL SELECT doc_b, doc_a FROM cand),
         |nd AS MATERIALIZED (SELECT DISTINCT src AS doc_id FROM e0),
         |l0 AS MATERIALIZED (SELECT doc_id FROM nd WHERE doc_id % 5 = 0),
         |v0 AS MATERIALIZED (SELECT doc_id FROM l0),
         |$bfsChainCte,
         |lvl AS (
         |  $bfsLevelUnion
         |  UNION ALL SELECT -1 AS level, doc_id FROM nd
         |    WHERE doc_id NOT IN (SELECT doc_id FROM v$MaxBfsRounds))
         |SELECT level::BIGINT AS level, count(*)::BIGINT AS n_docs,
         |  sum(doc_id)::BIGINT AS id_sum
         |FROM lvl GROUP BY 1 ORDER BY 1""".stripMargin,
    // neighbor edit distance: the direct global lead() formulation (vs the
    // engine's bucketed distributed sort); DuckDB's levenshtein and
    // Spark's agree exactly on this ASCII corpus
    "q_doc_edit_dist" ->
      """WITH s AS (SELECT doc_id, text,
        |    lead(doc_id) OVER (ORDER BY text, doc_id) AS next_doc,
        |    lead(text) OVER (ORDER BY text, doc_id) AS nt
        |  FROM documents)
        |SELECT doc_id, next_doc,
        |  levenshtein(text[1:64], nt[1:64])::BIGINT AS edit64
        |FROM s WHERE next_doc IS NOT NULL ORDER BY doc_id""".stripMargin,

    // source total variation: the independent GATHER formulation — the
    // full pairs x union-of-tokens grid with explicit zero coalesces (vs
    // the engine's inner-join decomposition)
    "q_source_tv" ->
      """WITH tk AS (SELECT source,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS tok
        |  FROM documents),
        |c AS (SELECT source, tok, count(*)::HUGEINT AS c FROM tk GROUP BY 1, 2),
        |n AS (SELECT source, sum(c)::HUGEINT AS n FROM c GROUP BY 1),
        |u AS (SELECT DISTINCT tok FROM c),
        |p AS (SELECT a.source AS s1, a.n AS n1, b.source AS s2, b.n AS n2
        |      FROM n a, n b WHERE a.source < b.source)
        |SELECT s1 AS src_a, s2 AS src_b,
        |  n1::BIGINT AS n_a, n2::BIGINT AS n_b,
        |  ((sum(abs(coalesce(c1.c, 0)::HUGEINT * n2
        |            - coalesce(c2.c, 0)::HUGEINT * n1)) * 1000000)
        |   // (2 * n1 * n2))::BIGINT AS tv_x1e6
        |FROM p CROSS JOIN u
        |LEFT JOIN c c1 ON c1.source = p.s1 AND c1.tok = u.tok
        |LEFT JOIN c c2 ON c2.source = p.s2 AND c2.tok = u.tok
        |GROUP BY 1, 2, n1, n2 ORDER BY 1, 2""".stripMargin,

    // scrub census: the same single-char-class / literal patterns counted
    // via len(regexp_extract_all) — engine-independent by construction
    "q_doc_scrub" ->
      """WITH t AS (SELECT source, length(text)::BIGINT AS nc,
        |    len(regexp_extract_all(text, '[0-9]'))::BIGINT AS digits,
        |    len(regexp_extract_all(text, '@'))::BIGINT AS ats,
        |    len(regexp_extract_all(text, 'http'))::BIGINT AS urls,
        |    len(regexp_extract_all(text, '[a-z0-9]@[a-z0-9]'))::BIGINT AS emailish
        |  FROM documents)
        |SELECT source, count(*)::BIGINT AS n_docs, sum(nc)::BIGINT AS total_chars,
        |  sum(digits)::BIGINT AS digit_chars, sum(ats)::BIGINT AS at_chars,
        |  sum(urls)::BIGINT AS url_hits, sum(emailish)::BIGINT AS email_hits,
        |  ((sum(digits) * 1000) // sum(nc))::BIGINT AS digit_ratio_x1000
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    // independent quadratic dominance formulation of the skyline
    "q_doc_skyline" ->
      """WITH t AS (SELECT source, doc_id,
        |    len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT AS n_tokens,
        |    len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')))::BIGINT AS n_distinct
        |  FROM documents)
        |SELECT source, doc_id, n_tokens, n_distinct FROM t a
        |WHERE NOT EXISTS (SELECT 1 FROM t b WHERE b.source = a.source
        |  AND b.n_tokens >= a.n_tokens AND b.n_distinct >= a.n_distinct
        |  AND (b.n_tokens > a.n_tokens OR b.n_distinct > a.n_distinct))
        |ORDER BY 1, 2""".stripMargin,

    // the same greedy rule as row-linked recursion over rn = row_number
    // per source (doc_id order) — carries (bin, fill) down the chain
    "q_doc_pack" ->
      """WITH RECURSIVE t AS (
        |  SELECT source, doc_id,
        |    len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT AS tok,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents),
        |p AS (
        |  SELECT source, doc_id, tok, rn, 1::BIGINT AS bin, tok AS fill
        |  FROM t WHERE rn = 1
        |  UNION ALL
        |  SELECT t.source, t.doc_id, t.tok, t.rn,
        |    CASE WHEN p.fill + t.tok > 256 THEN p.bin + 1 ELSE p.bin END,
        |    CASE WHEN p.fill + t.tok > 256 THEN t.tok ELSE p.fill + t.tok END
        |  FROM t JOIN p ON t.source = p.source AND t.rn = p.rn + 1)
        |SELECT source, bin, count(*)::BIGINT AS n_docs, sum(tok)::BIGINT AS tok_sum,
        |  min(doc_id)::BIGINT AS first_doc, max(doc_id)::BIGINT AS last_doc
        |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the q_doc_dup_clusters CTE chain (independent transitive closure),
    // then the keep predicate: unlabeled, or label == own id
    "q_doc_keep_list" ->
      """WITH RECURSIVE t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |sh AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
        |       FROM t, unnest(range(1, len(ws) - 1)) AS u(i)),
        |seeds AS (SELECT unnest(range(0, 16)) AS seed),
        |sigs AS (SELECT doc_id, seed, min(md5(seed::VARCHAR || ':' || s)) AS minhash
        |         FROM sh CROSS JOIN seeds GROUP BY 1, 2),
        |bands AS (SELECT doc_id, (seed // 4)::INT AS band,
        |                 string_agg(lpad(seed::VARCHAR, 2, '0') || ':' || minhash, ',' ORDER BY seed) AS bkey
        |          FROM sigs GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |         FROM bands a JOIN bands b
        |           ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        |e AS (SELECT doc_a AS src, doc_b AS dst FROM cand
        |      UNION ALL SELECT doc_b, doc_a FROM cand),
        |reach(node, lbl) AS (
        |  SELECT src, src FROM e
        |  UNION
        |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node),
        |cc AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY 1)
        |SELECT d.doc_id,
        |  CASE WHEN cc.doc_id IS NULL THEN 'unique' ELSE 'rep' END AS keep_reason
        |FROM documents d LEFT JOIN cc ON cc.doc_id = d.doc_id
        |WHERE cc.doc_id IS NULL OR cc.cluster_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // packed integer argmin over the q_emb_near_dup fold idiom; the score
    // expression (cv[i] - v[i])^2 mirrors the engine's zip_with lambda
    "q_kmeans_assign" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        |pk AS (SELECT e.vec_id,
        |  min(floor(list_sum(list_transform(range(1, 65),
        |        i -> (cv[i] - v[i]) * (cv[i] - v[i]))) * 1048576.0)::BIGINT * 16 + cid) AS pmin
        |  FROM e CROSS JOIN c GROUP BY 1)
        |SELECT (pmin % 16)::BIGINT AS centroid_id, count(*)::BIGINT AS n_vecs,
        |  sum(pmin // 16)::BIGINT AS qd_sum, min(pmin // 16)::BIGINT AS qd_min,
        |  max(pmin // 16)::BIGINT AS qd_max
        |FROM pk GROUP BY 1 ORDER BY 1""".stripMargin,

    // simplified silhouette: the q_kmeans_assign packed keys kept PER
    // (vec, centroid), nearest = min(pk), second-nearest = min(pk) above
    // it (unique keys: the cid low bits differ), then the integer
    // silhouette and the (centroid, decile) fold
    "q_kmeans_silhouette" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        |pk AS (SELECT e.vec_id,
        |  floor(list_sum(list_transform(range(1, 65),
        |      i -> (cv[i] - v[i]) * (cv[i] - v[i]))) * 1048576.0)::BIGINT * 16 + cid AS pk
        |  FROM e CROSS JOIN c),
        |p1 AS (SELECT vec_id, min(pk) AS p1 FROM pk GROUP BY 1),
        |p2 AS (SELECT pk.vec_id, min(pk.pk) AS p2 FROM pk
        |       JOIN p1 ON p1.vec_id = pk.vec_id AND pk.pk > p1.p1 GROUP BY 1),
        |s AS (SELECT p1.vec_id, (p1.p1 % 16) AS centroid_id,
        |        (p1.p1 // 16) AS qa, (p2.p2 // 16) AS qb
        |      FROM p1 JOIN p2 USING (vec_id)),
        |k AS (SELECT vec_id, centroid_id,
        |        ((qb - qa) * 1000) // greatest(qa, qb, 1) AS silq FROM s)
        |SELECT centroid_id::BIGINT AS centroid_id, (silq // 100)::BIGINT AS sil_decile,
        |  count(*)::BIGINT AS n_vecs, sum(vec_id)::BIGINT AS vid_sum,
        |  sum(silq)::BIGINT AS silq_sum, max(silq)::BIGINT AS silq_max
        |FROM k GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // LSH recall audit: BOTH sides recomputed independently — the
    // brute-force exact >= 0.5 pairs and the band replication — then the
    // same left-join rollup
    "q_doc_lsh_recall" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |sh AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
        |       FROM t, unnest(range(1, len(ws) - 1)) AS u(i)),
        |shd AS (SELECT DISTINCT doc_id, s FROM sh),
        |sz AS (SELECT doc_id, count(*) AS c FROM shd GROUP BY 1),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        |          FROM shd a JOIN shd b ON a.s = b.s AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |ex AS (SELECT doc_a, doc_b FROM inter
        |       JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
        |       WHERE (i * 1000) // (sa.c + sb.c - i) >= 500),
        |seeds AS (SELECT unnest(range(0, 16)) AS seed),
        |sigs AS (SELECT doc_id, seed, min(md5(seed::VARCHAR || ':' || s)) AS minhash
        |         FROM sh CROSS JOIN seeds GROUP BY 1, 2),
        |bands AS (SELECT doc_id, (seed // 4)::INT AS band,
        |                 string_agg(lpad(seed::VARCHAR, 2, '0') || ':' || minhash, ',' ORDER BY seed) AS bkey
        |          FROM sigs GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |         FROM bands a JOIN bands b
        |           ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        |j AS (SELECT ex.doc_a, CASE WHEN cand.doc_a IS NOT NULL THEN 1 ELSE 0 END AS hit
        |      FROM ex LEFT JOIN cand USING (doc_a, doc_b))
        |SELECT count(*)::BIGINT AS n_exact, sum(hit)::BIGINT AS n_found,
        |  ((sum(hit) * 1000) // greatest(count(*), 1))::BIGINT AS recall_x1000
        |FROM j""".stripMargin,

    // Lloyd iteration: the q_kmeans_assign float argmin CTEs, the 2^10
    // integer M-step, the all-integer second argmin, and the full-join
    // census rollup
    "q_kmeans_iterate" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        |pk AS (SELECT e.vec_id,
        |  min(floor(list_sum(list_transform(range(1, 65),
        |        i -> (cv[i] - v[i]) * (cv[i] - v[i]))) * 1048576.0)::BIGINT * 16 + cid) AS pmin
        |  FROM e CROSS JOIN c GROUP BY 1),
        |a1 AS (SELECT vec_id, (pmin % 16)::BIGINT AS c1 FROM pk),
        |qd AS (SELECT vec_id, i, floor(v[i] * 1024.0)::BIGINT AS qx
        |       FROM e, unnest(range(1, 65)) AS u(i)),
        |c2 AS (SELECT a1.c1 AS cid, i, (sum(qx) // count(*))::BIGINT AS cq
        |       FROM a1 JOIN qd USING (vec_id) GROUP BY 1, 2),
        |d2 AS (SELECT qd.vec_id, c2.cid, sum((qx - cq) * (qx - cq)) AS d2
        |       FROM qd JOIN c2 USING (i) GROUP BY 1, 2),
        |pk2 AS (SELECT vec_id, min(d2 * 8 + cid) AS pmin FROM d2 GROUP BY 1),
        |a2 AS (SELECT vec_id, (pmin % 8)::BIGINT AS c2v, (pmin // 8)::BIGINT AS qd2 FROM pk2),
        |m AS (SELECT a1.vec_id, c1, c2v, qd2 FROM a1 JOIN a2 USING (vec_id)),
        |b AS (SELECT c1 AS centroid_id, count(*)::BIGINT AS n_before,
        |        sum(CASE WHEN c2v != c1 THEN 1 ELSE 0 END)::BIGINT AS n_moved_out
        |      FROM m GROUP BY 1),
        |a AS (SELECT c2v AS centroid_id, count(*)::BIGINT AS n_after,
        |        sum(qd2)::BIGINT AS qd2_sum FROM m GROUP BY 1)
        |SELECT centroid_id,
        |  coalesce(n_before, 0)::BIGINT AS n_before,
        |  coalesce(n_moved_out, 0)::BIGINT AS n_moved_out,
        |  coalesce(n_after, 0)::BIGINT AS n_after,
        |  coalesce(qd2_sum, 0)::BIGINT AS qd2_sum
        |FROM b FULL JOIN a USING (centroid_id)
        |ORDER BY 1""".stripMargin,

    // PQ: the same packed argmin per (vector, subspace) through 1-based
    // list subscripts over the slice windows; the VALUES frame is the
    // subspace axis
    "q_emb_pq" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        |d AS (SELECT e.vec_id, m.m, c.cid,
        |        floor(list_sum(list_transform(range(1, 17),
        |          i -> (cv[m.m * 16 + i] - v[m.m * 16 + i])
        |             * (cv[m.m * 16 + i] - v[m.m * 16 + i]))) * 1048576.0)::BIGINT AS qd
        |      FROM e CROSS JOIN c CROSS JOIN (VALUES (0), (1), (2), (3)) m(m)),
        |pk AS (SELECT vec_id, m, min(qd * 8 + cid) AS pmin FROM d GROUP BY 1, 2)
        |SELECT m::BIGINT AS subspace, (pmin % 8)::BIGINT AS centroid_id,
        |  count(*)::BIGINT AS n_vecs, sum(pmin // 8)::BIGINT AS qd_sum,
        |  min(pmin // 8)::BIGINT AS qd_min, max(pmin // 8)::BIGINT AS qd_max
        |FROM pk GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // PQ-ADC recall: the q_emb_pq assignment CTEs, the ADC table as the
    // query rows of the same sub-distance frame, both rankings as global
    // row_number windows (vs the engine's broadcast joins + per-query
    // windows)
    "q_ann_pq_recall" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        |d AS (SELECT e.vec_id, m.m, c.cid,
        |        floor(list_sum(list_transform(range(1, 17),
        |          i -> (cv[m.m * 16 + i] - v[m.m * 16 + i])
        |             * (cv[m.m * 16 + i] - v[m.m * 16 + i]))) * 1048576.0)::BIGINT AS qd
        |      FROM e CROSS JOIN c CROSS JOIN (VALUES (0), (1), (2), (3)) m(m)),
        |pk AS (SELECT vec_id, m, min(qd * 8 + cid) AS pmin FROM d GROUP BY 1, 2),
        |codes AS (SELECT vec_id, m, (pmin % 8)::BIGINT AS cid FROM pk),
        |adc AS (SELECT vec_id AS query_id, m, (cid)::BIGINT AS cid, qd FROM d WHERE vec_id < 10),
        |ad AS (SELECT adc.query_id, codes.vec_id, sum(adc.qd) AS adist
        |       FROM codes JOIN adc ON adc.m = codes.m AND adc.cid = codes.cid
        |       WHERE codes.vec_id != adc.query_id GROUP BY 1, 2),
        |apprR AS (SELECT query_id, vec_id,
        |            row_number() OVER (PARTITION BY query_id ORDER BY adist, vec_id) AS rnk
        |          FROM ad),
        |ex AS (SELECT q.vec_id AS query_id, e.vec_id,
        |         floor(list_sum(list_transform(range(1, 65),
        |           i -> (q.v[i] - e.v[i]) * (q.v[i] - e.v[i]))) * 1048576.0)::BIGINT AS qd2
        |       FROM e q JOIN e ON q.vec_id < 10 AND e.vec_id != q.vec_id),
        |exR AS (SELECT query_id, vec_id,
        |          row_number() OVER (PARTITION BY query_id ORDER BY qd2, vec_id) AS rnk
        |        FROM ex),
        |hits AS (SELECT a.query_id, count(*) AS h
        |         FROM apprR a JOIN exR x ON x.query_id = a.query_id AND x.vec_id = a.vec_id
        |         WHERE a.rnk <= 10 AND x.rnk <= 10 GROUP BY 1)
        |SELECT q.vec_id AS query_id, (coalesce(h, 0) * 10)::BIGINT AS recall_x100
        |FROM (SELECT vec_id FROM e WHERE vec_id < 10) q
        |LEFT JOIN hits ON hits.query_id = q.vec_id
        |ORDER BY 1""".stripMargin,

    // post-dedup census: the q_doc_keep_list CTEs verbatim, joined back to
    // the corpus and rolled up per source
    "q_doc_dedup_census" ->
      """WITH RECURSIVE t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |sh AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
        |       FROM t, unnest(range(1, len(ws) - 1)) AS u(i)),
        |seeds AS (SELECT unnest(range(0, 16)) AS seed),
        |sigs AS (SELECT doc_id, seed, min(md5(seed::VARCHAR || ':' || s)) AS minhash
        |         FROM sh CROSS JOIN seeds GROUP BY 1, 2),
        |bands AS (SELECT doc_id, (seed // 4)::INT AS band,
        |                 string_agg(lpad(seed::VARCHAR, 2, '0') || ':' || minhash, ',' ORDER BY seed) AS bkey
        |          FROM sigs GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |         FROM bands a JOIN bands b
        |           ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        |ed AS (SELECT doc_a AS src, doc_b AS dst FROM cand
        |       UNION ALL SELECT doc_b, doc_a FROM cand),
        |reach(node, lbl) AS (
        |  SELECT src, src FROM ed
        |  UNION
        |  SELECT ed.dst, r.lbl FROM reach r JOIN ed ON ed.src = r.node),
        |cc AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY 1),
        |keep AS (SELECT d.doc_id FROM documents d LEFT JOIN cc ON cc.doc_id = d.doc_id
        |         WHERE cc.doc_id IS NULL OR cc.cluster_id = d.doc_id),
        |tk AS (SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT AS n_tokens,
        |              source, doc_id IN (SELECT doc_id FROM keep) AS kept
        |       FROM documents)
        |SELECT source, count(*)::BIGINT AS n_docs,
        |  sum(CASE WHEN kept THEN 1 ELSE 0 END)::BIGINT AS n_kept,
        |  sum(CASE WHEN kept THEN n_tokens ELSE 0 END)::BIGINT AS kept_tokens,
        |  sum(CASE WHEN kept THEN 0 ELSE n_tokens END)::BIGINT AS dropped_tokens
        |FROM tk GROUP BY 1 ORDER BY 1""".stripMargin,

    // the M-step over the same assignment CTEs: per-(centroid, dim)
    // integer sums of per-coordinate quantized values
    "q_kmeans_update" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        |pk AS (SELECT e.vec_id,
        |  min(floor(list_sum(list_transform(range(1, 65),
        |        i -> (cv[i] - v[i]) * (cv[i] - v[i]))) * 1048576.0)::BIGINT * 16 + cid) AS pmin
        |  FROM e CROSS JOIN c GROUP BY 1),
        |asg AS (SELECT vec_id, (pmin % 16)::BIGINT AS centroid_id FROM pk)
        |SELECT a.centroid_id, (i - 1)::BIGINT AS dim, count(*)::BIGINT AS n_vecs,
        |  sum(floor(e.v[i] * 1048576.0)::BIGINT)::BIGINT AS qsum
        |FROM asg a JOIN e USING (vec_id), unnest(range(1, 65)) AS u(i)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the collocation score CTEs are the q_doc_collocations oracle verbatim;
    // the doc-side gather joins each adjacent pair against them
    "q_doc_lm_score" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |u AS (SELECT unnest(ws) AS tok FROM t),
        |c AS (SELECT tok, count(*)::BIGINT AS c FROM u GROUP BY 1),
        |n AS (SELECT count(*)::BIGINT AS n_total FROM u),
        |b0 AS (SELECT ws[i] AS w1, ws[i+1] AS w2
        |       FROM t, unnest(range(1, len(ws))) AS r(i)),
        |bc AS (SELECT w1, w2, count(*)::BIGINT AS n_ab
        |       FROM b0 GROUP BY 1, 2 HAVING count(*) >= 3),
        |sc AS (SELECT w1, w2, ((n_ab * n_total) * 1000000) // (c1.c * c2.c) AS score
        |       FROM bc JOIN c c1 ON bc.w1 = c1.tok JOIN c c2 ON bc.w2 = c2.tok
        |       CROSS JOIN n),
        |dp AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
        |       FROM t, unnest(range(1, len(ws))) AS r(i))
        |SELECT dp.doc_id, count(*)::BIGINT AS n_pairs,
        |  sum(CASE WHEN sc.score IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_scored,
        |  COALESCE(sum(sc.score), 0)::BIGINT AS qscore_sum
        |FROM dp LEFT JOIN sc ON dp.w1 = sc.w1 AND dp.w2 = sc.w2
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // gaps-and-islands: run id = running count of boundary positions — the
    // window formulation of what the engine folds narrowly per row
    "q_doc_token_runs" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |p AS (SELECT doc_id, i,
        |  CASE WHEN i = 1 OR ws[i] != ws[i - 1] THEN 1 ELSE 0 END AS b
        |  FROM t, unnest(range(1, len(ws) + 1)) AS u(i)),
        |r AS (SELECT doc_id, i, sum(b) OVER (PARTITION BY doc_id ORDER BY i) AS run_id FROM p),
        |runs AS (SELECT doc_id, run_id, count(*) AS rl FROM r GROUP BY 1, 2),
        |agg AS (SELECT doc_id, count(*)::BIGINT AS n_runs, max(rl)::BIGINT AS max_run
        |        FROM runs GROUP BY 1)
        |SELECT t.doc_id, len(ws)::BIGINT AS n_tokens, agg.n_runs, agg.max_run
        |FROM t JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin,

    "q_vocab_growth" ->
      """WITH t AS (SELECT ('0x' || substring(md5('shard#' || doc_id::VARCHAR), 1, 15))::BIGINT % 10 AS shard,
        |  unnest(string_split(text, ' ')) AS tok FROM documents),
        |f AS (SELECT tok, min(shard) AS first_shard FROM t GROUP BY 1),
        |p AS (SELECT first_shard AS shard, count(*) AS new_tokens FROM f GROUP BY 1),
        |s AS (SELECT unnest(range(0, 10))::BIGINT AS shard)
        |SELECT s.shard, COALESCE(p.new_tokens, 0)::BIGINT AS new_tokens,
        |  (sum(COALESCE(p.new_tokens, 0)) OVER (ORDER BY s.shard))::BIGINT AS cum_vocab
        |FROM s LEFT JOIN p USING (shard) ORDER BY shard""".stripMargin,

    "q_doc_lang_id" ->
      """WITH t AS (SELECT doc_id, lang AS lang_given,
        |                  regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
        |           FROM documents),
        |m(lang, mk) AS (VALUES
        |  ('de', ['der','und','die','nicht','ein']),
        |  ('en', ['the','and','of','fast','table']),
        |  ('es', ['el','y','los','una','que']),
        |  ('fr', ['le','la','et','des','une']),
        |  ('zh', ['de','shi','le','zai','he'])),
        |s AS (SELECT doc_id, lang_given, m.lang,
        |             len(list_filter(ws, w -> list_contains(m.mk, w))) AS score
        |      FROM t CROSS JOIN m),
        |r AS (SELECT doc_id, lang_given, lang,
        |             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn
        |      FROM s)
        |SELECT doc_id, lang_given, lang AS lang_pred, (lang = lang_given) AS agree
        |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // confusion matrix: the q_doc_lang_id CTEs rolled up per
    // (declared, predicted) pair
    "q_doc_lang_confusion" ->
      """WITH t AS (SELECT doc_id, lang AS lang_given,
        |                  regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
        |           FROM documents),
        |m(lang, mk) AS (VALUES
        |  ('de', ['der','und','die','nicht','ein']),
        |  ('en', ['the','and','of','fast','table']),
        |  ('es', ['el','y','los','una','que']),
        |  ('fr', ['le','la','et','des','une']),
        |  ('zh', ['de','shi','le','zai','he'])),
        |s AS (SELECT doc_id, lang_given, m.lang,
        |             len(list_filter(ws, w -> list_contains(m.mk, w))) AS score
        |      FROM t CROSS JOIN m),
        |r AS (SELECT doc_id, lang_given, lang,
        |             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn
        |      FROM s)
        |SELECT lang_given, lang AS lang_pred, count(*)::BIGINT AS n_docs
        |FROM r WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_ann_ivf_topk" ->
      s"""WITH $ivfCtes
         |SELECT query_id, rank::BIGINT AS rank, neighbor_id
         |FROM apprR WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "q_ann_recall" ->
      s"""WITH $ivfCtes,
         |exactR AS (SELECT q2.query_id, n2.vec_id AS neighbor_id,
         |             row_number() OVER (PARTITION BY q2.query_id ORDER BY
         |               list_sum(list_transform(range(1, 65), i -> qv[i] * n2.v[i])) / (qn * n2.nrm) DESC,
         |               n2.vec_id) AS rank
         |           FROM (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 10) q2
         |           CROSS JOIN n n2 WHERE n2.vec_id != q2.query_id),
         |exact AS (SELECT query_id, neighbor_id FROM exactR WHERE rank <= 10),
         |appr AS (SELECT query_id, neighbor_id FROM apprR WHERE rank <= 10),
         |hits AS (SELECT exact.query_id, count(*) AS h
         |         FROM exact JOIN appr USING (query_id, neighbor_id) GROUP BY 1),
         |k AS (SELECT query_id, count(*) AS k FROM exact GROUP BY 1)
         |SELECT k.query_id AS query_id, ((COALESCE(hits.h, 0) * 100) // k.k)::BIGINT AS recall_x100
         |FROM k LEFT JOIN hits ON hits.query_id = k.query_id
         |ORDER BY k.query_id""".stripMargin,

    "q_doc_exact_dup" ->
      """SELECT md5(text) AS h, count(*)::BIGINT AS n FROM documents
        |GROUP BY 1 HAVING count(*) > 1 ORDER BY h""".stripMargin,

    "q_doc_token_stats" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents)
        |SELECT doc_id, len(ws)::BIGINT AS n_tokens,
        |       len(list_distinct(ws))::BIGINT AS n_distinct,
        |       COALESCE(list_sum(list_transform(ws, w -> length(w))), 0)::BIGINT AS n_token_chars
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_doc_quality" ->
      """WITH t AS (SELECT doc_id, text, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents)
        |SELECT doc_id, length(text)::BIGINT AS n_chars, len(ws)::BIGINT AS n_tokens,
        |       len(regexp_extract_all(text, '[.!?]'))::BIGINT AS n_sentence_punct,
        |       len(regexp_extract_all(text, '[0-9]'))::BIGINT AS n_digits,
        |       (len(list_distinct(ws)) * 1000 // greatest(len(ws), 1))::BIGINT AS ttr_x1000
        |FROM t ORDER BY doc_id""".stripMargin,

    // decontam: the oracle GATHERS 5-grams with explicit index arithmetic —
    // an independent formulation of the engine's transform/slice explode
    "q_doc_decontam" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |g AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4] AS g
        |      FROM t, unnest(range(1, len(ws) - 3)) AS u(i)),
        |ev AS (SELECT DISTINCT g FROM g WHERE doc_id % 7 = 0),
        |tr AS (SELECT doc_id, g FROM g WHERE doc_id % 7 != 0)
        |SELECT doc_id, count(DISTINCT tr.g)::BIGINT AS n_shared, count(*)::BIGINT AS n_hits
        |FROM tr JOIN ev USING (g) GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_doc_minhash" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |sh AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
        |       FROM t, unnest(range(1, len(ws) - 1)) AS u(i)),
        |seeds AS (SELECT unnest(range(0, 16)) AS seed)
        |SELECT doc_id, seed, min(md5(seed::VARCHAR || ':' || s)) AS minhash
        |FROM sh CROSS JOIN seeds GROUP BY 1, 2 ORDER BY doc_id, seed""".stripMargin,

    "q_doc_minhash_pairs" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |sh AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
        |       FROM t, unnest(range(1, len(ws) - 1)) AS u(i)),
        |seeds AS (SELECT unnest(range(0, 16)) AS seed),
        |sigs AS (SELECT doc_id, seed, min(md5(seed::VARCHAR || ':' || s)) AS minhash
        |         FROM sh CROSS JOIN seeds GROUP BY 1, 2),
        |bands AS (SELECT doc_id, (seed // 4)::INT AS band,
        |                 string_agg(lpad(seed::VARCHAR, 2, '0') || ':' || minhash, ',' ORDER BY seed) AS bkey
        |          FROM sigs GROUP BY 1, 2)
        |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        |ORDER BY doc_a, doc_b""".stripMargin,

    // the operator's contract is "MinHash-LSH candidate pairs, exact
    // integer Jaccard, thresholded" — the oracle replicates the SAME
    // banding, so engine and oracle agree bit-for-bit at every scale
    // (the unpruned full self-join is jaccardPairsExact, asserted equal on
    // the high-J near-dup regime in TrainingOpsScaleSpec)
    "q_doc_jaccard_pairs" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |sh AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
        |       FROM t, unnest(range(1, len(ws) - 1)) AS u(i)),
        |seeds AS (SELECT unnest(range(0, 16)) AS seed),
        |sigs AS (SELECT doc_id, seed, min(md5(seed::VARCHAR || ':' || s)) AS minhash
        |         FROM sh CROSS JOIN seeds GROUP BY 1, 2),
        |bands AS (SELECT doc_id, (seed // 4)::INT AS band,
        |                 string_agg(lpad(seed::VARCHAR, 2, '0') || ':' || minhash, ',' ORDER BY seed) AS bkey
        |          FROM sigs GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |         FROM bands a JOIN bands b
        |           ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        |shd AS (SELECT DISTINCT doc_id, s FROM sh),
        |sz AS (SELECT doc_id, count(*) AS c FROM shd GROUP BY 1),
        |inter AS (SELECT doc_a, doc_b, count(*) AS i
        |          FROM cand
        |          JOIN shd a ON a.doc_id = doc_a
        |          JOIN shd b ON b.doc_id = doc_b AND a.s = b.s
        |          GROUP BY 1, 2)
        |SELECT doc_a, doc_b, ((i * 1000) // (sa.c + sb.c - i))::BIGINT AS jaccard_x1000
        |FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
        |WHERE (i * 1000) // (sa.c + sb.c - i) >= 100
        |ORDER BY doc_a, doc_b""".stripMargin,

    // JL distortion: per-coordinate integer quantization, the md5 sign
    // bit recomputed per (j, i) — engine i is 0-based so the oracle keys
    // on (i - 1) — all-integer projections and ratio
    // per-dimension census: the same unnest-with-range gather as q_emb_jl,
    // HUGEINT variance product truncated back to BIGINT
    "q_emb_dimstats" ->
      """WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT (i - 1)::BIGINT AS dim, floor(v[i] * 1024.0)::BIGINT AS q
        |      FROM e, unnest(range(1, 65)) AS u(i)),
        |d AS (SELECT dim, count(*)::BIGINT AS n, sum(q)::BIGINT AS s1,
        |        sum(q * q)::BIGINT AS s2, min(q)::BIGINT AS q_min,
        |        max(q)::BIGINT AS q_max
        |      FROM q GROUP BY 1)
        |SELECT dim, n, s1, s2, q_min, q_max,
        |  ((n::HUGEINT * s2 - s1::HUGEINT * s1) // (n::HUGEINT * n))::BIGINT AS var_q
        |FROM d ORDER BY dim""".stripMargin,

    "q_emb_jl" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT vec_id, i, floor(v[i] * 1024.0)::BIGINT AS q
        |      FROM e, unnest(range(1, 65)) AS u(i)),
        |p AS (SELECT vec_id, j,
        |        sum(CASE WHEN substring(md5(j::VARCHAR || ':' || (i - 1)::VARCHAR), 1, 1)
        |                 IN ('0','1','2','3','4','5','6','7') THEN q ELSE -q END) AS pj
        |      FROM q CROSS JOIN unnest(range(0, 8)) AS t(j) GROUP BY 1, 2),
        |num AS (SELECT vec_id, sum(pj * pj) AS num FROM p GROUP BY 1),
        |n AS (SELECT vec_id, sum(q * q) AS nrm2 FROM q GROUP BY 1),
        |k AS (SELECT num.vec_id, (num.num * 1000) // greatest(8 * n.nrm2, 1) AS rq
        |      FROM num JOIN n USING (vec_id))
        |SELECT (rq // 100)::BIGINT AS rq_bucket, count(*)::BIGINT AS n_vecs,
        |  sum(vec_id)::BIGINT AS vid_sum, sum(rq)::BIGINT AS rq_sum,
        |  min(rq)::BIGINT AS rq_min, max(rq)::BIGINT AS rq_max
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,

    // containment census: the q_doc_jaccard_pairs band/cand CTEs verbatim,
    // then max-containment (i * 1000) // least(sza, szb) and the decile fold
    "q_doc_containment" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |sh AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
        |       FROM t, unnest(range(1, len(ws) - 1)) AS u(i)),
        |seeds AS (SELECT unnest(range(0, 16)) AS seed),
        |sigs AS (SELECT doc_id, seed, min(md5(seed::VARCHAR || ':' || s)) AS minhash
        |         FROM sh CROSS JOIN seeds GROUP BY 1, 2),
        |bands AS (SELECT doc_id, (seed // 4)::INT AS band,
        |                 string_agg(lpad(seed::VARCHAR, 2, '0') || ':' || minhash, ',' ORDER BY seed) AS bkey
        |          FROM sigs GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |         FROM bands a JOIN bands b
        |           ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        |shd AS (SELECT DISTINCT doc_id, s FROM sh),
        |sz AS (SELECT doc_id, count(*) AS c FROM shd GROUP BY 1),
        |inter AS (SELECT doc_a, doc_b, count(*) AS i
        |          FROM cand
        |          JOIN shd a ON a.doc_id = doc_a
        |          JOIN shd b ON b.doc_id = doc_b AND a.s = b.s
        |          GROUP BY 1, 2),
        |k AS (SELECT i, least(sa.c, sb.c) AS lsz,
        |        (i * 1000) // least(sa.c, sb.c) AS cont
        |      FROM inter JOIN sz sa ON sa.doc_id = doc_a
        |      JOIN sz sb ON sb.doc_id = doc_b)
        |SELECT (cont // 100)::BIGINT AS cont_decile, count(*)::BIGINT AS n_pairs,
        |  sum(i)::BIGINT AS inter_sum, sum(lsz)::BIGINT AS lsz_sum,
        |  max(cont)::BIGINT AS cont_max
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,

    // cross-source shingle containment: distinct (source, shingle), the
    // common count by one shingle equi-join, Jaccard AND containment x1e6
    "q_source_containment" ->
      """WITH t AS (SELECT source, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |sh AS (SELECT DISTINCT source, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
        |       FROM t, unnest(range(1, len(ws) - 1)) AS u(i)),
        |sz AS (SELECT source, count(*) AS n FROM sh GROUP BY 1),
        |com AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
        |        FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
        |        GROUP BY 1, 2)
        |SELECT src_a, src_b, n_common::BIGINT AS n_common,
        |  sa.n::BIGINT AS n_a, sb.n::BIGINT AS n_b,
        |  ((n_common * 1000000) // ((sa.n + sb.n) - n_common))::BIGINT AS jac_x1e6,
        |  ((n_common * 1000000) // least(sa.n, sb.n))::BIGINT AS cont_x1e6
        |FROM com JOIN sz sa ON sa.source = src_a JOIN sz sb ON sb.source = src_b
        |ORDER BY src_a, src_b""".stripMargin,

    // similarity inlined as the engine's exact fold (sequential dot product
    // / (norm_a * norm_b), norms as sequential sum-of-squares) — the same
    // idiom ivfCtesFor uses — instead of DuckDB's list_cosine_similarity,
    // whose different fold order could disagree for a pair within 1 ulp of
    // the 0.45 threshold
    "q_emb_near_dup" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v,
        |        sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |WHERE list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i]))
        |        / (a.nrm * b.nrm) > 0.45
        |ORDER BY vec_a, vec_b""".stripMargin,

    "q_doc_winnow" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |sh AS (SELECT doc_id, u.i AS pos, ws[u.i] || ' ' || ws[u.i+1] || ' ' || ws[u.i+2] AS s
        |       FROM t, unnest(range(1, len(ws) - 1)) AS u(i)),
        |h AS (SELECT doc_id, pos, ('0x' || substring(md5(s), 1, 15))::BIGINT AS hv FROM sh),
        |fp AS (SELECT doc_id,
        |              min(hv) OVER (PARTITION BY doc_id ORDER BY pos
        |                            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
        |       FROM h)
        |SELECT doc_id, count(DISTINCT fp)::BIGINT AS n_fps,
        |       min(fp) AS min_fp, max(fp) AS max_fp
        |FROM fp GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "q_doc_simhash" ->
      """WITH t AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok FROM documents),
        |h AS (SELECT doc_id, ('0x' || substring(md5(tok), 1, 15))::BIGINT AS hv FROM t),
        |bits AS (SELECT doc_id, b.b AS b,
        |                sum(CASE WHEN (hv >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
        |         FROM h CROSS JOIN (SELECT unnest(range(0, 60))::INT AS b) b GROUP BY 1, 2)
        |SELECT doc_id, sum(CASE WHEN s > 0 THEN 1::BIGINT << b ELSE 0 END)::BIGINT AS simhash
        |FROM bits GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "q_doc_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    // independent reconstruction of the whole chain: shingles -> minhash ->
    // bands -> candidate pairs -> transitive closure (recursive CTE) ->
    // per-component min id — the engine side reaches the same fixpoint by
    // hash-min label propagation, a different algorithm on the same graph
    // the same candidate construction feeding three unrolled integer
    // message-passing rounds
    "q_doc_pagerank" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |sh AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
        |       FROM t, unnest(range(1, len(ws) - 1)) AS u(i)),
        |seeds AS (SELECT unnest(range(0, 16)) AS seed),
        |sigs AS (SELECT doc_id, seed, min(md5(seed::VARCHAR || ':' || s)) AS minhash
        |         FROM sh CROSS JOIN seeds GROUP BY 1, 2),
        |bands AS (SELECT doc_id, (seed // 4)::INT AS band,
        |                 string_agg(lpad(seed::VARCHAR, 2, '0') || ':' || minhash, ',' ORDER BY seed) AS bkey
        |          FROM sigs GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |         FROM bands a JOIN bands b
        |           ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        |e AS (SELECT doc_a AS src, doc_b AS dst FROM cand
        |      UNION ALL SELECT doc_b, doc_a FROM cand),
        |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
        |p0 AS (SELECT src AS doc_id, deg, 1000000::BIGINT AS pr FROM deg),
        |m1 AS (SELECT e.dst AS doc_id, sum(p0.pr // p0.deg) AS msum
        |       FROM e JOIN p0 ON p0.doc_id = e.src GROUP BY 1),
        |p1 AS (SELECT d.src AS doc_id, d.deg,
        |         (150000 + 85 * coalesce(m1.msum, 0) // 100)::BIGINT AS pr
        |       FROM deg d LEFT JOIN m1 ON m1.doc_id = d.src),
        |m2 AS (SELECT e.dst AS doc_id, sum(p1.pr // p1.deg) AS msum
        |       FROM e JOIN p1 ON p1.doc_id = e.src GROUP BY 1),
        |p2 AS (SELECT d.src AS doc_id, d.deg,
        |         (150000 + 85 * coalesce(m2.msum, 0) // 100)::BIGINT AS pr
        |       FROM deg d LEFT JOIN m2 ON m2.doc_id = d.src),
        |m3 AS (SELECT e.dst AS doc_id, sum(p2.pr // p2.deg) AS msum
        |       FROM e JOIN p2 ON p2.doc_id = e.src GROUP BY 1),
        |p3 AS (SELECT d.src AS doc_id, d.deg,
        |         (150000 + 85 * coalesce(m3.msum, 0) // 100)::BIGINT AS pr
        |       FROM deg d LEFT JOIN m3 ON m3.doc_id = d.src)
        |SELECT doc_id, deg::BIGINT AS deg, pr FROM p3 ORDER BY 1""".stripMargin,

    // k-core: the same peeling rounds unrolled as HAVING >= 2 CTEs over
    // the shared candidate construction (gathered keep-sets vs the
    // engine's semi-joins)
    "q_doc_kcore" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |sh AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
        |       FROM t, unnest(range(1, len(ws) - 1)) AS u(i)),
        |seeds AS (SELECT unnest(range(0, 16)) AS seed),
        |sigs AS (SELECT doc_id, seed, min(md5(seed::VARCHAR || ':' || s)) AS minhash
        |         FROM sh CROSS JOIN seeds GROUP BY 1, 2),
        |bands AS (SELECT doc_id, (seed // 4)::INT AS band,
        |                 string_agg(lpad(seed::VARCHAR, 2, '0') || ':' || minhash, ',' ORDER BY seed) AS bkey
        |          FROM sigs GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |         FROM bands a JOIN bands b
        |           ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        |e0 AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM cand
        |      UNION ALL SELECT doc_b, doc_a FROM cand),
        |k0 AS (SELECT src FROM e0 GROUP BY src HAVING count(*) >= 2),
        |e1 AS MATERIALIZED (SELECT e.src, e.dst FROM e0 e
        |      JOIN k0 a ON a.src = e.src JOIN k0 b ON b.src = e.dst),
        |k1 AS (SELECT src FROM e1 GROUP BY src HAVING count(*) >= 2),
        |e2 AS MATERIALIZED (SELECT e.src, e.dst FROM e1 e
        |      JOIN k1 a ON a.src = e.src JOIN k1 b ON b.src = e.dst),
        |k2 AS (SELECT src FROM e2 GROUP BY src HAVING count(*) >= 2),
        |e3 AS MATERIALIZED (SELECT e.src, e.dst FROM e2 e
        |      JOIN k2 a ON a.src = e.src JOIN k2 b ON b.src = e.dst)
        |SELECT 0::BIGINT AS round, count(DISTINCT src)::BIGINT AS n_nodes,
        |  (count(*) // 2)::BIGINT AS n_edges FROM e0
        |UNION ALL SELECT 1::BIGINT, count(DISTINCT src)::BIGINT, (count(*) // 2)::BIGINT FROM e1
        |UNION ALL SELECT 2::BIGINT, count(DISTINCT src)::BIGINT, (count(*) // 2)::BIGINT FROM e2
        |UNION ALL SELECT 3::BIGINT, count(DISTINCT src)::BIGINT, (count(*) // 2)::BIGINT FROM e3
        |ORDER BY round""".stripMargin,

    // triangles: the brute three-way a < b < c join over the same cand
    // construction — the independent quadratic formulation of the
    // engine's degree-ordered oriented wedges
    "q_doc_triangles" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |sh AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
        |       FROM t, unnest(range(1, len(ws) - 1)) AS u(i)),
        |seeds AS (SELECT unnest(range(0, 16)) AS seed),
        |sigs AS (SELECT doc_id, seed, min(md5(seed::VARCHAR || ':' || s)) AS minhash
        |         FROM sh CROSS JOIN seeds GROUP BY 1, 2),
        |bands AS (SELECT doc_id, (seed // 4)::INT AS band,
        |                 string_agg(lpad(seed::VARCHAR, 2, '0') || ':' || minhash, ',' ORDER BY seed) AS bkey
        |          FROM sigs GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |         FROM bands a JOIN bands b
        |           ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        |e AS (SELECT doc_a AS src, doc_b AS dst FROM cand
        |      UNION ALL SELECT doc_b, doc_a FROM cand),
        |deg AS (SELECT src AS doc_id, count(*)::BIGINT AS deg FROM e GROUP BY 1),
        |tri AS (SELECT ab.doc_a AS a, ab.doc_b AS b, bc.doc_b AS c
        |        FROM cand ab JOIN cand bc ON bc.doc_a = ab.doc_b
        |        JOIN cand ac ON ac.doc_a = ab.doc_a AND ac.doc_b = bc.doc_b),
        |corner AS (SELECT a AS doc_id FROM tri UNION ALL SELECT b FROM tri
        |           UNION ALL SELECT c FROM tri),
        |tc AS (SELECT doc_id, count(*)::BIGINT AS n_tri FROM corner GROUP BY 1)
        |SELECT d.doc_id, d.deg, coalesce(tc.n_tri, 0)::BIGINT AS n_tri,
        |  (CASE WHEN d.deg < 2 THEN 0
        |        ELSE (2 * coalesce(tc.n_tri, 0) * 1000000) // (d.deg * (d.deg - 1))
        |   END)::BIGINT AS cc_x1e6
        |FROM deg d LEFT JOIN tc USING (doc_id) ORDER BY doc_id""".stripMargin,

    // novelty: the same distinct-shingle construction, first occurrence by
    // min(doc_id), counted per doc — the gather formulation
    "q_doc_novelty" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
        |       FROM t, unnest(range(1, len(ws) - 1)) AS u(i)),
        |f AS (SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY 1)
        |SELECT sh.doc_id, count(*)::BIGINT AS n_shingles,
        |  sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END)::BIGINT AS n_novel,
        |  ((sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) * 1000)
        |    // count(*))::BIGINT AS novelty_x1000
        |FROM sh JOIN f USING (s) GROUP BY 1 ORDER BY 1""".stripMargin,

    // assortativity: endpoint degrees joined along the same cand edge
    // list, the square-root-free symmetric Pearson ratio in HUGEINT
    "q_doc_assort" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |sh AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
        |       FROM t, unnest(range(1, len(ws) - 1)) AS u(i)),
        |seeds AS (SELECT unnest(range(0, 16)) AS seed),
        |sigs AS (SELECT doc_id, seed, min(md5(seed::VARCHAR || ':' || s)) AS minhash
        |         FROM sh CROSS JOIN seeds GROUP BY 1, 2),
        |bands AS (SELECT doc_id, (seed // 4)::INT AS band,
        |                 string_agg(lpad(seed::VARCHAR, 2, '0') || ':' || minhash, ',' ORDER BY seed) AS bkey
        |          FROM sigs GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |         FROM bands a JOIN bands b
        |           ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        |e AS (SELECT doc_a AS src, doc_b AS dst FROM cand
        |      UNION ALL SELECT doc_b, doc_a FROM cand),
        |deg AS (SELECT src AS doc_id, count(*)::BIGINT AS deg FROM e GROUP BY 1),
        |j AS (SELECT du.deg AS du, dv.deg AS dv FROM e
        |      JOIN deg du ON du.doc_id = e.src JOIN deg dv ON dv.doc_id = e.dst),
        |a AS (SELECT count(*)::BIGINT AS m, sum(du) AS sx, sum(du * du) AS sxx,
        |             sum(du * dv) AS sxy FROM j)
        |SELECT m AS n_edges, sx::BIGINT AS deg_sum,
        |  (((m * sxy - sx * sx) * 1000000) // (m * sxx - sx * sx))::BIGINT AS assort_x1e6
        |FROM a""".stripMargin,

    "q_doc_dup_clusters" ->
      """WITH RECURSIVE t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |sh AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
        |       FROM t, unnest(range(1, len(ws) - 1)) AS u(i)),
        |seeds AS (SELECT unnest(range(0, 16)) AS seed),
        |sigs AS (SELECT doc_id, seed, min(md5(seed::VARCHAR || ':' || s)) AS minhash
        |         FROM sh CROSS JOIN seeds GROUP BY 1, 2),
        |bands AS (SELECT doc_id, (seed // 4)::INT AS band,
        |                 string_agg(lpad(seed::VARCHAR, 2, '0') || ':' || minhash, ',' ORDER BY seed) AS bkey
        |          FROM sigs GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |         FROM bands a JOIN bands b
        |           ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        |e AS (SELECT doc_a AS src, doc_b AS dst FROM cand
        |      UNION ALL SELECT doc_b, doc_a FROM cand),
        |reach(node, lbl) AS (
        |  SELECT src, src FROM e
        |  UNION
        |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node),
        |cc AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY 1),
        |sz AS (SELECT cluster_id, count(*)::BIGINT AS csize FROM cc GROUP BY 1)
        |SELECT cc.doc_id, cc.cluster_id, sz.csize
        |FROM cc JOIN sz USING (cluster_id) ORDER BY doc_id""".stripMargin,

    // neighbour LCP: the direct global formulation — lead over ORDER BY
    // (text, doc_id), LCP as minimum first-mismatch position (vs the
    // engine's bucketed windows and agreeing-prefix count)
    "q_doc_lcp" ->
      """WITH p AS (SELECT doc_id, text,
        |        lead(doc_id) OVER (ORDER BY text, doc_id) AS next_doc,
        |        lead(text) OVER (ORDER BY text, doc_id) AS nt
        |      FROM documents),
        |q AS (SELECT doc_id, next_doc, text AS a, nt AS b FROM p
        |      WHERE next_doc IS NOT NULL),
        |mm AS (SELECT q.doc_id, q.next_doc,
        |         min(CASE WHEN u.i > len(q.a) OR u.i > len(q.b)
        |                   OR substr(q.a, u.i::INT, 1) <> substr(q.b, u.i::INT, 1)
        |              THEN u.i END) AS fm
        |       FROM q, unnest(range(1, 66)) AS u(i) GROUP BY 1, 2)
        |SELECT doc_id, next_doc, least(coalesce(fm, 66) - 1, 64)::BIGINT AS lcp64
        |FROM mm ORDER BY doc_id""".stripMargin,

    // cluster source mix: the same recursive-CTE hash-min CC as
    // q_doc_dup_clusters, joined to sources and concentrated via the
    // exact Simpson pair count
    "q_cluster_mix" ->
      """WITH RECURSIVE t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |sh AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
        |       FROM t, unnest(range(1, len(ws) - 1)) AS u(i)),
        |seeds AS (SELECT unnest(range(0, 16)) AS seed),
        |sigs AS (SELECT doc_id, seed, min(md5(seed::VARCHAR || ':' || s)) AS minhash
        |         FROM sh CROSS JOIN seeds GROUP BY 1, 2),
        |bands AS (SELECT doc_id, (seed // 4)::INT AS band,
        |                 string_agg(lpad(seed::VARCHAR, 2, '0') || ':' || minhash, ',' ORDER BY seed) AS bkey
        |          FROM sigs GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |         FROM bands a JOIN bands b
        |           ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        |e AS (SELECT doc_a AS src, doc_b AS dst FROM cand
        |      UNION ALL SELECT doc_b, doc_a FROM cand),
        |reach(node, lbl) AS (
        |  SELECT src, src FROM e
        |  UNION
        |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node),
        |cc AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY 1),
        |m AS (SELECT cc.cluster_id, d.source, count(*)::BIGINT AS ns
        |      FROM cc JOIN documents d USING (doc_id) GROUP BY 1, 2)
        |SELECT cluster_id, sum(ns)::BIGINT AS n_docs, count(*)::BIGINT AS n_sources,
        |  ((sum(ns * (ns - 1)) * 1000000)
        |    // (sum(ns) * (sum(ns) - 1)))::BIGINT AS same_src_x1e6
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,

    // RAKE keyphrase: the same stopword-delimited segmentation rebuilt
    // positionally in SQL — segments via a running stopword count, word
    // degree/freq, phrase score as the per-occurrence sum, the top
    // phrase via row_number over (score DESC, phrase) vs the engine's
    // struct-min fold
    "q_doc_keyphrase" ->
      """WITH tk AS (SELECT doc_id, u.i AS pos, ws[u.i] AS tok
        |            FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
        |                  FROM documents) t,
        |            unnest(range(1, len(ws) + 1)) AS u(i)),
        |g AS (SELECT doc_id, pos, tok,
        |        tok IN ('the', 'of', 'and', 'to', 'in', 'a', 'is', 'that',
        |                'it', 'for', 'on', 'as', 'with', 'was', 'at', 'by',
        |                'an', 'be', 'this', 'are') AS stop
        |      FROM tk),
        |sg AS (SELECT doc_id, pos, tok, stop,
        |         sum(CASE WHEN stop THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY doc_id ORDER BY pos) AS seg
        |       FROM g),
        |w AS (SELECT doc_id, seg, pos, tok,
        |        count(*) OVER (PARTITION BY doc_id, seg) AS plen
        |      FROM sg WHERE NOT stop),
        |wsc AS (SELECT doc_id, tok,
        |          (sum(plen) * 1000000) // count(*) AS wscore
        |        FROM w GROUP BY 1, 2),
        |ph AS (SELECT w.doc_id, w.seg,
        |         string_agg(w.tok, ' ' ORDER BY w.pos) AS phrase,
        |         count(*)::BIGINT AS plen,
        |         sum(wsc.wscore)::BIGINT AS score
        |       FROM w JOIN wsc ON wsc.doc_id = w.doc_id AND wsc.tok = w.tok
        |       GROUP BY 1, 2),
        |r AS (SELECT doc_id, phrase, plen, score,
        |        row_number() OVER (PARTITION BY doc_id
        |                           ORDER BY score DESC, phrase) AS rn,
        |        count(*) OVER (PARTITION BY doc_id) AS np
        |      FROM ph)
        |SELECT doc_id, np::BIGINT AS n_phrases, phrase,
        |  plen AS phrase_len, score AS score_x1e6
        |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "q_doc_stopwords" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents)
        |SELECT doc_id, len(ws)::BIGINT AS n_tokens,
        |       len(list_filter(ws, t -> t IN ('the', 'of', 'and', 'to', 'in', 'a', 'is',
        |         'that', 'it', 'for', 'on', 'as', 'with', 'was', 'at', 'by', 'an', 'be',
        |         'this', 'are')))::BIGINT AS n_stop,
        |       ((len(list_filter(ws, t -> t IN ('the', 'of', 'and', 'to', 'in', 'a', 'is',
        |         'that', 'it', 'for', 'on', 'as', 'with', 'was', 'at', 'by', 'an', 'be',
        |         'this', 'are'))) * 1000) // greatest(len(ws), 1))::BIGINT AS stop_x1000
        |FROM t ORDER BY doc_id""".stripMargin,

    // Bloom membership: bits / probes rebuilt relationally; the
    // bloom-positive predicate is the same "no position missing"
    // formulation via NOT EXISTS over the miss set
    "q_doc_bloom" ->
      """WITH t0 AS (SELECT doc_id, source,
        |              unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        |            FROM documents),
        |ev AS (SELECT DISTINCT tok FROM t0 WHERE doc_id % 7 = 0),
        |bits AS (SELECT DISTINCT p FROM (
        |  SELECT ('0x' || substring(md5('bloom0#' || tok), 1, 15))::BIGINT % 4096 AS p FROM ev
        |  UNION SELECT ('0x' || substring(md5('bloom1#' || tok), 1, 15))::BIGINT % 4096 FROM ev
        |  UNION SELECT ('0x' || substring(md5('bloom2#' || tok), 1, 15))::BIGINT % 4096 FROM ev)),
        |tr AS (SELECT DISTINCT source, tok FROM t0 WHERE doc_id % 7 <> 0),
        |pp AS (SELECT source, tok, unnest([
        |         ('0x' || substring(md5('bloom0#' || tok), 1, 15))::BIGINT % 4096,
        |         ('0x' || substring(md5('bloom1#' || tok), 1, 15))::BIGINT % 4096,
        |         ('0x' || substring(md5('bloom2#' || tok), 1, 15))::BIGINT % 4096]) AS p
        |       FROM tr),
        |miss AS (SELECT DISTINCT source, tok FROM pp
        |         WHERE p NOT IN (SELECT p FROM bits))
        |SELECT tr.source, count(*)::BIGINT AS n_tokens,
        |  count(*) FILTER (WHERE NOT EXISTS (SELECT 1 FROM miss m
        |    WHERE m.source = tr.source AND m.tok = tr.tok))::BIGINT AS n_bloom_hits,
        |  count(*) FILTER (WHERE tok IN (SELECT tok FROM ev))::BIGINT AS n_true_hits,
        |  (count(*) FILTER (WHERE NOT EXISTS (SELECT 1 FROM miss m
        |     WHERE m.source = tr.source AND m.tok = tr.tok))
        |   - count(*) FILTER (WHERE tok IN (SELECT tok FROM ev)))::BIGINT AS n_false_pos
        |FROM tr GROUP BY 1 ORDER BY 1""".stripMargin,

    // Simpson diversity: the same (source, token) count frame folded per
    // source; DuckDB sums into HUGEINT, so every product stays exact and
    // only the final BIGINT casts cross the compare
    "q_doc_simpson" ->
      """WITH t AS (SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        |            FROM documents),
        |c AS (SELECT source, tok, count(*)::BIGINT AS n FROM t GROUP BY 1, 2)
        |SELECT source, sum(n)::BIGINT AS n_tokens, count(*)::BIGINT AS n_types,
        |  sum(n * (n - 1))::BIGINT AS num,
        |  ((sum(n * (n - 1)) * 1000000) // (sum(n) * (sum(n) - 1)))::BIGINT AS simpson_x1e6
        |FROM c GROUP BY source ORDER BY source""".stripMargin,

    // KMV sketch: the k-th smallest is located by a per-source row_number
    // over the distinct hash set — the independent (window) formulation of
    // the engine's bounded O(k) aggregator fold
    "q_doc_kmv" ->
      """WITH t0 AS (SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        |            FROM documents),
        |h AS (SELECT DISTINCT source,
        |        ('0x' || substring(md5('kmv#' || tok), 1, 15))::BIGINT AS hv
        |      FROM t0),
        |r AS (SELECT source, hv,
        |        row_number() OVER (PARTITION BY source ORDER BY hv) AS rk,
        |        count(*) OVER (PARTITION BY source) AS n
        |      FROM h)
        |SELECT source, n::BIGINT AS n_exact, hv::BIGINT AS kth_hv,
        |  ((7 * 1152921504606846976) // hv)::BIGINT AS kmv_est
        |FROM r WHERE rk = 8 AND n >= 8 ORDER BY source""".stripMargin,

    "q_source_overlap" ->
      """WITH t0 AS (SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        |            FROM documents),
        |t AS (SELECT DISTINCT source, tok FROM t0),
        |n AS (SELECT source, count(*)::BIGINT AS n FROM t GROUP BY 1),
        |p AS (SELECT a.source AS src_a, b.source AS src_b, count(*)::BIGINT AS n_common
        |      FROM t a JOIN t b ON b.tok = a.tok AND a.source < b.source
        |      GROUP BY 1, 2)
        |SELECT p.src_a, p.src_b, p.n_common, na.n AS n_a, nb.n AS n_b,
        |  ((p.n_common * 1000000) // ((na.n + nb.n) - p.n_common))::BIGINT AS jac_x1e6
        |FROM p JOIN n na ON na.source = p.src_a JOIN n nb ON nb.source = p.src_b
        |ORDER BY 1, 2""".stripMargin,

    "q_doc_quality_gate" ->
      """WITH t AS (SELECT doc_id, source, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |s AS (SELECT source, len(ws)::BIGINT AS n_tokens,
        |        ((len(list_filter(ws, t -> t IN ('the', 'of', 'and', 'to', 'in', 'a', 'is',
        |          'that', 'it', 'for', 'on', 'as', 'with', 'was', 'at', 'by', 'an', 'be',
        |          'this', 'are'))) * 1000) // greatest(len(ws), 1))::BIGINT AS stop_x1000,
        |        CASE WHEN len(ws) < 3 THEN []::VARCHAR[]
        |             ELSE list_transform(range(1, len(ws) - 1),
        |                    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) END AS sh
        |      FROM t),
        |v AS (SELECT source, n_tokens,
        |        CASE WHEN n_tokens < 20 THEN 'too_short'
        |             WHEN stop_x1000 < 60 THEN 'low_stopword'
        |             WHEN (((len(sh) - len(list_distinct(sh))) * 1000)
        |                     // greatest(len(sh), 1)) > 20 THEN 'repetitive'
        |             ELSE 'keep' END AS verdict
        |      FROM s)
        |SELECT source, verdict, count(*)::BIGINT AS n_docs,
        |       sum(n_tokens)::BIGINT AS tok_sum
        |FROM v GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_doc_rep_ngrams" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |s AS (SELECT doc_id,
        |        CASE WHEN len(ws) < 3 THEN []::VARCHAR[]
        |             ELSE list_transform(range(1, len(ws) - 1),
        |                    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) END AS sh
        |      FROM t)
        |SELECT doc_id, len(sh)::BIGINT AS n_shingles,
        |       len(list_distinct(sh))::BIGINT AS n_distinct,
        |       (((len(sh) - len(list_distinct(sh))) * 1000) // greatest(len(sh), 1))::BIGINT AS rep_x1000
        |FROM s ORDER BY doc_id""".stripMargin,

    "q_doc_chunks" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |n AS (SELECT doc_id, ws, len(ws)::BIGINT AS n FROM t WHERE len(ws) > 0),
        |c AS (SELECT doc_id, ws,
        |             CASE WHEN n <= 50 THEN 1 ELSE 1 + (n - 50 + 39) // 40 END AS nch
        |      FROM n),
        |e AS (SELECT doc_id, ws, unnest(range(0, nch)) AS chunk_idx FROM c),
        |s AS (SELECT doc_id, chunk_idx::BIGINT AS chunk_idx,
        |             ws[(chunk_idx * 40 + 1):(chunk_idx * 40 + 50)] AS chunk
        |      FROM e)
        |SELECT doc_id, chunk_idx, len(chunk)::BIGINT AS n_tokens,
        |       md5(array_to_string(chunk, ' ')) AS fp
        |FROM s ORDER BY doc_id, chunk_idx""".stripMargin,

    "q_doc_char_terms" ->
      """WITH t AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        |           FROM documents),
        |tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf FROM t GROUP BY 1, 2),
        |df AS (SELECT tok, count(*)::BIGINT AS df FROM tf GROUP BY 1),
        |s AS (SELECT tf.doc_id, tf.tok, tf.tf, df.df,
        |             ((tf.tf * 1000000) // df.df)::BIGINT AS score
        |      FROM tf JOIN df USING (tok)),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS rank
        |      FROM s)
        |SELECT doc_id, rank::BIGINT AS rank, tok, tf, df, score
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    // BM25: the same cleared-fraction fixed point (k1 = 6/5, b = 3/4 ->
    // core = 22*tf*S / (10*tf*S + 3*S + 9*dl*N)) in HUGEINT, candidates
    // gathered by the IN-list filter, rank per probe term
    "q_doc_bm25" ->
      """WITH base AS MATERIALIZED (SELECT doc_id,
        |    regexp_extract_all(lower(text), '[a-z0-9]+', 0) AS tk FROM documents),
        |dl AS (SELECT doc_id, len(tk)::BIGINT AS dl FROM base),
        |tot AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS s_tokens FROM dl),
        |tf AS (SELECT tok AS term, doc_id, count(*)::BIGINT AS tf
        |       FROM (SELECT doc_id, unnest(tk) AS tok FROM base)
        |       WHERE tok IN ('spark', 'join', 'merge', 'vector', 'window')
        |       GROUP BY 1, 2),
        |dfq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
        |sc AS (SELECT t.term, t.doc_id, t.tf, dl.dl, dfq.df,
        |         ((22::HUGEINT * t.tf * tot.s_tokens * 1000000)
        |          // (10::HUGEINT * t.tf * tot.s_tokens + 3::HUGEINT * tot.s_tokens
        |              + 9::HUGEINT * dl.dl * tot.n_docs))::BIGINT AS core_x1e6,
        |         (((2 * (tot.n_docs - dfq.df) + 1) * 1000000) // (2 * dfq.df + 1))::BIGINT AS idf_x1e6
        |       FROM tf t JOIN dl USING (doc_id) JOIN dfq USING (term) CROSS JOIN tot),
        |rk AS (SELECT *, ((core_x1e6::HUGEINT * idf_x1e6) // 1000000)::BIGINT AS score,
        |         row_number() OVER (PARTITION BY term
        |           ORDER BY ((core_x1e6::HUGEINT * idf_x1e6) // 1000000) DESC, doc_id) AS rnk
        |       FROM sc)
        |SELECT term, rnk::BIGINT AS rank, doc_id, tf, dl, df, core_x1e6, idf_x1e6, score
        |FROM rk WHERE rnk <= 5 ORDER BY term, rnk""".stripMargin,

    // chi-square keywords: the same 2x2 contingency in HUGEINT, with the
    // oracle's denominator in the CLOSED marginal form (c+d = N - df_t,
    // b+d = N - n_s) vs the engine's cellwise sums — algebraically equal,
    // independently derived
    "q_doc_chi_terms" ->
      """WITH pres AS (SELECT DISTINCT source, doc_id, tok
        |  FROM (SELECT source, doc_id,
        |          unnest(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS tok
        |        FROM documents)),
        |a AS (SELECT source, tok, count(*)::BIGINT AS a FROM pres GROUP BY 1, 2),
        |dft AS (SELECT tok, sum(a)::BIGINT AS df_t FROM a GROUP BY 1),
        |ns AS (SELECT source, count(*)::BIGINT AS n_s FROM documents GROUP BY 1),
        |nn AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
        |sc AS (SELECT a.source, a.tok, a.a, dft.df_t,
        |         ((nn.n_docs::HUGEINT
        |           * (a.a::HUGEINT * (nn.n_docs - dft.df_t - ns.n_s + a.a)
        |              - (dft.df_t - a.a)::HUGEINT * (ns.n_s - a.a))
        |           * (a.a::HUGEINT * (nn.n_docs - dft.df_t - ns.n_s + a.a)
        |              - (dft.df_t - a.a)::HUGEINT * (ns.n_s - a.a))
        |           * 1000000)
        |          // (dft.df_t::HUGEINT * (nn.n_docs - dft.df_t)
        |              * ns.n_s * (nn.n_docs - ns.n_s)))::BIGINT AS chi2_x1e6
        |       FROM a JOIN dft USING (tok) JOIN ns USING (source) CROSS JOIN nn
        |       WHERE a.a >= 3 AND dft.df_t < nn.n_docs),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY source
        |         ORDER BY chi2_x1e6 DESC, tok) AS rnk FROM sc)
        |SELECT source, rnk::BIGINT AS rank, tok, a, df_t, chi2_x1e6
        |FROM rk WHERE rnk <= 3 ORDER BY source, rnk""".stripMargin,

    // Same two-stage count-of-counts; DuckDB's unnest path vs the engine's
    // explode is the only (cosmetic) difference.
    // Per-doc corpus-hapax shingle census: independent 1-based index
    // gather of the 3-shingles (ws[i] || ws[i+1] || ws[i+2] vs the
    // engine's transform/slice scatter), then tf -> corpus counts ->
    // hapax join -> per-doc rollup -> decile fold, stage for stage
    "q_doc_hapax" ->
      """WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
        |           FROM documents),
        |s AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
        |      FROM w, unnest(range(1, greatest(len(ws) - 1, 1))) AS t(i)),
        |tf AS (SELECT doc_id, sh, count(*)::BIGINT AS c FROM s GROUP BY 1, 2),
        |hap AS (SELECT sh FROM tf GROUP BY sh HAVING sum(c) = 1),
        |pd AS (SELECT tf.doc_id, count(*)::BIGINT AS n_hapax
        |       FROM tf JOIN hap USING (sh) GROUP BY 1),
        |nt AS (SELECT doc_id, greatest(len(ws) - 2, 0)::BIGINT AS n_sh FROM w),
        |a AS (SELECT nt.doc_id, nt.n_sh, COALESCE(pd.n_hapax, 0)::BIGINT AS n_hapax
        |      FROM nt LEFT JOIN pd USING (doc_id)),
        |b AS (SELECT doc_id, n_sh, n_hapax,
        |        CASE WHEN n_sh = 0 THEN 11 ELSE (n_hapax * 10) // n_sh END AS decile
        |      FROM a)
        |SELECT decile::BIGINT AS decile, count(*)::BIGINT AS n_docs,
        |  sum(doc_id)::BIGINT AS doc_sum, sum(n_hapax)::BIGINT AS hapax_sum,
        |  sum(n_sh)::BIGINT AS sh_sum
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_doc_token_spectrum" ->
      """WITH t AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        |           FROM documents),
        |c AS (SELECT tok, count(*)::BIGINT AS freq FROM t GROUP BY 1)
        |SELECT freq, count(*)::BIGINT AS n_types
        |FROM c GROUP BY 1 ORDER BY freq""".stripMargin,

    // Independent bigram gather: explicit ws[i]/ws[i+1] index arithmetic vs
    // the engine's transform/element_at scatter; the score expression tree
    // mirrors token for token (all-integer, so only the div order matters).
    "q_doc_collocations" ->
      """WITH t AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |u AS (SELECT unnest(ws) AS tok FROM t),
        |c AS (SELECT tok, count(*)::BIGINT AS c FROM u GROUP BY 1),
        |n AS (SELECT count(*)::BIGINT AS n_total FROM u),
        |b AS (SELECT ws[i] AS w1, ws[i+1] AS w2
        |      FROM t, unnest(range(1, len(ws))) AS r(i)),
        |bc AS (SELECT w1, w2, count(*)::BIGINT AS n_ab
        |       FROM b GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT w1, w2, n_ab, c1.c AS c1, c2.c AS c2,
        |       ((n_ab * n_total) * 1000000) // (c1.c * c2.c) AS score
        |FROM bc JOIN c c1 ON bc.w1 = c1.tok JOIN c c2 ON bc.w2 = c2.tok
        |CROSS JOIN n ORDER BY score DESC, w1, w2""".stripMargin,

    "q_doc_top_terms" ->
      """WITH t AS (SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        |           FROM documents),
        |c AS (SELECT source, tok, count(*)::BIGINT AS n FROM t GROUP BY 1, 2),
        |r AS (SELECT source, tok, n,
        |             row_number() OVER (PARTITION BY source ORDER BY n DESC, tok) AS rank
        |      FROM c)
        |SELECT source, rank::BIGINT AS rank, tok, n
        |FROM r WHERE rank <= 10 ORDER BY source, rank""".stripMargin,

    // sentence census: regexp_split on the same punctuation class, the
    // shared tokenizer per fragment, zero-token fragments drop
    "q_doc_sentences" ->
      """WITH s AS (SELECT doc_id, unnest(regexp_split_to_array(text, '[.!?]+')) AS sent
        |           FROM documents),
        |w AS (SELECT doc_id,
        |        len(regexp_extract_all(lower(sent), '[a-z0-9]+'))::BIGINT AS wps
        |      FROM s),
        |k AS (SELECT doc_id, wps FROM w WHERE wps >= 1)
        |SELECT (length(bin(wps)) - 1)::BIGINT AS wps_bucket,
        |  count(*)::BIGINT AS n_sentences, sum(wps)::BIGINT AS tok_sum,
        |  sum(doc_id)::BIGINT AS doc_sum, max(wps)::BIGINT AS wps_max
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,

    // token burstiness: per-type tf/df from the same token explosion,
    // excess-digit-count bucket fold
    "q_doc_burstiness" ->
      """WITH t AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        |           FROM documents),
        |c AS (SELECT doc_id, tok, count(*)::BIGINT AS c FROM t GROUP BY 1, 2),
        |f AS (SELECT tok, sum(c) AS tf, count(*)::BIGINT AS df FROM c GROUP BY 1),
        |k AS (SELECT (tf * 1000) // df AS b, tf, df FROM f)
        |SELECT (length(bin(b - 999)) - 1)::BIGINT AS b_bucket,
        |  count(*)::BIGINT AS n_tokens, sum(tf)::BIGINT AS tf_sum,
        |  sum(df)::BIGINT AS df_sum, max(b)::BIGINT AS b_max
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,

    // Zipf rank-mass: vocab rollup, deterministic (c DESC, tok) ranking,
    // digit-count rank fold
    "q_doc_zipf" ->
      """WITH t AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        |           FROM documents),
        |c AS (SELECT tok, count(*)::BIGINT AS c FROM t GROUP BY 1),
        |r AS (SELECT c, row_number() OVER (ORDER BY c DESC, tok ASC) AS rank FROM c)
        |SELECT (length(bin(rank)) - 1)::BIGINT AS rank_bucket,
        |  count(*)::BIGINT AS n_types, sum(c)::BIGINT AS mass,
        |  max(c)::BIGINT AS c_max, min(c)::BIGINT AS c_min
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    // MATTR: the same stride-25 window enumeration via range, list_slice
    // (1-based inclusive = Spark's slice(start, 50)), list_distinct
    "q_doc_mattr" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
        |           FROM documents),
        |d AS (SELECT doc_id, len(ws)::BIGINT AS n, ws FROM t WHERE len(ws) >= 50),
        |w AS (SELECT doc_id, ws, unnest(range(0, (n - 50) // 25 + 1)) AS w FROM d),
        |k AS (SELECT doc_id,
        |        len(list_distinct(list_slice(ws, (25 * w + 1)::INT,
        |            (25 * w + 50)::INT)))::BIGINT * 20 AS ttr
        |      FROM w)
        |SELECT (ttr // 100)::BIGINT AS ttr_decile, count(*)::BIGINT AS n_windows,
        |  sum(doc_id)::BIGINT AS doc_sum, min(ttr)::BIGINT AS ttr_min,
        |  max(ttr)::BIGINT AS ttr_max, sum(ttr)::BIGINT AS ttr_sum
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,

    // readability: the sentence filter as a list lambda, vowel-run
    // syllable proxy, positive-only divisions (// == div), CASE bands
    "q_doc_readability" ->
      """WITH d AS (SELECT doc_id,
        |    len(list_filter(regexp_split_to_array(text, '[.!?]+'),
        |        s -> regexp_matches(lower(s), '[a-z0-9]')))::BIGINT AS s_cnt,
        |    len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT AS w,
        |    len(regexp_extract_all(lower(text), '[aeiou]+'))::BIGINT AS syl
        |  FROM documents),
        |k AS (SELECT doc_id, w, s_cnt, syl,
        |        206835 - (1015 * w) // s_cnt - (84600 * syl) // w AS fre_m
        |      FROM d WHERE w >= 1 AND s_cnt >= 1)
        |SELECT CASE WHEN fre_m >= 90000 THEN 5 WHEN fre_m >= 70000 THEN 4
        |            WHEN fre_m >= 50000 THEN 3 WHEN fre_m >= 30000 THEN 2
        |            WHEN fre_m >= 0 THEN 1 ELSE 0 END::BIGINT AS band,
        |  count(*)::BIGINT AS n_docs, min(fre_m)::BIGINT AS fre_min,
        |  max(fre_m)::BIGINT AS fre_max, sum(w)::BIGINT AS w_sum,
        |  sum(s_cnt)::BIGINT AS s_sum, sum(syl)::BIGINT AS syl_sum
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,

    // Yule's K: the burstiness (doc, token) rollup folded per doc,
    // exact rational, digit-count bucket on yk + 1
    "q_doc_yule" ->
      """WITH t AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        |           FROM documents),
        |c AS (SELECT doc_id, tok, count(*)::BIGINT AS c FROM t GROUP BY 1, 2),
        |d AS (SELECT doc_id, sum(c)::BIGINT AS n, sum(c*c)::BIGINT AS s2 FROM c GROUP BY 1),
        |k AS (SELECT (10000 * (s2 - n)) // (n * n) AS yk, n, s2 FROM d WHERE n >= 2)
        |SELECT (length(bin(yk + 1)) - 1)::BIGINT AS yk_bucket,
        |  count(*)::BIGINT AS n_docs, min(yk)::BIGINT AS yk_min,
        |  max(yk)::BIGINT AS yk_max, sum(n)::BIGINT AS n_sum,
        |  sum(s2)::BIGINT AS s2_sum
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,

    // head coverage: the same per-source rank CTE as q_doc_top_terms,
    // summed against the occurrence totals
    "q_doc_head_cov" ->
      """WITH t AS (SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        |           FROM documents),
        |c AS (SELECT source, tok, count(*)::BIGINT AS n FROM t GROUP BY 1, 2),
        |r AS (SELECT source, n,
        |             row_number() OVER (PARTITION BY source ORDER BY n DESC, tok) AS rank
        |      FROM c),
        |hd AS (SELECT source, count(*)::BIGINT AS n_head_terms, sum(n) AS head_n
        |       FROM r WHERE rank <= 10 GROUP BY 1),
        |tot AS (SELECT source, count(*)::BIGINT AS n_tokens FROM t GROUP BY 1)
        |SELECT tot.source, tot.n_tokens, hd.n_head_terms, hd.head_n::BIGINT AS head_n,
        |  ((hd.head_n * 1000) // tot.n_tokens)::BIGINT AS head_x1000
        |FROM tot JOIN hd USING (source) ORDER BY source""".stripMargin,

    // separation matrix: the same centroid/within sums via the 1-based
    // subscript unnest (vs the engine's 0-based posexplode — the index is
    // an internal join key on both sides, never compared)
    "q_emb_separation" ->
      """WITH e AS (SELECT vec_id, label::BIGINT AS label, embedding::DOUBLE[] AS v FROM embeddings),
        |d AS (SELECT vec_id, label, i, floor(v[i] * 1024.0)::BIGINT AS q
        |      FROM e, unnest(range(1, len(v) + 1)) AS u(i)),
        |c AS (SELECT label, i, (sum(q) // count(*))::BIGINT AS c, count(*)::BIGINT AS n
        |      FROM d GROUP BY 1, 2),
        |m AS (SELECT a.label AS la, b.label AS lb,
        |        sum((a.c - b.c) * (a.c - b.c))::BIGINT AS d2
        |      FROM c a JOIN c b ON a.i = b.i AND a.label < b.label GROUP BY 1, 2),
        |w AS (SELECT d.label AS la, d.label AS lb,
        |        (sum((d.q - c.c) * (d.q - c.c)) // max(c.n))::BIGINT AS d2
        |      FROM d JOIN c ON c.label = d.label AND c.i = d.i GROUP BY 1, 2)
        |SELECT la AS label_a, lb AS label_b, d2 FROM m
        |UNION ALL SELECT la AS label_a, lb AS label_b, d2 FROM w
        |ORDER BY 1, 2""".stripMargin,

    // label-pair Hamming matrix: the same 16 seeded planes as exact f64
    // literals, the same sign fold, and the same per-bit count
    // decomposition — but through DuckDB's 1-based list subscripts and
    // HUGEINT arithmetic collapsing to the engine's decimal-checked
    // BIGINTs
    "q_emb_hamming" -> {
      val planesSql = HammingPlanes.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
      val bitCols = (0 until HammingBits)
        .map(b => s"sum((code >> $b) & 1) AS c$b").mkString(", ")
      val intra = (0 until HammingBits)
        .map(k => s"(a.c$k * (a.n - a.c$k))").mkString(" + ")
      val inter = (0 until HammingBits)
        .map(k => s"(a.c$k * (b.n - b.c$k) + (a.n - a.c$k) * b.c$k)").mkString(" + ")
      s"""WITH e AS (SELECT label::BIGINT AS label, embedding::DOUBLE[] AS v FROM embeddings),
         |p AS (SELECT $planesSql::DOUBLE[][] AS ps),
         |n AS (SELECT label,
         |        list_sum(list_transform(range(1, ${HammingBits + 1}), i ->
         |          CASE WHEN list_sum(list_transform(range(1, 65), j -> ps[i][j] * v[j])) >= 0.0
         |               THEN (1 << ($HammingBits - i)) ELSE 0 END))::BIGINT AS code
         |      FROM e CROSS JOIN p),
         |lc AS (SELECT label, count(*)::BIGINT AS n, $bitCols FROM n GROUP BY 1),
         |pr AS (SELECT a.label AS label_a, b.label AS label_b,
         |         CASE WHEN a.label = b.label THEN (a.n * (a.n - 1)) // 2
         |              ELSE a.n * b.n END AS n_pairs,
         |         CASE WHEN a.label = b.label THEN $intra
         |              ELSE $inter END AS ham_sum
         |       FROM lc a JOIN lc b ON a.label <= b.label)
         |SELECT label_a, label_b, n_pairs::BIGINT AS n_pairs, ham_sum::BIGINT AS ham_sum,
         |  ((ham_sum * 1000) // greatest(n_pairs, 1))::BIGINT AS mean_hx1000
         |FROM pr ORDER BY 1, 2""".stripMargin
    },

    // setsim: the independent BRUTE-FORCE formulation — the full shingle
    // self-join with no prefix filter at all, so an engine prefix that
    // drops any qualifying pair hash-mismatches here
    "q_doc_setsim" ->
      s"""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
         |sh AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
         |       FROM t, unnest(range(1, len(ws) - 1)) AS u(i)),
         |shd AS (SELECT DISTINCT doc_id, s FROM sh),
         |sz AS (SELECT doc_id, count(*) AS c FROM shd GROUP BY 1),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
         |          FROM shd a JOIN shd b ON a.s = b.s AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT doc_a, doc_b, ((i * 1000) // (sa.c + sb.c - i))::BIGINT AS jaccard_x1000
         |FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
         |WHERE (i * 1000) // (sa.c + sb.c - i) >= $SetSimThreshX1000
         |ORDER BY doc_a, doc_b""".stripMargin,

    // embedding energy: the same quantize-then-square fold as a DuckDB
    // list_transform over the double-cast vectors
    "q_emb_energy" ->
      """WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
        |s AS (SELECT label,
        |        list_sum(list_transform(v,
        |          x -> floor(x * 1024.0)::BIGINT * floor(x * 1024.0)::BIGINT)) AS e
        |      FROM e)
        |SELECT label, count(*)::BIGINT AS n_vecs, sum(e)::BIGINT AS e_sum,
        |  min(e)::BIGINT AS e_min, max(e)::BIGINT AS e_max
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_doc_source_stats" ->
      """SELECT CASE WHEN GROUPING(source) = 1 THEN '(all)' ELSE source END AS source,
        |       CASE WHEN GROUPING(lang) = 1 THEN '(all)' ELSE lang END AS lang,
        |       count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS sum_chars,
        |       min(doc_id) AS min_doc
        |FROM documents GROUP BY ROLLUP(source, lang)
        |ORDER BY 1, 2""".stripMargin,

    "q_doc_stratified_sample" ->
      """WITH b AS (SELECT doc_id, lang,
        |                  ('0x' || substring(md5('sample#' || doc_id::VARCHAR), 1, 15))::BIGINT % 100 AS bucket
        |           FROM documents)
        |SELECT doc_id, lang, bucket FROM b
        |WHERE bucket < CASE lang WHEN 'en' THEN 20 WHEN 'de' THEN 50 WHEN 'es' THEN 50
        |                         WHEN 'fr' THEN 50 WHEN 'zh' THEN 50 ELSE 0 END
        |ORDER BY doc_id""".stripMargin,

    "q_ann_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
        |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 10),
        |s AS (SELECT q.query_id, n.vec_id AS neighbor_id,
        |             list_sum(list_transform(range(1, 65), i -> qv[i] * v[i])) / (qn * nrm) AS sim
        |      FROM q CROSS JOIN n WHERE n.vec_id != q.query_id),
        |r AS (SELECT query_id, neighbor_id,
        |             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
        |      FROM s)
        |SELECT query_id, rank, neighbor_id FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  )
}
