package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Exact in-memory recomputes for the text-prep operators added in round
  * 4: chunking, stopword ratio, repeated-n-gram fraction, top/char terms
  * — all over the same tokenizer contract (lowercased [a-z0-9]+ runs,
  * which java.util.regex and DuckDB RE2 agree on for this simple class).
  */
class TrainingOpsTextSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def docsLocal(): Seq[(Long, String)] = {
    import spark.implicits._
    spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "text").as[(Long, String)].collect().toSeq
  }

  private def toks(text: String): Array[String] =
    "[a-z0-9]+".r.findAllIn(text.toLowerCase).toArray

  test("novelty == local first-occurrence recompute (distinct shingles, min doc_id)") {
    val ds = docsLocal()
    val docShingles = ds.map { case (id, text) =>
      val ts = toks(text)
      (id, ts.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet)
    }.filter(_._2.nonEmpty)
    val firstDoc = docShingles.flatMap { case (id, ss) => ss.map(s => (s, id)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expected = docShingles.map { case (id, ss) =>
      val novel = ss.count(s => firstDoc(s) == id).toLong
      (id, ss.size.toLong, novel, novel * 1000L / ss.size)
    }.sortBy(_._1)
    val got = TrainingOps.novelty(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // the curve must bend: a fully-novel doc and a partially-stale doc
    assert(expected.exists(_._4 == 1000L), "a fully novel doc must exist")
    assert(expected.exists(_._4 < 1000L), "a doc with repeated content must exist")
  }

  test("assortativity == local BigInt recompute over the LSH pairs") {
    val pairs = TrainingOps.minhashDupPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val m = BigInt(edges.size)
    val sx = edges.map(e => BigInt(deg(e._1))).sum
    val sxx = edges.map(e => BigInt(deg(e._1)) * deg(e._1)).sum
    val sxy = edges.map(e => BigInt(deg(e._1)) * deg(e._2)).sum
    val num = m * sxy - sx * sx
    val den = m * sxx - sx * sx
    assert(den != 0, "test graph must not be degree-regular")
    val want = (edges.size.toLong, sx.toLong, (num * 1000000 / den).toLong)
    val got = TrainingOps.assortativity(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(want))
  }

  test("containmentCensus == local set recompute over the LSH pairs") {
    val ds = docsLocal()
    val sets = ds.map { case (id, text) =>
      id -> toks(text).sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }.toMap
    val pairs = TrainingOps.minhashDupPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.nonEmpty, "the corpus must produce LSH candidates")
    val perPair = pairs.map { case (a, b) =>
      val sa = sets(a); val sb = sets(b)
      val i = (sa & sb).size.toLong
      val lsz = math.min(sa.size, sb.size).toLong
      (i, lsz, i * 1000L / lsz)
    }
    val want = perPair.groupBy(_._3 / 100L).toSeq.map { case (d, ps) =>
      (d, ps.size.toLong, ps.map(_._1).sum, ps.map(_._2).sum, ps.map(_._3).max)
    }.sortBy(_._1)
    val got = TrainingOps.containmentCensus(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want)
    // exact duplicates exist in this corpus -> a containment-1000 pair
    assert(want.exists(_._5 == 1000L), "a fully contained pair must exist")
  }

  test("containmentOf pins deciles 0/3/10 on a crafted excerpt corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cont-adv").toString
    def words(p: String, n: Int) = (0 until n).map(i => s"$p$i").mkString(" ")
    val docs = Seq[(Long, String)](
      (1L, words("w", 100)),                       // 98 shingles
      (2L, words("w", 10)),                        // 8 shingles, all inside doc 1
      (3L, words("w", 5) + " " + words("x", 5)),   // 8 shingles, 3 inside doc 1
      (4L, words("y", 10))                         // 8 shingles, disjoint
    )
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val cand = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("doc_a", "doc_b")
    val got = TrainingOps.containmentOf(spark, cand, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    // full excerpt -> 1000 (decile 10); partial overlap 3/8 -> 375
    // (decile 3); the disjoint pair DROPS at the intersect join (an LSH
    // candidate with zero shared shingles cannot exist in the wired op)
    assert(got == Seq((3L, 1L, 3L, 8L, 375L), (10L, 1L, 8L, 8L, 1000L)))
  }

  test("sourceContainment == local distinct-shingle set algebra per source pair") {
    import spark.implicits._
    val bySource = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("source", "text").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.flatMap { case (_, t) =>
        toks(t).sliding(3).filter(_.length == 3).map(_.mkString(" "))
      }.toSet).toMap
    val srcs = bySource.keys.toSeq.sorted
    val want = (for {
      i <- srcs.indices; j <- i + 1 until srcs.size
      (a, b) = (srcs(i), srcs(j))
      common = (bySource(a) & bySource(b)).size.toLong if common > 0
    } yield {
      val na = bySource(a).size.toLong; val nb = bySource(b).size.toLong
      (a, b, common, na, nb, common * 1000000L / (na + nb - common),
        common * 1000000L / math.min(na, nb))
    }).sortBy(r => (r._1, r._2))
    val got = TrainingOps.sourceContainment(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == want)
    assert(want.nonEmpty, "sources must share some phrasing")
    assert(want.forall(r => r._7 >= r._6),
      "containment dominates Jaccard by construction")
  }

  test("tokenBurstiness == local tf/df recompute") {
    val ds = docsLocal()
    val perType = ds.flatMap { case (id, text) =>
      toks(text).groupBy(identity).map { case (tok, occ) => (tok, id, occ.length.toLong) }
    }.groupBy(_._1).toSeq.map { case (_, rows) =>
      val tf = rows.map(_._3).sum
      val df = rows.length.toLong
      (tf, df, tf * 1000L / df)
    }
    val want = perType
      .groupBy(t => java.lang.Long.toBinaryString(t._3 - 999L).length.toLong - 1L)
      .toSeq.map { case (b, ts) =>
        (b, ts.size.toLong, ts.map(_._1).sum, ts.map(_._2).sum, ts.map(_._3).max)
      }.sortBy(_._1)
    val got = TrainingOps.tokenBurstiness(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want)
    // the synthetic corpus has a tiny vocabulary where every type
    // repeats within some doc (no b = 1000 types exist in the data) —
    // guard for spread and clumping instead of sprinkled types
    assert(want.map(_._1).distinct.size > 1, "buckets must spread")
    assert(perType.exists(_._3 >= 2000L), "bursty types must exist")
  }

  test("sentenceCensus == local split + tokenize recompute") {
    val ds = docsLocal()
    val sents = ds.flatMap { case (id, text) =>
      text.split("[.!?]+", -1).map(s => (id, toks(s).length.toLong))
    }.filter(_._2 >= 1L)
    val want = sents
      .groupBy(s => java.lang.Long.toBinaryString(s._2).length.toLong - 1L)
      .toSeq.map { case (b, ss) =>
        (b, ss.size.toLong, ss.map(_._2).sum, ss.map(_._1).sum, ss.map(_._2).max)
      }.sortBy(_._1)
    val got = TrainingOps.sentenceCensus(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want)
    assert(want.size > 1, "sentence lengths must spread across buckets")
  }

  test("zipfRanks == local sorted rank-mass recompute") {
    val counts = docsLocal().flatMap { case (_, t) => toks(t) }
      .groupBy(identity).map { case (tok, os) => (tok, os.length.toLong) }
    val ranked = counts.toSeq.sortBy { case (tok, c) => (-c, tok) }
      .zipWithIndex.map { case ((_, c), i) => (i + 1L, c) }
    val want = ranked
      .groupBy(r => java.lang.Long.toBinaryString(r._1).length.toLong - 1L)
      .toSeq.map { case (b, rs) =>
        (b, rs.size.toLong, rs.map(_._2).sum, rs.map(_._2).max, rs.map(_._2).min)
      }.sortBy(_._1)
    val got = TrainingOps.zipfRanks(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want)
    // rank-bucket structure: bucket 0 is exactly rank 1 (the modal type,
    // carrying the global max count), and per-bucket count ceilings are
    // non-increasing down the ranks
    assert(want.head._1 == 0L && want.head._2 == 1L && want.size > 1)
    assert(want.head._4 == counts.values.max)
    assert(want.map(_._4) == want.map(_._4).sorted.reverse, "c_max monotone")
  }

  test("mattr == local stride-25 window recompute") {
    val ds = docsLocal()
    val wins = ds.flatMap { case (id, text) =>
      val ts = toks(text)
      if (ts.length < 50) Seq.empty
      else (0 to (ts.length - 50) / 25).map { w =>
        (id, ts.slice(25 * w, 25 * w + 50).distinct.length.toLong * 20L)
      }
    }
    val want = wins.groupBy(_._2 / 100L).toSeq.map { case (b, ws) =>
      (b, ws.size.toLong, ws.map(_._1).sum, ws.map(_._2).min,
        ws.map(_._2).max, ws.map(_._2).sum)
    }.sortBy(_._1)
    val got = TrainingOps.mattr(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    assert(wins.nonEmpty, "complete windows must exist")
    assert(want.map(_._1).distinct.size >= 1)
    // local diversity must genuinely vary across windows
    assert(wins.map(_._2).distinct.size > 1, "window TTRs must spread")
  }

  test("readability == local Flesch milli-score recompute") {
    val ds = docsLocal()
    val scored = ds.map { case (_, text) =>
      val sCnt = text.split("[.!?]+", -1)
        .count(s => toks(s).nonEmpty).toLong
      val w = toks(text).length.toLong
      val syl = "[aeiou]+".r.findAllIn(text.toLowerCase).length.toLong
      (sCnt, w, syl)
    }.filter(t => t._2 >= 1L && t._1 >= 1L)
    val want = scored.map { case (s, w, syl) =>
      val fre = 206835L - (1015L * w) / s - (84600L * syl) / w
      val band =
        if (fre >= 90000L) 5L else if (fre >= 70000L) 4L
        else if (fre >= 50000L) 3L else if (fre >= 30000L) 2L
        else if (fre >= 0L) 1L else 0L
      (band, fre, w, s, syl)
    }.groupBy(_._1).toSeq.map { case (b, rs) =>
      (b, rs.size.toLong, rs.map(_._2).min, rs.map(_._2).max,
        rs.map(_._3).sum, rs.map(_._4).sum, rs.map(_._5).sum)
    }.sortBy(_._1)
    val got = TrainingOps.readability(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == want)
    // positive-only divisions: fre_m itself may dip negative, but the
    // two truncating divs must never see a negative operand
    assert(scored.forall(t => t._1 >= 1L && t._2 >= 1L))
  }

  test("yuleK == local token-spectrum recompute") {
    val ds = docsLocal()
    val perDoc = ds.map { case (_, text) =>
      val counts = toks(text).groupBy(identity).map(_._2.length.toLong)
      (counts.sum, counts.map(c => c * c).sum)
    }.filter(_._1 >= 2L)
    val want = perDoc.map { case (n, s2) =>
      (10000L * (s2 - n) / (n * n), n, s2)
    }.groupBy(t => java.lang.Long.toBinaryString(t._1 + 1L).length.toLong - 1L)
      .toSeq.map { case (b, rs) =>
        (b, rs.size.toLong, rs.map(_._1).min, rs.map(_._1).max,
          rs.map(_._2).sum, rs.map(_._3).sum)
      }.sortBy(_._1)
    val got = TrainingOps.yuleK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    // K = 0 iff every token in the doc is distinct; the synthetic
    // corpus repeats words, so repeat-rate mass must exist
    assert(perDoc.exists(t => t._2 > t._1), "repeating docs must exist")
    assert(want.nonEmpty)
  }

  private def lcpLocal(ds: Seq[(Long, String)]): Seq[(Long, Long, Long)] = {
    val sorted = ds.sortBy { case (id, t) => (t, id) }
    sorted.zip(sorted.tail).map { case ((id, a), (nid, b)) =>
      val lim = math.min(64, math.min(a.length, b.length))
      var i = 0
      while (i < lim && a(i) == b(i)) i += 1
      (id, nid, i.toLong)
    }.sortBy(_._1)
  }

  test("lcpNeighbors == local sorted-successor recompute on the corpus") {
    val got = TrainingOps.lcpNeighbors(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == lcpLocal(docsLocal()))
    assert(got.exists(_._3 > 0L), "some shared prefix must exist")
  }

  test("lcpNeighbors handles bucket boundaries, equal texts, empties and the 64 cap") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lcp-adv").toString
    val docs = Seq[(Long, String)](
      (1L, ""),                        // empty text, sorts first
      (2L, "ab"),                      // shorter than the bucket key
      (3L, "abcdXXX"), (4L, "abceYYY"), // cross-bucket pair sharing 3 chars
      (5L, "dup"), (6L, "dup"),        // equal texts -> lcp = len, not cap
      (7L, "p" * 100 + "A"), (8L, "p" * 100 + "B"), // same bucket, cap at 64
      (9L, "zzz")                      // lexicographic max: omitted
    )
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = TrainingOps.lcpNeighbors(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == lcpLocal(docs))
    val byDoc = got.map(r => r._1 -> (r._2, r._3)).toMap
    assert(byDoc(3L) == (4L, 3L), "cross-bucket pair must report its true 3-char prefix")
    assert(byDoc(5L) == (6L, 3L), "equal short texts report their length, not the cap")
    assert(byDoc(7L) == (8L, 64L), "long shared prefixes cap at 64")
    assert(!byDoc.contains(9L), "the corpus maximum has no successor")
  }

  test("lcpNeighbors adversarial skew: 95% of docs share one 4-char prefix; " +
    "plan range-partitions the sort instead of hashing prefix buckets") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lcp-skew").toString
    // template-heavy corpus: 190 of 200 docs share the prefix "tmpl" — the
    // former substring(text, 1, 4) bucketing would funnel them into ONE
    // window partition (the verdict's skewed-key full-shuffle finding)
    val docs = (1L to 190L).map(i => (i, f"tmplate page $i%04d body")) ++
      (191L to 200L).map(i => (i, f"v$i%04d unique"))
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = TrainingOps.lcpNeighbors(spark, dir)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == lcpLocal(docs))
    // plan contract: the sort is realized by sampled RANGE partitioning on
    // (text, doc_id) — balanced under any prefix concentration — with no
    // hash partitioning on a text-prefix bucket anywhere
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"),
      s"expected a range repartition of (text, doc_id) in:\n$plan")
    assert(!plan.contains("substring(text, 1, 4)"),
      "prefix-bucket hashing must be gone — it collapses template corpora " +
        "into one hot window partition")
  }

  private def levenshtein(a: String, b: String): Int = {
    val prev = Array.tabulate(b.length + 1)(identity)
    val cur = new Array[Int](b.length + 1)
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length)
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
          prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      Array.copy(cur, 0, prev, 0, cur.length)
    }
    prev(b.length)
  }

  test("editNeighbors == local DP Levenshtein over the sorted successors (64-char cap)") {
    val sorted = docsLocal().sortBy { case (id, t) => (t, id) }
    val want = sorted.zip(sorted.tail).map { case ((id, a), (nid, b)) =>
      (id, nid, levenshtein(a.take(64), b.take(64)).toLong)
    }.sortBy(_._1)
    val got = TrainingOps.editNeighbors(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(got.exists(_._3 > 0L), "distinct neighbors must cost at least one edit")
    assert(got.map(_._3).max > 1L, "some neighbor pair must differ by more than one edit")
  }

  test("editNeighbors adversarial: equal texts, empties, cap, first-char divergence") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("edit-adv").toString
    val docs = Seq[(Long, String)](
      (1L, ""), (2L, "a"),                       // empty -> one insert
      (3L, "dup"), (4L, "dup"),                  // equal -> 0 edits
      (5L, "p" * 100 + "A"), (6L, "p" * 100 + "B"), // beyond-cap difference invisible
      (7L, "xabcdefg"), (8L, "yabcdefg")         // first-char divergence = 1 edit
    )
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = TrainingOps.editNeighbors(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == (2L, 1L))
    assert(got(3L) == (4L, 0L))
    assert(got(5L) == (6L, 0L), "a difference past the 64-char cap must be invisible")
    assert(got(7L) == (8L, 1L), "LCP 0 but edit distance 1 — the case LCP alone misses")
  }

  test("sourceTv == local union-of-supports total-variation recompute") {
    import spark.implicits._
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("source", "text").as[(String, String)].collect().toSeq
    val counts = rows.flatMap { case (s, t) => toks(t).map(s -> _) }
      .groupBy(identity).map { case ((s, tk), xs) => (s, tk) -> BigInt(xs.size) }
    val totals = counts.groupBy(_._1._1).map { case (s, xs) => s -> xs.values.sum }
    val srcs = totals.keys.toSeq.sorted
    val vocab = counts.keys.map(_._2).toSet
    val want = (for {
      i <- srcs.indices; j <- (i + 1) until srcs.size
      (s1, s2) = (srcs(i), srcs(j))
      (n1, n2) = (totals(s1), totals(s2))
    } yield {
      val num = vocab.toSeq.map { tk =>
        val c1 = counts.getOrElse((s1, tk), BigInt(0))
        val c2 = counts.getOrElse((s2, tk), BigInt(0))
        (c1 * n2 - c2 * n1).abs
      }.sum
      (s1, s2, n1.toLong, n2.toLong, (num * 1000000 / (2 * n1 * n2)).toLong)
    }).sortBy(r => (r._1, r._2))
    val got = TrainingOps.sourceTv(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == want)
    assert(got.forall(r => r._5 > 0L && r._5 < 1000000L),
      "distinct same-generator sources must land strictly inside (0, 1)")
    assert(got.size == srcs.size * (srcs.size - 1) / 2, "every source pair must surface")
  }

  test("headCoverage == local top-10 mass recompute") {
    import spark.implicits._
    val bySrc = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("source", "text").as[(String, String)].collect()
      .groupBy(_._1)
    val expected = bySrc.toSeq.map { case (src, ds) =>
      val counts = ds.flatMap(d => toks(d._2)).groupBy(identity)
        .view.mapValues(_.size.toLong).toSeq
      val total = counts.map(_._2).sum
      val head = counts.sortBy { case (tok, n) => (-n, tok) }.take(10)
      (src, total, head.size.toLong, head.map(_._2).sum,
        head.map(_._2).sum * 1000L / total)
    }.sortBy(_._1)
    val got = TrainingOps.headCoverage(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    assert(expected.forall(r => r._5 > 0L && r._5 < 1000L))
  }

  test("embEnergy == local quantize-then-square recompute") {
    import spark.implicits._
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("label", "embedding").as[(Int, Seq[Float])].collect()
    val expected = vecs.groupBy(_._1).toSeq.map { case (lbl, vs) =>
      val es = vs.map(_._2.map { x =>
        val q = math.floor(x.toDouble * 1024.0).toLong; q * q
      }.sum)
      (lbl, es.size.toLong, es.sum, es.min, es.max)
    }.sortBy(_._1)
    val got = TrainingOps.embEnergy(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    assert(expected.exists(r => r._4 != r._5), "energies must vary within a label")
  }

  test("chunkDocs == local sliding-window recompute (size 50, stride 40)") {
    val want = docsLocal().flatMap { case (id, text) =>
      val ws = toks(text)
      val n = ws.length
      if (n == 0) Nil
      else {
        val nch = if (n <= 50) 1 else 1 + (n - 50 + 39) / 40
        (0 until nch).map { i =>
          val chunk = ws.slice(i * 40, i * 40 + 50)
          (id, i.toLong, chunk.length.toLong,
            java.security.MessageDigest.getInstance("MD5")
              .digest(chunk.mkString(" ").getBytes("UTF-8"))
              .map("%02x".format(_)).mkString)
        }
      }
    }.sortBy(r => (r._1, r._2))
    val got = TrainingOps.chunkDocs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got == want)
    assert(want.exists(_._2 > 0)) // multi-chunk docs exist
    // overlap contract: consecutive chunks of one doc share 10 tokens
    assert(want.groupBy(_._1).values.exists(_.length > 1))
  }

  test("stopwordStats and repNgramStats == local recomputes") {
    val stop = Set("the", "of", "and", "to", "in", "a", "is", "that", "it",
      "for", "on", "as", "with", "was", "at", "by", "an", "be", "this", "are")
    val docs = docsLocal()
    val wantStop = docs.map { case (id, text) =>
      val ws = toks(text)
      val ns = ws.count(stop)
      (id, ws.length.toLong, ns.toLong, ns.toLong * 1000 / math.max(ws.length, 1))
    }.sortBy(_._1)
    val gotStop = TrainingOps.stopwordStats(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(gotStop == wantStop)
    assert(wantStop.exists(_._3 > 0))

    val wantRep = docs.map { case (id, text) =>
      val ws = toks(text)
      val sh = if (ws.length < 3) Array.empty[String]
        else (0 to ws.length - 3).map(i => s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}").toArray
      val d = sh.distinct.length
      (id, sh.length.toLong, d.toLong,
        (sh.length - d).toLong * 1000 / math.max(sh.length, 1))
    }.sortBy(_._1)
    val gotRep = TrainingOps.repNgramStats(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(gotRep == wantRep)
  }

  test("topTerms and charTerms == local recomputes (deterministic tie-breaks)") {
    import spark.implicits._
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "source", "text").as[(Long, String, String)].collect()
    // top-10 per source by (count DESC, token ASC)
    val wantTop = rows.groupBy(_._2).flatMap { case (src, ds) =>
      val counts = ds.flatMap(d => toks(d._3)).groupBy(identity)
        .map { case (t, xs) => (t, xs.length.toLong) }.toSeq
      counts.sortBy { case (t, n) => (-n, t) }.take(10).zipWithIndex
        .map { case ((t, n), i) => (src, i + 1L, t, n) }
    }.toSeq.sortBy(r => (r._1, r._2))
    val gotTop = TrainingOps.topTerms(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq
    assert(gotTop == wantTop)

    // top-3 per doc by (score DESC, token ASC), score = tf*1e6 div df
    val tfAll = rows.map(d => (d._1, toks(d._3).groupBy(identity)
      .map { case (t, xs) => (t, xs.length.toLong) }))
    val df = tfAll.flatMap(_._2.keys).groupBy(identity)
      .map { case (t, xs) => (t, xs.length.toLong) }
    val wantChar = tfAll.flatMap { case (id, tf) =>
      tf.toSeq.map { case (t, n) => (t, n, df(t), n * 1000000L / df(t)) }
        .sortBy { case (t, _, _, s) => (-s, t) }.take(3).zipWithIndex
        .map { case ((t, n, d, s), i) => (id, i + 1L, t, n, d, s) }
    }.toSeq.sortBy(r => (r._1, r._2))
    val gotChar = TrainingOps.charTerms(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(gotChar == wantChar)
  }

  test("sourceOverlap == local exact-Jaccard recompute; quality gate verdicts sane") {
    import spark.implicits._
    val bySource = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("source", "text").as[(String, String)].collect()
      .groupBy(_._1).map { case (s, ds) => s -> ds.flatMap(d => toks(d._2)).toSet }
    val srcs = bySource.keys.toSeq.sorted
    val want = (for {
      i <- srcs.indices; j <- i + 1 until srcs.length
      a = bySource(srcs(i)); b = bySource(srcs(j))
      common = (a intersect b).size if common > 0
    } yield (srcs(i), srcs(j), common.toLong, a.size.toLong, b.size.toLong,
      common.toLong * 1000000L / (a.size + b.size - common))).toSet
    val got = TrainingOps.sourceOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want)
    assert(want.nonEmpty && want.exists(_._6 < 1000000L),
      "some pair must overlap partially")
    val verdicts = TrainingOps.qualityGate(spark, sf).collect()
      .map(_.getString(1)).toSet
    assert(verdicts.contains("keep") && verdicts.size >= 2,
      s"gate must split the corpus: $verdicts")
  }

  test("docHapax == local corpus-hapax shingle decile recompute") {
    val ds = docsLocal()
    def shingles(text: String): Seq[String] =
      toks(text).sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq
    val corpus = scala.collection.mutable.Map.empty[String, Long]
    ds.foreach { case (_, text) =>
      shingles(text).foreach(s => corpus(s) = corpus.getOrElse(s, 0L) + 1L)
    }
    val hapax = corpus.collect { case (s, 1L) => s }.toSet
    val perDoc = ds.map { case (id, text) =>
      val ss = shingles(text)
      val nh = ss.count(hapax.contains).toLong
      val n = ss.length.toLong
      (id, n, nh, if (n == 0L) 11L else nh * 10L / n)
    }
    val want = perDoc.groupBy(_._4).toSeq.map { case (d, rows) =>
      (d, rows.size.toLong, rows.map(_._1).sum, rows.map(_._3).sum, rows.map(_._2).sum)
    }.sortBy(_._1)
    val got = TrainingOps.docHapax(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == want)
    assert(want.map(_._4).sum > 0, "corpus must have a shingle-hapax tail")
    assert(want.count(_._1 <= 10L) > 1, "shares must spread over deciles")
    // a crafted frame pins exact partial-share deciles and the sentinel
    // independent of the synthetic corpus's distribution: doc 1's "x x x"
    // repeats (f=3 with doc 3's), doc 2 is all-hapax, doc 3 mixes 3/4,
    // doc 4 has no shingles at all
    import spark.implicits._
    val crafted = Seq(
      (1L, "x x x x"),           // shingles: "x x x" twice -> 0 hapax of 2 -> decile 0
      (2L, "p q r s"),           // both shingles unique -> decile 10
      (3L, "x x x u v w"),       // "x x x" f=3; other 3 unique -> 30 div 4 = 7
      (4L, "a b"))               // < 3 tokens -> sentinel 11
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("hapax").toString
    crafted.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got2 = TrainingOps.docHapax(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got2 == Seq((0L, 1L), (7L, 1L), (10L, 1L), (11L, 1L)))
  }

  test("tokenSpectrum and collocations == local recomputes") {
    val docs = docsLocal()
    val allToks = docs.flatMap { case (_, text) => toks(text) }
    // spectrum: token count -> number of types with that count
    val freq = allToks.groupBy(identity).map { case (_, g) => g.size.toLong }
    val wantSpec = freq.groupBy(identity)
      .map { case (f, g) => (f, g.size.toLong) }.toSeq.sortBy(_._1)
    val gotSpec = TrainingOps.tokenSpectrum(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(gotSpec == wantSpec)
    assert(wantSpec.size > 1) // the synthetic corpus spans multiple count classes

    // collocations: the integer PMI-style score over adjacent pairs
    val uni = allToks.groupBy(identity).map { case (t, g) => (t, g.size.toLong) }
    val nTotal = allToks.size.toLong
    val wantColl = docs.flatMap { case (_, text) =>
      val ws = toks(text); ws.dropRight(1).zip(ws.drop(1))
    }.groupBy(identity).collect { case ((w1, w2), g) if g.size >= 3 =>
      val (c1, c2) = (uni(w1), uni(w2))
      val nab = g.size.toLong
      (w1, w2, nab, c1, c2, ((nab * nTotal) * 1000000L) / (c1 * c2))
    }.toSeq.sortBy(r => (-r._6, r._1, r._2))
    val gotColl = TrainingOps.collocations(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(gotColl == wantColl)
    assert(wantColl.nonEmpty)
  }

  test("decontam == local 5-gram overlap recompute against the doc_id % 7 probe set") {
    val docs = docsLocal()
    def grams(text: String): Array[String] = {
      val ws = toks(text)
      if (ws.length < 5) Array.empty
      else (0 to ws.length - 5).map(i => ws.slice(i, i + 5).mkString(" ")).toArray
    }
    val evalGrams = docs.filter(_._1 % 7 == 0).flatMap(d => grams(d._2)).toSet
    val want = docs.filter(_._1 % 7 != 0).flatMap { case (id, text) =>
      val hit = grams(text).filter(evalGrams)
      if (hit.isEmpty) None
      else Some((id, hit.distinct.length.toLong, hit.length.toLong))
    }.sortBy(_._1)
    val got = TrainingOps.decontam(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(want.nonEmpty && want.exists(_._3 > 1), "probe set must really contaminate")
    // clean docs are absent, not zero-rowed
    assert(!got.exists(r => r._2 == 0))
  }

  test("bm25 == local BigInt cleared-fraction recompute (k1 = 6/5, b = 3/4)") {
    import spark.implicits._
    val rows = docsLocal()
    val terms = Seq("spark", "join", "merge", "vector", "window")
    val dls = rows.map { case (id, t) => (id, toks(t).length.toLong) }.toMap
    val n = BigInt(rows.length)
    val s = BigInt(dls.values.sum)
    val tf = rows.flatMap { case (id, t) =>
      toks(t).filter(terms.contains).groupBy(identity)
        .map { case (tok, xs) => (tok, id, xs.length.toLong) }
    }
    val dfm = tf.groupBy(_._1).map { case (t, xs) => (t, BigInt(xs.length)) }
    val want = tf.groupBy(_._1).toSeq.flatMap { case (term, cand) =>
      val df = dfm(term)
      val idf = (2 * (n - df) + 1) * 1000000 / (2 * df + 1)
      cand.map { case (_, id, tfv) =>
        val dl = BigInt(dls(id))
        val core = (22 * BigInt(tfv) * s * 1000000) /
          (10 * BigInt(tfv) * s + 3 * s + 9 * dl * n)
        (id, tfv, dl.toLong, df.toLong, core.toLong, idf.toLong,
          (core * idf / 1000000).toLong)
      }.sortBy { case (id, _, _, _, _, _, sc) => (-sc, id) }.take(5).zipWithIndex
        .map { case ((id, tfv, dl, df2, core, idf2, sc), i) =>
          (term, i + 1L, id, tfv, dl, df2, core, idf2, sc) }
    }.sortBy(r => (r._1, r._2))
    val got = TrainingOps.bm25(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))).toSeq
    assert(got == want)
    // non-trivial: every probe term retrieves a full page and scores vary
    assert(got.groupBy(_._1).forall(_._2.length == 5))
    assert(got.map(_._9).distinct.length > 1)
  }

  test("chiTerms == local BigInt contingency recompute; universal tokens dropped") {
    import spark.implicits._
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("source", "doc_id", "text").as[(String, Long, String)].collect()
    val n = BigInt(rows.length)
    val pres = rows.flatMap { case (src, id, t) =>
      toks(t).distinct.map(tok => (src, id, tok)) }.distinct
    val aMap = pres.groupBy(p => (p._1, p._3)).map { case (k, xs) => (k, BigInt(xs.length)) }
    val dfT = pres.groupBy(_._3).map { case (t, xs) => (t, BigInt(xs.map(_._2).distinct.length)) }
    val nS = rows.groupBy(_._1).map { case (s2, xs) => (s2, BigInt(xs.length)) }
    val want = aMap.toSeq.collect {
      case ((src, tok), a) if a >= 3 && dfT(tok) < n =>
        val df = dfT(tok); val ns = nS(src)
        val d = n - df - ns + a
        val det = a * d - (df - a) * (ns - a)
        val chi = n * det * det * 1000000 / (df * (n - df) * ns * (n - ns))
        (src, tok, a.toLong, df.toLong, chi.toLong)
    }.groupBy(_._1).toSeq.flatMap { case (src, xs) =>
      xs.sortBy { case (_, tok, _, _, chi) => (-chi, tok) }.take(3).zipWithIndex
        .map { case ((_, tok, a, df, chi), i) => (src, i + 1L, tok, a, df, chi) }
    }.sortBy(r => (r._1, r._2))
    val got = TrainingOps.chiTerms(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    assert(got.map(_._6).exists(_ > 0L), "chi2 should separate something")
  }

  test("chiTerms adversarial: a corpus-universal token is dropped, a marker survives") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("chi-adv").toString
    // 'glue' is in EVERY doc (contingency column c+d empty -> zero divisor
    // if scored); 'mark' is exclusive to srcA with a = 3
    val docs = (0L until 6L).map { id =>
      val src = if (id < 3) "srcA" else "srcB"
      val t = if (id < 3) "glue mark filler" + id else "glue other filler" + id
      (id, t, src)
    }
    docs.toDF("doc_id", "text", "source").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = TrainingOps.chiTerms(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(5))).toSeq
    assert(!got.exists(_._3 == "glue"), "universal token must be excluded, not crash")
    // mark: a=3, df=3, n_s=3, n=6 -> det = 3*3 - 0 = 9, chi2 = 6*81*1e6/(3*3*3*3) = 6e6
    assert(got.contains(("srcA", 1L, "mark", 6000000L)))
    assert(got.contains(("srcB", 1L, "other", 6000000L)))
  }

  test("topTerms/charTerms plan shape: broadcast small sides, equi-joins only") {
    // topTerms: the per-source cutoff frame (one row per source) must
    // broadcast, and no join may degrade to a nested loop / cartesian
    val top = TrainingOps.topTerms(spark, sf)
    top.collect()
    val topPlan = top.queryExecution.executedPlan.toString
    assert(topPlan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$topPlan")
    assert(!topPlan.contains("CartesianProduct") &&
      !topPlan.contains("BroadcastNestedLoopJoin"), s"nested-loop join in:\n$topPlan")
    // charTerms: df fits the contract-scale broadcast threshold (the
    // Scaladoc's claim); at web scale the same token-keyed equi-join
    // degrades to a shuffle join, never a nested loop
    val ct = TrainingOps.charTerms(spark, sf)
    ct.collect()
    val ctPlan = ct.queryExecution.executedPlan.toString
    assert(ctPlan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$ctPlan")
    assert(!ctPlan.contains("CartesianProduct") &&
      !ctPlan.contains("BroadcastNestedLoopJoin"), s"nested-loop join in:\n$ctPlan")
  }

  test("tokenRuns and vocabGrowth == local recomputes (space-split tokenizer)") {
    val docs = docsLocal()
    // runs: in-order sequential fold, the reference semantics the engine's
    // narrow higher-order fold and the oracle's window must both match
    val wantRuns = docs.map { case (id, text) =>
      val ws = text.split(" ", -1)
      var runs = 0L; var best = 0L; var cur = 0L
      var prev: String = null
      for (t <- ws) {
        if (prev == null || t != prev) { runs += 1; cur = 1 } else cur += 1
        if (cur > best) best = cur
        prev = t
      }
      (id, ws.length.toLong, runs, best)
    }.sortBy(_._1)
    val gotRuns = TrainingOps.tokenRuns(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(gotRuns == wantRuns)
    assert(wantRuns.exists(_._4 > 1), "corpus must contain a repetition run")

    def shardOf(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"shard#$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 10
    }
    val first = scala.collection.mutable.Map[String, Long]()
    docs.foreach { case (id, text) =>
      val s = shardOf(id)
      text.split(" ", -1).foreach { t =>
        if (!first.get(t).exists(_ <= s)) first(t) = s
      }
    }
    val perShard = first.values.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    var cum = 0L
    val wantGrowth = (0L until 10L).map { s =>
      val n = perShard.getOrElse(s, 0L)
      cum += n
      (s, n, cum)
    }
    val gotGrowth = TrainingOps.vocabGrowth(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(gotGrowth == wantGrowth)
    assert(wantGrowth.last._3 == first.size.toLong)
    assert(wantGrowth.map(_._2).count(_ > 0) > 1, "growth must span multiple shards")
  }

  test("docLmScore == local recompute over the collocation score table") {
    val docs = docsLocal()
    val all = docs.flatMap { case (_, text) => toks(text) }
    val uni = all.groupBy(identity).map { case (t, xs) => (t, xs.length.toLong) }
    val nTotal = all.length.toLong
    val bigs = docs.flatMap { case (_, text) =>
      val ws = toks(text); (0 until ws.length - 1).map(i => (ws(i), ws(i + 1)))
    }
    val scores = bigs.groupBy(identity).collect {
      case ((w1, w2), xs) if xs.length >= 3 =>
        ((w1, w2), (xs.length.toLong * nTotal * 1000000L) / (uni(w1) * uni(w2)))
    }
    val want = docs.flatMap { case (id, text) =>
      val ws = toks(text)
      if (ws.length < 2) None
      else {
        val ps = (0 until ws.length - 1).map(i => scores.get((ws(i), ws(i + 1))))
        Some((id, ps.length.toLong, ps.count(_.isDefined).toLong,
          ps.flatten.sum))
      }
    }.sortBy(_._1)
    val got = TrainingOps.docLmScore(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    assert(want.exists(_._3 > 0), "scored pairs must exist")
  }

  test("packDocs == local greedy packing recompute (capacity 256)") {
    import spark.implicits._
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("source", "doc_id", "text").as[(String, Long, String)].collect().toSeq
    val want = rows.groupBy(_._1).toSeq.flatMap { case (src, ds) =>
      val sorted = ds.sortBy(_._2).map { case (_, id, text) => (id, toks(text).length.toLong) }
      var bin = 0L
      var fill = 0L
      val assigned = sorted.map { case (id, tok) =>
        if (bin == 0L || fill + tok > 256L) { bin += 1; fill = tok } else fill += tok
        (bin, id, tok)
      }
      assigned.groupBy(_._1).map { case (b, xs) =>
        (src, b, xs.size.toLong, xs.map(_._3).sum, xs.map(_._2).min, xs.map(_._2).max)
      }
    }.toSet
    val got = TrainingOps.packDocs(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want)
    assert(want.exists(_._3 > 1), "some bin must hold multiple docs")
    assert(want.groupBy(_._1).values.exists(_.size > 1), "some source must span multiple bins")
  }

  test("skyline == local quadratic dominance recompute") {
    import spark.implicits._
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("source", "doc_id", "text").as[(String, Long, String)].collect().toSeq
      .map { case (src, id, text) =>
        val ws = toks(text)
        (src, id, ws.length.toLong, ws.distinct.length.toLong)
      }
    val want = rows.filter { a =>
      !rows.exists(b => b._1 == a._1
        && b._3 >= a._3 && b._4 >= a._4 && (b._3 > a._3 || b._4 > a._4))
    }.toSet
    val got = TrainingOps.skyline(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want)
    assert(want.nonEmpty)
    assert(want.groupBy(_._1).values.exists(_.size > 1),
      "some source must keep an incomparable PAIR (the non-total-order path)")
  }

  private def srcDocs(): Seq[(String, String)] = {
    import spark.implicits._
    spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("source", "text").as[(String, String)].collect().toSeq
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("simpson == local exact rational recompute") {
    val want = srcDocs().groupBy(_._1).map { case (src, ds) =>
      val counts = ds.flatMap(d => toks(d._2)).groupBy(identity)
        .map(_._2.length.toLong)
      val nTok = counts.sum
      val num = counts.map(c => c * (c - 1)).sum
      (src, nTok, counts.size.toLong, num, num * 1000000L / (nTok * (nTok - 1)))
    }.toSeq.sortBy(_._1)
    val got = TrainingOps.simpson(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == want)
    // diversity sanity: every index far below 10^6 (no degenerate source)
    assert(want.forall(_._5 < 100000L))
  }

  test("bloomCheck == local bit-set recompute; no false negatives (theorem)") {
    import spark.implicits._
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "source", "text").as[(Long, String, String)].collect().toSeq
    def positions(t: String): Seq[Long] =
      (0 to 2).map(i => java.lang.Long.parseLong(md5hex(s"bloom$i#" + t).take(15), 16) % 4096L)
    val evalVocab = rows.filter(_._1 % 7 == 0).flatMap(d => toks(d._3)).toSet
    val bits = evalVocab.flatMap(positions)
    val train = rows.filter(_._1 % 7 != 0)
      .flatMap(d => toks(d._3).map(t => (d._2, t))).distinct
    val want = train.groupBy(_._1).map { case (src, ts) =>
      val nBloom = ts.count(t => positions(t._2).forall(bits.contains))
      val nTrue = ts.count(t => evalVocab.contains(t._2))
      (src, ts.length.toLong, nBloom.toLong, nTrue.toLong, (nBloom - nTrue).toLong)
    }.toSeq.sortBy(_._1)
    val got = TrainingOps.bloomCheck(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == want)
    assert(want.forall(_._5 >= 0L), "bloom must never produce a false negative")
    assert(want.exists(_._4 > 0L), "some true members expected")
  }

  test("kmvSketch == local sorted-distinct-hash recompute (k = 8)") {
    val want = srcDocs().groupBy(_._1).flatMap { case (src, ds) =>
      val hvs = ds.flatMap(d => toks(d._2)).distinct
        .map(t => java.lang.Long.parseLong(md5hex("kmv#" + t).take(15), 16))
        .distinct.sorted
      if (hvs.length >= 8)
        Some((src, hvs.length.toLong, hvs(7), 7L * 1152921504606846976L / hvs(7)))
      else None
    }.toSeq.sortBy(_._1)
    val got = TrainingOps.kmvSketch(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    assert(want.nonEmpty)
    // KMV at k = 8 has ~38% standard error; just pin the order of magnitude
    want.foreach { case (src, exact, _, est) =>
      assert(est > exact / 10 && est < exact * 10, s"$src: est $est vs exact $exact")
    }
  }

  test("scrubCensus == local pattern-count recompute per source") {
    import spark.implicits._
    val ds = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("source", "text").as[(String, String)].collect().toSeq
    val emailish = java.util.regex.Pattern.compile("[a-z0-9]@[a-z0-9]")
    def nonOverlap(p: java.util.regex.Pattern, t: String): Long = {
      val m = p.matcher(t); var n = 0L
      while (m.find()) n += 1
      n
    }
    val want = ds.groupBy(_._1).toSeq.map { case (src, rows) =>
      val nc = rows.map(_._2.length.toLong).sum
      val digits = rows.map(_._2.count(c => c >= '0' && c <= '9').toLong).sum
      val ats = rows.map(_._2.count(_ == '@').toLong).sum
      val urls = rows.map(r => nonOverlap(java.util.regex.Pattern.compile("http"), r._2)).sum
      val emails = rows.map(r => nonOverlap(emailish, r._2)).sum
      (src, rows.size.toLong, nc, digits, ats, urls, emails, digits * 1000L / nc)
    }.sortBy(_._1)
    val got = TrainingOps.scrubCensus(spark, sf).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == want)
    // the sf0.001 synthetic corpus happens to carry no ASCII digits — the
    // zero counts crossing the equality above IS the regression guard
    assert(want.nonEmpty && want.map(_._3).sum > 0L)
  }

  test("keyphrase == local RAKE recompute (segments, degree/freq, struct-min top phrase)") {
    val stop = Set("the", "of", "and", "to", "in", "a", "is", "that", "it",
      "for", "on", "as", "with", "was", "at", "by", "an", "be", "this", "are")
    val want = docsLocal().flatMap { case (id, text) =>
      val ts = toks(text)
      // segment id = running stopword count; phrases = non-stop runs
      var seg = 0L
      val tagged = ts.map { t =>
        if (stop(t)) { seg += 1; None } else Some((seg, t))
      }.flatten
      if (tagged.isEmpty) None
      else {
        val phrases = tagged.groupBy(_._1).view
          .mapValues(_.map(_._2).toSeq).toSeq // insertion order within seg kept
        val plenOf = phrases.map { case (s, ws) => s -> ws.length.toLong }.toMap
        val wstats = tagged.groupBy(_._2).view.mapValues { occs =>
          val deg = occs.map(o => plenOf(o._1)).sum
          val freq = occs.size.toLong
          deg * 1000000L / freq
        }.toMap
        val scored = phrases.map { case (_, ws) =>
          (ws.map(wstats).sum, ws.mkString(" "), ws.length.toLong)
        }
        val top = scored.minBy { case (sc, p, _) => (-sc, p) }
        Some((id, phrases.size.toLong, top._2, top._3, top._1))
      }
    }.sortBy(_._1)
    val got = TrainingOps.keyphrase(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == want)
    assert(want.exists(_._4 > 1L), "a multi-word top phrase must occur")
    assert(want.exists(_._2 > 1L), "multi-phrase documents must occur")
    // the degree side of RAKE must matter: some top phrase is NOT the
    // most frequent unigram run (score is degree-weighted, not count)
    assert(want.map(_._5).distinct.size > 1, "scores must be non-degenerate")
  }
}
