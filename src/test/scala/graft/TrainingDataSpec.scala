package graft

import graft.operators.{TextAnalysis, TrainingData}
import org.apache.spark.sql.functions._

/** Corpus-preparation operators: deterministic hash split, decontamination
  * screen, repetition scoring. The exact value checks live in the DuckDB
  * oracle; these are the structural contracts.
  */
class TrainingDataSpec extends SparkSpecBase {

  test("hashSplit assigns every doc exactly once, deterministically") {
    val a = TrainingData.hashSplit(spark, Sf).cache()
    val total = Tables.documents(spark, Sf).count()
    assert(a.count() == total)                       // no doc lost or duplicated
    assert(a.select("doc_id").distinct().count() == total)
    val counts = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 90/5/5 within generous tolerance at 500 docs (hash uniformity)
    assert(counts.getOrElse("train", 0L).toDouble / total > 0.8, s"$counts")
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    val b = TrainingData.hashSplit(spark, Sf)
    assert(a.except(b).isEmpty && b.except(a).isEmpty) // run-to-run identical
    a.unpersist()
  }

  test("contamination flags only training docs that share grams with eval") {
    val c = TrainingData.contamination(spark, Sf).cache()
    val rows = c.collect()
    assert(rows.nonEmpty, "synthetic corpus has heavy 5-gram overlap; expected hits")
    assert(rows.forall(_.getLong(0) >= 50), "eval docs must never be flagged")
    assert(rows.forall(r => r.getLong(1) >= 1 && r.getLong(2) >= 1))
    // spot-check one flagged doc by brute force on the raw text
    val flagged = rows.map(_.getLong(0)).min
    def grams(id: Long): Set[Seq[String]] =
      Tables.documents(spark, Sf).filter(col("doc_id") === id)
        .select(TextAnalysis.tokens(col("text"))).collect()
        .headOption.map(_.getSeq[String](0).sliding(5).filter(_.size == 5).toSet)
        .getOrElse(Set.empty)
    val evalGrams = (0L until 50L).flatMap(grams).toSet
    assert(grams(flagged).exists(evalGrams.contains),
      s"doc $flagged flagged but shares no 5-gram with eval set")
    c.unpersist()
  }

  test("bucketed prefix-sum packing equals the naive global window") {
    import org.apache.spark.sql.expressions.{Window => W}
    val packed = TrainingData.packSequences(spark, Sf, tokenBudget = 512,
      bucketWidth = 7).cache() // tiny buckets → many boundary crossings
    // naive single-window reference, same numbers expected bit-for-bit
    val naive = Tables.documents(spark, Sf)
      .select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .withColumn("strt", sum(col("n")).over(
        W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, W.currentRow)) - col("n"))
      .select(col("doc_id"), col("n").as("n_tokens"),
        expr("strt DIV 512").as("pack_id"), (col("strt") % 512).as("offset_in_pack"),
        (expr("strt DIV 512") =!= expr("(strt + greatest(n, 1) - 1) DIV 512")).as("straddles"))
    assert(packed.except(naive).isEmpty && naive.except(packed).isEmpty)
    // packing invariants
    assert(packed.filter(col("offset_in_pack") < 0 ||
      col("offset_in_pack") >= 512).count() == 0)
    assert(packed.filter(col("pack_id") < 0).count() == 0)
    packed.unpersist()
  }

  test("languageBalance keeps at most perLang docs per language, longest first") {
    val kept = TrainingData.languageBalance(spark, Sf, perLang = 10).cache()
    val perLang = kept.groupBy("lang").count().collect()
    assert(perLang.nonEmpty && perLang.forall(_.getLong(1) <= 10))
    // every kept doc is at least as long as any dropped doc of its language
    val minKept = kept.groupBy("lang").agg(min(col("n_tokens")).as("mn"))
    val dropped = Tables.documents(spark, Sf)
      .select(col("doc_id"), col("lang"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      .join(kept.select("doc_id").withColumn("k", lit(1)), Seq("doc_id"), "left_anti")
    val violations = dropped.join(minKept, Seq("lang"))
      .filter(col("n_tokens") > col("mn")).count()
    assert(violations == 0, "a dropped doc outranks a kept one")
    kept.unpersist()
  }

  test("stratifiedSample matches the ranking-window definition exactly") {
    import org.apache.spark.sql.expressions.{Window => W}
    val n = 7
    val got = TrainingData.stratifiedSample(spark, Sf, perStratum = n).cache()
    // window-form reference (the oracle's definition)
    val u = (operators.Dedup.md5Hash60(col("doc_id").cast("string"), lit(1))
      .cast("double") / lit(1152921504606846976.0))
    val ref = Tables.documents(spark, Sf)
      .select(col("lang"), col("doc_id"), u.as("u"))
      .withColumn("rnk", row_number().over(
        W.partitionBy("lang").orderBy(col("u"), col("doc_id"))).cast("long"))
      .filter(col("rnk") <= n)
    assert(got.except(ref).isEmpty && ref.except(got).isEmpty)
    // exact stratum sizes: min(n, stratum population)
    val pops = Tables.documents(spark, Sf).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> math.min(n.toLong, r.getLong(1))).toMap
    val sizes = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes == pops, s"expected $pops got $sizes")
    got.unpersist()
  }

  test("chunkDocuments: windows match a driver-side slicer, tail covered, overlap = stride") {
    val got = TrainingData.chunkDocuments(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getString(3))))
      .toMap
    val docs = Tables.documents(spark, Sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim)
      .collect { case (id, t) if t.nonEmpty => id -> t.split("\\s+").toSeq }
    val expected = docs.flatMap { case (id, toks) =>
      val n = toks.length
      val starts = 0 to (math.max(0, (n - 128 + 63) / 64) * 64) by 64
      starts.map { s =>
        val w = toks.slice(s, s + 128)
        (id, (s / 64).toLong) -> ((w.length.toLong, w.mkString(" ")))
      }
    }.toMap
    assert(got == expected)
    // every doc chunked; tails under one chunk yield exactly one window
    assert(got.keySet.map(_._1) == docs.map(_._1).toSet)
    docs.filter(_._2.length <= 128).foreach { case (id, _) =>
      assert(got.keySet.count(_._1 == id) == 1)
    }
    // multi-window path (test-scale docs can be shorter than one default
    // chunk): 16-token windows, stride 8 — overlap reconstructs the doc
    val small = TrainingData.chunkDocuments(spark, Sf, chunkTokens = 16, stride = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(3)).toMap
    assert(small.keySet.exists(_._2 > 0), "no doc produced a second window")
    docs.foreach { case (id, toks) =>
      val chunks = small.filter(_._1._1 == id).toSeq.sortBy(_._1._2)
      val rebuilt = chunks.init.map(_._2.split(" ").take(8).mkString(" ")) :+ chunks.last._2
      assert(rebuilt.mkString(" ") == toks.mkString(" "), s"doc $id not covered")
    }
  }

  test("temperatureSample: smallest language kept whole, selection matches an independent reimplementation") {
    val kept = TrainingData.temperatureSample(spark, Sf).cache()
    val docs = Tables.documents(spark, Sf)
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val counts = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nMin = counts.values.min
    // independent reimplementation of the keep rule: java MessageDigest md5,
    // first 15 hex chars as the 60-bit u, math.pow fraction
    val md = java.security.MessageDigest.getInstance("MD5")
    def u(id: Long): Double = {
      val hex = md.digest(s"$id#7".getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16).toDouble / 1152921504606846976.0
    }
    val expected = docs.collect {
      case (id, lang) if u(id) < math.pow(counts(lang).toDouble / nMin, 0.3 - 1.0) => id
    }.toSet
    val got = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected)
    // the smallest language survives in full (keep_frac = 1, u < 1 always)
    val minLang = counts.minBy(_._2)._1
    val keptMin = kept.filter(col("lang") === minLang).count()
    assert(keptMin == counts(minLang))
    // and at least one larger language was actually downsampled
    assert(got.size < docs.length)
    kept.unpersist()
  }

  test("temperatureSample at alpha=1 keeps the natural distribution") {
    val kept = TrainingData.temperatureSample(spark, Sf, alpha = 1.0)
    assert(kept.count() == Tables.documents(spark, Sf).count())
  }

  test("robustClip keeps exactly the per-lang [p05, p95] band") {
    import spark.implicits._
    val kept = TrainingData.robustClip(spark, Sf).cache()
    // every kept row sits inside its own reported bounds
    assert(kept.filter(col("n_chars") < col("p05") ||
      col("n_chars") > col("p95")).count() == 0)
    // the clip drops something but keeps ~90% per language
    val perLang = Tables.documents(spark, Sf).groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val keptLang = kept.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    perLang.foreach { case (l, n) =>
      val k = keptLang.getOrElse(l, 0L)
      assert(k < n, s"$l: clip must drop outliers")
      assert(k >= (n * 0.85).toLong, s"$l: clip dropped too much ($k of $n)")
    }
    kept.unpersist()
  }

  test("repetitionScore ratios are in [0,1] and consistent with token counts") {
    val r = TextAnalysis.repetitionScore(spark, Sf).cache()
    assert(r.count() == Tables.documents(spark, Sf).count())
    val bad = r.filter(
      col("dup_word_ratio") < 0 || col("dup_word_ratio") > 1 ||
      col("dup_2gram_ratio") < 0 || col("dup_2gram_ratio") > 1 ||
      col("dup_3gram_ratio") < 0 || col("dup_3gram_ratio") > 1).count()
    assert(bad == 0)
    // a doc repeats words iff it repeats no MORE distinct 2-grams than pairs:
    // with any duplicate 2-gram there must be a duplicate word
    val inconsistent = r.filter(col("dup_2gram_ratio") > 0 &&
      col("dup_word_ratio") === 0.0).count()
    assert(inconsistent == 0, "duplicate 2-gram implies a duplicate word")
    r.unpersist()
  }

  test("sampleTopKPerGroup is exactly-k per group and run-deterministic") {
    import spark.implicits._
    val k = 10
    val s1 = TrainingData.sampleTopKPerGroup(spark, Sf, k)
      .as[(Long, String, Long)].collect().toSet
    // exactly min(k, |group|) rows per group, ranks dense 1..n
    val perGroup = s1.groupBy(_._2)
    val sizes = Tables.documents(spark, Sf).groupBy(col("lang")).count()
      .as[(String, Long)].collect().toMap
    perGroup.foreach { case (lang, rows) =>
      val expect = math.min(k.toLong, sizes(lang))
      assert(rows.size == expect, s"$lang: ${rows.size} != $expect")
      assert(rows.map(_._3) == (1L to expect).toSet, s"$lang ranks not dense")
    }
    assert(perGroup.keySet == sizes.keySet, "every group sampled")
    // identical selection on a rerun (the whole point of the seeded hash)
    val s2 = TrainingData.sampleTopKPerGroup(spark, Sf, k)
      .as[(Long, String, Long)].collect().toSet
    assert(s1 == s2)
  }

  test("hash-prefix pre-prune selects bit-identically to the full per-group sort") {
    import spark.implicits._
    for (k <- Seq(1, 10, 64)) {
      val pruned = TrainingData.sampleTopKPerGroup(spark, Sf, k)
        .as[(Long, String, Long)].collect().toSet
      val full = TrainingData.sampleTopKPerGroupFullSort(spark, Sf, k)
        .as[(Long, String, Long)].collect().toSet
      assert(pruned == full, s"k=$k: pruned selection diverged from full sort")
    }
    // k beyond every group size: the bound saturates at 1.0, all rows rank
    val kBig = 100000
    val pruned = TrainingData.sampleTopKPerGroup(spark, Sf, kBig).count()
    val full = TrainingData.sampleTopKPerGroupFullSort(spark, Sf, kBig).count()
    assert(pruned == full)
  }

  test("pre-prune bounds the window input to ~pruneFactor*k per group") {
    import spark.implicits._
    val k = 10
    // replicate the operator's candidate filter and measure what the window
    // would actually sort: must be ∝ c·k per group, far below group sizes
    val docs = Tables.documents(spark, Sf)
      .select(col("doc_id"), col("lang"))
      .withColumn("u", call_function("graft_hex15",
        md5(concat(lit("seed42:"), col("doc_id").cast("string")))).cast("double")
        / lit((1L << 60).toDouble))
    val sizes = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_g"))
    val surv = docs.join(broadcast(sizes), Seq("lang"))
      .filter(col("u") <= least(lit(1.0), lit(8.0 * k) / col("n_g")))
      .groupBy(col("lang")).agg(count(lit(1)).as("n_surv"))
      .join(sizes, Seq("lang"))
      .as[(String, Long, Long)].collect()
    surv.foreach { case (lang, nSurv, nG) =>
      assert(nSurv >= math.min(k.toLong, nG), s"$lang under-delivered: $nSurv")
      // binomial(n_g, 80/n_g) stays well under 4x its mean
      assert(nSurv <= math.min(nG, 4L * 8 * k), s"$lang prune ineffective: $nSurv of $nG")
    }
  }

  test("filteredTopK honors the metadata predicate and pushes it to the scan") {
    import spark.implicits._
    val df = graft.operators.Similarity.filteredTopK(spark, Sf)
    val rows = df.as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    // every neighbor satisfies the predicate — the filter ran BEFORE top-k
    val labels = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("label")).as[(Long, Int)].collect().toMap
    assert(rows.forall(r => labels(r._2) == 1), "neighbor outside label=1")
    // and the predicate reaches the parquet scan, not a post-scan Filter only
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("label"),
      s"label predicate not pushed:\n${plan.take(2000)}")
  }

  test("splitLeakage matches the window-count formulation; never emits train docs") {
    import graft.operators.Dedup
    import org.apache.spark.sql.expressions.Window
    val got = TrainingData.splitLeakage(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got.forall(_._2 != "train"), "leak report contains train docs")
    // independent formulation: per-cluster train count via a window instead
    // of the aggregate+join the operator uses
    val labeled = Dedup.dedupClusters(spark, Sf, Dedup.minhashLshPairs(spark, Sf))
      .join(TrainingData.hashSplit(spark, Sf).select(col("doc_id"), col("split")),
        Seq("doc_id"))
    val w = Window.partitionBy(col("cluster_id"))
    val expected = labeled
      .withColumn("n_train_dups",
        sum(when(col("split") === "train", 1L).otherwise(0L)).over(w))
      .filter(col("split") =!= "train" && col("n_train_dups") >= 1)
      .select(col("doc_id"), col("split"), col("cluster_id"), col("n_train_dups"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(expected.nonEmpty,
      "sf0.001 dup clusters must span the split for this test to bite")
    assert(got == expected, s"mismatch: got ${got.size}, expected ${expected.size}")
  }

  test("clusterSplit: zero leakage by construction; fixes what splitLeakage measures") {
    val rows = TrainingData.clusterSplit(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    assert(rows.nonEmpty)
    // structural: split is a function of cluster_id — one split per cluster
    rows.groupBy(_._2).foreach { case (cl, members) =>
      assert(members.map(_._3).distinct.size === 1,
        s"cluster $cl straddles splits: ${members.map(_._3).distinct}")
    }
    // every document is assigned exactly once
    assert(rows.map(_._1).distinct.length ===
      Tables.documents(spark, Sf).count())
    // and the hashSplit leakage this face fixes actually EXISTS here — the
    // corpus where the fix is vacuous wouldn't test anything
    assert(TrainingData.splitLeakage(spark, Sf).count() > 0,
      "sf0.001 must exhibit per-doc-split leakage for this pin to bite")
  }

  test("contaminationClosure: hits expand to whole clusters; closure-only rows are flagged false") {
    import graft.operators.Dedup
    val closure = TrainingData.contaminationClosure(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val hits = TrainingData.contamination(spark, Sf).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val clusters = Dedup.dedupClusters(spark, Sf, Dedup.minhashLshPairs(spark, Sf))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every direct hit is in the closure, flagged direct
    val byDoc = closure.map(r => r._1 -> r._3).toMap
    hits.foreach(h => assert(byDoc.get(h).contains(true), s"direct hit $h missing/unflagged"))
    // closure members carry their cluster's label and that cluster is
    // genuinely contaminated (contains a hit or an eval doc)
    val contaminated = clusters.collect {
      case (doc, cl) if hits(doc) || doc < 50 => cl
    }.toSet
    closure.foreach { case (doc, cl, direct) =>
      assert(clusters(doc) === cl)
      assert(contaminated(cl), s"doc $doc in uncontaminated cluster $cl")
      assert(doc >= 50, "closure must only list training docs")
      assert(direct === hits(doc))
    }
    // completeness: every training member of a contaminated cluster is out
    val expected = clusters.collect {
      case (doc, cl) if contaminated(cl) && doc >= 50 => doc
    }.toSet
    assert(closure.map(_._1).toSet === expected)
    // closure-only removals (direct_hit = false) are the face's value-add;
    // at sf0.001 the dup clusters happen to be fully hit-covered, so this
    // is informational here — the sf0.01 oracle face exercises the
    // closure-only rows (completeness above proves the zero is consistent:
    // every training member of every contaminated cluster IS a hit)
    info(s"closure-only removals at spec scale: ${closure.count(!_._3)}")
  }

  test("weightedSample matches a driver-side A-ES reimplementation exactly") {
    val got = TrainingData.weightedSample(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    val docs = Tables.documents(spark, Sf).select("doc_id", "lang", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def h60(s: String, seed: Int): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$s#$seed".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val expected = docs.groupBy(_._2).flatMap { case (lang, rows) =>
      rows.toSeq.map { case (id, _, n) =>
        val u = h60(id.toString, 11).toDouble / 1152921504606846976.0
        (id, math.pow(u, 1.0 / math.max(n, 1L).toDouble))
      }.sortBy { case (id, key) => (-key, id) }.take(10).zipWithIndex
        .map { case ((id, _), i) => (id, lang, (i + 1).toLong) }
    }.toSet
    assert(got == expected, s"selection diverged: ${got.size} vs ${expected.size}")
    // size-biased draw is live: report the bias (not asserted — one draw)
    val meanAll = docs.map(_._3).sum.toDouble / docs.length
    val sampled = docs.filter(r => got.exists(g => g._1 == r._1)).map(_._3)
    info(f"mean chars: corpus ${meanAll}%.1f vs sample ${sampled.sum.toDouble / sampled.length}%.1f")
  }
}
