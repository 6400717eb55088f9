package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}
import graft.queries.Q

/** Invariants for the dedup + text-analysis operators. */
class DedupTextSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Q.t(spark, sf0001, "documents")

  test("exact dedup: one group per distinct text, canonical = min id") {
    val r = Dedup.exact(docs, "doc_id", "text")
    assert(r.count() == docs.select(col("text")).distinct().count())
    assert(r.agg(sum(col("group_n"))).head.getLong(0) == docs.count())
  }

  test("exact dedup finds literal duplicates") {
    val dup = docs.limit(5)
      .union(docs.limit(5).withColumn("doc_id", col("doc_id") + 10000))
    val r = Dedup.exact(dup, "doc_id", "text")
    assert(r.filter(col("group_n") === 2).count() == 5)
    // canonical is always the smaller id
    assert(r.filter(col("canonical_id") >= 10000).count() == 0)
  }

  test("minhash LSH pairs are a subset of exact jaccard pairs (same tau)") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(docs, "doc_id", "text", 3, 16, 4, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"LSH produced non-pairs: ${lsh -- exact}")
    // LSH recall over the true pair set should be high
    assert(exact.isEmpty || lsh.size.toDouble / exact.size >= 0.8,
      s"LSH recall ${lsh.size}/${exact.size}")
  }

  test("lshBandPlan: nested candidate sets, monotone columns, exact truth count, r=1 rejected") {
    val plan = Dedup
      .lshBandPlan(docs, "doc_id", "text", n = 3, numPerms = 16,
        bandGrid = Seq(1, 2, 4, 8), tau = 0.5)
      .orderBy(col("bands"))
      .collect()
    assert(plan.length == 4)
    // agreement on a 2r-run implies agreement on both its r-runs, so the
    // per-config candidate sets are NESTED (1 ⊆ 2 ⊆ 4 ⊆ 8 bands) and every
    // count/recall column must be monotone non-decreasing in bands
    val cands = plan.map(_.getLong(2))
    val dets = plan.map(_.getLong(3))
    val recalls = plan.map(_.getDouble(5))
    assert(cands.zip(cands.tail).forall { case (a, b) => a <= b },
      s"candidates not monotone: ${cands.mkString(",")}")
    assert(dets.zip(dets.tail).forall { case (a, b) => a <= b },
      s"detected not monotone: ${dets.mkString(",")}")
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall not monotone: ${recalls.mkString(",")}")
    // n_true is the exact dedup_jaccard pair count, same on every row
    val nTrue = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5).count()
    assert(plan.forall(_.getLong(4) == nTrue))
    // detected never exceeds either denominator
    assert(plan.forall(r => r.getLong(3) <= r.getLong(2)
      && r.getLong(3) <= r.getLong(4)))
    // the production 4×4 config keeps the 0.8 recall gate the LSH spec pins
    val r44 = plan.find(_.getLong(0) == 4L).get
    assert(nTrue == 0 || r44.getDouble(5) >= 0.8, s"4x4 recall ${r44.getDouble(5)}")
    // rows-per-band = 1 is the O(f²) single-min-hash bucket — rejected
    intercept[IllegalArgumentException] {
      Dedup.lshBandPlan(docs, "doc_id", "text", bandGrid = Seq(16))
    }
  }

  test("lshBandPlan sampled audit: both sides restricted to the same pair universe") {
    val sampled = Dedup
      .lshBandPlan(docs, "doc_id", "text", n = 3, numPerms = 16,
        bandGrid = Seq(4, 8), tau = 0.5, sample = 0.5)
      .orderBy(col("bands"))
      .collect()
    // truth on the sampled subset == jaccardPairs over auditSample(df)
    val sub = Dedup.auditSample(docs, "doc_id", 0.5, "bandplan")
    val nTrueSub = Dedup.jaccardPairs(sub, "doc_id", "text", 3, 0.5).count()
    assert(sampled.forall(_.getLong(4) == nTrueSub))
    // candidate counts restricted too: strictly fewer than the full audit
    val full = Dedup
      .lshBandPlan(docs, "doc_id", "text", n = 3, numPerms = 16,
        bandGrid = Seq(4, 8), tau = 0.5)
      .orderBy(col("bands"))
      .collect()
    sampled.zip(full).foreach { case (s, f) =>
      assert(s.getLong(2) <= f.getLong(2), "sampled candidates exceed full")
      assert(s.getLong(3) <= s.getLong(2) && s.getLong(3) <= s.getLong(4))
    }
  }

  test("dedup_threshold_curve: counts monotone non-increasing in tau; 0.5 row == dedup_jaccard") {
    val rows = SparkEntry.queries("dedup_threshold_curve")(spark, sf0001)
      .orderBy(col("tau_x10")).collect()
    assert(rows.nonEmpty && rows.map(_.getLong(0)).sameElements(
      rows.map(_.getLong(0)).sorted))
    val pairs = rows.map(_.getLong(1))
    val ndocs = rows.map(_.getLong(2))
    assert(pairs.zip(pairs.tail).forall { case (a, b) => a >= b },
      s"n_pairs not monotone: ${pairs.mkString(",")}")
    assert(ndocs.zip(ndocs.tail).forall { case (a, b) => a >= b },
      s"n_docs not monotone: ${ndocs.mkString(",")}")
    // each tau row's pair count equals an independent jaccardPairs run
    val at5 = rows.find(_.getLong(0) == 5L).get.getLong(1)
    assert(at5 == Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5).count())
    // avg_jaccard is a mean of values >= tau, so it must sit above tau/10
    rows.foreach { r =>
      if (r.getLong(1) > 0)
        assert(r.getDouble(3) >= r.getLong(0) / 10.0 - 1e-9)
    }
  }

  test("cascade: stage attribution — injected exact dups die at stage 1, canonicals survive their stage, reps are minima") {
    // inject literal duplicates: they must be killed by 'exact', never by
    // a later (more expensive) stage
    val dup = docs.union(
      docs.limit(5).withColumn("doc_id", col("doc_id") + 100000))
    val r = Dedup.cascade(dup, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> ((x.getString(1), x.getLong(2)))).toMap
    val injected = r.filter(_._1 >= 100000)
    assert(injected.size == 5 && injected.values.forall(_._1 == "exact"),
      s"injected dups not exact-killed: $injected")
    // every killed doc's canonical is strictly smaller (reps are minima)
    r.foreach { case (id, (kb, canon)) =>
      if (kb == "kept") assert(canon == id)
      else assert(canon < id, s"doc $id killed_by=$kb canon=$canon not smaller")
    }
    // a canonical must itself survive every stage up to and including the
    // one that used it: exact-kill canonicals are never exact-killed;
    // minhash-kill canonicals are neither exact- nor minhash-killed
    r.foreach { case (id, (kb, canon)) =>
      if (kb == "exact") assert(r(canon)._1 != "exact", s"$id -> $canon")
      if (kb == "minhash")
        assert(!Set("exact", "minhash").contains(r(canon)._1), s"$id -> $canon")
      if (kb == "simhash") assert(r(canon)._1 == "kept", s"$id -> $canon")
    }
    // exact-killed docs really are byte-identical to their canonical
    val texts = dup.select(col("doc_id"), col("text")).collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    r.foreach { case (id, (kb, canon)) =>
      if (kb == "exact") assert(texts(id) == texts(canon), s"$id vs $canon")
    }
  }

  test("decontaminateCascade: every rung fires on a constructed fixture; ship digests honest") {
    import org.apache.spark.sql.functions.md5
    // eval doc: 12 words. call A (defaults) train docs:
    //  101 verbatim copy → exact rung (5-gram overlap)
    //  103 clean words with the eval's exact 25-char prefix spliced in:
    //      no shared word-5-gram, but w=20 char windows hit → scrubbed
    //  104 fully unrelated → clean
    val evalTxt = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    val clean = "zulu yankee xray whiskey victor uniform tango sierra romeo quebec papa oscar"
    val spliced = s"nose one two three ${evalTxt.take(25)} tail four five six seven eight nine"
    val ev = Seq((1L, evalTxt)).toDF("doc_id", "text")
    val tr = Seq(
      (101L, evalTxt), (103L, spliced), (104L, clean)
    ).toDF("doc_id", "text")
    val r = Dedup
      .decontaminateCascade(tr, ev, "doc_id", "text")
      .collect()
      .map(x => x.getLong(0) ->
        ((x.getString(1), x.getLong(2),
          if (x.isNullAt(3)) null else x.getString(3)))).toMap
    assert(r(101L)._1 == "exact" && r(101L)._2 > 0 && r(101L)._3 == null,
      s"101 ${r(101L)}")
    assert(r(103L)._1 == "scrubbed" && r(103L)._2 > 0, s"103 ${r(103L)}")
    assert(r(104L)._1 == "clean" && r(104L)._2 == 0, s"104 ${r(104L)}")
    // the clean doc ships unchanged; the scrubbed doc ships a DIFFERENT text
    val md5s = tr.select(col("doc_id"), md5(col("text")).as("m"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(104L)._3 == md5s(104L))
    assert(r(103L)._3 != null && r(103L)._3 != md5s(103L))
    // call B: rung ORDERING — with the exact rung neutralized (nExact
    // longer than any doc), the same verbatim copy falls through to the
    // fuzzy rung (J=1 collides every LSH band deterministically)
    val r2 = Dedup
      .decontaminateCascade(tr, ev, "doc_id", "text", nExact = 100)
      .collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r2(101L) == "fuzzy", s"101 under nExact=100: ${r2(101L)}")
    assert(r2(104L) == "clean")
  }

  test("klDrift: identical slices → 0; disjoint vocab → JSD near ln 2; bounds hold") {
    // identical halves: same text in both slices → pa == pb for every term
    val same = Seq((0L, "a b c a"), (1L, "a b c a")).toDF("doc_id", "text")
    val r0 = TextAnalysis.klDrift(same, col("doc_id") % 2 === 0, "text").head
    assert(r0.getDouble(3) == 0.0 && r0.getDouble(4) == 0.0
      && r0.getDouble(5) == 0.0)
    // disjoint vocabularies: maximal drift — JSD must approach its ln 2
    // bound (add-one smoothing keeps it strictly below) and stay positive
    val disj = Seq((0L, ("x " * 50).trim), (1L, ("y " * 50).trim))
      .toDF("doc_id", "text")
    val r1 = TextAnalysis.klDrift(disj, col("doc_id") % 2 === 0, "text").head
    val ln2 = math.log(2.0)
    assert(r1.getDouble(5) > 0.8 * ln2 && r1.getDouble(5) < ln2,
      s"disjoint JSD ${r1.getDouble(5)} vs ln2 $ln2")
    assert(r1.getDouble(3) > 0 && r1.getDouble(4) > 0)
    // real corpus: non-negative KL both directions, JSD within [0, ln 2],
    // and the census counts add up
    val r2 = TextAnalysis
      .klDrift(docs, col("doc_id") % 2 === 0, "text").head
    assert(r2.getDouble(3) >= 0 && r2.getDouble(4) >= 0)
    assert(r2.getDouble(5) >= 0 && r2.getDouble(5) <= ln2)
    val totalToks = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").count()
    assert(r2.getLong(0) + r2.getLong(1) == totalToks)
  }

  test("text_drift_terms: integer ranking, count conservation vs klDrift, contribution signs") {
    val rows = SparkEntry.queries("text_drift_terms")(spark, sf0001).collect()
    // ranking is by |c_a - c_b| desc then term asc — verify it held
    val key = rows.map(r => (-r.getLong(3), r.getString(0)))
    assert(key.sameElements(key.sorted), "drift ranking violated")
    // totals of the emitted terms never exceed the corpus census
    val census = TextAnalysis
      .klDrift(docs, col("doc_id") % 2 === 0, "text").head
    assert(rows.map(_.getLong(1)).sum <= census.getLong(0))
    assert(rows.map(_.getLong(2)).sum <= census.getLong(1))
    // when the whole vocab fits in the limit, the sums are exact
    if (rows.length < 100) {
      assert(rows.map(_.getLong(1)).sum == census.getLong(0))
      assert(rows.map(_.getLong(2)).sum == census.getLong(1))
    }
    // a term the A-slice favors (pa > pb) has positive KL(A→B) mass
    rows.foreach { r =>
      val (ca, cb) = (r.getLong(1), r.getLong(2))
      // smoothing uses different denominators; only assert on the
      // unambiguous cases where both the raw and smoothed ratios agree
      if (ca > 2 * cb && r.getDouble(4) != 0.0)
        assert(r.getDouble(4) > 0, s"term ${r.getString(0)}: $ca vs $cb")
    }
  }

  test("zipfFit: exact power-law corpus recovers slope -1 and intercept ln(24)") {
    // freqs 24/r for ranks 1..4 — integer counts exactly on freq = 24·r⁻¹
    val text = (Seq.fill(24)("alpha") ++ Seq.fill(12)("beta") ++
      Seq.fill(8)("gamma") ++ Seq.fill(6)("delta")).mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val r = TextAnalysis.zipfFit(df, "text", topN = 100).head()
    assert(r.getLong(0) == 4)
    assert(math.abs(r.getDouble(1) - (-1.0)) < 1e-9, s"slope ${r.getDouble(1)}")
    assert(math.abs(r.getDouble(2) - math.log(24.0)) < 1e-9,
      s"intercept ${r.getDouble(2)}")
  }

  test("snmPairs: rank-bucket join == naive window join; dups pair; no double emits") {
    // ground truth: rank every doc by the SNM key, enumerate ALL pairs
    // within the window naively, verify with the same exact jaccard
    val window = 8
    val keyed = docs.select(
      col("doc_id"),
      substring(regexp_replace(lower(col("text")), " +", " "), 1, 24).as("k"))
    val ranked = keyed.orderBy(col("k"), col("doc_id"))
      .collect().map(_.getLong(0)).zipWithIndex
    val candWant = (for {
      (ida, ra) <- ranked; (idb, rb) <- ranked
      if rb > ra && rb < ra + window
    } yield (math.min(ida, idb), math.max(ida, idb))).toSet
    val exactJ = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val want = candWant.flatMap(p => exactJ.get(p).map(j => (p, j)))
    val gotRows = Dedup.snmPairs(docs, "doc_id", "text", window, 3, 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    // exactly-once: the bucket join must not emit any candidate twice
    assert(gotRows.map(_._1).distinct.length == gotRows.length,
      "rank-bucket join emitted a pair more than once")
    assert(gotRows.toSet == want,
      s"SNM mismatch: extra=${gotRows.toMap.keySet -- want.map(_._1)} " +
        s"missing=${want.map(_._1) -- gotRows.toMap.keySet}")
    // a literal duplicate pair sorts adjacent and must always surface
    val dup = docs.limit(3)
      .union(docs.limit(3).withColumn("doc_id", col("doc_id") + 10000))
    val dupPairs = Dedup.snmPairs(dup, "doc_id", "text", window, 3, 0.3)
      .filter(col("jaccard") === 1.0).count()
    assert(dupPairs >= 3, s"identical docs failed to pair: $dupPairs")
  }

  test("simhash of identical docs is identical; hamming 0 pairs are dups") {
    val dup = docs.limit(3)
      .union(docs.limit(3).withColumn("doc_id", col("doc_id") + 10000))
    val sig = Dedup.simhash(dup, "doc_id", "text")
    val byHash = sig.groupBy(col("simhash")).count()
      .filter(col("count") >= 2).count()
    assert(byHash >= 3)
  }

  test("simhashPairs 4x16-bit banding is COMPLETE at hamming <= 3 (pigeonhole)") {
    // brute-force ground truth over the 64-bit signatures: every pair
    // within hamming 3 must be produced by the banded join — pigeonhole
    // guarantees at most 3 flipped bits leave one of 4 bands intact
    val sigs = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)).toSet
    val got = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    // the 64-bit signature actually uses its top bits (sign bit included
    // for some doc, with overwhelming probability at this corpus size)
    assert(sigs.exists(_._2 < 0), "no signature with bit 63 set")
  }

  test("connected components: chain, triangle, singleton endpoints") {
    import org.apache.spark.sql.functions.col
    // chain 1-2-3-4-5 (diameter 4 — multiple propagation rounds), a
    // separate triangle 10-11-12, and an isolated pair 20-21
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)
    ).toDF("doc_a", "doc_b")
    val comp = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L
    ))
  }

  test("connected components: 40-node chain converges (pointer jumping, not O(diameter) naive)") {
    val chain = (0L until 39L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val comp = Dedup.connectedComponents(chain, "doc_a", "doc_b").collect()
    assert(comp.length == 40)
    assert(comp.forall(_.getLong(1) == 0L))
  }

  test("connected components: driver-local union-find == distributed min-label loop") {
    import org.apache.spark.sql.functions.col
    // the public API size-dispatches; both paths must agree exactly on
    // the same graph (chain + triangle + pair + isolated self-loop)
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L), (30L, 30L)
    ).toDF("doc_a", "doc_b")
    val local = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
    val dist = Dedup.connectedComponentsDistributed(
      pairs.select(col("doc_a").cast("long").as("src"),
        col("doc_b").cast("long").as("dst")))
    assert(local.except(dist).count() == 0 && dist.except(local).count() == 0)
  }

  test("localMaxEdges = 0 provably routes through the distributed CC loop") {
    import org.apache.spark.sql.functions.col
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    // default cutover: graph is tiny, local union-find, counter untouched
    val before = Dedup.ccDistributedRuns.get()
    val local = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Dedup.ccDistributedRuns.get() == before)
    // forced: the distributed double-pointer-jumping loop must RUN (the
    // dedup_clusters_distributed oracle query pins this same override,
    // so its CORRECTNESS row is produced by this code path)
    val dist = Dedup
      .connectedComponents(pairs, "doc_a", "doc_b", localMaxEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Dedup.ccDistributedRuns.get() == before + 1)
    assert(dist == local)
  }

  test("connected components on an empty pair table is empty") {
    import org.apache.spark.sql.functions.col
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.connectedComponents(empty, "doc_a", "doc_b").count() == 0)
  }

  test("quality score in [0,1]; token stats positive") {
    val q = TextAnalysis.qualityScore(docs, "doc_id", "text")
    assert(q.filter(col("quality") < 0 || col("quality") > 1).count() == 0)
    val s = TextAnalysis.tokenStats(docs, "doc_id", "text")
    assert(s.filter(col("n_tokens") <= 0 || col("avg_token_len") <= 0).count() == 0)
  }

  test("Kneser-Ney perplexity: hand-computed bigram model on a tiny corpus") {
    // corpus "a b a c": bigrams (a,b),(b,a),(a,c) each once
    // cu: a->2 b->1; n1r: a->2 b->1; n1l: a->1 b->1 c->1; types nbt=3
    // P(b|a) = (1-.75)/2 + (.75*2/2)*(1/3) = 0.375
    // P(a|b) = (1-.75)/1 + (.75*1/1)*(1/3) = 0.5
    // P(c|a) = 0.375
    val fix = Seq((1L, "a b a c")).toDF("doc_id", "text")
    val r = TextAnalysis.perplexityKN(fix, "doc_id", "text").collect()
    assert(r.length == 1)
    val expected =
      -(math.log(0.375) + math.log(0.5) + math.log(0.375)) / 3.0
    assert(math.abs(r(0).getDouble(1) - expected) < 1e-6, r(0))
    assert(math.abs(r(0).getDouble(2) - math.exp(expected)) < 1e-5, r(0))
    // a one-token doc has no bigrams -> NULL scores, row kept
    val short = Seq((1L, "a b a c"), (2L, "solo")).toDF("doc_id", "text")
    val r2 = TextAnalysis.perplexityKN(short, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x.isNullAt(1)).toMap
    assert(!r2(1L) && r2(2L))
  }

  test("C4 filters: hand-built page census, flags, keep rule, scrub") {
    val fix = Seq(
      // 4 good lines -> keep
      (1L, "one two three.\nfour five six!\nseven eight nine?\nten eleven twelve."),
      // only 2 rule-passing lines (one too short, one unpunctuated) -> drop
      (2L, "one two three.\nshort.\nno terminal punct here\nfour five six."),
      // placeholder page: lines fine but lorem flag -> drop wholesale
      (3L, "Lorem Ipsum dolor sit.\none two three.\nfour five six.\nseven eight nine."),
      // code page: brace flag -> drop wholesale
      (4L, "one two three.\nvar x = { 1 }\nfour five six.\nseven eight nine.")
    ).toDF("doc_id", "page")
    val s = TextAnalysis.c4Stats(fix, "doc_id", "page")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(s(1L).getLong(1) == 4 && s(1L).getLong(2) == 4 && s(1L).getBoolean(6))
    assert(s(1L).getDouble(3) == 1.0)
    assert(s(2L).getLong(2) == 2 && !s(2L).getBoolean(6)) // below minKeptLines
    assert(s(3L).getBoolean(4) && !s(3L).getBoolean(6))   // lorem flag (case-folded)
    assert(s(4L).getBoolean(5) && !s(4L).getBoolean(6))   // brace flag
    val c = TextAnalysis.c4Scrub(fix, "doc_id", "page")
      .collect().map(r => r.getLong(0) -> r).toMap
    // only page 1 survives; nothing dropped from it
    assert(c.keySet == Set(1L))
    assert(c(1L).getString(1) ==
      "one two three.\nfour five six!\nseven eight nine?\nten eleven twelve.")
    assert(c(1L).getLong(2) == 0)
  }

  test("blocklist filter: hand census, case folding, clean-doc row, keep rule") {
    val docs = Seq(
      (1L, "the cat sat BAD on the mat bad"),   // 8 tokens, 2 hits, 1 term
      (2L, "clean words only here"),            // 4 tokens, 0 hits
      (3L, "bad Worse bad worse bad pad")       // 6 tokens, 5 hits, 2 terms
    ).toDF("doc_id", "text")
    val terms = Seq("Bad", "worse").toDF("term")
    val got = TextAnalysis
      .blocklistStats(docs, "doc_id", "text", terms, maxHitFrac = 0.3)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == Set(1L, 2L, 3L), "clean docs must still get a row")
    assert(got(1L).getLong(1) == 8 && got(1L).getLong(2) == 2
      && got(1L).getLong(3) == 1 && got(1L).getBoolean(5))
    assert(got(2L).getLong(2) == 0 && got(2L).getLong(3) == 0
      && got(2L).getDouble(4) == 0.0 && got(2L).getBoolean(5))
    assert(got(3L).getLong(2) == 5 && got(3L).getLong(3) == 2
      && !got(3L).getBoolean(5), "5/6 hits must fail a 0.3 threshold")
  }

  test("BPE-ish tokenizer: lossless cover, class counts, known example") {
    val df = Seq(
      (1L, "hello world 42 times!"),
      (2L, "a1b2"),
      (3L, "...")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTokenStats(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    // "hello world 42 times!" -> [hello][ world][ 42][ times][!]
    assert(got(1L).getLong(1) == 5, got(1L))
    assert(got(1L).getLong(2) == 3) // hello, world, times
    assert(got(1L).getLong(3) == 1) // 42
    // "a1b2" -> [a][1][b][2]
    assert(got(2L).getLong(1) == 4 && got(2L).getLong(2) == 2 && got(2L).getLong(3) == 2)
    // "..." -> one punctuation run, zero words/digits
    assert(got(3L).getLong(1) == 1 && got(3L).getLong(2) == 0 && got(3L).getLong(3) == 0)
    // token lengths cover the text exactly (the pattern is a partition)
    val t1 = got(1L)
    assert(t1.getDouble(4) * t1.getLong(1) == "hello world 42 times!".length)
  }

  test("fingerprint is order-sensitive") {
    val df = Seq((1L, "a b c"), (2L, "c b a"), (3L, "a b c")).toDF("doc_id", "text")
    val f = TextAnalysis.fingerprint(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(f(1L) == f(3L))
    assert(f(1L) != f(2L))
  }

  test("blocked embedding dedup == naive all-pairs join (bit-identical)") {
    val e = Q.t(spark, sf0001, "embeddings").select(
      col("vec_id"),
      graft.functions.VectorFunctions.toDouble(col("embedding")).as("v")
    )
    // naive spelling: the nested-loop self-join the kernel replaces
    import graft.functions.VectorExpressions._
    val n = e.select(col("vec_id").as("id"), col("v"))
      .withColumn("nrm", sqrt(dotFast(col("v"), col("v"))))
    val naive = n.as("a").join(n.as("b"), col("a.id") < col("b.id"))
      .select(
        col("a.id"), col("b.id"),
        (dotFast(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
          .as("cosine"))
      .filter(col("cosine") >= 0.4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    for (blocks <- Seq(1, 4, 16)) {
      val blocked = Dedup.embeddingPairs(e, "vec_id", "v", 0.4, blocks)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      assert(blocked == naive, s"numBlocks=$blocks: $blocked vs $naive")
    }
    assert(naive.nonEmpty)
  }

  test("semDeDup hot-cluster salting: bit-identical under deliberate skew") {
    val e = Q.t(spark, sf0001, "embeddings").select(
      col("vec_id"),
      graft.functions.VectorFunctions.toDouble(col("embedding")).as("v")
    )
    val d = e.first().getSeq[Double](1).length
    // deliberately skewed fixture: one centroid at the origin, one far
    // outside the data range — every one of the 500 docs lands in
    // cluster 0, the worst-case hot cluster for the within-cluster join
    val cents = Array(Array.fill(d)(0.0), Array.fill(d)(1e9))
    def run(target: Int) = Dedup
      .semDeDup(e, "vec_id", "v", cents, tau = 0.4, hotClusterTarget = target)
    val base = run(0).collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getDouble(3)))
      .toMap
    assert(base.nonEmpty && base.keySet.forall(_._1 == 0L),
      "fixture must funnel everything into one hot cluster")
    for (target <- Seq(8, 64)) {
      val q = run(target)
      val salted = q.collect()
        .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getDouble(3)))
        .toMap
      assert(salted == base, s"target=$target diverged from unsalted")
      // the salted plan really joins on the triangle keys, it isn't a
      // silent fallback to the plain cluster join
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("pi") && p.contains("pj"), p)
    }
  }

  test("LSH embedding dedup: subset of exact; planted near-dups all found") {
    val e = Q.t(spark, sf0001, "embeddings").select(
      col("vec_id"),
      graft.functions.VectorFunctions.toDouble(col("embedding")).as("v")
    )
    val exact = Dedup.embeddingPairs(e, "vec_id", "v", 0.4)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingPairsLsh(e, "vec_id", "v", 0.4)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"LSH produced non-pairs: ${lsh -- exact}")

    // plant true near-duplicates (same vector, +1e-6 on one component →
    // cosine ≈ 1): sign-LSH must recover every planted pair
    val planted = e.limit(8)
      .union(e.limit(8).select(
        (col("vec_id") + 100000).as("vec_id"),
        transform(col("v"), (x, i) =>
          when(i === 0, x + lit(1e-6)).otherwise(x)).as("v")))
    val found = Dedup
      .embeddingPairsLsh(planted, "vec_id", "v", tau = 0.99, bands = 8, numPlanes = 16)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = e.limit(8).select("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(0) + 100000)).toSet
    assert(expected.subsetOf(found),
      s"LSH missed planted near-dups: ${expected -- found}")
  }

  test("multi-probe LSH: superset of exact-band recall, still a subset of exact pairs") {
    val e = Q.t(spark, sf0001, "embeddings").select(
      col("vec_id"),
      graft.functions.VectorFunctions.toDouble(col("embedding")).as("v")
    )
    def pairs(d: org.apache.spark.sql.DataFrame) = d
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Dedup.embeddingPairs(e, "vec_id", "v", 0.4))
    val plain = pairs(Dedup.embeddingPairsLsh(e, "vec_id", "v", 0.4))
    val mp = pairs(Dedup.embeddingPairsLshMultiprobe(e, "vec_id", "v", 0.4))
    // probing each band's 1-bit neighborhood only ADDS candidates; the
    // cosine verify keeps every reported pair a true pair
    assert(plain.subsetOf(mp), s"multi-probe lost pairs: ${plain -- mp}")
    assert(mp.subsetOf(exact), s"multi-probe invented pairs: ${mp -- exact}")
    // candidate algebra: mp candidates == pairs whose signatures match
    // exactly OR differ by one bit in some band
    val cPlain = pairs(Dedup.srpCandidates(e, "vec_id", "v", 16, 4, -1))
    val cMp = pairs(Dedup.srpCandidatesMultiprobe(e, "vec_id", "v", 16, 4, -1))
    assert(cPlain.subsetOf(cMp))
  }

  test("hot-shingle cap: capped candidates are a subset with exact scores") {
    val uncapped = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val capped = Dedup
      .jaccardPairs(docs, "doc_id", "text", 3, 0.5, maxShingleDocFreq = 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(capped.keySet.subsetOf(uncapped.keySet))
    capped.foreach { case (k, j) => assert(j == uncapped(k)) }
  }

  test("tfidfPairs maxDfAbs bounds per-shingle fan-out independently of N") {
    // four docs share exactly one df>=2 shingle ("a b c"); every other
    // shingle is unique (df=1, dropped). With the absolute cap above the
    // shared shingle's df the pairs exist; lowering the cap below df=4
    // must eliminate the shingle — and with it every pair — even though
    // the FRACTIONAL cap (1.0·N = 6) would have kept it.
    val six = Seq(
      (1L, "a b c p1 q1 r1"), (2L, "a b c p2 q2 r2"),
      (3L, "a b c p3 q3 r3"), (4L, "a b c p4 q4 r4"),
      (5L, "u5 v5 w5 x5 y5 z5"), (6L, "u6 v6 w6 x6 y6 z6")
    ).toDF("doc_id", "text")
    val loose = Dedup.tfidfPairs(six, "doc_id", "text",
      n = 3, maxDfFraction = 1.0, maxDfAbs = 10, tau = 0.1)
    assert(loose.count() == 6) // C(4,2) pairs through the shared shingle
    val tight = Dedup.tfidfPairs(six, "doc_id", "text",
      n = 3, maxDfFraction = 1.0, maxDfAbs = 3, tau = 0.1)
    assert(tight.count() == 0)
    // at the engine defaults the absolute cap is non-binding on the test
    // corpus (0.1·N << 10000): results identical with and without it
    val a = Dedup.tfidfPairs(docs, "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toSet
    val b = Dedup.tfidfPairs(docs, "doc_id", "text", maxDfAbs = Int.MaxValue)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toSet
    assert(a == b)
  }

  test("decontaminate: planted eval overlap found, counts exact") {
    // train doc 1 shares the eval doc's full 6-token span → 2 distinct
    // 5-grams; train doc 2 shares nothing; doc 3 is too short to shingle
    val train = Seq(
      (1L, "a b c d e f x y"),
      (2L, "p q r s t u v w"),
      (3L, "a b c")
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "z a b c d e f")).toDF("doc_id", "text")
    val r = Dedup.decontaminate(train, eval, "doc_id", "text", n = 5)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getBoolean(2))).toMap
    assert(r == Map(
      1L -> (2L, true),   // "a b c d e" and "b c d e f"
      2L -> (0L, false),
      3L -> (0L, false)
    ))
  }

  test("decontaminate counts DISTINCT shared n-grams once") {
    // the shared 5-gram occurs twice in the train doc and twice across
    // eval docs — still one distinct shared shingle
    val train = Seq((1L, "a b c d e a b c d e")).toDF("doc_id", "text")
    val eval = Seq(
      (100L, "a b c d e"),
      (101L, "x a b c d e")
    ).toDF("doc_id", "text")
    val r = Dedup.decontaminate(train, eval, "doc_id", "text", n = 5).collect()
    // train doc's distinct 5-grams: {a b c d e, b c d e a, c d e a b,
    //  d e a b c, e a b c d}; eval's: {a b c d e, x a b c d} → overlap 1
    assert(r.length == 1 && r(0).getLong(1) == 1L && r(0).getBoolean(2))
  }

  test("decontaminateBloom == decontaminate, even under a tiny high-FP filter") {
    val train = docs.filter(col("doc_id") % 50 =!= 0)
    val eval = docs.filter(col("doc_id") % 50 === 0)
    val exact = Dedup.decontaminate(train, eval, "doc_id", "text", n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    // roomy filter (low FP) and a deliberately saturated 64-bit filter
    // (every probe likely passes): the verify join must keep both exact
    for (mBits <- Seq(1 << 16, 64)) {
      val bloom = Dedup
        .decontaminateBloom(train, eval, "doc_id", "text", n = 5, mBits = mBits)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      assert(bloom == exact, s"mBits=$mBits diverged")
    }
  }

  test("bpeMerges: hand-computed merge sequence, weighted + deterministic ties") {
    val fix = Seq((1L, "aa aa aaa"), (2L, "ab")).toDF("doc_id", "text")
    // word counts: aa->2, aaa->1, ab->1
    // round 0 pairs: (a,a) = 2*1 + 1*2 = 4; (a,b) = 1 -> merge (a,a) @ 4
    // after rewrite: [aa]x2, [aa,a]x1, [a,b]x1
    // round 1 pairs: (aa,a) = 1, (a,b) = 1, both < minPairCount=2 -> stop
    val m = TextAnalysis.bpeMerges(fix, "text", numMerges = 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq == Seq((0, "a", "a", 4L)))
    // tie-break: (a,b) and (c,d) both count 2 -> lexicographically first
    val tie = Seq((1L, "ab ab cd cd")).toDF("doc_id", "text")
    val mt = TextAnalysis.bpeMerges(tie, "text", numMerges = 1)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(mt == Seq(("a", "b")))
  }

  test("auditSample: deterministic nested subsets; sampled audit = restricted full audit") {
    val emb = Q.t(spark, sf0001, "embeddings").select(
      col("vec_id"),
      graft.functions.VectorFunctions.toDouble(col("embedding")).as("v"))
    val n = emb.count()
    // sample = 1.0 is the identity (the default keeping oracle rows GREEN)
    assert(Dedup.auditSample(emb, "vec_id", 1.0).count() == n)
    val half = Dedup.auditSample(emb, "vec_id", 0.5)
    val ids = half.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids.nonEmpty && ids.size < n, s"not a strict subset: ${ids.size}/$n")
    // deterministic across evaluations
    val ids2 = Dedup.auditSample(emb, "vec_id", 0.5)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids2 == ids)
    // nested: a smaller rate keeps a subset of a larger rate (same salt)
    val quarter = Dedup.auditSample(emb, "vec_id", 0.25)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(quarter.subsetOf(ids))
    // the sampled O(N²) audit equals the full audit restricted to the
    // sampled ids — an unbiased slice, not a different measurement
    def pairs(df: org.apache.spark.sql.DataFrame) =
      Dedup.embeddingPairs(df, "vec_id", "v", tau = 0.45)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = pairs(emb)
    assert(pairs(half) == full.filter { case (a, b) => ids(a) && ids(b) })
  }

  test("weightedWordCounts: frequency floor + top-N cap bound the driver collect") {
    // heavy-tail fixture: 3 head words + a long tail of singletons (the
    // typo/URL/number tail that makes an uncapped collect driver-fatal
    // at corpus scale)
    val tail = (1 to 200).map(i => s"tail$i").mkString(" ")
    val fix = Seq(
      (1L, "alpha alpha alpha beta beta gamma"),
      (2L, "alpha beta gamma " + tail)
    ).toDF("doc_id", "text")
    // floor drops the singleton tail entirely
    val floored = TextAnalysis.weightedWordCounts(fix, "text", minWordCount = 2L)
    assert(floored.map(_._1).toSet == Set("alpha", "beta", "gamma"))
    assert(floored.forall(_._2 >= 2L))
    // cap keeps the most frequent words only, array bounded at the cap
    val capped = TextAnalysis.weightedWordCounts(fix, "text", maxVocabWords = 2)
    assert(capped.length == 2)
    assert(capped.map(_._1).toSet == Set("alpha", "beta")) // counts 4, 3
    // defaults are a no-op: identical multiset to the raw aggregation
    val raw = fix.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").groupBy("w").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(TextAnalysis.weightedWordCounts(fix, "text").toSet == raw)
    // training under a non-binding floor == training without one
    val m0 = TextAnalysis.bpeMerges(fix, "text", numMerges = 5)
      .collect().map(_.toSeq).toSeq
    val m1 = TextAnalysis.bpeMerges(fix, "text", numMerges = 5,
      minWordCount = 1L, maxVocabWords = 1 << 20)
      .collect().map(_.toSeq).toSeq
    assert(m0 == m1)
  }

  test("bpeEncode: round-trip counts and monotone compression in merges") {
    val m1 = Seq(("a", "a"))
    val enc = TextAnalysis.bpeEncode(
      Seq((1L, "aa aaa b")).toDF("doc_id", "text"), "doc_id", "text", m1)
      .collect().head
    // "aa"->[aa]=1 tok, "aaa"->[aa,a]=2, "b"->[b]=1
    assert(enc.getLong(1) == 3L && enc.getLong(2) == 4L)
    // more merges can only shorten the token stream
    val docs = Q.t(spark, sf0001, "documents")
    val totalFor = (k: Int) => {
      val ms =
        if (k == 0) Seq.empty[(String, String)]
        else TextAnalysis.bpeMerges(docs, "text", k).orderBy(col("merge_rank"))
          .collect().map(r => (r.getString(1), r.getString(2))).toSeq
      TextAnalysis.bpeEncode(docs, "doc_id", "text", ms)
        .agg(sum(col("n_tokens"))).head.getLong(0)
    }
    val t0 = totalFor(0); val t8 = totalFor(8); val t24 = totalFor(24)
    assert(t0 >= t8 && t8 >= t24, s"not monotone: $t0 $t8 $t24")
    assert(t24 < t0, "24 merges compressed nothing")
  }

  test("boilerplate: hand-computed span coverage, positions counted per occurrence") {
    val fix = Seq(
      (1L, "a b c"),     // spans(2): "a b", "b c"
      (2L, "a b x"),     // "a b", "b x"
      (3L, "z"),         // too short — 0 spans
      (4L, "b c b c")    // "b c", "c b", "b c" — the dup position counts twice
    ).toDF("doc_id", "text")
    // df: "a b"->{1,2}, "b c"->{1,4} boilerplate (df>=2); "b x","c b" not
    val r = Dedup.boilerplate(fix, "doc_id", "text", n = 2, minDf = 2)
      .collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3))))
      .toMap
    assert(r == Map(
      1L -> ((2L, 2L, 1.0)),
      2L -> ((2L, 1L, 0.5)),
      3L -> ((0L, 0L, 0.0)),
      4L -> ((3L, 2L, 0.666667))
    ))
  }

  test("boilerplate: every doc present, span counts = max(tokens-n+1, 0)") {
    val r = Dedup.boilerplate(docs, "doc_id", "text", n = 5, minDf = 2)
    assert(r.count() == docs.count())
    val expected = docs
      .select(col("doc_id"), greatest(size(split(col("text"), " ")) - 4, lit(0))
        .cast("long").as("want"))
    val bad = r.join(expected, "doc_id").filter(col("n_spans") =!= col("want"))
    assert(bad.count() == 0)
  }

  test("decontaminateFuzzy: exact eval copy flagged at jaccard 1, disjoint doc clean") {
    val train = Seq(
      (1L, "a b c d e f g h"),
      (2L, "p q r s t u v w x y")
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "a b c d e f g h")).toDF("doc_id", "text")
    val r = Dedup.decontaminateFuzzy(train, eval, "doc_id", "text")
      .collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2), x.getBoolean(3))))
      .toMap
    assert(r == Map(
      1L -> ((1L, 1.0, true)),
      2L -> ((0L, 0.0, false))
    ))
  }

  test("decontaminateFuzzy == full-corpus minhashLsh restricted to train x eval") {
    val train = docs.filter(col("doc_id") % 50 =!= 0)
    val eval = docs.filter(col("doc_id") % 50 === 0)
    val fuzzy = Dedup.decontaminateFuzzy(train, eval, "doc_id", "text")
      .filter(col("contaminated"))
      .collect().map(_.getLong(0)).toSet
    // signatures depend only on a doc's own shingles, so the self-join
    // over the whole corpus finds exactly the same cross pairs
    val lsh = Dedup.minhashLsh(docs, "doc_id", "text", 3, 16, 4, 0.5)
      .collect()
      .flatMap { r => Seq(r.getLong(0) -> r.getLong(1), r.getLong(1) -> r.getLong(0)) }
      .filter { case (tr, ev) => tr % 50 != 0 && ev % 50 == 0 }
      .map(_._1).toSet
    assert(fuzzy == lsh)
  }

  test("piiStats: fixture counts exact, redaction byte-exact and complete") {
    val fix = Seq(
      (1L, "write to a.b-c@x.co and d@y.org now"),
      (2L, "call 123-456-7890 or 999-888-7777"),
      (3L, "no pii here 12-34 a@b")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.piiStats(fix, "doc_id", "text")
      .collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getString(3))))
      .toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r(1L) == ((2L, 0L, md5hex("write to <EMAIL> and <EMAIL> now"))))
    assert(r(2L) == ((0L, 2L, md5hex("call <PHONE> or <PHONE>"))))
    // "12-34" is not a phone, "a@b" has no TLD — both survive unredacted
    assert(r(3L) == ((0L, 0L, md5hex("no pii here 12-34 a@b"))))
  }

  test("repetitionStats: hand-computed fixture") {
    val fix = Seq(
      (1L, "x y x y x y"),       // bigrams: xy,yx,xy,yx,xy → top 3 → 6/6=1.0
                                  // trigrams: xyx,yxy,xyx,yxy → 4 total 2 dist
      (2L, "a b c d e"),          // all grams unique
      (3L, "w"),                  // too short for either signal
      (4L, "u v")                 // bigram "u v" ×1 → 2/2=1.0; no trigram
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(fix, "doc_id", "text")
      .collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2), x.getDouble(3)))
      .toMap
    assert(r(1L) == ((6L, 1.0, 0.5)))
    assert(r(2L) == ((5L, 0.4, 0.0)))   // top bigram count 1 → 2/5
    assert(r(3L) == ((1L, 0.0, 0.0)))
    assert(r(4L) == ((2L, 1.0, 0.0)))
  }

  test("linearClassifier: feature algebra exact on a hand-checked fixture") {
    def md5w(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(14)
      java.lang.Long.parseLong(hex, 16) % 2001 - 1000
    }
    val fix = Seq(
      (1L, "a b c"), // features u:a u:b u:c b:a b b:b c
      (2L, "solo")   // one unigram, no bigrams
    ).toDF("doc_id", "text")
    val r = TextAnalysis.linearClassifier(fix, "doc_id", "text")
      .collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3), x.getBoolean(4)))
      .toMap
    val w1 = Seq("u:a", "u:b", "u:c", "b:a b", "b:b c").map(md5w).sum
    assert(r(1L)._1 == w1 && r(1L)._2 == 5L)
    assert(r(1L)._4 == (w1 >= 0))
    assert(math.abs(r(1L)._3 -
      BigDecimal(1.0 / (1.0 + math.exp(-(w1 / 5000.0))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    val w2 = md5w("u:solo")
    assert(r(2L)._1 == w2 && r(2L)._2 == 1L && r(2L)._4 == (w2 >= 0))
  }

  test("pipeline_sample_weighted: 5 per lang, heavier docs over-represented") {
    val r = graft.SparkEntry.queries("pipeline_sample_weighted")(spark, sf0001)
    val perLang = r.groupBy(col("lang")).count().collect()
    assert(perLang.forall(_.getLong(1) == 5L), perLang.mkString(","))
    assert(r.filter(col("rnk") < 1 || col("rnk") > 5).count() == 0)
    // A-ES with w = n_chars: the deterministic sample's mean weight must
    // sit above the corpus mean (longer docs proportionally likelier)
    val sampleMean = r.agg(avg(col("weight"))).head.getDouble(0)
    val popMean = Q.t(spark, sf0001, "documents")
      .agg(avg(col("n_chars"))).head.getDouble(0)
    assert(sampleMean > popMean,
      s"sample mean $sampleMean <= population mean $popMean")
  }

  test("duplicatedSpans: planted shared passage found exactly, once per doc") {
    // 60-char passage shared by docs 1+2 at char offset 11; doc 3 is
    // PERIODIC (every window repeats WITHIN the doc) but shares nothing
    // across docs — it must not appear (minDocs counts distinct docs)
    val passage = "the quick brown fox jumps over the lazy dog; pack my box now!"
      .take(60)
    assert(passage.length == 60)
    val fix = Seq(
      (1L, "abcdefghij" + passage + "klmnopqrst"),
      (2L, "ABCDEFGHIJ" + passage + "KLMNOPQRST"),
      (3L, "9876543210" * 5)
    ).toDF("doc_id", "text")
    val r = Dedup.duplicatedSpans(fix, "doc_id", "text", w = 40, minDocs = 2)
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
      .toSet
    // span = exactly the passage: starts at 11, ends at 70, 60 chars,
    // 60-40+1 = 21 duplicated window positions merged into one island
    assert(r == Set((1L, 11L, 70L, 60L, 21L), (2L, 11L, 70L, 60L, 21L)), r)
  }

  test("duplicatedSpans: disjoint shared passages stay separate islands") {
    val p1 = "zqwhx8k2lmv93tupd6rfyo41cbj7genia50s-ZQWHX8K2LMV93TUPD6RFYO4".take(60)
    val p2 = "The five boxing wizards jump quickly over sixty dazed gnomes"
      .take(60)
    assert(p1.length == 60 && p2.length == 60)
    // fillers share NO character at any position (else the duplicated
    // region extends into the filler boundary chars)
    val fix = Seq(
      (1L, p1 + "+foo+" + p2),
      (2L, p1 + "=bar=" + p2)
    ).toDF("doc_id", "text")
    val r = Dedup.duplicatedSpans(fix, "doc_id", "text", w = 40, minDocs = 2)
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
      .toSet
    // fillers differ, so boundary windows aren't duplicated: two maximal
    // islands per doc — p1 at [1,60], p2 at [66,125]
    assert(r == Set(
      (1L, 1L, 60L, 60L, 21L), (1L, 66L, 125L, 60L, 21L),
      (2L, 1L, 60L, 60L, 21L), (2L, 66L, 125L, 60L, 21L)), r)
  }

  test("duplicatedSpans invariants on real docs: contiguous coverage bounds") {
    val r = Dedup.duplicatedSpans(docs, "doc_id", "text", w = 40, minDocs = 2)
    assert(r.filter(col("span_len") < 40).count() == 0)
    // island coverage is contiguous: windows fit inside the span and
    // cannot exceed one per start position
    assert(r.filter(col("n_windows") > col("span_len") - 39).count() == 0)
    assert(r.filter(col("span_end") - col("span_start") + 1 =!= col("span_len"))
      .count() == 0)
    // spans within a doc never overlap (maximality): check via self-join
    val a = r.select(col("doc_id"), col("span_start").as("s1"), col("span_end").as("e1"))
    val b = r.select(col("doc_id"), col("span_start").as("s2"), col("span_end").as("e2"))
    val overlapping = a.join(b, Seq("doc_id"))
      .filter(col("s1") < col("s2") && col("s2") <= col("e1") + 1)
    assert(overlapping.count() == 0)
  }

  test("contaminatedSpans + scrubSpans: planted leak located and cut exactly") {
    // the eval doc holds a 30-char benchmark sentence; train doc 1 embeds
    // it mid-doc, train doc 2 is clean. w=20 windows: every window of the
    // leaked copy (positions 11..21 of the 30-char run) hits the eval set,
    // merging to exactly the planted span.
    val leak = "What is the capital of France?".take(30)
    assert(leak.length == 30)
    val train = Seq(
      (1L, "abcdefghij" + leak + "klmnopqrst"),
      (2L, "a clean training document with no leak at all")
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "Q17: " + leak + " A: Paris")).toDF("doc_id", "text")
    val spans = Dedup.contaminatedSpans(train, eval, "doc_id", "text", w = 20)
    val got = spans.collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
      .toSet
    // span = the leaked 30 chars at [11, 40]; 30-20+1 = 11 windows
    assert(got == Set((1L, 11L, 40L, 30L, 11L)), got)

    val clean = Dedup.scrubSpans(train, "doc_id", "text", spans)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(clean(1L) == (("abcdefghij" + "klmnopqrst", 1L, 30L)), clean(1L))
    assert(clean(2L) ==
      (("a clean training document with no leak at all", 0L, 0L)))
  }

  test("leakSafeSplit: clusters never straddle the split; fraction tracks trainPct") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
    val comp = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
    val split = Dedup.leakSafeSplit(docs, "doc_id", comp, trainPct = 90)
    // every doc assigned exactly once
    assert(split.count() == docs.count())
    // the leakage invariant: a near-dup PAIR is always same-side
    val sides = split.select(col("doc_id"), col("split"))
    val straddling = pairs
      .join(sides.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
      .join(sides.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
      .filter(col("sa") =!= col("sb"))
    assert(straddling.count() == 0)
    // md5-coin fraction: ~90% of CLUSTERS on the train side (loose gate)
    val reps = split.select(col("rep_id")).distinct().count().toDouble
    val trainReps = split.filter(col("split") === "train")
      .select(col("rep_id")).distinct().count().toDouble
    assert(trainReps / reps > 0.8 && trainReps / reps < 0.98,
      s"train cluster fraction ${trainReps / reps}")
    // deterministic under repartitioning
    val again = Dedup
      .leakSafeSplit(docs.repartition(7), "doc_id", comp, trainPct = 90)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(again == split.collect().map(r => (r.getLong(0), r.getString(2))).toSet)
  }

  test("leakSafeFolds: pairs never straddle folds; all k folds populated") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
    val comp = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
    val folds = Dedup.leakSafeFolds(docs, "doc_id", comp, k = 5)
    assert(folds.count() == docs.count())
    val f = folds.select(col("doc_id"), col("fold"))
    val straddling = pairs
      .join(f.select(col("doc_id").as("doc_a"), col("fold").as("fa")), "doc_a")
      .join(f.select(col("doc_id").as("doc_b"), col("fold").as("fb")), "doc_b")
      .filter(col("fa") =!= col("fb"))
    assert(straddling.count() == 0, "a near-dup pair straddles folds")
    val seen = folds.select(col("fold")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(seen == (0L until 5L).toSet, s"folds seen: $seen")
    // roughly balanced: no fold is empty-ish or dominant (loose gate)
    val counts = folds.groupBy(col("fold")).count()
      .collect().map(_.getLong(1))
    assert(counts.min > docs.count() / 20, s"fold sizes ${counts.toSeq}")
  }

  test("crafted rolling-hash collision: hash-only path fooled, verbatim verify immune") {
    // Thue–Morse construction: S_k/T_k differ everywhere yet their
    // polynomial hashes mod 2^64 differ by (a-b)·∏(B^{2^i}-1), whose
    // 2-adic valuation reaches 64 at k = 10 for the FNV base — a true
    // 1024-char collision for ANY odd base, per the advisory
    def tm(k: Int): (String, String) = {
      var s = "a"; var t = "b"
      for (_ <- 1 to k) { val ns = s + t; val nt = t + s; s = ns; t = nt }
      (s, t)
    }
    val (s10, t10) = tm(10)
    assert(s10 != t10 && s10.length == 1024)
    val hs = graft.functions.RollingHashWindowsExpr.computeLongs(s10, 1024)
    val ht = graft.functions.RollingHashWindowsExpr.computeLongs(t10, 1024)
    assert(hs.head == ht.head, "fixture must be a real kernel collision")
    val train = Seq((1L, s10)).toDF("doc_id", "text")
    val ev = Seq((100L, t10)).toDF("doc_id", "text")
    // pure-hash probe is fooled by the collision…
    assert(Dedup.contaminatedSpans(train, ev, "doc_id", "text",
      w = 1024, verifyVerbatim = false).count() == 1L)
    // …the default verbatim verify is not: no clean text is ever cut
    assert(Dedup.contaminatedSpans(train, ev, "doc_id", "text",
      w = 1024).count() == 0L)
    // and a genuine verbatim leak still localizes exactly
    val leaky = Seq((2L, "xx" + t10 + "yy")).toDF("doc_id", "text")
    val found = Dedup.contaminatedSpans(leaky, ev, "doc_id", "text", w = 1024)
      .collect()
    assert(found.length == 1
      && found(0).getLong(1) == 3L && found(0).getLong(2) == 1026L)
  }

  test("scrubSpans edge spans: doc-start, doc-end, adjacent, full-cover") {
    val docs = Seq(
      (1L, "0123456789"), // span at start [1,3] and end [8,10]
      (2L, "0123456789"), // adjacent spans [2,4],[5,7] cut as one region
      (3L, "0123456789"), // full cover [1,10] -> empty remainder
      (4L, "0123456789")  // no spans
    ).toDF("doc_id", "text")
    val spans = Seq(
      (1L, 1L, 3L), (1L, 8L, 10L),
      (2L, 2L, 4L), (2L, 5L, 7L),
      (3L, 1L, 10L)
    ).toDF("doc_id", "span_start", "span_end")
    val got = Dedup.scrubSpans(docs, "doc_id", "text", spans)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(1L) == (("3456", 2L, 6L)), got(1L))
    assert(got(2L) == (("0789", 2L, 6L)), got(2L))
    assert(got(3L) == (("", 1L, 10L)), got(3L))
    assert(got(4L) == (("0123456789", 0L, 0L)), got(4L))
  }

  test("ppjoin prefix filter: identical pairs to the plain inverted index, fewer candidates") {
    import org.apache.spark.sql.functions._
    // real corpus: the prefix-filtered generator must be lossless
    val full = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pref = Dedup.jaccardPairsPrefix(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pref == full, s"prefix filter lost/added pairs: ${
      (full -- pref).take(3)} / ${(pref -- full).take(3)}")
    // and it must actually prune: on a corpus where every doc shares a
    // boilerplate phrase, prefix candidates collapse the C(df,2) fan-out
    val rnd = new scala.util.Random(5)
    def w() = (1 to 4).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val boiler = "common header phrase every page repeats verbatim today"
    val spark2 = spark; import spark2.implicits._
    val fix = (1L to 60L)
      .map(i => (i, boiler + " " + (1 to 20).map(_ => w()).mkString(" ")))
      .toDF("doc_id", "text")
    val (nFull, nPruned) = Dedup.prefixCandidateCounts(fix, "doc_id", "text", 3, 0.5)
    assert(nPruned < nFull / 4,
      s"expected >4x candidate pruning, got full=$nFull pruned=$nPruned")
    // and the pair sets still agree on the fixture
    val f2 = Dedup.jaccardPairs(fix, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p2 = Dedup.jaccardPairsPrefix(fix, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(f2 == p2)
  }

  test("containment prefix filter: identical directed pairs to the plain join") {
    import org.apache.spark.sql.functions._
    // real corpus + the dedup_containment snippet construction, so the
    // asymmetric snippet-in-doc case is actually exercised
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
    val snippets = toks
      .filter(col("doc_id") % 20 === 0)
      .select(
        (col("doc_id") + 1000000000L).as("doc_id"),
        array_join(
          slice(col("t"), lit(1), expr("greatest(3, (size(t)*2) div 5)")),
          " ").as("text"))
    val corpus = docs.select(col("doc_id"), col("text")).unionAll(snippets)
    def asSet(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_sub"), col("doc_sup"), round(col("containment"), 6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = asSet(Dedup.containmentPairs(corpus, "doc_id", "text", 3, 0.9))
    val pref = asSet(Dedup.containmentPairsPrefix(corpus, "doc_id", "text", 3, 0.9))
    assert(pref == full, s"containment prefix filter lost/added pairs: ${
      (full -- pref).take(3)} / ${(pref -- full).take(3)}")
    assert(full.nonEmpty, "fixture produced no containment pairs — test is vacuous")
    // duplication-heavy fixture (the second-decade profile): 10 salted
    // near-copies per base doc — the shape that spilled 16 GB through the
    // plain join; equality must hold there too
    val spark2 = spark; import spark2.implicits._
    val rnd = new scala.util.Random(7)
    def w() = (1 to 4).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val bases = (1 to 12).map(i => (i, (1 to 25).map(_ => w()).mkString(" ")))
    val fix = bases.flatMap { case (i, txt) =>
      (0 until 10).map(c => (i * 100L + c, if (c == 0) txt else s"$txt x$c"))
    }.toDF("doc_id", "text")
    val f2 = asSet(Dedup.containmentPairs(fix, "doc_id", "text", 3, 0.9))
    val p2 = asSet(Dedup.containmentPairsPrefix(fix, "doc_id", "text", 3, 0.9))
    assert(f2 == p2, s"dup-heavy fixture divergence: ${
      (f2 -- p2).take(3)} / ${(p2 -- f2).take(3)}")
    assert(f2.nonEmpty)
  }

  test("ppjoin prefix filter prunes candidates on the REAL sf0.1 documents table") {
    // the crossover evidence the bench position needs: at the bench
    // config (n=3, tau=0.5) the prefix generator must produce strictly
    // fewer candidate pairs than the plain inverted index on real data,
    // not only on the synthetic boilerplate fixture above
    val real = Q.t(spark, "/root/testdata/sf0.1", "documents")
    val (nFull, nPruned) =
      Dedup.prefixCandidateCounts(real, "doc_id", "text", 3, 0.5)
    info(s"sf0.1 documents: candidates full=$nFull prefix=$nPruned " +
      f"ratio=${nPruned.toDouble / nFull}%.4f")
    // measured 2026-08: full=1130536 prefix=309803 (3.65x) — gate at 2x
    assert(nPruned < nFull / 2,
      s"prefix filter did not prune on real data: full=$nFull pruned=$nPruned")
  }
}
