package graft

import org.apache.spark.sql.functions._

import graft.queries.Q

/** Physical-plan shape guards: the scale properties the operators were
  * designed around must survive future refactors — filters reach the
  * parquet scan, dims broadcast, top-k partially aggregates before its
  * shuffle, bucketless fact joins stay equi-keyed.
  */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  test("q1: shipdate filter is pushed into the parquet scan") {
    val p = planOf("q1_pricing_summary")
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("LessThanOrEqual(l_shipdate"), p)
  }

  test("text_c4_filters/scrub: pure per-row maps — zero Exchange in the plan") {
    // the C4 stage's whole scale argument is that it streams at
    // parquet-scan speed; any future shuffle here is a design break
    for (name <- Seq("text_c4_filters", "text_c4_scrub")) {
      val p = planOf(name)
      assert(!p.contains("Exchange"), s"$name grew a shuffle:\n$p")
    }
  }

  test("knn: query side broadcast + partial heap aggregation before exchange") {
    val p = planOf("knn_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    // partial ObjectHashAggregate appears below the exchange: per-partition
    // reduction to k rows per query before any shuffle
    val firstAgg = p.indexOf("ObjectHashAggregate")
    val exchange = p.indexOf("Exchange", firstAgg)
    val finalAgg = p.indexOf("ObjectHashAggregate", exchange)
    assert(firstAgg >= 0 && exchange > firstAgg && finalAgg > exchange, p)
  }

  test("knn_filtered: label constraint is the JOIN KEY — hash join, no nested loop") {
    val p = planOf("knn_filtered")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // bounded heap still partially aggregates before the exchange
    val firstAgg = p.indexOf("ObjectHashAggregate")
    val exchange = p.indexOf("Exchange", firstAgg)
    val finalAgg = p.indexOf("ObjectHashAggregate", exchange)
    assert(firstAgg >= 0 && exchange > firstAgg && finalAgg > exchange, p)
  }

  test("knn_maxsim: broadcast query batch; token loops never explode into rows") {
    val p = planOf("knn_maxsim")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    // the MaxSim kernel is in-row HOF algebra: below the similarity join
    // there must be NO Generate (an exploded (doc, token) row blow-up
    // would shuffle token rows; the only Generate is the final top-k
    // posexplode, which sits above the aggregation)
    val bnl = p.indexOf("BroadcastNestedLoopJoin")
    assert(p.indexOf("Generate", bnl) < 0, p)
    // bounded heap still partially aggregates before the exchange
    val firstAgg = p.indexOf("ObjectHashAggregate")
    val exchange = p.indexOf("Exchange", firstAgg)
    val finalAgg = p.indexOf("ObjectHashAggregate", exchange)
    assert(firstAgg >= 0 && exchange > firstAgg && finalAgg > exchange, p)
  }

  test("knn_mrl: rerank joins are broadcast HASH joins; heap partials below exchange") {
    val p = planOf("knn_mrl")
    // stage 2 keys on (id, id) equality — shortlist and query batch attach
    // as broadcast hash joins, never a second corpus-sized nested loop
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // exactly one nested-loop join in the whole plan: the stage-1
    // query-batch × corpus distance scan
    val first = p.indexOf("BroadcastNestedLoopJoin")
    assert(first >= 0, p)
    assert(p.indexOf("BroadcastNestedLoopJoin", first + 1) < 0, p)
    // both stages' bounded heaps partially aggregate before their exchange
    val firstAgg = p.indexOf("ObjectHashAggregate")
    val exchange = p.indexOf("Exchange", firstAgg)
    val finalAgg = p.indexOf("ObjectHashAggregate", exchange)
    assert(firstAgg >= 0 && exchange > firstAgg && finalAgg > exchange, p)
  }

  test("knn_bq_rerank: code scan stage 1, broadcast hash-join rerank, heap partials") {
    val p = planOf("knn_bq_rerank")
    // stage 2 attaches shortlist + query batch by id equality — hash
    // joins, never a second all-pairs pass over the corpus
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    val first = p.indexOf("BroadcastNestedLoopJoin")
    assert(first >= 0, p) // the Hamming code scan
    assert(p.indexOf("BroadcastNestedLoopJoin", first + 1) < 0, p)
    val firstAgg = p.indexOf("ObjectHashAggregate")
    val exchange = p.indexOf("Exchange", firstAgg)
    val finalAgg = p.indexOf("ObjectHashAggregate", exchange)
    assert(firstAgg >= 0 && exchange > firstAgg && finalAgg > exchange, p)
  }

  test("knn_maxsim_pq: compressed late interaction — broadcast LUTs, no decode, no explode") {
    val p = planOf("knn_maxsim_pq")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    val bnl = p.indexOf("BroadcastNestedLoopJoin")
    assert(p.indexOf("Generate", bnl) < 0, p) // token loops stay in-row
    assert(!p.contains("pq_decode_native"), p) // ADC serves from codes, never a reconstruction
    val firstAgg = p.indexOf("ObjectHashAggregate")
    val exchange = p.indexOf("Exchange", firstAgg)
    val finalAgg = p.indexOf("ObjectHashAggregate", exchange)
    assert(firstAgg >= 0 && exchange > firstAgg && finalAgg > exchange, p)
  }

  test("dedup_semdedup: cluster id is the join key — no cartesian, one assignment exchange") {
    val q = SparkEntry.queries("dedup_semdedup")(spark, sf0001)
    q.collect() // let AQE finalize stage reuse
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastExchange"), p) // never broadcast corpus data
    assert(p.contains("ShuffledHashJoin"), p)
    assert(p.contains("centroid_argmin"), p) // native codegen assignment
    // both join sides are the same assignment subtree: computed once,
    // the second side re-reads the exchange
    assert(p.contains("ReusedExchange"), p)
  }

  test("dedup_semdedup_salted: triangle keys in the join, broadcast only for the size table") {
    val q = SparkEntry.queries("dedup_semdedup_salted")(spark, sf0001)
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("ShuffledHashJoin"), p)
    // the pair join shuffles on (cluster, pi, pj) — the salted shape
    assert(p.contains("pi") && p.contains("pj"), p)
    // the only broadcast is the <=k-row per-cluster salt-count table
    val b = p.indexOf("BroadcastExchange")
    assert(b >= 0 && p.indexOf("n_salts", b) >= 0, p)
  }

  test("knn_maxsim_ivf: equi-joins on cell/query only, fused ADC kernel, heap below exchange") {
    val p = planOf("knn_maxsim_ivf")
    // both corpus-side reductions are HASH joins (cell routing + lut
    // attach); the only nested loop is probeCells' queries x 8-row
    // centroid dim — assert it never touches the doc table
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    val bnl = p.indexOf("BroadcastNestedLoopJoin")
    assert(bnl < 0 || p.indexOf("LocalTableScan", bnl) > 0, p)
    assert(p.contains("maxsim_adc"), p) // fused kernel, not HOF algebra
    assert(p.contains("centroid_argmin"), p) // native cell assignment
    val firstAgg = p.indexOf("ObjectHashAggregate")
    val exchange = p.indexOf("Exchange", firstAgg)
    val finalAgg = p.indexOf("ObjectHashAggregate", exchange)
    assert(firstAgg >= 0 && exchange > firstAgg && finalAgg > exchange, p)
  }

  test("q27: bucketed join — zero exchange below the sort-merge join") {
    val p = planOf("q27_bucketed_join")
    val smj = p.indexOf("SortMergeJoin")
    assert(smj >= 0, p)
    // children of the join are the bucketed scans: any Exchange printed
    // below the join line means the bucket co-location was lost (the agg's
    // own exchange sits above the join, so it is not matched here)
    assert(p.indexOf("Exchange", smj) < 0, p)
  }

  test("q2: star-schema dims join as broadcast hash joins, no cartesian") {
    val p = planOf("q2_revenue_by_region")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q17 as-of join: one hash shuffle on user, no join operator at all") {
    val p = planOf("q17_asof_purchase_signup")
    assert(p.contains("hashpartitioning(k"), p)
    for (j <- Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
        "BroadcastNestedLoopJoin", "CartesianProduct"))
      assert(!p.contains(j), p)
    // no Window rank either — the sweep replaces it
    assert(!p.contains("Window"), p)
  }

  test("q3: the only broadcast hint targets the customer dim, never orders") {
    val q = SparkEntry.queries("q3_top_orders")(spark, sf0001)
    val opt = q.queryExecution.optimizedPlan.toString
    val hinted = opt.linesIterator.filter(_.contains("strategy=broadcast")).toSeq
    assert(hinted.size == 1, s"expected exactly one broadcast hint:\n$opt")
    // the hinted join is orders⋈customer (on c_custkey), not lineitem⋈orders
    assert(hinted.head.contains("c_custkey"), s"hint on wrong join:\n$opt")
  }

  test("dedup_embedding: blocked kernel — no nested-loop or cartesian join") {
    val p = planOf("dedup_embedding")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("dedup_embedding_lsh: band-blocked candidates — no nested loop") {
    val p = planOf("dedup_embedding_lsh")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("cluster_dbscan: blocked pair kernel + equi-joins — no nested loop, no cartesian") {
    val p = planOf("cluster_dbscan")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("dedup_snm: rank-bucket equi-join windowing — no nested loop, no global window") {
    val p = planOf("dedup_snm")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the global order comes from distributedRank's pid-partitioned
    // window, never a single-partition sort window over the corpus
    assert(!p.contains("Window [") || p.contains("windowspecdefinition(pid"),
      s"global unpartitioned window crept in:\n$p")
  }

  test("pipeline_dsir: the B-row log-ratio table joins as a broadcast") {
    val p = planOf("pipeline_dsir")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("pipeline_label_prop: voting rounds are equi-joins — no nested loop, no cartesian") {
    val p = planOf("pipeline_label_prop")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("dedup_embedding_lsh_mp: probe-exploded band join stays equi-keyed") {
    val p = planOf("dedup_embedding_lsh_mp")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("mm video/audio dedup: the df cap is a LeftSemi prune on the candidate index") {
    for (q <- Seq("mm_video_dedup", "mm_audio_dedup")) {
      val p = planOf(q)
      assert(p.contains("LeftSemi"), s"$q lost the df-cap semi join:\n$p")
      assert(!p.contains("CartesianProduct"), p)
    }
  }

  test("rpt_recall_curve: per-margin descents are broadcast/equi joins, no cartesian") {
    val p = planOf("rpt_recall_curve")
    assert(!p.contains("CartesianProduct"), p)
    // the ONLY nested-loop is the exact-truth brute force (broadcast
    // query batch × corpus under the partial heap — the blessed knn
    // shape); the descent/candidate/rerank side must stay equi-keyed,
    // so the BNLJ count is exactly the one truth subtree
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size == 1, p)
  }

  test("pipeline_hits / pagerank_dangling: rounds are equi-joins; scalars broadcast") {
    for (q <- Seq("pipeline_hits", "pipeline_pagerank_dangling")) {
      val p = planOf(q)
      // the 1-row norm/dangling scalars ride a broadcast nested-loop
      // cross join by design; a corpus-sized cartesian never appears
      assert(!p.contains("CartesianProduct"), p)
    }
  }

  test("mm_video_dedup / mm_audio_dedup: inverted-index equi-joins, no cartesian") {
    for (name <- Seq("mm_video_dedup", "mm_audio_dedup")) {
      val p = planOf(name)
      assert(!p.contains("CartesianProduct"), s"$name:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name:\n$p")
    }
  }

  test("rpt_knn: descent joins broadcast the median table; no cartesian anywhere") {
    val p = planOf("rpt_knn")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("ivf: probed scan prunes partitions; probe set materialized once; no broadcast cap on the query batch") {
    val q = SparkEntry.queries("ivf_knn")(spark, sf0001)
    val ep = q.queryExecution.executedPlan.toString
    // the index scan is partition-pruned by the probed cell set
    val scanLine = ep.linesIterator
      .find(l => l.contains("PartitionFilters") && l.contains("cell#"))
      .getOrElse("")
    assert(scanLine.contains("IN ("), s"no cell partition filter:\n$ep")
    // the probe side enters the result plan as the materialized
    // localCheckpoint RDD — the crossJoin×centroids+topK subtree ran
    // exactly once, shared with the partition-filter collect, and is NOT
    // re-evaluated here
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("LogicalRDD"), s"probe side not materialized:\n$opt")
    assert(!opt.contains("Join Cross"),
      s"probe subtree re-evaluated inside the result plan:\n$opt")
    // the cell equi-join that carries the query batch is unhinted — AQE may
    // still broadcast at this size, but nothing caps a large batch at
    // driver memory
    val cellJoin = opt.linesIterator.find(_.contains("Join Inner, (cell")).getOrElse("")
    assert(cellJoin.nonEmpty && !cellJoin.contains("Hint"),
      s"cell join must not carry a broadcast hint:\n$opt")
  }

  test("ivf_knn_filtered: cell partition pruning AND label predicate both reach the scan") {
    val q = SparkEntry.queries("ivf_knn_filtered")(spark, sf0001)
    val ep = q.queryExecution.executedPlan.toString
    val scanLine = ep.linesIterator
      .find(l => l.contains("PartitionFilters") && l.contains("cell#"))
      .getOrElse("")
    assert(scanLine.contains("IN ("), s"no cell partition filter:\n$ep")
    assert(scanLine.contains("LessThanOrEqual(label"),
      s"label predicate not pushed to the index scan:\n$ep")
  }

  test("ann_full: probe scan stays partition-pruned with label pushdown THROUGH the composition") {
    val q = SparkEntry.queries("ann_full")(spark, sf0001)
    val ep = q.queryExecution.executedPlan.toString
    // the serving capstone composes train→encode→build→upsert→delete→
    // probe→rerank→audit; the probed index scan must still be
    // partition-pruned by the probe cell set AND carry the label
    // predicate — the composition must not launder the pruning away
    val scanLine = ep.linesIterator
      .find(l => l.contains("PartitionFilters") && l.contains("cell#"))
      .getOrElse("")
    assert(scanLine.contains("IN ("), s"no cell partition filter:\n$ep")
    assert(scanLine.contains("LessThanOrEqual(label"),
      s"label predicate not pushed to the index scan:\n$ep")
  }

  test("dedup_tfidf_pairs: postings self-join on the shingle — equi-join, no cartesian") {
    val p = planOf("dedup_tfidf_pairs")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    // the pair generator is an equi-join keyed on the shingle string (the
    // only nested-loop nodes are the 1-row corpus-stats broadcasts, the
    // same shape bm25 uses)
    assert(p.linesIterator.exists(l =>
      (l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")
        || l.contains("BroadcastHashJoin")) && l.contains("sh#")),
      s"sparse dot must be an equi-join on the shingle:\n$p")
  }

  test("text_hybrid_rrf: vector side is a scan + TakeOrdered, no corpus join") {
    val p = planOf("text_hybrid_rrf")
    // the dense ranking against a literal query vector must not join
    // anything corpus-sized — it is a scan + bounded TakeOrdered head
    assert(p.contains("TakeOrderedAndProject"), s"no TakeOrdered head:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
  }

  test("knn_shuffled: block-grid join — no broadcast at all, no nested loop") {
    val p = planOf("knn_shuffled")
    // axis replication is an explode of a literal array, so the whole
    // plan carries ZERO broadcasts and zero nested loops — both data
    // sides shuffle on the composite block key only
    assert(!p.contains("BroadcastNestedLoop"), s"nested loop in:\n$p")
    assert(!p.contains("BroadcastExchange"), s"broadcast in:\n$p")
    val join = p.linesIterator.find(l =>
      l.contains("Join") && l.contains("qblk") && l.contains("bblk"))
    assert(join.exists(l => l.contains("ShuffledHashJoin")
      || l.contains("SortMergeJoin")),
      s"grid join must shuffle on the composite block key:\n$p")
    // partial heap agg below the merge exchange: the second shuffle
    // carries O(|Q|*k) heap rows, not |Q|*|B| pairs
    val i = p.linesIterator.indexWhere(_.contains("partial_topkagg"))
    val j = p.linesIterator.indexWhere(l =>
      l.contains("Exchange hashpartitioning(query_id"))
    assert(i >= 0 && j >= 0 && j < i,
      s"partial heap agg must sit below the merge exchange:\n$p")
  }

  test("sq_adc_topk: broadcast only the query batch; partial heap agg below exchange") {
    val p = planOf("sq_adc_topk")
    // the query side broadcasts, the reconstructed base streams
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    // bounded-heap top-k partially aggregates before its shuffle — per
    // partition k rows per query, not |Q|·|B| pairs through the exchange
    val firstAgg = p.indexOf("ObjectHashAggregate")
    val exchange = p.indexOf("Exchange", firstAgg)
    val finalAgg = p.indexOf("ObjectHashAggregate", exchange)
    assert(firstAgg >= 0 && exchange > firstAgg && finalAgg > exchange, p)
  }

  test("kmeans_estep: native argmin in the plan, no UDF node") {
    val p = planOf("kmeans_estep")
    assert(p.contains("centroid_argmin"), p)
    assert(!p.contains("UDF"), p)
  }

  test("text_langid: profile join broadcasts the tiny profile side") {
    val p = planOf("text_langid")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("pipeline_pack: no single-partition exchange — the prefix sum is distributed") {
    val p = planOf("pipeline_pack")
    // the scale trap for global cumulative sums is
    // Exchange SinglePartition + a global Window; the distributed prefix
    // sum must never produce one
    assert(!p.contains("SinglePartition"), p)
    // the per-partition running window remains (partitioned by pid)
    assert(p.contains("Window"), p)
    // the partition-prefix dimension joins broadcast
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("pipeline_decontaminate: shingle-blocked equi-join, no cartesian") {
    val p = planOf("pipeline_decontaminate")
    for (j <- Seq("CartesianProduct", "BroadcastNestedLoopJoin"))
      assert(!p.contains(j), p)
  }

  test("bq_hamming_topk: broadcast query batch; partial heap agg below exchange") {
    val p = planOf("bq_hamming_topk")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    val firstAgg = p.indexOf("ObjectHashAggregate")
    val exchange = p.indexOf("Exchange", firstAgg)
    val finalAgg = p.indexOf("ObjectHashAggregate", exchange)
    assert(firstAgg >= 0 && exchange > firstAgg && finalAgg > exchange, p)
  }

  test("dedup_substring: hashed equi-join blocking, per-doc windows, no cartesian") {
    val p = planOf("dedup_substring")
    // duplicate-window detection is an equi-join on the window hash and
    // the island merge a per-doc window — never a pair blow-up or a
    // global single-partition sort
    for (j <- Seq("CartesianProduct", "BroadcastNestedLoopJoin"))
      assert(!p.contains(j), p)
    assert(!p.contains("SinglePartition"), p)
    assert(p.contains("Window"), p)
  }

  test("pipeline_shuffle: global permutation without a single-partition window") {
    val p = planOf("pipeline_shuffle")
    // the whole point of distributedRank here: a corpus-wide shuffle
    // order with no Exchange SinglePartition anywhere
    assert(!p.contains("SinglePartition"), p)
    assert(p.contains("Window"), p)
    // rank prefixes and the count row join as broadcasts
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("knn_graph: candidate generation is equi-keyed — no cartesian, no nested loop") {
    // the production query checkpoints per round (its final plan is a
    // bare scan); inspect one un-truncated round instead
    import graft.functions.VectorFunctions._
    val emb = Q.t(spark, sf0001, "embeddings")
      .select(col("vec_id").as("id"), toDouble(col("embedding")).as("vec"))
    val p = graft.operators.NNDescent
      .knnGraph(emb, "id", "vec", 10, iterations = 1, truncateLineage = false)
      .queryExecution.executedPlan.toString
    // neighbors-of-neighbors joins on the shared middle node; scoring
    // joins on the endpoint ids; the N^2 shapes must never appear
    for (j <- Seq("CartesianProduct", "BroadcastNestedLoopJoin"))
      assert(!p.contains(j), p)
    // per-node top-k partially aggregates before its exchange
    val firstAgg = p.indexOf("ObjectHashAggregate")
    val exchange = p.indexOf("Exchange", firstAgg)
    val finalAgg = p.indexOf("ObjectHashAggregate", exchange)
    assert(firstAgg >= 0 && exchange > firstAgg && finalAgg > exchange, p)
  }

  test("bq_rabitq_rerank: broadcast query batch, heap partials below the exchange") {
    val p = planOf("bq_rabitq_rerank")
    // corpus streams, the query batch (with its rotated vectors)
    // broadcasts — the knn_bruteforce placement
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    val firstAgg = p.indexOf("ObjectHashAggregate")
    val exchange = p.indexOf("Exchange", firstAgg)
    val finalAgg = p.indexOf("ObjectHashAggregate", exchange)
    assert(firstAgg >= 0 && exchange > firstAgg && finalAgg > exchange, p)
  }

  test("mm_phash_dedup: embarrassingly parallel kernel, one grouping exchange") {
    val p = planOf("mm_phash_dedup")
    // decode+hash is per-partition map work; the only shuffle is the
    // hash groupBy (partial agg before it), and nothing joins at all
    for (j <- Seq("CartesianProduct", "BroadcastNestedLoopJoin",
        "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin"))
      assert(!p.contains(j), p)
    val partial = p.indexOf("HashAggregate")
    val exchange = p.indexOf("Exchange", partial)
    assert(partial >= 0 && exchange > partial, p)
  }

  test("q32: interval join runs as a bucket equi-join — no nested loop") {
    val p = planOf("q32_interval_join")
    // the inequality predicate must ride a bucket-keyed hash join, never
    // a cartesian/nested-loop evaluation of |Δt| over all pairs
    for (j <- Seq("CartesianProduct", "BroadcastNestedLoopJoin"))
      assert(!p.contains(j), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"), p)
  }

  test("scans prune columns: q11 reads only the two needed orders columns") {
    val p = planOf("q11_orders_by_month")
    val schemaLine = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(schemaLine.contains("o_orderdate"), p)
    assert(schemaLine.contains("o_totalprice"), p)
    assert(!schemaLine.contains("o_orderpriority"), p)
    assert(!schemaLine.contains("o_custkey"), p)
  }

  test("ivf_range: index scan partition-pruned by the admissible cell set") {
    val q = SparkEntry.queries("ivf_range")(spark, sf0001)
    val ep = q.queryExecution.executedPlan.toString
    // same static pruning contract as ivf_knn: the union of per-query
    // admissible cells becomes a partition IN-filter on the index scan
    val scanLine = ep.linesIterator
      .find(l => l.contains("PartitionFilters") && l.contains("cell#"))
      .getOrElse("")
    assert(scanLine.contains("IN ("), s"no cell partition filter:\n$ep")
    // the probe side is the materialized localCheckpoint — the
    // radii+crossJoin subtree is not re-evaluated in the result plan
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("LogicalRDD"), s"probe side not materialized:\n$opt")
    assert(!opt.contains("Join Cross"),
      s"probe subtree re-evaluated inside the result plan:\n$opt")
  }

  test("pipeline_decontaminate_bloom: codegen bit-test prefilter BELOW the verify join") {
    val q = SparkEntry.queries("pipeline_decontaminate_bloom")(spark, sf0001)
    q.collect() // finalize AQE so WholeStageCodegen spans materialize
    val p = q.queryExecution.executedPlan.toString
    // the Bloom probe is plain column algebra (shiftright over the
    // plan-embedded word array) evaluated as a FILTER under the exact
    // verify join — candidates shrink before any shuffle
    val filterAt = p.indexOf("shiftright")
    assert(filterAt >= 0, s"no bloom bit-test filter in plan:\n$p")
    val joinAt = p.indexOf("SortMergeJoin") max p.indexOf("BroadcastHashJoin")
    assert(joinAt >= 0, p)
    assert(filterAt > joinAt,
      s"bloom filter should sit below (after, in toString order) the verify join:\n$p")
    // and the bit-test filter itself runs inside a whole-stage-codegen span
    // (final AQE plans print codegen as a `*(n)` prefix on the operator line)
    val filterLine = p.linesIterator
      .find(l => l.contains("Filter") && l.contains("shiftright")).getOrElse("")
    assert(filterLine.contains("*("),
      s"bloom bit-test filter not codegen'd: $filterLine")
  }

  test("pipeline_decontaminate_spans: rolling kernel feeds an equi-join, no cartesian") {
    val p = planOf("pipeline_decontaminate_spans")
    // the train-vs-eval probe is an equi-join on the 8-byte window hash
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // both sides hash windows with the native rolling expression, never
    // a per-window digest
    assert(p.contains("rolling_hash_windows"), p)
    assert(!p.toLowerCase.contains("md5(substring"), p)
  }

  test("pipeline_split: one small-side join, no corpus-sized shuffle surprises") {
    val p = planOf("pipeline_split")
    assert(!p.contains("CartesianProduct"), p)
    // the component table joins the doc table as a plain equi-join
    assert(p.contains("Join") || p.contains("join"), p)
  }

  test("text_cms: sketch counts partially aggregate before their exchange") {
    val p = planOf("text_cms")
    assert(!p.contains("CartesianProduct"), p)
    // the (j, bucket) count — the sketch matrix build — must map-side
    // combine: a HashAggregate appears below its Exchange
    val firstAgg = p.indexOf("HashAggregate")
    val exchange = p.indexOf("Exchange", firstAgg)
    val finalAgg = p.indexOf("HashAggregate", exchange)
    assert(firstAgg >= 0 && exchange > firstAgg && finalAgg > exchange, p)
  }

  test("pipeline_binpack: one grouping exchange, no single-partition collapse") {
    val p = planOf("pipeline_binpack")
    assert(!p.contains("CartesianProduct"), p)
    // parallelism is the group key: no Exchange SinglePartition anywhere
    assert(!p.contains("SinglePartition"), p)
  }

  test("text_cooccurrence: window pairing is an equi-join, never per-doc quadratic") {
    val p = planOf("text_cooccurrence")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("dedup_edit_pairs: DP only below blocked equi-joins, no cartesian") {
    val p = planOf("dedup_edit_pairs")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the levenshtein verify must sit above the candidate join, not on a
    // corpus-sized pair set — banding shows as equi self-joins on bands
    assert(p.contains("levenshtein"), p)
  }

  test("embed_pca: final scores are a shuffle-free projection scan") {
    // the fit's jobs have executed by build time; what remains — the
    // per-row projection against the broadcast components — must be a
    // map-only scan: any Exchange here breaks the one-pass score story
    val p = planOf("embed_pca")
    assert(!p.contains("Exchange"), s"projection grew a shuffle:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("pca moments: constant-state aggregate, no exploded pair rows") {
    import org.apache.spark.sql.functions._
    val emb = graft.queries.Q.t(spark, sf0001, "embeddings")
      .select(graft.functions.VectorFunctions.toDouble(col("embedding")).as("v"))
    val p = emb
      .agg(graft.functions.CovMomentsAgg.covMoments(col("v"), 64))
      .queryExecution.executedPlan.toString
    // the O(N·d²) multiplies stay INSIDE the aggregate kernel: the plan
    // must carry no Generate (posexplode) and partial-aggregate before
    // its single gather exchange
    assert(!p.contains("Generate"), s"moments re-grew an explode:\n$p")
    val firstAgg = p.indexOf("Aggregate")
    val exchange = p.indexOf("Exchange", firstAgg)
    val finalAgg = p.indexOf("Aggregate", exchange)
    assert(firstAgg >= 0 && exchange > firstAgg && finalAgg > exchange,
      s"moments aggregate does not partial-aggregate:\n$p")
  }

  test("eval_selection_coverage: attribution report joins nothing corpus-sized twice") {
    val p = planOf("eval_selection_coverage")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("text_unigram_encode: pure mapPartitions scan — zero Exchange") {
    // the serving pass's whole scale argument: model in the closure,
    // DP per partition, nothing shuffles
    val p = planOf("text_unigram_encode")
    assert(!p.contains("Exchange"), s"unigram encode grew a shuffle:\n$p")
  }

  test("dedup_winnow: capped inverted-index equi-joins, no cartesian") {
    val p = planOf("dedup_winnow")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("graph-audit tier: wedge/h-index/modularity joins stay equi-keyed") {
    // the triangle wedge join and every audit aggregate must remain
    // hash-keyed — a cartesian or nested loop here is corpus² at scale
    for (name <- Seq(
        "knn_graph_triangles", "knn_graph_kcore",
        "knn_graph_modularity", "knn_graph_assortativity",
        "knn_graph_link_pred", "cluster_hierarchy",
        "dedup_jaccard_prefix")) {
      val p = planOf(name)
      assert(!p.contains("CartesianProduct"), s"$name:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name:\n$p")
    }
  }

  test("serving halves stay zero-Exchange: wordpiece encode, salience, spherical assign") {
    // each ships a driver-small frozen model in the closure / as a map
    // literal and scans once — a shuffle in any of them is a design
    // break (they are also the streaming twins' exact plans)
    for (name <- Seq(
        "text_wordpiece_encode", "text_textrank_salience",
        "kmeans_spherical_assign")) {
      val p = planOf(name)
      assert(!p.contains("Exchange"), s"$name grew a shuffle:\n$p")
    }
  }

  test("knn_lsh: bucket equi-joins + partial heap before the final exchange") {
    val p = planOf("knn_lsh")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the rerank's bounded heap partially aggregates before its shuffle
    val firstAgg = p.indexOf("ObjectHashAggregate")
    val exchange = p.indexOf("Exchange", firstAgg)
    val finalAgg = p.indexOf("ObjectHashAggregate", exchange)
    assert(firstAgg >= 0 && exchange > firstAgg && finalAgg > exchange, p)
  }

  test("louvain + textrank: every round join stays equi-keyed") {
    for (name <- Seq("knn_graph_louvain", "knn_graph_louvain2", "text_textrank")) {
      val p = planOf(name)
      assert(!p.contains("CartesianProduct"), s"$name:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name:\n$p")
    }
  }

  test("walk/BFS/betweenness tier: every step join stays equi-keyed") {
    for (name <- Seq("knn_graph_walks", "knn_graph_node2vec",
        "knn_graph_walks_weighted",
        "knn_graph_distances", "knn_graph_closeness",
        "knn_graph_betweenness", "eval_walk_coverage")) {
      val p = planOf(name)
      assert(!p.contains("CartesianProduct"), s"$name:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name:\n$p")
    }
  }

  test("mm_scene_cuts: in-kernel lag - ZERO Exchange in the plan") {
    val p = planOf("mm_scene_cuts")
    assert(!p.contains("Exchange"), p)
  }

  test("text_blocklist: dictionary arrives by BROADCAST hash join, never a per-doc scan") {
    val p = planOf("text_blocklist")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("round-12 audit queries: every candidate generator stays banded/equi-keyed") {
    // dedup_lsh_plan's per-config joins are (bands, band, sig)-bucketed,
    // the threshold curve / cascade / SCAN pair generators are inverted-
    // index or 16-bit-band equi-joins — a cartesian or nested loop in any
    // of them is corpus² at scale. (The 1-row totals broadcasts in
    // text_kl_drift / dedup_lsh_plan are benign by construction and do
    // not appear as BNLJ over corpus-sized sides.)
    for (name <- Seq(
        "dedup_lsh_plan", "dedup_threshold_curve",
        "pipeline_dedup_cascade", "knn_graph_scan",
        "eval_classifier_auc")) {
      val p = planOf(name)
      assert(!p.contains("CartesianProduct"), s"$name:\n$p")
    }
    // the threshold curve re-verifies nothing: exactly ONE shingle
    // self-join aggregation feeds all 8 tau rows, so the plan contains
    // one `common`-shaped count aggregate keyed by (doc_a, doc_b)
    val p = planOf("dedup_threshold_curve")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }
}
