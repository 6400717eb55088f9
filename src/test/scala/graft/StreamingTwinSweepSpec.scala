package graft

/** Streaming-twin drift gate (the InventorySpec discipline applied to the
  * §2.G symmetry): every query FAMILY in `SparkEntry.queries` must either
  * name at least one streaming twin — a real method on
  * [[graft.streaming.StreamingOps]], verified by reflection so a renamed
  * or deleted twin fails the build — or carry a documented n/a with the
  * reason the family has no online half. A new family landing without
  * either fails here, so the batch surface can't silently outgrow the
  * streaming one. The census previously lived in prose (COVERAGE §2.G);
  * this makes it machine-checked.
  */
class StreamingTwinSweepSpec extends SparkSpec {

  private def familyOf(name: String): String =
    if (name.matches("q\\d+_.*")) "relational"
    else if (name.startsWith("knn_graph_")) "knn_graph"
    else name.takeWhile(_ != '_')

  /** family -> Right(twin method names on StreamingOps) | Left(n/a reason) */
  private val census: Map[String, Either[String, Seq[String]]] = Map(
    "relational" -> Right(Seq("hourlyCounts", "slidingCounts", "sessions",
      "dedup", "runningPerUser", "purchaseSignupJoin", "funnelStream")),
    "dedup" -> Right(Seq("simhashDedupStream", "winnowSignatureStream",
      "leakSafeSplitStream")),
    "pipeline" -> Right(Seq("decontaminateStream", "decontaminateFuzzyStream",
      "decontaminateCascadeStream", "temperatureSampleStream",
      "dsirScoreStream", "leakSafeSplitStream", "funnelStream")),
    "text" -> Right(Seq("qldScoreStream", "textRankSalienceStream",
      "c4ScrubStream", "gopherFilterStream", "blocklistAdmitStream",
      "unigramEncodeStream", "wordPieceEncodeStream", "featureHashStream",
      "heavyHittersStream", "cmsStream", "klDriftCountsStream",
      "winnowAdmitStream")),
    "knn" -> Right(Seq("embeddingAdmitStream", "vectorAppendSink")),
    "knn_graph" -> Right(Seq("incrementalKnnGraphSink", "walkExtendSink",
      "scanCensusSink")),
    "hnsw" -> Right(Seq("incrementalHnswSink")),
    "ivf" -> Right(Seq("incrementalIvfSink", "cdcIvfSink")),
    "ivfadc" -> Right(Seq("incrementalIvfAdcSink", "cdcIvfAdcSink")),
    "rpt" -> Right(Seq("rptAssignStream")),
    "kmeans" -> Right(Seq("sphericalAssignStream", "exemplarAssignStream")),
    "cluster" -> Right(Seq("exemplarAssignStream")),
    "embed" -> Right(Seq("pcaProjectStream", "pcaOutlierStream")),
    "mm" -> Right(Seq("videoHashStream", "sceneCutStream",
      "audioFingerprintStream")),
    "eval" -> Left("offline evaluation harnesses over frozen artifacts " +
      "(recall/agreement/calibration have no online half by design)"),
    "pq" -> Left("stateless row-local encode under frozen codebooks; the " +
      "compressed ARTIFACT is maintained online by incrementalHnswSink/" +
      "incrementalIvfAdcSink"),
    "rq" -> Left("stateless row-local encode under frozen stage codebooks " +
      "(same contract as pq)"),
    "sq" -> Left("stateless row-local encode under frozen min/max scales " +
      "(same contract as pq)"),
    "bq" -> Left("stateless row-local sign-bit encode; serving rides the " +
      "maintained vector store (vectorAppendSink)"),
    "ann" -> Left("composition capstone over ivf+hnsw, each maintained by " +
      "its own incremental sink"),
    "range" -> Left("stateless per-query radius probe over the maintained " +
      "IVF artifact"),
    "zorder" -> Left("write-path storage layout (batch clustering of " +
      "parquet files); no online semantics")
  )

  private lazy val streamingMethods: Set[String] =
    graft.streaming.StreamingOps.getClass.getMethods.map(_.getName).toSet

  /** Families with neither a verified twin nor a documented n/a. */
  private def violations(queryNames: Iterable[String]): Seq[String] = {
    val families = queryNames.map(familyOf).toSet
    val missing = families.filterNot(census.contains)
      .map(f => s"family '$f' has no streaming-twin census entry")
    val stale = census.collect {
      case (f, Right(twins)) =>
        twins.filterNot(streamingMethods.contains)
          .map(t => s"family '$f' names twin '$t' not found on StreamingOps")
    }.flatten
    val blank = census.collect {
      case (f, Left(reason)) if reason.trim.length < 20 =>
        s"family '$f' n/a reason too thin to count as documented"
    }
    (missing.toSeq ++ stale ++ blank).sorted
  }

  test("every query family has a streaming twin or a documented n/a") {
    val bad = violations(SparkEntry.queries.keys)
    assert(bad.isEmpty, s"streaming-twin census drift:\n${bad.mkString("\n")}")
  }

  test("detector: a seeded twin-less family fails the census") {
    val bad = violations(SparkEntry.queries.keys ++ Seq("newfam_widget"))
    assert(bad.exists(_.contains("newfam")), "seeded family not detected")
  }

  test("census names only families that exist (no dead allowlist rows)") {
    val families = SparkEntry.queries.keys.map(familyOf).toSet
    val dead = census.keys.filterNot(families.contains)
    assert(dead.isEmpty, s"census rows for nonexistent families: $dead")
  }
}
