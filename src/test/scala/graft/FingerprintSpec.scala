package graft

import org.apache.spark.sql.functions._
import graft.operators.{DistributedHnsw, HnswParams, KMeans}
import graft.queries.Q
import graft.functions.VectorFunctions.toDouble

/** Cross-run fingerprint pins on the rows-only artifacts (round-12
  * verdict item 3): the seeded HNSW build and the seeded k-means fit are
  * deterministic BY CONSTRUCTION (per-shard id-sorted insert + seed+shard
  * RNG; fixed init sample + hash-agg M-step), and the recall/bounds gates
  * would NOT notice silent nondeterminism creeping in (e.g. a future
  * parallel insert reordering the heap walk, a sample() semantics change).
  * These pins fail on ANY build-order change.
  *
  * Each pin is checked at BOTH sf0.01 and sf0.001 (r13 verdict item #6):
  * the two dirs produce different partition counts and shard populations,
  * so a partition-count-sensitive regression can't hide behind a
  * single-SF constant.
  *
  * The pinned literals are a contract of THIS environment: the driver
  * testdata + the spec session (local[4], shuffle.partitions=4). If a
  * deliberate algorithm change moves them, re-pin with the printed value
  * and say why in the commit.
  */
class FingerprintSpec extends SparkSpec {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def hnswEdgeFingerprint(dir: String): String = {
    val emb = Q.t(spark, dir, "embeddings")
      .select(col("vec_id"), toDouble(col("embedding")).as("vec"))
    val s = DistributedHnsw.build(
      emb, "vec_id", "vec",
      HnswParams(m = 16, efConstruction = 100, deterministicLevels = true),
      numShards = 4, seed = 42)
    val perShard = s.edges
      .orderBy(col("shard"), col("layer"), col("src"), col("dst"))
      .collect()
      .map(r => (r.getInt(0), s"${r.getInt(1)},${r.getLong(2)},${r.getLong(3)}"))
      .groupBy(_._1)
      .map { case (sh, rows) => sh -> md5Hex(rows.map(_._2).mkString("\n")) }
    perShard.toSeq.sortBy(_._1)
      .map { case (sh, h) => s"$sh:$h" }.mkString(" ")
  }

  test("HNSW det-level build: per-shard edge-table md5 pinned at both SFs") {
    for ((dir, want) <- Seq(
        sf001 ->
          ("0:4e65ec99b5ea1363aa15abe1f7f26814 " +
            "1:88350acf9cf8e26e2d26bf209060bb40 " +
            "2:a820d6762d2aa531f89ad9aced5a8493 " +
            "3:8bffba0ebd902c1c35da5903834adf39"),
        sf0001 -> ("0:6d1b1ee7d2be5ed0503b3e1b9670e785 " +
            "1:8a0b97c98260db4a9300c06677711b04 " +
            "2:93f84d74657282e9b9dbcf2cc00c7922 " +
            "3:108a23599f8ba0c6451be48b278799ce"))) {
      val got = hnswEdgeFingerprint(dir)
      info(s"hnsw edge fingerprints ($dir): $got")
      assert(got == want,
        s"HNSW built edge table changed at $dir: $got — deterministic-build " +
          "contract broken (or a deliberate algorithm change: re-pin and justify)")
    }
  }

  private def kmeansFingerprint(dir: String): String = {
    val emb = Q.t(spark, dir, "embeddings")
      .select(toDouble(col("embedding")).as("v"))
    val r = KMeans.fit(emb, "v", k = 8, seed = 42, maxIter = 8)
    // round to 9 decimals before hashing: the M-step's float sums may
    // differ in last-ulp across partition layouts; any REAL trajectory
    // change (different init sample, different assignment) moves every
    // digit
    val body = r.centroids.zipWithIndex
      .map { case (c, ci) =>
        s"$ci:" + c.map(x => f"${math.rint(x * 1e9) / 1e9}%.9f").mkString(",")
      }
      .mkString("\n")
    md5Hex(body)
  }

  test("kmeans_fit: centroid table md5 pinned at both SFs (1e-9 rounding)") {
    for ((dir, want) <- Seq(
        sf001 -> "ac2567a815eae827f1c0baed0bd48895",
        sf0001 -> "d15503069c8798e3c245c8e491f252bc")) {
      val got = kmeansFingerprint(dir)
      info(s"kmeans centroid fingerprint ($dir): $got")
      assert(got == want,
        s"kmeans_fit centroid table changed at $dir: $got — seeded-fit " +
          "contract broken (or a deliberate algorithm change: re-pin and justify)")
    }
  }

  private def pqCodeFingerprint(dir: String): String = {
    // the artifact hnsw_knn_pq searches over: seeded PQ codebook train +
    // corpus encode, cogrouped per shard — pins the codebook AND the
    // encode argmin in one hash
    import graft.operators.{PQCompression, ProductQuantizer}
    val emb = Q.t(spark, dir, "embeddings")
      .select(col("vec_id"), toDouble(col("embedding")).as("vec"))
    val comp = new PQCompression(
      ProductQuantizer.train(emb, "vec", m = 8, k = 64, seed = 42))
    val s = DistributedHnsw.build(
      emb, "vec_id", "vec",
      HnswParams(m = 16, efConstruction = 100),
      numShards = 4, seed = 42, compression = Some(comp))
    val codes = s.codes.getOrElse(fail("pq build carries no code table"))
    val perShard = codes
      .orderBy(col("shard"), col("id"))
      .collect()
      .map(r => (r.getInt(0),
        s"${r.getLong(1)}:${r.getSeq[Short](2).mkString(",")}"))
      .groupBy(_._1)
      .map { case (sh, rows) => sh -> md5Hex(rows.map(_._2).mkString("\n")) }
    perShard.toSeq.sortBy(_._1)
      .map { case (sh, h) => s"$sh:$h" }.mkString(" ")
  }

  test("hnsw_knn_pq: per-shard code-table md5 pinned at both SFs") {
    for ((dir, want) <- Seq(
        sf001 ->
          ("0:cf1176952c763ccf4185fbe9e357605f " +
            "1:b80474db1e231f45cb7dbe1c3d8bf94a " +
            "2:2da12831dab9b9368d0cf2f9148aea91 " +
            "3:f2ba95a8f3fd325b7c4e0b450e46a562"),
        sf0001 -> ("0:985daf64e6f6489164c103525f180103 " +
            "1:f6bec643add8008f109278ed85b7d46b " +
            "2:2a62909cbcce74336986dc860ae60fd9 " +
            "3:01cebe9f48c9c50cc735c0c20f7663c4"))) {
      val got = pqCodeFingerprint(dir)
      info(s"pq code-table fingerprints ($dir): $got")
      assert(got == want,
        s"hnsw_knn_pq code table changed at $dir: $got — seeded-train/encode " +
          "contract broken (or a deliberate algorithm change: re-pin and justify)")
    }
  }

  private def opqRotationFingerprint(dir: String): String = {
    // the eigensolver-derived half of pq_opq_recon: same sample + train
    // call as the query (m=8, k=16, seed=7 over the seed-7 20k sample);
    // 1e-9 rounding absorbs last-ulp drift, any real spectrum/sign
    // change moves every digit
    import graft.operators.{Opq, ProductQuantizer}
    val emb = Q.t(spark, dir, "embeddings")
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val rows = ProductQuantizer.sampleRows(emb, "v", maxSample = 20000, seed = 7)
    val opq = Opq.trainRows(rows, m = 8, k = 16, seed = 7)
    val body = opq.rotation.zipWithIndex
      .map { case (r, i) =>
        s"$i:" + r.map(x => f"${math.rint(x * 1e9) / 1e9}%.9f").mkString(",")
      }
      .mkString("\n")
    md5Hex(body)
  }

  test("pq_opq_recon: OPQ rotation matrix md5 pinned at both SFs (1e-9 rounding)") {
    for ((dir, want) <- Seq(
        sf001 -> "ea44dc840edcfefd9a7db07087e676d9",
        sf0001 -> "83c79217780f8ae13e7ae3d3756ea2e5")) {
      val got = opqRotationFingerprint(dir)
      info(s"opq rotation fingerprint ($dir): $got")
      assert(got == want,
        s"pq_opq_recon rotation changed at $dir: $got — deterministic-eigensolve " +
          "contract broken (or a deliberate algorithm change: re-pin and justify)")
    }
  }
}
