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
  * The pinned literals are a contract of THIS environment: sf0.01
  * testdata + the spec session (local[4], shuffle.partitions=4). If a
  * deliberate algorithm change moves them, re-pin with the printed value
  * and say why in the commit.
  */
class FingerprintSpec extends SparkSpec {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("HNSW det-level build: per-shard edge-table md5 pinned at sf0.01") {
    val emb = Q.t(spark, sf001, "embeddings")
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
    val got = perShard.toSeq.sortBy(_._1)
      .map { case (sh, h) => s"$sh:$h" }.mkString(" ")
    info(s"hnsw edge fingerprints: $got")
    assert(got ==
      "0:4e65ec99b5ea1363aa15abe1f7f26814 " +
      "1:88350acf9cf8e26e2d26bf209060bb40 " +
      "2:a820d6762d2aa531f89ad9aced5a8493 " +
      "3:8bffba0ebd902c1c35da5903834adf39",
      s"HNSW built edge table changed: $got — deterministic-build contract broken " +
        "(or a deliberate algorithm change: re-pin and justify)")
  }

  test("kmeans_fit: centroid table md5 pinned at sf0.01 (1e-9 rounding)") {
    val emb = Q.t(spark, sf001, "embeddings")
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
    val got = md5Hex(body)
    info(s"kmeans centroid fingerprint: $got")
    assert(got == "ac2567a815eae827f1c0baed0bd48895",
      s"kmeans_fit centroid table changed: $got — seeded-fit contract broken " +
        "(or a deliberate algorithm change: re-pin and justify)")
  }

  test("hnsw_knn_pq: per-shard code-table md5 pinned at sf0.01") {
    // the artifact hnsw_knn_pq searches over: seeded PQ codebook train +
    // corpus encode, cogrouped per shard — pins the codebook AND the
    // encode argmin in one hash (the last rows-only family member whose
    // stored table had no pin)
    import graft.operators.{PQCompression, ProductQuantizer}
    val emb = Q.t(spark, sf001, "embeddings")
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
    val got = perShard.toSeq.sortBy(_._1)
      .map { case (sh, h) => s"$sh:$h" }.mkString(" ")
    info(s"pq code-table fingerprints: $got")
    assert(got ==
      "0:cf1176952c763ccf4185fbe9e357605f " +
      "1:b80474db1e231f45cb7dbe1c3d8bf94a " +
      "2:2da12831dab9b9368d0cf2f9148aea91 " +
      "3:f2ba95a8f3fd325b7c4e0b450e46a562",
      s"hnsw_knn_pq code table changed: $got — seeded-train/encode contract " +
        "broken (or a deliberate algorithm change: re-pin and justify)")
  }

  test("pq_opq_recon: OPQ rotation matrix md5 pinned at sf0.01 (1e-9 rounding)") {
    // the eigensolver-derived half of pq_opq_recon: same sample + train
    // call as the query (m=8, k=16, seed=7 over the seed-7 20k sample);
    // 1e-9 rounding absorbs last-ulp drift, any real spectrum/sign
    // change moves every digit
    import graft.operators.{Opq, ProductQuantizer}
    val emb = Q.t(spark, sf001, "embeddings")
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val rows = ProductQuantizer.sampleRows(emb, "v", maxSample = 20000, seed = 7)
    val opq = Opq.trainRows(rows, m = 8, k = 16, seed = 7)
    val body = opq.rotation.zipWithIndex
      .map { case (r, i) =>
        s"$i:" + r.map(x => f"${math.rint(x * 1e9) / 1e9}%.9f").mkString(",")
      }
      .mkString("\n")
    val got = md5Hex(body)
    info(s"opq rotation fingerprint: $got")
    assert(got == "ea44dc840edcfefd9a7db07087e676d9",
      s"pq_opq_recon rotation changed: $got — deterministic-eigensolve " +
        "contract broken (or a deliberate algorithm change: re-pin and justify)")
  }
}
