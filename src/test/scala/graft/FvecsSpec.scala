package graft

import java.nio.file.Files

import graft.sources.Fvecs

/** fvecs source round-trip (SURVEY.md §2 A1; format per py/hnsw.ipynb
  * cell-1: int32 dim header + dim float32s, little-endian).
  */
class FvecsSpec extends SparkSpec {
  import spark.implicits._

  test("write/read round-trip preserves ids, dims and values") {
    val dir = Files.createTempDirectory("fvecs").toString
    val path = s"$dir/test.fvecs"
    val data = (0L until 20L).map(i =>
      (i, (0 until 8).map(j => (i * 8 + j).toFloat).toArray)
    )
    Fvecs.write(data.toDF("id", "vec"), "id", "vec", path)
    val back = Fvecs.read(spark, path).orderBy("id").collect()
    assert(back.length == 20)
    data.foreach { case (i, v) =>
      assert(back(i.toInt).getSeq[Float](1).toArray.toSeq == v.toSeq)
    }
  }

  test("decode rejects corrupt rows") {
    val bad = Array[Byte](5, 0, 0, 0, 1, 2) // dim=5 but only 2 bytes follow
    assertThrows[IllegalArgumentException] {
      Fvecs.decode(bad).toArray
    }
  }

  test("multi-file read assigns dense ids in file order") {
    val dir = Files.createTempDirectory("fvecs2").toString
    val a = (0L until 3L).map(i => (i, Array(i.toFloat)))
    val b = (0L until 2L).map(i => (i, Array((100 + i).toFloat)))
    Fvecs.write(a.toDF("id", "vec"), "id", "vec", s"$dir/a.fvecs")
    Fvecs.write(b.toDF("id", "vec"), "id", "vec", s"$dir/b.fvecs")
    val back = Fvecs.read(spark, dir).orderBy("id").collect()
    assert(back.map(_.getLong(0)).toSeq == (0L until 5L))
    assert(back(3).getSeq[Float](1).head == 100.0f)
  }
}
