package graft.operators

import scala.collection.mutable

/** Mutable layered adjacency graph — the reference's `Graph` class surface
  * (ref: py/hnsw.py:9-117) as a standalone structure: per layer a
  * node -> neighbor-set adjacency map, edges added pairwise, idempotent
  * adds, whole-adjacency replacement for the shrink path. Used inside the
  * partition-local [[HnswIndex]]; the distributed form of the same state is
  * the (shard, layer, src, dst) edge table ([[DistributedHnsw.Shards]]).
  */
final class LayeredGraph {

  private val layers =
    mutable.ArrayBuffer[mutable.HashMap[Int, mutable.HashSet[Int]]]()

  /** Number of layers (ref: GetHeight, py/hnsw.py:15-17). */
  def height: Int = layers.length

  /** Ensure layers 0..l exist (ref: InitLevels, py/hnsw.py:84-89 — there
    * lazily via Insert's extension loop).
    */
  def ensureLayers(l: Int): Unit =
    while (layers.length <= l) layers += mutable.HashMap.empty

  /** True when the layer holds no nodes (ref: IsLayerEmpty, py/hnsw.py:19-24). */
  def isLayerEmpty(l: Int): Boolean = layerNodeCount(l) == 0

  /** Distinct nodes present on a layer (ref: LayerNodeCnt, py/hnsw.py:26-33). */
  def layerNodeCount(l: Int): Int =
    if (l < height) layers(l).size else 0

  /** Degree of one node on a layer (ref: LayerNodeAdjCnt, py/hnsw.py:35-44). */
  def layerAdjCount(l: Int, node: Int): Int =
    if (l < height) layers(l).get(node).map(_.size).getOrElse(0) else 0

  /** Neighbor set of a node (ref: GetNeighbors, py/hnsw.py:59-70). */
  def neighbors(l: Int, node: Int): Iterable[Int] =
    if (l < height) layers(l).getOrElse(node, Iterable.empty)
    else Iterable.empty

  /** All nodes on a layer (ref: GetLayerNodes, py/hnsw.py:72-82). */
  def layerNodes(l: Int): Iterable[Int] =
    if (l < height) layers(l).keys else Iterable.empty

  /** Register a node with no edges yet. */
  def addNode(l: Int, node: Int): Unit = {
    ensureLayers(l)
    layers(l).getOrElseUpdate(node, mutable.HashSet.empty)
  }

  /** Idempotent bidirectional edge add (ref: AddEdge, py/hnsw.py:90-99 —
    * pairwise per py/hnsw.py:377-379).
    */
  def addEdge(l: Int, a: Int, b: Int): Unit = {
    ensureLayers(l)
    layers(l).getOrElseUpdate(a, mutable.HashSet.empty) += b
    layers(l).getOrElseUpdate(b, mutable.HashSet.empty) += a
  }

  /** Remove one directed edge (ref: RemoveEdge, py/hnsw.py:108-117). */
  def removeEdge(l: Int, a: Int, b: Int): Unit =
    if (l < height) layers(l).get(a).foreach(_ -= b)

  /** Replace a node's entire adjacency — the overfull-neighbor shrink
    * (ref: UpdateConnection, py/hnsw.py:322-335; note this one-directional
    * replacement is what lets the graph become asymmetric, SURVEY.md §1.1).
    */
  def updateConnections(l: Int, node: Int, newNeighbors: Iterable[Int]): Unit = {
    ensureLayers(l)
    layers(l)(node) = mutable.HashSet(newNeighbors.toSeq: _*)
  }

  /** Edge iterator for export to the distributed edge table. */
  def edgeIterator: Iterator[(Int, Int, Int)] =
    for {
      l <- (0 until height).iterator
      (src, nbs) <- layers(l).iterator
      dst <- nbs.iterator
    } yield (l, src, dst)
}
