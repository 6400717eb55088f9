package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LayeredGraph

/** Ports of the reference's Graph-class tests (py/test_hnsw.py:7-121). */
class LayeredGraphSpec extends AnyFunSuite {

  test("empty graph: height 0, empty layers") {
    val g = new LayeredGraph
    assert(g.height == 0)
    assert(g.isLayerEmpty(0))
    assert(g.layerNodeCount(0) == 0)
    assert(g.neighbors(0, 5).isEmpty)
  }

  test("ensureLayers / addNode grow height; nodes start edge-less") {
    val g = new LayeredGraph
    g.ensureLayers(2)
    assert(g.height == 3)
    assert(g.isLayerEmpty(2))
    g.addNode(2, 7)
    assert(!g.isLayerEmpty(2))
    assert(g.layerNodeCount(2) == 1)
    assert(g.layerAdjCount(2, 7) == 0)
  }

  test("addEdge is bidirectional and idempotent (py/hnsw.py:90-99)") {
    val g = new LayeredGraph
    g.addEdge(0, 1, 2)
    g.addEdge(0, 1, 2) // idempotent via set semantics
    g.addEdge(0, 2, 1)
    assert(g.neighbors(0, 1).toSet == Set(2))
    assert(g.neighbors(0, 2).toSet == Set(1))
    assert(g.layerAdjCount(0, 1) == 1)
  }

  test("removeEdge is one-directional (py/hnsw.py:108-117)") {
    val g = new LayeredGraph
    g.addEdge(0, 1, 2)
    g.removeEdge(0, 1, 2)
    assert(g.neighbors(0, 1).isEmpty)
    assert(g.neighbors(0, 2).toSet == Set(1)) // reverse edge survives
  }

  test("updateConnections replaces the adjacency wholesale (py/hnsw.py:322-335)") {
    val g = new LayeredGraph
    g.addEdge(0, 1, 2)
    g.addEdge(0, 1, 3)
    g.addEdge(0, 1, 4)
    g.updateConnections(0, 1, Seq(2))
    assert(g.neighbors(0, 1).toSet == Set(2))
    // one-directional: 3 and 4 still point at 1 (asymmetry, SURVEY §1.1)
    assert(g.neighbors(0, 3).toSet == Set(1))
    assert(g.neighbors(0, 4).toSet == Set(1))
  }

  test("layerNodes and edgeIterator enumerate the structure") {
    val g = new LayeredGraph
    g.addEdge(0, 1, 2)
    g.addEdge(1, 1, 3)
    assert(g.layerNodes(0).toSet == Set(1, 2))
    assert(g.layerNodes(1).toSet == Set(1, 3))
    val edges = g.edgeIterator.toSet
    assert(edges == Set((0, 1, 2), (0, 2, 1), (1, 1, 3), (1, 3, 1)))
  }
}
