package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.EdgeSource

/** importGraph parity (src/main.cc:78-112): CSV parse, \r tolerance,
  * duplicate-edge dropping, vertex closure with dangling targets. */
class EdgeSourceSpec extends AnyFunSuite with GraphFixtures {

  test("csv edge list: parses src,dst; tolerates \\r\\n; drops duplicate edges") {
    val dir = Files.createTempDirectory("graft-csv")
    val f = dir.resolve("edges.csv")
    Files.writeString(f, "1,2\r\n1,2\n2,3\r\n3,3\n1,2\n")
    val edges = EdgeSource.readCsv(spark, f.toString)
    val got = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (2L, 3L), (3L, 3L))) // dupes dropped (main.cc:102-106)
  }

  test("vertex closure includes pure-sink nodes (main.cc:98-99)") {
    val edges = edgesDf(Seq((1L, 2L), (2L, 5L)))
    val vs = EdgeSource.vertices(edges).collect().map(_.getLong(0)).toSet
    assert(vs == Set(1L, 2L, 5L))
    val od = EdgeSource.outDegrees(edges, EdgeSource.vertices(edges))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(od == Map(1L -> 1L, 2L -> 1L, 5L -> 0L))
  }

  test("undirected closure drops self-loops and dedups both directions") {
    val edges = edgesDf(Seq((1L, 2L), (2L, 1L), (3L, 3L), (2L, 4L)))
    val und = EdgeSource.undirected(edges).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(und == Set((1L, 2L), (2L, 1L), (2L, 4L), (4L, 2L)))
    val can = EdgeSource.canonical(edges).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(can == Set((1L, 2L), (2L, 4L)))
  }
}
