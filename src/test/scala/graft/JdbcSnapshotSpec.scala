package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.JdbcSnapshot

class JdbcSnapshotSpec extends AnyFunSuite {
  test("partitioningFor bounds rows per task") {
    val p = JdbcSnapshot.partitioningFor("id", 0, 10000000, rowCount = 25000000)
    assert(p.numPartitions === 25)
    assert(JdbcSnapshot.partitioningFor("id", 0, 10, 5).numPartitions === 1)
  }
  test("options carry the partitioned-scan contract") {
    val o = JdbcSnapshot.options("jdbc:postgresql://h/db", "public.users",
      JdbcSnapshot.Partitioning("id", 0, 1000, 4))
    assert(o("partitionColumn") === "id" && o("numPartitions") === "4" &&
      o("lowerBound") === "0" && o("upperBound") === "1000")
  }
}
