package graft

import org.scalatest.Tag

/** Marks wall-clock timing gates (ratio-based perf assertions). They run
  * in the normal `sbt test` pass but self-cancel on saturated hosts; to
  * exclude them entirely: `sbt 'testOnly * -- -l graft.PerfGate'`.
  */
object PerfGate extends Tag("graft.PerfGate")
