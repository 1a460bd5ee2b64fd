package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-10 surface additions (SURVEY §2.11ca): the round's machinery
  * exposed as oracle-checked capability, following the r8/r9 pattern.
  */
object Round10Ops {

  val all: Seq[Q] = Seq.empty
}
