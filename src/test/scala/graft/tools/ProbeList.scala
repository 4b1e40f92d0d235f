package graft
object ProbeList {
  def main(args: Array[String]): Unit = {
    println("NAMES " + graft.queries.Registry.all.map(_.name).sorted.mkString(","))
  }
}
