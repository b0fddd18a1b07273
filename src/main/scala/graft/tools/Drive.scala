package graft.tools
import graft.core.AutoMonotonic

object Drive {
  def main(args: Array[String]): Unit = {
    val ne = Array(1.0, 5, 6, 20, 19, 26, 18, 117)
    val ev = Array(84.0, 79, 81, 61, 39, 7, 5, 1)
    println("DRIVE auto=" + AutoMonotonic.autoMonotonic(ne, ev, "auto"))
    println("DRIVE heur=" +
      AutoMonotonic.autoMonotonic(ne, ev, "auto_heuristic"))
    println("DRIVE ascdesc=" +
      AutoMonotonic.autoMonotonic(ne, ev, "auto_asc_desc"))
  }
}
