package graft.sources

/** Forked-JVM worker for the cross-PROCESS catalog race spec: CASes
  * `v0..vN` into one [[FileLockCatalog]] as fast as it can, after a
  * start barrier so both processes genuinely contend on the OS file
  * lock (the per-path JVM monitor cannot serialize two processes —
  * this is the leg the in-JVM race specs structurally cannot reach).
  *
  * args: catalogDir barrierFile resultFile nNames
  * result file: one line `win:<name>` or `loss:<name>` per attempt.
  */
object CatalogRaceMain {
  def main(args: Array[String]): Unit = {
    val Array(catDir, barrier, resultFile, n) = args
    val cat = new FileLockCatalog(catDir)
    val pid = ProcessHandle.current().pid().toString
    // barrier: spin until the parent says go, so both JVMs enter the
    // CAS loop together
    val b = java.nio.file.Paths.get(barrier)
    while (!java.nio.file.Files.exists(b)) Thread.onSpinWait()
    val out = new StringBuilder
    var i = 0
    while (i < n.toInt) {
      val name = s"v$i"
      if (cat.tryCreate(name, pid)) out.append(s"win:$name\n")
      else out.append(s"loss:$name\n")
      i += 1
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(resultFile), out.toString)
  }
}
