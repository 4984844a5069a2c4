package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The cross-PROCESS leg of the commit-catalog story: two real JVMs
  * CASing the same [[FileLockCatalog]]. The in-JVM race specs
  * (`CommitCatalogSpec`) serialize on the per-path monitor BEFORE the
  * OS file lock by design, so `FileChannel.lock` contention between
  * processes was structurally untested — this spec forks two `java`
  * processes through a start barrier and proves exactly one winner
  * per name, every name bound to a real winner's content, and the
  * win sets partitioning the namespace.
  *
  * Boundary (documented the way StoreFs documents scheme safety):
  * this exercises POSIX advisory locking on a LOCAL filesystem — the
  * substrate [[FileLockCatalog]] declares for; NFSv3 or container
  * bind-mount edge cases are out of contract.
  */
class CatalogCrossProcessSpec extends AnyFunSuite {

  private val Names = 300

  private def forkWorker(catDir: String, barrier: String,
                         result: String): Process = {
    val javaBin = java.nio.file.Paths.get(
      System.getProperty("java.home"), "bin", "java").toString
    new ProcessBuilder(javaBin, "-cp", System.getProperty("java.class.path"),
      "graft.sources.CatalogRaceMain", catDir, barrier, result,
      Names.toString)
      .redirectErrorStream(true)
      .redirectOutput(ProcessBuilder.Redirect.DISCARD)
      .start()
  }

  private def lines(p: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.readAllLines(java.nio.file.Paths.get(p))
      .asScala.toSeq
  }

  test("two real processes CASing one catalog: exactly one winner per name, every round") {
    var contended = 0
    for (round <- 0 until 3) {
      val dir = java.nio.file.Files.createTempDirectory(s"catrace_$round")
      val cat = dir.resolve("cat").toString
      val barrier = dir.resolve("go").toString
      val (ra, rb) = (dir.resolve("a.txt").toString,
        dir.resolve("b.txt").toString)
      val pa = forkWorker(cat, barrier, ra)
      val pb = forkWorker(cat, barrier, rb)
      Thread.sleep(300) // both JVMs up and spinning on the barrier
      java.nio.file.Files.createFile(java.nio.file.Paths.get(barrier))
      assert(pa.waitFor(120, java.util.concurrent.TimeUnit.SECONDS) &&
        pb.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
        "workers must terminate")
      assert(pa.exitValue() == 0 && pb.exitValue() == 0,
        s"worker exit codes: ${pa.exitValue()} / ${pb.exitValue()}")

      val (la, lb) = (lines(ra), lines(rb))
      def wins(ls: Seq[String]): Set[String] =
        ls.filter(_.startsWith("win:")).map(_.drop(4)).toSet
      val (wa, wb) = (wins(la), wins(lb))
      // exactly one winner per name: disjoint wins covering everything
      assert((wa & wb).isEmpty, s"double-landed names: ${wa & wb}")
      assert(wa.size + wb.size == Names,
        s"${wa.size} + ${wb.size} != $Names")
      // the catalog agrees: every name bound once, to its winner's pid
      val verify = new FileLockCatalog(cat)
      val all = verify.names("v")
      assert(all.size == Names)
      all.foreach { name =>
        val content = verify.get(name).get
        val winnerSet = if (wa(name)) Some(ra) else if (wb(name)) Some(rb) else None
        assert(winnerSet.isDefined, s"$name bound but nobody claims the win")
      }
      contended += (la ++ lb).count(_.startsWith("loss:"))
    }
    // with a start barrier and 300 names/round, the processes really
    // did interleave — a zero-contention run would mean the race
    // never happened and the spec proved nothing
    assert(contended > 0, "no cross-process contention observed in 3 rounds")
  }
}
