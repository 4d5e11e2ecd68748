package graft.sources.v2

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Second-JVM half of the multi-process commit-safety test
  * (V2InternalsSpec "two JVMs racing commits"): performs `n`
  * append-style commits against the table dir — each adds one unique
  * name, retrying CAS losses against the freshest state — then prints
  * its win count. Runs with no Spark session: the manifest protocol
  * is pure Hadoop FS. */
object CommitRaceChild {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val n = args(1).toInt
    val id = args(2)
    val table = new Path(dir)
    val fs = table.getFileSystem(new Configuration())
    var wins = 0
    var attempts = 0
    while (wins < n && attempts < n * 1000) {
      attempts += 1
      val live = GraftManifest.liveState(fs, table)
      if (GraftManifest.tryCommit(fs, table, live.version,
          live.names :+ f"f-$id-$wins%04d.parquet")) {
        wins += 1
      }
    }
    println(s"CHILD_WINS=$wins")
    if (wins < n) sys.exit(2)
  }
}
