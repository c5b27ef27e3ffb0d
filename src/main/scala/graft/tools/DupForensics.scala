package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway forensics: scan a probe table's snapshot history for the
  * first snapshot where a given id appears more than once, then dump the
  * carriers at that snapshot and the one before. Dev-only. */
object DupForensics {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val id = args(1).toLong
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def countAt(v: Long): Long =
      try spark.read.format("arrow-ipc").option("asOfSnapshot", v.toString)
        .load(dir).filter(col("id") === id).count()
      catch { case e: Throwable => println(s"  snapshot $v unreadable: ${e.getMessage.take(120)}"); -1L }

    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snaps = graft.sources.ArrowSnapshots.read(fs,
      new org.apache.hadoop.fs.Path(dir))
    val ids = snaps.map(_.id)
    println(s"${ids.size} snapshots, ${ids.headOption}..${ids.lastOption}")
    // linear scan from the tail backwards is cheap enough at ~360
    var firstDup = -1L
    ids.foreach { v =>
      val c = countAt(v)
      if (c > 1 && firstDup < 0) {
        firstDup = v
        println(s"FIRST DUP at snapshot $v: count=$c")
      }
    }
    if (firstDup >= 0) {
      Seq(firstDup - 1, firstDup).foreach { v =>
        println(s"--- snapshot $v carriers of id=$id:")
        try spark.read.format("arrow-ipc").option("asOfSnapshot", v.toString)
          .load(dir).filter(col("id") === id)
          .select(col("id"), col("k"),
            col(graft.sources.ArrowRowLevel.FileColumn),
            col(graft.sources.ArrowRowLevel.PosColumn))
          .show(10, false)
        catch { case e: Throwable => println(s"  unreadable: ${e.getMessage.take(200)}") }
      }
      val entry = snaps.find(_.id == firstDup).get
      println(s"--- commit $firstDup adds=${entry.adds.mkString(",")}")
      println(s"--- commit $firstDup removes=${entry.removes.mkString(",")}")
    }
    spark.stop()
  }
}
