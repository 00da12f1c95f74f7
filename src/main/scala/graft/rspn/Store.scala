package graft.rspn

import java.io.{BufferedInputStream, BufferedOutputStream, FileInputStream, FileOutputStream, ObjectInputStream, ObjectOutputStream}
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** S4 — model store: persist and reload a trained ensemble so querying never
  * retrains (reference ensemble_compilation/spn_ensemble.py::SPNEnsemble.save
  * / read_ensemble — pickle there, JVM object serialization here; the models
  * are pure immutable case-class trees, a few hundred KB each, so the format
  * choice is incidental and versioned for safety).
  *
  * One file per SPN under `dir` (`<name>.spn`) — a 100 TB deployment trains
  * offline on the cluster, ships the model directory, and every query
  * session loads MBs of models instead of touching the data (the reference's
  * train-offline/query-online contract).
  */
object Store {

  private val Magic = 0x53504e31 // "SPN1"

  def save(dir: String, spns: Map[String, Ensemble.TrainedSpn]): Unit = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    spns.foreach { case (name, spn) =>
      val out = new ObjectOutputStream(new BufferedOutputStream(
        new FileOutputStream(d.resolve(s"$name.spn").toFile)))
      try {
        out.writeInt(Magic)
        out.writeObject(spn)
      } finally out.close()
    }
  }

  def load(dir: String): Map[String, Ensemble.TrainedSpn] = {
    val d = Paths.get(dir)
    require(Files.isDirectory(d), s"model dir $dir does not exist")
    spnFiles(d).map { p =>
      val in = new ObjectInputStream(new BufferedInputStream(new FileInputStream(p.toFile)))
      try {
        require(in.readInt() == Magic, s"$p is not an SPN model file")
        val spn = in.readObject().asInstanceOf[Ensemble.TrainedSpn]
        spn.name -> spn
      } finally in.close()
    }.toMap
  }

  private def spnFiles(d: Path): Seq[Path] = {
    val stream = Files.list(d)
    try stream.iterator().asScala.filter(_.toString.endsWith(".spn")).toSeq.sortBy(_.toString)
    finally stream.close()
  }
}
