package graft.engine

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Catalog + cold-tier manifest persistence — the analogue of the
  * reference's plain-text schema registry file and binary LSM
  * metadata dump (SQLLayer/includes/schema_registry.hpp:243-344,
  * includes/lsm_levels.hpp:452-588), in one human-readable text
  * format each. Saved on every DDL / flush / compaction; loaded by
  * Engine recovery.
  *
  * catalog.sdb:   TABLE <name> <pk> / COLUMN <name> <type> <0|1> / END
  * MANIFEST:      MAXSEQ <n> / [LAYOUT <col>...] / [LAYOUTBYTES <n>] / TIER <dirname>...
  */
object Persist {

  def saveCatalog(path: Path, tables: Iterable[TableMeta]): Unit = {
    val sb = new StringBuilder
    tables.foreach { m =>
      sb ++= s"TABLE ${m.name} ${m.pk}\n"
      m.cols.foreach { c =>
        sb ++= s"COLUMN ${c.name} ${c.tpe.sqlName} ${if (c.notNull) 1 else 0}\n"
      }
      sb ++= "END\n"
    }
    Files.createDirectories(path.getParent)
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.writeString(tmp, sb.toString)
    Files.move(tmp, path, java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  def loadCatalog(path: Path): Vector[TableMeta] = {
    if (!Files.exists(path)) return Vector.empty
    val lines = Files.readAllLines(path).asScala.map(_.trim).filter(_.nonEmpty)
    val out = Vector.newBuilder[TableMeta]
    var name = ""; var pk = ""
    var cols = Vector.empty[ColumnDef]
    lines.foreach { line =>
      val parts = line.split("\\s+")
      parts(0) match {
        case "TABLE"  => name = parts(1); pk = parts(2); cols = Vector.empty
        case "COLUMN" =>
          val tpe = ColType.fromSql(parts(2)).getOrElse(
            throw new EngineException(s"corrupt catalog: unknown type '${parts(2)}'"))
          cols = cols :+ ColumnDef(parts(1), tpe, parts(3) == "1")
        case "END"    => out += TableMeta(name, cols, pk)
        case other    => throw new EngineException(s"corrupt catalog line: '$other'")
      }
    }
    out.result()
  }

  /** @return (tier dirs in flush order, max seq durable in parquet,
    *         declared z-order layout columns — empty when the table
    *         was never OPTIMIZEd, requested layout part-size bytes —
    *         -1 = engine default). Pre-layout manifests load fine
    *         (no LAYOUT/LAYOUTBYTES line → empty/-1), and pre-layout
    *         readers skip both lines via the catch-all — the format
    *         change is compatible both ways.
    */
  def loadManifest(coldRoot: Path)
      : (Vector[String], Long, Vector[String], Long, Long) = {
    val mf = coldRoot.resolve("MANIFEST")
    if (!Files.exists(mf)) return (Vector.empty, 0L, Vector.empty, -1L, 0L)
    var maxSeq = 0L
    var layout = Vector.empty[String]
    var layoutPartBytes = -1L
    var layoutAutoBytes = 0L
    val tiers = Vector.newBuilder[String]
    Files.readAllLines(mf).asScala.map(_.trim).filter(_.nonEmpty).foreach { line =>
      val parts = line.split("\\s+")
      parts(0) match {
        case "MAXSEQ" => maxSeq = parts(1).toLong
        case "TIER"   => tiers += coldRoot.resolve(parts(1)).toString
        case "LAYOUT" => layout = parts.drop(1).toVector
        case "LAYOUTBYTES" => layoutPartBytes = parts(1).toLong
        case "LAYOUTAUTO" => layoutAutoBytes = parts(1).toLong
        case _        => ()
      }
    }
    (tiers.result(), maxSeq, layout, layoutPartBytes, layoutAutoBytes)
  }

  def saveManifest(coldRoot: Path, tiers: Vector[String], maxSeq: Long,
                   layout: Vector[String] = Vector.empty,
                   layoutPartBytes: Long = -1L,
                   layoutAutoBytes: Long = 0L): Unit = {
    Files.createDirectories(coldRoot)
    val body = s"MAXSEQ $maxSeq\n" +
      (if (layout.nonEmpty) s"LAYOUT ${layout.mkString(" ")}\n" else "") +
      (if (layout.nonEmpty && layoutPartBytes > 0)
         s"LAYOUTBYTES $layoutPartBytes\n" else "") +
      (if (layout.nonEmpty && layoutAutoBytes > 0)
         s"LAYOUTAUTO $layoutAutoBytes\n" else "") +
      tiers.map(t => s"TIER ${Paths.get(t).getFileName}\n").mkString
    val tmp = coldRoot.resolve("MANIFEST.tmp")
    Files.writeString(tmp, body)
    Files.move(tmp, coldRoot.resolve("MANIFEST"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.deleteIfExists(f))
    }
}
