package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

/** The `tickfmt` CLI (reference tick/cmd/tickfmt/main.go): format
  * TICKscript files to the canonical form, or stdin when no paths are
  * given. `-w` rewrites the source file in place (refused for stdin),
  * `-b` keeps a backup beside it with the `.orig` extension. */
object TickFmt {

  val BackupExt = ".orig"

  def main(args: Array[String]): Unit = {
    var write = false
    var backup = false
    val paths = Seq.newBuilder[String]
    args.foreach {
      case "-w" => write = true
      case "-b" => backup = true
      case p => paths += p
    }
    val files = paths.result()
    if (files.isEmpty) {
      if (write) {
        System.err.println("Cannot write source files, none given.")
        sys.exit(2)
      }
      val src = new String(System.in.readAllBytes(), "UTF-8")
      print(graft.tick.TickFormat.format(src))
    } else files.foreach { f =>
      print(formatFile(f, write, backup))
    }
  }

  /** Format one file; returns the text printed to stdout ("" when
    * writing in place). Separated from [[main]] so the -w/-b laws are
    * testable without a process. */
  def formatFile(filename: String, write: Boolean, backup: Boolean): String = {
    val path = Paths.get(filename)
    val src = new String(Files.readAllBytes(path), "UTF-8")
    val formatted = graft.tick.TickFormat.format(src)
    if (write) {
      if (backup)
        Files.copy(path, Paths.get(filename + BackupExt),
          StandardCopyOption.REPLACE_EXISTING)
      Files.write(path, formatted.getBytes("UTF-8"))
      ""
    } else formatted
  }
}
