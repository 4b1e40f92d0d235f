package graft.core

/** Typed pipeline configuration — the reference drives every stage from
  * `inst/conf.yml` read through R's `config` package
  * (`/root/reference/R/conf.R`, `inst/conf.yml`): profile sections
  * (`default:` overlaid by a named profile), env-var indirection
  * (`!expr Sys.getenv('X')`), and dotted lookups like
  * `pds.tracks.multisession.n_sessions`.
  *
  * This is a dependency-free parser for exactly that YAML subset
  * (2-space-indented nested maps + scalar leaves) with the same merge
  * semantics: `Conf.load(text, profile)` deep-merges the profile section
  * over `default`, resolves `${VAR}` / `!expr Sys.getenv('VAR')` leaves
  * against the environment, and exposes typed dotted-path getters.
  * Parsing happens once on the driver; values are plain Scala data and
  * serialize into closures safely.
  */
final case class Conf(root: Map[String, Any]) {

  private def walk(path: String): Option[Any] = {
    val parts = path.split('.')
    parts.foldLeft(Option[Any](root)) {
      case (Some(m: Map[_, _]), key) =>
        m.asInstanceOf[Map[String, Any]].get(key)
      case _ => None
    }
  }

  def opt(path: String): Option[String] = walk(path).collect {
    case s: String => s
  }
  def str(path: String): String =
    opt(path).getOrElse(throw new NoSuchElementException(s"conf key: $path"))
  def int(path: String): Int = str(path).trim.toInt
  def long(path: String): Long = str(path).trim.toLong
  def double(path: String): Double = str(path).trim.toDouble
  def bool(path: String): Boolean = str(path).trim.toBoolean
  def section(path: String): Map[String, Any] = walk(path) match {
    case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
    case _ => Map.empty
  }
}

object Conf {

  /** Parse `text` and overlay section `profile` onto section `default`
    * (the R `config` package contract). */
  def load(text: String, profile: String = "default",
           env: String => Option[String] = sys.env.get): Conf = {
    val sections = parse(text, env)
    def sec(name: String): Map[String, Any] = sections.get(name) match {
      case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
      case _ => Map.empty
    }
    val over = if (profile == "default") Map.empty[String, Any] else sec(profile)
    Conf(deepMerge(sec("default"), over))
  }

  /** The engine's defaults, mirroring the reference's `inst/conf.yml`
    * analytics-relevant keys (`inst/conf.yml:40-45,111-114` among
    * others); storage prefixes become parquet path prefixes. */
  val builtin: String =
    """default:
      |  surveys:
      |    landings:
      |      file_prefix: timor-landings
      |      version: latest
      |  pds:
      |    trips:
      |      file_prefix: pds-trips
      |      version: latest
      |    tracks:
      |      file_prefix: pds-track
      |      multisession:
      |        n_sessions: 32
      |      complete:
      |        file_prefix: pds-track-complete
      |        new_trips: 1000
      |  validation:
      |    landings:
      |      k_catch: 2.5
      |      k_price: 2.5
      |      price_per_kg_min: 0.25
      |      price_per_kg_max: 30
      |  estimation:
      |    frame_start: 2018-01-01
      |    small_group_copies: 5
      |    min_group_size: 3
      |""".stripMargin

  def default: Conf = load(builtin)

  // ---- parsing ----

  private val EnvExpr = """!expr\s+Sys\.getenv\(['"]([A-Za-z0-9_]+)['"]\)""".r
  private val EnvRef = """\$\{([A-Za-z0-9_]+)\}""".r

  private def scalar(raw: String, env: String => Option[String]): String = {
    val s0 = raw.trim
    val s = s0 match {
      case EnvExpr(name) => env(name).getOrElse("")
      case _ => EnvRef.replaceAllIn(s0,
        m => java.util.regex.Matcher.quoteReplacement(env(m.group(1)).getOrElse("")))
    }
    if ((s.startsWith("'") && s.endsWith("'") && s.length >= 2) ||
        (s.startsWith("\"") && s.endsWith("\"") && s.length >= 2))
      s.substring(1, s.length - 1)
    else s
  }

  /** Indentation-based recursive descent; each line is `key:` (open a
    * nested map) or `key: value` (scalar leaf). Comments/# and blank
    * lines are skipped. */
  private def parse(text: String,
                    env: String => Option[String]): Map[String, Any] = {
    val lines = text.linesIterator.zipWithIndex
      .map { case (l, i) => (l.replaceAll("\t", "  "), i) }
      .filter { case (l, _) =>
        val t = l.trim
        t.nonEmpty && !t.startsWith("#")
      }
      .toVector

    def indentOf(l: String): Int = l.takeWhile(_ == ' ').length

    def parseBlock(from: Int, to: Int, indent: Int): Map[String, Any] = {
      val out = Vector.newBuilder[(String, Any)]
      var i = from
      while (i < to) {
        val (line, lineNo) = lines(i)
        val ind = indentOf(line)
        require(ind == indent,
          s"conf parse: unexpected indent $ind (wanted $indent) at line ${lineNo + 1}: $line")
        val t = line.trim
        val colon = t.indexOf(':')
        require(colon > 0, s"conf parse: missing ':' at line ${lineNo + 1}: $t")
        val key = scalar(t.substring(0, colon), env)
        val rest = t.substring(colon + 1)
        // child block = following lines with deeper indentation
        var j = i + 1
        while (j < to && indentOf(lines(j)._1) > indent) j += 1
        if (rest.trim.nonEmpty) {
          require(j == i + 1,
            s"conf parse: scalar '$key' cannot have children (line ${lineNo + 1})")
          out += key -> scalar(rest, env)
        } else if (j == i + 1) {
          out += key -> "" // bare `key:` with no children: empty leaf
        } else {
          out += key -> parseBlock(i + 1, j, indentOf(lines(i + 1)._1))
        }
        i = j
      }
      out.result().toMap
    }

    if (lines.isEmpty) Map.empty
    else parseBlock(0, lines.length, indentOf(lines.head._1))
  }

  private def deepMerge(base: Map[String, Any],
                        over: Map[String, Any]): Map[String, Any] =
    (base.keySet ++ over.keySet).map { k =>
      k -> ((base.get(k), over.get(k)) match {
        case (Some(b: Map[_, _]), Some(o: Map[_, _])) =>
          deepMerge(b.asInstanceOf[Map[String, Any]],
            o.asInstanceOf[Map[String, Any]])
        case (_, Some(o)) => o
        case (Some(b), None) => b
        case _ => throw new IllegalStateException("unreachable")
      })
    }.toMap
}
