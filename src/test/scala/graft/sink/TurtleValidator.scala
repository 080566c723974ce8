package graft.sink

/** Test-side Turtle well-formedness checker — the S8 spirit of the
  * reference's `rapper -i turtle -c` pass over every generated file
  * (`checkOutputSyntax.sh:27-33`), without a native parser in the
  * container. Strict tokenizer + recursive descent over the Turtle
  * subset the writer emits (directives, IRIs, prefixed names, plain and
  * triple-quoted literals with `@lang`/`^^type`, `;`/`,` lists, `.`
  * terminators), with prefix-declaration tracking. Anything outside the
  * grammar — an unterminated literal, a bare `>` in an IRI, an
  * undeclared prefix, a missing terminator — fails with a position.
  *
  * Returns the list of violations (empty = well-formed).
  */
object TurtleValidator {

  final case class Violation(line: Int, msg: String) {
    override def toString = s"line $line: $msg"
  }

  private sealed trait Tok { def line: Int }
  private final case class TIri(v: String, line: Int) extends Tok
  private final case class TQName(prefix: String, local: String, line: Int)
    extends Tok
  private final case class TLiteral(line: Int) extends Tok
  private final case class TLangTag(line: Int) extends Tok
  private final case class TDataType(line: Int) extends Tok // the ^^ marker
  private final case class TPunct(c: Char, line: Int) extends Tok
  private final case class TKeywordA(line: Int) extends Tok
  private final case class TDirective(name: String, line: Int) extends Tok

  /** Validate a whole Turtle document. */
  def validate(text: String): Seq[Violation] = {
    val errs = scala.collection.mutable.ListBuffer[Violation]()
    val toks: Vector[Tok] =
      try tokenize(text, errs)
      catch {
        case Halt(line, msg) => errs += Violation(line, msg); Vector.empty
      }
    if (errs.isEmpty) parse(toks, errs)
    errs.toSeq
  }

  private final case class Halt(line: Int, msg: String) extends RuntimeException

  // --- tokenizer -----------------------------------------------------------

  private val IriBad = Set('<', '"', '{', '}', '|', '^', '`', '\\', ' ')

  private def tokenize(s: String,
      errs: scala.collection.mutable.ListBuffer[Violation]): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    var line = 1
    def halt(msg: String): Nothing = throw Halt(line, msg)
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '\n' => line += 1; i += 1
        case ' ' | '\t' | '\r' => i += 1
        case '#' => // comment to EOL
          while (i < s.length && s.charAt(i) != '\n') i += 1
        case '@' =>
          // directive (@prefix/@base) or a language tag
          val start = i + 1
          var j = start
          while (j < s.length && (s.charAt(j).isLetterOrDigit ||
            s.charAt(j) == '-')) j += 1
          val word = s.substring(start, j)
          if (word == "prefix" || word == "base")
            out += TDirective(word, line)
          else if (word.nonEmpty && word.forall(ch =>
            ch.isLetterOrDigit || ch == '-'))
            out += TLangTag(line)
          else halt(s"malformed @-token '@$word'")
          i = j
        case '<' =>
          val close = s.indexOf('>', i + 1)
          if (close < 0) halt("unterminated IRI '<'")
          val body = s.substring(i + 1, close)
          if (body.exists(ch => IriBad(ch) || ch == '\n' || ch == '\t'))
            halt(s"illegal character inside IRI <${body.take(40)}>")
          out += TIri(body, line)
          i = close + 1
        case '"' =>
          if (s.startsWith("\"\"\"", i)) {
            // scan the long-literal body respecting backslash escapes —
            // '\"' before the closing delimiter is CONTENT ('"""x\""""'
            // is a valid literal ending in a quote), and a run of q ≥ 3
            // quotes closes with its LAST three (at most 2 content quotes
            // may precede the delimiter per the Turtle grammar)
            var j = i + 3
            var closed = false
            while (j < s.length && !closed) {
              s.charAt(j) match {
                case '\\' => j += 2
                case '"' =>
                  var q = 0
                  while (j + q < s.length && s.charAt(j + q) == '"') q += 1
                  if (q >= 3) {
                    if (q > 5) halt("malformed long-literal terminator " +
                      s"(run of $q quotes)")
                    closed = true
                  }
                  j += q
                case '\n' => line += 1; j += 1
                case _ => j += 1
              }
            }
            if (!closed) halt("unterminated long literal '\"\"\"'")
            checkEscapes(s.substring(i + 3, j - 3), line, errs)
            out += TLiteral(line)
            i = j
          } else {
            var j = i + 1
            var closed = false
            while (j < s.length && !closed) {
              s.charAt(j) match {
                case '\\' => j += 2
                case '"' => closed = true; j += 1
                case '\n' => halt("newline inside short literal")
                case _ => j += 1
              }
            }
            if (!closed) halt("unterminated short literal '\"'")
            checkEscapes(s.substring(i + 1, j - 1), line, errs)
            out += TLiteral(line)
            i = j
          }
        case '^' =>
          if (s.startsWith("^^", i)) { out += TDataType(line); i += 2 }
          else halt("lone '^' (datatype marker is '^^')")
        case ';' | ',' | '.' =>
          out += TPunct(c, line); i += 1
        case _ if c.isLetter || c == '_' || c == ':' =>
          // prefixed name (or the keyword 'a')
          var j = i
          while (j < s.length && !s.charAt(j).isWhitespace &&
            !";,\"<".contains(s.charAt(j))) j += 1
          var word = s.substring(i, j)
          // a trailing '.' is the statement terminator unless it is
          // inside the local part (names here never end with '.')
          var trailingDot = false
          if (word.endsWith(".")) { word = word.dropRight(1); trailingDot = true; j -= 1 }
          if (word == "a") out += TKeywordA(line)
          else {
            val colon = word.indexOf(':')
            if (colon < 0)
              halt(s"bare token '${word.take(30)}' (not IRI/qname/keyword)")
            val (p, l) = (word.substring(0, colon), word.substring(colon + 1))
            if (l.contains(':'))
              halt(s"qname '${word.take(30)}' has multiple ':'")
            out += TQName(p, l, line)
          }
          i = j
          if (trailingDot) () // '.' re-tokenized next loop
        case other =>
          halt(s"unexpected character '$other'")
      }
    }
    out.result()
  }

  private val LegalEscapes = Set('t', 'b', 'n', 'r', 'f', '"', '\'', '\\',
    'u', 'U')

  private def checkEscapes(body: String, line: Int,
      errs: scala.collection.mutable.ListBuffer[Violation]): Unit = {
    var i = 0
    while (i < body.length) {
      if (body.charAt(i) == '\\') {
        if (i + 1 >= body.length)
          errs += Violation(line, "dangling backslash in literal")
        else if (!LegalEscapes(body.charAt(i + 1)))
          errs += Violation(line,
            s"illegal escape '\\${body.charAt(i + 1)}' in literal")
        i += 2
      } else i += 1
    }
  }

  // --- parser --------------------------------------------------------------

  private def parse(toks: Vector[Tok],
      errs: scala.collection.mutable.ListBuffer[Violation]): Unit = {
    val prefixes = scala.collection.mutable.Set[String]()
    var i = 0
    def cur: Option[Tok] = if (i < toks.length) Some(toks(i)) else None
    def err(t: Option[Tok], msg: String): Unit =
      errs += Violation(t.map(_.line).getOrElse(
        toks.lastOption.map(_.line).getOrElse(0)), msg)

    def isResource(t: Tok): Boolean = t match {
      case _: TIri => true
      case TQName(p, _, _) =>
        if (!prefixes.contains(p))
          errs += Violation(t.line, s"undeclared prefix '$p:'")
        true
      case _ => false
    }

    def parseObject(): Boolean = cur match {
      case Some(t) if isResource(t) => i += 1; true
      case Some(_: TLiteral) =>
        i += 1
        cur match {
          case Some(_: TLangTag) => i += 1
          case Some(_: TDataType) =>
            i += 1
            cur match {
              case Some(t2) if isResource(t2) => i += 1
              case other => err(other, "datatype '^^' not followed by IRI/qname")
            }
          case _ => ()
        }
        true
      case other => err(other, "expected object (IRI/qname/literal)"); i += 1; false
    }

    def parseVerb(): Boolean = cur match {
      case Some(_: TKeywordA) => i += 1; true
      case Some(t) if isResource(t) => i += 1; true
      case _ => false
    }

    while (i < toks.length) {
      toks(i) match {
        case TDirective("prefix", line) =>
          i += 1
          cur match {
            case Some(TQName(p, l, _)) if l.isEmpty =>
              prefixes += p; i += 1
            case other =>
              err(other, "@prefix not followed by 'name:'"); i += 1
          }
          cur match {
            case Some(_: TIri) => i += 1
            case other => err(other, "@prefix missing IRI")
          }
          cur match {
            case Some(TPunct('.', _)) => i += 1
            case other => err(other, s"@prefix at line $line missing '.'")
          }
        case TDirective("base", _) =>
          i += 1
          cur match {
            case Some(_: TIri) => i += 1
            case other => err(other, "@base missing IRI")
          }
          cur match {
            case Some(TPunct('.', _)) => i += 1
            case other => err(other, "@base missing '.'")
          }
        case t if isResource(t) => // triples block
          i += 1
          var done = false
          var sawVerb = false
          while (!done) {
            if (parseVerb()) {
              sawVerb = true
              var more = true
              if (parseObject()) {
                while (more) {
                  cur match {
                    case Some(TPunct(',', _)) => i += 1; parseObject()
                    case _ => more = false
                  }
                }
              } else more = false
            } else {
              cur match {
                case Some(TPunct('.', _)) =>
                  i += 1; done = true
                  if (!sawVerb)
                    errs += Violation(t.line,
                      "subject with no predicate-object list")
                case other =>
                  err(other, "expected predicate or '.'")
                  done = true
                  // resync: skip to after the next '.'
                  while (i < toks.length && toks(i) != TPunct('.',
                    toks(i).line)) i += 1
                  if (i < toks.length) i += 1
              }
            }
            if (!done) {
              cur match {
                case Some(TPunct(';', _)) =>
                  i += 1 // next verb, or trailing ';' before '.'
                case Some(TPunct('.', _)) =>
                  i += 1; done = true
                case Some(TPunct(',', _)) =>
                  err(cur, "',' outside an object list"); i += 1
                case None =>
                  err(None, "statement not terminated by '.'"); done = true
                case _ =>
                  err(cur, "expected ';' or '.' after object list")
                  done = true
              }
            }
          }
        case TPunct('.', line) =>
          errs += Violation(line, "stray '.'"); i += 1
        case t =>
          errs += Violation(t.line,
            s"unexpected token at statement start: $t")
          i += 1
      }
    }
  }
}
