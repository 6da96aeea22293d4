package graft.config

import graft.config.ConfigTree.Tree
import scala.collection.mutable

/** Minimal TOML parser producing the same `ConfigTree.Tree` shape as
  * the JSON path, so `.toml` run configs are accepted interchangeably
  * with `.json` — parity with
  * /root/reference/src/cosmap/api/cmds.py:21-29 (json.load | toml.load).
  *
  * Supported (the subset run configs use, and then some): comments,
  * `[table]` / `[a.b]` headers, `[[array.of.tables]]`, bare / quoted /
  * dotted keys, basic and literal strings (single- and multi-line),
  * integers (with underscores, hex/oct/bin), floats, booleans, arrays
  * (multi-line, nested), and inline tables. Numbers map exactly like
  * the JSON parser: integer → Long, float → Double. Not supported:
  * datetimes (raise — configs here carry no timestamps).
  */
object Toml {

  final case class TomlParseException(msg: String, line: Int)
    extends IllegalArgumentException(s"TOML parse error at line $line: $msg")

  def parse(input: String): Tree = new Parser(input).parseDocument()

  // mutable tree while building; converted to immutable at the end
  private type MTree = mutable.LinkedHashMap[String, Any]

  private final class Parser(s: String) {
    private var pos = 0

    private def line: Int = s.substring(0, math.min(pos, s.length)).count(_ == '\n') + 1
    private def fail(msg: String): Nothing = throw TomlParseException(msg, line)
    private def eof: Boolean = pos >= s.length
    private def peek: Char = s.charAt(pos)

    private def skipSpaces(): Unit =
      while (!eof && (peek == ' ' || peek == '\t')) pos += 1

    /** spaces, comments, newlines */
    private def skipTrivia(): Unit = {
      var go = true
      while (go && !eof) {
        peek match {
          case ' ' | '\t' | '\r' | '\n' => pos += 1
          case '#' => while (!eof && peek != '\n') pos += 1
          case _ => go = false
        }
      }
    }

    /** spaces + comment, then require end-of-line (or EOF) */
    private def endOfLine(): Unit = {
      skipSpaces()
      if (!eof && peek == '#') while (!eof && peek != '\n') pos += 1
      if (!eof) {
        if (peek == '\r') pos += 1
        if (eof || peek != '\n') fail(s"expected end of line, found '${peek}'")
        pos += 1
      }
    }

    def parseDocument(): Tree = {
      val root: MTree = mutable.LinkedHashMap.empty
      var current: MTree = root
      skipTrivia()
      while (!eof) {
        if (peek == '[') {
          pos += 1
          val isArray = !eof && peek == '['
          if (isArray) pos += 1
          val path = parseKeyPath(inHeader = true)
          if (!eof && peek == ']') pos += 1 else fail("expected ']' closing table header")
          if (isArray) {
            if (!eof && peek == ']') pos += 1 else fail("expected ']]' closing array-of-tables header")
          }
          endOfLine()
          current =
            if (isArray) appendTableArray(root, path)
            else descend(root, path)
        } else {
          val path = parseKeyPath(inHeader = false)
          skipSpaces()
          if (eof || peek != '=') fail("expected '=' after key")
          pos += 1
          skipSpaces()
          val v = parseValue()
          endOfLine()
          assign(current, path, v)
        }
        skipTrivia()
      }
      freeze(root).asInstanceOf[Tree]
    }

    // ---- keys --------------------------------------------------------

    private def parseKeyPath(inHeader: Boolean): List[String] = {
      skipSpaces()
      val parts = mutable.ListBuffer.empty[String]
      var more = true
      while (more) {
        parts += parseKeyPart()
        skipSpaces()
        if (!eof && peek == '.') { pos += 1; skipSpaces() }
        else more = false
      }
      parts.toList
    }

    private def parseKeyPart(): String = {
      if (eof) fail("expected key")
      peek match {
        case '"'  => parseBasicString()
        case '\'' => parseLiteralString()
        case c if c.isLetterOrDigit || c == '_' || c == '-' =>
          val start = pos
          while (!eof && (peek.isLetterOrDigit || peek == '_' || peek == '-')) pos += 1
          s.substring(start, pos)
        case c => fail(s"unexpected character '$c' in key")
      }
    }

    // ---- values ------------------------------------------------------

    private def parseValue(): Any = {
      if (eof) fail("expected value")
      peek match {
        case '"'  =>
          if (s.startsWith("\"\"\"", pos)) parseMultilineBasic() else parseBasicString()
        case '\'' =>
          if (s.startsWith("'''", pos)) parseMultilineLiteral() else parseLiteralString()
        case '[' => parseArray()
        case '{' => parseInlineTable()
        case 't' if s.startsWith("true", pos)  => pos += 4; true
        case 'f' if s.startsWith("false", pos) => pos += 5; false
        case _ => parseNumber()
      }
    }

    private def parseBasicString(): String = {
      pos += 1 // opening "
      val sb = new StringBuilder
      while (!eof && peek != '"') {
        if (peek == '\n') fail("newline in basic string")
        if (peek == '\\') { pos += 1; sb += unescape() }
        else { sb += peek; pos += 1 }
      }
      if (eof) fail("unterminated string")
      pos += 1
      sb.toString
    }

    private def unescape(): Char = {
      if (eof) fail("unterminated escape")
      val c = peek; pos += 1
      c match {
        case 'n' => '\n'
        case 't' => '\t'
        case 'r' => '\r'
        case 'b' => '\b'
        case 'f' => '\f'
        case '"' => '"'
        case '\\' => '\\'
        case 'u' =>
          if (pos + 4 > s.length) fail("bad \\u escape")
          val hex = s.substring(pos, pos + 4); pos += 4
          Integer.parseInt(hex, 16).toChar
        case other => fail(s"unsupported escape '\\$other'")
      }
    }

    private def parseLiteralString(): String = {
      pos += 1
      val start = pos
      while (!eof && peek != '\'' && peek != '\n') pos += 1
      if (eof || peek != '\'') fail("unterminated literal string")
      val out = s.substring(start, pos)
      pos += 1
      out
    }

    private def parseMultilineBasic(): String = {
      pos += 3
      if (!eof && peek == '\n') pos += 1 // trim first newline
      val sb = new StringBuilder
      while (!s.startsWith("\"\"\"", pos)) {
        if (eof) fail("unterminated multiline string")
        if (peek == '\\') {
          // line-ending backslash: trim whitespace through next non-ws
          if (pos + 1 < s.length && (s.charAt(pos + 1) == '\n' || s.charAt(pos + 1) == '\r')) {
            pos += 1
            while (!eof && (peek == ' ' || peek == '\t' || peek == '\n' || peek == '\r')) pos += 1
          } else { pos += 1; sb += unescape() }
        } else { sb += peek; pos += 1 }
      }
      pos += 3
      sb.toString
    }

    private def parseMultilineLiteral(): String = {
      pos += 3
      if (!eof && peek == '\n') pos += 1
      val end = s.indexOf("'''", pos)
      if (end < 0) fail("unterminated multiline literal string")
      val out = s.substring(pos, end)
      pos = end + 3
      out
    }

    private def parseArray(): Seq[Any] = {
      pos += 1 // [
      val items = mutable.ListBuffer.empty[Any]
      skipTrivia()
      while (!eof && peek != ']') {
        items += parseValue()
        skipTrivia()
        if (!eof && peek == ',') { pos += 1; skipTrivia() }
        else if (!eof && peek != ']') fail("expected ',' or ']' in array")
      }
      if (eof) fail("unterminated array")
      pos += 1
      items.toList
    }

    private def parseInlineTable(): Any = {
      pos += 1 // {
      val t: MTree = mutable.LinkedHashMap.empty
      skipSpaces()
      if (!eof && peek == '}') { pos += 1; return t }
      var more = true
      while (more) {
        skipSpaces()
        val path = parseKeyPath(inHeader = false)
        skipSpaces()
        if (eof || peek != '=') fail("expected '=' in inline table")
        pos += 1
        skipSpaces()
        assign(t, path, parseValue())
        skipSpaces()
        if (!eof && peek == ',') pos += 1
        else more = false
      }
      skipSpaces()
      if (eof || peek != '}') fail("expected '}' closing inline table")
      pos += 1
      t
    }

    private def parseNumber(): Any = {
      val start = pos
      if (!eof && (peek == '+' || peek == '-')) pos += 1
      if (s.startsWith("0x", pos) || s.startsWith("0o", pos) || s.startsWith("0b", pos)) {
        val radix = s.charAt(pos + 1) match { case 'x' => 16; case 'o' => 8; case _ => 2 }
        pos += 2
        val dstart = pos
        while (!eof && (peek.isLetterOrDigit || peek == '_')) pos += 1
        val digits = s.substring(dstart, pos).replace("_", "")
        if (digits.isEmpty) fail("empty radix number")
        val sign = if (s.charAt(start) == '-') -1L else 1L
        return try sign * java.lang.Long.parseLong(digits, radix)
        catch { case _: NumberFormatException => fail(s"bad number '$digits'") }
      }
      var isFloat = false
      var done = false
      while (!eof && !done) {
        val c = peek
        if (c.isDigit || c == '_') pos += 1
        else if (c == '.' || c == 'e' || c == 'E') { isFloat = true; pos += 1 }
        // sign is part of the number only directly after an exponent mark
        else if ((c == '+' || c == '-') && pos > start &&
          (s.charAt(pos - 1) == 'e' || s.charAt(pos - 1) == 'E')) pos += 1
        else done = true
      }
      finishNumber(s.substring(start, pos).replace("_", ""), isFloat)
    }

    private def finishNumber(text: String, isFloat: Boolean): Any = {
      if (text.isEmpty || text == "+" || text == "-") fail("expected value")
      if (text.exists(c => c == ':' || c == 'T')) fail("datetimes are not supported")
      try {
        if (isFloat) text.toDouble else text.toLong
      } catch {
        case _: NumberFormatException => fail(s"bad number '$text'")
      }
    }

    // ---- tree assembly ----------------------------------------------

    private def descend(root: MTree, path: List[String]): MTree =
      path.foldLeft(root) { (t, k) =>
        t.getOrElseUpdate(k, mutable.LinkedHashMap.empty[String, Any]) match {
          case m: MTree @unchecked => m
          case buf: mutable.ListBuffer[_] =>
            // [a.b] after [[a.b]]: descend into last element
            buf.asInstanceOf[mutable.ListBuffer[Any]].last match {
              case m: MTree @unchecked => m
              case _ => fail(s"key '$k' is not a table")
            }
          case _ => fail(s"key '$k' is already a non-table value")
        }
      }

    private def appendTableArray(root: MTree, path: List[String]): MTree = {
      val parent = descend(root, path.init)
      val fresh: MTree = mutable.LinkedHashMap.empty
      parent.getOrElseUpdate(path.last, mutable.ListBuffer.empty[Any]) match {
        case buf: mutable.ListBuffer[_] =>
          buf.asInstanceOf[mutable.ListBuffer[Any]] += fresh
        case _ => fail(s"key '${path.last}' is already a non-array value")
      }
      fresh
    }

    private def assign(t: MTree, path: List[String], v: Any): Unit = {
      val target = descend(t, path.init)
      if (target.contains(path.last)) fail(s"duplicate key '${path.last}'")
      target(path.last) = v
    }

    private def freeze(v: Any): Any = v match {
      case m: MTree @unchecked => m.map { case (k, x) => k -> freeze(x) }.toMap
      case buf: mutable.ListBuffer[_] => buf.toList.map(freeze)
      case xs: Seq[_] => xs.map(freeze)
      case other => other
    }
  }
}
