package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** The named-reference table's internal consistency + spot checks of
  * the r17 HTML5 extension families against the WHATWG values. */
class HtmlEntitiesSpec extends AnyFunSuite {

  private val m = HtmlEntities.Codepoints.toMap

  test("no name maps to two different codepoints; all values are valid scalars") {
    val conflicts = HtmlEntities.Codepoints.groupBy(_._1)
      .filter(_._2.map(_._2).distinct.size > 1)
    assert(conflicts.isEmpty, s"conflicting names: $conflicts")
    // EXACT duplicates too (same name, same codepoint — ADVICE r17):
    // they pass the conflict check above but produce a duplicate MAP
    // key in duckMapSql, which DuckDB rejects at runtime, breaking
    // every entity-decoding oracle query
    assert(HtmlEntities.Codepoints.map(_._1).distinct.size ==
      HtmlEntities.Codepoints.size,
      "exact duplicate names in Codepoints: " +
        HtmlEntities.Codepoints.groupBy(_._1).filter(_._2.size > 1).keys)
    assert(HtmlEntities.Table.map(_._1).distinct.size ==
      HtmlEntities.Table.size,
      "exact duplicate names in Table: " +
        HtmlEntities.Table.groupBy(_._1).filter(_._2.size > 1).keys)
    HtmlEntities.Codepoints.foreach { case (n, cp) =>
      assert(cp >= 1 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF),
        s"$n -> $cp is not a valid scalar")
      assert(n.matches("[a-zA-Z][a-zA-Z0-9]{1,31}"),
        s"$n does not match the reference-name pattern the decoder scans")
    }
  }

  test("table size covers the HTML 4.01 base plus the r17 HTML5 families") {
    assert(HtmlEntities.Codepoints.size >= 850,
      s"expected the extended table, got ${HtmlEntities.Codepoints.size}")
  }

  test("multi-codepoint names: unique vs the codepoint table, valid names, expected values") {
    val names = HtmlEntities.Table.groupBy(_._1)
      .filter(_._2.map(_._2).distinct.size > 1)
    assert(names.isEmpty, s"conflicting names across tables: $names")
    HtmlEntities.MultiCodepoint.foreach { case (n, v) =>
      assert(n.matches("[a-zA-Z][a-zA-Z0-9]{1,31}"), n)
      assert(v.codePointCount(0, v.length) == 2, s"$n should be 2 codepoints")
    }
    val t = HtmlEntities.Table.toMap
    assert(t("fjlig") == "fj")
    assert(t("NotLessLess") == "\u226A\u0338")
    assert(t("ThickSpace") == "\u205F\u200A")
  }

  test("math alphabets: regular block offsets with the letterlike exceptions") {
    assert(m("Ascr") == 0x1D49C && m("Zscr") == 0x1D4B5)
    assert(m("Bscr") == 0x212C && m("Escr") == 0x2130 && m("Hscr") == 0x210B
      && m("Iscr") == 0x2110 && m("Lscr") == 0x2112 && m("Mscr") == 0x2133
      && m("Rscr") == 0x211B && m("Fscr") == 0x2131)
    assert(m("escr") == 0x212F && m("gscr") == 0x210A && m("oscr") == 0x2134)
    assert(m("afr") == 0x1D51E && m("zfr") == 0x1D537)
    assert(m("Cfr") == 0x212D && m("Hfr") == 0x210C && m("Ifr") == 0x2111
      && m("Rfr") == 0x211C && m("Zfr") == 0x2128)
    assert(m("Aopf") == 0x1D538 && m("aopf") == 0x1D552 && m("zopf") == 0x1D56B)
    assert(m("Copf") == 0x2102 && m("Hopf") == 0x210D && m("Nopf") == 0x2115
      && m("Popf") == 0x2119 && m("Qopf") == 0x211A && m("Ropf") == 0x211D
      && m("Zopf") == 0x2124)
  }

  test("Cyrillic: alphabet-order block + ISOcyr2 extensions") {
    assert(m("Acy") == 0x410 && m("YAcy") == 0x42F)
    assert(m("acy") == 0x430 && m("yacy") == 0x44F)
    assert(m("IEcy") == 0x415 && m("iecy") == 0x435)
    assert(m("SHCHcy") == 0x429 && m("shchcy") == 0x449)
    assert(m("IOcy") == 0x401 && m("iocy") == 0x451)
    assert(m("DZcy") == 0x40F && m("dzcy") == 0x45F)
  }

  test("spot checks across the misc families") {
    assert(m("excl") == '!' && m("sol") == '/' && m("commat") == '@')
    assert(m("AMP") == '&' && m("COPY") == 0xA9)
    assert(m("half") == 0xBD && m("angst") == 0xC5 && m("ohm") == 0x3A9)
    assert(m("Amacr") == 0x100 && m("zcaron") == 0x17E && m("cdot") == 0x10B,
      "cdot is Latin c-dot-above, NOT the math operator")
    assert(m("varphi") == 0x3D5 && m("varepsilon") == 0x3F5)
    assert(m("star") == 0x2606 && m("starf") == 0x2605 && m("sstarf") == 0x22C6)
    assert(m("checkmark") == 0x2713 && m("numero") == 0x2116)
    assert(m("filig") == 0xFB01)
    assert(m("mapsto") == 0x21A6 && m("Longrightarrow") == 0x27F9)
  }
}
