"""GoldenGate-XML → transcript-conversation adapter.

Maps a real GG treatment document (e.g. the reference's own
``example-data/000040332F2853C295734E7BD4190F05.xml``) into the
transcript model (FIXTURES.md §1.1): turn 0 carries ``[[document ...]]``
and ``[[mods ...]]`` metadata spans; each ``subSubSection`` becomes one
turn whose mention spans appear in XML document order with the
section type as structural context.

The MODS flattening reproduces the reference's own selectors
(gg2rdf.ts:969-1055, :1396-1417):

* title/title2   ← ``MODSmods > MODStitleInfo > MODStitle`` (direct
  children only — relatedItem titles are NOT document titles)
* authors        ← ``MODSname`` with roleTerm ~ /author/i, nameParts
  joined ``"; "``
* date/dateIssued← ``MODSpart > MODSdate`` / ``MODSoriginInfo >
  MODSdateIssued``
* classification(2) ← ``MODSclassification`` innerText(s)
* journal/volume/issue/startPage/endPage ←
  ``MODSrelatedItem[type=host]`` title / part>detail[type] /
  part>extent start/end

This is test/ingest tooling: it feeds REAL reference-authored data
through both the serial oracle and the distributed pipeline so parity
is proven on inputs the reference project itself ships, not only on
our synthetic corpus.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from typing import Optional

from ..functions.markup import parse_turn, render_span

# the reference rewrites mods: prefixes pre-parse (gg2rdf.ts:57-60)
_RE_MODS = re.compile(r"(</?)mods:")

MENTION_KINDS = (
    "taxonomicName", "taxonomicNameLabel", "figureCitation",
    "materialsCitation", "vernacularName", "treatmentCitation",
    "treatmentCitationGroup", "bibRefCitation",
)


def _innertext(el: ET.Element) -> str:
    return "".join(el.itertext())


def _build_parents(root: ET.Element) -> dict:
    return {c: p for p in root.iter() for c in p}


def _mods_attrs(root: ET.Element) -> dict[str, str]:
    out: dict[str, str] = {}
    mods = root.find(".//MODSmods")
    if mods is None:
        return out
    titles = [
        _innertext(t)
        for ti in mods.findall("MODStitleInfo")
        for t in ti.findall("MODStitle")
    ]
    for i, t in enumerate(titles[:2]):
        out["title" if i == 0 else "title2"] = t
    authors = []
    for name in mods.iter("MODSname"):
        role = name.find(".//MODSroleTerm")
        part = name.find(".//MODSnamePart")
        if (
            role is not None and part is not None
            and re.search(r"author", _innertext(role), re.IGNORECASE)
        ):
            authors.append(_innertext(part).strip())
    if authors:
        out["authors"] = "; ".join(authors)
    for i, c in enumerate(mods.iter("MODSclassification")):
        out["classification" if i == 0 else "classification2"] = _innertext(c)
    for part in mods.findall("MODSpart"):
        for d in part.findall("MODSdate"):
            out["date"] = _innertext(d)
    for oi in mods.iter("MODSoriginInfo"):
        for d in oi.findall("MODSdateIssued"):
            out["dateIssued"] = _innertext(d)
    for rel in mods.iter("MODSrelatedItem"):
        if rel.get("type") != "host":
            continue
        for ti in rel.iter("MODStitleInfo"):
            for t in ti.findall("MODStitle"):
                out["journal"] = _innertext(t)
        for part in rel.iter("MODSpart"):
            for det in part.findall("MODSdetail"):
                kind = det.get("type")
                if kind:
                    out[kind] = _innertext(det)
            for ext in part.findall("MODSextent"):
                s = ext.find("MODSstart")
                e = ext.find("MODSend")
                if s is not None:
                    out["startPage"] = _innertext(s)
                if e is not None:
                    out["endPage"] = _innertext(e)
    return out


def _span(kind: str, attrs: dict, surface: Optional[str] = None,
          section: Optional[str] = None) -> str:
    attrs = dict(attrs)
    if section is not None:
        attrs = {"_section": section, **attrs}
    text = render_span(kind, attrs, surface)
    # the span grammar cannot carry '"' or ']]' inside values — assert
    # faithful round-trip so corruption is loud, not silent
    parsed = parse_turn(text)
    assert len(parsed) == 1, f"unrepresentable span: {text[:120]}"
    m = parsed[0]
    assert m.kind == kind and m.attrs == {
        k: ("" if v is None else str(v)) for k, v in attrs.items()
        if k != "_section"
    }, f"lossy span round-trip for {kind}"
    return text


def conversation_from_gg_xml(path: str) -> tuple[str, list[tuple[int, str]]]:
    """Parse one GG XML file → (conv_id, [(turn_idx, text)])."""
    with open(path, encoding="utf-8") as f:
        xml = _RE_MODS.sub(r"\1MODS", f.read())
    root = ET.fromstring(xml)
    doc = root if root.tag == "document" else root.find(".//document")
    assert doc is not None
    parents = _build_parents(doc)

    def enclosing_section(el: ET.Element) -> Optional[ET.Element]:
        cur = el
        while cur is not None:
            if cur.tag == "subSubSection":
                return cur
            cur = parents.get(cur)
        return None

    turn0 = (
        _span("document", dict(doc.attrib))
        + " "
        + _span("mods", _mods_attrs(doc))
    )
    turns = [(0, turn0)]

    # one turn per subSubSection, mentions in document order; a mention
    # nested inside another mention kind (e.g. taxonomicName inside a
    # treatmentCitation) carries its ancestry so nested-unit skipping
    # (gg2rdf.ts:330-336) stays expressible
    sections: list[ET.Element] = [
        el for el in doc.iter() if el.tag == "subSubSection"
    ]
    for i, sec in enumerate(sections):
        sec_type = sec.get("type") or ""
        spans = []
        for el in sec.iter():
            if el.tag not in MENTION_KINDS:
                continue
            surface = _innertext(el)
            attrs = dict(el.attrib)
            anc = parents.get(el)
            inside = None
            while anc is not None and anc is not sec:
                if anc.tag in MENTION_KINDS:
                    inside = anc.tag
                    break
                anc = parents.get(anc)
            if inside:
                attrs["_inside"] = inside
            spans.append(_span(el.tag, attrs, surface, section=sec_type))
        turns.append((i + 1, " ".join(spans) if spans else f"({sec_type})"))
    return doc.get("docId") or "DOC", turns
