"""Inline mention markup for transcript turn text.

The transcript corpus (FIXTURES.md §1.1) encodes entity mentions the
way GoldenGate XML encodes `<taxonomicName>` / `<materialsCitation>` /
`<figureCitation>` elements (`/root/reference/example-data/*.xml:74`):

    [[taxonomicName section=nomenclature rank=species kingdom=Animalia
      genus=Saigona species=baiseensis authorityName="Zheng & Chen"
      authorityYear=2021 status="sp. nov."]]Saigona baiseensis[[/]]

Void spans (no surface text / closer) are allowed for element kinds
whose innerText the reference never reads (materialsCitation,
figureCitation):

    [[figureCitation httpUri="https://zenodo.org/record/123/files/f.png"]]

Turn 0 of a conversation carries document-level metadata as void
spans ``[[document ...]]`` (≙ the ``<document>`` attribute bag,
gg2rdf.ts:75-82) and ``[[mods ...]]`` (≙ the MODS subtree the
reference queries at gg2rdf.ts:969-1011).

Attribute grammar: ``key=value`` with bare values matching ``[^\\s\\]"]+``
or double-quoted values containing anything but ``"`` — the generator
guarantees no quotes/brackets inside values.  This parser is pure
Python so the same code runs in the vectorized extraction UDF and in
the serial oracle.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Iterator, Optional

_ATTR_RE = re.compile(r'([\w.:\-]+)=(?:"([^"]*)"|([^\s\]"]+))')
# surface must not span into a following '[[' opener — otherwise a void
# span (figureCitation etc.) would swallow the next span as its body
_SPAN_RE = re.compile(
    r"\[\[(?P<kind>[\w-]+)(?P<attrs>(?:\s+[\w.:\-]+="
    r'(?:"[^"]*"|[^\s\]"]+))*)\s*\]\]'
    r"(?:(?P<surface>(?:(?!\[\[).)*?)\[\[/\]\])?",
    re.DOTALL,
)


@dataclass
class Mention:
    """One parsed span. ``attrs`` is the XML-attribute analog: a key is
    *present* (possibly empty) or absent — mirroring hasAttribute /
    getAttribute null semantics the reference leans on.

    ``section`` is structural context (≙ ``subSubSection[type=...]``
    ancestry, gg2rdf.ts:136-138), NOT an element attribute — but
    ``section`` is ALSO a genuine botanical rank attribute
    (gg2rdf.ts:871, between subGenus and subSection).  The parser
    disambiguates by VALUE: a ``section=`` whose value is a known
    subSubSection type (nomenclature, reference_group, …) is popped as
    structural context; any other value (a Latin sectional epithet,
    e.g. ``section=Momentanea``) stays in the attr bag so taxa at rank
    section/subSection remain representable.  The two value spaces are
    disjoint by construction (structural types are lowercase tokens
    from the GG vocabulary; epithets are capitalized Latin).
    """

    kind: str
    attrs: dict[str, str]
    surface: str = ""
    turn_idx: int = -1
    mention_idx: int = -1  # document order, global per conversation
    start: int = -1  # char offset within the turn text
    section: Optional[str] = None


# subSubSection@type vocabulary (GoldenGate; the reference's selectors
# use nomenclature + reference_group, gg2rdf.ts:136-138, :327-339).
# Lowercase structural tokens — disjoint from capitalized sectional
# epithets, so `section=` disambiguates by membership here.
STRUCTURAL_SECTIONS = frozenset({
    "nomenclature", "reference_group", "description", "diagnosis",
    "discussion", "distribution", "etymology", "materials_examined",
    "biology_ecology", "key", "synonymic_list", "vernacular_names",
    "type_specimens", "remarks", "multiple",
})

# any lowercase_underscore token is treated as structural too (the GG
# type vocabulary is open-ended); epithet values are Capitalized
_STRUCTURAL_TOKEN = re.compile(r"^[a-z][a-z0-9_]*$")


def parse_turn(text: str, turn_idx: int = -1) -> list[Mention]:
    """Extract all mention spans from one turn's text, in order."""
    out: list[Mention] = []
    for m in _SPAN_RE.finditer(text or ""):
        attrs = {
            am.group(1): am.group(2) if am.group(2) is not None else am.group(3)
            for am in _ATTR_RE.finditer(m.group("attrs") or "")
        }
        # structural context: explicit `_section=` wins (needed when a
        # taxon ALSO carries the botanical rank attr `section=`);
        # otherwise `section=` is structural iff its value looks like a
        # subSubSection type: the known vocabulary OR any all-lowercase
        # token (GoldenGate has open-ended types like 'conservation',
        # 'taxon_discussion'; botanical rank epithets are Capitalized,
        # so the classes stay disjoint — round-2 ADVICE)
        section = attrs.pop("_section", None)
        if section is None:
            sv = attrs.get("section")
            if sv is not None and (
                sv in STRUCTURAL_SECTIONS or _STRUCTURAL_TOKEN.match(sv)
            ):
                section = attrs.pop("section")
        out.append(
            Mention(
                kind=m.group("kind"),
                attrs=attrs,
                surface=m.group("surface") or "",
                turn_idx=turn_idx,
                start=m.start(),
                section=section,
            )
        )
    return out


def parse_conversation(
    turns: list[tuple[int, str]]
) -> list[Mention]:
    """Parse ``(turn_idx, text)`` pairs sorted by turn_idx; assigns
    global document-order ``mention_idx`` (≙ XML document order, which
    drives the reference's order-sensitive alreadyCited semantics,
    gg2rdf.ts:90,1102-1143)."""
    mentions: list[Mention] = []
    for turn_idx, text in sorted(turns, key=lambda t: t[0]):
        mentions.extend(parse_turn(text, turn_idx))
    for i, m in enumerate(mentions):
        m.mention_idx = i
    return mentions


def render_span(kind: str, attrs: dict[str, str], surface: Optional[str] = None) -> str:
    """Inverse of parse (used by the deterministic generator)."""
    parts = [kind]
    for k, v in attrs.items():
        v = "" if v is None else str(v)
        if re.fullmatch(r'[^\s\]"]+', v):
            parts.append(f"{k}={v}")
        else:
            parts.append(f'{k}="{v}"')
    head = "[[" + " ".join(parts) + "]]"
    if surface is None:
        return head
    return f"{head}{surface}[[/]]"
