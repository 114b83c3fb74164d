"""Row-level bundle builders for the KG pipeline (SURVEY.md §2 C1-C6).

Each function computes, for ONE mention (or one conversation-level
row), everything the reference's corresponding builder would emit —
candidate triples, registry push-intents, status contributions —
*without* any cross-mention state.  Cross-mention semantics (the
alreadyCited fold D3, registry merge/first-seen order D1/E3, subject
existence) are applied relationally in ``assemble.py``.

These run inside Arrow-batched pandas passes (one Python call per
mention within a batch — never a per-row Spark UDF), matching the
input_hint's "vectorized pandas/Arrow UDFs, no per-row Python".

Status note: the per-conversation status is a MAX aggregate
(gg2rdf.ts:45-50), so attributing an identical warning in two
branches is harmless; attribution only needs to be exact at the
does-this-severity-occur level.  Cases where a warning's existence is
emission-conditional are called out inline.
"""

from __future__ import annotations

from typing import Mapping, Optional

from ..functions import kernels as K

HAS_WARNINGS = 1
HAS_ERRORS = 2
FAILED = 3

EXCLUDED_TAXON_ATTRS = {
    "id", "box", "pageId", "pageNumber", "lastPageId", "lastPageNumber",
    "higherTaxonomySource", "status",
}

_RE_EXCLUDE = None


def _attr_excluded(n: str) -> bool:
    global _RE_EXCLUDE
    if _RE_EXCLUDE is None:
        import re
        _RE_EXCLUDE = re.compile(r"\.|evidence|Evicence|lsidName")
    return (
        n in EXCLUDED_TAXON_ATTRS or n.startswith("_")
        or bool(_RE_EXCLUDE.search(n))
    )


# ---------------------------------------------------------------------------
# makeTaxonName call-tree → level list  (gg2rdf.ts:843-963)
# ---------------------------------------------------------------------------


def name_levels(attrs: Mapping[str, str], recurse: bool = True) -> dict:
    """One root ``makeTaxonName`` call (plus its parent recursion).

    Returns ``{"levels": [{uri, push, ord, props}], "root_uri", "error",
    "statuses"}``.  ``push=False`` marks the reference's orphan-subject
    case (find-or-create without registry push, gg2rdf.ts:852-854):
    such props only attach if the subject was pushed by an earlier
    call — enforced relationally by ord comparison in assemble.py.
    """
    registry: dict[str, dict] = {}  # only PUSHED subjects are findable
    order: list[str] = []
    statuses: list[int] = []
    out = {"levels": [], "root_uri": None, "error": None, "statuses": statuses}

    def mk(rank_limit: Optional[str], recurse_flag: bool) -> str:
        w: list[str] = []
        uri = K.taxon_name_uri(attrs, rank_limit, w)
        if w:
            statuses.append(HAS_WARNINGS)  # removePunctuation log warnings

        prev = registry.get(uri)
        s = prev if prev is not None else {"uri": uri, "push": False, "props": []}
        orphan = prev is None and not recurse_flag
        if prev is None and recurse_flag:
            registry[uri] = s
            order.append(uri)
            s["push"] = True

        ranks: list = [r for r in K.RANK_NAMES if r in attrs]
        rank = attrs.get("rank")

        if rank_limit:
            if rank_limit == "kingdom":
                return ""
            if rank_limit in ranks:  # indexOf >= 0 (gg2rdf.ts:885)
                ranks = ranks[: ranks.index(rank_limit)]
                rank = ranks[-1] if ranks else None

        if rank not in ranks:
            ranks.append(rank)

        next_rank_limit = ""

        if rank_limit:
            ranks = [
                n for n in ranks
                if n is not None and attrs.get(n)
                and not K.is_junk_token(K.js_trim(attrs[n]))
            ]
            if ranks:
                next_rank_limit = ranks[-1]
                s["props"].append((
                    f"dwc:{next_rank_limit}",
                    K.STR(K.normalize_space(attrs.get(next_rank_limit))),
                ))
                if "genus" in ranks:
                    s["props"].append(
                        ("dwc:genus", K.STR(K.normalize_space(attrs.get("genus"))))
                    )
                if "kingdom" in ranks:
                    s["props"].append((
                        "dwc:kingdom",
                        K.STR(K.normalize_space(attrs.get("kingdom"))),
                    ))
        else:
            for n in ranks:
                attr_ = attrs.get(n) if n is not None else None
                if attr_:
                    attr = K.js_trim(attr_)
                    if K.is_junk_token(attr):
                        s["props"].append(("# Warning:", f"ignoring {n} {K.STR(attr)}"))
                        statuses.append(HAS_WARNINGS)
                    else:
                        s["props"].append(
                            (f"dwc:{n}", K.STR(K.normalize_space(attr)))
                        )
                        if "." in attr:
                            s["props"].append(
                                ("# Warning:", f"abbreviated {n} {K.STR(attr)}")
                            )
                            statuses.append(HAS_WARNINGS)
                        next_rank_limit = n

        if next_rank_limit:
            s["props"].append(("dwc:rank", K.STR(next_rank_limit)))

        if not recurse_flag or next_rank_limit == "kingdom":
            pass
        elif next_rank_limit and rank_limit != next_rank_limit:
            parent = mk(next_rank_limit, True)
            if parent and parent != uri:
                s["props"].append(("trt:hasParentName", parent))
        else:
            s["props"].append(("# Warning:", "Could not determine parent name"))
            statuses.append(HAS_WARNINGS)

        s["props"].append(("a", "dwcFP:TaxonName"))
        if orphan:
            # record orphan level (props attach only to pre-existing subj)
            out["levels"].append(s)
        return uri

    try:
        out["root_uri"] = mk(None, recurse)
    except K.TaxonNameURIError as e:
        out["error"] = str(e)
        return out

    out["levels"] = [registry[u] for u in order] + [
        l for l in out["levels"] if not l["push"]
    ]
    for i, l in enumerate(out["levels"]):
        l["ord"] = i
    return out


# ---------------------------------------------------------------------------
# makeTaxonConcept  (gg2rdf.ts:463-606)
# ---------------------------------------------------------------------------


def concept_bundle(
    attrs: Mapping[str, str],
    doc_attrs: Mapping[str, str],
    tt_attrs: Optional[Mapping[str, str]],
    in_ref_group: bool,
    is_defining: bool,
    recurse_tn: bool = True,
) -> dict:
    """Returns {ok, uri, tnuri, year, props, name, statuses, error}."""
    statuses: list[int] = []
    out: dict = {
        "ok": False, "uri": None, "tnuri": None, "year": "",
        "props": [], "name": None, "statuses": statuses, "error": None,
    }
    authority, warnings, fallback_doc_info = K.get_full_authority(
        attrs, doc_attrs, is_defining
    )
    for w in warnings:
        if w.startswith('Removing "'):
            statuses.append(HAS_WARNINGS)

    taxon_relation = K.get_taxon_relation(attrs, tt_attrs, in_ref_group)
    c_rank_group = K.taxon_rank_group(attrs)

    w: list[str] = []
    try:
        tnuri = K.taxon_name_uri(attrs, None, w)
    except K.TaxonNameURIError as e:
        out["error"] = str(e)
        return out
    if w:
        statuses.append(HAS_WARNINGS)
    out["tnuri"] = tnuri

    name = name_levels(attrs, recurse_tn)
    statuses.extend(name["statuses"])
    if name["error"]:
        out["error"] = name["error"]
        return out
    out["name"] = name

    if authority == "INVALID":
        statuses.append(HAS_WARNINGS)  # 'Invalid Authority for <tnuri>'
        return out

    year = K.authority_year(authority)
    out["year"] = year
    suffix = f"_{K.authority_name_for_uri(authority)}_{K.partial_uri(year)}"
    w2: list[str] = []
    uri = K.taxon_concept_uri(attrs, suffix, w2)
    if w2:
        statuses.append(HAS_WARNINGS)
    out["uri"] = uri
    out["ok"] = True

    props: list = out["props"]
    props.append(("trt:hasTaxonName", tnuri))

    if c_rank_group == K.RANKS_INVALID or taxon_relation == K.REL_NONE:
        if c_rank_group == K.RANKS_INVALID:
            props.append(("# Error:", "Invalid Rank"))
            statuses.append(HAS_ERRORS)
        if taxon_relation == K.REL_NONE:
            props.append(("# Error:", "Invalid taxon relation"))
            statuses.append(HAS_ERRORS)
        props.append(("a", "dwcFP:TaxonConcept"))
        return out

    for n in attrs:
        if _attr_excluded(n):
            continue
        attr = attrs.get(n)
        if n == "ID-CoL":
            props.append((
                "rdfs:seeAlso",
                K.URI(
                    "https://www.catalogueoflife.org/data/taxon/"
                    + K.normalize_space(attr)
                ),
            ))
        elif attr is not None and K.is_junk_token(attr):
            props.append(("# Warning:", f"ignoring {n} {K.STR(attr)}"))
            statuses.append(HAS_WARNINGS)
        else:
            props.append((f"dwc:{n}", K.STR(K.normalize_space(attr))))

    for wmsg in warnings:
        props.append(("# Warning:", wmsg))
    if not any(p == "dwc:scientificNameAuthorship" for p, _ in props):
        props.append(("dwc:scientificNameAuthorship", K.STR(authority)))

    if fallback_doc_info:
        doc_author = K.simplify_doc_author(doc_attrs.get("docAuthor"))
        doc_date = doc_attrs.get("docDate")
        doc_date_js = doc_date if doc_date is not None else "null"
        props.append((
            "dwc:authority",
            K.STR(K.normalize_authority(f"{doc_author}, {doc_date_js}")),
        ))
        props.append(("dwc:authorityName", K.STR(doc_author)))
        props.append(("dwc:authorityYear", K.STR(doc_date)))
        props.append(("# Info:", "authority attributes generated from docAuthor"))

    props.append(("a", "dwcFP:TaxonConcept"))
    return out


# ---------------------------------------------------------------------------
# addTaxonConceptCitation (fold-independent part)  (gg2rdf.ts:1057-1144)
# ---------------------------------------------------------------------------


def citation_bundle(
    attrs: Mapping[str, str],
    doc_attrs: Mapping[str, str],
    tt_attrs: Optional[Mapping[str, str]],
) -> dict:
    """Per citation unit: branch decision + all fold-independent data.

    branch ∈ {rank_issue, invalid_auth, cites, same_none, deprecates,
    error}.  The alreadyCited guards and the invalid_auth-branch
    makeTaxonName call are emission-dependent and resolved by the fold
    in assemble.py (its statuses are safe to count unconditionally —
    identical warnings already arise from the unconditional URI mint,
    see module docstring).
    """
    statuses: list[int] = []
    out: dict = {
        "branch": None, "warn_obj": None, "uri": None, "tnuri": None,
        "year": "", "concept": None, "name_if_emitted": None,
        # statuses of the emission-conditional makeTaxonName call in the
        # invalid-authority branch (gg2rdf.ts:1095-1100): junk-token
        # 'ignoring'/abbreviated warnings there involve no punctuation
        # change, so the unconditional URI mint does NOT subsume them —
        # the fold gates these on name_emitted (status_frame applies
        # them only for units that actually emitted)
        "nie_statuses": [],
        "statuses": statuses, "error": None,
    }
    try:
        authority, warnings, _ = K.get_full_authority(attrs, doc_attrs, False)
        for w in warnings:
            if w.startswith('Removing "'):
                statuses.append(HAS_WARNINGS)
        year = K.authority_year(authority)
        out["year"] = year
        valid = authority != "INVALID"

        taxon_relation = K.get_taxon_relation(attrs, tt_attrs, True)
        c_rank_group = K.taxon_rank_group(attrs)

        if (
            c_rank_group == K.RANKS_INVALID
            or not attrs.get("kingdom")
            or (c_rank_group == K.RANKS_SPECIES and not attrs.get("genus"))
        ):
            if not valid:
                w: list[str] = []
                tn = K.taxon_name_uri(attrs, None, w)
                if w:
                    statuses.append(HAS_WARNINGS)
                out["warn_obj"] = (
                    f"Not adding 'trt:citesTaxonName {tn}' due to issues with rank"
                )
            else:
                suffix = (
                    f"_{K.authority_name_for_uri(authority)}_{K.partial_uri(year)}"
                )
                w2: list[str] = []
                tc = K.taxon_concept_uri(attrs, suffix, w2)
                if w2:
                    statuses.append(HAS_WARNINGS)
                out["warn_obj"] = (
                    f"Not adding 'trt:citesTaxonName {tc}' due to issues with rank"
                )
            statuses.append(HAS_WARNINGS)
            out["branch"] = "rank_issue"
            return out

        if not valid:
            w3: list[str] = []
            uri = K.taxon_name_uri(attrs, None, w3)
            if w3:
                statuses.append(HAS_WARNINGS)
            out["branch"] = "invalid_auth"
            out["uri"] = uri
            out["tnuri"] = uri
            nie = name_levels(attrs, recurse=False)
            out["name_if_emitted"] = nie
            out["nie_statuses"] = list(nie["statuses"])
            return out

        if taxon_relation == K.REL_CITES:
            c = concept_bundle(attrs, doc_attrs, tt_attrs, True, False, False)
            statuses.extend(c["statuses"])
            if c["error"]:
                out["error"] = c["error"]
                return out
            out["branch"] = "cites"
            out["concept"] = c
            out["uri"] = c["uri"]
            out["tnuri"] = c["tnuri"]
            return out

        if taxon_relation in (K.REL_SAME, K.REL_NONE):
            out["branch"] = "same_none"
            return out

        c = concept_bundle(attrs, doc_attrs, tt_attrs, True, False, True)
        statuses.extend(c["statuses"])
        if c["error"]:
            out["error"] = c["error"]
            return out
        out["branch"] = "deprecates"
        out["concept"] = c
        out["uri"] = c["uri"]
        out["tnuri"] = c["tnuri"]
        return out
    except K.TaxonNameURIError as e:
        out["error"] = str(e)
        return out


# ---------------------------------------------------------------------------
# Figures / materials  (gg2rdf.ts:393-454, 773-836)
# ---------------------------------------------------------------------------


def figure_bundle(attrs: Mapping[str, str]) -> dict:
    uri = K.figure_uri(attrs)
    props: list = []
    if "captionText" in attrs:
        props.append(("dc:description", K.STR(attrs.get("captionText"))))
    rep = K.figure_representation(attrs.get("httpUri") or "")
    if rep:
        props.append(("fabio:hasRepresentation", rep))
    props.append(("a", "fabio:Figure"))
    return {"uri": uri, "props": props}


def material_bundle(attrs: Mapping[str, str], doc_id: str) -> dict:
    """Returns {uri ('' when identifier-less), props, warn}."""
    mc_id = attrs.get("id")
    http_uri = attrs.get("httpUri")
    gbif = attrs.get("ID-GBIF-Occurrence")
    specimen = attrs.get("specimenCode")

    if mc_id:
        uri = K.URI(f"http://tb.plazi.org/GgServer/dwcaRecords/{doc_id}.mc.{mc_id}")
    elif gbif:
        uri = K.URI(f"https://www.gbif.org/occurrence/{gbif}")
    elif http_uri:
        uri = K.URI(http_uri)
    else:
        uri = K.URI(
            f"http://treatment.plazi.org/id/{doc_id}/{K.partial_uri(specimen)}",
            "_",
        )

    if not mc_id and not http_uri and not specimen:
        return {"uri": "", "props": [], "warn": True}

    props: list = []
    for xml, rdf in [
        ("specimenCode", "dwc:catalogNumber"),
        ("collectionCode", "dwc:collectionCode"),
        ("typeStatus", "dwc:typeStatus"),
        ("latitude", "dwc:verbatimLatitude"),
        ("longitude", "dwc:verbatimLongitude"),
        ("elevation", "dwc:verbatimElevation"),
        ("collectingCountry", "dwc:countryCode"),
        ("collectingRegion", "dwc:stateProvince"),
        ("collectingMunicipality", "dwc:municipality"),
        ("collectingCounty", "dwc:county"),
        ("location", "dwc:locality"),
        ("locationDeviation", "dwc:verbatimLocality"),
        ("collectorName", "dwc:recordedBy"),
        ("collectingDate", "dwc:eventDate"),
        ("collectingMethod", "dwc:samplingProtocol"),
        ("ID-GBIF-Occurrence", "trt:gbifOccurrenceId"),
        ("ID-GBIF-Specimen", "trt:gbifSpecimenId"),
    ]:
        if xml in attrs:
            props.append((rdf, K.STR(attrs.get(xml))))
    if http_uri:
        props.append(("trt:httpUri", K.URI(http_uri)))
    if mc_id:
        props.append((
            "trt:httpUri",
            K.URI(f"https://treatment.plazi.org/id/{doc_id}#{mc_id}"),
        ))
    props.append(("a", "dwc:MaterialCitation"))
    return {"uri": uri, "props": props, "warn": False}


# ---------------------------------------------------------------------------
# Conversation-level: treatment core + publication  (gg2rdf.ts:235-391,
# 969-1055, 1396-1442)
# ---------------------------------------------------------------------------


def treatment_bundle(
    doc_attrs: Optional[Mapping[str, str]],
    mods_attrs: Optional[Mapping[str, str]],
    tt_attrs: Optional[Mapping[str, str]],
    tt_status: Optional[str],
) -> dict:
    """Everything conv-level that precedes the citation fold."""
    statuses: list[int] = []
    out: dict = {
        "missing_document": doc_attrs is None,
        "raw0": [], "statuses": statuses, "failed_error": None,
        "doc_id": None, "treatment_uri": None, "t_props": [],
        "concept": None, "seed_uri": None, "seed_tnuri": None,
        "relation_pred": None, "vern_target": None, "creator": None,
        "publication": None, "pub_props": [],
    }
    if doc_attrs is None:
        return out
    mods_attrs = mods_attrs or {}

    doc_id = K.partial_uri(doc_attrs.get("docId") or "") or "MISSING_ID"
    out["doc_id"] = doc_id
    out["treatment_uri"] = K.URI(f"http://treatment.plazi.org/id/{doc_id}")

    if tt_attrs is None:
        out["raw0"].append("# Error: the treatment is lacking the taxon")
        statuses.append(HAS_ERRORS)
    elif not tt_attrs.get("kingdom"):
        out["raw0"].append(
            "# Warning: treatment taxon is missing ancestor kingdom"
        )
        statuses.append(HAS_WARNINGS)

    t_props: list = out["t_props"]

    if tt_attrs is not None:
        epithet_errors = K.check_epithet_errors(tt_attrs)
        if epithet_errors:
            for e in epithet_errors:
                t_props.append(
                    ("# Warning: Could not add treatment taxon because", e)
                )
                statuses.append(HAS_WARNINGS)
        else:
            taxon_status = tt_status if tt_status is not None else "ABSENT"
            is_defining = bool(taxon_status) and taxon_status not in (
                "nomen dubium", "(nomen dubium)", "ABSENT", "incertae sedis",
            )
            c = concept_bundle(
                tt_attrs, doc_attrs, tt_attrs, False, is_defining, True
            )
            statuses.extend(c["statuses"])
            if c["error"]:
                out["failed_error"] = c["error"]
                return out
            out["concept"] = c
            if not c["ok"]:
                t_props.append(("trt:treatsTaxonName", c["tnuri"]))
            else:
                if taxon_status in ("nomen dubium", "(nomen dubium)"):
                    pred = "trt:deprecates"
                elif is_defining:
                    pred = "trt:definesTaxonConcept"
                else:
                    pred = "trt:augmentsTaxonConcept"
                t_props.append((pred, c["uri"]))
                out["relation_pred"] = pred
                out["seed_uri"] = c["uri"]
            out["seed_tnuri"] = c["tnuri"]
            out["vern_target"] = c["tnuri"]

    if "docTitle" in doc_attrs:
        t_props.append(("dc:title", K.STR(doc_attrs.get("docTitle"))))

    creator = K.STR(mods_attrs.get("authors") or "")
    out["creator"] = creator
    publication = K.publication_uri(doc_attrs)
    out["publication"] = publication
    t_props.append(("dc:creator", creator))
    t_props.append(("trt:publishedIn", publication))

    # publication subject props (gg2rdf.ts:969-1055) except hasPart
    pub: list = out["pub_props"]
    titles = ", ".join(
        K.STR(mods_attrs[k]) for k in ("title", "title2") if k in mods_attrs
    )
    if titles:
        pub.append(("dc:title", titles))
    pub.append(("dc:creator", creator))
    for k in ("date", "dateIssued"):
        if k in mods_attrs:
            pub.append(("dc:date", K.STR(mods_attrs[k])))
    for k in ("classification", "classification2"):
        cls = mods_attrs.get(k)
        if cls == "journal article":
            if "journal" in mods_attrs:
                pub.append(("bibo:journal", K.STR(mods_attrs["journal"])))
            for detail in ("volume", "issue"):
                if detail in mods_attrs:
                    pub.append((
                        f"bibo:{detail}",
                        f'"{K.normalize_space(mods_attrs[detail])}"',
                    ))
            for page, bp in (("startPage", "bibo:startPage"),
                             ("endPage", "bibo:endPage")):
                if page in mods_attrs:
                    pub.append((bp, f'"{K.normalize_space(mods_attrs[page])}"'))
            pub.append(("a", "fabio:JournalArticle"))
        elif cls == "book chapter":
            for page, bp in (("startPage", "bibo:startPage"),
                             ("endPage", "bibo:endPage")):
                if page in mods_attrs:
                    pub.append((bp, f'"{K.normalize_space(mods_attrs[page])}"'))
            pub.append(("a", "fabio:BookSection"))
        elif cls == "book":
            pub.append(("a", "fabio:Book"))

    return out


def vernacular_prop(surface: str, language: Optional[str]) -> list[tuple[str, str]]:
    """dwc:vernacularName props for one mention (gg2rdf.ts:289-315)."""
    tag = K.ISO6393_TO_1.get(language) if language else None
    lit = K.STR(K.normalize_space(surface))
    if tag:
        return [("dwc:vernacularName", f"{lit}@{tag}")]
    return [
        ("dwc:vernacularName", lit),
        ("# Info:", f"Couldn't generate language tag for {lit}@{language}"),
    ]
