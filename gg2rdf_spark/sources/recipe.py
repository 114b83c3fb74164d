"""Deterministic synthetic-transcript recipe (FIXTURES.md §1).

One spec, three consumers:

* :func:`conversation_turns` — pure-Python recipe, one conversation per
  ``doc_id``; used by the scalable ``mapInPandas`` generator
  (``gg2rdf_spark.sources.synth``) and directly by pytest/refimpl.
* :func:`transcripts_sql` — an engine-portable SQL mirror of the same
  recipe (runs unchanged on Spark SQL and DuckDB modulo a two-entry
  dialect shim), so the driver's DuckDB oracle can independently derive
  the identical ``(conv_id, turn_idx, role, text, tool, ts)`` table
  from the ``documents`` parquet.

Determinism: every choice is ``pick(doc_id, k, n) =
((doc_id+1) * C_k) % 2147483647 % n`` with distinct multipliers per
field — integer arithmetic only, portable across Python / Spark /
DuckDB (no engine hash functions, no floats).

The emitted mention markup follows FIXTURES.md §1.1 and mirrors the
reference's element vocabulary (`/root/reference/example-data/*.xml`):
taxonomicName, taxonomicNameLabel, treatmentCitation, figureCitation,
materialsCitation, vernacularName, plus turn-0 ``[[document ...]]`` /
``[[mods ...]]`` metadata spans.  Edge-case scenarios cover the
reference's error ledger profile (missing taxon, invalid sigEpithet,
missing rank, missing kingdom, abbreviated genus — errors.log counts
cited in SURVEY.md §5).
"""

from __future__ import annotations

P = 2147483647
BASE_TS_MS = 1704067200000  # 2024-01-01T00:00:00Z
N_TURNS = 5


def pick(doc_id: int, k: int, n: int) -> int:
    # multiplier > P so the mod-P wrap always mixes (see synthsql.pick_sql)
    return ((doc_id + 1) * (2654435761 + 104730 * k)) % P % n


# ---- pools (index-addressed by pick) --------------------------------------

GENUS = ["Saigona", "Drosophila", "Carabus", "Quercus", "Bembidion",
         "Papilio", "Aster", "Rana", "Salmo", "Felis", "Pinus", "Lycaena"]
SPECIES = ["baiseensis", "montanus", "alpina", "sylvatica", "punctatus",
           "viridis", "elegans", "minor", "majus", "robustus", "gracilis",
           "obscurus", "nigra", "alba", "rufus", "communis"]
FAMILY = ["Carabidae", "Fagaceae", "Asteraceae", "Salmonidae",
          "Pieridae", "Pinaceae"]
ORDER = ["Coleoptera", "Fagales", "Asterales", "Salmoniformes",
         "Lepidoptera", "Pinales"]
CLASSES = ["Insecta", "Magnoliopsida", "Actinopterygii", "Pinopsida"]
PHYLUM = ["Arthropoda", "Tracheophyta", "Chordata"]
SURNAME = ["Smith", "Jones", "Miller", "Zhang", "Garcia", "Dubois",
           "Chen", "Novak", "Rossi", "Tanaka"]
VERN = ["ground beetle", "mountain oak", "river trout", "blue butterfly"]
VERN_LANG = ["eng", "deu", "fra", "qqx"]  # qqx → no 639-1 tag (fallback)
JOURNAL = ["Zootaxa", "ZooKeys", "Phytotaxa", "European Journal of Taxonomy"]

# field indices for pick(); keep stable — the SQL mirror uses the same
K_GENUS, K_SPECIES, K_KINGDOM, K_FAMILY, K_CLASS, K_PHYLUM = 1, 2, 3, 4, 5, 6
K_SURNAME, K_YEAR, K_ASTYLE, K_HASYEAR, K_STATUS, K_ERR = 7, 8, 9, 10, 11, 12
K_RANKSTYLE, K_NCIT, K_DOI, K_CLS, K_NFIG, K_FIGSTYLE = 13, 14, 15, 16, 17, 18
K_NMAT, K_VERN, K_VERNLANG, K_SURNAME2, K_FIGDUP, K_MATSTYLE = 19, 20, 21, 22, 23, 24
K_CIT = 30  # + 10*j per citation j


def _kingdom(doc_id: int) -> str | None:
    v = pick(doc_id, K_KINGDOM, 10)
    if v <= 5:
        return "Animalia"
    if v <= 8:
        return "Plantae"
    return None


def _authority(doc_id: int, style: int, surname: str, surname2: str,
               year: int, has_year: bool) -> dict[str, str]:
    """authorityName/authorityYear/authority attrs for a taxon."""
    attrs: dict[str, str] = {}
    if style == 0:
        attrs["authorityName"] = surname
    elif style == 1:
        attrs["authorityName"] = f"{surname} & {surname2}"
    elif style == 2:
        attrs["authorityName"] = surname.upper()
    elif style == 3:
        attrs["authorityName"] = f"A. B. {surname}"
    elif style == 4:
        attrs["authorityName"] = f"{surname} and {surname2}"
    elif style == 5:
        attrs["authorityName"] = "L."
    elif style == 6:
        attrs["authorityName"] = f"({surname2}) {surname}"
    # style 7: no authorityName → doc-metadata fallback (gg2rdf.ts:717-740)
    if style != 7 and has_year:
        attrs["authorityYear"] = str(year)
    return attrs


def conversation_recipe(doc_id: int) -> dict:
    """All derived choices for one conversation (shared with SQL)."""
    g = GENUS[pick(doc_id, K_GENUS, len(GENUS))]
    sp = SPECIES[pick(doc_id, K_SPECIES, len(SPECIES))]
    fam_i = pick(doc_id, K_FAMILY, len(FAMILY))
    surname = SURNAME[pick(doc_id, K_SURNAME, len(SURNAME))]
    surname2 = SURNAME[pick(doc_id, K_SURNAME2, len(SURNAME))]
    year = 1900 + pick(doc_id, K_YEAR, 120)
    return {
        "doc_id": doc_id,
        "genus": g,
        "species": sp,
        "family": FAMILY[fam_i],
        "order": ORDER[fam_i],
        "class": CLASSES[pick(doc_id, K_CLASS, len(CLASSES))],
        "phylum": PHYLUM[pick(doc_id, K_PHYLUM, len(PHYLUM))],
        "kingdom": _kingdom(doc_id),
        "surname": surname,
        "surname2": surname2,
        "year": year,
        "a_style": pick(doc_id, K_ASTYLE, 8),
        "has_year": pick(doc_id, K_HASYEAR, 4) > 0,
        "status_style": pick(doc_id, K_STATUS, 8),
        "err": pick(doc_id, K_ERR, 25),
        "rank_style": pick(doc_id, K_RANKSTYLE, 6),
        "n_citations": pick(doc_id, K_NCIT, 4),
        "doi_style": pick(doc_id, K_DOI, 4),
        "cls_style": pick(doc_id, K_CLS, 10),
        "n_figs": pick(doc_id, K_NFIG, 4),
        "fig_style": pick(doc_id, K_FIGSTYLE, 4),
        "fig_dup": pick(doc_id, K_FIGDUP, 3) == 0,
        "n_mats": pick(doc_id, K_NMAT, 3),
        "mat_style": pick(doc_id, K_MATSTYLE, 5),
        "has_vern": pick(doc_id, K_VERN, 4) == 0,
        "vern_lang": VERN_LANG[pick(doc_id, K_VERNLANG, len(VERN_LANG))],
        "vern": VERN[pick(doc_id, K_VERNLANG, len(VERN))],
    }


def conv_id_str(doc_id: int) -> str:
    return "c" + str(doc_id).rjust(7, "0")


def _taxon_attr_str(r: dict) -> str:
    """The nomenclature taxonomicName span (turn 1)."""
    a: list[str] = ["section=nomenclature"]
    err = r["err"]
    rank_genus = r["rank_style"] == 0
    rank = "genus" if rank_genus else "species"
    if err == 3:
        pass  # missing rank attribute (errors.log: 49×)
    else:
        a.append(f"rank={rank}")
    if r["kingdom"]:
        a.append(f"kingdom={r['kingdom']}")
    a.append(f"phylum={r['phylum']}")
    a.append(f'class={r["class"]}')
    a.append(f"order={r['order']}")
    a.append(f"family={r['family']}")
    genus = "T." if err == 4 else r["genus"]
    a.append(f"genus={genus}")
    if not rank_genus:
        species = f"6 {r['species']}?" if err == 2 else r["species"]
        if " " in species or "?" in species:
            a.append(f'species="{species}"')
        else:
            a.append(f"species={species}")
    auth = _authority(
        r["doc_id"], r["a_style"], r["surname"], r["surname2"],
        r["year"], r["has_year"],
    )
    for k, v in auth.items():
        a.append(f'{k}="{v}"' if " " in v else f"{k}={v}")
    ss = r["status_style"]
    if ss <= 3:
        a.append('status="sp. nov."')
    elif ss == 6:
        a.append('status="nomen dubium"')
    elif ss == 7:
        a.append('status="incertae sedis"')
    # ss 4: label fallback; ss 5: ABSENT
    return " ".join(a)


def _citation_attrs(r: dict, j: int) -> str | None:
    """Reference-group citation j (turn 4).  Scenarios exercise
    gg2rdf.ts:1057-1210 (CITES / SAME / DEPRECATES / invalid authority /
    rank issues / alreadyCited dedup)."""
    doc_id = r["doc_id"]
    scen = pick(doc_id, K_CIT + 10 * j, 6)
    if j >= 1 and pick(doc_id, K_CIT + 10 * j + 1, 3) == 0:
        scen = pick(doc_id, K_CIT, 6)  # duplicate of citation 0's scenario
        j = 0  # same attrs → same URI → alreadyCited path
    cg = GENUS[pick(doc_id, K_CIT + 10 * j + 2, len(GENUS))]
    cs = SPECIES[pick(doc_id, K_CIT + 10 * j + 3, len(SPECIES))]
    csur = SURNAME[pick(doc_id, K_CIT + 10 * j + 4, len(SURNAME))]
    cyear = 1850 + pick(doc_id, K_CIT + 10 * j + 5, 170)
    a = ["section=reference_group", "rank=species"]
    kingdom = r["kingdom"] or "Animalia"
    if scen == 0:  # plain CITES with year
        a += [f"kingdom={kingdom}", f"genus={cg}", f"species={cs}",
              f"authorityName={csur}", f"authorityYear={cyear}"]
    elif scen == 1:  # CITES, authority without digits → year="" exception
        a += [f"kingdom={kingdom}", f"genus={cg}", f"species={cs}",
              f"authorityName={csur}"]
    elif scen == 2:  # no authority at all → citesTaxonName fallback
        a += [f"kingdom={kingdom}", f"genus={cg}", f"species={cs}"]
    elif scen == 3:  # SAME: mirror the treatment taxon
        a = ["section=reference_group"]
        if r["err"] != 3:
            a.append("rank=" + ("genus" if r["rank_style"] == 0 else "species"))
        if r["kingdom"]:
            a.append(f"kingdom={r['kingdom']}")
        a.append(f"genus={'T.' if r['err'] == 4 else r['genus']}")
        if r["rank_style"] != 0:
            sp = f"6 {r['species']}?" if r["err"] == 2 else r["species"]
            a.append(f'species="{sp}"' if (" " in sp or "?" in sp) else f"species={sp}")
        auth = _authority(doc_id, r["a_style"], r["surname"], r["surname2"],
                          r["year"], r["has_year"])
        for k, v in auth.items():
            a.append(f'{k}="{v}"' if " " in v else f"{k}={v}")
    elif scen == 4:  # DEPRECATES: same genus, different species+authority
        a += [f"kingdom={kingdom}", f"genus={r['genus']}",
              f"species={cs}", f"authorityName={csur}",
              f"authorityYear={cyear}"]
    else:  # scen 5: missing kingdom → 'issues with rank' warning
        a += [f"genus={cg}", f"species={cs}",
              f"authorityName={csur}", f"authorityYear={cyear}"]
    return " ".join(a)


def _figure_span(r: dict, j: int) -> str:
    doc_id = r["doc_id"]
    style = (r["fig_style"] + j) % 4
    if r["fig_dup"] and j == 1:
        style, j = r["fig_style"] % 4, 0  # duplicate of figure 0
    rec = 10000 + (doc_id * 7 + j * 13) % 90000
    cap = f"FIGURE {j + 1}. Habitus of the new species, dorsal view"
    if style == 0:
        uri = f"https://zenodo.org/record/{rec}/files/figure{j}.png"
        return f'[[figureCitation httpUri="{uri}" captionText="{cap}"]]'
    if style == 1:
        uri = f"http://dx.doi.org/10.5281/zenodo.{rec}"
        return f'[[figureCitation httpUri="{uri}" captionText="{cap}"]]'
    if style == 2:
        return f'[[figureCitation figureDoi="10.5281/zenodo.{rec}" captionText="{cap}"]]'
    return f'[[figureCitation figureDoi="https://doi.org/10.11646/fig.{rec}" captionText="{cap}"]]'


def _material_span(r: dict, j: int) -> str:
    doc_id = r["doc_id"]
    style = (r["mat_style"] + j) % 5
    n = 100000 + (doc_id * 11 + j * 17) % 900000
    common = (
        'collectionCode=ZMB typeStatus=holotype latitude=23.75 '
        'longitude=106.59 collectingCountry=China '
        f'collectorName="{r["surname"]}" collectingDate="{r["year"]}-06-0{j + 1}"'
    )
    if style == 0:
        return f'[[materialsCitation id=m{j}X{n} specimenCode="ZMB {n}" {common}]]'
    if style == 1:
        return f'[[materialsCitation ID-GBIF-Occurrence={n} specimenCode="ZMB {n}" {common}]]'
    if style == 2:
        return (f'[[materialsCitation httpUri="http://coll.example.org/spec/{n}" '
                f'specimenCode="ZMB {n}" {common}]]')
    if style == 3:
        return f'[[materialsCitation specimenCode="ZMB {n}" {common}]]'
    return f"[[materialsCitation {common}]]"  # no identifier → warning


def conversation_turns(doc_id: int) -> list[dict]:
    """One conversation as rows of the input_hint schema (ts in epoch
    ms; the DataFrame layer converts to timestamp)."""
    r = conversation_recipe(doc_id)
    cid = conv_id_str(doc_id)
    err = r["err"]
    turns: list[dict] = []

    def add(turn_idx: int, role: str, text: str, tool: str | None = None):
        turns.append({
            "conv_id": cid,
            "turn_idx": turn_idx,
            "role": role,
            "text": text,
            "tool": tool,
            "ts_ms": BASE_TS_MS + doc_id * 3600_000 + turn_idx * 60_000,
        })

    # turn 0: document + MODS metadata (≙ <document> attrs + MODS subtree)
    if err == 0:
        add(0, "user", "Please summarize the new taxon treatment.")
    else:
        doc_author = f"{r['surname']}, Alex & {r['surname2']}, Kim"
        title = f"A new species of {r['genus']} from the Eastern Hills"
        doi_style = r["doi_style"]
        doc_bits = [
            f"docId=TT{doc_id:07d}",
            f'docAuthor="{doc_author}"',
            f"docDate={r['year']}",
            f'docTitle="{title}"',
            f"masterDocId=FF{doc_id:05d}",
        ]
        if doi_style == 0:
            doc_bits.append(f"ID-DOI=10.11646/zootaxa.{4000 + doc_id % 1000}.1.{1 + doc_id % 9}")
        elif doi_style == 1:
            doc_bits.append(f'ID-DOI="https://doi.org/10.11646/zootaxa.{4000 + doc_id % 1000}.1.{1 + doc_id % 9}"')
        elif doi_style == 3:
            doc_bits.append(f'ID-DOI="http://example.org/pub/{doc_id}"')
            doc_bits.append(f'docSource="https://dx.doi.org/10.5281/src.{doc_id}"')
        # doi_style 2: no ID-DOI → publication.plazi.org/masterDocId
        cls = r["cls_style"]
        mods_bits = [f'title="{title}"', f'authors="{r["surname"]}, Alex; {r["surname2"]}, Kim"',
                     f"date={r['year']}"]
        if cls <= 6:
            mods_bits += [
                'classification="journal article"',
                f'journal="{JOURNAL[cls % len(JOURNAL)]}"',
                f"volume={100 + doc_id % 400}",
                f"startPage={1 + doc_id % 90}",
                f"endPage={12 + doc_id % 90}",
            ]
        elif cls <= 8:
            mods_bits += ['classification="book chapter"',
                          f"startPage={1 + doc_id % 90}",
                          f"endPage={12 + doc_id % 90}"]
        else:
            mods_bits += ['classification=book']
        add(0, "user",
            f"[[document {' '.join(doc_bits)}]] [[mods {' '.join(mods_bits)}]] "
            "Please analyze this treatment.")

    # turn 1: nomenclature
    if err == 1:
        add(1, "assistant", "The treatment text lacks a clear nomenclature section.")
    else:
        name = f"{'T.' if err == 4 else r['genus']} {r['species']}"
        label = ""
        if r["status_style"] == 4:
            label = " [[taxonomicNameLabel rank=species]]comb. nov.[[/]]"
        add(1, "assistant",
            f"Nomenclature. [[taxonomicName {_taxon_attr_str(r)}]]{name}[[/]]"
            f"{label} is described here.")

    # turn 2: description with figures (+ vernacular)
    figs = " ".join(_figure_span(r, j) for j in range(r["n_figs"]))
    vern = ""
    if r["has_vern"]:
        vern = (f' Known locally as [[vernacularName language={r["vern_lang"]}]]'
                f'{r["vern"]}[[/]].')
    add(2, "assistant",
        f"Description. Body length 4.2-4.8 mm. {figs}{vern}")

    # turn 3: materials
    mats = " ".join(_material_span(r, j) for j in range(r["n_mats"]))
    add(3, "tool", f"Materials examined. {mats}", tool="collection_db")

    # turn 4: reference group citations
    cits = " ".join(
        f"[[treatmentCitation {_citation_attrs(r, j)}]]"
        for j in range(r["n_citations"])
    )
    add(4, "assistant",
        f"References. {cits}" if cits else "References. None relevant.")

    return turns
