"""Behavioral tests for the serial oracle (refimpl) on hand-built
edge-case conversations (FIXTURES.md §1.2).

Expected values are hand-derived from the reference control flow
(`/root/reference/src/gg2rdf.ts`, cited per test).  These pin the
oracle; the distributed pipeline is then differential-tested against
the oracle in test_pipeline_parity.py.
"""

from gg2rdf_spark import refimpl
from gg2rdf_spark.functions.markup import parse_turn
from gg2rdf_spark.sources import recipe


DOC0 = (
    '[[document docId=TT0000042 docAuthor="Zheng, Wei & Chen, Li" '
    'docDate=2021 docTitle="A new species of Saigona" '
    "masterDocId=FFAA42 ID-DOI=10.11646/zootaxa.5004.1.1]] "
    '[[mods title="A new species of Saigona" '
    'authors="Zheng, Wei; Chen, Li" date=2021 '
    'classification="journal article" journal="Zootaxa" volume=5004 '
    "startPage=1 endPage=12]] intro"
)

TAXON = (
    "[[taxonomicName section=nomenclature rank=species kingdom=Animalia "
    "phylum=Arthropoda class=Insecta order=Hemiptera family=Dictyopharidae "
    'genus=Saigona species=baiseensis authorityName="Zheng & Chen" '
    'authorityYear=2021 status="sp. nov."]]Saigona baiseensis[[/]]'
)


def happy_turns():
    return [
        (0, DOC0),
        (1, f"Nomenclature. {TAXON} is new."),
        (2, 'Desc. [[figureCitation httpUri="https://zenodo.org/record/777/'
            'files/f.png" captionText="FIGURE 1. Habitus"]] '
            "[[vernacularName language=eng]]lanternfly[[/]]"),
        (3, '[[materialsCitation id=m1 specimenCode="NHMUK 1" '
            'collectionCode=NHMUK typeStatus=holotype]]'),
    ]


def triples_of(turns, cid="c42"):
    return refimpl.transform_turns(cid, turns)


class TestMarkup:
    def test_parse_span_with_attrs(self):
        ms = parse_turn(TAXON, 1)
        assert len(ms) == 1
        m = ms[0]
        assert m.kind == "taxonomicName"
        assert m.attrs["authorityName"] == "Zheng & Chen"
        assert m.attrs["species"] == "baiseensis"
        assert m.surface == "Saigona baiseensis"

    def test_void_span(self):
        ms = parse_turn('x [[figureCitation httpUri="http://a/b"]] y')
        assert len(ms) == 1 and ms[0].surface == ""

    def test_round_trip(self):
        from gg2rdf_spark.functions.markup import render_span
        s = render_span("taxonomicName", {"rank": "species", "a": "x y"}, "Z")
        m = parse_turn(s)[0]
        assert m.attrs == {"rank": "species", "a": "x y"} and m.surface == "Z"


class TestHappyPath:
    def setup_method(self):
        self.res = triples_of(happy_turns())
        self.t = set((s, p, o) for s, p, o in self.res.triples())

    def test_status_ok(self):
        assert self.res.status == refimpl.STATUS_SUCCESSFUL

    def test_defines_taxon_concept(self):
        # sp. nov. → trt:definesTaxonConcept (gg2rdf.ts:272-273);
        # concept uri = name path + _Authority_Year (:485-493)
        assert (
            "<http://treatment.plazi.org/id/TT0000042>",
            "trt:definesTaxonConcept",
            "<http://taxon-concept.plazi.org/id/Animalia/Saigona_baiseensis_Zheng_2021>",
        ) in self.t

    def test_parent_name_chain(self):
        # genus → family link via trt:hasParentName (gg2rdf.ts:951-954)
        assert (
            "<http://taxon-name.plazi.org/id/Animalia/Saigona>",
            "trt:hasParentName",
            "<http://taxon-name.plazi.org/id/Animalia/Dictyopharidae>",
        ) in self.t

    def test_kingdom_is_chain_root(self):
        # recursion stops at kingdom (gg2rdf.ts:951)
        assert (
            "<http://taxon-name.plazi.org/id/Animalia/Arthropoda>",
            "trt:hasParentName",
            "<http://taxon-name.plazi.org/id/Animalia>",
        ) in self.t

    def test_figure_rewrite_and_citation(self):
        fig = "<http://dx.doi.org/10.5281/zenodo.777>"
        assert (
            "<http://treatment.plazi.org/id/TT0000042>", "cito:cites", fig
        ) in self.t
        assert (fig, "a", "fabio:Figure") in self.t
        # record-URL httpUri passes through unrewritten (gg2rdf.ts:447-449;
        # the /files/figure.png rewrite applies only to 10.5281 httpUris)
        assert (
            fig, "fabio:hasRepresentation",
            "<https://zenodo.org/record/777/files/f.png>",
        ) in self.t

    def test_vernacular_language_tag(self):
        assert (
            "<http://taxon-name.plazi.org/id/Animalia/Saigona_baiseensis>",
            "dwc:vernacularName", '"lanternfly"@en',
        ) in self.t

    def test_material_uri_and_props(self):
        mat = "<http://tb.plazi.org/GgServer/dwcaRecords/TT0000042.mc.m1>"
        assert (mat, "dwc:catalogNumber", '"NHMUK 1"') in self.t
        assert (mat, "a", "dwc:MaterialCitation") in self.t
        assert (
            "<http://treatment.plazi.org/id/TT0000042>",
            "dwc:basisOfRecord", mat,
        ) in self.t

    def test_publication_props(self):
        pub = "<http://doi.org/10.11646/zootaxa.5004.1.1>"
        assert (pub, "bibo:journal", '"Zootaxa"') in self.t
        assert (pub, "bibo:volume", '"5004"') in self.t
        assert (pub, "a", "fabio:JournalArticle") in self.t
        assert (
            pub, "fabio:hasPart", "<http://dx.doi.org/10.5281/zenodo.777>"
        ) in self.t

    def test_authority_literal(self):
        assert (
            "<http://taxon-concept.plazi.org/id/Animalia/Saigona_baiseensis_Zheng_2021>",
            "dwc:scientificNameAuthorship", '"Zheng & Chen, 2021"',
        ) in self.t

    def test_turtle_has_header_and_sorted_preds(self):
        ttl = self.res.turtle()
        assert ttl.startswith("@prefix rdf:")
        # 'a' is last within its subject block (gg2rdf.ts:18-19)
        block = ttl.split("<http://treatment.plazi.org/id/TT0000042>")[1]
        block = block.split(" .\n")[0]
        preds = [ln.strip().split(" ")[0] for ln in block.splitlines() if ln.strip()]
        assert preds[-1] == "a"


class TestEdgeCases:
    def test_missing_document_failed(self):
        res = triples_of([(0, "hello"), (1, "world")])
        assert res.status == refimpl.STATUS_FAILED
        assert ("", "#",
                "# Error: Could not create RDF due to missing <document>"
                ) in res.triples()

    def test_missing_taxon_error(self):
        res = triples_of([(0, DOC0), (1, "no mentions here")])
        assert res.status == refimpl.STATUS_HAS_ERRORS
        assert ("", "#", "# Error: the treatment is lacking the taxon") in res.triples()

    def test_missing_kingdom_warning(self):
        taxon = ("[[taxonomicName section=nomenclature rank=species "
                 'genus=Saigona species=alba authorityName=Smith '
                 "authorityYear=2000]]S. alba[[/]]")
        res = triples_of([(0, DOC0), (1, taxon)])
        assert res.status == refimpl.STATUS_HAS_WARNINGS
        trips = set(res.triples())
        assert ("", "#",
                "# Warning: treatment taxon is missing ancestor kingdom") in trips
        # INVALID name base (gg2rdf.ts:1249-1253)
        assert any(
            s.startswith("<http://taxon-name.plazi.org/id/INVALID/")
            for s, _, _ in trips
        )

    def test_nomen_dubium_deprecates(self):
        taxon = TAXON.replace('status="sp. nov."', 'status="nomen dubium"')
        res = triples_of([(0, DOC0), (1, taxon)])
        trips = set(res.triples())
        assert any(p == "trt:deprecates" for _, p, _ in trips)
        assert not any(p == "trt:definesTaxonConcept" for _, p, _ in trips)

    def test_absent_status_augments(self):
        taxon = TAXON.replace(' status="sp. nov."', "")
        res = triples_of([(0, DOC0), (1, taxon)])
        assert any(p == "trt:augmentsTaxonConcept" for _, p, _ in res.triples())

    def test_label_fallback_defines(self):
        taxon = TAXON.replace(' status="sp. nov."', "")
        turns = [(0, DOC0),
                 (1, f"N. {taxon} [[taxonomicNameLabel rank=species]]"
                     "comb. nov.[[/]]")]
        res = triples_of(turns)
        assert any(p == "trt:definesTaxonConcept" for _, p, _ in res.triples())

    def test_bad_epithet_warning(self):
        taxon = TAXON.replace("species=baiseensis", 'species="6 baise?"')
        res = triples_of([(0, DOC0), (1, taxon)])
        assert res.status == refimpl.STATUS_HAS_WARNINGS
        trips = res.triples()
        assert any(
            p == "# Warning: Could not add treatment taxon because"
            for _, p, _ in trips
        )
        assert not any(p == "trt:definesTaxonConcept" for _, p, _ in trips)

    def test_missing_rank_warning(self):
        taxon = TAXON.replace("rank=species ", "")
        res = triples_of([(0, DOC0), (1, taxon)])
        assert any(
            o == "the rank attribute is missing"
            for _, p, o in res.triples()
            if p == "# Warning: Could not add treatment taxon because"
        )

    def test_material_without_identifier_warning(self):
        res = triples_of([
            (0, DOC0), (1, f"N. {TAXON}"),
            (2, "[[materialsCitation collectionCode=X]]"),
        ])
        assert (
            "", "#",
            "# Warning: Failed to output a material citation, "
            "could not create identifier",
        ) in res.triples()
        assert res.status == refimpl.STATUS_HAS_WARNINGS

    def test_duplicate_citation_single_emission(self):
        # genus-rank citation vs species-rank treatment → different rank
        # groups → REL.CITES (gg2rdf.ts:1175)
        cit = ("[[treatmentCitation section=reference_group rank=genus "
               "kingdom=Animalia genus=Lycaena "
               "authorityName=Jones authorityYear=1900]]")
        res = triples_of([(0, DOC0), (1, f"N. {TAXON}"), (4, f"R. {cit} {cit}")])
        cites = [
            (s, p, o) for s, p, o in res.triples() if p == "cito:cites"
        ]
        assert len(cites) == 1  # alreadyCited dedup (gg2rdf.ts:1117-1121)

    def test_deprecates_not_cited(self):
        # same genus+rank group, different species/authority → DEPRECATES
        cit = ("[[treatmentCitation section=reference_group rank=species "
               "kingdom=Animalia genus=Saigona species=vetus "
               "authorityName=Old authorityYear=1850]]")
        res = triples_of([(0, DOC0), (1, f"N. {TAXON}"), (4, f"R. {cit}")])
        trips = res.triples()
        assert any(
            p == "trt:deprecates"
            and o == "<http://taxon-concept.plazi.org/id/Animalia/Saigona_vetus_Old_1850>"
            for _, p, o in trips
        )

    def test_invalid_authority_cites_taxon_name(self):
        cit = ("[[treatmentCitation section=reference_group rank=species "
               "kingdom=Animalia genus=Lycaena species=alba]]")
        res = triples_of([(0, DOC0), (1, f"N. {TAXON}"), (4, f"R. {cit}")])
        assert any(
            p == "trt:citesTaxonName"
            and o == "<http://taxon-name.plazi.org/id/Animalia/Lycaena_alba>"
            for _, p, o in res.triples()
        )

    def test_missing_kingdom_citation_rank_warning(self):
        cit = ("[[treatmentCitation section=reference_group rank=species "
               "genus=Lycaena species=alba authorityName=Jones "
               "authorityYear=1900]]")
        res = triples_of([(0, DOC0), (1, f"N. {TAXON}"), (4, f"R. {cit}")])
        assert any(
            p == "# Warning:" and "due to issues with rank" in o
            for _, p, o in res.triples()
        )

    def test_unknown_language_info_comment(self):
        turns = [(0, DOC0), (1, f"N. {TAXON}"),
                 (2, "[[vernacularName language=qqx]]thing[[/]]")]
        res = triples_of(turns)
        trips = res.triples()
        assert any(
            p == "dwc:vernacularName" and o == '"thing"' for _, p, o in trips
        )
        assert any(
            p == "# Info:" and "language tag" in o for _, p, o in trips
        )

    def test_genus_dots_failed_doc(self):
        # rank=genus with dot-only genus: epithet valid ('.' allowed) but
        # taxonNameForURI strips to '' → throw → failed (gg2rdf.ts:1348,
        # caught at :104-110)
        taxon = ("[[taxonomicName section=nomenclature rank=genus "
                 "kingdom=Animalia genus=... authorityName=Smith "
                 "authorityYear=1900]]x[[/]]")
        res = triples_of([(0, DOC0), (1, taxon)])
        assert res.status == refimpl.STATUS_FAILED
        assert any(
            "There was some Error in gg2rdf" in o for _, _, o in res.triples()
        )


class TestRecipeCorpus:
    """The Python fixture recipe parses and transforms cleanly."""

    def test_many_conversations(self):
        from collections import Counter
        statuses = Counter()
        for doc_id in range(300):
            turns = [
                (t["turn_idx"], t["text"])
                for t in recipe.conversation_turns(doc_id)
            ]
            res = refimpl.transform_turns(recipe.conv_id_str(doc_id), turns)
            statuses[res.status] += 1
            ttl = res.turtle()
            assert ttl.startswith("@prefix")
        # the scenario mix must exercise every status level
        assert set(statuses) >= {0, 1, 2, 3}


class TestSectionRankAttr:
    """`section` is both structural context AND a botanical rank
    (gg2rdf.ts:871): the parser pops it only for known subSubSection
    types, so sectional epithets stay representable (round-2 ADVICE)."""

    def test_structural_section_popped(self):
        m = parse_turn(
            "[[taxonomicName section=nomenclature rank=species "
            "kingdom=Plantae genus=Quercus species=robur]]Q. robur[[/]]"
        )[0]
        assert m.section == "nomenclature"
        assert "section" not in m.attrs

    def test_rank_section_epithet_kept(self):
        from gg2rdf_spark.functions import kernels as K

        m = parse_turn(
            "[[taxonomicName _section=nomenclature rank=section "
            "kingdom=Plantae genus=Quercus section=Mesobalanus]]"
            "sect. Mesobalanus[[/]]"
        )[0]
        assert m.section == "nomenclature"
        assert m.attrs.get("section") == "Mesobalanus"
        # the rank machinery can now mint the sectional name URI
        uri = K.taxon_name_uri(m.attrs)
        assert uri == (
            "<http://taxon-name.plazi.org/id/Plantae/Quercus_Mesobalanus>"
        )

    def test_unknown_lowercase_type_is_structural(self):
        """Round-2 ADVICE: GoldenGate's subSubSection@type vocabulary
        is open-ended ('conservation', 'taxon_discussion', ...) — a
        bare lowercase token not in the known list must classify as
        structural context, NOT leak into the rank-attr bag that feeds
        taxon-name URIs."""
        m = parse_turn(
            "[[taxonomicName section=taxon_discussion rank=species "
            "kingdom=Plantae genus=Quercus species=robur]]Q. robur[[/]]"
        )[0]
        assert m.section == "taxon_discussion"
        assert "section" not in m.attrs

    def test_capitalized_section_stays_rank_attr(self):
        m = parse_turn(
            "[[taxonomicName rank=section kingdom=Plantae genus=Quercus "
            "section=Mesobalanus]]sect. Mesobalanus[[/]]"
        )[0]
        assert m.section is None
        assert m.attrs.get("section") == "Mesobalanus"
