"""Unit tests for the scalar kernel library (SURVEY.md §2 F1-F15).

Golden pairs are hand-derived by executing the cited reference code
paths (`/root/reference/src/gg2rdf.ts`) on paper — the reference has
no test suite of its own (SURVEY.md §5), so these pin the JS-parity
semantics the pipeline depends on.
"""

import pytest

from gg2rdf_spark.functions import kernels as K


class TestNormalizeSpace:  # F1, gg2rdf.ts:1495-1498
    def test_basic(self):
        assert K.normalize_space("  a \t\n b  ") == "a b"

    def test_falsy(self):
        assert K.normalize_space(None) == ""
        assert K.normalize_space("") == ""

    def test_js_ws_set(self):
        # NBSP and FEFF are JS \s; NEL (\x85) is NOT
        assert K.normalize_space("a b") == "a b"
        assert K.normalize_space("a﻿b") == "a b"
        assert K.normalize_space("a\x85b") == "a\x85b"


class TestSTR:  # F2, gg2rdf.ts:1464-1467
    def test_empty(self):
        assert K.STR(None) == '""'
        assert K.STR("") == '""'

    def test_escaping(self):
        assert K.STR('he said "hi"') == '"he said \\"hi\\""'
        assert K.STR("a\nb\\c") == '"a\\nb\\\\c"'
        assert K.STR("tab\there") == '"tab\\there"'

    def test_unicode_passthrough(self):
        assert K.STR("Müller’s") == '"Müller’s"'

    def test_control_chars(self):
        assert K.STR("a\x01b") == '"a\\u0001b"'


class TestURI:  # F3, gg2rdf.ts:1475-1478
    def test_blank_node(self):
        assert K.URI(None) == "[]"
        assert K.URI("") == "[]"

    def test_space_removal_default(self):
        assert K.URI("http://x.org/a b") == "<http://x.org/ab>"

    def test_space_underscore(self):
        assert K.URI("http://x.org/a  b", "_") == "<http://x.org/a_b>"

    def test_encode_uri_reserved_kept(self):
        # encodeURI keeps ;/?:@&=+$,-_.!~*'()#
        assert (
            K.URI("http://a.b/p?q=1&r=2#f")
            == "<http://a.b/p?q=1&r=2#f>"
        )

    def test_encode_uri_utf8(self):
        # encodeURI('é') === '%C3%A9' (uppercase hex)
        assert K.URI("http://x/é") == "<http://x/%C3%A9>"

    def test_encode_uri_bracket(self):
        assert K.URI("http://x/[1]") == "<http://x/%5B1%5D>"


class TestPartialURI:  # F4, gg2rdf.ts:1470-1473
    def test_reserved_to_space(self):
        assert K.partial_uri("a;b/c?d") == "a b c d"

    def test_runs_collapse(self):
        assert K.partial_uri("a;;//b") == "a b"

    def test_falsy(self):
        assert K.partial_uri(None) == ""


class TestSubstring:  # F6, gg2rdf.ts:1482-1493
    def test_before_first(self):
        assert K.substring_before("a-b-c", "-") == "a"

    def test_after_last(self):
        # substringAfter uses lastIndexOf (gg2rdf.ts:1491)
        assert K.substring_after("a-b-c", "-") == "c"

    def test_absent(self):
        assert K.substring_before("abc", "-") == "abc"
        assert K.substring_after("abc", "-") == "abc"

    def test_multichar(self):
        assert K.substring_before("Smith & Jones", " &") == "Smith"


class TestRemovePunctuation:  # F5, gg2rdf.ts:1454-1462
    def test_keeps_hyphen(self):
        out, changed = K.remove_punctuation("a-b")
        assert out == "a-b" and not changed

    def test_strips_zsp(self):
        out, changed = K.remove_punctuation("a.b c$d")
        assert out == "abcd" and changed

    def test_unicode(self):
        out, _ = K.remove_punctuation("a’b–c")  # Pf and Pd(en-dash)
        assert out == "ab–c" or out == "abc"  # en-dash is Pd → removed
        assert K.remove_punctuation("a’b")[0] == "ab"


class TestNormalizeAuthority:  # F7, gg2rdf.ts:745-770
    def test_year_tail(self):
        assert K.normalize_authority("Smith, 2021b and more") == "Smith, 2021"

    def test_paren_year(self):
        assert K.normalize_authority("(Smith, 1901)") == "(Smith, 1901)"

    def test_and_to_amp(self):
        assert K.normalize_authority("Smith and Jones") == "Smith & Jones"

    def test_et_to_amp(self):
        assert K.normalize_authority("Smith et Jones") == "Smith & Jones"
        # 'et al' keeps (the [^a] guard, gg2rdf.ts:756)
        assert "al" in K.normalize_authority("Smith et al")

    def test_initials_stripped(self):
        assert K.normalize_authority("A. B. Smith") == "Smith"

    def test_multi_amp_commas(self):
        assert (
            K.normalize_authority("Smith & Jones & Brown")
            == "Smith, Jones & Brown"
        )

    def test_unbalanced_paren(self):
        assert K.normalize_authority("(Smith, 1901") == "(Smith, 1901)"

    def test_quotes_removed(self):
        assert K.normalize_authority('"Smith"') == "Smith"

    def test_empty(self):
        assert K.normalize_authority("") == ""
        assert K.normalize_authority(None) == ""


class TestAuthorityNameForURI:  # F9, gg2rdf.ts:1235-1246
    def test_plain(self):
        assert K.authority_name_for_uri("Smith") == "Smith"

    def test_amp(self):
        assert K.authority_name_for_uri("Smith & Jones, 2000") == "Smith"

    def test_takes_last_word(self):
        assert K.authority_name_for_uri("van der Berg") == "Berg"

    def test_base_authority_paren(self):
        # substringBefore(')') keeps the open paren → '(Miller'
        assert K.authority_name_for_uri("(Miller) Smith") == "(Miller"


class TestTaxonNameForURI:  # F10, gg2rdf.ts:1258-1351
    SP = {
        "rank": "species", "kingdom": "Animalia", "genus": "Saigona",
        "species": "baiseensis",
    }

    def test_species_path(self):
        assert K.taxon_name_for_uri(self.SP) == "/Saigona_baiseensis"

    def test_hybrid_x(self):
        attrs = dict(self.SP, isHybrid="true")
        assert K.taxon_name_for_uri(attrs) == "/Saigona_x_baiseensis"

    def test_genus_rank(self):
        attrs = {"rank": "genus", "kingdom": "Animalia", "genus": "Saigona"}
        assert K.taxon_name_for_uri(attrs) == "/Saigona"

    def test_kingdom_rank_empty(self):
        attrs = {"rank": "kingdom", "kingdom": "Animalia"}
        assert K.taxon_name_for_uri(attrs) == ""

    def test_var_token_filtered(self):
        attrs = dict(self.SP, rank="variety", variety="var.")
        # 'var.' junk token filtered (gg2rdf.ts:1336)
        assert K.taxon_name_for_uri(attrs) == "/Saigona_baiseensis"

    def test_dot_removed_sig(self):
        attrs = {"rank": "family", "kingdom": "Animalia", "family": "Cara.bidae"}
        assert K.taxon_name_for_uri(attrs) == "/Carabidae"

    def test_throws_empty_sig(self):
        attrs = {"rank": "family", "kingdom": "Animalia", "family": "..."}
        with pytest.raises(K.TaxonNameURIError):
            K.taxon_name_for_uri(attrs)

    def test_rank_limit_genus(self):
        assert K.taxon_name_for_uri(self.SP, "species") == "/Saigona"

    def test_full_uri(self):
        assert (
            K.taxon_name_uri(self.SP)
            == "<http://taxon-name.plazi.org/id/Animalia/Saigona_baiseensis>"
        )

    def test_missing_kingdom_invalid_base(self):
        attrs = {"rank": "species", "genus": "Saigona", "species": "x"}
        assert K.taxon_name_uri(attrs).startswith(
            "<http://taxon-name.plazi.org/id/INVALID/"
        )


class TestEpithet:  # F14, gg2rdf.ts:157-230
    def test_missing_rank(self):
        assert K.check_epithet_errors({"genus": "X"}) == [
            "the rank attribute is missing"
        ]

    def test_valid_species(self):
        attrs = {"rank": "species", "species": "albus", "genus": "Canis"}
        assert K.check_epithet_errors(attrs) == []

    def test_invalid_chars(self):
        attrs = {"rank": "species", "species": "6 albus?", "genus": "Canis"}
        errs = K.check_epithet_errors(attrs)
        assert any("sigEpithet" in e for e in errs)

    def test_sp_number_exception(self):
        # 'sp. 5' passes the (sp\.?)\s*-?[0-9]*$ exception
        attrs = {"rank": "species", "species": "sp. 5", "genus": "Canis"}
        assert K.check_epithet_errors(attrs) == []

    def test_genus_checked_for_species(self):
        attrs = {"rank": "species", "species": "albus", "genus": "Ca nis!"}
        errs = K.check_epithet_errors(attrs)
        assert any("genus" in e for e in errs)


class TestFullAuthority:  # F8, gg2rdf.ts:609-742
    DOC = {"docAuthor": "Zheng, Wei & Chen, Li", "docDate": "2021"}

    def test_plain_with_year(self):
        attrs = {"authorityName": "Smith", "authorityYear": "1990"}
        a, w, f = K.get_full_authority(attrs, self.DOC)
        assert a == "Smith, 1990" and not f

    def test_linnaeus_expansion(self):
        attrs = {"authorityName": "L.", "authorityYear": "1758"}
        a, _, _ = K.get_full_authority(attrs, self.DOC)
        assert a == "Linnaeus, 1758"

    def test_allcaps_titlecased(self):
        attrs = {"authorityName": "SMITH", "authorityYear": "1990"}
        a, _, _ = K.get_full_authority(attrs, self.DOC)
        assert a == "Smith, 1990"

    def test_year_inference_from_doc(self):
        attrs = {"authorityName": "Smith"}
        a, w, _ = K.get_full_authority(attrs, self.DOC, True)
        assert a == "Smith, 2021"
        assert "Using document metadata for authority year" in w

    def test_no_year_inference_when_not_defining(self):
        attrs = {"authorityName": "Smith"}
        a, w, _ = K.get_full_authority(attrs, self.DOC, False)
        assert a == "Smith"

    def test_doc_fallback(self):
        a, w, fallback = K.get_full_authority({}, self.DOC, True)
        assert fallback
        assert a == "Zheng & Chen, 2021"

    def test_no_fallback_when_not_defining(self):
        a, _, fallback = K.get_full_authority({}, self.DOC, False)
        assert a == "INVALID" and not fallback

    def test_paren_removal_warning(self):
        attrs = {"authorityName": "(Miller) Smith", "authorityYear": "1900"}
        a, w, _ = K.get_full_authority(attrs, self.DOC)
        assert any(w_.startswith('Removing "(Miller)"') for w_ in w)
        assert a == "Smith, 1900"

    def test_animalia_base_authority_only(self):
        attrs = {
            "kingdom": "Animalia",
            "baseAuthorityName": "Miller", "baseAuthorityYear": "1880",
            "authorityName": "Smith", "authorityYear": "1990",
        }
        a, _, _ = K.get_full_authority(attrs, self.DOC)
        assert a == "(Miller, 1880)"

    def test_plantae_gets_both(self):
        attrs = {
            "kingdom": "Plantae",
            "baseAuthorityName": "Miller", "baseAuthorityYear": "1880",
            "authorityName": "Smith", "authorityYear": "1990",
        }
        a, _, _ = K.get_full_authority(attrs, self.DOC)
        assert a == "(Miller, 1880) Smith, 1990"


class TestRelation:  # D5, gg2rdf.ts:1147-1210
    T = {
        "rank": "species", "kingdom": "Animalia", "genus": "Saigona",
        "species": "baiseensis", "authorityName": "Smith",
        "authorityYear": "1990",
    }

    def test_not_in_ref_group(self):
        assert K.get_taxon_relation(self.T, self.T, False) == K.REL_CITES

    def test_no_treatment(self):
        assert K.get_taxon_relation(self.T, None, True) == K.REL_CITES

    def test_same(self):
        assert K.get_taxon_relation(dict(self.T), self.T, True) == K.REL_SAME

    def test_deprecates_other_species(self):
        c = dict(self.T, species="montanus", authorityName="Jones")
        assert K.get_taxon_relation(c, self.T, True) == K.REL_DEPRECATES

    def test_cites_across_rank_groups(self):
        c = {"rank": "genus", "kingdom": "Animalia", "genus": "Other",
             "authorityName": "Jones"}
        assert K.get_taxon_relation(c, self.T, True) == K.REL_CITES

    def test_parent_genus_not_deprecated(self):
        c = {"rank": "genus", "kingdom": "Animalia", "genus": "Saigona",
             "species": "", "authorityName": "Jones"}
        # same genus, cited at genus rank while treatment is species
        assert K.get_taxon_relation(c, self.T, True) == K.REL_CITES

    def test_invalid_rank_none(self):
        c = {"rank": "species", "authorityName": "Jones"}
        assert K.get_taxon_relation(c, self.T, True) == K.REL_NONE


class TestFigureUri:  # C4, gg2rdf.ts:393-417
    def test_direct_zenodo_doi(self):
        attrs = {"httpUri": "http://dx.doi.org/10.5281/zenodo.123"}
        assert K.figure_uri(attrs) == "<http://dx.doi.org/10.5281/zenodo.123>"

    def test_record_url_rewritten(self):
        attrs = {"httpUri": "https://zenodo.org/record/123/files/f.png"}
        assert K.figure_uri(attrs) == "<http://dx.doi.org/10.5281/zenodo.123>"

    def test_figure_doi_with_domain(self):
        attrs = {"figureDoi": "https://doi.org/10.11646/x.1"}
        assert K.figure_uri(attrs) == "<https://doi.org/10.11646/x.1>"

    def test_figure_doi_bare(self):
        attrs = {"figureDoi": "10.11646/x.1"}
        assert K.figure_uri(attrs) == "<http://dx.doi.org/10.11646/x.1>"

    def test_representation_zenodo(self):
        rep = K.figure_representation("http://dx.doi.org/10.5281/zenodo.99")
        assert rep == "<https://zenodo.org/record/99/files/figure.png>"


class TestPublicationUri:  # F12, gg2rdf.ts:1422-1452
    def test_bare_doi(self):
        d = {"ID-DOI": "10.11646/z.1.2"}
        assert K.publication_uri(d) == "<http://doi.org/10.11646/z.1.2>"

    def test_doi_org_url(self):
        d = {"ID-DOI": "https://doi.org/10.1/x"}
        assert K.publication_uri(d) == "<http://doi.org/10.1/x>"

    def test_dx_doi_rewrite(self):
        d = {"ID-DOI": "http://dx.doi.org/10.1/x"}
        assert K.publication_uri(d) == "<http://doi.org/10.1/x>"

    def test_no_doi_master_doc(self):
        d = {"masterDocId": "FF00AA"}
        assert (
            K.publication_uri(d)
            == "<http://publication.plazi.org/id/FF00AA>"
        )

    def test_http_non_doi_falls_to_docsource(self):
        d = {"ID-DOI": "http://example.org/1",
             "docSource": "https://dx.doi.org/10.5/y"}
        assert K.publication_uri(d) == "<http://doi.org/10.5/y>"


class TestDocAuthor:  # gg2rdf.ts:565-581
    def test_surname_extraction(self):
        assert (
            K.simplify_doc_author("Zheng, Wei & Chen, Li") == "Zheng & Chen"
        )

    def test_single(self):
        assert K.simplify_doc_author("Smith, John") == "Smith"

    def test_allcaps(self):
        assert K.simplify_doc_author("ZHENG, Wei & CHEN, Li") == "Zheng & Chen"


class TestRankGroup:  # gg2rdf.ts:1212-1232
    def test_species_wins(self):
        assert K.taxon_rank_group({"species": "x", "genus": "G"}) == K.RANKS_SPECIES

    def test_empty_invalid(self):
        assert K.taxon_rank_group({}) == K.RANKS_INVALID

    def test_falsy_attr_skipped(self):
        assert K.taxon_rank_group({"species": "", "genus": "G"}) == K.RANKS_GENUS


class TestAuthorityAttrBranch:  # gg2rdf.ts:694-716 (round-2 ADVICE)
    def test_no_paren_removal_in_authority_attr(self):
        """The `authority` ATTRIBUTE fallback branch performs only the
        in-clause / 'L.' / ALL-CAPS cleanup — no parenthetical removal
        (unlike the authorityName branches)."""
        auth, warnings, fb = K.get_full_authority(
            {"authority": "Smith (Jones)", "authorityYear": "1999"}, {}, True
        )
        assert auth == "Smith (Jones), 1999"
        assert not any(w.startswith('Removing "') for w in warnings)
        assert fb is False

    def test_authority_name_branch_does_strip(self):
        auth, warnings, _ = K.get_full_authority(
            {"authorityName": "Smith (Jones)", "authorityYear": "1999"},
            {}, True,
        )
        assert auth == "Smith, 1999"
        assert any(w.startswith('Removing "') for w in warnings)


class TestJunkTokenAscii:  # JS \W is ASCII-only (round-2 ADVICE)
    def test_non_ascii_wrapper_is_junk(self):
        # é matches JS \W — 'varé' is a junk token in the reference
        assert K.is_junk_token("varé")
        assert K.is_junk_token("var")
        assert K.is_junk_token(" subsp. ")
        assert not K.is_junk_token("variety")
