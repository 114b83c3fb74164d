"""Property-based checks (SURVEY.md §5c): normalizer idempotence and
URI-mint totality."""

from hypothesis import given, settings
from hypothesis import strategies as st

from gg2rdf_spark.functions import kernels as K

text = st.text(max_size=60)
simple = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
)


class TestIdempotence:
    @given(simple)
    @settings(max_examples=300)
    def test_normalize_space(self, s):
        once = K.normalize_space(s)
        assert K.normalize_space(once) == once

    @given(simple)
    @settings(max_examples=300)
    def test_partial_uri(self, s):
        once = K.partial_uri(s)
        assert K.partial_uri(once) == once

    @given(simple)
    @settings(max_examples=300)
    def test_remove_punctuation(self, s):
        once, _ = K.remove_punctuation(s)
        again, changed = K.remove_punctuation(once)
        assert again == once and not changed


class TestTotality:
    @given(simple)
    @settings(max_examples=300)
    def test_str_never_throws(self, s):
        out = K.STR(s)
        assert out.startswith('"') and out.endswith('"')

    @given(simple)
    @settings(max_examples=300)
    def test_uri_never_throws(self, s):
        out = K.URI(s)
        assert out == "[]" or (out.startswith("<") and out.endswith(">"))

    @given(simple, simple)
    @settings(max_examples=200)
    def test_normalize_authority_total(self, a, b):
        K.normalize_authority(a + b)  # must not raise

    @given(
        st.dictionaries(
            st.sampled_from(K.RANK_NAMES + ["rank", "isHybrid"]),
            st.text(alphabet="abcdefXYZ .-'", max_size=12),
            max_size=8,
        )
    )
    @settings(max_examples=300)
    def test_taxon_name_uri_totality(self, attrs):
        """Never throws except the documented empty-sigEpithet path
        (gg2rdf.ts:1348)."""
        try:
            out = K.taxon_name_uri(attrs)
            assert out.startswith("<")
        except K.TaxonNameURIError:
            # only reachable from the non-lower-rank branch
            rank = attrs.get("rank")
            assert rank not in K._LOWER_RANKS or rank is None

    @given(
        st.dictionaries(
            st.sampled_from(
                ["authorityName", "authorityYear", "baseAuthorityName",
                 "baseAuthorityYear", "authority", "kingdom"]
            ),
            st.text(alphabet="abcdefXYZ &().,1980", max_size=16),
            max_size=6,
        )
    )
    @settings(max_examples=300)
    def test_full_authority_total(self, attrs):
        a, w, f = K.get_full_authority(
            attrs, {"docAuthor": "Smith, A", "docDate": "2000"}, True
        )
        assert isinstance(a, str)
