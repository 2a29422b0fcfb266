"""Query-side financial-idiom expansion (models/synonyms.py)."""

import numpy as np

from ragfin_tpu.models.synonyms import LEXICON, expand_queries, expand_query


class TestExpandQuery:
    def test_idioms_append_canonical_terms(self):
        out = expand_query("How did the bottom line move this year?")
        assert "net profit" in out
        assert out.startswith("How did the bottom line")  # original kept

    def test_word_boundaries(self):
        # "expand" must not fire inside "expanded retail expansion plan" twice,
        # and "pat" must not fire inside "pattern".
        assert "net profit" not in expand_query("a pattern of growth")
        assert expand_query("no idioms here whatsoever") == "no idioms here whatsoever"

    def test_longest_phrase_wins_once(self):
        out = expand_query("profit after tax rose")
        # "profit after tax" -> net profit; "rose" -> growth; each appended once
        assert out.count("net profit") == 1
        assert "growth" in out

    def test_case_insensitive(self):
        assert "advances" in expand_query("LOAN BOOK size?")

    def test_batch(self):
        outs = expand_queries(["top line?", "plain question"])
        assert "revenue" in outs[0] and outs[1] == "plain question"

    def test_separator_blocks_spurious_filter_phrases(self):
        """Expansions are joined with ' ; ' so regex consumers of the
        expanded text (queryfilter period parsing) cannot form phrases
        across the original/addition boundary — '...the first' +
        'quarter...' must not become a Q1 filter — while the featurizer
        (which skips punctuation) sees identical tokens."""
        from ragfin_tpu.models.embedder import HashedEmbedder
        from ragfin_tpu.retrieval.queryfilter import extract_filters

        out = expand_query("What was the bottom line in the first quarter?")
        assert " ; " in out
        emb = HashedEmbedder().fit(["net profit interest income"])
        joined = out.replace(" ; ", " ")
        assert np.array_equal(emb.encode_texts([out]), emb.encode_texts([joined]))

        # A query ending in an ordinal must not pick up a quarter filter
        # from an expansion that starts with 'quarter...'.
        f = extract_filters(expand_query("net profit for the first half of the year"), ["FY2024"])
        assert f.periods == []

    def test_lexicon_is_broad_not_test_fit(self):
        """The lexicon must stay a general banking vocabulary — dozens of
        entries, most unused by any eval paraphrase (guards against
        shrinking it to the test set)."""
        assert len(LEXICON) >= 50


class TestRetrievalEffect:
    def test_paraphrase_gold_rank_improves(self):
        """An idiomatic paraphrase must rank the gold chunk at least as well
        WITH expansion as without."""
        from ragfin_tpu.data.loader import build_corpus
        from ragfin_tpu.index.vector_index import DeviceVectorIndex

        idx = DeviceVectorIndex.build(build_corpus("/root/reference/extract_data"))
        q = "How much money did ICICI make after taxes in the first quarter of FY2024?"
        with_exp = idx.search_texts([q], top_k=5)[0]
        without = idx.search_texts([q], top_k=5, query_expansion=False)[0]

        def gold_rank(hits):
            for h in hits:
                if h.record.id == "icici_q1_fy2024_profitability_analysis":
                    return h.rank
            return 99

        # Raw index (no period scoping): expansion must pull the gold
        # profitability chunk into the top ranks (it was rank 99 / absent
        # under the unexpanded idiom query).
        assert gold_rank(with_exp) <= 2 < gold_rank(without)

        # Production path (FilteredSearch adds the Q1 period scope): gold
        # must be the top hit.
        from ragfin_tpu.retrieval.queryfilter import FilteredSearch

        hits = FilteredSearch(idx).search_texts([q], top_k=3)[0]
        assert hits[0].record.id == "icici_q1_fy2024_profitability_analysis"
