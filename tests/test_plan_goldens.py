"""Query-plan goldens — the analog of the reference's hand-written
expected-DSL fixtures (`src/test/resources/es_queries/*.json`,
SURVEY.md §5.1): for each scenario family, assert the exact plan shape
`build_cascade` produces.  Pure Python, no Ray."""

from gazetteer_search_ray.functions.analyzer import Analyzer, AnalyzerConfig
from gazetteer_search_ray.pipelines.query import (
    Bool,
    ColumnFilter,
    FunctionScore,
    Prefix,
    Term,
)
from gazetteer_search_ray.pipelines.search import analyze_query, build_cascade

AN = Analyzer(AnalyzerConfig.code())


def _cascade(q, prefix=False, filters=None, use_prior=False):
    return build_cascade(analyze_query(q, AN, prefix), filters, use_prior)


def test_city_street_plan():
    # es_queries/city-street.json analog: two required terms →
    # strict AND, ≥2-of branch, relaxed OR — in that order (Q14)
    v = _cascade("springfield mainstreet")
    assert len(v) == 3
    strict, msm2, relaxed = v
    assert strict == Bool(
        must=(Term("springfield"), Term("mainstreet")), should=(), filter=()
    )
    assert msm2.minimum_should_match == 2
    assert set(c.term for c in msm2.should) == {"springfield", "mainstreet"}
    assert relaxed.minimum_should_match == 1


def test_city_street_hn_plan():
    # es_queries/city-street-hn.json analog: number token joins the
    # required core (Q7 classing)
    v = _cascade("mainstreet 42")
    strict = v[0]
    assert Term("42") in strict.must and Term("mainstreet") in strict.must


def test_prefix_plan():
    # es_queries/prefix.json analog: trailing token becomes a Prefix
    # should-branch on every variant (A3 + Q3)
    v = _cascade("springfield oa", prefix=True)
    for variant in v:
        assert any(isinstance(c, Prefix) and c.prefix == "oa"
                   for c in variant.should)
    # trailing space disables prefix extraction (Query.java:178-185)
    v2 = build_cascade(analyze_query("springfield oa ", AN, True), None, False)
    for variant in v2:
        assert not any(isinstance(c, Prefix) for c in variant.should)


def test_terms_filter_plan():
    # admin-boundaries-terms analog: structured filter on every variant
    v = _cascade("springfield", filters={"lang": "en"})
    for variant in v:
        assert ColumnFilter("lang", ("en",)) in variant.filter


def test_prior_wraps_every_variant():
    # Q6 function-score: the doc prior wraps each cascade variant
    v = _cascade("springfield mainstreet", use_prior=True)
    assert all(isinstance(x, FunctionScore) for x in v)


def test_single_term_plan():
    # single required term: no ≥2-of branch
    v = _cascade("springfield")
    assert len(v) == 2
    assert v[0].must == (Term("springfield"),)


def test_optional_terms_are_should_boosted():
    # short/lexicon tokens ride as boosted shoulds, not musts (M4/A4)
    v = _cascade("springfield the of")
    strict = v[0]
    assert strict.must == (Term("springfield"),)
    assert Term("the", boost=0.5) in strict.should
    assert Term("of", boost=0.5) in strict.should
