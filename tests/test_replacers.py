"""Replacer rule engine (M6/M7/M9): rule-file loading with @include /
@charmap, template expansion, and analyzer integration — goldens driven
from the shipped rule files (reference ReplacersCompiler.java:18-146)."""

import os

import pytest

from gazetteer_search_ray.functions.analyzer import Analyzer, AnalyzerConfig
from gazetteer_search_ray.functions.replacers import ReplacerSet

CFG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "gazetteer_search_ray", "config",
)


@pytest.fixture(scope="module")
def rules() -> ReplacerSet:
    return ReplacerSet.load(["replacers/index.rules"])


def test_include_tree_loads(rules):
    assert len(rules.rules) >= 4  # charmap + hn rules + abbreviations


def test_housenumber_variants(rules):
    # "12a" -> split + bare number (hnIndexReplasers analog)
    assert rules.expand("12a") == ["12 a", "12"]
    assert rules.expand("12-3") == ["12 3", "123", "12"]
    assert rules.expand("plain") == []


def test_abbreviation_templates(rules):
    assert rules.expand("st") == ["street"]
    assert rules.expand("ave") == ["avenue"]
    assert rules.expand("av") == ["avenue"]


def test_transliteration_charmap(rules):
    assert rules.expand("улица")[0] == "ulica"
    assert rules.expand("щука")[0] == "shchuka"
    # soft/hard signs drop
    assert rules.expand("область")[0] == "oblast"
    # pure-latin token: charmap produces no variant
    assert all(" " not in v for v in rules.expand("street"))


def test_rule_file_error_reporting(tmp_path):
    bad = tmp_path / "bad.rules"
    bad.write_text("pattern without arrow\n")
    with pytest.raises(ValueError, match="bad.rules:1"):
        ReplacerSet.load([str(bad)])


def test_include_cycle_is_ignored(tmp_path):
    a = tmp_path / "a.rules"
    b = tmp_path / "b.rules"
    a.write_text(f"@include {b}\n^x$ => y\n")
    b.write_text(f"@include {a}\n^p$ => q\n")
    rs = ReplacerSet.load([str(a)])
    assert rs.expand("x") == ["y"]
    assert rs.expand("p") == ["q"]


def test_analyzer_appends_variants():
    an = Analyzer(AnalyzerConfig.gazetteer())
    toks = [t for t, _ in an.tokens("улица Ленина 12a")]
    # original + transliterated variant, hn split variants
    assert "улица" in toks
    assert "ulica" in toks
    assert "12a" in toks and "12" in toks
    # index/query symmetry: same config, same output
    assert an.tokens("улица Ленина 12a") == Analyzer(
        AnalyzerConfig.gazetteer()
    ).tokens("улица Ленина 12a")


def test_manifest_roundtrip_with_replacers():
    from gazetteer_search_ray.pipelines.build_index import _analyzer_dict

    cfg = AnalyzerConfig.gazetteer()
    back = AnalyzerConfig.from_dict(_analyzer_dict(cfg))
    assert back == cfg
    assert Analyzer(back).tokens("переулок 5к2") == Analyzer(cfg).tokens(
        "переулок 5к2"
    )
