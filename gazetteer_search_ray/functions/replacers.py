"""Data-driven token replacer engine (reference M6/M7/M9).

The reference's main extensibility mechanism is replacer rule files —
``pattern => template`` lines compiled at startup with an ``@include``
tree (``query/ReplacersCompiler.java:18-146``,
``config/replacers/ReplacersFactory.groovy:11-77``); transliteration
(``query/IndexAnalyzer.java:60-78``) and housenumber variants
(``config/replacers/index/hnIndexReplasers`` applied at
``IndexAnalyzer.java:154-160``) are instances of the same idea: rules
are DATA, the engine compiles them once per worker.

Rule file grammar (one directive per line):

* ``# …`` / blank — comment
* ``@include rel/path`` — splice another rule file (relative to the
  including file; cycles are ignored)
* ``@charmap rel/path`` — load a two-column char map file (lines
  ``src => dst``); a token containing any mapped char yields its fully
  transliterated form as one variant (the junidecode analog)
* ``pattern => tmpl1 | tmpl2 …`` — if ``pattern`` (Python regex)
  fullmatches the token, each template (with ``\\1`` group refs) is a
  variant

``ReplacerSet.expand(token)`` returns the ordered, deduplicated variant
list (never including the token itself).  Analyzers append variants to
the token stream exactly where the reference appends replacer output
(``IndexAnalyzer.java:99-100``).
"""

from __future__ import annotations

import os
import re


class _RegexRule:
    __slots__ = ("pattern", "templates")

    def __init__(self, pattern: str, templates: list[str]):
        self.pattern = re.compile(pattern)
        self.templates = templates

    def expand(self, token: str) -> list[str]:
        m = self.pattern.fullmatch(token)
        if not m:
            return []
        return [m.expand(t) for t in self.templates]


class _CharMapRule:
    __slots__ = ("table",)

    def __init__(self, table: dict[str, str]):
        self.table = str.maketrans(table)

    def expand(self, token: str) -> list[str]:
        out = token.translate(self.table)
        return [out] if out != token else []


class ReplacerSet:
    """Compiled replacer rules; built once per worker / actor."""

    def __init__(self, rules: list):
        self.rules = rules

    def expand(self, token: str) -> list[str]:
        """Ordered unique variants of ``token`` (token itself excluded)."""
        out: list[str] = []
        seen = {token}
        for r in self.rules:
            for v in r.expand(token):
                if v and v not in seen:
                    seen.add(v)
                    out.append(v)
        return out

    # -- loading ---------------------------------------------------------

    @staticmethod
    def load(paths: list[str] | tuple[str, ...]) -> "ReplacerSet":
        rules: list = []
        seen: set[str] = set()
        for p in paths:
            _load_file(_resolve(p, None), rules, seen)
        return ReplacerSet(rules)


def _config_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(__file__)), "config")


def _resolve(path: str, base: str | None) -> str:
    """Absolute path; relative paths resolve against the including file,
    then the stock ``config/`` directory."""
    if os.path.isabs(path):
        return path
    if base is not None:
        cand = os.path.join(base, path)
        if os.path.exists(cand):
            return cand
    return os.path.join(_config_dir(), path)


def _load_file(path: str, rules: list, seen: set[str]) -> None:
    rp = os.path.realpath(path)
    if rp in seen:  # @include cycle / duplicate guard
        return
    seen.add(rp)
    base = os.path.dirname(rp)
    with open(rp, encoding="utf-8") as f:
        for lineno, raw in enumerate(f, 1):
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            if line.startswith("@include "):
                _load_file(_resolve(line[len("@include "):].strip(), base),
                           rules, seen)
                continue
            if line.startswith("@charmap "):
                mp = _resolve(line[len("@charmap "):].strip(), base)
                rules.append(_CharMapRule(_load_charmap(mp)))
                continue
            if "=>" not in line:
                raise ValueError(f"{path}:{lineno}: expected 'pattern => templates'")
            pattern, rhs = line.split("=>", 1)
            templates = [t.strip() for t in rhs.split("|")]
            rules.append(_RegexRule(pattern.strip(), [t for t in templates if t]))


def _load_charmap(path: str) -> dict[str, str]:
    table: dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        for lineno, raw in enumerate(f, 1):
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            if "=>" not in line:
                raise ValueError(f"{path}:{lineno}: expected 'src => dst'")
            src, dst = (x.strip() for x in line.split("=>", 1))
            if len(src) != 1:
                raise ValueError(f"{path}:{lineno}: charmap source must be 1 char")
            table[src] = dst
    return table
