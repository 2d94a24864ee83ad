"""Meta-test: every ``tests/...py`` path cited in package source or
docstrings must exist. Prevents shipped claims from outrunning the
suite (round-7 regression: operators/webarchive.py cited a test file
that was never committed)."""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "cryptocoininsights_data_engineer_project_spark"

_CITE = re.compile(r"tests/test_[a-z0-9_]+\.py")


def test_every_cited_test_file_exists():
    missing: list[str] = []
    for src in sorted(PKG.rglob("*.py")):
        for cite in set(_CITE.findall(src.read_text())):
            if not (REPO / cite).exists():
                missing.append(f"{src.relative_to(REPO)} cites {cite}")
    assert not missing, "phantom test citations:\n" + "\n".join(missing)
