"""CATALOG.md freshness contract (VERDICT r11 item 6): the committed
index must match a fresh render from REGISTRY metadata — a new
@register() without `python tools/gen_catalog.py` fails here, and so
does a query missing a family mapping in tools/scale_report.FAMILIES."""

from __future__ import annotations

import os

from tools.gen_catalog import OUT, render


class TestCatalogIndex:
    def test_catalog_md_is_fresh(self):
        assert os.path.exists(OUT), "CATALOG.md missing — run tools/gen_catalog.py"
        assert open(OUT).read() == render(), (
            "CATALOG.md is stale — regenerate with `python tools/gen_catalog.py`"
        )

    def test_every_query_indexed_with_location(self):
        from batch_processing_system_spark.queries import REGISTRY, _ensure_loaded

        _ensure_loaded()
        text = open(OUT).read()
        for name in REGISTRY:
            assert f"| {name} |" in text, f"{name} missing from CATALOG.md"
        # location column points at real files. Paths in CATALOG.md are
        # repo-relative; anchor them at the repo root (ADVICE r12: a
        # bare os.path.exists fails spuriously when pytest is invoked
        # from outside the repo).
        from tools.gen_catalog import _REPO

        for line in text.splitlines():
            if line.startswith("| ") and " | " in line and ":" in line:
                cells = [c.strip() for c in line.split("|")]
                if len(cells) >= 6 and ":" in cells[4]:
                    path = cells[4].rsplit(":", 1)[0]
                    assert os.path.exists(os.path.join(_REPO, path)), (
                        f"dangling location {cells[4]}"
                    )
