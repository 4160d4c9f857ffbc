"""Docs freshness: the generated API reference must match the live
package (docs/gen_api.py is the single source of truth)."""

import importlib.util
import os


def test_api_md_fresh(tmp_path):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "gen_api", os.path.join(root, "docs", "gen_api.py"))
    gen_api = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen_api)
    out = tmp_path / "API.md"
    gen_api.main(str(out))
    fresh = out.read_text()
    committed = open(os.path.join(root, "docs", "API.md")).read()
    assert fresh == committed, \
        "docs/API.md is stale: regenerate with `python docs/gen_api.py`"
