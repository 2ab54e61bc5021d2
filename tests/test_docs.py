"""Docs stay in sync with the config schema.

The reference ships no docs at all; ours must at least not rot:
every key in the live schema (config/defaults.py) must be mentioned in
docs/config_reference.md, so adding a config knob without documenting
it fails CI.
"""

from pathlib import Path

from fewshotobjectdetection_imporove_via_text_feature_tpu.config import get_cfg

DOCS = Path(__file__).resolve().parent.parent / "docs"


def _walk(node, prefix=""):
    for k in sorted(node.keys()):
        v = node[k]
        if hasattr(v, "keys") and not isinstance(v, (str, tuple, list)):
            yield from _walk(v, prefix + k + ".")
        else:
            yield prefix + k


def test_config_reference_covers_every_key():
    text = (DOCS / "config_reference.md").read_text()
    missing = [key for key in _walk(get_cfg()) if key.rsplit(".", 1)[-1] not in text]
    assert not missing, f"undocumented config keys: {missing}"


def test_docs_index_links_resolve():
    index = DOCS / "README.md"
    text = index.read_text()
    for name in ("migration_from_reference.md", "architecture.md",
                 "config_reference.md"):
        assert name in text
        assert (DOCS / name).exists()
