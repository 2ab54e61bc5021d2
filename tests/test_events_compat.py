"""Coverage for the result-verification gate and config version compat
(reference: defrcn/evaluation/testing.py:26-56, defrcn/config/compat.py).
"""

import logging

from fewshotobjectdetection_imporove_via_text_feature_tpu.config import get_cfg
from fewshotobjectdetection_imporove_via_text_feature_tpu.config.compat import (
    upgrade_config,
)
from fewshotobjectdetection_imporove_via_text_feature_tpu.utils.events import (
    flatten_results_dict,
    print_csv_format,
    verify_results,
)


def test_verify_results_gate():
    cfg = get_cfg()
    results = {"bbox": {"AP50": 50.0, "nAP50": 40.0}}

    cfg.TEST.EXPECTED_RESULTS = []
    assert verify_results(cfg, results)  # no expectations -> pass

    cfg.TEST.EXPECTED_RESULTS = [["bbox", "AP50", 50.2, 0.5]]
    assert verify_results(cfg, results)  # within tolerance

    cfg.TEST.EXPECTED_RESULTS = [
        ["bbox", "AP50", 50.2, 0.5],
        ["bbox", "nAP50", 45.0, 1.0],  # off by 5 > 1
    ]
    assert not verify_results(cfg, results)


def test_copypaste_contract(caplog):
    # tools/extract_results.py scrapes the last two 'copypaste:' lines:
    # a key row then a value row with 4-decimal formatting
    with caplog.at_level(logging.INFO):
        print_csv_format({"bbox": {"AP": 12.3456789, "AP50": 50.0}})
    lines = [r.getMessage() for r in caplog.records]
    assert lines[-2] == "copypaste: AP,AP50"
    assert lines[-1] == "copypaste: 12.3457,50.0000"


def test_flatten_results_dict():
    flat = flatten_results_dict({"a": {"b": {"c": 1}}, "d": 2})
    assert flat == {"a/b/c": 1, "d": 2}


def test_upgrade_config_renames():
    d = {
        "VERSION": 1,
        "MODEL": {
            "RPN_HEAD": {"NAME": "StandardRPNHead"},
            "RPN": {"RPN_STRADDLE_THRESH": 0},
        },
    }
    out = upgrade_config(d)
    assert out["VERSION"] == 2
    assert out["MODEL"]["RPN"]["HEAD_NAME"] == "StandardRPNHead"
    assert out["MODEL"]["RPN"]["BOUNDARY_THRESH"] == 0
    assert "NAME" not in out["MODEL"].get("RPN_HEAD", {})


def test_upgrade_config_noop_at_latest():
    d = {"VERSION": 2, "MODEL": {"RPN": {"NMS_THRESH": 0.7}}}
    assert upgrade_config(dict(d)) == d


def test_merge_from_file_upgrades_v1_configs(tmp_path):
    """merge_from_file routes VERSION-1 YAMLs through the compat rename
    table before the strict merge (the fvcore loader analog) instead of
    raising on the old key."""
    from fewshotobjectdetection_imporove_via_text_feature_tpu.config import (
        get_cfg,
    )

    p = tmp_path / "v1.yaml"
    p.write_text(
        "VERSION: 1\n"
        "MODEL:\n"
        "  RPN_HEAD:\n"
        "    NAME: StandardRPNHead\n"
        "  RPN:\n"
        "    RPN_STRADDLE_THRESH: 0\n"
    )
    cfg = get_cfg()
    cfg.merge_from_file(str(p))
    assert cfg.MODEL.RPN.HEAD_NAME == "StandardRPNHead"
    assert cfg.MODEL.RPN.BOUNDARY_THRESH == 0
    assert cfg.VERSION == 2


def test_merge_from_file_prunes_removed_keys(tmp_path):
    """OUTPUT_DIR/config.yaml dumps from earlier builds carry schema keys
    that have since been removed (TPU.MESH_DATA_AXIS) at the CURRENT
    version; merge_from_file must prune them instead of raising on the
    strict merge — old runs stay re-evaluable."""
    from fewshotobjectdetection_imporove_via_text_feature_tpu.config import (
        get_cfg,
    )

    p = tmp_path / "old_dump.yaml"
    p.write_text(
        "VERSION: 2\n"
        "TPU:\n"
        "  MESH_DATA_AXIS: data\n"
        "  ROI_CHUNK: 128\n"
    )
    cfg = get_cfg()
    cfg.merge_from_file(str(p))
    assert cfg.TPU.ROI_CHUNK == 128  # siblings of the pruned key survive
    assert "MESH_DATA_AXIS" not in cfg.TPU
