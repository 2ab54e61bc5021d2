"""Config version compatibility: full V1<->V2 conversion.

Parity surface for defrcn/config/compat.py (the detectron2 converter
stack): per-version converter classes with in-place ``upgrade`` /
``downgrade``, the complete ConverterV1/ConverterV2 rename tables,
``guess_version`` for VERSION-less partial YAMLs, and the fvcore loading
flow (downgrade the FULL default config to the file's version, merge the
partial file there, then upgrade the merged whole back to latest —
``merge_from_file`` in config.py drives this).

Operates on plain nested dicts (our YAML loads and schema dumps), not
CfgNode objects. Renames whose source key is absent are skipped: the
reference only ever converts full configs (where every key exists); we
additionally allow direct upgrades of partial dicts for the removed-key
pruning path.

Deviation: rename targets under ``MODEL.RETINANET`` / ``MODEL.
PANOPTIC_FPN`` / ``MODEL.SEM_SEG_HEAD`` have no node in this build's
schema (RetinaNet/PanopticFPN are d2 architectures the reference never
instantiates). The V2 upgrade drops RetinaNet anchor keys for
non-RetinaNet architectures exactly like d2; a V1 config that genuinely
configures a RetinaNet still fails the strict merge afterwards — by
design (this build implements the R-CNN families only).
"""

from __future__ import annotations

import logging

logger = logging.getLogger(__name__)

__all__ = [
    "LATEST_VERSION",
    "downgrade_config",
    "guess_version",
    "prune_removed_keys",
    "upgrade_config",
]

LATEST_VERSION = 2

# Keys that existed in earlier schema revisions of THIS build and were
# removed. Dumped OUTPUT_DIR/config.yaml files from old runs carry them
# (at any VERSION), so they are pruned — not renamed — before the strict
# merge.
_DELETED = (
    "TPU.MESH_DATA_AXIS",  # mesh axis became an API parameter
)

# Legacy spellings seen in the wild that are NOT part of d2's versioned
# rename tables (maskrcnn-benchmark era). Applied at any VERSION before
# merging; the target name exists unchanged in every version, so these
# stay out of the converters (a converter rename would break files that
# already use the canonical name).
_LEGACY_ALIASES = (
    ("MODEL.RPN.RPN_STRADDLE_THRESH", "MODEL.RPN.BOUNDARY_THRESH"),
)


def prune_removed_keys(cfg_dict: dict) -> dict:
    """Drop keys removed from this build's schema and canonicalize
    legacy alias spellings (any VERSION)."""
    for dead in _DELETED:
        if _pop(cfg_dict, dead):
            logger.info("Dropping removed config key %s", dead)
    for old, new in _LEGACY_ALIASES:
        _rename(cfg_dict, old, new)
    return cfg_dict


def guess_version(cfg_dict: dict, filename: str = "<dict>") -> int:
    """d2 compat.guess_version: a partial config without VERSION is
    assumed v1 when it carries a v1-only key, else latest."""
    def _has(name: str) -> bool:
        cur = cfg_dict
        for n in name.split("."):
            if not isinstance(cur, dict) or n not in cur:
                return False
            cur = cur[n]
        return True

    if _has("MODEL.WEIGHT") or _has("TEST.AUG_ON"):
        logger.warning(
            "Config '%s' has no VERSION. Assuming it to be v1.", filename
        )
        return 1
    logger.warning(
        "Config '%s' has no VERSION. Assuming it to be compatible with "
        "latest v%d.", filename, LATEST_VERSION,
    )
    return LATEST_VERSION


def upgrade_config(cfg_dict: dict, to_version: int = LATEST_VERSION) -> dict:
    """Upgrade a config dict from its VERSION to ``to_version`` in place
    (and return it). VERSION defaults to latest when absent — callers
    that need v1-guessing on partial files use guess_version first."""
    prune_removed_keys(cfg_dict)
    version = cfg_dict.get("VERSION", LATEST_VERSION)
    if version > to_version:
        raise ValueError(
            f"Cannot upgrade from v{version} to v{to_version}"
        )
    for k in range(version, to_version):
        _CONVERTERS[k + 1].upgrade(cfg_dict)
        cfg_dict["VERSION"] = k + 1
    return cfg_dict


def downgrade_config(cfg_dict: dict, to_version: int) -> dict:
    """Downgrade a config dict to an older version in place (and return
    it). Like d2: only guaranteed to recover the old-version DEFAULTS
    well enough that an old partial YAML merges cleanly."""
    version = cfg_dict.get("VERSION", LATEST_VERSION)
    if version < to_version:
        raise ValueError(
            f"Cannot downgrade from v{version} to v{to_version}"
        )
    for k in range(version, to_version, -1):
        _CONVERTERS[k].downgrade(cfg_dict)
        cfg_dict["VERSION"] = k - 1
    return cfg_dict


# ---------------------------------------------------------------------------
# dotted-path helpers (d2 compat._rename semantics: delete the old key,
# pruning emptied parents; create the new path)
# ---------------------------------------------------------------------------


def _get(d: dict, dotted: str, default=None):
    cur = d
    for p in dotted.split("."):
        if not isinstance(cur, dict) or p not in cur:
            return default
        cur = cur[p]
    return cur


def _set(d: dict, dotted: str, value) -> None:
    parts = dotted.split(".")
    cur = d
    for p in parts[:-1]:
        cur = cur.setdefault(p, {})
    cur[parts[-1]] = value


def _pop(d: dict, dotted: str) -> bool:
    parts = dotted.split(".")
    chain = [d]
    for p in parts[:-1]:
        nxt = chain[-1].get(p)
        if not isinstance(nxt, dict):
            return False
        chain.append(nxt)
    if parts[-1] not in chain[-1]:
        return False
    chain[-1].pop(parts[-1])
    for i in range(len(chain) - 1, 0, -1):  # prune now-empty parents
        if not chain[i]:
            del chain[i - 1][parts[i - 1]]
    return True


def _rename(d: dict, old: str, new: str) -> None:
    parts = old.split(".")
    cur = d
    for p in parts[:-1]:
        if not isinstance(cur, dict) or p not in cur:
            return
        cur = cur[p]
    if parts[-1] not in cur:
        return
    value = cur[parts[-1]]
    _pop(d, old)
    _set(d, new, value)


# ---------------------------------------------------------------------------
# converters (ref compat.py ConverterV1 / ConverterV2)
# ---------------------------------------------------------------------------


class _RenameConverter:
    RENAME: list = []  # (old name, new name)

    @classmethod
    def upgrade(cls, cfg: dict) -> None:
        for old, new in cls.RENAME:
            _rename(cfg, old, new)

    @classmethod
    def downgrade(cls, cfg: dict) -> None:
        for old, new in cls.RENAME[::-1]:
            _rename(cfg, new, old)


class ConverterV1(_RenameConverter):
    RENAME = [("MODEL.RPN_HEAD.NAME", "MODEL.RPN.HEAD_NAME")]


class ConverterV2(_RenameConverter):
    """The pre-public-release bulk rename (ref compat.py:166-264)."""

    RENAME = [
        ("MODEL.WEIGHT", "MODEL.WEIGHTS"),
        ("MODEL.PANOPTIC_FPN.SEMANTIC_LOSS_SCALE",
         "MODEL.SEM_SEG_HEAD.LOSS_WEIGHT"),
        ("MODEL.PANOPTIC_FPN.RPN_LOSS_SCALE", "MODEL.RPN.LOSS_WEIGHT"),
        ("MODEL.PANOPTIC_FPN.INSTANCE_LOSS_SCALE",
         "MODEL.PANOPTIC_FPN.INSTANCE_LOSS_WEIGHT"),
        ("MODEL.PANOPTIC_FPN.COMBINE_ON",
         "MODEL.PANOPTIC_FPN.COMBINE.ENABLED"),
        ("MODEL.PANOPTIC_FPN.COMBINE_OVERLAP_THRESHOLD",
         "MODEL.PANOPTIC_FPN.COMBINE.OVERLAP_THRESH"),
        ("MODEL.PANOPTIC_FPN.COMBINE_STUFF_AREA_LIMIT",
         "MODEL.PANOPTIC_FPN.COMBINE.STUFF_AREA_LIMIT"),
        ("MODEL.PANOPTIC_FPN.COMBINE_INSTANCES_CONFIDENCE_THRESHOLD",
         "MODEL.PANOPTIC_FPN.COMBINE.INSTANCES_CONFIDENCE_THRESH"),
        ("MODEL.ROI_HEADS.SCORE_THRESH", "MODEL.ROI_HEADS.SCORE_THRESH_TEST"),
        ("MODEL.ROI_HEADS.NMS", "MODEL.ROI_HEADS.NMS_THRESH_TEST"),
        ("MODEL.RETINANET.INFERENCE_SCORE_THRESHOLD",
         "MODEL.RETINANET.SCORE_THRESH_TEST"),
        ("MODEL.RETINANET.INFERENCE_TOPK_CANDIDATES",
         "MODEL.RETINANET.TOPK_CANDIDATES_TEST"),
        ("MODEL.RETINANET.INFERENCE_NMS_THRESHOLD",
         "MODEL.RETINANET.NMS_THRESH_TEST"),
        ("TEST.DETECTIONS_PER_IMG", "TEST.DETECTIONS_PER_IMAGE"),
        ("TEST.AUG_ON", "TEST.AUG.ENABLED"),
        ("TEST.AUG_MIN_SIZES", "TEST.AUG.MIN_SIZES"),
        ("TEST.AUG_MAX_SIZE", "TEST.AUG.MAX_SIZE"),
        ("TEST.AUG_FLIP", "TEST.AUG.FLIP"),
    ]

    @classmethod
    def upgrade(cls, cfg: dict) -> None:
        super().upgrade(cfg)

        if _get(cfg, "MODEL.META_ARCHITECTURE") == "RetinaNet":
            _rename(cfg, "MODEL.RETINANET.ANCHOR_ASPECT_RATIOS",
                    "MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS")
            _rename(cfg, "MODEL.RETINANET.ANCHOR_SIZES",
                    "MODEL.ANCHOR_GENERATOR.SIZES")
            _pop(cfg, "MODEL.RPN.ANCHOR_SIZES")
            _pop(cfg, "MODEL.RPN.ANCHOR_ASPECT_RATIOS")
        else:
            _rename(cfg, "MODEL.RPN.ANCHOR_ASPECT_RATIOS",
                    "MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS")
            _rename(cfg, "MODEL.RPN.ANCHOR_SIZES",
                    "MODEL.ANCHOR_GENERATOR.SIZES")
            _pop(cfg, "MODEL.RETINANET.ANCHOR_SIZES")
            _pop(cfg, "MODEL.RETINANET.ANCHOR_ASPECT_RATIOS")
        _pop(cfg, "MODEL.RETINANET.ANCHOR_STRIDES")

    @classmethod
    def downgrade(cls, cfg: dict) -> None:
        super().downgrade(cfg)

        _rename(cfg, "MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS",
                "MODEL.RPN.ANCHOR_ASPECT_RATIOS")
        _rename(cfg, "MODEL.ANCHOR_GENERATOR.SIZES",
                "MODEL.RPN.ANCHOR_SIZES")
        # d2 mirrors the anchors into the RetinaNet node so a v1 RetinaNet
        # YAML can still merge; ANCHOR_STRIDES "is not used anywhere in
        # any version" (ref compat.py:262)
        ar = _get(cfg, "MODEL.RPN.ANCHOR_ASPECT_RATIOS")
        if ar is not None:
            _set(cfg, "MODEL.RETINANET.ANCHOR_ASPECT_RATIOS", ar)
        sz = _get(cfg, "MODEL.RPN.ANCHOR_SIZES")
        if sz is not None:
            _set(cfg, "MODEL.RETINANET.ANCHOR_SIZES", sz)
        _set(cfg, "MODEL.RETINANET.ANCHOR_STRIDES", [])


_CONVERTERS = {1: ConverterV1, 2: ConverterV2}
