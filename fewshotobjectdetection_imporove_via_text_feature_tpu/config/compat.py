"""Config version compatibility shims.

Parity surface for defrcn/config/compat.py (264 LoC of version up/downgrade
between detectron2 config VERSION 1 and 2). Our schema is VERSION 2; the
only V1 convention still seen in the wild is renamed RPN/head keys.
"""

from __future__ import annotations

import logging

logger = logging.getLogger(__name__)

LATEST_VERSION = 2

# V1 -> V2 key renames (detectron2 upgrade table).
_RENAMED = {
    "MODEL.RPN_HEAD.NAME": "MODEL.RPN.HEAD_NAME",
    "MODEL.RPN.RPN_STRADDLE_THRESH": "MODEL.RPN.BOUNDARY_THRESH",
}

# Keys that existed in earlier schema revisions and were removed. Dumped
# OUTPUT_DIR/config.yaml files from old runs carry them (at any VERSION),
# so they are pruned — not renamed — before the strict merge.
_DELETED = (
    "TPU.MESH_DATA_AXIS",  # mesh axis became an API parameter
)


def upgrade_config(cfg_dict: dict, to_version: int = LATEST_VERSION) -> dict:
    """Upgrade a plain config dict loaded from YAML to the latest schema."""
    for dead in _DELETED:
        if _pop(cfg_dict, dead):
            logger.info("Dropping removed config key %s", dead)
    version = cfg_dict.get("VERSION", LATEST_VERSION)
    if version >= to_version:
        return cfg_dict
    logger.info("Upgrading config from VERSION %d to %d", version, to_version)
    for old, new in _RENAMED.items():
        _rename(cfg_dict, old, new)
    cfg_dict["VERSION"] = to_version
    return cfg_dict


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


def _rename(d: dict, old: str, new: str):
    parts = old.split(".")
    chain = [d]
    for p in parts[:-1]:
        nxt = chain[-1].get(p)
        if nxt is None:
            return
        chain.append(nxt)
    node = chain[-1]
    if parts[-1] not in node:
        return
    value = node.pop(parts[-1])
    # prune now-empty parents so the strict merge never sees the old node
    for i in range(len(chain) - 1, 0, -1):
        if not chain[i]:
            del chain[i - 1][parts[i - 1]]
    tgt = d
    nparts = new.split(".")
    for p in nparts[:-1]:
        tgt = tgt.setdefault(p, {})
    tgt[nparts[-1]] = value
