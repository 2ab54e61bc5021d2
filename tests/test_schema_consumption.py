"""Schema-consumption audit: every config key must be consumed somewhere
(model builder, loader, trainer, evaluator, tools) or appear on the
explicit allowlist of keys that are deliberately accepted-but-inert.

This is the guard behind the fixed-key work: a key that is neither read
nor allowlisted is a silently-ignored override waiting to happen (the
bug class that hid POOLER_RESOLUTION and the RPN loss knobs).
"""

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "fewshotobjectdetection_imporove_via_text_feature_tpu"

# Keys accepted for d2-config compatibility but deliberately inert, each
# with the reason it is FAITHFUL to leave them unread:
ALLOWED_INERT = {
    # bucket padding guarantees divisibility structurally (TPU fixed
    # shapes); d2 uses this only to pad dynamic batches
    "MODEL.BACKBONE.SIZE_DIVISIBILITY",
    # set by the reference's add_new_configs (main.py:41-43) and never
    # read anywhere in the reference either — dead upstream
    "MODEL.ADDITION.TEACHER_TRAINING",
    "MODEL.ADDITION.STUDENT_TRAINING",
    "MODEL.ADDITION.DISTIL_MODE",
    # set at rcnn.py:363 upstream and never read — dead upstream
    "MODEL.RPN.ADDITION",
    # d2's PreciseBN hook no-ops on a model with no BatchNorm modules
    # (this backbone is FrozenBN throughout) — silently inert upstream too
    "TEST.PRECISE_BN.ENABLED",
    "TEST.PRECISE_BN.NUM_ITER",
    # device placement / cudnn autotune have no TPU analog; d2-compat
    "MODEL.DEVICE",
    "CUDNN_BENCHMARK",
    # passed by run_text_train_teacher_novel.sh:46 via --opts; its only
    # consumer is GeneralizedRCNN2, a class the reference never committed
    # (documented non-reproducible) — the key must PARSE, nothing reads it
    "TEACHER_NOVEL_DIR",
}


def _schema_keys():
    src = open(os.path.join(REPO, PKG, "config", "defaults.py")).read()
    return re.findall(r"^_C\.([A-Z0-9_.]+)\s*=", src, re.M)


def _strip_comments_and_strings(src: str) -> str:
    """A dotted key inside a comment, docstring, or string literal is NOT
    consumption (compat.py's rename-table strings hid two unread RPN keys
    from the first version of this audit)."""
    import io
    import tokenize

    out = []
    try:
        for tok in tokenize.generate_tokens(io.StringIO(src).readline):
            if tok.type in (tokenize.COMMENT, tokenize.STRING):
                continue
            out.append(tok.string)
    except tokenize.TokenError:  # pragma: no cover - malformed source
        return src
    # re-fuse attribute chains the tokenizer split ("cfg . KEY" -> "cfg.KEY")
    return re.sub(r"\s*\.\s*", ".", " ".join(out))


def _consumer_corpus():
    chunks = []
    roots = [os.path.join(REPO, PKG), os.path.join(REPO, "tools")]
    for root in roots:
        for dirpath, _, files in os.walk(root):
            for f in files:
                if f.endswith(".py") and f != "defaults.py":
                    chunks.append(open(os.path.join(dirpath, f)).read())
    for f in ("main.py", "bench.py", "__graft_entry__.py"):
        chunks.append(open(os.path.join(REPO, f)).read())
    return "\n".join(_strip_comments_and_strings(c) for c in chunks)


def test_every_schema_key_is_consumed_or_allowlisted():
    from fewshotobjectdetection_imporove_via_text_feature_tpu.models.build import (
        _FIXED_AT_DEFAULT,
    )

    corpus = _consumer_corpus()
    keys = _schema_keys()
    assert len(keys) > 150  # the scan itself works
    # validated-fixed-at-default IS consumption (a non-default override
    # raises); the table holds dotted-string keys the stripped corpus
    # cannot see
    validated = {k for k, _ in _FIXED_AT_DEFAULT}
    # keys read through string subscripts the stripped corpus can't see
    validated.add("VERSION")  # config/compat.py version gating
    unused = [
        k for k in keys
        if k not in validated
        and not re.search(rf"\b{re.escape(k)}\b", corpus)
    ]
    # intermediate CfgNode() nodes (e.g. MODEL.PROPOSAL_GENERATOR) are
    # consumed through their children
    unused = [
        k for k in unused
        if not any(other.startswith(k + ".") for other in keys)
    ]
    stray = sorted(set(unused) - ALLOWED_INERT)
    assert not stray, (
        f"schema keys neither consumed nor allowlisted: {stray} — wire "
        "them into the builder/loader, validate them fixed-at-default "
        "(models/build.py _FIXED_AT_DEFAULT), or allowlist with a reason"
    )
    gone = sorted(ALLOWED_INERT - set(keys))
    assert not gone, f"allowlist entries no longer in the schema: {gone}"
