#!/usr/bin/env python
"""Export a checkpoint as a self-contained serving artifact.

    python tools/export_serving.py --config-file configs/voc/... \
        --output model.fsodtf [--batch 1] [--platforms tpu,cpu] \
        [--opts MODEL.WEIGHTS path ...]

The artifact (engine/export.py) bundles the AOT-compiled StableHLO
inference programs (one per image-bucket shape, both orientations) with
the weights; serve it with:

    from fewshotobjectdetection_imporove_via_text_feature_tpu.engine.export \
        import ServingPredictor
    pred = ServingPredictor("model.fsodtf")
    dets = pred(bgr_image)   # same contract as DefaultPredictor

This is the deployment analog of the reference's DefaultPredictor
(defrcn/engine/defaults.py:131-192), which re-builds the model from config
+ checkpoint in every serving process.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# FSODTF_PLATFORM=cpu forces the export run itself off the time-shared TPU
# (env JAX_PLATFORMS alone is pre-empted by the container sitecustomize —
# NOTES.md; same override every other tool applies before backend init)
if os.environ.get("FSODTF_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["FSODTF_PLATFORM"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument(
        "--batches", default="1",
        help="comma list of batch sizes to export programs for (e.g. "
        "'1,8'); multi-batch artifacts enable ServingPredictor."
        "predict_batch / the HTTP server's --max-batch",
    )
    ap.add_argument(
        "--platforms", default="",
        help="comma list (e.g. 'tpu,cpu') for a multi-platform artifact; "
        "default: the current backend only",
    )
    ap.add_argument("--opts", default=[], nargs=argparse.REMAINDER)
    args = ap.parse_args()

    from fewshotobjectdetection_imporove_via_text_feature_tpu.config import get_cfg
    from fewshotobjectdetection_imporove_via_text_feature_tpu.engine.export import (
        export_inference,
        save_serving_artifact,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.engine.predictor import (
        DefaultPredictor,
    )

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)

    # DefaultPredictor's init path: build params and load MODEL.WEIGHTS
    # through the same dispatch (orbax dir / .ckpt / .pth / .pkl; missing
    # files raise FileNotFoundError there)
    params = DefaultPredictor(cfg).params

    platforms = (
        tuple(p.strip() for p in args.platforms.split(",") if p.strip())
        or None
    )
    batches = [int(b) for b in args.batches.split(",") if b.strip()]
    meta, programs = export_inference(
        cfg, params, batch=batches, platforms=platforms
    )
    save_serving_artifact(args.output, meta, programs, params)
    mb = os.path.getsize(args.output) / 1e6
    print(
        f"wrote {args.output} ({mb:.1f} MB): {len(programs)} programs "
        f"(batches {meta['batches']}), platforms {meta['platforms']}"
    )


if __name__ == "__main__":
    main()
