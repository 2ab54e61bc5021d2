#!/usr/bin/env python
"""Serve detections over HTTP (engine/server.py).

Two backends:
  --artifact X.fsodtf          AOT serving artifact (ServingPredictor; no
                               model build, no config needed)
  --config-file ... [--opts]   live model (DefaultPredictor; honors
                               MODEL.WEIGHTS and TPU.SPATIAL_PARTITION)

Examples:
  python tools/serve.py --artifact model.fsodtf --port 8080
  python tools/serve.py --config-file configs/voc/defrcn_det_r101_base1.yaml \
      --opts MODEL.WEIGHTS out/model_final.ckpt
  curl -s --data-binary @img.jpg localhost:8080/detect | jq .
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--artifact", help="serving artifact (.fsodtf zip)")
    ap.add_argument("--config-file", help="config for a live DefaultPredictor")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument(
        "--max-batch", type=int, default=1,
        help="dynamic batching: coalesce up to N concurrent requests into "
        "one device program (live model, or an artifact exported with "
        "--batches; 2.95x measured request throughput at batch 8)",
    )
    ap.add_argument(
        "--batch-window-ms", type=float, default=5.0,
        help="how long the dispatcher waits to fill a batch",
    )
    ap.add_argument("--opts", nargs=argparse.REMAINDER, default=[])
    args = ap.parse_args()
    if bool(args.artifact) == bool(args.config_file):
        ap.error("exactly one of --artifact / --config-file is required")

    platform = os.environ.get("FSODTF_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)

    from fewshotobjectdetection_imporove_via_text_feature_tpu.engine.server import (
        DetectionServer,
    )

    class_names = None
    meta = {}
    if args.artifact:
        from fewshotobjectdetection_imporove_via_text_feature_tpu.engine.export import (
            ServingPredictor,
        )

        predictor = ServingPredictor(args.artifact)
        meta = dict(predictor.meta)
        class_names = meta.pop("class_names", None)
    else:
        from fewshotobjectdetection_imporove_via_text_feature_tpu.config import (
            get_cfg,
        )
        from fewshotobjectdetection_imporove_via_text_feature_tpu.data import (
            builtin,  # noqa: F401 — registers the dataset grammar
        )
        from fewshotobjectdetection_imporove_via_text_feature_tpu.engine.predictor import (
            DefaultPredictor,
        )

        cfg = get_cfg()
        cfg.merge_from_file(args.config_file)
        if args.opts:
            cfg.merge_from_list(args.opts)
        predictor = DefaultPredictor(cfg)
        meta = {
            "min_size_test": cfg.INPUT.MIN_SIZE_TEST,
            "max_size_test": cfg.INPUT.MAX_SIZE_TEST,
            "num_classes": cfg.MODEL.ROI_HEADS.NUM_CLASSES,
        }
        try:
            from fewshotobjectdetection_imporove_via_text_feature_tpu.utils.class_name import (
                get_class_name,
            )

            class_names = get_class_name(cfg)
        except Exception:
            class_names = None

    server = DetectionServer(
        predictor, host=args.host, port=args.port,
        class_names=class_names, meta=meta,
        max_batch=args.max_batch, batch_window_ms=args.batch_window_ms,
    )
    print(f"serving on http://{server.host}:{server.port}", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
