"""CLI entry point — parity with the reference's main.py:36-132.

Thin shim: the implementation lives in
``fewshotobjectdetection_imporove_via_text_feature_tpu/cli.py`` (also
installed as the ``fsodtf`` console script). This file keeps the
reference's invocation shape working from a repo checkout:

    python main.py --config-file configs/voc/defrcn_det_r101_base1.yaml \
        --opts MODEL.WEIGHTS path/to/R-101.pkl OUTPUT_DIR out/base1
"""

from fewshotobjectdetection_imporove_via_text_feature_tpu.cli import (  # noqa: F401
    build_evaluator,
    default_argument_parser,
    do_test,
    main,
    resolve_eval_iter_checkpoint,
    setup,
)

if __name__ == "__main__":
    main()
