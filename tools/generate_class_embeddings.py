"""Generate class-embedding files in the reference's on-disk layout
(datasets/{glove,clip}/{class}.txt + background.txt).

The reference never committed its datasets/ directory
(defrcn/utils/class_embedding.py:4-16 expects it); this tool materializes
it. With --from-npz you can convert real GloVe/CLIP vectors (a .npz of
name -> vector); otherwise deterministic synthetic unit vectors are
written so the text branch runs end to end.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fewshotobjectdetection_imporove_via_text_feature_tpu.data.builtin_meta import (  # noqa: E402
    COCO_THING_CATEGORIES,
    PASCAL_VOC_ALL_CATEGORIES,
)
from fewshotobjectdetection_imporove_via_text_feature_tpu.utils.class_embedding import (  # noqa: E402
    SEMANTIC_DIMS,
    _synthetic_embedding,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="datasets")
    p.add_argument("--model", default="glove", choices=["glove", "clip"])
    p.add_argument(
        "--from-npz", default="",
        help=".npz mapping class name -> vector (real embeddings)",
    )
    args = p.parse_args()

    dim = SEMANTIC_DIMS[args.model]
    names = set(["background"])
    for split in PASCAL_VOC_ALL_CATEGORIES.values():
        names.update(split)
    names.update(n for _, n in COCO_THING_CATEGORIES)

    source = {}
    if args.from_npz:
        data = np.load(args.from_npz)
        source = {k: np.asarray(data[k]) for k in data.files}

    out_dir = os.path.join(args.root, args.model)
    os.makedirs(out_dir, exist_ok=True)
    for name in sorted(names):
        vec = source.get(name)
        if vec is None:
            vec = _synthetic_embedding(name, dim)
        assert vec.shape == (dim,), (name, vec.shape)
        np.savetxt(os.path.join(out_dir, f"{name}.txt"), vec)
    print(f"wrote {len(names)} embeddings to {out_dir}")


if __name__ == "__main__":
    main()
