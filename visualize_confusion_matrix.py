"""Class-embedding similarity heatmaps (GloVe/CLIP).

Parity with the reference visualize_confusion_matrix.py:10-73: cosine
similarity matrix between class embeddings, rendered with matplotlib if
available, else dumped as CSV.
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="glove", choices=["glove", "clip"])
    p.add_argument("--split", type=int, default=1)
    p.add_argument("--root", default="datasets")
    p.add_argument("--output", default="Similarity_matrix.png")
    args = p.parse_args()

    from fewshotobjectdetection_imporove_via_text_feature_tpu.data.builtin_meta import (
        PASCAL_VOC_ALL_CATEGORIES,
    )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.utils.class_embedding import (
        get_class_embed,
    )

    names = PASCAL_VOC_ALL_CATEGORIES[args.split]
    bank = get_class_embed(names, args.model, root=args.root)
    norm = bank / np.linalg.norm(bank, axis=1, keepdims=True)
    sim = norm @ norm.T

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(10, 8))
        im = ax.imshow(sim, cmap="viridis")
        ax.set_xticks(range(len(names)))
        ax.set_yticks(range(len(names)))
        ax.set_xticklabels(names, rotation=90)
        ax.set_yticklabels(names)
        for i in range(len(names)):
            for j in range(len(names)):
                ax.text(j, i, f"{sim[i, j]:.2f}", ha="center", va="center",
                        fontsize=6, color="w")
        fig.colorbar(im)
        fig.tight_layout()
        fig.savefig(args.output, dpi=150)
        print(f"wrote {args.output}")
    except ImportError:
        out = args.output.rsplit(".", 1)[0] + ".csv"
        np.savetxt(out, sim, delimiter=",", header=",".join(names))
        print(f"matplotlib unavailable; wrote {out}")


if __name__ == "__main__":
    main()
