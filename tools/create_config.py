"""Materialize per-(shot, seed, split) configs from the novelx/seedx
templates — same string-templating contract as the reference
tools/create_config.py:30-58 so run scripts port verbatim."""

from __future__ import annotations

import argparse
import os


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="coco14", choices=["coco14", "voc"])
    p.add_argument("--config_root", default="")
    p.add_argument("--shot", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--setting", default="fsod", choices=["fsod", "gfsod"])
    p.add_argument("--split", type=int, default=1, help="only for voc")
    return p.parse_args()


def main():
    args = parse_args()
    suffix = "novel" if args.setting == "fsod" else "all"

    if args.dataset == "voc":
        tpl = f"defrcn_{args.setting}_r101_novelx_{args.shot}shot_seedx.yaml"
        path = os.path.join(args.config_root, tpl)
        lines = open(path).readlines()
        for i, line in enumerate(lines):
            if "  TRAIN: " in line:
                lines[i] = (
                    f'  TRAIN: ("voc_2007_trainval_{suffix}{args.split}_'
                    f'{args.shot}shot_seed{args.seed}", )\n'
                )
            if "  TEST: " in line:
                lines[i] = f'  TEST: ("voc_2007_test_{suffix}{args.split}",)\n'
        path = path.replace("novelx", f"novel{args.split}")
    else:
        tpl = f"defrcn_{args.setting}_r101_novel_{args.shot}shot_seedx.yaml"
        path = os.path.join(args.config_root, tpl)
        lines = open(path).readlines()
        for i, line in enumerate(lines):
            if "  TRAIN: " in line:
                lines[i] = (
                    f'  TRAIN: ("coco14_trainval_{suffix}_{args.shot}shot_'
                    f'seed{args.seed}", )\n'
                )

    path = path.replace("seedx", f"seed{args.seed}")
    with open(path, "w") as f:
        f.writelines(lines)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
