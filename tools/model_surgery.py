"""Checkpoint surgery CLI — same interface as the reference
tools/model_surgery.py (remove / randinit / reset) operating on our
pytree checkpoints (.ckpt single-file pickle or orbax directory).

Torch .pth checkpoints are NOT consumed here: the few-shot workflow
surgers the base checkpoint this framework trained (like the reference
surgers its own model_final.pth); a reference-format .pth enters the
pipeline through MODEL.WEIGHTS instead (checkpoint/torch_import.py)."""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fewshotobjectdetection_imporove_via_text_feature_tpu.checkpoint.surgery import (  # noqa: E402
    reset_optimizer,
    surgery_randinit,
    surgery_remove,
    surgery_reset_student,
)


def load_state(path):
    if path.endswith((".pth", ".pkl")):
        raise SystemExit(
            f"{path}: surgery operates on this framework's checkpoints "
            "(.ckpt / orbax dir). Load reference-format weights via "
            "MODEL.WEIGHTS (they are translated at train time), train, "
            "then surger the resulting model_final.ckpt."
        )
    from fewshotobjectdetection_imporove_via_text_feature_tpu.checkpoint.checkpointer import (
        load_checkpoint_file,
    )

    return load_checkpoint_file(path)


def save_state(state, path):
    with open(path, "wb") as f:
        pickle.dump(state, f, protocol=4)
    print(f"save changed ckpt to {path}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="coco", choices=["voc", "coco"])
    p.add_argument("--src-path", default="", help="Path to the main checkpoint")
    p.add_argument("--save-dir", required=True)
    p.add_argument(
        "--method",
        choices=["remove", "randinit", "reset", "reset_student"],
        required=True,
    )
    p.add_argument("--tar-name", default="model_reset")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    os.makedirs(args.save_dir, exist_ok=True)
    state = load_state(args.src_path)
    tar_size = 80 if args.dataset == "coco" else 20

    if args.method == "reset":
        state = reset_optimizer(state)
        save_state(
            state, os.path.join(args.save_dir, args.tar_name + "_optimizer.ckpt")
        )
        return

    state = reset_optimizer(state)
    params = state["params"] if "params" in state else state
    if args.method == "reset_student":
        # cold-student prep for stage-2 distillation (beyond the
        # reference's surgery surface; see surgery_reset_student)
        new_params, n = surgery_reset_student(params, seed=args.seed)
        print(f"re-randomized {n} student-branch tensors")
        suffix = "_student"
    elif args.method == "remove":
        new_params = surgery_remove(params)
        suffix = "_remove"
    else:
        new_params = surgery_randinit(
            params, tar_size, dataset=args.dataset, seed=args.seed
        )
        suffix = "_surgery"
    state["params"] = new_params
    save_state(state, os.path.join(args.save_dir, args.tar_name + suffix + ".ckpt"))


if __name__ == "__main__":
    main()
