"""Two-process multi-host simulation: training over a global mesh must run
in lockstep (identical per-step losses on every rank = the cross-process
gradient psum is real) and evaluation must slice batches and all-gather
detections so all ranks report identical metrics.

Spawns two real `main.py` processes on localhost with 2 virtual CPU
devices each — the same drive as a 2-machine cluster.
"""

import os
import re
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

OPTS = [
    "MODEL.WEIGHTS", "",
    "MODEL.RESNETS.DEPTH", "14",
    "MODEL.RESNETS.STEM_OUT_CHANNELS", "8",
    "MODEL.RESNETS.RES2_OUT_CHANNELS", "16",
    "MODEL.RESNETS.WIDTH_PER_GROUP", "4",
    "MODEL.BACKBONE.FREEZE_AT", "0",
    "MODEL.RPN.PRE_NMS_TOPK_TRAIN", "128",
    "MODEL.RPN.POST_NMS_TOPK_TRAIN", "32",
    "MODEL.RPN.PRE_NMS_TOPK_TEST", "128",
    "MODEL.RPN.POST_NMS_TOPK_TEST", "32",
    "MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE", "8",
    "TPU.IMAGE_BUCKETS", "((192,288),)",
    "TPU.MAX_GT", "10",
    "TPU.MAX_DETECTIONS_PRE_NMS", "64",
    "TPU.COMPUTE_DTYPE", "float32",
    "INPUT.MIN_SIZE_TRAIN", "(192,)",
    "INPUT.MAX_SIZE_TRAIN", "288",
    "INPUT.MIN_SIZE_TEST", "192",
    "INPUT.MAX_SIZE_TEST", "288",
    "SOLVER.IMS_PER_BATCH", "4",
    "SOLVER.BASE_LR", "0.001",
    "SOLVER.WARMUP_ITERS", "0",
    "SOLVER.CHECKPOINT_PERIOD", "0",
    "TEST.EVAL_PERIOD", "0",
    "SEED", "5",
    "SOLVER.MAX_ITER", "2",
    "SOLVER.STEPS", "(1,)",
]


@pytest.mark.slow
def test_two_process_train_and_eval(tmp_path):
    # synthetic VOC on disk (shared with the workflow smokes)
    subprocess.run(
        [sys.executable, "tools/_make_synthetic_voc.py", "--root",
         "datasets", "--shots", "1", "--seed", "0"],
        cwd=ROOT, check=True, capture_output=True,
    )
    # a fixed port can collide with an orphaned coordinator from an
    # earlier aborted run; bind-and-release to get a free one
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    procs = []
    for rank in (0, 1):
        env = dict(
            os.environ,
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            FSODTF_PLATFORM="cpu",
        )
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "main.py",
                    "--config-file", "configs/voc/defrcn_det_r101_base1.yaml",
                    "--num-machines", "2",
                    "--machine-rank", str(rank),
                    "--dist-url", f"localhost:{port}",
                    "--opts", *OPTS,
                    "OUTPUT_DIR", str(tmp_path / "out"),
                ],
                cwd=ROOT, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    outs = [p.communicate(timeout=420)[0].decode() for p in procs]
    # show BOTH ranks on failure: a shutdown-barrier timeout on rank 0
    # usually means rank 1 crashed first — rank 1's tail holds the cause
    both = "\n".join(
        f"--- rank {r} (rc={procs[r].returncode}) ---\n{outs[r][-2000:]}"
        for r in (0, 1)
    )
    for rank in (0, 1):
        assert procs[rank].returncode == 0, both

    def losses(txt):
        return re.findall(r"iter \d+ .*total_loss: ([0-9.]+)", txt)

    l0, l1 = losses(outs[0]), losses(outs[1])
    assert l0 and l0 == l1, (l0, l1)  # lockstep psum

    def copypaste(txt):
        return re.findall(r"copypaste: ([0-9.,]+)", txt)

    c0, c1 = copypaste(outs[0]), copypaste(outs[1])
    assert c0 and c0 == c1, (c0, c1)  # gathered metrics identical
    assert (tmp_path / "out" / "model_final.ckpt").exists()
