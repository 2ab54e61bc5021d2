"""Aggregate multi-seed results into mean ± 1.96·σ/√n tables.

Same contract as the reference tools/extract_results.py:8-58: scrapes the
last two 'copypaste:' lines of each {K}shot_*/log.txt under --res-dir."""

from __future__ import annotations

import argparse
import math
import os

import numpy as np


def _table(rows, headers):
    widths = [
        max(len(str(r[i])) for r in rows + [headers])
        for i in range(len(headers))
    ]

    def fmt_row(r):
        return "| " + " | ".join(
            f"{str(c):<{w}}" for c, w in zip(r, widths)
        ) + " |"

    sep = "|" + "|".join("-" * (w + 2) for w in widths) + "|"
    return "\n".join([fmt_row(headers), sep] + [fmt_row(r) for r in rows])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--res-dir", default="")
    p.add_argument("--shot-list", type=int, nargs="+", default=[10])
    args = p.parse_args()

    out_path = os.path.join(args.res_dir, "results.txt")
    with open(out_path, "w") as wf:
        for shot in args.shot_list:
            paths = []
            for fname in sorted(os.listdir(args.res_dir)):
                if fname.split("_")[0] != f"{shot}shot":
                    continue
                d = os.path.join(args.res_dir, fname)
                if os.path.isdir(d):
                    paths.append(os.path.join(d, "log.txt"))

            header, results = [], []
            for fid, fpath in enumerate(paths):
                # last two copypaste lines, NOT the literal last two lines:
                # a TEST.EXPECTED_RESULTS run appends "Result verification
                # passed." after the CSV (the reference's lines[-2:] scrape,
                # extract_results.py:31-38, would crash on that — latent
                # there because no committed config sets EXPECTED_RESULTS)
                lines = [
                    ln for ln in open(fpath) if "copypaste:" in ln
                ]
                if fid == 0:
                    header = lines[-2].strip().split(":")[-1].split(",")
                vals = [
                    float(x)
                    for x in lines[-1].strip().split(":")[-1].split(",")
                ]
                results.append([fid] + vals)

            if not results:
                wf.write(f"--> {shot}-shot: no runs found\n\n")
                continue
            arr = np.array([r[1:] for r in results])
            avg = arr.mean(axis=0)
            ci = 1.96 * arr.std(axis=0) / math.sqrt(arr.shape[0])
            rows = [
                [r[0]] + [f"{v:.2f}" for v in r[1:]] for r in results
            ]
            rows.append(["u"] + [f"{v:.2f}" for v in avg])
            rows.append(["c"] + [f"{v:.2f}" for v in ci])
            wf.write(f"--> {shot}-shot\n")
            wf.write(_table(rows, [""] + header) + "\n\n")
    print(f"Reformat all results -> {out_path}")


if __name__ == "__main__":
    main()
