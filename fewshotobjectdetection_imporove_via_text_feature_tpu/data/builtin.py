"""Built-in dataset registration — identical dataset names to the reference
(defrcn/data/builtin.py:10-95) so configs and run scripts port verbatim."""

from __future__ import annotations

import os

from .builtin_meta import _get_builtin_metadata
from .catalog import DatasetCatalog
from .meta_coco import register_meta_coco
from .meta_voc import register_meta_voc

_REGISTERED = False


def register_all_coco(root="datasets"):
    metasplits = [
        ("coco14_trainval_all", "coco/trainval2014", "cocosplit/datasplit/trainvalno5k.json"),
        ("coco14_trainval_base", "coco/trainval2014", "cocosplit/datasplit/trainvalno5k.json"),
        ("coco14_test_all", "coco/val2014", "cocosplit/datasplit/5k.json"),
        ("coco14_test_base", "coco/val2014", "cocosplit/datasplit/5k.json"),
        ("coco14_test_novel", "coco/val2014", "cocosplit/datasplit/5k.json"),
    ]
    for prefix in ["all", "novel"]:
        for shot in [1, 2, 3, 5, 10, 30]:
            for seed in range(10):
                name = f"coco14_trainval_{prefix}_{shot}shot_seed{seed}"
                metasplits.append((name, "coco/trainval2014", ""))

    for name, imgdir, annofile in metasplits:
        register_meta_coco(
            name,
            _get_builtin_metadata("coco_fewshot"),
            os.path.join(root, imgdir),
            os.path.join(root, annofile),
            root=root,
        )


def register_all_voc(root="datasets"):
    metasplits = [
        ("voc_2007_trainval_base1", "VOC2007", "trainval", "base1", 1),
        ("voc_2007_trainval_base2", "VOC2007", "trainval", "base2", 2),
        ("voc_2007_trainval_base3", "VOC2007", "trainval", "base3", 3),
        ("voc_2012_trainval_base1", "VOC2012", "trainval", "base1", 1),
        ("voc_2012_trainval_base2", "VOC2012", "trainval", "base2", 2),
        ("voc_2012_trainval_base3", "VOC2012", "trainval", "base3", 3),
        ("voc_2007_trainval_all1", "VOC2007", "trainval", "base_novel_1", 1),
        ("voc_2007_trainval_all2", "VOC2007", "trainval", "base_novel_2", 2),
        ("voc_2007_trainval_all3", "VOC2007", "trainval", "base_novel_3", 3),
        ("voc_2012_trainval_all1", "VOC2012", "trainval", "base_novel_1", 1),
        ("voc_2012_trainval_all2", "VOC2012", "trainval", "base_novel_2", 2),
        ("voc_2012_trainval_all3", "VOC2012", "trainval", "base_novel_3", 3),
        ("voc_2007_test_base1", "VOC2007", "test", "base1", 1),
        ("voc_2007_test_base2", "VOC2007", "test", "base2", 2),
        ("voc_2007_test_base3", "VOC2007", "test", "base3", 3),
        ("voc_2007_test_novel1", "VOC2007", "test", "novel1", 1),
        ("voc_2007_test_novel2", "VOC2007", "test", "novel2", 2),
        ("voc_2007_test_novel3", "VOC2007", "test", "novel3", 3),
        ("voc_2007_test_all1", "VOC2007", "test", "base_novel_1", 1),
        ("voc_2007_test_all2", "VOC2007", "test", "base_novel_2", 2),
        ("voc_2007_test_all3", "VOC2007", "test", "base_novel_3", 3),
    ]
    for prefix in ["all", "novel"]:
        for sid in range(1, 4):
            for shot in [1, 2, 3, 5, 10]:
                for year in [2007, 2012]:
                    for seed in range(30):
                        name = (
                            f"voc_{year}_trainval_{prefix}{sid}_{shot}shot"
                            f"_seed{seed}"
                        )
                        img_file = f"{prefix}_{shot}shot_split_{sid}_trainval"
                        keepclasses = (
                            f"base_novel_{sid}"
                            if prefix == "all"
                            else f"novel{sid}"
                        )
                        metasplits.append(
                            (name, f"VOC{year}", img_file, keepclasses, sid)
                        )

    for name, dirname, split, keepclasses, sid in metasplits:
        year = 2007 if "2007" in name else 2012
        register_meta_voc(
            name,
            _get_builtin_metadata("voc_fewshot"),
            os.path.join(root, dirname),
            split,
            year,
            keepclasses,
            sid,
            root=root,
        )


def register_all(root="datasets"):
    global _REGISTERED
    if _REGISTERED:
        return
    _REGISTERED = True
    register_all_coco(root)
    register_all_voc(root)
