"""CLI compatibility: the reference scripts' flag surface must parse."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nerfsr_tpu.config import parse_options, save_options


class TestReferenceScriptSurface:
    def test_train_llff_downX_flags(self):
        """Exact flag set of the reference scripts/train_llff_downX.sh."""
        argv = ("--name llff-fern-378x504-ni64-dp-ds2 --accelerator dp "
                "--dataset_mode llff_downX --dataset_root /data/fern "
                "--checkpoints_dir ./checkpoints/nerf-sr "
                "--summary_dir ./logs/nerf-sr "
                "--img_wh 504 378 --batch_size 512 "
                "--n_epochs 30 --n_epochs_decay 10 "
                "--print_freq 100 --vis_freq 1000 --val_freq 1000 "
                "--vis_epoch_freq 30 --val_epoch_freq 30 "
                "--save_epoch_freq 10 "
                "--model nerf_downX --N_coarse 64 --N_importance 64 "
                "--lr_policy exp --sigma_activation relu "
                "--lr 5e-4 --lr_final 5e-6 "
                "--include_var --downscale 2").split()
        opt = parse_options("train", argv)
        assert opt.model == "nerf_downX"
        assert opt.img_wh == [504, 378]
        assert opt.include_var and opt.downscale == 2
        # llff defaults applied (llff_downX_dataset.py set_defaults)
        assert opt.white_bkgd is False and opt.noise_std == 1.0

    def test_train_blender_flags(self):
        argv = ("--name blender-lego --accelerator dp "
                "--dataset_mode blender --dataset_root /data/lego "
                "--val_epoch_split test --init_type kaiming "
                "--img_wh 200 200 --batch_size 2048 "
                "--n_epochs 20 --n_epochs_decay 10 "
                "--model nerf --N_coarse 64 --N_importance 64 "
                "--lr_policy exp --sigma_activation relu "
                "--lr 5e-4 --lr_final 5e-6").split()
        opt = parse_options("train", argv)
        # blender defaults (blender_dataset.py:15)
        assert opt.white_bkgd is True and opt.noise_std == 0.0

    def test_test_llff_refine_flags(self):
        argv = ("--name llff-refine-fern --dataset_mode llff_refine "
                "--dataset_root /data/fern "
                "--checkpoints_dir ./ck --summary_dir ./lg "
                "--results_dir ./res --img_wh 504 378 --batch_size 1 "
                "--model refine --test_split test_train "
                "--refine_network maxpoolingmodel --load_epoch 3 "
                "--syn_dataroot ./syn").split()
        opt = parse_options("test", argv)
        assert opt.refine_network == "maxpoolingmodel"
        # llff_refine dataset default: patch_len 64 (not the downX 32)
        assert opt.patch_len == 64

    def test_explicit_flag_beats_dataset_default(self):
        argv = ("--name x --dataset_mode llff --dataset_root /d "
                "--img_wh 8 8 --noise_std 0.5 --patch_len 16").split()
        opt = parse_options("train", argv)
        assert opt.noise_std == 0.5
        assert opt.patch_len == 16

    def test_white_bkgd_explicit(self):
        argv = ("--name x --dataset_mode llff --dataset_root /d "
                "--img_wh 8 8 --white_bkgd").split()
        opt = parse_options("train", argv)
        assert opt.white_bkgd is True

    def test_suffix_formatting(self):
        argv = ("--name exp --dataset_mode llff --dataset_root /d "
                "--img_wh 8 8 --model nerf --suffix {model}").split()
        opt = parse_options("train", argv)
        assert opt.name == "exp_nerf"

    def test_save_options_dumps(self, tmp_path):
        argv = ("--name dump --dataset_mode template --dataset_root /d "
                f"--img_wh 8 8 --checkpoints_dir {tmp_path}").split()
        opt = parse_options("train", argv)
        save_options(opt)
        assert os.path.exists(tmp_path / "dump" / "train_opt.txt")
        assert os.path.exists(tmp_path / "dump" / "train_opt.json")


class TestVisualizer:
    def test_save_kinds(self, tmp_path):
        from nerfsr_tpu.utils.visualizer import Visualizee, save_visuals

        rng = np.random.RandomState(0)
        vis = [
            Visualizee("image", rng.rand(8, 8, 3), name="im"),
            Visualizee("gif", [rng.rand(8, 8, 3)] * 3, name="anim"),
            Visualizee("matrix", rng.rand(8, 8), name="depth",
                       range=(0, 1)),
            Visualizee("pc", rng.rand(10, 6), name="cloud"),
        ]
        save_visuals(vis, str(tmp_path))
        names = set(os.listdir(tmp_path))
        assert {"im.png", "anim.gif", "depth.npz", "depth.png",
                "cloud.ply"} <= names

    def test_metrics_writer_jsonl(self, tmp_path):
        import json

        from nerfsr_tpu.utils.visualizer import MetricsWriter

        w = MetricsWriter(str(tmp_path), "run")
        w.add_scalars({"a": 1.0, "b": 2.0}, step=5, prefix="train/")
        w.close()
        lines = open(tmp_path / "run" / "metrics.jsonl").read().splitlines()
        tags = {json.loads(ln)["tag"] for ln in lines}
        assert {"train/a", "train/b"} <= tags
