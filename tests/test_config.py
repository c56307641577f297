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


class TestFastPresets:
    """--fast_preset expands to the exact promoted flag sets of the
    validated config ladder (VERDICT r4 next #1; the reference's
    per-family scripts are its equivalent config surface)."""

    BASE = ("--name x --dataset_mode llff_downX --dataset_root /d "
            "--img_wh 504 378 --model nerf_downX ")

    def test_llff_preset_expansion(self):
        opt = parse_options(
            "train", (self.BASE + "--fast_preset llff").split())
        assert opt.fast_sampling is True
        assert opt.N_importance == 16
        assert opt.n_prop == 48 and opt.n_prop_levels == 2
        assert opt.n_prop2 == 24
        assert opt.prop_pad_anneal_frac == 0.5
        assert opt.prop_pad_final == 0.0
        assert opt.prop_W == 48 and opt.prop_D == 3

    def test_quality_preset_expansion(self):
        opt = parse_options(
            "train", (self.BASE + "--fast_preset quality").split())
        assert opt.fast_sampling and opt.N_importance == 24
        assert (opt.n_prop, opt.n_prop_levels, opt.n_prop2) == (48, 2, 24)
        assert opt.prop_pad_anneal_frac == 0.0  # constant pad
        assert opt.prop_W == 48 and opt.prop_D == 3

    def test_blender_and_universal_presets(self):
        for name in ("blender", "universal"):
            opt = parse_options(
                "train",
                ("--name x --dataset_mode blender_downX "
                 "--dataset_root /d --img_wh 400 400 "
                 f"--fast_preset {name}").split())
            assert opt.fast_sampling and opt.N_importance == 48
            assert (opt.n_prop, opt.n_prop_levels, opt.n_prop2) == \
                (96, 2, 48)
            # constant pad + default prop net (blender needs both)
            assert opt.prop_pad_anneal_frac == 0.0
            assert opt.prop_pad_anneal == 0
            assert opt.prop_W == 64 and opt.prop_D == 4

    def test_parity_preset(self):
        opt = parse_options(
            "train", (self.BASE + "--fast_preset parity").split())
        assert opt.fast_sampling is False
        assert opt.N_importance == 64

    def test_explicit_flag_beats_preset(self):
        opt = parse_options(
            "train",
            (self.BASE + "--fast_preset llff --N_importance 24").split())
        assert opt.N_importance == 24          # explicit wins
        assert opt.n_prop == 48                # preset fills the rest

    def test_guard_refuses_anneal_on_blender(self):
        """The measured -7.2 dB footgun: pad-anneal-to-zero on a
        white-bkgd/360-degree dataset is refused without
        --force_config."""
        argv = ("--name x --dataset_mode blender_downX "
                "--dataset_root /d --img_wh 400 400 "
                "--fast_preset llff").split()
        with pytest.raises(SystemExit):
            parse_options("train", argv)
        # --force_config runs it anyway (the documented bracket run)
        opt = parse_options("train", argv + ["--force_config"])
        assert opt.fast_sampling and opt.prop_pad_final == 0.0

    def test_guard_refuses_explicit_anneal_on_white_bkgd(self):
        argv = ("--name x --dataset_mode llff_downX --dataset_root /d "
                "--img_wh 504 378 --white_bkgd --fast_sampling "
                "--n_prop_levels 2 --prop_pad_anneal 1000 "
                "--prop_pad_final 0.0").split()
        with pytest.raises(SystemExit):
            parse_options("train", argv)

    def test_guard_allows_llff_anneal_and_blender_preset(self):
        # the promoted combinations pass untouched
        opt = parse_options(
            "train", (self.BASE + "--fast_preset llff").split())
        assert opt.prop_pad_anneal_frac == 0.5
        opt = parse_options(
            "train",
            ("--name x --dataset_mode blender_downX --dataset_root /d "
             "--img_wh 400 400 --fast_preset blender").split())
        assert opt.N_importance == 48

    def test_default_options_preset(self):
        """Programmatic (bench.py) preset expansion matches the CLI."""
        from nerfsr_tpu.config import default_options

        opt = default_options(
            "train", model="nerf_downX", dataset_mode="llff_downX",
            fast_preset="llff", white_bkgd=False, noise_std=1.0,
            img_wh=(504, 378))
        want = parse_options(
            "train", (self.BASE + "--fast_preset llff").split())
        for k in ("fast_sampling", "N_importance", "n_prop",
                  "n_prop_levels", "n_prop2", "prop_pad_anneal_frac",
                  "prop_pad_final", "prop_W", "prop_D"):
            assert getattr(opt, k) == getattr(want, k), k

    def test_default_options_applies_dataset_defaults(self):
        """Programmatic construction fires the same two-phase dataset
        defaults as the CLI (regression: a refine system built via
        default_options got the generic 32px patch_len instead of
        llff_refine's 64 — data/llff_refine_dataset.py:22 — and the
        UNet's >=64px check rejected it), with explicit overrides
        still winning."""
        from nerfsr_tpu.config import default_options

        opt = default_options("train", model="refine",
                              dataset_mode="llff_refine")
        assert opt.patch_len == 64
        assert opt.white_bkgd is False and opt.noise_std == 1.0
        opt2 = default_options("train", model="refine",
                               dataset_mode="llff_refine", patch_len=96)
        assert opt2.patch_len == 96
        optb = default_options("train", dataset_mode="blender")
        assert optb.white_bkgd is True and optb.noise_std == 0.0


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
